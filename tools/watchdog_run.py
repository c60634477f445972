"""Run a command under a log-progress watchdog (TPU-tunnel wedge guard).

The TPU relay in this environment occasionally wedges: the client process
hangs forever inside a device call, with no exception to catch.  A plain
``timeout`` either kills healthy long stages or wastes hours on a wedged
one.  This wrapper instead watches the *stage's own log file* (anything the
stage appends to proves liveness) and kills the process only when the log
has not grown for ``--stall`` seconds — longer than the worst healthy gap
(a 5-10 min remote AOT compile after subdivision).

    python tools/watchdog_run.py --log LOG --stall 1800 [--retries N]
        [--retry-arg ARG] -- cmd args...

On a stall the command is killed (process group) and retried up to
``--retries`` times, appending ``--retry-arg`` (e.g. ``--resume``) from the
second attempt on so a resumable trainer continues from its checkpoint.
Exit code: the command's on success/failure, 99 if every attempt stalled.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def log_size(path: str) -> int:
    try:
        return os.stat(path).st_size
    except OSError:
        return -1


def run_once(cmd, log_path, stall_s) -> int | None:
    """Returns the exit code, or None on a stall kill."""
    proc = subprocess.Popen(cmd, start_new_session=True)
    last_size = log_size(log_path)
    last_change = time.time()
    while True:
        try:
            code = proc.wait(timeout=30)
            return code
        except subprocess.TimeoutExpired:
            pass
        size = log_size(log_path)
        if size != last_size:
            last_size = size
            last_change = time.time()
        elif time.time() - last_change > stall_s:
            print(
                f"[watchdog] no progress in {log_path} for {stall_s}s — killing",
                flush=True,
            )
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                proc.kill()
            proc.wait()
            return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="file whose growth proves liveness")
    ap.add_argument("--stall", type=int, default=1800, help="seconds without log growth before a kill")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--retry-arg", default=None, help="extra arg appended on retry attempts (e.g. --resume)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    for attempt in range(args.retries + 1):
        c = list(cmd)
        if attempt > 0 and args.retry_arg and args.retry_arg not in c:
            c.append(args.retry_arg)
        print(f"[watchdog] attempt {attempt + 1}: {' '.join(c)}", flush=True)
        code = run_once(c, args.log, args.stall)
        if code is not None:
            if code != 0:
                print(f"[watchdog] exited {code}", flush=True)
            return code
        if attempt < args.retries:
            # stalled: wait for the tunnel to settle before retrying
            time.sleep(120)
    print("[watchdog] all attempts stalled", flush=True)
    return 99


if __name__ == "__main__":
    sys.exit(main())
