"""XLA-cost-analysis-based FLOPs / MFU / HBM-bandwidth estimates.

Shared by tools/profile_eval.py and tools/bench_train.py (VERDICT r4 item 5:
publish a per-stage ms table WITH an MFU estimate so FPS movements can be
attributed).  FLOPs and bytes come from the compiled executable's own
``cost_analysis()`` — XLA's static count over the optimized HLO — so they
include everything the program actually runs (padding, rematerialization,
both matmul operand layouts), not a hand model.  Caveats: the count is
precision-blind (a bf16 MXU matmul and an f32 VPU multiply are both "1
flop"), so MFU here is a *lower bound* against the bf16 peak whenever part
of the program runs f32; and ``bytes accessed`` is HLO-level, counting
buffers XLA later keeps in VMEM, so bandwidth figures are upper bounds.
Good enough to localize regressions, not a substitute for a trace.
"""

from __future__ import annotations

import jax

# Peak numbers for the chips this project targets.  TPU v5e ("v5 lite"):
# 197 TFLOP/s bf16, 819 GB/s HBM (public spec).  CPU gets no peak — the
# table prints raw FLOPs only.
_PEAKS = {
    "tpu v5 lite": (197e12, 819e9),
    "tpu v5e": (197e12, 819e9),
}


def device_peaks():
    """(peak_flops_per_s, peak_bytes_per_s) or (None, None) off-TPU."""
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for k, v in _PEAKS.items():
        if k in kind:
            return v
    if d.platform in ("tpu", "axon"):
        # Unknown TPU generation: better to print v5e-relative numbers with
        # the kind in the header than to silently omit MFU.
        return _PEAKS["tpu v5e"]
    return (None, None)


def compiled_cost(jitted, args):
    """(flops, bytes_accessed) of the optimized executable, or (None, None).

    ``cost_analysis()`` returns a dict in current JAX (a 1-list of dicts in
    older releases); either may be missing keys on experimental backends.
    """
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = ca.get("flops")
        nbytes = ca.get("bytes accessed")
        return (float(flops) if flops else None,
                float(nbytes) if nbytes else None)
    except Exception:
        return (None, None)


def fmt_row(name, ms, flops, nbytes, peak_flops, peak_bw):
    """One aligned table row: ms, GFLOP, achieved TFLOP/s, MFU%, GB/s, BW%."""
    cols = [f"{name:28s} {ms:8.3f} ms"]
    if flops is not None:
        tfs = flops / (ms * 1e-3) / 1e12
        cols.append(f"{flops / 1e9:9.2f} GF {tfs:7.2f} TF/s")
        if peak_flops:
            cols.append(f"{100 * tfs * 1e12 / peak_flops:5.1f}% MFU")
    if nbytes is not None:
        gbs = nbytes / (ms * 1e-3) / 1e9
        cols.append(f"{gbs:7.1f} GB/s")
        if peak_bw:
            cols.append(f"{100 * gbs * 1e9 / peak_bw:5.1f}% BW")
    return "  ".join(cols)
