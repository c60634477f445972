"""A/B profile of VGG-LPIPS conv formulations on the TPU.

The LPIPS trunk is the largest single train-step cost (~18 ms of an 85 ms
step at 512^2) and the measured MXU utilization of its early convs is ~9%
(BENCH_NOTES r2; conv1_2 64->64 @512^2 = 1.13 ms vs ~0.1 ms ideal).  This
script times the same conv under different formulations to find where the
utilization goes, then times the full trunk fwd and fwd+bwd with the best
variant wired in (models/lpips.py reads GOMAVATAR_LPIPS_CONV to switch).

    JAX_COMPILATION_CACHE_DIR=~/.cache/jax_gomavatar python tools/profile_lpips.py

Variants (all bf16, all numerically checked against the f32 baseline):
  conv      lax.conv_general_dilated NHWC (the current implementation)
  im2col    materialized 3x3 patches -> one (HW, 9C) @ (9C, Cout) dot
  shift9    9 shifted (HW, C) @ (C, Cout) dots accumulated (no patches)
  s2d       space-to-depth: pad 1, pack 2x2 -> (H/2, W/2, 4C), 2x2 VALID
            conv to (H/2, W/2, 4Cout), unpack.  16/9 the FLOPs at 4x the
            channel width — wins iff the baseline is lane-starved.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def conv_baseline(x, w):
    """x (H, W, C), w (3, 3, C, Co) -> (H, W, Co), SAME."""
    dn = jax.lax.conv_dimension_numbers(
        (1,) + x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1), "SAME", dimension_numbers=dn
    )[0]


def conv_im2col(x, w):
    H, W, C = x.shape
    Co = w.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    cols = [xp[di : di + H, dj : dj + W, :] for di in range(3) for dj in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(H * W, 9 * C)
    return (patches @ w.reshape(9 * C, Co)).reshape(H, W, Co)


def conv_shift9(x, w):
    H, W, C = x.shape
    Co = w.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H * W, Co), x.dtype)
    for di in range(3):
        for dj in range(3):
            acc = acc + xp[di : di + H, dj : dj + W, :].reshape(H * W, C) @ w[di, dj]
    return acc.reshape(H, W, Co)


def conv_s2d(x, w):
    """Space-to-depth formulation (models/lpips.py:_conv3x3 mode 's2d')."""
    from gomavatar_tpu.models.lpips import _conv3x3

    return _conv3x3(x[None], w, "s2d")[0]


VARIANTS = {
    "conv": conv_baseline,
    "im2col": conv_im2col,
    "shift9": conv_shift9,
    "s2d": conv_s2d,
}


def check_correctness():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 64, 16), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 32), jnp.float32) * 0.1
    ref = conv_baseline(x, w)
    for name, fn in VARIANTS.items():
        got = fn(x, w)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-3, f"{name}: max err {err}"
        print(f"correctness {name}: max|err| {err:.2e} OK")


def bench(fn, *args, n=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    check_correctness()
    print("backend:", jax.default_backend())

    shapes = [
        ("conv1_1 3->64 @512", (512, 512, 3), 64),
        ("conv1_2 64->64 @512", (512, 512, 64), 64),
        ("conv2_1 64->128 @256", (256, 256, 64), 128),
        ("conv2_2 128->128 @256", (256, 256, 128), 128),
        ("conv3_2 256->256 @128", (128, 128, 256), 256),
    ]
    for label, xshape, co in shapes:
        H, W, C = xshape
        x = jax.random.normal(jax.random.PRNGKey(0), xshape, jnp.float32).astype(jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, co), jnp.float32) * 0.05).astype(jnp.bfloat16)
        gflop = 2 * H * W * 9 * C * co / 1e9
        print(f"-- {label}  ({gflop:.1f} GFLOP)")
        for name, fn in VARIANTS.items():
            try:
                ms, _ = bench(fn, x, w)
                print(f"   {name:8s} {ms:7.3f} ms   {gflop / ms:6.1f} TFLOP/s")
            except Exception as e:  # noqa: BLE001 — report and continue the sweep
                print(f"   {name:8s} FAILED: {type(e).__name__}: {e}")

    # full trunk fwd / fwd+bwd under each wired variant
    from gomavatar_tpu.models.lpips import load_lpips, lpips

    params, _calib, msg = load_lpips("vgg", quiet=True)
    img = jax.random.uniform(jax.random.PRNGKey(2), (512, 512, 3), jnp.float32)
    gt = jax.random.uniform(jax.random.PRNGKey(3), (512, 512, 3), jnp.float32)

    def dist(a):
        return lpips(params, a * 2 - 1, gt * 2 - 1)

    for mode in ("conv", "shift9", "s2d"):
        os.environ["GOMAVATAR_LPIPS_CONV"] = mode
        try:
            ms_f, val = bench(dist, img)
            ms_b, _ = bench(jax.grad(lambda a: dist(a).sum()), img)
            print(f"trunk[{mode}]: fwd {ms_f:.2f} ms  grad {ms_b:.2f} ms  val {float(val.sum()):.5f}")
        except Exception as e:  # noqa: BLE001
            print(f"trunk[{mode}]: FAILED {type(e).__name__}: {e}")
    os.environ.pop("GOMAVATAR_LPIPS_CONV", None)


if __name__ == "__main__":
    main()
