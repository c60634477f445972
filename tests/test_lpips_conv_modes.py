"""The GOMAVATAR_LPIPS_CONV formulations are exact reassociations of the
same VGG conv (perf A/B for the lane-starved early layers; see
tools/profile_lpips.py and models/lpips.py:_conv3x3)."""

import os

import jax
import jax.numpy as jnp
import pytest

from gomavatar_tpu.models.lpips import _conv3x3, load_lpips, lpips


def _baseline(x, w):
    return _conv3x3(x[None], w, "conv")[0]


@pytest.mark.parametrize("mode", ["shift9", "s2d"])
def test_conv3x3_mode_matches_baseline(mode):
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 40, 8), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16), jnp.float32) * 0.1
    ref = _baseline(x, w)
    got = _conv3x3(x[None], w, mode)[0]
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4

    g_ref = jax.grad(lambda x: (_baseline(x, w) ** 2).sum())(x)
    g_got = jax.grad(lambda x: (_conv3x3(x[None], w, mode)[0] ** 2).sum())(x)
    assert float(jnp.max(jnp.abs(g_got - g_ref))) < 1e-3


@pytest.mark.slow
def test_trunk_value_invariant_under_mode():
    """Slow (3 full VGG-trunk compiles): the fast split keeps the per-conv
    parity tests above, which pin the same reassociation math."""
    params, _, _ = load_lpips("vgg", quiet=True)
    a = jax.random.uniform(jax.random.PRNGKey(2), (64, 64, 3)) * 2 - 1
    b = jax.random.uniform(jax.random.PRNGKey(3), (64, 64, 3)) * 2 - 1
    vals = {}
    for mode in ("conv", "shift9", "s2d"):
        os.environ["GOMAVATAR_LPIPS_CONV"] = mode
        try:
            vals[mode] = float(lpips(params, a, b, bf16=False))
        finally:
            os.environ.pop("GOMAVATAR_LPIPS_CONV", None)
    assert abs(vals["conv"] - vals["shift9"]) < 1e-5 + 1e-4 * abs(vals["conv"])
    assert abs(vals["conv"] - vals["s2d"]) < 1e-5 + 1e-4 * abs(vals["conv"])
