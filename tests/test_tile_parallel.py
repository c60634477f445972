"""Image-tile parallel rendering (parallel/tile_render.py): the fused eval
sweep sharded over the active-tile axis of a device mesh must reproduce the
single-chip fused render (up to cross-compilation reassociation; slot order
is preserved and the all_gather only reassembles the compact outputs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gomavatar_tpu.models.gom import render_frame_eval
from gomavatar_tpu.parallel import make_mesh, make_tile_parallel_render
from gomavatar_tpu.parallel.tile_render import TILE_AXIS

from tests.test_frame_render import _scene, _verts_obs, IMG


def test_tile_parallel_matches_single_chip():
    assert len(jax.devices()) >= 8, "conftest must provide the virtual mesh"
    params, statics, gom_cfg, batch = _scene(shadow=True)
    # active_cap must divide the mesh axis
    gom_cfg = dataclasses.replace(gom_cfg, active_tile_cap=16)
    verts_obs = _verts_obs(params, statics, batch, gom_cfg)
    colors = params["appearance"]["colors"]

    ref_rgb, ref_alpha, _ = render_frame_eval(
        params, statics, gom_cfg, verts_obs, colors, batch["K"], batch["E"],
        interpret=True,
    )

    mesh = make_mesh(8, axis=TILE_AXIS)
    render = make_tile_parallel_render(mesh, gom_cfg, statics, interpret=True)
    rgb, alpha = render(params, verts_obs, colors, batch["K"], batch["E"])

    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb), atol=1e-5)
    assert float(jnp.max(ref_alpha)) > 0.5  # scene actually renders
