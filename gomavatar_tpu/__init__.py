"""gomavatar_tpu — a TPU-native (JAX/XLA/Pallas) framework for animatable
Gaussians-on-Mesh human avatars, with the capabilities of wenj/GoMAvatar.

Design stance (TPU-first, not a port):
  * the entire train/render step (FK -> LBS -> Steiner covariances -> splat
    rasterization -> mesh rasterization -> shading -> losses -> grads) is a
    single jitted XLA program;
  * hot rasterization kernels are Pallas TPU kernels where compositing is
    expressed as log-space cumulative transmittance plus an MXU matmul;
  * model state is a plain pytree of arrays; modules are pure init/apply
    function pairs;
  * multi-scene / multi-frame scaling goes through `jax.sharding.Mesh` +
    `shard_map` (see `gomavatar_tpu.parallel`).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GOMAVATAR_FORCE_CPU"):
    # The axon TPU plugin ignores JAX_PLATFORMS; the config API is the
    # reliable override (used by subprocess-based CLI tests).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
