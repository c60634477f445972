from gomavatar_tpu.ops.splat.projection import project_gaussians
from gomavatar_tpu.ops.splat.render import render_gaussians
