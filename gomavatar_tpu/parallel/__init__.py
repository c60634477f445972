from gomavatar_tpu.parallel.mesh import make_mesh
from gomavatar_tpu.parallel.step import (
    make_data_parallel_train_step,
    make_multi_scene_render,
    stack_batches,
)
from gomavatar_tpu.parallel.tile_render import make_tile_parallel_render
