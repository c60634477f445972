from gomavatar_tpu.ops.transforms import (
    so3_exp,
    rodrigues,
    construct_G,
)
from gomavatar_tpu.ops.skeleton import (
    SMPL_PARENT,
    SMPLX_PARENT,
    body_pose_to_body_RTs,
    get_canonical_global_tfms,
    get_global_RTs,
    apply_lbs,
)
from gomavatar_tpu.ops.camera import (
    cam_T_world,
    img_T_cam,
    img_T_world,
    ndc_T_world,
    focal2fov,
    apply_global_tfm_to_camera,
)
from gomavatar_tpu.ops.steiner import steiner_transform
