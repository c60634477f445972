"""SMPL kinematic chain: pose -> bone transforms, forward kinematics, LBS.

TPU-native equivalents of the reference's skeleton stack
(utils/body_util.py:332-424 pose->RTs, :612-638 get_global_RTs,
:641-644 apply_lbs).  Differences from the reference, by design:

  * everything is pure JAX and vectorized over joints — the 24-step Python
    FK loop of the reference (body_util.py:624-628, one CUDA launch per bone)
    becomes an unrolled chain of batched 4x4 matmuls inside one XLA program;
  * points are row-major ``(N, 3)`` and skinning weights ``(N, J)`` (the
    reference carries ``(3, N)`` / ``(J+1, N)``);
  * no host/device hops: these run under jit on TPU and under vmap for
    multi-frame batches.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.transforms import so3_exp, construct_G, mm, einsum_hi

# Kinematic parent tables (reference: utils/body_util.py:36-39 and :99-105).
# Index 0 is the root; PARENT[0] is unused.
SMPL_PARENT = np.array(
    [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

# 55-joint SMPL-X chain: body (22) + jaw/eyes (22-24) + 15 finger joints per
# hand rooted at the wrists (20/21).  Matches the reference's dict table
# (utils/body_util.py:99-105; its root entry is -1, ours keeps the
# PARENT[0]-unused convention above).
SMPLX_PARENT = np.array(
    [
        0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
        18, 19,                      # body
        15, 15, 15,                  # jaw, left eye, right eye
        20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,  # left hand
        21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,  # right hand
    ],
    dtype=np.int32,
)

NUM_SMPL_JOINTS = 24


def _parent_table(use_smplx: bool) -> np.ndarray:
    return SMPLX_PARENT if use_smplx else SMPL_PARENT


def body_pose_to_body_RTs(
    jangles: jax.Array, tpose_joints: jax.Array, use_smplx: bool = False
):
    """72-d axis-angle pose + T-pose joints -> per-joint local (R, T).

    Equivalent of utils/body_util.py:332-363 (and the differentiable tensor
    variant :366-397) but fully vectorized: one `so3_exp` over all joints.

    Args:
      jangles: (J*3,) or (J, 3) axis-angle per joint.
      tpose_joints: (J, 3) joint positions in the T-pose.
    Returns:
      Rs: (J, 3, 3) local rotations; Ts: (J, 3) local translations
      (root keeps its absolute position, children are offsets from parent).
    """
    parent = _parent_table(use_smplx)
    jangles = jangles.reshape(-1, 3)
    J = jangles.shape[0]
    Rs = so3_exp(jangles)
    parent_pos = tpose_joints[jnp.asarray(parent[:J])]
    Ts = tpose_joints - parent_pos
    Ts = Ts.at[0].set(tpose_joints[0])
    return Rs, Ts


def get_canonical_global_tfms(canonical_joints: jax.Array, use_smplx: bool = False) -> jax.Array:
    """Canonical joints (J, 3) -> (J, 4, 4) global transforms of the zero pose
    (reference: utils/body_util.py:400-424).  With identity rotations the
    chain composition reduces to pure translations to the joint positions."""
    J = canonical_joints.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=canonical_joints.dtype), (J, 3, 3))
    return construct_G(eye, canonical_joints)


def fk_chain(local_Gs: jax.Array, use_smplx: bool = False) -> jax.Array:
    """Compose local per-joint 4x4s down the kinematic tree.

    ``local_Gs``: (..., J, 4, 4).  Unrolled at trace time (J == 24 is tiny);
    XLA fuses the whole chain into one program — the TPU answer to the
    reference's per-bone Python loop (utils/body_util.py:624-628).
    """
    parent = _parent_table(use_smplx)
    J = local_Gs.shape[-3]
    out = [local_Gs[..., 0, :, :]]
    for i in range(1, J):
        out.append(mm(out[parent[i]], local_Gs[..., i, :, :]))
    return jnp.stack(out, axis=-3)


def get_global_RTs(
    cnl_gtfms: jax.Array,
    dst_Rs: jax.Array,
    dst_Ts: jax.Array,
    use_smplx: bool = False,
):
    """Per-bone skinning transforms: G_dst @ inv(G_cnl) (utils/body_util.py:612-638).

    Args:
      cnl_gtfms: (..., J, 4, 4) canonical global transforms.
      dst_Rs: (..., J, 3, 3) local rotations of the target pose.
      dst_Ts: (..., J, 3) local translations of the target pose.
    Returns:
      (Rs, Ts): (..., J, 3, 3) and (..., J, 3).
    """
    local_Gs = construct_G(dst_Rs, dst_Ts)
    dst_gtfms = fk_chain(local_Gs, use_smplx=use_smplx)
    # inverse of a rigid transform, closed form (cheaper + stabler than
    # jnp.linalg.inv on 4x4s)
    R_cnl = cnl_gtfms[..., :3, :3]
    t_cnl = cnl_gtfms[..., :3, 3]
    R_cnl_inv = jnp.swapaxes(R_cnl, -1, -2)
    t_cnl_inv = -einsum_hi("...ij,...j->...i", R_cnl_inv, t_cnl)
    cnl_inv = construct_G(R_cnl_inv, t_cnl_inv)
    f_mtx = mm(dst_gtfms, cnl_inv)
    return f_mtx[..., :3, :3], f_mtx[..., :3, 3]


def apply_lbs(
    xyzs: jax.Array,
    global_Rs: jax.Array,
    global_Ts: jax.Array,
    lbs_weights: jax.Array,
) -> jax.Array:
    """Linear blend skinning (reference: utils/body_util.py:641-644).

    Args:
      xyzs: (N, 3) canonical points.
      global_Rs: (J, 3, 3); global_Ts: (J, 3) from :func:`get_global_RTs`.
      lbs_weights: (N, J) blend weights (background row already dropped —
        the reference stores an extra bg row and slices it off,
        models/model.py:63-71).
    Returns:
      (N, 3) skinned points.

    Blended-transform form: per point, first blend the 24 bone transforms
    with the weights (two small matmuls that land on the MXU), then apply one
    3x3 to each point — O(N*J*12) instead of materializing (J, N, 3).
    """
    # (N, J) @ (J, 9) -> (N, 3, 3)
    R_blend = mm(lbs_weights, global_Rs.reshape(global_Rs.shape[0], 9)).reshape(-1, 3, 3)
    T_blend = mm(lbs_weights, global_Ts)
    return einsum_hi("nij,nj->ni", R_blend, xyzs) + T_blend


def get_joints_from_pose(
    dst_poses: jax.Array, tpose_joints: jax.Array, use_smplx: bool = False
) -> jax.Array:
    """Posed joint positions from a 72-d pose (reference: utils/body_util.py
    get_joints_from_pose): run FK and read off the translation column."""
    Rs, Ts = body_pose_to_body_RTs(dst_poses, tpose_joints, use_smplx=use_smplx)
    Gs = fk_chain(construct_G(Rs, Ts), use_smplx=use_smplx)
    return Gs[..., :3, 3]
