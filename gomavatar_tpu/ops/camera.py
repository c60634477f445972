"""Camera math: projections, NDC, global-transform folding, freeview orbits.

TPU-native equivalents of the reference's camera stack
(utils/camera_util.py, utils/pc_util.py:11-46).  Device-side functions are
pure JAX with row-major ``(N, 3)`` points; host-side helpers (orbits,
extrinsics folding for datasets) are numpy and live in the same module since
they are tiny and run once per frame on the host.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from gomavatar_tpu.ops.transforms import so3_exp, mm


# ---------------------------------------------------------------------------
# device-side projections (pure JAX, (N, 3) points)
# ---------------------------------------------------------------------------

def cam_T_world(xyzs_world: jax.Array, E: jax.Array) -> jax.Array:
    """World -> camera: (N, 3), E (4, 4) -> (N, 3)
    (reference: utils/pc_util.py:11-15, column-major there)."""
    R = E[:3, :3]
    t = E[:3, 3]
    return mm(xyzs_world, R.T) + t


def img_T_cam(xyzs_cam: jax.Array, K: jax.Array) -> jax.Array:
    """Camera -> pixel coordinates: (N, 3), K (3, 3) -> (N, 2)
    (reference: utils/pc_util.py:18-21)."""
    xys = mm(xyzs_cam, K.T)
    return xys[..., :2] / xys[..., 2:3]


def img_T_world(xyzs_world: jax.Array, K: jax.Array, E: jax.Array) -> jax.Array:
    return img_T_cam(cam_T_world(xyzs_world, E), K)


def ndc_T_world(xyzs_world: jax.Array, K: jax.Array, E: jax.Array, H: int, W: int) -> jax.Array:
    """World -> the reference's mesh-rasterizer NDC convention
    (utils/pc_util.py:30-46: normalize by the short side, flip x and y,
    keep camera-space z).  Kept for parity/tests; our own rasterizers work
    directly in pixel space."""
    xyzs_cam = cam_T_world(xyzs_world, E)
    xys = img_T_cam(xyzs_cam, K)
    if H < W:
        xs = -((xys[..., 0] / H) * 2.0 - (W / H))
        ys = -((xys[..., 1] / H) * 2.0 - 1.0)
    else:
        xs = -((xys[..., 0] / W) * 2.0 - 1.0)
        ys = -((xys[..., 1] / W) * 2.0 - (H / W))
    return jnp.stack([xs, ys, xyzs_cam[..., 2]], axis=-1)


def focal2fov(focal, pixels):
    """Focal length -> field of view (reference: utils/camera_util.py:213-214)."""
    return 2.0 * np.arctan(pixels / (2.0 * focal))


# ---------------------------------------------------------------------------
# host-side camera helpers (numpy; dataset/prepare time)
# ---------------------------------------------------------------------------

def _np_rodrigues(rvec: np.ndarray) -> np.ndarray:
    """Host Rodrigues (replaces cv2.Rodrigues, reference utils/camera_util.py:124)."""
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3, dtype=np.float64)
    r = rvec.reshape(3) / theta
    K = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def apply_global_tfm_to_camera(E, Rh, Th, return_global_tfms: bool = False):
    """Fold the SMPL global rotation/translation (Rh, Th) into the camera
    extrinsics so the body sits at the origin
    (reference: utils/camera_util.py:111-131)."""
    global_tfms = np.eye(4)
    global_rot = _np_rodrigues(np.asarray(Rh, dtype=np.float64)).T
    global_tfms[:3, :3] = global_rot
    global_tfms[:3, 3] = -global_rot @ np.asarray(Th, dtype=np.float64)
    E_new = np.asarray(E, dtype=np.float64) @ np.linalg.inv(global_tfms)
    if return_global_tfms:
        return E_new, global_tfms
    return E_new


def get_camrot(campos, lookat=None, up=None, inv_camera: bool = False) -> np.ndarray:
    """Look-at rotation (reference: utils/camera_util.py:52-80)."""
    campos = np.asarray(campos, dtype=np.float64)
    if lookat is None:
        lookat = np.zeros(3)
    lookat = np.asarray(lookat, dtype=np.float64)
    if up is None:
        up = np.array([0.0, 1.0, 0.0])
        if inv_camera:
            up = up * np.array([1.0, -1.0, 1.0])
    up = np.asarray(up, dtype=np.float64)
    forward = lookat - campos
    forward = forward / np.linalg.norm(forward)
    right = np.cross(up, forward)
    right = right / np.linalg.norm(right)
    up = np.cross(forward, right)
    up = up / np.linalg.norm(up)
    return np.stack([right, up, forward], axis=0)


def _update_extrinsics(extrinsics, angle, trans=None, rotate_axis="y") -> np.ndarray:
    """Rotate a camera around a world axis keeping it aimed at the subject
    (reference: utils/camera_util.py:5-49)."""
    E = np.asarray(extrinsics, dtype=np.float64)
    inv_E = np.linalg.inv(E)
    camrot = inv_E[:3, :3]
    campos = inv_E[:3, 3].copy()
    if trans is not None:
        campos -= trans
    if camrot.T[1, 1] < 0.0:
        angle = -angle
    axis_idx = {"x": 0, "y": 1, "z": 2}[rotate_axis]
    grot_vec = np.zeros(3)
    grot_vec[axis_idx] = angle
    grot_mtx = _np_rodrigues(grot_vec)
    rot_campos = grot_mtx @ campos
    rot_camrot = grot_mtx @ camrot
    if trans is not None:
        rot_campos = rot_campos + trans
    new_E = np.eye(4)
    new_E[:3, :3] = rot_camrot.T
    new_E[:3, 3] = -rot_camrot.T @ rot_campos
    return new_E


def rotate_camera_by_frame_idx(
    extrinsics, frame_idx, trans=None, rotate_axis="y", period=196, inv_angle=False
) -> np.ndarray:
    """Freeview orbit camera for frame ``frame_idx`` of ``period``
    (reference: utils/camera_util.py:83-108)."""
    angle = 2.0 * np.pi * (frame_idx / period)
    if inv_angle:
        angle = -angle
    return _update_extrinsics(extrinsics, angle, trans, rotate_axis)
