"""Native host image pipeline vs cv2/numpy references."""

import numpy as np
import pytest

from gomavatar_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native library failed to build"
)


def test_rodrigues_matches_numpy(rng):
    for _ in range(5):
        rvec = rng.normal(size=3)
        R = native_loader.rodrigues(rvec)
        # numpy oracle
        theta = np.linalg.norm(rvec)
        k = rvec / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        expect = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
        np.testing.assert_allclose(R, expect, atol=1e-12)


def test_resize_composite_no_distortion(rng):
    H, W = 64, 48
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    mask = (rng.random((H, W)) > 0.5).astype(np.uint8) * 255
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
    bg = np.array([10.0, 20.0, 30.0], np.float32)
    out_img, out_mask = native_loader.undistort_resize_composite(
        img, mask, K, None, bg, (H // 2, W // 2)
    )
    assert out_img.shape == (32, 24, 3)
    assert 0 <= out_mask.min() and out_mask.max() <= 1.0
    # fully-masked input pixel regions composite toward bg
    img0 = np.zeros((H, W, 3), np.uint8)
    mask0 = np.zeros((H, W), np.uint8)
    oi, om = native_loader.undistort_resize_composite(img0, mask0, K, None, bg, (32, 24))
    np.testing.assert_allclose(oi, np.broadcast_to(bg, oi.shape), atol=1e-4)
    np.testing.assert_allclose(om, 0.0, atol=1e-6)


def test_matches_cv2_undistort_pipeline(rng):
    cv2 = pytest.importorskip("cv2")
    H, W = 96, 96
    # smooth image: bilinear-vs-bilinear comparison stays tight
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([xx * 2, yy * 2, (xx + yy)], axis=-1).astype(np.uint8)
    mask = np.full((H, W), 255, np.uint8)
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
    D = np.array([-0.1, 0.05, 0.001, -0.001, 0.0])
    bg = np.zeros(3, np.float32)

    ours, _ = native_loader.undistort_resize_composite(img, mask, K, D, bg, (H // 2, W // 2))

    ref = cv2.undistort(img, K, D).astype(np.float32)
    ref = cv2.resize(ref, (W // 2, H // 2), interpolation=cv2.INTER_LINEAR)
    # interiors must agree closely (borders differ by extrapolation policy)
    diff = np.abs(ours[8:-8, 8:-8] - ref[8:-8, 8:-8])
    assert np.percentile(diff, 95) < 6.0, float(diff.max())
