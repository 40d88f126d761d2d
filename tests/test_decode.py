"""Decode ops: Gaussian moments, heatmap argmax, SimCC."""

import numpy as np
import jax.numpy as jnp

from multi_camera_3d_pose_estimation_tpu.ops import (
    heatmap_moments,
    heatmap_argmax_decode,
    simcc_decode,
)


def moments_oracle(hm, threshold=0.01):
    """Scalar numpy oracle (spec: mmpose_pose_estimation.py:163-215)."""
    hm = np.asarray(hm, dtype=float).copy()
    hm[hm < threshold] = 0
    s = hm.sum()
    if s == 0:
        return np.zeros(6)
    p = hm / s
    H, W = hm.shape
    ys, xs = np.mgrid[0:H, 0:W]
    mx = (xs * p).sum()
    my = (ys * p).sum()
    vx = ((xs - mx) ** 2 * p).sum()
    vy = ((ys - my) ** 2 * p).sum()
    cxy = ((xs - mx) * (ys - my) * p).sum()
    return np.array([mx, my, vx, cxy, cxy, vy])


def gaussian_heatmap(H, W, cx, cy, sx, sy, rho=0.0, amp=1.0):
    ys, xs = np.mgrid[0:H, 0:W].astype(float)
    dx = (xs - cx) / sx
    dy = (ys - cy) / sy
    z = (dx * dx - 2 * rho * dx * dy + dy * dy) / (2 * (1 - rho * rho))
    return amp * np.exp(-z)


def test_moments_match_oracle(rng):
    hms = np.stack(
        [
            gaussian_heatmap(64, 48, 20.3, 40.7, 3.0, 2.0, 0.3),
            gaussian_heatmap(64, 48, 5.0, 5.0, 1.5, 4.0, -0.5),
            np.zeros((64, 48)),
            rng.uniform(0, 0.009, size=(64, 48)),  # all below threshold
        ]
    )
    got = np.array(heatmap_moments(hms))
    exp = np.stack([moments_oracle(h) for h in hms])
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-8)
    # Zero / sub-threshold maps give all-zero rows.
    assert np.all(got[2] == 0) and np.all(got[3] == 0)


def test_moments_batched_axes(rng):
    hms = rng.uniform(0, 1, size=(2, 3, 17, 16, 12))
    got = np.array(heatmap_moments(hms))
    assert got.shape == (2, 3, 17, 6)
    exp = moments_oracle(hms[1, 2, 5])
    np.testing.assert_allclose(got[1, 2, 5], exp, rtol=1e-6)


def test_moments_recover_gaussian_params():
    hm = gaussian_heatmap(96, 96, 48.0, 30.0, 5.0, 3.0, 0.0)
    m = np.array(heatmap_moments(hm, threshold=0.0))
    np.testing.assert_allclose(m[:2], [48.0, 30.0], atol=0.01)
    np.testing.assert_allclose(m[2], 25.0, rtol=0.02)  # var_x = sx^2
    np.testing.assert_allclose(m[5], 9.0, rtol=0.02)


def test_heatmap_argmax_decode():
    hm = gaussian_heatmap(64, 48, 20.0, 33.0, 2.0, 2.0)
    xy, score = heatmap_argmax_decode(hm[None])
    xy = np.array(xy)[0]
    # Peak at integer location; quarter-offset can move ±0.25.
    assert abs(xy[0] - 20.0) <= 0.25 + 1e-6
    assert abs(xy[1] - 33.0) <= 0.25 + 1e-6
    assert float(score[0]) > 0.9


def test_heatmap_argmax_subpixel_direction():
    # Peak between x=10 and x=11, closer to 10: shift should be +0.25.
    hm = gaussian_heatmap(32, 32, 10.3, 8.0, 1.5, 1.5)
    xy, _ = heatmap_argmax_decode(hm)
    assert np.isclose(float(xy[0]), 10.25)


def test_simcc_decode():
    K, Wx, Wy, ratio = 17, 384, 512, 2.0
    true_x = np.linspace(10, 180, K)
    true_y = np.linspace(20, 240, K)
    logits_x = np.zeros((K, Wx))
    logits_y = np.zeros((K, Wy))
    for i in range(K):
        logits_x[i, int(round(true_x[i] * ratio))] = 12.0
        logits_y[i, int(round(true_y[i] * ratio))] = 12.0
    xy, score = simcc_decode(logits_x, logits_y, split_ratio=ratio)
    xy = np.array(xy)
    np.testing.assert_allclose(xy[:, 0], np.round(true_x * ratio) / ratio, atol=1e-6)
    np.testing.assert_allclose(xy[:, 1], np.round(true_y * ratio) / ratio, atol=1e-6)
    assert np.all(np.array(score) > 0.5)


def test_simcc_softmax_refine():
    Wx = 64
    logits = np.zeros((1, Wx))
    logits[0, 10] = 8.0
    logits[0, 11] = 8.0  # symmetric pair -> expectation at 10.5
    xy, _ = simcc_decode(logits, logits, split_ratio=1.0,
                         use_softmax_refine=True, refine_radius=3)
    assert abs(float(np.array(xy)[0, 0]) - 10.5) < 0.01


def test_dark_decode_subpixel_accuracy():
    """DARK decode recovers off-grid Gaussian peaks to <0.05 px (vs 0.25 px
    quantization of the argmax+shift decode)."""
    from multi_camera_3d_pose_estimation_tpu.ops import (
        heatmap_argmax_decode,
        heatmap_dark_decode,
    )

    H, W = 32, 32
    ys, xs = np.mgrid[0:H, 0:W]
    errs_dark, errs_base = [], []
    for cx, cy in [(10.3, 12.7), (20.85, 5.15), (16.5, 16.5)]:
        hm = np.exp(-(((xs - cx) ** 2) + ((ys - cy) ** 2)) / (2 * 2.0**2))
        xy_d, _ = heatmap_dark_decode(jnp.asarray(hm[None], jnp.float64))
        xy_b, _ = heatmap_argmax_decode(jnp.asarray(hm[None], jnp.float64))
        errs_dark.append(np.abs(np.asarray(xy_d)[0] - [cx, cy]).max())
        errs_base.append(np.abs(np.asarray(xy_b)[0] - [cx, cy]).max())
    assert max(errs_dark) < 0.05, errs_dark
    assert max(errs_dark) < min(errs_base) + 1e-9  # strictly better
