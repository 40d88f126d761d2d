"""Fused Pallas decode vs the two-pass jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multi_camera_3d_pose_estimation_tpu.ops import (
    heatmap_argmax_decode,
    heatmap_moments,
)
from multi_camera_3d_pose_estimation_tpu.ops.pallas import fused_heatmap_decode


def test_fused_matches_jnp_pair(rng):
    hm = rng.uniform(0, 1, (3, 5, 16, 24)).astype(np.float32)  # 16*24=384=3*128
    hm[0, 0] = 0.0  # empty map
    moments, xy, score = fused_heatmap_decode(jnp.asarray(hm))
    m_ref = np.asarray(heatmap_moments(jnp.asarray(hm)))
    xy_ref, s_ref = heatmap_argmax_decode(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(moments), m_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(xy), np.asarray(xy_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(score), np.asarray(s_ref), atol=1e-6)


def test_fused_gaussian_recovery():
    H, W = 32, 32  # 1024 = 8*128
    ys, xs = np.mgrid[0:H, 0:W]
    cx, cy, sx, sy = 20.3, 11.7, 2.0, 3.0
    hm = np.exp(-0.5 * (((xs - cx) / sx) ** 2 + ((ys - cy) / sy) ** 2)).astype(
        np.float32
    )[None]
    moments, xy, score = fused_heatmap_decode(jnp.asarray(hm))
    m = np.asarray(moments)[0]
    assert abs(m[0] - cx) < 0.1 and abs(m[1] - cy) < 0.1
    assert abs(np.sqrt(m[2]) - sx) < 0.2 and abs(np.sqrt(m[5]) - sy) < 0.2
    assert np.allclose(np.asarray(xy)[0], [20, 12], atol=0.3)


def test_fused_rejects_bad_width():
    with pytest.raises(ValueError, match="divisible"):
        fused_heatmap_decode(jnp.zeros((1, 10, 10)))
