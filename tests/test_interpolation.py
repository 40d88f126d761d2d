"""Vectorized linear_interpolation vs a scalar numpy oracle.

Oracle implements the documented reference algorithm (pose_refinement.py:15-84)
directly: per (t, p, d) truncated window, mean/std + median/MAD gate,
degree-1 polyfit on survivors.
"""

import numpy as np

from multi_camera_3d_pose_estimation_tpu.refine import linear_interpolation


def oracle(points, k=5, k_std=2, median_std=2, use_rolling_average=False,
           filter_distance_from_median=True, strict_zero_fallback=False):
    points = np.asarray(points, dtype=float)
    T, P, D = points.shape
    out = np.zeros_like(points)
    for p in range(P):
        for d in range(D):
            for t in range(T):
                lo = max(0, t - k // 2)
                hi = min(T, t + k // 2 + 1)
                w = points[lo:hi, p, d]
                mean, std = np.mean(w), np.std(w)
                med = np.median(w)
                mad = np.median(np.abs(w - med))
                valid = np.abs(w - mean) <= k_std * std
                if filter_distance_from_median:
                    valid &= np.abs(w - med) <= median_std * mad
                vals = w[valid]
                if len(vals) < 2:
                    out[t, p, d] = 0.0 if strict_zero_fallback else points[t, p, d]
                    continue
                if use_rolling_average:
                    out[t, p, d] = np.mean(vals)
                else:
                    times = np.arange(lo, hi)[valid]
                    coef = np.polyfit(times, vals, 1)
                    out[t, p, d] = np.polyval(coef, t)
    return out


def make_data(rng, T=40, P=3, D=2, with_nans=True, with_outliers=True):
    t = np.arange(T)[:, None, None]
    base = np.sin(t / 7.0 + np.arange(P)[None, :, None]) * 50 + np.arange(D) * 10
    x = base + rng.normal(0, 0.5, size=(T, P, D))
    if with_outliers:
        x[5, 0, 0] += 80.0
        x[20, 1, 1] -= 120.0
        x[21, 1, 1] += 95.0
    if with_nans:
        x[10, 2, 0] = np.nan
        x[33, 0, 1] = np.nan
    return x


def test_matches_oracle_default(rng):
    x = make_data(rng)
    got = np.array(linear_interpolation(x))
    exp = oracle(x)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6, equal_nan=True)


def test_matches_oracle_rolling_average(rng):
    x = make_data(rng)
    got = np.array(linear_interpolation(x, use_rolling_average=True))
    exp = oracle(x, use_rolling_average=True)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6, equal_nan=True)


def test_matches_oracle_no_median_filter(rng):
    x = make_data(rng, with_nans=False)
    got = np.array(linear_interpolation(x, filter_distance_from_median=False))
    exp = oracle(x, filter_distance_from_median=False)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


def test_strict_zero_fallback_compat(rng):
    x = make_data(rng)
    got = np.array(linear_interpolation(x, strict_zero_fallback=True))
    exp = oracle(x, strict_zero_fallback=True)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


def test_2d_input_shape(rng):
    x = make_data(rng, D=2)[:, :, 0]
    got = np.array(linear_interpolation(x))
    exp = oracle(x[..., None])[:, :, 0]
    assert got.shape == x.shape
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6, equal_nan=True)


def test_outliers_removed(rng):
    x = make_data(rng, with_nans=False)
    sm = np.array(linear_interpolation(x))
    # The injected 80-unit spike must shrink by >90% relative to the clean
    # local trend (median of the neighbouring uncorrupted samples).
    clean = np.median([x[3, 0, 0], x[4, 0, 0], x[6, 0, 0], x[7, 0, 0]])
    assert abs(sm[5, 0, 0] - clean) < 0.1 * abs(x[5, 0, 0] - clean)


def test_window_size_7(rng):
    x = make_data(rng, with_nans=False)
    got = np.array(linear_interpolation(x, k=7))
    exp = oracle(x, k=7)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)
