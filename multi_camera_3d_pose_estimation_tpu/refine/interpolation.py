"""Outlier-filtered windowed linear interpolation — fully vectorized.

TPU-native replacement of the reference's T×J×3 Python triple loop
(pose_refinement.py:15-84): the sliding window becomes a gather into a
(T, W, ...) tensor, the mean/std/median/MAD outlier gate becomes masked
reductions, and the per-window degree-1 polyfit becomes its closed form —
one jitted program for the whole trajectory.

Semantics notes vs the reference:
- Window truncation at sequence edges matches (masked, not padded, stats).
- Windows containing NaN produce NaN stats -> zero survivors -> fallback,
  exactly like the reference's un-masked numpy stats.
- When fewer than 2 window points survive the filter, the reference's loop
  assigns the original point to a local then `continue`s before writing, so
  the OUTPUT stays 0 (pose_refinement.py:61-63).  That is a bug; the default
  here is the intended behaviour (keep the original point).  Pass
  ``strict_zero_fallback=True`` to reproduce the reference bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["linear_interpolation"]


def _masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over masked elements along axis 1 of (T, W, ...)."""
    big = jnp.asarray(jnp.inf, x.dtype)
    vals = jnp.where(mask, x, big)
    vals = jnp.sort(vals, axis=1)
    n = jnp.sum(mask, axis=1)  # (T, ...)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    v_lo = jnp.take_along_axis(vals, lo[:, None], axis=1)[:, 0]
    v_hi = jnp.take_along_axis(vals, hi[:, None], axis=1)[:, 0]
    med = 0.5 * (v_lo + v_hi)
    # NaN poisoning parity: if any masked-in value is NaN the median is NaN.
    has_nan = jnp.any(mask & jnp.isnan(x), axis=1)
    return jnp.where(has_nan, jnp.full_like(med, jnp.nan), med)


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "use_rolling_average",
        "filter_distance_from_median",
        "strict_zero_fallback",
    ),
)
def _interp_core(
    x: jax.Array,  # (T, N) — joints*dims flattened
    k: int,
    k_std: float,
    median_std: float,
    use_rolling_average: bool,
    filter_distance_from_median: bool,
    strict_zero_fallback: bool,
) -> jax.Array:
    T, N = x.shape
    half = k // 2
    W = 2 * half + 1
    offsets = jnp.arange(-half, half + 1)  # (W,)
    t_idx = jnp.arange(T)[:, None] + offsets[None, :]  # (T, W)
    in_bounds = (t_idx >= 0) & (t_idx < T)
    t_clip = jnp.clip(t_idx, 0, T - 1)

    win = x[t_clip]  # (T, W, N)
    mask = in_bounds[..., None]  # (T, W, 1) broadcasting over N
    mask_f = mask.astype(x.dtype)

    n = jnp.sum(mask_f, axis=1)  # (T, 1)
    mean = jnp.sum(win * mask_f, axis=1) / n
    var = jnp.sum(mask_f * (win - mean[:, None]) ** 2, axis=1) / n
    std = jnp.sqrt(var)

    mask_b = jnp.broadcast_to(mask, win.shape)
    med = _masked_median(win, mask_b)  # (T, N)
    mad = _masked_median(jnp.abs(win - med[:, None]), mask_b)

    valid = mask_b & (jnp.abs(win - mean[:, None]) <= k_std * std[:, None])
    if filter_distance_from_median:
        valid = valid & (jnp.abs(win - med[:, None]) <= median_std * mad[:, None])
    vf = valid.astype(x.dtype)
    nv = jnp.sum(vf, axis=1)  # (T, N)
    enough = nv >= 2

    safe_nv = jnp.where(enough, nv, jnp.full_like(nv, 2.0))
    mean_v = jnp.sum(win * vf, axis=1) / safe_nv

    if use_rolling_average:
        fitted = mean_v
    else:
        times = t_idx.astype(x.dtype)[..., None]  # (T, W, 1)
        mean_t = jnp.sum(times * vf, axis=1) / safe_nv  # (T, N)
        st2 = jnp.sum(vf * (times - mean_t[:, None]) ** 2, axis=1)
        stx = jnp.sum(vf * (times - mean_t[:, None]) * (win - mean_v[:, None]), axis=1)
        slope = stx / jnp.where(st2 > 0, st2, jnp.ones_like(st2))
        t_now = jnp.arange(T, dtype=x.dtype)[:, None]
        fitted = mean_v + slope * (t_now - mean_t)

    fallback = jnp.zeros_like(x) if strict_zero_fallback else x
    return jnp.where(enough, fitted, fallback)


def linear_interpolation(
    points,
    k: int = 5,
    k_std: float = 2,
    median_std: float = 2,
    use_rolling_average: bool = False,
    filter_distance_from_median: bool = True,
    strict_zero_fallback: bool = False,
):
    """Smooth ``points`` ([T, P, D] or [T, P]) by outlier-robust local fits.

    Same signature/defaults as the reference entry point
    (pose_refinement.py:15); see module docstring for semantics.
    Returns an array of the input's shape (float).
    """
    pts = jnp.asarray(points)
    squeeze = pts.ndim == 2
    if squeeze:
        pts = pts[..., None]
    T, P, D = pts.shape
    flat = pts.reshape(T, P * D).astype(jnp.result_type(pts.dtype, jnp.float32))
    out = _interp_core(
        flat,
        int(k),
        float(k_std),
        float(median_std),
        bool(use_rolling_average),
        bool(filter_distance_from_median),
        bool(strict_zero_fallback),
    ).reshape(T, P, D)
    if squeeze:
        out = out[..., 0]
    return out
