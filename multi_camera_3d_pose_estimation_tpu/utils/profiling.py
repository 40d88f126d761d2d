"""Tracing / profiling utilities (SURVEY.md §5 "tracing/profiling").

The reference's instrumentation is ad-hoc: commented `time.time()` deltas
around the detector/pose forwards (mmpose_pose_estimation.py:235-256) and
per-cost-function cumulative wall-time percentages inside the SGD loop
(`print_compute_times`, pose_refinement.py:998-1067).  TPU equivalents:

- `StepTimer` — wall-time stats per named stage with a context manager;
  `report()` prints the reference-style percentage breakdown.
- `trace` — context wrapper around `jax.profiler.trace` writing a
  TensorBoard-compatible device trace (the real way to see where TPU time
  goes; per-cost host timing is meaningless once the whole loop is one
  fused program).
- `profile_refinement_costs` — jits and times each refinement cost
  SEPARATELY on one window, recovering the reference's per-cost breakdown
  feature for tuning λ weights (the fused production loop stays fused).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

__all__ = ["StepTimer", "trace", "profile_refinement_costs"]


class StepTimer:
    """Accumulate wall time per named stage; `block_jax=True` waits for
    device work so timings mean something under async dispatch."""

    def __init__(self, block_jax: bool = True):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.block_jax = block_jax

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.block_jax:
                try:
                    (jax.device_put(0.0) + 0).block_until_ready()
                except Exception:
                    pass
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-12
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name}: {t:.3f}s ({100 * t / total:.1f}%), "
                f"{self.counts[name]} calls, {t / self.counts[name] * 1e3:.2f} ms/call"
            )
        out = "\n".join(lines)
        print(out)
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace to ``log_dir`` (view with TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_refinement_costs(refiner, window: int | None = None, n_iters: int = 20):
    """Time each refinement cost separately on one batch window.

    Returns {cost_name: seconds_per_eval}; prints a reference-style
    percentage line (pose_refinement.py:1060-1067 behaviour, measured on
    individually-jitted costs instead of inside the fused loop).
    """
    import numpy as np

    from ..refine.costs import (
        body_length_cost,
        likelihood_cost,
        nan_mean,
        precompute_cov_inverse,
    )
    from ..ops.geometry import rodrigues_vector
    from ..utils.skeleton import body_length_edges

    g = jnp.asarray(refiner.gaussians, refiner.dtype)
    B = window or g.shape[0]
    g = g[:B]
    means = g[..., :2]
    cov_inv = precompute_cov_inverse(g)
    traj = jnp.asarray(refiner.initial_trajectory[:B], refiner.dtype)
    Ks, Rs, Ts, ds = refiner._stacked_cams()
    rvecs = jnp.asarray(
        np.stack([np.asarray(rodrigues_vector(jnp.asarray(R))) for R in Rs]),
        refiner.dtype,
    )
    Ks = jnp.asarray(Ks, refiner.dtype)
    Ts = jnp.asarray(Ts, refiner.dtype)
    ds = jnp.asarray(ds, refiner.dtype)

    fns = {
        "likelihood_cost": jax.jit(
            lambda t: likelihood_cost(t, means, cov_inv, Ks, rvecs, Ts, ds)
        ),
        "smoothness_cost": jax.jit(
            lambda t: nan_mean(
                jnp.sum((t[2:] - 2 * t[1:-1] + t[:-2]) ** 2, axis=(-2, -1))
            )
        ),
    }
    if refiner.body_lengths:
        e_s, e_e, e_t = body_length_edges(refiner.body_lengths)
        fns["body_length_cost"] = jax.jit(
            lambda t: body_length_cost(
                t, jnp.asarray(e_s), jnp.asarray(e_e), jnp.asarray(e_t, refiner.dtype)
            )
        )

    times = {}
    for name, fn in fns.items():
        fn(traj).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(traj)
        out.block_until_ready()
        times[name] = (time.perf_counter() - t0) / n_iters
    total = sum(times.values())
    print(
        "Proportional cost times: "
        + ", ".join(f"{k}: {100 * v / total:.2f}%" for k, v in times.items())
    )
    return times
