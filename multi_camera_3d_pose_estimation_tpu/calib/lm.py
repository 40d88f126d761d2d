"""Generic jitted Levenberg-Marquardt for small dense calibration problems.

TPU-native replacement for the LM refinement hidden inside OpenCV's C++
`cv.calibrateCamera` / `cv.stereoCalibrate` / `cv.solvePnP` (the reference's
calibration boundary, SURVEY.md §2.2).  Calibration problems here are tiny
(≤ a few hundred parameters), so the whole solve is one dense normal-equation
system per step — `jacfwd` + `linalg.solve` under `lax.scan` with the
classic adaptive damping schedule.  The scan has a static trip count
(rejected steps keep the iterate, like LM's usual inner loop unrolled).

NOT jitted at this level: ``residual_fn`` is a closure that may capture
vmap/jit tracers from the caller (e.g. `stereo_calibrate`'s vmapped PnP
init), and a `static_argnums` callable hashing such a closure silently
constant-folds stale tracer values.  Callers jit/vmap the enclosing
calibration function instead; the `lax.scan` body compiles either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["levenberg_marquardt"]


def levenberg_marquardt(
    residual_fn,
    x0: jax.Array,
    n_iter: int = 50,
    lam0: float = 1e-3,
):
    """Minimize ||residual_fn(x)||² from ``x0``.

    ``residual_fn``: R^n -> R^m (static python callable).
    Returns (x, final_cost, cost_history (n_iter,)).
    """
    x0 = jnp.asarray(x0)
    n = x0.shape[0]
    eye = jnp.eye(n, dtype=x0.dtype)

    def cost(x):
        r = residual_fn(x)
        return jnp.sum(r * r)

    def step(carry, _):
        x, lam, prev = carry
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        # HIGHEST: the normal equations must not pass through TPU's
        # default bf16 matmul precision (LM stalls at ~1% residuals).
        hp = jax.lax.Precision.HIGHEST
        A = jnp.einsum("ki,kj->ij", J, J, precision=hp)
        g = jnp.einsum("ki,k->i", J, r, precision=hp)
        damp = lam * jnp.diag(jnp.diag(A)) + 1e-12 * eye
        dx = jnp.linalg.solve(A + damp, -g)
        x_new = x + dx
        new = cost(x_new)
        ok = (new < prev) & jnp.all(jnp.isfinite(x_new))
        x = jnp.where(ok, x_new, x)
        lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-12), jnp.minimum(lam * 5.0, 1e8))
        prev = jnp.where(ok, new, prev)
        return (x, lam, prev), prev

    init = (x0, jnp.asarray(lam0, x0.dtype), cost(x0))
    (x, _, final), hist = jax.lax.scan(step, init, None, length=n_iter)
    return x, final, hist
