"""Refinement cost functions — vectorized, jit/grad-ready.

TPU-native counterparts of the reference's torch costs
(pose_refinement.py:712-891): Gaussian reprojection log-likelihood with a
precomputed covariance inverse, second-difference smoothness, and the
scale-invariant body-length cost.  All are pure functions of
(trajectory window, static data) so `jax.grad` + optax replace torch
autograd + torch.optim.Adam.

Note on fidelity: the reference's live likelihood indexes camera 0's
Gaussians for every camera (pose_refinement.py:663, :885 — `[:, 0, :, ...]`),
which is a bug.  This implementation uses each camera's own Gaussians;
`camera0_gaussians_compat=True` on `precompute_cov_inverse`/likelihood
callers reproduces the reference behaviour if bit-parity is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import project_points

__all__ = [
    "nan_mean",
    "gaussian_log_likelihood",
    "precompute_cov_inverse",
    "likelihood_cost",
    "smoothness_cost",
    "body_length_cost",
]


def _inv2x2(cov: jax.Array) -> jax.Array:
    """Closed-form batched 2×2 inverse (TPU's generic linalg.inv lowers to
    a slow per-matrix loop, like eigh — see ops.triangulation)."""
    a = cov[..., 0, 0]
    b = cov[..., 0, 1]
    c = cov[..., 1, 0]
    d = cov[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    row0 = jnp.stack([d * inv_det, -b * inv_det], axis=-1)
    row1 = jnp.stack([-c * inv_det, a * inv_det], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _det2x2(cov: jax.Array) -> jax.Array:
    return cov[..., 0, 0] * cov[..., 1, 1] - cov[..., 0, 1] * cov[..., 1, 0]


def nan_mean(x: jax.Array) -> jax.Array:
    """Mean over finite elements (grad-preserving; reference
    pose_refinement.py:221-229)."""
    x = jnp.asarray(x)
    ok = jnp.isfinite(x)
    total = jnp.sum(jnp.where(ok, x, jnp.zeros_like(x)))
    count = jnp.sum(ok)
    return total / jnp.maximum(count, 1)


def gaussian_log_likelihood(
    x: jax.Array,
    mean: jax.Array,
    cov: jax.Array | None = None,
    cov_inv: jax.Array | None = None,
    eps: float = 1e-6,
    huber_delta: float | None = None,
    temperature: float = 1.0,
) -> jax.Array:
    """Batched 2D Gaussian log-likelihood (..., 2) -> (...).

    With ``cov_inv`` precomputed only the quadratic term is returned (the
    normalization is constant in the optimized variables — reference
    pose_refinement.py:712-761); with ``cov`` the full log-density including
    the log-det normalization is returned (reference :182-218).

    Robustness knobs (cov_inv form only; refinement guardrail, VERDICT r3
    #3 — both default to the reference-faithful pure Gaussian):

    - ``huber_delta``: Huberize the MAHALANOBIS radius m = √(diffᵀΣ⁻¹diff):
      −0.5·m² for m ≤ δ, −δ·(m − δ/2) beyond.  The gradient magnitude is
      then bounded by δ (in σ units), so a single confidently-wrong 2D
      mode cannot drag a joint arbitrarily far.
    - ``temperature``: divides the log-likelihood — tempering for
      overconfident decode covariances (τ > 1 weakens the 2D pull).
    """
    diff = x - mean
    # NaN observations (missing joints) must yield NaN log-likelihoods for
    # nan_mean to exclude — but computed through a SANITIZED branch: a plain
    # masked output still back-propagates 0·NaN = NaN into the finite
    # parameters (the torch reference dodges this because in-place
    # ``tensor[~mask] = 0`` detaches those entries from its graph).
    ok = jnp.all(jnp.isfinite(diff), axis=-1)
    diff = jnp.where(ok[..., None], diff, 0.0)
    nan = jnp.asarray(jnp.nan, diff.dtype)
    if cov_inv is not None:
        # HIGHEST: bf16 default TPU matmul precision would bias the
        # likelihood (and its gradients) at the 1e-2 level.
        m2 = jnp.einsum("...i,...ij,...j->...", diff, cov_inv, diff,
                        precision=jax.lax.Precision.HIGHEST)
        if huber_delta is not None:
            # Clamped sqrt: d√x/dx at 0 is inf — the clamp keeps gradients
            # finite exactly where the residual (and its pull) vanish.
            m = jnp.sqrt(jnp.maximum(m2, 1e-12))
            d = jnp.asarray(huber_delta, m.dtype)
            quad = -jnp.where(m <= d, 0.5 * m2, d * (m - 0.5 * d))
        else:
            quad = -0.5 * m2
        if temperature != 1.0:
            quad = quad / temperature
        return jnp.where(ok, quad, nan)
    cov = cov + eps * jnp.eye(2, dtype=cov.dtype)
    cov = jnp.where(
        ok[..., None, None], cov, jnp.eye(2, dtype=cov.dtype)
    )  # keep inv/det finite on masked rows
    ci = _inv2x2(cov)
    quad = -0.5 * jnp.einsum("...i,...ij,...j->...", diff, ci, diff,
                             precision=jax.lax.Precision.HIGHEST)
    det = _det2x2(cov)
    norm = 0.5 * jnp.log((2.0 * jnp.pi) ** 2 * det + eps)
    return jnp.where(ok, quad - norm, nan)


def precompute_cov_inverse(
    gaussians: jax.Array,
    eps: float = 1e-6,
    camera0_gaussians_compat: bool = False,
) -> jax.Array:
    """(T, C, J, 6) Gaussian params -> (T, C, J, 2, 2) covariance inverses.

    Regularized with eps·I before inversion (reference :663-668).  With
    ``camera0_gaussians_compat`` every camera gets camera 0's covariance
    (the reference bug — see module docstring).
    """
    g = jnp.asarray(gaussians)
    if camera0_gaussians_compat:
        g = jnp.broadcast_to(g[:, :1], g.shape)
    cov = g[..., 2:].reshape(g.shape[:-1] + (2, 2))
    cov = cov + eps * jnp.eye(2, dtype=cov.dtype)
    # NaN covariances (missing observations) -> identity so inv() stays
    # finite; the likelihood masks those entries via their NaN MEANS.
    ok = jnp.all(jnp.isfinite(cov), axis=(-2, -1), keepdims=True)
    cov = jnp.where(ok, cov, jnp.eye(2, dtype=cov.dtype))
    return _inv2x2(cov)


def likelihood_cost(
    trajectory: jax.Array,  # (B, J, 3)
    means: jax.Array,  # (B, C, J, 2)
    cov_inv: jax.Array,  # (B, C, J, 2, 2)
    Ks: jax.Array,  # (C, 3, 3)
    Rs: jax.Array,  # (C, 3, 3) or (C, 3) axis-angle
    Ts: jax.Array,  # (C, 3)
    dists: jax.Array,  # (C, 5)
    ignore_distortions: bool = False,
    huber_delta: float | None = None,
    temperature: float = 1.0,
) -> jax.Array:
    """Negative mean reprojection log-likelihood over all cameras/joints.

    Vectorized over cameras with vmap; NaN entries (missing joints /
    non-finite projections) drop out via nan_mean — the reference's
    missing-data mechanism.  ``huber_delta``/``temperature``: see
    `gaussian_log_likelihood`.
    """
    def per_cam(K, R, T, dist, mu, ci):
        proj = project_points(
            trajectory, K, R, T, dist_coeffs=dist, ignore_distortions=ignore_distortions
        )  # (B, J, 2)
        return gaussian_log_likelihood(
            proj, mu, cov_inv=ci, huber_delta=huber_delta,
            temperature=temperature,
        )  # (B, J)

    ll = jax.vmap(per_cam, in_axes=(0, 0, 0, 0, 1, 1))(
        Ks, Rs, Ts, dists, means, cov_inv
    )  # (C, B, J)
    return -nan_mean(ll)


def smoothness_cost(trajectory: jax.Array) -> jax.Array:
    """Mean squared second difference over the window (reference :836-845).

    ``trajectory``: (B, J, 3).  Each term is the squared Frobenius norm of
    x_t - 2x_{t-1} + x_{t-2} over (J, 3); NaN terms are excluded.
    """
    d2 = trajectory[2:] - 2.0 * trajectory[1:-1] + trajectory[:-2]  # (B-2, J, 3)
    sq = jnp.sum(d2 * d2, axis=(-2, -1))  # (B-2,)
    return nan_mean(sq)


def body_length_cost(
    trajectory: jax.Array,  # (B, J, 3)
    edge_start: jax.Array,  # (E,) int
    edge_end: jax.Array,  # (E,) int
    target_lengths: jax.Array,  # (E,) float
) -> jax.Array:
    """Scale-invariant body-segment-length error (reference :848-860).

    a = targets repeated per frame, b = actual lengths; the optimal global
    scale μ = <a,b>/<b,b> is applied before the normalized squared error
    ||a - μb||² / ||a||² — pose scale is free, proportions are constrained.
    """
    vec = trajectory[:, edge_end, :] - trajectory[:, edge_start, :]  # (B, E, 3)
    # Clamped sqrt: the gradient of sqrt(x) at x=0 is inf/NaN, and two
    # coincident joints (degenerate init, NaN-replaced rows) would poison
    # every parameter through global-norm clipping.
    lengths = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-12))  # (B, E)
    B = trajectory.shape[0]
    # Layout parity with create_body_length_vect (pose_refinement.py:768-781):
    # edge-major, each target repeated B times.
    b = lengths.T.reshape(-1)  # (E*B,) edge-major
    a = jnp.repeat(target_lengths, B)  # (E*B,)
    mu = jnp.dot(a, b) / jnp.dot(b, b)
    diff = a - mu * b
    return jnp.dot(diff, diff) / jnp.dot(a, a)
