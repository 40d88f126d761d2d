"""Standalone extrinsic-parameter refinement (3-camera sample MLE).

TPU-native re-design of the reference's `ExtrinsicParameterRefinement`
(pose_refinement.py:233-362): sample N 2D points per joint from the two
ground-truth cameras' heatmap Gaussians, triangulate the sample pairs to 3D,
then run Adam on the (R, T) of the third camera so the reprojected samples
are likely under that camera's own Gaussians.  The whole Adam loop is one
`lax.while_loop` under `jit` — sampling is batched Cholesky instead of the
reference's T×2×J Python `np.random.multivariate_normal` loop (:267-289),
and the per-sample Python likelihood loop (:305-312) is one batched einsum.

`R` stays a 3×3 matrix re-projected onto SO(3) by SVD after every step,
exactly like the reference (:339-341).

Fidelity note: the reference *minimizes* the mean log-likelihood
(`cost = loss(R, T)` at :331 returns +log-lik and Adam minimizes it), which
drives the parameters away from the data — a sign bug.  The default here
maximizes likelihood; pass ``minimize_likelihood_compat=True`` to reproduce
the reference's behaviour.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.geometry import project_points
from ..ops.triangulation import triangulate_points
from .costs import gaussian_log_likelihood
from .optimizer import _sample_gaussians

__all__ = ["ExtrinsicRefiner"]


class ExtrinsicRefiner:
    """Refine one camera's (R, T) from two calibrated views' Gaussians.

    Args (mirroring pose_refinement.py:234):
    - ``gaussians``: (T, 3, J, 6) Gaussian moments for exactly 3 cameras.
    - ``cam_params``: {camera_index: [K, R, T, dist]} with at least the two
      GT cameras present.
    - ``GT_camera_indices``: the two trusted views (default [0, 1]).
    - ``estimation_camera_index``: the view whose extrinsics are learned.
    """

    def __init__(
        self,
        gaussians,
        cam_params: dict,
        R_initial=None,
        T_initial=None,
        N_sample_points: int = 100,
        GT_camera_indices=(0, 1),
        estimation_camera_index: int = 2,
        dtype=jnp.float32,
    ):
        gaussians = np.asarray(gaussians, np.float64)
        if gaussians.shape[1] != 3:
            raise ValueError("ExtrinsicRefiner expects exactly 3 cameras")
        if len(GT_camera_indices) != 2:
            raise ValueError("need exactly 2 GT camera indices")
        self.gaussians = gaussians
        self.cam_params = cam_params
        self.GT_camera_indices = list(GT_camera_indices)
        self.estimation_camera_index = estimation_camera_index
        self.N_sample_points = N_sample_points
        self.dtype = dtype

        if R_initial is None and estimation_camera_index in cam_params:
            R_initial = cam_params[estimation_camera_index][1]
        if T_initial is None and estimation_camera_index in cam_params:
            T_initial = cam_params[estimation_camera_index][2]
        self.R = np.eye(3) if R_initial is None else np.asarray(R_initial, np.float64).reshape(3, 3)
        self.T = np.zeros(3) if T_initial is None else np.asarray(T_initial, np.float64).reshape(3)

    def optimize(
        self,
        learning_rate: float = 0.001,
        max_iter: int = 10000,
        patience: int = 10,
        seed: int = 0,
        minimize_likelihood_compat: bool = False,
        print_frequency: int | None = None,
    ):
        """Run the jitted Adam loop; returns ``(R (3,3), T (3,))`` best pair."""
        g = jnp.asarray(self.gaussians, self.dtype)
        key = jax.random.PRNGKey(seed)
        samples = _sample_gaussians(
            key, g[:, self.GT_camera_indices], self.N_sample_points
        )  # (T, J, N, 2 views, 2)
        c1 = self.cam_params[self.GT_camera_indices[0]]
        c2 = self.cam_params[self.GT_camera_indices[1]]
        samples_3d = triangulate_points(
            samples, c1[0], c1[3], c1[1], c1[2], c2[0], c2[3], c2[1], c2[2]
        ).astype(self.dtype)  # (T, J, N, 3)

        est_idx = self.estimation_camera_index if self.estimation_camera_index < 3 else 2
        means = g[:, est_idx, :, :2]  # (T, J, 2)
        covs = g[:, est_idx, :, 2:].reshape(g.shape[0], g.shape[2], 2, 2)
        K_est = jnp.asarray(self.cam_params[self.estimation_camera_index][0], self.dtype)
        d_est = self.cam_params[self.estimation_camera_index][3]
        d_est = jnp.zeros(5, self.dtype) if d_est is None else jnp.asarray(d_est, self.dtype).reshape(-1)[:5]

        R, T, best_R, best_T, best_cost, n_iter = _optimize(
            jnp.asarray(self.R, self.dtype),
            jnp.asarray(self.T, self.dtype),
            samples_3d,
            means,
            covs,
            K_est,
            d_est,
            float(learning_rate),
            int(max_iter),
            int(patience),
            bool(minimize_likelihood_compat),
        )
        self.R = np.asarray(best_R, np.float64)
        self.T = np.asarray(best_T, np.float64)
        self.n_iter = int(n_iter)
        self.best_cost = float(best_cost)
        if print_frequency:
            # Reference-style closing report (pose_refinement.py:355-359).
            print(
                f"Extrinsic refinement: {self.n_iter} iterations, "
                f"best cost = {self.best_cost:.2e}"
            )
        return self.R, self.T


@partial(jax.jit, static_argnums=(7, 8, 9, 10))
def _optimize(
    R0, T0, samples_3d, means, covs, K, dist,
    lr: float, max_iter: int, patience: int, minimize_compat: bool,
):
    Tn, J, N, _ = samples_3d.shape
    tx = optax.adam(lr)

    def loss(params):
        R, t = params["R"], params["T"]
        flat = samples_3d.reshape(Tn, J * N, 3)
        proj = project_points(flat, K, R, t, dist_coeffs=dist).reshape(Tn, J, N, 2)
        ll = gaussian_log_likelihood(
            proj, means[:, :, None, :], cov=jnp.broadcast_to(
                covs[:, :, None, :, :], (Tn, J, N, 2, 2)
            ),
        )
        ok = jnp.isfinite(ll)
        mean_ll = jnp.sum(jnp.where(ok, ll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
        return mean_ll if minimize_compat else -mean_ll

    grad_fn = jax.value_and_grad(loss)
    params0 = {"R": R0, "T": T0}
    state0 = tx.init(params0)

    def step(carry):
        params, state, best_p, best_cost, no_imp, it = carry
        cost, grads = grad_fn(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        # SVD re-orthogonalization (reference :339-341).
        U, _, Vt = jnp.linalg.svd(params["R"])
        params = dict(params, R=U @ Vt)
        improved = cost < best_cost
        best_p = jax.tree.map(lambda b, n: jnp.where(improved, n, b), best_p, params)
        best_cost = jnp.where(improved, cost, best_cost)
        no_imp = jnp.where(improved, 0, no_imp + 1)
        return params, state, best_p, best_cost, no_imp, it + 1

    def cond(carry):
        _, _, _, _, no_imp, it = carry
        return (no_imp < patience) & (it <= max_iter)

    init = (
        params0, state0, params0,
        jnp.asarray(jnp.inf, R0.dtype),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
    )
    params, _, best_p, best_cost, _, it = jax.lax.while_loop(cond, step, init)
    return params["R"], params["T"], best_p["R"], best_p["T"], best_cost, it
