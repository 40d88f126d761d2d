"""Jitted trajectory + extrinsics refinement (the "training loop").

TPU-native re-design of the reference's `Optimized_3d_Pose_Estimation`
(pose_refinement.py:575-1096): torch autograd + torch.optim.Adam over Python
batch loops become one `jax.jit`-compiled program — `jax.grad` of a fused
cost, `optax` Adam with global-norm clipping, a `lax.scan` over overlapping
half-stride batch windows (pose_refinement.py:786-796) inside a
`lax.while_loop` that carries the patience/early-stopping state
(pose_refinement.py:1002-1096).  One compile, then every Adam epoch runs
on-device with zero host round-trips.

Feature parity map (reference → here):
- trajectory MLE w/ precomputed cov⁻¹ (:863-891)    → `likelihood_cost`
- smoothness + body-length costs (:836-860)          → `refine.costs`
- extrinsics-from-samples cost (:800-831)            → `_sample_cost`
- axis-angle reparam + zero-jitter init (:933-943)   → `_prepare_cam_params`
- `use_NN` MLP (18→256→…→3) (:592-605, 672-683)      → `_mlp_init/_mlp_apply`
- overlapping batches, grad-clip 1.0, Adam, patience → `sgd_optimize`
- `randomize_params`, `reset_camera_params`,
  `ignore_distortions`, `time_interval` (:894-998)   → same flags

Deliberate fidelity notes:
- The reference indexes camera 0's Gaussians for every camera in both the
  likelihood means and the precomputed covariances (pose_refinement.py:663,
  :885 — `[:, 0, ...]`), a bug.  Default here is each camera's own
  Gaussians; `camera0_gaussians_compat=True` reproduces the reference.
- torch.optim.Adam keeps momenta for the whole trajectory tensor, so rows
  outside the current batch window still drift by stale momentum; optax
  Adam over the full tensor with scatter-structured grads reproduces this
  exactly (gradients of `dynamic_slice` are zero outside the window).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.geometry import project_points, rodrigues_vector
from ..ops.triangulation import triangulate_points
from .costs import (
    body_length_cost,
    likelihood_cost,
    nan_mean,
    gaussian_log_likelihood,
    precompute_cov_inverse,
)
from ..utils.skeleton import body_length_edges

__all__ = ["RefineConfig", "RefineResult", "PoseRefiner"]


@dataclass(frozen=True)
class RefineConfig:
    """Static refinement hyperparameters (hashable — one compile per config).

    Field names/defaults mirror `sgd_optimize`'s signature in the reference
    (pose_refinement.py:894) so `refinement_params_yaml` files written for it
    keep working through `io.prepare_kwargs`.
    """

    optimize_trajectory: bool = True
    lr: float = 0.001
    betas: tuple[float, float] = (0.9, 0.999)
    lambda_smooth: float = 1.0
    lambda_body_length: float = 1.0
    patience: int = 100
    tolerance: float = 1e-5
    max_iter: int = 1000
    batch_size: int | None = None
    N_sample_points: int = 100
    ignore_distortions: bool = False
    randomize_params: bool = False
    reset_camera_params: bool = False
    use_NN: bool = False
    grad_clip: float = 1.0
    camera0_gaussians_compat: bool = False
    print_frequency: int = 100
    verbose: bool = False
    checkpoint_every: int | None = None
    # Guardrail knobs (VERDICT r3 #3; all reference-faithful by default
    # except the gate, which is an exact no-op whenever it doesn't fire):
    # ``huber_delta``: Huberize the likelihood's Mahalanobis radius
    # (bounded 2D pull; None = pure Gaussian, the reference objective).
    # ``likelihood_temperature``: divide the log-likelihood (τ > 1
    # tempers overconfident decode covariances).
    # ``auto_gate``: per overlapping window, compare the INITIAL
    # trajectory's reprojection residual to the 2D noise floor the
    # Gaussians themselves claim (median squared Mahalanobis radius vs
    # ``gate_threshold``); a window already below the floor is FULLY
    # skipped — zero objective, so it keeps its initial trajectory —
    # because the 2D pull can only add variance there (measured:
    # easy-domain 9.8 → 45 mm regression, PARITY.md) and a priors-only
    # pull measured worse than no-op too (round 4, optimizer.py gate
    # comment).
    huber_delta: float | None = None
    likelihood_temperature: float = 1.0
    auto_gate: bool = True
    gate_threshold: float = 2.0


@dataclass
class RefineResult:
    """Best-cost snapshot plus per-epoch cost curves."""

    trajectory: np.ndarray  # (Tw, J, 3) refined window (best epoch)
    cam_params: dict  # camera_ID -> [K, R(3,3), T(3,), dist]
    cost_history: dict[str, np.ndarray]  # per-epoch means, length n_iter
    n_iter: int
    best_total_cost: float
    # Per-window auto-gate weights (1 = refined, 0 = below the 2D noise
    # floor → fully skipped, keeps its initial trajectory); None when
    # the gate didn't apply (RefineConfig).
    gate_weights: np.ndarray | None = None


def _mlp_init(key, in_dim: int, dtype=jnp.float32):
    """He-uniform init of the reference's 18→256→128→64→32→16→3 MLP."""
    dims = [in_dim, 256, 128, 64, 32, 16, 3]
    params = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        bound = float(np.sqrt(1.0 / dims[i]))
        W = jax.random.uniform(k1, (dims[i], dims[i + 1]), dtype, -bound, bound)
        b = jax.random.uniform(k2, (dims[i + 1],), dtype, -bound, bound)
        params.append((W, b))
    return tuple(params)


def _mlp_apply(params, x):
    """ReLU MLP over the last axis; no activation after the final layer."""
    n = len(params)
    for i, (W, b) in enumerate(params):
        x = x @ W + b
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def _clip_and_adam(grad_clip: float, lr: float, betas: tuple[float, float]):
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.scale(-lr),
    )


class PoseRefiner:
    """Joint trajectory + camera-extrinsics MLE refiner.

    Args mirror the reference constructor (pose_refinement.py:579):

    - ``gaussians``: (T, C, J, 6) per-view Gaussian moments
      [mean_x, mean_y, var_x, cov_xy, cov_xy, var_y].
    - ``initial_trajectory``: (T, J, 3) world-space initialization
      (typically the DLT triangulation, optionally linear-interpolated).
    - ``cam_params``: {camera_ID: [K (3,3), R (3,3)|None, T (3,)|None,
      dist (5,)|None]} — None R/T default to identity/zero like the
      reference (:609-613).
    - ``body_lengths``: {"left_shoulder_left_elbow": cm, ...} from
      `body_part_lengths.yaml` (None disables the body-length cost).
    """

    def __init__(
        self,
        gaussians,
        initial_trajectory,
        cam_params: dict,
        body_lengths: dict[str, float] | None = None,
        camera_ids=None,
        dtype=jnp.float32,
    ):
        self.dtype = dtype
        self.gaussians = np.asarray(gaussians, np.float64)
        self.initial_trajectory = np.asarray(initial_trajectory, np.float64)
        self.camera_ids = list(cam_params.keys()) if camera_ids is None else list(camera_ids)
        self.n_cams = self.gaussians.shape[1]
        self.n_joints = self.gaussians.shape[2]
        self.body_lengths = body_lengths

        self._initial_cam = {}
        for cid in cam_params:
            K, R, T, dist = cam_params[cid]
            R = np.eye(3) if R is None else np.asarray(R, np.float64).reshape(3, 3)
            T = np.zeros(3) if T is None else np.asarray(T, np.float64).reshape(3)
            d = np.zeros(5) if dist is None else np.asarray(dist, np.float64).reshape(-1)[:5]
            d = np.pad(d, (0, 5 - d.size)) if d.size < 5 else d
            self._initial_cam[cid] = [np.asarray(K, np.float64), R, T, d]
        # Mutable current state (persists across sgd_optimize calls like the
        # reference's self.decomposed_cam_params).
        self.cam_params = {k: [p.copy() for p in v] for k, v in self._initial_cam.items()}

    # ------------------------------------------------------------------ #

    def _stacked_cams(self):
        ids = self.camera_ids
        Ks = np.stack([self.cam_params[i][0] for i in ids])
        Rs = np.stack([self.cam_params[i][1] for i in ids])
        Ts = np.stack([self.cam_params[i][2] for i in ids])
        ds = np.stack([self.cam_params[i][3] for i in ids])
        return Ks, Rs, Ts, ds

    def sgd_optimize(
        self,
        extrinsic_optimization_IDs=(),
        GT_camera_IDs=None,
        time_interval=(0, -1),
        seed: int = 0,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        **kwargs,
    ) -> RefineResult:
        """Run the jitted Adam refinement; returns the best-cost snapshot.

        ``kwargs`` are `RefineConfig` fields (YAML-compatible with the
        reference's `refinement_params_yaml` SGD section).
        """
        if "betas" in kwargs and isinstance(kwargs["betas"], list):
            kwargs["betas"] = tuple(kwargs["betas"])
        known = {f.name for f in dataclasses.fields(RefineConfig)}
        cfg = RefineConfig(**{k: v for k, v in kwargs.items() if k in known})

        if cfg.reset_camera_params:
            self.cam_params = {
                k: [p.copy() for p in v] for k, v in self._initial_cam.items()
            }

        t0, t1 = time_interval
        t1 = self.gaussians.shape[0] if t1 in (-1, None) else t1
        gauss = self.gaussians[t0:t1]
        traj0 = self.initial_trajectory[t0:t1]
        Tw = gauss.shape[0]
        B = Tw if cfg.batch_size is None else int(cfg.batch_size)
        Tw = (Tw // B) * B  # floor to whole batches (reference :903-906)
        if Tw == 0:
            raise ValueError(f"time window ({gauss.shape[0]}) shorter than batch_size ({B})")
        gauss = gauss[:Tw]
        traj0 = traj0[:Tw]
        step = max(B // 2, 1)
        starts = np.arange(0, Tw - B + 1, step, dtype=np.int32)

        learn_extr = len(extrinsic_optimization_IDs) > 0
        learning_from_samples = learn_extr and not cfg.optimize_trajectory
        ids = self.camera_ids
        learn_mask = np.array([cid in extrinsic_optimization_IDs for cid in ids], bool)
        extr_idx = [ids.index(cid) for cid in extrinsic_optimization_IDs]

        Ks, Rs, Ts, ds = self._stacked_cams()
        rvecs = np.stack([np.asarray(rodrigues_vector(jnp.asarray(R))) for R in Rs])
        tvecs = Ts.copy()

        key = jax.random.PRNGKey(seed)
        if learn_extr:
            # Zero-jitter init so learnable zeros get gradient signal
            # (reference :940-943).
            key, kj = jax.random.split(key)
            jitter = np.asarray(jax.random.uniform(kj, rvecs.shape + (2,))) * 1e-6
            for c in extr_idx:
                rvecs[c] = np.where(rvecs[c] == 0, jitter[c, :, 0], rvecs[c])
                tvecs[c] = np.where(tvecs[c] == 0, jitter[c, :, 1], tvecs[c])

        # Gaussian means / covariance inverses the likelihood consumes.
        g = jnp.asarray(gauss, self.dtype)
        means = g[..., :2]  # (Tw, C, J, 2)
        if cfg.camera0_gaussians_compat:
            means = jnp.broadcast_to(means[:, :1], means.shape)
        cov_inv = precompute_cov_inverse(
            g, camera0_gaussians_compat=cfg.camera0_gaussians_compat
        )  # (Tw, C, J, 2, 2)

        # Auto-gate (VERDICT r3 #3): weight 0 for windows whose INITIAL
        # reprojection residual already sits below the 2D noise floor
        # claimed by the Gaussians themselves — there the MLE pull only
        # adds variance (PARITY.md easy-domain ablation).  Extrinsics-only
        # and use_NN runs are not trajectory refinements; gate off.
        gate_w = np.ones(len(starts), np.float32)
        gate_applied = (
            cfg.auto_gate and cfg.optimize_trajectory and not cfg.use_NN
            and not learning_from_samples
        )
        if gate_applied:
            gate_w = _gate_weights(
                jnp.asarray(traj0, self.dtype), means, cov_inv,
                jnp.asarray(Ks, self.dtype), jnp.asarray(Rs, self.dtype),
                jnp.asarray(Ts, self.dtype), jnp.asarray(ds, self.dtype),
                starts, B, cfg.gate_threshold, cfg.ignore_distortions,
            )
            if cfg.verbose and not gate_w.all():
                print(
                    f"auto-gate: {int((gate_w == 0).sum())}/{len(gate_w)} "
                    f"windows below the 2D noise floor — skipped"
                )

        # Body-length static index arrays.
        use_bl = self.body_lengths is not None and cfg.lambda_body_length > 0
        if use_bl:
            e_start, e_end, e_target = body_length_edges(self.body_lengths)
        else:
            e_start = e_end = np.zeros(1, np.int32)
            e_target = np.ones(1)

        # Extrinsics-from-samples: sample GT-camera Gaussians and triangulate
        # once on the host side of the jit boundary (reference :957-961).
        samples_3d = jnp.zeros((Tw, self.n_joints, 1, 3), self.dtype)
        if learning_from_samples:
            if GT_camera_IDs is None or len(GT_camera_IDs) != 2:
                raise ValueError("learning extrinsics from samples needs 2 GT_camera_IDs")
            if len(extrinsic_optimization_IDs) != 1:
                raise ValueError("exactly one extrinsic_optimization_ID supported")
            gt_idx = [ids.index(cid) for cid in GT_camera_IDs]
            key, ks = jax.random.split(key)
            samples = _sample_gaussians(ks, g[:, gt_idx], cfg.N_sample_points)
            # (Tw, J, N, 2 views, 2) like reference sample_gaussians (:693-706)
            c1 = self.cam_params[GT_camera_IDs[0]]
            c2 = self.cam_params[GT_camera_IDs[1]]
            samples_3d = triangulate_points(
                samples, c1[0], c1[3], c1[1], c1[2], c2[0], c2[3], c2[1], c2[2]
            ).astype(self.dtype)  # (Tw, J, N, 3)

        params = {
            "trajectory": jnp.asarray(traj0, self.dtype),
            "rvecs": jnp.asarray(rvecs, self.dtype),
            "tvecs": jnp.asarray(tvecs, self.dtype),
        }
        if cfg.use_NN:
            key, kn = jax.random.split(key)
            params["nn"] = _mlp_init(kn, self.n_cams * 6, self.dtype)
        if cfg.randomize_params:
            key, kr = jax.random.split(key)
            params = _randomize(kr, params, cfg, learn_mask, learn_extr)

        cost_names = _cost_names(cfg, use_bl, learning_from_samples)
        data = (
            jnp.asarray(starts),
            jnp.asarray(gate_w, self.dtype),
            means,
            cov_inv,
            g,
            samples_3d,
            jnp.asarray(Ks, self.dtype),
            jnp.asarray(ds, self.dtype),
            jnp.asarray(learn_mask),
            jnp.asarray(e_start),
            jnp.asarray(e_end),
            jnp.asarray(e_target, self.dtype),
        )
        statics = (cfg, tuple(cost_names), bool(use_bl), bool(learning_from_samples), int(B))

        tx = _clip_and_adam(cfg.grad_clip, cfg.lr, cfg.betas)
        hist0 = jnp.zeros((cfg.max_iter + 2, len(cost_names)), means.dtype)
        carry = (
            params,
            tx.init(params),
            params,
            jnp.asarray(jnp.inf, means.dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            hist0,
        )
        ckpt_path = (
            os.path.join(checkpoint_dir, "refine_state.npz") if checkpoint_dir else None
        )
        if resume and ckpt_path and os.path.exists(ckpt_path):
            carry = _load_carry(ckpt_path, carry)
            print(f"resumed refinement at epoch {int(carry[5])} from {ckpt_path}")

        # Host-stepped blocks of on-device epochs: one call when neither
        # progress printing nor checkpointing is requested (zero overhead),
        # otherwise min(print_frequency, checkpoint_every)-epoch blocks.
        block = cfg.max_iter + 2
        if cfg.verbose:
            block = min(block, max(cfg.print_frequency, 1))
        if cfg.checkpoint_every:
            block = min(block, cfg.checkpoint_every)
        while True:
            it = int(carry[5])
            block_end = jnp.asarray(min(it + block, cfg.max_iter + 1), jnp.int32)
            carry = _run_refinement(*statics, carry, block_end, *data)
            it, no_imp = int(carry[5]), int(carry[4])
            if cfg.verbose and it > 0:
                vals = np.asarray(carry[6][it - 1])
                line = ", ".join(
                    f"{n}: {v:.2e}" for n, v in zip(cost_names, vals)
                )
                print(f"Iteration {it - 1}: {line}")
            if ckpt_path:
                _save_carry(ckpt_path, carry)
            if no_imp >= cfg.patience:
                if cfg.verbose:
                    print(f"Early stopping at iteration {it - 1}.")
                break
            if it > cfg.max_iter:
                break
        _, _, best_params, best_total, _, n_iter, hist = carry
        n_iter = int(n_iter)

        best_traj = np.asarray(best_params["trajectory"], np.float64)
        best_rv = np.asarray(best_params["rvecs"], np.float64)
        best_tv = np.asarray(best_params["tvecs"], np.float64)
        from ..ops.geometry import rodrigues_matrix

        for c, cid in enumerate(ids):
            if learn_mask[c]:
                self.cam_params[cid][1] = np.asarray(rodrigues_matrix(jnp.asarray(best_rv[c])))
                self.cam_params[cid][2] = best_tv[c]

        history = {
            name: np.asarray(hist[:n_iter, i], np.float64)
            for i, name in enumerate(cost_names)
        }
        return RefineResult(
            trajectory=best_traj,
            cam_params={k: [np.asarray(p) for p in v] for k, v in self.cam_params.items()},
            cost_history=history,
            n_iter=n_iter,
            best_total_cost=float(best_total),
            gate_weights=np.asarray(gate_w) if gate_applied else None,
        )


def _save_carry(path: str, carry) -> None:
    """Flat-npz snapshot of the full optimizer state (params, Adam moments,
    best snapshot, counters, cost history) — artifact-level checkpoint/
    resume for long refinement runs (SURVEY.md §5)."""
    leaves, _ = jax.tree.flatten(carry)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{f"c{i}": np.asarray(v) for i, v in enumerate(leaves)})
    os.replace(tmp, path)


def _load_carry(path: str, template):
    flat = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = jnp.asarray(flat[f"c{i}"])
        want = jnp.shape(leaf)
        if arr.shape != want:
            # The cost-history buffer is sized (max_iter + 2, n_costs):
            # resuming with a LARGER max_iter than the checkpointed run is
            # legitimate — copy the recorded prefix into the bigger buffer.
            if (
                arr.ndim == len(want)
                and arr.shape[1:] == want[1:]
                and arr.shape[0] < want[0]
            ):
                arr = jnp.asarray(leaf).at[: arr.shape[0]].set(arr)
            else:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != expected "
                    f"{want} — config/data changed since checkpoint"
                )
        restored.append(arr.astype(jnp.asarray(leaf).dtype))
    return jax.tree.unflatten(treedef, restored)


def _cost_names(cfg: RefineConfig, use_bl: bool, from_samples: bool):
    names = ["total_cost"]
    if cfg.optimize_trajectory:
        names.append("likelihood_cost")
    if cfg.lambda_smooth > 0:
        names.append("smoothness_cost")
    if use_bl:
        names.append("body_length_cost")
    if from_samples:
        names.append("extrinsic_param_sample_cost")
    return names


def _randomize(key, params, cfg: RefineConfig, learn_mask, learn_extr):
    """normal(0, 0.1) init of learnable params (reference :976-981)."""
    new = dict(params)
    if cfg.optimize_trajectory and not cfg.use_NN:
        key, k = jax.random.split(key)
        new["trajectory"] = 0.1 * jax.random.normal(k, params["trajectory"].shape, params["trajectory"].dtype)
    if cfg.use_NN:
        leaves = []
        for W, b in params["nn"]:
            key, k1, k2 = jax.random.split(key, 3)
            leaves.append(
                (
                    0.1 * jax.random.normal(k1, W.shape, W.dtype),
                    0.1 * jax.random.normal(k2, b.shape, b.dtype),
                )
            )
        new["nn"] = tuple(leaves)
    if learn_extr and not cfg.reset_camera_params:
        key, k1, k2 = jax.random.split(key, 3)
        m = jnp.asarray(learn_mask)[:, None]
        new["rvecs"] = jnp.where(m, 0.1 * jax.random.normal(k1, params["rvecs"].shape, params["rvecs"].dtype), params["rvecs"])
        new["tvecs"] = jnp.where(m, 0.1 * jax.random.normal(k2, params["tvecs"].shape, params["tvecs"].dtype), params["tvecs"])
    return new


def _gate_weights(traj0, means, cov_inv, Ks, Rs, Ts, ds, starts, B,
                  threshold: float, ignore_dist: bool) -> np.ndarray:
    """Per-window auto-gate weights from the INITIAL trajectory.

    Residual statistic: squared Mahalanobis radius of the reprojection
    against each observed Gaussian — the decode covariances ARE the 2D
    noise floor, so a window whose median m² is below ``threshold``
    (χ²₂ median ≈ 1.39 when the trajectory is already optimal) has
    nothing for the likelihood to fix.  Host-side, one vectorized pass.
    """
    def per_cam(K, R, T, dist, mu, ci):
        proj = project_points(traj0, K, R, T, dist_coeffs=dist,
                              ignore_distortions=ignore_dist)  # (Tw, J, 2)
        diff = proj - mu
        ok = jnp.all(jnp.isfinite(diff), axis=-1)
        diff = jnp.where(ok[..., None], diff, 0.0)
        m2 = jnp.einsum("...i,...ij,...j->...", diff, ci, diff,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.where(ok, m2, jnp.nan)  # (Tw, J)

    m2 = np.asarray(jax.vmap(per_cam, in_axes=(0, 0, 0, 0, 1, 1))(
        Ks, Rs, Ts, ds, means, cov_inv
    ))  # (C, Tw, J)
    out = np.ones(len(starts), np.float32)
    for i, s in enumerate(np.asarray(starts)):
        w = m2[:, s:s + B]
        med = np.nanmedian(w) if np.isfinite(w).any() else np.nan
        if np.isfinite(med) and med < threshold:
            out[i] = 0.0
    return out


def _sample_gaussians(key, gauss_gt, n_samples: int):
    """Sample the two GT cameras' Gaussians: (Tw, 2, J, 6) -> (Tw, J, N, 2, 2).

    Cholesky sampling with an eps jitter (batched, on-device) replaces the
    reference's T×2×J Python `np.random.multivariate_normal` loop
    (pose_refinement.py:693-706); output layout matches its transpose to
    (Time, joints, N, views, xy) at :705.
    """
    mean = gauss_gt[..., :2]  # (Tw, 2, J, 2)
    cov = gauss_gt[..., 2:].reshape(gauss_gt.shape[:-1] + (2, 2))
    cov = cov + 1e-6 * jnp.eye(2, dtype=cov.dtype)
    L = jnp.linalg.cholesky(cov)  # (Tw, 2, J, 2, 2)
    z = jax.random.normal(key, mean.shape[:-1] + (n_samples, 2), mean.dtype)
    pts = mean[..., None, :] + jnp.einsum("tcjab,tcjnb->tcjna", L, z)
    # (Tw, views, J, N, 2) -> (Tw, J, N, views, 2)
    return jnp.transpose(pts, (0, 2, 3, 1, 4))


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _run_refinement(
    cfg: RefineConfig,
    cost_names: tuple[str, ...],
    use_bl: bool,
    from_samples: bool,
    batch_size: int,
    carry_in,
    block_end,
    starts,
    gate_w,
    means,
    cov_inv,
    gaussians,
    samples_3d,
    Ks,
    dists,
    learn_mask,
    e_start,
    e_end,
    e_target,
):
    """A block of Adam refinement epochs as one compiled program.

    while_loop(epochs until patience/max_iter/block_end) ∘ scan(overlapping
    windows) ∘ grad(fused cost).  Carry: (params, opt_state, best_params,
    best_total, no_improve, epoch, cost history buffer) — passed in/out so
    the host can interleave progress printing and checkpointing between
    blocks without touching the on-device loop.
    """
    B = batch_size
    J = means.shape[2]
    tx = _clip_and_adam(cfg.grad_clip, cfg.lr, cfg.betas)

    def window_loss(p, start, gate):
        z = jnp.asarray(0, start.dtype)
        traj_full = p["trajectory"]
        if cfg.use_NN:
            g_w = jax.lax.dynamic_slice(
                gaussians, (start, z, z, z), (B,) + gaussians.shape[1:]
            )  # (B, C, J, 6)
            feats = jnp.moveaxis(g_w, 1, 2).reshape(B, J, -1)  # (B, J, C*6)
            traj_w = _mlp_apply(p["nn"], feats)  # (B, J, 3)
        else:
            traj_w = jax.lax.dynamic_slice(traj_full, (start, z, z), (B, J, 3))
        means_w = jax.lax.dynamic_slice(
            means, (start, z, z, z), (B,) + means.shape[1:]
        )
        ci_w = jax.lax.dynamic_slice(
            cov_inv, (start, z, z, z, z), (B,) + cov_inv.shape[1:]
        )

        costs = {}
        if cfg.optimize_trajectory:
            costs["likelihood_cost"] = likelihood_cost(
                traj_w, means_w, ci_w, Ks, p["rvecs"], p["tvecs"], dists,
                ignore_distortions=cfg.ignore_distortions,
                huber_delta=cfg.huber_delta,
                temperature=cfg.likelihood_temperature,
            )
        if cfg.lambda_smooth > 0:
            d2 = traj_w[2:] - 2.0 * traj_w[1:-1] + traj_w[:-2]
            costs["smoothness_cost"] = cfg.lambda_smooth * nan_mean(
                jnp.sum(d2 * d2, axis=(-2, -1))
            )
        if use_bl:
            costs["body_length_cost"] = cfg.lambda_body_length * body_length_cost(
                traj_w, e_start, e_end, e_target
            )
        if from_samples:
            s_w = jax.lax.dynamic_slice(
                samples_3d, (start, z, z, z), (B,) + samples_3d.shape[1:]
            )  # (B, J, N, 3)
            costs["extrinsic_param_sample_cost"] = _sample_cost(
                s_w, means_w, ci_w, Ks, p["rvecs"], p["tvecs"], dists,
                learn_mask, cfg.ignore_distortions,
            )
        # Auto-gate: a below-noise-floor window contributes ZERO
        # objective — likelihood AND priors.  Gating only the likelihood
        # was measured WORSE (round 4, hard domain: 36.4 vs 31.8 mm
        # no-gate): with the data term off, the priors-only pull drifts a
        # window that was already at its optimum.  Zero total ⇒ zero
        # gradient ⇒ the window keeps its INITIAL trajectory exactly
        # (points shared with an ungated overlapping window still
        # update from that window).  gate is 1.0 elsewhere, a no-op.
        costs = {k: gate * v for k, v in costs.items()}
        total = sum(costs.values())
        costs["total_cost"] = total
        return total, (costs, traj_w)

    grad_fn = jax.value_and_grad(window_loss, has_aux=True)

    def mask_grads(g):
        m = learn_mask[:, None].astype(g["rvecs"].dtype)
        out = dict(g)
        out["rvecs"] = g["rvecs"] * m
        out["tvecs"] = g["tvecs"] * m
        if not cfg.optimize_trajectory or cfg.use_NN:
            out["trajectory"] = jnp.zeros_like(g["trajectory"])
        if cfg.use_NN and not cfg.optimize_trajectory:
            out["nn"] = jax.tree.map(jnp.zeros_like, g["nn"])
        return out

    def batch_step(carry, xs):
        start, gate = xs
        p, s = carry
        (_, (costs, traj_w)), grads = grad_fn(p, start, gate)
        grads = mask_grads(grads)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        if cfg.use_NN:
            # Persist the NN's window output into the trajectory buffer
            # (reference :1012-1015) — value only, no gradient.
            p = dict(p)
            z = jnp.asarray(0, start.dtype)
            p["trajectory"] = jax.lax.dynamic_update_slice(
                p["trajectory"], jax.lax.stop_gradient(traj_w), (start, z, z)
            )
        cvec = jnp.stack([costs[name] for name in cost_names])
        return (p, s), cvec

    def epoch(carry):
        p, s, best_p, best_total, no_imp, it, hist = carry
        (p, s), cvecs = jax.lax.scan(batch_step, (p, s), (starts, gate_w))
        epoch_costs = jnp.mean(cvecs, axis=0)  # (n_costs,)
        hist = jax.lax.dynamic_update_slice(
            hist, epoch_costs[None], (it, jnp.asarray(0, it.dtype))
        )
        total = epoch_costs[0]
        improved = total < best_total - cfg.tolerance
        best_p = jax.tree.map(
            lambda b, n: jnp.where(improved, n, b), best_p, p
        )
        best_total = jnp.where(improved, total, best_total)
        no_imp = jnp.where(improved, 0, no_imp + 1)
        return p, s, best_p, best_total, no_imp, it + 1, hist

    def cond(carry):
        _, _, _, _, no_imp, it, _ = carry
        return (no_imp < cfg.patience) & (it <= cfg.max_iter) & (it < block_end)

    return jax.lax.while_loop(cond, epoch, carry_in)


def _sample_cost(
    samples_3d, means_w, cov_inv_w, Ks, rvecs, tvecs, dists, learn_mask, ignore_dist
):
    """-E[log N(project(sample); cam Gaussian)] over learnable cameras.

    Vectorized counterpart of `construct_sample_cost`
    (pose_refinement.py:800-831): every camera's term is computed (static
    shapes), with non-learnable cameras masked out of the mean.
    """
    B, J, N, _ = samples_3d.shape

    def per_cam(K, rv, tv, dist, mu, ci):
        flat = samples_3d.reshape(B, J * N, 3)
        proj = project_points(
            flat, K, rv, tv, dist_coeffs=dist, ignore_distortions=ignore_dist
        ).reshape(B, J, N, 2)
        ll = gaussian_log_likelihood(
            proj, mu[:, :, None, :], cov_inv=ci[:, :, None, :, :]
        )  # (B, J, N)
        ok = jnp.isfinite(ll)
        return (
            jnp.sum(jnp.where(ok, ll, 0.0)),
            jnp.sum(ok),
        )

    tot, cnt = jax.vmap(per_cam, in_axes=(0, 0, 0, 0, 1, 1))(
        Ks, rvecs, tvecs, dists, means_w, cov_inv_w
    )  # (C,), (C,)
    m = learn_mask.astype(tot.dtype)
    denom = jnp.maximum(jnp.sum(cnt * m), 1)
    return -jnp.sum(tot * m) / denom
