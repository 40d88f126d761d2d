"""Batched DLT triangulation — the core kernel of the framework.

TPU-native replacement of the reference's per-point OpenCV path
(`cv.undistortPoints` + 512-point-chunked `cv.triangulatePoints`,
utils.py:1277-1336) and its scalar `DLT` spec (utils.py:19-34).  Here ALL
frames × joints × view-pairs triangulate at once: the DLT system is a 4x4
normal-equation matrix per point, solved by a batched shifted-power
smallest-eigenvector iteration — no chunk limit, no Python loops.

NaN semantics: any non-finite input coordinate for a selected view yields a
NaN 3D point (the pipeline's missing-data mechanism, SURVEY.md §5); the
eigensolver itself always sees finite matrices (masked rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import projection_matrix
from .undistort import undistort_points

__all__ = [
    "triangulate_dlt",
    "triangulate_points",
    "triangulate_top2",
    "triangulate_nview",
    "get_pose_3d",
]


def _dlt_system(pts_a, pts_b, P_a, P_b):
    """Stack the 4 DLT rows per point: (..., 4, 4).

    Rows (reference utils.py:21-25):
      y_a*P_a[2] - P_a[1],  P_a[0] - x_a*P_a[2],
      y_b*P_b[2] - P_b[1],  P_b[0] - x_b*P_b[2]
    """
    def rows(pts, P):
        x = pts[..., 0:1]
        y = pts[..., 1:2]
        r0 = y * P[..., 2, :] - P[..., 1, :]
        r1 = P[..., 0, :] - x * P[..., 2, :]
        return jnp.stack([r0, r1], axis=-2)

    return jnp.concatenate([rows(pts_a, P_a), rows(pts_b, P_b)], axis=-2)


def _smallest_eigvec_4x4(B: jax.Array, n_squarings: int = 12) -> jax.Array:
    """Eigenvector of the smallest eigenvalue of symmetric PSD (..., 4, 4).

    Shifted power method via MATRIX REPEATED SQUARING: with
    M = c·I − B (c = trace ≥ λ_max), M^(2^k) projects any start vector
    onto the smallest-λ eigenspace of B with contraction
    (gap ratio)^(2^k) — 12 squarings = an effective 4096-step power
    iteration in 12 batched 4×4 matmuls (re-normalized by the largest
    entry each squaring to stay in floating range).  Everything is
    batched MXU/VPU work.

    Measured on v5e: `jnp.linalg.eigh` lowers to a QR-iteration loop at
    ~3.7 µs per 4×4 solve (0.27 Mpts/s at scale); this measures ≈2.6 Mpts/s
    per call (12×) through the device link with value-forced timing
    (bench.py).  Plain per-step power iteration was rejected:
    it needs hundreds of steps on noisy DLT systems whose spectral gap
    is small (extrinsic-refinement sampling exposed that).
    The OpenCV/reference parity tests pin the resulting accuracy.
    """
    c = jnp.trace(B, axis1=-2, axis2=-1)[..., None, None]
    M = c * jnp.eye(4, dtype=B.dtype) - B

    def body(_, M):
        # precision=HIGHEST: on TPU the default einsum precision is bf16,
        # whose 8-bit mantissa caps the whole solve at ~1% error — these
        # are 4x4 matmuls, full f32 is free.
        M = jnp.einsum("...ij,...jk->...ik", M, M,
                       precision=jax.lax.Precision.HIGHEST)
        scale = jnp.max(jnp.abs(M), axis=(-2, -1), keepdims=True)
        return M / jnp.maximum(scale, 1e-30)

    # Unrolled (static 12 squarings): the whole batch is a few MB, so a
    # device while loop would pay per-iteration launch overhead far above
    # the 4×4-matmul math; unrolled, XLA fuses the chain (PROFILE.md).
    for i in range(n_squarings):
        M = body(i, M)
    # Deterministic start with components in every eigendirection.
    v0 = jnp.full(B.shape[:-2] + (4,), 0.5, B.dtype).at[..., 0].set(0.9)
    v = jnp.einsum("...ij,...j->...i", M, v0,
                   precision=jax.lax.Precision.HIGHEST)
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))
    return v / n


def triangulate_dlt(
    pts_a: jax.Array,
    pts_b: jax.Array,
    P_a: jax.Array,
    P_b: jax.Array,
) -> jax.Array:
    """Triangulate point pairs (..., 2) under projections (...-or-(3,4)).

    Solves min ||A h|| s.t. ||h||=1 via the smallest eigenvector of AᵀA
    (the right-singular vector of A for the smallest singular value — same
    solution as the reference's SVD at utils.py:28-34 /
    cv.triangulatePoints), then dehomogenizes.  Non-finite inputs produce
    NaN outputs.
    """
    pts_a = jnp.asarray(pts_a)
    pts_b = jnp.asarray(pts_b)
    P_a = jnp.asarray(P_a)
    P_b = jnp.asarray(P_b)

    bad = ~(
        jnp.all(jnp.isfinite(pts_a), axis=-1) & jnp.all(jnp.isfinite(pts_b), axis=-1)
    )
    safe_a = jnp.where(bad[..., None], jnp.zeros_like(pts_a), pts_a)
    safe_b = jnp.where(bad[..., None], jnp.zeros_like(pts_b), pts_b)

    A = _dlt_system(safe_a, safe_b, P_a, P_b)  # (...,4,4)
    # NO row normalization: scaling rows reweights the least-squares
    # residuals and measurably degrades noisy-data solutions (3× the
    # median error of plain SVD on a 10px-noise benchmark) — neither
    # numpy's SVD nor cv.triangulatePoints row-normalizes.
    #
    # Column equilibration (Hartley-style balancing) instead: the raw
    # null vector (X, Y, Z, 1) is scale-imbalanced when world coordinates
    # are large (|X| ~ 10²-10³ vs the homogeneous 1), which collapses the
    # eigengap between the null direction and the next eigenvector
    # (observed ratio 1 - 5e-5 on a 3m-deep rig — the power iteration
    # stalls).  Scaling each COLUMN to unit norm balances the solution
    # components without touching the residual weighting; the solution of
    # the scaled system is D·h, undone after the solve.
    colnorm = jnp.linalg.norm(A, axis=-2, keepdims=True)  # (...,1,4)
    colnorm = jnp.where(colnorm > 0, colnorm, jnp.ones_like(colnorm))
    A = A / colnorm
    B = jnp.einsum("...ki,...kj->...ij", A, A,
                   precision=jax.lax.Precision.HIGHEST)  # AᵀA, PSD (...,4,4)
    # Degenerate/bad systems -> identity so the solver stays finite.
    eye = jnp.eye(4, dtype=B.dtype)
    B = jnp.where(bad[..., None, None], eye, B)
    h = _smallest_eigvec_4x4(B)  # (...,4)
    h = h / colnorm[..., 0, :]  # undo the column scaling
    w = h[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    xyz = h[..., :3] / w[..., None]
    return jnp.where(bad[..., None], jnp.full_like(xyz, jnp.nan), xyz)


def triangulate_points(
    kpts_2d: jax.Array,
    cmtx1, dist1, R1, T1,
    cmtx2, dist2, R2, T2,
    n_undistort_iter: int = 10,
) -> jax.Array:
    """Reference-compatible two-view triangulation (utils.py:1277-1336).

    ``kpts_2d``: (..., 2 views, 2 xy) pixel coordinates.  Each view is
    undistorted (re-projected with its own camera matrix, matching the
    reference's `cv.undistortPoints(..., P=cmtx)`), then DLT-triangulated
    under P = K[R|T].  Returns (..., 3) world points — all points at once,
    no 512-point chunking.
    """
    kpts_2d = jnp.asarray(kpts_2d)
    u1 = undistort_points(kpts_2d[..., 0, :], cmtx1, dist1, P=jnp.asarray(cmtx1), n_iter=n_undistort_iter)
    u2 = undistort_points(kpts_2d[..., 1, :], cmtx2, dist2, P=jnp.asarray(cmtx2), n_iter=n_undistort_iter)
    P1 = projection_matrix(jnp.asarray(cmtx1), jnp.asarray(R1), jnp.asarray(T1))
    P2 = projection_matrix(jnp.asarray(cmtx2), jnp.asarray(R2), jnp.asarray(T2))
    return triangulate_dlt(u1, u2, P1, P2)


def triangulate_top2(
    kpts: jax.Array,
    conf: jax.Array,
    Ks: jax.Array,
    dists: jax.Array,
    Rs: jax.Array,
    Ts: jax.Array,
    n_undistort_iter: int = 10,
) -> jax.Array:
    """Confidence-gated best-two-view triangulation, fully batched.

    The reference's T×17 Python loop with per-joint `np.argsort(conf)[-2:]`
    (pose_estimation.py:30-53) becomes one gather + one batched DLT:

    - ``kpts``: (..., n_cams, 2) pixel keypoints
    - ``conf``: (..., n_cams) per-view confidences
    - ``Ks``/(n_cams,3,3), ``dists``/(n_cams,5), ``Rs``/(n_cams,3,3),
      ``Ts``/(n_cams,3): stacked per-camera parameters.

    Selection uses a stable ascending argsort and takes the last two —
    identical tie-breaking to np.argsort at pose_estimation.py:36.
    Returns (..., 3).
    """
    kpts = jnp.asarray(kpts)
    conf = jnp.asarray(conf)
    n_cams = kpts.shape[-2]
    if n_cams < 2:
        raise ValueError(
            f"triangulation needs >= 2 camera views, got {n_cams}"
        )

    # Undistort every view with its own intrinsics (vmap over cameras on the
    # second-to-last axis), re-projected into pixel units with P=K.
    und = _undistort_all_views(kpts, Ks, dists, n_undistort_iter)

    Ps = projection_matrix(jnp.asarray(Ks), jnp.asarray(Rs), jnp.asarray(Ts))  # (n_cams,3,4)

    # NaN confidences must never win the top-2: treat as -inf.
    conf_safe = jnp.where(jnp.isfinite(conf), conf, -jnp.inf)
    order = jnp.argsort(conf_safe, axis=-1, stable=True)  # ascending
    top2 = order[..., n_cams - 2 :]  # (..., 2): [second-best, best]

    pts_a = jnp.take_along_axis(und, top2[..., 0:1, None], axis=-2)[..., 0, :]
    pts_b = jnp.take_along_axis(und, top2[..., 1:2, None], axis=-2)[..., 0, :]
    P_a = Ps[top2[..., 0]]  # (...,3,4)
    P_b = Ps[top2[..., 1]]
    return triangulate_dlt(pts_a, pts_b, P_a, P_b)


def _undistort_all_views(kpts, Ks, dists, n_undistort_iter):
    """Per-view iterative undistortion, vmapped over the camera axis.

    ``kpts``: (..., n_cams, 2) → undistorted pixel coords (re-projected
    with each view's own K, the reference's `cv.undistortPoints(..., P=K)`
    convention, utils.py:1314-1315).
    """
    def undo(cam_idx_pts, K, d):
        return undistort_points(cam_idx_pts, K, d, P=K, n_iter=n_undistort_iter)

    kpts_cf = jnp.moveaxis(kpts, -2, 0)  # (n_cams, ..., 2)
    und_cf = jax.vmap(undo, in_axes=(0, 0, 0))(
        kpts_cf, jnp.asarray(Ks), jnp.asarray(dists)
    )
    return jnp.moveaxis(und_cf, 0, -2)  # (..., n_cams, 2)


def _weighted_dlt(und, Ps, w, bad):
    """Weighted n-view DLT solve: min Σ_c w_c ||A_c h||², ||h||=1.

    - ``und``: (..., C, 2) undistorted pixel points (finite — sanitize first)
    - ``Ps``: (C, 3, 4) projection matrices
    - ``w``: (..., C) non-negative per-view weights (0 drops the view)
    - ``bad``: (...) mask of unsolvable points (→ NaN output)

    Same smallest-eigenvector engine and Hartley-style column
    equilibration as `triangulate_dlt`, just with 2C stacked rows — the
    normal matrix stays 4×4 regardless of the view count, so the batched
    solver's cost is independent of C.
    """
    x = und[..., 0:1]
    y = und[..., 1:2]
    r0 = y * Ps[..., 2, :] - Ps[..., 1, :]  # (..., C, 4)
    r1 = Ps[..., 0, :] - x * Ps[..., 2, :]
    A = jnp.stack([r0, r1], axis=-2)  # (..., C, 2, 4)
    A = A * jnp.sqrt(w)[..., None, None]
    A = A.reshape(A.shape[:-3] + (2 * A.shape[-3], 4))  # (..., 2C, 4)

    colnorm = jnp.linalg.norm(A, axis=-2, keepdims=True)  # (..., 1, 4)
    colnorm = jnp.where(colnorm > 0, colnorm, jnp.ones_like(colnorm))
    A = A / colnorm
    B = jnp.einsum("...ki,...kj->...ij", A, A,
                   precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(4, dtype=B.dtype)
    B = jnp.where(bad[..., None, None], eye, B)
    h = _smallest_eigvec_4x4(B)
    h = h / colnorm[..., 0, :]
    wh = h[..., 3]
    wh = jnp.where(jnp.abs(wh) < 1e-12, jnp.where(wh < 0, -1e-12, 1e-12), wh)
    xyz = h[..., :3] / wh[..., None]
    return jnp.where(bad[..., None], jnp.full_like(xyz, jnp.nan), xyz)


def triangulate_nview(
    kpts: jax.Array,
    conf: jax.Array,
    Ks: jax.Array,
    dists: jax.Array,
    Rs: jax.Array,
    Ts: jax.Array,
    n_undistort_iter: int = 10,
    conf_weighted: bool = True,
    reject_sigma: float = 2.5,
    sigma_floor_px: float = 1.0,
    min_views: int = 2,
) -> jax.Array:
    """Robust confidence-weighted DLT over ALL finite views (opt-in).

    Beyond-reference accuracy lever (VERDICT r4 #3): the reference — and
    our parity-default `triangulate_top2` — triangulates from only the two
    most-confident views (pose_estimation.py:35-41), so a single occluded/
    corrupted view inside the top-2 has no third-view recourse.  Here every
    finite view contributes DLT rows weighted by its confidence, made
    robust by exhaustive leave-one-out consensus:

    1. C+1 hypotheses, each a weighted DLT solve: all views, plus each
       single view excluded.  (A plain all-view LS pass is NOT a usable
       robust init: a high-confidence 60 px outlier drags the fit far
       enough that every view's residual looks equally bad — measured on
       the corrupted-view fixture.  Excluding the outlier is the only
       hypothesis with a small consensus residual.)
    2. Score each hypothesis by the MEDIAN squared reprojection residual
       of its included views (undistorted pixel space); pick the best.
    3. Reject views whose residual against the best hypothesis exceeds
       ``reject_sigma``·max(median residual, ``sigma_floor_px``) — unless
       fewer than ``min_views`` would survive, in which case all valid
       views are kept.
    4. Final confidence-weighted DLT over the surviving views.

    All hypotheses solve as one batched 4×4 eigenproblem (the normal
    matrix is 4×4 regardless of view count), so the cost is C+2 batched
    solves total — static shapes, no data-dependent control flow.

    Same argument/return contract as `triangulate_top2`; NaN where fewer
    than two finite views.
    """
    kpts = jnp.asarray(kpts)
    conf = jnp.asarray(conf)
    n_cams = kpts.shape[-2]
    if n_cams < 2:
        raise ValueError(f"triangulation needs >= 2 camera views, got {n_cams}")

    und = _undistort_all_views(kpts, Ks, dists, n_undistort_iter)
    Ps = projection_matrix(jnp.asarray(Ks), jnp.asarray(Rs), jnp.asarray(Ts))

    finite = jnp.all(jnp.isfinite(und), axis=-1) & jnp.isfinite(conf)
    und_safe = jnp.where(finite[..., None], jnp.nan_to_num(und), 0.0)
    n_valid = jnp.sum(finite, axis=-1)
    bad = n_valid < 2

    if conf_weighted:
        # Valid views never get a hard zero from conf==0: a tiny floor
        # keeps them in the system (they are still out-voted by any
        # confident view) and keeps the normal matrix well-posed.
        w0 = jnp.where(finite, jnp.maximum(jnp.clip(conf, 0.0), 1e-3), 0.0)
    else:
        w0 = finite.astype(und.dtype)

    def _residuals2(X, target):
        """Squared reprojection residual per view; X (..., 3) vs
        ``target`` (..., C, 2) -> (..., C)."""
        Xh = jnp.concatenate(
            [jnp.nan_to_num(X), jnp.ones(X.shape[:-1] + (1,), X.dtype)],
            axis=-1)
        proj = jnp.einsum("cij,...j->...ci", Ps, Xh)  # (..., C, 3)
        z = proj[..., 2:3]
        z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        uv = proj[..., :2] / z
        return jnp.sum((uv - target) ** 2, axis=-1)

    def _masked_median(r2, mask):
        """Lower median of r2 over mask=True entries (inf-padded sort)."""
        r2s = jnp.sort(jnp.where(mask, r2, jnp.inf), axis=-1)
        n = jnp.sum(mask, axis=-1)
        k = jnp.maximum(n - 1, 0) // 2
        med = jnp.take_along_axis(r2s, k[..., None], axis=-1)[..., 0]
        return jnp.where(jnp.isfinite(med), med, jnp.inf)

    # Hypotheses: all-in + each view left out once -> (..., C+1, C) weights.
    eye = jnp.eye(n_cams, dtype=w0.dtype)
    w_hyp = jnp.concatenate(
        [w0[..., None, :], w0[..., None, :] * (1.0 - eye)], axis=-2)
    inc = (w_hyp > 0)
    hyp_ok = jnp.sum(inc, axis=-1) >= 2
    X_hyp = _weighted_dlt(und_safe[..., None, :, :], Ps, w_hyp, ~hyp_ok)
    r2_hyp = _residuals2(X_hyp, und_safe[..., None, :, :])  # (...,C+1,C)
    score = _masked_median(r2_hyp, inc & finite[..., None, :])
    score = jnp.where(hyp_ok, score, jnp.inf)
    best = jnp.argmin(score, axis=-1)  # ties -> all-in (index 0) wins
    X_best = jnp.take_along_axis(
        X_hyp, best[..., None, None], axis=-2)[..., 0, :]

    # Rejection pass against the best consensus point.
    r2 = _residuals2(X_best, und_safe)
    med_r2 = _masked_median(r2, finite)
    med_r2 = jnp.where(jnp.isfinite(med_r2), med_r2, 0.0)
    thresh = (reject_sigma ** 2) * jnp.maximum(med_r2, sigma_floor_px ** 2)
    keep = finite & (r2 <= thresh[..., None])
    enough = jnp.sum(keep, axis=-1) >= min_views
    w1 = jnp.where(enough[..., None], w0 * keep, w0)

    return _weighted_dlt(und_safe, Ps, w1, bad)


def get_pose_3d(
    kpts_2d,
    camera_params: dict,
    camera_indices=None,
    world_trans_rot=None,
    ignore_nonlinear_distortions: bool = False,
    method: str = "top2",
):
    """Lift cached 2D keypoints to 3D — reference `get_pose_3D` entry
    (pose_estimation.py:11-65), fully batched (BASELINE config 1: 2-cam
    COCO-17 DLT triangulation from cached keypoints).

    - ``kpts_2d``: (T, K, 3, C) reference wire layout (x, y, conf,
      camera-last — pose_estimation.py:135).
    - ``camera_params``: {camera_ID: [K, R, T, dist]} (the
      `get_params_from_name` layout, utils.py:807-828).
    - ``camera_indices``: subset of camera IDs to consider (default all).
    - ``world_trans_rot``: optional (R_W0, T_W0) — output is rotated into
      that world frame by R_W0⁻¹ like the reference (:60-62).

    The T×K Python loop with per-joint `np.argsort(conf)[-2:]` becomes one
    vmapped gather + batched DLT.  (The reference then indexes its camera
    dict with subset positions — a bug when IDs aren't 0..C-1; here the
    selected subset's own parameters are used.)

    ``method``: "top2" (reference-parity default, pose_estimation.py:35-41)
    or "nview" (robust confidence-weighted all-view DLT with one
    residual-rejection pass — `triangulate_nview`, beyond-reference).
    Returns (T, K, 3) float with NaN where fewer than two finite views.
    """
    import numpy as np

    kpts_2d = jnp.asarray(np.asarray(kpts_2d, np.float64))
    ids = list(camera_params.keys())
    if camera_indices is None:
        camera_indices = ids
    pos = [ids.index(c) for c in camera_indices]

    Ks, Rs, Ts, ds = [], [], [], []
    for cid in camera_indices:
        Kc, Rc, Tc, dc = camera_params[cid]
        Ks.append(np.asarray(Kc, np.float64))
        Rs.append(np.eye(3) if Rc is None else np.asarray(Rc, np.float64).reshape(3, 3))
        Ts.append(np.zeros(3) if Tc is None else np.asarray(Tc, np.float64).reshape(3))
        d = np.zeros(5) if dc is None else np.asarray(dc, np.float64).reshape(-1)[:5]
        ds.append(np.pad(d, (0, 5 - d.size)) if d.size < 5 else d)
    if ignore_nonlinear_distortions:
        ds = [d * 0 for d in ds]

    sub = kpts_2d[..., pos]  # (T, K, 3, C_sel)
    xy = jnp.swapaxes(sub[:, :, :2, :], -1, -2)  # (T, K, C_sel, 2)
    conf = (
        sub[:, :, 2, :]  # (T, K, C_sel) — camera already last
        if sub.shape[2] > 2
        else jnp.ones(xy.shape[:-1], xy.dtype)
    )
    tri = {"top2": triangulate_top2, "nview": triangulate_nview}
    if method not in tri:
        raise ValueError(f"unknown triangulation method '{method}'")
    p3ds = tri[method](
        xy,
        conf,
        jnp.asarray(np.stack(Ks)),
        jnp.asarray(np.stack(ds)),
        jnp.asarray(np.stack(Rs)),
        jnp.asarray(np.stack(Ts)),
    )
    if world_trans_rot is not None:
        R_W0, _T_W0 = world_trans_rot
        R_inv = jnp.linalg.inv(jnp.asarray(np.asarray(R_W0, np.float64)))
        p3ds = jnp.einsum("ij,tpj->tpi", R_inv, p3ds)
    return p3ds
