"""Model-level accuracy machinery: flip-shift convention pin + harness smoke.

The statistical version of the flip-shift pin (trained weights, full
budget) runs in examples/accuracy_harness.py and its numbers land in
PARITY.md; here the convention is pinned DETERMINISTICALLY with an ideal
synthetic model, and the harness machinery is smoke-tested at a tiny
budget (VERDICT r1 items 5/8 and "What's weak" #3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_camera_3d_pose_estimation_tpu.models import TopDownEstimator
from multi_camera_3d_pose_estimation_tpu.models.topdown import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)


class IdealHeatmapModel:
    """A 'perfectly trained' heatmap model: finds the bright dot in the
    crop by centre-of-mass and renders a Gaussian at dot/stride — exactly
    the h = x/stride convention heatmap training targets use
    (training.targets.render_heatmap_targets renders at kp_crop/4).

    Mirror-equivariant by construction, so flip-TTA error comes ONLY from
    the heatmap-grid geometry — isolating the shift convention.
    """

    num_joints = 17

    def apply(self, variables, crops, train: bool = False):
        x = crops * IMAGENET_STD + IMAGENET_MEAN  # undo normalization
        lum = jnp.clip(x.mean(-1), 0.0, None)  # (B, H, W)
        B, H, W = lum.shape
        xs = jnp.arange(W, dtype=jnp.float32)
        ys = jnp.arange(H, dtype=jnp.float32)
        mass = jnp.sum(lum, axis=(1, 2), keepdims=False)
        cx = jnp.sum(lum * xs[None, None, :], axis=(1, 2)) / mass
        cy = jnp.sum(lum * ys[None, :, None], axis=(1, 2)) / mass
        h, w = H // 4, W // 4
        hx = cx / 4.0
        hy = cy / 4.0
        gx = jnp.arange(w, dtype=jnp.float32)
        gy = jnp.arange(h, dtype=jnp.float32)
        d2 = ((gx[None, None, :] - hx[:, None, None]) ** 2
              + (gy[None, :, None] - hy[:, None, None]) ** 2)
        heat = jnp.exp(-d2 / (2.0 * 1.5 ** 2))  # (B, h, w)
        return jnp.repeat(heat[..., None], self.num_joints, axis=-1)


def _dot_frames(xs_px, ys_px, size=96):
    B = len(xs_px)
    frames = np.zeros((B, size, size, 3), np.float32)
    for i, (x, y) in enumerate(zip(xs_px, ys_px)):
        frames[i, y, x] = 1.0
    return frames


def _flip_err(flip_shift: bool, flip_test: bool = True):
    model = IdealHeatmapModel()
    est = TopDownEstimator(model, {}, input_size=(96, 96), decode="heatmap",
                           flip_test=flip_test, flip_shift=flip_shift,
                           bbox_padding=1.0)
    rng = np.random.default_rng(0)
    xs = rng.integers(20, 76, 40)
    ys = rng.integers(20, 76, 40)
    frames = _dot_frames(xs, ys)
    out = est.predict_batch(frames)
    kx = np.asarray(out["keypoints"])[:, 0, 0]
    return float(np.abs(kx - xs).mean())


def test_flip_shift_convention_pinned():
    """Under x = h·stride decode, the one-pixel shift must beat no-shift.

    Geometry: unshifted mirror-back biases the flipped branch by
    -(s-1)/s hm px; the +1 shift leaves +1/s.  Averaged with the direct
    branch: ±half that.  Measured against an ideal mirror-equivariant
    model so ONLY the convention differs."""
    err_shift = _flip_err(True)
    err_noshift = _flip_err(False)
    err_plain = _flip_err(True, flip_test=False)
    assert err_shift < err_noshift - 0.5, (err_shift, err_noshift)
    # and flip with shift stays in the same error class as no TTA at all
    assert err_shift < err_plain + 1.0, (err_shift, err_plain)


@pytest.mark.slow
def test_accuracy_harness_smoke():
    """Tiny-budget end-to-end run: structure + detector sanity only."""
    from multi_camera_3d_pose_estimation_tpu.training import run_accuracy_harness

    m = run_accuracy_harness(n_frames=4, det_steps=25, pose_steps=25)
    for key in ("mpjpe_3d", "px_err_2d", "px_err_flip_shift",
                "px_err_flip_noshift", "det_tight_frac", "det_loss",
                "pose_loss"):
        assert key in m and np.isfinite(m[key]), (key, m)
    assert 0.0 <= m["det_tight_frac"] <= 1.0


def test_distorted_oracle_roundtrip():
    """The float64 oracle's distortion forward model must be inverted by
    the pipeline's iterative undistortion to well below a pixel — the
    contract that makes the distorted-rig harness meaningful."""
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.ops.undistort import undistort_points
    from multi_camera_3d_pose_estimation_tpu.training.synthetic import (
        make_rig,
        project_oracle,
    )

    cams = make_rig(n_cams=2, distortion=True)
    rng = np.random.default_rng(3)
    pts3d = rng.uniform([-60, -70, 260], [60, 40, 380], (50, 3))
    for K, R, T, dist in cams:
        assert np.any(dist), "make_rig(distortion=True) must set coefficients"
        proj_d = project_oracle(pts3d, K, R, T, dist)
        proj_p = project_oracle(pts3d, K, R, T, None)
        # The lens must actually bend: distorted != pinhole.
        assert np.abs(proj_d - proj_p).max() > 1.0
        undone = np.asarray(
            undistort_points(jnp.asarray(proj_d, jnp.float32), K, dist, P=K)
        )
        err = np.linalg.norm(undone - proj_p, axis=-1)
        assert err.max() < 0.05, err.max()


def test_hard_domain_renders():
    """Hard-mode scenes produce clutter/occluders/distractors without
    breaking shapes or labels."""
    from multi_camera_3d_pose_estimation_tpu.training.synthetic import (
        SyntheticSceneConfig,
    )

    scene = SyntheticSceneConfig(n_cams=2, seed=5, hard=True,
                                 occluder_prob=1.0, distractor_prob=1.0)
    traj = scene.trajectory(3)
    frames, projs, boxes = scene.render_views(traj[0])
    assert frames.shape == (2, 256, 256, 3)
    assert projs.shape == (2, 17, 2)
    # Hard backgrounds are bright/cluttered vs the easy dark-noise floor.
    easy = SyntheticSceneConfig(n_cams=2, seed=5)
    f_easy, _, _ = easy.render_views(easy.trajectory(3)[0])
    assert frames.mean() > f_easy.mean() + 10
    # Training-view sampler honours the domain too.
    fr, proj = scene.render_training_view(scene.sample_pose(), scene.cams[0])
    assert fr.shape == (256, 256, 3) and proj.shape == (17, 2)
    # Scale variation: sampled poses differ in extent.
    exts = [np.ptp(scene.sample_pose()[:, 1]) for _ in range(6)]
    assert np.ptp(exts) > 5.0, exts


@pytest.mark.slow
def test_accuracy_harness_distortion_sgd_smoke():
    """Tiny-budget harness through the NEW paths: distorted rig, hard
    domain, SGD refinement chained — structure/finiteness only."""
    from multi_camera_3d_pose_estimation_tpu.training import run_accuracy_harness

    m = run_accuracy_harness(
        n_frames=4, det_steps=10, pose_steps=10, distortion=True, hard=True,
        sgd_refine=True,
        sgd_kwargs=dict(max_iter=25, patience=30, batch_size=4),
    )
    assert m["distortion"] is True and m["hard"] is True
    for key in ("mpjpe_3d", "mpjpe_3d_sgd", "mpjpe_3d_refined"):
        assert key in m and np.isfinite(m[key]), (key, m)


def test_accuracy_harness_swin_smoke():
    """Swin family through the family-aware train→deploy harness
    (train_synthetic_pose dispatches on the registry family)."""
    from multi_camera_3d_pose_estimation_tpu.training import run_accuracy_harness

    m = run_accuracy_harness(n_frames=2, det_steps=10, pose_steps=10,
                             pose_model_name="test_swin_128")
    for key in ("mpjpe_3d", "px_err_2d", "det_tight_frac", "pose_loss"):
        assert key in m and np.isfinite(m[key]), (key, m)
    assert m["pose_family"] == "heatmap"


@pytest.mark.slow
def test_accuracy_harness_simcc_smoke():
    """SimCC family (RTMPose-t, BASELINE config 3) through the same
    train→deploy harness; flip-shift keys are heatmap-only by design."""
    from multi_camera_3d_pose_estimation_tpu.training import run_accuracy_harness

    m = run_accuracy_harness(n_frames=2, det_steps=10, pose_steps=10,
                             pose_family="simcc")
    for key in ("mpjpe_3d", "px_err_2d", "det_tight_frac", "pose_loss"):
        assert key in m and np.isfinite(m[key]), (key, m)
    assert m["pose_family"] == "simcc"
    assert "px_err_flip_shift" not in m


@pytest.mark.slow
def test_pose_trainer_checkpoint_resume(tmp_path):
    """The synthetic pose trainer must save periodic TrainState
    checkpoints and resume from them: a killed full-budget TPU run
    (device-tunnel flake) restarts where it left off, optimizer state —
    and thus the warmup+cosine position — included."""
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.training.harness import (
        train_synthetic_pose,
    )
    from multi_camera_3d_pose_estimation_tpu.training.synthetic import (
        SyntheticSceneConfig,
    )

    ckpt = str(tmp_path / "pose.npz")
    scene = SyntheticSceneConfig(n_cams=2, seed=3)
    kw = dict(batch=2, model_name="test_tiny", checkpoint_path=ckpt,
              checkpoint_every=2)
    _, v4, _, _ = train_synthetic_pose(scene, steps=4, **kw)
    import numpy as np

    flat = np.load(ckpt)
    assert int(flat["step"]) == 4

    # Second call with a larger budget resumes from step 4 — and from the
    # SAVED weights: its step-4 state must equal the checkpoint.
    _, v8, _, _ = train_synthetic_pose(scene, steps=8, **kw)
    flat = np.load(ckpt)
    assert int(flat["step"]) == 8

    # Fully-complete checkpoint: a third call trains zero steps and
    # returns the checkpointed weights unchanged — and a None loss (no
    # step ran, so there is no final loss; inf would poison the strict
    # JSON the harness artifacts use).
    _, v8b, _, loss = train_synthetic_pose(scene, steps=8, **kw)
    assert loss is None
    a = jax.tree.leaves(v8["params"])
    b = jax.tree.leaves(v8b["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
