"""Sharded pipeline tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_camera_3d_pose_estimation_tpu.models import HRNet, TopDownEstimator
from multi_camera_3d_pose_estimation_tpu.parallel import (
    ShardedPosePipeline,
    data_sharding,
    make_mesh,
    replicated,
    sharded_refine_step,
)

SMALL = {"widths": (8, 16, 32, 64), "modules": (1, 1, 1, 1), "stem": 16}


@pytest.fixture(scope="module")
def small_pipeline_parts():
    model = HRNet(num_joints=17, cfg=SMALL, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))
    est = TopDownEstimator(model, variables, input_size=(32, 64), decode="heatmap")
    C = 2
    cam_stack = {
        "K": np.tile(np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1]]), (C, 1, 1)),
        "R": np.stack([np.eye(3)] * C),
        "T": np.stack([np.zeros(3), np.array([-30.0, 0, 0])]),
        "dist": np.zeros((C, 5)),
    }
    return est, cam_stack


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_mesh_too_many_devices():
    with pytest.raises(ValueError, match="need 64 devices"):
        make_mesh(64)


def test_sharded_pipeline_matches_single_device(small_pipeline_parts):
    est, cam_stack = small_pipeline_parts
    rng = np.random.default_rng(0)
    frames = rng.uniform(size=(8, 2, 120, 160, 3)).astype(np.float32)

    single = ShardedPosePipeline(est, cam_stack, mesh=None)
    mesh = make_mesh(8)
    sharded = ShardedPosePipeline(est, cam_stack, mesh=mesh)

    out_s = single.run(frames)
    out_m = sharded.run(frames)
    for key in ("kpts_2d", "heatmaps_2d", "kpts_3d"):
        # rtol 5e-4: sharded vs single-device reduction order wiggles the
        # last float32 bits of the large covariance moments.
        np.testing.assert_allclose(
            np.asarray(out_s[key]), np.asarray(out_m[key]), rtol=5e-4, atol=1e-4,
            err_msg=key, equal_nan=True,
        )


def test_donated_frames_pipeline_matches(small_pipeline_parts):
    """donate_frames is an accepted no-op (no dtype can alias the bf16
    pixel path — ShardedPosePipeline.__init__): results identical to the
    plain pipeline AND no 'donated buffers were not usable' warning."""
    import warnings

    est, cam_stack = small_pipeline_parts
    rng = np.random.default_rng(1)
    frames = rng.uniform(size=(4, 2, 120, 160, 3)).astype(np.float32)

    plain = ShardedPosePipeline(est, cam_stack)
    donated = ShardedPosePipeline(est, cam_stack, donate_frames=True)
    out_p = plain.run(frames)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any donation warning -> failure
        out_d1 = donated.run(frames.copy())
        out_d2 = donated.run(frames.copy())
    for key in ("kpts_2d", "heatmaps_2d", "kpts_3d"):
        np.testing.assert_allclose(
            np.asarray(out_p[key]), np.asarray(out_d1[key]),
            rtol=1e-6, atol=1e-6, err_msg=key, equal_nan=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_d1[key]), np.asarray(out_d2[key]),
            rtol=0, atol=0, err_msg=key, equal_nan=True,
        )


def test_sharded_pipeline_wire_shapes(small_pipeline_parts):
    est, cam_stack = small_pipeline_parts
    mesh = make_mesh(8)
    pipe = ShardedPosePipeline(est, cam_stack, mesh=mesh)
    frames = np.zeros((8, 2, 64, 64, 3), np.float32)
    out = pipe.run(frames)
    # Reference wire format (SURVEY.md §1 dataflow table).
    assert out["kpts_2d"].shape == (8, 17, 3, 2)
    assert out["heatmaps_2d"].shape == (8, 2, 17, 6)
    assert out["kpts_3d"].shape == (8, 17, 3)


def test_sharded_refine_step_decreases_loss():
    mesh = make_mesh(8)
    N, B, C, J = 16, 4, 2, 5
    rng = np.random.default_rng(0)
    step, tx = sharded_refine_step(mesh, lr=0.05, lambda_smooth=0.0)
    params = {
        "traj": jax.device_put(
            jnp.asarray(rng.normal(0, 1, (N, B, J, 3)) + np.array([0, 0, 300.0]), jnp.float32),
            data_sharding(mesh, 4),
        ),
        "rvecs": jax.device_put(jnp.full((C, 3), 1e-4, jnp.float32), replicated(mesh)),
        "tvecs": jax.device_put(
            jnp.asarray(np.stack([np.zeros(3), [-30.0, 0, 0]]), jnp.float32),
            replicated(mesh),
        ),
    }
    K = jnp.asarray([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]], jnp.float32)
    batch = {
        "means": jax.device_put(
            jnp.asarray(rng.uniform(20, 140, (N, B, C, J, 2)), jnp.float32),
            data_sharding(mesh, 5),
        ),
        "cov_inv": jax.device_put(
            jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) / 25.0, (N, B, C, J, 2, 2)),
            data_sharding(mesh, 6),
        ),
        "Ks": jax.device_put(jnp.broadcast_to(K, (C, 3, 3)), replicated(mesh)),
        "dists": jax.device_put(jnp.zeros((C, 5), jnp.float32), replicated(mesh)),
    }
    opt_state = tx.init(params)
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()
    # Extrinsics stayed replicated and finite.
    assert np.isfinite(np.asarray(params["rvecs"])).all()


@pytest.mark.slow
def test_run_clips_batched(small_pipeline_parts):
    from multi_camera_3d_pose_estimation_tpu.parallel import run_clips_batched

    est, cam_stack = small_pipeline_parts
    pipe = ShardedPosePipeline(est, cam_stack, mesh=None)
    rng = np.random.default_rng(0)
    clips = rng.uniform(size=(3, 4, 2, 64, 64, 3)).astype(np.float32)
    results = run_clips_batched(pipe, clips)
    assert len(results) == 3
    assert results[0]["kpts_3d"].shape == (4, 17, 3)
    # Per-clip results equal the clip processed alone.
    solo = pipe.run(clips[1])
    np.testing.assert_allclose(
        np.asarray(results[1]["kpts_3d"]), np.asarray(solo["kpts_3d"]),
        rtol=1e-5, atol=1e-5, equal_nan=True,
    )


def test_sharded_pipeline_simcc_path():
    """The non-heatmap decode family through the full jitted pipeline."""
    from multi_camera_3d_pose_estimation_tpu.models import RTMPose, TopDownEstimator

    model = RTMPose(
        num_joints=17, input_size=(32, 64),
        cfg={"widen": 0.125, "deepen": 0.167, "embed": 32}, dtype=jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))
    est = TopDownEstimator(model, variables, input_size=(32, 64), decode="simcc")
    C = 2
    cam_stack = {
        "K": np.tile(np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1]]), (C, 1, 1)),
        "R": np.stack([np.eye(3)] * C),
        "T": np.stack([np.zeros(3), np.array([-30.0, 0, 0])]),
        "dist": np.zeros((C, 5)),
    }
    pipe = ShardedPosePipeline(est, cam_stack, mesh=make_mesh(8), conf_threshold=-1.0)
    frames = np.random.default_rng(1).uniform(size=(8, 2, 96, 96, 3)).astype(np.float32)
    out = pipe.run(frames)
    assert out["kpts_2d"].shape == (8, 17, 3, 2)
    assert out["heatmaps_2d"].shape == (8, 2, 17, 6)
    assert out["kpts_3d"].shape == (8, 17, 3)
    assert np.isfinite(np.asarray(out["heatmaps_2d"])).all()


def test_run_clips_batched_unsplit(small_pipeline_parts):
    from multi_camera_3d_pose_estimation_tpu.parallel import run_clips_batched

    est, cam_stack = small_pipeline_parts
    pipe = ShardedPosePipeline(est, cam_stack, mesh=None)
    clips = np.random.default_rng(2).uniform(size=(3, 4, 2, 64, 64, 3)).astype(np.float32)
    stacked = run_clips_batched(pipe, clips, split=False)
    assert stacked["kpts_3d"].shape == (3, 4, 17, 3)
    per_clip = run_clips_batched(pipe, clips, split=True)
    np.testing.assert_allclose(
        np.asarray(stacked["kpts_3d"][2]), np.asarray(per_clip[2]["kpts_3d"]),
        equal_nan=True,
    )


@pytest.mark.slow
def test_clip_mesh_2d_clips_outer(small_pipeline_parts):
    """DCN-aware 2-D mesh: clips-major over the outer axis, frames inner.

    On one process the 8 virtual devices form a 2x4 grid; the flattened
    clip·time axis shards over BOTH axes and results must match the
    single-device run exactly (multi-host layout, single-host numerics).
    """
    from multi_camera_3d_pose_estimation_tpu.parallel import (
        make_clip_mesh,
        run_clips_batched,
    )

    est, cam_stack = small_pipeline_parts
    mesh = make_clip_mesh(2, 4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("clips", "data")

    pipe2d = ShardedPosePipeline(est, cam_stack, mesh=mesh)
    pipe1 = ShardedPosePipeline(est, cam_stack, mesh=None)
    clips = np.random.default_rng(5).uniform(size=(2, 4, 2, 64, 64, 3)).astype(np.float32)
    out2d = run_clips_batched(pipe2d, clips, split=False)
    out1 = run_clips_batched(pipe1, clips, split=False)
    np.testing.assert_allclose(
        np.asarray(out2d["kpts_3d"]), np.asarray(out1["kpts_3d"]),
        rtol=5e-4, atol=1e-4, equal_nan=True,
    )


def test_multiprocess_distributed_mesh(tmp_path):
    """REAL multi-host path: two OS processes, jax.distributed, gloo
    collectives, 2x4 clip mesh, global reduction agrees in both."""
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = textwrap.dedent(
        """
        import os, sys
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                    "AXON_LOOPBACK_RELAY"):
            os.environ.pop(var, None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        sys.path.insert(0, sys.argv[3])
        import jax
        jax.config.update("jax_platforms", "cpu")
        pid = int(sys.argv[1]); port = sys.argv[2]
        from multi_camera_3d_pose_estimation_tpu.parallel import (
            init_distributed, make_clip_mesh, data_sharding)
        init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P
        assert len(jax.devices()) == 8
        mesh = make_clip_mesh()
        assert mesh.devices.shape == (2, 4)
        sharding = data_sharding(mesh, 2)
        full = np.arange(48, dtype=np.float32).reshape(16, 3)
        local = full[pid * 8 : (pid + 1) * 8]
        arrs = [jax.device_put(local[i * 2 : (i + 1) * 2], d)
                for i, d in enumerate(mesh.devices[pid])]
        ga = jax.make_array_from_single_device_arrays((16, 3), sharding, arrs)
        total = jax.jit(lambda x: jnp.sum(x),
                        out_shardings=NamedSharding(mesh, P()))(ga)
        assert abs(float(total) - float(full.sum())) < 1e-3
        print(f"proc {pid} OK")
        """
    )
    script = tmp_path / "worker.py"
    script.write_text(worker)
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out


@pytest.mark.slow
def test_sharded_pipeline_swin_fused_block():
    """Swin + the whole-block Pallas kernel under the 8-device data mesh.

    On CPU the kernel runs in interpret mode (pure-jax emulation pjit can
    partition), so this pins the COMPOSITION — fused path inside the
    sharded program, per-shard feasibility gating, wire shapes, parity vs
    the single-device einsum pipeline — not TPU SPMD custom-call
    partitioning (single real chip here; ROADMAP multi-host item).
    """
    from multi_camera_3d_pose_estimation_tpu.models import SwinPose

    cfg = {"embed": 24, "depths": (1, 1), "heads": (2, 4), "window": 4,
           "mlp_ratio": 2, "deconv": (16,)}
    ref_model = SwinPose(num_joints=17, cfg=cfg, dtype=jnp.float32)
    variables = ref_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))
    blk_model = SwinPose(num_joints=17, cfg=cfg, dtype=jnp.float32,
                         use_pallas_attention="block")
    C = 2
    cam_stack = {
        "K": np.tile(np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1]]),
                     (C, 1, 1)),
        "R": np.stack([np.eye(3)] * C),
        "T": np.stack([np.zeros(3), np.array([-30.0, 0, 0])]),
        "dist": np.zeros((C, 5)),
    }
    est_ref = TopDownEstimator(ref_model, variables, input_size=(32, 64),
                               decode="heatmap")
    est_blk = TopDownEstimator(blk_model, variables, input_size=(32, 64),
                               decode="heatmap")
    rng = np.random.default_rng(3)
    frames = rng.uniform(size=(8, C, 120, 160, 3)).astype(np.float32)

    single = ShardedPosePipeline(est_ref, cam_stack, mesh=None)
    sharded = ShardedPosePipeline(est_blk, cam_stack, mesh=make_mesh(8))
    out_s = single.run(frames)
    out_m = sharded.run(frames)
    for key in ("kpts_2d", "heatmaps_2d", "kpts_3d"):
        np.testing.assert_allclose(
            np.asarray(out_s[key]), np.asarray(out_m[key]),
            rtol=5e-3, atol=5e-3, equal_nan=True)


def test_pipeline_nview_triangulation_option(small_pipeline_parts):
    """Opt-in n-view robust triangulation inside the jitted program
    (VERDICT r4 #3): wire shapes unchanged, unknown policies rejected."""
    est, cam_stack = small_pipeline_parts
    rng = np.random.default_rng(2)
    frames = rng.uniform(size=(4, 2, 120, 160, 3)).astype(np.float32)

    pipe = ShardedPosePipeline(est, cam_stack, conf_threshold=-1.0,
                               triangulation="nview")
    out = pipe.run(frames)
    assert np.asarray(out["kpts_3d"]).shape == (4, 17, 3)
    assert np.asarray(out["kpts_2d"]).shape == (4, 17, 3, 2)
    k2 = np.asarray(out["kpts_2d"])
    k3 = np.asarray(out["kpts_3d"])
    valid2d = (np.isfinite(k2[:, :, :2, :]).all(2).sum(-1)) >= 2  # (T, K)
    assert np.isfinite(k3[valid2d]).all()       # solvable -> solved
    assert np.isnan(k3[~valid2d]).all()         # <2 views -> NaN contract
    # (Numeric equivalence/robustness of nview itself is pinned on
    # well-conditioned scenes in tests/test_triangulation.py — a
    # random-weights model's 2D output is too degenerate to compare a
    # weighted vs unweighted solve at any meaningful tolerance.)

    with pytest.raises(ValueError, match="unknown triangulation"):
        ShardedPosePipeline(est, cam_stack, triangulation="midpoint")
