"""Headline benchmark: 2-camera HRNet-W32 2D inference + triangulation.

BASELINE config 2 / the north-star metric (BASELINE.json): frames/sec/chip
for the full post-decode pipeline — top-down crop → HRNet-W32 forward →
fused heatmap decode (argmax+subpixel AND Gaussian moments) → top-2 DLT
triangulation — as ONE jitted program on whatever `jax.devices()[0]` is
(the driver runs this on a real TPU chip; it also runs on CPU, slowly).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
`vs_baseline` is value / 1000 (the ≥1000 fps/chip north-star target —
the reference publishes no numbers, BASELINE.md).
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np


def _backend_probe(timeout_s: float = 90.0) -> bool:
    """True iff backend init completes quickly in a KILLABLE subprocess.

    During a tunnel outage `jax.devices()` does not fail fast — it blocks
    ~25 minutes inside the init RPC before raising UNAVAILABLE (observed
    2026-08-17: every queued run burned 25 min/attempt looking alive at
    0% CPU).  A healthy init takes seconds, so probing out-of-process
    with a hard timeout separates "down" from "up" in ≤``timeout_s``.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _ensure_backend(max_retries: int = 3, probe_timeout_s: float = 90.0):
    """Bounded-wait backend bring-up.

    Two failure modes, both observed on the tunneled axon backend:
    transient registration failure at process start (raises quickly —
    re-exec, because jax backends can't re-init in-process) and a full
    tunnel outage (init BLOCKS ~25 min, see `_backend_probe`).  The
    subprocess probe bounds every attempt, so the worst case is
    ``max_retries`` × (probe + backoff) ≈ minutes, not hours, ending in
    a clear error instead of a silent hang."""
    import os
    import sys
    import time

    tries = int(os.environ.get("_BENCH_RETRY", "0"))
    while not _backend_probe(probe_timeout_s):
        tries += 1
        if tries > max_retries:
            raise RuntimeError(
                f"backend init probe failed {max_retries + 1}× "
                f"(each bounded at {probe_timeout_s:.0f}s) — the device "
                f"tunnel looks DOWN, refusing to hang on in-process init"
            )
        print(f"backend probe failed; retry {tries}/{max_retries}",
              file=sys.stderr)
        time.sleep(20 * tries)

    try:
        import jax

        jax.devices()
        return
    except Exception as e:  # pragma: no cover - environment flake path
        if tries >= max_retries:
            raise
        print(f"backend init failed in-process ({e}); re-exec "
              f"{tries + 1}/{max_retries}", file=sys.stderr)
        os.environ["_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _time_pipeline(pipe, frames_shape, n_inner: int = 5, n_outer: int = 6):
    """Multi-camera frames/sec of one ShardedPosePipeline, value-forced.

    Watertight timing through the noisy device tunnel.  Two defenses:

    1. Every iteration's input derives from the previous iteration's
       output (frames + acc*1e-9), so no memoization can skip work and
       all blocks execute strictly sequentially on device.  The
       repetitions run INSIDE one jitted lax.scan so host/link dispatch
       overhead (~30 ms/block on a 1-core host through the tunnel) is
       paid once per outer call, not once per block.
    2. The timed region ends with float(acc) — an actual VALUE fetch.
       On the tunneled backend `block_until_ready()` can return before
       the computation has really retired, which silently inflates
       dispatch-style timings ~2x (measured: 52 ms/block "elapsed" vs
       126 ms with a forced fetch; BENCH_r01's 5063 fps was polluted by
       exactly this).  Only a value round-trip is trustworthy.
    """
    import jax
    import jax.numpy as jnp

    T, C, H, W = frames_shape[:4]
    rng = np.random.default_rng(0)
    base = jax.device_put(jnp.asarray(rng.uniform(size=frames_shape), jnp.float32))
    float(jnp.sum(base))  # force materialization before timing
    bboxes = jax.device_put(
        jnp.tile(jnp.asarray([0.0, 0.0, float(W), float(H)], jnp.float32), (T, C, 1))
    )
    # Closure-captured weights become constants of the serialized program:
    # XLA then pre-folds BN scales into conv weights (~3% on the HRNet
    # headline) — but the tunneled remote-compile endpoint rejects bodies
    # over ~its buffer limit (HTTP 413), which Swin-B's 88M params
    # (~350 MB f32) exceed.  Auto-select: constants when the tree is
    # small enough to upload, device-resident jit arguments otherwise.
    variables = pipe.estimator.variables
    det_vars = pipe.det_variables if pipe._has_detector else None
    n_bytes = sum(np.asarray(x).nbytes
                  for x in jax.tree.leaves((variables, det_vars)))
    weights_as_args = n_bytes > 200 * 1024 * 1024

    if weights_as_args:
        variables = jax.device_put(variables)
        det_vars = jax.device_put(det_vars) if det_vars is not None else None

        @jax.jit
        def run_block(variables, det_vars, frames, acc0):
            def body(acc, _):
                out = pipe._run_detect(variables, det_vars,
                                       frames + acc * 1e-9,
                                       bboxes, pipe.cam_stack)
                return acc + jnp.nansum(out["kpts_3d"]), None

            acc, _ = jax.lax.scan(body, acc0, None, length=n_inner)
            return acc

        call = partial(run_block, variables, det_vars)
    else:
        @jax.jit
        def run_block(frames, acc0):
            def body(acc, _):
                out = pipe._run_detect(variables, det_vars,
                                       frames + acc * 1e-9,
                                       bboxes, pipe.cam_stack)
                return acc + jnp.nansum(out["kpts_3d"]), None

            acc, _ = jax.lax.scan(body, acc0, None, length=n_inner)
            return acc

        call = run_block

    # Warmup / compile (forced fetch).
    float(call(base, jnp.zeros(())))

    # Timed steady state, chained outer calls, value-forced at the end.
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(n_outer):
        acc = call(base, acc)
    float(acc)
    dt = time.perf_counter() - t0
    return (T * n_inner * n_outer) / dt  # multi-camera frames per sec


def _on_tpu():
    import jax

    return jax.default_backend() == "tpu"


def main():
    _ensure_backend()
    from __graft_entry__ import _build_pipeline
    from multi_camera_3d_pose_estimation_tpu.models import HRNET_W32

    T, C, H, W = 256, 2, 256, 256  # 256 frames x 2 cameras per step
    frames_shape = (T, C, H, W, 3)
    # Pallas stage-1 chain kernel (ops/pallas/bottleneck.py): whole
    # 4-Bottleneck stage VMEM-resident, 3x3 as one K=576 im2col matmul —
    # measured +3.9% over the flax stage 1 (PROFILE.md experiments).
    # TPU only: off-TPU it would run in (very slow) interpret mode.
    pipe = _build_pipeline(HRNET_W32, (192, 256), frames_shape,
                           use_pallas_stage1=_on_tpu())
    fps = _time_pipeline(pipe, frames_shape)
    print(
        json.dumps(
            {
                "metric": "2-cam HRNet-W32 2D+triangulation throughput",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 1000.0, 4),
            }
        )
    )


def bench_simcc():
    """BASELINE config 3: RTMPose-t SimCC 2D+triangulation throughput."""
    _ensure_backend()
    from __graft_entry__ import _build_pipeline
    from multi_camera_3d_pose_estimation_tpu.models.rtmpose import RTMPOSE_T

    T, C, H, W = 256, 2, 256, 256
    frames_shape = (T, C, H, W, 3)
    pipe = _build_pipeline(RTMPOSE_T, (192, 256), frames_shape, family="rtmpose")
    fps = _time_pipeline(pipe, frames_shape)
    print(json.dumps({
        "metric": "2-cam RTMPose-t SimCC 2D+triangulation (config 3)",
        "value": round(fps, 2), "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 1000.0, 4),
    }))


def bench_swin(use_pallas_attention: bool | None = None):
    """Swin-B 2D+triangulation throughput — the reference's *named*
    flagship checkpoint (`coco_swin-b`, examples/model_paths.yaml:9-12;
    MMPose td-hm_swin-b-p4-w7 at 256x192).  Same jitted pipeline as the
    headline with the Swin backbone swapped in (window attention = pure
    reshape+matmul on the MXU, models/swin.py).  ``swin_pallas`` runs the
    identical pipeline with the fused window-attention kernel
    (ops/pallas/window_attention.py) for the A/B."""
    _ensure_backend()
    from __graft_entry__ import _build_pipeline
    from multi_camera_3d_pose_estimation_tpu.models import SWIN_B

    if use_pallas_attention is None:
        # Shipped default: whole-block fused kernel on TPU (einsum 301.4
        # -> per-window 399.2 -> packed 454.8 -> block 593.2 fps,
        # same-session A/B); `swin_pallas`/`swin_loop`/`swin_xla` keep
        # the other variants.  Off-TPU the kernels would run in
        # interpret mode.
        use_pallas_attention = "block" if _on_tpu() else False
    T, C, H, W = 128, 2, 256, 256  # ~3.4x HRNet-W32 GFLOPs/crop: smaller block
    frames_shape = (T, C, H, W, 3)
    pipe = _build_pipeline(SWIN_B, (192, 256), frames_shape, family="swin",
                           use_pallas_attention=use_pallas_attention)
    fps = _time_pipeline(pipe, frames_shape)
    tag = {True: " + Pallas packed window attention",
           "loop": " + Pallas per-window attention",
           "block": " + Pallas fused whole-block",
           False: ""}[use_pallas_attention]
    print(json.dumps({
        "metric": f"2-cam Swin-B 2D+triangulation (reference flagship){tag}",
        "value": round(fps, 2), "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 1000.0, 4),
    }))


def bench_multiclip():
    """BASELINE config 5: 8 synchronized 4-camera clips concurrently.

    The clip axis folds into the time axis (`parallel.run_clips_batched`),
    so timing the flattened (n_clips*T, 4, H, W, 3) block IS the
    concurrent-clips workload — one jitted program, no per-clip dispatch.
    """
    _ensure_backend()
    from __graft_entry__ import _build_pipeline
    from multi_camera_3d_pose_estimation_tpu.models import HRNET_W32

    n_clips, T, C, H, W = 8, 32, 4, 256, 256
    frames_shape = (n_clips * T, C, H, W, 3)
    pipe = _build_pipeline(HRNET_W32, (192, 256), frames_shape,
                           use_pallas_stage1=_on_tpu())
    fps = _time_pipeline(pipe, frames_shape)
    print(json.dumps({
        "metric": "8-clip 4-cam HRNet-W32 concurrent farm (config 5)",
        "value": round(fps, 2), "unit": "frames/sec/chip (4-cam frames)",
        # 4 cameras = 2x the per-frame model work of the 2-cam north star.
        "vs_baseline": round(fps / 500.0, 4),
    }))





def _write_synthetic_clip(path: str, T: int, H: int = 256, W: int = 256,
                          seed: int = 0, fps: float = 30.0):
    """Encode a T-frame synthetic mp4: textured background + a moving
    person-ish blob (compresses like real footage, unlike pure noise)."""
    import cv2

    rng = np.random.default_rng(seed)
    bg = rng.integers(40, 200, (H, W, 3), np.uint8)
    bg = cv2.GaussianBlur(bg, (0, 0), 3)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    if not vw.isOpened():
        raise RuntimeError(f"VideoWriter failed for {path}")
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for t in range(T):
        cx = W / 2 + 0.3 * W * np.sin(2 * np.pi * t / 97.0)
        cy = H / 2 + 0.3 * H * np.cos(2 * np.pi * t / 61.0)
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (0.08 * W) ** 2))
        frame = bg.astype(np.float32)
        frame[..., 1] += 120.0 * blob
        frame[..., 2] += 80.0 * blob
        vw.write(np.clip(frame, 0, 255).astype(np.uint8))
    vw.release()


def bench_stream(synthetic_device_source: bool = False):
    """Streaming end-to-end: VIDEO in → 3D out (decode + H2D + compute).

    The headline bench times the jitted program on pre-staged device
    arrays; the reference's actual capability is the full video loop
    (pose_estimation.py:157-244).  This measures
    `cli.estimate.run_pipeline_on_videos` — native libav decode on the
    host thread, uint8 H2D staging, jitted crop→HRNet-W32→decode→
    triangulate, D2H result fetch — wall-clock over a 2-camera mp4 pair.
    Timing is honest by construction: the returned numpy arrays ARE the
    value fetch for every frame.

    ``synthetic_device_source`` (`stream_device` config, VERDICT r3 #6):
    identical overlap machinery — the decode thread still decodes every
    block and paces the loop, dispatch still goes block-by-block with the
    trailing result fetch — but each decoded host block is SWAPPED for a
    pre-staged device-resident uint8 block just before dispatch, taking
    the host→device link out of the path.  On this rig the tunneled H2D
    link (~67 MB/s) is the streaming wall; this mode measures what the
    same code path sustains when frames are already on device (the PCIe
    case a real v5e host provides).
    """
    _ensure_backend()
    import os
    import tempfile

    from __graft_entry__ import _build_pipeline
    from multi_camera_3d_pose_estimation_tpu.cli.estimate import (
        run_pipeline_on_videos,
    )
    from multi_camera_3d_pose_estimation_tpu.models import HRNET_W32

    T, C, H, W = 1024, 2, 256, 256
    block = 256
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    paths = []
    for c in range(C):
        p = os.path.join(tmp, f"cam{c}.mp4")
        _write_synthetic_clip(p, T, H, W, seed=c)
        paths.append(p)

    pipe = _build_pipeline(HRNET_W32, (192, 256), (block, C, H, W, 3),
                           use_pallas_stage1=_on_tpu())
    if synthetic_device_source:
        # Pre-stage a small pool of device-resident uint8 blocks and make
        # the pipeline swap each decoded block for one of them at the jit
        # boundary (everything else — decode thread, block pacing, async
        # dispatch, trailing fetch — is byte-identical code).
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        pool = [
            jax.device_put(jnp.asarray(
                rng.integers(0, 256, (block, C, H, W, 3), np.uint8)))
            for _ in range(4)
        ]
        for b in pool:
            float(jnp.sum(b.astype(jnp.float32)))  # force materialization

        class _DeviceSwapPipe:
            def __init__(self, inner):
                self._inner = inner
                self._i = 0

            def run(self, frames_block, bboxes=None):
                buf = pool[self._i % len(pool)]
                self._i += 1
                return self._inner.run(buf, bboxes)

        pipe = _DeviceSwapPipe(pipe)
    # The frame source itself must NOT device_put in device-source mode
    # (it stages blocks inside its iterator otherwise — the upload this
    # mode exists to exclude).
    stage = not synthetic_device_source
    # Warmup pass: compiles the full-block program (and the tail-block
    # shape is padded to `block`, so one shape covers every block).
    run_pipeline_on_videos(pipe, paths, block_size=block, progress=False,
                           stage_blocks=stage)
    t0 = time.perf_counter()
    k2, hm, k3 = run_pipeline_on_videos(pipe, paths, block_size=block,
                                        progress=False, stage_blocks=stage)
    dt = time.perf_counter() - t0
    assert k3.shape[0] == T, k3.shape
    fps = T / dt
    metric = ("2-cam HRNet-W32 STREAMING video-in->3D-out"
              + (" (device-resident source: H2D link excluded)"
                 if synthetic_device_source else ""))
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 1), "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 1000.0, 4),
    }))


def bench_detector():
    """Fused CenterNet person detection ON vs full-frame boxes (VERDICT r2
    missing #8): the one stage the reference always pays
    (mmpose_pose_estimation.py:236-250), measured as a recorded number."""
    _ensure_backend()
    from __graft_entry__ import _build_pipeline
    from multi_camera_3d_pose_estimation_tpu.models import HRNET_W32
    from multi_camera_3d_pose_estimation_tpu.models.registry import build_detector

    T, C, H, W = 256, 2, 256, 256
    frames_shape = (T, C, H, W, 3)
    det = build_detector("centernet_w32", input_hw=(H, W))
    pipe_det = _build_pipeline(HRNET_W32, (192, 256), frames_shape, detector=det,
                               use_pallas_stage1=_on_tpu())
    fps_det = _time_pipeline(pipe_det, frames_shape)
    pipe_ff = _build_pipeline(HRNET_W32, (192, 256), frames_shape,
                              use_pallas_stage1=_on_tpu())
    fps_ff = _time_pipeline(pipe_ff, frames_shape)
    print(json.dumps({
        "metric": "2-cam HRNet-W32 with fused CenterNet-w32 detector",
        "value": round(fps_det, 2), "unit": "frames/sec/chip",
        "vs_baseline": round(fps_det / 1000.0, 4),
        "full_frame_fps": round(fps_ff, 2),
        "detector_cost_pct": round(100.0 * (1.0 - fps_det / fps_ff), 1),
    }))


def bench_triangulation():
    """BASELINE config 1: cached-2D DLT triangulation throughput."""
    import jax
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.ops import triangulate_top2

    rng = np.random.default_rng(0)
    T, J, C = 4096, 17, 2
    kpts = jnp.asarray(rng.uniform(0, 1000, (T, J, C, 2)), jnp.float32)
    conf = jnp.ones((T, J, C), jnp.float32)
    Ks = jnp.asarray(np.tile(np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]), (C, 1, 1)), jnp.float32)
    Rs = jnp.asarray(np.stack([np.eye(3)] * C), jnp.float32)
    Ts = jnp.asarray(np.stack([np.zeros(3), [-30.0, 0, 0]]), jnp.float32)
    ds = jnp.zeros((C, 5), jnp.float32)

    # The solve is so fast (~μs for 70k points) that per-dispatch link
    # latency would dominate any host-side loop; scan the repetitions
    # INSIDE one jitted call with a dependent perturbation so every
    # iteration truly executes.
    K_ITERS = 200

    @jax.jit
    def fn(k):
        def body(acc, _):
            out = triangulate_top2(k + acc * 1e-9, conf, Ks, ds, Rs, Ts)
            return acc + jnp.nansum(out), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=K_ITERS)
        return acc

    float(fn(kpts))  # warmup; value fetch (block_until_ready can lie, see main)
    n = 3
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(n):
        acc = acc + fn(kpts + acc * 1e-9)
    float(acc)
    dt = (time.perf_counter() - t0) / (n * K_ITERS)
    pts_per_s = T * J / dt
    print(json.dumps({
        "metric": "2-cam DLT triangulation from cached 2D (config 1)",
        "value": round(pts_per_s / 1e6, 2), "unit": "Mpoints/sec/chip",
        # Reference works in 512-point OpenCV chunks; ~1 ms/chunk is a
        # generous CPU estimate -> 0.5 Mpts/s.
        "vs_baseline": round(pts_per_s / 0.5e6, 1),
    }))


def bench_refinement():
    """BASELINE config 4: 400-frame 4-camera refinement epochs/sec."""
    import jax

    from multi_camera_3d_pose_estimation_tpu.refine import PoseRefiner

    rng = np.random.default_rng(0)
    T, J, C = 400, 17, 4
    t = np.linspace(0, 8 * np.pi, T)[:, None, None]
    traj = rng.uniform([-30, -30, 280], [30, 30, 360], (1, J, 3)) + 10 * np.sin(t)
    gauss = np.zeros((T, C, J, 6))
    cams = {}
    for c in range(C):
        K = np.array([[900.0, 0, 640], [0, 900.0, 360], [0, 0, 1]])
        th = np.deg2rad(-30 + 20 * c)
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]])
        Tv = np.array([40.0 * c - 60, 0.0, 10.0 * c])
        cams[c] = [K, R, Tv, np.zeros(5)]
        cam = traj.reshape(-1, 3) @ R.T + Tv
        proj = np.stack([K[0, 0] * cam[:, 0] / cam[:, 2] + K[0, 2],
                         K[1, 1] * cam[:, 1] / cam[:, 2] + K[1, 2]], -1).reshape(T, J, 2)
        gauss[:, c, :, :2] = proj
        gauss[:, c, :, 2] = 16.0
        gauss[:, c, :, 5] = 16.0
    noisy = traj + rng.normal(0, 3.0, traj.shape)
    body = {"left_shoulder_left_elbow": 38.0, "left_hip_left_knee": 51.0}
    ref = PoseRefiner(gauss, noisy, cams, body_lengths=body)
    kwargs = dict(lr=0.01, lambda_smooth=0.01, lambda_body_length=1.0,
                  batch_size=400, patience=10**9, tolerance=0.0)
    ref.sgd_optimize(max_iter=100, **kwargs)  # compile + warm
    t0 = time.perf_counter()
    ref.sgd_optimize(max_iter=2000, **kwargs)
    dt = time.perf_counter() - t0
    eps = 2000 / dt
    print(json.dumps({
        "metric": "400-frame/17-joint/4-cam refinement (config 4)",
        "value": round(eps, 1), "unit": "epochs/sec/chip",
        "vs_baseline": round(eps / 3.17, 1),  # measured reference torch-CPU rate
    }))


if __name__ == "__main__":
    import sys

    cfg = sys.argv[1] if len(sys.argv) > 1 else "main"
    {
        "main": main,           # headline: config 2 (HRNet-W32 2D+3D)
        "triangulation": bench_triangulation,  # config 1
        "simcc": bench_simcc,                  # config 3
        "refinement": bench_refinement,        # config 4
        "multiclip": bench_multiclip,          # config 5
        "swin": bench_swin,                    # reference's named flagship
        "swin_pallas": lambda: bench_swin(True),   # + packed window attention
        "swin_block": lambda: bench_swin("block"),  # + fused whole-block kernel
        "swin_loop": lambda: bench_swin("loop"),   # per-window kernel A/B
        "swin_xla": lambda: bench_swin(False),     # einsum-attention baseline
        "stream": bench_stream,                # video-in -> 3D-out e2e
        "stream_device": lambda: bench_stream(True),  # H2D link excluded
        "detector": bench_detector,            # fused detection cost
    }[cfg]()
