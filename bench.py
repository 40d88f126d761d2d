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

import numpy as np


def _ensure_backend(max_retries: int = 3):
    """The axon TPU plugin occasionally fails to register (transient tunnel
    hiccup), leaving a dangling JAX_PLATFORMS=axon.  Re-exec the process a
    few times before giving up — jax backends can't re-init in-process."""
    import os
    import sys
    import time

    try:
        import jax

        jax.devices()
        return
    except Exception as e:  # pragma: no cover - environment flake path
        tries = int(os.environ.get("_BENCH_RETRY", "0"))
        if tries >= max_retries:
            raise
        print(f"backend init failed ({e}); retry {tries + 1}/{max_retries}",
              file=sys.stderr)
        time.sleep(10 * (tries + 1))
        os.environ["_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    _ensure_backend()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_pipeline
    from multi_camera_3d_pose_estimation_tpu.models import HRNET_W32

    T, C, H, W = 256, 2, 256, 256  # 256 frames x 2 cameras per step
    frames_shape = (T, C, H, W, 3)
    pipe = _build_pipeline(HRNET_W32, (192, 256), frames_shape)

    # Watertight timing through the noisy device tunnel: every step's input
    # is derived from the PREVIOUS step's output (base + acc*1e-9), so no
    # runtime-level memoization or async-completion quirk can skip work,
    # and all steps execute strictly sequentially on device.
    rng = np.random.default_rng(0)
    base = jax.device_put(jnp.asarray(rng.uniform(size=frames_shape), jnp.float32))
    base.block_until_ready()
    bboxes = jax.device_put(
        jnp.tile(jnp.asarray([0.0, 0.0, float(W), float(H)], jnp.float32), (T, C, 1))
    )
    variables = pipe.estimator.variables

    @jax.jit
    def perturb(b, a):
        return b + a * 1e-9

    def step(frames):
        return pipe._run(variables, frames, bboxes, pipe.cam_stack)

    # Warmup / compile both programs.
    out = step(perturb(base, jnp.zeros(())))
    jax.block_until_ready(out["kpts_3d"])

    # Timed steady state.
    n_iters = 15
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(perturb(base, acc))
        acc = acc + jnp.sum(out["kpts_3d"])
    acc.block_until_ready()
    dt = time.perf_counter() - t0

    fps = (T * n_iters) / dt  # multi-camera frames (2 views each) per sec
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


if __name__ == "__main__":
    main()
