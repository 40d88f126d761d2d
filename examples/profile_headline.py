"""Profile the headline pipeline on the real TPU: per-op time table + FLOPs.

VERDICT r2 weak-point #1: the ~19% MFU claim was argued from A/B ablations,
not a profiler trace.  This script produces the evidence:

1. `jax.stages.Compiled.cost_analysis()` of the EXACT headline program
   (bench.py's `run_block`) — authoritative FLOP count (XLA counts one
   multiply-add as 2 flops, matching the 197 TFLOP/s v5e bf16 peak
   convention, so MFU = flops/sec / 197e12 with no MAC-vs-FLOP ambiguity).
2. A `jax.profiler` device trace of the steady-state loop, parsed from the
   xplane protobuf into a per-op table (op name, total µs, %), grouped by
   fusion/op category.

Writes PROFILE.md at the repo root.  Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_headline.py
"""

from __future__ import annotations

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_run_block(n_inner: int = 5):
    """The bench.py::run_block program, verbatim shapes."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_pipeline
    from multi_camera_3d_pose_estimation_tpu.models import HRNET_W32

    T, C, H, W = 256, 2, 256, 256
    frames_shape = (T, C, H, W, 3)
    pipe = _build_pipeline(HRNET_W32, (192, 256), frames_shape)
    rng = np.random.default_rng(0)
    base = jax.device_put(jnp.asarray(rng.uniform(size=frames_shape), jnp.float32))
    bboxes = jax.device_put(
        jnp.tile(jnp.asarray([0.0, 0.0, float(W), float(H)], jnp.float32), (T, C, 1))
    )
    variables = pipe.estimator.variables

    def run_block(frames, acc0):
        def body(acc, _):
            out = pipe._run_detect(variables, None, frames + acc * 1e-9,
                                   bboxes, pipe.cam_stack)
            return acc + jnp.nansum(out["kpts_3d"]), None

        acc, _ = jax.lax.scan(body, acc0, None, length=n_inner)
        return acc

    return run_block, base, (T, n_inner)


def compile_once(run_block, base):
    """AOT-compile the program ONCE (tunnel compiles cost ~minutes); the
    same executable serves cost_analysis and the timed/traced runs."""
    import jax
    import jax.numpy as jnp

    lowered = jax.jit(run_block).lower(base, jnp.zeros(()))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return compiled, ca


def parse_xplane(trace_dir: str):
    """Aggregate per-op durations from the TPU xplane trace.

    Returns {plane_name: {event_name: total_ps}}.
    """
    from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    out = {}
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            agg = out.setdefault(plane.name, defaultdict(float))
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    agg[name] += ev.duration_ps
    return out


def main():
    import jax
    import jax.numpy as jnp

    run_block, base, (T, n_inner) = build_run_block()

    print("== compiling (once, AOT) ==", flush=True)
    jitted, ca = compile_once(run_block, base)
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    n_frames = T * n_inner
    print(f"program flops (XLA, mul-add=2): {flops:.3e} for {n_frames} 2-cam frames")
    print(f"  -> {flops / n_frames / 2:.3e} flops per crop (2 crops/frame)")
    print(f"bytes accessed: {bytes_acc:.3e}")

    # Warm + steady-state timing (value-forced; block_until_ready lies here).
    float(jitted(base, jnp.zeros(())))
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    n_outer = 6
    for _ in range(n_outer):
        acc = jitted(base, acc)
    float(acc)
    dt = time.perf_counter() - t0
    fps = T * n_inner * n_outer / dt
    tflops = flops * n_outer / dt / 1e12
    print(f"steady state: {fps:.1f} fps, {tflops:.1f} TFLOP/s, "
          f"MFU {100 * tflops / 197:.1f}% of v5e bf16 peak", flush=True)

    trace_dir = "/tmp/headline_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    acc = jnp.zeros(())
    for _ in range(2):
        acc = jitted(base, acc)
    float(acc)
    jax.profiler.stop_trace()

    try:
        planes = parse_xplane(trace_dir)
    except Exception as e:  # tunneled backends may not export device planes
        print(f"xplane parse failed: {e}")
        return

    lines = []
    lines.append("# PROFILE — headline program, real TPU chip\n")
    lines.append(f"Measured this round: **{fps:.1f} fps** steady-state "
                 f"(value-forced), XLA cost analysis **{flops / (T * n_inner) / 2:.3e} "
                 f"flops/crop** -> **{tflops:.1f} TFLOP/s = "
                 f"{100 * tflops / 197:.1f}% MFU** (197 TFLOP/s v5e bf16 peak, "
                 f"mul-add = 2 flops both sides).\n")
    for plane_name, agg in sorted(planes.items()):
        total = sum(agg.values())
        if total <= 0 or "TPU" not in plane_name and "tpu" not in plane_name.lower():
            continue
        lines.append(f"\n## {plane_name} (total {total / 1e9:.3f} ms)\n")
        lines.append("| op | ms | % |")
        lines.append("|---|---|---|")
        for name, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
            lines.append(f"| `{name[:90]}` | {ps / 1e9:.3f} | {100 * ps / total:.1f} |")
    md = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE.md"), "w") as f:
        f.write(md)
    print("wrote PROFILE.md")
    # Also dump every plane name for debugging trace coverage.
    for plane_name, agg in planes.items():
        print(f"plane: {plane_name!r}, events: {len(agg)}, "
              f"total ms: {sum(agg.values()) / 1e9:.3f}")


if __name__ == "__main__":
    main()
