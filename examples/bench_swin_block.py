"""Microbench: whole-SwinBlock Pallas kernel, (wb, wa) pack sweep.

Times ONE fused SwinBlock (x -> block(x), all residuals) at each Swin-B
stage shape of the `bench.py swin` workload, sweeping the dense-matmul
window pack wb and the attention sub-pack wa (ops/pallas/swin_block.py:
scores are block-diagonal at wa*n rows while qkv/proj/MLP run at wb*n,
so attention waste does not grow with wb).  Value-forced timing (house
rule: the fetched value depends on every timed iteration).

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_swin_block.py [B] [shift]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_camera_3d_pose_estimation_tpu.models.swin import SwinBlock
    from multi_camera_3d_pose_estimation_tpu.ops.pallas.swin_block import (
        fused_swin_block,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256  # crops per block
    shift = int(sys.argv[2]) if len(sys.argv) > 2 else 3  # shifted variant
    win = 7
    # (grid_h, grid_w, C, heads, layers) per Swin-B stage at 256x192.
    stages = [
        (64, 48, 128, 4, 2),
        (32, 24, 256, 8, 2),
        (16, 12, 512, 16, 18),
        (8, 6, 1024, 32, 2),
    ]
    packs = [(8, 8), (16, 8), (32, 8), (64, 8), (16, 16)]
    rng = np.random.default_rng(0)

    print(f"B={B} crops, shift={shift}; ms per LAYER (lower is better)")
    header = " | ".join(f"wb{wb}/wa{wa}" for wb, wa in packs)
    print(f"| stage (HxW, C, heads) | {header} | layers |")
    print("|---" * (len(packs) + 2) + "|")

    for H, W, C, heads, layers in stages:
        x = jnp.asarray(
            rng.normal(size=(B, H, W, C)).astype(np.float32),
            jnp.bfloat16)
        m = SwinBlock(heads=heads, window=win, shift=shift, mlp_ratio=4,
                      dtype=jnp.bfloat16)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        params = v["params"]

        cells = []
        for wb, wa in packs:
            Hp = -(-H // win) * win
            Wp = -(-W // win) * win
            nW = (Hp // win) * (Wp // win)
            if (B * nW) % wb or (wb * win * win) % 8 or wb % wa:
                cells.append("n/a")
                continue
            # VMEM estimate (feasible_wb's accounting): a genuinely
            # oversubscribed cell aborts the PROCESS (Mosaic OOM is not
            # a catchable Python exception on this backend) — skip it.
            n = win * win
            wbytes = 2 * (C * 3 * C + C * C + 2 * 4 * C * C)
            est = heads * (wa * n) ** 2 * 4 + wbytes + wb * n * C * 28
            if est > 70 * 2 ** 20:
                cells.append("skip(vmem)")
                continue

            # All repetitions run INSIDE one jitted lax.scan, each
            # iteration feeding on the previous output — the tunneled
            # link's per-dispatch latency (and any in-loop eager-op
            # compile) would otherwise floor/pollute ms-scale kernels
            # (house rule, bench.py::_time_pipeline).
            iters = 10

            def run_scan(xx, params=params, wb=wb, wa=wa, heads=heads):
                def body(carry, _):
                    o = fused_swin_block(
                        carry, params, heads=heads, window=win, shift=shift,
                        mlp_ratio=4, wb=wb, wa=wa)
                    return o, ()

                y, _ = jax.lax.scan(body, xx, None, length=iters)
                return jnp.sum(y.astype(jnp.float32))

            fn = jax.jit(run_scan)
            try:
                float(fn(x))  # compile + warm + check
                n_outer = 3
                t0 = time.perf_counter()
                acc = 0.0
                for _ in range(n_outer):
                    acc += float(fn(x))  # value fetch forces completion
                dt = (time.perf_counter() - t0) / (n_outer * iters) * 1e3
                assert np.isfinite(acc)
                cells.append(f"{dt:.2f}")
            except Exception as e:  # VMEM OOM etc. — record and move on
                cells.append(f"err({type(e).__name__})")
        print(f"| {H}x{W}, C={C}, h={heads} | " + " | ".join(cells)
              + f" | {layers} |", flush=True)


if __name__ == "__main__":
    main()
