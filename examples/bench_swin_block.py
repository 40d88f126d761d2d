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

            def run(xx, params=params, wb=wb, wa=wa, heads=heads):
                return fused_swin_block(
                    xx, params, heads=heads, window=win, shift=shift,
                    mlp_ratio=4, wb=wb, wa=wa)

            fn = jax.jit(run)
            try:
                out = fn(x)
                float(jnp.sum(out.astype(jnp.float32)))  # compile+check
                iters = 10
                acc = jnp.zeros((), jnp.float32)
                xx = x
                t0 = time.perf_counter()
                for _ in range(iters):
                    o = fn(xx)
                    # chain: next input depends on previous output
                    acc = acc + o.astype(jnp.float32)[0, 0, 0, 0]
                    xx = x + (acc * 1e-12).astype(x.dtype)
                float(acc)  # value depends on every iteration
                dt = (time.perf_counter() - t0) / iters * 1e3
                cells.append(f"{dt:.2f}")
            except Exception as e:  # VMEM OOM etc. — record and move on
                cells.append(f"err({type(e).__name__})")
        print(f"| {H}x{W}, C={C}, h={heads} | " + " | ".join(cells)
              + f" | {layers} |", flush=True)


if __name__ == "__main__":
    main()
