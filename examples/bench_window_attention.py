"""Microbench: Swin window-attention core, XLA einsum vs Pallas kernel.

Times JUST the attention core (qkv (Bw, n, 3C) -> context (Bw, n, C)) at
the four Swin-B stage shapes of the `bench.py swin` workload (B crops per
block), isolating the kernel A/B from the rest of the pipeline.  Both
paths are jitted standalone with donated-free value-forced timing (the
house rule: a value fetch that depends on every timed iteration).

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_window_attention.py [B]
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

    from multi_camera_3d_pose_estimation_tpu.models.swin import (
        _shift_mask,
        _shift_regions,
    )
    from multi_camera_3d_pose_estimation_tpu.ops.pallas.window_attention import (
        fused_window_attention,
        packed_window_attention,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256  # crops per block
    win = 7
    n = win * win
    # (grid_h, grid_w, C, heads, layers) per Swin-B stage at 256x192 crops.
    stages = [
        (64, 48, 128, 4, 2),
        (32, 24, 256, 8, 2),
        (16, 12, 512, 16, 18),
        (8, 6, 1024, 32, 2),
    ]
    rng = np.random.default_rng(0)
    wbs = (4, 8, 16)
    variants = ["einsum", "loop"] + [f"packed{w}" for w in wbs]
    total = {v: 0.0 for v in variants}
    print(f"B={B} crops; per-layer core times (shifted-mask variant)")
    print("| stage (HxW, C, heads) | " + " ms | ".join(variants)
          + " ms | layers |")
    print("|---" * (len(variants) + 2) + "|")
    for H, W, C, heads, layers in stages:
        Hp = -(-H // win) * win
        Wp = -(-W // win) * win
        nW = (Hp // win) * (Wp // win)
        Bw = B * nW
        d = C // heads
        qkv = jnp.asarray(rng.normal(size=(Bw, n, 3 * C)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(heads, n, n)), jnp.float32)
        mask = jnp.asarray(_shift_mask(Hp, Wp, win, win // 2))
        regions = _shift_regions(Hp, Wp, win, win // 2)

        @jax.jit
        def einsum_path(qkv, bias, mask, heads=heads, d=d, nW=nW):
            q, k, v = (qkv.reshape(-1, n, 3, heads, d)[:, :, i]
                       for i in range(3))
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32) * d ** -0.5
            attn = attn + bias[None]
            attn = attn.reshape(-1, nW, heads, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                             preferred_element_type=jnp.float32
                             ).astype(qkv.dtype)
            return out.reshape(-1, n, heads * d)

        pallas_path = jax.jit(
            lambda qkv, bias, mask, heads=heads: fused_window_attention(
                qkv, bias, mask, heads=heads))

        def make_packed(wb, heads=heads, regions=regions, Bw=Bw):
            if Bw % wb or (wb * n) % 8:
                return None
            return jax.jit(
                lambda qkv, bias, mask, heads=heads, wb=wb:
                packed_window_attention(qkv, bias, regions, heads=heads,
                                        wb=wb))

        def timeit(fn, iters=20):
            out = fn(qkv, bias, mask)
            float(jnp.sum(out[0, 0].astype(jnp.float32)))  # warm/compile
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.float32)
            x = qkv
            for _ in range(iters):
                out = fn(x, bias, mask)
                # chain: next input depends on previous output
                acc = acc + out[0, 0, 0].astype(jnp.float32)
                x = x + (acc * 1e-12).astype(x.dtype)
            float(acc)
            return (time.perf_counter() - t0) / iters * 1e3

        times = {"einsum": timeit(einsum_path), "loop": timeit(pallas_path)}
        for w in wbs:
            fn = make_packed(w)
            try:
                times[f"packed{w}"] = (timeit(fn) if fn is not None
                                       else float("nan"))
            except Exception:  # VMEM OOM at big heads·(wb·n)² — record n/a
                times[f"packed{w}"] = float("nan")
        for v in variants:
            total[v] += times[v] * layers
        cells = " | ".join(f"{times[v]:.3f}" for v in variants)
        print(f"| {H}x{W}, C={C}, h={heads} | {cells} | {layers} |")
    print("\nblock totals (all layers, shifted variant both halves): "
          + ", ".join(f"{v} {total[v]:.1f} ms" for v in variants))


if __name__ == "__main__":
    main()
