"""AOT-lower the pure-XLA (einsum) Swin bench program and print its
XLA cost analysis — the FLOP numerator for the shipped config's MFU.

Why a separate script: `cost_analysis()` of the SHIPPED whole-SwinBlock
Pallas program reports ~0.62 GFLOP/crop because custom-call (Mosaic)
flops are invisible to XLA's analyzer; the einsum variant keeps every
matmul in XLA, so its count is the authoritative "useful flops" of the
model (the packed kernel's block-diagonal waste flops are deliberately
NOT counted — MFU measures useful work).  Methodology matches the
HRNet 40% figure (PROFILE.md): flops from the XLA variant's cost
analysis, rate from the shipped program's value-forced steady state.

Run on the TPU (compile only, no timed run):
    python -u examples/swin_flops.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from examples.profile_headline import build_run_block

    run_block, call_args, (T, n_inner) = build_run_block(
        family="swin", use_pallas_attention=False)
    lowered = jax.jit(run_block).lower(*call_args, jnp.zeros(()))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    n_crops = T * n_inner * 2
    print(f"einsum-variant flops (XLA, mul-add=2): {flops:.4e} "
          f"for {n_crops} crops -> {flops / n_crops:.4e} flops/crop")


if __name__ == "__main__":
    main()
