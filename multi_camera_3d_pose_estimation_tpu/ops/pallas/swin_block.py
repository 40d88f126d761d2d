"""Pallas TPU kernel: ONE whole SwinBlock per program, VMEM-resident.

`window_attention.py` already keeps the attention core (scores + bias +
mask + softmax + AV) out of HBM, but the Swin-B device trace (PROFILE.md
appendix) shows the block's OTHER tensors still round-trip HBM between
every XLA op: LN1 output, the (Bw·n, 3C) qkv projection, the attention
context, the proj output, the residual sum, LN2's output and the
(Bw·n, 4C) MLP hidden — LayerNorms alone are ~17% of device time and
the MLP/qkv dot fusions another ~15%.  This kernel runs the ENTIRE
block

    x ─ LN1 ─ qkv ─ window-attention ─ proj ─(+x)─ LN2 ─ fc1 ─ gelu ─ fc2 ─(+)─ out

for WB packed windows per grid program, with every intermediate in
VMEM: HBM traffic drops to one read of x, one write of out, and a
one-time load of the (constant-index-map) weights.  The attention core
is the window-packed formulation of
`window_attention.packed_window_attention` (one (WB·n, d)@(d, WB·n)
score matmul + one context matmul per head — MXU-issue-amortized, with
the additive −1e5 off-window-diagonal tensor making the packed
probability matrix exactly block-diagonal after softmax underflow).

Numerics match the flax einsum path (models/swin.py::SwinBlock):

- LayerNorm stats in float32 (flax promotes half precision), fast
  variance E[x²]−E[x]², eps 1e-5, f32 scale/bias, result cast to bf16.
- Dense matmuls accumulate f32 on the MXU, cast to bf16, bf16 bias add.
- Padded tokens (window grid ⌈H/w⌉·⌈W/w⌉ over the H×W map) enter
  attention as EXACT zeros post-LN1 — the mmcv ordering pads the LN
  output before qkv, so a pad token's k/v is exactly the qkv bias.
  A per-token `valid` pattern (cycled per program like the shift
  regions) zeroes them; their outputs are garbage and are cropped by
  the caller after window reversal, exactly like the einsum path.
- Shifted-window masking is the rank-1 region-id comparison (−100)
  of `models/swin.py::_shift_regions`.
- GELU is exact-erf (torch nn.GELU), computed in f32 on the f32 fc1
  accumulator.

Reference behavior being replaced: MMPose Swin backbone blocks
(reference model zoo `td-hm_swin-b-p4-w7`; see models/swin.py header
for the structural citations).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "feasible_chain_group",
    "feasible_fixed",
    "feasible_wb",
    "fixed_partition",
    "fixed_reverse",
    "fused_swin_block",
    "fused_swin_block_fixed",
    "fused_swin_stage_fixed",
    "window_partition",
    "window_reverse",
    "window_roll_perm",
]


def window_partition(x: jax.Array, win: int, shift: int) -> jax.Array:
    """(B, H, W, C) image → (B·nW·n, C) window-order tokens (pad + roll +
    partition, the mmcv ordering).  The kernel's input layout."""
    B, H, W, C = x.shape
    pad_b = (win - H % win) % win
    pad_r = (win - W % win) % win
    Hp, Wp = H + pad_b, W + pad_r
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = x.reshape(B, Hp // win, win, Wp // win, win, C)
    return xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, C)


def window_reverse(xw: jax.Array, B: int, H: int, W: int, win: int,
                   shift: int) -> jax.Array:
    """Inverse of `window_partition`: (B·nW·n, C) → (B, H, W, C)."""
    C = xw.shape[-1]
    Hp = -(-H // win) * win
    Wp = -(-W // win) * win
    out = xw.reshape(B, Hp // win, Wp // win, win, win, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out[:, :H, :W, :]


def _window_origin_index(Hp: int, Wp: int, win: int, shift: int) -> np.ndarray:
    """(nW·n,) original padded-grid flat index of each window-order token."""
    oi = (np.arange(Hp) + shift) % Hp
    oj = (np.arange(Wp) + shift) % Wp
    grid = oi[:, None] * Wp + oj[None, :]
    return grid.reshape(Hp // win, win, Wp // win, win).transpose(
        0, 2, 1, 3).reshape(-1)


def window_roll_perm(H: int, W: int, win: int, s_from: int, s_to: int
                     ) -> np.ndarray:
    """Static token permutation between two window layouts of one map.

    The layout chain's replacement for the per-block
    reverse→(un)roll→pad→re-partition copies: consecutive SwinBlocks
    alternate shift 0 ↔ win//2 over the SAME (H, W) map, so the
    composition of one block's window reversal with the next block's
    partition is a fixed permutation of the (nW·n) window-order token
    rows — ONE gather instead of four layout passes over HBM (the
    PROFILE.md Swin appendix's 13% layout item).  Returns ``perm`` with
    ``next_layout[q] = prev_layout[perm[q]]``.
    """
    Hp = -(-H // win) * win
    Wp = -(-W // win) * win
    a = _window_origin_index(Hp, Wp, win, s_from)
    b = _window_origin_index(Hp, Wp, win, s_to)
    inv_a = np.empty(Hp * Wp, np.int64)
    inv_a[a] = np.arange(a.size)
    return inv_a[b]

def _fixed_geom(H: int, W: int, win: int, shift: int):
    """Token geometry of one crop in FIXED (unshifted window) order.

    The fixed-order stage layout (`fused_swin_block_fixed`) keeps tokens
    in shift-0 window order for EVERY block of a stage; a shifted
    block's attention groups (the shifted windows) are then just a
    different partition of the same token rows, expressible as an
    id-equality mask — no roll, no re-partition, no inter-block
    permutation.  Returns, per fixed-order row q of the P-row crop pack
    (P = nW·n rounded up to the 8-sublane tile):

    - ``ws``  (P,) attention-group id: the block's (shifted) window id,
      negative-unique for the P−nW·n alignment rows (self-attend only);
    - ``ks``  (P,) within-(shifted)-window flat position, indexing
      `_rel_position_index(win)` for the relative-position bias;
    - ``reg`` (P,) wrap-region id (`models.swin._shift_regions` bands):
      same window + different region pairs get the einsum path's −100;
    - ``valid`` (P,) 1.0 for real (unpadded-map) tokens — the mmcv
      "pad the LN1 output with zeros" semantics, like `_valid_mask`;
    - ``P`` rows per crop pack.
    """
    Hp = -(-H // win) * win
    Wp = -(-W // win) * win
    Ww = Wp // win
    n = win * win
    nWn = Hp * Wp
    q = np.arange(nWn)
    w, k = q // n, q % n
    gr = (w // Ww) * win + k // win  # padded-grid position (unrolled)
    gc = (w % Ww) * win + k % win
    if shift:
        # window_partition rolls by (−shift, −shift): original index g
        # lands at rolled position (g − shift) mod dim.
        pr = (gr - shift) % Hp
        pc = (gc - shift) % Wp
        img = np.zeros((Hp, Wp), np.int32)
        cnt = 0
        for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            for vs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                img[hs, vs] = cnt
                cnt += 1
        reg = img[pr, pc]
    else:
        pr, pc = gr, gc
        reg = np.zeros(nWn, np.int32)
    ws = (pr // win) * Ww + pc // win
    ks = (pr % win) * win + pc % win
    valid = ((gr < H) & (gc < W)).astype(np.float32)
    P = -(-nWn // 8) * 8
    pad = P - nWn
    if pad:
        ws = np.concatenate([ws, -1 - np.arange(pad)])
        ks = np.concatenate([ks, np.zeros(pad, ks.dtype)])
        reg = np.concatenate([reg, np.zeros(pad, np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, np.float32)])
    return ws, ks, reg, valid, P


def fixed_partition(x: jax.Array, win: int) -> jax.Array:
    """(B, H, W, C) → (B·P, C) fixed-order crop packs (shift-0 window
    order, each crop row-padded to the 8-sublane tile)."""
    B, H, W, C = x.shape
    Hp = -(-H // win) * win
    Wp = -(-W // win) * win
    nWn = Hp * Wp
    P = -(-nWn // 8) * 8
    xw = window_partition(x, win, 0)
    if P != nWn:
        xw = jnp.pad(xw.reshape(B, nWn, C), ((0, 0), (0, P - nWn), (0, 0)))
    return xw.reshape(-1, C)


def fixed_reverse(xw: jax.Array, B: int, H: int, W: int, win: int
                  ) -> jax.Array:
    """Inverse of `fixed_partition`: (B·P, C) → (B, H, W, C)."""
    C = xw.shape[-1]
    Hp = -(-H // win) * win
    Wp = -(-W // win) * win
    nWn = Hp * Wp
    P = -(-nWn // 8) * 8
    if P != nWn:
        xw = xw.reshape(B, P, C)[:, :nWn]
    return window_reverse(xw.reshape(-1, C), B, H, W, win, 0)


# Conservative VMEM budget for (packing tensor + weights); the v5e
# accepts ~<78 MB of resident blocks (the wb=16 stage-3 variant OOMs at
# 78.6 MB, wb=8's 19.7 MB runs — examples/bench_window_attention.py).
_VMEM_BUDGET = 56 * 2 ** 20

# Dense-matmul pack candidates for `feasible_wb`, in preference order
# (first feasible wins).  Module-level so the pipeline-level A/B
# (examples/bench_swin_block.py / bench.py swin variants) can override.
_WB_CANDIDATES = (8, 16, 4, 2)

def _score_bf16() -> bool:
    """``MC3D_SWIN_SCORE_BF16=1`` — A/B knob: compute the attention score +
    additive tables in bf16 inside the fused block kernel (softmax still
    reduces in f32).  Read at trace time (like ``MC3D_SWIN_WB``) so the
    pipeline A/B and tests can flip it without re-importing.  Round-5
    measured experiment; default OFF."""
    return os.environ.get("MC3D_SWIN_SCORE_BF16", "") == "1"

# Per-stage preference overrides, keyed by the block's channel width C
# (the stable stage identity across Swin variants): C → candidate tuple
# tried BEFORE `_WB_CANDIDATES`.  Settable in code or via the env var
# ``MC3D_SWIN_WB`` ("128:56,256:32,512:48" or a single global "16") —
# the pipeline-level A/B knob for pack tuning without editing call sites.
WB_PREFERENCE_BY_CHANNELS: dict[int, tuple[int, ...]] = {}


def _preferred_candidates(C: int) -> tuple[int, ...]:
    import os

    pref: tuple[int, ...] = ()
    env = os.environ.get("MC3D_SWIN_WB", "")
    if env:
        for part in env.split(","):
            part = part.strip()
            if not part:
                continue
            if ":" in part:
                ck, v = part.split(":")
                if int(ck) == C:
                    pref += (int(v),)
            else:
                pref += (int(part),)
    if C in WB_PREFERENCE_BY_CHANNELS:
        pref += tuple(WB_PREFERENCE_BY_CHANNELS[C])
    return pref + _WB_CANDIDATES


def _valid_mask(h: int, w: int, hp: int, wp: int, win: int,
                shift: int) -> np.ndarray:
    """(nW, n) 1.0 where the (rolled, padded) token is a real map token.

    Position p of the rolled map holds original index (p + shift) mod
    dim; it is real iff that original index is < the unpadded extent.
    """
    rows = (np.arange(hp) + shift) % hp < h
    cols = (np.arange(wp) + shift) % wp < w
    img = (rows[:, None] & cols[None, :]).astype(np.float32)
    m = img.reshape(hp // win, win, wp // win, win)
    return m.transpose(0, 2, 1, 3).reshape(-1, win * win)


def feasible_wb(x_shape, heads: int, window: int, mlp_ratio: int,
                ) -> int | None:
    """Largest measured-good window pack for which the block kernel's
    resident VMEM (packing tensor + all six weight matrices) fits.
    None → caller should fall back (tiny batch or VMEM-busting stage).
    """
    B, H, W, C = x_shape
    n = window * window
    hp = -(-H // window) * window
    wp = -(-W // window) * window
    nw = (hp // window) * (wp // window)
    bw = B * nw
    wbytes = 2 * (C * 3 * C + C * C + 2 * mlp_ratio * C * C)
    for cand in _preferred_candidates(C):
        if bw % cand or (cand * n) % 8:
            continue
        san = min(cand, 8) * n  # attention sub-pack (fused_swin_block wa)
        act = cand * n * C * 28  # x/qkv/ctx/MLP-hidden per program (est.)
        if heads * san * san * 4 + wbytes + act <= _VMEM_BUDGET:
            return cand
    return None


def _lanes(m: int) -> int:
    """Round up to the 128-lane tile (Mosaic pads minor dims to 128)."""
    return -(-m // 128) * 128


def feasible_fixed(x_shape, heads: int, window: int, mlp_ratio: int,
                   ) -> int | None:
    """Crops per program (cp) for the fixed-order block kernel, or None.

    The fixed-order pack replaces the (heads, san, san) bias+offdiag
    tile with a FULL (heads, cp·P, cp·P) table (bias + window-id mask +
    wrap-region mask folded together), so feasibility is bounded by the
    table: stage 0 of Swin-B (P=3432, heads 4) wants ~188 MB and falls
    back to the chained layout; stages 1-3 fit comfortably.
    """
    import os

    B, H, W, C = x_shape
    Hp = -(-H // window) * window
    Wp = -(-W // window) * window
    P = -(-(Hp * Wp) // 8) * 8
    wbytes = 2 * (C * 3 * C + C * C + 2 * mlp_ratio * C * C)
    env = os.environ.get("MC3D_SWIN_CP", "")
    cands = tuple(int(v) for v in env.split(",") if v.strip()) or (1, 2)
    for cp in cands:
        if B % cp:
            continue
        Pn = cp * P
        tbytes = heads * Pn * _lanes(Pn) * 4
        act = Pn * C * 28  # x/qkv/ctx/MLP-hidden per program (est.)
        score = 2 * Pn * _lanes(Pn) * 4  # s + p transients per head
        if tbytes + wbytes + act + score <= _VMEM_BUDGET:
            return cp
    return None


def _fixed_table(p: dict, win: int, ws, ks, reg, cp: int):
    """Full additive attention table for one block on fixed-order packs:
    rel-pos bias + window-id mask (−1e5) + wrap-region mask (−100),
    block-diagonal across the cp crops of a pack."""
    from ...models.swin import _rel_position_index

    P = ws.shape[0]
    pair = _rel_position_index(win)[ks[:, None], ks[None, :]]  # (P, P)
    base = np.where(
        ws[:, None] == ws[None, :],
        np.where(reg[:, None] == reg[None, :], 0.0, -100.0),
        -1e5).astype(np.float32)
    bias = p["attn"]["bias_table"][pair].transpose(2, 0, 1)  # (heads, P, P)
    t = bias.astype(jnp.float32) + base
    if cp > 1:
        diag = np.kron(np.eye(cp, dtype=bool), np.ones((P, P), bool))
        t = jnp.where(diag, jnp.tile(t, (1, cp, cp)), jnp.float32(-1e5))
    return t


def feasible_chain_group(x_shape, heads: int, window: int, mlp_ratio: int,
                         cp: int, depth: int) -> int:
    """Blocks per program for `fused_swin_stage_fixed` (≥1).

    Each chained block keeps its own (heads, cp·P, cp·P) table AND
    weight set VMEM-resident, so the group size is table+weight bound:
    Swin-B stage 2 fits G=3 (3×(7.3+6.3) MB + activations)."""
    import os

    env = os.environ.get("MC3D_SWIN_GROUP", "")
    if env.strip():
        return max(1, min(int(env), depth))
    B, H, W, C = x_shape
    Hp = -(-H // window) * window
    Wp = -(-W // window) * window
    P = -(-(Hp * Wp) // 8) * 8
    Pn = cp * P
    per_block = (heads * Pn * _lanes(Pn) * 4
                 + 2 * (C * 3 * C + C * C + 2 * mlp_ratio * C * C))
    act = Pn * C * 28
    score = 2 * Pn * _lanes(Pn) * 4
    g = max(1, (_VMEM_BUDGET - act - score) // per_block)
    return int(min(g, depth))


def fused_swin_stage_fixed(x: jax.Array, plist: list, *, heads: int,
                           window: int, shifts: list, mlp_ratio: int,
                           geom: tuple[int, int, int], cp: int = 1,
                           group: int | None = None,
                           interpret: bool | None = None) -> jax.Array:
    """A whole fixed-order stage: depth SwinBlocks in ceil(depth/G)
    Pallas programs per crop pack.

    Identical math to chaining `fused_swin_block_fixed` block by block,
    but x round-trips HBM once per GROUP of G blocks instead of once
    per block (and the per-program prologue amortizes G×).  ``plist`` is
    the per-block flax param subtrees, ``shifts`` the per-block shift
    (0 / win//2 alternation).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W = geom
    C = x.shape[-1]
    win = window
    depth = len(plist)
    if len(shifts) != depth:
        raise ValueError("shifts and plist must align")
    geoms = {s: _fixed_geom(H, W, win, s) for s in set(shifts)}
    P = next(iter(geoms.values()))[4]
    if x.shape != (B * P, C):
        raise ValueError(
            f"fixed-order tokens must be {(B * P, C)}, got {x.shape}")
    if B % cp:
        raise ValueError(f"cp={cp} must divide B={B}")
    Pn = cp * P
    scale = float((C // heads) ** -0.5)
    bf = x.dtype
    if group is None:
        group = feasible_chain_group((B, H, W, C), heads, win, mlp_ratio,
                                     cp, depth)
    # Validity is by ORIGINAL token position — shift-independent.
    vpat = jnp.asarray(np.tile(geoms[shifts[0]][3], cp)[None, :, None])

    def row_vec(a):
        return a.astype(jnp.float32).reshape(1, -1)

    w_bf = lambda a: a.astype(bf)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    for g0 in range(0, depth, group):
        chunk = list(range(g0, min(g0 + group, depth)))
        G = len(chunk)
        ins, specs = [], []
        for j in chunk:
            ws, ks, reg, valid, _ = geoms[shifts[j]]
            p = plist[j]
            ins += [
                _fixed_table(p, win, ws, ks, reg, cp),
                row_vec(p["norm1"]["scale"]), row_vec(p["norm1"]["bias"]),
                w_bf(p["attn"]["qkv"]["kernel"]),
                row_vec(p["attn"]["qkv"]["bias"]),
                w_bf(p["attn"]["proj"]["kernel"]),
                row_vec(p["attn"]["proj"]["bias"]),
                row_vec(p["norm2"]["scale"]), row_vec(p["norm2"]["bias"]),
                w_bf(p["ffn_fc1"]["kernel"]), row_vec(p["ffn_fc1"]["bias"]),
                w_bf(p["ffn_fc2"]["kernel"]), row_vec(p["ffn_fc2"]["bias"]),
            ]
            specs += [
                const((heads, Pn, Pn)),
                const((1, C)), const((1, C)),
                const((C, 3 * C)), const((1, 3 * C)),
                const((C, C)), const((1, C)),
                const((1, C)), const((1, C)),
                const((C, mlp_ratio * C)), const((1, mlp_ratio * C)),
                const((mlp_ratio * C, C)), const((1, C)),
            ]
        kernel = partial(_chain_kernel, heads=heads, C=C, scale=scale,
                         G=G, san=Pn)
        x = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * P, C), bf),
            grid=(B // cp,),
            in_specs=[
                pl.BlockSpec((Pn, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                const((1, Pn, 1)),
            ] + specs,
            out_specs=pl.BlockSpec((Pn, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((Pn, C), bf)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x, vpat, *ins)
    return x


def fused_swin_block_fixed(x: jax.Array, p: dict, *, heads: int,
                           window: int, shift: int, mlp_ratio: int,
                           geom: tuple[int, int, int], cp: int = 1,
                           interpret: bool | None = None) -> jax.Array:
    """Whole SwinBlock on FIXED-ORDER crop packs — zero layout between
    blocks of a stage.

    ``x`` is the (B·P, C) fixed-order token matrix (`fixed_partition`);
    the output is the SAME layout, so consecutive blocks chain with NO
    gather/roll/pad in between (vs `fused_swin_block`'s
    ``emit_partitioned`` chained mode, which still pays one
    `window_roll_perm` HBM gather per transition and a distinct rolled
    layout for shifted blocks).  A shifted block differs from an
    unshifted one ONLY in its additive table: t[h,i,j] = rel-pos bias at
    the pair's within-shifted-window offsets, −100 added across wrap
    regions (the einsum path's `_shift_mask` value), −1e5 across
    different windows (softmax-exact-zero packing, see
    window_attention.py).  Numerics match `fused_swin_block` which
    matches the flax einsum path (same `_block_kernel`).

    Replaces the same reference behavior as `fused_swin_block` (MMPose
    Swin backbone blocks, zoo `td-hm_swin-b-p4-w7`).
    """
    from ...models.swin import _rel_position_index

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W = geom
    C = x.shape[-1]
    win = window
    ws, ks, reg, valid, P = _fixed_geom(H, W, win, shift)
    if x.shape != (B * P, C):
        raise ValueError(
            f"fixed-order tokens must be {(B * P, C)}, got {x.shape}")
    if B % cp:
        raise ValueError(f"cp={cp} must divide B={B}")
    Pn = cp * P
    scale = float((C // heads) ** -0.5)
    bf = x.dtype

    t = _fixed_table(p, win, ws, ks, reg, cp)
    vpat = jnp.asarray(np.tile(valid, cp)[None, :, None])
    # Dummy region tables (masking lives entirely in t → shifted=False).
    rrow = jnp.zeros((1, Pn, 1), jnp.float32)
    rcol = jnp.zeros((1, 1, Pn), jnp.float32)

    def row_vec(a):
        return a.astype(jnp.float32).reshape(1, -1)

    w_bf = lambda a: a.astype(bf)
    kernel = partial(_block_kernel, heads=heads, C=C, scale=scale,
                     shifted=False, padded=True, san=Pn,
                     zero_pad_out=False)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * P, C), bf),
        grid=(B // cp,),
        in_specs=[
            pl.BlockSpec((Pn, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const((1, Pn, 1)),
            const((1, C)), const((1, C)),
            const((C, 3 * C)), const((1, 3 * C)),
            const((heads, Pn, Pn)),
            const((1, Pn, 1)), const((1, 1, Pn)),
            const((C, C)), const((1, C)),
            const((1, C)), const((1, C)),
            const((C, mlp_ratio * C)), const((1, mlp_ratio * C)),
            const((mlp_ratio * C, C)), const((1, C)),
        ],
        out_specs=pl.BlockSpec((Pn, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Pn, C), bf)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, vpat,
        row_vec(p["norm1"]["scale"]), row_vec(p["norm1"]["bias"]),
        w_bf(p["attn"]["qkv"]["kernel"]), row_vec(p["attn"]["qkv"]["bias"]),
        t, rrow, rcol,
        w_bf(p["attn"]["proj"]["kernel"]), row_vec(p["attn"]["proj"]["bias"]),
        row_vec(p["norm2"]["scale"]), row_vec(p["norm2"]["bias"]),
        w_bf(p["ffn_fc1"]["kernel"]), row_vec(p["ffn_fc1"]["bias"]),
        w_bf(p["ffn_fc2"]["kernel"]), row_vec(p["ffn_fc2"]["bias"]),
    )


def _erf(x: jax.Array) -> jax.Array:
    """float32 erf for the exact-GELU — Mosaic has no erf lowering.

    Abramowitz & Stegun 7.1.26 rational approximation, max abs error
    1.5e-7: three orders of magnitude below bf16 resolution (~4e-3
    relative), so the GELU matches torch's exact-erf within the bf16
    cast that follows either way.
    """
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _block_body(x, vpat_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                t_ref, rrow_ref, rcol_ref, wproj_ref, bproj_ref,
                ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                ctx_ref, *, heads: int, C: int, scale: float,
                shifted: bool, padded: bool, san: int, eps: float = 1e-5):
    """One SwinBlock on an in-VMEM (WBn, C) token value ``x`` → new value.

    Shared by the single-block kernels (`_block_kernel`) and the
    fixed-order multi-block chain kernel (`_chain_kernel`)."""
    f32 = jnp.float32
    bf = x.dtype
    d = C // heads
    WBn = x.shape[0]

    xf = x.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * ln1s_ref[0] + ln1b_ref[0]
    if padded:
        # mmcv pads AFTER LN1: pad tokens must hit qkv as exact zeros.
        y = y * vpat_ref[0]
    y = y.astype(bf)

    qkv = jnp.dot(y, wqkv_ref[:], preferred_element_type=f32)
    qkv = (qkv.astype(bf) + bqkv_ref[0].astype(bf))  # (WBn, 3C)

    # Attention runs per SUB-pack of san = wa·n rows: the block-diagonal
    # score waste scales with the attention pack, so the dense matmuls
    # (qkv/proj/MLP) take the full WBn pack while the scores stay at the
    # measured-good wa (t is identical for every sub-pack — it depends
    # only on within-window position and window parity).
    for sp in range(WBn // san):
        r0 = sp * san
        qkv_s = qkv[r0:r0 + san, :]
        if shifted:
            regmask = jnp.where(
                rrow_ref[0, r0:r0 + san, :] != rcol_ref[0, :, r0:r0 + san],
                f32(-100.0), f32(0.0))
        for h in range(heads):
            q = qkv_s[:, h * d:(h + 1) * d]
            k = qkv_s[:, C + h * d:C + (h + 1) * d]
            v = qkv_s[:, 2 * C + h * d:2 * C + (h + 1) * d]
            if _score_bf16():
                # Round-5 A/B knob (MC3D_SWIN_SCORE_BF16=1): keep the
                # pre-softmax score path in bf16 — halves the in-VMEM
                # score/softmax footprint at an ~8-bit-mantissa logit cost.
                # The MXU itself must accumulate f32 (Mosaic rejects a
                # bf16 `tpu.matmul` acc), so the dot keeps f32 and the
                # cast lands immediately after — the footprint lever is
                # the (san, san) score/prob tensors, not the accumulator.
                # Measured + recorded in PROFILE.md; NOT the default.
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
                ).astype(bf) * jnp.asarray(scale, bf)
                s = s + t_ref[h].astype(bf)
                if shifted:
                    s = s + regmask.astype(bf)
                p = jax.nn.softmax(s.astype(f32), axis=-1).astype(bf)
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
                ) * scale
                s = s + t_ref[h]
                if shifted:
                    s = s + regmask
                p = jax.nn.softmax(s, axis=-1).astype(bf)
            ctx_ref[r0:r0 + san, h * d:(h + 1) * d] = jnp.dot(
                p, v, preferred_element_type=f32).astype(bf)

    po = jnp.dot(ctx_ref[:], wproj_ref[:], preferred_element_type=f32)
    x2 = x + (po.astype(bf) + bproj_ref[0].astype(bf))

    x2f = x2.astype(f32)
    mu2 = jnp.mean(x2f, axis=-1, keepdims=True)
    var2 = jnp.mean(x2f * x2f, axis=-1, keepdims=True) - mu2 * mu2
    y2 = ((x2f - mu2) * jax.lax.rsqrt(var2 + eps) * ln2s_ref[0]
          + ln2b_ref[0]).astype(bf)

    h1 = jnp.dot(y2, wfc1_ref[:], preferred_element_type=f32) + bfc1_ref[0]
    g = (0.5 * h1 * (1.0 + _erf(h1 * (2.0 ** -0.5)))).astype(bf)
    o2 = jnp.dot(g, wfc2_ref[:], preferred_element_type=f32)
    return x2 + (o2.astype(bf) + bfc2_ref[0].astype(bf))


def _block_kernel(xw_ref, vpat_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                  t_ref, rrow_ref, rcol_ref, wproj_ref, bproj_ref,
                  ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                  out_ref, ctx_ref, *, heads: int, C: int, scale: float,
                  shifted: bool, padded: bool, san: int,
                  zero_pad_out: bool = False, eps: float = 1e-5):
    res = _block_body(
        xw_ref[:], vpat_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
        t_ref, rrow_ref, rcol_ref, wproj_ref, bproj_ref,
        ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
        ctx_ref, heads=heads, C=C, scale=scale, shifted=shifted,
        padded=padded, san=san, eps=eps)
    if zero_pad_out and padded:
        # Chained layout mode: pad tokens leave as EXACT zeros, so the
        # next block's window permutation sees the same re-padded-with-
        # zeros input mmcv produces by crop + fresh pad.
        res = res * vpat_ref[0].astype(res.dtype)
    out_ref[:] = res


def _chain_kernel(xw_ref, vpat_ref, *wrefs, heads: int, C: int,
                  scale: float, G: int, san: int, eps: float = 1e-5):
    """G fixed-order SwinBlocks in ONE program: x stays VMEM-resident
    across the whole group (one HBM read + one write per G blocks).
    ``wrefs`` is 13 refs per block (the block's full additive table —
    per-block, it embeds the block's OWN rel-pos bias — then the 12
    weight tensors), then out_ref, then the ctx scratch."""
    out_ref, ctx_ref = wrefs[13 * G], wrefs[13 * G + 1]
    x = xw_ref[:]
    for j in range(G):
        w = wrefs[13 * j:13 * (j + 1)]
        x = _block_body(
            x, vpat_ref, w[1], w[2], w[3], w[4],
            w[0], None, None, w[5], w[6],
            w[7], w[8], w[9], w[10], w[11], w[12],
            ctx_ref, heads=heads, C=C, scale=scale, shifted=False,
            padded=True, san=san, eps=eps)
    out_ref[:] = x


def fused_swin_block(x: jax.Array, p: dict, *, heads: int, window: int,
                     shift: int, mlp_ratio: int, wb: int | None = None,
                     wa: int | None = None,
                     pre_partitioned: tuple[int, int, int] | None = None,
                     emit_partitioned: bool = False,
                     interpret: bool | None = None) -> jax.Array:
    """Whole SwinBlock (LN1→attn→+x→LN2→MLP→+) as one Pallas program set.

    Not independently jitted: callers trace it inside their own jit
    (mask/valid/region tables are trace-time numpy geometry).

    x:  (B, H, W, C) block input in the model dtype (bf16 on TPU), or —
        with ``pre_partitioned=(B, H, W)`` — the (B·nW·n, C)
        window-order tokens of THIS block's layout (`window_partition`).
    p:  the block's flax param subtree (models/swin.py::SwinBlock names):
        norm1/{scale,bias}, attn/{bias_table, qkv/{kernel,bias},
        proj/{kernel,bias}}, norm2/{scale,bias},
        ffn_fc1/{kernel,bias}, ffn_fc2/{kernel,bias}.
    wb: windows packed per program (`feasible_wb`); required — callers
        gate on feasibility and fall back to the unfused path otherwise.
    wa: windows packed per ATTENTION sub-pack (must divide wb; default
        min(wb, 8)) — the dense matmuls run at wb·n rows while scores
        stay block-diagonal at wa·n, so attention waste does not grow
        with wb.
    emit_partitioned: return window-order (B·nW·n, C) tokens WITHOUT the
        window reversal, with pad tokens zeroed in-kernel — the chained
        stage layout (`window_roll_perm`): consecutive blocks exchange
        tokens through one static permutation instead of
        reverse→roll→pad→re-partition HBM passes.
    Returns (B, H, W, C) — or (B·nW·n, C) with ``emit_partitioned``.
    """
    # Window geometry tables live with the model (single source of
    # truth); lazy import keeps the ops→models edge call-time-only.
    from ...models.swin import _rel_position_index, _shift_regions

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pre_partitioned is not None:
        B, H, W = pre_partitioned
        C = x.shape[-1]
    else:
        B, H, W, C = x.shape
    win = window
    n = win * win
    if wb is None:
        wb = feasible_wb((B, H, W, C), heads, win, mlp_ratio)
        if wb is None:
            raise ValueError("no feasible window pack; gate on feasible_wb")
    pad_b = (win - H % win) % win
    pad_r = (win - W % win) % win
    Hp, Wp = H + pad_b, W + pad_r
    nW = (Hp // win) * (Wp // win)
    Bw = B * nW
    WBn = wb * n
    if wa is None:
        wa = min(wb, 8)
    if wb % wa:
        raise ValueError(f"wa={wa} must divide wb={wb}")
    san = wa * n
    scale = float((C // heads) ** -0.5)
    shifted = bool(shift)
    padded = bool(pad_b or pad_r)
    bf = x.dtype

    if pre_partitioned is not None:
        if x.shape != (Bw * n, C):
            raise ValueError(
                f"pre-partitioned tokens must be {(Bw * n, C)}, got {x.shape}")
        xw = x
    else:
        xw = window_partition(x, win, shift)

    # Packing tensor: relative-position bias tiled across window blocks
    # + −1e5 off the window diagonal (see window_attention.py for why
    # the underflow makes the packed softmax exactly block-diagonal).
    bias = p["attn"]["bias_table"][_rel_position_index(win)]  # (n, n, heads)
    bias = bias.transpose(2, 0, 1).astype(jnp.float32)
    offdiag = np.full((san, san), -1e5, np.float32)
    for j in range(wa):
        offdiag[j * n:(j + 1) * n, j * n:(j + 1) * n] = 0.0
    t = jnp.broadcast_to(
        bias[:, None, :, None, :], (heads, wa, n, wa, n)
    ).reshape(heads, san, san) + jnp.asarray(offdiag)

    # Per-program token patterns (valid + shift regions), cycled by the
    # same (i·wb mod nW)//gcd index map as packed_window_attention.
    g = math.gcd(wb, nW)
    npat = nW // g

    def pack_pattern(rows: np.ndarray) -> np.ndarray:  # (nW, n) → (npat, WBn)
        return np.stack([
            np.concatenate([rows[(q * g + j) % nW] for j in range(wb)])
            for q in range(npat)
        ])

    def r_index(i):
        return (((i * wb) % nW) // g, 0, 0)

    # Each table gets its own index map: a single-pattern placeholder
    # must use a constant map (cycling indices into a 1-entry axis would
    # DMA out of range even if the kernel never reads the values).
    const3 = lambda i: (0, 0, 0)
    if padded:
        vpat = jnp.asarray(
            pack_pattern(_valid_mask(H, W, Hp, Wp, win, shift))[:, :, None])
        v_index = r_index
    else:
        vpat = jnp.ones((1, WBn, 1), jnp.float32)
        v_index = const3
    if shifted:
        rpat = pack_pattern(
            _shift_regions(Hp, Wp, win, shift).astype(np.float32))
        rrow = jnp.asarray(rpat[:, :, None])
        rcol = jnp.asarray(rpat[:, None, :])
        reg_index = r_index
    else:
        rrow = jnp.zeros((1, WBn, 1), jnp.float32)
        rcol = jnp.zeros((1, 1, WBn), jnp.float32)
        reg_index = const3

    def row_vec(a):  # (C,) f32 param → (1, C) block
        return a.astype(jnp.float32).reshape(1, -1)

    w_bf = lambda a: a.astype(bf)
    kernel = partial(_block_kernel, heads=heads, C=C, scale=scale,
                     shifted=shifted, padded=padded, san=san,
                     zero_pad_out=emit_partitioned)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bw * n, C), bf),
        grid=(Bw // wb,),
        in_specs=[
            pl.BlockSpec((WBn, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WBn, 1), v_index, memory_space=pltpu.VMEM),
            const((1, C)), const((1, C)),
            const((C, 3 * C)), const((1, 3 * C)),
            const((heads, san, san)),
            pl.BlockSpec((1, WBn, 1), reg_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WBn), reg_index, memory_space=pltpu.VMEM),
            const((C, C)), const((1, C)),
            const((1, C)), const((1, C)),
            const((C, mlp_ratio * C)), const((1, mlp_ratio * C)),
            const((mlp_ratio * C, C)), const((1, C)),
        ],
        out_specs=pl.BlockSpec((WBn, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WBn, C), bf)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xw, vpat,
        row_vec(p["norm1"]["scale"]), row_vec(p["norm1"]["bias"]),
        w_bf(p["attn"]["qkv"]["kernel"]), row_vec(p["attn"]["qkv"]["bias"]),
        t, rrow, rcol,
        w_bf(p["attn"]["proj"]["kernel"]), row_vec(p["attn"]["proj"]["bias"]),
        row_vec(p["norm2"]["scale"]), row_vec(p["norm2"]["bias"]),
        w_bf(p["ffn_fc1"]["kernel"]), row_vec(p["ffn_fc1"]["bias"]),
        w_bf(p["ffn_fc2"]["kernel"]), row_vec(p["ffn_fc2"]["bias"]),
    )

    if emit_partitioned:
        return out
    return window_reverse(out, B, H, W, win, shift)
