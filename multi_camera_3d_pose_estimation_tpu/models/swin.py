"""Swin Transformer top-down heatmap pose model — flax linen, NHWC.

From-scratch TPU-native build of the reference's *actual* flagship pose
checkpoints: `coco_swin-b` / `coco_swin-l`
(/root/reference/examples/model_paths.yaml:9-15, loaded through MMPose at
mmpose_pose_estimation.py:103-109).  Architecture follows the public Swin
paper (Liu et al., ICCV'21) in the MMPose/mmcv backbone configuration
(patch4, window7, depths (2,2,18,2)) with the standard MMPose
`HeatmapHead` (three 4×4-stride-2 deconv+BN+ReLU stages from the 1/32
feature map up to 1/4, then a 1×1 conv to K heatmaps), so trained MMPose
Swin checkpoints convert 1:1 (`models/convert.py::load_torch_swin`).
Submodules carry explicit names mirroring the torch state-dict hierarchy,
making the conversion name-based rather than order-based.

Numerics pinned to the mmcv implementation (validated against the
independent torch mirror in models/mirrors/swin.py):

- feature maps are right/bottom zero-padded to window multiples; padded
  tokens PARTICIPATE in window attention (the mmcv/official-backbone
  behavior — only the shifted-window region mask is applied, computed on
  the padded grid);
- PatchMerging concatenates the 2×2 neighborhood **channel-major**
  (nn.Unfold order: index = c·4 + dy·2 + dx), which differs from the
  original classification repo's offset-major order — the reduction
  weight consumes this exact order;
- exact (erf) GELU, LayerNorm eps 1e-5, qkv bias, per-window relative
  position bias from a ((2w−1)², heads) table.

TPU notes: window attention is pure reshape + batched matmul (MXU);
NHWC, bfloat16 activations with float32 params, all shapes static —
window partition/padding/mask geometry is resolved at trace time with
numpy.  The K-channel heatmap output feeds the same fused on-device
decode as HRNet (`ops.heatmap_moments`), so frame→Gaussian stays one
jitted program.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SwinPose", "SwinTransformer", "SWIN_B", "SWIN_L", "SWIN_T"]

# MMPose td-hm_swin-{b,l}-p4-w7_coco-256x192 backbones + HeatmapHead.
SWIN_B = {
    "embed": 128, "depths": (2, 2, 18, 2), "heads": (4, 8, 16, 32),
    "window": 7, "mlp_ratio": 4, "deconv": (256, 256, 256),
}
SWIN_L = {
    "embed": 192, "depths": (2, 2, 18, 2), "heads": (6, 12, 24, 48),
    "window": 7, "mlp_ratio": 4, "deconv": (256, 256, 256),
}
SWIN_T = {
    "embed": 96, "depths": (2, 2, 6, 2), "heads": (3, 6, 12, 24),
    "window": 7, "mlp_ratio": 4, "deconv": (256, 256, 256),
}


def _rel_position_index(w: int) -> np.ndarray:
    """(w², w²) index into the (2w−1)² relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, w²)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)  # (w², w², 2)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def _shift_regions(hp: int, wp: int, win: int, shift: int) -> np.ndarray:
    """(nW, w²) per-token region ids for the shifted-window mask.

    Built on the PADDED (hp, wp) grid exactly as the official backbone
    does: three h-slices × three w-slices label the wrapped regions after
    the cyclic roll; tokens from different regions may not attend.
    """
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    m = img.reshape(hp // win, win, wp // win, win)
    return m.transpose(0, 2, 1, 3).reshape(-1, win * win)  # (nW, w²)


def _shift_mask(hp: int, wp: int, win: int, shift: int) -> np.ndarray:
    """(nW, w², w²) additive attention mask for shifted windows
    (−100 ≈ −inf in softmax) from the pairwise region-id comparison."""
    m = _shift_regions(hp, wp, win, shift)
    return np.where(m[:, None, :] != m[:, :, None], -100.0, 0.0).astype(np.float32)


def _window_partition(x: jax.Array, win: int) -> jax.Array:
    """(B, Hp, Wp, C) → (B·nW, w², C)."""
    B, Hp, Wp, C = x.shape
    x = x.reshape(B, Hp // win, win, Wp // win, win, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, C)


def _window_reverse(x: jax.Array, win: int, B: int, Hp: int, Wp: int) -> jax.Array:
    """(B·nW, w², C) → (B, Hp, Wp, C)."""
    C = x.shape[-1]
    x = x.reshape(B, Hp // win, Wp // win, win, win, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)


class WindowAttention(nn.Module):
    """Multi-head self-attention inside (optionally shifted) windows.

    Operates on the full (B, H, W, C) map: pads to window multiples,
    rolls for the shift, partitions, attends with relative position bias
    (+ shift mask), reverses, crops.  All geometry static.
    """

    heads: int
    window: int
    shift: int = 0
    dtype: Any = jnp.bfloat16
    # Opt-in Pallas fused attention core (ops/pallas/window_attention.py):
    # scores+bias+mask+softmax+AV stay VMEM-resident instead of
    # round-tripping the (B·nW, heads, w², w²) tensor through HBM.  Same
    # parameters, same numerics (f32 score accumulation/softmax).
    # True / "packed" → the window-packed kernel (one MXU issue per WB
    # windows); "loop" → the per-window kernel (kept for A/B).
    use_pallas: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        win = self.window
        shift = self.shift
        head_dim = C // self.heads
        if C % self.heads:
            raise ValueError(f"channels {C} not divisible by heads {self.heads}")

        pad_b = (win - H % win) % win
        pad_r = (win - W % win) % win
        Hp, Wp = H + pad_b, W + pad_r
        # NOTE: no small-map shift adaptation — the mmdet-lineage Swin
        # backbone MMPose uses shifts + masks unconditionally (the region
        # mask makes a single-window shift well-defined); the torch
        # mirror (models/mirrors/swin.py) implements the same.

        table = self.param(
            "bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * win - 1) ** 2, self.heads),
            jnp.float32,
        )
        # Pad BEFORE the qkv projection (mmcv order): padded tokens carry
        # the qkv bias, and they participate in window attention.
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = _window_partition(x, win)  # (B·nW, w², C)
        qkv = nn.Dense(
            3 * C, dtype=self.dtype, param_dtype=jnp.float32, name="qkv"
        )(xw)
        n = win * win
        bias = table[_rel_position_index(win)]  # (n, n, heads) f32
        if self.use_pallas == "loop":
            from ..ops.pallas.window_attention import fused_window_attention

            mask = (jnp.asarray(_shift_mask(Hp, Wp, win, shift))
                    if shift else None)
            out = fused_window_attention(
                qkv, bias.transpose(2, 0, 1), mask, heads=self.heads
            )
        elif self.use_pallas:
            from ..ops.pallas.window_attention import packed_window_attention

            regions = (_shift_regions(Hp, Wp, win, shift)
                       if shift else None)
            out = packed_window_attention(
                qkv, bias.transpose(2, 0, 1), regions, heads=self.heads
            )
        else:
            qkv = qkv.reshape(-1, n, 3, self.heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B·nW, n, h, d)

            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
            ) * (head_dim ** -0.5)
            attn = attn + bias.transpose(2, 0, 1)[None]
            if shift:
                mask = jnp.asarray(_shift_mask(Hp, Wp, win, shift))  # (nW, n, n)
                nw = mask.shape[0]
                attn = attn.reshape(-1, nw, self.heads, n, n) + mask[None, :, None]
                attn = attn.reshape(-1, self.heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)

            out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
            ).astype(self.dtype)
            out = out.reshape(-1, n, C)
        out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)

        out = _window_reverse(out, win, B, Hp, Wp)
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out[:, :H, :W, :]


class SwinBlock(nn.Module):
    """LN → (S)W-MSA → residual; LN → MLP(ratio·C, GELU) → residual."""

    heads: int
    window: int
    shift: int = 0
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16
    use_pallas: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 pre_part: tuple[int, int, int] | None = None,
                 emit_part: bool = False,
                 fixed_geom: tuple[int, int, int] | None = None,
                 fixed_cp: int = 1) -> jax.Array:
        """``pre_part=(B, H, W)``: ``x`` is already this block's
        window-order token matrix (chained stage layout — the stage loop
        moves tokens between blocks with `window_roll_perm` gathers);
        ``emit_part``: return window-order tokens, pads zeroed.  Both
        require the fused-block path (the stage loop gates on
        `feasible_wb` for every block before chaining).
        ``fixed_geom=(B, H, W)``: ``x`` is the stage's FIXED-ORDER crop
        packs (`ops.pallas.swin_block.fixed_partition`) — in and out;
        shifted blocks differ only by their additive table, so the stage
        loop chains blocks with ZERO layout ops (gate on
        `feasible_fixed`)."""
        C = x.shape[-1]
        if fixed_geom is not None and not self.is_initializing():
            if self.use_pallas != "block":
                raise ValueError(
                    "fixed-order layout requires use_pallas='block'")
            # Param-declaration via the slab path below never runs for
            # fixed mode (apply-time only); declare through the regular
            # submodules on a dummy slab to keep the variable tree
            # identical, then call the fixed kernel.
            slab = jnp.zeros((1, self.window, self.window, C), x.dtype)
            ln = dict(epsilon=1e-5, dtype=self.dtype,
                      param_dtype=jnp.float32)
            y = nn.LayerNorm(**ln, name="norm1")(slab)
            y = WindowAttention(self.heads, self.window, self.shift,
                                dtype=self.dtype, use_pallas=False,
                                name="attn")(y)
            y2 = nn.LayerNorm(**ln, name="norm2")(slab)
            y2 = nn.Dense(self.mlp_ratio * C, dtype=self.dtype,
                          param_dtype=jnp.float32, name="ffn_fc1")(y2)
            nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="ffn_fc2")(y2)
            from ..ops.pallas.swin_block import fused_swin_block_fixed

            return fused_swin_block_fixed(
                x, self.variables["params"], heads=self.heads,
                window=self.window, shift=self.shift,
                mlp_ratio=self.mlp_ratio, geom=fixed_geom, cp=fixed_cp,
            )
        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        # "block": run the WHOLE block as one Pallas program set
        # (ops/pallas/swin_block.py) when the stage's weights + packing
        # tensor fit VMEM; params are still declared by the flax
        # submodules on a dummy slab so the variable tree (and thus
        # checkpoints/converters) is identical, and they ride into the
        # kernel as jit arguments via self.variables (NOT closure
        # constants — Swin-B's 88M params would blow the remote-compile
        # body limit, see PROFILE.md).
        fused_wb = None
        initializing = self.is_initializing()
        if self.use_pallas == "block" and not initializing:
            from ..ops.pallas.swin_block import feasible_wb

            shape4 = (pre_part + (C,)) if pre_part is not None else x.shape
            fused_wb = feasible_wb(shape4, self.heads, self.window,
                                   self.mlp_ratio)
        if (pre_part is not None or emit_part) and fused_wb is None:
            raise ValueError(
                "chained window layout requires the fused-block path; "
                "gate the stage on feasible_wb before chaining")
        attn_flag = self.use_pallas
        if attn_flag == "block":
            # Infeasible stage (or init pass) → fall back to the packed
            # attention kernel (einsum at init: params are flag-
            # independent and the kernel has nothing to measure there).
            attn_flag = False if initializing else True
        if fused_wb is not None:
            # Param-declaration slab (values unused; shapes drive init).
            xin = (jnp.zeros((1, self.window, self.window, C), x.dtype)
                   if pre_part is not None
                   else x[:1, :self.window, :self.window, :])
        else:
            xin = x
        y = nn.LayerNorm(**ln, name="norm1")(xin)
        y = WindowAttention(
            self.heads, self.window, self.shift, dtype=self.dtype,
            use_pallas=False if fused_wb is not None else attn_flag,
            name="attn",
        )(y)
        y = xin + y
        y2 = nn.LayerNorm(**ln, name="norm2")(y)
        y2 = nn.Dense(
            self.mlp_ratio * C, dtype=self.dtype, param_dtype=jnp.float32,
            name="ffn_fc1",
        )(y2)
        y2 = nn.gelu(y2, approximate=False)  # torch nn.GELU = exact erf
        y2 = nn.Dense(
            C, dtype=self.dtype, param_dtype=jnp.float32, name="ffn_fc2"
        )(y2)
        if fused_wb is None:
            return y + y2
        from ..ops.pallas.swin_block import fused_swin_block

        return fused_swin_block(
            x, self.variables["params"], heads=self.heads,
            window=self.window, shift=self.shift,
            mlp_ratio=self.mlp_ratio, wb=fused_wb,
            pre_partitioned=pre_part, emit_partitioned=emit_part,
        )


class PatchMerging(nn.Module):
    """2×2 → 1 token downsample: channel-major concat → LN → Linear 4C→2C.

    Channel order matches mmcv's nn.Unfold flattening (index = c·4 + dy·2
    + dx) — NOT the original classification repo's offset-major concat;
    the reduction weight consumes this exact order (checkpoint parity).
    """

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            raise ValueError(f"PatchMerging needs even dims, got {(H, W)}")
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/2, W/2, C, dy, dx)
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm"
        )(x)
        return nn.Dense(
            2 * C, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="reduction",
        )(x)


class SwinTransformer(nn.Module):
    """Swin backbone; (B, H, W, 3) → final 1/32 feature map (NHWC), LN'd.

    out_indices=(3,) like the MMPose pose configs — only the last stage
    feeds the head, so earlier out-norms are neither computed nor
    parameterized (they are absent from pose checkpoints too).
    """

    cfg: Any = None
    dtype: Any = jnp.bfloat16
    use_pallas_attention: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg or SWIN_B
        depths: Sequence[int] = cfg["depths"]
        heads: Sequence[int] = cfg["heads"]
        win = cfg["window"]
        mlp_ratio = cfg.get("mlp_ratio", 4)
        x = x.astype(self.dtype)

        H, W = x.shape[1], x.shape[2]
        if H % 32 or W % 32:
            raise ValueError(
                f"Swin input height/width must be divisible by 32 (patch4 + "
                f"three even patch-merges); got {(H, W)}"
            )

        # Patch embed: 4×4 stride-4 conv + LN (mmcv PatchEmbed).
        x = nn.Conv(
            cfg["embed"], (4, 4), strides=(4, 4), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32,
            name="patch_embed_projection",
        )(x)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name="patch_embed_norm",
        )(x)

        for i, depth in enumerate(depths):
            blocks = [
                SwinBlock(
                    heads[i], win, shift=(win // 2) if j % 2 else 0,
                    mlp_ratio=mlp_ratio, dtype=self.dtype,
                    use_pallas=self.use_pallas_attention,
                    name=f"stage_{i}_block_{j}",
                )
                for j in range(depth)
            ]
            # Chained window layout (PROFILE.md Swin appendix, the 13%
            # layout item): when every block of the stage runs the fused
            # kernel, tokens stay in window order BETWEEN blocks — each
            # reverse→roll→pad→re-partition pair collapses into one
            # static `window_roll_perm` gather, and the fused kernel
            # zeroes pad tokens at output so the gather reproduces
            # mmcv's crop + fresh zero-pad semantics exactly.
            chain = (
                self.use_pallas_attention == "block"
                and not self.is_initializing()
                and depth > 1
            )
            fixed_cp = None
            if chain:
                from ..ops.pallas.swin_block import (feasible_fixed,
                                                     feasible_wb,
                                                     fixed_partition,
                                                     fixed_reverse,
                                                     window_roll_perm)

                # Every block of a stage shares (B, H, W, C) and heads,
                # so one feasibility check covers the whole chain.
                Bc, Hc, Wc, Cc = x.shape
                chain = feasible_wb(x.shape, heads[i], win,
                                    mlp_ratio) is not None
                # Fixed-order layout (zero inter-block layout ops) is a
                # measured NEGATIVE on the Swin-B pipeline (round 4:
                # 663.1 chained vs 615.2 all-fixed vs 641.0 stages-2/3
                # only — PROFILE.md round-4 appendix), so the chained
                # gathers stay the default; MC3D_SWIN_FIXED=1 (all
                # feasible stages) or a comma list of channel widths
                # ("512,1024") opts in per stage for A/B.
                import os

                env = os.environ.get("MC3D_SWIN_FIXED", "0")
                on = (env != "0" if env in ("0", "1")
                      else str(Cc) in env.split(","))
                if chain and on:
                    fixed_cp = feasible_fixed(x.shape, heads[i], win,
                                              mlp_ratio)
            if chain and fixed_cp is not None:
                from ..ops.pallas.swin_block import fused_swin_stage_fixed

                geom = (Bc, Hc, Wc)
                shifts = [(win // 2) if j % 2 else 0 for j in range(depth)]
                # The stage-level call groups G blocks per Pallas program
                # (feasible_chain_group): x round-trips HBM once per
                # group.  Params come from the parent's variable tree —
                # the SwinBlock modules declared them at init.
                plist = [self.variables["params"][f"stage_{i}_block_{j}"]
                         for j in range(depth)]
                xw = fused_swin_stage_fixed(
                    fixed_partition(x, win), plist, heads=heads[i],
                    window=win, shifts=shifts, mlp_ratio=mlp_ratio,
                    geom=geom, cp=fixed_cp)
                x = fixed_reverse(xw, Bc, Hc, Wc, win)
            elif chain:
                geom = (Bc, Hc, Wc)
                shifts = [(win // 2) if j % 2 else 0 for j in range(depth)]
                xw = blocks[0](x, emit_part=True)
                for j in range(1, depth):
                    perm = jnp.asarray(
                        window_roll_perm(Hc, Wc, win, shifts[j - 1],
                                         shifts[j]))
                    xw = xw.reshape(Bc, -1, Cc)[:, perm].reshape(-1, Cc)
                    xw = blocks[j](xw, pre_part=geom,
                                   emit_part=j < depth - 1)
                x = xw
            else:
                for blk in blocks:
                    x = blk(x)
            if i < len(depths) - 1:
                x = PatchMerging(dtype=self.dtype, name=f"downsample_{i}")(x)

        return nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            name="out_norm",
        )(x)


class Deconv(nn.Module):
    """torch ConvTranspose2d(k, s, p, bias=False) equivalent, NHWC.

    Implemented directly as the conv adjoint — lhs-dilate by the stride,
    pad (k−1−p), cross-correlate with the spatially flipped kernel — so
    the semantics match torch exactly (flax's ConvTranspose padding
    convention differs).  Kernel stored HWIO like nn.Conv; the converter
    maps torch's (in, out, kh, kw) via transpose(2, 3, 0, 1).
    """

    features: int
    kernel: int = 4
    stride: int = 2
    pad: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p = self.kernel, self.stride, self.pad
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        e = k - 1 - p
        return jax.lax.conv_general_dilated(
            x,
            jnp.flip(w, (0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=((e, e), (e, e)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class SwinPose(nn.Module):
    """Swin heatmap pose estimator; returns (B, H/4, W/4, num_joints).

    Backbone (1/32) + MMPose HeatmapHead: 3 × [deconv4s2 → BN → ReLU]
    (channels cfg["deconv"]) + 1×1 conv to K.  Same output contract as
    `HRNet` — drop-in for `TopDownEstimator` with decode="heatmap".
    """

    num_joints: int = 17
    cfg: Any = None
    dtype: Any = jnp.bfloat16
    use_pallas_attention: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg or SWIN_B
        x = SwinTransformer(cfg=cfg, dtype=self.dtype,
                            use_pallas_attention=self.use_pallas_attention,
                            name="backbone")(x, train)
        for d, ch in enumerate(cfg["deconv"]):
            x = Deconv(ch, dtype=self.dtype, name=f"deconv_{d}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"deconv_bn_{d}",
            )(x)
            x = nn.relu(x)
        heat = nn.Conv(
            self.num_joints, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="final_layer",
        )(x)
        return heat.astype(jnp.float32)
