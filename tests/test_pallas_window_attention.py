"""Parity tests for the Pallas fused window-attention kernel.

Off-TPU the kernel runs in Pallas interpret mode (same code path the
bench/TopDown opt-in takes off-TPU), so these tests pin kernel semantics
against (a) a NumPy-style einsum oracle replicating the flax path and
(b) the full `SwinPose` module with the flag on vs off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_camera_3d_pose_estimation_tpu.models.swin import (
    SwinPose,
    _rel_position_index,
    _shift_mask,
    _shift_regions,
)
from multi_camera_3d_pose_estimation_tpu.ops.pallas.window_attention import (
    fused_window_attention,
    packed_window_attention,
)


def _oracle(qkv, bias_hnn, mask, heads):
    """The einsum path of models/swin.py::WindowAttention, f32."""
    Bw, n, C3 = qkv.shape
    C = C3 // 3
    d = C // heads
    qkv = np.asarray(qkv, np.float32).reshape(Bw, n, 3, heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = np.einsum("bnhd,bmhd->bhnm", q, k) * d ** -0.5
    attn = attn + np.asarray(bias_hnn, np.float32)[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(-1, nW, heads, n, n) + np.asarray(
            mask, np.float32
        )[None, :, None]
        attn = attn.reshape(-1, heads, n, n)
    attn = attn - attn.max(-1, keepdims=True)
    p = np.exp(attn)
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("bhnm,bmhd->bnhd", p, v)
    return out.reshape(Bw, n, C)


@pytest.mark.parametrize("shift", [False, True])
def test_kernel_matches_einsum_oracle(shift):
    rng = np.random.default_rng(0)
    win, heads, C = 4, 2, 32
    n = win * win
    Hp = Wp = 3 * win  # 9 windows/image
    nW = (Hp // win) * (Wp // win)
    B = 2
    Bw = B * nW
    qkv = jnp.asarray(rng.normal(size=(Bw, n, 3 * C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(heads, n, n)), jnp.float32)
    mask = jnp.asarray(_shift_mask(Hp, Wp, win, win // 2)) if shift else None

    got = np.asarray(
        fused_window_attention(qkv, bias, mask, heads=heads, interpret=True)
    )
    want = _oracle(qkv, bias, mask, heads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_kernel_window_batching_mask_phase():
    """Bw spanning several programs: the (program·WB + j) mod nW mask
    indexing must recover each window's own region mask."""
    rng = np.random.default_rng(1)
    win, heads, C = 2, 1, 8
    n = win * win
    Hp = Wp = 3 * win
    nW = 9
    B = 16  # Bw = 144 -> WB=16, several programs, nW !| WB
    Bw = B * nW
    qkv = jnp.asarray(rng.normal(size=(Bw, n, 3 * C)), jnp.float32)
    bias = jnp.zeros((heads, n, n), jnp.float32)
    # Distinct per-window-slot masks (not a valid shift mask; pure index
    # check).
    mask = jnp.asarray(
        rng.normal(size=(nW, n, n)) * 3.0, jnp.float32
    )
    got = np.asarray(
        fused_window_attention(qkv, bias, mask, heads=heads, interpret=True)
    )
    want = _oracle(qkv, bias, mask, heads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("wb", [1, 2, 4])
def test_packed_kernel_matches_einsum_oracle(shift, wb):
    """Packed kernel vs the einsum oracle, incl. wb values that do not
    divide nW (pattern cycling) and multi-window programs."""
    rng = np.random.default_rng(3)
    win, heads, C = 4, 2, 32
    n = win * win
    Hp = Wp = 3 * win  # nW = 9
    nW = (Hp // win) * (Wp // win)
    B = 4
    Bw = B * nW  # 36 windows: wb=4 -> 9 programs, gcd(4,9)=1 -> 9 patterns
    qkv = jnp.asarray(rng.normal(size=(Bw, n, 3 * C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(heads, n, n)), jnp.float32)
    if shift:
        regions = _shift_regions(Hp, Wp, win, win // 2)
        mask = jnp.asarray(_shift_mask(Hp, Wp, win, win // 2))
    else:
        regions = mask = None

    got = np.asarray(packed_window_attention(
        qkv, bias, regions, heads=heads, wb=wb, interpret=True))
    want = _oracle(qkv, bias, mask, heads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_kernel_exact_block_diagonal():
    """exp(−1e5) must underflow to exactly 0 so cross-window garbage
    cannot leak through the stacked AV matmul: two windows with wildly
    different value scales must not bleed into each other."""
    rng = np.random.default_rng(4)
    win, heads, C = 2, 1, 8
    n = win * win
    Bw = 2
    qkv = np.asarray(rng.normal(size=(Bw, n, 3 * C)), np.float32)
    qkv[1, :, 2 * C:] *= 1e4  # huge v in window 1
    bias = jnp.zeros((heads, n, n), jnp.float32)
    got = np.asarray(packed_window_attention(
        jnp.asarray(qkv), bias, None, heads=heads, wb=2, interpret=True))
    want = _oracle(jnp.asarray(qkv), bias, None, heads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_swinpose_flag_parity(monkeypatch):
    """Full model, flag on vs off, same variables -> same heatmaps.

    Also asserts the kernel is actually INVOKED when the flag is on (an
    earlier revision silently dropped the flag at the SwinPose →
    SwinTransformer boundary, making an output-only parity check
    vacuous — both paths ran the einsum)."""
    import multi_camera_3d_pose_estimation_tpu.ops.pallas.window_attention as wa

    calls = {"loop": [], "packed": []}
    orig_loop = wa.fused_window_attention
    orig_packed = wa.packed_window_attention

    def counted_loop(*a, **k):
        calls["loop"].append(1)
        return orig_loop(*a, **k)

    def counted_packed(*a, **k):
        calls["packed"].append(1)
        return orig_packed(*a, **k)

    monkeypatch.setattr(wa, "fused_window_attention", counted_loop)
    monkeypatch.setattr(wa, "packed_window_attention", counted_packed)

    cfg = {"embed": 24, "depths": (1, 1), "heads": (2, 4), "window": 4,
           "mlp_ratio": 2, "deconv": (16,)}
    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=(2, 64, 64, 3)), jnp.float32
    )
    ref_model = SwinPose(num_joints=17, cfg=cfg)
    variables = ref_model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(ref_model.apply(variables, x))
    assert not calls["loop"] and not calls["packed"], \
        "einsum path must not touch the kernels"
    # bf16 activations dominate the tolerance; both kernels keep the same
    # f32 score/softmax accumulation as the einsum path.
    pal_model = SwinPose(num_joints=17, cfg=cfg, use_pallas_attention=True)
    got = np.asarray(pal_model.apply(variables, x))
    assert len(calls["packed"]) == 2, \
        f"packed kernel not reached by the flag: {calls}"
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-2)

    loop_model = SwinPose(num_joints=17, cfg=cfg, use_pallas_attention="loop")
    got_loop = np.asarray(loop_model.apply(variables, x))
    assert len(calls["loop"]) == 2, \
        f"loop kernel not reached by the flag: {calls}"
    np.testing.assert_allclose(got_loop, ref, rtol=0, atol=2e-2)
