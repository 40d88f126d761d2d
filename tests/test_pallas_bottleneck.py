"""Parity tests for the Pallas stage-1 Bottleneck kernel (interpret mode).

The kernel (ops/pallas/bottleneck.py) must match the flax Bottleneck
path bit-for-tolerance: same BN folding, same zero-padded 3x3, same
residual conventions — checked both block-level (vs a lax conv
reference) and model-level (HRNet.apply with and without fused_stage1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_camera_3d_pose_estimation_tpu.models.hrnet import HRNet, Bottleneck
from multi_camera_3d_pose_estimation_tpu.ops.pallas.bottleneck import (
    fold_bottleneck_params,
    fused_bottleneck_block,
    make_fused_stage1,
)


def _init_block(key, cin, with_stats_noise=True):
    block = Bottleneck(64, dtype=jnp.float32)
    variables = block.init(key, jnp.zeros((1, 8, 8, cin)))
    if with_stats_noise:
        # Non-trivial BN statistics so the folding is actually exercised.
        def jitter(path, leaf):
            name = "/".join(str(p.key) for p in path)
            k = jax.random.fold_in(key, hash(name) % (2**31))
            if name.endswith("mean"):
                return jax.random.normal(k, leaf.shape) * 0.1
            if name.endswith("var"):
                return 1.0 + jax.random.uniform(k, leaf.shape)
            if name.endswith("scale"):
                return 1.0 + 0.2 * jax.random.normal(k, leaf.shape)
            if name.endswith("bias"):
                return 0.1 * jax.random.normal(k, leaf.shape)
            return leaf

        variables = jax.tree_util.tree_map_with_path(jitter, variables)
    return block, variables


@pytest.mark.parametrize("cin", [64, 256])
def test_fused_block_matches_flax(cin):
    key = jax.random.PRNGKey(0 if cin == 64 else 1)
    block, variables = _init_block(key, cin)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 16, 12, cin), jnp.float32)

    ref = block.apply(variables, x)
    folded = fold_bottleneck_params(variables["params"],
                                    variables["batch_stats"])
    # cin==256 has an identity residual (no ConvBN_3) — check the folder
    # mirrored the module structure.
    assert ("Wd" in folded) == (cin != 256)
    out = fused_bottleneck_block(x, folded, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_stage1_matches_model():
    cfg = {"widths": (8, 16, 32, 64), "modules": (1, 1, 1, 1), "stem": 64}
    model = HRNet(num_joints=5, cfg=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(4), x)

    ref = model.apply(variables, x)
    fn = make_fused_stage1(variables, interpret=True)
    out = model.apply(variables, x, fused_stage1=fn)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_estimator_keypoints_match_with_pallas_stage1():
    """TopDownEstimator(use_pallas_stage1=True) must produce the same
    keypoints/gaussians as the plain flax path (interpret mode off-TPU)."""
    from multi_camera_3d_pose_estimation_tpu.models.topdown import (
        TopDownEstimator,
    )

    cfg = {"widths": (8, 16, 32, 64), "modules": (1, 1, 1, 1), "stem": 16}
    model = HRNet(num_joints=17, cfg=cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)))

    frames = jax.random.uniform(jax.random.PRNGKey(5), (2, 96, 80, 3))
    bboxes = jnp.asarray([[8.0, 4.0, 72.0, 92.0], [0.0, 0.0, 80.0, 96.0]])

    plain = TopDownEstimator(model, variables, input_size=(32, 64),
                             decode="heatmap")
    fused = TopDownEstimator(model, variables, input_size=(32, 64),
                             decode="heatmap", use_pallas_stage1=True)
    assert fused._fused_stage1 is not None
    a = plain.predict_batch(frames, bboxes)
    b = fused.predict_batch(frames, bboxes)
    np.testing.assert_allclose(np.asarray(b["keypoints"]),
                               np.asarray(a["keypoints"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b["gaussians"]),
                               np.asarray(a["gaussians"]),
                               rtol=1e-3, atol=1e-3)


def test_fused_stage1_param_tree_unchanged():
    """The fused path must declare the SAME parameter tree (checkpoint
    and converter compatibility)."""
    cfg = {"widths": (8, 16, 32, 64), "modules": (1, 1, 1, 1), "stem": 64}
    model = HRNet(num_joints=5, cfg=cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v_plain = model.init(jax.random.PRNGKey(0), x)

    def dummy_fn(h):
        return jnp.zeros(h.shape[:3] + (256,), h.dtype)

    v_fused = model.init(jax.random.PRNGKey(0), x, fused_stage1=dummy_fn)
    flat_p = jax.tree_util.tree_flatten_with_path(v_plain)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(v_fused)[0]
    paths_p = ["/".join(str(k.key) for k in p) for p, _ in flat_p]
    paths_f = ["/".join(str(k.key) for k in p) for p, _ in flat_f]
    assert paths_p == paths_f
    for (_, a), (_, b) in zip(flat_p, flat_f):
        assert a.shape == b.shape


@pytest.mark.slow
def test_pallas_stage1_rejects_non_hrnet_heatmap_models():
    """use_pallas_stage1 fuses HRNet's stage-1 Bottlenecks; a heatmap
    model without them (e.g. Swin) must be rejected with a clear error,
    not a KeyError from the BN-folding internals."""
    from multi_camera_3d_pose_estimation_tpu.models.swin import SwinPose
    from multi_camera_3d_pose_estimation_tpu.models.topdown import (
        TopDownEstimator,
    )

    cfg = {"embed": 8, "depths": (1, 1), "heads": (1, 2), "window": 2,
           "mlp_ratio": 1, "deconv": (8,)}
    model = SwinPose(num_joints=3, cfg=cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError, match="Bottleneck"):
        TopDownEstimator(model, variables, input_size=(32, 32),
                         decode="heatmap", use_pallas_stage1=True)
