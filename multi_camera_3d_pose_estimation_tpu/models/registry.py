"""Model registry: name → built estimator (the `model_paths.yaml` surface).

The reference selects models by MMPose/MMDetection config names in
`model_paths.yaml` (examples/model_paths.yaml:1-18, consumed at
pose_estimation.py:290-297).  This registry preserves that YAML surface:
the same file schema (``pose_estimation_models: {<name>: {...}}`` plus
detector entries) resolves to from-scratch flax models here.  Checkpoints
are orbax/npz files of OUR parameter pytrees; `convert.load_torch_hrnet`
can translate upstream torch HRNet weights when a file is provided (no
downloads — zero-egress environment).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .hrnet import HRNET_W32, HRNET_W48, HRNet
from .rtmpose import RTMPOSE_M, RTMPOSE_S, RTMPOSE_T, RTMPose
from .swin import SWIN_B, SWIN_L, SwinPose
from .topdown import TopDownEstimator

__all__ = [
    "MODEL_REGISTRY",
    "DETECTOR_REGISTRY",
    "build_estimator",
    "build_detector",
    "resolve_model_name",
]

# name → (family, cfg, decode, input_size (w, h))
MODEL_REGISTRY: dict[str, dict[str, Any]] = {
    # Heatmap path (BASELINE config 2; the reference's swin/heatmap models
    # map onto the HRNet heatmap family here).
    "coco_hrnet_w32": {"family": "hrnet", "cfg": HRNET_W32, "decode": "heatmap",
                       "input_size": (192, 256)},
    "coco_hrnet_w48": {"family": "hrnet", "cfg": HRNET_W48, "decode": "heatmap",
                       "input_size": (288, 384)},
    # Swin heatmap path — the reference's *named* flagship checkpoints
    # (`coco_swin-b`/`coco_swin-l`, examples/model_paths.yaml:9-15; both
    # MMPose configs are 256x192 crops).
    "coco_swin-b": {"family": "swin", "cfg": SWIN_B, "decode": "heatmap",
                    "input_size": (192, 256)},
    "coco_swin-l": {"family": "swin", "cfg": SWIN_L, "decode": "heatmap",
                    "input_size": (192, 256)},
    # SimCC path (BASELINE config 3; reference `coco_rtmpose-t`,
    # examples/model_paths.yaml:14-18).
    "coco_rtmpose-t": {"family": "rtmpose", "cfg": RTMPOSE_T, "decode": "simcc",
                       "input_size": (192, 256)},
    "coco_rtmpose-s": {"family": "rtmpose", "cfg": RTMPOSE_S, "decode": "simcc",
                       "input_size": (192, 256)},
    "coco_rtmpose-m": {"family": "rtmpose", "cfg": RTMPOSE_M, "decode": "simcc",
                       "input_size": (256, 256)},
    # Minimal smoke-test model (CI / CPU pipeline tests; not for accuracy).
    "test_tiny": {
        "family": "hrnet",
        "cfg": {"widths": (8, 16, 32, 64), "modules": (1, 1, 1, 1), "stem": 16},
        "decode": "heatmap",
        "input_size": (32, 64),
    },
    # Small CPU-trainable model with a usable heatmap resolution (demos).
    "test_small_128": {
        "family": "hrnet",
        "cfg": {"widths": (16, 32, 64, 128), "modules": (1, 1, 1, 1), "stem": 32},
        "decode": "heatmap",
        "input_size": (128, 128),
    },
    # Tiny Swin (CPU-budget: 2 stages -> 1/8 backbone, one deconv -> the
    # 1/4 heatmap the training targets expect) for harness smoke tests.
    "test_swin_128": {
        "family": "swin",
        "cfg": {"embed": 24, "depths": (1, 1), "heads": (2, 4), "window": 4,
                "mlp_ratio": 2, "deconv": (16,)},
        "decode": "heatmap",
        "input_size": (128, 128),
    },
    # Thin Swin at the production crop (TPU-budget trainable; proves the
    # Swin family end-to-end in the accuracy harness).
    "test_swin_192x256": {
        "family": "swin",
        "cfg": {"embed": 48, "depths": (2, 2, 4, 2), "heads": (2, 4, 8, 16),
                "window": 7, "mlp_ratio": 2, "deconv": (64, 64, 64)},
        "decode": "heatmap",
        "input_size": (192, 256),
    },
    # Same small HRNet at the production crop size (48x64 heatmap) — the
    # accuracy harness's heatmap-family model (TPU-budget trainable).
    "test_small_192x256": {
        "family": "hrnet",
        "cfg": {"widths": (16, 32, 64, 128), "modules": (1, 1, 1, 1), "stem": 32},
        "decode": "heatmap",
        "input_size": (192, 256),
    },
}

_ALIASES = {
    # Underscore spellings of the reference's dashed names.
    "coco_swin_b": "coco_swin-b",
    "coco_swin_l": "coco_swin-l",
}


def resolve_model_name(name: str) -> str:
    if name in MODEL_REGISTRY:
        return name
    if name in _ALIASES:
        return _ALIASES[name]
    raise KeyError(
        f"unknown model '{name}'; available: {sorted(MODEL_REGISTRY)} "
        f"(aliases: {sorted(_ALIASES)})"
    )


def build_estimator(
    name: str = "coco_hrnet_w32",
    checkpoint: str | None = None,
    num_joints: int = 17,
    seed: int = 0,
    dtype=jnp.bfloat16,
    use_pallas_attention: bool | str | None = None,
    **estimator_kwargs,
) -> TopDownEstimator:
    """Construct a ready `TopDownEstimator` by registry name.

    ``checkpoint``: path to an .npz/.msgpack of our parameter pytree, or a
    torch .pth for the hrnet family (converted on load).  None → random
    init (pipeline-correct; accuracy requires trained weights).
    ``use_pallas_attention`` (swin family only): Pallas kernel selection
    — None (default) picks the whole-SwinBlock fused kernel on TPU
    (ops/pallas/swin_block.py; VMEM-infeasible stages fall back to the
    packed attention kernel automatically) and the XLA einsum path
    elsewhere; True/"block"/"loop"/False force a variant (see
    models/swin.py::WindowAttention).
    ``estimator_kwargs`` pass through to `TopDownEstimator` (e.g.
    ``decode_mode="dark"``, ``flip_test=True``).
    """
    spec = MODEL_REGISTRY[resolve_model_name(name)]
    in_w, in_h = spec["input_size"]
    if use_pallas_attention is not None and spec["family"] != "swin":
        raise ValueError(
            f"use_pallas_attention applies to the swin family only, not "
            f"'{name}' ({spec['family']})")
    if spec["family"] == "hrnet":
        model = HRNet(num_joints=num_joints, cfg=spec["cfg"], dtype=dtype)
    elif spec["family"] == "swin":
        if use_pallas_attention is None:
            use_pallas_attention = (
                "block" if jax.default_backend() == "tpu" else False)
        model = SwinPose(num_joints=num_joints, cfg=spec["cfg"], dtype=dtype,
                         use_pallas_attention=use_pallas_attention)
    else:
        model = RTMPose(
            num_joints=num_joints,
            input_size=spec["input_size"],
            cfg=spec["cfg"],
            dtype=dtype,
        )
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, in_h, in_w, 3)))
    if checkpoint:
        variables = _load_checkpoint(variables, checkpoint, spec["family"], spec["cfg"])
    return TopDownEstimator(
        model, variables, input_size=spec["input_size"], decode=spec["decode"],
        **estimator_kwargs,
    )


# Detector registry (the `detectors:` section of model_paths.yaml —
# reference examples/model_paths.yaml:1-7 selects mmdet person detectors;
# here names resolve to the from-scratch CenterNet or the full-frame
# fallback, mmpose_pose_estimation.py:246-250's failure path as a choice).
DETECTOR_REGISTRY: dict[str, dict[str, Any]] = {
    "full_frame": {"width": None},
    "centernet_w32": {"width": 32},
    "centernet_w16": {"width": 16},
    # Tiny CPU-trainable detector (tests/demos).
    "test_centernet_w8": {"width": 8},
    # The reference's named zoo detector (examples/model_paths.yaml:1-7):
    # MMDet YOLOX, imported via convert.load_torch_yolox.
    "yolox_tiny": {"family": "yolox",
                   "cfg": {"widen": 0.375, "deepen": 0.33, "num_classes": 80}},
    "yolox_s": {"family": "yolox",
                "cfg": {"widen": 0.5, "deepen": 0.33, "num_classes": 80}},
    # Tiny CPU-trainable/testable YOLOX (tests).
    "test_yolox_micro": {"family": "yolox",
                         "cfg": {"widen": 0.125, "deepen": 0.33,
                                 "num_classes": 80}},
    # The reference's PRIMARY named detector (`coco_base` =
    # rtmdet_m person-only, examples/model_paths.yaml:1-4); imported via
    # convert.load_torch_rtmdet.
    "rtmdet_m": {"family": "rtmdet",
                 "cfg": {"widen": 0.75, "deepen": 0.67, "num_classes": 1,
                         "neck_out": 192, "num_csp_blocks": 2}},
    "rtmdet_tiny": {"family": "rtmdet",
                    "cfg": {"widen": 0.375, "deepen": 0.167,
                            "num_classes": 1, "neck_out": 96,
                            "num_csp_blocks": 1}},
    # Tiny CPU-trainable/testable RTMDet (tests).
    "test_rtmdet_micro": {"family": "rtmdet",
                          "cfg": {"widen": 0.125, "deepen": 0.167,
                                  "num_classes": 1, "neck_out": 32,
                                  "num_csp_blocks": 1}},
}


def build_detector(
    name: str = "full_frame",
    checkpoint: str | None = None,
    bbox_thr: float = 0.3,
    seed: int = 0,
    input_hw: tuple[int, int] = (256, 256),
    dtype=jnp.bfloat16,
    select: str = "top1",
):
    """Construct a ready `SinglePersonDetector` by registry name.

    ``"full_frame"`` returns the zero-cost whole-frame detector; CenterNet
    names build the flax model (random init unless ``checkpoint`` is an
    npz/orbax of our pytree).  ``input_hw`` only seeds parameter shapes —
    the model is fully convolutional.
    """
    from .detector import CenterNetDetector, SinglePersonDetector

    if name not in DETECTOR_REGISTRY:
        raise KeyError(
            f"unknown detector '{name}'; available: {sorted(DETECTOR_REGISTRY)}"
        )
    spec = DETECTOR_REGISTRY[name]
    if spec.get("family") == "yolox":
        from .yolox import YOLOX

        cfg = spec["cfg"]
        model = YOLOX(widen=cfg["widen"], deepen=cfg["deepen"],
                      num_classes=cfg["num_classes"], dtype=dtype)
        h, w = input_hw
        variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3)))
        if checkpoint:
            variables = _load_checkpoint(variables, checkpoint, "yolox", cfg)
        return SinglePersonDetector(model, variables, bbox_thr=bbox_thr,
                                    select=select)
    if spec.get("family") == "rtmdet":
        from .rtmdet import RTMDet

        cfg = spec["cfg"]
        model = RTMDet(widen=cfg["widen"], deepen=cfg["deepen"],
                       num_classes=cfg["num_classes"],
                       num_csp_blocks=cfg["num_csp_blocks"],
                       neck_out=cfg["neck_out"], dtype=dtype)
        h, w = input_hw
        variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3)))
        if checkpoint:
            variables = _load_checkpoint(variables, checkpoint, "rtmdet", cfg)
        return SinglePersonDetector(model, variables, bbox_thr=bbox_thr,
                                    select=select)
    if spec["width"] is None:
        return SinglePersonDetector(bbox_thr=bbox_thr)

    model = CenterNetDetector(width=spec["width"], dtype=dtype)
    h, w = input_hw
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3)))
    if checkpoint:
        variables = _load_checkpoint(variables, checkpoint, "centernet")
    return SinglePersonDetector(model, variables, bbox_thr=bbox_thr,
                                select=select)


def _load_checkpoint(variables, path: str, family: str, cfg: dict | None = None):
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith((".pth", ".pt")):
        if family == "hrnet":
            from .convert import load_torch_hrnet

            return load_torch_hrnet(variables, path, cfg)
        if family == "rtmpose":
            from .convert import load_torch_rtmpose

            return load_torch_rtmpose(variables, path, cfg)
        if family == "swin":
            from .convert import load_torch_swin

            return load_torch_swin(variables, path, cfg)
        if family == "yolox":
            from .convert import load_torch_yolox

            return load_torch_yolox(variables, path, cfg)
        if family == "rtmdet":
            from .convert import load_torch_rtmdet

            return load_torch_rtmdet(variables, path, cfg)
        raise ValueError(f"torch checkpoint conversion not implemented for {family}")
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=False))
        leaves, treedef = jax.tree.flatten(variables)
        restored = [jnp.asarray(flat[f"p{i}"]) for i in range(len(leaves))]
        for a, b in zip(leaves, restored):
            if a.shape != b.shape:
                raise ValueError(f"checkpoint shape mismatch: {a.shape} vs {b.shape}")
        return jax.tree.unflatten(treedef, restored)
    # orbax directory
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), variables)


def save_checkpoint_npz(variables, path: str) -> None:
    """Flat-npz dump of a parameter pytree (portable, no orbax needed)."""
    leaves, _ = jax.tree.flatten(variables)
    np.savez(path, **{f"p{i}": np.asarray(v) for i, v in enumerate(leaves)})
