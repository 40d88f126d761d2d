"""Checkpoint-import verification drill: per-layer torch↔flax agreement.

The reference inherits accuracy from MMPose zoo checkpoints
(/root/reference/mmpose_pose_estimation.py:98-109,
/root/reference/examples/model_paths.yaml:1-18); this framework imports
those `.pth` files through `models.convert`.  A conversion bug that is
*consistent* between the converter and this repo's own tests would pass
every end-to-end self-check and still load real checkpoints wrong — so
this drill loads the SAME state dict into two independent
implementations and compares their forwards **per stage**:

1. our flax model, filled via `models.convert` (strict: missing keys,
   leftover keys, and shape mismatches all abort);
2. the torch mirror (`models.mirrors`), built in MMPose's registration
   order and loaded with ``load_state_dict(strict=True)``.

A shared misunderstanding of, e.g., Swin's relative-position-bias
indexing shows up as a divergence at the first block that uses it — the
per-stage report names the layer, not just "outputs differ".

CLI: ``mc3d-pose-tpu convert --verify <ckpt.pth> --family hrnet|rtmpose|swin``
(see `cli.convert`).  torch runs CPU-only.
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["verify_checkpoint", "format_report"]

# Forward agreement tolerance: both sides compute in float32 with
# different op orders (conv vs lax.conv, fused LN), so agreement is
# expected to ~1e-4 relative — the parity-suite threshold
# (tests/test_torch_parity.py).
_REL_TOL = 2e-3


def _to_nhwc(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a


def _flatten_intermediates(tree: dict, prefix: str = "") -> dict[str, Any]:
    out = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_intermediates(v, name))
        else:
            out[name] = v
    return out


def _stage_points(family: str, cfg: dict) -> list[tuple[str, str, str]]:
    """(label, flax intermediates key, torch dotted module name) triplets.

    The flax key addresses `capture_intermediates` output (module path +
    "/__call__"); the torch name addresses `named_modules()` for a
    forward hook on the mirror.
    """
    if family == "hrnet":
        modules = cfg["modules"]
        pts = [("stage1(layer1)", "Bottleneck_3/__call__", "layer1")]
        h = 0
        for s, n_mod in enumerate(modules[1:], start=2):
            h += n_mod
            pts.append((f"stage{s}", f"HRModule_{h - 1}/__call__",
                        f"stage{s}"))
        pts.append(("head", "head/__call__", "final_layer"))
        return pts
    if family == "rtmpose":
        pts = [(f"backbone.stage{s}",
                f"backbone/stage{s}_csp/__call__",
                f"backbone.stage{s}") for s in (1, 2, 3, 4)]
        pts.append(("head.gau", "gau/__call__", "head.gau"))
        return pts
    if family == "swin":
        pts = []
        for i, depth in enumerate(cfg["depths"]):
            j = depth - 1
            pts.append((f"stage{i}.block{j}",
                        f"backbone/stage_{i}_block_{j}/__call__",
                        f"backbone.stages.{i}.blocks.{j}"))
        pts.append(("backbone.out", "backbone/__call__", "backbone"))
        return pts
    raise ValueError(f"unknown family '{family}'")


def _compare(label: str, ours, theirs) -> dict:
    """Max-divergence record for one cut point (handles tensor lists)."""
    ours = ours if isinstance(ours, (tuple, list)) else (ours,)
    theirs = theirs if isinstance(theirs, (tuple, list)) else (theirs,)
    max_abs = 0.0
    scale = 0.0
    for o, t in zip(ours, theirs):
        o = np.asarray(o, np.float64)
        t = _to_nhwc(np.asarray(t.detach().numpy() if hasattr(t, "detach")
                                else t, np.float64))
        if o.shape != t.shape and o.size == t.size:
            # torch Swin blocks run (B, L, C); flax runs (B, H, W, C).
            t = t.reshape(o.shape)
        if o.shape != t.shape:
            return {"stage": label, "max_abs": float("inf"), "rel": float("inf"),
                    "note": f"shape {o.shape} vs {t.shape}"}
        max_abs = max(max_abs, float(np.max(np.abs(o - t))))
        scale = max(scale, float(np.max(np.abs(t))))
    rel = max_abs / max(scale, 1e-12)
    return {"stage": label, "max_abs": max_abs, "rel": rel,
            "ok": bool(rel <= _REL_TOL)}


def verify_checkpoint(
    path: str,
    family: str,
    cfg: dict | None = None,
    num_joints: int = 17,
    input_size: tuple[int, int] = (192, 256),
    seed: int = 0,
) -> dict:
    """Convert ``path`` and compare torch-mirror vs flax forwards per stage.

    Returns a report dict: ``converted`` (strict conversion succeeded),
    ``error`` (the strict-diff message if not), ``stages`` (per-cut-point
    max-abs/relative divergence), ``ok`` (conversion + every stage within
    tolerance).  ``input_size`` is (W, H) like the registry.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from . import convert as cv
    from .hrnet import HRNET_W32, HRNet
    from .rtmpose import RTMPOSE_T, RTMPose
    from .swin import SWIN_B, SwinPose

    if family == "hrnet":
        cfg = cfg or HRNET_W32
        model = HRNet(num_joints=num_joints, cfg=cfg, dtype=jnp.float32)
        loader = cv.load_torch_hrnet
        from .mirrors.hrnet import MMPoseHRNet

        mirror = MMPoseHRNet(cfg, num_joints=num_joints)
        strip = ("backbone.", "keypoint_head.", "head.")
    elif family == "rtmpose":
        cfg = cfg or RTMPOSE_T
        model = RTMPose(num_joints=num_joints, input_size=input_size,
                        cfg=cfg, dtype=jnp.float32)
        loader = cv.load_torch_rtmpose
        from .mirrors.rtmpose import MMPoseRTMPose

        mirror = MMPoseRTMPose(cfg, input_size=input_size,
                               num_joints=num_joints)
        strip = ()
    elif family == "swin":
        cfg = cfg or SWIN_B
        model = SwinPose(num_joints=num_joints, cfg=cfg, dtype=jnp.float32)
        loader = cv.load_torch_swin
        from .mirrors.swin import MMPoseSwin

        mirror = MMPoseSwin(cfg, num_joints=num_joints)
        strip = ()
    else:
        raise ValueError(f"unknown family '{family}' "
                         f"(expected hrnet|rtmpose|swin)")

    report: dict[str, Any] = {"family": family, "path": path,
                              "converted": False, "stages": [], "ok": False}
    in_w, in_h = input_size
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, in_h, in_w, 3)))
    try:
        variables = loader(variables, path, cfg)
    except ValueError as e:
        report["error"] = str(e)
        return report
    report["converted"] = True
    n_filled = sum(
        int(np.prod(np.shape(v))) for v in jax.tree.leaves(variables)
    )
    report["n_values"] = n_filled

    # Torch mirror gets the SAME tensors through torch's own strict path.
    state = cv.torch_state_dict_to_flat(path)
    tstate = {}
    for k, v in state.items():
        if k.startswith(cv._HRNET_DROP_PREFIXES if family == "hrnet" else ()):
            continue
        k2 = k
        for p in ("module.",) + tuple(strip):
            if k2.startswith(p) and family == "hrnet":
                k2 = k2[len(p):]
        tstate[k2] = torch.from_numpy(np.asarray(v))
    missing, unexpected = mirror.load_state_dict(tstate, strict=False)
    # The mirror registers no extra buffers beyond num_batches_tracked /
    # relative_position_index (recomputable); anything else is a drift.
    bad_missing = [m for m in missing
                   if not m.endswith(("num_batches_tracked",
                                      "relative_position_index"))]
    if bad_missing or any(
        not u.endswith(("num_batches_tracked", "relative_position_index"))
        for u in unexpected
    ):
        report["error"] = (f"mirror load mismatch: missing={bad_missing[:5]} "
                           f"unexpected={list(unexpected)[:5]}")
        return report
    mirror.eval()

    # Forward both on the same input, capturing intermediates.
    rng = np.random.default_rng(seed)
    x_np = rng.uniform(size=(2, in_h, in_w, 3)).astype(np.float32)
    captured: dict[str, Any] = {}
    hooks = []
    named = dict(mirror.named_modules())
    pts = _stage_points(family, cfg)
    for label, _, tname in pts:
        if tname not in named:
            captured[label] = None
            continue

        def mk(label):
            def hook(_m, _i, o):
                captured[label] = o

            return hook

        hooks.append(named[tname].register_forward_hook(mk(label)))
    with torch.no_grad():
        t_out = mirror(torch.from_numpy(x_np).permute(0, 3, 1, 2))
    for h in hooks:
        h.remove()

    out, inter_state = model.apply(
        variables, jnp.asarray(x_np), capture_intermediates=True,
        mutable=["intermediates"],
    )
    flat_inter = _flatten_intermediates(inter_state["intermediates"])

    for label, fkey, _ in pts:
        ours = flat_inter.get(fkey)
        theirs = captured.get(label)
        if ours is None or theirs is None:
            report["stages"].append(
                {"stage": label, "max_abs": float("nan"),
                 "note": "cut point not found", "ok": False})
            continue
        if isinstance(ours, tuple) and len(ours) == 1:
            ours = ours[0]
        report["stages"].append(_compare(label, ours, theirs))

    # End-to-end outputs.
    if family == "rtmpose":
        final = max(
            _compare("out.x", out[0], t_out[0])["rel"],
            _compare("out.y", out[1], t_out[1])["rel"],
        )
        report["stages"].append({"stage": "outputs", "rel": final,
                                 "max_abs": float("nan"),
                                 "ok": bool(final <= _REL_TOL)})
    else:
        report["stages"].append(_compare("outputs", out, t_out))
    report["ok"] = all(s.get("ok") for s in report["stages"])
    return report


def format_report(report: dict) -> str:
    lines = [f"checkpoint: {report.get('path')}  family: {report['family']}"]
    if not report["converted"]:
        lines.append(f"CONVERSION REFUSED: {report.get('error')}")
        return "\n".join(lines)
    if report.get("error"):
        lines.append(f"MIRROR LOAD FAILED: {report['error']}")
        return "\n".join(lines)
    lines.append(f"converted values: {report.get('n_values', '?')}")
    lines.append(f"{'stage':24s} {'max|Δ|':>12s} {'rel':>10s}  ok")
    for s in report["stages"]:
        note = s.get("note", "")
        lines.append(
            f"{s['stage']:24s} {s.get('max_abs', float('nan')):12.3e} "
            f"{s.get('rel', float('nan')):10.2e}  "
            f"{'PASS' if s.get('ok') else 'FAIL'} {note}"
        )
    lines.append("VERIFY: " + ("PASS" if report["ok"] else "FAIL"))
    return "\n".join(lines)
