"""Torch → flax weight conversion for the HRNet family.

Lets users of the reference bring their trained MMPose HRNet heatmap
checkpoints (the `.pth` files referenced by examples/model_paths.yaml)
into this framework without mmpose installed: torch (CPU) is only used to
deserialize the state dict.

Strategy: structural order-matching.  Both the MMPose HRNet state dict and
our flax module traverse layers in the same construction order (stem →
stage1 bottlenecks → transitions/stages → head), so conv kernels and
batch-norm tuples line up 1:1 after filtering out `num_batches_tracked`.
Every assignment is shape-checked (OIHW→HWIO transpose for convs); any
mismatch aborts with a diagnostic naming both sides.  This is deliberately
strict — a silently misaligned checkpoint is worse than an error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["load_torch_hrnet", "torch_state_dict_to_flat"]


def torch_state_dict_to_flat(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint (.pth) to {name: ndarray}, CPU only."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in state.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _ordered_torch_params(state: dict[str, np.ndarray]):
    """Yield (name, array) in insertion order, dropping bookkeeping keys."""
    for k, v in state.items():
        if k.endswith("num_batches_tracked"):
            continue
        yield k, v


def load_torch_hrnet(variables: dict, path: str) -> dict:
    """Fill our HRNet variables pytree from a torch HRNet state dict.

    ``variables``: {"params": ..., "batch_stats": ...} from `HRNet.init`.
    Returns a new pytree of the same structure.
    """
    state = torch_state_dict_to_flat(path)

    # Group torch entries per layer: conv weights, bn (γ, β, μ, σ²).
    convs: list[tuple[str, np.ndarray]] = []
    bns: dict[str, dict[str, np.ndarray]] = {}
    bn_order: list[str] = []
    for name, arr in _ordered_torch_params(state):
        if arr.ndim == 4:
            convs.append((name, arr))
        elif arr.ndim == 1:
            base = name.rsplit(".", 1)[0]
            field = name.rsplit(".", 1)[1]
            if base not in bns:
                bns[base] = {}
                bn_order.append(base)
            bns[base][field] = arr

    # Our side: flatten with paths; convs are 'kernel' with ndim 4.
    # tree_flatten sorts dict keys LEXICOGRAPHICALLY ('ConvBN_10' before
    # 'ConvBN_2'), which would scramble the construction-order matching —
    # re-sort the flat list with a numeric-aware key so module indices
    # order as built.
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat = sorted(flat, key=lambda pv: [_natural(k) for k in _path_keys(pv[0])])
    our_convs = [(p, v) for p, v in flat if v.ndim == 4]
    params_scale = [
        (p, v) for p, v in flat if _leaf_name(p) == "scale"
    ]
    params_bias = {tuple(_prefix(p)): v for p, v in flat if _leaf_name(p) == "bias"}
    stats_mean = [(p, v) for p, v in flat if _leaf_name(p) == "mean"]

    if len(our_convs) != len(convs):
        raise ValueError(
            f"conv count mismatch: checkpoint has {len(convs)}, model has "
            f"{len(our_convs)} — is this an HRNet heatmap checkpoint matching "
            f"the configured width?"
        )
    # BN layers: torch has running stats per bn base with 'running_mean'.
    bn_bases = [b for b in bn_order if "running_mean" in bns[b]]
    if len(params_scale) != len(bn_bases):
        raise ValueError(
            f"batchnorm count mismatch: checkpoint {len(bn_bases)}, model "
            f"{len(params_scale)}"
        )

    updates: dict[tuple, np.ndarray] = {}
    for (p, ours), (tname, theirs) in zip(our_convs, convs):
        w = np.transpose(theirs, (2, 3, 1, 0))  # OIHW -> HWIO
        if w.shape != ours.shape:
            raise ValueError(
                f"conv shape mismatch at {tname} -> {_path_str(p)}: "
                f"{w.shape} vs {ours.shape}"
            )
        updates[tuple(_path_keys(p))] = w
        # Head conv bias if present.
        b = state.get(tname.replace("weight", "bias"))
        bias_key = tuple(_prefix(p))
        if b is not None and bias_key in params_bias and params_bias[bias_key].shape == b.shape:
            updates[tuple(list(_prefix(p)) + ["bias"])] = b

    for (p_scale, ours_scale), base in zip(params_scale, bn_bases):
        entry = bns[base]
        prefix = _prefix(p_scale)
        for field, target in (
            ("weight", "scale"),
            ("bias", "bias"),
        ):
            if field in entry:
                if entry[field].shape != ours_scale.shape:
                    raise ValueError(f"bn {base}.{field} shape mismatch")
                updates[tuple(list(prefix) + [target])] = entry[field]

    for (p_mean, ours_mean), base in zip(stats_mean, bn_bases):
        entry = bns[base]
        prefix = _prefix(p_mean)
        if entry["running_mean"].shape != ours_mean.shape:
            raise ValueError(f"bn stats {base} shape mismatch")
        updates[tuple(list(prefix) + ["mean"])] = entry["running_mean"]
        if "running_var" in entry:
            updates[tuple(list(prefix) + ["var"])] = entry["running_var"]

    def apply(path, leaf):
        key = tuple(_path_keys(path))
        if key in updates:
            return jnp.asarray(updates[key], leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(apply, variables)


def _path_keys(path) -> list[str]:
    keys = []
    for k in path:
        if hasattr(k, "key"):
            keys.append(str(k.key))
        else:
            keys.append(str(k))
    return keys


def _leaf_name(path) -> str:
    return _path_keys(path)[-1]


def _prefix(path) -> list[str]:
    return _path_keys(path)[:-1]


def _path_str(path) -> str:
    return "/".join(_path_keys(path))


def _natural(key: str):
    """'ConvBN_10' → ('ConvBN_', 10) so numeric suffixes sort numerically."""
    import re

    parts = re.split(r"(\d+)", key)
    return tuple(int(p) if p.isdigit() else p for p in parts)
