"""Mesh construction + sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.3: no NCCL/MPI/
torch.distributed anywhere); its latent parallel axes are pure data axes
(frames, cameras, clips, refinement windows).  The TPU-native mapping is a
1-D ``data`` mesh over ICI: batch axes are sharded with
`NamedSharding(mesh, P("data"))`, parameters are replicated, and XLA inserts
the only collectives this workload needs (gradient/metric all-reduce in the
refinement step, all-gather of per-shard triangulation outputs).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated"]


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                f"(set --xla_force_host_platform_device_count for CPU tests)"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading axis over ``axis``; later axes replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
