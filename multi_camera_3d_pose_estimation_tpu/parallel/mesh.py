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

__all__ = [
    "make_mesh",
    "make_clip_mesh",
    "init_distributed",
    "data_sharding",
    "replicated",
]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` passthrough.

    Call once per process before any jax op on a multi-host rig (pod-scale
    BASELINE config 5 — many-clip offline farms).  With no arguments, JAX
    auto-detects cluster environments (GKE/SLURM/TPU pods); the explicit
    form suits ad-hoc rigs: the coordinator is ``host0:port``, processes
    are numbered 0..N-1.  After this, `jax.devices()` spans every host and
    the meshes below work unchanged — XLA routes collectives over ICI
    within a host/slice and DCN across (see `make_clip_mesh` for keeping
    the heavy traffic off DCN).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


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


def make_clip_mesh(
    n_outer: int | None = None,
    n_inner: int | None = None,
    axes: tuple[str, str] = ("clips", "data"),
) -> Mesh:
    """DCN-aware 2-D mesh: ``clips`` outer (across hosts), ``data`` inner.

    For the many-clip offline farm (BASELINE config 5 at pod scale): whole
    clips shard over the OUTER axis — host-process-major device order, so
    outer-axis neighbours sit on different hosts and the only cross-host
    traffic is the per-clip result gather (tiny) — while the frame/window
    axis shards over the INNER axis whose collectives ride ICI.
    Defaults: outer = number of processes, inner = local device count.
    """
    import numpy as np

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_procs = max(d.process_index for d in devices) + 1
    if n_outer is None:
        n_outer = n_procs
    if n_inner is None:
        n_inner = len(devices) // n_outer
    if n_outer * n_inner > len(devices):
        raise ValueError(
            f"mesh {n_outer}x{n_inner} needs {n_outer * n_inner} devices, "
            f"have {len(devices)}"
        )
    if n_outer * n_inner < len(devices):
        # Never leave chips silently idle: n_inner floors when the device
        # count is not a multiple of n_outer, so surface the truncation.
        import warnings

        warnings.warn(
            f"make_clip_mesh {n_outer}x{n_inner} uses only "
            f"{n_outer * n_inner} of {len(devices)} devices; "
            f"{len(devices) - n_outer * n_inner} chips will sit idle",
            stacklevel=2,
        )
    grid = np.array(devices[: n_outer * n_inner]).reshape(n_outer, n_inner)
    return Mesh(grid, axes)


def data_sharding(mesh: Mesh, ndim: int, axis=None) -> NamedSharding:
    """Shard the leading axis over ``axis``; later axes replicated.

    ``axis`` defaults to ALL mesh axes (a 1-D `make_mesh` gives the plain
    data sharding; a 2-D `make_clip_mesh` splits the leading axis
    clips-major then data — exactly the clips-outer/frames-inner layout
    when the caller flattens clips into time).
    """
    if axis is None:
        axis = mesh.axis_names[0] if len(mesh.axis_names) == 1 else tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
