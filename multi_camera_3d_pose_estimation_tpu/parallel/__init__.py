"""Device meshes and pjit-sharded batch pipelines (SURVEY.md §2.3)."""

from .mesh import (
    make_mesh,
    make_clip_mesh,
    init_distributed,
    data_sharding,
    replicated,
)
from .pipeline import ShardedPosePipeline, sharded_refine_step, run_clips_batched

__all__ = [
    "make_mesh",
    "make_clip_mesh",
    "init_distributed",
    "data_sharding",
    "replicated",
    "ShardedPosePipeline",
    "sharded_refine_step",
    "run_clips_batched",
]
