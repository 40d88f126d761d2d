"""Jitted (optionally data-parallel) train steps for the 2D models.

One factory covers the three families: the loss closure receives
(model-apply outputs, batch) and returns a scalar.  The step:
grad → global-norm clip → optax update → EMA of batch stats (BatchNorm
runs in train mode, mutable batch_stats collection).  With a mesh, the
batch axis is sharded and parameters replicated — XLA inserts the DP
gradient all-reduce over ICI (same mapping as parallel.sharded_refine_step).

Checkpointing: `TrainState.save`/`load` (flat npz of params + opt state +
step) — same artifact-level philosophy as the refinement checkpoints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import data_sharding, replicated

__all__ = ["TrainState", "make_train_step"]


@dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int

    def save(self, path: str) -> None:
        leaves, _ = jax.tree.flatten((self.params, self.batch_stats, self.opt_state))
        np.savez(
            path, step=self.step,
            **{f"l{i}": np.asarray(v) for i, v in enumerate(leaves)},
        )

    @classmethod
    def load(cls, path: str, template: "TrainState") -> "TrainState":
        flat = np.load(path)
        leaves, treedef = jax.tree.flatten(
            (template.params, template.batch_stats, template.opt_state)
        )
        restored = [jnp.asarray(flat[f"l{i}"]) for i in range(len(leaves))]
        params, batch_stats, opt_state = jax.tree.unflatten(treedef, restored)
        return cls(params, batch_stats, opt_state, int(flat["step"]))


def make_train_step(
    model,
    loss_fn: Callable[[Any, dict], jax.Array],
    tx: optax.GradientTransformation | None = None,
    learning_rate: float = 5e-4,
    grad_clip: float = 1.0,
    mesh=None,
    has_batch_stats: bool = True,
):
    """Build ``(init_fn, step_fn)``.

    - ``loss_fn(outputs, batch) -> scalar`` where ``outputs`` is
      ``model.apply(...)``'s return for ``batch["images"]``.
    - ``init_fn(key, sample_images) -> TrainState``.
    - ``step_fn(state, batch) -> (state, loss)`` — jitted; with ``mesh``
      the whole ``batch`` dict is sharded on its leading axis.
    """
    if tx is None:
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(learning_rate, weight_decay=1e-4),
        )

    def init_fn(key, sample_images) -> TrainState:
        variables = model.init(key, sample_images, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(params, batch_stats, tx.init(params), 0)

    def step(params, batch_stats, opt_state, batch):
        def loss_of(p):
            variables = {"params": p}
            if has_batch_stats:
                variables["batch_stats"] = batch_stats
                outputs, mutated = model.apply(
                    variables, batch["images"], train=True, mutable=["batch_stats"]
                )
                return loss_fn(outputs, batch), mutated["batch_stats"]
            outputs = model.apply(variables, batch["images"], train=True)
            return loss_fn(outputs, batch), batch_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    if mesh is None:
        step_jit = jax.jit(step)
    else:
        rep = replicated(mesh)

        def batch_sharding(batch):
            return {k: data_sharding(mesh, jnp.ndim(v)) for k, v in batch.items()}

        # Shardings resolved at first call via a wrapper (batch structure
        # isn't known until then).
        _compiled = {}

        def step_jit(params, batch_stats, opt_state, batch):
            key = tuple(sorted(batch.keys()))
            if key not in _compiled:
                _compiled[key] = jax.jit(
                    step,
                    in_shardings=(rep, rep, rep, batch_sharding(batch)),
                    out_shardings=(rep, rep, rep, rep),
                )
            return _compiled[key](params, batch_stats, opt_state, batch)

    def step_fn(state: TrainState, batch: dict):
        params, stats, opt_state, loss = step_jit(
            state.params, state.batch_stats, state.opt_state, batch
        )
        # Step counter stays on the host — passing it through jit would
        # retrace every call.
        return TrainState(params, stats, opt_state, state.step + 1), loss

    return init_fn, step_fn
