"""SimCC coordinate-classification decode (RTMPose head output path).

TPU-native equivalent of the non-heatmap decode exercised by the reference's
`coco_rtmpose-t` config (examples/model_paths.yaml:14-18): per-joint 1-D
classification logits over x and y bins at ``split_ratio``× resolution,
decoded by argmax (+ optional softmax-expectation sub-bin refinement) and
divided back by the split ratio.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["simcc_decode"]


def simcc_decode(
    simcc_x: jax.Array,
    simcc_y: jax.Array,
    split_ratio: float = 2.0,
    use_softmax_refine: bool = False,
    refine_radius: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Decode SimCC logits -> (xy (..., 2) in input-pixel units, score (...,)).

    - ``simcc_x``: (..., Wx) logits, ``simcc_y``: (..., Wy) logits.
    - score is min(max_x, max_y) after softmax normalization per axis
      (confidence comparable across joints, used for the top-2 view gate).
    - ``use_softmax_refine`` adds the softmax-expectation offset within a
      ±``refine_radius`` window around the argmax for sub-bin precision.
    """
    def decode_axis(logits):
        prob = jax.nn.softmax(logits, axis=-1)
        idx = jnp.argmax(prob, axis=-1)
        peak = jnp.take_along_axis(prob, idx[..., None], axis=-1)[..., 0]
        loc = idx.astype(prob.dtype)
        if use_softmax_refine and refine_radius > 0:
            n = logits.shape[-1]
            coords = jnp.arange(n, dtype=prob.dtype)
            mask = jnp.abs(coords - loc[..., None]) <= refine_radius
            w = jnp.where(mask, prob, jnp.zeros_like(prob))
            wsum = jnp.sum(w, axis=-1)
            loc = jnp.sum(w * coords, axis=-1) / jnp.where(wsum > 0, wsum, jnp.ones_like(wsum))
        return loc, peak

    lx, px = decode_axis(jnp.asarray(simcc_x))
    ly, py = decode_axis(jnp.asarray(simcc_y))
    xy = jnp.stack([lx, ly], axis=-1) / split_ratio
    score = jnp.minimum(px, py)
    return xy, score
