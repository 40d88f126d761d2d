"""Training losses for the three model families (masked, batched)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["heatmap_mse_loss", "simcc_kl_loss", "centernet_focal_loss"]


def heatmap_mse_loss(pred, target, weights):
    """Joint-masked MSE: pred/target (..., K, H, W), weights (..., K)."""
    se = (pred - target) ** 2
    per_joint = jnp.mean(se, axis=(-2, -1))  # (..., K)
    w = weights.astype(per_joint.dtype)
    return jnp.sum(per_joint * w) / jnp.maximum(jnp.sum(w), 1.0)


def simcc_kl_loss(pred_x, pred_y, lab_x, lab_y, weights):
    """KL(label ‖ softmax(logits)) per axis, joint-masked (RTMPose loss)."""

    def axis(logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(labels * logp, axis=-1)  # (..., K)
        ent = -jnp.sum(
            jnp.where(labels > 0, labels * jnp.log(jnp.maximum(labels, 1e-12)), 0.0),
            axis=-1,
        )
        return ce - ent  # true KL (≥ 0, 0 at perfect match)

    kl = axis(pred_x, lab_x) + axis(pred_y, lab_y)
    w = weights.astype(kl.dtype)
    return jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)


def centernet_focal_loss(outputs, center_target, wh_target, offset_target,
                         mask, alpha: float = 2.0, beta: float = 4.0,
                         wh_weight: float = 0.1, offset_weight: float = 1.0):
    """CenterNet penalty-reduced focal loss + masked L1 size/offset terms.

    - ``outputs``: the `CenterNetDetector` head dict (center logits, wh,
      offset) at stride 16.
    - ``center_target`` (B, h, w) ∈ [0, 1] Gaussian-splattered centres;
      ``mask`` (B, h, w) = 1 at exact centre pixels.
    """
    p = jax.nn.sigmoid(outputs["center"])
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    pos = mask > 0
    pos_loss = -((1 - p) ** alpha) * jnp.log(p)
    neg_loss = -((1 - center_target) ** beta) * (p ** alpha) * jnp.log(1 - p)
    n_pos = jnp.maximum(jnp.sum(mask), 1.0)
    cls = jnp.sum(jnp.where(pos, pos_loss, neg_loss)) / n_pos

    l1 = lambda a, b: jnp.abs(a - b)
    wh = jnp.sum(l1(outputs["wh"], wh_target) * mask[..., None]) / n_pos
    off = jnp.sum(l1(outputs["offset"], offset_target) * mask[..., None]) / n_pos
    return cls + wh_weight * wh + offset_weight * off
