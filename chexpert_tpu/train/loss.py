"""Losses.

Reference: BCEWithLogitsLoss(reduction='none'), per-class; the train loss
reduces .sum(1).mean(0) (/root/reference/chexpert.py:530,160). Here the
batch mean is mask-weighted so zero-padded final batches don't bias it.
"""

from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-element binary cross-entropy with logits (numerically stable).

    max(x, 0) - x*y + log(1 + exp(-|x|)) — identical to torch's formulation.
    Returns the same shape as logits (reduction='none').
    """
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    return jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))


def train_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    label_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """sum over classes, mask-weighted mean over batch (chexpert.py:160).

    label_mask (B, C) zeroes individual uncertain labels (U-Ignore policy).
    """
    per_elem = bce_with_logits(logits, targets)
    if label_mask is not None:
        per_elem = per_elem * label_mask
    per_example = per_elem.sum(axis=1)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (per_example * mask).sum() / denom
