"""Attention-weight capture with bounded memory.

The visualization entry point reruns the model on the einsum attention path
with capture_weights=True to sow the softmax weights (the reference stores
them on the module every forward — /root/reference/models/attn_aug_conv.py:87).
At production geometry (320^2 input, first transition HW=1600, nh=8) the
weights are ~82 MB float32 PER IMAGE PER LAYER; capturing a whole 24-image
vis batch at once is ~2 GB per layer and scales with batch size. This helper
chunks the rerun over the batch so peak memory is O(chunk), independent of
how many images are visualized.
"""

from __future__ import annotations

from typing import List

import numpy as np


def collect_attn_weights(tree) -> List[np.ndarray]:
    """Flatten sow'n attn_weights leaves in deterministic path order."""
    found: List[np.ndarray] = []

    def rec(node):
        if isinstance(node, dict):
            if "attn_weights" in node:
                for v in node["attn_weights"]:
                    found.append(np.asarray(v))
            for k in sorted(k for k in node if k != "attn_weights"):
                rec(node[k])

    rec(tree)
    return found


def capture_attention_weights(model, variables, x, chunk: int = 2) -> List[np.ndarray]:
    """Per-layer softmax attention weights for batch x, captured in
    batch-chunks of size ``chunk`` (one XLA program, reused across chunks —
    every chunk has the same shape except a possibly-smaller tail, which is
    zero-padded to keep the compiled shape). Returns [] for models without
    attention layers."""
    import jax.numpy as jnp

    n = x.shape[0]
    chunk = max(1, min(chunk, n))
    per_layer: List[List[np.ndarray]] = []
    for start in range(0, n, chunk):
        xb = x[start : start + chunk]
        pad = chunk - xb.shape[0]
        if pad:
            xb = jnp.concatenate([xb, jnp.zeros((pad,) + xb.shape[1:], xb.dtype)])
        _, inter = model.apply(
            variables, xb, train=False, capture_weights=True,
            mutable=["intermediates"],
        )
        ws = collect_attn_weights(inter["intermediates"])
        if not ws:
            return []
        valid = chunk - pad
        if not per_layer:
            per_layer = [[] for _ in ws]
        for li, w in enumerate(ws):
            per_layer[li].append(w[:valid])
    return [np.concatenate(parts) for parts in per_layer]
