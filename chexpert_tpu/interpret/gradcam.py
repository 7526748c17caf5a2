"""Grad-CAM, functionally (no hook mutation).

The reference registers forward/backward hooks on module objects
(/root/reference/chexpert.py:260-303). JAX has no hooks; instead every model
exposes (a) sow'n 'gradcam_features' intermediates at the canonical hook site
(the final conv feature map) and (b) a `probe` input added at that site, so
d(score)/d(features) falls out of one jax.vjp on the probe-forward: a single
forward pass yields logits AND features, and its reverse pass yields the
feature gradients — matching the reference's one fwd+bwd cost, hook-free.
The probe shape comes from jax.eval_shape (abstract trace, zero FLOPs).
Exact Grad-CAM (eq. 1-2 of https://arxiv.org/pdf/1610.02391.pdf):
  weights_c = global-avg-pool of d(score)/d(feature_c)
  cam = ReLU(sum_c weights_c * feature_c), min-max normalized per image,
  bilinearly upsampled to the input size.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _feature_shape(model, variables, x) -> tuple:
    """Shape of the sow'n gradcam feature map via abstract trace (zero FLOPs)."""
    return jax.eval_shape(
        lambda: model.apply(variables, x, train=False, mutable=["intermediates"])
    )[1]["intermediates"]["gradcam_features"][0].shape


def grad_cam(model, variables, x: jnp.ndarray, cls_idx: Optional[jnp.ndarray] = None):
    """Returns (cam, logits); cam is (B, H, W, 1) float32 in [0, 1]."""
    def fwd(probe):
        out, inter = model.apply(
            variables, x, train=False, probe=probe, mutable=["intermediates"]
        )
        return out, inter["intermediates"]["gradcam_features"][0].astype(jnp.float32)

    probe_shape = _feature_shape(model, variables, x)

    # ONE forward (logits + features) ...
    (logits, feats), vjp_fn = jax.vjp(fwd, jnp.zeros(probe_shape, jnp.float32))
    if cls_idx is None:
        cls = jnp.argmax(logits, axis=1)
    else:
        cls = jnp.broadcast_to(jnp.asarray(cls_idx), (x.shape[0],))
    one_hot = jax.nn.one_hot(cls, logits.shape[1], dtype=logits.dtype)
    # ... and ONE reverse pass for d(score)/d(features)
    (grads,) = vjp_fn((one_hot, jnp.zeros_like(feats)))

    # Grad-CAM eq 1: channel weights = spatial GAP of the gradients
    weights = grads.mean(axis=(1, 2), keepdims=True)  # (B, 1, 1, C)
    # eq 2: ReLU of the weighted channel combination
    cam = jax.nn.relu((weights * feats).sum(axis=-1, keepdims=True))  # (B, h, w, 1)

    # per-image min-max normalize (reference chexpert.py:288-294)
    mn = cam.min(axis=(1, 2, 3), keepdims=True)
    mx = cam.max(axis=(1, 2, 3), keepdims=True)
    cam = (cam - mn) / (mx - mn + 1e-5)

    # bilinear upsample to input resolution (reference chexpert.py:296)
    cam = jax.image.resize(
        cam, (cam.shape[0], x.shape[1], x.shape[2], 1), method="bilinear"
    )
    return cam, logits
