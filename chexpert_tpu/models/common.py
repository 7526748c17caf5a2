"""Shared Flax building blocks.

Conventions (TPU-first):
  * NHWC layout everywhere (XLA's native conv layout on TPU).
  * params/batch-stats in float32; activations/compute in ``dtype``
    (bfloat16 by default) — MXU-friendly mixed precision.
  * torch-style *explicit* conv padding (pad both sides) rather than XLA
    'SAME' where pretrained torchvision weights must transfer bit-compatibly
    (torch pads symmetrically; XLA SAME pads low/high asymmetrically on even
    inputs). EfficientNet uses TF 'SAME' like its reference
    (/root/reference/models/efficientnet.py:53-64).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# torchvision kaiming variants
kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
kaiming_normal_out_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
kaiming_normal_in_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_pad(kernel_size: int, padding: Optional[int] = None):
    """Symmetric explicit padding matching torch Conv2d(padding=p)."""
    p = kernel_size // 2 if padding is None else padding
    return [(p, p), (p, p)]


def conv(
    features: int,
    kernel_size: int,
    strides: int = 1,
    padding: Optional[int] = None,
    use_bias: bool = False,
    groups: int = 1,
    dtype: Dtype = jnp.bfloat16,
    kernel_init: Callable = kaiming_normal_out_normal,
    name: Optional[str] = None,
) -> nn.Conv:
    """nn.Conv with torch-style symmetric padding."""
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(strides, strides),
        padding=torch_pad(kernel_size, padding),
        use_bias=use_bias,
        feature_group_count=groups,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        name=name,
    )


def batch_norm(
    train: bool,
    dtype: Dtype = jnp.bfloat16,
    eps: float = 1e-5,
    torch_momentum: float = 0.1,
    name: Optional[str] = None,
    scale_init: Callable = nn.initializers.ones,
) -> nn.BatchNorm:
    """BatchNorm matching torch defaults.

    flax momentum is the EMA decay of the running stats:
        ra = momentum * ra + (1 - momentum) * batch
    torch uses ra = (1 - m) * ra + m * batch, hence momentum = 1 - m.
    Under a GSPMD data-sharded batch, the batch mean/var reductions are global
    (XLA inserts the cross-replica collectives) — i.e. synced BatchNorm for
    free, a strict improvement over per-device stats.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=1.0 - torch_momentum,
        epsilon=eps,
        dtype=dtype,
        param_dtype=jnp.float32,
        scale_init=scale_init,
        name=name,
    )


class InstanceNorm(nn.Module):
    """InstanceNorm2d matching torch defaults (affine=False, eps 1e-5).

    Used by the AA-DenseNet transition layers
    (/root/reference/models/attn_aug_conv.py:438).
    NHWC input: normalize over H, W per channel per sample.
    """

    eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(1, 2), keepdims=True)
        var = x32.var(axis=(1, 2), keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)


def max_pool_torch(x, window: int, strides: int, padding: int):
    """MaxPool with torch-style symmetric padding (pads with -inf)."""
    return nn.max_pool(
        x,
        (window, window),
        strides=(strides, strides),
        padding=[(padding, padding), (padding, padding)],
    )


def avg_pool_torch(x, window: int, strides: int):
    return nn.avg_pool(x, (window, window), strides=(strides, strides))


def global_avg_pool(x):
    """NHWC (B, H, W, C) -> (B, C)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))
