"""EfficientNet-B0..B7 in Flax (NHWC, bf16 compute).

Behavioral parity with /root/reference/models/efficientnet.py: B0 base
(table at efficientnet.py:148-156), squeeze-excitation, swish, DropConnect
(stochastic depth over whole samples, efficientnet.py:44-51), TF-'SAME'
padding, BN eps 1e-3 / torch momentum 0.01, and compound scaling
(construct via width/depth coefficients — efficientnet.py:188-228 — done here
as pure config math instead of in-place __init__ surgery).

Reference quirks intentionally preserved: the head conv output stays 1280
for every variant (the reference rescales only its input channels,
efficientnet.py:220); drop-connect rate ramps i/n_repeats *within* each
stage (efficientnet.py:128).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from chexpert_tpu.models.common import Dtype, batch_norm, global_avg_pool
from chexpert_tpu.models.densenet import torch_linear_init
from chexpert_tpu.ops.pallas_depthwise import depthwise_conv2d

# (width_coefficient, depth_coefficient, resolution, dropout_rate)
# cf reference efficientnet.py:13-21
SCALING_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}

# (n_repeats, in_channels, out_channels, kernel_size, stride, expand_ratio, se_ratio)
# cf reference efficientnet.py:150-156
B0_BLOCKS = (
    (1, 32, 16, 3, 1, 1, 0.25),
    (2, 16, 24, 3, 2, 6, 0.25),
    (2, 24, 40, 5, 2, 6, 0.25),
    (3, 40, 80, 3, 2, 6, 0.25),
    (3, 80, 112, 5, 1, 6, 0.25),
    (4, 112, 192, 5, 2, 6, 0.25),
    (1, 192, 320, 3, 1, 6, 0.25),
)


def round_filters(filters: int, width_coeff: float, depth_divisor: int = 8) -> int:
    """Reference _round_filters (efficientnet.py:192-196)."""
    new_filters = max(
        depth_divisor,
        int(filters * width_coeff + depth_divisor / 2) // depth_divisor * depth_divisor,
    )
    if new_filters < 0.9 * (filters * width_coeff):
        new_filters += depth_divisor
    return int(new_filters)


def scaled_blocks(model_name: str):
    """Compound scaling as config math (vs reference in-place re-init)."""
    width_coeff, depth_coeff, _res, dropout_rate = SCALING_PARAMS[model_name]
    stem = round_filters(32, width_coeff)
    blocks = []
    for n, cin, cout, k, s, e, se in B0_BLOCKS:
        blocks.append(
            (
                int(math.ceil(depth_coeff * n)),
                round_filters(cin, width_coeff),
                round_filters(cout, width_coeff),
                k,
                s,
                e,
                se,
            )
        )
    return stem, tuple(blocks), dropout_rate


def _same_conv(features, kernel, stride, groups=1, dtype=jnp.bfloat16, name=None):
    """TF-'SAME' conv (reference PaddedConv2d, efficientnet.py:53-64).

    torchvision-free TF-semantics: XLA 'SAME' pads low/high asymmetrically,
    matching tf.nn.convolution exactly (the reference code has an h_in/w_in
    typo at efficientnet.py:59 which is a no-op for square inputs; we do not
    replicate it).
    """
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding="SAME",
        use_bias=False,
        feature_group_count=groups,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
    )


class DepthwiseConv(nn.Module):
    """Depthwise TF-'SAME' conv with a Pallas fast path.

    Drop-in for ``_same_conv(C, k, s, groups=C, name="depthwise_conv")``:
    same param tree (one HWIO ``kernel`` of shape (k, k, 1, C), same init),
    same numerics (stride-1 SAME with odd k pads symmetrically, identical to
    the XLA call), but stride-1 layers route through
    ``ops.pallas_depthwise.depthwise_conv2d`` — one HBM read of x / one
    write of y instead of XLA's sub-roofline grouped-conv lowering (the
    round-4 b4 trace attributes ~half the step to depthwise-signature ops).
    """

    kernel_size: int
    stride: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        C = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, 1, C),
            jnp.float32,
        )
        return depthwise_conv2d(x.astype(self.dtype), w, self.stride)


def _effnet_bn(train, dtype, name):
    # BN eps 1e-3, torch momentum 0.01 (reference efficientnet.py:140,174-176)
    return batch_norm(train, dtype=dtype, eps=1e-3, torch_momentum=0.01, name=name)


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference efficientnet.py:66-76)."""

    se_reduce_channels: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(self.dtype)
        s = nn.Conv(self.se_reduce_channels, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce")(s)
        s = nn.swish(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="expand")(s)
        return x * nn.sigmoid(s)


def drop_connect(x, rate: float, deterministic: bool, rng):
    """Stochastic depth: zero whole samples, scale survivors
    (reference efficientnet.py:44-51 dropout3d trick)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class MBConvBlock(nn.Module):
    """Mobile inverted residual bottleneck (reference efficientnet.py:78-111)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    expand_ratio: int
    se_ratio: float
    drop_connect_rate: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool):
        expand_channels = int(self.in_channels * self.expand_ratio)
        se_reduce = max(1, int(self.in_channels * self.se_ratio))
        inp = x
        if self.expand_ratio != 1:
            x = nn.Conv(expand_channels, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                        name="expand_conv")(x)
            x = _effnet_bn(train, self.dtype, "expand_bn")(x)
            x = nn.swish(x)
        x = DepthwiseConv(self.kernel_size, self.stride, self.dtype,
                          name="depthwise_conv")(x)
        x = _effnet_bn(train, self.dtype, "depthwise_bn")(x)
        x = nn.swish(x)
        x = SELayer(se_reduce, self.dtype, name="se")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                    name="project_conv")(x)
        x = _effnet_bn(train, self.dtype, "project_bn")(x)
        # skip + drop-connect only when shapes match (efficientnet.py:101-110)
        if self.in_channels == self.out_channels and self.stride == 1:
            rng = self.make_rng("dropout") if train and self.drop_connect_rate > 0 else None
            x = drop_connect(x, self.drop_connect_rate, not train, rng)
            x = x + inp
        return x


class EfficientNet(nn.Module):
    """Any of efficientnet-b0..b7 via model_name."""

    model_name: str = "efficientnet-b0"
    num_classes: int = 5
    drop_connect_rate: float = 0.2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, probe=None, capture_weights: bool = False):
        del capture_weights  # no attention layers in this family
        stem_ch, blocks, dropout_rate = scaled_blocks(self.model_name)
        x = x.astype(self.dtype)

        x = _same_conv(stem_ch, 3, 2, dtype=self.dtype, name="stem_conv")(x)
        x = _effnet_bn(train, self.dtype, "stem_bn")(x)
        x = nn.swish(x)

        for si, (n, cin, cout, k, s, e, se) in enumerate(blocks):
            for i in range(n):
                x = MBConvBlock(
                    cin if i == 0 else cout, cout, k, s if i == 0 else 1, e, se,
                    # per-stage ramp i/n (reference efficientnet.py:128)
                    self.drop_connect_rate * i / n,
                    self.dtype,
                    name=f"blocks_{si}_{i}",
                )(x, train)

        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                    name="head_conv")(x)
        x = _effnet_bn(train, self.dtype, "head_bn")(x)

        # Grad-CAM site: head BN output (reference hooks model.head[1],
        # chexpert.py:498)
        if probe is not None:
            x = x + probe
        self.sow("intermediates", "gradcam_features", x)

        x = nn.swish(x)
        x = global_avg_pool(x)
        if dropout_rate > 0:
            x = nn.Dropout(dropout_rate)(x, deterministic=not train)
        return nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=torch_linear_init, bias_init=nn.initializers.zeros,
            name="classifier",
        )(x)
