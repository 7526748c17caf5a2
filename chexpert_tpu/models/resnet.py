"""ResNet / WideResNet / attention-augmented variants in Flax (NHWC, bf16).

Structural parity with torchvision resnet + the reference AA blocks
(/root/reference/models/attn_aug_conv.py:107-404):
  * BasicBlock: [conv3x3 s] -> BN -> ReLU -> conv3x3 -> BN (+identity) -> ReLU
    — AA swaps the FIRST conv3x3 for AAConv2d (attn_aug_conv.py:131-132)
  * Bottleneck: conv1x1 -> BN -> ReLU -> [conv3x3 s] -> BN -> ReLU -> conv1x1
    -> BN (+identity) -> ReLU — AA swaps the INNER conv3x3
    (attn_aug_conv.py:182-183)
  * ResNet: 7x7 s2 stem + maxpool + 4 layers; attention on layers 2-4 only
    (attn_aug_conv.py:242-244); resnet152 = Bottleneck [3, 8, 36, 3]
  * WideResNet-d-w: 3x3 s1 stem + 3 layers of width [16w, 32w, 64w],
    n=(d-4)/6 blocks each; attention on layers 2-3 (attn_aug_conv.py:345-346)

AA feature-map dims per layer follow the reference rule input_dims * 16 /
planes (attn_aug_conv.py:127,176) — for a 320x320 input this yields 40x40 /
20x20 / 10x10 attention maps on layers 2/3/4.

Param paths mirror torchvision (conv1/bn1/layer%d/%d/{conv1,bn1,...,
downsample/{0,1}}/fc) for pretrained import.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Type

import flax.linen as nn
import jax.numpy as jnp

from chexpert_tpu.models.attn import AAConv2d, attn_dims
from chexpert_tpu.models.common import (
    Dtype,
    batch_norm,
    conv,
    global_avg_pool,
    max_pool_torch,
)
from chexpert_tpu.models.densenet import AttnParams, torch_linear_init


def _aa_layer_dims(attn: AttnParams, planes: int) -> Tuple[int, int]:
    """input_dims * 16 / planes (reference attn_aug_conv.py:127,176)."""
    return (
        int(attn.input_dims[0] * 16 / planes),
        int(attn.input_dims[1] * 16 / planes),
    )


class BasicBlock(nn.Module):
    expansion = 1
    planes: int
    strides: int = 1
    has_downsample: bool = False
    attn: Optional[AttnParams] = None
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "pallas"
    zero_init_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool, capture_weights: bool = False):
        identity = x
        if self.attn is None:
            out = conv(self.planes, 3, self.strides, dtype=self.dtype, name="conv1")(x)
        else:
            dk, dv = attn_dims(self.attn.k, self.attn.v, self.attn.nh, self.planes)
            # input_dims*16/planes is already the POST-stride resolution of
            # this stage (e.g. 320->40 at planes=128), so no stride division
            dims = _aa_layer_dims(self.attn, self.planes)
            out = AAConv2d(
                self.planes, 3, self.strides, dk, dv, self.attn.nh,
                self.attn.relative, dims, dtype=self.dtype,
                attn_impl=self.attn_impl, name="conv1",
            )(x, capture_weights=capture_weights)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, dtype=self.dtype, name="conv2")(out)
        # zero-init the residual branch's last BN when requested
        # (reference attn_aug_conv.py:258-263, arxiv 1706.02677)
        bn2_init = (nn.initializers.zeros if self.zero_init_residual
                    else nn.initializers.ones)
        out = batch_norm(train, dtype=self.dtype, name="bn2", scale_init=bn2_init)(out)
        if self.has_downsample:
            identity = conv(
                self.planes * self.expansion, 1, self.strides,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = batch_norm(train, dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4
    planes: int
    strides: int = 1
    has_downsample: bool = False
    base_width: int = 64
    groups: int = 1
    attn: Optional[AttnParams] = None
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "pallas"
    zero_init_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool, capture_weights: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = conv(width, 1, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        if self.attn is None:
            out = conv(width, 3, self.strides, groups=self.groups, dtype=self.dtype, name="conv2")(out)
        else:
            # dk/dv sized from the bottleneck width (attn_aug_conv.py:171-173);
            # input_dims*16/planes is already the post-stride stage resolution
            dk, dv = attn_dims(self.attn.k, self.attn.v, self.attn.nh, width)
            dims = _aa_layer_dims(self.attn, self.planes)
            out = AAConv2d(
                width, 3, self.strides, dk, dv, self.attn.nh,
                self.attn.relative, dims, groups=self.groups,
                dtype=self.dtype, attn_impl=self.attn_impl, name="conv2",
            )(out, capture_weights=capture_weights)
        out = batch_norm(train, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * self.expansion, 1, dtype=self.dtype, name="conv3")(out)
        bn3_init = (nn.initializers.zeros if self.zero_init_residual
                    else nn.initializers.ones)
        out = batch_norm(train, dtype=self.dtype, name="bn3", scale_init=bn3_init)(out)
        if self.has_downsample:
            identity = conv(
                self.planes * self.expansion, 1, self.strides,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = batch_norm(train, dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class _Stage(nn.Module):
    """One resnet 'layer': a run of blocks; first may stride/downsample."""

    block_cls: Type[nn.Module]
    planes: int
    num_blocks: int
    strides: int
    in_planes: int
    attn: Optional[AttnParams]
    dtype: Dtype
    attn_impl: str
    zero_init_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool, capture_weights: bool = False):
        expansion = self.block_cls.expansion
        needs_ds = self.strides != 1 or self.in_planes != self.planes * expansion
        for i in range(self.num_blocks):
            x = self.block_cls(
                planes=self.planes,
                strides=self.strides if i == 0 else 1,
                has_downsample=needs_ds if i == 0 else False,
                attn=self.attn,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                zero_init_residual=self.zero_init_residual,
                name=str(i),
            )(x, train, capture_weights=capture_weights)
        return x


class ResNet(nn.Module):
    """resnet50 [3,4,6,3]; resnet101 [3,4,23,3]; resnet152 [3,8,36,3]."""

    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (3, 8, 36, 3)
    num_classes: int = 5
    attn: Optional[AttnParams] = None
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "pallas"
    zero_init_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, probe=None, capture_weights: bool = False):
        x = x.astype(self.dtype)
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = block_cls.expansion

        x = conv(64, 7, 2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)

        in_planes = 64
        # attention on layers 2-4 only (reference attn_aug_conv.py:241-244)
        attn_per_layer = [None, self.attn, self.attn, self.attn]
        for li, (planes, n, s) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))
        ):
            x = _Stage(
                block_cls, planes, n, s, in_planes, attn_per_layer[li],
                self.dtype, self.attn_impl, self.zero_init_residual,
                name=f"layer{li + 1}",
            )(x, train, capture_weights=capture_weights)
            in_planes = planes * expansion

        # Grad-CAM site: layer4 output (reference chexpert.py:484,490)
        if probe is not None:
            x = x + probe
        self.sow("intermediates", "gradcam_features", x)

        x = global_avg_pool(x)
        return nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=torch_linear_init, bias_init=nn.initializers.zeros,
            name="fc",
        )(x)


class WideResNet(nn.Module):
    """WRN-depth-width; depth = 6n+4 (reference attn_aug_conv.py:311-404)."""

    depth: int = 28
    width: int = 10
    num_classes: int = 100
    attn: Optional[AttnParams] = None
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "pallas"
    zero_init_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, probe=None, capture_weights: bool = False):
        assert (self.depth - 4) % 6 == 0, "depth should be 6n+4"
        n = (self.depth - 4) // 6
        x = x.astype(self.dtype)

        # reference rescales input_dims by width to reuse the 16/planes rule
        # (attn_aug_conv.py:322-324)
        attn = self.attn
        if attn is not None:
            attn = AttnParams(
                k=attn.k, v=attn.v, nh=attn.nh, relative=attn.relative,
                input_dims=(attn.input_dims[0] * self.width, attn.input_dims[1] * self.width),
            )

        x = conv(16, 3, 1, padding=1, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)

        in_planes = 16
        attn_per_layer = [None, attn, attn]  # layers 2-3 (attn_aug_conv.py:344-346)
        for li, (planes, s) in enumerate(
            zip((16 * self.width, 32 * self.width, 64 * self.width), (1, 2, 2))
        ):
            x = _Stage(
                BasicBlock, planes, n, s, in_planes, attn_per_layer[li],
                self.dtype, self.attn_impl, self.zero_init_residual,
                name=f"layer{li + 1}",
            )(x, train, capture_weights=capture_weights)
            in_planes = planes

        if probe is not None:
            x = x + probe
        self.sow("intermediates", "gradcam_features", x)

        x = global_avg_pool(x)
        return nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=torch_linear_init, bias_init=nn.initializers.zeros,
            name="fc",
        )(x)
