"""DenseNet / attention-augmented DenseNet in Flax (NHWC, bf16 compute).

Structural parity with torchvision densenet + the reference AA variant
(/root/reference/models/attn_aug_conv.py:411-517):
  * ImageNet stem (4 dense blocks): conv0 7x7 s2 -> BN -> ReLU -> maxpool 3x3 s2
  * CIFAR stem (3 dense blocks):    conv0 5x5 s1 -> BN -> ReLU
  * transitions: BN -> ReLU -> 1x1 conv (features//2) -> avgpool2   (standard)
                 InstanceNorm -> ReLU -> AAConv2d 3x3 s2            (AA variant,
                 reference attn_aug_conv.py:436-440 active branch)
  * head: norm5 -> ReLU -> global-avg-pool -> Linear

Param tree paths mirror torchvision names (conv0/norm0/denseblock%d/
denselayer%d/{norm1,conv1,norm2,conv2}/transition%d/{norm,conv}/norm5/
classifier) so pretrained torchvision state dicts map 1:1.

densenet121 = DenseNetConfig(32, (6, 12, 24, 16), 64) (chexpert.py:461-473);
aadensenet121 adds attn k=0.2 v=0.1 nh=8 relative input 320x320
(chexpert.py:474-480).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from chexpert_tpu.models.attn import AAConv2d, attn_dims
from chexpert_tpu.models.common import (
    Dtype,
    InstanceNorm,
    avg_pool_torch,
    batch_norm,
    conv,
    global_avg_pool,
    kaiming_normal_in_normal,
    max_pool_torch,
)

torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


@dataclasses.dataclass(frozen=True)
class AttnParams:
    """Reference attn_params dict (chexpert.py:476)."""

    k: float = 0.2
    v: float = 0.1
    nh: int = 8
    relative: bool = True
    input_dims: Tuple[int, int] = (320, 320)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool):
        y = batch_norm(train, dtype=self.dtype, name="norm1")(x)
        y = nn.relu(y)
        y = conv(
            self.bn_size * self.growth_rate, 1, dtype=self.dtype,
            kernel_init=kaiming_normal_in_normal, name="conv1",
        )(y)
        y = batch_norm(train, dtype=self.dtype, name="norm2")(y)
        y = nn.relu(y)
        y = conv(
            self.growth_rate, 3, dtype=self.dtype,
            kernel_init=kaiming_normal_in_normal, name="conv2",
        )(y)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate)(y, deterministic=not train)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int
    drop_rate: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_layers):
            x = DenseLayer(
                self.growth_rate, self.bn_size, self.drop_rate, self.dtype,
                name=f"denselayer{i + 1}",
            )(x, train)
        return x


class Transition(nn.Module):
    num_output_features: int
    attn: Optional[AttnParams]
    attn_map_dims: Tuple[int, int]  # post-downsample (H, W) for the AA conv
    dtype: Dtype
    attn_impl: str

    @nn.compact
    def __call__(self, x, train: bool, capture_weights: bool = False):
        if self.attn is None:
            y = batch_norm(train, dtype=self.dtype, name="norm")(x)
            y = nn.relu(y)
            y = conv(
                self.num_output_features, 1, dtype=self.dtype,
                kernel_init=kaiming_normal_in_normal, name="conv",
            )(y)
            return avg_pool_torch(y, 2, 2)
        # AA variant: strided AAConv2d does the downsampling
        dk, dv = attn_dims(self.attn.k, self.attn.v, self.attn.nh, self.num_output_features)
        y = InstanceNorm(dtype=self.dtype, name="norm")(x)
        y = nn.relu(y)
        return AAConv2d(
            self.num_output_features, 3, 2, dk, dv, self.attn.nh,
            self.attn.relative, self.attn_map_dims, dtype=self.dtype,
            attn_impl=self.attn_impl, name="conv",
        )(y, capture_weights=capture_weights)


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.0
    num_classes: int = 5
    attn: Optional[AttnParams] = None
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "pallas"

    @nn.compact
    def __call__(self, x, train: bool = False, probe=None, capture_weights: bool = False):
        x = x.astype(self.dtype)
        imagenet_stem = len(self.block_config) == 4
        dims = None if self.attn is None else tuple(self.attn.input_dims)

        if imagenet_stem:
            x = conv(
                self.num_init_features, 7, 2, padding=3, dtype=self.dtype,
                kernel_init=kaiming_normal_in_normal, name="conv0",
            )(x)
            x = batch_norm(train, dtype=self.dtype, name="norm0")(x)
            x = nn.relu(x)
            x = max_pool_torch(x, 3, 2, 1)
            if dims is not None:
                dims = (dims[0] // 4, dims[1] // 4)
        else:
            x = conv(
                self.num_init_features, 5, 1, padding=2, dtype=self.dtype,
                kernel_init=kaiming_normal_in_normal, name="conv0",
            )(x)
            x = batch_norm(train, dtype=self.dtype, name="norm0")(x)
            x = nn.relu(x)

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(
                num_layers, self.growth_rate, self.bn_size, self.drop_rate,
                self.dtype, name=f"denseblock{i + 1}",
            )(x, train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                # AA transition attends on the post-stride map: dims//2
                # (reference attn_aug_conv.py:421-423, 491-493)
                tdims = None if dims is None else (dims[0] // 2, dims[1] // 2)
                x = Transition(
                    num_features // 2, self.attn, tdims, self.dtype,
                    self.attn_impl, name=f"transition{i + 1}",
                )(x, train, capture_weights=capture_weights)
                num_features //= 2
            if dims is not None:
                dims = (dims[0] // 2, dims[1] // 2)

        x = batch_norm(train, dtype=self.dtype, name="norm5")(x)

        # Grad-CAM site: final conv feature map (reference hooks
        # features.norm5 — chexpert.py:468). `probe` enables functional
        # d(logits)/d(features) without hooks; sow exposes the activations.
        if probe is not None:
            x = x + probe
        self.sow("intermediates", "gradcam_features", x)

        x = nn.relu(x)
        x = global_avg_pool(x)
        logits = nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=torch_linear_init, bias_init=nn.initializers.zeros,
            name="classifier",
        )(x)
        return logits
