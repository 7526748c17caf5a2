"""Attention-augmented convolution (AAConv2d) in Flax.

Behavioral parity with /root/reference/models/attn_aug_conv.py:19-100:
output = concat([same-conv(x) with out_channels-dv filters,
                 out_proj(multi-head rel-pos self-attention over H*W)], C)

TPU-native differences:
  * NHWC layout; bfloat16 compute.
  * attention dispatches to a fused blockwise Pallas kernel (attn_impl=
    'pallas') or the XLA einsum path ('einsum').
  * attention weights are NOT stored as module state (the reference stashes
    softmax on self.weights — attn_aug_conv.py:87 — an O(B*nh*(HW)^2) memory
    hazard in training). Here they are sow'n into the 'intermediates'
    collection only when capture_weights=True (used by the visualization
    entry point, which forces the einsum path).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from chexpert_tpu.models.common import Dtype, conv, kaiming_normal_out_normal
from chexpert_tpu.ops.attention import aa_attention_einsum


def attn_dims(k: float, v: float, nh: int, channels: int, min_dk_per_head: int = 20):
    """dk/dv sizing rule (reference attn_aug_conv.py:122-124):
    dk = max(20*nh, floor(k*channels/nh)*nh), dv = floor(v*channels/nh)*nh."""
    dk = max(min_dk_per_head * nh, int((k * channels // nh) * nh))
    dv = int((v * channels // nh) * nh)
    return dk, dv


class AAConv2d(nn.Module):
    out_channels: int
    kernel_size: int
    strides: int
    dk: int
    dv: int
    nh: int
    relative: bool
    input_dims: Tuple[int, int]  # (H, W) of the *attention* feature map
    groups: int = 1
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "pallas"  # 'pallas' | 'einsum'

    @nn.compact
    def __call__(self, x, capture_weights: bool = False):
        dk, dv, nh = self.dk, self.dv, self.nh
        assert dk % nh == 0 and dv % nh == 0, "nh must divide dk and dv"
        dkh, dvh = dk // nh, dv // nh
        H, W = self.input_dims

        # qkv projection: 1x1 conv, stride applied here
        # (reference attn_aug_conv.py:35)
        qkv = conv(
            2 * dk + dv, 1, self.strides, use_bias=False, dtype=self.dtype, name="in_proj_qkv"
        )(x)
        B, Hq, Wq, _ = qkv.shape
        assert (Hq, Wq) == (H, W), (
            f"AAConv2d configured for {H}x{W} attention map, got {Hq}x{Wq}; "
            "input_dims must match the post-stride feature size"
        )
        q, k, v = jnp.split(qkv, [dk, 2 * dk], axis=-1)

        # (B, H, W, nh*dh) -> (B, nh, HW, dh); channel-major head split to
        # mirror the reference reshape (attn_aug_conv.py:71-73) so imported
        # weights see identical head boundaries
        def to_heads(t, dh):
            t = t.reshape(B, H * W, nh, dh)
            return t.transpose(0, 2, 1, 3)

        q = to_heads(q, dkh) * (dkh ** -0.5)
        k = to_heads(k, dkh)
        v = to_heads(v, dvh)

        rel_w = rel_h = None
        if self.relative:
            # init = dk^-0.5 + N(0,1) (reference attn_aug_conv.py:40-41)
            def rel_init(key, shape, dtype=jnp.float32):
                return dk ** -0.5 + nn.initializers.normal(1.0)(key, shape, dtype)

            rel_h = self.param("key_rel_h", rel_init, (dkh, 2 * H - 1))
            rel_w = self.param("key_rel_w", rel_init, (dkh, 2 * W - 1))

        if self.attn_impl == "pallas" and not capture_weights:
            from chexpert_tpu.ops.pallas_attention import aa_attention_pallas

            attn_out = aa_attention_pallas(q, k, v, rel_w, rel_h, H, W)
        else:
            attn_out, weights = aa_attention_einsum(
                q, k, v, rel_w, rel_h, H, W, return_weights=capture_weights
            )
            if capture_weights:
                self.sow("intermediates", "attn_weights", weights)

        # (B, nh, HW, dvh) -> (B, H, W, dv); inverse of to_heads
        attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, H, W, dv)
        attn_out = conv(dv, 1, 1, use_bias=False, dtype=self.dtype, name="out_proj")(
            attn_out.astype(self.dtype)
        )

        if self.out_channels > dv:
            conv_out = conv(
                self.out_channels - dv,
                self.kernel_size,
                self.strides,
                groups=self.groups,
                use_bias=False,
                dtype=self.dtype,
                kernel_init=kaiming_normal_out_normal,
                name="conv",
            )(x)
            return jnp.concatenate([conv_out, attn_out], axis=-1)
        return attn_out
