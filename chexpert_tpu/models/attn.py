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

import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from chexpert_tpu.models.common import Dtype, conv, kaiming_normal_out_normal
from chexpert_tpu.ops.attention import aa_attention_einsum


def attn_dims(k: float, v: float, nh: int, channels: int, min_dk_per_head: int = 20):
    """dk/dv sizing rule (reference attn_aug_conv.py:122-124):
    dk = max(20*nh, floor(k*channels/nh)*nh), dv = floor(v*channels/nh)*nh."""
    dk = max(min_dk_per_head * nh, int((k * channels // nh) * nh))
    dv = int((v * channels // nh) * nh)
    return dk, dv


class _PackedQKVConv(nn.Module):
    """The 1x1 qkv projection (reference attn_aug_conv.py:35), optionally
    emitting output channels in the HIL kernel's packed per-head order
    [q_h ; k_h ; v_h] with the q-scale dkh**-0.5 folded in.

    The reorder happens on the WEIGHT's output-channel axis at apply time —
    a (1, 1, Cin, 2dk+dv) gather, ~42k elements — so the conv output IS the
    kernel operand and no data-sized pack/transpose op exists anywhere on
    the qkv path (a head-split transpose or an output-channel permutation
    of the activations costs a full-tensor relayout copy; profiled at
    ~1/4 of an aaresnet152 train step across its 47 attention layers).

    Param tree matches the plain conv exactly (submodule name set by the
    caller, param 'kernel', same shape/init/dtype), so checkpoints, the
    torch importer, and the einsum/bn paths (packed=False) are unaffected.
    """

    dk: int
    dv: int
    nh: int
    strides: int
    packed: bool
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feats = 2 * self.dk + self.dv
        kernel = self.param(
            "kernel", kaiming_normal_out_normal, (1, 1, x.shape[-1], feats),
            jnp.float32)
        if self.packed:
            import numpy as np

            from chexpert_tpu.ops.pallas_attention import _hil_slot

            dkh, dvh = self.dk // self.nh, self.dv // self.nh
            perm, scale = [], []
            for h in range(self.nh):
                perm += list(range(h * dkh, (h + 1) * dkh))              # q_h
                perm += list(range(self.dk + h * dkh, self.dk + (h + 1) * dkh))
                perm += list(range(2 * self.dk + h * dvh, 2 * self.dk + (h + 1) * dvh))
                scale += [dkh ** -0.5] * dkh + [1.0] * (dkh + dvh)
            kernel = kernel[..., np.array(perm)] * jnp.asarray(
                scale, kernel.dtype)
            # zero-pad each head's [q;k;v] to the kernel's lane-slot stride:
            # pad channels are WEIGHT zeros, so the conv emits the slot
            # layout directly and no data-sized pad op exists either
            tight, S = 2 * dkh + dvh, _hil_slot(dkh, dvh)
            if S > tight:
                kernel = jnp.pad(
                    kernel.reshape(1, 1, -1, self.nh, tight),
                    ((0, 0), (0, 0), (0, 0), (0, 0), (0, S - tight)),
                ).reshape(1, 1, -1, self.nh * S)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (self.strides, self.strides), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


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
    # 'pallas' (rel pack per the measured default) | 'pallas-fusedpack' |
    # 'pallas-bd' (explicit rel pack choice; registry maps each arch's
    # 'pallas' to its measured winner) | 'einsum'
    attn_impl: str = "pallas"

    @nn.compact
    def __call__(self, x, capture_weights: bool = False):
        dk, dv, nh = self.dk, self.dv, self.nh
        assert dk % nh == 0 and dv % nh == 0, "nh must divide dk and dv"
        dkh, dvh = dk // nh, dv // nh
        H, W = self.input_dims

        # layout selection: "bn" = batch×head grid kernel (default; fastest
        # measured on aaresnet152: 147-150 img/s vs HIL's 140 — see README
        # "Heads-in-lanes A/B"), "hil" = token-major heads-in-lanes kernel
        # (zero layout ops on the attention path; opt-in pending a win)
        use_pallas = self.attn_impl.startswith("pallas") and not capture_weights
        if use_pallas and os.environ.get("CHEXPERT_ATTN_LAYOUT", "bn") == "hil":
            from chexpert_tpu.ops.pallas_attention import hil_supported

            if not hil_supported(H * W, nh, dkh, dvh, (W + H) if self.relative else 0,
                                 jnp.dtype(self.dtype).itemsize):
                use_pallas = "bn"
        else:
            use_pallas = "bn" if use_pallas else False

        # qkv projection: 1x1 conv, stride applied here (reference
        # attn_aug_conv.py:35); packed=True emits the HIL channel order
        qkv = _PackedQKVConv(
            dk, dv, nh, self.strides, packed=use_pallas is True,
            dtype=self.dtype, name="in_proj_qkv",
        )(x)
        B, Hq, Wq, _ = qkv.shape
        assert (Hq, Wq) == (H, W), (
            f"AAConv2d configured for {H}x{W} attention map, got {Hq}x{Wq}; "
            "input_dims must match the post-stride feature size"
        )

        rel_w = rel_h = None
        if self.relative:
            # init = dk^-0.5 + N(0,1) (reference attn_aug_conv.py:40-41)
            def rel_init(key, shape, dtype=jnp.float32):
                return dk ** -0.5 + nn.initializers.normal(1.0)(key, shape, dtype)

            rel_h = self.param("key_rel_h", rel_init, (dkh, 2 * H - 1))
            rel_w = self.param("key_rel_w", rel_init, (dkh, 2 * W - 1))

        if use_pallas is True:
            # heads-in-lanes path: the projection already emitted packed
            # per-head [q;k;v] lanes with q pre-scaled, and the kernel's
            # output lane order (head, dvh) is out_proj's channel order —
            # zero layout ops on the whole attention path
            from chexpert_tpu.ops.pallas_attention import aa_attention_hil_packed

            attn_out = aa_attention_hil_packed(
                qkv.reshape(B, H * W, -1), rel_w, rel_h, H, W, dkh, dvh
            ).reshape(B, H, W, dv)
        else:
            # head-major layouts: (B, H, W, nh*dh) -> (B, nh, HW, dh);
            # channel-major head split to mirror the reference reshape
            # (attn_aug_conv.py:71-73) so imported weights see identical
            # head boundaries
            q, k, v = jnp.split(qkv, [dk, 2 * dk], axis=-1)

            def to_heads(t, dh):
                t = t.reshape(B, H * W, nh, dh)
                return t.transpose(0, 2, 1, 3)

            qh = to_heads(q, dkh) * (dkh ** -0.5)
            kh = to_heads(k, dkh)
            vh = to_heads(v, dvh)

            if use_pallas == "bn":
                from chexpert_tpu.ops.pallas_attention import aa_attention_pallas

                rel_impl = (self.attn_impl.split("-", 1)[1]
                            if "-" in self.attn_impl else "fusedpack")
                attn_out = aa_attention_pallas(qh, kh, vh, rel_w, rel_h, H, W,
                                               rel_impl=rel_impl)
            else:
                attn_out, weights = aa_attention_einsum(
                    qh, kh, vh, rel_w, rel_h, H, W, return_weights=capture_weights
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
