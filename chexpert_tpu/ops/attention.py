"""2-D relative-position multi-head spatial self-attention (XLA einsum path).

This is the compute core of the attention-augmented convolution
(cf /root/reference/models/attn_aug_conv.py:43-97 for behavior): multi-head
self-attention over the H*W spatial tokens of a feature map, with learned 2-D
relative-position logits added per head.

Two implementations live in this package:
  * this module — the XLA einsum path. It can optionally return the softmax
    attention weights (needed for attention-map visualization, reference
    attn_aug_conv.py:87 stores them on the module) and is the numerical
    ground truth for the fused kernel;
  * chexpert_tpu.ops.pallas_attention — a blockwise (flash-style) Pallas TPU
    kernel that never materializes the (HW, HW) logits tensor.

Key identity used by both: the relative-width logit between query token
i=(ri, ci) and key token j=(rj, cj) is q_i . rel_w[cj - ci + W - 1] — it
depends on j only through cj. So the full (HW, HW) relative matrix is a
column-broadcast of a small (HW, W) matrix (and (HW, H) for height), which the
Pallas kernel exploits.  The einsum path below materializes the broadcast, as
XLA fuses it into the softmax anyway.

Shapes (per call): q, k of (B, nh, HW, dkh); v of (B, nh, HW, dvh);
rel_w of (dkh, 2W-1); rel_h of (dkh, 2H-1). q is pre-scaled by dkh**-0.5.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """Convert relative-indexed logits (..., L, 2L-1) to absolute (..., L, L).

    Pad-flatten-reshape skew trick (behavioral parity with reference
    attn_aug_conv.py:43-53): rel index d in [0, 2L-2] encodes offset
    j - i + (L-1); output[..., i, j] = input[..., i, j - i + L - 1].
    """
    *lead, L, two_l_minus_1 = x.shape
    assert two_l_minus_1 == 2 * L - 1, x.shape
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])  # (..., L, 2L)
    x = x.reshape(*lead, L * 2 * L)
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, L - 1)])  # (..., 2L^2 + L - 1)
    x = x.reshape(*lead, L + 1, 2 * L - 1)
    return x[..., :L, L - 1 :]


def relative_logits_compact(
    q2d: jnp.ndarray, rel_w: jnp.ndarray, rel_h: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact (un-broadcast) relative logits.

    q2d: (B, nh, H, W, dkh) pre-scaled queries.
    Returns (rw, rh): rw of (B, nh, H*W, W) with rw[., i, cj] the width-relative
    logit for any key in image column cj; rh of (B, nh, H*W, H) analogously for
    key rows. The full (HW, HW) rel matrix = rw broadcast over key-rows +
    rh broadcast over key-cols.

    Skew-free formulation: instead of the reference's rel_to_abs pad/reshape
    chain (attn_aug_conv.py:43-53 — each application costs XLA several
    materialized copies, ~1/5 of an aaresnet152 train step across its 47
    attention layers), expand the 1-D embedding to absolute index pairs with
    ONE static diagonal gather of the tiny parameter —
        rel_w_abs[d, ci, cj] = rel_w[d, cj - ci + W - 1]
    — and contract it against the queries in a single einsum.
    """
    B, nh, H, W, dkh = q2d.shape
    iw = jnp.arange(W)
    rel_w_abs = rel_w[:, iw[None, :] - iw[:, None] + W - 1]  # (dkh, ci, cj)
    rw = jnp.einsum("bnhwd,dwm->bnhwm", q2d, rel_w_abs)
    rw = rw.reshape(B, nh, H * W, W)  # query (ri,ci) row-major; last dim = cj
    ih = jnp.arange(H)
    rel_h_abs = rel_h[:, ih[None, :] - ih[:, None] + H - 1]  # (dkh, ri, rj)
    rh = jnp.einsum("bnhwd,dhm->bnhwm", q2d, rel_h_abs)
    rh = rh.reshape(B, nh, H * W, H)  # last dim = rj
    return rw, rh


def relative_logits_compact_v2(
    q2d: jnp.ndarray, rel_w: jnp.ndarray, rel_h: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact rel logits, transpose-free formulation (same math as
    relative_logits_compact — pinned by test_relative_logits_compact_v2).

    The diagonal-gather einsum "bnhwd,dwm->bnhwm" batches over w, which
    forces XLA to materialize w-major layout copies of q and of the output
    on TPU (profiled at ~15 ms/step across aaresnet152's 47 attention
    layers). Here the contraction is a PLAIN minor-dim matmul
    U = q . rel (no batch dims, natural layouts on both sides) followed by
    a skew of the tiny last axis: rel_to_abs for the width side (the skewed
    dims are adjacent) and a broadcast take_along_axis for the height side
    (the skew index lives on a non-adjacent dim)."""
    B, nh, H, W, dkh = q2d.shape
    uw = jnp.einsum("bnhwd,dr->bnhwr", q2d, rel_w)  # (B,nh,H,W,2W-1)
    rw = rel_to_abs(uw)  # (..., W, W): rw[..., w, m] = uw[..., w, m-w+W-1]
    if os.environ.get("CHEXPERT_REL_V2_GATHER", "0") == "1":
        uh = jnp.einsum("bnhwd,dr->bnhwr", q2d, rel_h)  # (B,nh,H,W,2H-1)
        # rh[..., h, w, m] = uh[..., h, w, m - h + H - 1]
        ih = jnp.arange(H)
        idx = ih[None, :] - ih[:, None] + H - 1  # (h, m)
        rh = jnp.take_along_axis(uh, idx[None, None, :, None, :], axis=-1)
        rh = rh.reshape(B, nh, H * W, H)
    else:
        # height side keeps the diagonal-gather einsum (the broadcast
        # take_along_axis gather measured SLOWER on-chip than the batched
        # dot's layout copies: 107 vs 131 img/s on the aaresnet152 step)
        ih = jnp.arange(H)
        rel_h_abs = rel_h[:, ih[None, :] - ih[:, None] + H - 1]
        rh = jnp.einsum("bnhwd,dhm->bnhwm", q2d, rel_h_abs)
        rh = rh.reshape(B, nh, H * W, H)
    return rw.reshape(B, nh, H * W, W), rh


def relative_logits_compact_bd(
    q2d: jnp.ndarray, rel_w: jnp.ndarray, rel_h: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact rel logits via layout-preserving contractions (same math as
    relative_logits_compact; pinned by test_relative_logits_compact_bd).

    The diagonal-gather einsums "bnhwd,dwm->bnhwm" / "bnhwd,dhm->bnhwm"
    carry a spatial BATCH dim (w resp. h), and TPU dot_general wants batch
    dims major-most in both operands — so XLA materializes batch-major
    copies of q and of the 5-D outputs around every call (profiled at
    ~3.3 GB/step of pure copy traffic across aaresnet152's 47 attention
    layers, the largest single overhead after round-3's kernel work).

    * Width side: w is ADJACENT-major to the contracted d in q's natural
      (B, nh, H, W, d) layout, so the batched contraction is equivalent to
      ONE plain matmul against a block-diagonal operand —
          RW[(b,n,h), (w', m)] = q[(b,n,h), (w, d)] . BD[(w, d), (w', m)],
          BD[(w, d), (w', m)] = delta(w, w') * rel_w_abs[d, w, m]
      No batch dims -> no layout copies; the (W-1)/W zero fraction rides
      the otherwise-idle MXU (~30 us/block where the copies cost ~1 ms).
    * Height side: h is NOT adjacent to d, so no BD matmul exists in this
      layout. A broadcast-multiply-reduce (q[..., None] * rel_h_abs
      summed over d) keeps natural layouts and fuses on the VPU; the
      reduction depth is only dkh.
    """
    B, nh, H, W, dkh = q2d.shape
    iw = jnp.arange(W)
    rel_w_abs = rel_w[:, iw[None, :] - iw[:, None] + W - 1]  # (d, w, m)
    eye = jnp.eye(W, dtype=q2d.dtype)
    bd = jnp.einsum("wv,dwm->wdvm", eye, rel_w_abs).reshape(W * dkh, W * W)
    rw = jnp.einsum(
        "bnhk,kc->bnhc", q2d.reshape(B, nh, H, W * dkh), bd,
        preferred_element_type=jnp.float32,
    ).astype(q2d.dtype)
    rw = rw.reshape(B, nh, H * W, W)  # cols (w', m) row-major = token, cj

    ih = jnp.arange(H)
    rel_h_abs = rel_h[:, ih[None, :] - ih[:, None] + H - 1]  # (d, h, m)
    if os.environ.get("CHEXPERT_REL_H") == "bdt":
        # pre-transposed block-diagonal form (round-4 A/B): transpose q to
        # (B, nh, W, H, d) so h becomes ADJACENT-major to the contracted d,
        # run the same BD matmul as the width side, transpose the result
        # back. Trades the batched einsum's hidden batch-major copies of q
        # AND its 5-D output for two EXPLICIT transposes of the same arrays
        # — a win iff XLA schedules the explicit forms better (measured
        # on-chip via CHEXPERT_REL_H=bdt).
        qT = q2d.transpose(0, 1, 3, 2, 4)  # (B, nh, W, H, d)
        eyeh = jnp.eye(H, dtype=q2d.dtype)
        bdh = jnp.einsum("hg,dhm->hdgm", eyeh, rel_h_abs).reshape(H * dkh, H * H)
        rhT = jnp.einsum(
            "bnwk,kc->bnwc", qT.reshape(B, nh, W, H * dkh), bdh,
            preferred_element_type=jnp.float32,
        ).astype(q2d.dtype).reshape(B, nh, W, H, H)  # cols (h', m) -> token rows
        rh = rhT.transpose(0, 1, 3, 2, 4).reshape(B, nh, H * W, H)
    elif os.environ.get("CHEXPERT_REL_H") == "bcast":
        # rh[b,n,h,w,m] = sum_d q[b,n,h,w,d] * rel_h_abs[d,h,m]; elementwise
        # broadcast + reduce over the minor d keeps natural layouts but puts
        # the contraction on the VPU — measured SLOWER on-chip than the
        # batched einsum's copies (98.9 vs 138.7 img/s on aaresnet152)
        rh = jnp.sum(
            q2d[:, :, :, :, None, :]                        # (B,nh,H,W,1,d)
            * rel_h_abs.transpose(1, 2, 0)[None, None, :, None, :, :],  # (h,m,d)
            axis=-1,
        ).reshape(B, nh, H * W, H)
    else:
        rh = jnp.einsum("bnhwd,dhm->bnhwm", q2d, rel_h_abs)
        rh = rh.reshape(B, nh, H * W, H)
    return rw, rh


def rel_h_compact(q2d: jnp.ndarray, rel_h: jnp.ndarray) -> jnp.ndarray:
    """Height-side compact rel logits alone: (B, nh, H*W, H).

    Same math as relative_logits_compact's height side. The batched
    diagonal-gather einsum stays the measured default
    (relative_logits_compact_bd's height notes: both the broadcast-reduce
    and the BD-transpose alternatives measured slower on-chip).
    CHEXPERT_REL_H=mmskew: plain minor-dim matmul against the RAW (dkh,
    2H-1) embedding (no batch dims — no batch-major relayouts) followed by
    a take_along_axis skew of the tiny last axis. Re-measured under the
    round-5 vjp boundary: still a LOSS (750.3 vs fusedpack's 770.2 img/s on
    aadensenet121 @128; bytes-accessed 119.5 vs 114.5 GB — the gather
    materializes the wider (2H-1) intermediate). Kept as a tested opt-in."""
    B, nh, H, W, dkh = q2d.shape
    if os.environ.get("CHEXPERT_REL_H") == "mmskew":
        u = jnp.einsum("bnhwd,dr->bnhwr", q2d, rel_h)  # (B,nh,H,W,2H-1)
        ih = jnp.arange(H)
        idx = ih[None, :] - ih[:, None] + H - 1  # (h, m)
        rh = jnp.take_along_axis(u, idx[None, None, :, None, :], axis=-1)
        return rh.reshape(B, nh, H * W, H)
    ih = jnp.arange(H)
    rel_h_abs = rel_h[:, ih[None, :] - ih[:, None] + H - 1]  # (d, h, m)
    rh = jnp.einsum("bnhwd,dhm->bnhwm", q2d, rel_h_abs)
    return rh.reshape(B, nh, H * W, H)


def packed_q_relw_bd(q: jnp.ndarray, rel_w: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[q ; RW] emitted by ONE plain matmul against a block-diagonal operand.

    out[..., t, :dkh] == q[..., t, :] exactly (identity block columns: the
    MXU sums a single q*1.0 term in f32 and casts back — bit-exact in bf16)
    and out[..., t, dkh+m] == relative_logits_compact(q..)[0][..., t, m].

    Why: the Pallas kernel consumes a lane-packed [q ; RW ; RH] operand
    (see pallas_attention.py kernel notes). Producing q and RW separately
    costs XLA a batch-minor->row-major relayout copy of the BD einsum's 5-D
    output PLUS a transposing reshape PLUS q's own copy into the concat —
    profiled round 5 at ~5 ms/step of aadensenet121's 168 ms (the
    'data formatting' ops around every attention layer). Emitting [q ; RW]
    as one matmul gives those bytes to the dot that writes them anyway; the
    identity block's zeros ride the idle MXU like the BD trick itself.

    C[(w, d), (w', p)] = delta(w, w') * [ delta(d, p)            p < dkh
                                          rel_w_abs[d, w, p-dkh] p >= dkh ]
    """
    B, nh, hw, dkh = q.shape
    assert hw == H * W, (hw, H, W)
    iw = jnp.arange(W)
    rel_w_abs = rel_w[:, iw[None, :] - iw[:, None] + W - 1]  # (d, w, m)
    eye_w = jnp.eye(W, dtype=q.dtype)
    c_id = jnp.einsum("wv,de->wdve", eye_w, jnp.eye(dkh, dtype=q.dtype))
    c_rel = jnp.einsum("wv,dwm->wdvm", eye_w, rel_w_abs.astype(q.dtype))
    P = dkh + W
    C = jnp.concatenate([c_id, c_rel], axis=-1).reshape(W * dkh, W * P)
    out = jnp.einsum(
        "bnhk,kc->bnhc", q.reshape(B, nh, H, W * dkh), C,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out.reshape(B, nh, hw, P)


def relative_logits(
    q2d: jnp.ndarray, rel_w: jnp.ndarray, rel_h: jnp.ndarray
) -> jnp.ndarray:
    """Full (B, nh, HW, HW) relative-position logits (einsum path)."""
    B, nh, H, W, _ = q2d.shape
    rw, rh = relative_logits_compact(q2d, rel_w, rel_h)
    # broadcast rw over key rows, rh over key cols, then flatten keys row-major
    full = rw[:, :, :, None, :] + rh[:, :, :, :, None]  # (B, nh, HW, rj, cj)
    return full.reshape(B, nh, H * W, H * W)


def aa_attention_einsum(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_w: Optional[jnp.ndarray],
    rel_h: Optional[jnp.ndarray],
    H: int,
    W: int,
    return_weights: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Reference-math attention. q pre-scaled. Returns (out, weights|None).

    out: (B, nh, HW, dvh). weights: (B, nh, HW, HW) softmax (float32).
    """
    B, nh, hw, dkh = q.shape
    assert hw == H * W, (hw, H, W)
    logits = jnp.einsum(
        "bnid,bnjd->bnij", q, k, preferred_element_type=jnp.float32
    )
    if rel_w is not None:
        q2d = q.reshape(B, nh, H, W, dkh)
        logits = logits + relative_logits(
            q2d.astype(jnp.float32), rel_w.astype(jnp.float32), rel_h.astype(jnp.float32)
        )
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bnij,bnjd->bnid", weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return out, (weights if return_weights else None)
