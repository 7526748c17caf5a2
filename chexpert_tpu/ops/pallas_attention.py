"""Fused blockwise 2-D relative-position attention — Pallas TPU kernels.

Flash-attention-style forward and backward: tile over query blocks, stream
key blocks with an online softmax, never materializing the (HW, HW) logits
tensor (the reference einsum path is O(B*nh*(HW)^2) memory,
/root/reference/models/attn_aug_conv.py:75-87 — and autodiff additionally
saves the softmax weights as residuals).

Relative-position handling — a TPU-first re-derivation of the reference's
rel_to_abs pad/reshape trick (attn_aug_conv.py:43-63):

1. The width-relative logit between query i=(ri,ci) and key j=(rj,cj) is
   q_i . rel_w[cj-ci+W-1] — it depends on j only through its column cj. The
   full (HW, HW) relative matrix is therefore a column-broadcast of compact
   matrices RW[i, cj] (HW, W) and RH[i, rj] (HW, H), computed in XLA by
   relative_logits_compact (tiny, differentiable).

2. The logits tile is computed as ONE MXU pass with no gathers:
       S = [q;RW;RH] [k; onehot_W(cj); onehot_H(rj)]^T
   The one-hot matmul turns "broadcast rel logit to every key in column cj"
   into a contraction the systolic array does for free. The query side
   arrives packed from XLA (the pack replaces the [RW;RH] concat that
   existed anyway — see the layout notes above the kernels); the key side
   is packed in VMEM per program (a k-side HBM pack measured slower, since
   no k concat existed to replace).

3. Small feature maps (HW <= 512) make per-(batch, head) work a few
   microseconds, so the fixed per-program cost dominates — the grid batches
   G (batch*head) slices per program (_pick_group) to amortize it.

The backward recomputes S blockwise (flash backward). dS k and dS [onehots]
yield dq and d[RW;RH]; XLA backpropagates d[RW;RH] through the compact
einsum to the rel embeddings (and the rel contribution to dq) automatically
via the custom_vjp composition in aa_attention_pallas.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from chexpert_tpu.ops.attention import (
    packed_q_relw_bd,
    rel_h_compact,
    relative_logits_compact,
    relative_logits_compact_bd,
)

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_axis(x: jnp.ndarray, axis: int, to: int) -> jnp.ndarray:
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _tile_candidates(hw: int) -> list:
    """Ranked (tq, tk) candidates, tk a multiple of tq so one padded length
    serves both grids. Bigger tiles amortize per-tile overhead (measured 2x
    on v5e going 128->256/512; a FULL-LENGTH key block — nk=1, no online
    rescale chain — measured another ~8%% at HW=1600: 6.6 -> 6.07 ms/op).
    The list is cost-ordered; _geometry takes the first VMEM-feasible entry,
    so candidates too big for the backward's residents fall through to
    smaller tiles instead of failing."""
    override = os.environ.get("CHEXPERT_ATTN_TILES")
    if override:  # perf experiments (scripts/sweep_attn_tiles.py)
        tq, tk = (int(t) for t in override.split(","))
        return [(tq, tk)]
    if hw <= 256:
        t = _round8(max(8, hw))
        return [(t, t)]
    cands = []
    for tq in range(64, 401, 8):
        for m in range(1, _cdiv(hw, tq) + 1):
            tk = tq * m
            hwp = _cdiv(hw, tk) * tk
            if tk > hwp:  # beyond one full block only pads
                continue
            # cost model: logits work scales ~ hwp^2; small tiles pay
            # per-tile overhead (measured sweeps on v5e favored (400, 1600)
            # at HW=1600; ~15% penalty per halving below the (400, 800)
            # reference point)
            overhead = (400 / tq) * (800 / tk)
            cost = (hwp * hwp) * (1.0 + 0.15 * (overhead - 1.0))
            cands.append((cost, tq, tk))
    cands.sort()
    return [(tq, tk) for _, tq, tk in cands]


def _pick_group(bn: int, hw: int, est_bytes=None) -> int:
    """(batch*head) slices per program. At small HW the per-program work is
    a few microseconds of MXU time, so the fixed per-program cost (grid
    step, DMA issue) dominates — batching G heads into one program amortizes
    it (measured 43->10 ms for aaresnet152's 36 layer-3 blocks, HW=400). At
    large HW one (b, h) is already enough work.

    est_bytes(G) -> estimated backward VMEM residents: the largest G whose
    estimate fits the scoped budget wins (bf16 models fit G=8 at HW=400
    since the round-3 layout work; f32 models — the CPU test tier — need
    smaller G)."""
    override = os.environ.get("CHEXPERT_ATTN_GROUP")
    if override:
        g = int(override)
        return g if g > 0 and bn % g == 0 else 1
    # No hw cutoff: the VMEM estimate is the only gate. Even at HW=1600
    # (aaresnet152 layer2, tiles (400, 800)) one (b, h) is only ~0.3 us of
    # MXU work per program — far below the fixed per-program cost — and the
    # round-3 layouts leave room for G=2 within the budget.
    for g in (8, 4, 2):
        if bn % g == 0 and (est_bytes is None or est_bytes(g) < _VMEM_BUDGET):
            return g
    return 1


# Calibrated against the default TPU scoped-VMEM limit (16 MiB). Raise
# together with XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=N for experiments
# with larger per-program groups (scripts/sweep_attn_tiles.py).
_VMEM_BUDGET = int(os.environ.get("CHEXPERT_ATTN_VMEM_MB", "14")) * 1024 * 1024


def _pad_len(hw: int, tq: int, tk: int) -> int:
    return _cdiv(hw, tk) * tk if tk % tq == 0 else _cdiv(hw, tq * tk) * tq * tk


def _interpret() -> bool:
    """Pallas interpreter mode off-TPU (CPU tests / virtual meshes)."""
    return jax.devices()[0].platform == "cpu"


# ---------------------------------------------------------------------------
# kernels
#   qr = [q ; RW ; RH]  (G, tq|hwp, dkh+W+H)   k (G, hwp|tk, dkh)
#   oh = [onehot_col; onehot_row] (hwp|tk, W+H, shared)   v (G, hwp|tk, dvh)
# The query-side operand arrives PRE-PACKED on the lane dim: a (.., dkh=20)
# array tiles to 128 lanes in HBM (6.4x the bytes), so streaming q and r
# (and dq/dr) separately pays 2x128 padded lanes per token where the packed
# form pays one — and the pack replaces the [RW;RH] concat XLA already
# materialized, so it costs nothing extra. (Packing the KEY side the same
# way measured SLOWER: no k-side concat existed, so materializing
# [k;onehots] per (b,h) ADDED a full write where the shared oh constant was
# nearly free. The kernel builds kab = [k;oh] in VMEM instead.) The s tile
# is ONE MXU pass over the packed rows, since
#   qr . [k;oh]^T = q k^T + RW onehot_c^T + RH onehot_r^T.
# ---------------------------------------------------------------------------


def _dot_nt(a, b):
    """a (m, d) . b (n, d)^T -> (m, n), f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nn(a, b, dtype=jnp.float32):
    """a (m, n) . b (n, d) -> (m, d), f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=dtype
    )


def _fwd_kernel(qr_ref, k_ref, oh_ref, v_ref, o_ref, lse_ref,
                *, hw: int, tq: int, tk: int, G: int, dv1: bool):
    """Online softmax over statically-unrolled key blocks (nk is tiny for
    every AAConv geometry): block 0 initializes the running stats directly —
    no NEG_INF/alpha rescale chain — and the padding mask is emitted only
    for the one tail block that actually has padded keys.

    Singleton-minor arrays (lse always; out/v with dv1) are laid out as
    (bn, n_blocks, tile) ROWS instead of (bn, hw, 1) columns: a (.., 1)
    minor dim tile-pads to 128 lanes in HBM (T(8,128)) — 128x the bytes and
    DMA — while the row form pads only tile->tile_lanes. Blocks for these
    refs are full-array (legal regardless of tile size) and the kernel
    indexes the block row by (dynamic) sublane, which Mosaic allows.

    VPU->MXU offload: the kernel is VPU-bound at the AAConv geometries (the
    logits dot is ~2 us of MXU work while softmax passes over the (tq, tk)
    tile cost ~1 VPU op per element each — and an on-chip probe measured
    exp at the SAME per-element rate as multiply, so only the op COUNT
    matters). The softmax sum and P.V therefore ride the idle MXU as one
    fused dot with a ones row/column folded into V, leaving max + exp as
    the only per-element VPU passes:
      dv1 (dvh == 1, aaresnet152's layer-2, nk == 1 — the zoo's hottest
      geometry):   [v ; 1] (2, tk) . p^T  -> (2, tq) = [P.v ; sum(p)]
      general:     p . [v | 1] (tk, dvh+1) -> (tq, dvh+1)
    The dv1 nk > 1 fallback keeps the old VPU reduce (row-layout running
    stats don't mix with the column-layout rescale chain; no production
    geometry takes it — every tile candidate uses a full-length key block)."""
    qi = pl.program_id(1)
    nk = _cdiv(hw, tk)
    for g in range(G):
        qa = qr_ref[g]  # (tq, dkh+W+H), packed [q ; RW ; RH]

        m = l = acc = None
        for j in range(nk):
            j0 = j * tk
            kab = jnp.concatenate(
                [k_ref[g, pl.ds(j0, tk), :], oh_ref[pl.ds(j0, tk), :]], axis=-1
            )  # (tk, dkh+W+H) built in VMEM

            # q.k + rel_w + rel_h in one MXU pass
            s = _dot_nt(qa, kab)  # (tq, tk) f32
            if j0 + tk > hw:  # static: only the tail block is padded
                t_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
                s = jnp.where(t_ids < hw, s, NEG_INF)

            bm = s.max(axis=-1, keepdims=True)
            if m is None:
                m = bm
                p = jnp.exp(s - m)
                alpha = None
            else:
                m_new = jnp.maximum(m, bm)
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                m = m_new
            if dv1 and nk == 1:
                # p stays f32: converting it to bf16 for the dot is a full
                # (tq, tk) VPU pass, while casting the (2, tk) V-side operand
                # up to f32 is ~tq/2 times cheaper and the MXU is idle anyway
                vb_row = v_ref[g, pl.ds(j * 8, 1), :]  # (1, tk) row layout
                v1 = jnp.concatenate(
                    [vb_row.astype(jnp.float32),
                     jnp.ones((1, tk), jnp.float32)], axis=0)
                pvl = _dot_nt(v1, p)  # (2, tq) f32: [P.v ; sum]
                acc, l = pvl[0:1], pvl[1:2]  # row layouts
            elif dv1:
                vb_row = v_ref[g, pl.ds(j * 8, 1), :]
                pv = (p * vb_row.astype(jnp.float32)).sum(axis=-1, keepdims=True)
                bl = p.sum(axis=-1, keepdims=True)
                l = bl if l is None else l * alpha + bl
                acc = pv if acc is None else acc * alpha + pv
            else:
                # f32 dot for the same reason as above: converting the small
                # (tk, dvh+1) V-side beats a (tq, tk) VPU pass over p
                vb = v_ref[g, pl.ds(j0, tk), :]
                v1 = jnp.concatenate(
                    [vb.astype(jnp.float32),
                     jnp.ones((tk, 1), jnp.float32)], axis=-1)
                pvl = _dot_nn(p, v1)  # (tq, dvh+1)
                pv, bl = pvl[:, :-1], pvl[:, -1:]
                l = bl if l is None else l * alpha + bl
                acc = pv if acc is None else acc * alpha + pv

        if dv1 and nk == 1:
            o_ref[g, pl.ds(qi * 8, 1), :] = (acc / l).astype(o_ref.dtype)
            lse_ref[g, pl.ds(qi * 8, 1), :] = (
                m.reshape(1, tq) + jnp.log(l)).astype(jnp.float32)
        elif dv1:
            o_ref[g, pl.ds(qi * 8, 1), :] = (acc / l).reshape(1, tq).astype(o_ref.dtype)
            lse_ref[g, pl.ds(qi * 8, 1), :] = (
                (m + jnp.log(l)).astype(jnp.float32).reshape(1, tq)
            )
        else:
            o_ref[g] = (acc / l).astype(o_ref.dtype)
            lse_ref[g, pl.ds(qi * 8, 1), :] = (
                (m + jnp.log(l)).astype(jnp.float32).reshape(1, tq)
            )


def _bwd_kernel(k_ref, oh_ref, v_ref, qr_ref, do_ref, lse_ref, delta_ref,
                dqr_ref, dk_ref, dv_ref,
                *, dkh: int, hw: int, hwp: int, tq: int, tk: int, G: int,
                dv1: bool):
    """Fused backward: one S-recompute serves dq, dk, dv, dRW, dRH.

    Grid (bn/G, nk): program ki owns key block ki (writes dk/dv) and loops
    over query blocks, ACCUMULATING the packed [dq ; dRW ; dRH] into an
    output block whose index map is constant in ki — the TPU grid runs
    sequentially, so the block stays resident in VMEM across the ki sweep
    (zeroed at ki == 0, flushed when the leading coordinate advances).

    lse/delta stream as (nq, tq) row blocks (128x less HBM than tile-padded
    (hw, 1) columns); with dv1, v/dout/dv do too, and the N=1 MXU dots
    (dv, dp) become VPU broadcast-multiply/reduces."""
    ki = pl.program_id(1)
    j0 = ki * tk
    nq = _cdiv(hw, tq)  # real-query blocks only; fully-padded query blocks
    # beyond this keep their zero-init dqr rows (sliced away on the host)

    @pl.when(ki == 0)
    def _():
        dqr_ref[...] = jnp.zeros(dqr_ref.shape, dqr_ref.dtype)

    for g in range(G):
        # K' = [k ; onehots] packed once per program in VMEM, reused across
        # the query sweep: s recompute and dQ' are one MXU pass each
        kab = jnp.concatenate([k_ref[g], oh_ref[...]], axis=-1)  # (tk, dkh+W+H)
        if dv1:
            vb_row = v_ref[g, pl.ds(ki * 8, 1), :]  # (1, tk) row layout
        else:
            vb = v_ref[g]  # (tk, dvh)

        def body(i, carry):
            dk, dv = carry
            i0 = i * tq
            qa = qr_ref[g, pl.ds(i0, tq), :]  # (tq, dkh+W+H)
            lse = lse_ref[g, pl.ds(i * 8, 1), :].reshape(tq, 1)
            delta = delta_ref[g, pl.ds(i * 8, 1), :].reshape(tq, 1)

            s = _dot_nt(qa, kab)
            if hwp > hw:  # static: padded keys exist only in the tail block
                t_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
                s = jnp.where(t_ids < hw, s, NEG_INF)
            p = jnp.exp(s - lse)  # (tq, tk)

            if dv1:
                # same VPU->MXU offload as the forward: dv's masked
                # column-reduce and dp's rank-1 outer product are each one
                # MXU pass over the (tq, tk) tile, leaving exp + ds as the
                # only per-element VPU work in the backward
                do_row = do_ref[g, pl.ds(i * 8, 1), :]  # (1, tq) row layout
                # f32 dot: casting the (1, tq) row up beats a (tq, tk) VPU
                # convert pass over p (the MXU is idle either way)
                dv = dv + _dot_nn(do_row.astype(jnp.float32), p)
                do_col = do_row.astype(jnp.float32).reshape(tq, 1)
                dp = do_col * vb_row.astype(jnp.float32)  # rank-1 outer on
                # the VPU (the K=1 MXU form measured SLOWER: operand padding
                # + converts outweigh the saved multiply pass)
            else:
                do = do_ref[g, pl.ds(i0, tq), :]
                dv = dv + jax.lax.dot_general(
                    p, do.astype(jnp.float32), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = _dot_nt(do, vb)
            ds = (p * (dp - delta)).astype(qa.dtype)
            dk = dk + jax.lax.dot_general(
                ds, qa[:, :dkh], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqa = _dot_nn(ds, kab)  # [dq ; dRW ; dRH] in one pass
            dqr_ref[g, pl.ds(i0, tq), :] += dqa.astype(dqr_ref.dtype)
            return dk, dv

        dk0 = jnp.zeros((tk, dkh), jnp.float32)
        dv0 = (jnp.zeros((1, tk), jnp.float32) if dv1
               else jnp.zeros((tk, v_ref.shape[-1]), jnp.float32))
        dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
        dk_ref[g] = dk.astype(dk_ref.dtype)
        if dv1:
            dv_ref[g, pl.ds(ki * 8, 1), :] = dv.astype(dv_ref.dtype)
        else:
            dv_ref[g] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _onehot_pos(hw: int, H: int, W: int, dtype) -> jnp.ndarray:
    """(HW, W+H): [onehot_W(col) ; onehot_H(row)] per token, row-major."""
    t = jnp.arange(hw)
    oh_c = jax.nn.one_hot(t % W, W, dtype=dtype)
    oh_r = jax.nn.one_hot(t // W, H, dtype=dtype)
    return jnp.concatenate([oh_c, oh_r], axis=-1)


def _bwd_bytes_est(hwp, tq, tk, G, dkh, dvh, wh, it, dv1):
    """Estimated backward per-program VMEM residents (the binding
    constraint): G (b,h)'s full-length packed qr (+ dout unless row-layout)
    input, the packed dqr accumulation block, and the s/p/ds tiles. Lanes
    pad to 128 on-chip; 1.5x covers double-buffering/temps (calibrated
    round 2: compiler reported 17.2 MB where the raw estimate gave 10.9)."""
    def lanes(d):
        return _cdiv(d, 128) * 128

    raw = G * hwp * (
        lanes(dkh + wh) * it   # packed [q ; RW ; RH] resident
        + (0 if dv1 else lanes(dvh) * it)  # dout resident (row form if dv1)
        + lanes(dkh + wh) * it  # packed [dq ; dRW ; dRH] accumulator
    ) + 3 * tq * tk * 4      # s / p / ds tiles
    return int(raw * 1.5)


def _geometry(hw: int, bn: int, dkh: int, dvh: int, wh: int, it: int):
    """First VMEM-feasible candidate from the cost-ranked tile list (each
    with the largest group size that fits); if nothing fits even at G=1 the
    best candidate is returned and the forward's budget assert fires with
    the long-sequence message."""
    dv1 = dvh == 1
    first = None
    for tq, tk in _tile_candidates(hw):
        hwp = _pad_len(hw, tq, tk)
        est = lambda g: _bwd_bytes_est(hwp, tq, tk, g, dkh, dvh, wh, it, dv1)
        G = _pick_group(bn, hw, est)
        if first is None:
            first = (tq, tk, hwp, G)
        if est(G) < _VMEM_BUDGET:
            return tq, tk, hwp, G
    return first


ROW_SUB = 8  # sublane stride between row blocks: dynamic sublane indices
# inside the kernel must be STATICALLY provably aligned (Mosaic rejects
# ds(qi, 1) on packed bf16: "cannot prove index is a multiple of 4");
# ds(qi * 8, 1) is provable for every dtype. Costs 8x on tiny arrays —
# still ~16x smaller than the 128x lane padding of a (hw, 1) column.


def _rows(x_flat: jnp.ndarray, hwp: int, tile: int) -> jnp.ndarray:
    """(bn, hw) token vector -> (bn, (hwp//tile)*ROW_SUB, tile) row blocks,
    block i's data on sublane row i*ROW_SUB."""
    bn = x_flat.shape[0]
    n = hwp // tile
    x = _pad_axis(x_flat.reshape(bn, -1), 1, hwp).reshape(bn, n, 1, tile)
    return _pad_axis(x, 2, ROW_SUB).reshape(bn, n * ROW_SUB, tile)


def _unrows(y: jnp.ndarray, hwp: int) -> jnp.ndarray:
    """Inverse of _rows: -> (bn, hwp)."""
    bn, nr, tile = y.shape
    return y.reshape(bn, nr // ROW_SUB, ROW_SUB, tile)[:, :, 0].reshape(bn, hwp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(qr, k, v, H: int, W: int, dkh: int):
    out, _ = _flash_forward(qr, k, v, H, W, dkh)
    return out


def _flash_forward(qr, k, v, H: int, W: int, dkh: int):
    """qr: PRE-PACKED [q ; RW ; RH] of (B, nh, hw, dkh + W + H).

    The pack lives OUTSIDE the custom_vjp (aa_attention_pallas) so XLA
    autodiff owns both directions of it: the backward returns the packed
    [dq ; dRW ; dRH] cotangent the kernel accumulates natively, and XLA
    differentiates the pack (a concat, or the packed_q_relw_bd matmul) into
    slices/matmul-transposes it can lay out freely. Round-5 motivation: with
    the pack/unpack inside the vjp, the fixed slice boundaries forced
    batch-minor<->row-major relayout copies around every call (~13 ms/step
    of 'data formatting' on aadensenet121 — see README)."""
    B, nh, hw, L = qr.shape
    wh = W + H
    assert L == dkh + wh, (L, dkh, W, H)
    dvh = v.shape[-1]
    dv1 = dvh == 1
    bn = B * nh
    it = qr.dtype.itemsize
    tq, tk, hwp, G = _geometry(hw, bn, dkh, dvh, wh, it)
    nq, nk = hwp // tq, hwp // tk
    # VMEM budget check (16 MB scoped/core): _pick_group already shrinks G
    # to fit; geometries that cannot fit even at G=1 must fail HERE with a
    # clear message instead of an opaque scoped-vmem compiler error.
    bwd_bytes = _bwd_bytes_est(hwp, tq, tk, G, dkh, dvh, wh, it, dv1)
    assert bwd_bytes < _VMEM_BUDGET, (
        f"attention backward residents of {bwd_bytes/1e6:.1f} MB per program "
        f"exceed the VMEM budget at HW={hw} (G={G}) — this kernel targets "
        "the AAConv geometries (post-stride HW <= ~2k); stream query blocks "
        "from HBM for longer sequences"
    )

    dt = qr.dtype
    # qr arrives lane-packed [q ; RW ; RH] (see docstring): every stream
    # between XLA and the kernel moves dkh+wh (<=128) real lanes per token
    # instead of separately-128-padded arrays (dkh=20 alone tiles to 128 =
    # 6.4x bytes)
    oh = _pad_axis(_onehot_pos(hw, H, W, dt), 0, hwp)

    def flat(x, d):
        return _pad_axis(x.reshape(bn, hw, d), 1, hwp)

    qrf, kf = flat(qr, dkh + wh), flat(k.astype(dt), dkh)
    if dv1:
        # row-block layout (bn, nk, tk): same linearization as (bn, hw, 1),
        # but the tiled HBM footprint drops ~128x (no 1->128 lane padding)
        vf = _rows(v.reshape(bn, hw), hwp, tk)
        v_spec = pl.BlockSpec((G, nk * ROW_SUB, tk), lambda b, i: (b, 0, 0))
        o_spec = pl.BlockSpec((G, nq * ROW_SUB, tq), lambda b, i: (b, 0, 0))
        o_shape = jax.ShapeDtypeStruct((bn, nq * ROW_SUB, tq), dt)
    else:
        vf = flat(v, dvh)
        v_spec = pl.BlockSpec((G, hwp, dvh), lambda b, i: (b, 0, 0))
        o_spec = pl.BlockSpec((G, tq, dvh), lambda b, i: (b, i, 0))
        o_shape = jax.ShapeDtypeStruct((bn, hwp, dvh), dt)

    grid = (bn // G, nq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw, tq=tq, tk=tk, G=G, dv1=dv1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, tq, dkh + wh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((G, hwp, dkh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((hwp, wh), lambda b, i: (0, 0)),
            v_spec,
        ],
        out_specs=[
            o_spec,
            pl.BlockSpec((G, nq * ROW_SUB, tq), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            o_shape,
            jax.ShapeDtypeStruct((bn, nq * ROW_SUB, tq), jnp.float32),
        ],
        interpret=_interpret(),
    )(qrf, kf, oh, vf)
    if dv1:
        out4 = _unrows(out, hwp)[:, :hw].reshape(B, nh, hw, 1)
    else:
        out4 = out[:, :hw].reshape(B, nh, hw, dvh)
    return out4, (qrf, kf, oh, vf, lse, out)


def _flash_fwd_rule(qr, k, v, H: int, W: int, dkh: int):
    out4, (qrf, kf, oh, vf, lse, outp) = _flash_forward(qr, k, v, H, W, dkh)
    # zero-size dtype/shape witnesses (residuals must be arrays)
    wit = tuple(jnp.zeros((0,) + x.shape, x.dtype) for x in (qr, k, v))
    return out4, (qrf, kf, oh, vf, lse, outp, wit)


def _flash_bwd_rule(H: int, W: int, dkh: int, res, dout):
    qrf, kf, oh, vf, lse, outp, wit = res
    qrw, kw, vw = wit
    qrdt, kdt, vdt = (x.dtype for x in wit)
    B, nh, hw = qrw.shape[1:4]
    dvh = vw.shape[-1]
    dv1 = dvh == 1
    wh = W + H
    bn = B * nh
    tq, tk, hwp, G = _geometry(hw, bn, dkh, dvh, wh, qrf.dtype.itemsize)
    nq, nk = hwp // tq, hwp // tk

    if dv1:
        dof = _rows(dout.reshape(bn, hw), hwp, tq)
        # delta = dout * out elementwise (dvh == 1); outp is already rows
        deltaf = dof.astype(jnp.float32) * outp.astype(jnp.float32)
        do_spec = pl.BlockSpec((G, nq * ROW_SUB, tq), lambda b, j: (b, 0, 0))
        v_spec = pl.BlockSpec((G, nk * ROW_SUB, tk), lambda b, j: (b, 0, 0))
        dv_spec = pl.BlockSpec((G, nk * ROW_SUB, tk), lambda b, j: (b, 0, 0))
        dv_shape = jax.ShapeDtypeStruct((bn, nk * ROW_SUB, tk), vf.dtype)
    else:
        delta = jnp.sum(
            dout.astype(jnp.float32)
            * outp[:, :hw].reshape(B, nh, hw, dvh).astype(jnp.float32),
            axis=-1,
        )
        deltaf = _rows(delta.reshape(bn, hw), hwp, tq)
        dof = _pad_axis(dout.reshape(bn, hw, dvh), 1, hwp)
        do_spec = pl.BlockSpec((G, hwp, dvh), lambda b, j: (b, 0, 0))
        v_spec = pl.BlockSpec((G, tk, dvh), lambda b, j: (b, j, 0))
        dv_spec = pl.BlockSpec((G, tk, dvh), lambda b, j: (b, j, 0))
        dv_shape = jax.ShapeDtypeStruct((bn, hwp, dvh), vf.dtype)

    grid = (bn // G, nk)
    dqr, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, dkh=dkh, hw=hw, hwp=hwp, tq=tq, tk=tk,
                          G=G, dv1=dv1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, tk, dkh), lambda b, j: (b, j, 0)),
            pl.BlockSpec((tk, wh), lambda b, j: (j, 0)),
            v_spec,
            pl.BlockSpec((G, hwp, dkh + wh), lambda b, j: (b, 0, 0)),
            do_spec,
            pl.BlockSpec((G, nq * ROW_SUB, tq), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((G, nq * ROW_SUB, tq), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, hwp, dkh + wh), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((G, tk, dkh), lambda b, j: (b, j, 0)),
            dv_spec,
        ],
        out_shape=[
            # dqr accumulates across <= nk visits in the KERNEL dtype: bf16
            # halves its HBM traffic and kills the XLA-side converts (the
            # accumulation depth is nk <= 4, so the rounding cost is ~1 ulp).
            # dk/dv are written once from f32 VMEM carries: emit kernel dtype
            jax.ShapeDtypeStruct((bn, hwp, dkh + wh), qrf.dtype),
            jax.ShapeDtypeStruct((bn, hwp, dkh), kf.dtype),
            dv_shape,
        ],
        interpret=_interpret(),
    )(kf, oh, vf, qrf, dof, lse, deltaf)

    def unflat(x, d, dt):
        return x[:, :hw].reshape(B, nh, hw, d).astype(dt)

    dv4 = (_unrows(dv, hwp)[:, :hw].reshape(B, nh, hw, 1).astype(vdt) if dv1
           else unflat(dv, dvh, vdt))
    # the packed [dq ; dRW ; dRH] cotangent is returned WHOLE: XLA autodiff
    # of the outside pack (concat slice / packed_q_relw_bd matmul transpose)
    # unpacks it in whatever layout it prefers
    return (unflat(dqr, dkh + wh, qrdt), unflat(dk, dkh, kdt), dv4)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# heads-in-lanes (HIL) kernels
#
# The bn-grid kernels above take HEAD-MAJOR operands (B, nh, hw, dh), which
# forces XLA to materialize head-split transposes of q/k/v around every call
# (and head-merge transposes of out/grads): profiled at 27.8 ms/step — 26.5%
# — of an aaresnet152 train step, all in sub-128-lane relayout copies running
# at ~235 GB/s. The HIL layout keeps everything TOKEN-MAJOR:
#
#   P   (B, hwp, nh*slot) — per-head lane slots [q ; k ; v ; 0-pad] on a
#       64-lane stride, emitted DIRECTLY by the 1x1 qkv conv (the weight's
#       output channels are permuted + zero-padded at apply time, so no
#       data-sized pack op exists anywhere). Round-4 A/B of tight
#       S = 2*dkh+dvh slots measured the kernels 21 ms/step SLOWER at
#       S = 41: every per-head slice straddled 128-lane registers. 64-lane
#       slots make every slot slice half-register aligned (the zoo's S is
#       41-48, so [q;k;v] never crosses the slot's 64 lanes).
#   out (B, hwp, nh*dvh) — lane order (head, dvh) == the channel order
#       out_proj expects: the kernel output reshapes straight into the next
#       1x1 conv.
#
# Grid is (B, nq); the head loop moves INSIDE the kernel (static unroll).
#
# v3 (this revision) moves the remaining data-sized formatting INTO the
# kernel — the round-4 HIL-v2 trace showed the 27.5 ms formatting tax was
# dominated by the rel-logits path (q2d head transposes + the BD einsum's
# layout copies) and the backward dP0 reassembly, neither of which v2
# touched:
#
# 1. Compact rel logits IN-KERNEL. RW[t, m] = q_t . rel_w[:, m - j(t) + W-1]
#    becomes two tiny MXU dots per head with no gathers or shifts:
#        RC_w = ((q_h . T_w) * M_w) . Rbd_w
#    where T_w (dkh, W*dkh) = [I I ... I] replicates q across W lane blocks
#    (the MXU does the broadcast), M_w[t, j*dkh+d] = (j == t mod W) is an
#    iota mask, and Rbd_w[(j, d), m] = rel_w[d, m - j + W - 1] is the tiny
#    block-diagonal operand built OUTSIDE from the (dkh, 2W-1) parameter
#    (differentiable slicing — same identity as ops/attention.py
#    relative_logits_compact_bd, which pays batch-major layout copies of q
#    and the 5-D output when run outside; profiled ~15 ms/step).
# 2. One-hot key selectors generated by iota+compare per chunk instead of
#    streaming a (hwp, W+H) operand from HBM.
# 3. ONE resident backward accumulator dP (hwp, nh*slot): dk/dv accumulate
#    across query programs (as v2), and each program adds its dq tile into
#    its own rows' q-lanes — the cotangent leaves the kernel ALREADY in the
#    conv's packed layout (v2 concatenated dq and dkv outside: the only
#    remaining data-sized op, ~12 ms/step).
# 4. d(Rbd_w)/d(Rbd_h) accumulate in grid-constant residents (zeroed at the
#    first program, summed over B and query blocks by the sequential TPU
#    grid); XLA backpropagates them to the rel embeddings through the
#    block-diagonal construction (param-sized).
# ---------------------------------------------------------------------------



def _hil_slot(dkh: int, dvh: int) -> int:
    """Lane stride of one head's [q ; k ; v ; 0-pad] slot in the packed
    operand. Default: the next multiple of 64 — every slot slice is then
    half-register aligned and never straddles a 128-lane register (tight
    S = 41 slots measured the kernels 21 ms/step slower on aaresnet152).
    CHEXPERT_ATTN_HIL_SLOT=tight|pad128 for layout A/Bs."""
    S = 2 * dkh + dvh
    mode = os.environ.get("CHEXPERT_ATTN_HIL_SLOT")
    if mode == "pad128":
        return _cdiv(S, 128) * 128
    if mode == "tight":
        return S
    return _cdiv(S, 64) * 64


def _hil_vmem_est(hw, hwp, tq, ck, nh, dkh, dvh, wh, it, H=0, W=0):
    """(fwd_bytes, bwd_bytes) estimated per-program VMEM residents for the
    HIL kernels. Lanes pad to 128 in VMEM; 1.5x covers double-buffering and
    temporaries (same calibration as _bwd_bytes_est)."""
    def lanes(d):
        return _cdiv(max(d, 1), 128) * 128

    S = _hil_slot(dkh, dvh)
    kview = hwp * lanes(nh * S) * it          # full-length packed keys
    qview = tq * lanes(nh * S) * it
    # in-kernel rel machinery: Rbd/T residents + the (tq, W*dkh) tile/mask
    # products (bf16 tile + f32 dot output transient per side)
    rel_ops = oh = 0
    if wh:
        rel_ops = (
            W * dkh * lanes(W) * it + H * dkh * lanes(H) * it   # Rbd_w/_h
            + dkh * (lanes(W * dkh) + lanes(H * dkh)) * it      # T_w/T_h
            + tq * max(lanes(W * dkh), lanes(H * dkh)) * (it + 4)
        )
        oh = ck * lanes(wh) * it               # iota-generated per chunk
    lse_blk = nh * ROW_SUB * tq * 4
    out_blk = tq * lanes(nh * dvh) * it
    fwd = kview + qview + rel_ops + oh + out_blk + lse_blk + (
        2 * tq * ck * 4                        # s / p tiles
        + tq * lanes(nh * (dvh + 2)) * 4       # online-softmax carries
    )
    bwd = kview + qview + rel_ops + oh + 2 * lse_blk + out_blk + (
        # (tq, ck) temporaries: s/p/dp/ds plus the exp inputs and masked
        # copies Mosaic keeps live across the unrolled head loop — measured
        # on-chip at HW=1600/ck=800: 7 tile-terms matches the compiler's
        # 17.96M actual (3 terms under-counted it at 14.7M and the kernel
        # blew the 16M scoped-vmem stack)
        7 * tq * ck * 4
        + nh * tq * lanes(dkh + wh) * 4        # [dq;dRW;dRH] f32 scratch
        + hwp * lanes(nh * S) * it             # dP resident accumulator
        + ck * lanes(nh * S) * it              # per-chunk dkv piece
        + ((W * dkh * lanes(W) + H * dkh * lanes(H)) * 4 if wh else 0)
    )
    return int(fwd * 1.5), int(bwd * 1.5)


def _hil_geometry(hw, nh, dkh, dvh, wh, it):
    """Largest VMEM-feasible (tq, ck_fwd, ck_bwd, hwp) for the HIL kernels,
    or None. tq: query rows per program (shared by fwd and bwd — the lse /
    delta row layouts depend on it); ck_*: key-chunk lengths, chosen
    independently (the backward's three f32 tiles + accumulators leave less
    room, and ck == hwp means one single-pass key block with no online
    rescale chain)."""
    override = os.environ.get("CHEXPERT_ATTN_HIL_TILES")
    if override:
        parts = [int(t) for t in override.split(",")]
        tq, ckf, ckb = parts if len(parts) == 3 else (parts[0], parts[1], parts[1])
        hwp = _cdiv(hw, max(tq, ckf, ckb)) * max(tq, ckf, ckb)
        return tq, ckf, ckb, hwp
    if hw <= 256:
        t = _round8(hw)
        return t, t, t, t
    # candidates ordered by (padding waste, then bigger query tiles): the
    # kernel is padding-sensitive (hwp^2 work) and per-program-cost-sensitive
    cands = sorted(
        ((_cdiv(hw, tq) * tq, -tq, tq)
         for tq in (512, 448, 400, 320, 256, 200, 160, 128, 96, 64)),
    )
    for hwp, _, tq in cands:
        ckf = ckb = None
        ck = hwp
        while ck % 8 == 0 and ck >= tq:
            if hwp % ck == 0:
                side = _cdiv(wh, 2)  # budget estimate only: W ~ H ~ wh/2
                f, b = _hil_vmem_est(hw, hwp, tq, ck, nh, dkh, dvh, wh, it,
                                     H=side, W=side)
                if ckf is None and f < _VMEM_BUDGET:
                    ckf = ck
                if ckb is None and b < _VMEM_BUDGET:
                    ckb = ck
                if ckf is not None and ckb is not None:
                    return tq, ckf, ckb, hwp
            ck //= 2
    return None


def _hil_onehot(j0, ck, H, W, dt):
    """[onehot_W(col) ; onehot_H(row)] (ck, W+H) for keys j0..j0+ck, by
    iota+compare — replaces the v2 HBM-streamed (hwp, W+H) operand."""
    ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (ck, 1), 0)
    ohw = (jax.lax.broadcasted_iota(jnp.int32, (ck, W), 1) == ids % W)
    ohh = (jax.lax.broadcasted_iota(jnp.int32, (ck, H), 1) == ids // W)
    return jnp.concatenate([ohw.astype(dt), ohh.astype(dt)], axis=-1)


def _hil_rel_masks(q0, tq, H, W, dkh, dt):
    """(M_w, M_h) block-diagonal selection masks for the in-kernel compact
    rel dots: M_w[t, j*dkh+d] = (j == col(q0+t)), M_h over rows. Pure
    iota/compare — no data movement."""
    rows = q0 + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    jblk = jax.lax.broadcasted_iota(jnp.int32, (tq, W * dkh), 1) // dkh
    iblk = jax.lax.broadcasted_iota(jnp.int32, (tq, H * dkh), 1) // dkh
    return ((jblk == rows % W).astype(dt), (iblk == rows // W).astype(dt))


def _hil_rel_compact(q_h, tw, th, rw, rh, mw, mh, H, W, dt):
    """In-kernel compact rel logits for one head: (tq, W+H) = [RC_w ; RC_h].
    RC_w = ((q.T_w) * M_w) . Rbd_w — the MXU replicates q across W lane
    blocks (T_w = [I..I]), the mask keeps block j(t), and Rbd_w contracts
    the block-diagonal (see module header)."""
    tile_w = _dot_nn(q_h, tw).astype(dt)                 # (tq, W*dkh)
    tile_h = tile_w if (H == W) else _dot_nn(q_h, th).astype(dt)
    rcw = _dot_nn(tile_w * mw, rw).astype(dt)            # (tq, W)
    rch = _dot_nn(tile_h * mh, rh).astype(dt)            # (tq, H)
    return jnp.concatenate([rcw, rch], axis=-1)


def _hil_fwd_kernel(*refs, hw, tq, ck, hwp, nh, dkh, dvh, wh, H, W):
    """Per-program: one query block x all heads. Static head unroll; online
    softmax over statically-unrolled key chunks (ck == hwp for every
    production geometry, so the rescale chain usually degenerates)."""
    if wh:
        p_ref, pk_ref, rw_ref, rh_ref, tw_ref, th_ref, o_ref, lse_ref = refs
    else:
        p_ref, pk_ref, o_ref, lse_ref = refs
    S = _hil_slot(dkh, dvh)
    nk = hwp // ck
    dt = p_ref.dtype
    qi = pl.program_id(1)
    if wh:
        ohs = [_hil_onehot(j * ck, ck, H, W, dt) for j in range(nk)]
        mw, mh = _hil_rel_masks(qi * tq, tq, H, W, dkh, dt)
        rw, rh = rw_ref[...], rh_ref[...]
        tw = tw_ref[...]
        th = tw if (H == W) else th_ref[...]
    outs = []
    for h in range(nh):
        qslot = p_ref[0, :, h * S:(h + 1) * S]          # (tq, S)
        if wh:
            qrh = jnp.concatenate(
                [qslot[:, :dkh],
                 _hil_rel_compact(qslot[:, :dkh], tw, th, rw, rh,
                                  mw, mh, H, W, dt)], axis=-1)
        else:
            qrh = qslot[:, :dkh]

        m = l = acc = None
        for j in range(nk):
            j0 = j * ck
            kslot = pk_ref[0, pl.ds(j0, ck), h * S:(h + 1) * S]  # (ck, S)
            if wh:
                kab = jnp.concatenate(
                    [kslot[:, dkh:2 * dkh], ohs[j]], axis=-1)
            else:
                kab = kslot[:, dkh:2 * dkh]
            s = _dot_nt(qrh, kab)                        # (tq, ck) f32
            if j0 + ck > hw:  # static: only the tail chunk has padded keys
                t_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1)
                s = jnp.where(t_ids < hw, s, NEG_INF)

            bm = s.max(axis=-1, keepdims=True)
            if m is None:
                m = bm
                p = jnp.exp(s - m)
                alpha = None
            else:
                m_new = jnp.maximum(m, bm)
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                m = m_new
            # softmax sum rides the MXU with P.V as one fused dot (the
            # ones column), f32 V-side cast — same offload as _fwd_kernel
            vb = kslot[:, 2 * dkh:2 * dkh + dvh].astype(jnp.float32)
            v1 = jnp.concatenate([vb, jnp.ones((ck, 1), jnp.float32)], axis=-1)
            pvl = _dot_nn(p, v1)                         # (tq, dvh+1)
            pv, bl = pvl[:, :-1], pvl[:, -1:]
            l = bl if l is None else l * alpha + bl
            acc = pv if acc is None else acc * alpha + pv

        outs.append((acc / l).astype(o_ref.dtype))       # (tq, dvh)
        lse_ref[0, pl.ds(h * ROW_SUB, 1), :] = (
            (m + jnp.log(l)).astype(jnp.float32).reshape(1, tq))
    o_ref[0] = jnp.concatenate(outs, axis=-1)            # (tq, nh*dvh)


def _hil_bwd_kernel(*refs, hw, tq, ck, hwp, nh, dkh, dvh, wh, H, W):
    """Per-program: one query block x all heads; fori over key chunks.
    [dq ; dRC_w ; dRC_h] accumulate per head in a 3-D VMEM scratch — head on
    the LEADING dim, so each head's tile is written through the ref as soon
    as it's produced (an end-of-chunk lane concat would keep every head's
    (tq, ck) temporaries live simultaneously, which blows the Mosaic stack
    allocation: measured 20.2M vs the 16M scoped-vmem limit at HW=1600).

    ALL of dP accumulates into ONE resident output in the conv's packed
    slot layout (index map constant in the query coordinate, zeroed at
    qi == 0): dk/dv for every row from each program's ds tiles, dq into the
    program's own rows' q-lanes — no reassembly exists outside. dRbd_w/_h
    accumulate in grid-constant residents (zeroed at the first program)."""
    if wh:
        (p_ref, pk_ref, rw_ref, rh_ref, tw_ref, th_ref, do_ref, lse_ref,
         delta_ref, dP_ref, drw_ref, drh_ref, dqacc_ref) = refs
    else:
        (p_ref, pk_ref, do_ref, lse_ref, delta_ref, dP_ref, dqacc_ref) = refs
    b = pl.program_id(0)
    qi = pl.program_id(1)
    S = _hil_slot(dkh, dvh)
    nk = hwp // ck
    dt = p_ref.dtype

    @pl.when(qi == 0)
    def _():
        dP_ref[...] = jnp.zeros(dP_ref.shape, dP_ref.dtype)

    if wh:
        @pl.when(jnp.logical_and(b == 0, qi == 0))
        def _():
            drw_ref[...] = jnp.zeros(drw_ref.shape, drw_ref.dtype)
            drh_ref[...] = jnp.zeros(drh_ref.shape, drh_ref.dtype)

    # scratch persists across grid steps on the core: zero it every program
    dqacc_ref[...] = jnp.zeros(dqacc_ref.shape, dqacc_ref.dtype)

    if wh:
        mw, mh = _hil_rel_masks(qi * tq, tq, H, W, dkh, dt)
        rw, rh = rw_ref[...], rh_ref[...]
        tw = tw_ref[...]
        th = tw if (H == W) else th_ref[...]

    # per-head chunk-invariant loads, hoisted out of the key sweep
    qrhs, dos, lses, deltas = [], [], [], []
    for h in range(nh):
        qslot = p_ref[0, :, h * S:(h + 1) * S]
        if wh:
            qrhs.append(jnp.concatenate(
                [qslot[:, :dkh],
                 _hil_rel_compact(qslot[:, :dkh], tw, th, rw, rh,
                                  mw, mh, H, W, dt)], axis=-1))
        else:
            qrhs.append(qslot[:, :dkh])
        dos.append(do_ref[0, :, h * dvh:(h + 1) * dvh])   # (tq, dvh)
        lses.append(lse_ref[0, pl.ds(h * ROW_SUB, 1), :].reshape(tq, 1))
        deltas.append(delta_ref[0, pl.ds(h * ROW_SUB, 1), :].reshape(tq, 1))

    zq = jnp.zeros((ck, dkh), dt)
    zpad = jnp.zeros((ck, S - 2 * dkh - dvh), dt) if S > 2 * dkh + dvh else None

    def chunk(j, carry):
        j0 = j * ck
        if wh:
            ohj = _hil_onehot(j0, ck, H, W, dt)  # traced j0: iota+compare
        dkv_pieces = []
        for h in range(nh):
            kslot = pk_ref[0, pl.ds(j0, ck), h * S:(h + 1) * S]
            if wh:
                kab = jnp.concatenate([kslot[:, dkh:2 * dkh], ohj], axis=-1)
            else:
                kab = kslot[:, dkh:2 * dkh]
            s = _dot_nt(qrhs[h], kab)                     # (tq, ck)
            if hwp > hw:  # static: pay the mask only on padded geometries
                t_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1)
                s = jnp.where(t_ids < hw, s, NEG_INF)
            p = jnp.exp(s - lses[h])

            do_h = dos[h]
            dv_h = jax.lax.dot_general(                   # (ck, dvh) f32
                p, do_h.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = _dot_nt(do_h, kslot[:, 2 * dkh:2 * dkh + dvh])  # (tq, ck)
            ds = (p * (dp - deltas[h])).astype(dt)
            dk_h = jax.lax.dot_general(                   # (ck, dkh) f32
                ds, qrhs[h][:, :dkh], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # the head's slot piece in the conv layout: [0_q ; dk ; dv ; 0]
            parts = [zq, dk_h.astype(dt), dv_h.astype(dt)]
            if zpad is not None:
                parts.append(zpad)
            dkv_pieces.append(jnp.concatenate(parts, axis=-1))
            # the scratch store ends this head's (tq, ck) tile liveness;
            # without it every head's s/p/ds stay live to an end-of-chunk
            # concat and the Mosaic stack blows past the scoped-vmem limit
            dqacc_ref[h] += _dot_nn(ds, kab)              # (tq, dkh+wh) f32
        # one full-lane read-modify-write per chunk (a per-head sub-tile
        # lane RMW would pay nh masked passes over the resident rows)
        dP_ref[0, pl.ds(j0, ck), :] += jnp.concatenate(dkv_pieces, axis=-1)
        return carry

    jax.lax.fori_loop(0, nk, chunk, 0)

    dq_pieces = []
    zqt = jnp.zeros((tq, S - dkh), dt)
    for h in range(nh):
        dacc = dqacc_ref[h]                               # (tq, dkh+wh) f32
        dq_h = dacc[:, :dkh]
        if wh:
            q_h = p_ref[0, :, h * S:h * S + dkh]
            dcw = dacc[:, dkh:dkh + W].astype(dt)         # (tq, W)
            dch = dacc[:, dkh + W:dkh + wh].astype(dt)    # (tq, H)
            tile_w = _dot_nn(q_h, tw).astype(dt)
            tile_h = tile_w if (H == W) else _dot_nn(q_h, th).astype(dt)
            # dRbd accumulation: ((q.T)*M)^T . dRC, summed over the grid
            drw_ref[...] += jax.lax.dot_general(
                tile_w * mw, dcw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            drh_ref[...] += jax.lax.dot_general(
                tile_h * mh, dch, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # rel contribution to dq: ((dRC . Rbd^T) * M) . T^T
            gw = (_dot_nt(dcw, rw).astype(dt) * mw)       # (tq, W*dkh)
            gh = (_dot_nt(dch, rh).astype(dt) * mh)       # (tq, H*dkh)
            dq_h = dq_h + _dot_nt(gw, tw) + _dot_nt(gh, th)
        dq_pieces.append(jnp.concatenate(
            [dq_h.astype(dt), zqt], axis=-1))             # (tq, S)
    # add this program's dq into its own rows of the shared dP resident
    dP_ref[0, pl.ds(qi * tq, tq), :] += jnp.concatenate(dq_pieces, axis=-1)


def _hil_tiled_eye(dkh: int, n: int, dt) -> jnp.ndarray:
    """T (dkh, n*dkh) = [I I ... I]: q . T replicates q across n lane
    blocks on the MXU (a jnp.tile of the data tile would be a lane
    relayout; this is one dot on otherwise-idle MXU)."""
    return jnp.tile(jnp.eye(dkh, dtype=dt), (1, n))


def _hil_flash_spec(P0, Rw, Rh, H, W, dkh, dvh):
    """Shared geometry/layout derivation for fwd and bwd."""
    B, hw, nhS = P0.shape
    S = _hil_slot(dkh, dvh)
    nh = nhS // S
    wh = (W + H) if Rw is not None else 0
    geo = _hil_geometry(hw, nh, dkh, dvh, wh, P0.dtype.itemsize)
    assert geo is not None, (
        f"no VMEM-feasible HIL geometry at HW={hw}, nh={nh} — "
        "use the bn-layout kernel (aa_attention_pallas)"
    )
    return B, hw, nh, S, wh, geo


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _hil_flash(P0, Rw, Rh, H: int, W: int, dkh: int, dvh: int):
    out, _ = _hil_forward(P0, Rw, Rh, H, W, dkh, dvh)
    return out


def _hil_forward(P0, Rw, Rh, H: int, W: int, dkh: int, dvh: int):
    """P0: (B, hw, nh*slot) — the qkv projection's output with channels
    ALREADY in slot-packed per-head [q_h ; k_h ; v_h ; 0-pad] order and q
    pre-scaled (models.attn._PackedQKVConv permutes + zero-pads the conv
    WEIGHT's output channels, so no data-sized pack op exists anywhere).
    Rw (W*dkh, W) / Rh (H*dkh, H): block-diagonal rel operands from
    _hil_rel_operands (None for non-relative attention)."""
    B, hw, nh, S, wh, geo = _hil_flash_spec(P0, Rw, Rh, H, W, dkh, dvh)
    tq, ck, _, hwp = geo
    nq = hwp // tq
    dt = P0.dtype

    Pf = _pad_axis(P0, 1, hwp)
    args = [Pf, Pf]
    in_specs = [
        pl.BlockSpec((1, tq, nh * S), lambda b, i: (b, i, 0)),   # query view
        pl.BlockSpec((1, hwp, nh * S), lambda b, i: (b, 0, 0)),  # key view
    ]
    if wh:
        tw = _hil_tiled_eye(dkh, W, dt)
        th = _hil_tiled_eye(dkh, H, dt)
        args += [Rw.astype(dt), Rh.astype(dt), tw, th]
        in_specs += [
            pl.BlockSpec((W * dkh, W), lambda b, i: (0, 0)),
            pl.BlockSpec((H * dkh, H), lambda b, i: (0, 0)),
            pl.BlockSpec((dkh, W * dkh), lambda b, i: (0, 0)),
            pl.BlockSpec((dkh, H * dkh), lambda b, i: (0, 0)),
        ]

    out, lse = pl.pallas_call(
        functools.partial(_hil_fwd_kernel, hw=hw, tq=tq, ck=ck, hwp=hwp,
                          nh=nh, dkh=dkh, dvh=dvh, wh=wh, H=H, W=W),
        grid=(B, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tq, nh * dvh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, nh * ROW_SUB, tq), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, hwp, nh * dvh), dt),
            jax.ShapeDtypeStruct((B, nq * nh * ROW_SUB, tq), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    # out stays (B, hwp, nh*dvh): its :hw slice reshapes straight into
    # out_proj's expected (B, H, W, dv) channel order
    return out[:, :hw], (Pf, lse, out)


def _hil_fwd_rule(P0, Rw, Rh, H: int, W: int, dkh: int, dvh: int):
    out2, (Pf, lse, outp) = _hil_forward(P0, Rw, Rh, H, W, dkh, dvh)
    wit = (jnp.zeros((0,) + P0.shape, P0.dtype),)
    return out2, (Pf, Rw, Rh, lse, outp, wit)


def _hil_bwd_rule(H: int, W: int, dkh: int, dvh: int, res, dout):
    Pf, Rw, Rh, lse, outp, wit = res
    B, hw, nhS = wit[0].shape[1:]
    S = _hil_slot(dkh, dvh)
    nh = nhS // S
    wh = (W + H) if Rw is not None else 0
    tq, _, ck, hwp = _hil_geometry(hw, nh, dkh, dvh, wh, Pf.dtype.itemsize)
    nq = hwp // tq
    dt = Pf.dtype

    # delta = sum_dvh(dout * out) per (token, head), in the lse row layout
    delta = jnp.sum(
        dout.astype(jnp.float32).reshape(B, hw, nh, dvh)
        * outp[:, :hw].reshape(B, hw, nh, dvh).astype(jnp.float32), axis=-1)

    def rows_bhn(x):   # (B, hw, nh) f32 -> (B, nq*nh*ROW_SUB, tq)
        x = _pad_axis(x, 1, hwp).reshape(B, nq, tq, nh).transpose(0, 1, 3, 2)
        x = x[:, :, :, None, :]                    # (B, nq, nh, 1, tq)
        x = _pad_axis(x, 3, ROW_SUB)
        return x.reshape(B, nq * nh * ROW_SUB, tq)

    deltaf = rows_bhn(delta)
    dof = _pad_axis(dout.astype(dt).reshape(B, hw, nh * dvh), 1, hwp)

    row_spec = pl.BlockSpec((1, nh * ROW_SUB, tq), lambda b, i: (b, i, 0))
    args = [Pf, Pf]
    in_specs = [
        pl.BlockSpec((1, tq, nh * S), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, hwp, nh * S), lambda b, i: (b, 0, 0)),
    ]
    if wh:
        args += [Rw.astype(dt), Rh.astype(dt),
                 _hil_tiled_eye(dkh, W, dt), _hil_tiled_eye(dkh, H, dt)]
        in_specs += [
            pl.BlockSpec((W * dkh, W), lambda b, i: (0, 0)),
            pl.BlockSpec((H * dkh, H), lambda b, i: (0, 0)),
            pl.BlockSpec((dkh, W * dkh), lambda b, i: (0, 0)),
            pl.BlockSpec((dkh, H * dkh), lambda b, i: (0, 0)),
        ]
    args += [dof, lse, deltaf]
    in_specs += [
        pl.BlockSpec((1, tq, nh * dvh), lambda b, i: (b, i, 0)),
        row_spec, row_spec,
    ]

    # ONE dP accumulator in the conv's packed slot layout (constant in i:
    # VMEM-resident across the query sweep, zeroed at i == 0); dRbd_w/_h
    # accumulate across the WHOLE grid (constant index maps, zeroed at the
    # first program — the TPU grid is sequential)
    out_specs = [pl.BlockSpec((1, hwp, nh * S), lambda b, i: (b, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, hwp, nh * S), dt)]
    if wh:
        out_specs += [
            pl.BlockSpec((W * dkh, W), lambda b, i: (0, 0)),
            pl.BlockSpec((H * dkh, H), lambda b, i: (0, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((W * dkh, W), jnp.float32),
            jax.ShapeDtypeStruct((H * dkh, H), jnp.float32),
        ]

    from jax.experimental.pallas import tpu as pltpu

    results = pl.pallas_call(
        functools.partial(_hil_bwd_kernel, hw=hw, tq=tq, ck=ck, hwp=hwp,
                          nh=nh, dkh=dkh, dvh=dvh, wh=wh, H=H, W=W),
        grid=(B, nq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nh, tq, dkh + wh), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    if wh:
        dP, drw, drh = results
        return (dP[:, :hw].astype(wit[0].dtype),
                drw.astype(Rw.dtype), drh.astype(Rh.dtype))
    (dP,) = results
    return dP[:, :hw].astype(wit[0].dtype), None, None


_hil_flash.defvjp(_hil_fwd_rule, _hil_bwd_rule)


def hil_supported(hw: int, nh: int, dkh: int, dvh: int, wh: int,
                  itemsize: int = 2) -> bool:
    """Whether the HIL kernels have a VMEM-feasible geometry for this
    AAConv shape (every production geometry in the model zoo qualifies)."""
    return _hil_geometry(hw, nh, dkh, dvh, wh, itemsize) is not None


def _hil_rel_operand(rel: jnp.ndarray, n: int) -> jnp.ndarray:
    """Block-diagonal operand for the in-kernel compact rel dots.

    Rbd[(j, d), m] = rel[d, m - j + n - 1] — block j is the (dkh, n) window
    of the (dkh, 2n-1) embedding centered for query column/row j (same
    identity as ops/attention.py relative_logits_compact:68-73, which pays
    batch-major layout copies of q and the 5-D output when contracted
    outside the kernel). Built by n static slices of the tiny parameter, so
    it is differentiable: XLA transposes it to a scatter-add back onto the
    embedding — param-sized, never data-sized."""
    d, _ = rel.shape
    blocks = [rel[:, n - 1 - j:2 * n - 1 - j] for j in range(n)]
    return jnp.stack(blocks, axis=0).reshape(n * d, n)


def aa_attention_hil_packed(
    P0: jnp.ndarray,
    rel_w: Optional[jnp.ndarray],
    rel_h: Optional[jnp.ndarray],
    H: int,
    W: int,
    dkh: int,
    dvh: int,
) -> jnp.ndarray:
    """Zero-copy fused attention over the PACKED qkv projection output.

    P0: (B, HW, nh*slot) with slot = _hil_slot(dkh, dvh), channels in
    per-head [q_h; k_h; v_h; 0-pad] order with q pre-scaled by dkh**-0.5 —
    exactly what models.attn._PackedQKVConv emits (it permutes + zero-pads
    the conv weight's output channels, so building P0 costs nothing).
    rel_w (dkh, 2W-1) / rel_h (dkh, 2H-1) are the raw embeddings: the only
    host-side rel work is the param-sized block-diagonal operand build.
    Returns (B, HW, nh*dvh) whose reshape is out_proj's expected
    (B, H, W, dv).
    """
    B, hw, nhS = P0.shape
    S = _hil_slot(dkh, dvh)
    nh = nhS // S
    assert hw == H * W and nh * S == nhS, (P0.shape, H, W, S)
    if rel_w is None:
        Rw = Rh = None
    else:
        Rw = _hil_rel_operand(rel_w, W)
        Rh = _hil_rel_operand(rel_h, H)

    from chexpert_tpu.parallel.context import active_mesh

    mesh = active_mesh()
    if (mesh is not None and mesh.shape.get("data", 1) > 1
            and B % mesh.shape["data"] == 0):
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        batched = P("data")
        if Rw is None:
            fn = shard_map(
                lambda p_: _hil_flash(p_, None, None, H, W, dkh, dvh),
                mesh=mesh, in_specs=(batched,), out_specs=batched,
                check_rep=False,
            )
            return fn(P0)
        fn = shard_map(
            lambda p_, rw_, rh_: _hil_flash(p_, rw_, rh_, H, W, dkh, dvh),
            mesh=mesh, in_specs=(batched, P(), P()), out_specs=batched,
            check_rep=False,
        )
        return fn(P0, Rw, Rh)
    return _hil_flash(P0, Rw, Rh, H, W, dkh, dvh)


def aa_attention_hil(
    q5: jnp.ndarray,
    k5: jnp.ndarray,
    v5: jnp.ndarray,
    rel_w: Optional[jnp.ndarray],
    rel_h: Optional[jnp.ndarray],
    H: int,
    W: int,
) -> jnp.ndarray:
    """Token-major fused attention over separate q5/k5 (B, HW, nh, dkh) and
    v5 (B, HW, nh, dvh) operands (q5 pre-scaled by dkh**-0.5): packs them
    into the 0-padded slot layout and defers to aa_attention_hil_packed.
    The model path avoids even the pack copy by emitting packed channels
    from the projection itself — this entry is the test/generic surface.
    Returns (B, HW, nh, dvh)."""
    B, hw, nh, dkh = q5.shape
    dvh = v5.shape[-1]
    dt = q5.dtype
    S = _hil_slot(dkh, dvh)
    P5 = jnp.concatenate([q5, k5.astype(dt), v5.astype(dt)], axis=-1)
    P5 = _pad_axis(P5, 3, S)                      # per-head slot 0-pad
    out = aa_attention_hil_packed(
        P5.reshape(B, hw, nh * S), rel_w, rel_h, H, W, dkh, dvh)
    return out.reshape(B, hw, nh, dvh)


def aa_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_w: Optional[jnp.ndarray],
    rel_h: Optional[jnp.ndarray],
    H: int,
    W: int,
    rel_impl: str = "fusedpack",
) -> jnp.ndarray:
    """Fused attention; same contract as aa_attention_einsum minus weights.

    q pre-scaled by dkh**-0.5. The compact rel logits are computed in XLA
    (differentiable — rel-embedding grads and the rel contribution to dq
    flow through relative_logits_compact automatically).
    """
    B, nh, hw, dkh = q.shape
    assert hw == H * W, (hw, H, W)
    if rel_w is not None:
        # compact rel logits in the kernel dtype: the fused s-dot consumes
        # them as bf16 lanes with f32 MXU accumulation anyway, and f32 here
        # costs an extra convert + double-width layout copies per block.
        # rel_impl (A/B'd on-chip, round 5; env CHEXPERT_REL_IMPL overrides):
        #   'fusedpack' — [q ; RW] from ONE block-diagonal matmul. Wins on
        #       the BANDWIDTH-bound aadensenet121 (770 vs 761 img/s @128):
        #       the q/RW bytes are written by the dot instead of the BD
        #       einsum's batch-minor 5-D output copies.
        #   'bd' — separate RW/RH (relative_logits_compact_bd). Wins on the
        #       COMPUTE-bound aaresnet152 (149.3 vs 144.8 img/s @16): the
        #       fusedpack identity block adds ~9%% train FLOPs (185.5 vs
        #       170.1 GF/img) that serialize behind a busy MXU.
        # The registry maps each arch's 'pallas' to its measured winner.
        impl = os.environ.get("CHEXPERT_REL_IMPL", rel_impl)
        if impl == "fusedpack":
            qrw = packed_q_relw_bd(q, rel_w.astype(q.dtype), H, W)
            rh = rel_h_compact(
                q.reshape(B, nh, H, W, dkh), rel_h.astype(q.dtype))
            qr = jnp.concatenate([qrw, rh.astype(q.dtype)], axis=-1)
        elif impl == "fusedpack5d":
            # concat in the 5-D (B, nh, H, W, lanes) domain where BOTH
            # operands are layout-natural — qrw as a free reshape of the
            # pack dot's (B, nh, H, W*(dkh+W)) output, rh as the height
            # einsum's raw 5-D output — leaving ONE final relayout into the
            # kernel's (bn, hw, lanes) form instead of the copy + transposing
            # reshape + concat chain (r5 trace: those three materialize
            # separately because each flat sub-128-lane intermediate is
            # physically 128-lane tile-padded)
            qrw = packed_q_relw_bd(q, rel_w.astype(q.dtype), H, W)
            q2d = q.reshape(B, nh, H, W, dkh)
            ih = jnp.arange(H)
            if os.environ.get("CHEXPERT_REL_H") == "mmskew":
                # honor the height-side A/B lever here too (it lives in
                # rel_h_compact for the flat path; silently ignoring it
                # would record an A/B of two identical graphs)
                u = jnp.einsum("bnhwd,dr->bnhwr", q2d, rel_h.astype(q.dtype))
                idx = ih[None, :] - ih[:, None] + H - 1
                rh5 = jnp.take_along_axis(
                    u, idx[None, None, :, None, :], axis=-1)
            else:
                rel_h_abs = rel_h.astype(q.dtype)[
                    :, ih[None, :] - ih[:, None] + H - 1]
                rh5 = jnp.einsum("bnhwd,dhm->bnhwm", q2d, rel_h_abs)
            qr = jnp.concatenate(
                [qrw.reshape(B, nh, H, W, dkh + W), rh5.astype(q.dtype)], axis=-1
            ).reshape(B, nh, hw, dkh + W + H)
        else:
            q2d = q.reshape(B, nh, H, W, dkh)
            rel_fn = (relative_logits_compact if impl == "einsum"
                      else relative_logits_compact_bd)
            rw, rh = rel_fn(q2d, rel_w.astype(q.dtype), rel_h.astype(q.dtype))
            qr = jnp.concatenate(
                [q, rw.astype(q.dtype), rh.astype(q.dtype)], axis=-1)
    else:
        qr = jnp.concatenate(
            [q, jnp.zeros((B, nh, hw, W + H), q.dtype)], axis=-1)

    # pallas_call is opaque to GSPMD (operands would be all-gathered under a
    # sharded jit); on a multi-chip mesh, shard-map the kernel over the data
    # axis — attention is batch-parallel, so each chip runs its shard locally
    from chexpert_tpu.parallel.context import active_mesh

    mesh = active_mesh()
    if mesh is not None and mesh.shape.get("data", 1) > 1 and B % mesh.shape["data"] == 0:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        batched = P("data")
        fn = shard_map(
            lambda qr_, k_, v_: _flash_attention(qr_, k_, v_, H, W, dkh),
            mesh=mesh,
            in_specs=(batched, batched, batched),
            out_specs=batched,
            check_rep=False,
        )
        return fn(qr, k, v)
    return _flash_attention(qr, k, v, H, W, dkh)
