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

2. MXU packing: the systolic array contracts over 128 lanes regardless, so a
   q.k matmul with dkh~20 wastes 5/6 of the pass. We fold the relative
   logits INTO that same pass by augmenting:
       Q'_i = [q_i ; RW_i ; RH_i]            (dkh + W + H lanes)
       K'_j = [k_j ; onehot_W(cj) ; onehot_H(rj)]
   giving S = Q' K'^T in ONE matmul (contraction dkh+W+H <= 128 for every
   layer geometry in this framework) — q.k, width-rel and height-rel logits
   land fused, with zero extra MXU passes and no gathers.

The backward recomputes S blockwise (flash backward). dS @ K' yields
[dq ; dRW ; dRH] in one pass; XLA then backpropagates dRW/dRH through the
compact einsum to the rel embeddings (and the rel contribution to dq)
automatically via the custom_vjp composition in aa_attention_pallas.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from chexpert_tpu.ops.attention import relative_logits_compact

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


def _pick_tiles(hw: int) -> Tuple[int, int]:
    """(tq, tk) with tk a multiple of tq so one padded length serves both
    grids. Bigger tiles amortize per-tile overhead (measured 2x on v5e going
    128->256/512); candidates trade tile size against padding waste."""
    if hw <= 256:
        t = _round8(max(8, hw))
        return t, t
    best, best_cost = None, None
    for tq in range(64, 401, 8):
        for m in range(1, 801 // tq + 1):
            tk = tq * m
            hwp = _cdiv(hw, tk) * tk
            # cost model: logits work scales ~ hwp^2; small tiles pay
            # per-tile overhead (measured sweep on v5e favored (400, 800)
            # at HW=1600; ~15% penalty per halving below that)
            overhead = (400 / tq) * (800 / tk)
            cost = (hwp * hwp) * (1.0 + 0.15 * (overhead - 1.0))
            if best_cost is None or cost < best_cost:
                best, best_cost = (tq, tk), cost
    return best


def _pad_len(hw: int, tq: int, tk: int) -> int:
    return _cdiv(hw, tk) * tk if tk % tq == 0 else _cdiv(hw, tq * tk) * tq * tk


def _interpret() -> bool:
    """Pallas interpreter mode off-TPU (CPU tests / virtual meshes)."""
    return jax.devices()[0].platform == "cpu"


# ---------------------------------------------------------------------------
# kernels (operands are packed: qa = [q;RW;RH], ka = [k;ohW;ohH])
# ---------------------------------------------------------------------------

def _fwd_kernel(qa_ref, ka_ref, v_ref, o_ref, lse_ref, *, hw: int, tq: int, tk: int):
    qa = qa_ref[0]                            # (tq, daug), native dtype
    nk = _cdiv(hw, tk)

    def body(j, carry):
        m, l, acc = carry
        j0 = j * tk
        ka = ka_ref[0, pl.ds(j0, tk), :]                       # (tk, daug)
        v_blk = v_ref[0, pl.ds(j0, tk), :]

        s = jax.lax.dot_general(
            qa, ka, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (tq, tk) — q.k + rel_w + rel_h in one MXU pass
        t_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
        s = jnp.where(t_ids < hw, s, NEG_INF)

        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, v_ref.shape[-1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))

    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l)).astype(jnp.float32)


def _recompute_p(qa, ka, lse, j0, *, hw, tk):
    s = jax.lax.dot_general(
        qa, ka, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    t_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, tk), 1)
    s = jnp.where(t_ids < hw, s, NEG_INF)
    return jnp.exp(s - lse)


def _bwd_kernel(ka_ref, v_ref, qa_ref, do_ref, lse_ref, delta_ref,
                dqa_ref, dk_ref, dv_ref, *, hw: int, dkh: int, tq: int, tk: int):
    """Fused backward: one S-recompute serves dq, dk, dv, dRW, dRH.

    Grid (bn, nk): program ki owns key block ki (writes dk/dv) and loops over
    query blocks, ACCUMULATING dQaug into an output block whose index map is
    constant in ki — the TPU grid runs sequentially, so the block stays
    resident in VMEM across the ki sweep (zeroed at ki == 0, flushed when the
    bn coordinate advances)."""
    ki = pl.program_id(1)
    j0 = ki * tk

    @pl.when(ki == 0)
    def _():
        dqa_ref[0] = jnp.zeros_like(dqa_ref[0])

    ka = ka_ref[0]       # (tk, daug)
    v_blk = v_ref[0]     # (tk, dvh)
    dvh = v_blk.shape[-1]
    nq = _cdiv(hw, tq)

    def body(i, carry):
        dk, dv = carry
        i0 = i * tq
        qa = qa_ref[0, pl.ds(i0, tq), :]
        do = do_ref[0, pl.ds(i0, tq), :]
        lse = lse_ref[0, pl.ds(i0, tq), :]
        delta = delta_ref[0, pl.ds(i0, tq), :]
        p = _recompute_p(qa, ka, lse, j0, hw=hw, tk=tk)
        dv = dv + jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(qa.dtype)
        # dk = dS^T q — only the first dkh lanes of Q' are the real queries
        dk = dk + jax.lax.dot_general(ds, qa[:, :dkh], (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        # dQaug accumulation: [dq ; dRW ; dRH] in one pass
        dqa_ref[0, pl.ds(i0, tq), :] += jax.lax.dot_general(
            ds, ka, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk0 = jnp.zeros((tk, dkh), jnp.float32)
    dv0 = jnp.zeros((tk, dvh), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _onehot_pos(hw: int, H: int, W: int, dtype) -> jnp.ndarray:
    """(HW, W+H): [onehot_W(col) ; onehot_H(row)] per token, row-major."""
    t = jnp.arange(hw)
    oh_c = jax.nn.one_hot(t % W, W, dtype=dtype)
    oh_r = jax.nn.one_hot(t // W, H, dtype=dtype)
    return jnp.concatenate([oh_c, oh_r], axis=-1)


def _pack(q, k, rw, rh, H: int, W: int):
    """Build Q' = [q;RW;RH], K' = [k;ohW;ohH] of (B, nh, HW, daug).

    Packed operands stay in the input dtype (bf16 in training): the MXU
    accumulates in f32 either way, matching the einsum path's numerics while
    halving HBM traffic vs f32 operands.
    """
    B, nh, hw, dkh = q.shape
    dt = q.dtype
    qa = jnp.concatenate([q, rw.astype(dt), rh.astype(dt)], axis=-1)
    oh = _onehot_pos(hw, H, W, dt)
    ka = jnp.concatenate(
        [k, jnp.broadcast_to(oh, (B, nh, hw, W + H)).astype(dt)], axis=-1
    )
    return qa, ka


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention(q, k, v, rw, rh, H: int, W: int):
    out, _ = _flash_forward(q, k, v, rw, rh, H, W)
    return out


def _flash_forward(q, k, v, rw, rh, H: int, W: int):
    B, nh, hw, dkh = q.shape
    dvh = v.shape[-1]
    daug = dkh + W + H
    tq, tk = _pick_tiles(hw)
    hwp = _pad_len(hw, tq, tk)
    bn = B * nh
    # each program keeps one (b, h)'s full K'/V resident in VMEM (~16 MB/core)
    kv_bytes = hwp * (daug + dvh) * q.dtype.itemsize
    assert kv_bytes < 12 * 1024 * 1024, (
        f"attention K'/V of {kv_bytes/1e6:.1f} MB per (batch, head) exceeds the "
        f"VMEM budget at HW={hw} — this kernel targets the AAConv geometries "
        "(HW <= ~40k); stream K blocks from HBM for longer sequences"
    )

    qa, ka = _pack(q, k, rw, rh, H, W)

    def flat(x, d):
        return _pad_axis(x.reshape(bn, hw, d), 1, hwp)

    qaf, kaf, vf = flat(qa, daug), flat(ka, daug), flat(v, dvh)

    grid = (bn, hwp // tq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw, tq=tq, tk=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, daug), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, hwp, daug), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, hwp, dvh), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, dvh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bn, hwp, dvh), q.dtype),
            jax.ShapeDtypeStruct((bn, hwp, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qaf, kaf, vf)
    return out[:, :hw].reshape(B, nh, hw, dvh), (qaf, kaf, vf, lse)


def _flash_fwd_rule(q, k, v, rw, rh, H: int, W: int):
    out, (qaf, kaf, vf, lse) = _flash_forward(q, k, v, rw, rh, H, W)
    # zero-size dtype/shape witnesses (residuals must be arrays)
    wit = tuple(jnp.zeros((0,) + x.shape, x.dtype) for x in (q, k, v, rw, rh))
    return out, (qaf, kaf, vf, lse, out, wit)


def _flash_bwd_rule(H: int, W: int, res, dout):
    qaf, kaf, vf, lse, out, wit = res
    qw, kw, vw, rww, rhw = wit
    qdt, kdt, vdt, rwdt, rhdt = (x.dtype for x in wit)
    B, nh, hw, dkh = qw.shape[1:]
    dvh = vf.shape[-1]
    daug = dkh + W + H
    tq, tk = _pick_tiles(hw)
    hwp = _pad_len(hw, tq, tk)
    bn = B * nh

    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dof = _pad_axis(dout.reshape(bn, hw, dvh), 1, hwp)
    deltaf = _pad_axis(delta.reshape(bn, hw, 1), 1, hwp)

    grid = (bn, hwp // tk)
    dqa, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, hw=hw, dkh=dkh, tq=tq, tk=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tk, daug), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, tk, dvh), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, hwp, daug), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, hwp, dvh), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, hwp, 1), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, hwp, 1), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hwp, daug), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, tk, dkh), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, tk, dvh), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bn, hwp, daug), jnp.float32),
            jax.ShapeDtypeStruct((bn, hwp, dkh), jnp.float32),
            jax.ShapeDtypeStruct((bn, hwp, dvh), jnp.float32),
        ],
        interpret=_interpret(),
    )(kaf, vf, qaf, dof, lse, deltaf)

    def unflat(x, d, dt):
        return x[:, :hw].reshape(B, nh, hw, d).astype(dt)

    dq = unflat(dqa[..., :dkh], dkh, qdt)
    drw = unflat(dqa[..., dkh : dkh + W], W, rwdt)
    drh = unflat(dqa[..., dkh + W :], H, rhdt)
    return dq, unflat(dk, dkh, kdt), unflat(dv, dvh, vdt), drw, drh


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def aa_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_w: Optional[jnp.ndarray],
    rel_h: Optional[jnp.ndarray],
    H: int,
    W: int,
) -> jnp.ndarray:
    """Fused attention; same contract as aa_attention_einsum minus weights.

    q pre-scaled by dkh**-0.5. The compact rel logits are computed in XLA
    (differentiable — rel-embedding grads and the rel contribution to dq
    flow through relative_logits_compact automatically).
    """
    B, nh, hw, dkh = q.shape
    assert hw == H * W, (hw, H, W)
    if rel_w is not None:
        q2d = q.reshape(B, nh, H, W, dkh)
        rw, rh = relative_logits_compact(
            q2d.astype(jnp.float32), rel_w.astype(jnp.float32), rel_h.astype(jnp.float32)
        )
    else:
        rw = jnp.zeros((B, nh, hw, W), jnp.float32)
        rh = jnp.zeros((B, nh, hw, H), jnp.float32)

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
            lambda q_, k_, v_, rw_, rh_: _flash_attention(q_, k_, v_, rw_, rh_, H, W),
            mesh=mesh,
            in_specs=(batched, batched, batched, batched, batched),
            out_specs=batched,
            check_rep=False,
        )
        return fn(q, k, v, rw, rh)
    return _flash_attention(q, k, v, rw, rh, H, W)
