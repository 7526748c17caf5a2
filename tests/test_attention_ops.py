"""Numerical parity of the attention ops vs the reference math
(independent brute-force ground truth; reference behavior cited from
/root/reference/models/attn_aug_conv.py:43-97)."""

import jax.numpy as jnp
import numpy as np
import pytest

from chexpert_tpu.ops.attention import (
    aa_attention_einsum,
    rel_to_abs,
    relative_logits,
    relative_logits_compact,
)
from chexpert_tpu.ops.pallas_attention import aa_attention_pallas


def brute_force_rel(q, rel_w, rel_h):
    """rel[i,j] = q_i . rel_w[cj-ci+W-1] + q_i . rel_h[rj-ri+H-1]."""
    B, nh, H, W, dkh = q.shape
    out = np.zeros((B, nh, H * W, H * W), np.float32)
    for b in range(B):
        for n in range(nh):
            for ri in range(H):
                for ci in range(W):
                    for rj in range(H):
                        for cj in range(W):
                            i, j = ri * W + ci, rj * W + cj
                            out[b, n, i, j] = q[b, n, ri, ci] @ rel_w[:, cj - ci + W - 1] + q[
                                b, n, ri, ci
                            ] @ rel_h[:, rj - ri + H - 1]
    return out


def brute_force_attention(q, k, v, rel_w, rel_h, H, W):
    B, nh, hw, dkh = q.shape
    logits = np.einsum("bnid,bnjd->bnij", q, k)
    if rel_w is not None:
        logits = logits + brute_force_rel(q.reshape(B, nh, H, W, dkh), rel_w, rel_h)
    logits = logits - logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w /= w.sum(-1, keepdims=True)
    return np.einsum("bnij,bnjd->bnid", w, v), w


def test_rel_to_abs():
    rng = np.random.RandomState(1)
    L = 6
    x = rng.randn(2, 3, L, 2 * L - 1).astype(np.float32)
    out = np.asarray(rel_to_abs(jnp.array(x)))
    for i in range(L):
        for j in range(L):
            np.testing.assert_allclose(out[..., i, j], x[..., i, j - i + L - 1])


def test_relative_logits_full():
    rng = np.random.RandomState(0)
    B, nh, H, W, dkh = 2, 2, 3, 4, 5
    q = rng.randn(B, nh, H, W, dkh).astype(np.float32)
    rel_w = rng.randn(dkh, 2 * W - 1).astype(np.float32)
    rel_h = rng.randn(dkh, 2 * H - 1).astype(np.float32)
    ours = np.asarray(relative_logits(jnp.array(q), jnp.array(rel_w), jnp.array(rel_h)))
    gt = brute_force_rel(q, rel_w, rel_h)
    np.testing.assert_allclose(ours, gt, atol=1e-5)


def test_relative_logits_compact_consistency():
    rng = np.random.RandomState(2)
    B, nh, H, W, dkh = 1, 2, 4, 3, 6
    q = rng.randn(B, nh, H, W, dkh).astype(np.float32)
    rel_w = rng.randn(dkh, 2 * W - 1).astype(np.float32)
    rel_h = rng.randn(dkh, 2 * H - 1).astype(np.float32)
    rw, rh = relative_logits_compact(jnp.array(q), jnp.array(rel_w), jnp.array(rel_h))
    full = np.asarray(relative_logits(jnp.array(q), jnp.array(rel_w), jnp.array(rel_h)))
    rw, rh = np.asarray(rw), np.asarray(rh)
    # full[i, rj*W+cj] == rw[i, cj] + rh[i, rj]
    recon = rw[:, :, :, None, :] + rh[:, :, :, :, None]
    np.testing.assert_allclose(full, recon.reshape(B, nh, H * W, H * W), atol=1e-6)


@pytest.mark.parametrize("relative", [True, False])
def test_attention_einsum_parity(relative):
    rng = np.random.RandomState(3)
    B, nh, H, W, dkh, dvh = 2, 4, 5, 7, 8, 6
    q = rng.randn(B, nh, H * W, dkh).astype(np.float32)
    k = rng.randn(B, nh, H * W, dkh).astype(np.float32)
    v = rng.randn(B, nh, H * W, dvh).astype(np.float32)
    rel_w = rng.randn(dkh, 2 * W - 1).astype(np.float32) if relative else None
    rel_h = rng.randn(dkh, 2 * H - 1).astype(np.float32) if relative else None

    gt_out, gt_w = brute_force_attention(q, k, v, rel_w, rel_h, H, W)
    out, w = aa_attention_einsum(
        jnp.array(q), jnp.array(k), jnp.array(v),
        None if rel_w is None else jnp.array(rel_w),
        None if rel_h is None else jnp.array(rel_h),
        H, W, return_weights=True,
    )
    np.testing.assert_allclose(np.asarray(out), gt_out, atol=2e-4)
    np.testing.assert_allclose(np.asarray(w), gt_w, atol=2e-5)


def test_attention_pallas_matches_einsum():
    rng = np.random.RandomState(4)
    B, nh, H, W, dkh, dvh = 1, 2, 6, 5, 8, 4
    q = rng.randn(B, nh, H * W, dkh).astype(np.float32)
    k = rng.randn(B, nh, H * W, dkh).astype(np.float32)
    v = rng.randn(B, nh, H * W, dvh).astype(np.float32)
    rel_w = rng.randn(dkh, 2 * W - 1).astype(np.float32)
    rel_h = rng.randn(dkh, 2 * H - 1).astype(np.float32)
    ref, _ = aa_attention_einsum(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(rel_w), jnp.array(rel_h), H, W
    )
    out = aa_attention_pallas(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(rel_w), jnp.array(rel_h), H, W
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_attention_pallas_gradients_match_einsum():
    """Flash backward (fused dq/dk/dv/dRW/dRH) vs einsum autodiff."""
    import jax

    rng = np.random.RandomState(5)
    B, nh, H, W, dkh, dvh = 2, 2, 6, 5, 8, 4
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    tgt = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)

    def loss(fn):
        def f(q, k, v, rw, rh):
            out = fn(q, k, v, rw, rh)
            return ((out - tgt) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))

    ge = loss(lambda *a: aa_attention_einsum(*a, H, W)[0])(q, k, v, rel_w, rel_h)
    gp = loss(lambda *a: aa_attention_pallas(*a, H, W))(q, k, v, rel_w, rel_h)
    for name, a, b in zip(["dq", "dk", "dv", "drel_w", "drel_h"], ge, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_attention_pallas_no_relative():
    rng = np.random.RandomState(6)
    B, nh, H, W, dkh, dvh = 1, 2, 4, 6, 8, 4
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)
    ref, _ = aa_attention_einsum(q, k, v, None, None, H, W)
    out = aa_attention_pallas(q, k, v, None, None, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_attention_pallas_sharded_gradients_match_single_device():
    """The shard_map path (multi-chip mesh): outputs and ALL gradients —
    including the REPLICATED rel embeddings, whose per-device partial
    cotangents must be psum'd over the data axis — match the unsharded run."""
    import jax
    from jax.sharding import Mesh

    from chexpert_tpu.parallel.context import mesh_context

    rng = np.random.RandomState(7)
    B, nh, H, W, dkh, dvh = 4, 2, 6, 5, 8, 4
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    tgt = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)

    def f(q, k, v, rw, rh):
        out = aa_attention_pallas(q, k, v, rw, rh, H, W)
        return ((out - tgt) ** 2).sum()

    grad = jax.grad(f, argnums=(0, 1, 2, 3, 4))
    single = grad(q, k, v, rel_w, rel_h)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    with mesh_context(mesh):
        sharded_out = jax.jit(grad)(q, k, v, rel_w, rel_h)
    for name, a, b in zip(["dq", "dk", "dv", "drel_w", "drel_h"],
                          single, sharded_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_vmem_guard_rejects_oversized_geometry():
    """Geometries whose BACKWARD residents exceed the scoped-VMEM budget must
    fail at trace time with the documented message, not an opaque compiler
    crash (observed round 2: HW=6400 forward compiled, backward OOM'd at
    45 MB; since the packed-operand layout halved the residents and
    _geometry falls back to smaller tiles, HW=6400 fits and the overflow
    example is 160x160)."""
    from chexpert_tpu.ops.pallas_attention import _flash_forward

    hw, W, H, dkh = 25600, 160, 160, 20
    qr = jnp.zeros((1, 1, hw, dkh + W + H), jnp.bfloat16)
    k = jnp.zeros((1, 1, hw, dkh), jnp.bfloat16)
    v = jnp.zeros((1, 1, hw, 1), jnp.bfloat16)
    with pytest.raises(AssertionError, match="VMEM budget"):
        _flash_forward(qr, k, v, H, W, dkh)


def test_attention_pallas_bf16_matches_einsum_bf16():
    """Training dtype: both paths consume bf16 q/k/v. The kernel computes its
    compact rel logits in bf16 (documented perf tradeoff) while the einsum
    path keeps f32 rel logits, so tolerance is bf16-scale — this pins the
    divergence instead of leaving the training dtype untested."""
    rng = np.random.RandomState(11)
    B, nh, H, W, dkh, dvh = 2, 2, 6, 5, 8, 4
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.bfloat16)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    ref, _ = aa_attention_einsum(q, k, v, rel_w, rel_h, H, W)
    out = aa_attention_pallas(q, k, v, rel_w, rel_h, H, W)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-2
    )


def test_attention_pallas_tile_override_tk_not_multiple_of_tq(monkeypatch):
    """CHEXPERT_ATTN_TILES with tk % tq != 0 pads to lcm-style length
    (_pad_len); the backward must mask the phantom key blocks using the TRUE
    padded length (regression: it recomputed hwp as cdiv(hw,tk)*tk, leaving
    all-padding key blocks unmasked during tile sweeps)."""
    import jax

    monkeypatch.setenv("CHEXPERT_ATTN_TILES", "16,24")
    rng = np.random.RandomState(12)
    # hw = 48 divides tk=24 exactly, so the buggy cdiv(hw,tk)*tk == hw == 48
    # while the true padded length is cdiv(48, 16*24)*16*24 = 384
    B, nh, H, W, dkh, dvh = 1, 2, 6, 8, 8, 4
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    tgt = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)

    def loss(fn):
        def f(q, k, v, rw, rh):
            return ((fn(q, k, v, rw, rh) - tgt) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))

    gp = loss(lambda *a: aa_attention_pallas(*a, H, W))(q, k, v, rel_w, rel_h)
    monkeypatch.delenv("CHEXPERT_ATTN_TILES")
    ge = loss(lambda *a: aa_attention_einsum(*a, H, W)[0])(q, k, v, rel_w, rel_h)
    for name, a, b in zip(["dq", "dk", "dv", "drel_w", "drel_h"], ge, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_attention_pallas_rw_fast_path():
    """Geometry with tk % W == 0 exercises the VPU width-broadcast fast path
    (pltpu.repeat + segment-sum dRW) rather than the one-hot fallback —
    outputs and all gradients must match einsum."""
    import jax

    from chexpert_tpu.ops import pallas_attention as pa

    rng = np.random.RandomState(13)
    B, nh, H, W, dkh, dvh = 2, 2, 4, 8, 8, 4  # hw=32 -> tiles (32,32); 32%8==0
    tq, tk = pa._tile_candidates(H * W)[0]
    assert tk % W == 0, "geometry must hit the fast path"
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    tgt = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)

    ref, _ = aa_attention_einsum(q, k, v, rel_w, rel_h, H, W)
    out = aa_attention_pallas(q, k, v, rel_w, rel_h, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def loss(fn):
        def f(q, k, v, rw, rh):
            return ((fn(q, k, v, rw, rh) - tgt) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))

    ge = loss(lambda *a: aa_attention_einsum(*a, H, W)[0])(q, k, v, rel_w, rel_h)
    gp = loss(lambda *a: aa_attention_pallas(*a, H, W))(q, k, v, rel_w, rel_h)
    for name, a, b in zip(["dq", "dk", "dv", "drel_w", "drel_h"], ge, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_attention_pallas_dvh1_matches_einsum():
    """dvh == 1 (aaresnet152 layer-2): the kernel's row-layout v/out/dv
    specialization (VPU P.v instead of N=1 MXU dots) — outputs and all
    gradients must match einsum."""
    import jax

    rng = np.random.RandomState(14)
    B, nh, H, W, dkh, dvh = 2, 2, 6, 5, 8, 1
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    tgt = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)

    ref, _ = aa_attention_einsum(q, k, v, rel_w, rel_h, H, W)
    out = aa_attention_pallas(q, k, v, rel_w, rel_h, H, W)
    assert out.shape == (B, nh, H * W, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def loss(fn):
        def f(q, k, v, rw, rh):
            return ((fn(q, k, v, rw, rh) - tgt) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))

    ge = loss(lambda *a: aa_attention_einsum(*a, H, W)[0])(q, k, v, rel_w, rel_h)
    gp = loss(lambda *a: aa_attention_pallas(*a, H, W))(q, k, v, rel_w, rel_h)
    for name, a, b in zip(["dq", "dk", "dv", "drel_w", "drel_h"], ge, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_attention_pallas_dvh1_multi_key_block(monkeypatch):
    """dvh == 1 with nk > 1: the dv1 backward's restructured l/acc
    accumulation over MULTIPLE key blocks (round-3 advisor finding — the
    default tiles give nk == 1 for every dvh==1 test geometry, so the
    multi-block branch could regress silently; tile overrides or
    CHEXPERT_ATTN_VMEM_MB can select it in production)."""
    import jax

    monkeypatch.setenv("CHEXPERT_ATTN_TILES", "8,16")
    rng = np.random.RandomState(17)
    B, nh, H, W, dkh, dvh = 2, 2, 6, 5, 8, 1  # hw=30 pads beyond tk=16 -> nk>1
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    tgt = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)

    out = aa_attention_pallas(q, k, v, rel_w, rel_h, H, W)

    def loss(fn):
        def f(q, k, v, rw, rh):
            return ((fn(q, k, v, rw, rh) - tgt) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))

    gp = loss(lambda *a: aa_attention_pallas(*a, H, W))(q, k, v, rel_w, rel_h)
    monkeypatch.delenv("CHEXPERT_ATTN_TILES")
    ref, _ = aa_attention_einsum(q, k, v, rel_w, rel_h, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    ge = loss(lambda *a: aa_attention_einsum(*a, H, W)[0])(q, k, v, rel_w, rel_h)
    for name, a, b in zip(["dq", "dk", "dv", "drel_w", "drel_h"], ge, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_relative_logits_compact_v2_matches_v1():
    """The transpose-free formulation must be numerically identical."""
    from chexpert_tpu.ops.attention import relative_logits_compact_v2

    rng = np.random.RandomState(15)
    B, nh, H, W, dkh = 2, 3, 4, 5, 6
    q = jnp.asarray(rng.randn(B, nh, H, W, dkh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    rw1, rh1 = relative_logits_compact(q, rel_w, rel_h)
    rw2, rh2 = relative_logits_compact_v2(q, rel_w, rel_h)
    np.testing.assert_allclose(np.asarray(rw2), np.asarray(rw1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rh2), np.asarray(rh1), atol=1e-5)


def test_relative_logits_compact_bd_matches_v1():
    """The block-diagonal/one-matmul formulation (the pallas wrapper's
    default — it removes the batched einsums' ~3.3 GB/step of batch-major
    layout copies on TPU) must match the einsum ground truth, values and
    gradients, including rectangular H != W."""
    from chexpert_tpu.ops.attention import relative_logits_compact_bd

    rng = np.random.RandomState(16)
    B, nh, H, W, dkh = 2, 3, 4, 5, 6
    q = jnp.asarray(rng.randn(B, nh, H, W, dkh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    rw1, rh1 = relative_logits_compact(q, rel_w, rel_h)
    rw2, rh2 = relative_logits_compact_bd(q, rel_w, rel_h)
    np.testing.assert_allclose(np.asarray(rw2), np.asarray(rw1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rh2), np.asarray(rh1), atol=1e-5)

    import jax

    def loss(fn):
        def f(q, rel_w, rel_h):
            rw, rh = fn(q, rel_w, rel_h)
            return (rw**2).sum() + 0.5 * (rh**2).sum()
        return jax.grad(f, argnums=(0, 1, 2))

    g1 = loss(relative_logits_compact)(q, rel_w, rel_h)
    g2 = loss(relative_logits_compact_bd)(q, rel_w, rel_h)
    for name, a, b in zip(["dq", "drel_w", "drel_h"], g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   err_msg=name)


@pytest.mark.parametrize("impl", ["bdt", "bcast"])
def test_relative_logits_compact_bd_height_variants(impl, monkeypatch):
    """The height-side alternatives behind CHEXPERT_REL_H (pre-transposed
    block-diagonal 'bdt', broadcast-reduce 'bcast') must match the einsum
    ground truth, values and gradients, including rectangular H != W."""
    import jax

    from chexpert_tpu.ops.attention import relative_logits_compact_bd

    monkeypatch.setenv("CHEXPERT_REL_H", impl)
    rng = np.random.RandomState(18)
    B, nh, H, W, dkh = 2, 3, 4, 5, 6
    q = jnp.asarray(rng.randn(B, nh, H, W, dkh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    rw1, rh1 = relative_logits_compact(q, rel_w, rel_h)
    rw2, rh2 = relative_logits_compact_bd(q, rel_w, rel_h)
    np.testing.assert_allclose(np.asarray(rw2), np.asarray(rw1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rh2), np.asarray(rh1), atol=1e-5)

    def loss(fn):
        def f(q, rel_w, rel_h):
            rw, rh = fn(q, rel_w, rel_h)
            return (rw**2).sum() + 0.5 * (rh**2).sum()
        return jax.grad(f, argnums=(0, 1, 2))

    g1 = loss(relative_logits_compact)(q, rel_w, rel_h)
    g2 = loss(relative_logits_compact_bd)(q, rel_w, rel_h)
    for name, a, b in zip(["dq", "drel_w", "drel_h"], g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-4, err_msg=name)


def test_packed_q_relw_bd_matches_compact():
    """[q ; RW] one-matmul pack (the round-5 default qr producer): the q
    columns must be EXACT and the RW columns must match the einsum ground
    truth, values and gradients, including rectangular H != W."""
    import jax

    from chexpert_tpu.ops.attention import packed_q_relw_bd, rel_h_compact

    rng = np.random.RandomState(19)
    B, nh, H, W, dkh = 2, 3, 4, 5, 6
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)
    rw1, rh1 = relative_logits_compact(
        q.reshape(B, nh, H, W, dkh), rel_w, rel_h)
    packed = packed_q_relw_bd(q, rel_w, H, W)
    np.testing.assert_array_equal(np.asarray(packed[..., :dkh]), np.asarray(q))
    np.testing.assert_allclose(np.asarray(packed[..., dkh:]), np.asarray(rw1),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rel_h_compact(q.reshape(B, nh, H, W, dkh), rel_h)),
        np.asarray(rh1), atol=1e-5)

    def ref(q, rel_w):
        rw, _ = relative_logits_compact(
            q.reshape(B, nh, H, W, dkh), rel_w, rel_h)
        return (jnp.concatenate([q, rw], -1) ** 3).sum()

    g1 = jax.grad(ref, argnums=(0, 1))(q, rel_w)
    g2 = jax.grad(lambda q, rw: (packed_q_relw_bd(q, rw, H, W) ** 3).sum(),
                  argnums=(0, 1))(q, rel_w)
    for name, a, b in zip(["dq", "drel_w"], g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("impl", ["fusedpack", "fusedpack+mmskew", "fusedpack5d", "bd", "einsum"])
def test_attention_pallas_rel_impls_match(impl, monkeypatch):
    """Every CHEXPERT_REL_IMPL choice must produce the same attention output
    and gradients (the A/B lever must only move performance)."""
    import jax

    if impl == "fusedpack+mmskew":
        impl = "fusedpack"
        monkeypatch.setenv("CHEXPERT_REL_H", "mmskew")
    monkeypatch.setenv("CHEXPERT_REL_IMPL", impl)
    rng = np.random.RandomState(20)
    B, nh, H, W, dkh, dvh = 1, 2, 4, 5, 6, 3
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.float32)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.float32)
    rel_w = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rel_h = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)

    def loss(fn):
        def f(q, k, v, rw, rh):
            return (fn(q, k, v, rw, rh) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))

    ref, _ = aa_attention_einsum(q, k, v, rel_w, rel_h, H, W)
    out = aa_attention_pallas(q, k, v, rel_w, rel_h, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    ge = loss(lambda *a: aa_attention_einsum(*a, H, W)[0])(q, k, v, rel_w, rel_h)
    gp = loss(lambda *a: aa_attention_pallas(*a, H, W))(q, k, v, rel_w, rel_h)
    for name, a, b in zip(["dq", "dk", "dv", "drel_w", "drel_h"], ge, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   err_msg=name)
