"""Parity of the heads-in-lanes (HIL) fused attention vs the einsum ground
truth (reference behavior cited from /root/reference/models/attn_aug_conv.py:
43-97). The HIL path takes TOKEN-major (B, HW, nh, dh) operands — the free
reshape of the qkv conv output — where the bn-grid kernel takes head-major;
the math is identical, so parity is asserted against aa_attention_einsum via
layout conversion."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chexpert_tpu.ops.attention import aa_attention_einsum
from chexpert_tpu.ops.pallas_attention import aa_attention_hil, hil_supported


def _mk(B, nh, H, W, dkh, dvh, relative=True, seed=7):
    rng = np.random.RandomState(seed)
    hw = H * W
    q5 = jnp.asarray(rng.randn(B, hw, nh, dkh), jnp.float32)
    k5 = jnp.asarray(rng.randn(B, hw, nh, dkh), jnp.float32)
    v5 = jnp.asarray(rng.randn(B, hw, nh, dvh), jnp.float32)
    rw = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32) if relative else None
    rh = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32) if relative else None
    return q5, k5, v5, rw, rh


def _einsum_token_major(q5, k5, v5, rw, rh, H, W):
    tm = lambda t: t.transpose(0, 2, 1, 3)
    out, _ = aa_attention_einsum(tm(q5), tm(k5), tm(v5), rw, rh, H, W)
    return tm(out)


GEOMETRIES = [
    # (B, nh, H, W, dkh, dvh, relative, tiles) — tiles forces multi-block /
    # multi-chunk grids on hermetically small shapes
    pytest.param(2, 2, 5, 6, 8, 1, True, None, id="dvh1_padded_hw30"),
    pytest.param(1, 2, 4, 4, 8, 4, False, None, id="no_rel"),
    pytest.param(1, 2, 8, 8, 8, 4, True, "16,32", id="nq4_nk2"),
    pytest.param(1, 2, 7, 9, 8, 2, True, "16,16", id="padded_hw63_nq_nk4"),
    pytest.param(2, 8, 6, 6, 20, 1, True, None, id="aares_l2_like"),
]


@pytest.mark.parametrize("B,nh,H,W,dkh,dvh,relative,tiles", GEOMETRIES)
def test_hil_forward_matches_einsum(B, nh, H, W, dkh, dvh, relative, tiles,
                                    monkeypatch):
    if tiles:
        monkeypatch.setenv("CHEXPERT_ATTN_HIL_TILES", tiles)
    q5, k5, v5, rw, rh = _mk(B, nh, H, W, dkh, dvh, relative)
    ref = _einsum_token_major(q5, k5, v5, rw, rh, H, W)
    out = aa_attention_hil(q5, k5, v5, rw, rh, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("B,nh,H,W,dkh,dvh,relative,tiles", GEOMETRIES)
def test_hil_gradients_match_einsum(B, nh, H, W, dkh, dvh, relative, tiles,
                                    monkeypatch):
    """All five gradients: dq, dk, dv, and the rel embeddings through the
    compact-BD VJP composition."""
    if tiles:
        monkeypatch.setenv("CHEXPERT_ATTN_HIL_TILES", tiles)
    q5, k5, v5, rw, rh = _mk(B, nh, H, W, dkh, dvh, relative)
    rng = np.random.RandomState(11)
    tgt = jnp.asarray(rng.randn(*v5.shape), jnp.float32)
    nargs = 5 if relative else 3

    def loss(fn):
        def f(*args):
            a = list(args) + ([None, None] if not relative else [])
            return ((fn(*a) - tgt) ** 2).sum()
        return jax.grad(f, argnums=tuple(range(nargs)))

    args = (q5, k5, v5) + ((rw, rh) if relative else ())
    ge = loss(lambda *a: _einsum_token_major(*a, H, W))(*args)
    gh = loss(lambda *a: aa_attention_hil(*a, H, W))(*args)
    names = ["dq", "dk", "dv", "drel_w", "drel_h"][:nargs]
    for name, a, b in zip(names, ge, gh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_hil_pad128_slots(monkeypatch):
    """The tile-aligned slot variant (CHEXPERT_ATTN_HIL_SLOT=pad128) is
    numerically identical to tight slots."""
    monkeypatch.setenv("CHEXPERT_ATTN_HIL_SLOT", "pad128")
    q5, k5, v5, rw, rh = _mk(2, 2, 5, 6, 8, 2, True)
    ref = _einsum_token_major(q5, k5, v5, rw, rh, 5, 6)
    out = aa_attention_hil(q5, k5, v5, rw, rh, 5, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_hil_supported_covers_model_zoo():
    """Every production AAConv geometry must have a feasible HIL geometry
    (aaresnet152 layers 2-4, aadensenet121 transitions 1-3 at 320^2)."""
    zoo = [
        (1600, 8, 20, 1),   # aaresnet152 layer2 (40x40)
        (400, 8, 20, 3),    # layer3 (20x20)
        (100, 8, 20, 6),    # layer4 (10x10)
        (1600, 8, 20, 3),   # aadensenet121 transition1 (40x40)
        (400, 8, 20, 6),    # transition2
        (100, 8, 25, 12),   # transition3
    ]
    for hw, nh, dkh, dvh in zoo:
        side = int(hw ** 0.5)
        assert hil_supported(hw, nh, dkh, dvh, 2 * side, 2), (hw, nh, dkh, dvh)


def test_hil_bf16_close_to_f32():
    """bf16 inputs (the production dtype) stay within bf16 tolerance."""
    q5, k5, v5, rw, rh = _mk(1, 4, 6, 5, 8, 2, True)
    scale = 0.3  # keep logits in a bf16-friendly range
    args32 = (q5 * scale, k5 * scale, v5, rw * scale, rh * scale)
    ref = _einsum_token_major(*args32, 6, 5)
    out = aa_attention_hil(*(a.astype(jnp.bfloat16) for a in args32[:3]),
                           *args32[3:], 6, 5)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2)


def test_hil_sharded_gradients_match_single_device():
    """The shard_map path (multi-chip mesh): outputs and ALL gradients —
    including the REPLICATED rel embeddings, whose per-device partial
    cotangents must be psum'd over the data axis — match the unsharded run."""
    from jax.sharding import Mesh

    from chexpert_tpu.parallel.context import mesh_context

    q5, k5, v5, rw, rh = _mk(4, 2, 6, 5, 8, 4, True)
    rng = np.random.RandomState(13)
    tgt = jnp.asarray(rng.randn(*v5.shape), jnp.float32)

    def f(q, k, v, rw, rh):
        out = aa_attention_hil(q, k, v, rw, rh, 6, 5)
        return ((out - tgt) ** 2).sum()

    grad = jax.grad(f, argnums=(0, 1, 2, 3, 4))
    single = grad(q5, k5, v5, rw, rh)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    with mesh_context(mesh):
        sharded = jax.jit(grad)(q5, k5, v5, rw, rh)
    for name, a, b in zip(["dq", "dk", "dv", "drel_w", "drel_h"],
                          single, sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_aaconv_module_hil_matches_einsum(monkeypatch):
    """AAConv2d end-to-end with the SAME params: the packed-weight HIL path
    (permuted in_proj_qkv output channels + packed kernel) must match the
    einsum path bit-for-tolerance, including the conv branch and out_proj."""
    from chexpert_tpu.models.attn import AAConv2d

    monkeypatch.setenv("CHEXPERT_ATTN_LAYOUT", "hil")

    rng = np.random.RandomState(3)
    B, H, W, Cin = 2, 6, 5, 12
    x = jnp.asarray(rng.randn(B, 2 * H, 2 * W, Cin), jnp.float32)
    kw = dict(out_channels=16, kernel_size=3, strides=2, dk=8, dv=4, nh=2,
              relative=True, input_dims=(H, W), dtype=jnp.float32)

    m_ein = AAConv2d(attn_impl="einsum", **kw)
    params = m_ein.init(jax.random.PRNGKey(0), x)
    ref = m_ein.apply(params, x)

    m_hil = AAConv2d(attn_impl="pallas", **kw)
    out = m_hil.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_aaconv_module_hil_gradients_match_einsum(monkeypatch):
    """Same module-level check for parameter gradients (the permuted-weight
    conv's VJP must inverse-permute dW back into the checkpoint layout)."""
    from chexpert_tpu.models.attn import AAConv2d

    monkeypatch.setenv("CHEXPERT_ATTN_LAYOUT", "hil")

    rng = np.random.RandomState(4)
    B, H, W, Cin = 1, 4, 4, 8
    x = jnp.asarray(rng.randn(B, 2 * H, 2 * W, Cin), jnp.float32)
    kw = dict(out_channels=12, kernel_size=3, strides=2, dk=8, dv=4, nh=2,
              relative=True, input_dims=(H, W), dtype=jnp.float32)

    m_ein = AAConv2d(attn_impl="einsum", **kw)
    params = m_ein.init(jax.random.PRNGKey(1), x)
    m_hil = AAConv2d(attn_impl="pallas", **kw)

    def loss(m):
        return lambda p: (m.apply(p, x).astype(jnp.float32) ** 2).sum()

    ge = jax.grad(loss(m_ein))(params)
    gh = jax.grad(loss(m_hil))(params)
    flat_e = jax.tree_util.tree_leaves_with_path(ge)
    flat_h = dict(jax.tree_util.tree_leaves_with_path(gh))
    for path, a in flat_e:
        b = flat_h[path]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=jax.tree_util.keystr(path))
