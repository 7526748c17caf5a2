"""Parity of the opt-in Pallas depthwise-conv kernel vs the XLA grouped
conv it would replace (reference depthwise behavior:
/root/reference/models/efficientnet.py:78-111 torch grouped convs with
TF-'SAME' padding). The kernel is a measured NEGATIVE result on TPU (see
ops/pallas_depthwise.py docstring) and defaults off; these tests pin the
opt-in path so the recorded measurement stays reproducible."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chexpert_tpu.ops.pallas_depthwise import (
    _feasible,
    _pick_th,
    _xla_depthwise,
    depthwise_conv2d,
)

GEOMETRIES = [
    # (B, H, W, C, k) — covers: C < 128 (lane pad), C % 128 != 0 tail,
    # k=5, non-multiple-of-8 H/W, and a multi-window H (TH < H)
    pytest.param(2, 24, 24, 48, 3, id="lane_padded_c48"),
    pytest.param(2, 12, 12, 144, 5, id="c_tail_k5"),
    pytest.param(1, 10, 10, 130, 3, id="odd_hw_c130"),
    pytest.param(2, 7, 9, 64, 3, id="tiny_rect"),
]


def _mk(B, H, W, C, k, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, 1, C) * 0.1, jnp.float32)
    return x, w


@pytest.fixture
def pallas_mode(monkeypatch):
    monkeypatch.setenv("CHEXPERT_DW", "pallas")


@pytest.mark.parametrize("B,H,W,C,k", GEOMETRIES)
def test_depthwise_pallas_matches_xla(pallas_mode, B, H, W, C, k):
    x, w = _mk(B, H, W, C, k)
    ref = _xla_depthwise(x, w, 1, k).astype(jnp.float32)
    out = depthwise_conv2d(x, w, 1).astype(jnp.float32)
    # both paths emit bf16; tolerate one output ulp of accumulation-order skew
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-2)


@pytest.mark.parametrize("B,H,W,C,k", GEOMETRIES[:2])
def test_depthwise_pallas_grads_match_xla(pallas_mode, B, H, W, C, k):
    x, w = _mk(B, H, W, C, k)

    def loss(fn, x, w):
        return (fn(x, w).astype(jnp.float32) ** 2).sum()

    gx_r, gw_r = jax.grad(
        lambda x, w: loss(lambda a, b: _xla_depthwise(a, b, 1, k), x, w), argnums=(0, 1)
    )(x, w)
    gx_p, gw_p = jax.grad(
        lambda x, w: loss(lambda a, b: depthwise_conv2d(a, b, 1), x, w), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(
        np.asarray(gx_p, np.float32), np.asarray(gx_r, np.float32), atol=2e-2, rtol=2e-2
    )
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3, rtol=1e-4)


def test_depthwise_multiwindow_dw_accumulation(pallas_mode):
    """H=40 with a tightened budget forces TH < H: the dW partial must
    accumulate across row windows (the resident-block revisit path) and
    halo rows must not double-count."""
    import chexpert_tpu.ops.pallas_depthwise as mod

    B, H, W, C, k = 2, 40, 24, 64, 3
    x, w = _mk(B, H, W, C, k, seed=3)
    orig = mod._VMEM_BUDGET
    mod._VMEM_BUDGET = 1024 * 1024  # force small windows
    try:
        th = _pick_th(H, W, C, k)
        assert 0 < th < H, f"expected multi-window, got TH={th}"

        def loss(fn, x, w):
            return (fn(x, w).astype(jnp.float32) ** 2).sum()

        gw_r = jax.grad(lambda w: loss(lambda a, b: _xla_depthwise(a, b, 1, k), x, w))(w)
        gw_p = jax.grad(lambda w: loss(lambda a, b: depthwise_conv2d(a, b, 1), x, w))(w)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3, rtol=1e-4)
    finally:
        mod._VMEM_BUDGET = orig


def test_depthwise_defaults_to_xla(monkeypatch):
    """Without the opt-in env the wrapper must emit the XLA grouped conv
    (the Pallas kernel measured slower on TPU; default stays the winner)."""
    monkeypatch.delenv("CHEXPERT_DW", raising=False)
    B, H, W, C, k = 1, 12, 12, 32, 3
    x, w = _mk(B, H, W, C, k)
    jaxpr = str(jax.make_jaxpr(lambda x, w: depthwise_conv2d(x, w, 1))(x, w))
    assert "pallas_call" not in jaxpr
    assert "conv_general_dilated" in jaxpr


def test_depthwise_stride2_falls_back(pallas_mode):
    """Stride-2 downsampling layers are infeasible for the kernel and must
    silently take the XLA path even under CHEXPERT_DW=pallas."""
    B, H, W, C, k = 1, 16, 16, 32, 3
    assert not _feasible(H, W, C, k, 2)
    x, w = _mk(B, H, W, C, k)
    out = depthwise_conv2d(x, w, 2)
    ref = _xla_depthwise(x, w, 2, k)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0, rtol=0
    )
