"""Rematerialized dense blocks (remat=True): numerically identical to the
standard path — same param tree, outputs, gradients, updated batch stats.
remat trades recompute FLOPs for dropped per-layer autodiff residuals (the
O(L^2)-byte normed conv1 inputs), a win for the bandwidth-bound DenseNets;
this pins that it is a pure scheduling change, not a semantic one."""

import jax
import jax.numpy as jnp
import numpy as np

from chexpert_tpu.models import DenseNet, build_model
from chexpert_tpu.train import init_model


def test_remat_identical():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 32, 32, 3), jnp.float32)
    m_std = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32)
    m_rmt = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32, remat=True)
    params, stats = init_model(m_std, jax.random.PRNGKey(0), (1, 32, 32, 3))
    params2, _ = init_model(m_rmt, jax.random.PRNGKey(0), (1, 32, 32, 3))
    # checkpoint/importer compatibility: remat must not rename modules
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)

    o1 = m_std.apply({"params": params, "batch_stats": stats}, x, train=False)
    o2 = m_rmt.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def loss_grads_stats(m):
        def f(p):
            out, v = m.apply({"params": p, "batch_stats": stats}, x,
                             train=True, mutable=["batch_stats"])
            return (out ** 2).sum(), v["batch_stats"]
        (l, new_stats), g = jax.value_and_grad(f, has_aux=True)(params)
        return l, g, new_stats

    l1, g1, s1 = loss_grads_stats(m_std)
    l2, g2, s2 = loss_grads_stats(m_rmt)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        g1, g2,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        s1, s2,
    )


def test_remat_composes_with_prefix_stats():
    """remat wraps whichever block body is selected; the carried-stats
    variant under remat must still match the standard path."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    m_std = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32)
    m_both = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32,
                      prefix_stats=True, remat=True)
    params, stats = init_model(m_std, jax.random.PRNGKey(0), (1, 32, 32, 3))

    def grads(m):
        def f(p):
            out, _ = m.apply({"params": p, "batch_stats": stats}, x,
                             train=True, mutable=["batch_stats"])
            return (out ** 2).sum()
        return jax.grad(f)(params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        grads(m_std), grads(m_both),
    )


def test_registry_remat_flag():
    for name in ("densenet121", "aadensenet121", "densenet-tiny", "aadensenet-tiny"):
        model, _ = build_model(name, remat=True)
        assert model.remat, name
        model, _ = build_model(name)
        assert not model.remat, name
