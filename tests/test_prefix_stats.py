"""Carried-stats dense blocks (prefix_stats=True): numerically identical to
the standard concat path — shared params, eval/train outputs, updated batch
stats, gradients. The variant's claim is that each dense layer's norm1 batch
stats over the accumulated prefix equal the stats carried from each segment's
birth (same values, same batch); this test pins that equivalence end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from chexpert_tpu.models import DenseNet
from chexpert_tpu.train import init_model


def test_prefix_stats_identical():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 32, 32, 3), jnp.float32)
    m_std = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32)
    m_pre = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32, prefix_stats=True)
    params, stats = init_model(m_std, jax.random.PRNGKey(0), (1, 32, 32, 3))
    params2, _ = init_model(m_pre, jax.random.PRNGKey(0), (1, 32, 32, 3))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)

    o1 = m_std.apply({"params": params, "batch_stats": stats}, x, train=False)
    o2 = m_pre.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    o1, v1 = m_std.apply({"params": params, "batch_stats": stats}, x,
                         train=True, mutable=["batch_stats"])
    o2, v2 = m_pre.apply({"params": params, "batch_stats": stats}, x,
                         train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        v1["batch_stats"], v2["batch_stats"],
    )

    def grads(m, p):
        def f(p):
            out, _ = m.apply({"params": p, "batch_stats": stats}, x,
                             train=True, mutable=["batch_stats"])
            return (out ** 2).sum()
        return jax.grad(f)(p)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        grads(m_std, params), grads(m_pre, params2),
    )


def test_chunked_prefix_identical():
    """Chunked-prefix dense blocks (prefix_stats + chunk_size: carried stats
    over 128-channel-style chunks, per-chunk conv1 matmuls): numerically
    identical to the standard path, same param tree. chunk_size=24 with
    growth 8 and 16 init features exercises input-in-tail (16 < 24),
    mid-block flushes (16+8=24), and a leftover tail."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 32, 32, 3), jnp.float32)
    m_std = DenseNet(8, (3, 3), 16, num_classes=5, dtype=jnp.float32)
    m_chk = DenseNet(8, (3, 3), 16, num_classes=5, dtype=jnp.float32,
                     prefix_stats=True, chunk_size=24)
    params, stats = init_model(m_std, jax.random.PRNGKey(0), (1, 32, 32, 3))
    params2, _ = init_model(m_chk, jax.random.PRNGKey(0), (1, 32, 32, 3))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)

    o1 = m_std.apply({"params": params, "batch_stats": stats}, x, train=False)
    o2 = m_chk.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    o1, v1 = m_std.apply({"params": params, "batch_stats": stats}, x,
                         train=True, mutable=["batch_stats"])
    o2, v2 = m_chk.apply({"params": params, "batch_stats": stats}, x,
                         train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        v1["batch_stats"], v2["batch_stats"],
    )

    def grads(m, p):
        def f(p):
            out, _ = m.apply({"params": p, "batch_stats": stats}, x,
                             train=True, mutable=["batch_stats"])
            return (out ** 2).sum()
        return jax.grad(f)(p)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        grads(m_std, params), grads(m_chk, params2),
    )


def test_registry_default_prefix_stats():
    """Per-arch defaults follow the on-chip A/Bs (registry.py comment):
    densenet121 is FASTER on the standard path (XLA fuses its BN into the
    convs; carried stats measured 775 vs 943 img/s), aadensenet121 is faster
    with carried stats (805 vs 753). The flag stays overridable for A/B."""
    from chexpert_tpu.models import build_model

    for name, default in (
        ("densenet121", False),
        ("aadensenet121", True),
        ("densenet-tiny", True),
    ):
        model, _ = build_model(name)
        assert model.prefix_stats == default, name
        model, _ = build_model(name, prefix_stats=not default)
        assert model.prefix_stats == (not default), name
