"""Block-level slim residuals (slim_block=True): numerically identical to
the standard path — remat policies change what autodiff SAVES, never what it
computes. One nn.remat scope per dense block excludes the named
"dense_norm1_relu" tensors (the O(L^2)-byte normed conv1 inputs) from the
saved set; the backward recomputes them as an affine of the saved concat.
Bounded-HLO alternative to slim_bwd's per-layer policy, which the TPU AOT
compiler rejects at production scale (README round-4 notes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chexpert_tpu.models import DenseNet, build_model
from chexpert_tpu.train import init_model


def _loss_grads_stats(m, params, stats, x):
    def f(p):
        out, v = m.apply({"params": p, "batch_stats": stats}, x,
                         train=True, mutable=["batch_stats"])
        return (out ** 2).sum(), v["batch_stats"]
    (l, new_stats), g = jax.value_and_grad(f, has_aux=True)(params)
    return l, g, new_stats


@pytest.mark.parametrize("prefix_stats", [False, True])
def test_slim_block_identical(prefix_stats):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 32, 32, 3), jnp.float32)
    m_std = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32)
    m_slim = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32,
                      prefix_stats=prefix_stats, slim_block=True)
    params, stats = init_model(m_std, jax.random.PRNGKey(0), (1, 32, 32, 3))
    params2, _ = init_model(m_slim, jax.random.PRNGKey(0), (1, 32, 32, 3))
    # checkpoint/importer compatibility: the remat wrapper must not rename
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params2)

    o1 = m_std.apply({"params": params, "batch_stats": stats}, x, train=False)
    o2 = m_slim.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    l1, g1, s1 = _loss_grads_stats(m_std, params, stats, x)
    l2, g2, s2 = _loss_grads_stats(m_slim, params, stats, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        g1, g2,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        s1, s2,
    )


def test_slim_block_registry_and_guards():
    model, _ = build_model("densenet121", slim_block=True)
    assert model.slim_block
    model, _ = build_model("densenet121")
    assert not model.slim_block
    with pytest.raises(ValueError):
        build_model("resnet152", slim_block=True)
    # remat and slim_block select conflicting per-block remat policies
    m = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32,
                 remat=True, slim_block=True)
    with pytest.raises(ValueError):
        init_model(m, jax.random.PRNGKey(0), (1, 32, 32, 3))


def test_variant_flags_guarded_for_all_non_densenet_archs():
    """chunk_size and slim_bwd must also refuse non-DenseNet archs (round-4
    review: they were silently ignored, so an A/B could bench the standard
    model while reporting the variant), and chunk_size+slim policies cannot
    combine (ChunkedDenseLayer has no 'dense_norm1_relu' checkpoint name)."""
    with pytest.raises(ValueError):
        build_model("resnet152", chunk_size=128)
    with pytest.raises(ValueError):
        build_model("efficientnet-b0", slim_bwd=True)
    with pytest.raises(ValueError):
        build_model("densenet121", chunk_size=128, slim_bwd=True)
    with pytest.raises(ValueError):
        build_model("densenet121", chunk_size=128, slim_block=True)
