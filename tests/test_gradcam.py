"""Grad-CAM: probe-gradient correctness (finite differences) and output
contract (range/shape/upsampling)."""

import jax
import jax.numpy as jnp
import numpy as np

from chexpert_tpu.interpret import grad_cam
from chexpert_tpu.models import DenseNet
from chexpert_tpu.train import init_model


def test_probe_gradient_matches_finite_difference():
    model = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    variables = {"params": params, "batch_stats": stats}
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)

    logits, inter = model.apply(variables, x, train=False, mutable=["intermediates"])
    feats = inter["intermediates"]["gradcam_features"][0]
    cls = int(jnp.argmax(logits, axis=1)[0])

    def score(probe):
        out = model.apply(variables, x, train=False, probe=probe)
        return out[0, cls]

    g = jax.grad(score)(jnp.zeros_like(feats))
    # reverse-mode probe gradient vs forward-mode jvp along a random
    # direction (finite differences are unusable across the ReLU kink)
    d = jnp.asarray(rng.randn(*feats.shape), jnp.float32)
    _, jvp_val = jax.jvp(score, (jnp.zeros_like(feats),), (d,))
    np.testing.assert_allclose(float(jnp.sum(g * d)), float(jvp_val), rtol=1e-5)


def test_grad_cam_single_forward():
    """The cam path runs ONE real model trace (a jax.vjp forward+backward);
    the only other apply is the zero-FLOP jax.eval_shape shape probe.
    (The reference does one fwd+bwd, chexpert.py:260-303.)"""
    model = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    variables = {"params": params, "batch_stats": stats}
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 3), jnp.float32)

    applies = {"n": 0}

    class CountingModel:
        def apply(self, *a, **kw):
            applies["n"] += 1
            return model.apply(*a, **kw)

    import chexpert_tpu.interpret.gradcam as gc

    # stub the (zero-FLOP) shape probe so the counter sees only real traces
    shape = gc._feature_shape(model, variables, x)
    orig = gc._feature_shape
    gc._feature_shape = lambda *a: shape
    try:
        cam, logits = grad_cam(CountingModel(), variables, x)
    finally:
        gc._feature_shape = orig
    assert cam.shape == (2, 16, 16, 1) and logits.shape == (2, 5)
    assert applies["n"] == 1  # the single vjp forward trace


def test_grad_cam_output_contract():
    model = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    variables = {"params": params, "batch_stats": stats}
    x = jnp.asarray(np.random.RandomState(1).randn(3, 16, 16, 3), jnp.float32)
    cam, logits = grad_cam(model, variables, x)
    assert cam.shape == (3, 16, 16, 1)  # upsampled to input resolution
    assert logits.shape == (3, 5)
    c = np.asarray(cam)
    # min-max normalized into [0, 1]; the +1e-5 stabilizer (reference
    # chexpert.py:289-294) legitimately keeps small-magnitude maps below 1
    assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-5
    # maps carry signal (not constant) for at least one image
    assert c.std(axis=(1, 2, 3)).max() > 1e-3


def test_capture_attention_weights_chunked_matches_full():
    """Chunked capture (bounded memory for the vis path — full-batch capture
    is ~2 GB at 320^2 x 24 images) must reproduce the full-batch weights,
    including a non-divisible tail chunk."""
    from chexpert_tpu.interpret.capture import (
        capture_attention_weights,
        collect_attn_weights,
    )
    from chexpert_tpu.models import build_model
    from chexpert_tpu.train import init_model as init

    model, _ = build_model("aadensenet-tiny", image_size=32, dtype=jnp.float32)
    params, stats = init(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = {"params": params, "batch_stats": stats}
    x = jnp.asarray(np.random.RandomState(0).randn(5, 32, 32, 3), jnp.float32)

    _, inter = model.apply(
        variables, x, train=False, capture_weights=True, mutable=["intermediates"]
    )
    full = collect_attn_weights(inter["intermediates"])
    assert full, "tiny AA model must sow attention weights"

    chunked = capture_attention_weights(model, variables, x, chunk=2)
    assert len(chunked) == len(full)
    for a, b in zip(chunked, full):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5)

    # plain CNN: no attention layers -> empty, not an error
    from chexpert_tpu.models import build_model as bm
    plain, _ = bm("densenet-tiny", image_size=32, dtype=jnp.float32)
    p2, s2 = init(plain, jax.random.PRNGKey(0), (1, 32, 32, 3))
    assert capture_attention_weights(plain, {"params": p2, "batch_stats": s2}, x) == []
