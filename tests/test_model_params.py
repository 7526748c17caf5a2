"""Golden parameter-count tests.

Ground truth from the reference's executable asserts
(/root/reference/models/attn_aug_conv.py:522-655) and exact counts obtained
by running the reference model code (torch CPU) in this environment.
Counting uses jax.eval_shape — no FLOPs, safe for big models on CPU CI.
"""

import jax
import jax.numpy as jnp
import pytest

from chexpert_tpu.models import (
    AttnParams,
    DenseNet,
    EfficientNet,
    ResNet,
    WideResNet,
    build_model,
)


def n_params(module, hw, train=False):
    rng = jax.random.PRNGKey(0)
    vs = jax.eval_shape(lambda: module.init(rng, jnp.zeros((1, hw, hw, 3)), train=train))
    return sum(x.size for x in jax.tree_util.tree_leaves(vs["params"]))


# (model, input hw, expected params, source)
EXACT = [
    (DenseNet(32, (6, 12, 24, 16), 64, num_classes=1000, dtype=jnp.float32), 224,
     7_978_856, "torchvision densenet121"),
    (DenseNet(32, (6, 12, 24, 16), 64, num_classes=5, dtype=jnp.float32), 320,
     6_958_981, "reference densenet121 n_classes=5"),
    (DenseNet(32, (6, 12, 24, 16), 64, num_classes=5, dtype=jnp.float32,
              attn=AttnParams(0.2, 0.1, 8, True, (320, 320))), 320,
     12_534_381, "reference aadensenet121 (chexpert.py:475-476)"),
    (EfficientNet("efficientnet-b0", num_classes=5, dtype=jnp.float32), 64,
     4_013_953, "reference construct_model b0 n_classes=5"),
    (EfficientNet("efficientnet-b4", num_classes=5, dtype=jnp.float32), 64,
     17_324_621, "reference construct_model b4 n_classes=5"),
    (EfficientNet("efficientnet-b7", num_classes=5, dtype=jnp.float32), 64,
     62_971_605, "reference construct_model b7 n_classes=5"),
]


@pytest.mark.parametrize("model,hw,expected,src", EXACT, ids=[e[3] for e in EXACT])
def test_exact_param_counts(model, hw, expected, src):
    assert n_params(model, hw) == expected


# reference paper-rounded asserts (attn_aug_conv.py:522-655)
ROUNDED = [
    (DenseNet(12, (16, 16, 16), 24, num_classes=10, dtype=jnp.float32), 32, 0.8,
     "Densenet-BC k12 L100 (assert :530)"),
    (ResNet("basic", (3, 4, 6, 3), 1000, dtype=jnp.float32), 224, 21.8,
     "ResNet34 (assert :610)"),
    (ResNet("bottleneck", (3, 4, 6, 3), 1000, dtype=jnp.float32), 224, 25.6,
     "ResNet50 (assert :616)"),
    (ResNet("basic", (3, 4, 6, 3), 1000, dtype=jnp.float32,
            attn=AttnParams(0.25, 0.25, 8, True, (224, 224))), 224, 20.7,
     "AAResNet34 k=v=.25 (assert :623)"),
    (ResNet("bottleneck", (3, 4, 6, 3), 1000, dtype=jnp.float32,
            attn=AttnParams(0.2, 0.1, 8, True, (224, 224))), 224, 25.8,
     "AAResNet50 k=.2 v=.1 (assert :629)"),
    (ResNet("bottleneck", (3, 4, 6, 3), 1000, dtype=jnp.float32,
            attn=AttnParams(0.25, 0.25, 8, True, (224, 224))), 224, 24.3,
     "AAResNet50 k=v=.25 (assert :635)"),
    (WideResNet(28, 10, 100, dtype=jnp.float32,
                attn=AttnParams(0.2, 0.1, 8, True, (32, 32))), 32, 36.2,
     "AAWRN-28-10 (assert :602)"),
]


@pytest.mark.parametrize("model,hw,millions,src", ROUNDED, ids=[e[3] for e in ROUNDED])
def test_rounded_param_counts(model, hw, millions, src):
    assert round(n_params(model, hw) * 1e-6, 1) == millions


def test_registry_builds_all():
    for name in ["densenet121", "aadensenet121", "resnet152", "aaresnet152",
                 "efficientnet-b0", "efficientnet-b3"]:
        module, spec = build_model(name, image_size=320)
        assert module is not None and spec.kind in ("adam", "sgd_nesterov", "rmsprop")
    with pytest.raises(RuntimeError):
        build_model("not-a-model")


def test_registry_refuses_densenet_only_variants():
    # A/B flags the non-DenseNet archs silently ignore must be refused
    # up front, not after a chip run (ADVICE r4: prefix_stats was missing
    # from the guard, so --infer --prefix-stats on resnet152 benched the
    # default model while reporting the variant)
    for kw in ({"prefix_stats": True}, {"prefix_stats": False},
               {"remat": True}, {"chunk_size": 128}, {"concat_free": True}):
        with pytest.raises(ValueError):
            build_model("resnet152", **kw)
    # concat_free x the arch's effective carried-stats default must fail
    # at build time (the in-__call__ assert is stripped under python -O)
    with pytest.raises(ValueError):
        build_model("aadensenet121", concat_free=True)
    with pytest.raises(ValueError):
        build_model("densenet121", concat_free=True, chunk_size=128)
    # and the measured-winner A/B combination stays buildable
    module, _ = build_model("densenet121", concat_free=True)
    assert module is not None
    module, _ = build_model("aadensenet121", concat_free=True,
                            prefix_stats=False)
    assert module is not None


def test_registry_per_arch_attention_defaults():
    """'pallas' maps to each arch's measured rel-pack winner (r5 A/B:
    fusedpack wins on bandwidth-bound aadensenet121, bd on compute-bound
    aaresnet152); explicit variants pass through untouched."""
    m, _ = build_model("aaresnet152", image_size=320)
    assert m.attn_impl == "pallas-bd"
    m, _ = build_model("aaresnet152", image_size=320, attn_impl="pallas-fusedpack")
    assert m.attn_impl == "pallas-fusedpack"
    m, _ = build_model("aadensenet121", image_size=320)
    assert m.attn_impl == "pallas"  # AAConv2d's 'pallas' default = fusedpack
    m, _ = build_model("aaresnet152", image_size=320, attn_impl="einsum")
    assert m.attn_impl == "einsum"
