"""Mixed-precision regression guard: every convolution in a bf16-model train
step must produce bf16 (a silent f32 conv would halve MXU throughput)."""

import re

import jax
import jax.numpy as jnp
import numpy as np

from chexpert_tpu.models import DenseNet
from chexpert_tpu.models.registry import OptimizerSpec
from chexpert_tpu.train import TrainState, init_model, make_optimizer
from chexpert_tpu.train.steps import make_train_step


def test_all_convs_bf16_in_train_step():
    model = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.bfloat16)
    tx, _ = make_optimizer(OptimizerSpec("adam"), 1e-3)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    state = TrainState.create(params, stats, tx)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(4, 16, 16, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(4, 5) > 0.5), jnp.float32),
        "index": jnp.zeros((4,), jnp.int32),
        "mask": jnp.ones((4,), jnp.float32),
    }
    txt = jax.jit(make_train_step(model, tx)).lower(state, batch).as_text()
    conv_lines = [l for l in txt.splitlines() if "convolution(" in l]
    assert conv_lines, "no convolutions found in lowered train step"
    bad = [l for l in conv_lines
           if not re.search(r"tensor<[0-9x]*bf16>\s*$", l.split("->")[-1].rstrip())]
    # fwd convs and grad convs must all emit bf16
    assert not bad, f"{len(bad)} non-bf16 convolutions, e.g.\n{bad[0][:200]}"
