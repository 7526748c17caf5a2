"""Reference-checkpoint interop: torch .pt checkpoints produced by the
reference training loop (chexpert.py:187-193 format) load directly into our
models via the weight converter — identical logits, no retraining."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE = "/root/reference"
HERE = os.path.dirname(__file__)
sys.dont_write_bytecode = True
for p in (os.path.join(HERE, "_torchvision_shim"), REFERENCE):
    if p not in sys.path:
        sys.path.insert(0, p)

ref_models = pytest.importorskip("models.attn_aug_conv")

from chexpert_tpu.checkpoint import load_model_checkpoint  # noqa: E402
from chexpert_tpu.models import DenseNet  # noqa: E402
from chexpert_tpu.train import init_model  # noqa: E402


def test_load_reference_pt_checkpoint(tmp_path):
    tm = ref_models.DenseNet(8, (2, 2, 2), 16, num_classes=5)
    tm.eval()
    ckpt = str(tmp_path / "checkpoint_3.pt")
    torch.save(
        {"global_step": 1234, "eval_loss": 2.5, "avg_auc": 0.87,
         "state_dict": tm.state_dict()},
        ckpt,
    )

    fm = DenseNet(8, (2, 2, 2), 16, num_classes=5, dtype=jnp.float32)
    params, stats = init_model(fm, jax.random.PRNGKey(0), (1, 32, 32, 3))
    ck = load_model_checkpoint(ckpt, params, stats)
    assert ck["global_step"] == 1234
    assert ck["avg_auc"] == 0.87

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.tensor(x)).numpy()
    out = fm.apply(
        {"params": ck["params"], "batch_stats": ck["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)
