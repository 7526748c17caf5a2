"""U-Ignore uncertainty policy + dataset tooling CLI."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from chexpert_tpu.data import ChexpertIndex, make_synthetic_dataset
from chexpert_tpu.data.pipeline import Batches
from chexpert_tpu.train.loss import bce_with_logits, train_loss


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("uig"))
    make_synthetic_dataset(d, n_train=16, n_valid=8, image_size=32,
                           uncertain_frac=0.8)
    return d


def test_ignore_policy_emits_label_mask(root):
    idx = ChexpertIndex(root, "train", download=False, uncertain_policy="ignore")
    b = next(iter(Batches(idx, 16, image_size=32, workers=2)))
    assert "label_mask" in b
    assert b["label_mask"].min() == 0.0  # fixture plants uncertain labels
    assert set(np.unique(b["label"])) <= {0.0, 1.0}  # -1 clipped out
    # ones policy -> full mask
    idx1 = ChexpertIndex(root, "train", download=False, uncertain_policy="ones")
    b1 = next(iter(Batches(idx1, 16, image_size=32, workers=2)))
    assert b1["label_mask"].min() == 1.0


def test_train_loss_label_mask_excludes_elements():
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 5), jnp.float32)
    targets = jnp.zeros((4, 5))
    mask = jnp.ones((4,))
    lm = jnp.ones((4, 5)).at[:, 2].set(0.0)
    full = float(train_loss(logits, targets, mask))
    masked = float(train_loss(logits, targets, mask, lm))
    manual = float((np.asarray(bce_with_logits(logits, targets)) * np.asarray(lm)).sum(1).mean())
    assert masked < full
    np.testing.assert_allclose(masked, manual, rtol=1e-6)


def test_data_tools_inspect_and_explore(root, tmp_path, capsys):
    from chexpert_tpu.cli.data_tools import main

    out = str(tmp_path / "insp")
    assert main(["inspect", root, "--n", "3", "--image_size", "32", "--out", out]) == 0
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 3

    out2 = str(tmp_path / "expl")
    assert main(["explore", root, "--out", out2]) == 0
    report = open(os.path.join(out2, "explore.md")).read()
    assert "Prevalence under U-Ones" in report and "Atelectasis" in report
    assert os.path.exists(os.path.join(out2, "cooccurrence.csv"))


def test_data_tools_stats(root, capsys):
    from chexpert_tpu.cli.data_tools import main

    assert main(["stats", root, "--limit", "8", "--image_size", "32"]) == 0
    out = capsys.readouterr().out
    assert "Dataset mean:" in out
