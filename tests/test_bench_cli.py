"""CIFAR model test-bench CLI (reference models/test_model.py parity):
synthetic single-batch overfit + evaluate + attention visualization."""

import json
import os

import numpy as np
import pytest


def test_bench_overfit_and_vis(tmp_path):
    from chexpert_tpu.cli.bench import main

    out = str(tmp_path / "bench")
    assert main([
        "densenet", "8", "10",
        "--attn", "--attn_nh", "2", "--attn_k", "0.25", "--attn_v", "0.25",
        "--attn_impl", "einsum",
        "--train", "--evaluate", "--vis_attn", "--synthetic", "--mini_data",
        "--dataset", "cifar10", "--batch_size", "32", "--n_epochs", "12",
        "--lr", "0.05", "--log_interval", "1", "--eval_interval", "100",
        "--output_dir", out, "--compute_dtype", "float32",
        "--data_parallel", "2",
    ]) == 0
    # training loss must decrease (single-batch overfit, test_model.py:59)
    losses = [json.loads(l)["value"] for l in open(os.path.join(out, "scalars.jsonl"))
              if json.loads(l).get("tag") == "train_loss"]
    assert len(losses) >= 12 and losses[-1] < losses[0]
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))
    vis = os.listdir(os.path.join(out, "vis"))
    assert any(v.startswith("attn_image") for v in vis)


def test_bench_augment_shapes():
    from chexpert_tpu.cli.bench import augment, normalize, synthetic_cifar

    x, y, _, _ = synthetic_cifar(10, n_train=16, n_test=4)
    rng = np.random.RandomState(0)
    a = augment(x, rng)
    assert a.shape == x.shape and a.dtype == np.uint8
    n = normalize(x)
    assert n.dtype == np.float32 and abs(n.mean()) < 5.0
