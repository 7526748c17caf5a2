"""Ensemble evaluation: vmapped stacked checkpoints, score-mean semantics,
2-D (model x data) mesh sharding of the member axis, auto-resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chexpert_tpu.checkpoint import save_model_checkpoint
from chexpert_tpu.eval.ensemble import (
    list_checkpoints,
    make_ensemble_eval_step,
    stack_checkpoints,
)
from chexpert_tpu.models import DenseNet, OptimizerSpec
from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh
from chexpert_tpu.train import init_model


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpts"))
    model = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32)
    paths = []
    for k in range(2):
        params, stats = init_model(model, jax.random.PRNGKey(k), (1, 16, 16, 3))
        p = os.path.join(d, f"checkpoint_{k}.msgpack")
        save_model_checkpoint(p, params, stats, k, 1.0, 0.5 + 0.1 * k)
        paths.append(p)
    return model, paths


def _batch(bs=8):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.randn(bs, 16, 16, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(bs, 5) > 0.5), jnp.float32),
        "index": jnp.zeros((bs,), jnp.int64),
        "mask": jnp.ones((bs,), jnp.float32),
    }


def test_list_checkpoints(checkpoints, tmp_path):
    model, paths = checkpoints
    found = list_checkpoints(os.path.dirname(paths[0]))
    assert found == sorted(paths)


def test_stack_checkpoints_stays_on_host(checkpoints):
    """Stacked checkpoint trees must be numpy (host) — stacking on device
    would land K param copies in HBM before eval starts, which OOMs large
    ensembles (efficientnet-b4 x10); the eval path device_puts once, with
    the member sharding (ensemble.py::_evaluate_groups)."""
    model, paths = checkpoints
    params, stats = init_model(model, jax.random.PRNGKey(9), (1, 16, 16, 3))
    sp, ss = stack_checkpoints(paths, params, stats)
    for leaf in jax.tree_util.tree_leaves(sp) + jax.tree_util.tree_leaves(ss):
        assert isinstance(leaf, np.ndarray), type(leaf)
        assert leaf.shape[0] == len(paths)


def test_ensemble_mean_matches_members(checkpoints):
    """Ensemble outputs == mean of per-member outputs (chexpert.py:233-234)."""
    model, paths = checkpoints
    params, stats = init_model(model, jax.random.PRNGKey(9), (1, 16, 16, 3))
    sp, ss = stack_checkpoints(paths, params, stats)
    mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    step = make_ensemble_eval_step(model, mesh, len(paths))
    batch = jax.device_put(_batch(), batch_sharding(mesh))
    outs, losses = step(sp, ss, batch)
    assert outs.shape[0] == 2
    # compare against individual forward passes
    from chexpert_tpu.checkpoint import load_model_checkpoint

    for k, p in enumerate(paths):
        ck = load_model_checkpoint(p, params, stats)
        single = model.apply(
            {"params": ck["params"], "batch_stats": ck["batch_stats"]},
            batch["image"], train=False,
        )
        np.testing.assert_allclose(np.asarray(outs)[k], np.asarray(single), atol=2e-5)


def test_ensemble_2d_mesh_sharding(checkpoints):
    """(data=4, model=2) mesh with 2 members: the member axis is SHARDED over
    'model' via shard_map (one member per model shard, each vmapping only its
    local members); results identical to the single-device ensemble."""
    assert jax.device_count() >= 8
    model, paths = checkpoints
    params, stats = init_model(model, jax.random.PRNGKey(9), (1, 16, 16, 3))
    sp, ss = stack_checkpoints(paths, params, stats)
    batch = _batch()

    ref_mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    ref_step = make_ensemble_eval_step(model, ref_mesh, len(paths))
    ref_out, _ = ref_step(sp, ss, jax.device_put(batch, batch_sharding(ref_mesh)))

    mesh = create_mesh(4, 2, devices=jax.devices()[:8])
    from chexpert_tpu.eval.ensemble import member_sharding
    from jax.sharding import PartitionSpec as P

    memb_sh = member_sharding(mesh, len(paths))
    assert memb_sh.spec == P("model")  # 2 members over model axis of 2
    sp = jax.device_put(sp, memb_sh)
    ss = jax.device_put(ss, memb_sh)
    step = make_ensemble_eval_step(model, mesh, len(paths))
    out, _ = step(sp, ss, jax.device_put(batch, batch_sharding(mesh)))
    # member rows really live on distinct model shards
    k_dim_shards = {s.index[0] for s in out.addressable_shards}
    assert len(k_dim_shards) == 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-4)


def test_ensemble_member_sharding_fallback(checkpoints):
    """3 members on a model axis of 2 -> replicated fallback, same numbers."""
    model, paths = checkpoints
    from chexpert_tpu.eval.ensemble import member_sharding
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(4, 2, devices=jax.devices()[:8])
    assert member_sharding(mesh, 3).spec == P()
    params, stats = init_model(model, jax.random.PRNGKey(9), (1, 16, 16, 3))
    sp, ss = stack_checkpoints(paths + paths[:1], params, stats)  # K=3
    step = make_ensemble_eval_step(model, mesh, 3)
    out, _ = step(sp, ss, jax.device_put(_batch(), batch_sharding(mesh)))
    assert out.shape[0] == 3
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(out)[2], atol=1e-6)


@pytest.mark.parametrize("chunk", [1, 2, 3])
def test_ensemble_member_chunk_matches_single_pass(checkpoints, tmp_path, chunk):
    """Chunked member evaluation (groups of `chunk` over K=3, multiple passes
    over the valid set) reproduces the all-at-once stacked-vmap metrics
    exactly — the OOM fallback must not change the score semantics."""
    from chexpert_tpu.data import Batches, ChexpertIndex, make_synthetic_dataset
    from chexpert_tpu.eval.ensemble import evaluate_ensemble

    model, paths = checkpoints
    paths = paths + paths[:1]  # K=3: exercises an uneven trailing group
    root = str(tmp_path)
    make_synthetic_dataset(root, n_train=8, n_valid=12, image_size=16)
    index = ChexpertIndex(root, mode="valid", download=False)
    batches = Batches(index, batch_size=4, image_size=16, workers=2)
    params, stats = init_model(model, jax.random.PRNGKey(9), (1, 16, 16, 3))
    mesh = create_mesh(1, 1, devices=jax.devices()[:1])

    ref = evaluate_ensemble(model, paths, params, stats, batches, mesh)
    got = evaluate_ensemble(model, paths, params, stats, batches, mesh,
                            member_chunk=chunk)
    for c in ref["aucs"]:
        np.testing.assert_allclose(got["aucs"][c], ref["aucs"][c], atol=1e-6)
        np.testing.assert_allclose(got["loss"][c], ref["loss"][c], atol=1e-5)


def test_auto_resume(tmp_path):
    """--auto_resume picks up checkpoint_latest.msgpack from output_dir."""
    from chexpert_tpu.data import make_synthetic_dataset

    root = str(tmp_path)
    make_synthetic_dataset(root, n_train=16, n_valid=8, image_size=32)
    from chexpert_tpu.cli.chexpert import main

    base = [
        "--data_path", root, "--output_dir", os.path.join(root, "run"),
        "--model", "densenet-tiny", "--image_size", "32", "--batch_size", "8",
        "--compute_dtype", "float32", "--data_parallel", "2",
        "--data_workers", "2", "--lr", "1e-2", "--log_interval", "1",
        "--eval_interval", "2", "--n_epochs", "1",
    ]
    assert main(base + ["--train"]) == 0
    # second run resumes: the step counter continues past the first epoch
    assert main(base + ["--train", "--auto_resume"]) == 0
    import json

    steps = [json.loads(l)["step"] for l in open(os.path.join(root, "run", "scalars.jsonl"))
             if json.loads(l).get("tag") == "train_loss"]
    assert max(steps) == 4  # 2 epochs x 2 steps, continued counter


def test_fit_member_chunk_measured_b4_profile():
    """Planner search against the measured efficientnet-b4 @320^2 batch-64
    cost curve (k=1: 0.82 GB, k=5: 8.45 GB, k=10: 16.8 GB — vmap temp is
    super-linear at first, ~1.68 GB/member for k>1). With a 14.6 GB budget
    the right answer is 5 (10 members in two balanced passes), reached
    WITHOUT compiling every k."""
    from chexpert_tpu.eval.ensemble import _fit_member_chunk

    compiled = []

    def cost_of(k):
        compiled.append(k)
        return 0.82e9 if k == 1 else (0.168e9 + 1.68e9 * k)

    chunk = _fit_member_chunk(10, 14.6e9, cost_of)
    assert chunk == 5
    # one probe at 10, one verification at the final balanced size
    assert compiled == [10, 5]


def test_fit_member_chunk_fits_first_try():
    from chexpert_tpu.eval.ensemble import _fit_member_chunk

    compiled = []
    chunk = _fit_member_chunk(10, 1e12, lambda k: compiled.append(k) or 1e9 * k)
    assert chunk == 10 and compiled == [10]


def test_fit_member_chunk_floors_at_one():
    from chexpert_tpu.eval.ensemble import _fit_member_chunk

    # nothing fits: must still terminate and return 1
    assert _fit_member_chunk(8, 0.5e9, lambda k: 1e9 * k) == 1


def test_device_budget_kind_table(monkeypatch):
    """Axon's memory_stats() returns None; the budget must fall back to the
    device-kind table (TPU v5 lite = 16 GiB) minus live bytes, with margin."""
    from chexpert_tpu.eval.ensemble import _device_budget_bytes

    class Dev:
        device_kind = "TPU v5 lite"

        def memory_stats(self):
            return None

    monkeypatch.delenv("CHEXPERT_HBM_GB", raising=False)
    live = sum(a.nbytes for a in jax.live_arrays())
    expect = 0.9 * (16 * 2**30 - live) - 2**30
    assert abs(_device_budget_bytes(Dev()) - expect) < 64e6  # live set may drift

    monkeypatch.setenv("CHEXPERT_HBM_GB", "32")
    assert _device_budget_bytes(Dev()) > expect + 10 * 2**30


def test_device_budget_reported_stats():
    from chexpert_tpu.eval.ensemble import _device_budget_bytes

    class Dev:
        def memory_stats(self):
            return {"bytes_limit": 10 * 2**30, "bytes_in_use": 2 * 2**30}

    assert _device_budget_bytes(Dev()) == 0.9 * 8 * 2**30 - 2**30
