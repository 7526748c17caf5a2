"""Training: loss math, schedules, overfit-one-batch, checkpoint tracker,
sharded multi-device steps on the virtual 8-CPU-device mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from chexpert_tpu.checkpoint import (
    load_model_checkpoint,
    load_optim_checkpoint,
    save_model_checkpoint,
    save_optim_checkpoint,
    update_tracker,
)
from chexpert_tpu.models import AttnParams, DenseNet, OptimizerSpec
from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from chexpert_tpu.train import (
    TrainState,
    bce_with_logits,
    init_model,
    jit_steps,
    make_optimizer,
    make_schedule,
)


def tiny_model(attn=False, dtype=jnp.float32):
    if attn:
        return DenseNet(8, (2, 2), 16, num_classes=5, dtype=dtype,
                        attn=AttnParams(0.25, 0.25, 2, True, (16, 16)),
                        attn_impl="einsum")
    return DenseNet(8, (2, 2), 16, num_classes=5, dtype=dtype)


def make_batch(rng, bs=8, hw=16):
    return {
        "image": jnp.asarray(rng.randn(bs, hw, hw, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(bs, 5) > 0.5), jnp.float32),
        "index": jnp.arange(bs, dtype=jnp.int64),
        "mask": jnp.ones((bs,), jnp.float32),
    }


def test_bce_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(16, 5).astype(np.float32)
    y = (rng.rand(16, 5) > 0.5).astype(np.float32)
    ours = np.asarray(bce_with_logits(jnp.array(x), jnp.array(y)))
    ref = torch.nn.BCEWithLogitsLoss(reduction="none")(
        torch.tensor(x), torch.tensor(y)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_schedules():
    # 'hold' warmup (chexpert.py:165): base lr until warmup, decay clock after
    spec = OptimizerSpec("adam", "multistep", milestones=(10, 20))
    s = make_schedule(spec, 1.0, warmup_steps=5, warmup_style="hold")
    assert float(s(0)) == 1.0 and float(s(4)) == 1.0
    assert float(s(14)) == 1.0          # eff=9 < 10
    assert abs(float(s(15)) - 0.1) < 1e-5   # eff=10 -> one decay
    assert abs(float(s(25)) - 0.01) < 1e-5  # eff=20 -> two decays
    # per-step exponential (chexpert.py:500)
    spec = OptimizerSpec("rmsprop", "exponential", decay_factor=0.9, decay_steps=1)
    s = make_schedule(spec, 2.0)
    assert abs(float(s(3)) - 2.0 * 0.9**3) < 1e-5
    # linear warmup (test_model.py:186-196)
    s = make_schedule(OptimizerSpec("adam", "constant"), 1.0, 10, "linear")
    assert abs(float(s(5)) - 0.5) < 1e-5 and float(s(10)) == 1.0


def test_rmsprop_matches_torch():
    """optax rmsprop must use torch eps semantics: grad / (sqrt(v) + eps),
    eps OUTSIDE the sqrt (torch.optim.RMSprop; reference chexpert.py:499).
    With the reference's large eps=1e-3 the in-sqrt variant diverges badly
    for small-gradient params, changing EfficientNet dynamics."""
    import optax
    import torch

    rng = np.random.RandomState(0)
    p0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) * 10.0 ** rng.randint(-4, 1)
             for _ in range(4)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.RMSprop([tp], lr=1e-2, alpha=0.99, eps=1e-3, momentum=0.9)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    spec = OptimizerSpec("rmsprop")
    tx, _ = make_optimizer(spec, 1e-2)
    params = jnp.asarray(p0)
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_overfit_one_batch():
    """Convergence sanity mirror of the reference --mini_data debugging
    (chexpert.py:46): a tiny model must overfit one batch."""
    model = tiny_model()
    tx, sched = make_optimizer(OptimizerSpec("adam"), 1e-2)
    rng = np.random.RandomState(0)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    state = TrainState.create(params, stats, tx)
    mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    train_step, eval_step = jit_steps(model, tx, mesh)
    batch = jax.device_put(make_batch(rng), batch_sharding(mesh))
    state = jax.device_put(state, replicated(mesh))
    losses = []
    for _ in range(60):
        state, loss = train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses[::10]
    assert int(state.step) == 60


def test_masked_loss_ignores_padding():
    model = tiny_model()
    tx, _ = make_optimizer(OptimizerSpec("adam"), 1e-3)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    state = TrainState.create(params, stats, tx)
    mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    train_step, eval_step = jit_steps(model, tx, mesh)
    rng = np.random.RandomState(1)
    full = make_batch(rng, bs=4)
    # same 4 examples + 4 junk padded rows
    padded = {
        "image": jnp.concatenate([full["image"], 100 + jnp.zeros((4, 16, 16, 3))]),
        "label": jnp.concatenate([full["label"], jnp.ones((4, 5))]),
        "index": jnp.concatenate([full["index"], jnp.zeros(4, jnp.int64)]),
        "mask": jnp.concatenate([full["mask"], jnp.zeros(4)]),
    }
    state_r = jax.device_put(state, replicated(mesh))
    # eval path: running BN stats -> padded rows cannot affect real rows;
    # outputs/losses for the real rows must be identical.
    # (train path avoids padding entirely via drop_last — BN batch stats
    # would otherwise see the zero rows.)
    out_full, loss_full = eval_step(state_r, jax.device_put(full, batch_sharding(mesh)))
    out_padded, loss_padded = eval_step(state_r, jax.device_put(padded, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_padded)[:4], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(loss_full), np.asarray(loss_padded)[:4], rtol=1e-5
    )


def test_multi_device_data_parallel_matches_single():
    """Same batch, 1-device vs 8-device mesh -> same loss trajectory."""
    assert jax.device_count() >= 8
    model = tiny_model()
    tx, _ = make_optimizer(OptimizerSpec("adam"), 1e-3)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    rng = np.random.RandomState(2)
    batch = make_batch(rng, bs=8)

    losses = {}
    for n in (1, 8):
        mesh = create_mesh(n, 1, devices=jax.devices()[:n])
        train_step, _ = jit_steps(model, tx, mesh)
        host = jax.tree_util.tree_map(np.array, (params, stats))  # donation-safe copies
        state = jax.device_put(
            TrainState.create(host[0], host[1], tx), replicated(mesh)
        )
        b = jax.device_put(batch, batch_sharding(mesh))
        ls = []
        for _ in range(3):
            state, loss = train_step(state, b)
            ls.append(float(loss))
        losses[n] = ls
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-4)


def test_checkpoint_roundtrip(tmp_path):
    model = tiny_model()
    tx, _ = make_optimizer(OptimizerSpec("adam"), 1e-3)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    state = TrainState.create(params, stats, tx)
    # advance once so opt state is nontrivial
    mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    train_step, _ = jit_steps(model, tx, mesh)
    state = jax.device_put(state, replicated(mesh))
    state, _ = train_step(state, jax.device_put(make_batch(np.random.RandomState(0)),
                                                batch_sharding(mesh)))

    p = str(tmp_path / "checkpoint_latest.msgpack")
    save_model_checkpoint(p, state.params, state.batch_stats, int(state.step), 1.5, 0.9)
    save_optim_checkpoint(str(tmp_path / "optim.msgpack"), state.opt_state)

    fresh_params, fresh_stats = init_model(model, jax.random.PRNGKey(1), (1, 16, 16, 3))
    ck = load_model_checkpoint(p, fresh_params, fresh_stats)
    assert ck["global_step"] == 1 and ck["avg_auc"] == 0.9
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ck["params"], state.params,
    )
    opt = load_optim_checkpoint(str(tmp_path / "optim.msgpack"), state.opt_state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        opt, state.opt_state,
    )


def test_tracker_eviction_semantics(tmp_path):
    """Exact reference tracker behavior (chexpert.py:98-123): eviction of the
    lowest-AUC record, file-id reuse, only-save-if-better guard."""
    out = str(tmp_path)
    os.makedirs(os.path.join(out, "best_checkpoints"))
    saved = []

    def save(path):
        saved.append(os.path.basename(path))
        open(path, "w").write("x")

    # fill 3 slots (max_records=3)
    for i, aucv in enumerate([0.5, 0.7, 0.6]):
        update_tracker(out, step=i, eval_loss=1.0, avg_auc=aucv, save_best=save, max_records=3)
    assert saved == ["checkpoint_0.msgpack", "checkpoint_1.msgpack", "checkpoint_2.msgpack"]

    # worse than the minimum (0.5): not saved
    r = update_tracker(out, step=3, eval_loss=1.0, avg_auc=0.4, save_best=save, max_records=3)
    assert r is None and len(saved) == 3

    # better: evicts the 0.5 record and reuses its file id 0
    r = update_tracker(out, step=4, eval_loss=1.0, avg_auc=0.65, save_best=save, max_records=3)
    assert saved[-1] == "checkpoint_0.msgpack"

    data = np.atleast_2d(np.loadtxt(os.path.join(out, "checkpoints_tracker.csv"), skiprows=1))
    assert len(data) == 3
    # sorted descending by AvgAUC
    assert list(data[:, 3]) == sorted(data[:, 3], reverse=True)
    np.testing.assert_allclose(sorted(data[:, 3]), [0.6, 0.65, 0.7])


def test_multi_device_pallas_attention_matches_single():
    """The Pallas attention shard-maps itself over the data axis inside a
    sharded jit (pallas_call is GSPMD-opaque otherwise); loss trajectories
    must match the single-device run."""
    assert jax.device_count() >= 8
    model = DenseNet(8, (2, 2), 16, num_classes=5, dtype=jnp.float32,
                     attn=AttnParams(0.25, 0.25, 2, True, (16, 16)),
                     attn_impl="pallas")
    tx, _ = make_optimizer(OptimizerSpec("adam"), 1e-3)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 16, 16, 3))
    rng = np.random.RandomState(4)
    batch = make_batch(rng, bs=8)

    losses = {}
    for n in (1, 8):
        mesh = create_mesh(n, 1, devices=jax.devices()[:n])
        train_step, _ = jit_steps(model, tx, mesh)
        host = jax.tree_util.tree_map(np.array, (params, stats))
        state = jax.device_put(TrainState.create(host[0], host[1], tx), replicated(mesh))
        b = jax.device_put(batch, batch_sharding(mesh))
        ls = []
        for _ in range(2):
            state, loss = train_step(state, b)
            ls.append(float(loss))
        losses[n] = ls
    np.testing.assert_allclose(losses[1], losses[8], rtol=5e-4)


def test_cli_lr_decay_factor_reaches_schedule(tmp_path):
    """--lr_decay_factor must override the arch spec's exponential gamma
    (reference chexpert.py:54,500: the flag feeds ExponentialLR). Regression:
    the Runner used to drop cfg.lr_decay_factor and always use the spec
    default 0.97."""
    from chexpert_tpu.cli.chexpert import Runner
    from chexpert_tpu.configs import Config

    cfg = Config(model="efficientnet-b0", image_size=32, lr=1.0,
                 lr_decay_factor=0.5, output_dir=str(tmp_path),
                 compute_dtype="float32", batch_size=8)
    runner = Runner(cfg)
    assert runner.opt_spec.decay_factor == 0.5
    assert abs(float(runner.schedule(2)) - 1.0 * 0.5**2) < 1e-6
