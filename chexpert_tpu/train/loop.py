"""Train / evaluate driver loops.

Behavioral parity with the reference loops (/root/reference/chexpert.py:
152-255): per-step BCE loss, scalar logging every log_interval, inline
eval + best-K checkpointing every eval_interval, post-epoch eval with
eval_results_step_N.json. TPU-native differences: one donated jit graph per
step, device-prefetched sharded batches, and masked padding instead of
ragged final batches.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Tuple

import jax
import numpy as np

from chexpert_tpu.checkpoint import (
    save_model_checkpoint,
    save_optim_checkpoint,
    update_tracker,
)
from chexpert_tpu.configs import Config
from chexpert_tpu.data.pipeline import Batches, device_prefetch
from chexpert_tpu.eval.metrics import avg_auc, compute_metrics, sum_loss
from chexpert_tpu.parallel.mesh import batch_sharding
from chexpert_tpu.train.state import TrainState
from chexpert_tpu.utils import MetricsWriter, save_json


def _host_rows(x) -> np.ndarray:
    """Batch rows addressable on this process, as one numpy array.

    Single-process (fully addressable) arrays convert directly; in
    multi-process mode only this host's shards are fetched, in batch order
    (the hybrid mesh keeps each host's rows contiguous)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    # dedupe model-axis replicas: with model_parallel > 1 several local
    # devices hold identical row shards (same index[0]) — keep one each
    shards = {s.index[0].start or 0: s for s in x.addressable_shards}
    return np.concatenate([np.asarray(shards[k].data) for k in sorted(shards)])


def evaluate(eval_step, state: TrainState, batches: Batches, mesh) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full pass collecting (outputs, targets, losses); padding masked out.
    (reference evaluate, chexpert.py:198-211)

    Multi-process: each host collects its local rows; full (unmasked) arrays
    are allgathered across processes — equal shape per host — and the padding
    mask is applied after, so every host computes identical global metrics."""
    outs, targets, losses, masks = [], [], [], []
    for batch in device_prefetch(batches, batch_sharding(mesh)):
        out, per_elem = eval_step(state, batch)
        outs.append(_host_rows(out))
        targets.append(_host_rows(batch["label"]))
        losses.append(_host_rows(per_elem))
        masks.append(_host_rows(batch["mask"]))
    outs, targets, losses, mask = (
        np.concatenate(outs), np.concatenate(targets),
        np.concatenate(losses), np.concatenate(masks),
    )
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        outs, targets, losses, mask = (
            multihost_utils.process_allgather(a, tiled=True)
            for a in (outs, targets, losses, mask)
        )
    keep = mask.astype(bool)
    return outs[keep], targets[keep], losses[keep]


def evaluate_single_model(eval_step, state, batches, mesh) -> Dict:
    outputs, targets, losses = evaluate(eval_step, state, batches, mesh)
    return compute_metrics(outputs, targets, losses)


def _log_eval(writer: MetricsWriter, metrics: Dict, step: int) -> None:
    writer.add_scalar("eval_loss", sum_loss(metrics), step)
    for k, v in metrics["aucs"].items():
        writer.add_scalar(f"eval_auc_class_{k}", v, step)


def _checkpoint(cfg: Config, state: TrainState, metrics: Dict, step: int) -> None:
    """latest + tracked best-K (reference save_checkpoint, chexpert.py:90-123).

    Multi-process: state is replicated and metrics identical on every host
    (evaluate allgathers) — the primary writes, others skip."""
    from chexpert_tpu.utils.io import is_primary

    if not is_primary():
        return
    eval_loss = sum_loss(metrics)
    auc_mean = avg_auc(metrics)
    save_model_checkpoint(
        os.path.join(cfg.output_dir, "checkpoint_latest.msgpack"),
        state.params, state.batch_stats, step, eval_loss, auc_mean,
    )
    save_optim_checkpoint(
        os.path.join(cfg.output_dir, "optim_checkpoint_latest.msgpack"), state.opt_state
    )
    update_tracker(
        cfg.output_dir, step, eval_loss, auc_mean,
        save_best=lambda p: save_model_checkpoint(
            p, state.params, state.batch_stats, step, eval_loss, auc_mean
        ),
        max_records=cfg.max_best_checkpoints,
    )


def train_epoch(
    cfg: Config,
    train_step,
    eval_step,
    state: TrainState,
    train_batches: Batches,
    valid_batches: Batches,
    schedule,
    writer: MetricsWriter,
    mesh,
    epoch: int,
    log_fn=print,
) -> TrainState:
    """(reference train_epoch, chexpert.py:152-196)"""
    t0, imgs, local = time.time(), 0, 0
    # host-side mirror of the device step counter: fetching the replicated
    # scalar per step costs a device round-trip
    step = int(state.step)
    # profiling hooks (SURVEY.md §5): trace 10 steady-state steps of epoch 0
    prof_start, prof_stop = (3, 13) if (cfg.profile and epoch == 0) else (-1, -1)
    for batch in device_prefetch(train_batches, batch_sharding(mesh), depth=cfg.prefetch):
        if local == prof_start:
            trace_dir = os.path.join(cfg.output_dir, "profile")
            log_fn(f"Capturing profiler trace to {trace_dir}")
            jax.profiler.start_trace(trace_dir)
        state, loss = train_step(state, batch)
        local += 1
        if local == prof_stop:
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
        step += 1
        # train drops partial batches, so every batch is full (and summing the
        # device-resident mask would force a per-step transfer)
        imgs += int(batch["mask"].shape[0])

        if cfg.log_interval and step % cfg.log_interval == 0:
            loss_val = float(loss)
            lr = float(schedule(step - 1))
            dt = time.time() - t0
            ips = imgs / dt if dt > 0 else 0.0
            writer.add_scalar("train_loss", loss_val, step)
            writer.add_scalar("lr", lr, step)
            writer.add_scalar("images_per_sec", ips, step)
            log_fn(
                f"epoch {epoch + 1}/{cfg.n_epochs} step {step} "
                f"loss {loss_val:.4f} lr {lr:.3e} {ips:.1f} img/s"
            )
            t0, imgs = time.time(), 0

        if cfg.eval_interval and step % cfg.eval_interval == 0:
            metrics = evaluate_single_model(eval_step, state, valid_batches, mesh)
            _log_eval(writer, metrics, step)
            _checkpoint(cfg, state, metrics, step)
    if prof_start >= 0 and prof_start < local < prof_stop:
        jax.profiler.stop_trace()  # epoch shorter than the trace window
    return state


def train_and_evaluate(
    cfg: Config,
    train_step,
    eval_step,
    state: TrainState,
    make_train_batches,
    valid_batches: Batches,
    schedule,
    writer: MetricsWriter,
    mesh,
    log_fn=print,
) -> TrainState:
    """(reference train_and_evaluate, chexpert.py:238-255).

    make_train_batches(epoch) -> Batches, so shuffling reseeds per epoch.
    """
    for epoch in range(cfg.n_epochs):
        state = train_epoch(
            cfg, train_step, eval_step, state, make_train_batches(epoch),
            valid_batches, schedule, writer, mesh, epoch, log_fn,
        )
        metrics = evaluate_single_model(eval_step, state, valid_batches, mesh)
        step = int(state.step)
        log_fn(f"Evaluate metrics @ step {step}:")
        log_fn("AUC: " + str(metrics["aucs"]))
        log_fn("Loss: " + str(metrics["loss"]))
        _log_eval(writer, metrics, step)
        save_json(metrics, f"eval_results_step_{step}", cfg.output_dir)
    return state
