"""jit-compiled train / eval steps with GSPMD sharding.

One compiled graph per step kind; the TrainState is donated (params update
in-place in HBM), batches arrive batch-dim-sharded over the mesh 'data' axis,
and XLA inserts the gradient all-reduce. Loss math follows the reference hot
loop (/root/reference/chexpert.py:156-165): BCE-with-logits summed over
classes, meaned over the (global) batch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chexpert_tpu.data.chexpert import PIXEL_MEAN, PIXEL_STD
from chexpert_tpu.parallel.mesh import DATA_AXIS
from chexpert_tpu.train.loss import bce_with_logits, train_loss
from chexpert_tpu.train.state import TrainState


def prepare_image(x: jnp.ndarray) -> jnp.ndarray:
    """On-device input prep. uint8 single-channel batches arrive raw (packed
    pipeline: 12x less H2D than f32 3-channel); normalize + expand here so
    XLA fuses it into the first conv. float32 batches arrive pre-normalized
    (JPEG pipeline) and pass through."""
    if x.dtype == jnp.uint8:
        x = (x.astype(jnp.float32) / 255.0 - PIXEL_MEAN) / PIXEL_STD
    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
    return x


def make_train_step(model, tx: optax.GradientTransformation, seed: int = 0):
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        image = prepare_image(batch["image"])

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = train_loss(out, batch["label"], batch["mask"],
                              batch.get("label_mask"))
            return loss, mutated["batch_stats"]

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss

    return train_step


def make_eval_step(model):
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            prepare_image(batch["image"]),
            train=False,
        )
        per_elem = bce_with_logits(out, batch["label"])  # (B, C), reduction='none'
        return out.astype(jnp.float32), per_elem

    return eval_step


def jit_steps(model, tx, mesh: Mesh, seed: int = 0):
    """Compile train/eval steps against a mesh.

    State replicated; batch sharded on the data axis; state donated in train.
    The step bodies trace under mesh_context so mesh-aware kernels (the
    Pallas attention) can shard-map themselves over the data axis.
    """
    from chexpert_tpu.parallel.context import mesh_context

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    base_train = make_train_step(model, tx, seed)
    base_eval = make_eval_step(model)

    def train_with_mesh(state, batch):
        with mesh_context(mesh):
            return base_train(state, batch)

    def eval_with_mesh(state, batch):
        with mesh_context(mesh):
            return base_eval(state, batch)

    train_step = jax.jit(
        train_with_mesh,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(
        eval_with_mesh,
        in_shardings=(repl, data),
        out_shardings=(data, data),
    )
    return train_step, eval_step
