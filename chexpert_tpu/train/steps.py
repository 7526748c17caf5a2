"""jit-compiled train / eval steps with GSPMD sharding.

One compiled graph per step kind; the TrainState is donated (params update
in-place in HBM), batches arrive batch-dim-sharded over the mesh 'data' axis,
and XLA inserts the gradient all-reduce. Loss math follows the reference hot
loop (/root/reference/chexpert.py:156-165): BCE-with-logits summed over
classes, meaned over the (global) batch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chexpert_tpu.data.chexpert import PIXEL_MEAN, PIXEL_STD
from chexpert_tpu.parallel.mesh import DATA_AXIS
from chexpert_tpu.train.loss import bce_with_logits, train_loss
from chexpert_tpu.train.state import TrainState


def device_augment(img: jnp.ndarray, rng, out_size: int) -> jnp.ndarray:
    """On-device random crop + horizontal flip, fused into the train step.

    The packed pipeline stores images with a crop margin; shipping the full
    stored uint8 tile and cropping here keeps augmentation on the TPU (one
    dynamic_slice + select per image) and out of the host's hot path.
    """
    B, S, _, C = img.shape
    margin = S - out_size
    r_top, r_left, r_flip = jax.random.split(rng, 3)
    tops = jax.random.randint(r_top, (B,), 0, margin + 1)
    lefts = jax.random.randint(r_left, (B,), 0, margin + 1)
    flips = jax.random.bernoulli(r_flip, 0.5, (B,))

    def one(im, t, l, f):
        c = jax.lax.dynamic_slice(im, (t, l, 0), (out_size, out_size, C))
        return jnp.where(f, c[:, ::-1], c)

    return jax.vmap(one)(img, tops, lefts, flips)


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


def make_train_step(model, tx: optax.GradientTransformation, seed: int = 0,
                    device_crop: Optional[int] = None):
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        base_rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        dropout_rng, aug_rng = jax.random.split(base_rng)
        image = batch["image"]
        if device_crop is not None and image.shape[1] > device_crop:
            image = device_augment(image, aug_rng, device_crop)
        image = prepare_image(image)

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


def jit_steps(model, tx, mesh: Mesh, seed: int = 0,
              device_crop: "Optional[int]" = None):
    """Compile train/eval steps against a mesh.

    State replicated; batch sharded on the data axis; state donated in train.
    The step bodies trace under mesh_context so mesh-aware kernels (the
    Pallas attention) can shard-map themselves over the data axis.
    """
    from chexpert_tpu.parallel.context import mesh_context

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    base_train = make_train_step(model, tx, seed, device_crop)
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
