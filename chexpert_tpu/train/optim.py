"""Optax optimizers + schedules matching the reference per-arch choices.

Reference semantics preserved:
  * chexpert.py warmup (chexpert.py:165, flag :53): the scheduler is simply
    not stepped until step >= lr_warmup_steps — lr stays at base during
    warmup, then the decay clock starts ('hold' warmup).
  * MultiStepLR [40000, 60000] gamma 0.1 for aadensenet121 (chexpert.py:480)
  * ExponentialLR(gamma=lr_decay_factor) stepped per batch for efficientnet
    (chexpert.py:500)
  * the CIFAR bench uses linear warmup + cosine / staircase-exponential /
    multistep (models/test_model.py:175-196, 283-312)
"""

from __future__ import annotations

from typing import Callable, Optional

import optax

from chexpert_tpu.models.registry import OptimizerSpec


def make_schedule(
    spec: OptimizerSpec,
    base_lr: float,
    warmup_steps: int = 0,
    warmup_style: str = "hold",  # 'hold' (chexpert.py) | 'linear' (test bench)
    cosine_decay_steps: Optional[int] = None,
) -> Callable:
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_style == "linear" and warmup_steps > 0:
            warm = base_lr * step / warmup_steps
        else:
            warm = jnp.asarray(base_lr, jnp.float32)
        eff = jnp.maximum(step - warmup_steps, 0.0)
        if spec.schedule == "constant":
            lr = jnp.asarray(base_lr, jnp.float32)
        elif spec.schedule == "multistep":
            # torch MultiStepLR default gamma = 0.1
            n_hit = sum((eff >= m).astype(jnp.float32) for m in spec.milestones)
            lr = base_lr * jnp.power(0.1, n_hit)
        elif spec.schedule == "exponential":
            # per-step decay (chexpert.py:500 steps each batch); staircase when
            # decay_steps > 1 (test_model.py:175-184, tf.train.exponential_decay)
            lr = base_lr * jnp.power(spec.decay_factor, jnp.floor(eff / spec.decay_steps))
        elif spec.schedule == "cosine":
            assert cosine_decay_steps
            frac = jnp.minimum(eff / cosine_decay_steps, 1.0)
            lr = 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * frac))
        else:
            raise ValueError(spec.schedule)
        return jnp.where(step < warmup_steps, warm, lr)

    return schedule


def make_optimizer(
    spec: OptimizerSpec,
    base_lr: float,
    warmup_steps: int = 0,
    warmup_style: str = "hold",
    cosine_decay_steps: Optional[int] = None,
) -> tuple[optax.GradientTransformation, Callable]:
    schedule = make_schedule(spec, base_lr, warmup_steps, warmup_style, cosine_decay_steps)
    if spec.kind == "adam":
        tx = optax.adam(schedule)  # torch Adam defaults: b1 .9 b2 .999 eps 1e-8
    elif spec.kind == "sgd_nesterov":
        tx = optax.sgd(schedule, momentum=spec.momentum, nesterov=True)
    elif spec.kind == "rmsprop":
        # torch RMSprop: alpha (decay) .99, momentum .9, and eps added OUTSIDE
        # the sqrt (grad / (sqrt(v) + eps)); optax defaults to eps_in_sqrt=True
        # (rsqrt(v + eps)), which with the reference's large eps=1e-3 diverges
        # badly for small-gradient params — pin torch semantics explicitly
        tx = optax.rmsprop(
            schedule, decay=0.99, eps=spec.eps, momentum=spec.momentum,
            eps_in_sqrt=False,
        )
    else:
        raise ValueError(spec.kind)
    if spec.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(spec.weight_decay), tx)
    return tx, schedule
