"""Checkpoint serialization (msgpack via flax.serialization).

File layout mirrors the reference (chexpert.py:90-123, 504-518):
  * checkpoint_latest.msgpack        — model weights + step/eval metadata
  * optim_checkpoint_latest.msgpack  — optimizer state
  * best_checkpoints/checkpoint_<id>.msgpack — tracked best-K weights
No scheduler file: optax schedules here are pure functions of the step, so
the step integer IS the scheduler state (the reference saves a separate
sched_checkpoint_latest.pt; restoring step reproduces it exactly).

Writes are atomic (tmp + rename) so a preempted host never leaves a torn
checkpoint — the failure-recovery contract is resume-from-latest.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import flax.serialization as fser
import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_model_checkpoint(
    path: str,
    params: Any,
    batch_stats: Any,
    global_step: int,
    eval_loss: float = float("nan"),
    avg_auc: float = float("nan"),
) -> None:
    payload = {
        "global_step": np.int64(global_step),
        "eval_loss": np.float64(eval_loss),
        "avg_auc": np.float64(avg_auc),
        "params": fser.to_state_dict(_to_host(params)),
        "batch_stats": fser.to_state_dict(_to_host(batch_stats)),
    }
    _atomic_write(path, fser.msgpack_serialize(payload))


def load_model_checkpoint(path: str, params_template=None, batch_stats_template=None) -> Dict:
    if path.endswith(".pt"):
        # interop: reference-produced torch checkpoints (chexpert.py:187-193
        # format: {'global_step','eval_loss','avg_auc','state_dict'}) load
        # directly via the torchvision weight converter — a reference user's
        # trained models migrate without retraining
        return _load_torch_checkpoint(path, params_template, batch_stats_template)
    with open(path, "rb") as f:
        payload = fser.msgpack_restore(f.read())
    out = {
        "global_step": int(payload["global_step"]),
        "eval_loss": float(payload["eval_loss"]),
        "avg_auc": float(payload["avg_auc"]),
        "params": payload["params"],
        "batch_stats": payload["batch_stats"],
    }
    if params_template is not None:
        out["params"] = fser.from_state_dict(params_template, payload["params"])
    if batch_stats_template is not None:
        out["batch_stats"] = fser.from_state_dict(batch_stats_template, payload["batch_stats"])
    return out


def _load_torch_checkpoint(path: str, params_template, batch_stats_template) -> Dict:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = raw.get("state_dict", raw)
    sd = {k: v.numpy() for k, v in sd.items()}
    assert params_template is not None and batch_stats_template is not None, (
        ".pt interop needs params/batch_stats templates to map into"
    )
    # infer arch family for key normalization
    arch = "densenet" if any("denseblock" in k for k in sd) else "resnet"
    from chexpert_tpu.models.pretrained import convert_torch_state_dict

    params, stats = convert_torch_state_dict(
        sd, params_template, batch_stats_template, arch, include_head=True
    )
    return {
        "global_step": int(raw.get("global_step", 0)),
        "eval_loss": float(raw.get("eval_loss", float("nan"))),
        "avg_auc": float(raw.get("avg_auc", float("nan"))),
        "params": params,
        "batch_stats": stats,
    }


def save_optim_checkpoint(path: str, opt_state: Any) -> None:
    _atomic_write(path, fser.msgpack_serialize(fser.to_state_dict(_to_host(opt_state))))


def load_optim_checkpoint(path: str, opt_state_template: Any) -> Any:
    with open(path, "rb") as f:
        payload = fser.msgpack_restore(f.read())
    return fser.from_state_dict(opt_state_template, payload)
