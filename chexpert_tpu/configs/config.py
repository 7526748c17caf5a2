"""Frozen dataclass config with JSON round-trip.

Capability parity with the reference argparse flag surface
(/root/reference/chexpert.py:29-57) plus TPU-native knobs (mesh shape, dtype,
attention-kernel selection). The reference mutates ``args`` as run state
(``args.step``); here config is immutable and step lives in TrainState.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Any, Optional


@dataclass(frozen=True)
class Config:
    # --- actions (reference chexpert.py:31-36) ---
    train: bool = False
    evaluate_single_model: bool = False
    evaluate_ensemble: bool = False
    visualize: bool = False
    plot_roc: bool = False
    seed: int = 0

    # --- paths (reference chexpert.py:40-42) ---
    data_path: str = ""
    output_dir: str = ""
    restore: str = ""

    # --- model (reference chexpert.py:44) ---
    # densenet121 | aadensenet121 | resnet152 | aaresnet152 | efficientnet-b[0-7]
    model: str = "densenet121"

    # --- data params (reference chexpert.py:46-47) ---
    mini_data: Optional[int] = None
    resize: Optional[int] = None
    # JSON row filter dict (reference dataset.py data_filter, e.g.
    # '{"Frontal/Lateral": "Frontal"}')
    data_filter: str = ""

    # --- training params (reference chexpert.py:49-57) ---
    pretrained: bool = False
    batch_size: int = 16
    n_epochs: int = 1
    lr: float = 1e-4
    lr_warmup_steps: int = 0
    lr_decay_factor: float = 0.97
    log_interval: int = 50
    eval_interval: int = 300

    # --- uncertainty-label policy (reference dataset.py:119 TODO made real) ---
    # 'ones' (U-Ones, the reference default, dataset.py:141-142) or 'zeros'
    uncertain_policy: str = "ones"

    # --- TPU-native knobs (no reference equivalent) ---
    # compute dtype for conv/matmul activations; params stay float32
    compute_dtype: str = "bfloat16"
    # data-parallel mesh size; 0/None = all local devices
    data_parallel: int = 0
    # model-parallel mesh axis (kept N-D-ready; 1 for these CNN scales)
    model_parallel: int = 1
    # 'pallas' fused blockwise attention kernel or 'einsum' XLA reference path
    attn_impl: str = "pallas"
    # host pipeline workers (thread pool for JPEG decode)
    data_workers: int = 8
    # prefetch depth (batches resident on device ahead of compute)
    prefetch: int = 2
    # members per stacked-vmap ensemble pass; 0 = all K at once, auto-halving
    # on device OOM (eval/ensemble.py — K large archs @ 320^2 can exceed HBM)
    ensemble_member_chunk: int = 0
    # input image size after center crop (reference hardcodes 320, chexpert.py:69)
    image_size: int = 320
    # random-augmentation pipeline (flip + random crop), cf 'data_aug' runs
    data_aug: bool = False

    # decode-once packed uint8 cache for the training input pipeline (the
    # JPEG-per-epoch path cannot feed a TPU chip from few host cores)
    packed_cache: bool = False
    # with data_aug+packed_cache: run crop/flip on device instead of host
    # (host-side memmap crops measured faster on v5e; kept as an option)
    device_aug: bool = False
    # multi-process (TPU pod) mode: jax.distributed.initialize + hybrid
    # host-contiguous mesh; each process loads only its slice of the global
    # batch (batch_size stays the GLOBAL batch size)
    multihost: bool = False
    # capture a jax.profiler trace of the first training steps
    profile: bool = False
    # resume from output_dir/checkpoint_latest.msgpack automatically when
    # present (preemptible-TPU recovery; no explicit --restore needed)
    auto_resume: bool = False

    # number of best checkpoints tracked (reference save_checkpoint max_records=10)
    max_best_checkpoints: int = 10

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    # --- JSON round-trip (reference chexpert.py:81-88,437,450) ---
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=4)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            raw = json.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})


def resolve_output_dir(cfg: Config, now: Optional[str] = None) -> Config:
    """Default output dir = results/<UTC timestamp> (reference chexpert.py:440-442)."""
    if cfg.output_dir:
        return cfg
    if cfg.restore:
        raise RuntimeError("Must specify `output_dir` argument")
    import time

    stamp = now or time.strftime("%Y-%m-%d_%H-%M-%S", time.gmtime())
    return cfg.replace(output_dir=os.path.join("results", stamp))


def setup_output_dir(cfg: Config) -> None:
    """Create output_dir and vis/ plots/ best_checkpoints/ subdirs and persist
    config.json once (reference chexpert.py:444-450)."""
    os.makedirs(cfg.output_dir, exist_ok=True)
    for sub in ("vis", "plots", "best_checkpoints"):
        os.makedirs(os.path.join(cfg.output_dir, sub), exist_ok=True)
    cfg_path = os.path.join(cfg.output_dir, "config.json")
    from chexpert_tpu.utils.io import is_primary

    if not os.path.exists(cfg_path) and is_primary():
        cfg.save(cfg_path)
