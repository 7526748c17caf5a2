"""Multi-host (multi-process) support.

The reference is strictly single-process (SURVEY.md §2.6). For TPU pods the
framework scales with jax.distributed + a hybrid (dcn, data, model) mesh:
per-host data loading feeds the host's addressable shard of the global
batch; GSPMD keeps gradient all-reduce on ICI within a slice and crosses DCN
only for the leading axis.

This module is exercised in single-process mode in CI (initialize() is a
no-op there); pod execution follows the standard JAX multi-process contract:

    python -m chexpert_tpu.cli.chexpert --train --multihost ...
run on every host (TPU runtime env vars supply coordinator/process ids).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from chexpert_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var defaults; no-op when already
    initialized or single-process."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # single-process / no coordinator configured


def create_hybrid_mesh(data_parallel: int = 0, model_parallel: int = 1) -> Mesh:
    """(data, model) mesh over ALL processes' devices.

    Device order groups each host's local devices contiguously on the data
    axis, so the batch shards a host feeds stay host-local (DCN only carries
    the gradient reduction for cross-host slices).
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel <= 0:
        assert n % model_parallel == 0
        data_parallel = n // model_parallel
    grid = np.array(devices[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def host_batch_slice(global_batch_size: int) -> slice:
    """This process's contiguous slice of the global batch (per-host data
    loading: each host reads only its shard's examples)."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
