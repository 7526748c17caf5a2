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
    # multi-process meshes must cover every device: a truncated mesh leaves
    # some hosts with zero addressable mesh devices, which the per-host
    # batch slicing (and make_array_from_process_local_data) cannot serve.
    # Single-process debugging may use a subset (same as create_mesh).
    if jax.process_count() > 1:
        assert data_parallel * model_parallel == n, (
            f"data_parallel*model_parallel = {data_parallel * model_parallel} "
            f"must equal the global device count {n} in multihost mode"
        )
    grid = np.array(devices[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def host_batch_slice(global_batch_size: int) -> slice:
    """This process's contiguous slice of the global batch (per-host data
    loading: each host reads only its shard's examples). Assumes the default
    mesh layout; prefer host_batch_slice_from_mesh for explicit shapes."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def host_batch_slice_from_mesh(mesh: Mesh, global_batch_size: int) -> slice:
    """This process's batch slice derived from the mesh's ACTUAL data-axis
    layout, validating the assumptions per-host loading relies on: every
    data-axis row lives on one process (model_parallel must divide the
    per-host device count) and this process's rows are contiguous. An
    explicit --data_parallel/--model_parallel that violates either fails
    loudly here instead of misaligning host data with the sharding."""
    dp = mesh.shape[DATA_AXIS]
    assert global_batch_size % dp == 0, (global_batch_size, dp)
    per_row = global_batch_size // dp
    grid = mesh.devices.reshape(dp, -1)
    me = jax.process_index()
    rows = []
    for i in range(dp):
        procs = {d.process_index for d in grid[i]}
        assert len(procs) == 1, (
            f"data-axis row {i} spans processes {sorted(procs)}: "
            "model_parallel must divide the per-host device count so batch "
            "rows stay host-local"
        )
        if procs.pop() == me:
            rows.append(i)
    assert rows, f"process {me} owns no data-axis rows of the mesh"
    assert rows == list(range(rows[0], rows[0] + len(rows))), (
        f"process {me}'s data rows {rows} are not contiguous; per-host batch "
        "slicing requires host-contiguous data-axis ordering"
    )
    return slice(rows[0] * per_row, (rows[-1] + 1) * per_row)
