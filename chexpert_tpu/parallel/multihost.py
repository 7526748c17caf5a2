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

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from chexpert_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Env signals that a MULTI-process launch is configured (jax's own override
# vars, plus the TPU-pod / SLURM / OpenMPI cluster detectors that
# jax.distributed.initialize consults). If one is present, an init failure
# means a BROKEN pod launch — degrading to single-process would let N
# independent trainers race on one output_dir behind the primary-only write
# gating. Single-host values (e.g. TPU_WORKER_HOSTNAMES=localhost on a dev
# box, SLURM_NTASKS=1) do NOT count.
_COORDINATOR_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)
_NPROC_ENV_VARS = ("JAX_NUM_PROCESSES", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE")


def cluster_env_configured() -> bool:
    if any(os.environ.get(v) for v in _COORDINATOR_ENV_VARS):
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    for v in _NPROC_ENV_VARS:
        try:
            if int(os.environ.get(v, "")) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var defaults.

    No-op when already initialized, or when nothing in the environment (and
    no explicit args) configures a cluster — the single-process dev/CI case.
    When a coordinator IS configured (explicit args or cluster env vars) an
    init failure RAISES instead of silently degrading to process_count()==1,
    which would bypass every primary-only gate downstream."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    configured = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or cluster_env_configured()
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if configured:
            raise
        # single-process: no coordinator configured anywhere


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
