"""Device mesh + sharding helpers.

The reference is single-device PyTorch (no DataParallel/torch.distributed
anywhere — see SURVEY.md §2.6). The TPU-native framework scales via a
`jax.sharding.Mesh` with a (data, model) axis layout: batches are sharded on
'data', parameters replicated (model axis kept size-1/N-D-ready for these CNN
scales). Gradient all-reduce is implicit: XLA GSPMD inserts ICI collectives
for the mean over the sharded batch axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    data_parallel: int = 0,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    data_parallel=0 means "use all remaining devices on the data axis".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel <= 0:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    use = data_parallel * model_parallel
    assert use <= n, f"mesh {data_parallel}x{model_parallel} needs {use} devices, have {n}"
    grid = np.array(devices[:use]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree of arrays on-device, batch-dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
