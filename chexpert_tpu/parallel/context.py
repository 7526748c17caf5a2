"""Trace-time mesh context.

Pallas kernels are opaque custom calls to the GSPMD partitioner: under a
sharded jit, their operands get all-gathered unless the kernel is explicitly
mapped over the mesh. The step functions enter `mesh_context(mesh)` while
tracing, and batch-parallel kernels (the flash attention) read
`active_mesh()` to wrap themselves in `shard_map` over the data axis —
keeping per-chip work per-chip on multi-chip meshes, a no-op on 1-device
meshes.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

from jax.sharding import Mesh

_state = threading.local()


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def mesh_context(mesh: Optional[Mesh]):
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = prev
