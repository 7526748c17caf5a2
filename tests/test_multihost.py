"""Multi-host helpers in single-process mode."""

import jax
import numpy as np

from chexpert_tpu.parallel.multihost import (
    create_hybrid_mesh,
    host_batch_slice,
    initialize,
)


def test_initialize_single_process_noop():
    initialize()  # must not raise without a coordinator
    assert jax.process_count() == 1


def test_hybrid_mesh_single_process():
    mesh = create_hybrid_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # host-contiguous device order on the data axis
    procs = [d.process_index for d in mesh.devices.flatten()]
    assert procs == sorted(procs)


def test_host_batch_slice():
    sl = host_batch_slice(64)
    assert sl == slice(0, 64)  # single process owns the whole batch
