"""Probe: raise the TPU scoped-VMEM limit for the aaresnet152 train step.

XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=... aborts under the tunneled dev
platform (the CLIENT-side flag parser rejects TPU-only flags), so this passes
the flag per-compile via the AOT path's compiler_options instead — which
ships it inside the compile request to the server-side TPU compiler.

Pairs with CHEXPERT_ATTN_VMEM_MB to let _geometry pick bigger groups/tiles:

    CHEXPERT_ATTN_VMEM_MB=28 python scripts/try_scoped_vmem.py [kib=32768]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from chexpert_tpu.models import build_model
    from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from chexpert_tpu.train import TrainState, init_model, jit_steps, make_optimizer
    from chexpert_tpu.utils.io import enable_compilation_cache

    enable_compilation_cache()
    kib = 16384
    for a in sys.argv[1:]:
        if a.startswith("kib="):
            kib = int(a.split("=", 1)[1])
    B = int(os.environ.get("CHEXPERT_PROFILE_BATCH", "16"))
    arch = os.environ.get("CHEXPERT_PROFILE_ARCH", "aaresnet152")
    print(f"devices: {jax.devices()}  arch={arch} B={B} scoped_vmem={kib} KiB "
          f"attn_budget={os.environ.get('CHEXPERT_ATTN_VMEM_MB', '14')} MB")

    model, spec = build_model(arch)
    tx, _ = make_optimizer(spec, 1e-4)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 320, 320, 3))
    state = TrainState.create(params, stats, tx)
    mesh = create_mesh(1, 1, devices=[jax.devices()[0]])
    train_step, _ = jit_steps(model, tx, mesh)
    state = jax.device_put(state, replicated(mesh))
    batch = jax.device_put(
        {
            "image": jnp.asarray(np.random.RandomState(0).randn(B, 320, 320, 3), jnp.float32),
            "label": jnp.asarray((np.random.RandomState(1).rand(B, 5) > 0.5), jnp.float32),
            "index": jnp.zeros((B,), jnp.int32),
            "mask": jnp.ones((B,), jnp.float32),
        },
        batch_sharding(mesh),
    )

    lowered = train_step.lower(state, batch)
    try:
        compiled = lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)})
    except Exception as e:  # compiler_options unsupported / flag rejected
        print(f"compiler_options rejected: {type(e).__name__}: {e}")
        return 1

    state2, loss = compiled(state, batch)
    float(loss)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state2, loss = compiled(state2, batch)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"{arch} train step (scoped_vmem {kib} KiB): "
          f"{dt*1e3:.1f} ms = {B/dt:.1f} img/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
