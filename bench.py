"""Benchmark: DenseNet121 train step (fwd+bwd) images/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY.md §6); its era/hardware
is a single CUDA-9 GPU (environment.yaml). vs_baseline is computed against a
documented estimate of the reference's throughput — REF_BASELINE_IMG_S below —
for torch-1.1 densenet121, 320x320, batch 16 on a V100-class GPU. The
BASELINE.json north star is >=5x images/sec/chip.

Run:  python bench.py [--batch 32] [--steps 20] [--image-size 320]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Documented estimate of the PyTorch reference's single-GPU throughput
# (densenet121, 320x320, batch 16, fwd+bwd, V100-era hardware).
REF_BASELINE_IMG_S = 100.0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--image-size", type=int, default=320)
    p.add_argument("--model", default="densenet121")
    args = p.parse_args()

    from chexpert_tpu.models import build_model
    from chexpert_tpu.utils.io import enable_compilation_cache
    enable_compilation_cache()

    from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from chexpert_tpu.train import TrainState, init_model, jit_steps, make_optimizer

    dev = jax.devices()[0]
    model, spec = build_model(args.model, image_size=args.image_size)
    tx, _ = make_optimizer(spec, 1e-4)

    rng = jax.random.PRNGKey(0)
    hw = args.image_size
    params, stats = init_model(model, rng, (1, hw, hw, 3))
    state = TrainState.create(params, stats, tx)

    mesh = create_mesh(1, 1, devices=[dev])
    train_step, _ = jit_steps(model, tx, mesh)
    state = jax.device_put(state, replicated(mesh))

    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(args.batch, hw, hw, 3), jnp.float32
        ),
        "label": jnp.asarray(
            (np.random.RandomState(1).rand(args.batch, 5) > 0.5), jnp.float32
        ),
        "index": jnp.zeros((args.batch,), jnp.int32),
        "mask": jnp.ones((args.batch,), jnp.float32),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))

    state, loss = train_step(state, batch)
    first_loss = float(loss)
    for _ in range(args.warmup - 1):
        state, loss = train_step(state, batch)
    warm_loss = float(loss)  # value fetch = hard sync (block_until_ready
    #                          alone has proven unreliable over the tunnel)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = train_step(state, batch)
    final_loss = float(loss)
    dt = time.perf_counter() - t0
    # guard: a benchmark of a broken step is meaningless
    assert np.isfinite(final_loss) and final_loss < first_loss, (
        f"train step not learning: {first_loss} -> {final_loss}"
    )

    img_s = args.batch * args.steps / dt
    print(
        json.dumps(
            {
                "metric": f"{args.model} train fwd+bwd images/sec/chip "
                          f"(batch {args.batch}, {hw}x{hw}, bf16)",
                "value": round(img_s, 2),
                "unit": "images/sec",
                "vs_baseline": round(img_s / REF_BASELINE_IMG_S, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
