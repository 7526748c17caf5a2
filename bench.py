"""Benchmark: DenseNet121 train step (fwd+bwd) images/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"mfu": ..., "sweep": {...}, "baseline": {...}}.

Default run sweeps batch sizes (16/32/64/128) and reports the best, plus
model-FLOPs utilization (MFU) from XLA's cost analysis of the compiled step.

vs_baseline grounding — the reference publishes no throughput numbers
(SURVEY.md §6), so two anchors replace the old unexplained constant:
 1. DOCUMENTED BOUND (used for vs_baseline): the reference runs torch-1.1
    fp32 on CUDA-9-era hardware (environment.yaml) — V100 class, fp32 peak
    15.7 TFLOP/s, no AMP in torch 1.1. Granting it a GENEROUS 40% fp32 MFU
    (dense convnets under cuDNN typically sit below ~35%), its images/sec is
    bounded by peak * MFU / train_flops_per_image, with the train FLOPs taken
    from XLA's cost analysis of OUR step (same per-image math). The bound
    deliberately favors the reference.
 2. MEASURED floor: scripts/measure_torch_baseline.py times the
    reference-equivalent torch train step on this host's CPU and records
    BASELINE_TORCH_CPU.json; reported alongside when present.

Run:  python bench.py [--batch 32] [--steps 20] [--image-size 320]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_FP32_PEAK = 15.7e12   # NVIDIA V100 fp32 peak FLOP/s (public spec)
REF_GENEROUS_MFU = 0.40    # generous MFU granted to the torch reference
TPU_V5E_BF16_PEAK = 197e12  # TPU v5e bf16 peak FLOP/s (public spec)


def _flops_per_step(lowered_compiled) -> float | None:
    """Total FLOPs of one compiled train step from XLA cost analysis."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca["flops"])
        return f if f > 0 else None
    except Exception:
        return None


def _measure(train_step, state, batch, steps: int):
    """Timed steps; value fetch = hard sync (block_until_ready alone has
    proven unreliable over the axon tunnel)."""
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = train_step(state, batch)
    final_loss = float(loss)
    dt = time.perf_counter() - t0
    return state, final_loss, dt


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=0,
                   help="single batch size; default 0 = sweep 16/32/64/128")
    p.add_argument("--steps", type=int, default=20)
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

    def make_batch(bs: int):
        b = {
            "image": jnp.asarray(
                np.random.RandomState(0).randn(bs, hw, hw, 3), jnp.float32
            ),
            "label": jnp.asarray(
                (np.random.RandomState(1).rand(bs, 5) > 0.5), jnp.float32
            ),
            "index": jnp.zeros((bs,), jnp.int32),
            "mask": jnp.ones((bs,), jnp.float32),
        }
        return jax.device_put(b, batch_sharding(mesh))

    batches = [args.batch] if args.batch else [16, 32, 64, 128]
    sweep, flops_per_img = {}, None
    for bs in batches:
        batch = make_batch(bs)
        if flops_per_img is None:
            f = _flops_per_step(train_step.lower(state, batch).compile())
            flops_per_img = f / bs if f else None
        state, loss = train_step(state, batch)  # compile
        first_loss = float(loss)
        for _ in range(args.warmup - 1):
            state, loss = train_step(state, batch)
        float(loss)  # sync
        # bound sweep wall-clock: fewer timed steps at large batches; take
        # the best of two timing passes (the tunneled dev platform's first
        # pass after a compile can be cold by 10-15%)
        steps = max(6, min(args.steps, 480 // bs)) if not args.batch else args.steps
        best_dt = None
        for _ in range(2):
            state, final_loss, dt = _measure(train_step, state, batch, steps)
            best_dt = dt if best_dt is None else min(best_dt, dt)
        sweep[bs] = round(bs * steps / best_dt, 2)
        # guards: a benchmark of a broken step is meaningless. The learning
        # check compares first vs final loss on the SAME batch (the repeated
        # steps above must overfit it)
        assert np.isfinite(final_loss), f"non-finite loss at batch {bs}"
        assert final_loss < first_loss, (
            f"train step not learning at batch {bs}: {first_loss} -> {final_loss}"
        )

    best_bs = max(sweep, key=sweep.get)
    img_s = sweep[best_bs]
    mfu = (
        round(img_s * flops_per_img / TPU_V5E_BF16_PEAK, 4)
        if flops_per_img else None
    )

    baseline = {
        "basis": "V100 fp32 peak (15.7 TFLOP/s) x generous 40% MFU / "
                 "train FLOPs per image from XLA cost analysis "
                 "(torch-1.1 CUDA-9 reference era, fp32, no AMP)",
    }
    if flops_per_img:
        baseline["ref_bound_img_s"] = round(
            V100_FP32_PEAK * REF_GENEROUS_MFU / flops_per_img, 1
        )
        baseline["train_gflops_per_image"] = round(flops_per_img / 1e9, 2)
    cpu_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_TORCH_CPU.json")
    if os.path.exists(cpu_json):
        baseline["measured_torch_cpu_img_s"] = json.load(open(cpu_json))["img_s"]

    vs = round(img_s / baseline["ref_bound_img_s"], 3) if flops_per_img else None
    print(
        json.dumps(
            {
                "metric": f"{args.model} train fwd+bwd images/sec/chip "
                          f"(best of batch sweep {batches}, {hw}x{hw}, bf16)",
                "value": img_s,
                "unit": "images/sec",
                "vs_baseline": vs,
                "best_batch": best_bs,
                "mfu": mfu,
                "sweep": sweep,
                "baseline": baseline,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
