"""Profile aaresnet152's attention layers on the real TPU.

aaresnet152 (320x320 input, reference attn_aug_conv.py:241-244 rule) runs
attention in layers 2-4 with per-stage geometries:

    stage   blocks  H x W   HW    width  dkh  dvh
    layer2       8  40x40  1600    128    20    1
    layer3      36  20x20   400    256    20    3
    layer4       3  10x10   100    512    20    6

This script times fwd and fwd+bwd of the attention op (pallas vs einsum) at
each geometry, plus the full aaresnet152 train step, to locate where the
~100 img/s (README) goes.  Run on a TPU host:  python scripts/profile_aaresnet.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def time_fn(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def bench_geometry(B, nh, H, W, dkh, dvh, n_blocks, repeats=None):
    """Times one attention op by chaining `repeats` applications inside a
    single jit (out feeds v — shapes match), amortizing the ~30 ms
    per-dispatch round-trip of the tunneled dev platform."""
    from chexpert_tpu.ops.attention import aa_attention_einsum
    from chexpert_tpu.ops.pallas_attention import aa_attention_pallas

    rng = np.random.RandomState(0)
    hw = H * W
    R = repeats or max(8, min(100, int(40_000_000 / (B * nh * hw * hw // 100))))
    q = jnp.asarray(rng.randn(B, nh, hw, dkh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, nh, hw, dkh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, nh, hw, dvh), jnp.bfloat16)
    rw = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rh = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)

    def chain(op):
        def fn(q, k, v, rw, rh):
            def body(vv, _):
                return op(q, k, vv, rw, rh), None
            out, _ = jax.lax.scan(body, v, None, length=R)
            return out
        return fn

    p_op = lambda q, k, v, rw, rh: aa_attention_pallas(q, k, v, rw, rh, H, W)
    e_op = lambda q, k, v, rw, rh: aa_attention_einsum(q, k, v, rw, rh, H, W)[0]

    pallas_f = jax.jit(chain(p_op))
    einsum_f = jax.jit(chain(e_op))
    pallas_g = jax.jit(jax.grad(
        lambda *a: chain(p_op)(*a).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    einsum_g = jax.jit(jax.grad(
        lambda *a: chain(e_op)(*a).astype(jnp.float32).sum(), argnums=(0, 1, 2)))

    args = (q, k, v, rw, rh)
    tp = time_fn(pallas_f, *args, iters=3) / R
    te = time_fn(einsum_f, *args, iters=3) / R
    tpg = time_fn(lambda *a: pallas_g(*a)[0], *args, iters=3) / R
    teg = time_fn(lambda *a: einsum_g(*a)[0], *args, iters=3) / R
    print(
        f"HW={hw:5d} dkh={dkh} dvh={dvh} x{n_blocks:2d} blocks (R={R}) | "
        f"fwd pallas {tp*1e3:7.2f} ms einsum {te*1e3:7.2f} ms | "
        f"fwd+bwd pallas {tpg*1e3:7.2f} ms einsum {teg*1e3:7.2f} ms | "
        f"stage fwd+bwd pallas {n_blocks*tpg*1e3:7.1f} ms einsum {n_blocks*teg*1e3:7.1f} ms"
    )
    return n_blocks * tpg, n_blocks * teg


def bench_model(B=16, attn_impl="pallas", model_name="aaresnet152", iters=10, size=320):
    from chexpert_tpu.models import build_model
    from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from chexpert_tpu.train import TrainState, init_model, jit_steps, make_optimizer

    model, spec = build_model(model_name, image_size=size, attn_impl=attn_impl)
    tx, _ = make_optimizer(spec, 1e-4)
    rng = jax.random.PRNGKey(0)
    params, stats = init_model(model, rng, (1, size, size, 3))
    state = TrainState.create(params, stats, tx)
    mesh = create_mesh(1, 1, devices=[jax.devices()[0]])
    train_step, _ = jit_steps(model, tx, mesh)
    state = jax.device_put(state, replicated(mesh))
    batch = jax.device_put(
        {
            "image": jnp.asarray(np.random.RandomState(0).randn(B, size, size, 3), jnp.float32),
            "label": jnp.asarray((np.random.RandomState(1).rand(B, 5) > 0.5), jnp.float32),
            "index": jnp.zeros((B,), jnp.int32),
            "mask": jnp.ones((B,), jnp.float32),
        },
        batch_sharding(mesh),
    )
    state, loss = train_step(state, batch)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = train_step(state, batch)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"{model_name} train step ({attn_impl}): {dt*1e3:.1f} ms = {B/dt:.1f} img/s")
    return dt


def trace_model(B=16, attn_impl="pallas", out="/tmp/aares_trace", model_name="aaresnet152", size=320):
    """Capture a profiler trace of 3 real train steps (run: ... trace)."""
    from chexpert_tpu.models import build_model
    from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from chexpert_tpu.train import TrainState, init_model, jit_steps, make_optimizer

    model, spec = build_model(model_name, image_size=size, attn_impl=attn_impl)
    tx, _ = make_optimizer(spec, 1e-4)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, size, size, 3))
    state = TrainState.create(params, stats, tx)
    mesh = create_mesh(1, 1, devices=[jax.devices()[0]])
    train_step, _ = jit_steps(model, tx, mesh)
    state = jax.device_put(state, replicated(mesh))
    batch = jax.device_put(
        {
            "image": jnp.asarray(np.random.RandomState(0).randn(B, size, size, 3), jnp.float32),
            "label": jnp.asarray((np.random.RandomState(1).rand(B, 5) > 0.5), jnp.float32),
            "index": jnp.zeros((B,), jnp.int32),
            "mask": jnp.ones((B,), jnp.float32),
        },
        batch_sharding(mesh),
    )
    for _ in range(3):
        state, loss = train_step(state, batch)
    float(loss)
    jax.profiler.start_trace(out)
    for _ in range(3):
        state, loss = train_step(state, batch)
    float(loss)
    jax.profiler.stop_trace()
    print(f"trace -> {out}")


if __name__ == "__main__":
    import sys

    import os as _os

    from chexpert_tpu.utils.io import enable_compilation_cache
    enable_compilation_cache()
    # Env overrides so any registry arch/batch can be traced or timed:
    #   CHEXPERT_PROFILE_ARCH=densenet121 CHEXPERT_PROFILE_BATCH=128 \
    #   CHEXPERT_PROFILE_SIZE=380 \
    #     python scripts/profile_aaresnet.py model|trace
    B = int(_os.environ.get("CHEXPERT_PROFILE_BATCH", "16"))
    size = int(_os.environ.get("CHEXPERT_PROFILE_SIZE", "320"))
    arch = _os.environ.get("CHEXPERT_PROFILE_ARCH", "aaresnet152")
    print(f"devices: {jax.devices()}")
    if "model" not in sys.argv:
        tot_p = tot_e = 0.0
        for (H, W, dkh, dvh, n) in [(40, 40, 20, 1, 8), (20, 20, 20, 3, 36), (10, 10, 20, 6, 3)]:
            p, e = bench_geometry(B, 8, H, W, dkh, dvh, n)
            tot_p += p
            tot_e += e
        print(f"attention total per step: pallas {tot_p*1e3:.1f} ms einsum {tot_e*1e3:.1f} ms")
    if "trace" in sys.argv:
        trace_model(B, "pallas", out=f"/tmp/{arch}_trace", model_name=arch, size=size)
    elif "ops" not in sys.argv:
        bench_model(B, "pallas", model_name=arch, size=size)
