"""On-chip validation suite — the TPU-only checks that pytest (CPU-pinned)
cannot run. Each check prints PASS/numbers; run on a host with a real TPU:

    python scripts/tpu_checks.py kernel       # Pallas vs einsum fwd/bwd parity + timing
    python scripts/tpu_checks.py archs        # train-step smoke for every architecture
    python scripts/tpu_checks.py throughput   # packed-pipeline end-to-end img/s
    python scripts/tpu_checks.py all

NOTE: timings sync via value fetches — block_until_ready is unreliable over
the tunneled dev platform.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def check_kernel() -> None:
    """Pallas flash attention vs einsum at the aadensenet121 transition-1
    geometry: forward/grad parity (bf16 tolerance) and timing."""
    from chexpert_tpu.ops.attention import aa_attention_einsum
    from chexpert_tpu.ops.pallas_attention import aa_attention_pallas

    B, nh, H, W, dkh, dvh = 8, 8, 40, 40, 20, 1
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, nh, H * W, dkh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, nh, H * W, dvh), jnp.bfloat16)
    rw = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rh = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)

    f_pal = jax.jit(lambda *a: aa_attention_pallas(*a, H, W))
    f_ein = jax.jit(lambda *a: aa_attention_einsum(*a, H, W)[0])
    err = float(jnp.abs(f_pal(q, k, v, rw, rh).astype(jnp.float32)
                        - f_ein(q, k, v, rw, rh).astype(jnp.float32)).max())
    assert err < 0.15, f"fwd divergence {err} (bf16 tolerance exceeded)"

    def g(fn):
        return jax.jit(jax.grad(
            lambda q, k, v, rw, rh: (fn(q, k, v, rw, rh).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1, 2, 3, 4)))

    gp = g(lambda *a: aa_attention_pallas(*a, H, W))(q, k, v, rw, rh)
    ge = g(lambda *a: aa_attention_einsum(*a, H, W)[0])(q, k, v, rw, rh)
    for name, a, b in zip(["dq", "dk", "dv", "drw", "drh"], gp, ge):
        rel = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
                    ) / max(float(jnp.abs(b.astype(jnp.float32)).max()), 1e-9)
        assert rel < 0.05, f"{name} rel divergence {rel}"

    def bench(fn, n, sync):
        sync(fn(q, k, v, rw, rh))
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(q, k, v, rw, rh)
        sync(o)
        return (time.perf_counter() - t0) / n * 1e3

    fp = bench(f_pal, 50, _sync)
    fe = bench(f_ein, 50, _sync)
    gpms = bench(g(lambda *a: aa_attention_pallas(*a, H, W)), 20, lambda o: _sync(o[0]))
    gems = bench(g(lambda *a: aa_attention_einsum(*a, H, W)[0]), 20, lambda o: _sync(o[0]))
    print(f"PASS kernel: fwd pallas {fp:.2f}ms vs einsum {fe:.2f}ms; "
          f"grad {gpms:.2f} vs {gems:.2f}ms")


def _train_smoke(name: str, bs: int = 16, hw: int = 320, steps: int = 10):
    from chexpert_tpu.models import build_model
    from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from chexpert_tpu.train import TrainState, init_model, jit_steps, make_optimizer

    model, spec = build_model(name, image_size=hw)
    tx, _ = make_optimizer(spec, 1e-4)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, hw, hw, 3))
    mesh = create_mesh(1, 1, devices=[jax.devices()[0]])
    train_step, _ = jit_steps(model, tx, mesh)
    state = jax.device_put(TrainState.create(params, stats, tx), replicated(mesh))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(bs, hw, hw, 3), jnp.float32),
        "label": jnp.asarray((rng.rand(bs, 5) > 0.5), jnp.float32),
        "index": jnp.zeros((bs,), jnp.int32),
        "mask": jnp.ones((bs,), jnp.float32),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    state, loss = train_step(state, batch)
    l0 = float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = train_step(state, batch)
    lv = float(loss)
    ips = bs * steps / (time.perf_counter() - t0)
    assert np.isfinite(lv) and lv < l0, (name, l0, lv)
    print(f"PASS {name}: {ips:.1f} img/s (loss {l0:.3f}->{lv:.3f})")


def check_archs() -> None:
    for name in ("densenet121", "resnet152", "efficientnet-b0",
                 "aadensenet121", "aaresnet152"):
        _train_smoke(name)


def check_throughput() -> None:
    """Packed-pipeline end-to-end training img/s on synthetic 320px data."""
    import os
    import tempfile

    from chexpert_tpu.data import ChexpertIndex, make_synthetic_dataset
    from chexpert_tpu.data.packed import PackedBatches, build_packed_cache
    from chexpert_tpu.data.pipeline import device_prefetch
    from chexpert_tpu.models import build_model
    from chexpert_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from chexpert_tpu.train import TrainState, init_model, jit_steps, make_optimizer

    root = tempfile.mkdtemp()
    make_synthetic_dataset(root, n_train=512, n_valid=16, image_size=390)
    index = ChexpertIndex(root, "train", download=False)
    path = build_packed_cache(index, os.path.join(root, "cache"), image_size=320,
                              pack_margin=0)
    model, spec = build_model("densenet121")
    tx, _ = make_optimizer(spec, 1e-4)
    params, stats = init_model(model, jax.random.PRNGKey(0), (1, 320, 320, 3))
    mesh = create_mesh(1, 1, devices=[jax.devices()[0]])
    train_step, _ = jit_steps(model, tx, mesh)
    state = jax.device_put(TrainState.create(params, stats, tx), replicated(mesh))

    batches = PackedBatches(index, path, 32, image_size=320, shuffle=True,
                            drop_last=True)
    it = device_prefetch(batches, batch_sharding(mesh), depth=3)
    state, loss = train_step(state, next(it))
    float(loss)
    n = 0
    t0 = time.perf_counter()
    for b in it:
        state, loss = train_step(state, b)
        n += 32
    float(loss)
    print(f"PASS throughput: {n / (time.perf_counter() - t0):.1f} img/s end-to-end "
          "(dev hosts are H2D-tunnel-bound; see README)")


CHECKS = {"kernel": check_kernel, "archs": check_archs, "throughput": check_throughput}


def main() -> int:
    from chexpert_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(CHECKS) if which == "all" else [which]
    for n in names:
        CHECKS[n]()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
