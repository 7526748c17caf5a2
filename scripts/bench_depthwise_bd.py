"""Microbench: block-diagonal GROUPED-conv depthwise vs XLA's native
depthwise lowering on the real TPU (round-4 verdict task 2 — the one untried
MXU-shaped formulation).

    python scripts/bench_depthwise_bd.py [batch]

Idea: XLA lowers true depthwise (feature_group_count=C, group size 1) to
VPU-bound code measured at ~1 effective vector op/cycle (round-4 trace:
119 of b4's 235 ms step). Re-expressing it as a grouped conv with group
size g — kernel (k, k, g, C) that is BLOCK-DIAGONAL (zeros off the channel
diagonal) — inflates FLOPs by g but routes through the MXU conv emitters.
Worth it iff the MXU path beats the VPU path by more than g; this sweeps g
per b4 stride-1 geometry and reports the best.

The block-diagonal kernel is built by broadcast-multiplying w (k, k, C)
with a (g, C) one-hot mask, so autodiff projects the dense dK back to dw
automatically — the formulation is drop-in differentiable.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chexpert_tpu.ops.pallas_depthwise import _xla_depthwise

GEOMS = [  # (H, W, C, k, n_layers_in_b4) — b4 @380^2 stride-1 dw layers
    (190, 190, 48, 3, 2),
    (95, 95, 192, 3, 3),
    (48, 48, 336, 5, 3),
    (24, 24, 672, 3, 5),
    (24, 24, 960, 5, 6),
    (12, 12, 1632, 5, 7),
    (12, 12, 2688, 3, 2),
]


def _sync(x) -> float:
    return float(jnp.asarray(x).astype(jnp.float32).sum())


def time_fn(fn, *args, iters=3, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def bd_kernel_mask(g: int, C: int, dtype) -> jnp.ndarray:
    """(1, 1, g, C) one-hot: mask[0, 0, i, c] = (i == c mod g)."""
    i = jnp.arange(g)[:, None]
    c = jnp.arange(C)[None, :]
    return (i == c % g).astype(dtype)[None, None]


def bd_depthwise(x, w, k: int, g: int):
    """Depthwise as grouped conv with block-diagonal (k, k, g, C) kernel."""
    C = x.shape[-1]
    kern = w.reshape(k, k, 1, C) * bd_kernel_mask(g, C, w.dtype)
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C // g,
    )


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)
    best_total = xla_total = 0.0
    for H, W, C, k, n in GEOMS:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        w3 = jnp.asarray(rng.randn(k, k, C) * 0.1, jnp.float32)
        R = max(2, min(30, int(6e9 / (B * H * W * C))))
        Rg = max(2, min(R, int(4e9 / (B * H * W * C * 2))))

        def chain(op, r):
            def fn(x, w):
                def body(xx, _):
                    return op(xx, w).astype(xx.dtype), None
                return jax.lax.scan(body, x, None, length=r)[0]
            return fn

        def grad_time(op):
            """Compile, PLAN the footprint from XLA's memory analysis, and
            only then execute — an OOM'd TPU execution leaks backend memory
            that poisons every later measurement in this process (CLAUDE.md
            environment gotchas), so infeasible candidates are skipped from
            the compiled plan, never probed."""
            f = jax.jit(jax.grad(
                lambda x, w: chain(op, Rg)(x, w).astype(jnp.float32).sum(),
                argnums=(0, 1)))
            ma = f.lower(x, w3).compile().memory_analysis()
            cost = float(ma.temp_size_in_bytes + ma.argument_size_in_bytes
                         + ma.output_size_in_bytes)
            if cost > 13e9:  # ~16 GB HBM minus runtime reserves
                return None
            return time_fn(lambda *a: f(*a)[0], x, w3) / Rg

        x_op = lambda x, w: _xla_depthwise(x, w.reshape(k, k, 1, C), 1, k)
        txg = grad_time(x_op)
        assert txg is not None, "XLA depthwise baseline must fit"

        candidates = sorted({gg for gg in (8, 16, 32, 64, 128, C)
                             if C % gg == 0 and gg <= 128})
        results = {}
        for g in candidates:
            t = grad_time(lambda x, w, g=g: bd_depthwise(x, w, k, g))
            if t is None:
                print(f"  g={g}: skipped (planned footprint over budget)",
                      file=sys.stderr)
                continue
            results[g] = t
        bg, bt = min(results.items(), key=lambda kv: kv[1]) if results else (0, float("inf"))
        best_total += n * min(bt, txg)
        xla_total += n * txg
        line = " ".join(f"g{g}={t*1e3:.2f}" for g, t in sorted(results.items()))
        print(f"H{H:4d} C{C:5d} k{k} x{n} | xla dw {txg*1e3:7.2f} ms | bd {line} "
              f"| best g={bg} {bt*1e3:.2f} ms ({txg/bt:4.2f}x vs xla)")
    print(f"\nb4 stride-1 dw fwd+bwd weighted: best-per-geom {best_total*1e3:.1f} ms "
          f"vs xla {xla_total*1e3:.1f} ms ({xla_total/max(best_total,1e-9):.2f}x)")


if __name__ == "__main__":
    main()
