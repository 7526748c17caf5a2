"""Microbench: Pallas depthwise conv vs XLA grouped conv on the real TPU.

    python scripts/bench_depthwise.py [batch]

Geometries = efficientnet-b4 @ 380^2 stride-1 depthwise layers (the Pallas
targets; stride-2 layers stay on XLA). Times fwd and fwd+bwd per op by
chaining R applications inside one jit (out feeds x — shapes match),
amortizing the tunneled dispatch cost, same methodology as
scripts/profile_aaresnet.py.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chexpert_tpu.ops.pallas_depthwise import _dw_pallas, _xla_depthwise

# (H, W, C, k, n_layers_in_b4) — stride-1 dw layers of efficientnet-b4 @380^2
GEOMS = [
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


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)
    tot_p = tot_x = 0.0
    for H, W, C, k, n in GEOMS:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        w3 = jnp.asarray(rng.randn(k, k, C) * 0.1, jnp.float32)
        w4 = w3.reshape(k, k, 1, C)
        R = max(2, min(30, int(6e9 / (B * H * W * C))))
        # grad chains keep R residuals of x alive — bound them by HBM
        Rg = max(2, min(R, int(4e9 / (B * H * W * C * 2))))

        def chain(op, r):
            def fn(x, w):
                def body(xx, _):
                    return op(xx, w).astype(xx.dtype), None
                return jax.lax.scan(body, x, None, length=r)[0]
            return fn

        p_op = lambda x, w: _dw_pallas(x, w, k)
        x_op = lambda x, w: _xla_depthwise(x, w.reshape(k, k, 1, C), 1, k)

        fp = jax.jit(chain(p_op, R))
        fx = jax.jit(chain(x_op, R))
        gp = jax.jit(jax.grad(lambda x, w: chain(p_op, Rg)(x, w).astype(jnp.float32).sum(), argnums=(0, 1)))
        gx = jax.jit(jax.grad(lambda x, w: chain(x_op, Rg)(x, w).astype(jnp.float32).sum(), argnums=(0, 1)))

        tp = time_fn(fp, x, w3) / R
        tx = time_fn(fx, x, w3) / R
        tpg = time_fn(lambda *a: gp(*a)[0], x, w3) / Rg
        txg = time_fn(lambda *a: gx(*a)[0], x, w3) / Rg
        gb = 2 * B * H * W * C * 2 / 1e9  # read x + write y, bf16
        bw_p = gb / tp
        tot_p += n * tpg
        tot_x += n * txg
        print(
            f"H{H:4d} C{C:5d} k{k} x{n} | fwd pallas {tp*1e3:7.2f} ms ({bw_p:5.0f} GB/s) "
            f"xla {tx*1e3:7.2f} ms | fwd+bwd pallas {tpg*1e3:7.2f} ms xla {txg*1e3:7.2f} ms | "
            f"speedup fwd {tx/tp:4.2f}x bwd {txg/tpg:4.2f}x"
        )
    print(f"\nb4 stride-1 dw total (fwd+bwd, weighted): pallas {tot_p*1e3:.1f} ms  xla {tot_x*1e3:.1f} ms  ({tot_x/tot_p:.2f}x)")


if __name__ == "__main__":
    main()
