"""Sweep Pallas attention tile sizes at the aaresnet152 layer-2 geometry.

Uses CHEXPERT_ATTN_TILES to override _pick_tiles; times fwd and fwd+bwd with
the chained-repeat harness (amortizes the dev tunnel's ~30 ms dispatch RTT).

    python scripts/sweep_attn_tiles.py [HW [dvh]]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    hw_side = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    dvh = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    B, nh, dkh = 16, 8, 20
    H = W = hw_side
    hw = H * W
    R = max(8, min(100, int(40_000_000 / (B * nh * hw * hw // 100))))

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, nh, hw, dkh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, nh, hw, dkh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, nh, hw, dvh), jnp.bfloat16)
    rw = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rh = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)

    if hw == 1600:
        cands = [(400, 800), (800, 800), (400, 1600), (800, 1600), (1600, 1600), (200, 800)]
    elif hw == 400:
        cands = [(400, 400), (200, 400), (104, 400), (400, 800)]
    elif hw == 6400:
        cands = [(400, 800), (320, 640), (400, 400), (200, 800), (160, 640), (320, 1280)]
    else:
        cands = [(hw, hw)]

    def run(tiles):
        os.environ["CHEXPERT_ATTN_TILES"] = f"{tiles[0]},{tiles[1]}"
        # import inside so the env var is read per trace
        from chexpert_tpu.ops.pallas_attention import aa_attention_pallas

        def chain(q, k, v, rw, rh):
            def body(vv, _):
                return aa_attention_pallas(q, k, vv, rw, rh, H, W), None
            out, _ = jax.lax.scan(body, v, None, length=R)
            return out

        f = jax.jit(chain)
        g = jax.jit(jax.grad(lambda *a: chain(*a).astype(jnp.float32).sum(), argnums=(0, 1, 2)))

        def sync(x):
            return float(jnp.asarray(x).astype(jnp.float32).sum())

        def t(fn, pick):
            for _ in range(2):
                sync(pick(fn(q, k, v, rw, rh)))
            t0 = time.perf_counter()
            for _ in range(3):
                sync(pick(fn(q, k, v, rw, rh)))
            return (time.perf_counter() - t0) / 3 / R

        tf = t(f, lambda o: o)
        tg = t(g, lambda o: o[0])
        print(f"tiles {tiles}: fwd {tf*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms")
        return tg

    print(f"HW={hw} dvh={dvh} B={B} nh={nh} R={R}")
    results = {}
    try:
        for c in cands:
            try:
                results[c] = run(c)
            except Exception as e:  # VMEM OOM at huge tiles is expected
                print(f"tiles {c}: FAILED ({type(e).__name__}: {str(e)[:120]})")
    finally:
        os.environ.pop("CHEXPERT_ATTN_TILES", None)
    if not results:
        print("no tile candidate fit this geometry")
        return
    best = min(results, key=results.get)
    print(f"best: {best}")


if __name__ == "__main__":
    main()
