"""Capture a jax.profiler trace of the attention kernel at one geometry.

    python scripts/probe_attn_trace.py [HWside [dvh [outdir]]]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from chexpert_tpu.ops.pallas_attention import aa_attention_pallas


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    dvh = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/attn_trace"
    B, nh, dkh = 16, 8, 20
    H = W = side
    hw = H * W
    R = 10

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, nh, hw, dkh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, nh, hw, dkh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, nh, hw, dvh), jnp.bfloat16)
    rw = jnp.asarray(rng.randn(dkh, 2 * W - 1), jnp.float32)
    rh = jnp.asarray(rng.randn(dkh, 2 * H - 1), jnp.float32)

    def chain(q, k, v, rw, rh):
        def body(vv, _):
            return aa_attention_pallas(q, k, vv, rw, rh, H, W), None
        return jax.lax.scan(body, v, None, length=R)[0]

    f = jax.jit(chain)
    g = jax.jit(jax.grad(lambda *a: chain(*a).astype(jnp.float32).sum(), argnums=(0, 1, 2)))

    def sync(x):
        return float(jnp.asarray(x).astype(jnp.float32).sum())

    sync(f(q, k, v, rw, rh))
    sync(g(q, k, v, rw, rh)[0])
    jax.profiler.start_trace(out)
    sync(f(q, k, v, rw, rh))
    sync(g(q, k, v, rw, rh)[0])
    jax.profiler.stop_trace()
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
