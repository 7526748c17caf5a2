"""Pallas TPU depthwise-conv kernel (stride-1 'SAME'), with fused backward.

MEASURED NEGATIVE RESULT — kept as a tested opt-in (CHEXPERT_DW=pallas),
default path is XLA's grouped conv. The hypothesis: EfficientNet's MBConv
depthwise convolutions (reference /root/reference/models/efficientnet.py:
78-111) dominate the b4 train step (a round-4 trace put depthwise-signature
ops at 119 of 235 ms at 200-575 GB/s effective), and a depthwise conv is
k^2 shifted fused-multiply-adds per element — pure VPU work wanting exactly
one HBM read of x and one write of y, which this kernel does. The
measurement (scripts/bench_depthwise.py, batch 128, all seven b4 stride-1
geometries): this kernel is 1.6-4x SLOWER than XLA's lowering — weighted
fwd+bwd 423 ms vs XLA's 166 ms. Per-program math says why: one tap over a
(8,190,128) f32 chunk is ~600 vector-register ops, and Mosaic issues ~1
vreg-op/cycle, while XLA's native conv lowering sustains an effective
4-5 vreg-ops/cycle (packed-bf16 multi-issue the Pallas author cannot
express). XLA's grouped conv already runs at ~550 GB/s of PHYSICAL
(lane-padded) bytes — its apparent sub-roofline throughput is the (8,128)
lane padding of thin-channel stages (C=24..96 pads to 128 lanes), which a
same-layout kernel cannot remove. See bench.py's physical-bytes roofline
for the honest floor.

The design (sound, just out-gunned by the native lowering):

  * forward: grid (B, H/TH); the full channel dim rides the lanes (no
    C-grid — every EfficientNet stride-1 geometry fits), and each program
    DMAs one (TH + 2p, W + 2p, C) zero-padded row window from HBM into a
    double-buffered VMEM scratch (the next window prefetches while the
    current one computes), then accumulates the k^2 taps in f32 over
    8-row chunks. Halo rows overlap by 2p only — HBM reads x ~once.
    The XLA-side jnp.pad fuses into the producer fusion.
  * backward: one kernel produces BOTH dx (flipped-kernel conv of the
    padded dout) and per-batch dW partials (tap-wise multiply-reduce of
    x against dout), reading x and dout exactly once; dW accumulates
    across row windows in the resident output block and the tiny
    (B, k, k, C) f32 partial is reduced over B in XLA.

`lax.conv_general_dilated` (identical semantics) is the default and the
fallback for stride != 1, even kernels, or geometries whose row windows
cannot fit the VMEM budget; `CHEXPERT_DW=pallas` opts in for A/B benching.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-core VMEM is ~16 MB scoped; leave headroom for Mosaic's own buffers,
# the double-buffered blocked outputs, and chunk temporaries.
_VMEM_BUDGET = 10 * 1024 * 1024
_LANE = 128
_RC = 8  # row-chunk height inside a window (f32 sublane tile)


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _mode() -> str:
    """'xla' (default — the Pallas kernel measured slower, see module
    docstring) or 'pallas' to opt in."""
    return os.environ.get("CHEXPERT_DW", "xla")


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _window_bytes(TH: int, W: int, C: int, p: int) -> int:
    """Physical bytes of one (TH+2p, W+2p, C) bf16 VMEM window."""
    return (TH + 2 * p) * _ceil_to(W + 2 * p, 16) * _ceil_to(C, _LANE) * 2


def _pick_th(H: int, W: int, C: int, k: int) -> int:
    """Largest divisor TH of H whose BACKWARD footprint fits the budget:
    two double-buffered input windows (x, dout), the double-buffered dx
    output block, the resident dW partial block, and the f32 chunk
    temporaries (dacc/g_c/xw + fusion headroom). Returns 0 if none fits."""
    p = k // 2
    cp = _ceil_to(C, _LANE)
    temps = 5 * _RC * _ceil_to(W + 2 * p, 16) * cp * 4
    dwp = 2 * k * _ceil_to(k, 8) * cp * 4
    for th in sorted((d for d in range(1, H + 1) if H % d == 0), reverse=True):
        wins = 4 * _window_bytes(th, W, C, p)  # x + dout, 2 slots each
        out = 2 * th * _ceil_to(W, 16) * cp * 2
        if wins + out + temps + dwp < _VMEM_BUDGET:
            return th
    return 0


def _feasible(H: int, W: int, C: int, k: int, stride: int) -> bool:
    """Geometry the Pallas path can handle (independent of the mode)."""
    if stride != 1 or k % 2 == 0 or k < 1:
        return False
    return _pick_th(H, W, C, k) > 0


def _eligible(H: int, W: int, C: int, k: int, stride: int) -> bool:
    return _mode() == "pallas" and _feasible(H, W, C, k, stride)


def _xla_depthwise(x, w, stride: int, k: int):
    """Reference semantics: flax nn.Conv(features=C, groups=C, SAME)."""
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _start_window(hbm_ref, scratch, sem, flat, nH, TH, halo):
    """Kick the DMA for flat program index `flat` into its parity slot."""
    b, hi = flat // nH, lax.rem(flat, nH)
    slot = lax.rem(flat, 2)
    pltpu.make_async_copy(
        hbm_ref.at[b, pl.ds(hi * TH, TH + halo)],
        scratch.at[slot],
        sem.at[slot],
    ).start()


def _fwd_kernel(xp_hbm, w_ref, o_ref, xv, sem, *, H, W, C, k, TH):
    """One (batch, row-window) program. xp_hbm: (B, H+2p, W+2p, C) bf16 in
    HBM; w_ref: (k, k, C) f32; o_ref block: (1, TH, W, C); xv scratch:
    (2, TH+2p, W+2p, C) double-buffered."""
    p = k // 2
    nH = H // TH
    RC = min(_RC, TH)
    b, hi = pl.program_id(0), pl.program_id(1)
    flat = b * nH + hi
    total = pl.num_programs(0) * nH
    slot = lax.rem(flat, 2)

    @pl.when(flat == 0)
    def _first():
        _start_window(xp_hbm, xv, sem, 0, nH, TH, 2 * p)

    pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(hi * TH, TH + 2 * p)], xv.at[slot], sem.at[slot]
    ).wait()

    @pl.when(flat + 1 < total)
    def _prefetch():
        _start_window(xp_hbm, xv, sem, flat + 1, nH, TH, 2 * p)

    nch = -(-TH // RC)

    def chunk(i, _):
        r0 = jnp.minimum(i * RC, TH - RC)  # clamped tail: rows recomputed, idempotent
        acc = jnp.zeros((RC, W, C), jnp.float32)
        for dy in range(k):
            # one load+convert per row offset; per-tap W windows slice the
            # converted registers (sublane shifts, no reconvert)
            rowsf = xv[slot, pl.ds(r0 + dy, RC), :, :].astype(jnp.float32)
            for dx in range(k):
                acc = acc + rowsf[:, dx : dx + W, :] * w_ref[dy, dx, :]
        o_ref[0, pl.ds(r0, RC)] = acc.astype(o_ref.dtype)
        return 0

    lax.fori_loop(0, nch, chunk, 0, unroll=False)


def _bwd_kernel(xp_hbm, gp_hbm, w_ref, dx_ref, dwp_ref, xv, gv, xsem, gsem,
                *, H, W, C, k, TH):
    """One (batch, row-window) program producing the dx block and
    accumulating this batch element's dW partial into the resident
    dwp block (revisited across row windows; written back once per b)."""
    p = k // 2
    nH = H // TH
    RC = min(_RC, TH)
    b, hi = pl.program_id(0), pl.program_id(1)
    flat = b * nH + hi
    total = pl.num_programs(0) * nH
    slot = lax.rem(flat, 2)

    @pl.when(flat == 0)
    def _first():
        _start_window(xp_hbm, xv, xsem, 0, nH, TH, 2 * p)
        _start_window(gp_hbm, gv, gsem, 0, nH, TH, 2 * p)

    pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(hi * TH, TH + 2 * p)], xv.at[slot], xsem.at[slot]
    ).wait()
    pltpu.make_async_copy(
        gp_hbm.at[b, pl.ds(hi * TH, TH + 2 * p)], gv.at[slot], gsem.at[slot]
    ).wait()

    @pl.when(flat + 1 < total)
    def _prefetch():
        _start_window(xp_hbm, xv, xsem, flat + 1, nH, TH, 2 * p)
        _start_window(gp_hbm, gv, gsem, flat + 1, nH, TH, 2 * p)

    nch = -(-TH // RC)

    def chunk(i, dwacc):
        r0 = jnp.minimum(i * RC, TH - RC)
        # clamped tail chunks re-visit rows the previous chunk already
        # reduced — zero them for dW (the dx rewrite is idempotent)
        row = lax.broadcasted_iota(jnp.int32, (RC, 1, 1), 0) + r0
        fresh = (row >= i * RC).astype(jnp.float32)
        g_c = gv[slot, pl.ds(r0 + p, RC), p : p + W, :].astype(jnp.float32) * fresh
        dacc = jnp.zeros((RC, W, C), jnp.float32)
        dwacc = list(dwacc)
        for dy in range(k):
            for dx in range(k):
                dacc = dacc + (
                    gv[slot, pl.ds(r0 + dy, RC), dx : dx + W, :].astype(jnp.float32)
                    * w_ref[k - 1 - dy, k - 1 - dx, :]
                )
                xw = xv[slot, pl.ds(r0 + dy, RC), dx : dx + W, :].astype(jnp.float32)
                t = dy * k + dx
                dwacc[t] = dwacc[t] + jnp.sum(xw * g_c, axis=(0, 1)).reshape(1, C)
        dx_ref[0, pl.ds(r0, RC)] = dacc.astype(dx_ref.dtype)
        return tuple(dwacc)

    # dW accumulator: one (1, C) f32 vector per tap, carried as a tuple
    # (a stacked (k*k, C) carry would need an in-kernel scatter — Mosaic
    # has no scatter-add lowering)
    dwacc = lax.fori_loop(
        0, nch, chunk,
        tuple(jnp.zeros((1, C), jnp.float32) for _ in range(k * k)),
        unroll=False,
    )

    @pl.when(hi == 0)
    def _init():
        dwp_ref[0] = jnp.zeros_like(dwp_ref[0])

    for dy in range(k):
        dwp_ref[0, dy] += jnp.concatenate(
            [dwacc[dy * k + dx] for dx in range(k)], axis=0
        )


def _pad_hwc(x, p: int, cp: int):
    """Zero-pad H/W by p, the padded width up to a sublane multiple (8),
    and the lane dim up to cp. The lane/sublane pads are physically free
    (the tiled HBM layout already rounds those dims up) but make every
    manual-DMA slice tile-aligned, which Mosaic requires for HBM→VMEM
    copies."""
    B, H, W, C = x.shape
    wp8 = _ceil_to(W + 2 * p, 8)
    return jnp.pad(x, ((0, 0), (p, p), (p, wp8 - W - p), (0, cp - C)))


def _pallas_fwd(x, w3, k: int):
    B, H, W, C = x.shape
    p = k // 2
    TH = _pick_th(H, W, C, k)
    nH = H // TH
    Cp = _ceil_to(C, _LANE)
    xp = _pad_hwc(x, p, Cp)
    w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, Cp - C)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, C=Cp, k=k, TH=TH),
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, k, Cp), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cp), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * p, _ceil_to(W + 2 * p, 8), Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(xp, w3)
    return out[..., :C] if Cp != C else out


def _pallas_bwd(x, w3, g, k: int):
    B, H, W, C = x.shape
    p = k // 2
    TH = _pick_th(H, W, C, k)
    nH = H // TH
    Cp = _ceil_to(C, _LANE)
    xp = _pad_hwc(x, p, Cp)
    gp = _pad_hwc(g, p, Cp)
    w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, Cp - C)))
    dx, dwp = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, C=Cp, k=k, TH=TH),
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, k, Cp), lambda b, h: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W, Cp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, k, k, Cp), lambda b, h: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, Cp), g.dtype),
            jax.ShapeDtypeStruct((B, k, k, Cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2 * p, _ceil_to(W + 2 * p, 8), Cp), x.dtype),
            pltpu.VMEM((2, TH + 2 * p, _ceil_to(W + 2 * p, 8), Cp), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(xp, gp, w3)
    return dx[..., :C], jnp.sum(dwp[..., :C], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw_pallas(x, w3, k: int):
    return _pallas_fwd(x, w3, k)


def _dw_pallas_fwd(x, w3, k: int):
    return _pallas_fwd(x, w3, k), (x, w3)


def _dw_pallas_bwd(k: int, res, g):
    x, w3 = res
    dx, dw3 = _pallas_bwd(x, w3, g, k)
    return dx, dw3.astype(w3.dtype)


_dw_pallas.defvjp(_dw_pallas_fwd, _dw_pallas_bwd)


def depthwise_conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Depthwise conv, TF-'SAME' padding, NHWC x (B,H,W,C), w (k,k,1,C) HWIO.

    Pallas fast path for stride-1 odd-k geometries whose row windows fit
    VMEM (all of EfficientNet-B0..B7's non-downsampling blocks at
    perf-table sizes); XLA grouped conv otherwise — bit-identical call to
    what flax nn.Conv with feature_group_count=C emits, so the two paths
    are interchangeable.
    """
    k = int(w.shape[0])
    assert w.shape[:2] == (k, k) and w.shape[2] == 1 and w.shape[3] == x.shape[-1], (
        f"expected HWIO depthwise kernel (k,k,1,C), got {w.shape} for C={x.shape[-1]}"
    )
    B, H, W, C = x.shape
    if not _eligible(H, W, C, k, stride):
        # default mode, or CHEXPERT_DW=pallas on an infeasible geometry
        # (stride-2 downsampling layers always take this path)
        return _xla_depthwise(x, w, stride, k)
    # compute in the activation dtype like nn.Conv(dtype=bf16): cast the f32
    # param to bf16 first, then accumulate in f32 inside the kernel
    w3 = w.astype(x.dtype).astype(jnp.float32).reshape(k, k, C)
    return _dw_pallas(x, w3, k)
