"""N-checkpoint ensemble evaluation.

The reference loops checkpoints serially, re-loading weights into one model
and re-running the full valid set per checkpoint
(/root/reference/chexpert.py:217-236). TPU-native design: stack the K
checkpoints' params into one leading-axis pytree and vmap the forward — one
compiled graph evaluates all K members per batch, reusing each data batch K
times (the data pipeline runs once, the MXU sees K-fold batched matmuls).

Score combination preserved exactly: outputs and per-element losses are
meaned over checkpoints, then metrics computed (chexpert.py:233-236).
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from chexpert_tpu.checkpoint import load_model_checkpoint
from chexpert_tpu.data.pipeline import Batches, device_prefetch
from chexpert_tpu.eval.metrics import compute_metrics
from chexpert_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, batch_sharding
from chexpert_tpu.train.loss import bce_with_logits


def list_checkpoints(restore_dir: str) -> List[str]:
    """checkpoint*.msgpack files in a directory (reference chexpert.py:218-219)."""
    names = [
        c for c in sorted(os.listdir(restore_dir))
        if c.startswith("checkpoint") and (c.endswith(".msgpack") or c.endswith(".pt"))
    ]
    return [os.path.join(restore_dir, c) for c in names]


def stack_checkpoints(paths: List[str], params_template, batch_stats_template):
    """Load K checkpoints and stack params/batch_stats on a leading axis.

    Stacked on HOST (np.stack): checkpoint leaves arrive as numpy from
    msgpack, and stacking on device would land K unstacked copies + the
    stacked tree in HBM before eval even starts — on a chip already holding
    a retry's garbage that transient is what OOMs (round-4 efficientnet-b4
    x10 gate). The caller device_puts the stacked tree once, with its
    member sharding."""
    loaded = [
        load_model_checkpoint(p, params_template, batch_stats_template) for p in paths
    ]
    params = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *[l["params"] for l in loaded]
    )
    stats = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *[l["batch_stats"] for l in loaded],
    )
    return params, stats


def member_sharding(mesh, n_members: int):
    """Sharding for the stacked checkpoint axis: over the mesh 'model' axis
    when the members divide it, else replicated."""
    m = mesh.shape[MODEL_AXIS]
    if m > 1 and n_members % m == 0:
        return NamedSharding(mesh, P(MODEL_AXIS))
    return NamedSharding(mesh, P())


def make_ensemble_eval_step(model, mesh, n_members: int):
    """jit forward over the checkpoint axis; batch data-sharded.

    When the member count divides the mesh 'model' axis, members are sharded
    over it with shard_map (each device shard runs a vmap over its LOCAL
    members only — the same shard_map technique as the Pallas attention
    wrapper, ops/pallas_attention.py), so the member axis never reaches the
    GSPMD partitioner. (An earlier note here claimed GSPMD miscompiles the
    vmapped member axis of conv kernels; a minimal vmapped-conv repro does
    NOT reproduce it on this jax version — shard_map is kept because it makes
    the per-member placement explicit rather than partitioner-dependent.)
    When members don't divide the axis they are replicated and only the data
    axis is parallel."""

    def member_forward(params, batch_stats, image):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, image, train=False
        ).astype(jnp.float32)

    vmapped = jax.vmap(member_forward, in_axes=(0, 0, None))

    memb_sh = member_sharding(mesh, n_members)
    if memb_sh.spec == P(MODEL_AXIS):
        from jax.experimental.shard_map import shard_map

        # per-shard: local members x local batch rows; no collectives needed
        # (eval uses running BN stats, outputs concatenate over both axes)
        # check_rep=False: members with Pallas attention run pallas_call
        # inside the shard (opaque to the replication checker, same as the
        # kernel's own shard_map wrapper in ops/pallas_attention.py)
        fwd = shard_map(
            vmapped, mesh=mesh,
            in_specs=(P(MODEL_AXIS), P(MODEL_AXIS), P(DATA_AXIS)),
            out_specs=P(MODEL_AXIS, DATA_AXIS),
            check_rep=False,
        )
    else:
        fwd = vmapped

    def step(stacked_params, stacked_stats, batch):
        from chexpert_tpu.train.steps import prepare_image

        outs = fwd(stacked_params, stacked_stats, prepare_image(batch["image"]))  # (K, B, C)
        losses = bce_with_logits(outs, batch["label"][None])  # (K, B, C)
        return outs, losses

    member_axis = MODEL_AXIS if memb_sh.spec == P(MODEL_AXIS) else None
    out_sh = NamedSharding(mesh, P(member_axis, DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(memb_sh, memb_sh, batch_sharding(mesh)),
        out_shardings=(out_sh, out_sh),
    )


def _member_groups(n: int, chunk: int) -> List[range]:
    chunk = max(1, min(chunk, n))
    return [range(i, min(i + chunk, n)) for i in range(0, n, chunk)]


# HBM per chip by device_kind, for backends whose memory_stats() returns None
# (axon does). Conservative where a kind is ambiguous.
_HBM_GIB_BY_KIND = {
    "TPU v2": 8, "TPU v3": 16, "TPU v4": 32,
    "TPU v5 lite": 16, "TPU v5": 95, "TPU v6 lite": 32,
}


def _device_budget_bytes(dev) -> float:
    """Free-HBM budget for planning: reported stats when the backend has
    them, else a device-kind table minus this process's JAX-visible live
    bytes; 10% safety margin plus a 1 GiB reserve for prefetch buffers,
    outputs, and fragmentation either way. CHEXPERT_HBM_GB overrides the
    table (e.g. for a new device kind)."""
    env = os.environ.get("CHEXPERT_HBM_GB")
    stats = None
    try:
        stats = dev.memory_stats()
    except Exception:
        pass
    if stats and "bytes_limit" in stats and not env:
        avail = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
    else:
        if env:
            total = float(env) * 2**30
        else:
            kind = getattr(dev, "device_kind", "")
            total = _HBM_GIB_BY_KIND.get(kind, 16) * 2**30
        live = sum(a.nbytes for a in jax.live_arrays())
        avail = total - live
    return 0.9 * avail - 2**30


def _fit_member_chunk(n_members: int, budget: float, cost_of) -> int:
    """Largest member chunk whose COMPILED memory footprint fits `budget`.

    cost_of(k) must return the k-member executable's bytes (temp + args +
    out) from XLA memory analysis — measured per candidate, not extrapolated
    from k=1, because vmap temp scales super-linearly at first: measured on
    efficientnet-b4 @320^2 batch 64, k=1 costs 0.82 GB but k=5 costs 8.45 GB
    and k=10 16.8 GB (~1.6 GB/member once k>1). After each shrink the chunk
    is re-balanced to ceil(n/passes) so the size we compile-to-verify is the
    size execution will actually use (and hit in the XLA cache)."""
    chunk = n_members
    while True:
        cost = cost_of(chunk)
        if cost <= budget or chunk == 1:
            return chunk
        smaller = min(chunk - 1, max(1, int(chunk * budget / cost)))
        passes = -(-n_members // smaller)  # ceil
        chunk = -(-n_members // passes)


def _plan_member_chunk(
    model, mesh, n_members, params_template, batch_stats_template, batches,
) -> int:
    """Pick the largest member chunk that FITS before allocating anything.

    The OOM-halving retry is a last resort, not a search strategy: on the
    axon TPU backend a failed execution leaks backend-side memory that
    jax.live_arrays() cannot see (observed round 4: after a 10-member
    efficientnet-b4 attempt OOM'd, every retry OOM'd down to a 69 MB
    device_put at chunk=1 with only 0.91 GB of JAX-visible arrays resident).
    So plan instead of probing: lower+compile candidate steps on SHAPES ONLY
    (jax.ShapeDtypeStruct — no device allocation), read each executable's
    memory_analysis, and shrink until the footprint fits the free-HBM budget
    (_fit_member_chunk). TPU only — host backends page and don't hard-OOM."""
    dev = mesh.devices.flat[0]
    if n_members == 1 or dev.platform != "tpu":
        return n_members

    b0 = next(iter(batches))

    def shape_of(x, lead=None):
        arr = np.asarray(x)
        shp = ((lead,) + arr.shape) if lead is not None else arr.shape
        return jax.ShapeDtypeStruct(shp, arr.dtype)

    def cost_of(k: int) -> float:
        pk = jax.tree_util.tree_map(lambda x: shape_of(x, k), params_template)
        sk = jax.tree_util.tree_map(lambda x: shape_of(x, k), batch_stats_template)
        ab = jax.tree_util.tree_map(shape_of, dict(b0))
        ma = make_ensemble_eval_step(model, mesh, k).lower(pk, sk, ab).compile(
        ).memory_analysis()
        cost = float(ma.temp_size_in_bytes + ma.argument_size_in_bytes
                     + ma.output_size_in_bytes)
        print(f"[ensemble] planned footprint for {k} members: "
              f"{cost / 1e9:.2f} GB (XLA memory analysis)")
        return cost

    try:
        budget = _device_budget_bytes(dev)
        chunk = _fit_member_chunk(n_members, budget, cost_of)
    except Exception as e:  # memory_analysis is backend-dependent
        print(f"[ensemble] chunk planning unavailable ({type(e).__name__}: {e}); "
              "starting at all members")
        return n_members
    if chunk < n_members:
        print(f"[ensemble] planned member_chunk={chunk} "
              f"(free-HBM budget {budget / 1e9:.1f} GB)")
    return chunk


def _evaluate_groups(
    model, paths, params_template, batch_stats_template, batches, mesh, chunk,
) -> Dict:
    """One full ensemble pass with members evaluated `chunk` at a time.

    Member-groups outer, valid batches inner: per-batch sums accumulate on
    HOST as (N, C) f32 (tiny), device memory holds only one group's stacked
    params + one vmapped forward at a time. Multiple passes over the valid
    set is exactly the reference's protocol (chexpert.py:217-236 re-runs the
    loader per checkpoint); chunk == K degenerates to the single-pass
    stacked-vmap fast path."""
    from chexpert_tpu.train.loop import _host_rows

    K = len(paths)
    steps = {}  # one compiled step per distinct group size
    out_sum = loss_sum = targets = mask = None
    for gi, group in enumerate(_member_groups(K, chunk)):
        stacked_params, stacked_stats = stack_checkpoints(
            [paths[i] for i in group], params_template, batch_stats_template
        )
        memb_sh = member_sharding(mesh, len(group))
        stacked_params = jax.device_put(stacked_params, memb_sh)
        stacked_stats = jax.device_put(stacked_stats, memb_sh)
        if len(group) not in steps:
            steps[len(group)] = make_ensemble_eval_step(model, mesh, len(group))
        step = steps[len(group)]

        outs, losses, tgts, msks = [], [], [], []
        for batch in device_prefetch(batches, batch_sharding(mesh)):
            o, l = step(stacked_params, stacked_stats, batch)
            # sum over this group's checkpoints (meaned over ALL K below —
            # the reference stacks dim 2 then .mean(2)); computed on device
            # so only (B, C) crosses to host
            outs.append(_host_rows(jnp.sum(o, axis=0)))
            losses.append(_host_rows(jnp.sum(l, axis=0)))
            if gi == 0:
                tgts.append(_host_rows(batch["label"]))
                msks.append(_host_rows(batch["mask"]))
        del stacked_params, stacked_stats  # free before the next group stacks
        o, l = np.concatenate(outs), np.concatenate(losses)
        out_sum = o if out_sum is None else out_sum + o
        loss_sum = l if loss_sum is None else loss_sum + l
        if gi == 0:
            targets, mask = np.concatenate(tgts), np.concatenate(msks)
    outs, losses = out_sum / K, loss_sum / K
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        outs, targets, losses, mask = (
            multihost_utils.process_allgather(a, tiled=True)
            for a in (outs, targets, losses, mask)
        )
    keep = mask.astype(bool)
    return compute_metrics(outs[keep], targets[keep], losses[keep])


def evaluate_ensemble(
    model, paths: List[str], params_template, batch_stats_template,
    batches: Batches, mesh, member_chunk: int = 0,
) -> Dict:
    """member_chunk=0: try all K members in one stacked vmap (fastest), and
    on device OOM halve the member chunk and retry — K members of a large
    arch at full resolution can exceed HBM (efficientnet-b4 x10 @ 320^2 OOMs
    a v5e chip). The starting chunk is PLANNED from the compiled step's XLA
    memory analysis vs the device's free HBM (_plan_member_chunk) because on
    this backend a failed execution can leak backend-side memory and poison
    every retry; the halving loop remains as a backstop only.
    member_chunk>0 pins the chunk and skips planning."""
    assert paths, "no checkpoints found to ensemble"
    chunk = member_chunk or _plan_member_chunk(
        model, mesh, len(paths), params_template, batch_stats_template, batches
    )
    while True:
        try:
            return _evaluate_groups(
                model, paths, params_template, batch_stats_template,
                batches, mesh, chunk,
            )
        except Exception as e:  # jaxlib raises XlaRuntimeError subclasses
            if "RESOURCE_EXHAUSTED" not in str(e) or chunk <= 1:
                raise
            chunk = (chunk + 1) // 2
            print(f"[ensemble] device OOM — retrying with member_chunk={chunk}")
            # The failed attempt's device buffers (stacked params, prefetched
            # batches, eval intermediates) are held alive by traceback->frame
            # reference CYCLES until the cycle collector runs — without this,
            # each retry starts with the previous attempts' garbage resident
            # and even chunk=1 OOMs (observed: b4 x10 gate, round 4).
            import gc
            import time

            del e
            gc.collect()
            # gc.collect alone proved insufficient (b4 x10 gate OOM'd down to
            # chunk=1 at a 69 MB device_put): the failed chunk sizes' compiled
            # executables stay in jax's global jit cache — on TPU each
            # executable pins its device program plus any constants — and the
            # abandoned prefetch producer thread can hold one device batch
            # for up to its 0.2 s put timeout after the generator finalizer
            # signals it. Drop the executable cache and give the producer a
            # beat to exit before re-allocating.
            jax.clear_caches()
            gc.collect()
            time.sleep(0.5)
            live = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)
            total = sum(a.nbytes for a in live)
            top = ", ".join(
                f"{a.shape}/{a.dtype}:{a.nbytes / 1e6:.0f}MB" for a in live[:6]
            )
            print(f"[ensemble] live device arrays after cleanup: "
                  f"{total / 1e9:.2f} GB ({len(live)}); top: {top}")
