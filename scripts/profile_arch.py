"""Capture a jax.profiler trace of one arch's train step and break it down.

    python scripts/profile_arch.py <arch> [batch [image_size [outdir]]]

Reuses bench.py's `_setup_arch` scaffolding (same jit step, same synthetic
batch) so the profile matches what `bench.py --model <arch>` measures, then
runs analyze_trace.py's aggregation in-process. Used in round 4 to attribute
efficientnet's sub-roofline train steps (b4 at 78% of its bytes-implied HBM
floor, 8% MFU) between depthwise convs, fusions, and layout glue.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    arch = sys.argv[1] if len(sys.argv) > 1 else "efficientnet-b4"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    default_size = {"efficientnet-b4": 380}.get(arch, 320)
    size = int(sys.argv[3]) if len(sys.argv) > 3 else default_size
    step_kind = os.environ.get("CHEXPERT_PROFILE_STEP", "train")
    out = sys.argv[4] if len(sys.argv) > 4 else (
        f"/tmp/{arch.replace('-', '_')}_{step_kind}_trace")

    import jax

    from bench import _setup_arch, wait_for_device

    wait_for_device()
    train_step, eval_step, state, make_batch = _setup_arch(arch, size)
    b = make_batch(batch)

    # CHEXPERT_PROFILE_STEP=eval traces the forward-only serving/eval step
    # (bench.py --infer's timed callable) instead of the train step — used
    # in round 4 to attribute densenet121's infer gap to its roofline floor
    profile_eval = step_kind == "eval"

    def run_once():
        nonlocal state
        if profile_eval:
            _out, per_elem = eval_step(state, b)
            return jax.numpy.sum(per_elem)
        state, loss = train_step(state, b)
        return loss

    # warmup/compile (sync via a value fetch — axon block_until_ready
    # can return early, see CLAUDE.md)
    for _ in range(3):
        loss = run_once()
    float(loss)

    steps = 3
    jax.profiler.start_trace(out)
    for _ in range(steps):
        loss = run_once()
    float(loss)
    jax.profiler.stop_trace()
    print(f"trace written to {out}")

    from analyze_trace import load_hlo_events

    rows, path = load_hlo_events(out)
    print(f"# {path}: {len(rows)} HLO op events / {steps} steps")
    import collections

    by_cat = collections.defaultdict(lambda: [0, 0])
    by_op = {}
    for name, dur, cat, byt, long_name in rows:
        by_cat[cat][0] += dur
        by_cat[cat][1] += byt
        if name not in by_op:
            by_op[name] = [0, byt, cat, long_name]
        by_op[name][0] += dur
    total = sum(v[0] for v in by_cat.values())
    print(f"\n== by category (per step; total {total/steps/1e3:.2f} ms) ==")
    for cat, (dur, byt) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        bw = (byt / steps) / (dur / steps / 1e6) / 1e9 if dur else 0.0
        print(f"{cat:28s} {dur/steps/1e3:9.2f} ms  {byt/steps/1e9:8.2f} GB  {bw:7.1f} GB/s  {100*dur/total:5.1f}%")
    print("\n== top 30 ops (per step) ==")
    for name, (dur, byt, cat, long_name) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"{dur/steps/1e3:9.3f} ms  {byt/steps/1e9:7.3f} GB  [{cat}] {name}")
        if long_name:
            print(f"           {long_name[:180]}")


if __name__ == "__main__":
    main()
