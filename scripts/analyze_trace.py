"""Aggregate a jax.profiler trace's TPU op durations by HLO category.

    python scripts/analyze_trace.py /tmp/aares_trace [top_n] [steps]

Finds the newest *.trace.json.gz under the dir and aggregates op events by
the profiler's own `hlo_category` metadata (convolution fusion, loop fusion,
concatenate, copy, ...), with per-category `bytes_accessed` so achieved HBM
bandwidth per category is visible (duration vs bytes separates MXU-bound
from traffic-bound from overhead-bound ops). Also prints the top individual
ops with their HLO long names (shapes + layouts). `steps` (default 3, the
profile scripts' trace window) divides totals into per-step numbers. Used to
attribute train-step time between MXU work and XLA layout glue.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys



def load_hlo_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no trace.json.gz under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    rows = []
    for e in data["traceEvents"]:
        args = e.get("args", {})
        if e.get("ph") == "X" and "hlo_category" in args:
            rows.append((
                e["name"], e["dur"], args["hlo_category"],
                int(args.get("bytes_accessed", 0)),
                args.get("long_name", ""),
            ))
    return rows, paths[-1]


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/aares_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rows, path = load_hlo_events(trace_dir)
    print(f"# {path}: {len(rows)} HLO op events / {steps} steps")
    by_cat_dur = collections.Counter()
    by_cat_bytes = collections.Counter()
    by_op = {}
    for name, dur, cat, byt, long_name in rows:
        by_cat_dur[cat] += dur
        by_cat_bytes[cat] += byt
        if name not in by_op:
            by_op[name] = [0, byt, cat, long_name]
        by_op[name][0] += dur
    total = sum(by_cat_dur.values())
    print(f"device time: {total/steps/1e3:.2f} ms/step, "
          f"{sum(by_cat_bytes.values())/steps/1e9:.1f} GB/step")
    print(f"  {'category':26s} {'ms/step':>8s} {'%':>6s} {'GB/step':>8s} {'GB/s':>6s}")
    for cat, dur in by_cat_dur.most_common():
        b = by_cat_bytes[cat]
        bw = b / (dur * 1e-6) / 1e9 if dur else 0.0
        print(f"  {cat:26s} {dur/steps/1e3:8.2f} {100*dur/total:6.1f} "
              f"{b/steps/1e9:8.2f} {bw:6.0f}")
    print(f"\ntop {top_n} ops (dur/step, bytes/call, category, long name):")
    for name, (dur, byt, cat, ln) in sorted(
            by_op.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"  {dur/steps/1e3:7.2f} ms {byt/1e9:6.2f} GB  {cat:20s} {ln[:110]}")

    log_b, phys_b = physical_bytes(by_op)
    if log_b:
        print(
            f"\nlayout-parsed bytes/step: logical {log_b/steps/1e9:.1f} GB, "
            f"physical (tile-padded) {phys_b/steps/1e9:.1f} GB "
            f"(amplification {phys_b/log_b:.2f}x) — 1.00x means XLA's layout "
            "choices waste no lanes/sublanes (e.g. batch-minor layouts)"
        )


_SHAPE_RE = None
_DT_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "pred": 1,
             "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f64": 8}


def _shape_bytes(dt: str, dims: str, layout: str):
    """(logical, physical) bytes of one printed HLO shape. Physical pads the
    two minor-most dims (per the layout's minor_to_major list) up to the
    T(sub, lane) tile — how Mosaic/XLA actually allocate HBM."""
    import re as _re
    esize = _DT_BYTES.get(dt, 4)
    if not dims:
        return esize, esize
    d = [int(v) for v in dims.split(",") if v]
    logical = esize
    for v in d:
        logical *= v
    m = _re.search(r"T\((\d+)(?:,(\d+))?\)", layout)
    order = layout.split(":")[0]
    try:
        perm = [int(v) for v in order.split(",")]
    except ValueError:
        return logical, logical
    if not m or len(perm) != len(d):
        return logical, logical
    t0 = int(m.group(1))
    t1 = int(m.group(2)) if m.group(2) else None
    padded = list(d)
    if t1 is not None and len(d) >= 2:
        padded[perm[0]] = -(-padded[perm[0]] // t1) * t1
        padded[perm[1]] = -(-padded[perm[1]] // t0) * t0
    else:
        padded[perm[0]] = -(-padded[perm[0]] // t0) * t0
    phys = esize
    for v in padded:
        phys *= v
    return logical, phys


def physical_bytes(by_op):
    """Sum logical vs tile-padded bytes over every shape printed in the
    unique ops' HLO long names (operands + outputs). Used round 4 to refute
    the lane-padding hypothesis for efficientnet (amplification = 1.00x:
    XLA picks batch-minor layouts in-model)."""
    import re as _re
    global _SHAPE_RE
    if _SHAPE_RE is None:
        _SHAPE_RE = _re.compile(
            r"(bf16|f16|f32|f64|s8|u8|s16|u16|s32|u32|pred)\[([0-9,]*)\]\{([^}]*)\}"
        )
    log_b = phys_b = 0
    for _name, (_dur, _byt, _cat, ln) in by_op.items():
        for mt in _SHAPE_RE.finditer(ln):
            l, p = _shape_bytes(mt.group(1), mt.group(2), mt.group(3))
            log_b += l
            phys_b += p
    return log_b, phys_b


if __name__ == "__main__":
    main()
