"""Aggregate a jax.profiler trace's TPU op durations by category.

    python scripts/analyze_trace.py /tmp/aares_trace [top_n]

Finds the newest *.trace.json.gz under the dir, keeps TensorCore-lane events,
and reports total device time per op-name bucket (fusion kinds, transposes/
copies, custom calls, convolutions) plus the top individual ops. Used to
attribute train-step time between MXU work and XLA layout glue.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no trace.json.gz under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find TensorCore pids (XLA op lanes live under "/device:TPU" tracks)
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name and "XLA" not in name:
                tpu_pids.add(e["pid"])
    rows = []
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            rows.append((e["name"], e["dur"]))
    return rows, paths[-1]


CATS = [
    ("pallas_attention", re.compile(r"hm\.|custom-call|tpu_custom_call|pallas")),
    ("convolution", re.compile(r"convolution|conv")),
    ("transpose/copy", re.compile(r"transpose|copy")),
    ("rel einsum (dot)", re.compile(r"dot")),
    ("fusion", re.compile(r"fusion")),
    ("dynamic/slice/concat/pad", re.compile(r"slice|concatenate|pad|reshape|bitcast")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, rx in CATS:
        if rx.search(low):
            return cat
    return "other"


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/aares_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    rows, path = load_events(trace_dir)
    print(f"# {path}: {len(rows)} TensorCore events")
    by_cat = collections.Counter()
    by_op = collections.Counter()
    for name, dur in rows:
        by_cat[categorize(name)] += dur
        by_op[name] += dur
    total = sum(by_cat.values())
    print(f"total device time: {total/1e3:.2f} ms")
    for cat, dur in by_cat.most_common():
        print(f"  {cat:26s} {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%")
    print(f"\ntop {top_n} ops:")
    for name, dur in by_op.most_common(top_n):
        print(f"  {dur/1e3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
