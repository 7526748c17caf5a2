"""Diff two jax.profiler traces' per-category totals (per step).

    python scripts/diff_traces.py /tmp/trace_before /tmp/trace_after [steps]

Used round 5 to quantify how much of aadensenet121's 'data formatting' share
the attention-pack boundary refactor removed (round-4 verdict task 1 asks
for glue <2% of step or a trace-backed refutation).
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from analyze_trace import load_hlo_events


def by_cat(trace_dir: str, steps: int):
    rows, path = load_hlo_events(trace_dir)
    agg = collections.defaultdict(lambda: [0.0, 0])
    for name, dur, cat, byt, _ in rows:
        agg[cat][0] += dur / steps / 1e3
        agg[cat][1] += byt / steps
    return agg, path


def main() -> None:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    a, pa = by_cat(a_dir, steps)
    b, pb = by_cat(b_dir, steps)
    ta = sum(v[0] for v in a.values())
    tb = sum(v[0] for v in b.values())
    print(f"A = {pa}\nB = {pb}")
    print(f"\n{'category':28s} {'A ms':>9s} {'B ms':>9s} {'delta':>8s}")
    for cat in sorted(set(a) | set(b), key=lambda c: -(a.get(c, [0])[0])):
        da, db = a.get(cat, [0, 0])[0], b.get(cat, [0, 0])[0]
        print(f"{cat:28s} {da:9.2f} {db:9.2f} {db - da:+8.2f}")
    print(f"{'TOTAL':28s} {ta:9.2f} {tb:9.2f} {tb - ta:+8.2f}")


if __name__ == "__main__":
    main()
