"""Generate the README performance table from the committed bench artifact.

The README's per-arch throughput claims must be regenerable records, not
prose (round-3 verdict): this script renders the newest `BENCH_all_r*.json` (written
by `python bench.py --model all --out ...` on the real chip) into the
markdown table between the BENCH_TABLE markers in README.md.

    python scripts/gen_perf_table.py                  # print the table
    python scripts/gen_perf_table.py --write          # splice into README.md
    python scripts/gen_perf_table.py --check          # exit 1 if README stale
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN BENCH_TABLE (generated: python scripts/gen_perf_table.py --write) -->"
END = "<!-- END BENCH_TABLE -->"


def render(artifact_path: str) -> str:
    d = json.load(open(artifact_path))
    has_infer = any("infer" in a for a in d["archs"].values())
    rows = []
    for name, a in d["archs"].items():
        if "sweep" in a:  # full train record (stub rows hold only `infer`)
            # sweep points that OOM'd are recorded as the string "oom"
            sweep = ", ".join(
                f"{b}→{v:.0f}" if not isinstance(v, str) else f"{b}→{v}"
                for b, v in a["sweep"].items()
            )
            cpu = a.get("measured_torch_cpu_img_s")
            vs_cpu = f"{a['value'] / cpu:,.0f}×" if cpu else "—"
            mfu = f"{a['mfu'] * 100:.1f}%" if a.get("mfu") is not None else "—"
            vs_b = (f"{a['vs_baseline']:.1f}×"
                    if a.get("vs_baseline") is not None else "—")
            row = (
                f"| {name} @ {a['image_size']}² | **{a['value']:.0f}** "
                f"(batch {a['best_batch']}, ±{a['spread_pct']}%) | {sweep} "
                f"| {mfu} | {vs_b} | {vs_cpu} |"
            )
        else:
            hw = a.get("infer", {}).get("image_size", a.get("image_size", "?"))
            row = f"| {name} @ {hw}² | — | — | — | — | — |"
        if has_infer:
            inf = a.get("infer")
            row += (f" **{inf['value']:,.0f}** (b1: {inf['latency_ms_b1']} ms) |"
                    if inf and inf.get("latency_ms_b1") is not None else
                    (f" **{inf['value']:,.0f}** |" if inf else " — |"))
        rows.append(row)
    infer_head = " infer img/s (b=1 latency) |" if has_infer else ""
    infer_sep = "---|" if has_infer else ""
    head = (
        f"_Generated from `{os.path.basename(artifact_path)}` "
        "(one `bench.py --model all` run on one TPU v5e chip; train fwd+bwd, "
        "bf16, median-of-3 per point). `vs V100-bound` is the ratio to a "
        "generous 40%-MFU V100 estimate for the torch reference "
        "(`ref_bound_img_s`, see BASELINE.md); `vs torch-CPU` is the ratio "
        "to the reference's own code measured on this host "
        "(`BASELINE_TORCH_CPU.json`)."
        + (" Infer = the forward-only serving path (`bench.py --infer`): "
           "best-batch throughput and single-image latency." if has_infer
           else "")
        + "_\n\n"
        "| arch | img/s | batch sweep | MFU | vs V100-bound | vs torch-CPU |"
        + infer_head + "\n"
        "|---|---|---|---|---|---|" + infer_sep
    )
    return head + "\n" + "\n".join(rows)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default=None,
                   help="defaults to the NEWEST committed BENCH_all_r*.json")
    p.add_argument("--readme", default=os.path.join(REPO, "README.md"))
    p.add_argument("--write", action="store_true")
    p.add_argument("--check", action="store_true")
    args = p.parse_args(argv)
    if args.artifact is None:
        found = sorted(glob.glob(os.path.join(REPO, "BENCH_all_r*.json")))
        if not found:
            print("no BENCH_all_r*.json artifact found", file=sys.stderr)
            return 2
        args.artifact = found[-1]

    table = render(args.artifact)
    if not (args.write or args.check):
        print(table)
        return 0

    text = open(args.readme).read()
    if BEGIN not in text or END not in text:
        print(f"markers not found in {args.readme}", file=sys.stderr)
        return 1
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    new = pre + BEGIN + "\n" + table + "\n" + END + post
    if args.check:
        if new != text:
            print("README bench table is stale; run "
                  "`python scripts/gen_perf_table.py --write`", file=sys.stderr)
            return 1
        print("README bench table up to date")
        return 0
    open(args.readme, "w").write(new)
    print(f"wrote table into {args.readme}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
