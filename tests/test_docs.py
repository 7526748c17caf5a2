"""The README perf table must stay in sync with the committed bench artifact.

Round-3 verdict: per-arch throughput claims must be regenerable records, not
prose. scripts/gen_perf_table.py renders the newest BENCH_all_r*.json into
README.md;
this test fails whenever either side is edited without re-running --write.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_bench_table_fresh():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import gen_perf_table
    finally:
        sys.path.pop(0)
    assert gen_perf_table.main(["--check"]) == 0
