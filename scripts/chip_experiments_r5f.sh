#!/bin/bash
# Round-5f: refresh the serving-path (infer) records in BENCH_all_r05.json
# with round-5 measurements (the r5 table run recorded train rows only; the
# infer sub-records were carried from r04 pending this run).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
set -o pipefail
if [ -n "$1" ]; then
  echo "=== waiting for prior pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== waiting for TPU tunnel ==="
until timeout 90 python -c "import jax; jax.devices()" 2>/dev/null; do sleep 45; done
date -u
echo "=== infer table -> merge into BENCH_all_r05.json ==="
stdbuf -oL -eL timeout 7200 python -u bench.py --infer --model all --merge-into BENCH_all_r05.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u
echo "=== regenerate README table with fresh infer records ==="
python scripts/gen_perf_table.py --write && python scripts/gen_perf_table.py --check \
  && git add BENCH_all_r05.json README.md \
  && git commit -m "BENCH_all_r05: round-5 serving-path (infer) records; README table regenerated" \
  || echo "infer merge/regen failed; carried r04 records stand"
echo "=== done ==="
