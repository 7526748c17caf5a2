#!/bin/bash
# Round-4c sequential chip queue:
#   1. HIL v3 numeric parity on-chip (fail-fast)
#   2. aaresnet152 HIL-vs-bn A/B at the perf-table batches
#   3. efficientnet-b4 acceptance retry (ensemble member-chunk OOM fix)
#   4. aaresnet152 acceptance re-gate (measured floor replaces the 250 fallback)
# Usage: scripts/chip_experiments_r4c.sh [pid-to-wait-for]
cd /root/repo
set -o pipefail

if [ -n "$1" ]; then
  echo "=== waiting for prior pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

echo "=== waiting for TPU tunnel ==="
i=0
until timeout 90 python -c "import jax; jax.devices()" 2>/dev/null; do
  i=$((i+1)); sleep 45
done
echo "tunnel up after $i failed probes"
date -u

run() {  # run <timeout> <args...>
  local t=$1; shift
  stdbuf -oL -eL timeout "$t" "$@" 2>&1 | grep -v "^WARNING"
  local rc=$?
  date -u
  return $rc
}

echo "=== 1. HIL v3 on-chip parity (fail-fast) ==="
run 2400 python -u /tmp/probe_hil3.py || { echo "PARITY FAILED — aborting queue"; exit 1; }

if [ ! -s /tmp/aares_bn_b16.json ]; then
  echo "=== 2a. aaresnet152 bn baseline, batch 16 ==="
  run 3600 python -u bench.py --model aaresnet152 --batch 16 --out /tmp/aares_bn_b16.json
fi

echo "=== 2b. aaresnet152 HIL v3, batch 16 ==="
run 3600 env CHEXPERT_ATTN_LAYOUT=hil python -u bench.py --model aaresnet152 --batch 16 --out /tmp/aares_hil_b16.json

echo "=== 2c. aaresnet152 HIL v3, batch 32 ==="
run 3600 env CHEXPERT_ATTN_LAYOUT=hil python -u bench.py --model aaresnet152 --batch 32 --out /tmp/aares_hil_b32.json

echo "=== 3. efficientnet-b4 acceptance retry (ensemble chunk fix; train reused) ==="
run 5400 python -u scripts/acceptance.py --arch efficientnet-b4 --epochs 10 --lr_decay_factor 0.999 --skip-train --out ACCEPTANCE.json

echo "=== 4. aaresnet152 acceptance re-gate (new floor) ==="
run 1200 python -u scripts/acceptance.py --arch aaresnet152 --skip-train --out ACCEPTANCE.json

echo "=== done ==="
