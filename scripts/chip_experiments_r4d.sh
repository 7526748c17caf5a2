#!/bin/bash
# Round-4d: acceptance re-gates (b4 ensemble-chunk fix, aaresnet152 floor).
cd /root/repo
set -o pipefail
export PYTHONPATH="/root/repo:${PYTHONPATH}"   # scripts/ runs need the repo root

if [ -n "$1" ]; then
  echo "=== waiting for prior pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

echo "=== waiting for TPU tunnel ==="
until timeout 90 python -c "import jax; jax.devices()" 2>/dev/null; do sleep 45; done
date -u

run() {
  local t=$1; shift
  stdbuf -oL -eL timeout "$t" "$@" 2>&1 | grep -v "^WARNING"
  local rc=$?
  date -u
  return $rc
}

echo "=== 1. efficientnet-b4 acceptance retry (ensemble chunk fix; train reused) ==="
run 5400 python -u scripts/acceptance.py --arch efficientnet-b4 --epochs 10 --lr_decay_factor 0.999 --skip-train --out ACCEPTANCE.json

echo "=== 2. aaresnet152 acceptance re-gate (new floor) ==="
run 1200 python -u scripts/acceptance.py --arch aaresnet152 --skip-train --out ACCEPTANCE.json

echo "=== done ==="
