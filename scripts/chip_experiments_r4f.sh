#!/bin/bash
# Round-4f chip queue:
#   1. efficientnet-b4 acceptance gate, FULL train (the r4d run's ensemble
#      eval OOM'd before the member-chunking + host-stack fixes landed, and
#      /tmp — including the run dir — was wiped between sessions).
#   2. aadensenet121 --remat with its registry-default carried stats ON —
#      closes the round-3 advisor caveat that the only remat A/B forced
#      --no-prefix-stats and thus compared against a non-default baseline.
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

echo "=== 1. efficientnet-b4 acceptance (full train) ==="
stdbuf -oL -eL timeout 7200 python -u scripts/acceptance.py --arch efficientnet-b4 \
  --epochs 10 --lr_decay_factor 0.999 --out ACCEPTANCE.json 2>&1 | grep -v "^WARNING"
date -u

echo "=== 2. aadensenet121 batch 128: remat + default (carried) prefix stats ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --batch 128 --model aadensenet121 \
  --remat 2>&1 | grep -v "^WARNING"
date -u
echo "=== done ==="
