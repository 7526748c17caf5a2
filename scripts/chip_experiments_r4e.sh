#!/bin/bash
# Round-4e: efficientnet-b4 ensemble re-gate after the host-stack + gc OOM fix.
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

echo "=== efficientnet-b4 acceptance (ensemble OOM fix; train reused) ==="
stdbuf -oL -eL timeout 5400 python -u scripts/acceptance.py --arch efficientnet-b4 \
  --epochs 10 --lr_decay_factor 0.999 --skip-train --out ACCEPTANCE.json 2>&1 | grep -v "^WARNING"
date -u
echo "=== done ==="
