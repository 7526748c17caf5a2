#!/bin/bash
# Round-5c chip queue (after r5b2): re-gate densenet121 cleanly — the first
# r5 run's e2e throughput (378.8 img/s vs an 832.6 img/s link probe) was
# host-starved by a concurrent CPU test-suite run on this 1-core host, not a
# pipeline regression (the compute-only check passed at 942.6); keep the
# host idle this time. Then the now-meaningful fusedpack+mmskew A/B.
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

echo "=== 1. re-gate densenet121 (idle host; e2e floor must hold) ==="
stdbuf -oL -eL timeout 7200 python -u scripts/acceptance.py --arch densenet121 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 2. aadensenet121 @128: fusedpack + mmskew height side ==="
CHEXPERT_REL_IMPL=fusedpack CHEXPERT_REL_H=mmskew stdbuf -oL -eL timeout 3600 python -u bench.py --model aadensenet121 --batch 128 2>&1 | grep --line-buffered -v "^WARNING"
date -u
echo "=== done ==="
