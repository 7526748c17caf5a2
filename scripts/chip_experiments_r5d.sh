#!/bin/bash
# Round-5d chip queue: reordered tail of r5b2 (the einsum floor-proof item
# runs ~45 min longer than planned because its inline evals are einsum-slow
# too — which is the regression demonstrating itself). Priority order for
# the remaining wall-clock: b7 gate row, the full BENCH_all_r05 table, the
# clean densenet121 re-gate, then b4 / aadensenet121 / resnet152 / b0
# refreshes and the mmskew A/B.
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

echo "=== 1. acceptance efficientnet-b7 (new gate row, verdict task 3) ==="
stdbuf -oL -eL timeout 10800 python -u scripts/acceptance.py --arch efficientnet-b7 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 2. full per-arch bench table -> BENCH_all_r05.json ==="
stdbuf -oL -eL timeout 10800 python -u bench.py --model all --out BENCH_all_r05.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 3. re-gate densenet121 (idle host; e2e floor must hold) ==="
stdbuf -oL -eL timeout 7200 python -u scripts/acceptance.py --arch densenet121 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 4. acceptance efficientnet-b4 (de-flaked margins) ==="
stdbuf -oL -eL timeout 10800 python -u scripts/acceptance.py --arch efficientnet-b4 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 5. acceptance aadensenet121 ==="
stdbuf -oL -eL timeout 9000 python -u scripts/acceptance.py --arch aadensenet121 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 6. acceptance resnet152 ==="
stdbuf -oL -eL timeout 7200 python -u scripts/acceptance.py --arch resnet152 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 7. acceptance efficientnet-b0 ==="
stdbuf -oL -eL timeout 9000 python -u scripts/acceptance.py --arch efficientnet-b0 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 8. aadensenet121 @128: fusedpack + mmskew height side ==="
CHEXPERT_REL_IMPL=fusedpack CHEXPERT_REL_H=mmskew stdbuf -oL -eL timeout 3600 python -u bench.py --model aadensenet121 --batch 128 2>&1 | grep --line-buffered -v "^WARNING"
date -u
echo "=== done ==="
