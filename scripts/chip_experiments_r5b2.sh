#!/bin/bash
# Round-5b2 chip queue (resumes the r5b plan after the depthwise sweep and
# batch-256 trace banked): first the two cheap attention-pack A/Bs so the
# BENCH_all table can record whichever default wins, then the acceptance
# refresh (new rows first), then the full table, then remaining gates.
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

echo "=== 1. aadensenet121 @128: fusedpack5d (5-D-domain concat) ==="
CHEXPERT_REL_IMPL=fusedpack5d stdbuf -oL -eL timeout 3600 python -u bench.py --model aadensenet121 --batch 128 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 2. aadensenet121 @128: fusedpack5d + mmskew height side ==="
CHEXPERT_REL_IMPL=fusedpack5d CHEXPERT_REL_H=mmskew stdbuf -oL -eL timeout 3600 python -u bench.py --model aadensenet121 --batch 128 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 3. acceptance densenet121 + pretrained proof (fresh ACCEPTANCE_r5) ==="
stdbuf -oL -eL timeout 9000 python -u scripts/acceptance.py --arch densenet121 --pretrained-proof --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 4. acceptance sabotage uzeros: gate must FAIL it ==="
stdbuf -oL -eL timeout 7200 python -u scripts/acceptance.py --arch densenet121 --sabotage uzeros --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 5. acceptance aaresnet152 (new kernel path) ==="
stdbuf -oL -eL timeout 9000 python -u scripts/acceptance.py --arch aaresnet152 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 6. acceptance sabotage einsum: throughput floor must FAIL it ==="
stdbuf -oL -eL timeout 9000 python -u scripts/acceptance.py --arch aaresnet152 --sabotage einsum --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 7. acceptance efficientnet-b7 (new gate row, verdict task 3) ==="
stdbuf -oL -eL timeout 10800 python -u scripts/acceptance.py --arch efficientnet-b7 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 8. full per-arch bench table -> BENCH_all_r05.json ==="
stdbuf -oL -eL timeout 10800 python -u bench.py --model all --out BENCH_all_r05.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 9. acceptance aadensenet121 ==="
stdbuf -oL -eL timeout 9000 python -u scripts/acceptance.py --arch aadensenet121 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 10. acceptance efficientnet-b4 ==="
stdbuf -oL -eL timeout 10800 python -u scripts/acceptance.py --arch efficientnet-b4 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 11. acceptance resnet152 ==="
stdbuf -oL -eL timeout 7200 python -u scripts/acceptance.py --arch resnet152 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 12. acceptance efficientnet-b0 ==="
stdbuf -oL -eL timeout 9000 python -u scripts/acceptance.py --arch efficientnet-b0 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u
echo "=== done ==="
