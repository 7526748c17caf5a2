#!/bin/bash
# Round-5b chip queue (chained after r5a), priority-ordered so the verdict's
# must-land artifacts bank first: depthwise MXU sweep (task 2), batch-256
# trace (task 6), the new gate rows — pretrained proof (task 7), einsum
# floor-proof + efficientnet-b7 (task 3) — then the full BENCH_all_r05 table,
# then the remaining per-arch gate refreshes under the round-5 semantics
# (top-3 ensemble, compute-only floor, arch-aware defaults).
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

echo "=== 1. depthwise block-diagonal grouped-conv sweep (verdict task 2) ==="
stdbuf -oL -eL timeout 3600 python -u scripts/bench_depthwise_bd.py 128 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 2. batch-256 trace: attribute 886 vs 992 roofline (verdict task 6) ==="
stdbuf -oL -eL timeout 1800 python -u scripts/profile_arch.py densenet121 256 320 /tmp/dn121_b256_trace 2>&1 | tail -45
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
