#!/bin/bash
# Round-5e chip queue: final priority tail. The first b7 gate attempt paced
# to ~12 h (1 GB of checkpoint I/O per 16-step eval at batch 16); re-run
# with the batch-scaled eval cadence (ARCH_GATE_EVAL), then the clean
# densenet121 re-gate, the de-flaked b4 gate, the BENCH_all_r05 table, and
# whatever refreshes still fit.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
set -o pipefail
echo "=== waiting for TPU tunnel ==="
until timeout 90 python -c "import jax; jax.devices()" 2>/dev/null; do sleep 45; done
date -u

echo "=== 1. acceptance efficientnet-b7 (per-epoch eval cadence) ==="
stdbuf -oL -eL timeout 7200 python -u scripts/acceptance.py --arch efficientnet-b7 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 2. re-gate densenet121 (idle host; e2e floor must hold) ==="
stdbuf -oL -eL timeout 7200 python -u scripts/acceptance.py --arch densenet121 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 3. acceptance efficientnet-b4 (de-flaked margins) ==="
stdbuf -oL -eL timeout 9000 python -u scripts/acceptance.py --arch efficientnet-b4 --out ACCEPTANCE_r5.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 4. full per-arch bench table -> BENCH_all_r05.json ==="
stdbuf -oL -eL timeout 10800 python -u bench.py --model all --out BENCH_all_r05.json 2>&1 | grep --line-buffered -v "^WARNING"
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
