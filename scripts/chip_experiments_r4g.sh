#!/bin/bash
# Round-4g chip queue: block-level slim-residuals A/Bs (the bounded-HLO
# retry of the slim-bwd idea — one remat scope per dense block excluding
# the O(L^2) norm1+relu residual by name), then refresh the two noisiest
# BENCH_all_r04.json rows and add the missing efficientnet-b7 row.
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

echo "=== 1. densenet121 batch 128: slim-block (standard path) ==="
stdbuf -oL -eL timeout 2400 python -u bench.py --batch 128 --slim-block 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 2. densenet121 batch 128: slim-block + carried stats ==="
stdbuf -oL -eL timeout 2400 python -u bench.py --batch 128 --slim-block --prefix-stats 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 3. aadensenet121 batch 128: slim-block (default carried stats) ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --batch 128 --model aadensenet121 --slim-block 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 4. refresh noisy rows: efficientnet-b4 (spread was 10.7%) ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --model efficientnet-b4 --image-size 380 \
  --batch 64,128 --merge-into BENCH_all_r04.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 5. refresh noisy rows: aadensenet121 (751 vs 780-805 record) ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --model aadensenet121 \
  --batch 64,128 --merge-into BENCH_all_r04.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 6. add efficientnet-b7 row (batch 8/16 smoke scale) ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --model efficientnet-b7 \
  --batch 8,16 --merge-into BENCH_all_r04.json 2>&1 | grep --line-buffered -v "^WARNING"
date -u
echo "=== done ==="
