#!/bin/bash
# Round-4 queue, part 2 (part 1 = chip_experiments_r4.sh, which completed
# phases 1-2 before the session host recycled). Banks the full per-arch
# bench artifact first, then gates the remaining five acceptance archs with
# the link-aware throughput floor.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

if [ -n "$1" ]; then
  echo "=== waiting for prior pid $1 (test suite / earlier queue) ==="
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
  stdbuf -oL -eL timeout "$t" python -u "$@" 2>&1 | grep -v "^WARNING"
  date -u
}

echo "=== 1. full per-arch bench table -> BENCH_all_r04.json ==="
run 10800 bench.py --model all --out BENCH_all_r04.json

echo "=== 2. acceptance resnet152 ==="
run 5400 scripts/acceptance.py --arch resnet152 --out ACCEPTANCE.json

echo "=== 3. acceptance aadensenet121 (SGD arch: gate lr) ==="
run 7200 scripts/acceptance.py --arch aadensenet121 --lr 3e-2 --out ACCEPTANCE.json

echo "=== 4. acceptance aaresnet152 ==="
run 9000 scripts/acceptance.py --arch aaresnet152 --out ACCEPTANCE.json

echo "=== 5. acceptance efficientnet-b0 (slow BN momentum: more epochs) ==="
run 7200 scripts/acceptance.py --arch efficientnet-b0 --epochs 10 --lr_decay_factor 0.999 --out ACCEPTANCE.json

echo "=== 6. acceptance efficientnet-b4 ==="
run 9000 scripts/acceptance.py --arch efficientnet-b4 --epochs 10 --lr_decay_factor 0.999 --out ACCEPTANCE.json

echo "=== done ==="
