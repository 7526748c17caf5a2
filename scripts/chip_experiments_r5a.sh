#!/bin/bash
# Round-5a chip queue: A/B the attention glue work (custom_vjp boundary moved
# outside the pack + fusedpack [q;RW] one-matmul emission) on both attention
# archs, then re-trace aadensenet121 to verify the 'data formatting' share
# shrank (round-4 verdict task 1: glue <2% of step, aadensenet121 >= 800,
# aaresnet152 >= 160 pinned, or a trace-backed refutation).
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

echo "=== 1. aadensenet121 batch 128: NEW default (boundary + fusedpack) ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --model aadensenet121 --batch 128 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 2. aadensenet121 batch 128: bd rel impl (boundary only, old pack) ==="
CHEXPERT_REL_IMPL=bd stdbuf -oL -eL timeout 3600 python -u bench.py --model aadensenet121 --batch 128 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 3. aaresnet152 batch 16: NEW default ==="
stdbuf -oL -eL timeout 5400 python -u bench.py --model aaresnet152 --batch 16 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 4. aaresnet152 batch 16: bd rel impl (boundary only) ==="
CHEXPERT_REL_IMPL=bd stdbuf -oL -eL timeout 5400 python -u bench.py --model aaresnet152 --batch 16 2>&1 | grep --line-buffered -v "^WARNING"
date -u

echo "=== 5. re-trace aadensenet121 @128 (glue share after the refactor) ==="
stdbuf -oL -eL timeout 1800 python -u scripts/profile_arch.py aadensenet121 128 320 /tmp/aadn_trace_r5b 2>&1 | tail -40
date -u
echo "=== done ==="
