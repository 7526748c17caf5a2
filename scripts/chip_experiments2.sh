#!/bin/bash
# Follow-up on-chip queue (round 3): aaresnet152 batch sweep (the 150 img/s
# bar was only ever measured at batch 16) and remat A/Bs on the DenseNets.
# Waits for a prior queue PID (arg 1, optional) and for the TPU tunnel.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

if [ -n "$1" ]; then
  echo "=== waiting for prior queue pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

echo "=== waiting for TPU tunnel ==="
i=0
until timeout 90 python -c "import jax; jax.devices()" 2>/dev/null; do
  i=$((i+1)); sleep 45
done
echo "tunnel up after $i failed probes"
date -u

echo "=== 1. aaresnet152 batch 32 ==="
CHEXPERT_PROFILE_BATCH=32 stdbuf -oL -eL timeout 3600 python -u scripts/profile_aaresnet.py model 2>&1 | grep -v "^WARNING"

echo "=== 2. aaresnet152 batch 64 ==="
CHEXPERT_PROFILE_BATCH=64 stdbuf -oL -eL timeout 3600 python -u scripts/profile_aaresnet.py model 2>&1 | grep -v "^WARNING"

echo "=== 3. densenet121 batch 128: remat, prefix-stats OFF ==="
stdbuf -oL -eL timeout 2400 python -u bench.py --batch 128 --no-prefix-stats --remat 2>&1 | grep -v "^WARNING"

echo "=== 4. aadensenet121 batch 128: remat, prefix-stats OFF ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --batch 128 --model aadensenet121 --no-prefix-stats --remat 2>&1 | grep -v "^WARNING"

echo "=== 5. aaresnet152 batch 16 (rerun for variance) ==="
stdbuf -oL -eL timeout 3600 python -u scripts/profile_aaresnet.py model 2>&1 | grep -v "^WARNING"

echo "=== done ==="
