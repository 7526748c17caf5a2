#!/bin/bash
# Sequential on-chip experiment queue: waits for the tunnel, then measures.
# Order = round-gate priority: densenet headline A/B first.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== waiting for TPU tunnel ==="
i=0
until timeout 90 python -c "import jax; jax.devices()" 2>/dev/null; do
  i=$((i+1)); sleep 45
done
echo "tunnel up after $i failed probes"
date -u

echo "=== 1. densenet121 batch 128: prefix-stats ON ==="
stdbuf -oL -eL timeout 2400 python -u bench.py --batch 128 2>&1 | grep -v "^WARNING"

echo "=== 2. densenet121 batch 128: prefix-stats OFF (A/B) ==="
stdbuf -oL -eL timeout 2400 python -u bench.py --batch 128 --no-prefix-stats 2>&1 | grep -v "^WARNING"

echo "=== 3. aaresnet152 baseline (default VMEM, budget 14MB) ==="
stdbuf -oL -eL timeout 2400 python -u scripts/profile_aaresnet.py model 2>&1 | grep -v "^WARNING"

echo "=== 4. aaresnet152 raised scoped VMEM 32MiB, budget 28MB ==="
CHEXPERT_ATTN_VMEM_MB=28 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768 \
  stdbuf -oL -eL timeout 3600 python -u scripts/profile_aaresnet.py model 2>&1 | grep -v "^WARNING"

echo "=== 5. aadensenet121 batch 128: prefix-stats ON ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --batch 128 --model aadensenet121 2>&1 | grep -v "^WARNING"

echo "=== 6. aadensenet121 batch 128: prefix-stats OFF (A/B) ==="
stdbuf -oL -eL timeout 3600 python -u bench.py --batch 128 --model aadensenet121 --no-prefix-stats 2>&1 | grep -v "^WARNING"

echo "=== done ==="
