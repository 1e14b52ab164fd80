#!/bin/bash
# Round-3 device measurement sweep — run serially when the TPU relay is
# back (single host core: never two JAX processes at once).
# Usage: bash benchmarks/r3_sweep.sh 2>&1 | tee /tmp/r3_sweep.log
set -x
cd "$(dirname "$0")/.."

# 1. flash2 vs dense/flash at the bench tile (headline decision data)
timeout 1500 python -u benchmarks/micro_corrvariants.py

# 2. flash2 blocking sweep (QB x GR; QBS fixed 16)
for qb in 256 512; do
  for gr in 4 8; do
    TPUFLOW_F2_QB=$qb TPUFLOW_F2_GR=$gr ONLY=flash2 \
      timeout 900 python -u benchmarks/micro_corrvariants.py
  done
done

# 3. full forward with the winner (edit CORR if flash2 loses)
timeout 1500 env CORR=flash2 python -u benchmarks/fwd_tile.py
timeout 1500 env CORR=flash2 B=2 python -u benchmarks/fwd_tile.py

# 4. SK stack per-op profile (bf16-packing question)
timeout 1500 python -u benchmarks/profile_pcblock.py

# 5. 2160p full-frame lookup demo (VERDICT #4 artifact)
timeout 1800 python -u benchmarks/micro_4k.py
