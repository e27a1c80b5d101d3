#!/bin/bash
# One-shot chip measurement session (run when the axon tunnel is healthy).
# 1) compaction-backend ablation  2) BLK sweep for the winner
# 3) headline bench.py (streaming e2e + chip rate)
# Usage: bash scripts/chip_session.sh [outdir]
set -u
OUT=${1:-/tmp/chip_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
echo "== ablation (C=2^24) ==" | tee "$OUT/ablation.log"
timeout 2400 python scripts/bench_compact.py 24 \
    front front32 onehot_i8 gather searchcmp posgather posgather_cmp \
    posgather@u32 2>&1 | tee -a "$OUT/ablation.log"
echo "== BLK sweep (posgather) ==" | tee "$OUT/blk.log"
for BLK in 512 2048; do
  MODIMIZER_BLK=$BLK timeout 1200 python scripts/bench_compact.py 24 \
      posgather 2>&1 | tee -a "$OUT/blk.log"
done
echo "== w=31 probe (Lemire device emit test; reference default divisor) ==" | tee "$OUT/w31.log"
MODIMIZER_BENCH_W=31 timeout 1200 python scripts/bench_compact.py 24 \
    front onehot_i8 posgather 2>&1 | tee -a "$OUT/w31.log"
echo "== bench.py ==" | tee "$OUT/bench.log"
timeout 3600 python bench.py > "$OUT/bench.json" 2>> "$OUT/bench.log"
cat "$OUT/bench.json" | tee -a "$OUT/bench.log"
