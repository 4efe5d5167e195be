#!/bin/bash
# STATUS item 30 hardware A/B (VERDICT r3 item 3): per-object static
# render-window DMAs (ITPU_STATIC_WINDOWS=1) vs batch-max windows (=0),
# interleaved at the headline config (1080p, batch 768) plus the
# identity/no-scaling workload (the round-3 blend-tiling revert showed
# cross-workload discipline matters). Raw JSON lines land in $OUT.
set -u
OUT=${1:-/tmp/ab_static_windows}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

for trial in 1 2 3; do
  for sw in 0 1; do
    echo "=== trial $trial static_windows=$sw (headline) ==="
    ITPU_STATIC_WINDOWS=$sw timeout 900 python bench.py \
      --batch 768 --reps 20 --pil-rounds 1 --pil-canvases 2 \
      > "$OUT/headline_sw${sw}_t${trial}.json" 2> "$OUT/headline_sw${sw}_t${trial}.log"
    tail -1 "$OUT/headline_sw${sw}_t${trial}.json"
  done
done

for trial in 1 2; do
  for sw in 0 1; do
    echo "=== trial $trial static_windows=$sw (identity, headline kernel config) ==="
    ITPU_STATIC_WINDOWS=$sw timeout 900 python benchmarks/identity_bench.py \
      --batch 768 --headline-config \
      > "$OUT/identity_sw${sw}_t${trial}.json" 2> "$OUT/identity_sw${sw}_t${trial}.log"
    tail -1 "$OUT/identity_sw${sw}_t${trial}.json"
  done
done
