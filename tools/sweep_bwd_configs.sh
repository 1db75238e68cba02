#!/bin/bash
# On-chip config sweep for the gather-fused backward kernels + agg:
#   - bwd edge tile TE x ybar window WB (incl. the round-5 'auto' pick)
#   - agg lane-pad vs unpadded-leg DMAs
# Each line: config -> per-mode ms from tools/bench_bwd_modes.py.
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-experiments/kernels/SWEEP_r05.txt}
: > "$OUT"
for cfg in \
    "TE=128 WB=auto" "TE=128 WB=8" "TE=128 WB=16" "TE=128 WB=64" \
    "TE=256 WB=auto" "TE=256 WB=16" ; do
  eval "$cfg"
  echo "== bwd TE=$TE WB=$WB agg_lanepad=0 ==" | tee -a "$OUT"
  SEVENN_BWD_EDGE_TILE=$TE SEVENN_BWD_WINDOW=$WB \
    timeout 900 python tools/bench_bwd_modes.py 2>/dev/null \
    | grep -E '^(xn|shn|wn|agg)|relerr|rel diff' | tee -a "$OUT"
done
echo "== bwd TE=128 WB=auto agg_lanepad=1 (round-4 padded legs) ==" | tee -a "$OUT"
SEVENN_AGG_LANEPAD=1 timeout 900 python tools/bench_bwd_modes.py 2>/dev/null \
  | grep -E '^(xn|shn|wn|agg)|relerr|rel diff' | tee -a "$OUT"
