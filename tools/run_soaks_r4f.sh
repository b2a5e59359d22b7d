#!/bin/bash
# HISTORICAL RECORD — leg 13 ran when the RoundStore compaction width
# briefly defaulted to max(8, defaultParallelism) = 32 on this box.
# The A/B it produced REJECTED that default (~4% mean-round loss vs
# the 8-file control, identical trace hashes; see BENCH.md leg 13), so
# the default is back to 8 and the width survives only as the
# RoundStore(compact_files=...) knob / --compact-files flag. To
# reproduce today: add --compact-files 32.
#
# Round-4 sixth campaign:
#
#  - Leg 13: compaction-width A/B. The leg-10b event-log decomposition
#    (BENCH.md) showed the three compaction rewrites running at
#    eff_par ≈ 4 (the old fixed coalesce(8) caps the rewrite's SCAN
#    parallelism too, since coalesce does not shuffle), ~39 s of the
#    820 s wall. The store default is now
#    max(8, defaultParallelism) = 32 on this box; control is
#    soak_gate_off_1e5.json (identical shape, 8-file segments). Same
#    seed/trace hashes expected — file layout is not semantics.
#
#  - Leg 14: dedup soak at 10^9 × 10^8 keys — one more order on the
#    seen side over BENCH.md leg 5 (10^8 × 10^8), halving the distance
#    to the 10^10 design point. 1024 shards keeps per-shard bitmaps
#    ~1.2 MB (the dedup.py sizing table row), FPR budget unchanged.
set -u
cd /root/repo
OUT=soak_results_r04
mkdir -p "$OUT"

run_leg() {
  local name="$1"; shift
  if [ -s "$OUT/$name.json" ]; then
    echo "[skip] $name (artifact exists)"
    return 0
  fi
  echo "[run ] $name: $*"
  local t0=$SECONDS
  if python "$@" >"$OUT/$name.json.tmp" 2>"$OUT/$name.err"; then
    mv "$OUT/$name.json.tmp" "$OUT/$name.json"
    echo "[done] $name in $((SECONDS - t0))s"
  else
    echo "[FAIL] $name (rc=$?) after $((SECONDS - t0))s; see $OUT/$name.err"
    rm -f "$OUT/$name.json.tmp"
  fi
}

# Leg 13: the leg-10a shape with the 32-file compaction width (was
# briefly the store default when this first ran; now the explicit
# treatment flag so a rerun reproduces the SAME arm).
run_leg soak_cwidth_1e5 tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 40 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_cw --fresh --no-products \
  --compact-files 32

# Leg 14: 10^9 seen keys x 10^8 probes, 1024 shards, 1% FPP.
run_leg dedup_soak_1e9 tools/dedup_soak.py \
  --seen 1000000000 --new 100000000 --overlap 0.5 \
  --shards 1024 --fpp 0.01 --cpus 32

rm -rf /tmp/lc_soak_cw
echo "[campaign-f complete]"
