#!/bin/bash
# Round-4 fifth campaign: the seeded mega-host skew stress.
#
# Campaign D's leg 11 (soak_skew90_1e5) pinned 90% of article nodes to
# host 0 but seeded only one URL per host — per-host politeness then
# throttles DISCOVERY itself (host 0 yields 48 pages/round), so the
# frontier never accumulates the mega-host pending set the leg was
# meant to stress (80k rows after 40 rounds). These legs seed the
# pending set directly: --seeds 2000000 puts nodes 0..2M-1 into the
# round-0 frontier, and with --skew-pct 90 ~1.8M of them land on
# host 0. Every round's frontier scan / per-host watermark agg / pop
# ranking then runs against a pending set where one host owns 90% of
# the rows — the exact shape where an unpartitioned or unsalted rank
# stage would straggle.
#
#  - Leg 12a: balanced control (same 2M seeds, skew 0).
#  - Leg 12b: 90% mega-host (same 2M seeds, skew 90).
#
# Evidence = mean round seconds 12b vs 12a. Politeness makes the
# FETCHED work list balanced by construction (host 0 caps at B like
# everyone else); the scan/rank stages see the skew. A ratio near 1
# witnesses "skew handled explicitly" (north_rule) at the pending-set
# stage, complementing tests/test_skew_golden.py's salted fetch-stage
# engagement proof.
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

# Leg 12a: balanced control — 2M seeded URLs across 2048 hosts.
run_leg soak_seedskew_ctl tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 25 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_sctl --fresh --no-products \
  --seeds 2000000

# Leg 12b: mega-host — same seeds, 90% pinned to host 0.
run_leg soak_seedskew_90 tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 25 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_s90 --fresh --no-products \
  --seeds 2000000 --skew-pct 90

rm -rf /tmp/lc_soak_sctl /tmp/lc_soak_s90
echo "[campaign-e complete]"
