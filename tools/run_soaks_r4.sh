#!/bin/bash
# Round-4 evidence campaign (VERDICT r3 next-round #1 and #6): run the
# engine-at-scale soaks sequentially (one Spark JVM at a time so each
# measurement owns the box) and leave one JSON artifact per leg in
# soak_results_r04/. Idempotent per leg: a leg is skipped if its artifact
# already exists and is non-empty, so the campaign can be re-run after a
# partial failure.
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

# Leg 1: budget ~1e4 URLs/round, 120 rounds, compaction + per-host
# politeness active (salting engages: 10k >= salt_fetch_threshold 256).
run_leg soak_budget_1e4 tools/engine_soak.py run \
  --nodes 5000000 --hosts 1024 --budget 10 --rounds 120 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_1e4 --fresh

# Leg 2: budget ~1e5 URLs/round, 100 rounds — the production-like point;
# driver-overhead share must shrink vs leg 1.
run_leg soak_budget_1e5 tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 100 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_1e5 --fresh

# Leg 3: resume-after-kill at mid-crawl (SIGKILL between pages write and
# frontier write), resumed run must match the control fingerprints.
run_leg soak_resume_proof tools/engine_soak.py resume-proof \
  --nodes 2000000 --hosts 512 --budget 24 --rounds 40 --kill-round 20 \
  --cpus 32 --compact-every 10 --store /tmp/lc_soak_resume

# Leg 4: two-parallelism scaling, local[8] vs local[32], alternated reps.
run_leg soak_scale_8v32 tools/engine_soak.py scale \
  --nodes 8000000 --hosts 2048 --budget 32 --rounds 40 --levels 8,32 \
  --reps 2 --compact-every 10 --store /tmp/lc_soak_scale

# Leg 5: dedup soak at 10^8 seen x 10^8 new with measured FPR.
run_leg dedup_soak_1e8 tools/dedup_soak.py \
  --seen 100000000 --new 100000000 --shards 256 --fpp 0.01 --cpus 32

rm -rf /tmp/lc_soak_1e4 /tmp/lc_soak_1e5 /tmp/lc_soak_resume_* /tmp/lc_soak_scale_*
echo "[campaign complete]"
