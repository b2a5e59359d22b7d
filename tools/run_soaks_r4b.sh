#!/bin/bash
# Round-4 follow-up legs (run after run_soaks_r4.sh completes):
#  - a third point on the budget-amortization curve (~5e5 URLs/round) so
#    BENCH.md can show pages/s still rising as the round budget grows,
#  - the LSM sharded-Bloom seen-filter at the leg-2 shape, so the scale
#    path for 10^10 frontiers (where the exact anti-join's shuffle is
#    the bottleneck) has a measured number next to the exact path.
# Both --no-products: legs 1-2 already witness the product table; these
# legs measure the round loop alone.
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

# Leg 6: ~5.2e5 URLs/round (1024 hosts x 512), 30 rounds. Per-host
# budget 512 >= salt_fetch_threshold 256, so this leg also witnesses the
# salted fetch repartition live at production budget (legs 1-2's takes
# of 10/48 rows per host stay under the gate by design).
run_leg soak_budget_5e5 tools/engine_soak.py run \
  --nodes 50000000 --hosts 1024 --budget 512 --rounds 30 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_5e5 --fresh --no-products

# Leg 7: leg-2 shape under the LSM sharded-Bloom seen filter.
run_leg soak_bloom_1e5 tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 40 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_bloom --fresh --no-products \
  --seen bloom

rm -rf /tmp/lc_soak_5e5 /tmp/lc_soak_bloom
echo "[campaign-b complete]"
