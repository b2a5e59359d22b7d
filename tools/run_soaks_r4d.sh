#!/bin/bash
# HISTORICAL RECORD — this script ran when the rows arm of the fetch
# repartition gate was ON by default, so 10a disabled it via the
# then-existing --no-row-repartition flag. The leg-10 A/B it produced
# flipped the default OFF (config.py fetch_repartition_rows = 0); to
# reproduce today run 10a with no flag and 10b with
# --row-repartition 50000. A third, event-log-free gate-on arm was
# added as soak_gate_on_clean_1e5.json (isolates logging overhead).
#
# Round-4 fourth campaign (run after the post-fix leg-8 rerun):
#
#  - Leg 10 (a/b): rows-based fetch-repartition gate A/B at the leg-2
#    shape (20M nodes, 2048 hosts, B=48 -> ~94k URLs/round, below the
#    salt threshold so ONLY the rows arm differs). 10a runs with the
#    gate disabled (--no-row-repartition = pre-fix behavior, and the
#    clean img_every=8 control for leg 9's image-cost attribution,
#    since the leg-9 noimg run predates the gate). 10b runs with the
#    gate on plus a Spark event log, so tools/joblog_gaps.py can
#    decompose wall time into in-job vs driver-gap (the direct
#    measurement of the serial share the leg-4 Amdahl fit inferred).
#
#  - Leg 11: host-skew soak — 90% of article nodes pinned to host 0,
#    same shape otherwise. Per-host politeness keeps the WORK LIST
#    balanced (B caps host 0 like everyone else); the stress lands on
#    the frontier pop/rank stage, which must rank a mega-host pending
#    set (millions of host-0 rows) every round without a straggler.
#    Evidence = steady round time vs the balanced 10b control.
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

# Leg 10a: rows arm OFF (now the config default, so no flag needed;
# doubles as leg-9 img control).
run_leg soak_gate_off_1e5 tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 40 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_goff --fresh --no-products

# Leg 10b: rows arm ON (the then-default 50k threshold, now opt-in)
# + event log for the driver-gap decomposition.
run_leg soak_gate_on_1e5 tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 40 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_gon --fresh --no-products \
  --row-repartition 50000 --event-log /tmp/lc_evlog_gon

# Leg 11: 90% single-host skew, otherwise the 10b shape.
run_leg soak_skew90_1e5 tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 40 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_skew --fresh --no-products \
  --skew-pct 90

rm -rf /tmp/lc_soak_goff /tmp/lc_soak_gon /tmp/lc_soak_skew
echo "[campaign-d complete]"
