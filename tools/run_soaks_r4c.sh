#!/bin/bash
# Round-4 third campaign (run after run_soaks_r4b.sh completes):
#
#  - Leg 8: the compute-dominated two-parallelism scaling run. Leg 4
#    (8v32 at ~63k URLs/round) is Amdahl-bound by the ~13.6 s fixed
#    round cost and SMT-bound above 16 threads (the guest's 32 vCPUs
#    are ~16.5 physical cores, BENCH.md rounds 1-3). This leg moves
#    BOTH levels inside the physical-core budget (local[4] vs
#    local[16] = N and 4N real cores) and raises the round budget to
#    ~5.2e5 URLs/round so the scalable share owns the round. This is
#    the sandbox's honest analog of the north rule's "N and 4N
#    executors" criterion.
#
#  - Leg 9: image-synthesis cost attribution: the leg-2 shape with
#    img_every=0 (no PNG pages), isolating the HTML-only engine loop
#    so BENCH.md can report what share of the per-page marginal cost
#    is the synthetic fetch stand-in (on a real cluster the fetch is
#    overlapped network I/O, not CPU).
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

# Leg 8: N=4 vs 4N=16 cores, ~5.2e5 URLs/round (1024 hosts x B=512,
# salting engaged at both levels), 10 rounds (budget saturates by
# round ~4; steady window = rounds 6-10).
run_leg soak_scale_4v16 tools/engine_soak.py scale \
  --nodes 50000000 --hosts 1024 --budget 512 --rounds 10 \
  --levels 4,16 --reps 1 --compact-every 10 \
  --store /tmp/lc_soak_scale_c

# Leg 9: leg-2 shape, no image pages.
run_leg soak_noimg_1e5 tools/engine_soak.py run \
  --nodes 20000000 --hosts 2048 --budget 48 --rounds 40 --cpus 32 \
  --compact-every 10 --store /tmp/lc_soak_noimg --fresh --no-products \
  --img-every 0

rm -rf /tmp/lc_soak_scale_c_4 /tmp/lc_soak_scale_c_16 /tmp/lc_soak_noimg
echo "[campaign-c complete]"
