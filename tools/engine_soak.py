"""Engine-at-scale soak (VERDICT r3 "Next round" #1): run the BSP crawl
engine over the generative synthetic web at production-like budgets and
publish the evidence the 10^10-frontier design claims need —

  * pages/s at two round budgets (driver-overhead share must shrink as
    the budget grows),
  * resume-after-kill mid-crawl: a run SIGKILLed between the pages write
    and the frontier write of round K, resumed, must reproduce the
    uninterrupted control run's trace and URL-seen set exactly,
  * bounded store file counts under compaction across 100+ rounds,
  * throughput at two parallelism levels (local[8] vs local[32]) for the
    north_rule's N -> 4N scaling-efficiency criterion (no real cluster in
    this sandbox — same-input/two-parallelism is the sanctioned proxy).

Everything scale-bearing in a soak is the engine's own state: the web is
computed from the URL (sources/synthetic_web.py), so frontier growth,
anti-join dedup, per-host windows, salting and parquet round tables are
the only costs measured.

Usage (one JSON line on stdout per invocation):
  python tools/engine_soak.py run --nodes 1000000 --hosts 512 \
      --budget 64 --rounds 30 --cpus 32 --store /tmp/soak1 --fresh
  python tools/engine_soak.py resume-proof --nodes 300000 --hosts 256 \
      --budget 32 --rounds 24 --kill-round 12 --cpus 16
  python tools/engine_soak.py scale --nodes 1000000 ... --levels 8,32
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


# --- instrumented stores -----------------------------------------------------

def _timing_store(root: str, compact_every: int | None,
                  kill_round: int | None,
                  compact_files: int | None = None):
    """RoundStore that records per-round commit walltimes; optionally
    SIGKILLs the process at the most adversarial point of round
    `kill_round` — after the pages write, before the frontier write —
    leaving an uncommitted round=K pages partition for resume to purge."""
    from lightcrawler_spark.plans.storage import RoundStore

    class SoakStore(RoundStore):
        def __init__(self, spark):
            super().__init__(spark, root, compact_every=compact_every,
                             compact_files=compact_files)
            self.commit_walls: list[tuple[int, float]] = []

        def write(self, table, round_no, df):
            if kill_round is not None and table == "frontier" \
                    and round_no == kill_round:
                os._exit(137)  # simulated executor/driver loss mid-round
            super().write(table, round_no, df)

        def commit_round(self, round_no):
            super().commit_round(round_no)
            self.commit_walls.append((round_no, time.perf_counter()))

    return SoakStore


def _store_file_counts(root: str) -> dict:
    out = {}
    for table in sorted(os.listdir(root)):
        base = os.path.join(root, table)
        if not os.path.isdir(base):
            continue
        n_files = sum(
            1 for dp, _, fns in os.walk(base) for f in fns
            if f.endswith(".parquet")
        )
        n_dirs = len(os.listdir(base))
        out[table] = {"files": n_files, "partition_dirs": n_dirs}
    return out


# --- one soak run ------------------------------------------------------------

def cmd_run(a) -> dict:
    from pyspark.sql import functions as F

    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.session import get_spark
    from lightcrawler_spark.sources.synthetic_web import (
        GenerativeFetcher, SynthWebSpec, soak_crawl_spec,
    )

    if a.fresh and os.path.isdir(a.store):
        shutil.rmtree(a.store)
    conf = {"spark.ui.showConsoleProgress": "false"}
    if a.no_aqe:
        conf["spark.sql.adaptive.enabled"] = "false"
    if a.event_log:
        os.makedirs(a.event_log, exist_ok=True)
        conf["spark.eventLog.enabled"] = "true"
        conf["spark.eventLog.dir"] = f"file://{a.event_log}"
    spark = get_spark(
        f"engine-soak-{a.cpus}",
        master=f"local[{a.cpus}]",
        shuffle_partitions=a.shuffle_partitions or 2 * a.cpus,
        extra_conf=conf,
    )
    web = SynthWebSpec(
        n_nodes=a.nodes, n_hosts=a.hosts, out_degree=a.degree,
        img_every=a.img_every, skew_pct=a.skew_pct,
    )
    spec = soak_crawl_spec(
        web, spark, per_host_budget=a.budget, n_seeds=a.seeds or a.hosts,
        max_rounds=a.rounds, seen_filter=a.seen,
    )
    if a.revisit_after > 0:
        # conditional-recrawl soak arm: every article revisited once
        # its age passes --revisit-after; with --conditional the
        # deterministic ETags make every unchanged revisit a 304
        spec = dataclasses.replace(
            spec,
            revisit_url_rules=[r"#/p\d+$# i"],
            revisit_after_rounds=a.revisit_after,
            max_revisits=a.max_revisits,
            conditional_get=bool(a.conditional),
        )
    if a.row_repartition > 0:
        # A/B treatment: enable the opt-in rows arm of the fetch
        # repartition gate (spec.fetch_repartition_rows; off by default
        # after the leg-10 A/B measured it as a ~7.5% loss at the
        # many-hosts shape — see config.py).
        spec = dataclasses.replace(
            spec, fetch_repartition_rows=a.row_repartition)
    store_cls = _timing_store(a.store, a.compact_every, a.kill_round,
                              compact_files=a.compact_files or None)
    store = store_cls(spark)
    engine = CrawlEngine(spark, spec, GenerativeFetcher(web, spec),
                         store=store)
    t0 = time.perf_counter()
    result = engine.run(max_rounds=a.rounds, resume=a.resume)
    wall = time.perf_counter() - t0

    # fingerprints: order-insensitive set hashes, ANSI-safe (bit_xor)
    seen = result.frontier.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(url_md5))").alias("h"),
    ).first()
    trace = result.trace.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(seq, url, status, bytes_received))").alias("h"),
    ).first()

    per_round = {
        int(r["round"]): int(r["n"])
        for r in result.pages.groupBy("round")
        .agg(F.count("*").alias("n")).collect()
    }
    walls = store.commit_walls
    round_secs = [
        round(b - a_, 4) for (_, a_), (_, b) in zip(walls, walls[1:])
    ]
    # steady state = the last half of this run's rounds
    half = len(walls) // 2
    steady_pages = sum(
        n for rnd, n in per_round.items()
        if half < len(walls) and rnd > walls[half][0]
    )
    steady_secs = walls[-1][1] - walls[half][1] if len(walls) > 1 else 0.0

    report = {
        "mode": "run",
        "nodes": a.nodes, "hosts": a.hosts, "degree": a.degree,
        "img_every": a.img_every, "skew_pct": a.skew_pct,
        "per_host_budget": a.budget, "cpus": a.cpus,
        "compact_every": a.compact_every, "resume": a.resume,
        "seen_filter": a.seen,
        "rounds_run": result.rounds_run,
        "pages_fetched": result.pages_fetched,
        "bytes_received": result.bytes_received,
        "abort_reason": result.abort_reason,
        "n_304": int(
            result.trace.agg(
                F.coalesce(
                    F.sum((F.col("status") == 304).cast("long")), F.lit(0)
                )
            ).first()[0]
        ),
        "wall_s": round(wall, 2),
        "pages_per_sec": round(result.pages_fetched / wall, 1),
        "steady_pages_per_sec": (
            round(steady_pages / steady_secs, 1) if steady_secs > 0 else None
        ),
        "mean_round_s": (
            round(sum(round_secs) / len(round_secs), 3) if round_secs else None
        ),
        "mean_pages_per_round": (
            round(sum(per_round.values()) / max(len(per_round), 1), 1)
        ),
        "frontier_rows": int(seen["n"]),
        "seen_hash": int(seen["h"]) if seen["h"] is not None else 0,
        "trace_rows": int(trace["n"]),
        "trace_hash": int(trace["h"]) if trace["h"] is not None else 0,
        "store_files": _store_file_counts(a.store),
    }

    if a.img_every > 0 and a.products:
        from lightcrawler_spark.plans.assemble import build_image_caption_table

        tp = time.perf_counter()
        products = build_image_caption_table(result.pages)
        # the input_hint product table IS the soak's output artifact
        products.write.mode("overwrite").parquet(
            os.path.join(a.store, "products")
        )
        products = spark.read.parquet(os.path.join(a.store, "products"))
        expected = F.concat(
            F.lit("Synthetic caption "),
            F.regexp_extract("image_id", r"^i(\d+)$", 1),
        )
        prod = products.agg(
            F.count("*").alias("n"),
            F.sum((F.col("caption") != expected).cast("long")).alias("bad_cap"),
            F.sum(
                (F.regexp_extract("image_id", r"^i(\d+)$", 1) == "").cast("long")
            ).alias("bad_id"),
        ).first()
        # pixel invariant on a deterministic sample (full-corpus pixel
        # equality is covered per-row at small N by tests)
        import numpy as np

        from lightcrawler_spark.imagecodec import decode_image
        from lightcrawler_spark.sources.synthetic_web import synth_image_array

        sample = products.orderBy("image_id").limit(64).collect()
        pix_bad = sum(
            0 if np.array_equal(
                decode_image(bytes(r["bytes"])),
                synth_image_array(int(r["image_id"][1:])),
            ) else 1
            for r in sample
        )
        report["products"] = {
            "rows": int(prod["n"]),
            "caption_mismatches": int(prod["bad_cap"] or 0) + int(prod["bad_id"] or 0),
            "pixel_mismatches_in_sample64": pix_bad,
            "assemble_s": round(time.perf_counter() - tp, 2),
        }

    spark.stop()
    return report


# --- resume proof ------------------------------------------------------------

def _sub(args: list[str]) -> tuple[int, dict | None]:
    """Run a child soak; return (exit_code, parsed JSON or None)."""
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd="/root/repo",
    )
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            return p.returncode, json.loads(line)
        except json.JSONDecodeError:
            continue
    return p.returncode, None


def _common_args(a, store: str, cpus: int | None = None) -> list[str]:
    return [
        "--nodes", str(a.nodes), "--hosts", str(a.hosts),
        "--degree", str(a.degree), "--budget", str(a.budget),
        "--cpus", str(cpus or a.cpus), "--img-every", str(a.img_every),
        "--skew-pct", str(a.skew_pct), "--store", store,
        "--compact-every", str(a.compact_every),
        "--seen", a.seen,
        "--no-products",
    ]


def cmd_resume_proof(a) -> dict:
    base = a.store or "/tmp/lightcrawler_soak_resume"
    ctl_dir, crash_dir = base + "_ctl", base + "_crash"

    code, ctl = _sub(["run", *_common_args(a, ctl_dir),
                      "--rounds", str(a.rounds), "--fresh"])
    assert code == 0 and ctl, "control run failed"

    code, _ = _sub(["run", *_common_args(a, crash_dir),
                    "--rounds", str(a.rounds), "--fresh",
                    "--kill-round", str(a.kill_round)])
    assert code == 137, f"crash run should die with 137, got {code}"

    with open(os.path.join(crash_dir, "_watermark.json")) as fh:
        wm = json.load(fh)["round"]
    assert wm == a.kill_round - 1, (wm, a.kill_round)
    # the uncommitted round=K pages partition must exist pre-resume
    leftover = os.path.isdir(
        os.path.join(crash_dir, "pages", f"round={a.kill_round}")
    )

    code, res = _sub(["run", *_common_args(a, crash_dir),
                      "--rounds", str(a.rounds - wm), "--resume"])
    assert code == 0 and res, "resume run failed"

    verdict = {
        "mode": "resume-proof",
        "rounds": a.rounds, "killed_in_round": a.kill_round,
        "watermark_after_crash": wm,
        "uncommitted_pages_partition_existed": leftover,
        "control": {k: ctl[k] for k in
                    ("pages_fetched", "frontier_rows", "seen_hash",
                     "trace_rows", "trace_hash")},
        "resumed": {k: res[k] for k in
                    ("pages_fetched", "frontier_rows", "seen_hash",
                     "trace_rows", "trace_hash")},
    }
    verdict["equal"] = all(
        verdict["control"][k] == verdict["resumed"][k]
        for k in verdict["control"]
    )
    return verdict


# --- two-parallelism scaling -------------------------------------------------

def cmd_scale(a) -> dict:
    levels = [int(x) for x in a.levels.split(",")]
    base = a.store or "/tmp/lightcrawler_soak_scale"
    best: dict[int, dict] = {}
    # The guest's 32 vCPUs map to ~16.5 physical cores and suffer steal
    # bursts, so raw lo->hi efficiency conflates engine scaling with the
    # box's own compute ceiling. Measure that ceiling IN-WINDOW (a
    # GIL-free numpy process pool at the same worker count, right after
    # each soak run while the JVM is gone) and report efficiency both
    # raw and ceiling-normalized — the methodology BENCH.md rounds 2-3
    # established via tools/scaling_bench.py.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_bench import _HostCeiling

    ceil_best: dict[int, float] = {}

    def _ceiling(cpus: int) -> float:
        pool = _HostCeiling(cpus)
        try:
            return max(pool.run("hostcpu") for _ in range(3))
        finally:
            for c in pool.pipes:
                c.send("quit")

    # alternate full runs (A B A B ...) so both levels sample the same
    # steal-noise windows; keep the best run per level (scaling_bench
    # methodology at run granularity — one soak run is one measurement)
    for rep in range(a.reps):
        for cpus in levels:
            code, r = _sub([
                "run", *_common_args(a, f"{base}_{cpus}", cpus=cpus),
                "--rounds", str(a.rounds), "--fresh",
            ])
            assert code == 0 and r, f"scale run local[{cpus}] rep {rep} failed"
            ceil_best[cpus] = max(
                ceil_best.get(cpus, 0.0), _ceiling(cpus)
            )
            print(
                f"rep {rep} local[{cpus}]: {r['pages_per_sec']:,} pages/s "
                f"(steady {r['steady_pages_per_sec']}; "
                f"ceiling {ceil_best[cpus]:,.0f} red/s)",
                file=sys.stderr,
            )
            if cpus not in best or r["pages_per_sec"] > best[cpus]["pages_per_sec"]:
                best[cpus] = r
    lo, hi = levels[0], levels[-1]
    speedup = best[hi]["pages_per_sec"] / max(best[lo]["pages_per_sec"], 1e-9)
    ceil_speedup = ceil_best[hi] / max(ceil_best[lo], 1e-9)
    # determinism across parallelism levels: same trace, same seen set
    fp_equal = all(
        best[lo][k] == best[hi][k]
        for k in ("pages_fetched", "seen_hash", "trace_hash", "frontier_rows")
    )
    return {
        "mode": "scale",
        "nodes": a.nodes, "hosts": a.hosts, "per_host_budget": a.budget,
        "rounds": a.rounds, "reps": a.reps,
        "method": "alternated full runs, best-of per level",
        "levels": {
            c: {k: best[c][k] for k in
                ("cpus", "wall_s", "pages_per_sec", "steady_pages_per_sec",
                 "pages_fetched", "mean_round_s")}
            for c in levels
        },
        f"speedup_{lo}to{hi}": round(speedup, 3),
        "efficiency": round(speedup / (hi / lo), 3),
        "host_ceiling_reductions_per_s": {
            c: round(ceil_best[c], 1) for c in levels
        },
        "host_ceiling_efficiency": round(ceil_speedup / (hi / lo), 3),
        "efficiency_vs_host_ceiling": round(
            speedup / max(ceil_speedup, 1e-9), 3
        ),
        "fingerprints_equal_across_levels": fp_equal,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["run", "resume-proof", "scale"])
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--hosts", type=int, default=512)
    ap.add_argument("--degree", type=int, default=8)
    ap.add_argument("--budget", type=int, default=64,
                    help="per-host per-round politeness budget")
    ap.add_argument("--rounds", type=int, default=30)
    ap.add_argument("--seeds", type=int, default=0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=0)
    ap.add_argument("--img-every", type=int, default=8)
    ap.add_argument("--skew-pct", type=int, default=0)
    ap.add_argument("--store", default="/tmp/lightcrawler_soak")
    ap.add_argument("--compact-every", type=int, default=10)
    ap.add_argument("--compact-files", type=int, default=0,
                    help="segment width for compaction rewrites "
                         "(0 = store default: 8; leg-13 A/B rejected "
                         "a wider default)")
    ap.add_argument("--revisit-after", dest="revisit_after", type=int,
                    default=0, help="revisit articles after N rounds (0=off)")
    ap.add_argument("--max-revisits", dest="max_revisits", type=int, default=1)
    ap.add_argument("--conditional", action="store_true",
                    help="send validators on revisits (304 revalidation)")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--kill-round", type=int, default=None)
    ap.add_argument("--products", dest="products", action="store_true",
                    default=True)
    ap.add_argument("--no-products", dest="products", action="store_false")
    ap.add_argument("--seen", choices=["exact", "bloom"], default="exact",
                    help="URL-seen set: exact anti-join or LSM sharded Bloom")
    ap.add_argument("--row-repartition", type=int, default=0,
                    help="A/B: enable the opt-in rows arm of the fetch-"
                         "repartition gate at this row threshold "
                         "(0 = off, the default after the leg-10 A/B)")
    ap.add_argument("--no-aqe", action="store_true",
                    help="disable AQE (A/B: per-stage replan vs barrier cost)")
    ap.add_argument("--event-log", default=None,
                    help="write Spark event logs here (per-job profiling)")
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=2)
    a = ap.parse_args()

    if a.mode == "run":
        out = cmd_run(a)
    elif a.mode == "resume-proof":
        out = cmd_resume_proof(a)
    else:
        out = cmd_scale(a)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
