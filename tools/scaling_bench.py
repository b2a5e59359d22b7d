"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule requires throughput scaling efficiency >= 0.8 between a cluster
of N and 4N executors. No real cluster exists in this sandbox, so the
sanctioned evidence is: run the SAME job on the SAME input at two
parallelism levels (local[8] vs local[32]) and report throughput at both
plus efficiency = (thr_hi / thr_lo) / (cpus_hi / cpus_lo).

Measurement design — this Firecracker VM suffers multi-minute host CPU
steal bursts (the same job swings 4-6x back-to-back), so:

1. one PERSISTENT worker process per level (warm JVM, warm python
   workers — cold first-runs are 2-4x slower and would be attributed to
   whichever level ran first);
2. the orchestrator alternates single ~5-20 s workload iterations
   between the two levels (A B A B …, REPS each) so both levels sample
   the same noise windows at a grain finer than the bursts;
3. per (level, workload) the BEST iteration is kept — the only
   defensible estimate of quiet-machine capacity under stolen CPU.

Usage:
  python tools/scaling_bench.py              # full run, prints JSON report
  SCALING_REPS=6 python tools/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = tuple(int(x) for x in os.environ.get("SCALING_LEVELS", "8,32").split(","))
REPS = int(os.environ.get("SCALING_REPS", "8"))
# hostcpu / hostbw are the box's OWN ceilings (GIL-free process
# reductions: L1-resident compute / DRAM stream — tools/membw_bench.py
# kernels), interleaved through the SAME steal-noise windows as the
# Spark workloads so every report carries its contemporaneous
# environmental bound. Spark efficiency ÷ hostcpu efficiency =
# environment-normalized efficiency.
WORKLOADS = tuple(
    os.environ.get(
        "SCALING_WORKLOADS",
        "dedup,pages,images,audio,kmeans,hostcpu,hostbw",
    ).split(",")
)


class _HostCeiling:
    """Process pool running the membw_bench kernels at this level's
    worker count; arrays prefaulted once at first use (this VM faults
    fresh pages at ~5-100 MB/s — timed runs must see warm pages)."""

    def __init__(self, n: int):
        import multiprocessing as mp

        self.n = n
        ctx = mp.get_context("fork")
        self.pipes = []
        for _ in range(n):
            parent, child = ctx.Pipe()
            ctx.Process(target=self._worker, args=(child,), daemon=True).start()
            self.pipes.append(parent)
        for c in self.pipes:
            assert c.recv() == "ready"

    @staticmethod
    def _worker(conn):
        import time as _t

        import numpy as np

        stream = np.ones(32 * 1024 * 1024 // 8)
        cpu = np.ones(32 * 1024 // 8)
        float(np.add.reduce(stream))
        conn.send("ready")
        while True:
            cmd = conn.recv()
            if cmd == "quit":
                break
            t0 = _t.perf_counter()
            if cmd == "hostbw":
                for _ in range(8):
                    float(np.add.reduce(stream))
            else:
                for _ in range(8192):
                    float(np.add.reduce(cpu))
            conn.send(_t.perf_counter() - t0)

    def run(self, cmd: str) -> float:
        for c in self.pipes:
            c.send(cmd)
        wall = max(c.recv() for c in self.pipes)
        if cmd == "hostbw":
            return self.n * 8 * 32 / 1024 / wall      # GB/s
        return self.n * 8192 / wall                   # reductions/s


def serve(cpus: int) -> None:
    """Persistent worker: one Spark session, runs one workload iteration
    per stdin command, prints one JSON line per result."""
    import bench
    from lightcrawler_spark.session import get_spark

    bench.CPUS = cpus
    spark = get_spark(
        f"scaling-worker-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    ceiling = _HostCeiling(cpus)
    fns = {
        "dedup": lambda: bench.bench_frontier_dedup(spark)["ops_per_sec"],
        "pages": lambda: bench.bench_page_pipeline(spark)["pages_per_sec"],
        "images": lambda: bench.bench_image_decode(spark)["images_per_sec"],
        "audio": lambda: bench.bench_audio_pipeline(spark)["clips_per_sec"],
        "kmeans": lambda: bench.bench_kmeans_assign(spark)["vectors_per_sec"],
        # not in the default list — opt in via SCALING_WORKLOADS
        "kmeans_train": lambda: bench.bench_kmeans_train(spark)[
            "vec_iters_per_sec"],
        "batch_layout": lambda: bench.bench_batch_layout(spark)[
            "rows_per_sec"],
        "hostcpu": lambda: ceiling.run("hostcpu"),
        "hostbw": lambda: ceiling.run("hostbw"),
    }
    print(json.dumps({"ready": cpus}), flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd in ("quit", ""):
            break
        print(json.dumps({"workload": cmd, "value": fns[cmd]()}), flush=True)
    spark.stop()


def _spawn(cpus: int) -> subprocess.Popen:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR)
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--serve", str(cpus)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env, cwd="/root/repo",
    )
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError(f"worker local[{cpus}] died during startup")
        try:
            if json.loads(line).get("ready") == cpus:
                return p
        except json.JSONDecodeError:
            continue


def _ask(p: subprocess.Popen, workload: str) -> float:
    p.stdin.write(workload + "\n")
    p.stdin.flush()
    while True:
        line = p.stdout.readline()
        if not line:
            raise RuntimeError("worker died mid-command")
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("workload") == workload:
            return float(d["value"])


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--serve":
        serve(int(sys.argv[2]))
        return

    workers = {c: _spawn(c) for c in LEVELS}
    best = {c: {w: 0.0 for w in WORKLOADS} for c in LEVELS}
    # warm both levels once per workload (not recorded)
    for w in WORKLOADS:
        for c in LEVELS:
            _ask(workers[c], w)
    for w in WORKLOADS:
        for rep in range(REPS):
            for c in LEVELS:
                v = _ask(workers[c], w)
                best[c][w] = max(best[c][w], v)
                print(f"{w} rep {rep} local[{c}]: {v:,.0f}", file=sys.stderr)
    for p in workers.values():
        try:
            p.stdin.write("quit\n")
            p.stdin.flush()
        except BrokenPipeError:
            pass

    lo, hi = LEVELS
    report = {"sf_dir": SF_DIR, "reps": REPS, "method":
              "persistent warm workers, tight A/B interleave, best-of",
              "levels": {c: {"cpus": c, **best[c]} for c in LEVELS}}
    for w in WORKLOADS:
        speedup = best[hi][w] / max(best[lo][w], 1e-9)
        report[f"{w}_speedup_{lo}to{hi}"] = round(speedup, 3)
        report[f"{w}_efficiency"] = round(speedup / (hi / lo), 3)
    host_eff = report.get("hostcpu_efficiency", 0.0)
    if host_eff:
        for w in ("dedup", "pages", "images", "kmeans"):
            if w in WORKLOADS:
                report[f"{w}_efficiency_vs_host_ceiling"] = round(
                    report[f"{w}_efficiency"] / host_eff, 3
                )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
