"""Memory-bandwidth + CPU ceiling measurement (the environmental bound
on single-box scaling).

Why this exists: the north-rule target is >=0.8 throughput scaling
efficiency from N to 4N EXECUTORS. A real 4N scale-out multiplies
memory controllers and cores 4x; a single box does not — once the
guest's effective DRAM bandwidth (or its host CPU allocation) saturates,
adding workers cannot add throughput no matter how clean the shuffle
discipline is. This tool measures both ceilings directly so composite
local[N]->local[4N] efficiencies can be compared against what the box
itself can deliver.

Design — one PROCESS per worker (no GIL coupling; same shape as Spark's
python workers), each owning private prefaulted arrays:

- stream: repeated float64 reductions over a 32 MiB array (beyond any
  L3 share) — DRAM read bandwidth, the profile of shuffle/scan stages.
- cpu: the same reduction over an L1-resident 32 KiB array — no DRAM
  traffic, pure-CPU control.

All arrays are allocated AND touched during worker startup: this
Firecracker VM faults FRESH pages at ~5-100 MB/s (a 256 MiB first-touch
swings 0.3 s <-> 55 s), so timed iterations must only ever see warm,
resident pages. Per (level, workload) the BEST of REPS interleaved
iterations is kept (CPU-steal methodology of tools/scaling_bench.py).

Usage: python tools/membw_bench.py
       MEMBW_THREADS=1,4,8,16,32 MEMBW_REPS=5 python tools/membw_bench.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

LEVELS = tuple(
    int(x) for x in os.environ.get("MEMBW_THREADS", "1,4,8,16,32").split(",")
)
REPS = int(os.environ.get("MEMBW_REPS", "5"))
STREAM_MB = 32           # per-worker array, beyond per-core L3 share
STREAM_PASSES = 8        # passes per timed iteration
CPU_KB = 32              # L1-resident control array
CPU_ITERS = 8192         # reductions per timed iteration


def _worker(conn) -> None:
    stream = np.ones(STREAM_MB * 1024 * 1024 // 8)
    cpu = np.ones(CPU_KB * 1024 // 8)
    float(np.add.reduce(stream))     # prefault/warm
    conn.send("ready")
    while True:
        cmd = conn.recv()
        if cmd == "quit":
            break
        t0 = time.perf_counter()
        if cmd == "stream":
            for _ in range(STREAM_PASSES):
                float(np.add.reduce(stream))
        else:
            for _ in range(CPU_ITERS):
                float(np.add.reduce(cpu))
        conn.send(time.perf_counter() - t0)
    conn.close()


def main() -> None:
    ctx = mp.get_context("fork")
    max_t = max(LEVELS)
    pipes, procs = [], []
    t0 = time.perf_counter()
    for i in range(max_t):
        parent, child = ctx.Pipe()
        p = ctx.Process(target=_worker, args=(child,), daemon=True)
        p.start()
        pipes.append(parent)
        procs.append(p)
    for i, c in enumerate(pipes):
        assert c.recv() == "ready"
        print(f"worker {i + 1}/{max_t} ready "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    def run(level: int, cmd: str) -> float:
        """Aggregate throughput units/s: total work / slowest worker."""
        for c in pipes[:level]:
            c.send(cmd)
        walls = [c.recv() for c in pipes[:level]]
        wall = max(walls)
        if cmd == "stream":
            return level * STREAM_PASSES * STREAM_MB / 1024 / wall  # GB/s
        return level * CPU_ITERS / wall                             # red/s

    best = {w: {t: 0.0 for t in LEVELS} for w in ("stream", "cpu")}
    for rep in range(REPS):
        for t in LEVELS:
            for w in ("stream", "cpu"):
                v = run(t, w)
                best[w][t] = max(best[w][t], v)
            print(
                f"rep {rep} T={t}: stream {best['stream'][t]:.1f} GB/s "
                f"(best), cpu {best['cpu'][t]:,.0f} red/s (best)",
                flush=True,
            )
    for c in pipes:
        c.send("quit")

    report = {
        "method": "one PROCESS per worker (GIL-free), private prefaulted "
                  f"arrays, interleaved best-of-{REPS}; "
                  f"stream={STREAM_MB} MiB/worker x{STREAM_PASSES} passes, "
                  f"cpu={CPU_KB} KiB L1-resident",
        "stream_gb_per_s": {t: round(best["stream"][t], 2) for t in LEVELS},
        "cpu_reductions_per_s": {t: round(best["cpu"][t]) for t in LEVELS},
    }
    for lo, hi in ((2, 8), (4, 16), (8, 32)):
        for w in ("stream", "cpu"):
            if lo in LEVELS and hi in LEVELS and best[w][lo] > 0:
                report[f"{w}_ceiling_eff_{lo}to{hi}"] = round(
                    best[w][hi] / best[w][lo] / (hi / lo), 3
                )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
