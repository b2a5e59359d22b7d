"""Memory-bandwidth ceiling measurement (the environmental bound on
single-box thread scaling).

Why this exists: the north-rule target is >=0.8 throughput scaling
efficiency from N to 4N EXECUTORS. A real 4N scale-out multiplies
memory controllers 4x; a single box does not — once its DRAM controller
saturates, adding threads cannot add throughput no matter how clean the
shuffle discipline is. This tool measures that ceiling directly so the
composite local[8]->local[32] efficiency can be compared against the
box's own attainable maximum.

Two workloads, both numpy (GIL released inside ufuncs), T concurrent
threads each touching its own private arrays:

- stream: float64 sum over arrays far beyond L3 (~256 MiB/thread
  touched per iteration) — pure DRAM read bandwidth, the profile of
  shuffle/scan-heavy Spark stages.
- cpu: the same reduction over an L1-resident 32 KiB array iterated to
  equal FLOPs — no DRAM traffic, the pure-CPU control. Its scaling
  shows what the scheduler/cores can deliver when bandwidth is not the
  bottleneck.

Per level the BEST of REPS interleaved iterations is kept (same
CPU-steal methodology as tools/scaling_bench.py). Output: one JSON
report with GB/s + iters/s per thread count and the derived 8->32 and
4->16 efficiency ceilings.

Usage: python tools/membw_bench.py        # ~2-4 min
       MEMBW_THREADS=1,4,8,16,32 MEMBW_REPS=5 python tools/membw_bench.py
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

THREADS = tuple(
    int(x) for x in os.environ.get("MEMBW_THREADS", "1,4,8,16,32").split(",")
)
REPS = int(os.environ.get("MEMBW_REPS", "5"))
# Per-thread array: large enough that 1 thread's working set exceeds its
# L3 share, small enough that prefaulting max_t arrays stays feasible —
# this Firecracker VM faults FRESH pages at only ~5-100 MB/s (measured:
# a 256 MiB first-touch swings 0.3 s ↔ 55 s), so all arrays are
# allocated AND touched once in setup; timed iterations see only warm,
# resident pages.
STREAM_MB = 32
CPU_KB = 32              # L1-resident control array
CPU_ITERS = 8192         # reductions per cpu iteration


def _stream_worker(arr: np.ndarray, out: list, i: int) -> None:
    t0 = time.perf_counter()
    s = float(np.add.reduce(arr))
    out[i] = (time.perf_counter() - t0, s)


def _cpu_worker(arr: np.ndarray, out: list, i: int) -> None:
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(CPU_ITERS):
        s += float(np.add.reduce(arr))
    out[i] = (time.perf_counter() - t0, s)


def _run(worker, arrays: list[np.ndarray]) -> float:
    """Launch one thread per array, return the wall time of the slowest
    (aggregate throughput = total work / wall)."""
    n = len(arrays)
    out: list = [None] * n
    threads = [
        threading.Thread(target=worker, args=(arrays[i], out, i))
        for i in range(n)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0


def main() -> None:
    stream_n = STREAM_MB * 1024 * 1024 // 8
    cpu_n = CPU_KB * 1024 // 8
    max_t = max(THREADS)
    stream_arrays = []
    t0 = time.perf_counter()
    for i in range(max_t):
        a = np.ones(stream_n)      # np.ones writes → pages faulted here
        float(np.add.reduce(a))    # warm read pass
        stream_arrays.append(a)
        print(f"prefault {i + 1}/{max_t} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    cpu_arrays = [np.ones(cpu_n) for _ in range(max_t)]

    best_bw: dict[int, float] = {t: 0.0 for t in THREADS}
    best_cpu: dict[int, float] = {t: 0.0 for t in THREADS}
    # interleave levels each rep so every level samples the same
    # steal-noise windows
    for rep in range(REPS):
        for t in THREADS:
            wall = _run(_stream_worker, stream_arrays[:t])
            gbps = t * STREAM_MB / 1024 / wall
            best_bw[t] = max(best_bw[t], gbps)
            wall = _run(_cpu_worker, cpu_arrays[:t])
            ips = t * CPU_ITERS / wall
            best_cpu[t] = max(best_cpu[t], ips)
            print(
                f"rep {rep} T={t}: stream {gbps:.1f} GB/s, "
                f"cpu {ips:,.0f} red/s",
                flush=True,
            )

    report = {
        "method": "numpy threaded reductions, interleaved best-of-"
                  f"{REPS}; stream={STREAM_MB} MiB/thread, "
                  f"cpu={CPU_KB} KiB L1-resident control",
        "stream_gb_per_s": {t: round(best_bw[t], 2) for t in THREADS},
        "cpu_reductions_per_s": {t: round(best_cpu[t]) for t in THREADS},
    }
    for lo, hi in ((4, 16), (8, 32), (2, 8)):
        if lo in best_bw and hi in best_bw and best_bw[lo] > 0:
            report[f"stream_ceiling_eff_{lo}to{hi}"] = round(
                best_bw[hi] / best_bw[lo] / (hi / lo), 3
            )
        if lo in best_cpu and hi in best_cpu and best_cpu[lo] > 0:
            report[f"cpu_ceiling_eff_{lo}to{hi}"] = round(
                best_cpu[hi] / best_cpu[lo] / (hi / lo), 3
            )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
