"""Decompose engine wall time into in-job vs driver-gap time from a
Spark event log (``tools/engine_soak.py run --event-log DIR``).

The two-parallelism soak (BENCH.md leg 8) shows the round loop scaling
below the host ceiling; a two-point Amdahl fit says "serial share", but
that fit is circular. This tool measures the serial share directly:
union the [JobStart, JobEnd] intervals from the event log — wall time
NOT covered by any job is driver-side serial cost (planning, py4j,
commit bookkeeping) by definition, and single-task stages inside jobs
are the in-job serial tail.

Usage: python tools/joblog_gaps.py <event-log-file-or-dir> [top_n]
Prints one JSON line: total wall (first→last event), in-job time,
gap time, gap share, top-N longest gaps, and single-task-stage time.
"""

from __future__ import annotations

import json
import os
import sys


def _event_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return [path]
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            # Spark 4 rolling v2 layout: events_*.zstd + appstatus marker
            if f.startswith("events_") or f.startswith("local-"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _open_lines(f: str):
    if f.endswith(".zstd"):
        import pyarrow as pa

        stream = pa.CompressedInputStream(pa.OSFile(f, "rb"), "zstd")
        data = stream.read()
        for line in data.decode("utf-8", errors="replace").splitlines():
            yield line
    else:
        with open(f, encoding="utf-8") as fh:
            yield from fh


def _iter_events(path: str):
    for f in _event_files(path):
        for line in _open_lines(f):
            line = line.strip()
            if line:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue


def analyze(path: str, top_n: int = 8) -> dict:
    jobs: dict[int, list[int]] = {}
    stages: list[dict] = []
    task_ms_by_stage: dict[int, int] = {}
    n_tasks_by_stage: dict[int, int] = {}
    t_min = None
    t_max = None
    for ev in _iter_events(path):
        kind = ev.get("Event")
        ts = ev.get("Timestamp") or ev.get("Submission Time")
        if isinstance(ts, int):
            t_min = ts if t_min is None else min(t_min, ts)
            t_max = ts if t_max is None else max(t_max, ts)
        if kind == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = [ev["Submission Time"], None]
        elif kind == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]][1] = ev["Completion Time"]
                t_max = max(t_max or 0, ev["Completion Time"])
        elif kind == "SparkListenerTaskEnd":
            ti = ev.get("Task Info") or {}
            sid = ev.get("Stage ID")
            dur = (ti.get("Finish Time") or 0) - (ti.get("Launch Time") or 0)
            if dur > 0 and sid is not None:
                task_ms_by_stage[sid] = task_ms_by_stage.get(sid, 0) + dur
                n_tasks_by_stage[sid] = n_tasks_by_stage.get(sid, 0) + 1
        elif kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub and comp:
                stages.append({
                    "id": si.get("Stage ID"),
                    "tasks": si.get("Number of Tasks", 0),
                    "ms": comp - sub,
                })

    intervals = sorted(
        [(s, e) for s, e in jobs.values() if e is not None]
    )
    merged: list[list[int]] = []
    for s, e in intervals:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    in_job = sum(e - s for s, e in merged)
    gaps = []
    for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
        if s2 > e1:
            gaps.append({"after_ms": e1 - (t_min or 0), "gap_ms": s2 - e1})
    gap_total = sum(g["gap_ms"] for g in gaps)
    wall = (t_max - t_min) if (t_min is not None and t_max is not None) else 0
    single_task_ms = sum(s["ms"] for s in stages if s["tasks"] <= 1)
    # per-stage effective parallelism: sum(task time)/stage wall
    for s in stages:
        tm = task_ms_by_stage.get(s["id"], 0)
        s["task_ms"] = tm
        s["eff_par"] = round(tm / s["ms"], 2) if s["ms"] > 0 else None
    top_stages = sorted(stages, key=lambda s: -s["ms"])[:top_n]
    total_task_ms = sum(task_ms_by_stage.values())
    return {
        "wall_ms": wall,
        "in_job_ms": in_job,
        "gap_ms_between_jobs": gap_total,
        "pre_post_ms": max(0, wall - in_job - gap_total),
        "gap_share_of_wall": round(gap_total / wall, 4) if wall else None,
        "n_jobs": len(intervals),
        "n_gaps_over_100ms": sum(1 for g in gaps if g["gap_ms"] > 100),
        "top_gaps_ms": sorted(
            (g["gap_ms"] for g in gaps), reverse=True
        )[:top_n],
        "single_task_stage_ms": single_task_ms,
        "n_stages": len(stages),
        "total_task_ms": total_task_ms,
        "top_stages": [
            {k: s[k] for k in ("id", "tasks", "ms", "task_ms", "eff_par")}
            for s in top_stages
        ],
    }


if __name__ == "__main__":
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(json.dumps(analyze(path, top_n)))
