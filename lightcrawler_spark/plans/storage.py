"""Round-checkpointed table store (SURVEY.md §2.5 P4–P6, §3.4).

Stands in for the Iceberg catalog of the production design (BASELINE.json
north_rule): each crawl round appends a ``round=N`` partition per table
and then commits a round watermark — the moral equivalent of an Iceberg
snapshot. Resume reads the last COMPLETE round and discards in-flight
partitions, reproducing the reference's crash-recovery purge
(``UPDATE urls SET in_process=0`` —
/root/reference/vendor/PHPCrawl_083/libs/UrlCache/PHPCrawlerSQLiteURLCache.class.php:219-223).

Why not in-place updates: the reference mutates frontier rows
(in_process/processed flags) under locks; at 10^10 rows that's the
scalability wall. Append-only round lineage keeps every write a blind
parquet append, makes resume a metadata read, and gives per-partition
lineage (each row carries the round that produced it) for free.

An in-memory mode backs unit tests: same API, DataFrames held with
``localCheckpoint`` so iterative plans don't accrete lineage.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["RoundStore", "MemoryRoundStore"]


class RoundStore:
    """Parquet-backed, watermark-committed round store.

    Long crawls write one ``round=N`` dir per table per round — at 10^4
    rounds a read_upto would union 10^4 small-file partitions. With
    ``compact_every`` set, every Nth commit rewrites all committed round
    partitions into ONE ``seg=K`` dir (the per-row ``round`` lineage
    column is preserved as data), so a read is one segment + the recent
    tail. Compaction is crash-safe by ordering: the segment is written
    to a ``.tmp`` dir, renamed into place, and only then are the
    absorbed dirs deleted — readers ignore ``.tmp`` dirs, read only the
    NEWEST segment, and ignore round dirs an existing segment already
    covers, so every intermediate crash state reads consistently.
    """

    materializes = True  # write() persists; the engine skips checkpoints

    def __init__(self, spark: SparkSession, root: str,
                 compact_every: int | None = None,
                 compact_files: int | None = None):
        self.spark = spark
        self.root = root
        self.compact_every = compact_every
        # segment width knob. Compaction coalesces (no shuffle), so the
        # width also caps the SCAN parallelism of the rewrite — the
        # leg-10b event-log decomposition showed the rewrite at
        # eff_par ≈ 4 on 32 cores with 8-file segments. But the A/B
        # (BENCH.md leg 13, identical trace hashes) measured width=32 as
        # a net ~4% LOSS at the 1e5-URLs/round shape: the rewrite is
        # only ~5% of wall (Amdahl caps the win at ~4%), while the
        # frontier segment is re-read EVERY round, and 31-file segments
        # tax all 40 rounds' scans more than the 3 rewrites save. So the
        # default stays 8; raise only when segments are huge relative to
        # round cadence (compact_every >> 10) or rounds are few.
        self.compact_files = compact_files
        os.makedirs(root, exist_ok=True)

    # -- watermark ---------------------------------------------------------
    def _wm_path(self) -> str:
        return os.path.join(self.root, "_watermark.json")

    def last_complete_round(self) -> int:
        try:
            with open(self._wm_path()) as f:
                return json.load(f)["round"]
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return -1

    def commit_round(self, round_no: int) -> None:
        tmp = self._wm_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"round": round_no}, f)
        os.replace(tmp, self._wm_path())  # atomic commit
        if (
            self.compact_every
            and round_no > 0
            and round_no % self.compact_every == 0
        ):
            self.compact(round_no)

    # -- table io ----------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    @staticmethod
    def _dirs(base: str, prefix: str) -> list[tuple[int, str]]:
        out = []
        for d in os.listdir(base):
            if d.startswith(prefix) and not d.endswith(".tmp"):
                out.append((int(d.split("=", 1)[1]), os.path.join(base, d)))
        return sorted(out)

    def write(self, table: str, round_no: int, df: DataFrame) -> None:
        path = os.path.join(self._table_dir(table), f"round={round_no}")
        df.write.mode("overwrite").parquet(path)

    def read_upto(self, table: str, last_round: int) -> DataFrame | None:
        """Union of the newest segment ≤ last_round plus the committed
        round partitions it doesn't cover (in-flight rounds beyond the
        watermark are invisible — the purge)."""
        base = self._table_dir(table)
        if not os.path.isdir(base):
            return None
        segs = [s for s in self._dirs(base, "seg=") if s[0] <= last_round]
        seg_df = None
        covered = -1
        if segs:
            covered, seg_path = segs[-1]
            seg_df = self.spark.read.parquet(seg_path)
        paths = [
            p for r, p in self._dirs(base, "round=")
            if covered < r <= last_round
        ]
        tail_df = (
            self.spark.read.option("basePath", base).parquet(*paths)
            if paths else None
        )
        if seg_df is None:
            return tail_df
        if tail_df is None:
            return seg_df
        return seg_df.unionByName(tail_df)

    def compact(self, upto: int) -> None:
        """Rewrite every committed partition ≤ `upto` (rounds + any older
        segment) into one ``seg=<upto>`` dir per table. Bounded file
        count for 10^4-round crawls; resume semantics unchanged (the
        per-row round column survives as data)."""
        for table in os.listdir(self.root):
            base = self._table_dir(table)
            if not os.path.isdir(base):
                continue
            absorb_rounds = [
                (r, p) for r, p in self._dirs(base, "round=") if r <= upto
            ]
            absorb_segs = [
                (k, p) for k, p in self._dirs(base, "seg=") if k < upto
            ]
            if not absorb_rounds and not absorb_segs:
                continue
            df = self.read_upto(table, upto)
            if df is None:
                continue
            final = os.path.join(base, f"seg={upto}")
            tmp = final + ".compact.tmp"
            df.coalesce(self.compact_files or 8).write.mode(
                "overwrite").parquet(tmp)
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
            # only after the segment is live: drop what it absorbed
            for _, p in absorb_rounds + absorb_segs:
                shutil.rmtree(p)

    def purge_inflight(self, last_round: int) -> None:
        """Delete partitions past the watermark (P6 restart semantics),
        plus any half-written compaction leftovers."""
        for table in os.listdir(self.root):
            base = self._table_dir(table)
            if not os.path.isdir(base):
                continue
            for d in os.listdir(base):
                path = os.path.join(base, d)
                if d.endswith(".tmp") and os.path.isdir(path):
                    shutil.rmtree(path)
                elif (
                    d.startswith(("round=", "seg="))
                    and int(d.split("=", 1)[1].split(".")[0]) > last_round
                ):
                    shutil.rmtree(path)


class MemoryRoundStore:
    """Same API, no disk. The iterative driver loop reads the cumulative
    state every round, so reads maintain an incrementally-extended,
    locally-checkpointed cumulative DataFrame per table — each round's
    read is a union of TWO bounded plans (cached cum + new part), not an
    O(rounds) union rebuild."""

    COMPACT_EVERY = 8  # union-branch depth before re-materializing the cum

    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self._tables: dict[str, dict[int, DataFrame]] = {}
        self._cum: dict[str, tuple[int, DataFrame, int]] = {}  # (round, df, depth)
        self._wm = -1

    def last_complete_round(self) -> int:
        return self._wm

    def commit_round(self, round_no: int) -> None:
        self._wm = round_no

    def write(self, table: str, round_no: int, df: DataFrame) -> None:
        # Stored as-is. CONTRACT: the engine SEVERS the statistics of
        # every frontier-feeding frame it writes here (CrawlEngine.
        # _to_local — eager localCheckpoint + internalCreateDataFrame
        # rewrap, so the stored LogicalRDD carries the CONSTANT
        # defaultSizeInBytes instead of the round pipeline's
        # join-multiplied sizeInBytes; no driver collect). A bare
        # localCheckpoint is NOT enough: it truncates lineage but
        # inherits the source plan's stats, and with per-host rounds
        # (no LIMIT to reset them) the frontier⇄pages stats feedback
        # compounds geometrically until Catalyst's sizeInBytes BigInts
        # hit tens of millions of digits by round ~10 (measured:
        # 2s → 16s → 106s per-round planning, grinding in
        # BigInteger.multiply; tests/test_stats_flatten.py pins both
        # directions). The pages table may stay a flat select over the
        # fetch-results checkpoint ONLY while pages reach pending
        # exclusively through the left-anti seen join (left-child-only
        # stats): revisit rules and the caps/cooldown/backoff/budget
        # dims re-close the loop through pages, so the engine severs
        # pages frames too when such a feature is on
        # (CrawlEngine._pages_feedback — the r5 120-host live-soak
        # revisit A/B found the re-closure as a driver-heap OOM).
        self._tables.setdefault(table, {})[round_no] = df

    def _parts_upto(self, table: str, lo: int, hi: int) -> list[DataFrame]:
        return [
            df.withColumn("round", F.lit(r))
            for r, df in sorted(self._tables.get(table, {}).items())
            if lo <= r <= hi
        ]

    def read_upto(self, table: str, last_round: int) -> DataFrame | None:
        cached = self._cum.get(table)
        if cached is not None and cached[0] == last_round:
            return cached[1]
        if cached is not None and cached[0] < last_round:
            base, depth = cached[1], cached[2]
            parts = self._parts_upto(table, cached[0] + 1, last_round)
        else:
            base, depth = None, 0
            parts = self._parts_upto(table, 0, last_round)
        if base is None and not parts:
            return None
        out = base
        for p in parts:
            out = p if out is None else out.unionByName(p)
            depth += 1
        if depth >= self.COMPACT_EVERY:
            # keep the cumulative plan flat: without this, round r unions
            # r branches and the driver loop goes O(r²) in plan work
            out = out.localCheckpoint(eager=True)
            depth = 0
        self._cum[table] = (last_round, out, depth)
        return out

    def purge_inflight(self, last_round: int) -> None:
        for name, table in self._tables.items():
            for r in [r for r in table if r > last_round]:
                del table[r]
            cached = self._cum.get(name)
            if cached is not None and cached[0] > last_round:
                del self._cum[name]
