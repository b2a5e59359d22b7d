"""Chunking + sequence packing: window math, clamping, and
partitioning-invariance of the distributed prefix sum."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.operators.chunking import chunk_documents, pack_sequences


class TestChunkDocuments:
    def test_basic_windows(self, spark):
        text = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = {
            r["chunk_idx"]: r
            for r in chunk_documents(df, max_tokens=4, overlap=1).collect()
        }
        # stride 3: starts 0,3,6 -> ceil((10-1)/3)=3 chunks
        assert sorted(out) == [0, 1, 2]
        assert out[0]["chunk_text"] == "w0 w1 w2 w3"
        assert out[1]["chunk_text"] == "w3 w4 w5 w6"
        assert out[2]["chunk_text"] == "w6 w7 w8 w9"
        assert out[2]["n_chunk_tokens"] == 4

    def test_last_chunk_clamped(self, spark):
        text = " ".join(f"w{i}" for i in range(11))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = sorted(
            chunk_documents(df, max_tokens=4, overlap=1).collect(),
            key=lambda r: r["chunk_idx"],
        )
        # starts 0,3,6,9 -> last has 2 tokens
        assert len(out) == 4
        assert out[-1]["chunk_text"] == "w9 w10"
        assert out[-1]["n_chunk_tokens"] == 2

    def test_short_and_empty_docs_one_chunk(self, spark):
        df = spark.createDataFrame(
            [(1, "only two"), (2, ""), (3, "   ")], "doc_id long, text string"
        )
        out = chunk_documents(df, max_tokens=8, overlap=2).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert len(out) == 3
        assert by_id[1]["chunk_text"] == "only two"
        assert by_id[2]["n_chunk_tokens"] == 0 and by_id[2]["chunk_text"] == ""
        assert by_id[3]["n_chunk_tokens"] == 0

    def test_multiline_whitespace_tokens(self, spark):
        df = spark.createDataFrame(
            [(1, "a\tb\n\nc  d\re")], "doc_id long, text string"
        )
        out = chunk_documents(df, max_tokens=10, overlap=0).collect()
        assert out[0]["chunk_text"] == "a b c d e"

    def test_overlap_must_be_smaller(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, max_tokens=4, overlap=4)


class TestPackSequences:
    def _expected(self, sizes, ctx):
        cum = np.cumsum(sizes)
        start = cum - sizes
        return {
            i: (
                int(start[i]),
                int(start[i] // ctx),
                int(start[i] % ctx),
                bool(sizes[i] > 0 and (cum[i] - 1) // ctx > start[i] // ctx),
            )
            for i in range(len(sizes))
        }

    @pytest.mark.parametrize("parts", [1, 3, 7])
    def test_matches_serial_cumsum(self, spark, parts):
        rng = np.random.default_rng(5)
        sizes = rng.integers(0, 40, size=200)
        df = spark.createDataFrame(
            [(int(i), int(s)) for i, s in enumerate(sizes)],
            "doc_id long, n_tokens long",
        ).repartition(5)  # scramble physical layout first
        out = pack_sequences(df, ctx_len=64, num_partitions=parts).collect()
        exp = self._expected(sizes, 64)
        assert len(out) == 200
        for r in out:
            assert (
                r["start_offset"], r["seq_idx"], r["offset_in_seq"],
                r["spans_boundary"],
            ) == exp[r["doc_id"]]

    def test_no_single_partition_window(self, spark):
        df = spark.createDataFrame(
            [(i, 10) for i in range(50)], "doc_id long, n_tokens long"
        )
        plan = pack_sequences(df, ctx_len=32)._jdf.queryExecution().executedPlan().toString()
        import re

        for m in re.finditer(r"Window \[", plan):
            window_line = plan[m.start(): plan.index("\n", m.start())]
            assert "partitionBy" not in window_line or True
        # the authoritative check: no unpartitioned-window warning shape,
        # i.e. every Window node lists a partition spec
        assert "Window" in plan
        for line in plan.splitlines():
            if "Window [" in line:
                assert "_pid" in line, line

    def test_doc_exactly_filling_sequence(self, spark):
        df = spark.createDataFrame(
            [(0, 64), (1, 64), (2, 1)], "doc_id long, n_tokens long"
        )
        out = {r["doc_id"]: r for r in pack_sequences(df, ctx_len=64).collect()}
        assert out[0]["seq_idx"] == 0 and not out[0]["spans_boundary"]
        assert out[1]["seq_idx"] == 1 and not out[1]["spans_boundary"]
        assert out[2]["seq_idx"] == 2 and out[2]["offset_in_seq"] == 0


class TestAssignShards:
    def test_whole_sample_bins(self, spark):
        from lightcrawler_spark.operators.chunking import assign_shards

        # sizes 600,600,600 with shard 1000: sample 1 starts at 600
        # (shard 0, overflows), sample 2 starts at 1200 (shard 1)
        df = spark.createDataFrame(
            [(0, 600), (1, 600), (2, 600)], "image_id long, n_bytes long"
        )
        out = {r["image_id"]: r for r in assign_shards(df, 1000).collect()}
        assert (out[0]["shard_idx"], out[0]["byte_offset"]) == (0, 0)
        assert out[0]["overflows_shard"] is False
        assert (out[1]["shard_idx"], out[1]["overflows_shard"]) == (0, True)
        assert (out[2]["shard_idx"], out[2]["offset_in_shard"]) == (1, 200)

    def test_original_columns_preserved(self, spark):
        from lightcrawler_spark.operators.chunking import assign_shards

        df = spark.createDataFrame(
            [(i, 100, f"cap{i}") for i in range(10)],
            "image_id long, n_bytes long, caption string",
        )
        out = assign_shards(df, 250, num_partitions=3).collect()
        assert {r["caption"] for r in out} == {f"cap{i}" for i in range(10)}
        assert {r["shard_idx"] for r in out} == {0, 1, 2, 3}


class TestAspectBuckets:
    @staticmethod
    def _imgs(spark, n=200):
        return spark.range(n).select(
            F.format_string("img_%012d", F.col("id")).alias("image_id"),
            (F.lit(24) + (F.col("id") % 5) * 8).cast("int").alias("w"),
            (F.lit(24) + (F.col("id") % 7) * 4).cast("int").alias("h"),
        )

    @staticmethod
    def _brute(n, buckets, batch_size):
        """Serial re-derivation: integer argmin bucket, id-order rank,
        ceil-div batch bases stacked in bucket_id order."""
        rows = []
        for i in range(n):
            w, h = 24 + (i % 5) * 8, 24 + (i % 7) * 4
            bid = min(
                range(len(buckets)),
                key=lambda j: (abs(w * buckets[j][1] - h * buckets[j][0]), j),
            )
            rows.append((f"img_{i:012d}", w, h, bid))
        per = {}
        for iid, w, h, bid in sorted(rows):
            per.setdefault(bid, []).append(iid)
        base, acc = {}, 0
        for bid in sorted(per):
            base[bid] = acc
            acc += -(-len(per[bid]) // batch_size)
        out = {}
        for bid, ids in per.items():
            for rank, iid in enumerate(ids):
                out[iid] = dict(
                    bucket_id=bid,
                    rank_in_bucket=rank,
                    batch_idx=base[bid] + rank // batch_size,
                    batch_is_ragged=(
                        len(ids) - (rank // batch_size) * batch_size
                        < batch_size
                    ),
                )
        return out

    def test_matches_serial_derivation(self, spark):
        from lightcrawler_spark.operators.chunking import (
            assign_aspect_buckets,
            generate_aspect_buckets,
        )

        buckets = generate_aspect_buckets()
        got = {
            r["image_id"]: r
            for r in assign_aspect_buckets(
                self._imgs(spark), batch_size=4, num_partitions=8
            ).collect()
        }
        want = self._brute(200, buckets, 4)
        assert len(got) == 200
        for iid, exp in want.items():
            g = got[iid]
            for k, v in exp.items():
                assert g[k] == v, (iid, k, g[k], v)
            # bucket dims come from the chosen bucket row
            assert (g["bucket_w"], g["bucket_h"]) == buckets[g["bucket_id"]]

    @pytest.mark.parametrize("parts", [2, 8, 16])
    def test_partitioning_invariant(self, spark, parts):
        from lightcrawler_spark.operators.chunking import (
            assign_aspect_buckets,
        )

        out = assign_aspect_buckets(
            self._imgs(spark), batch_size=4, num_partitions=parts
        )
        rows = sorted(
            (r["image_id"], r["bucket_id"], r["rank_in_bucket"],
             r["batch_idx"], r["batch_is_ragged"])
            for r in out.collect()
        )
        ref = sorted(
            (r["image_id"], r["bucket_id"], r["rank_in_bucket"],
             r["batch_idx"], r["batch_is_ragged"])
            for r in assign_aspect_buckets(
                self._imgs(spark), batch_size=4, num_partitions=4
            ).collect()
        )
        assert rows == ref

    def test_mega_bucket_spans_partitions(self, spark):
        """A single dominant aspect must NOT collapse to one task: with
        every image square, all rows share one bucket, and the grouped
        prefix sum must still spread them over the range partitions."""
        from lightcrawler_spark.operators.chunking import (
            assign_aspect_buckets,
        )

        imgs = spark.range(500).select(
            F.format_string("img_%012d", F.col("id")).alias("image_id"),
            F.lit(32).alias("w"),
            F.lit(32).alias("h"),
        )
        out = assign_aspect_buckets(imgs, batch_size=10, num_partitions=8)
        assert out.select("bucket_id").distinct().count() == 1
        ranks = [r["rank_in_bucket"] for r in out.collect()]
        assert sorted(ranks) == list(range(500))
        # batches dense 0..49, exactly 10 rows each, none ragged
        batches = out.groupBy("batch_idx").count().collect()
        assert sorted(r["batch_idx"] for r in batches) == list(range(50))
        assert {r["count"] for r in batches} == {10}
        assert out.filter(F.col("batch_is_ragged")).count() == 0


def test_epoch_shard_order_properties(spark):
    """Two-level epoch shuffle: permutation per shard, epoch-dependent
    order, resume-reproducible."""
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.chunking import epoch_shard_order

    t = spark.range(200).select(
        F.col("id").alias("image_id"),
        F.floor(F.col("id") / 40).cast("long").alias("shard_idx"),
    )
    e1 = epoch_shard_order(t, epoch=1)
    rows = e1.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_idx"], []).append(r["sample_order"])
    for s, orders in by_shard.items():
        assert sorted(orders) == list(range(40))  # permutation per shard
    shard_orders = {r["shard_idx"]: r["shard_order"] for r in rows}
    assert sorted(shard_orders.values()) == list(range(5))
    # different epoch -> different order; same epoch -> identical
    o1 = sorted((r["image_id"], r["sample_order"]) for r in rows)
    o2 = sorted((r["image_id"], r["sample_order"])
                for r in epoch_shard_order(t, epoch=2).collect())
    o1b = sorted((r["image_id"], r["sample_order"])
                 for r in epoch_shard_order(t, epoch=1).collect())
    assert o1 != o2
    assert o1 == o1b


def test_manifest_diff_statuses(spark):
    """manifest_diff: all four statuses, including 'removed' via the
    mirrored diff (swap old/new)."""
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.chunking import manifest_diff

    def man(rows):
        return spark.createDataFrame(
            rows, "shard_idx long, n_samples long, content_md5 string"
        )

    old = man([(0, 10, "aaa"), (1, 10, "bbb"), (2, 4, "ccc")])
    new = man([(0, 10, "aaa"), (1, 11, "BBB"), (3, 2, "ddd")])
    d = {r["shard_idx"]: r["status"]
         for r in manifest_diff(old, new).collect()}
    assert d == {0: "unchanged", 1: "changed", 2: "removed", 3: "added"}
    # mirrored diff flips added/removed
    m = {r["shard_idx"]: r["status"]
         for r in manifest_diff(new, old).collect()}
    assert (m[2], m[3]) == ("added", "removed")
