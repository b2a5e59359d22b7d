"""Round-4 curation additions: keep-best cluster representatives,
contrastive hard-negative mining, WebDataset shard manifests."""

import pyspark.sql.functions as F
import pytest

from lightcrawler_spark.operators.chunking import (
    assign_shards, shard_manifest,
)
from lightcrawler_spark.operators.similarity import hard_negatives
from lightcrawler_spark.operators.textdedup import (
    select_cluster_representatives,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, component long, n_chars long, q2 long")


class TestClusterRepresentatives:
    def test_quality_argmax_and_ties(self, spark):
        # cluster 0: clear n_chars winner; cluster 1: n_chars tie broken
        # by q2; cluster 2: full quality tie broken by LOWEST id
        df = _docs(spark, [
            (1, 0, 100, 5), (2, 0, 300, 1), (3, 0, 200, 9),
            (10, 1, 50, 2), (11, 1, 50, 7), (12, 1, 40, 9),
            (20, 2, 10, 3), (21, 2, 10, 3), (22, 2, 10, 3),
        ])
        out = select_cluster_representatives(
            df, cluster_col="component", id_col="doc_id",
            quality_cols=("n_chars", "q2"),
        ).orderBy("component").collect()
        assert [(r.component, r.doc_id, r.cluster_size) for r in out] == [
            (0, 2, 3), (1, 11, 3), (2, 20, 3),
        ]

    def test_mega_cluster_partitioning_invariance(self, spark):
        # one cluster holding every row (the spam shape): exactly one
        # winner, identical under 1-partition and 16-partition layouts
        rows = [(i, 0, (i * 37) % 50, (i * 11) % 7) for i in range(400)]
        df = _docs(spark, rows)
        outs = []
        for parts in (1, 16):
            out = select_cluster_representatives(
                df.repartition(parts), cluster_col="component",
                id_col="doc_id", quality_cols=("n_chars", "q2"),
            ).collect()
            assert len(out) == 1
            assert out[0].cluster_size == 400
            outs.append((out[0].doc_id, out[0].n_chars, out[0].q2))
        assert outs[0] == outs[1]
        # the winner is the true lexicographic argmax, lowest-id tie
        best = max((r[2], r[3], -r[0]) for r in rows)
        assert outs[0] == (-best[2], best[0], best[1])

    def test_single_quality_col_and_no_size(self, spark):
        df = _docs(spark, [(1, 0, 5, 0), (2, 0, 9, 0), (3, 1, 1, 0)])
        out = select_cluster_representatives(
            df.drop("q2"), cluster_col="component", id_col="doc_id",
            quality_cols=("n_chars",), keep_cluster_size=False,
        )
        assert "cluster_size" not in out.columns
        got = {(r.component, r.doc_id) for r in out.collect()}
        assert got == {(0, 2), (1, 3)}


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int")


class TestHardNegatives:
    def test_excludes_same_label_and_floors_sim(self, spark):
        # two tight direction-clusters; labels split WITHIN each, so the
        # hardest negatives are the near-identical other-label vectors
        vecs = []
        for j in range(8):
            vecs.append(([1.0, 0.01 * j, 0.0, 0.0], j % 2))
        for j in range(8):
            vecs.append(([0.0, 0.0, 1.0, 0.01 * j], 2 + j % 2))
        out = hard_negatives(
            _emb(spark, vecs), k=3, min_sim=0.5, n_bits=2).collect()
        assert out, "expected candidates inside shared SRP buckets"
        by_id = {i: lab for i, (_, lab) in enumerate(vecs)}
        for r in out:
            assert by_id[r.anchor_id] != by_id[r.neighbor_id]
            assert r.anchor_id != r.neighbor_id
            assert r.sim >= 0.5
            assert 1 <= r.rank <= 3

    def test_rank_is_deterministic_and_dense(self, spark):
        vecs = [([1.0, float(j) / 10, 0.5, 0.0], j % 3) for j in range(12)]
        a = hard_negatives(_emb(spark, vecs), k=2, min_sim=0.0).collect()
        b = hard_negatives(_emb(spark, vecs), k=2, min_sim=0.0).collect()
        key = lambda r: (r.anchor_id, r.rank)  # noqa: E731
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        for r in a:
            assert r.rank <= 2
        # per anchor, ranks are 1..n with no gaps
        from collections import defaultdict
        ranks = defaultdict(list)
        for r in a:
            ranks[r.anchor_id].append(r.rank)
        for v in ranks.values():
            assert sorted(v) == list(range(1, len(v) + 1))


class TestShardManifest:
    def _sharded(self, spark, n=200, shard_bytes=10_000):
        samples = spark.range(n).select(
            F.col("id").alias("image_id"),
            (F.col("id") % 7 * 53 + 211).cast("long").alias("n_bytes"),
        )
        return assign_shards(samples, shard_bytes=shard_bytes,
                             order_col="image_id", size_col="n_bytes")

    def test_manifest_counts_and_ranges(self, spark):
        sharded = self._sharded(spark)
        m = shard_manifest(sharded).collect()
        assert sum(r.n_samples for r in m) == 200
        total = sum(r.total_bytes for r in m)
        assert total == sum((i % 7) * 53 + 211 for i in range(200))
        # shards are contiguous key ranges in layout order
        by_idx = sorted(m, key=lambda r: r.shard_idx)
        for prev, nxt in zip(by_idx, by_idx[1:]):
            assert prev.last_key < nxt.first_key
        # a shard overflows by at most one sample
        for r in by_idx[:-1]:
            assert r.total_bytes < 10_000 + (6 * 53 + 211)

    def test_signature_partitioning_invariance(self, spark):
        sharded = self._sharded(spark)
        a = {r.shard_idx: r.content_md5
             for r in shard_manifest(sharded.repartition(1)).collect()}
        b = {r.shard_idx: r.content_md5
             for r in shard_manifest(sharded.repartition(16)).collect()}
        assert a == b and len(a) >= 3

    def test_signature_detects_content_change(self, spark):
        sharded = self._sharded(spark)
        base = {r.shard_idx: r.content_md5
                for r in shard_manifest(sharded).collect()}
        bumped = sharded.withColumn(
            "n_bytes",
            F.when(F.col("image_id") == 0,
                   F.col("n_bytes") + 1).otherwise(F.col("n_bytes")))
        changed = {r.shard_idx: r.content_md5
                   for r in shard_manifest(bumped).collect()}
        assert changed[0] != base[0]
        assert all(changed[k] == base[k] for k in base if k != 0)


class TestPagerankPriority:
    def _ranks(self, spark, rows):
        return spark.createDataFrame(rows, "node long, rank double")

    def test_doubling_tiers_and_unknown_default(self, spark):
        from lightcrawler_spark.operators.scheduler import (
            priority_from_pagerank,
        )
        # max=0.5: tiers at >=0.5 → 3, >=0.25 → 2, >=0.125 → 1, else 0
        ranks = self._ranks(spark, [
            (0, 0.5), (1, 0.25), (2, 0.125), (3, 0.0625), (4, 0.26),
        ])
        frontier = spark.range(7).select(F.col("id").alias("node"))
        out = {r.node: r.priority_level
               for r in priority_from_pagerank(frontier, ranks).collect()}
        assert out == {0: 3, 1: 2, 2: 1, 3: 0, 4: 2, 5: 0, 6: 0}

    def test_empty_ranks_all_level_zero(self, spark):
        from lightcrawler_spark.operators.scheduler import (
            priority_from_pagerank,
        )
        ranks = self._ranks(spark, [])
        frontier = spark.range(4).select(F.col("id").alias("node"))
        out = priority_from_pagerank(frontier, ranks).collect()
        assert {r.priority_level for r in out} == {0}

    def test_feeds_pop_order(self, spark):
        from lightcrawler_spark.operators.scheduler import (
            pop_global, priority_from_pagerank,
        )
        ranks = self._ranks(spark, [(i, 1.0 / (1 << i)) for i in range(6)])
        frontier = spark.range(6).select(
            F.col("id").alias("node"),
            F.col("id").alias("insert_seq"),
        )
        pri = priority_from_pagerank(frontier, ranks)
        popped = pop_global(pri, budget=3).orderBy("pop_rank").collect()
        # highest-rank nodes pop first, insert order breaks ties
        assert [r.node for r in popped] == [0, 1, 2]


class TestNullEdges:
    def test_representatives_null_quality_semantics(self, spark):
        # documented semantics: NULL quality sorts below any value (a
        # null-quality row never beats a scored one) and struct equality
        # is null-safe, so an all-null cluster falls back to its
        # lowest-id member instead of vanishing
        df = spark.createDataFrame(
            [(1, 0, 10, 1), (2, 0, None, 1), (11, 1, None, 1),
             (10, 1, None, 1)],
            "doc_id long, component long, n_chars long, q2 long")
        out = select_cluster_representatives(
            df, cluster_col="component", id_col="doc_id",
            quality_cols=("n_chars", "q2"),
        ).collect()
        assert {(r.component, r.doc_id) for r in out} == {(0, 1), (1, 10)}

    def test_hard_negatives_null_labels_never_pair(self, spark):
        rows = [(0, [1.0, 0.0], 1), (1, [1.0, 0.01], None),
                (2, [1.0, 0.02], 2), (3, [1.0, 0.03], None)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        out = hard_negatives(df, k=5, min_sim=0.0, n_bits=1).collect()
        ids = {r.anchor_id for r in out} | {r.neighbor_id for r in out}
        assert 1 not in ids and 3 not in ids
        assert {r.anchor_id for r in out} <= {0, 2}


class TestQuantileGate:
    def test_radix_select_matches_sorted_reference(self, spark):
        from lightcrawler_spark.operators.sampling import (
            exact_score_quantile,
        )
        # scores span several 16-bit radix buckets and carry heavy ties
        vals = [(i * 37) % 5 * 70_000 + (i * 13) % 11 for i in range(500)]
        df = spark.createDataFrame([(v,) for v in vals], "score long")
        ordered = sorted(vals, reverse=True)
        for n_keep in (1, 7, 150, 499, 500):
            thr, n = exact_score_quantile(df, "score", n_keep)
            assert n == 500
            assert thr == ordered[n_keep - 1]

    def test_gate_tie_inclusive_and_partition_invariant(self, spark):
        from lightcrawler_spark.operators.sampling import quantile_gate
        import math
        vals = [(i, (i * 7) % 50) for i in range(400)]
        df = spark.createDataFrame(vals, "doc_id long, score long")
        outs = []
        for parts in (1, 16):
            out = quantile_gate(df.repartition(parts), "score",
                                keep_top_frac=0.25).collect()
            kept = sorted(r.doc_id for r in out)
            thr = out[0].score_threshold
            # at least ceil(frac*n) survive; every tie at the cut kept
            assert len(kept) >= math.ceil(0.25 * 400)
            assert all(s >= thr for _, s in vals
                       if _ in set(kept)), "kept row below threshold"
            assert {d for d, s in vals if s >= thr} == set(kept)
            outs.append((thr, kept))
        assert outs[0] == outs[1]

    def test_null_scores_are_unscored(self, spark):
        from lightcrawler_spark.operators.sampling import quantile_gate
        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 30), (4, None), (5, 20)],
            "doc_id long, score long")
        out = quantile_gate(df, "score", keep_top_frac=0.5).collect()
        # n counts only the 3 scored rows; ceil(0.5*3)=2 -> thr=20
        assert sorted(r.doc_id for r in out) == [3, 5]
        assert all(r.score_threshold == 20 for r in out)

    def test_wide_domain_raises(self, spark):
        from lightcrawler_spark.operators.sampling import (
            exact_score_quantile,
        )
        df = spark.range(5).select((F.col("id") * (1 << 40)).alias("s"))
        with pytest.raises(ValueError, match="too wide"):
            exact_score_quantile(df, "s", 2)
