"""Text-analysis + dedup-family operators over documents/embeddings
(training-data pipeline ops; TESTDATA.md tables at sf0.001)."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


class TestTextStats:
    def test_token_counts(self, spark, docs):
        from lightcrawler_spark.operators.text import with_token_counts

        rows = with_token_counts(docs).select(
            "doc_id", "text", "ws_tokens", "alnum_tokens", "n_chars_calc"
        ).limit(50).collect()
        for r in rows:
            assert r["ws_tokens"] == len(r["text"].split()) or r["text"].strip() == ""
            assert r["n_chars_calc"] == len(r["text"])

    def test_lang_id_agrees_with_python(self, spark, docs):
        from lightcrawler_spark.operators.text import (
            EN_MARKERS, ES_MARKERS, ZH_MARKERS, with_lang_id,
        )

        rows = with_lang_id(docs).select("text", "lang_pred").limit(100).collect()

        def pyscore(t, ms):
            return sum(t.count(m) for m in ms)

        for r in rows:
            zh, en, es = (pyscore(r["text"], m) for m in (ZH_MARKERS, EN_MARKERS, ES_MARKERS))
            if zh >= en and zh >= es and zh > 0:
                want = "zh"
            elif en >= es and en > 0:
                want = "en"
            elif es > 0:
                want = "es"
            else:
                want = "und"
            assert r["lang_pred"] == want

    def test_quality_score_range(self, spark, docs):
        from lightcrawler_spark.operators.text import with_quality_score

        rows = with_quality_score(docs).select("quality_score").collect()
        assert all(0.0 <= r["quality_score"] <= 100.0 for r in rows)

    def test_fingerprint_stability_and_dedup_signal(self, spark, docs):
        from lightcrawler_spark.operators.text import with_fingerprint

        fp = with_fingerprint(docs).select("doc_id", "fingerprint")
        a = {r["doc_id"]: r["fingerprint"] for r in fp.collect()}
        b = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(docs).collect()}
        assert a == b  # deterministic
        # identical texts share fingerprints
        dup = spark.createDataFrame(
            [(1, "the same text body here"), (2, "the same text body here"),
             (3, "a completely different document")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(dup).collect()}
        assert out[1] == out[2] != out[3]


class TestDedupFamily:
    def _dup_docs(self, spark):
        base = "The quick brown fox jumps over the lazy dog near the river bank."
        rows = [
            (1, base, "s1"),
            (2, base, "s1"),                       # exact dup of 1
            (3, base.replace("quick", "quiet"), "s1"),  # near dup of 1
            (4, "Stock prices fell sharply on Tuesday amid inflation fears.", "s2"),
            (5, "Completely unrelated text about gardening and tulips in spring.", "s2"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_exact_dedup(self, spark):
        from lightcrawler_spark.operators.textdedup import exact_dedup

        out = exact_dedup(self._dup_docs(spark)).select("doc_id").collect()
        kept = sorted(r["doc_id"] for r in out)
        assert kept == [1, 3, 4, 5]  # doc 2 dropped, rep = lowest id

    def test_ngram_jaccard(self, spark):
        from lightcrawler_spark.operators.textdedup import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(self._dup_docs(spark), threshold=0.7).collect()
        got = {(p["id_a"], p["id_b"]) for p in pairs}
        assert (1, 2) in got          # exact dup: jaccard 1.0
        assert (1, 3) in got and (2, 3) in got  # near dup
        assert all({a, b} <= {1, 2, 3} for a, b in got)

    def test_ngram_jaccard_block_cols(self, spark):
        """Blocking by source: cross-block pairs never materialize, and
        within-block pairs are identical to the unblocked run."""
        from lightcrawler_spark.operators.textdedup import ngram_jaccard_pairs

        docs = self._dup_docs(spark)
        unblocked = {
            (p["id_a"], p["id_b"], p["jaccard"])
            for p in ngram_jaccard_pairs(docs, threshold=0.0).collect()
        }
        blocked = {
            (p["id_a"], p["id_b"], p["jaccard"])
            for p in ngram_jaccard_pairs(
                docs, threshold=0.0, block_cols=["source"]
            ).collect()
        }
        assert blocked <= unblocked
        src = {1: "s1", 2: "s1", 3: "s1", 4: "s2", 5: "s2"}
        assert blocked == {
            (a, b, j) for a, b, j in unblocked if src[a] == src[b]
        }
        assert (1, 2, 1.0) in blocked

    def test_minhash_lsh_finds_near_dups(self, spark):
        from lightcrawler_spark.operators.textdedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            self._dup_docs(spark), num_hashes=16, bands=8
        ).collect()
        got = {(p["id_a"], p["id_b"]) for p in pairs}
        assert (1, 2) in got
        assert (1, 3) in got
        assert (4, 5) not in got

    def test_simhash_pairs(self, spark):
        from lightcrawler_spark.operators.textdedup import simhash_pairs

        pairs = simhash_pairs(self._dup_docs(spark), max_hamming=7).collect()
        got = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs}
        assert got[(1, 2)] == 0
        assert (1, 3) in got
        assert (4, 5) not in got

    def test_exact_dedup_on_real_docs_idempotent(self, spark, docs):
        from lightcrawler_spark.operators.textdedup import exact_dedup

        once = exact_dedup(docs)
        assert once.count() == exact_dedup(once.drop("dup_key")).count()


class TestSimilarity:
    def test_brute_force_topk_shape(self, spark, emb):
        from lightcrawler_spark.operators.similarity import brute_force_topk

        q = emb.filter(F.col("vec_id") < 5)
        out = brute_force_topk(emb, q, k=3).collect()
        assert len(out) == 15
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        for rows in by_q.values():
            sims = [r["sim"] for r in sorted(rows, key=lambda r: r["rank"])]
            assert sims == sorted(sims, reverse=True)
            assert all(-1.0001 <= s <= 1.0001 for s in sims)

    def test_self_similarity_is_top(self, spark, emb):
        from lightcrawler_spark.operators.similarity import brute_force_topk

        # duplicate vector planted: its clone must rank 1 with sim ≈ 1
        base = emb.limit(1).collect()[0]
        clone = spark.createDataFrame(
            [(9999, base["embedding"], base["label"])],
            "vec_id long, embedding array<float>, label int",
        )
        corpus = emb.unionByName(clone)
        out = brute_force_topk(corpus, clone, k=1).collect()[0]
        assert out["neighbor_id"] == base["vec_id"]
        assert out["sim"] >= 0.999999

    def test_lsh_recall_floor(self, spark, emb):
        from lightcrawler_spark.operators.similarity import (
            brute_force_topk,
            lsh_topk,
        )

        q = emb.filter(F.col("vec_id") < 20)
        exact = brute_force_topk(emb, q, k=3).collect()
        approx = lsh_topk(emb, q, k=3, n_bits=2).collect()
        exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
        approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(exact_set & approx_set) / len(exact_set)
        assert recall >= 0.2  # 2-bit buckets keep ~1/4 of the corpus per query
        # every approx hit must carry the same sim the exact path computes
        exact_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
        for r in approx:
            key = (r["query_id"], r["neighbor_id"])
            if key in exact_sims:
                assert abs(r["sim"] - exact_sims[key]) < 1e-9


class TestAllPairsGuard:
    """Unblocked near-dup calls refuse silent O(n²) above the row
    threshold (r2 VERDICT §What's wrong #3)."""

    def _big_docs(self, spark, n=200):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text body "), F.col("id").cast("string")).alias("text"),
        )

    def _big_emb(self, spark, n=200):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.rand(seed=i) for i in range(4)]).alias("embedding"),
        )

    def test_ngram_unblocked_raises_above_threshold(self, spark):
        from lightcrawler_spark.operators.textdedup import ngram_jaccard_pairs

        df = self._big_docs(spark)
        with pytest.raises(ValueError, match="all-pairs"):
            # threshold lowered via monkeypatching the probe input size
            import lightcrawler_spark.operators.textdedup as td

            old = td.ALL_PAIRS_GUARD_ROWS
            td.ALL_PAIRS_GUARD_ROWS = 100
            try:
                # guard_all_pairs reads the module constant as default
                td.guard_all_pairs(df, "ngram_jaccard_pairs", max_rows=100)
            finally:
                td.ALL_PAIRS_GUARD_ROWS = old

    def test_ngram_blocked_and_allowed_paths_pass(self, spark):
        from lightcrawler_spark.operators.textdedup import guard_all_pairs

        df = self._big_docs(spark)
        # explicit opt-in never probes nor raises
        guard_all_pairs(df, "x", max_rows=10, allow=True)
        # under the threshold: fine
        guard_all_pairs(df.limit(5), "x", max_rows=10)

    def test_cosine_unblocked_raises_above_threshold(self, spark, monkeypatch):
        import lightcrawler_spark.operators.textdedup as td
        from lightcrawler_spark.operators.similarity import cosine_near_dup_pairs

        monkeypatch.setattr(td, "ALL_PAIRS_GUARD_ROWS", 100)
        emb = self._big_emb(spark)
        with pytest.raises(ValueError, match="block_bits"):
            cosine_near_dup_pairs(emb)

    def test_cosine_allow_flag_bypasses(self, spark, monkeypatch):
        import lightcrawler_spark.operators.textdedup as td
        from lightcrawler_spark.operators.similarity import cosine_near_dup_pairs

        monkeypatch.setattr(td, "ALL_PAIRS_GUARD_ROWS", 100)
        emb = self._big_emb(spark, n=150)
        out = cosine_near_dup_pairs(emb, threshold=2.0, allow_all_pairs=True)
        assert out.count() == 0  # plan runs; nothing passes threshold 2.0


class TestIvfTopk:
    def test_ivf_recall_and_exact_sims(self, spark, emb):
        from lightcrawler_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        q = emb.filter(F.col("vec_id") < 20)
        exact = brute_force_topk(emb, q, k=3).collect()
        approx = ivf_topk(emb, q, k=3, n_centroids=4, n_probe=2).collect()
        exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
        approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(exact_set & approx_set) / len(exact_set)
        # probing half the lists keeps most true neighbors
        assert recall >= 0.4
        # every IVF hit carries the exact path's sim (same cosine kernel)
        exact_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
        for r in approx:
            key = (r["query_id"], r["neighbor_id"])
            if key in exact_sims:
                assert abs(r["sim"] - exact_sims[key]) < 1e-9

    def test_ivf_probe_all_lists_equals_exact(self, spark, emb):
        """n_probe == n_centroids degenerates to exact search: every
        list is probed, so the candidate set is the whole corpus."""
        from lightcrawler_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        q = emb.filter(F.col("vec_id") < 5)
        exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
                 for r in brute_force_topk(emb, q, k=2).collect()}
        full = {(r["query_id"], r["rank"]): r["neighbor_id"]
                for r in ivf_topk(emb, q, k=2, n_centroids=4, n_probe=4).collect()}
        assert full == exact


class TestPiiScrub:
    def test_scrub_order_and_counts(self, spark):
        from lightcrawler_spark.operators.text import with_pii_scrub

        rows = [
            (1, "mail a@b.com and http://x.test/u?e=c@d.org now"),
            (2, "call +1 (555) 010-1234 or 02212345678"),
            (3, "clean text with number 42"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = {r["doc_id"]: r for r in with_pii_scrub(df).collect()}
        # the email inside the URL is swallowed by the URL pass
        assert out[1]["n_url"] == 1 and out[1]["n_email"] == 1
        assert out[1]["text_scrubbed"] == "mail <EMAIL> and <URL> now"
        assert out[2]["n_phone"] == 2
        assert out[2]["text_scrubbed"] == "call <PHONE> or <PHONE>"
        assert out[3]["n_url"] == out[3]["n_email"] == out[3]["n_phone"] == 0
        assert out[3]["text_scrubbed"] == rows[2][1]
