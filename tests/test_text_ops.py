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


class TestRepetitionStats:
    CASES = [
        "a\nb\na\n\nc b c b c b",
        "one line only",
        "",
        "x\nx\nx\nx",
        "alpha beta alpha beta alpha beta gamma",
        "L1\nl1\nL1\n  \nL2",
        "word",
        "a b\na b\nc d e f g h",
    ]

    @staticmethod
    def _py_stats(text):
        lines = [x for x in text.split("\n") if x.strip()]
        words = [w for w in __import__("re").split(r"[^a-z0-9]+", text.lower()) if w]
        from collections import Counter

        lc = Counter(lines)
        n_lines = len(lines)
        dup_line_frac = (n_lines - len(lc)) / n_lines if n_lines else 0.0
        tot = sum(len(x) for x in lines)
        dup_chars = sum(len(x) * c for x, c in lc.items() if c > 1)
        dup_line_char_frac = dup_chars / tot if tot else 0.0
        twc = sum(len(w) for w in words)
        out = {
            "n_lines": n_lines,
            "dup_line_frac": round(dup_line_frac, 6),
            "dup_line_char_frac": round(dup_line_char_frac, 6),
        }
        for n in (2, 3):
            grams = Counter(
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            )
            best = max(
                (c * (len(g) - (n - 1)) for g, c in grams.items()), default=0
            )
            out[f"top{n}gram_char_frac"] = round(best / twc, 6) if twc else 0.0
        return out

    def test_matches_python_oracle_on_cases(self, spark):
        from lightcrawler_spark.operators.text import with_repetition_stats

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.CASES)], "doc_id long, text string"
        )
        rows = {
            r["doc_id"]: r.asDict()
            for r in with_repetition_stats(df).collect()
        }
        for i, t in enumerate(self.CASES):
            want = self._py_stats(t)
            got = rows[i]
            for k, v in want.items():
                assert got[k] == pytest.approx(v, abs=1e-9), (i, k, t)

    def test_real_docs_no_nulls_and_bounded(self, spark, docs):
        from lightcrawler_spark.operators.text import with_repetition_stats

        out = with_repetition_stats(docs).select(
            "dup_line_frac", "dup_line_char_frac",
            "top2gram_char_frac", "top3gram_char_frac",
        )
        for r in out.collect():
            for k, v in r.asDict().items():
                assert v is not None
                assert 0.0 <= v <= 1.0, (k, v)


class TestDecontaminate:
    def test_flags_shared_ngrams_only(self, spark):
        from lightcrawler_spark.operators.textdedup import decontaminate

        train = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog tonight"),
                (2, "completely unrelated sentence about spark physical plans"),
                (3, "Quick Brown FOX jumps over the lazy dog again and again"),
            ],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame(
            [(100, "we ask whether the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["contaminated"], r["n_eval_ngram_hits"])
            for r in decontaminate(train, ev, n=5).collect()
        }
        assert got[1][0] and got[1][1] > 0
        assert got[2] == (False, 0)
        # case-insensitive tokenization: doc 3 shares the 5-gram too
        assert got[3][0]

    def test_short_docs_never_crash(self, spark):
        from lightcrawler_spark.operators.textdedup import decontaminate

        train = spark.createDataFrame(
            [(1, "tiny"), (2, ""), (3, None)], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(9, "also small")], "doc_id long, text string")
        rows = decontaminate(train, ev, n=8).collect()
        assert len(rows) == 3
        assert all(not r["contaminated"] for r in rows)


class TestStratifiedSample:
    def test_deterministic_and_python_parity(self, spark, docs):
        import hashlib

        from lightcrawler_spark.operators.sampling import stratified_sample

        rates = {"en": 0.5, "zh": 0.25, "es": 1.0}
        a = stratified_sample(docs, rates).select("doc_id").collect()
        b = stratified_sample(docs, rates).select("doc_id").collect()
        assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)

        def u(key):
            return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32

        all_rows = docs.select("doc_id", "lang").collect()
        want = sorted(
            r["doc_id"]
            for r in all_rows
            if u(r["doc_id"]) < rates.get(r["lang"], 0.0)
        )
        assert sorted(r["doc_id"] for r in a) == want

    def test_nested_rates_upsampling_keeps_prior_rows(self, spark, docs):
        from lightcrawler_spark.operators.sampling import stratified_sample

        small = {"en": 0.2, "zh": 0.2, "es": 0.2}
        big = {"en": 0.6, "zh": 0.6, "es": 0.6}
        s = {r["doc_id"] for r in stratified_sample(docs, small).select("doc_id").collect()}
        b = {r["doc_id"] for r in stratified_sample(docs, big).select("doc_id").collect()}
        assert s <= b

    def test_salt_draws_independent_sample(self, spark, docs):
        from lightcrawler_spark.operators.sampling import stratified_sample

        rates = {"en": 0.5, "zh": 0.5, "es": 0.5}
        a = {r["doc_id"] for r in stratified_sample(docs, rates).select("doc_id").collect()}
        b = {r["doc_id"] for r in stratified_sample(docs, rates, salt="v2").select("doc_id").collect()}
        assert a != b


def test_bpe_train_classic_and_edges(spark):
    """bpe_train: first merges on the Sennrich-style corpus verified
    against a hand-derived expectation; early stop; empty corpus."""
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.text import bpe_train

    df = spark.createDataFrame(
        [("low low low",), ("lower lower",), ("lowest",)], "text string"
    )
    merges = bpe_train(df, n_merges=4).collect()
    assert len(merges) == 4
    # 'lo' appears in every word (freq 6) and ties with 'ow' — tie
    # breaks (count DESC, left ASC): 'lo' first, then 'low' wins
    assert (merges[0]["left"], merges[0]["right"],
            merges[0]["pair_count"]) == ("l", "o", 6)
    assert (merges[1]["left"], merges[1]["right"]) == ("lo", "w")
    assert merges[1]["new_symbol"] == "low"
    # merge 2: 'low</w>' (freq 3) vs 'lower' pieces (freq 2)...
    assert merges[2]["left"] == "low"
    idx = [m["merge_idx"] for m in merges]
    assert idx == [0, 1, 2, 3]

    # single-char vocab exhausts instantly: 'a</w>' merges once, then
    # every word is one symbol -> early stop
    tiny = spark.createDataFrame([("a a a",)], "text string")
    m2 = bpe_train(tiny, n_merges=5).collect()
    assert len(m2) == 1 and m2[0]["new_symbol"] == "a</w>"

    empty = spark.createDataFrame([("   ",)], "text string")
    assert bpe_train(empty, n_merges=3).count() == 0


def test_ccnet_buckets_tertiles(spark):
    """ccnet_buckets: tertile sizes within tie tolerance, monotone
    score->bucket mapping, and bucket quality ordering."""
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.text import ccnet_buckets

    docs = spark.createDataFrame(
        [(i, " ".join(
            ["the common word"] * (1 + i % 7)
            + [f"rare{i}tok{j}" for j in range(i % 5)]
        )) for i in range(90)],
        "doc_id long, text string",
    )
    out = ccnet_buckets(docs).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["ppl_score"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    # tie-inclusive cuts: head >= ceil(n/3); buckets ordered by score
    assert len(by_bucket["head"]) >= 30
    assert min(by_bucket["head"]) > max(by_bucket["middle"])
    assert min(by_bucket["middle"]) > max(by_bucket["tail"])
    assert len(out) == 90


def test_corpus_datasheet_sections_consistent(spark):
    """corpus_datasheet: lang and source sections each sum to the
    corpus totals; empty docs and NULL keys surface correctly."""
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.text import corpus_datasheet

    docs = spark.createDataFrame(
        [
            (0, "en", "a", "one two three"),
            (1, "en", "b", "four"),
            (2, None, "a", "   "),
            (3, "zh", None, "五 六"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    out = {r["metric"]: r for r in corpus_datasheet(docs).collect()}
    tot = out["total:corpus"]
    assert (tot["n_docs"], tot["n_tokens"], tot["n_empty"]) == (4, 6, 1)
    langs = {k: v for k, v in out.items() if k.startswith("lang:")}
    srcs = {k: v for k, v in out.items() if k.startswith("source:")}
    assert sum(v["n_docs"] for v in langs.values()) == 4
    assert sum(v["n_tokens"] for v in srcs.values()) == 6
    assert out["lang:null"]["n_empty"] == 1
    assert out["source:null"]["n_docs"] == 1
    assert out["lang:en"]["n_tokens"] == 4
