"""Unit tests for the corpus-curation operators added in round 3
(continuation session 4): CLIP-style image+caption alignment scoring,
cross-document duplicated-span masking, temperature-based language
rebalancing. Oracle hash-matches live in the contract gate
(tests/test_entry_contract.py + tools/verify_contract.py); these tests
pin the semantics with hand-computed expectations."""

import hashlib

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# clip_scores
# ---------------------------------------------------------------------------

def _py_text_vec(caption: str, dim: int = 8, salt: str = "clip"):
    """Independent replica of caption_vec_expr (hashlib, not Spark)."""
    vec = [0] * dim
    for tok in caption.lower().split(" "):
        if not tok:
            continue
        h = hashlib.md5((tok + salt).encode("utf-8")).hexdigest()
        bucket = int(h[:8], 16) % dim
        sign = 1 if int(h[8], 16) < 8 else -1
        vec[bucket] += sign
    return vec


def _image_caption_df(spark, n=12):
    from lightcrawler_spark.fixtures import make_images

    rows = make_images(n)
    return rows, spark.createDataFrame(
        [(r["image_id"], bytearray(r["bytes"]), r["caption"]) for r in rows],
        "image_id string, bytes binary, caption string",
    )


def test_clip_score_matches_python_replica(spark):
    import math

    from lightcrawler_spark.imagecodec import decode_image
    from lightcrawler_spark.operators.clipscore import (
        clip_image_vec_micro,
        clip_scores,
    )

    rows, df = _image_caption_df(spark)
    got = {r.image_id: (r.clip_score, r.keep)
           for r in clip_scores(df, threshold=0.2).collect()}
    for r in rows:
        fvec = clip_image_vec_micro(decode_image(r["bytes"]))
        tvec = _py_text_vec(r["caption"])
        dot = sum(a * b for a, b in zip(tvec, fvec))
        t2 = sum(a * a for a in tvec)
        f2 = sum(b * b for b in fvec)
        want = round(dot / math.sqrt(float(t2 * f2)), 6) if t2 and f2 else 0.0
        score, keep = got[r["image_id"]]
        assert score == pytest.approx(want, abs=1e-12), r["image_id"]
        assert keep == (score >= 0.2)
        assert -1.0 <= score <= 1.0


def test_clip_score_undecodable_blob_scores_zero(spark):
    from lightcrawler_spark.operators.clipscore import clip_scores

    df = spark.createDataFrame(
        [("bad", bytearray(b"not an image"), "a caption here")],
        "image_id string, bytes binary, caption string",
    )
    row = clip_scores(df, threshold=0.2).collect()[0]
    assert row.clip_score == 0.0 and row.keep is False


def test_clip_score_precomputed_vec_column_matches_inline(spark):
    from lightcrawler_spark.operators.clipscore import (
        clip_image_vec_udf,
        clip_scores,
    )

    _, df = _image_caption_df(spark)
    inline = {r.image_id: r.clip_score
              for r in clip_scores(df, threshold=0.2).collect()}
    pre = df.withColumn("ivec", clip_image_vec_udf(F.col("bytes")))
    reused = {r.image_id: r.clip_score
              for r in clip_scores(pre, threshold=0.2,
                                   image_vec_col="ivec").collect()}
    assert inline == reused


# ---------------------------------------------------------------------------
# mask_duplicate_ngrams
# ---------------------------------------------------------------------------

def _mask(spark, rows, **kw):
    from lightcrawler_spark.operators.textdedup import mask_duplicate_ngrams

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = mask_duplicate_ngrams(df, **kw)
    return {r.doc_id: r for r in out.collect()}


def test_mask_shared_prefix_masked_in_both_docs(spark):
    got = _mask(
        spark,
        [
            (1, "alpha beta gamma delta epsilon one two three"),
            (2, "alpha beta gamma delta epsilon nine eight seven"),
            (3, "totally unrelated words only here now"),
        ],
        n=5,
        min_docs=2,
    )
    # the shared 5-gram covers positions 0-4 in docs 1 and 2
    for d in (1, 2):
        assert got[d].dup_positions == 5
        assert got[d].n_tokens == 8
        assert got[d].dup_token_fraction == pytest.approx(5 / 8, abs=1e-6)
    assert got[1].text_masked == "one two three"
    assert got[2].text_masked == "nine eight seven"
    assert got[3].dup_positions == 0
    assert got[3].text_masked == "totally unrelated words only here now"


def test_mask_overlapping_occurrences_union_coverage(spark):
    # "a b c a b c a b c" with n=3: gram "a b c" (and rotations) repeat
    # WITHIN one doc but only count when in >=2 DISTINCT docs
    got = _mask(
        spark,
        [(1, "a b c a b c a b c"), (2, "z z z z z")],
        n=3,
        min_docs=2,
    )
    assert got[1].dup_positions == 0  # repeats within one doc don't count
    assert got[2].dup_positions == 0


def test_mask_short_and_empty_docs(spark):
    got = _mask(
        spark,
        [(1, "one two"), (2, ""), (3, "one two")],
        n=5,
        min_docs=2,
    )
    assert got[1].dup_positions == 0 and got[1].text_masked == "one two"
    assert got[2].n_tokens == 0 and got[2].dup_token_fraction == 0.0
    assert got[2].text_masked == ""


def test_mask_tokenization_matches_word_ngrams_rule(spark):
    # punctuation/case fold exactly like word_ngrams: [^a-z0-9]+ split
    got = _mask(
        spark,
        [(1, "Hello, WORLD! Foo-bar baz qux"),
         (2, "hello world foo bar baz quux")],
        n=5,
        min_docs=2,
    )
    # both tokenize to [hello world foo bar baz ...] → shared 5-gram
    assert got[1].dup_positions == 5
    assert got[2].dup_positions == 5


# ---------------------------------------------------------------------------
# temperature_rebalance
# ---------------------------------------------------------------------------

def _u32(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2 ** 32


def test_rebalance_exact_keep_rule_alpha_half(spark):
    from lightcrawler_spark.operators.sampling import temperature_rebalance

    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = {r.doc_id: r for r in temperature_rebalance(df).collect()}
    n = {"big": 80.0, "small": 20.0}
    for i, lang in rows:
        u = _u32(str(i))
        want = (u * u) * n[lang] < 20.0
        assert (i in kept) == want, (i, lang)
    # min stratum rate is exactly 1.0 → kept whole
    assert sum(1 for i, l in rows if l == "small" and i in kept) == 20
    for r in kept.values():
        if r.lang == "small":
            assert r.rebalance_rate == 1.0
        else:
            assert r.rebalance_rate == pytest.approx(0.5, abs=1e-6)


def test_rebalance_general_alpha_path(spark):
    from lightcrawler_spark.operators.sampling import temperature_rebalance

    rows = [(i, "a" if i < 90 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_rebalance(df, alpha=0.7)
    kept = out.collect()
    rate_a = (10.0 / 90.0) ** 0.3
    for r in kept:
        if r.lang == "a":
            assert r.rebalance_rate == pytest.approx(round(rate_a, 6))
    # alpha→1 keeps everything
    assert spark.createDataFrame(rows, "doc_id long, lang string").count() == 100
    all_kept = temperature_rebalance(df, alpha=1.0).count()
    assert all_kept == 100


def test_rebalance_null_strata_dropped_not_crashed(spark):
    """Round-4 ADVICE fix: a NULL stratum used to TypeError in
    sorted() (None vs str) — now null-stratum rows are dropped
    explicitly and the labeled strata rebalance as before."""
    from lightcrawler_spark.operators.sampling import temperature_rebalance

    rows = [(i, "big" if i < 80 else ("small" if i < 100 else None))
            for i in range(110)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = {r.doc_id: r for r in temperature_rebalance(df).collect()}
    assert all(r.lang is not None for r in kept.values())
    # identical verdicts to the null-free fixture (n_min/n_s unchanged)
    n = {"big": 80.0, "small": 20.0}
    for i, lang in rows:
        if lang is None:
            assert i not in kept
            continue
        u = _u32(str(i))
        assert (i in kept) == ((u * u) * n[lang] < 20.0), (i, lang)

    # all-null strata → empty result, not a crash
    df2 = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, lang string")
    assert temperature_rebalance(df2).count() == 0


def test_rebalance_resume_stability_and_salt_independence(spark):
    from lightcrawler_spark.operators.sampling import temperature_rebalance

    rows = [(i, "x" if i < 90 else ("y" if i < 110 else "z"))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = sorted(r.doc_id for r in temperature_rebalance(df).collect())
    b = sorted(r.doc_id for r in temperature_rebalance(df).collect())
    assert a == b  # deterministic, resume-stable
    c = sorted(r.doc_id for r in temperature_rebalance(df, salt="v2").collect())
    assert a != c  # a different salt draws an independent sample


# ---------------------------------------------------------------------------
# vocab_topk
# ---------------------------------------------------------------------------

def test_vocab_topk_counts_ties_and_coverage(spark):
    from lightcrawler_spark.operators.text import vocab_topk

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b c d. D!")],
        "doc_id long, text string",
    )
    # counts: a=3 b=3 c=2 d=2 → ties broken token-ASC
    rows = vocab_topk(df, k=3).orderBy("vocab_rank").collect()
    assert [(r.tok, r.cnt, r.vocab_rank) for r in rows] == [
        ("a", 3, 1), ("b", 3, 2), ("c", 2, 3)
    ]
    total = 10.0
    assert rows[0].cum_frac == pytest.approx(3 / total, abs=1e-6)
    assert rows[1].cum_frac == pytest.approx(6 / total, abs=1e-6)
    assert rows[2].cum_frac == pytest.approx(8 / total, abs=1e-6)


def test_vocab_topk_min_count_and_empty(spark):
    from lightcrawler_spark.operators.text import vocab_topk

    df = spark.createDataFrame(
        [(1, "x x y")], "doc_id long, text string")
    rows = vocab_topk(df, k=10, min_count=2).collect()
    assert [(r.tok, r.cnt) for r in rows] == [("x", 2)]
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert vocab_topk(empty, k=5).count() == 0


def test_dedup_report_exact(spark):
    """dedup_report: histogram identities pinned on a hand-built
    assignment (3 clusters of sizes 3, 2, 1, 1 -> 7 rows)."""
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.textdedup import dedup_report

    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5), (6, 6)],
        "doc_id long, cluster long",
    )
    rows = {r["cluster_size"]: r for r in dedup_report(assign).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1]["n_clusters"], rows[1]["removed_rows"]) == (2, 0)
    assert (rows[2]["n_clusters"], rows[2]["removed_rows"]) == (1, 1)
    assert (rows[3]["n_clusters"], rows[3]["removed_rows"]) == (1, 2)
    assert sum(r["n_rows"] for r in rows.values()) == 7
    assert abs(sum(r["removed_frac"] for r in rows.values()) - 3 / 7) < 1e-5
    # empty assignment: no rows, no division blowup
    assert dedup_report(assign.filter(F.lit(False))).count() == 0
