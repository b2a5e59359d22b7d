"""Driver-contract guard: every queries() entry runs, and a fast subset
is hash-verified against its DuckDB oracle at sf0.001 (mirrors the
driver's CORRECTNESS gate; the full sweep incl. slow queries lives in
tools/verify_contract.py)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.verify_contract import TABLES, frame_hash

SF_DIR = "/root/testdata/sf0.001"

FAST_ORACLE_QUERIES = [
    "crawl_bfs",
    "canonicalize_resolve",
    "frontier_dedup_anti",
    "priority_pop",
    "admission_filter",
    "robots_filter",
    "politeness_rounds",
    "pagination",
    "status_report",
    "events_hourly",
    "sessionize",
    "dedup_exact",
    "minhash_signatures",
    "ngram_jaccard",
    "lang_id",
    "quality_score",
    "token_counts",
    "doc_fingerprint",
    "embedding_topk",
    "embedding_near_dup",
    "embedding_lsh",
    "publish_time_normalize",
    "doc_no_normalize",
    "title_guess",
    "t_valid_rule",
    "negs_extract",
    "attachment_harvest",
    "attachment_type",
    "index_block",
    "title_similarity",
    "product_dedup",
    "cookie_lookup",
    "send_data",
    "requeue_list",
    "repetition_stats",
    "decontaminate",
    "training_mix_sample",
    "crawl_delay_budgets",
    "backoff_blocked",
    "corpus_pipeline",
    "anchor_text_agg",
    "recrawl_schedule",
    "sitemap_parse",
    "robots_sitemaps",
    "aspect_bucket",
    "lang_rebalance",
    "vocab_topk",
    "dup_span_mask",
    "clip_score_filter",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["url", "node", "depth"]


def test_every_query_has_callable_and_oracle_keys():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # every driver query is oracle-backed since r5: the probabilistic
    # prefilters now project bounded-property rows (exact counts +
    # no-false-negative zero + FPR interval) instead of the raw
    # survivor set, so they carry SQL oracles too
    assert set(q) - set(o) == set()


@pytest.mark.parametrize("name", FAST_ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    n_s, h_s = frame_hash(df.columns, [tuple(r) for r in df.collect()])
    res = duck.execute(entrymod.oracle_sql()[name])
    o_cols = [d[0] for d in res.description]
    n_o, h_o = frame_hash(o_cols, res.fetchall())
    assert sorted(df.columns) == sorted(o_cols)
    assert (n_s, h_s) == (n_o, h_o)


def test_rows_only_queries_run(spark):
    q = entrymod.queries()
    assert q["image_verify"](spark, SF_DIR).count() == 64  # all verdicts pass
    assert q["simhash_docs"](spark, SF_DIR).count() == 500
    row = q["bloom_prefilter"](spark, SF_DIR).collect()[0]
    assert row["n_seen_survivors"] == 0 and row["fp_within_budget"]
    assert q["content_extract"](spark, SF_DIR).filter("n_images = 1").count() == 100
    assert q["summary_fields"](spark, SF_DIR).filter(
        "index_ori_no is not null").count() == 25


def test_no_array_or_map_driver_columns(spark):
    """Array-free driver projection rule (CORRECTNESS_r04 regression):
    the driver's canonicalizer pandas-sorts every column and cannot
    factorize list/dict cells, so NO queries() entry may project an
    ArrayType/MapType (or array/map-bearing struct) column. Schema-only
    check — plans are built, not executed, except the handful of
    queries (kmeans training) whose CONSTRUCTION runs bounded O(k)
    driver work."""
    from pyspark.sql import types as T

    def has_container(dt) -> bool:
        if isinstance(dt, (T.ArrayType, T.MapType)):
            return True
        if isinstance(dt, T.StructType):
            return any(has_container(f.dataType) for f in dt.fields)
        return False

    offenders = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        bad = [f.name for f in df.schema.fields if has_container(f.dataType)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"array/map columns in driver projections: {offenders}"
