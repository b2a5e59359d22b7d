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
    # the intentional rows-only set: only the probabilistic prefilters
    # (bit-array survivor sets have no SQL equivalent; their FPR and
    # exactness are unit-tested instead)
    assert set(q) - set(o) == {"bloom_prefilter", "cuckoo_prefilter"}


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
    assert q["bloom_prefilter"](spark, SF_DIR).count() > 0
    assert q["content_extract"](spark, SF_DIR).filter("n_images = 1").count() == 100
    assert q["summary_fields"](spark, SF_DIR).filter(
        "index_ori_no is not null").count() == 25
