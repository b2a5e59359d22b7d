"""epoch_mix: data-constrained repeats (whole epochs + md5 fractional).

The exactness test recomputes every row's repeat count with plain
hashlib, so the Spark result is pinned row-for-row, not statistically.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.operators.sampling import epoch_mix


def _df(spark, n_a=40, n_b=25, n_null=5):
    rows = (
        [(i, "a") for i in range(n_a)]
        + [(1000 + i, "b") for i in range(n_b)]
        + [(2000 + i, None) for i in range(n_null)]
    )
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _u(doc_id, salt="epoch"):
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def test_exact_per_row_repeats(spark):
    # a: target 100 over 40 rows -> full 2, rate 20/40; b: 30/25 -> 1 + 5/25
    out = epoch_mix(
        _df(spark), {"a": 100, "b": 30}, max_epochs=4
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["epoch"])
    for doc_id, epochs in got.items():
        n_rep = len(epochs)
        assert sorted(epochs) == list(range(n_rep))
    for i in range(40):
        expect = 2 + (1 if _u(i) < 20 / 40 else 0)
        assert len(got.get(i, [])) == expect, f"doc {i}"
    for i in range(25):
        expect = 1 + (1 if _u(1000 + i) < 5 / 25 else 0)
        assert len(got.get(1000 + i, [])) == expect, f"doc {1000+i}"


def test_epoch_cap_clamps_target(spark):
    out = epoch_mix(_df(spark), {"a": 10_000}, max_epochs=3)
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert len(per_doc) == 40
    assert all(r["n"] == 3 for r in per_doc)  # capped, no fraction


def test_unknown_and_null_strata_excluded(spark):
    out = epoch_mix(_df(spark), {"a": 40, "zz": 10}, max_epochs=2)
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"a"}


def test_no_applicable_targets_empty(spark):
    out = epoch_mix(_df(spark), {"zz": 10})
    assert out.count() == 0
    assert "epoch" in out.columns


def test_bad_max_epochs_raises(spark):
    with pytest.raises(ValueError):
        epoch_mix(_df(spark), {"a": 10}, max_epochs=0)


def test_total_rows_equal_effective_targets(spark):
    # a: eff = min(100, 4*40) = 100 -> but fractional epoch is
    # hash-approximate; whole epochs are exact: total = 2*40 + |{u<0.5}|
    out = epoch_mix(_df(spark), {"a": 100}, max_epochs=4)
    frac_hits = sum(1 for i in range(40) if _u(i) < 0.5)
    assert out.count() == 2 * 40 + frac_hits
