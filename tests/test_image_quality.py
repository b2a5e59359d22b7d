"""Low-information image gate (operators/images.py:
with_image_quality_stats + low_information_expr): verdict-path pins for
every fixture archetype, null-edge semantics, and batch-split
invariance. The cross-formulation value check (vectorized kernel vs
scalar-loop oracle) lives in the image_quality_gate contract query."""

from __future__ import annotations

import numpy as np
import pytest

from lightcrawler_spark.imagecodec import encode_image
from lightcrawler_spark.operators.images import (
    low_information_expr,
    with_image_quality_stats,
)

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rows):
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    out = (
        with_image_quality_stats(df)
        .withColumn("low_information", low_information_expr())
        .orderBy("image_id")
        .collect()
    )
    return {r["image_id"]: r for r in out}


def _enc(a):
    return bytearray(encode_image(a.astype(np.uint8), "png"))


def test_verdict_paths(spark):
    noise = np.random.default_rng(42).integers(0, 256, size=(24, 24, 3))
    ramp = np.repeat(
        (np.arange(24) * 3)[None, :, None], 24, axis=0
    ).repeat(3, axis=2)
    checker = np.where(
        ((np.arange(24)[:, None] + np.arange(24)[None, :]) % 2 == 0),
        255, 0
    )[..., None].repeat(3, axis=2)
    near_solid = np.full((24, 24, 3), 200)
    near_solid[0, 0] = (0, 0, 0)
    rows = [
        (0, _enc(np.full((24, 24, 3), 128))),   # solid gray
        (1, _enc(noise)),                        # keep
        (2, _enc(ramp)),                         # linear ramp: lap == 0
        (3, _enc(checker)),                      # entropy exactly 1.0
        (4, _enc(near_solid)),                   # modal fraction 575/576
    ]
    got = _run(spark, rows)

    solid = got[0]
    assert solid["qual_entropy"] == 0.0
    assert solid["qual_lap_var"] == 0.0
    assert solid["qual_modal_count"] == 576 == solid["qual_n_pixels"]
    assert solid["qual_grayscale"] is True
    assert solid["low_information"] is True

    keep = got[1]
    assert keep["qual_entropy"] > 5.0
    assert keep["qual_lap_var"] > 1.0
    assert keep["qual_grayscale"] is False
    assert keep["low_information"] is False

    # interior Laplacian of a linear ramp is exactly zero -> blurred
    assert got[2]["qual_lap_var"] == 0.0
    assert got[2]["qual_entropy"] > 4.0
    assert got[2]["qual_grayscale"] is True
    assert got[2]["low_information"] is True

    # per-pixel checkerboard: two equal gray bins -> entropy exactly 1.0
    # (NOT < 1.0), huge Laplacian, modal exactly half -> keep
    chk = got[3]
    assert chk["qual_entropy"] == 1.0
    assert chk["qual_lap_var"] > 1000.0
    assert chk["qual_modal_count"] * 2 == chk["qual_n_pixels"]
    assert chk["low_information"] is False

    ns = got[4]
    assert ns["qual_modal_count"] == 575
    assert ns["low_information"] is True  # 575 > 0.9 * 576


def test_null_and_corrupt_blobs_yield_null_verdict(spark):
    got = _run(spark, [(0, bytearray(b"notanimage")), (1, None)])
    for r in got.values():
        assert r["qual_entropy"] is None
        assert r["qual_lap_var"] is None
        assert r["qual_modal_count"] is None
        assert r["qual_n_pixels"] is None
        assert r["qual_grayscale"] is None
        assert r["low_information"] is None


def test_no_interior_scores_lap_zero(spark):
    tiny = np.random.default_rng(7).integers(0, 256, size=(2, 2, 3))
    got = _run(spark, [(0, _enc(tiny))])
    assert got[0]["qual_lap_var"] == 0.0
    assert got[0]["low_information"] is True


def test_batch_split_invariance(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, _enc(rng.integers(0, 256, size=(8 + i % 5, 8 + i % 3, 3))))
        for i in range(20)
    ]
    one = _run(spark, rows)
    df7 = spark.createDataFrame(
        rows, "image_id long, bytes binary"
    ).repartition(7)
    out7 = (
        with_image_quality_stats(df7)
        .withColumn("low_information", low_information_expr())
        .collect()
    )
    for r in out7:
        ref = one[r["image_id"]]
        assert r["qual_entropy"] == ref["qual_entropy"]
        assert r["qual_lap_var"] == ref["qual_lap_var"]
        assert r["qual_modal_count"] == ref["qual_modal_count"]


def test_threshold_params_change_verdict_only(spark):
    noise = np.random.default_rng(42).integers(0, 256, size=(24, 24, 3))
    df = spark.createDataFrame(
        [(0, _enc(noise))], "image_id long, bytes binary"
    )
    stats = with_image_quality_stats(df)
    strict = stats.withColumn(
        "low_information",
        low_information_expr(min_entropy=99.0),
    ).collect()[0]
    assert strict["low_information"] is True  # entropy < 99 bits always
