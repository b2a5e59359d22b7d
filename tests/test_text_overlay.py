"""Text-overlay screen: verdict paths pinned per fixture image."""

from pyspark.sql import functions as F

from lightcrawler_spark.operators.images import (
    text_overlay_expr,
    with_text_overlay_stats,
)


def test_verdict_paths(spark):
    from __spark_entry__ import _text_overlay_fixture_images

    df = spark.createDataFrame(
        _text_overlay_fixture_images(), "image_id string, bytes binary"
    )
    out = {
        r["image_id"]: r
        for r in with_text_overlay_stats(df)
        .withColumn("text_heavy", text_overlay_expr(0.35))
        .collect()
    }
    assert out["banded"]["text_heavy"] is True
    assert out["banded"]["txt_text_rows"] == 12  # half the bands striped
    assert out["photo"]["text_heavy"] is False
    assert out["photo"]["txt_total_trans"] == 0  # smooth gradient
    assert out["solid"]["text_heavy"] is False
    assert out["noise"]["text_heavy"] is True  # grayscale static: documented FP
    assert out["sparse"]["text_heavy"] is False  # 4/24 rows < 35%
    assert out["sparse"]["txt_text_rows"] == 4
    # 4px-wide image: row_min = max(6, 0) = 6 > possible transitions
    assert out["tiny"]["text_heavy"] is False
    assert out["tiny"]["txt_text_rows"] == 0
    assert out["corrupt"]["text_heavy"] is None
    assert out["corrupt"]["txt_n_rows"] is None
    assert out["nullblob"]["text_heavy"] is None


def test_threshold_boundary_exact(spark):
    # 24 rows, exactly 35% = 8.4 -> 8 text rows must NOT trip, 9 must
    from __spark_entry__ import _text_overlay_fixture_images  # noqa: F401
    import numpy as np

    from lightcrawler_spark.imagecodec import encode_image

    def img(n_text_rows):
        a = np.full((24, 24, 3), 128.0)
        stripe = np.array([255 * ((x // 2) % 2) for x in range(24)])
        for y in range(n_text_rows):
            a[y, :, :] = stripe[:, None]
        return bytearray(encode_image(a.astype(np.uint8), "png"))

    df = spark.createDataFrame(
        [("eight", img(8)), ("nine", img(9))], "image_id string, bytes binary"
    )
    out = {
        r["image_id"]: r["text_heavy"]
        for r in with_text_overlay_stats(df)
        .withColumn("text_heavy", text_overlay_expr(0.35))
        .collect()
    }
    assert out == {"eight": False, "nine": True}
