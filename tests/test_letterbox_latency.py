"""Unit tests: letterbox preprocessing + latency-adaptive budgets."""

import numpy as np
from pyspark.sql import functions as F

from lightcrawler_spark.imagecodec import decode_image, encode_image
from lightcrawler_spark.operators.images import letterbox_images
from lightcrawler_spark.operators.scheduler import latency_budgets


def _img_df(spark, arrays):
    rows = [(f"i{k}", bytearray(encode_image(a, "png")), "png")
            for k, a in enumerate(arrays)]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string")


class TestLetterbox:
    def test_wide_image_pads_top_bottom(self, spark):
        wide = np.full((10, 40, 3), 200, dtype=np.uint8)
        r = letterbox_images(_img_df(spark, [wide]), 20, 16).collect()[0]
        assert (r.box_w, r.box_h) == (20, 5)   # 10*20//40
        assert r.box_x == 0 and r.box_y == (16 - 5) // 2
        out = decode_image(bytes(r.bytes_boxed))
        assert out.shape == (16, 20, 3)
        assert (out[r.box_y:r.box_y + 5] == 200).all()
        assert (out[0] == 114).all() and (out[-1] == 114).all()

    def test_tall_image_pads_left_right(self, spark):
        tall = np.full((32, 8, 3), 50, dtype=np.uint8)
        r = letterbox_images(_img_df(spark, [tall]), 20, 16).collect()[0]
        assert (r.box_w, r.box_h) == (4, 16)   # 8*16//32
        assert r.box_y == 0 and r.box_x == (20 - 4) // 2
        out = decode_image(bytes(r.bytes_boxed))
        assert (out[:, r.box_x:r.box_x + 4] == 50).all()
        assert (out[:, 0] == 114).all() and (out[:, -1] == 114).all()

    def test_extreme_aspect_box_never_zero(self, spark):
        sliver = np.full((400, 2, 3), 9, dtype=np.uint8)
        r = letterbox_images(_img_df(spark, [sliver]), 20, 16).collect()[0]
        assert r.box_w >= 1 and r.box_h == 16

    def test_bad_blob_yields_nulls(self, spark):
        df = spark.createDataFrame(
            [("bad", bytearray(b"junk"), "png")],
            "image_id string, bytes binary, fmt string")
        r = letterbox_images(df, 20, 16).collect()[0]
        assert r.bytes_boxed is None and r.box_w is None


class TestLatencyBudgets:
    def _pages(self, spark, rows):
        return spark.createDataFrame(rows, "host string, fetch_ms long")

    def test_fast_host_capped_slow_host_floored(self, spark):
        rows = [("fast", 10)] * 5 + [("slow", 30000)] * 2
        got = {r.host: r.host_budget for r in latency_budgets(
            self._pages(spark, rows), 10000, default_budget=4,
            max_budget=64).collect()}
        assert got["fast"] == 64   # 10000*5/50 = 1000 -> cap
        assert got["slow"] == 1    # 10000*2/60000 = 0 -> floor 1

    def test_exact_integer_division(self, spark):
        rows = [("h", 300)] * 3   # 10000*3/900 = 33.33 -> 33
        got = latency_budgets(self._pages(spark, rows), 10000,
                              default_budget=4).collect()[0]
        assert got.host_budget == 33 and got.n_obs == 3 and got.sum_ms == 900

    def test_zero_latency_history_uses_default(self, spark):
        rows = [("h", 0)] * 2
        got = latency_budgets(self._pages(spark, rows), 10000,
                              default_budget=7).collect()[0]
        assert got.host_budget == 7
