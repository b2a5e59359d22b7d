"""Encoder-swap seam for the CLIP-style gate (VERDICT r3 "Next round" #4).

`operators/clipscore.py` ships a DETERMINISTIC STAND-IN image encoder
(channel statistics) because no pretrained model exists in this sandbox.
The production story is "swap the pandas UDF for an ONNX CLIP vision
tower; nothing else changes". These tests prove the seam:

- a mock "real" encoder (any np.ndarray -> list[int] kernel) injected
  through `make_image_encoder_udf` yields the IDENTICAL physical plan
  shape — same operator sequence, same (zero) exchanges, same single
  ArrowEvalPython node — differing only in embedding values;
- output schema and gate semantics are unchanged; scores move only
  through the embedding;
- the per-row null contract (undecodable blob -> score 0) holds for the
  injected encoder exactly as for the stand-in.
"""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.operators.clipscore import (
    clip_scores,
    make_image_encoder_udf,
)
from lightcrawler_spark.imagecodec import png_encode
from lightcrawler_spark.sources.synthetic_web import synth_image_array


def pairs_df(spark, n=8):
    rows = [
        (
            f"i{i}",
            bytearray(png_encode(synth_image_array(i))),
            f"synthetic caption {i}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, caption string"
    )


def mock_clip_kernel(arr: np.ndarray) -> list:
    """Stands in for a real vision tower: same signature, same integer
    micro-unit contract, different values (a fixed projection of the
    flattened image, nothing like channel stats)."""
    a = arr.astype(np.int64)
    h = int(a.sum() % 7919)
    return [((h * (i + 3)) % 2001) - 1000 for i in range(8)]


def plan_shape(df) -> list:
    """Physical operator sequence with ids/exprs stripped — the shape."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    ops = []
    for line in plan.splitlines():
        m = re.search(r"(?:[*+\-: ]*)\(?(\d+)?\)? ?([A-Za-z]+[A-Za-z0-9]*)\b", line)
        name = re.sub(r"^[^A-Za-z]*", "", line).split(" ", 1)[0]
        if name:
            ops.append(name)
    return ops


class TestClipSeam:
    def test_swap_preserves_plan_shape(self, spark):
        df = pairs_df(spark)
        standin = clip_scores(df, threshold=0.2)
        swapped = clip_scores(
            df, threshold=0.2,
            image_encoder=make_image_encoder_udf(mock_clip_kernel),
        )
        assert plan_shape(standin) == plan_shape(swapped)
        # exactly one Arrow python pass in both, no exchange anywhere
        for d in (standin, swapped):
            plan = d._jdf.queryExecution().executedPlan().toString()
            assert plan.count("ArrowEvalPython") == 1
            assert "Exchange" not in plan

    def test_swap_changes_only_scores(self, spark):
        df = pairs_df(spark)
        a = clip_scores(df, threshold=0.2).orderBy("image_id").collect()
        b = clip_scores(
            df, threshold=0.2,
            image_encoder=make_image_encoder_udf(mock_clip_kernel),
        ).orderBy("image_id").collect()
        assert [r.asDict().keys() for r in a] == [r.asDict().keys() for r in b]
        for ra, rb in zip(a, b):
            assert ra["image_id"] == rb["image_id"]
            assert ra["caption"] == rb["caption"]
            assert bytes(ra["bytes"]) == bytes(rb["bytes"])
        # the mock projection produces different embeddings -> different
        # scores for at least one row (else the seam wasn't exercised)
        assert any(
            ra["clip_score"] != rb["clip_score"] for ra, rb in zip(a, b)
        )

    def test_null_contract_for_injected_encoder(self, spark):
        rows = [("bad", bytearray(b"\x00not-an-image"), "caption here")]
        df = spark.createDataFrame(
            rows, "image_id string, bytes binary, caption string"
        )
        out = clip_scores(
            df, image_encoder=make_image_encoder_udf(mock_clip_kernel)
        ).first()
        assert out["clip_score"] == 0.0
        assert out["keep"] is False

    def test_default_is_the_standin_kernel(self, spark):
        """make_image_encoder_udf(clip_image_vec_micro) == the default
        encoder — the stand-in is itself produced through the seam's
        contract, so swapping is a one-argument change."""
        from lightcrawler_spark.operators.clipscore import clip_image_vec_micro

        df = pairs_df(spark, n=4)
        a = clip_scores(df).orderBy("image_id").collect()
        b = clip_scores(
            df, image_encoder=make_image_encoder_udf(clip_image_vec_micro)
        ).orderBy("image_id").collect()
        assert [r["clip_score"] for r in a] == [r["clip_score"] for r in b]
