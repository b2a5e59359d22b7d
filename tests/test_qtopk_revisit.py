"""Unit tests: SQ8 quantized top-k and WARC revisit records."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from lightcrawler_spark.operators.similarity import (
    brute_force_topk,
    quantized_topk,
)
from lightcrawler_spark.operators.warc import warc_revisit_records


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


class TestQuantizedTopk:
    def test_int_dot_matches_numpy(self, spark):
        rng = np.random.default_rng(11)
        vecs = [rng.standard_normal(8).astype(np.float32) for _ in range(6)]
        df = _emb_df(spark, vecs)
        out = quantized_topk(df, df.filter(F.col("vec_id") < 2), k=2)
        codes = {}
        for i, v in enumerate(vecs):
            s = 127.0 / np.abs(v.astype(np.float64)).max()
            codes[i] = np.round(v.astype(np.float64) * s).astype(np.int64)
        for r in out.collect():
            assert r.int_dot == int(codes[r.query_id] @ codes[r.neighbor_id])

    def test_agrees_with_exact_on_separated_data(self, spark):
        """On well-separated clusters the SQ8 ranking must equal the
        exact ranking (quantization error ~0.4% can't flip them)."""
        rng = np.random.default_rng(5)
        base = rng.standard_normal(16).astype(np.float32) * 10
        vecs = [base + rng.standard_normal(16).astype(np.float32) * 0.01
                for _ in range(4)]
        vecs += [(-base + rng.standard_normal(16).astype(np.float32) * 0.01)
                 for _ in range(4)]
        df = _emb_df(spark, vecs)
        q = df.filter(F.col("vec_id") == 0)
        approx = {r.rank: r.neighbor_id
                  for r in quantized_topk(df, q, k=3).collect()}
        exact = {r.rank: r.neighbor_id
                 for r in brute_force_topk(df, q, k=3).collect()}
        assert set(approx.values()) == set(exact.values())


class TestWarcRevisit:
    def _run(self, spark):
        pages = spark.createDataFrame(
            [(i, f"http://h.test/{i}", f"payload-{i}") for i in range(6)],
            "doc_id long, url string, payload string")
        prior_rows = []
        for i in range(2, 6):
            # i in {2,3}: digest matches -> revisit; {4,5}: changed
            body = f"payload-{i}" if i < 4 else f"payload-{i}-old"
            prior_rows.append(
                (f"http://h.test/{i}",
                 hashlib.md5(body.encode()).hexdigest()))
        prior = spark.createDataFrame(
            prior_rows, "url string, prior_md5 string")
        return {r.doc_id: r
                for r in warc_revisit_records(pages, prior).collect()}

    def test_record_types(self, spark):
        got = self._run(spark)
        assert [got[i].record_type for i in range(6)] == [
            "response", "response", "revisit", "revisit",
            "response", "response"]

    def test_revisit_records_have_no_body(self, spark):
        got = self._run(spark)
        assert got[2].content_length == 0
        assert got[0].content_length == len("payload-0")
        assert got[2].record_length < got[0].record_length

    def test_offsets_contiguous(self, spark):
        got = self._run(spark)
        off = 0
        for i in range(6):
            assert got[i].warc_offset == off
            off += got[i].record_length

    def test_revisit_record_bytes(self, spark):
        got = self._run(spark)
        digest = hashlib.md5(b"payload-2").hexdigest()
        rec = (
            "WARC/1.0\r\nWARC-Type: revisit\r\n"
            "WARC-Target-URI: http://h.test/2\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"WARC-Refers-To-Digest: md5:{digest}\r\n"
            "Content-Length: 0\r\n\r\n\r\n\r\n"
        )
        assert got[2].record_md5 == hashlib.md5(rec.encode()).hexdigest()
        assert got[2].record_length == len(rec)
