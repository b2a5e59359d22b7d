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


class TestWarcNotModified:
    """server-not-modified revisit records (warc_not_modified_records):
    the archive closure of conditional-GET — 304 rows reference the
    PRIOR capture's digest, orphan 304s surface instead of fabricating
    a reference, and the segment round-trips through the parser."""

    def _run(self, spark):
        from lightcrawler_spark.operators.warc import (
            warc_not_modified_records,
        )

        trace = spark.createDataFrame(
            [
                (0, "http://h.test/0", "payload-0", 200),
                (1, "http://h.test/1", None, 304),       # prior known
                (2, "http://h.test/2", "payload-2", 200),
                (3, "http://h.test/3", None, 304),       # orphan
            ],
            "doc_id long, url string, payload string, status int",
        )
        prior = spark.createDataFrame(
            [
                ("http://h.test/0", hashlib.md5(b"old-0").hexdigest()),
                ("http://h.test/1", hashlib.md5(b"payload-1").hexdigest()),
            ],
            "url string, prior_md5 string",
        )
        rows = warc_not_modified_records(
            trace, prior, keep_record=True
        ).collect()
        return {r["doc_id"]: r for r in rows}

    def test_types_and_orphan(self, spark):
        got = self._run(spark)
        assert got[0]["record_type"] == "response"
        assert got[1]["record_type"] == "revisit"
        assert got[2]["record_type"] == "response"
        # 304 without a prior capture: surfaced, written as empty response
        assert got[3]["record_type"] == "response"
        assert got[3]["nm_orphan"] is True
        assert got[3]["content_length"] == 0
        assert all(got[i]["nm_orphan"] is False for i in (0, 1, 2))

    def test_revisit_record_bytes(self, spark):
        got = self._run(spark)
        digest = hashlib.md5(b"payload-1").hexdigest()
        rec = (
            "WARC/1.0\r\nWARC-Type: revisit\r\n"
            "WARC-Target-URI: http://h.test/1\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
            "server-not-modified\r\n"
            f"WARC-Refers-To-Digest: md5:{digest}\r\n"
            "Content-Length: 0\r\n\r\n\r\n\r\n"
        )
        assert got[1]["record_md5"] == hashlib.md5(rec.encode()).hexdigest()
        assert got[1]["record_length"] == len(rec)

    def test_offsets_and_roundtrip(self, spark):
        from lightcrawler_spark.operators.warc import parse_warc_segment

        got = self._run(spark)
        off = 0
        for i in range(4):
            assert got[i]["warc_offset"] == off
            off += got[i]["record_length"]
        segment = "".join(got[i]["record"] for i in range(4)).encode()
        seg_df = spark.createDataFrame(
            [(bytearray(segment),)], "segment binary"
        )
        parsed = {
            r["rec_seq"]: r for r in parse_warc_segment(seg_df).collect()
        }
        assert len(parsed) == 4
        assert all(r["record_ok"] for r in parsed.values())
        assert parsed[1]["warc_type"] == "revisit"
        assert parsed[1]["payload"] == bytearray(b"")
        assert parsed[0]["payload"] == bytearray(b"payload-0")
