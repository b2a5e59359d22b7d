"""Unit tests: WARC record assembly/offsets and the domain quality gate."""

import hashlib

from pyspark.sql import functions as F

from lightcrawler_spark.operators.sampling import domain_quality_gate
from lightcrawler_spark.operators.warc import warc_records


def _pages(spark, n=40, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://h.test/p/"), F.col("id").cast("string"))
        .alias("url"),
        F.concat(F.lit("body-"), F.repeat(F.lit("x"), (F.col("id") % 17 + 1)
                                          .cast("int")),
                 F.col("id").cast("string")).alias("payload"),
    )


class TestWarcRecords:
    def test_offsets_are_contiguous_from_zero(self, spark):
        rows = sorted(
            warc_records(_pages(spark)).collect(), key=lambda r: r.doc_id
        )
        assert rows[0].warc_offset == 0
        for a, b in zip(rows, rows[1:]):
            assert b.warc_offset == a.warc_offset + a.record_length

    def test_partitioning_invariance(self, spark):
        def snap(parts, nparts):
            df = warc_records(_pages(spark, parts=parts),
                              num_partitions=nparts)
            return sorted(
                (r.doc_id, r.warc_offset, r.record_length, r.record_md5)
                for r in df.collect()
            )

        a = snap(1, 2)
        assert a == snap(3, 3) == snap(7, 5)

    def test_record_bytes_match_local_assembly(self, spark):
        r = {x.doc_id: x for x in warc_records(_pages(spark, n=5)).collect()}
        for i in range(5):
            payload = f"body-{'x' * (i % 17 + 1)}{i}"
            rec = (
                "WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: http://h.test/p/{i}\r\n"
                "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                "WARC-Payload-Digest: md5:"
                + hashlib.md5(payload.encode()).hexdigest()
                + f"\r\nContent-Length: {len(payload)}\r\n\r\n"
                + payload + "\r\n\r\n"
            )
            assert r[i].content_length == len(payload)
            assert r[i].record_length == len(rec)
            assert r[i].record_md5 == hashlib.md5(rec.encode()).hexdigest()

    def test_multibyte_payload_counts_bytes_not_chars(self, spark):
        df = spark.createDataFrame(
            [(0, "http://h.test/z", "中文内容")],
            "doc_id long, url string, payload string")
        row = warc_records(df).collect()[0]
        assert row.content_length == len("中文内容".encode("utf-8")) == 12


class TestDomainQualityGate:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, source string, score_milli long")

    def test_bad_big_domain_blocked_small_domain_immune(self, spark):
        rows = [(i, "spamfarm", 100) for i in range(10)]  # mean 100 < 450
        rows += [(100 + i, "tiny", 0) for i in range(3)]  # worse, but small
        rows += [(200 + i, "good", 900) for i in range(10)]
        out = domain_quality_gate(
            self._docs(spark, rows), min_docs=5, tau_milli=450
        ).collect()
        by_src = {r.source: r.domain_blocked for r in out}
        assert by_src == {"spamfarm": True, "tiny": False, "good": False}

    def test_threshold_is_strict(self, spark):
        rows = [(i, "edge", 450) for i in range(6)]  # sum == tau*n exactly
        out = domain_quality_gate(
            self._docs(spark, rows), min_docs=5, tau_milli=450
        ).collect()
        assert all(not r.domain_blocked for r in out)
        rows = [(i, "edge", 449) for i in range(6)]
        out = domain_quality_gate(
            self._docs(spark, rows), min_docs=5, tau_milli=450
        ).collect()
        assert all(r.domain_blocked for r in out)

    def test_stats_exact(self, spark):
        rows = [(0, "a", 1), (1, "a", 2), (2, "a", 4)]
        r = domain_quality_gate(
            self._docs(spark, rows), min_docs=1, tau_milli=3
        ).collect()[0]
        assert r.domain_docs == 3
        assert abs(r.domain_mean_milli - round(7 / 3, 6)) < 1e-12
