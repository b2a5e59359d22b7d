"""Unit tests: spider-trap signals, rendezvous sharding, MIME sniffing."""

import gzip
import zlib

from pyspark.sql import functions as F

from lightcrawler_spark.operators.mime import sniff_mime
from lightcrawler_spark.operators.scheduler import assign_crawl_shards
from lightcrawler_spark.operators.traps import with_trap_signals


def _signals(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return with_trap_signals(df).collect()[0]


class TestTrapSignals:
    def test_clean_url(self, spark):
        r = _signals(spark, "https://h.example.com/docs/page1.html")
        assert r.path_depth == 2
        assert r.max_seg_repeat == 1
        assert r.n_query_params == 0
        assert not r.has_session_id
        assert not r.is_trap

    def test_repeated_segment_trap(self, spark):
        r = _signals(spark, "http://h.test/a/b/a/c/a")
        assert r.max_seg_repeat == 3
        assert r.is_trap
        r2 = _signals(spark, "http://h.test/a/b/a/c")
        assert r2.max_seg_repeat == 2
        assert not r2.is_trap

    def test_session_id_detected_case_insensitive(self, spark):
        for q in ("?JSESSIONID=abc", "?a=1&PHPSESSID=z", "?x=2&sid=9"):
            r = _signals(spark, "http://h.test/p" + q)
            assert r.has_session_id and r.is_trap, q
        # 'sid' must match only as a whole key, not as a suffix
        r = _signals(spark, "http://h.test/p?classid=9")
        assert not r.has_session_id

    def test_calendar_trap(self, spark):
        r = _signals(spark, "http://h.test/2023/2024/2025/post")
        assert r.n_calendar_segs == 3 and r.is_trap
        r2 = _signals(spark, "http://h.test/2024/06/post")
        assert r2.n_calendar_segs == 1 and not r2.is_trap

    def test_param_count_and_empty_query(self, spark):
        r = _signals(spark, "http://h.test/s?" + "&".join(
            f"k{i}=1" for i in range(9)))
        assert r.n_query_params == 9 and r.is_trap
        assert _signals(spark, "http://h.test/s?").n_query_params == 0

    def test_depth_and_length(self, spark):
        deep = "http://h.test" + "".join(f"/s{i}" for i in range(13))
        assert _signals(spark, deep).path_depth == 13
        assert _signals(spark, deep).is_trap
        long_url = "http://h.test/p?q=" + "x" * 500
        assert _signals(spark, long_url).url_len > 512
        assert _signals(spark, long_url).is_trap


class TestRendezvousShards:
    def test_deterministic_and_in_range(self, spark):
        hosts = spark.createDataFrame(
            [(f"h{i}.test",) for i in range(200)], "host string")
        a = {r.host: r.shard for r in assign_crawl_shards(hosts, 8).collect()}
        b = {r.host: r.shard for r in assign_crawl_shards(hosts, 8).collect()}
        assert a == b
        assert set(a.values()) <= set(range(8))
        # every shard gets some hosts at this size (balance sanity)
        assert len(set(a.values())) == 8

    def test_resize_minimal_remap(self, spark):
        """Rendezvous property: growing S -> S+1 moves a host ONLY if the
        new shard wins its argmax — all other assignments are unchanged
        (compare with mod-hashing, which remaps ~all hosts)."""
        hosts = spark.createDataFrame(
            [(f"h{i}.test",) for i in range(400)], "host string")
        s8 = {r.host: r.shard for r in assign_crawl_shards(hosts, 8).collect()}
        s9 = {r.host: r.shard for r in assign_crawl_shards(hosts, 9).collect()}
        moved = {h for h in s8 if s8[h] != s9[h]}
        assert all(s9[h] == 8 for h in moved)  # movers go to the new shard
        assert len(moved) < 400 * 0.25  # ~1/9 expected; generous bound


class TestMimeSniff:
    def _sniff(self, spark, blobs):
        df = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in enumerate(blobs)],
            "id int, bytes binary")
        return [r.mime for r in sniff_mime(df).orderBy("id").collect()]

    def test_real_magic_bytes(self, spark):
        got = self._sniff(spark, [
            b"\x89PNG\r\n\x1a\n" + b"\x00" * 8,
            b"\xff\xd8\xff\xe0\x00\x10JFIF\x00",
            b"GIF89a" + b"\x00" * 10,
            b"%PDF-1.4\n%junk",
            gzip.compress(b"hello world"),
            b"PK\x03\x04" + b"\x00" * 12,
            b"RIFF\x24\x08\x00\x00WAVEfmt ",
            b"  <html><body>Hi</body></html>",
            b"Plain text here\nwith a newline.",
            b"\xc0\xde\x00\xff" * 4,
        ])
        assert got == [
            "image/png", "image/jpeg", "image/gif", "application/pdf",
            "application/gzip", "application/zip", "audio/x-wav",
            "text/html", "text/plain", "application/octet-stream",
        ]

    def test_nul_in_text_is_binary(self, spark):
        got = self._sniff(spark, [b"looks like text\x00but has a NUL"])
        assert got == ["application/octet-stream"]

    def test_zlib_raw_is_not_gzip(self, spark):
        # raw deflate (no 1F 8B header) must not be classified gzip
        raw = zlib.compress(b"hello world")[2:-4]
        got = self._sniff(spark, [b"\x78\x9c" + raw])
        assert got == ["application/octet-stream"]
