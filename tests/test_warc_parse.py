"""parse_warc_segment: the archive read side.

Round-trip against hand-built records, byte-exact Content-Length
slicing of multi-byte payloads, and every malformed-tail path (bad
magic, missing length, truncated payload, missing trailing CRLFs).
"""

import hashlib

from pyspark.sql import functions as F

from lightcrawler_spark.operators.warc import parse_warc_segment


def _rec(url: str, payload: bytes, date: str = "2026-01-01T00:00:00Z",
         wtype: str = "response") -> bytes:
    h = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\nWARC-Payload-Digest: "
        f"md5:{hashlib.md5(payload).hexdigest()}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return h + payload + b"\r\n\r\n"


def _parse(spark, *segments):
    df = spark.createDataFrame(
        [(i, bytearray(s) if s is not None else None)
         for i, s in enumerate(segments)],
        "seg_id int, segment binary",
    )
    return parse_warc_segment(df, "segment").collect()


def test_roundtrip_multibyte_payloads(spark):
    p1, p2 = b"hello", "héllo 世界".encode()
    rows = _parse(spark, _rec("http://a/1", p1) + _rec("http://a/2", p2))
    assert len(rows) == 2
    r1, r2 = sorted(rows, key=lambda r: r["rec_seq"])
    assert (r1["target_uri"], r1["content_length"], bytes(r1["payload"])) \
        == ("http://a/1", 5, p1)
    assert (r2["target_uri"], r2["content_length"], bytes(r2["payload"])) \
        == ("http://a/2", len(p2), p2)
    assert r2["rec_offset"] == len(_rec("http://a/1", p1))
    assert r2["payload_md5"] == hashlib.md5(p2).hexdigest()
    assert r1["record_ok"] and r2["record_ok"]
    assert r1["warc_type"] == "response"


def test_malformed_tails(spark):
    good = _rec("http://a/1", b"x")
    cases = [
        good + b"GARBAGE",                      # bad magic after a record
        good + b"WARC/1.0\r\nContent-Length: nope\r\n\r\n",  # bad length
        good + _rec("http://a/2", b"payload")[:-6],          # truncated
        good + _rec("http://a/3", b"y")[:-2],   # one trailing CRLF short
    ]
    for seg in cases:
        rows = sorted(_parse(spark, seg), key=lambda r: r["rec_seq"])
        assert len(rows) == 2, seg[-20:]
        assert rows[0]["record_ok"] is True
        assert rows[1]["record_ok"] is False  # truncation SURFACES
        assert rows[1]["rec_offset"] == len(good)
        assert rows[1]["payload"] is None


def test_empty_and_null_segments(spark):
    rows = _parse(spark, b"", None, _rec("http://a/1", b"z"))
    assert len(rows) == 1  # empty -> no rows, null -> skipped
    assert rows[0]["target_uri"] == "http://a/1"


def test_keep_record_matches_hand_built(spark):
    from lightcrawler_spark.operators.warc import warc_records

    df = spark.createDataFrame(
        [(1, "http://a/1", "hello"), (2, "http://a/2", "wörld")],
        "doc_id long, url string, payload string",
    )
    recs = {
        r["doc_id"]: r["record"].encode()
        for r in warc_records(df, keep_record=True).collect()
    }
    assert recs[1] == _rec("http://a/1", b"hello")
    assert recs[2] == _rec("http://a/2", "wörld".encode())
