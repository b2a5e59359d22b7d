"""S10 index sink + E20 doc-text extraction (operators/indexing.py) and
the C12 ms-epoch expression."""

from pyspark.sql import functions as F


def test_extract_doc_text_routing(spark):
    from lightcrawler_spark.operators.indexing import extract_doc_text

    rows = [
        ("a", bytearray(b"LCTX\xe6\xb3\x95\xe5\xbe\x8b text")),  # 法律 text
        ("b", bytearray(b"%PDF-1.7 binarybinary")),
        ("c", bytearray(b"PK\x03\x04zipzip")),
        ("d", bytearray(b"\xd0\xcf\x11\xe0olecf")),
        ("e", bytearray("plain 文本".encode("utf-8"))),
        ("f", None),
    ]
    df = spark.createDataFrame(rows, "id string, payload binary")
    # external_converters=False: the deterministic stub path regardless
    # of what binaries the host happens to have
    got = {r["id"]: (r["doc_text"], r["extractor"])
           for r in extract_doc_text(df, external_converters=False).collect()}
    assert got["a"] == ("法律 text", "lctx")
    assert got["b"] == (None, "pdftotext-stub")
    assert got["c"] == (None, "docx-stub")
    assert got["d"] == (None, "antiword-stub")
    assert got["e"] == ("plain 文本", "plain")
    assert got["f"] == (None, None)


def test_extract_doc_text_external_converters(spark, tmp_path, monkeypatch):
    """E20 feature flag: with converter binaries on PATH the SAME plan
    runs real subprocess extraction (proven here with shim executables —
    deployments with the real pdftotext/antiword get this path with zero
    code change). Auto-detection happens at plan-build time."""
    import os
    import stat

    from lightcrawler_spark.operators.indexing import extract_doc_text

    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, text in (("pdftotext", "PDF SHIM TEXT"), ("antiword", "DOC SHIM TEXT")):
        shim = bindir / name
        shim.write_text(f'#!/bin/sh\necho "{text}"\n')
        shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    rows = [
        ("pdf", bytearray(b"%PDF-1.7 binary")),
        ("doc", bytearray(b"\xd0\xcf\x11\xe0olecf")),
        ("txt", bytearray(b"plain")),
    ]
    df = spark.createDataFrame(rows, "id string, payload binary")
    got = {r["id"]: (r["doc_text"], r["extractor"])
           for r in extract_doc_text(df, external_converters=True).collect()}
    assert got["pdf"] == ("PDF SHIM TEXT\n", "pdftotext")
    assert got["doc"] == ("DOC SHIM TEXT\n", "antiword")
    assert got["txt"] == ("plain", "plain")

    # missing binaries + explicit True must fail fast at plan build
    monkeypatch.setenv("PATH", str(tmp_path / "empty"))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="not on PATH"):
        extract_doc_text(df, external_converters=True)


def test_build_search_docs(spark):
    from lightcrawler_spark.operators.indexing import build_search_docs

    df = spark.createDataFrame(
        [(1, "T" * 600, "hello  world\nfoo", "tag," * 100)],
        "doc_id long, title string, content string, tags string",
    )
    r = build_search_docs(df).collect()[0]
    assert len(r["title"]) == 512          # clamp (sql/db.sql widths)
    assert r["tokens"] == ["hello", "world", "foo"]
    assert r["n_tokens"] == 3
    assert len(r["tags"]) == 256


def test_micro_time_ms_fixed(spark):
    from lightcrawler_spark.plans.metrics import micro_time_ms

    df = spark.range(1).select(
        micro_time_ms(fixed_ms=1234567890123).alias("t"),
        micro_time_ms().alias("live"),
    )
    r = df.collect()[0]
    assert r["t"] == 1234567890123
    assert r["live"] > 1_500_000_000_000   # a plausible live ms epoch
