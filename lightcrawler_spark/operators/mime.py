"""Content-type sniffing from leading magic bytes.

The reference trusts the server's `Content-Type` response header for
both the receive decision (PHPCrawlerHTTPRequest.class.php:1150-1174)
and link-search gating (:1294-1302) — a mislabeled server breaks it. A
web-scale corpus pipeline cannot: Common-Crawl-class fetches routinely
disagree with their headers, and the downstream routing (image decode
vs text extract vs attachment coding, operators/images.py /
content.py / products.py) must dispatch on what the bytes ARE. This is
the standard magic-number sniff (the file(1)/WHATWG approach) over the
first 16 bytes.

Scale shape: ONE byte-slice + hex of the 16-byte prefix, then a
codegen'd CASE chain of prefix/regex tests on the hex string — row
local, no shuffle, no Python, and the body column itself is never
materialized wider than its first 16 bytes (the slice prunes at the
scan when the source supports it). Working over hex keeps every rule
expressible identically in Spark (Java regex) and the DuckDB oracle
(RE2): no backreferences, no lookahead, no binary-literal dialect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["MAGIC_RULES", "sniff_mime_from_hex", "sniff_mime"]

# (hex-prefix, mime). Order matters: first match wins (e.g. RIFF must
# outrank the generic printable-text fallback).
MAGIC_RULES: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("25504446", "application/pdf"),
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
    ("0000000C6A502020", "image/jp2"),
    ("424D", "image/bmp"),
]

# After optional ASCII whitespace (space/tab/LF/CR), a '<' opens markup.
_HTML_HEX_PAT = r"^(20|09|0A|0D)*3C"
# Every byte is HT/LF/FF/CR or printable-ish ASCII 0x10..0x7F (excludes
# NUL and high bytes) -> treat as plain text.
_TEXT_HEX_PAT = r"^(0[9ACD]|[1-7][0-9A-F])+$"


def sniff_mime_from_hex(hx: Column) -> Column:
    """The rule battery over an UPPERCASE hex string of the prefix."""
    out = None
    for prefix, mime in MAGIC_RULES:
        cond = hx.startswith(prefix)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    # RIFF container: bytes 1-4 'RIFF', bytes 9-12 name the payload.
    out = out.when(
        (F.substring(hx, 1, 8) == "52494646")
        & (F.substring(hx, 17, 8) == "57415645"),
        "audio/x-wav",
    ).when(
        (F.substring(hx, 1, 8) == "52494646")
        & (F.substring(hx, 17, 8) == "41564920"),
        "video/x-msvideo",
    )
    return (
        out.when(hx.rlike(_HTML_HEX_PAT), "text/html")
        .when(hx.rlike(_TEXT_HEX_PAT), "text/plain")
        .otherwise("application/octet-stream")
    )


def sniff_mime(df: DataFrame, bytes_col: str = "bytes",
               out_col: str = "mime", prefix_bytes: int = 16) -> DataFrame:
    """Add ``out_col`` = sniffed MIME of the binary column's content."""
    hx = F.hex(F.substring(F.col(bytes_col), 1, prefix_bytes))
    return df.withColumn(out_col, sniff_mime_from_hex(hx))
