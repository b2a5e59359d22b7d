"""Crawl results → the image+caption product table (BASELINE.json
north_rule / input_hint: `image_id, bytes, w, h, fmt, caption, phash`).

This is the graft's product-assembly stage — the analog of the
reference's detail-page extraction feeding the law_content table
(worker/ExtractContent.class.php:741-788 harvests image URLs; the
`keep_img` text walk emits `[tag:img:src]` markers INLINE so captions
stay adjacent to their image, :264-346): from the engine's fetched
pages table,

  html pages ──html_to_text (keep_img)──► [tag:img] markers
            ──caption = first non-empty line after the marker
            ──resolve src against the page URL──► (img_url, caption)
  image pages (content-type image/*) ──► (url, bytes)
  join on img_url ──decode dims/fmt/phash (Arrow batch)──► product rows

One row per distinct image (first caption in insertion order wins,
mirroring the reference's first-wins product insert S9). Per-row
invariants (decoded-pixel PSNR / exact caption equality) are asserted by
tests/test_image_caption_assembly.py against the fixture web.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..operators.content import html_to_text_udf

__all__ = ["image_captions", "image_captions_udf", "build_image_caption_table"]

_IMG_MARKER_RE = re.compile(r"\[tag:img:([^\]]+)\]")


def image_captions(text: str) -> list[dict]:
    """Each [tag:img:src] marker → caption = the first non-empty line
    (markers stripped) following the marker in the extracted text.
    Markers may share a line with inline text (_ToText appends them in
    flow), so the scan is position-based, not line-anchored."""
    if not text:
        return []
    out = []
    for m in _IMG_MARKER_RE.finditer(text):
        caption = ""
        for ln in text[m.end():].split("\n"):
            s = _IMG_MARKER_RE.sub("", ln).strip()
            if s:
                caption = s
                break
        out.append({"src": m.group(1), "caption": caption})
    return out


_CAPTION_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("caption", T.StringType()),
        ]
    )
)


@pandas_udf(_CAPTION_STRUCT)
def image_captions_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([image_captions(t if isinstance(t, str) else "")
                      for t in texts])


def build_image_caption_table(pages: DataFrame,
                              url_col: str = "url",
                              body_col: str = "body",
                              text_col: str = "body_text") -> DataFrame:
    """Engine `pages` rows → input_hint product table."""
    from ..functions.spark_udfs import resolve_link_udf

    html = pages.filter(
        F.col("content_type").rlike("(?i)text/html")
        & F.col(text_col).isNotNull()
    )
    caps = (
        html.select(
            F.col(url_col).alias("page_url"),
            F.col("seq").alias("page_seq"),
            F.explode(
                image_captions_udf(html_to_text_udf(F.col(text_col))["text"])
            ).alias("ic"),
        )
        .select(
            "page_url", "page_seq",
            resolve_link_udf(F.col("ic.src"), F.col("page_url")).alias("img_url"),
            F.col("ic.caption").alias("caption"),
        )
        .filter(F.col("img_url").isNotNull())
    )
    imgs = pages.filter(F.col("content_type").rlike("(?i)^image/")).select(
        F.col(url_col).alias("img_url"), F.col(body_col).alias("bytes")
    )
    joined = caps.join(imgs, "img_url")
    # S9 first-wins: one product row per image, earliest referring page
    w = Window.partitionBy("img_url").orderBy(F.col("page_seq").asc())
    joined = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "page_seq", "page_url")
    )

    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("caption", T.StringType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from ..imagecodec import _FAKE_SIG, _PNG_SIG, decode_image, phash64

        def sniff_fmt(b: bytes) -> str:
            if b[:8] == _PNG_SIG:
                return "png"
            if b[:4] == _FAKE_SIG:
                return "jpeg"  # the sandbox's lossy stand-in container
            return "bin"

        for pdf in batches:
            rows = {k: [] for k in
                    ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
            for r in pdf.itertuples():
                b = bytes(r.bytes) if r.bytes is not None else None
                try:
                    arr = decode_image(b)
                except Exception:
                    continue  # undecodable payload → not a product row
                stem = r.img_url.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                rows["image_id"].append(
                    stem or hashlib.md5(r.img_url.encode()).hexdigest()
                )
                rows["bytes"].append(b)
                rows["w"].append(int(arr.shape[1]))
                rows["h"].append(int(arr.shape[0]))
                rows["fmt"].append(sniff_fmt(b))
                rows["caption"].append(r.caption)
                rows["phash"].append(phash64(arr))  # already signed int64
            yield pd.DataFrame(rows)

    return joined.mapInPandas(_decode, out_schema)
