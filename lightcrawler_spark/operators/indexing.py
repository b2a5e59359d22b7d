"""Full-text index sink + binary-document text extraction
(SURVEY.md §2.1 S10, §2.4 E20).

Reference: `worker/IndexManager.class.php:41-132` consumes a redis queue
of product rows, converts doc/pdf attachments to text via the external
`antiword` / `pdftotext` binaries (:91-124), and adds an XSDocument
(doc_id, title, content, tags …) to a xunsearch full-text index.

Spark rebuild:

- E20 `extract_doc_text` — mapInPandas over binary attachment payloads.
  The REAL converters are external binaries that do not exist in this
  container, so the pdf/word branches are honest stubs (extractor name
  recorded, text NULL) exactly like the video-codec stub in
  operators/images.py; the deterministic `LCTX` fake container (4-byte
  magic + UTF-8 text) exercises the full Spark plumbing — schema,
  batching, routing by magic bytes — end to end. A deployment swaps the
  stub branches for subprocess/pypdf calls; nothing downstream changes.
- S10 `build_search_docs` — the XSDocument projection as a DataFrame:
  clamped title/content, whitespace token array for the index, appended
  to a `search_docs` table (the xunsearch equivalent in table form, as
  scoped by SURVEY §2.1).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["extract_doc_text", "build_search_docs"]

FAKE_DOC_MAGIC = b"LCTX"   # deterministic test container: magic + utf-8

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("extractor", T.StringType()),
    ]
)


def extract_doc_text(df: DataFrame, bytes_col: str = "payload") -> DataFrame:
    """E20: route each binary payload to its converter by magic bytes
    (IndexManager.class.php:91-124 routes by attachment type):

    - ``%PDF``   → pdftotext   (STUB: binary absent in sandbox → NULL)
    - ``PK\\x03\\x04`` (docx zip) / ``\\xd0\\xcf`` (OLE .doc) → antiword/
      docx converter (STUB, same contract)
    - ``LCTX``   → deterministic fake container, fully decoded (the
      plumbing-proof path)
    - else       → passthrough UTF-8 attempt (txt/html payloads)
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("doc_text", T.StringType()),
            T.StructField("extractor", T.StringType()),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b):
            if b is None:
                return None, None
            b = bytes(b)
            if b.startswith(FAKE_DOC_MAGIC):
                return b[4:].decode("utf-8", errors="replace"), "lctx"
            if b.startswith(b"%PDF"):
                return None, "pdftotext-stub"   # no pdftotext in sandbox
            if b.startswith(b"PK\x03\x04") or b.startswith(b"\xd0\xcf"):
                return None, "antiword-stub"    # no antiword in sandbox
            return b.decode("utf-8", errors="replace"), "plain"

        for pdf in batches:
            texts, extractors = zip(*(one(b) for b in pdf[bytes_col])) \
                if len(pdf) else ((), ())
            pdf = pdf.copy()
            pdf["doc_text"] = list(texts)
            pdf["extractor"] = list(extractors)
            yield pdf

    return df.mapInPandas(_extract, out_schema)


def build_search_docs(products: DataFrame, id_col: str = "doc_id",
                      title_col: str = "title",
                      content_col: str = "content",
                      tags_col: str | None = "tags") -> DataFrame:
    """S10: the XSDocument projection — clamped fields + whitespace token
    array (the index terms), ready to append to the `search_docs` table.
    Pure JVM expressions; the DuckDB oracle reproduces it exactly."""
    cols = [
        F.col(id_col).alias("doc_id"),
        F.substring(F.col(title_col), 1, 512).alias("title"),
        F.substring(F.col(content_col), 1, 65535).alias("content"),
        F.filter(
            F.split(F.col(content_col), r"\s+"), lambda x: x != ""
        ).alias("tokens"),
    ]
    if tags_col and tags_col in products.columns:
        cols.append(F.substring(F.col(tags_col), 1, 256).alias("tags"))
    out = products.select(*cols)
    return out.withColumn("n_tokens", F.size("tokens").cast("long"))
