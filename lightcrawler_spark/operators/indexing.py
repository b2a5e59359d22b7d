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

__all__ = ["extract_doc_text", "build_search_docs", "aggregate_anchor_text"]

FAKE_DOC_MAGIC = b"LCTX"   # deterministic test container: magic + utf-8

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("extractor", T.StringType()),
    ]
)


def _run_converter(binary: str, args_tail: list[str], payload: bytes,
                   suffix: str) -> str | None:
    """Feed `payload` to an external converter via a temp file (both
    pdftotext and antiword want a file path) and return its stdout."""
    import os
    import subprocess
    import tempfile

    fd, path = tempfile.mkstemp(suffix=suffix)
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        out = subprocess.run(
            [binary, path] + args_tail,
            capture_output=True, timeout=30, check=True,
        )
        return out.stdout.decode("utf-8", errors="replace")
    finally:
        os.unlink(path)


def extract_doc_text(df: DataFrame, bytes_col: str = "payload",
                     external_converters: bool | None = None) -> DataFrame:
    """E20: route each binary payload to its converter by magic bytes
    (IndexManager.class.php:91-124 routes by attachment type):

    - ``%PDF``   → ``pdftotext <file> -`` (IndexManager:105-112)
    - ``\\xd0\\xcf`` (OLE .doc) → ``antiword <file>`` (IndexManager:96-103)
    - ``PK\\x03\\x04`` (docx zip) → stub (the reference used a PHP library
      here, not a binary; no standard CLI equivalent to shell out to)
    - ``LCTX``   → deterministic fake container, fully decoded (the
      plumbing-proof path)
    - else       → passthrough UTF-8 attempt (txt/html payloads)

    ``external_converters``: None (default) auto-detects the binaries on
    PATH at plan-build time — deployments with pdftotext/antiword
    installed get real extraction with zero code change; this sandbox
    lacks them, so the branches degrade to honest stubs (extractor name
    recorded, text NULL). False forces the stub path (deterministic CI /
    the DuckDB-oracle contract query); True asserts availability. A
    converter failure at runtime records ``<name>-error`` rather than
    poisoning the batch.
    """
    import shutil as _sh

    # Resolve ABSOLUTE binary paths at plan-build time and embed them in
    # the closure: executor workers inherit the JVM's environment, not
    # the driver's current PATH, so a which() inside the UDF would see a
    # different world than the caller.
    if external_converters is False:
        pdf_bin = doc_bin = None
    else:
        pdf_bin = _sh.which("pdftotext")
        doc_bin = _sh.which("antiword")
        if external_converters and not (pdf_bin and doc_bin):
            raise RuntimeError(
                "external_converters=True but pdftotext/antiword not on PATH"
            )

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("doc_text", T.StringType()),
            T.StructField("extractor", T.StringType()),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        def convert(binary, args_tail, b, suffix):
            name = os.path.basename(binary)
            try:
                return _run_converter(binary, args_tail, b, suffix), name
            except Exception:
                return None, f"{name}-error"

        def one(b):
            if b is None:
                return None, None
            b = bytes(b)
            if b.startswith(FAKE_DOC_MAGIC):
                return b[4:].decode("utf-8", errors="replace"), "lctx"
            if b.startswith(b"%PDF"):
                if pdf_bin:
                    return convert(pdf_bin, ["-"], b, ".pdf")
                return None, "pdftotext-stub"   # binary absent
            if b.startswith(b"\xd0\xcf"):
                if doc_bin:
                    return convert(doc_bin, [], b, ".doc")
                return None, "antiword-stub"    # binary absent
            if b.startswith(b"PK\x03\x04"):
                return None, "docx-stub"        # PHP-library path in ref
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


def aggregate_anchor_text(links: DataFrame, target_col: str = "target_url",
                          text_col: str = "linktext",
                          top_n: int = 3) -> DataFrame:
    """Anchor-text aggregation per link TARGET — the classic web-index
    signal (anchor words describe the page they point AT better than the
    page itself; Brin & Page 1998 §2.2). The reference carries linktext
    per link row (PHPCrawlerURLDescriptor.class.php:14-50) and filters on
    it (F6/F7) but never aggregates it; an index/caption pipeline at
    corpus scale wants the per-target rollup.

    Scale shape: one groupBy(target, text) — map-side combine collapses
    repeated anchors before the shuffle — then a row_number window and
    final groupBy both partitioned by target (same key: single shuffle
    boundary, no unpartitioned window). The top-N anchor variants are
    serialized deterministically (count DESC, text ASC) into a '|'
    string so the result hashes stably.

    Output: ``(target_url, n_inlinks, n_variants, top_anchors)``.
    """
    from pyspark.sql import Window

    counts = links.groupBy(
        F.col(target_col).alias("target_url"),
        F.col(text_col).alias("anchor"),
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("target_url").orderBy(
        F.col("cnt").desc(), F.col("anchor").asc()
    )
    ranked = counts.withColumn("r", F.row_number().over(w))
    top = F.sort_array(
        F.collect_list(
            F.when(
                F.col("r") <= top_n,
                F.struct(
                    (F.lit(0) - F.col("cnt")).alias("neg_cnt"),
                    F.col("anchor").alias("t"),
                ),
            )
        )
    )
    return ranked.groupBy("target_url").agg(
        F.sum("cnt").alias("n_inlinks"),
        F.count("*").alias("n_variants"),
        F.concat_ws("|", F.transform(top, lambda s: s["t"])).alias(
            "top_anchors"
        ),
    )
