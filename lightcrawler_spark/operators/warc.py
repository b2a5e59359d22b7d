"""WARC (ISO 28500) record assembly with exact global byte offsets.

The reference persists fetched pages as loose per-URL files
(worker/SpiderFrame.class.php:206-241 writes
`/raw_data/YYYYMMDD/md5(url).html`) — fine for one box, hopeless for a
100 TB archive (10^10 tiny files). The web-archive standard is WARC:
records concatenated into large segment files, addressed by
(file, offset, length) exactly as Common Crawl's CDX index does. The
hard part in a distributed writer is the OFFSET column: every record's
byte position depends on the length of every record before it — a
serial running sum.

Scale shape: the offsets use the textbook two-stage distributed prefix
sum (range partition by the order key → per-partition cumulative sum →
broadcast prefix of the P partition totals) — the same decomposition as
operators/chunking.py:pack_sequences; only O(num_partitions) rows ever
centralize. Record text itself is pure JVM string assembly (concat /
octet_length / md5), so the whole pass is codegen'd around one
partitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["warc_records", "warc_revisit_records", "cdx_entries"]

_CRLF = "\r\n"


def warc_records(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    order_col: str = "doc_id",
    warc_date: str = "2026-01-01T00:00:00Z",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assemble one WARC/1.0 response record per row and position it in
    the global archive byte stream (order = ``order_col`` ascending).

    Adds: ``content_length`` (payload bytes), ``record_length`` (full
    record incl. header block and the two trailing CRLFs), ``record_md5``
    (digest of the exact record text — the write-path contract), and
    ``warc_offset`` (byte offset of the record in the concatenated
    archive). ``warc_date`` is a caller-pinned literal: wall clock in
    the record header would break determinism and resume (C12's
    determinism override, generalized).

    PRECONDITION: ``order_col`` values must be UNIQUE — they are the
    total order of the byte stream, and duplicate keys would make the
    tie order (hence every subsequent record's ``warc_offset``)
    nondeterministic across runs, breaking the determinism/resume
    contract (same key-uniqueness rule as
    admission.apply_robots_longest_match). Use a row id or the URL; a
    non-unique natural key needs a secondary component concatenated in.

    The result is independent of the physical partitioning (tests assert
    equality across 1/3/7 input partitions).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    payload = F.col(payload_col)
    content_length = F.octet_length(payload).cast("long")
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit(_CRLF),
        F.lit("WARC-Date: " + warc_date + _CRLF),
        F.lit("WARC-Payload-Digest: md5:"), F.md5(payload), F.lit(_CRLF),
        F.lit("Content-Length: "), content_length.cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    record = F.concat(header, payload, F.lit(_CRLF + _CRLF))

    sized = df.withColumn("content_length", content_length).withColumn(
        "record_length", F.octet_length(record).cast("long")
    ).withColumn("record_md5", F.md5(record))
    return _with_global_offsets(sized, order_col, num_partitions)


def _with_global_offsets(sized: DataFrame, order_col: str,
                         num_partitions: int) -> DataFrame:
    """Position every record in the concatenated archive byte stream:
    the two-stage distributed prefix sum over `record_length` (range
    partition by the order key → per-partition cumsum → broadcast
    prefix of the P partition totals). localCheckpoint pins the
    partition layout across the totals action and the final plan."""
    spark = sized.sparkSession
    ranged = sized.repartitionByRange(
        num_partitions, F.col(order_col)
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)

    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ranged.withColumn("_cum", F.sum("record_length").over(w))

    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum("record_length").alias("_total"))
        .collect()
    )  # num_partitions rows — driver-side prefix of partition totals
    by_pid = {r["_pid"]: r["_total"] or 0 for r in totals}
    prefix, acc = {}, 0
    for pid in sorted(by_pid):
        prefix[pid] = acc
        acc += by_pid[pid]
    offsets = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _offset long"
    )

    return (
        cum.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "warc_offset",
            F.col("_offset") + F.col("_cum") - F.col("record_length"),
        )
        .drop("_pid", "_cum", "_offset")
    )


def cdx_entries(records: DataFrame, url_col: str = "url") -> DataFrame:
    """Derive CDX-style index keys for assembled WARC records: the
    lookup side of the (file, offset, length) addressing -- what lets a
    100 TB archive serve random access by URL (Common Crawl's cdx-*
    files; Internet Archive CDX(J) convention).

    Adds ``surt_key``: the SURT (Sort-friendly URI Reordering
    Transform) of the URL -- host lowercased, leading ``www.`` dropped,
    labels reversed and comma-joined, then ``)/`` + path?query -- so a
    plain lexicographic sort clusters every URL of a host and its
    subdomains contiguously. The transform is row-local JVM regex/array
    ops; the global CDX sort itself is a write-time
    ``repartitionByRange(surt_key)`` + ``sortWithinPartitions`` (range
    partitioning IS the distributed sort; never a single-partition
    orderBy).
    """
    url = F.col(url_col)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
        r"^www\.", "",
    )
    path_q = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        F.when(path_q == "", F.lit("/")).otherwise(path_q),
    )
    return records.withColumn("surt_key", surt)


def warc_revisit_records(
    df: DataFrame,
    prior: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    prior_digest_col: str = "prior_md5",
    order_col: str = "doc_id",
    warc_date: str = "2026-01-01T00:00:00Z",
    num_partitions: int | None = None,
) -> DataFrame:
    """WARC assembly with revisit deduplication (WARC/1.1 'revisit'
    records, the Internet Archive / Common Crawl recrawl mechanism):
    a page whose payload digest equals its PRIOR crawl's digest is
    written as a tiny revisit record -- headers referencing the earlier
    capture via WARC-Refers-To-Digest -- instead of storing the body
    again. On slow-changing corpora this cuts recrawl archive bytes by
    the unchanged fraction (often >80%).

    `prior` is (url, prior_md5) from the previous snapshot (exactly
    what operators/diffing.py:snapshot_diff consumes); pages absent
    from it always produce full response records. Join is one equi-join
    on the url key; record assembly stays pure JVM; offsets ride the
    same two-stage prefix sum as warc_records.

    Adds: `record_type` ('response' | 'revisit'), `content_length`
    (0 for revisits), `record_length`, `record_md5`, `warc_offset`.

    PRECONDITION: ``order_col`` values must be UNIQUE (see warc_records
    — duplicate order keys make offsets nondeterministic across runs).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    payload = F.col(payload_col)
    digest = F.md5(payload)
    p = prior.select(
        F.col(url_col),
        F.col(prior_digest_col).alias("_prior_md5"),
    )
    joined = df.join(p, url_col, "left").withColumn(
        "record_type",
        F.when(digest == F.col("_prior_md5"), "revisit").otherwise("response"),
    )

    is_rev = F.col("record_type") == "revisit"
    body = F.when(is_rev, F.lit("")).otherwise(payload)
    content_length = F.octet_length(body).cast("long")
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: "), F.col("record_type"), F.lit(_CRLF),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit(_CRLF),
        F.lit("WARC-Date: " + warc_date + _CRLF),
        F.when(
            is_rev,
            F.concat(F.lit("WARC-Refers-To-Digest: md5:"), digest,
                     F.lit(_CRLF)),
        ).otherwise(
            F.concat(F.lit("WARC-Payload-Digest: md5:"), digest,
                     F.lit(_CRLF)),
        ),
        F.lit("Content-Length: "), content_length.cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    record = F.concat(header, body, F.lit(_CRLF + _CRLF))
    sized = (
        joined.withColumn("content_length", content_length)
        .withColumn("record_length", F.octet_length(record).cast("long"))
        .withColumn("record_md5", F.md5(record))
        .drop("_prior_md5")
    )
    return _with_global_offsets(sized, order_col, num_partitions)
