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

__all__ = ["warc_records", "warc_revisit_records",
           "warc_not_modified_records", "cdx_entries",
           "parse_warc_segment"]

_CRLF = "\r\n"


def warc_records(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    order_col: str = "doc_id",
    warc_date: str = "2026-01-01T00:00:00Z",
    num_partitions: int | None = None,
    keep_record: bool = False,
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
    if keep_record:
        # the exact record text (what a segment writer concatenates);
        # off by default — carrying the full text through the offset
        # shuffle doubles the exchanged bytes
        sized = sized.withColumn("record", record)
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
    keep_record: bool = False,
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

    PRECONDITIONS: ``order_col`` values must be UNIQUE (see warc_records
    — duplicate order keys make offsets nondeterministic across runs),
    and ``prior`` must hold AT MOST ONE row per URL (it is a snapshot
    INDEX; a multi-capture index must be reduced to the latest digest
    first — a duplicate URL would fan its trace row out into duplicate
    records and break the unique-order_col offsets).
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


# WARC/1.0 revisit profile URI — the record header says WARC/1.0
# (parse_warc_segment requires it), so the profile version must match:
# strict replay tools reject a 1.1 profile on a 1.0 record
_NM_PROFILE = "http://netpreserve.org/warc/1.0/revisit/server-not-modified"


def warc_not_modified_records(
    df: DataFrame,
    prior: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    status_col: str = "status",
    prior_digest_col: str = "prior_md5",
    order_col: str = "doc_id",
    warc_date: str = "2026-01-01T00:00:00Z",
    num_partitions: int | None = None,
    keep_record: bool = False,
) -> DataFrame:
    """WARC assembly for CONDITIONAL recrawls (WARC/1.1 revisit records
    with the server-not-modified profile): a trace row whose fetch
    answered 304 Not Modified has NO payload to digest — the revisit
    record must reference the PRIOR capture's digest from the archive
    index instead. This is the archive-side closure of the engine's
    spec.conditional_get: digest-identical revisits
    (warc_revisit_records) need the body to prove identity; a 304
    proves it by protocol and transfers nothing.

    `prior` is (url, prior_md5) from the previous snapshot index. Rows
    with status != 304 produce full response records. A 304 row whose
    URL has NO prior digest is a protocol anomaly (the server
    revalidated a capture the archive never stored); it SURFACES as
    ``nm_orphan = true`` and is written as a response record with an
    empty body rather than silently fabricating a reference.

    One equi-join on the url key, pure-JVM record assembly, offsets by
    the same two-stage prefix sum as warc_records.

    Adds: ``record_type`` ('response' | 'revisit'), ``nm_orphan``,
    ``content_length``, ``record_length``, ``record_md5``,
    ``warc_offset``.

    PRECONDITIONS: ``order_col`` values must be UNIQUE (see warc_records
    — duplicate order keys make offsets nondeterministic across runs),
    and ``prior`` must hold AT MOST ONE row per URL (reduce a
    multi-capture index to the latest digest first; a duplicate URL
    fans its trace row into duplicate records at overlapping offsets).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    p = prior.select(
        F.col(url_col),
        F.col(prior_digest_col).alias("_prior_md5"),
    )
    is_304 = F.col(status_col) == F.lit(304)
    joined = (
        df.join(p, url_col, "left")
        .withColumn(
            "record_type",
            F.when(is_304 & F.col("_prior_md5").isNotNull(), "revisit")
            .otherwise("response"),
        )
        .withColumn("nm_orphan", is_304 & F.col("_prior_md5").isNull())
    )

    is_rev = F.col("record_type") == "revisit"
    body = F.when(is_304, F.lit("")).otherwise(
        F.coalesce(F.col(payload_col), F.lit(""))
    )
    content_length = F.octet_length(body).cast("long")
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: "), F.col("record_type"), F.lit(_CRLF),
        F.lit("WARC-Target-URI: "), F.col(url_col), F.lit(_CRLF),
        F.lit("WARC-Date: " + warc_date + _CRLF),
        F.when(
            is_rev,
            F.concat(
                F.lit("WARC-Profile: " + _NM_PROFILE + _CRLF),
                F.lit("WARC-Refers-To-Digest: md5:"), F.col("_prior_md5"),
                F.lit(_CRLF),
            ),
        ).otherwise(
            F.concat(F.lit("WARC-Payload-Digest: md5:"), F.md5(body),
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
    )
    if keep_record:
        # before the _prior_md5 drop: the revisit header embeds it
        sized = sized.withColumn("record", record)
    sized = sized.drop("_prior_md5")
    return _with_global_offsets(sized, order_col, num_partitions)


def _warc_records(data: bytes):
    pos, n, seq = 0, len(data), 0
    while pos < n:
        bad = (None, None, None, None, None, False)
        hdr_end = data.find(b"\r\n\r\n", pos)
        if not data.startswith(b"WARC/1.0\r\n", pos) or hdr_end < 0:
            yield (seq, pos) + bad
            return
        fields = {}
        for line in data[pos + 10:hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            fields[k.strip().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(fields["Content-Length"])
        except (KeyError, ValueError):
            yield (seq, pos) + bad
            return
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n or data[body_end:body_end + 4] != b"\r\n\r\n":
            yield (seq, pos) + bad
            return
        payload = data[body_start:body_end]
        yield (
            seq, pos, fields.get("WARC-Type"),
            fields.get("WARC-Target-URI"), fields.get("WARC-Date"),
            clen, payload, True,
        )
        pos = body_end + 4
        seq += 1


def parse_warc_segment(
    df: DataFrame,
    segment_col: str = "segment",
) -> DataFrame:
    """Read side of the archive: parse concatenated WARC/1.0 records out
    of a segment blob — what a replay/re-extraction job (S12 at archive
    scale) runs over stored crawl segments. Inverse of
    ``warc_records(keep_record=True)`` + per-segment concatenation
    (round-trip pinned by the ``warc_roundtrip`` contract query).

    Per record: ``rec_seq`` (0-based position in the segment),
    ``rec_offset`` (byte offset within the segment), ``warc_type``,
    ``target_uri``, ``warc_date``, ``content_length`` (declared),
    ``payload`` (binary, sliced by Content-Length — BYTE arithmetic,
    multi-byte-safe), ``payload_md5``, and ``record_ok`` (header well
    formed, payload complete, trailing CRLF CRLF present). A malformed
    tail emits one final row with ``record_ok=false`` and parsing of
    that segment stops (archive truncation surfaces, not vanishes).

    Scale shape: one Arrow pass, one output fan-out per segment row —
    segments are writer-bounded (~1 GB); SELECTIVE reads should slice
    by the CDX index's (offset, length) instead of parsing whole
    segments. No shuffle.
    """
    import hashlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    _records = _warc_records  # module-level walk (fuzz-tested)

    in_fields = [f for f in df.schema.fields if f.name != segment_col]
    out_schema = T.StructType(
        in_fields
        + [
            T.StructField("rec_seq", T.IntegerType()),
            T.StructField("rec_offset", T.LongType()),
            T.StructField("warc_type", T.StringType()),
            T.StructField("target_uri", T.StringType()),
            T.StructField("warc_date", T.StringType()),
            T.StructField("content_length", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("payload_md5", T.StringType()),
            T.StructField("record_ok", T.BooleanType()),
        ]
    )
    keep = [f.name for f in in_fields]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                seg = row[segment_col]
                base = tuple(row[c] for c in keep)
                if seg is None:
                    continue
                for rec in _records(bytes(seg)):
                    seq, off, wtype, uri, wdate, clen, payload, ok = rec
                    out_rows.append(
                        base + (
                            seq, off, wtype, uri, wdate, clen, payload,
                            hashlib.md5(payload).hexdigest()
                            if payload is not None else None,
                            ok,
                        )
                    )
            yield pd.DataFrame(
                out_rows,
                columns=keep + [
                    "rec_seq", "rec_offset", "warc_type", "target_uri",
                    "warc_date", "content_length", "payload",
                    "payload_md5", "record_ok",
                ],
            )

    return df.mapInPandas(_parse, out_schema)
