"""Content-defined chunking (gear-hash CDC) for byte-stream dedup.

Fixed-size chunking breaks the moment one byte is inserted: every later
chunk boundary shifts and nothing dedups. Content-DEFINED chunking cuts
where a rolling hash of the last W bytes hits a mask — boundaries are a
function of local CONTENT, so an insertion only disturbs the chunks it
touches and everything downstream realigns (the shift-resistance
property; FastCDC, Xia et al., USENIX ATC'16). At 100 TB this is the
storage-side dedup primitive for raw page bodies and attachments:
near-identical blobs (template pages, re-fetched documents with one
edited paragraph) share all but O(1) chunks, and chunk-level exact
dedup is then the same hash-groupBy shape as P1.

The gear table derives from md5 (public, deterministic, reproducible
anywhere — no RNG). Chunking runs inside mapInPandas over Arrow
batches (row-local; no shuffle); the corpus-level chunk dedup that
follows is one hash-groupBy on chunk_md5.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["gear_table", "cdc_chunks", "chunk_blobs"]

_MASK64 = (1 << 64) - 1


def gear_table() -> list[int]:
    """256 deterministic 64-bit gear values: first 8 md5 bytes of the
    byte's index (shared with any re-implementation, incl. tests)."""
    return [
        int.from_bytes(hashlib.md5(bytes([i])).digest()[:8], "big")
        for i in range(256)
    ]


_GEAR = gear_table()


def cdc_chunks(
    data: bytes,
    min_size: int = 64,
    avg_bits: int = 6,
    max_size: int = 1024,
) -> list[tuple[int, int, str]]:
    """Gear-hash boundaries over one blob → [(offset, length, md5hex)].

    h = (h << 1 + gear[byte]) mod 2^64; a boundary closes the chunk when
    `h & mask == 0` once the chunk has min_size bytes; max_size forces a
    cut (pathological data can't produce unbounded chunks). The hash
    restarts at every boundary so chunk identity depends only on chunk
    content — the dedup invariant.
    """
    mask = (1 << avg_bits) - 1
    out: list[tuple[int, int, str]] = []
    start = 0
    h = 0
    n = len(data)
    for i in range(n):
        h = ((h << 1) + _GEAR[data[i]]) & _MASK64
        size = i - start + 1
        if (size >= min_size and (h & mask) == 0) or size >= max_size:
            out.append(
                (start, size, hashlib.md5(data[start:i + 1]).hexdigest())
            )
            start = i + 1
            h = 0
    if start < n:
        out.append((start, n - start,
                    hashlib.md5(data[start:]).hexdigest()))
    return out


_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)


def chunk_blobs(
    df: DataFrame,
    id_col: str = "blob_id",
    bytes_col: str = "bytes",
    min_size: int = 64,
    avg_bits: int = 6,
    max_size: int = 1024,
) -> DataFrame:
    """CDC over a binary column: one row per chunk. Arrow-batched
    mapInPandas (row-local, no shuffle); downstream dedup = groupBy
    chunk_md5 (map-side combine collapses hot template chunks)."""

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, digs = [], [], [], [], []
            for bid, blob in zip(pdf[id_col], pdf[bytes_col]):
                for j, (off, ln, dig) in enumerate(
                    cdc_chunks(bytes(blob), min_size, avg_bits, max_size)
                ):
                    ids.append(int(bid))
                    idxs.append(j)
                    offs.append(off)
                    lens.append(ln)
                    digs.append(dig)
            yield pd.DataFrame(
                {"blob_id": ids, "chunk_idx": idxs, "offset": offs,
                 "length": lens, "chunk_md5": digs}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), bytes_col
    ).mapInPandas(_chunk, _CHUNK_SCHEMA)
