"""Frontier dedup (SURVEY.md §2.5 P1) + sharded Bloom seen-filter.

Reference semantics: ``INSERT OR IGNORE`` on ``distinct_hash =
md5(url_rebuild) UNIQUE`` — first inserter wins, re-inserts are silently
dropped (/root/reference/vendor/PHPCrawl_083/libs/UrlCache/
PHPCrawlerSQLiteURLCache.class.php:112,252-294; MySQL variant also
anti-checks the harvested-products table,
PHPCrawlerMySqlUrlCache.class.php:208-253).

Spark rebuild:
1. within-batch first-wins: window ``row_number() == 1`` over url_md5
   ordered by insert_seq (keeps the first link's metadata, like the
   UNIQUE index keeps the first row).
2. cross-round: ``left_anti`` join against the seen set — exact, and the
   correctness anchor.
3. scale pre-filter: a SHARDED Bloom filter over xxhash64(url). The seen
   set at 10^10 URLs is ~2.4 TB of md5s; the bloom shards total ~12 GB
   at 1% FPR (~9.6 bits/key) and are built *distributedly* (one shard
   per hash bucket via applyInPandas, each shard sized for its bucket).
   Probing uses a shard-aligned COGROUP, so each task receives its
   bucket's links plus that ONE bitmap — no node ever holds all shards,
   and no bitmap is ever duplicated per row. ~99% of already-seen URLs
   never reach the anti-join shuffle. False positives are harmless: the
   exact anti-join only sees fewer rows; false negatives cannot occur.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "first_wins_within_batch",
    "anti_join_seen",
    "dedup_new_links",
    "NumpyBloom",
    "build_bloom_shards",
    "bloom_prefilter",
]


def first_wins_within_batch(new_links: DataFrame,
                            key_col: str = "url_md5",
                            order_col: str = "insert_seq") -> DataFrame:
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return (
        new_links.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def anti_join_seen(new_links: DataFrame, seen: DataFrame,
                   key_col: str = "url_md5") -> DataFrame:
    return new_links.join(
        seen.select(key_col).distinct(), on=key_col, how="left_anti"
    )


def dedup_new_links(new_links: DataFrame, seen: DataFrame,
                    key_col: str = "url_md5",
                    order_col: str = "insert_seq") -> DataFrame:
    """P1 composed: batch-local first-wins, then exact anti-join."""
    return anti_join_seen(
        first_wins_within_batch(new_links, key_col, order_col), seen, key_col
    )


# --- sharded Bloom filter -------------------------------------------------

_MIX = np.uint64(0x9E3779B97F4A7C15)


class NumpyBloom:
    """Vectorized Bloom filter over uint64 keys (double hashing:
    idx_i = (h + i * mix(h)) mod m). Pure numpy — Arrow batches test
    membership without per-row Python."""

    def __init__(self, num_bits: int, num_hashes: int, bits: np.ndarray | None = None):
        self.m = int(num_bits)
        self.k = int(num_hashes)
        nbytes = (self.m + 7) // 8
        self.bits = bits if bits is not None else np.zeros(nbytes, dtype=np.uint8)

    @staticmethod
    def size_for(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
        n = max(1, n_items)
        m = int(np.ceil(-n * np.log(fpp) / (np.log(2) ** 2)))
        k = max(1, int(round(m / n * np.log(2))))
        return m, k

    def _indexes(self, keys: np.ndarray) -> np.ndarray:
        # splitmix64-finalize before indexing: callers bucket keys by
        # `key mod num_shards`, so raw keys within one filter are
        # congruent — without remixing, `mod m` indexing inherits that
        # structure and the realized FPR blows past the budget.
        h = keys.astype(np.uint64)
        h1 = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h1 = (h1 ^ (h1 >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 ^= h1 >> np.uint64(31)
        h2 = ((h1 ^ (h1 >> np.uint64(33))) * _MIX) | np.uint64(1)  # odd stride
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        idx = self._indexes(np.asarray(keys))
        np.bitwise_or.at(self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        idx = self._indexes(np.asarray(keys))
        hit = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, num_bits: int, num_hashes: int) -> "NumpyBloom":
        return cls(num_bits, num_hashes, np.frombuffer(data, dtype=np.uint8).copy())


def build_bloom_shards(seen: DataFrame, num_shards: int = 32,
                       fpp: float = 0.01, url_col: str = "url") -> DataFrame:
    """Distributed build: bucket seen URLs by pmod(xxhash64, S), build one
    Bloom per bucket with applyInPandas. Returns
    (shard int, num_bits long, num_hashes int, bitmap binary).

    Each shard is sized for ITS row count, so skewed seen-sets don't
    overallocate. At 10^10 rows / 1024 shards each shard holds ~10^7 keys
    → ~12 MB bitmap: comfortably broadcastable in aggregate or joinable
    by shard key."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        keys = pdf["h"].to_numpy().astype(np.uint64)
        m, k = NumpyBloom.size_for(len(keys), fpp)
        bloom = NumpyBloom(m, k)
        bloom.add(keys)
        return pd.DataFrame(
            {"shard": [shard], "num_bits": [m], "num_hashes": [k],
             "bitmap": [bloom.to_bytes()]}
        )

    hashed = seen.select(
        F.xxhash64(F.col(url_col)).alias("h"),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_shards)).alias("shard"),
    )
    return hashed.groupBy("shard").applyInPandas(
        _build, "shard int, num_bits long, num_hashes int, bitmap binary"
    )


def bloom_prefilter(new_links: DataFrame, shards: DataFrame,
                    num_shards: int = 32, url_col: str = "url") -> DataFrame:
    """Drop new links that are PROBABLY seen.

    Shard-aligned cogroup: links are bucketed by the SAME
    ``pmod(xxhash64(url), num_shards)`` used at build time, then each
    (links-bucket, bitmap) pair meets in one Arrow task. The bitmap
    crosses the wire once per bucket — never once per row — so probe
    cost is O(links + shard_bytes), independent of fan-out. A bucket
    with no shard row (empty at build time) passes everything through:
    nothing in that bucket was ever seen. Survivors still pass the
    exact anti-join; this only thins that shuffle.

    ``num_shards`` must equal the build-time modulus (empty buckets
    produce no shard row, so counting the shard table under-reports it).
    """
    out_fields = new_links.schema.fieldNames()
    out_schema = new_links.schema

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return left[out_fields]
        bloom = NumpyBloom.from_bytes(
            bytes(right["bitmap"].iloc[0]),
            int(right["num_bits"].iloc[0]),
            int(right["num_hashes"].iloc[0]),
        )
        mask = bloom.might_contain(left["_h"].to_numpy().astype(np.uint64))
        return left.loc[~mask, out_fields]

    linked = new_links.withColumn("_h", F.xxhash64(F.col(url_col))).withColumn(
        "_shard",
        F.pmod(F.col("_h"), F.lit(max(1, num_shards))).cast("int"),
    )
    keyed_shards = shards.select(
        F.col("shard").cast("int").alias("_shard"),
        "num_bits", "num_hashes", "bitmap",
    )
    return (
        linked.groupBy("_shard")
        .cogroup(keyed_shards.groupBy("_shard"))
        .applyInPandas(_probe, out_schema)
    )
