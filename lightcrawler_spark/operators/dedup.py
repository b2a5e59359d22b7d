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
    "NumpyCuckoo",
    "build_cuckoo_shards",
    "cuckoo_prefilter",
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
    by shard key.

    Sizing table (bits/key = -ln(fpp)/ln²2 ≈ 1.44·log2(1/fpp); bitmap
    bytes are per the whole seen set, split evenly across shards; the
    tools/dedup_soak.py run at 10^8 keys validates the math and the
    realized FPR against the budget):

      keys   fpp    bits/key  total bitmap  per shard (1024/4096 shards)
      10^8   1e-2    9.6        115 MB        112 KB  /  28 KB
      10^8   1e-4   19.2        230 MB        224 KB  /  56 KB
      10^9   1e-2    9.6        1.2 GB        1.2 MB  /  0.3 MB
      10^10  1e-2    9.6        12 GB          12 MB  /  3 MB
      10^10  1e-4   19.2        24 GB          23 MB  /  6 MB
      10^10  1e-6   28.8        36 GB          35 MB  /  9 MB

    Per-shard build is a single numpy pass over ~keys/shards uint64s
    (10^7 keys/shard at the 10^10/1024 point — seconds per shard, all
    shards in parallel); probe cost is O(links + shard_bytes) per
    bucket, so at 10^10 the whole structure stays executor-resident and
    NOTHING is broadcast. The engine's LSM mode (CrawlSpec
    seen_filter="bloom") appends per-round DELTA shard sets instead of
    rebuilding: probe ORs all deltas of a bucket, so after R rounds the
    cumulative FPR is ≈ R × fpp — budget fpp accordingly (the engine
    default 1e-6 keeps a 1000-round crawl under 1e-3)."""

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
        # OR across every bitmap row of the bucket: a shard table may
        # hold one bitmap per BUILD (the engine's LSM seen-set appends
        # one delta bloom per crawl round) — a key is "probably seen"
        # if ANY delta contains it. Single-build tables hit the loop
        # once, so the classic one-bitmap-per-shard case is unchanged.
        keys = left["_h"].to_numpy().astype(np.uint64)
        mask = np.zeros(len(left), dtype=bool)
        for _, row in right.iterrows():
            bloom = NumpyBloom.from_bytes(
                bytes(row["bitmap"]),
                int(row["num_bits"]),
                int(row["num_hashes"]),
            )
            mask |= bloom.might_contain(keys)
            if mask.all():
                break
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


# --- cuckoo filter (deletable seen-set variant) ---------------------------

_FP_MUL = np.uint64(0x5BD1E995)


class NumpyCuckoo:
    """Partial-key cuckoo filter over uint64 keys: m (power-of-2) buckets
    x 4 slots of 16-bit fingerprints (0 = empty). Vs the Bloom shards it
    supports DELETE — needed when P7 re-queues processed URLs for
    recrawl (the reference flips processed back to 0:
    /root/reference/worker/DaoUrlCache.class.php:122-137) so the seen
    filter must un-see them; a Bloom cannot.

    Membership tests are fully numpy-vectorized (two gathers + compare);
    inserts loop per key with bounded eviction kicks (build-time only,
    ~31k keys/shard at 10^10/2^15 shards)."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, num_buckets: int, table: np.ndarray | None = None):
        assert num_buckets & (num_buckets - 1) == 0, "power of 2"
        self.m = int(num_buckets)
        self.table = (table if table is not None
                      else np.zeros((self.m, self.SLOTS), dtype=np.uint16))

    @staticmethod
    def size_for(n_items: int, load: float = 0.84) -> int:
        need = max(1, int(np.ceil(n_items / (4 * load))))
        return 1 << int(np.ceil(np.log2(need)))

    def _fp_i1_i2(self, keys: np.ndarray):
        h = keys.astype(np.uint64)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        fp = ((h >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        mask = np.uint64(self.m - 1)
        i1 = (h & mask).astype(np.int64)
        i2 = (i1 ^ ((fp.astype(np.uint64) * _FP_MUL) & mask).astype(np.int64))
        return fp, i1, i2

    def insert(self, keys: np.ndarray) -> int:
        """Insert all keys; returns how many were inserted (raises on a
        full filter). Idempotent-ish: duplicates occupy extra slots, so
        callers dedup keys first (the frontier pipeline already does)."""
        fp, i1, i2 = self._fp_i1_i2(np.asarray(keys))
        rng = np.random.default_rng(0x5EED)  # deterministic evictions
        n = 0
        for f, a, b in zip(fp, i1, i2):
            f = np.uint16(f)
            placed = False
            for idx in (a, b):
                row = self.table[idx]
                empty = np.where(row == 0)[0]
                if len(empty):
                    row[empty[0]] = f
                    placed = True
                    break
            if not placed:
                idx = a if rng.integers(2) else b
                cur = f
                for _ in range(self.MAX_KICKS):
                    slot = int(rng.integers(self.SLOTS))
                    cur, self.table[idx][slot] = self.table[idx][slot], cur
                    idx = int(
                        np.int64(idx)
                        ^ np.int64((np.uint64(cur) * _FP_MUL)
                                   & np.uint64(self.m - 1))
                    )
                    row = self.table[idx]
                    empty = np.where(row == 0)[0]
                    if len(empty):
                        row[empty[0]] = cur
                        placed = True
                        break
                if not placed:
                    raise RuntimeError("cuckoo filter full — grow num_buckets")
            n += 1
        return n

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        fp, i1, i2 = self._fp_i1_i2(np.asarray(keys))
        t1 = self.table[i1]                    # (n, SLOTS) gather
        t2 = self.table[i2]
        f = fp[:, None]
        return ((t1 == f).any(axis=1)) | ((t2 == f).any(axis=1))

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one stored fingerprint per present key; returns a bool
        array of which keys were found (false negatives impossible for
        inserted keys)."""
        fp, i1, i2 = self._fp_i1_i2(np.asarray(keys))
        out = np.zeros(len(fp), dtype=bool)
        for k, (f, a, b) in enumerate(zip(fp, i1, i2)):
            for idx in (a, b):
                row = self.table[idx]
                hit = np.where(row == f)[0]
                if len(hit):
                    row[hit[0]] = 0
                    out[k] = True
                    break
        return out

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, num_buckets: int) -> "NumpyCuckoo":
        t = np.frombuffer(data, dtype=np.uint16).reshape(
            num_buckets, cls.SLOTS).copy()
        return cls(num_buckets, t)


def build_cuckoo_shards(seen: DataFrame, num_shards: int = 32,
                        url_col: str = "url") -> DataFrame:
    """Distributed build, same sharding contract as build_bloom_shards:
    (shard int, num_buckets long, table binary)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        keys = np.unique(pdf["h"].to_numpy().astype(np.uint64))
        m = NumpyCuckoo.size_for(len(keys))
        ck = NumpyCuckoo(m)
        ck.insert(keys)
        return pd.DataFrame(
            {"shard": [shard], "num_buckets": [m], "table": [ck.to_bytes()]}
        )

    hashed = seen.select(
        F.xxhash64(F.col(url_col)).alias("h"),
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_shards)).alias("shard"),
    )
    return hashed.groupBy("shard").applyInPandas(
        _build, "shard int, num_buckets long, table binary"
    )


def cuckoo_prefilter(new_links: DataFrame, shards: DataFrame,
                     num_shards: int = 32, url_col: str = "url") -> DataFrame:
    """Probable-seen prune via the cuckoo shards — shard-aligned cogroup,
    identical plan shape to bloom_prefilter."""
    out_fields = new_links.schema.fieldNames()
    out_schema = new_links.schema

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return left[out_fields]
        ck = NumpyCuckoo.from_bytes(
            bytes(right["table"].iloc[0]), int(right["num_buckets"].iloc[0])
        )
        mask = ck.might_contain(left["_h"].to_numpy().astype(np.uint64))
        return left.loc[~mask, out_fields]

    linked = new_links.withColumn("_h", F.xxhash64(F.col(url_col))).withColumn(
        "_shard",
        F.pmod(F.col("_h"), F.lit(max(1, num_shards))).cast("int"),
    )
    keyed = shards.select(
        F.col("shard").cast("int").alias("_shard"), "num_buckets", "table",
    )
    return (
        linked.groupBy("_shard")
        .cogroup(keyed.groupBy("_shard"))
        .applyInPandas(_probe, out_schema)
    )
