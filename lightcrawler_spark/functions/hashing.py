"""Hashing kernels: dedup keys, simhash, minhash, rolling fingerprints.

Pure Python/numpy — usable from pandas UDFs, the golden-trace simulator,
and tests. JVM-side equivalents (F.md5 / F.xxhash64) are preferred in
DataFrame plans; these exist for the kernels Spark lacks (simhash,
band-signature minhash, winnowing fingerprints).

Reference parity notes:
- url_md5 (C5) lives in urlkit; this module covers the near-dup family
  the reference outsourced to a Flask simhash service
  (/root/reference/worker/FlaskRestClient.class.php:41-53, usage
  worker/SpiderFrame.class.php:273-296) — reimplemented locally as a
  standard 64-bit simhash over token md5s.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "md5_hex",
    "stable_hash64",
    "simhash64",
    "hamming64",
    "char_shingles",
    "minhash_signature",
    "band_keys",
    "winnow_fingerprints",
]


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def stable_hash64(s: str, seed: int = 0) -> int:
    """Deterministic unsigned 64-bit hash from md5 (stable across
    processes — unlike Python's hash())."""
    d = hashlib.md5((f"{seed}\x1f" + s).encode("utf-8")).digest()
    return struct.unpack("<Q", d[:8])[0]


def simhash64(tokens: list[str]) -> int:
    """Charikar simhash: 64-bit signature over weighted token hashes."""
    if not tokens:
        return 0
    counts = [0] * 64
    for tok in tokens:
        h = stable_hash64(tok)
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if counts[b] > 0:
            out |= 1 << b
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def char_shingles(text: str, k: int = 3) -> set[str]:
    """Distinct character k-grams (n-gram Jaccard / minhash base set)."""
    if len(text) < k:
        return {text} if text else set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def minhash_signature(shingles: set[str], num_hashes: int = 64) -> list[int]:
    """Min-wise signature: for each seed j, min over shingles of
    stable_hash64(shingle, j). Empty set → all max-uint64."""
    if not shingles:
        return [0xFFFFFFFFFFFFFFFF] * num_hashes
    return [
        min(stable_hash64(s, j) for s in shingles) for j in range(num_hashes)
    ]


def band_keys(signature: list[int], bands: int, rows: int) -> list[str]:
    """LSH banding: hash each band of `rows` signature slots to a bucket
    key; near-dup candidates collide in ≥1 band."""
    assert bands * rows <= len(signature)
    keys = []
    for b in range(bands):
        chunk = signature[b * rows : (b + 1) * rows]
        keys.append(f"{b}:" + md5_hex(",".join(map(str, chunk)))[:16])
    return keys


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): min k-gram hash per sliding
    window, deduped — a robust document fingerprint set."""
    if len(text) < k:
        return [stable_hash64(text)] if text else []
    grams = [stable_hash64(text[i : i + k]) for i in range(len(text) - k + 1)]
    out: list[int] = []
    last = None
    for i in range(max(1, len(grams) - window + 1)):
        w = grams[i : i + window]
        m = min(w)
        pos = i + w.index(m)
        if last != (pos, m):
            out.append(m)
            last = (pos, m)
    return out
