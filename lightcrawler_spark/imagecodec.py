"""Image codec kernels for the image+caption payload (BASELINE.json
input_hint; graft analog of the reference's content decode step,
SURVEY.md §2.3 C10 / §2.4 E20).

Container constraint: no PIL/libjpeg/ffmpeg is installed, so:

- ``png``: a REAL, spec-compliant PNG codec (8-bit RGB, filter 0,
  zlib/DEFLATE, CRC-checked) written against the public PNG spec with
  numpy + zlib. Lossless: decode(encode(x)) == x exactly.
- ``jpeg``: a clearly-marked DETERMINISTIC STAND-IN for a lossy codec
  (uniform quantization, step 4, zlib-packed). It is NOT a JPEG
  bitstream; it exists so the lossy-path plumbing (PSNR gate, phash,
  Arrow batch shapes) is real and testable. Swap `_encode_fakelossy` /
  `_decode_fakelossy` for a libjpeg binding in production — the Spark
  plumbing does not change. Quantization step 4 yields MSE 1.5 →
  PSNR ≈ 46.4 dB, satisfying the ≥40 dB per-row invariant the same way
  a quality≈90 JPEG would.

All functions are numpy-vectorized per image; batch-level vectorization
happens in the mapInPandas operators (operators/images.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "encode_image",
    "decode_image",
    "psnr",
    "phash64",
    "png_encode",
    "png_decode",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FAKE_SIG = b"FLC1"  # fake-lossy container, version 1
_QUANT_STEP = 4


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 array → PNG bytes (color type 2, filter 0)."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → 8-bit RGB array. Supports what png_encode emits plus
    filter types 0–2 for robustness; CRC-verified."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * 3 + 1
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = rows[:, 1:].astype(np.int32).reshape(h, w, 3)
    for y in range(h):
        f = filters[y]
        if f == 0:
            continue
        if f == 1:  # Sub
            for x in range(1, w):
                out[y, x] = (out[y, x] + out[y, x - 1]) & 0xFF
        elif f == 2:  # Up
            if y > 0:
                out[y] = (out[y] + out[y - 1]) & 0xFF
        else:
            raise ValueError(f"unsupported filter {f}")
    return out.astype(np.uint8)


def _encode_fakelossy(arr: np.ndarray) -> bytes:
    """STUB lossy codec (see module docstring): quantize + deflate."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    q = (arr // _QUANT_STEP).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), 6)
    return _FAKE_SIG + struct.pack(">IIB", w, h, _QUANT_STEP) + payload


def _decode_fakelossy(data: bytes) -> np.ndarray:
    if data[:4] != _FAKE_SIG:
        raise ValueError("not a fake-lossy stream")
    w, h, step = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)
    return (q.astype(np.int32) * step + step // 2).clip(0, 255).astype(np.uint8)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "jpeg":
        return _encode_fakelossy(arr)
    raise NotImplementedError(f"format {fmt!r} needs an external codec")


def decode_image(data: bytes) -> np.ndarray:
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:4] == _FAKE_SIG:
        return _decode_fakelossy(data)
    raise NotImplementedError("unknown image container (real JPEG needs libjpeg)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: 32×32 grayscale → 2-D DCT-II → low 8×8
    coefficients (DC excluded) thresholded at their median. Returns a
    SIGNED int64 (Spark LongType-compatible two's complement).

    CAVEAT (inherent to median-threshold phash, not this port): on
    low-complexity inputs — solid fills, pure gradients — the 63 AC
    coefficients are all ~0, so the median bisects floating-point noise
    and the bits are arbitrary; a lossy re-encode of the SAME solid
    image can land at Hamming distance ~32. Near-dup decisions via
    phash are only meaningful for spectrum-rich (photograph-like)
    content; pair flat images by exact pixel hash instead (they are
    exactly reproducible under any sane codec), or gate on dhash,
    which survives gradients (consensus_near_dup_pairs does both)."""
    gray = (
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    ).astype(np.float64)
    h, w = gray.shape
    # nearest-neighbor resample to 32×32 — deterministic and library-free
    idx_y = (np.arange(32) * h) // 32
    idx_x = (np.arange(32) * w) // 32
    small = gray[idx_y][:, idx_x]
    dct = _DCT32 @ small @ _DCT32.T
    low = dct[:8, :8].flatten()[1:]  # drop DC
    med = np.median(low)
    bits = np.uint64(0)
    for i, v in enumerate(low):
        if v > med:
            bits |= np.uint64(1) << np.uint64(i)
    return int(np.int64(bits))


def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash (dHash): grayscale -> 8x9 grid -> one bit
    per horizontal neighbor pair (left < right). Complements phash64:
    dHash tracks local gradients (robust to global brightness shifts),
    pHash tracks low-frequency structure -- production near-dup systems
    band over both. Returns SIGNED int64 (Spark LongType two's
    complement), same contract as phash64.
    """
    gray = (
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    ).astype(np.float64)
    h, w = gray.shape
    idx_y = (np.arange(8) * h) // 8
    idx_x = (np.arange(9) * w) // 9
    small = gray[idx_y][:, idx_x]  # 8 rows x 9 cols
    diff = small[:, 1:] > small[:, :-1]  # 8x8 gradient signs
    bits = np.uint64(0)
    for i, v in enumerate(diff.flatten()):
        if v:
            bits |= np.uint64(1) << np.uint64(i)
    return int(np.int64(bits))


# PNG ancillary chunks that carry metadata a privacy scrub must drop
# (textual comments, EXIF, timestamps). Critical chunks (IHDR/PLTE/
# IDAT/IEND) and rendering-relevant ancillaries are preserved.
PNG_META_CHUNKS = {b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME"}


def strip_png_metadata(data: bytes) -> tuple[bytes, int, int]:
    """Remove metadata chunks from a PNG by walking the real container
    (length / type / payload / CRC per the PNG spec) -- the image-side
    PII scrub (EXIF GPS coordinates, camera serials, author comments
    travel in exactly these chunks). Pixel data is untouched: the
    output decodes bit-identically.

    Returns (clean_bytes, n_chunks_removed, bytes_removed). Raises
    ValueError on a non-PNG or truncated container.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    out = [_PNG_SIG]
    removed = 0
    removed_bytes = 0
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        end = pos + 12 + length
        if end > n:
            raise ValueError("truncated chunk")
        if tag in PNG_META_CHUNKS:
            removed += 1
            removed_bytes += end - pos
        else:
            out.append(data[pos:end])
        pos = end
        if tag == b"IEND":
            break
    if pos != n or (out and out[-1][4:8] != b"IEND"):
        raise ValueError("bad PNG structure")
    return b"".join(out), removed, removed_bytes


def make_png_text_chunk(keyword: bytes, text: bytes) -> bytes:
    """A spec-correct tEXt chunk (test/injection helper)."""
    return _chunk(b"tEXt", keyword + b"\x00" + text)
