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


# --- real JPEG CONTAINER walk (no codec needed: marker segments are
# length-prefixed per ITU-T T.81 §B; the entropy-coded data is opaque
# to a metadata scrubber, exactly like strip_png_metadata above) ---

_JPEG_SOI = b"\xff\xd8"
# metadata segments to strip: APP1..APP15 (EXIF, XMP, ICC, Photoshop,
# Adobe) + COM. APP0 (JFIF) stays: decoders key density/version off it.
_JPEG_META_MARKERS = frozenset(range(0xE1, 0xF0)) | {0xFE}


def _jpeg_segments(data: bytes) -> tuple[list[tuple[int, int, int]], int]:
    """Walk the pre-SOS marker segments of a real JPEG stream. Returns
    ([(marker, start, end)], sos_end) where ``sos_end`` is the byte
    offset just past the SOS header segment (entropy data begins
    there); raises ValueError on a non-JPEG or truncated container."""
    if data[:2] != _JPEG_SOI:
        raise ValueError("not a JPEG")
    segs: list[tuple[int, int, int]] = []
    pos, n = 2, len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("truncated JPEG (no SOS/EOI)")
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        while marker == 0xFF:  # fill bytes are legal between segments
            pos += 1
            if pos + 2 > n:
                raise ValueError("truncated JPEG (fill run)")
            marker = data[pos + 1]
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7) or marker == 0x01:
            raise ValueError("standalone marker before SOS")
        if pos + 4 > n:
            raise ValueError("truncated segment header")
        length = int.from_bytes(data[pos + 2:pos + 4], "big")
        if length < 2 or pos + 2 + length > n:
            raise ValueError("truncated segment payload")
        end = pos + 2 + length
        segs.append((marker, pos, end))
        pos = end
        if marker == 0xDA:  # SOS: entropy-coded data follows
            return segs, pos


def strip_jpeg_metadata(data: bytes) -> tuple[bytes, int, int]:
    """Remove metadata segments (APP1..APP15, COM) from a real JPEG
    container — where EXIF GPS fixes, camera serials, XMP author
    blocks, and Photoshop paths travel. APP0/JFIF and every coding
    segment (DQT/DHT/SOF/SOS) are kept; the entropy-coded data is
    copied verbatim, so the output decodes bit-identically.

    The stream must end with EOI (FFD9) after the entropy data.
    Returns (clean_bytes, n_segments_removed, bytes_removed); raises
    ValueError on a non-JPEG or malformed container.
    """
    segs, sos_end = _jpeg_segments(data)
    if data[-2:] != b"\xff\xd9":
        raise ValueError("JPEG does not end with EOI")
    out = [_JPEG_SOI]
    removed = 0
    removed_bytes = 0
    for marker, start, end in segs:
        if marker in _JPEG_META_MARKERS:
            removed += 1
            removed_bytes += end - start
        else:
            out.append(data[start:end])
    out.append(data[sos_end:])  # entropy data + EOI, untouched
    return b"".join(out), removed, removed_bytes


_EXIF_HDR = b"Exif\x00\x00"
_XMP_HDR = b"http://ns.adobe.com/xap/1.0/\x00"
_TAG_GPS_IFD = 0x8825


def jpeg_privacy_flags(data: bytes) -> tuple[bool, bool, bool]:
    """(has_exif, has_gps, has_xmp) for a real JPEG container: APP1
    payloads are inspected — an ``Exif\\0\\0`` TIFF block has its IFD0
    walked for the GPS-IFD pointer tag (0x8825, the tag a location
    fix lives under), an XMP header flags has_xmp. A malformed TIFF
    inside an otherwise-valid APP1 counts as has_exif with no GPS
    (scrubbing still removes it). Raises ValueError on a non-JPEG."""
    segs, _ = _jpeg_segments(data)
    has_exif = has_gps = has_xmp = False
    for marker, start, end in segs:
        if marker != 0xE1:
            continue
        payload = data[start + 4:end]
        if payload.startswith(_EXIF_HDR):
            has_exif = True
            has_gps = has_gps or _tiff_has_gps(payload[len(_EXIF_HDR):])
        elif payload.startswith(_XMP_HDR):
            has_xmp = True
    return has_exif, has_gps, has_xmp


def _tiff_has_gps(t: bytes) -> bool:
    """Walk IFD0 of a TIFF block for tag 0x8825 (GPS IFD pointer)."""
    if len(t) < 8:
        return False
    if t[:2] == b"II":
        u16 = lambda b: int.from_bytes(b, "little")  # noqa: E731
        u32 = u16
    elif t[:2] == b"MM":
        u16 = lambda b: int.from_bytes(b, "big")  # noqa: E731
        u32 = u16
    else:
        return False
    if u16(t[2:4]) != 42:
        return False
    off = u32(t[4:8])
    if off + 2 > len(t):
        return False
    count = u16(t[off:off + 2])
    for i in range(count):
        e = off + 2 + 12 * i
        if e + 12 > len(t):
            return False
        if u16(t[e:e + 2]) == _TAG_GPS_IFD:
            return True
    return False


def _jpeg_segment(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def make_exif_app1(gps: bool = False, make: bytes = b"cam\x00") -> bytes:
    """A spec-correct APP1/EXIF segment (little-endian TIFF, IFD0 with
    a Make tag and optionally the GPS-IFD pointer) — test/injection
    helper, the JPEG sibling of make_png_text_chunk."""
    n_entries = 2 if gps else 1
    ifd0_off = 8
    # entries are 12 bytes each; inline ASCII value fits in the 4-byte
    # value slot when len <= 4 (TIFF6 §2)
    entries = [
        struct.pack("<HHI4s", 0x010F, 2, len(make), make.ljust(4, b"\x00")),
    ]
    gps_ifd_off = ifd0_off + 2 + 12 * n_entries + 4
    if gps:
        entries.append(struct.pack("<HHII", _TAG_GPS_IFD, 4, 1, gps_ifd_off))
    tiff = (
        b"II" + struct.pack("<HI", 42, ifd0_off)
        + struct.pack("<H", n_entries) + b"".join(entries)
        + struct.pack("<I", 0)  # next-IFD pointer
    )
    if gps:
        # GPS IFD: one entry (GPSVersionID, BYTE x4, inline)
        tiff += struct.pack("<H", 1) \
            + struct.pack("<HHI4s", 0x0000, 1, 4, b"\x02\x03\x00\x00") \
            + struct.pack("<I", 0)
    return _jpeg_segment(0xE1, _EXIF_HDR + tiff)


def make_xmp_app1(xml: bytes = b"<x:xmpmeta/>") -> bytes:
    return _jpeg_segment(0xE1, _XMP_HDR + xml)


def make_jpeg_container(
    meta_segments: tuple[bytes, ...] = (),
    comment: bytes | None = None,
    entropy: bytes = b"\x12\x34\x56\x78" * 8,
) -> bytes:
    """A structurally valid JPEG marker stream (SOI, APP0/JFIF, given
    metadata segments, DQT, SOF0, SOS header, opaque entropy bytes,
    EOI) for container-walk tests — the entropy data is arbitrary
    non-FF bytes because the scrubber never decodes it."""
    assert b"\xff" not in entropy
    jfif = _jpeg_segment(
        0xE0, b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 72, 72)
        + b"\x00\x00"
    )
    dqt = _jpeg_segment(0xDB, b"\x00" + bytes(range(64)))
    sof = _jpeg_segment(
        0xC0, b"\x08" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00"
    )
    sos = _jpeg_segment(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    parts = [_JPEG_SOI, jfif, *meta_segments]
    if comment is not None:
        parts.append(_jpeg_segment(0xFE, comment))
    parts += [dqt, sof, sos, entropy, b"\xff\xd9"]
    return b"".join(parts)
