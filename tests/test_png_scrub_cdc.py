"""Unit tests: PNG metadata scrubbing + content-defined chunking."""

import hashlib

import numpy as np
import pytest

from lightcrawler_spark.imagecodec import (
    make_png_text_chunk,
    png_decode,
    png_encode,
    strip_png_metadata,
)
from lightcrawler_spark.operators.cdc import cdc_chunks, chunk_blobs
from lightcrawler_spark.operators.images import scrub_image_metadata


def _dirty_png():
    arr = (np.arange(300, dtype=np.uint8).reshape(10, 10, 3) * 7) % 251
    clean = png_encode(arr.astype(np.uint8))
    extra = make_png_text_chunk(b"Author", b"alice") + \
        make_png_text_chunk(b"GPS", b"52.5,13.4")
    return arr.astype(np.uint8), clean, clean[:33] + extra + clean[33:]


class TestPngScrub:
    def test_kernel_removes_meta_pixels_intact(self):
        arr, clean, dirty = _dirty_png()
        got, n, nb = strip_png_metadata(dirty)
        assert got == clean and n == 2
        assert nb == len(dirty) - len(clean)
        assert (png_decode(got) == arr).all()
        # idempotent: scrubbing a clean PNG removes nothing
        again, n2, _ = strip_png_metadata(got)
        assert again == got and n2 == 0

    def test_kernel_rejects_garbage(self):
        with pytest.raises(ValueError):
            strip_png_metadata(b"not a png at all")
        _, _, dirty = _dirty_png()
        with pytest.raises(ValueError):
            strip_png_metadata(dirty[:-7])  # truncated IEND

    def test_operator_scrubs_and_passes_through(self, spark):
        _, clean, dirty = _dirty_png()
        df = spark.createDataFrame(
            [("p", bytearray(dirty)), ("x", bytearray(b"FAKEblob"))],
            "image_id string, bytes binary")
        got = {r.image_id: r for r in scrub_image_metadata(df).collect()}
        assert bytes(got["p"].bytes_clean) == clean
        assert got["p"].meta_chunks_removed == 2
        assert bytes(got["x"].bytes_clean) == b"FAKEblob"
        assert got["x"].meta_chunks_removed == 0

    def test_operator_null_blob_yields_null_row(self, spark):
        """Round-4 ADVICE fix: a NULL bytes value used to TypeError the
        whole Arrow task; now it takes the documented corrupt-blob null
        path like the phash/dhash/letterbox siblings."""
        _, clean, dirty = _dirty_png()
        df = spark.createDataFrame(
            [("p", bytearray(dirty)), ("n", None)],
            "image_id string, bytes binary")
        got = {r.image_id: r for r in scrub_image_metadata(df).collect()}
        assert bytes(got["p"].bytes_clean) == clean
        assert got["n"].bytes_clean is None
        assert got["n"].meta_chunks_removed is None


class TestCdc:
    def test_chunks_cover_blob_exactly(self):
        data = hashlib.md5(b"seed").hexdigest().encode() * 40
        chunks = cdc_chunks(data)
        pos = 0
        for off, ln, dig in chunks:
            assert off == pos
            assert dig == hashlib.md5(data[off:off + ln]).hexdigest()
            pos += ln
        assert pos == len(data)
        assert all(ln <= 1024 for _, ln, _ in chunks)

    def test_shift_resistance(self):
        """Insert bytes at the front: chunk digests realign after the
        disturbed region — the property fixed-size chunking lacks."""
        base = b"".join(
            hashlib.md5(bytes([i])).hexdigest().encode() for i in range(64)
        )
        shifted = b"XYZ" + base
        d1 = {d for _, _, d in cdc_chunks(base)}
        d2 = {d for _, _, d in cdc_chunks(shifted)}
        shared = d1 & d2
        assert len(shared) >= len(d1) * 0.6
        # fixed-size chunking shares nothing under the same shift
        fixed1 = {hashlib.md5(base[i:i + 64]).hexdigest()
                  for i in range(0, len(base), 64)}
        fixed2 = {hashlib.md5(shifted[i:i + 64]).hexdigest()
                  for i in range(0, len(shifted), 64)}
        assert len(fixed1 & fixed2) == 0

    def test_operator_matches_kernel(self, spark):
        blobs = [(i, hashlib.md5(bytes([i])).hexdigest().encode() * (8 + i))
                 for i in range(5)]
        df = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in blobs],
            "blob_id long, bytes binary")
        got = {}
        for r in chunk_blobs(df).collect():
            got.setdefault(r.blob_id, []).append(
                (r.chunk_idx, r.offset, r.length, r.chunk_md5))
        for i, b in blobs:
            exp = [(j, off, ln, dig) for j, (off, ln, dig)
                   in enumerate(cdc_chunks(b))]
            assert sorted(got[i]) == exp
