"""JPEG container scrub: real ITU-T T.81 marker walk + TIFF GPS probe.

Kernel-level pins (strip/flags/fixture builders) plus the Spark
operator's null/corrupt/passthrough semantics.
"""

import struct

import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.imagecodec import (
    _jpeg_segments,
    jpeg_privacy_flags,
    make_exif_app1,
    make_jpeg_container,
    make_xmp_app1,
    strip_jpeg_metadata,
)
from lightcrawler_spark.operators.images import scrub_jpeg_metadata


def test_strip_removes_all_meta_and_is_idempotent():
    j = make_jpeg_container(
        (make_exif_app1(gps=True), make_xmp_app1()), comment=b"shot on X"
    )
    clean, n, nb = strip_jpeg_metadata(j)
    assert (n, nb > 0) == (3, True)
    assert jpeg_privacy_flags(clean) == (False, False, False)
    again, n2, nb2 = strip_jpeg_metadata(clean)
    assert (again, n2, nb2) == (clean, 0, 0)


def test_coding_segments_and_entropy_preserved():
    entropy = b"\x01\x02\x03" * 11
    dirty = make_jpeg_container((make_exif_app1(),), entropy=entropy)
    ref = make_jpeg_container((), entropy=entropy)
    clean, _, _ = strip_jpeg_metadata(dirty)
    assert clean == ref  # byte-identical to the never-dirty container
    assert entropy in clean and clean[-2:] == b"\xff\xd9"


def test_gps_flag_both_byte_orders():
    # little-endian built by the helper; big-endian TIFF built by hand
    assert jpeg_privacy_flags(
        make_jpeg_container((make_exif_app1(gps=True),)))[1] is True
    assert jpeg_privacy_flags(
        make_jpeg_container((make_exif_app1(gps=False),)))[1] is False
    tiff_mm = (
        b"MM" + struct.pack(">HI", 42, 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHII", 0x8825, 4, 1, 26)
        + struct.pack(">I", 0)
        + struct.pack(">H", 0) + struct.pack(">I", 0)
    )
    app1 = b"\xff\xe1" + (len(tiff_mm) + 8).to_bytes(2, "big") \
        + b"Exif\x00\x00" + tiff_mm
    assert jpeg_privacy_flags(
        make_jpeg_container((app1,))) == (True, True, False)


def test_fill_bytes_between_segments():
    j = make_jpeg_container((make_exif_app1(),))
    # inject a legal 0xFF fill byte before the APP1 marker
    app1_at = j.index(b"\xff\xe1")
    filled = j[:app1_at] + b"\xff" + j[app1_at:]
    clean, n, _ = strip_jpeg_metadata(filled)
    assert n == 1
    _jpeg_segments(clean)  # still walks


def test_malformed_containers_raise():
    for bad in (
        b"\x89PNG",                                  # wrong signature
        b"\xff\xd8\xff\xe1\x00\x10short",            # truncated payload
        b"\xff\xd8\xff\xe1\x00\x01xx",               # impossible length
        make_jpeg_container()[:-2],                  # EOI missing
    ):
        with pytest.raises(ValueError):
            strip_jpeg_metadata(bad)


def test_operator_null_corrupt_passthrough(spark):
    from lightcrawler_spark.fixtures import make_images

    png = next(r["bytes"] for r in make_images(2) if r["fmt"] == "png")
    rows = [
        (0, bytearray(make_jpeg_container((make_exif_app1(gps=True),)))),
        (1, bytearray(b"\xff\xd8\xff\xe1\x00\x10short")),
        (2, bytearray(png)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    out = {r["image_id"]: r for r in scrub_jpeg_metadata(df).collect()}
    assert (out[0]["had_gps"], out[0]["meta_segments_removed"]) == (True, 1)
    assert out[1]["bytes_clean"] is None  # corrupt -> null row
    assert out[1]["had_exif"] is None
    assert bytes(out[2]["bytes_clean"]) == bytes(png)  # passthrough
    assert out[2]["meta_segments_removed"] == 0
    assert out[3]["bytes_clean"] is None  # NULL blob -> null row


def test_operator_output_still_walks(spark):
    j = make_jpeg_container((make_exif_app1(gps=True), make_xmp_app1()))
    df = spark.createDataFrame(
        [(0, bytearray(j))], "image_id long, bytes binary"
    )
    clean = bytes(scrub_jpeg_metadata(df).first()["bytes_clean"])
    segs, _ = _jpeg_segments(clean)
    assert [m for m, _, _ in segs if 0xE1 <= m <= 0xEF or m == 0xFE] == []
