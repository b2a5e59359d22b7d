"""Watermark-band screen (operators/images.py:with_watermark_stats +
watermark_expr) and rotation/flip-invariant dedup keys
(with_rot_invariant_hashes): verdict-path pins per fixture archetype,
the D4 group-closure invariance property, and null-edge semantics. The
cross-formulation value checks (vectorized kernel vs scalar-loop
oracle) live in the watermark_gate / rot_invariant_hash contract
queries."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.imagecodec import encode_image
from lightcrawler_spark.operators.images import (
    watermark_expr,
    with_rot_invariant_hashes,
    with_watermark_stats,
)

pytestmark = pytest.mark.usefixtures("spark")


def _enc(a):
    return bytearray(
        encode_image(np.ascontiguousarray(a).astype(np.uint8), "png")
    )


def _ramp():
    # horizontal ramp: gray varies only with x -> band and rest have
    # identical per-column content, every arm false
    return np.repeat(
        (np.arange(24) * 10)[None, :, None], 24, axis=0
    ).repeat(3, axis=2)


def _run_wm(spark, rows):
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    out = (
        with_watermark_stats(df)
        .withColumn("watermark_likely", watermark_expr())
        .orderBy("image_id")
        .collect()
    )
    return {r["image_id"]: r for r in out}


def test_watermark_verdict_paths(spark):
    text_band = _ramp().copy()
    text_band[20:] = (255 * (np.arange(24) % 2))[None, :, None]
    banner = _ramp().copy()
    banner[20:] = 255
    noise = np.random.default_rng(77).integers(0, 256, size=(24, 24, 3))
    rows = [
        (0, _enc(_ramp())),                       # clean -> False
        (1, _enc(text_band)),                     # busy-band arm -> True
        (2, _enc(banner)),                        # banner arm -> True
        (3, _enc(noise)),                         # uniformly busy -> False
        (4, _enc(np.full((24, 24, 3), 128))),     # solid -> False
        (5, bytearray(b"notanimage")),            # corrupt -> NULL
        (6, None),                                # NULL -> NULL
    ]
    got = _run_wm(spark, rows)
    assert got[0]["watermark_likely"] is False
    assert got[1]["watermark_likely"] is True
    assert got[2]["watermark_likely"] is True
    assert got[3]["watermark_likely"] is False
    assert got[4]["watermark_likely"] is False
    assert got[5]["watermark_likely"] is None
    assert got[6]["watermark_likely"] is None
    # the stripe band is transition-saturated: 23 transitions per band
    # row, none elsewhere
    assert got[1]["wm_band_trans"] == 4 * 23
    assert got[1]["wm_rest_trans"] == 0
    # the solid banner is smooth but bright: zero band transitions,
    # band mean 765 vs ramp mean 345
    assert got[2]["wm_band_trans"] == 0
    assert got[2]["wm_band_sum"] == 765 * 4 * 24


def test_watermark_band_split_exact(spark):
    # h=24 -> band = bottom 4 rows (24 // 5), rest = 20 rows
    got = _run_wm(spark, [(0, _enc(_ramp()))])
    r = got[0]
    assert r["wm_band_px"] == 4 * 24
    assert r["wm_rest_px"] == 20 * 24
    # identical per-column content: cross-multiplied means cancel
    assert (
        r["wm_band_sum"] * r["wm_rest_px"]
        == r["wm_rest_sum"] * r["wm_band_px"]
    )


def test_watermark_no_rest_is_false(spark):
    # 1-row image: the band IS the image, wm_rest_px == 0 -> False,
    # never NULL (the blob decoded fine)
    one_row = np.repeat(
        (np.arange(8) * 30)[None, :, None], 1, axis=0
    ).repeat(3, axis=2)
    got = _run_wm(spark, [(0, _enc(one_row))])
    assert got[0]["wm_rest_px"] == 0
    assert got[0]["watermark_likely"] is False


def test_watermark_tiny_band_floor(spark):
    # h=4 -> h // 5 == 0, band floor max(1, .) = 1 row
    tiny = np.random.default_rng(78).integers(0, 256, size=(4, 8, 3))
    got = _run_wm(spark, [(0, _enc(tiny))])
    assert got[0]["wm_band_px"] == 8
    assert got[0]["wm_rest_px"] == 3 * 8


def _run_rot(spark, rows):
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    out = with_rot_invariant_hashes(df).orderBy("image_id").collect()
    return {r["image_id"]: r for r in out}


def test_rot_invariance_group_closure(spark):
    # {T(S(img)) : T in D4} == {T(img) : T in D4} for any S in D4, so
    # the min-over-group key is EXACTLY invariant under every dihedral
    # re-post — rotations, mirrors, and their compositions
    base = np.random.default_rng(500).integers(0, 256, size=(24, 32, 3))
    variants = [
        base,
        np.rot90(base),
        np.rot90(base, 2),
        np.rot90(base, 3),
        base[:, ::-1],
        base[::-1, :],
        np.rot90(base)[:, ::-1],
        np.rot90(base)[::-1, :],
    ]
    got = _run_rot(
        spark, [(i, _enc(v)) for i, v in enumerate(variants)]
    )
    keys = {(r["phash_d4"], r["dhash_d4"]) for r in got.values()}
    assert len(keys) == 1
    assert None not in next(iter(keys))


def test_rot_distinct_images_distinct_keys(spark):
    a = np.random.default_rng(500).integers(0, 256, size=(24, 32, 3))
    b = np.random.default_rng(501).integers(0, 256, size=(24, 32, 3))
    got = _run_rot(spark, [(0, _enc(a)), (1, _enc(b))])
    assert (got[0]["phash_d4"], got[0]["dhash_d4"]) != (
        got[1]["phash_d4"],
        got[1]["dhash_d4"],
    )


def test_rot_null_and_corrupt(spark):
    got = _run_rot(
        spark, [(0, bytearray(b"notanimage")), (1, None)]
    )
    for i in (0, 1):
        assert got[i]["phash_d4"] is None
        assert got[i]["dhash_d4"] is None


def test_rot_invariant_dedup_groups(spark):
    from lightcrawler_spark.operators.images import rot_invariant_dedup

    base0 = np.random.default_rng(500).integers(0, 256, size=(24, 32, 3))
    base1 = np.random.default_rng(501).integers(0, 256, size=(24, 32, 3))
    rows = [
        (0, _enc(base0), "short"),
        (1, _enc(np.rot90(base0)), "a much longer descriptive caption"),
        (2, _enc(base0[:, ::-1]), "mid caption"),
        (3, _enc(base1), "caption x"),
        (4, _enc(base1[::-1, ::-1]), "caption y"),
        (5, bytearray(b"notanimage"), "corrupt"),
        (6, None, None),
    ]
    df = spark.createDataFrame(
        rows, "image_id long, bytes binary, caption string"
    )
    got = {
        r["image_id"]: r
        for r in rot_invariant_dedup(df).collect()
    }
    # group A: the rotated re-post's longer caption wins
    assert got[0]["dup_key"] == got[1]["dup_key"] == got[2]["dup_key"]
    assert got[0]["group_size"] == 3
    assert got[0]["rep_id"] == 1
    assert got[1]["is_kept"] is True
    assert got[0]["is_kept"] is False and got[2]["is_kept"] is False
    # group B: equal-length captions tie to the lowest id
    assert got[3]["dup_key"] == got[4]["dup_key"]
    assert got[3]["rep_id"] == 3 and got[3]["is_kept"] is True
    # corrupt / NULL blobs: per-row singleton keys, always kept
    assert got[5]["dup_key"] == "s:5" and got[5]["is_kept"] is True
    assert got[6]["dup_key"] == "s:6" and got[6]["is_kept"] is True
    assert got[5]["group_size"] == 1 and got[6]["group_size"] == 1


def test_rot_invariant_dedup_string_ids(spark):
    # the argmin is min(struct(-cap_len, id)) — negate the LENGTH, not
    # the id — so string ids work (production image ids usually are)
    from lightcrawler_spark.operators.images import rot_invariant_dedup

    base = np.random.default_rng(500).integers(0, 256, size=(24, 32, 3))
    df = spark.createDataFrame(
        [
            ("img:b", _enc(base), "same len"),
            ("img:a", _enc(np.rot90(base)), "SAME LEN"),
        ],
        "image_id string, bytes binary, caption string",
    )
    got = {r["image_id"]: r for r in rot_invariant_dedup(df).collect()}
    assert got["img:a"]["group_size"] == 2
    # equal caption length: tie to the LOWEST id, string order
    assert got["img:a"]["rep_id"] == "img:a"
    assert got["img:a"]["is_kept"] is True and got["img:b"]["is_kept"] is False


def test_rot_near_dup_pairs(spark):
    # rotated RE-ENCODES (transform + ±16 noise): exact d4-key dedup
    # misses them; alignment search finds them, and unrelated images
    # stay apart
    from lightcrawler_spark.operators.images import (
        rot_invariant_dedup,
        rot_near_dup_pairs,
    )

    base0 = np.random.default_rng(600).integers(0, 256, size=(24, 32, 3))
    base1 = np.random.default_rng(601).integers(0, 256, size=(24, 32, 3))

    def noisy(a, seed):
        # ±16: strong enough that the exact d4-min keys differ (proven
        # below), gentle enough that the aligned distance stays <= 6
        return np.clip(
            a.astype(np.int64)
            + np.random.default_rng(seed).integers(-16, 17, size=a.shape),
            0, 255,
        )

    rows = [
        (0, _enc(base0)),
        (1, _enc(noisy(np.rot90(base0), 700))),
        (2, _enc(base1)),
        (3, _enc(noisy(base1[::-1, ::-1], 702))),
        (4, bytearray(b"notanimage")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in rot_near_dup_pairs(df).collect()
    }
    assert (0, 1) in pairs and (2, 3) in pairs
    assert (0, 2) not in pairs and (0, 3) not in pairs
    assert pairs[(0, 1)]["rot_hamming"] <= 6
    # the argmin alignment of the lower-id side is a real transform idx
    assert 1 <= pairs[(0, 1)]["best_transform"] <= 8
    # the exact-key path indeed MISSES the noisy rotated re-post —
    # this operator exists because of that gap
    cap = df.withColumn("caption", F.lit("c"))
    exact = {
        r["image_id"]: r for r in rot_invariant_dedup(cap).collect()
    }
    assert exact[0]["dup_key"] != exact[1]["dup_key"]
