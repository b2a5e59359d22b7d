"""Image payload tests (BASELINE.json input_hint per-row invariants):
decode → dims, PSNR ≥ 40 dB for lossy, exact for PNG, phash stability,
near-dup pairing. Codec unit tests + Spark mapInPandas plumbing."""

import numpy as np
import pytest

from lightcrawler_spark.fixtures import make_image_array, make_images
from lightcrawler_spark.imagecodec import (
    decode_image,
    encode_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
)


class TestCodec:
    def test_png_roundtrip_exact(self):
        arr = make_image_array(7, 40, 28)
        assert (png_decode(png_encode(arr)) == arr).all()

    def test_png_magic(self):
        assert png_encode(make_image_array(0, 8, 8))[:8] == b"\x89PNG\r\n\x1a\n"

    def test_lossy_psnr_above_40(self):
        for i in (2, 5, 8):  # includes pure-noise images (worst case)
            arr = make_image_array(i, 48, 36)
            out = decode_image(encode_image(arr, "jpeg"))
            assert psnr(arr, out) >= 40.0

    def test_lossy_shape_preserved(self):
        arr = make_image_array(2, 31, 17)
        assert decode_image(encode_image(arr, "jpeg")).shape == arr.shape

    def test_unknown_format_raises(self):
        with pytest.raises(NotImplementedError):
            encode_image(make_image_array(0, 8, 8), "webp")
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0 fake jpeg header")

    def test_phash_deterministic_and_robust(self):
        arr = make_image_array(5, 64, 48)
        h1 = phash64(arr)
        assert h1 == phash64(arr.copy())
        # light lossy distortion moves few bits
        lossy = decode_image(encode_image(arr, "jpeg"))
        assert bin(h1 ^ phash64(lossy)).count("1") <= 6
        # a different image moves many bits
        other = make_image_array(11, 64, 48)
        assert bin(h1 ^ phash64(other)).count("1") > 10


class TestFixtureInvariants:
    def test_make_images_schema(self):
        rows = make_images(12)
        for r in rows:
            assert set(r) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
            arr = decode_image(r["bytes"])
            assert arr.shape == (r["h"], r["w"], 3)

    def test_deterministic(self):
        a = make_images(6)
        b = make_images(6)
        assert all(x["bytes"] == y["bytes"] and x["phash"] == y["phash"]
                   for x, y in zip(a, b))


@pytest.fixture(scope="module")
def images_df(spark):
    rows = make_images(24)
    return spark.createDataFrame(
        [
            (r["image_id"], bytearray(r["bytes"]), r["w"], r["h"], r["fmt"],
             r["caption"], r["phash"])
            for r in rows
        ],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    ).cache()


class TestSparkImageOps:
    def test_verify_images_all_pass(self, spark, images_df):
        from lightcrawler_spark.operators.images import verify_images

        v = verify_images(images_df).collect()
        assert len(v) == 24
        for r in v:
            assert r["dims_ok"], r
            assert r["psnr_ok"], r
            assert r["exact_ok"], r
            assert r["phash_ok"], r

    def test_decode_stats(self, spark, images_df):
        from pyspark.sql import functions as F

        from lightcrawler_spark.operators.images import decode_stats

        out = images_df.withColumn("s", decode_stats(F.col("bytes"))).select(
            "image_id", "w", "h", "s.*"
        )
        rows = out.collect()
        assert all(r["decode_ok"] for r in rows)
        assert all(r["dec_w"] == r["w"] and r["dec_h"] == r["h"] for r in rows)

    def test_with_phash_matches_stored(self, spark, images_df):
        from lightcrawler_spark.operators.images import with_phash

        rows = with_phash(images_df).select("image_id", "phash", "phash_calc").collect()
        # stored phash is over decoded pixels → recomputation is exact
        assert all(r["phash_calc"] == r["phash"] for r in rows)

    def test_phash_near_dup_pairs(self, spark):
        from lightcrawler_spark.operators.images import phash_near_dup_pairs

        # same image encoded png + lossy = near-dup pair; distinct images
        # not. The pair image must be spectrum-rich (noise kind, i%3==2):
        # phash of a solid/gradient image is degenerate — its AC
        # coefficients are ~0, the median threshold bisects numerical
        # noise, and a lossy re-encode flips ~half the bits (see the
        # phash64 docstring caveat).
        a0 = make_image_array(5, 40, 40)
        rows = [
            ("dup_a_png", phash64(a0)),
            ("dup_a_lossy", phash64(decode_image(encode_image(a0, "jpeg")))),
            ("other_1", phash64(make_image_array(8, 40, 40))),
            ("other_2", phash64(make_image_array(20, 40, 40))),
        ]
        df = spark.createDataFrame(rows, "image_id string, phash long")
        pairs = phash_near_dup_pairs(df, max_hamming=6).collect()
        ids = {(p["id_a"], p["id_b"]) for p in pairs}
        assert ("dup_a_lossy", "dup_a_png") in ids
        assert all("other" not in a or "other" not in b for a, b in ids)

    def test_banded_recall_guarantee(self, spark):
        """bands=7 pigeonhole-guarantees recall at Hamming <= 6; the
        default bands=4 guarantees only <= 3. Witness: a pair whose 4
        differing bits hit all four 16-bit chunks (one bit per chunk)
        shares no 16-bit chunk — invisible to bands=4 — but shares 3 of
        the 7 10-bit bands."""
        from lightcrawler_spark.operators.images import phash_near_dup_pairs

        base = 0x5A5A_1234_ABCD_0F0F
        spread = base ^ ((1 << 1) | (1 << 17) | (1 << 33) | (1 << 49))
        low = base ^ 0b11  # 2 bits in chunk 0: found by any banding
        df = spark.createDataFrame(
            [("base", base), ("spread4", spread), ("low2", low)],
            "image_id string, phash long",
        )
        four = {
            (p["id_a"], p["id_b"])
            for p in phash_near_dup_pairs(df, max_hamming=6).collect()
        }
        seven = {
            (p["id_a"], p["id_b"])
            for p in phash_near_dup_pairs(df, max_hamming=6, bands=7).collect()
        }
        assert ("base", "low2") in four
        assert ("base", "spread4") not in four  # the documented recall gap
        assert ("base", "spread4") in seven     # closed by the guarantee
        assert four <= seven

    def test_bands_validation(self, spark):
        from lightcrawler_spark.operators.images import phash_near_dup_pairs

        df = spark.createDataFrame([("a", 1)], "image_id string, phash long")
        with pytest.raises(ValueError):
            phash_near_dup_pairs(df, bands=1)
        with pytest.raises(ValueError):
            phash_near_dup_pairs(df, bands=65)


class TestMultimodalTransforms:
    def test_resize_roundtrip(self, spark):
        from lightcrawler_spark.fixtures import make_images
        from lightcrawler_spark.imagecodec import decode_image
        from lightcrawler_spark.operators.images import resize_images

        rows = make_images(8)
        df = spark.createDataFrame(
            [(r["image_id"], bytearray(r["bytes"]), r["fmt"]) for r in rows],
            "image_id string, bytes binary, fmt string",
        )
        out = resize_images(df, out_w=16, out_h=12).collect()
        assert len(out) == 8
        for r in out:
            assert (r["resized_w"], r["resized_h"]) == (16, 12)
            arr = decode_image(bytes(r["bytes_resized"]))
            assert arr.shape == (12, 16, 3)

    def test_image_features(self, spark):
        from lightcrawler_spark.fixtures import make_images
        from lightcrawler_spark.operators.images import image_features_udf
        from pyspark.sql import functions as F

        rows = make_images(6)
        df = spark.createDataFrame(
            [(r["image_id"], bytearray(r["bytes"]), r["phash"]) for r in rows],
            "image_id string, bytes binary, phash long",
        )
        got = df.select(
            "image_id", "phash", image_features_udf(F.col("bytes")).alias("f")
        ).collect()
        for r in got:
            assert r["f"]["feat_phash"] == r["phash"]  # same pixels → same hash
            assert len(r["f"]["feat_mean"]) == 3
            assert r["f"]["feat_edge_density"] is not None
        # solid image (idx 0) has zero edges; gradient (idx 1) does not
        by_id = {r["image_id"]: r["f"] for r in got}
        assert by_id["img_000000000000"]["feat_edge_density"] == 0.0
        assert by_id["img_000000000001"]["feat_edge_density"] > 0.0

    def test_video_frame_sampling(self, spark):
        import struct
        from lightcrawler_spark.fixtures import make_images
        from lightcrawler_spark.imagecodec import decode_image
        from lightcrawler_spark.operators.images import sample_video_frames

        frames = [r["bytes"] for r in make_images(25)]
        blob = b"".join(struct.pack(">I", len(f)) + f for f in frames)
        df = spark.createDataFrame(
            [("vid0", bytearray(blob))], "video_id string, bytes binary"
        )
        out = sample_video_frames(df, every_nth=10).collect()
        assert [(r["video_id"], r["frame_idx"]) for r in out] == [
            ("vid0", 0), ("vid0", 10), ("vid0", 20)
        ]
        # sampled frames decode to the original pixels
        a = decode_image(bytes(out[1]["frame_bytes"]))
        b = decode_image(frames[10])
        assert (a == b).all()


class TestImageCaptionFilter:
    def test_branch_precedence_and_dedup(self, spark):
        from lightcrawler_spark.operators.images import (
            filter_image_caption_pairs,
        )

        rows = [
            # (id, w, h, caption, phash)
            ("a", 32, 100, "one two three four", 1),   # too_small
            ("b", 100, 400, "one two three four", 2),  # bad_aspect
            ("c", 100, 100, "one two", 3),             # caption_short
            ("d", 100, 100, "x " * 200, 4),            # caption_long
            ("e", 100, 100, "!!! ??? ###", 5),         # caption_punct
            ("f", 100, 100, "one two three four", 7),  # keep (first of phash 7)
            ("g", 100, 100, "five six seven eight", 7),  # near_dup of f
            # rejected row must NOT shadow a good duplicate:
            ("h", 10, 10, "one two three four", 9),    # too_small, phash 9
            ("i", 100, 100, "one two three four", 9),  # keep (h is not a survivor)
        ]
        df = spark.createDataFrame(
            rows, "image_id string, w int, h int, caption string, phash long"
        )
        out = {
            r["image_id"]: (r["keep"], r["reject_reason"])
            for r in filter_image_caption_pairs(df).collect()
        }
        assert out == {
            "a": (False, "too_small"),
            "b": (False, "bad_aspect"),
            "c": (False, "caption_short"),
            "d": (False, "caption_long"),
            "e": (False, "caption_punct"),
            "f": (True, None),
            "g": (False, "near_dup"),
            "h": (False, "too_small"),
            "i": (True, None),
        }


class TestAugment:
    def test_permutations_exact(self, spark):
        import numpy as np

        from lightcrawler_spark.fixtures import make_images
        from lightcrawler_spark.imagecodec import decode_image
        from lightcrawler_spark.operators.images import augment_images

        imgs = make_images(6)
        df = spark.createDataFrame(
            [(r["image_id"], bytearray(r["bytes"]), r["fmt"]) for r in imgs],
            "image_id string, bytes binary, fmt string",
        )
        out = augment_images(df).collect()
        assert len(out) == 24
        src = {r["image_id"]: decode_image(r["bytes"]) for r in imgs}
        for row in out:
            arr = src[row["image_id"]]
            got = decode_image(bytes(row["bytes_aug"]))
            op = row["op"]
            exp = {"hflip": arr[:, ::-1], "vflip": arr[::-1, :],
                   "rot90": np.rot90(arr), "rot180": arr[::-1, ::-1]}[op]
            assert got.shape == exp.shape
            assert np.array_equal(got, exp) or row["fmt"] != "png"
            assert (row["aug_w"], row["aug_h"]) == (exp.shape[1], exp.shape[0])

    def test_unknown_op_raises(self, spark):
        import pytest as _pytest

        from lightcrawler_spark.operators.images import augment_images

        df = spark.createDataFrame(
            [("a", bytearray(b"x"), "png")], "image_id string, bytes binary, fmt string"
        )
        with _pytest.raises(ValueError):
            augment_images(df, ops=("hflip", "sepia"))


class TestDHash:
    def test_known_patterns(self):
        from lightcrawler_spark.imagecodec import dhash64

        # strictly increasing left->right gradient: every bit set -> -1
        ramp = np.tile(np.linspace(0, 200, 36, dtype=np.uint8), (24, 1))
        arr = np.stack([ramp] * 3, axis=2)
        assert dhash64(arr) == -1
        # constant image: no gradient anywhere -> 0
        flat = np.full((24, 36, 3), 77, dtype=np.uint8)
        assert dhash64(flat) == 0

    def test_brightness_shift_invariance(self):
        from lightcrawler_spark.imagecodec import dhash64

        rng = np.random.default_rng(7)
        base = rng.integers(0, 180, size=(40, 40, 3)).astype(np.uint8)
        shifted = (base.astype(np.int32) + 50).astype(np.uint8)  # no clip
        assert dhash64(base) == dhash64(shifted)

    def test_udf_matches_kernel(self, spark):
        from lightcrawler_spark.imagecodec import dhash64
        from lightcrawler_spark.operators.images import with_dhash

        imgs = make_images(8)
        df = spark.createDataFrame(
            [(r["image_id"], bytearray(r["bytes"])) for r in imgs],
            "image_id string, bytes binary",
        )
        got = {r.image_id: r.dhash_calc for r in with_dhash(df).collect()}
        for r in imgs:
            assert got[r["image_id"]] == dhash64(decode_image(r["bytes"]))

    def test_bad_blob_yields_null(self, spark):
        from lightcrawler_spark.operators.images import with_dhash

        df = spark.createDataFrame(
            [("bad", bytearray(b"not an image"))],
            "image_id string, bytes binary",
        )
        assert with_dhash(df).collect()[0].dhash_calc is None


class TestConsensusPairs:
    def test_dhash_vetoes_phash_only_matches(self, spark):
        from lightcrawler_spark.operators.images import (
            consensus_near_dup_pairs,
        )

        rows = [
            # A/B: identical phash, dhash 16 bits apart -> vetoed
            ("A", 0x1234567890ABCDEF, 0x0000000000000000),
            ("B", 0x1234567890ABCDEF, 0x000000000000FFFF),
            # C/D: 2 bits apart in each family -> kept
            ("C", 0x1111000011110000, 0x2222000022220000),
            ("D", 0x1111000011110003, 0x2222000022220003),
            # E: unrelated in both -> no pair
            ("E", -0x7777888899990000, 0x0F0F0F0F0F0F0F0F),
        ]
        df = spark.createDataFrame(
            rows, "image_id string, phash long, dhash long")
        got = {(r.id_a, r.id_b): (r.phash_hamming, r.dhash_hamming)
               for r in consensus_near_dup_pairs(df).collect()}
        assert got == {("C", "D"): (2, 2)}

    def test_matches_brute_force_on_fixture(self, spark):
        from __spark_entry__ import _consensus_fixture
        from lightcrawler_spark.imagecodec import decode_image, dhash64, phash64
        from lightcrawler_spark.operators.images import (
            consensus_near_dup_pairs, dhash_udf, phash_udf,
        )
        from pyspark.sql import functions as F

        imgs = _consensus_fixture()
        df = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in imgs],
            "image_id string, bytes binary")
        hashed = df.select(
            "image_id", phash_udf(F.col("bytes")).alias("phash"),
            dhash_udf(F.col("bytes")).alias("dhash"))
        got = {(r.id_a, r.id_b)
               for r in consensus_near_dup_pairs(hashed).collect()}
        h = {i: (phash64(decode_image(b)), dhash64(decode_image(b)))
             for i, b in imgs}

        def chunks(v):
            return {(k, (v >> (k * 16)) & 0xFFFF) for k in range(4)}

        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        ids = sorted(h)
        want = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if (chunks(h[a][0]) & chunks(h[b][0])
                        and ham(h[a][0], h[b][0]) <= 6
                        and ham(h[a][1], h[b][1]) <= 6):
                    want.add((a, b))
        assert got == want and want  # non-empty, exact


def test_normalize_orientation_roundtrip_and_hash_unify(spark):
    """Each orientation is undone by its inverse, and a camera-rotated
    duplicate phashes identically after normalization."""
    import numpy as np
    from pyspark.sql import functions as F

    from lightcrawler_spark.fixtures import make_image_array
    from lightcrawler_spark.imagecodec import decode_image, encode_image, phash64
    from lightcrawler_spark.operators.images import (
        _ORIENT_OPS, normalize_orientation,
    )

    base = make_image_array(5, 32, 24)
    # stored = the camera's raw sensor pixels for each orientation tag:
    # applying the tag must recover the upright image
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    rows = []
    for o in range(1, 9):
        stored = np.ascontiguousarray(
            _ORIENT_OPS[inverse[o]](base)
        ).astype(np.uint8)
        rows.append((o, bytearray(encode_image(stored, "png")), o))
    df = spark.createDataFrame(
        rows, "image_id long, bytes binary, orientation int"
    )
    out = {r["image_id"]: r for r in normalize_orientation(df).collect()}
    up_hash = phash64(base)
    for o in range(1, 9):
        arr = decode_image(bytes(out[o]["bytes_oriented"]))
        assert arr.shape == base.shape, o
        assert (arr == base).all(), f"orientation {o} not recovered"
        assert phash64(arr) == up_hash
        assert out[o]["was_rotated"] == (o >= 5)
    # null orientation = upright passthrough of pixels
    df2 = spark.createDataFrame(
        [(0, bytearray(encode_image(base.astype(np.uint8), "png")), None)],
        "image_id long, bytes binary, orientation int",
    )
    r = normalize_orientation(df2).first()
    assert (decode_image(bytes(r["bytes_oriented"])) == base).all()


def test_privacy_pipeline_unifies_rotated_duplicates(spark):
    """The chain theorem, asserted per pair: scrub -> orient makes each
    rotated duplicate phash EQUAL to its upright sibling, and every
    GPS tEXt chunk is removed."""
    import __spark_entry__ as e

    out = {r["image_id"]: r
           for r in e.q_privacy_pipeline(spark, "").collect()}
    assert len(out) == 16
    for i in range(8):
        up, rot = out[i * 2], out[i * 2 + 1]
        assert up["phash"] == rot["phash"], f"pair {i}"
        assert (up["was_rotated"], rot["was_rotated"]) == (False, True)
        assert up["chunks_removed"] == 1
        assert rot["chunks_removed"] == 1
    # distinct base images stay distinct
    assert len({r["phash"] for r in out.values()}) == 8
