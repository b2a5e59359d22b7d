"""Round-4b image-curation additions: eval-set phash decontamination,
frequent-caption boilerplate flagging, PSNR pair verification."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from lightcrawler_spark.imagecodec import encode_image
from lightcrawler_spark.operators.images import (
    flag_frequent_captions,
    phash_decontaminate,
    psnr_verify_pairs,
)


def _flip_bits(h: int, bits) -> int:
    for b in bits:
        h ^= 1 << b
    h &= (1 << 64) - 1
    return h - (1 << 64) if h >= 1 << 63 else h  # signed int64 wrap


class TestPhashDecontaminate:
    def test_exact_anti_semantics(self, spark):
        base = 0x0123_4567_89AB_CDEF
        # corpus: id 0 == eval hash, id 1 at Hamming 6 spread over all
        # four 16-bit chunks (banding at bands=7 must still find it),
        # id 2 at Hamming 7 (just past the radius -> kept), id 3 far
        corpus = spark.createDataFrame(
            [
                (0, base),
                (1, _flip_bits(base, [1, 17, 33, 49, 60, 63])),
                (2, _flip_bits(base, [1, 17, 33, 49, 60, 63, 5])),
                (3, ~base & 0x7FFF_FFFF_FFFF_FFFF),
            ],
            "image_id long, phash long",
        )
        evalset = spark.createDataFrame([(base,)], "phash long")
        kept = sorted(
            r.image_id
            for r in phash_decontaminate(corpus, evalset, max_hamming=6)
            .collect()
        )
        assert kept == [2, 3]

    def test_null_phash_kept_and_columns_preserved(self, spark):
        corpus = spark.createDataFrame(
            [(0, 7, "a"), (1, None, "b")],
            "image_id long, phash long, caption string",
        )
        evalset = spark.createDataFrame([(7,)], "phash long")
        out = phash_decontaminate(corpus, evalset).collect()
        assert [(r.image_id, r.caption) for r in out] == [(1, "b")]
        assert set(out[0].asDict()) == {"image_id", "phash", "caption"}

    def test_partitioning_invariance(self, spark):
        rows = [(i, (i * 2654435761) & 0x7FFF_FFFF_FFFF_FFFF)
                for i in range(300)]
        corpus = spark.createDataFrame(rows, "image_id long, phash long")
        evalset = spark.createDataFrame(
            [(h,) for _, h in rows[::10]], "phash long")
        outs = []
        for parts in (1, 8):
            outs.append(sorted(
                r.image_id
                for r in phash_decontaminate(
                    corpus.repartition(parts), evalset, max_hamming=2,
                ).collect()
            ))
        assert outs[0] == outs[1]
        # every exact eval member is gone
        assert not set(outs[0]) & set(range(0, 300, 10))


class TestFlagFrequentCaptions:
    def test_flagging_and_normalization(self, spark):
        df = spark.createDataFrame(
            [
                (0, "Stock  Photo"),
                (1, "  stock photo "),
                (2, "STOCK\tPHOTO"),
                (3, "a rare sunset over the fjord"),
                (4, None),
            ],
            "image_id long, caption string",
        )
        out = {r.image_id: r for r in
               flag_frequent_captions(df, min_freq=3).collect()}
        assert all(out[i].caption_boilerplate for i in (0, 1, 2))
        assert all(out[i].caption_freq == 3 for i in (0, 1, 2))
        assert out[0].caption_norm == "stock photo"
        assert not out[3].caption_boilerplate and out[3].caption_freq == 0
        assert not out[4].caption_boilerplate and out[4].caption_freq == 0
        assert out[4].caption_norm is None

    def test_threshold_boundary(self, spark):
        df = spark.createDataFrame(
            [(i, "dup" if i < 4 else f"u{i}") for i in range(10)],
            "image_id long, caption string",
        )
        out4 = flag_frequent_captions(df, min_freq=4)
        assert out4.filter("caption_boilerplate").count() == 4
        out5 = flag_frequent_captions(df, min_freq=5)
        assert out5.filter("caption_boilerplate").count() == 0

    def test_null_captions_never_counted_together(self, spark):
        # 5 null captions must NOT form a frequent "null group"
        df = spark.createDataFrame(
            [(i, None) for i in range(5)], "image_id long, caption string")
        out = flag_frequent_captions(df, min_freq=2).collect()
        assert all(not r.caption_boilerplate and r.caption_freq == 0
                   for r in out)


def _noisy(arr: np.ndarray, seed: int, amp: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    noise = rng.integers(-amp, amp + 1, size=arr.shape)
    return np.clip(arr.astype(np.int32) + noise, 0, 255).astype(np.uint8)


class TestPsnrVerifyPairs:
    @pytest.fixture(scope="class")
    def images(self, spark):
        base = (np.arange(24 * 24 * 3, dtype=np.uint8)
                .reshape(24, 24, 3) * 7 % 251).astype(np.uint8)
        other = np.full((16, 16, 3), 200, dtype=np.uint8)
        rows = [
            (0, bytearray(encode_image(base, "png"))),
            # amp=1 noise: MSE <= 1 -> PSNR >= 48 dB (verified dup)
            (1, bytearray(encode_image(_noisy(base, 1, 1), "png"))),
            # amp=80 noise: PSNR ~ 12 dB (hash-collision false positive)
            (2, bytearray(encode_image(_noisy(base, 2, 80), "png"))),
            (3, bytearray(encode_image(base, "png"))),   # exact dup
            (4, bytearray(encode_image(other, "png"))),  # dim mismatch
            (5, bytearray(b"not an image")),             # undecodable
            (6, None),                                   # null blob
        ]
        return spark.createDataFrame(rows, "image_id long, bytes binary")

    def test_verdicts(self, spark, images):
        pairs = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6)],
            "id_a long, id_b long",
        )
        out = {(r.id_a, r.id_b): r for r in
               psnr_verify_pairs(pairs, images).collect()}
        assert out[(0, 1)].psnr_ok and out[(0, 1)].psnr_db >= 40.0
        assert not out[(0, 2)].psnr_ok and out[(0, 2)].psnr_db < 20.0
        assert out[(0, 3)].psnr_ok and out[(0, 3)].psnr_db == 999.0
        assert not out[(0, 4)].psnr_ok and out[(0, 4)].psnr_db == 0.0
        assert not out[(0, 5)].psnr_ok and out[(0, 5)].psnr_db is None
        assert not out[(0, 6)].psnr_ok and out[(0, 6)].psnr_db is None

    def test_lossy_roundtrip_passes_gate(self, spark, images):
        # fakelossy quantization step 4 -> ~46 dB, inside the gate;
        # proves the lossy-format path of the input_hint invariant
        base = (np.arange(20 * 20 * 3, dtype=np.uint8)
                .reshape(20, 20, 3) * 3 % 256).astype(np.uint8)
        imgs = spark.createDataFrame(
            [(0, bytearray(encode_image(base, "png"))),
             (1, bytearray(encode_image(base, "jpeg")))],
            "image_id long, bytes binary",
        )
        pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
        r = psnr_verify_pairs(pairs, imgs).collect()[0]
        assert r.psnr_ok and 40.0 <= r.psnr_db < 60.0
