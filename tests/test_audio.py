"""Audio operators: real RIFF/PCM kernel (cross-checked against the
stdlib ``wave`` module) + Spark plumbing over binary columns."""

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.operators.audio import (
    audio_features_udf,
    make_wav_bytes,
    parse_wav,
    resample_audio,
    synth_square_wav_udf,
    with_audio_meta,
)


def _stdlib_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


class TestWavKernel:
    def test_writer_readable_by_stdlib(self):
        rng = np.random.default_rng(7)
        s = rng.integers(-32768, 32768, size=400, dtype=np.int64)
        blob = make_wav_bytes(s, rate=16000, channels=2)
        with wave.open(io.BytesIO(blob), "rb") as w:
            assert w.getnchannels() == 2
            assert w.getframerate() == 16000
            assert w.getsampwidth() == 2
            assert w.getnframes() == 200
            assert w.readframes(200) == s.astype("<i2").tobytes()

    def test_parser_reads_stdlib_output(self):
        s = np.arange(-300, 300, dtype=np.int64)
        blob = _stdlib_wav(s, rate=8000, channels=1)
        m = parse_wav(blob)
        assert m is not None
        assert (m["channels"], m["sample_rate"], m["bits"]) == (1, 8000, 16)
        assert m["n_frames"] == 600

    def test_parser_handles_extra_chunks_and_padding(self):
        s = np.ones(10, dtype=np.int64)
        blob = make_wav_bytes(s, rate=8000)
        # splice an odd-length LIST chunk (padded) between fmt and data
        fmt_end = 12 + 8 + 16
        extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"
        spliced = blob[:fmt_end] + extra + blob[fmt_end:]
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        m = parse_wav(spliced)
        assert m is not None and m["n_frames"] == 10

    @pytest.mark.parametrize(
        "junk",
        [None, b"", b"RIFF", b"RIFFxxxxWAVE", b"\x00" * 64,
         b"RIFF\xff\xff\xff\xffWAVEdata"],
    )
    def test_parser_rejects_garbage(self, junk):
        assert parse_wav(junk) is None

    def test_truncated_data_chunk_rejected(self):
        blob = make_wav_bytes(np.ones(100, dtype=np.int64), rate=8000)
        assert parse_wav(blob[:-5]) is None


class TestSparkAudio:
    def _df(self, spark, n=6):
        rows = []
        for i in range(n):
            rate = 8000 * (1 + i % 3)
            ns = 512 + 256 * (i % 2)
            ch = 1 + i % 2
            wave_ = np.where(np.arange(ns) % 64 < 32, 500 + i, -(500 + i))
            frames = np.repeat(wave_, ch)
            rows.append((f"a{i}", bytearray(make_wav_bytes(frames, rate, ch)),
                         rate, ns, ch))
        return spark.createDataFrame(
            rows, "audio_id string, bytes binary, rate int, ns int, ch int"
        )

    def test_meta_roundtrip(self, spark):
        out = with_audio_meta(self._df(spark)).collect()
        for r in out:
            assert r["audio_ok"]
            assert r["channels"] == r["ch"]
            assert r["sample_rate"] == r["rate"]
            assert r["n_frames"] == r["ns"]
            assert r["duration_us"] == r["ns"] * 1_000_000 // r["rate"]

    def test_meta_bad_blob(self, spark):
        df = spark.createDataFrame(
            [("bad", bytearray(b"not a wav"))], "audio_id string, bytes binary"
        )
        r = with_audio_meta(df).collect()[0]
        assert r["audio_ok"] is False and r["n_frames"] is None

    def test_features_match_numpy(self, spark):
        rng = np.random.default_rng(11)
        s = rng.integers(-2000, 2000, size=777, dtype=np.int64)
        s[700:] = 0
        df = spark.createDataFrame(
            [("x", bytearray(make_wav_bytes(s, 8000)))],
            "audio_id string, bytes binary",
        )
        r = df.select(audio_features_udf("bytes").alias("f")).collect()[0]["f"]
        sgn = np.sign(s)
        assert r["peak"] == int(np.abs(s).max())
        assert r["sum_sq"] == int((s * s).sum())
        assert r["zero_crossings"] == int(((sgn[1:] * sgn[:-1]) < 0).sum())
        assert r["n_zero"] == int((s == 0).sum())

    def test_features_channel0_of_stereo(self, spark):
        left = np.full(100, 7, dtype=np.int64)
        right = np.full(100, -9, dtype=np.int64)
        inter = np.empty(200, dtype=np.int64)
        inter[0::2], inter[1::2] = left, right
        df = spark.createDataFrame(
            [("st", bytearray(make_wav_bytes(inter, 8000, channels=2)))],
            "audio_id string, bytes binary",
        )
        r = df.select(audio_features_udf("bytes").alias("f")).collect()[0]["f"]
        assert r["n_frames"] == 100 and r["peak"] == 7 and r["sum_sq"] == 49 * 100

    def test_synth_udf_matches_local(self, spark):
        df = spark.range(4).select(
            F.col("id"),
            synth_square_wav_udf(
                F.lit(8000), F.lit(256), F.lit(1), F.lit(100), F.lit(16),
                (F.col("id") * 32).cast("int"),
            ).alias("bytes"),
        )
        rows = {r["id"]: bytes(r["bytes"]) for r in df.collect()}
        for i, blob in rows.items():
            idx = np.arange(256)
            w = np.where(idx % 16 < 8, 100, -100).astype(np.int64)
            if i:
                w[256 - 32 * i:] = 0
            assert blob == make_wav_bytes(w, 8000, 1)

    def test_resample_decimation_exact(self, spark):
        s = np.where(np.arange(512) % 32 < 16, 321, -321).astype(np.int64)
        df = spark.createDataFrame(
            [("d", bytearray(make_wav_bytes(s, 16000)))],
            "audio_id string, bytes binary",
        )
        out = resample_audio(df, out_rate=8000).collect()[0]
        assert out["out_frames"] == 256
        m = parse_wav(bytes(out["bytes_resampled"]))
        assert m["sample_rate"] == 8000 and m["n_frames"] == 256
        got = np.frombuffer(
            bytes(out["bytes_resampled"]), dtype="<i2",
            offset=m["data_off"], count=256,
        ).astype(np.int64)
        assert np.array_equal(got, s[::2])

    def test_resample_identity(self, spark):
        s = np.arange(-50, 50, dtype=np.int64) * 3
        df = spark.createDataFrame(
            [("i", bytearray(make_wav_bytes(s, 8000)))],
            "audio_id string, bytes binary",
        )
        out = resample_audio(df, out_rate=8000).collect()[0]
        m = parse_wav(bytes(out["bytes_resampled"]))
        got = np.frombuffer(
            bytes(out["bytes_resampled"]), dtype="<i2",
            offset=m["data_off"], count=m["n_frames"],
        ).astype(np.int64)
        assert np.array_equal(got, s)

    def test_resample_bad_blob_null(self, spark):
        df = spark.createDataFrame(
            [("b", bytearray(b"junk"))], "audio_id string, bytes binary"
        )
        out = resample_audio(df, out_rate=8000).collect()[0]
        assert out["bytes_resampled"] is None and out["out_frames"] is None


def test_trim_silence_roundtrip(spark):
    """trim_silence: padded clip round-trips to the unpadded samples;
    all-silent -> empty data chunk; corrupt/NULL -> null rows."""
    import numpy as np
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.audio import (
        make_wav_bytes, parse_wav, trim_silence,
    )

    body = (8000 * np.where((np.arange(120) // 8) % 2 == 0, 1, -1)).astype("<i2")
    padded = np.concatenate(
        [np.zeros(30, dtype="<i2"), body, np.zeros(7, dtype="<i2")]
    )
    rows = [
        (0, bytearray(make_wav_bytes(padded, 8000))),
        (1, bytearray(make_wav_bytes(np.zeros(50, dtype="<i2"), 8000))),
        (2, bytearray(b"not a wav")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "clip_id long, bytes binary")
    out = {r["clip_id"]: r for r in trim_silence(df).collect()}
    assert (out[0]["trim_start"], out[0]["trim_end_cut"],
            out[0]["n_samples_out"]) == (30, 7, 120)
    assert bytes(out[0]["bytes_trimmed"]) == make_wav_bytes(body, 8000)
    assert out[1]["n_samples_out"] == 0
    assert parse_wav(bytes(out[1]["bytes_trimmed"]))["n_frames"] == 0
    assert out[2]["bytes_trimmed"] is None
    assert out[3]["trim_start"] is None


class TestAudioQuality:
    """Recording-defect screens (with_audio_quality +
    audio_defect_expr): verdict paths pinned per archetype."""

    def _run(self, spark, rows):
        from lightcrawler_spark.operators.audio import (
            audio_defect_expr,
            with_audio_quality,
        )

        df = spark.createDataFrame(rows, "clip_id long, bytes binary")
        out = (
            with_audio_quality(df)
            .withColumn("defective", audio_defect_expr())
            .collect()
        )
        return {r["clip_id"]: r for r in out}

    def test_defect_paths(self, spark):
        from lightcrawler_spark.operators.audio import make_wav_bytes

        def wav(s):
            return bytearray(
                make_wav_bytes(np.asarray(s, dtype=np.int16), 16000)
            )

        rng = np.random.default_rng(90)
        clean = rng.integers(-8000, 8001, size=2000)
        partial = clean.copy(); partial[500:650] = 32767
        dropout = clean.copy(); dropout[100:1900] = 0
        dc = np.clip(clean + 5000, -32768, 32767)
        got = self._run(spark, [
            (0, wav(clean)),
            (1, wav(np.tile([32767, -32768], 1000))),
            (2, wav(partial)),
            (3, wav(dropout)),
            (4, wav(dc)),
            (5, wav(np.zeros(2000))),
            (6, bytearray(b"nope")),
            (7, None),
        ])
        assert got[0]["defective"] is False
        assert got[1]["defective"] is True
        assert got[1]["aq_max_clip_run"] == 2000   # one unbroken rail run
        assert got[2]["defective"] is True         # 150/2000 = 7.5% > 1%
        assert got[2]["aq_max_clip_run"] == 150
        assert got[3]["defective"] is True         # 1800-frame zero gap
        assert got[3]["aq_max_zero_run"] >= 1800
        assert got[4]["defective"] is True         # ~15% DC offset
        assert got[5]["defective"] is True         # 2000-frame zero run
        assert got[6]["defective"] is None and got[6]["aq_ok"] is False
        assert got[7]["defective"] is None

    def test_empty_clip_null_verdict(self, spark):
        from lightcrawler_spark.operators.audio import make_wav_bytes

        got = self._run(spark, [
            (0, bytearray(make_wav_bytes(np.zeros(0, dtype=np.int16), 16000))),
        ])
        assert got[0]["aq_n_frames"] == 0
        assert got[0]["defective"] is None
