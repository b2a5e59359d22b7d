"""Audio payload operators — the audio leg of the multimodal column
model (image: operators/images.py, video: sample_video_frames; this
module completes image/audio/video over opaque ``binary`` columns).

Reference analog: the crawl engine treats non-HTML bodies as opaque
bytes gated by content-type receive rules
(vendor/PHPCrawl_083/libs/PHPCrawlerHTTPRequest.class.php:1150-1174);
a training pipeline then needs typed decode / feature / resample passes
over those bytes. Unlike the image codecs (deterministic stand-ins for
the lossy formats), the WAV container here is parsed and written FOR
REAL — RIFF/PCM is pure struct arithmetic, so no codec library is
required and the unit tests round-trip against the stdlib ``wave``
module.

Scale shape: every operator is a ``pandas_udf`` / ``mapInPandas`` over
Arrow batches — bytes never leave the executor, one Python hop per
batch, no shuffle. Feature outputs are exact integers (sum of int16²
over any sane clip fits int64), so the contract oracles re-derive them
arithmetically from the synthesis parameters.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "make_wav_bytes",
    "parse_wav",
    "synth_square_wav_udf",
    "audio_meta_udf",
    "with_audio_meta",
    "audio_features_udf",
    "audio_quality_udf",
    "with_audio_quality",
    "audio_defect_expr",
    "resample_audio",
    "trim_silence",
]


# ---------------------------------------------------------------------------
# plain-Python WAV kernel (runs inside Arrow batches on executors)
# ---------------------------------------------------------------------------

def make_wav_bytes(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """Serialize int16 PCM to a canonical RIFF/WAVE blob.

    ``samples`` is 1-D interleaved (frame-major) int16; ``len(samples)``
    must be a multiple of ``channels``.
    """
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, rate, byte_rate, block_align, 16
    )
    data_hdr = struct.pack("<4sI", b"data", len(pcm))
    riff_len = 4 + len(fmt) + len(data_hdr) + len(pcm)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data_hdr + pcm


def parse_wav(blob: bytes):
    """Walk the RIFF chunk list; return a dict or None if not PCM WAV.

    Handles chunk order variance and odd-length chunk padding per the
    RIFF spec; only uncompressed PCM (format tag 1) with 16-bit samples
    is decoded downstream.
    """
    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos, n = 12, len(blob)
    fmt_info, data_span = None, None
    while pos + 8 <= n:
        cid, clen = struct.unpack_from("<4sI", blob, pos)
        body = pos + 8
        if body + clen > n:
            return None
        if cid == b"fmt " and clen >= 16:
            tag, ch, rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", blob, body
            )
            fmt_info = (tag, ch, rate, bits)
        elif cid == b"data":
            data_span = (body, clen)
        pos = body + clen + (clen & 1)
    if fmt_info is None or data_span is None:
        return None
    tag, ch, rate, bits = fmt_info
    if tag != 1 or ch < 1 or rate < 1 or bits not in (8, 16, 24, 32):
        return None
    off, dlen = data_span
    frame_bytes = ch * (bits // 8)
    n_frames = dlen // frame_bytes if frame_bytes else 0
    return {
        "channels": ch,
        "sample_rate": rate,
        "bits": bits,
        "n_frames": n_frames,
        "data_off": off,
        "data_len": n_frames * frame_bytes,
    }


def _decode_channel0(blob: bytes, meta) -> np.ndarray:
    """First channel as int32 (exact int16 values, headroom for math)."""
    if meta["bits"] != 16:
        return np.zeros(0, dtype=np.int64)
    raw = np.frombuffer(
        blob, dtype="<i2", count=meta["n_frames"] * meta["channels"],
        offset=meta["data_off"],
    )
    return raw[:: meta["channels"]].astype(np.int64)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

@pandas_udf(T.BinaryType())
def synth_square_wav_udf(
    rate: pd.Series, n: pd.Series, channels: pd.Series,
    amp: pd.Series, period: pd.Series, silence: pd.Series,
) -> pd.Series:
    """Distributed fixture synthesis: amp-level square wave of the given
    period with a trailing all-zero tail, duplicated across channels —
    generated executor-side from scalar params so benchmarks never
    funnel blobs through the driver."""
    out = []
    for r, nn, ch, a, p, s in zip(rate, n, channels, amp, period, silence):
        nn, ch, a, p, s = int(nn), int(ch), int(a), int(p), int(s)
        idx = np.arange(nn)
        wave = np.where((idx % p) < p // 2, a, -a).astype(np.int64)
        if s > 0:
            wave[nn - s:] = 0
        frames = np.repeat(wave, ch).astype("<i2")
        out.append(make_wav_bytes(frames, int(r), ch))
    return pd.Series(out)


_META_SCHEMA = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_us", T.LongType()),
    ]
)


@pandas_udf(_META_SCHEMA)
def audio_meta_udf(data: pd.Series) -> pd.DataFrame:
    """Parse container metadata per blob (Arrow batch in, struct out)."""
    rows = {k.name: [] for k in _META_SCHEMA}
    for b in data:
        m = parse_wav(bytes(b) if b is not None else None)
        if m is None:
            for k in rows:
                rows[k].append(False if k == "ok" else None)
            continue
        rows["ok"].append(True)
        rows["channels"].append(m["channels"])
        rows["sample_rate"].append(m["sample_rate"])
        rows["bits"].append(m["bits"])
        rows["n_frames"].append(m["n_frames"])
        rows["duration_us"].append(m["n_frames"] * 1_000_000 // m["sample_rate"])
    return pd.DataFrame(rows)


def with_audio_meta(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    m = F.col("_am")
    return (
        df.withColumn("_am", audio_meta_udf(F.col(bytes_col)))
        .withColumn("audio_ok", m["ok"])
        .withColumn("channels", m["channels"])
        .withColumn("sample_rate", m["sample_rate"])
        .withColumn("bits", m["bits"])
        .withColumn("n_frames", m["n_frames"])
        .withColumn("duration_us", m["duration_us"])
        .drop("_am")
    )


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("n_zero", T.LongType()),
    ]
)


@pandas_udf(_FEAT_SCHEMA)
def audio_features_udf(data: pd.Series) -> pd.DataFrame:
    """Channel-0 PCM features, all exact integers: peak |amplitude|,
    Σ sample² (int64 — 16-bit audio would need >2^33 frames to
    overflow), strict sign-change count, zero-sample count. Integer
    outputs keep the oracle hash-exact and make silence/energy gates
    (the audio analog of the Gopher text gates) reproducible."""
    rows = {k.name: [] for k in _FEAT_SCHEMA}
    for b in data:
        m = parse_wav(bytes(b) if b is not None else None)
        if m is None or m["bits"] != 16:
            for k in rows:
                rows[k].append(False if k == "ok" else None)
            continue
        s = _decode_channel0(bytes(b), m)
        sgn = np.sign(s)
        rows["ok"].append(True)
        rows["n_frames"].append(int(s.size))
        rows["peak"].append(int(np.abs(s).max()) if s.size else 0)
        rows["sum_sq"].append(int((s * s).sum()))
        rows["zero_crossings"].append(
            int(((sgn[1:] * sgn[:-1]) < 0).sum()) if s.size > 1 else 0
        )
        rows["n_zero"].append(int((s == 0).sum()))
    return pd.DataFrame(rows)


def resample_audio(df: DataFrame, out_rate: int,
                   bytes_col: str = "bytes") -> DataFrame:
    """Linear-interpolation resample of channel 0 to ``out_rate``,
    re-serialized as mono WAV in ``bytes_resampled`` (+ ``out_frames``).

    ``mapInPandas`` so input and output blobs stay in the same Arrow
    batch; integer-ratio downsampling lands exactly on input samples
    (np.interp at integral positions), which the contract query
    exploits for an arithmetic oracle.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes_resampled", T.BinaryType()),
            T.StructField("out_frames", T.LongType()),
        ]
    )

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, counts = [], []
            for b in pdf[bytes_col]:
                m = parse_wav(bytes(b) if b is not None else None)
                if m is None or m["bits"] != 16 or m["n_frames"] == 0:
                    blobs.append(None)
                    counts.append(None)
                    continue
                s = _decode_channel0(bytes(b), m).astype(np.float64)
                in_rate = m["sample_rate"]
                n_out = max(int(s.size * out_rate // in_rate), 1)
                pos = np.arange(n_out, dtype=np.float64) * (in_rate / out_rate)
                pos = np.minimum(pos, s.size - 1)
                res = np.interp(pos, np.arange(s.size, dtype=np.float64), s)
                pcm = np.clip(np.rint(res), -32768, 32767).astype("<i2")
                blobs.append(make_wav_bytes(pcm, out_rate, 1))
                counts.append(n_out)
            pdf = pdf.copy()
            pdf["bytes_resampled"] = blobs
            pdf["out_frames"] = pd.array(counts, dtype="Int64")
            yield pdf

    return df.mapInPandas(_resample, schema=out_schema)


def trim_silence(df: DataFrame, threshold: int = 256,
                 bytes_col: str = "bytes") -> DataFrame:
    """Leading/trailing silence trim — the first pass of every speech/
    audio curation pipeline (silence padding wastes tokens/compute and
    skews duration stats). A sample is NON-silent when |s| > threshold
    on the int16 scale; the clip is cut to [first, last] non-silent
    sample of channel 0 and re-emitted as mono WAV (the resample_audio
    channel-0 convention). Pure integer comparisons — exact under any
    batch split.

    Adds: ``bytes_trimmed`` (mono WAV; 0-sample data chunk when the
    whole clip is silent), ``trim_start`` / ``trim_end_cut`` (samples
    removed from head / tail), ``n_samples_out``. NULL/non-WAV blobs
    yield null rows (sibling-UDF convention). One Arrow pass, no
    shuffle.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes_trimmed", T.BinaryType()),
            T.StructField("trim_start", T.LongType()),
            T.StructField("trim_end_cut", T.LongType()),
            T.StructField("n_samples_out", T.LongType()),
        ]
    )
    in_cols = df.schema.fieldNames()

    def _trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, st, en, ns = [], [], [], []
            for b in pdf[bytes_col]:
                meta = parse_wav(bytes(b)) if b is not None else None
                if meta is None:
                    outs.append(None); st.append(None)
                    en.append(None); ns.append(None)
                    continue
                x = _decode_channel0(bytes(b), meta)
                nz = np.nonzero(np.abs(x) > threshold)[0]
                if len(nz) == 0:
                    lo, hi = 0, 0
                else:
                    lo, hi = int(nz[0]), int(nz[-1]) + 1
                outs.append(make_wav_bytes(x[lo:hi], meta["sample_rate"], 1))
                st.append(lo)
                en.append(len(x) - hi)
                ns.append(hi - lo)
            pdf = pdf[in_cols].copy()
            pdf["bytes_trimmed"] = outs
            pdf["trim_start"] = pd.array(st, dtype="Int64")
            pdf["trim_end_cut"] = pd.array(en, dtype="Int64")
            pdf["n_samples_out"] = pd.array(ns, dtype="Int64")
            yield pdf

    return df.mapInPandas(_trim, out_schema)


_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("aq_ok", T.BooleanType()),
        T.StructField("aq_n_frames", T.LongType()),
        T.StructField("aq_clip_count", T.LongType()),
        T.StructField("aq_max_clip_run", T.LongType()),
        T.StructField("aq_max_zero_run", T.LongType()),
        T.StructField("aq_dc_sum", T.LongType()),
    ]
)


def _max_run(mask: np.ndarray) -> int:
    """Longest run of True in a boolean array (0 for empty/no True)."""
    if mask.size == 0 or not mask.any():
        return 0
    edges = np.flatnonzero(
        np.diff(np.concatenate(([0], mask.view(np.int8), [0])))
    )
    return int((edges[1::2] - edges[::2]).max())


@pandas_udf(_QUALITY_SCHEMA)
def audio_quality_udf(data: pd.Series) -> pd.DataFrame:
    """Recording-defect signals over channel 0, all exact integers —
    the audio curation screens the energy features don't cover:

    - aq_clip_count / aq_max_clip_run: samples at the int16 rails
      (|s| ≥ 32767 — symmetric, catching both ±32767 and -32768
      encodings of hard clipping) and the longest consecutive rail
      run (sustained clipping vs a single transient peak).
    - aq_max_zero_run: longest run of EXACT zeros — digital dropouts
      and dead gaps (complement of trim_silence, which only cuts the
      edges).
    - aq_dc_sum: Σ samples (int64) — a DC-offset recording chain shows
      a large |mean|, tested downstream by cross-multiplication.

    bits != 16 or an unparseable blob → ok=false, null signals (the
    audio_features_udf convention)."""
    rows = {k.name: [] for k in _QUALITY_SCHEMA}
    for b in data:
        m = parse_wav(bytes(b) if b is not None else None)
        if m is None or m["bits"] != 16:
            for k in rows:
                rows[k].append(False if k == "aq_ok" else None)
            continue
        s = _decode_channel0(bytes(b), m)
        clip = np.abs(s.astype(np.int64)) >= 32767
        zero = s == 0
        rows["aq_ok"].append(True)
        rows["aq_n_frames"].append(int(s.size))
        rows["aq_clip_count"].append(int(clip.sum()))
        rows["aq_max_clip_run"].append(_max_run(clip))
        rows["aq_max_zero_run"].append(_max_run(zero))
        rows["aq_dc_sum"].append(int(s.astype(np.int64).sum()))
    return pd.DataFrame(
        {
            "aq_ok": pd.array(rows["aq_ok"], dtype="boolean"),
            "aq_n_frames": pd.array(rows["aq_n_frames"], dtype="Int64"),
            "aq_clip_count": pd.array(rows["aq_clip_count"], dtype="Int64"),
            "aq_max_clip_run": pd.array(
                rows["aq_max_clip_run"], dtype="Int64"
            ),
            "aq_max_zero_run": pd.array(
                rows["aq_max_zero_run"], dtype="Int64"
            ),
            "aq_dc_sum": pd.array(rows["aq_dc_sum"], dtype="Int64"),
        }
    )


def with_audio_quality(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Attach the defect signals as six typed columns — one Arrow pass,
    row-local, no shuffle."""
    s = audio_quality_udf(F.col(bytes_col))
    return df.withColumn("_aq", s).select("*", "_aq.*").drop("_aq")


def audio_defect_expr(
    clip_pct: int = 1,
    max_zero_run: int = 1600,
    dc_pct: int = 5,
):
    """JVM-side defect verdict (codegen'd; every comparison
    cross-multiplied int64): defective when more than ``clip_pct`` % of
    frames sit at the rails, OR a zero-run exceeds ``max_zero_run``
    frames (≈100 ms at 16 kHz with the default), OR the DC offset
    exceeds ``dc_pct`` % of full scale
    (|Σs|·100 > pct·32768·n). Unparseable clips (aq_ok = false) →
    NULL verdict — can't judge, downstream decides."""
    n = F.col("aq_n_frames")
    bad = (
        (F.col("aq_clip_count") * F.lit(100) > F.lit(int(clip_pct)) * n)
        | (F.col("aq_max_zero_run") > F.lit(int(max_zero_run)))
        | (
            F.abs(F.col("aq_dc_sum")) * F.lit(100)
            > F.lit(int(dc_pct)) * F.lit(32768) * n
        )
    )
    return F.when(F.col("aq_ok") & (n > 0), bad).otherwise(
        F.lit(None).cast("boolean")
    )
