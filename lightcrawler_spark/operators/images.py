"""Image+caption payload operators (BASELINE.json input_hint; SURVEY.md
§7 step 6 — the graft analog of the reference's content decode/extract,
e.g. gzip decode Utils/PHPCrawlerEncodingUtils.class.php:13-33 and the
[tag:img] caption hook worker/ExtractContent.class.php:264-346,741-788).

All operators are ``mapInPandas`` / pandas UDFs over Arrow batches:
binary image bytes stay opaque to Spark (one BinaryType column), decode
happens vectorized per batch, and the outputs are typed columns — the
production shape for multimodal training-data pipelines. The codecs
themselves live in ``imagecodec`` (real PNG; deterministic stand-in for
lossy — see that module's docstring for the swap-in point).

`verify_images` implements the per-row invariant from the input_hint:
decoded dims == (w, h), PSNR ≥ 40 dB vs the reference pixels for lossy
formats (exact for lossless), caption equality is a plain column
comparison upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..imagecodec import decode_image, dhash64, phash64, psnr
from ..fixtures import make_image_array

__all__ = [
    "decode_stats",
    "with_phash",
    "with_dhash",
    "verify_images",
    "phash_near_dup_pairs",
    "consensus_near_dup_pairs",
    "phash_decontaminate",
    "flag_frequent_captions",
    "psnr_verify_pairs",
    "with_image_quality_stats",
    "low_information_expr",
    "with_text_overlay_stats",
    "text_overlay_expr",
    "with_watermark_stats",
    "watermark_band_stats",
    "watermark_expr",
    "with_rot_invariant_hashes",
    "rot_invariant_dedup",
    "with_d4_phashes",
    "rot_near_dup_pairs",
    "normalize_orientation",
    "resize_images",
    "letterbox_images",
    "scrub_image_metadata",
    "image_features_udf",
    "sample_video_frames",
    "filter_image_caption_pairs",
    "image_caption_reject_expr",
    "augment_images",
    "assign_aspect_buckets",
    "SDXL_ASPECT_BUCKETS",
]

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("dec_w", T.IntegerType()),
        T.StructField("dec_h", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


@pandas_udf(_STATS_SCHEMA)
def decode_stats(data: pd.Series) -> pd.DataFrame:
    """Decode + basic pixel stats per image (Arrow batch in, struct out)."""
    rows = {k: [] for k in ("dec_w", "dec_h", "mean_r", "mean_g", "mean_b", "decode_ok")}
    for b in data:
        try:
            arr = decode_image(bytes(b))
            rows["dec_w"].append(int(arr.shape[1]))
            rows["dec_h"].append(int(arr.shape[0]))
            m = arr.reshape(-1, 3).mean(axis=0)
            rows["mean_r"].append(float(round(m[0], 4)))
            rows["mean_g"].append(float(round(m[1], 4)))
            rows["mean_b"].append(float(round(m[2], 4)))
            rows["decode_ok"].append(True)
        except Exception:
            for k, v in (("dec_w", None), ("dec_h", None), ("mean_r", None),
                         ("mean_g", None), ("mean_b", None), ("decode_ok", False)):
                rows[k].append(v)
    return pd.DataFrame(rows)


@pandas_udf(T.LongType())
def phash_udf(data: pd.Series) -> pd.Series:
    out = []
    for b in data:
        try:
            out.append(phash64(decode_image(bytes(b))))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="object")


def with_phash(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("phash_calc", phash_udf(F.col(bytes_col)))


@pandas_udf(T.LongType())
def dhash_udf(data: pd.Series) -> pd.Series:
    """Difference hash per image (imagecodec.dhash64): gradient-sign
    bits, complementing phash64's DCT structure bits — near-dup systems
    band over BOTH hash families to cut false merges. Same Arrow-batch
    shape as phash_udf."""
    out = []
    for b in data:
        try:
            out.append(dhash64(decode_image(bytes(b))))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="object")


def with_dhash(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    return df.withColumn("dhash_calc", dhash_udf(F.col(bytes_col)))


def verify_images(df: DataFrame) -> DataFrame:
    """Per-row invariant check against the fixture's reference pixels:
    decode → dims match → PSNR ≥ 40 dB (lossy) / exact (lossless) →
    phash matches the stored column. Emits one verdict row per image.

    Runs as mapInPandas so reference pixels are regenerated inside the
    batch (deterministic make_image_array) — no second BLOB column is
    shuffled. Input requires: image_id, bytes, w, h, fmt, phash."""

    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("dims_ok", T.BooleanType()),
            T.StructField("psnr_db", T.DoubleType()),
            T.StructField("psnr_ok", T.BooleanType()),
            T.StructField("exact_ok", T.BooleanType()),
            T.StructField("phash_ok", T.BooleanType()),
        ]
    )

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("image_id", "fmt", "dims_ok", "psnr_db",
                                    "psnr_ok", "exact_ok", "phash_ok")}
            for r in pdf.itertuples():
                idx = int(r.image_id.split("_")[-1])
                ref = make_image_array(idx, int(r.w), int(r.h))
                arr = decode_image(bytes(r.bytes))
                p = psnr(ref, arr)
                rows["image_id"].append(r.image_id)
                rows["fmt"].append(r.fmt)
                rows["dims_ok"].append(arr.shape[:2] == (int(r.h), int(r.w)))
                rows["psnr_db"].append(round(p, 2) if np.isfinite(p) else 999.0)
                rows["psnr_ok"].append(p >= 40.0)
                rows["exact_ok"].append(
                    bool((arr == ref).all()) if r.fmt == "png" else True
                )
                # stored phash is over decoded pixels (input_hint) → exact
                rows["phash_ok"].append(phash64(arr) == int(r.phash))
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(
        _verify, out_schema
    )


def _hash_band_keys(col: Column, bands: int) -> list:
    """Band keys for a 64-bit hash column: ``bands`` disjoint bit
    ranges of width ceil(64/bands) (the last band takes the remainder),
    each rendered as "i:value". Pigeonhole: two hashes at Hamming
    distance ≤ bands-1 share at least one band verbatim — so candidate
    generation through these keys has GUARANTEED recall up to distance
    bands-1, and probabilistic recall beyond. Narrower bands buy that
    guarantee with more candidates (a b-bit band has 2^b distinct
    values, so expected bucket sizes grow as corpus/2^b — the standard
    LSH band-count/precision trade)."""
    if not 2 <= bands <= 64:
        raise ValueError(f"bands must be in [2, 64], got {bands}")
    width = -(-64 // bands)
    keys = []
    for i in range(bands):
        lo = i * width
        w = min(width, 64 - lo)
        if w <= 0:
            break
        keys.append(
            F.concat_ws(
                ":", F.lit(i),
                F.shiftrightunsigned(col, lo).bitwiseAND(F.lit((1 << w) - 1)),
            )
        )
    return keys


def phash_near_dup_pairs(df: DataFrame, max_hamming: int = 6,
                         id_col: str = "image_id",
                         phash_col: str = "phash",
                         bands: int = 4) -> DataFrame:
    """Image near-dup pairs by phash Hamming distance: pigeonhole band
    join on ``bands`` bit-range chunks (same scheme as
    textdedup.simhash_pairs), exact popcount filter after.

    Recall: guaranteed up to Hamming distance bands-1 (a pair with
    ≤ bands-1 differing bits must share a band), probabilistic beyond.
    The default bands=4 (16-bit chunks) guarantees only distance 3 —
    cheap candidates, tail recall traded (standard practice). For
    GUARANTEED recall at the default max_hamming=6, pass bands=7
    (10-bit chunks): every true pair is emitted, at the cost of larger
    candidate buckets (2^10 vs 2^16 distinct values per band)."""
    sig = df.select(F.col(id_col).alias("img_id"), F.col(phash_col).alias("ph"))
    chunks = sig.select(
        "img_id", "ph",
        F.explode(F.array(*_hash_band_keys(F.col("ph"), bands)))
        .alias("chunk_key"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, (F.col("a.chunk_key") == F.col("b.chunk_key"))
               & (F.col("a.img_id") < F.col("b.img_id")))
        .select(F.col("a.img_id").alias("id_a"), F.col("b.img_id").alias("id_b"),
                F.col("a.ph").alias("ph_a"), F.col("b.ph").alias("ph_b"))
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    ).filter(F.col("hamming") <= max_hamming)


# --- multimodal transforms -------------------------------------------------

def resize_images(df: DataFrame, out_w: int, out_h: int,
                  bytes_col: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, batch-vectorized.

    Nearest-neighbor is implemented directly in numpy (no imaging lib in
    the container); swap the index-sampling line for a PIL/opencv call
    in production — the Spark plumbing (schema, mapInPandas batch shape,
    re-encode) is the real, tested part. Output column `bytes_resized`
    plus the actual (w, h)."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes_resized", T.BinaryType()),
            T.StructField("resized_w", T.IntegerType()),
            T.StructField("resized_h", T.IntegerType()),
        ]
    )
    in_cols = df.schema.fieldNames()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..imagecodec import encode_image

        for pdf in batches:
            outs, ws, hs = [], [], []
            for b, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                try:
                    arr = decode_image(bytes(b))
                    ys = (np.arange(out_h) * arr.shape[0] // out_h)
                    xs = (np.arange(out_w) * arr.shape[1] // out_w)
                    resized = arr[ys[:, None], xs[None, :]]
                    outs.append(encode_image(resized, fmt))
                    ws.append(out_w)
                    hs.append(out_h)
                except Exception:
                    outs.append(None)
                    ws.append(None)
                    hs.append(None)
            pdf = pdf[in_cols].copy()
            pdf["bytes_resized"] = outs
            pdf["resized_w"] = pd.array(ws, dtype="Int32")
            pdf["resized_h"] = pd.array(hs, dtype="Int32")
            yield pdf

    return df.mapInPandas(_resize, out_schema)


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("feat_phash", T.LongType()),
        T.StructField("feat_mean", T.ArrayType(T.DoubleType())),
        T.StructField("feat_std", T.ArrayType(T.DoubleType())),
        T.StructField("feat_edge_density", T.DoubleType()),
    ]
)


@pandas_udf(_FEATURE_SCHEMA)
def image_features_udf(data: pd.Series) -> pd.DataFrame:
    """Feature extraction per image: phash64, per-channel mean/std,
    gradient-magnitude edge density — numpy only, the embedding-model
    stand-in for downstream similarity / quality filters."""
    rows = {k: [] for k in ("feat_phash", "feat_mean", "feat_std",
                            "feat_edge_density")}
    for b in data:
        try:
            arr = decode_image(bytes(b)).astype(np.float64)
            gray = arr.mean(axis=2)
            gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
            gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
            rows["feat_phash"].append(phash64(arr.astype(np.uint8)))
            rows["feat_mean"].append([round(float(x), 4) for x in arr.reshape(-1, 3).mean(axis=0)])
            rows["feat_std"].append([round(float(x), 4) for x in arr.reshape(-1, 3).std(axis=0)])
            rows["feat_edge_density"].append(round(float(gx + gy), 4))
        except Exception:
            rows["feat_phash"].append(None)
            rows["feat_mean"].append(None)
            rows["feat_std"].append(None)
            rows["feat_edge_density"].append(None)
    return pd.DataFrame(rows)


def sample_video_frames(df: DataFrame, every_nth: int = 10,
                        bytes_col: str = "bytes") -> DataFrame:
    """Video frame sampling — Spark-side plumbing is real (schema,
    posexplode of frames, partitioning); the DECODER IS A STUB because
    no video codec library exists in this container.

    The stub treats the payload as a deterministic fake container: a
    concatenation of PNG frames length-prefixed with 4-byte big-endian
    sizes (what `tests` build). A real deployment swaps `_iter_frames`
    for pyav/ffmpeg; everything downstream (one row per sampled frame,
    frame_idx, frame bytes) is unchanged."""
    out_schema = T.StructType(
        [
            T.StructField("video_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def _iter_frames(blob: bytes):
        import struct as _struct

        pos = 0
        while pos + 4 <= len(blob):
            (n,) = _struct.unpack(">I", blob[pos: pos + 4])
            pos += 4
            if pos + n > len(blob):
                raise NotImplementedError(
                    "real video containers need a codec library "
                    "(pyav/ffmpeg) — not available in this sandbox"
                )
            yield blob[pos: pos + n]
            pos += n

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"video_id": [], "frame_idx": [], "frame_bytes": []}
            for vid, blob in zip(pdf["video_id"], pdf[bytes_col]):
                for i, frame in enumerate(_iter_frames(bytes(blob))):
                    if i % every_nth == 0:
                        rows["video_id"].append(vid)
                        rows["frame_idx"].append(i)
                        rows["frame_bytes"].append(frame)
            yield pd.DataFrame(rows)

    return df.select("video_id", bytes_col).mapInPandas(_sample, out_schema)


def image_caption_reject_expr(
    min_w: int = 64,
    min_h: int = 64,
    max_aspect: float = 3.0,
    min_caption_tokens: int = 3,
    max_caption_tokens: int = 128,
    max_punct_ratio: float = 0.5,
):
    """The stateless (per-row) half of the LAION gate as ONE JVM
    expression — shared by the batch filter and the streaming gate so
    both execution modes apply identical rules. NULL = scalar-pass."""
    cap = F.coalesce(F.col("caption"), F.lit(""))
    tokens = F.size(F.filter(F.split(cap, " "), lambda x: x != ""))
    punct = F.length(F.regexp_replace(cap, "[a-zA-Z0-9 ]", ""))
    punct_ratio = punct / F.greatest(F.length(cap), F.lit(1))
    return (
        F.when((F.col("w") < min_w) | (F.col("h") < min_h), "too_small")
        .when(
            F.greatest(F.col("w"), F.col("h"))
            > F.least(F.col("w"), F.col("h")) * F.lit(float(max_aspect)),
            "bad_aspect",
        )
        .when(tokens < min_caption_tokens, "caption_short")
        .when(tokens > max_caption_tokens, "caption_long")
        .when(punct_ratio > max_punct_ratio, "caption_punct")
    )


def filter_image_caption_pairs(
    df: DataFrame,
    min_w: int = 64,
    min_h: int = 64,
    max_aspect: float = 3.0,
    min_caption_tokens: int = 3,
    max_caption_tokens: int = 128,
    max_punct_ratio: float = 0.5,
    id_col: str = "image_id",
) -> DataFrame:
    """LAION-style joint quality gate for image+caption training pairs.

    Pure JVM expressions over the input_hint metadata columns — no
    decode, no Python: resolution floor, aspect-ratio bound, caption
    token-count window, caption punctuation ratio, then a phash
    first-wins dedup AMONG THE SURVIVORS (a rejected row must never
    shadow a good duplicate). Output keeps every input row with a
    ``keep`` flag and the first matching ``reject_reason`` so a
    pipeline can audit exactly what each gate dropped ("no silent
    caps"). At corpus scale the only shuffle is the phash dedup window,
    an equi-partition on a 64-bit key.
    """
    from pyspark.sql import Window

    scalar_reason = image_caption_reject_expr(
        min_w=min_w, min_h=min_h, max_aspect=max_aspect,
        min_caption_tokens=min_caption_tokens,
        max_caption_tokens=max_caption_tokens,
        max_punct_ratio=max_punct_ratio,
    )
    staged = df.withColumn("_scalar_reason", scalar_reason)
    # rank only the scalar survivors within each phash bucket: a
    # rejected row must never claim the first-wins slot
    w = Window.partitionBy("phash").orderBy(F.col(id_col).asc())
    survivors = staged.filter(F.col("_scalar_reason").isNull()).withColumn(
        "_dup_rank", F.row_number().over(w)
    )
    rejected = staged.filter(F.col("_scalar_reason").isNotNull()).withColumn(
        "_dup_rank", F.lit(None).cast("int")
    )
    out = survivors.unionByName(rejected)
    reason = F.coalesce(
        F.col("_scalar_reason"),
        F.when(F.col("_dup_rank") > 1, "near_dup"),
    )
    return (
        out.withColumn("reject_reason", reason)
        .withColumn("keep", F.col("reject_reason").isNull())
        .drop("_scalar_reason", "_dup_rank")
    )


AUGMENT_OPS = ("hflip", "vflip", "rot90", "rot180")


def augment_images(df: DataFrame, ops: tuple[str, ...] = AUGMENT_OPS,
                   bytes_col: str = "bytes",
                   fmt_col: str = "fmt") -> DataFrame:
    """Deterministic geometric augmentations — one output row per
    (input image, op). The op list is exploded relationally (so Catalyst
    sees the fan-out and sizes partitions for it); the pixel work is one
    ``mapInPandas`` pass per batch. Exact permutations only (flips /
    right-angle rotations) — no interpolation, so every augmented image
    is bit-reproducible and VALUES-oracle-able. Swap the numpy lines for
    PIL/opencv affine ops in production; schema and batch shape are the
    tested contract."""
    unknown = set(ops) - set(AUGMENT_OPS)
    if unknown:
        raise ValueError(f"unknown augment ops: {sorted(unknown)}")
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("op", T.StringType()),
            T.StructField("bytes_aug", T.BinaryType()),
            T.StructField("aug_w", T.IntegerType()),
            T.StructField("aug_h", T.IntegerType()),
        ]
    )
    in_cols = df.schema.fieldNames()
    with_ops = df.withColumn(
        "op", F.explode(F.array(*[F.lit(o) for o in ops]))
    )

    def _apply(arr: np.ndarray, op: str) -> np.ndarray:
        if op == "hflip":
            return arr[:, ::-1]
        if op == "vflip":
            return arr[::-1, :]
        if op == "rot90":
            return np.rot90(arr)
        return arr[::-1, ::-1]  # rot180

    def _augment(batches):
        from ..imagecodec import encode_image

        for pdf in batches:
            outs, ws, hs = [], [], []
            for b, fmt, op in zip(pdf[bytes_col], pdf[fmt_col], pdf["op"]):
                try:
                    arr = decode_image(bytes(b))
                    aug = np.ascontiguousarray(_apply(arr, op))
                    outs.append(encode_image(aug, fmt))
                    ws.append(aug.shape[1])
                    hs.append(aug.shape[0])
                except Exception:
                    outs.append(None)
                    ws.append(None)
                    hs.append(None)
            out = pdf[in_cols + ["op"]].copy()
            out["bytes_aug"] = outs
            out["aug_w"] = pd.array(ws, dtype="Int32")
            out["aug_h"] = pd.array(hs, dtype="Int32")
            yield out

    return with_ops.mapInPandas(_augment, out_schema)


# The SDXL training resolution grid (Podell et al. 2023, appendix I,
# abridged to the common aspect range): all buckets ≈ 1024² pixels so
# batch memory stays constant while aspect varies.
SDXL_ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (1024, 1024),
    (1152, 896), (896, 1152),
    (1216, 832), (832, 1216),
    (1344, 768), (768, 1344),
    (1536, 640), (640, 1536),
)


def assign_aspect_buckets(
    images: DataFrame,
    buckets: tuple[tuple[int, int], ...] = SDXL_ASPECT_BUCKETS,
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Aspect-ratio bucketing for multimodal training batches (the
    NovelAI/SDXL dataloader convention): every image joins the bucket
    whose aspect ratio is nearest its own, so a batch can be collated
    at the bucket's fixed resolution without destructive cropping.

    Assignment = argmin over the bucket list of |w/h − bw/bh|, ties to
    the lowest bucket index. Implemented as ``array_min`` over a
    literal array of (distance, idx, bw, bh) structs — struct
    comparison is lexicographic, so the min IS the argmin with the
    deterministic tie-break, evaluated per row inside codegen: no
    shuffle, no Python, and the identical double arithmetic runs in any
    SQL engine (w/h and bw/bh are single correctly-rounded divisions).

    Output: input columns + ``(aspect, bucket_idx, bucket_w, bucket_h)``.
    """
    w = F.col(w_col).cast("double")
    h = F.col(h_col).cast("double")
    aspect = w / h
    candidates = F.array(
        *[
            F.struct(
                F.abs(aspect - F.lit(float(bw) / float(bh))).alias("dist"),
                F.lit(i).alias("idx"),
                F.lit(bw).alias("bw"),
                F.lit(bh).alias("bh"),
            )
            for i, (bw, bh) in enumerate(buckets)
        ]
    )
    best = F.array_min(candidates)
    return images.withColumns(
        {
            "aspect": F.round(aspect, 6),
            "bucket_idx": best["idx"].cast("int"),
            "bucket_w": best["bw"].cast("int"),
            "bucket_h": best["bh"].cast("int"),
        }
    )


def letterbox_images(df: DataFrame, out_w: int, out_h: int,
                     fill: int = 114, bytes_col: str = "bytes",
                     fmt_col: str = "fmt") -> DataFrame:
    """Aspect-PRESERVING resize into a fixed out_w x out_h canvas
    (letterbox/pad-to-square) -- the CLIP/ViT/YOLO preprocessing path,
    where plain stretch-resize (resize_images) would distort geometry.
    scale = min(out_w/w, out_h/h) with integer floor box dims (min 1 px),
    nearest-neighbor sampling, centered with the YOLO-conventional
    fill=114 gray; emits the content-box geometry (box_x, box_y, box_w,
    box_h) the caption/bbox side needs to map coordinates back.

    Same Arrow-batch mapInPandas shape as resize_images; the numpy
    kernel is the deterministic stand-in (swap for PIL/opencv in
    production, plumbing unchanged).
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes_boxed", T.BinaryType()),
            T.StructField("box_x", T.IntegerType()),
            T.StructField("box_y", T.IntegerType()),
            T.StructField("box_w", T.IntegerType()),
            T.StructField("box_h", T.IntegerType()),
        ]
    )
    in_cols = df.schema.fieldNames()

    def _box(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..imagecodec import encode_image

        for pdf in batches:
            outs, bx, by, bw, bh = [], [], [], [], []
            for b, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                try:
                    arr = decode_image(bytes(b))
                    h, w = arr.shape[0], arr.shape[1]
                    # integer-exact content box: floor(dim * out/other),
                    # never exceeding the canvas, never 0
                    if w * out_h >= h * out_w:  # width-bound
                        cw = out_w
                        ch = max(1, (h * out_w) // w)
                    else:
                        ch = out_h
                        cw = max(1, (w * out_h) // h)
                    ys = (np.arange(ch) * h) // ch
                    xs = (np.arange(cw) * w) // cw
                    content = arr[ys[:, None], xs[None, :]]
                    canvas = np.full((out_h, out_w, 3), fill, dtype=np.uint8)
                    x0 = (out_w - cw) // 2
                    y0 = (out_h - ch) // 2
                    canvas[y0:y0 + ch, x0:x0 + cw] = content
                    outs.append(encode_image(canvas, fmt))
                    bx.append(x0); by.append(y0); bw.append(cw); bh.append(ch)
                except Exception:
                    outs.append(None)
                    bx.append(None); by.append(None)
                    bw.append(None); bh.append(None)
            pdf = pdf[in_cols].copy()
            pdf["bytes_boxed"] = outs
            pdf["box_x"] = pd.array(bx, dtype="Int32")
            pdf["box_y"] = pd.array(by, dtype="Int32")
            pdf["box_w"] = pd.array(bw, dtype="Int32")
            pdf["box_h"] = pd.array(bh, dtype="Int32")
            yield pdf

    return df.mapInPandas(_box, out_schema)


def scrub_image_metadata(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Image-side PII scrub: drop PNG metadata chunks (tEXt/zTXt/iTXt/
    eXIf/tIME -- where EXIF GPS, camera serials, and author comments
    live) by walking the REAL container (imagecodec.strip_png_metadata;
    length/type/CRC per the PNG spec -- no codec stub). Pixels are
    untouched: output decodes bit-identically. Non-PNG blobs pass
    through unchanged (the fakelossy container carries no metadata);
    corrupt blobs yield nulls.

    The text-side siblings are with_pii_scrub (URL/email/phone) and
    dust_key's session strip; this closes the multimodal loop. One
    Arrow batch pass, no shuffle.

    Adds: bytes_clean, meta_chunks_removed, meta_bytes_removed.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes_clean", T.BinaryType()),
            T.StructField("meta_chunks_removed", T.IntegerType()),
            T.StructField("meta_bytes_removed", T.LongType()),
        ]
    )
    in_cols = df.schema.fieldNames()

    def _scrub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..imagecodec import strip_png_metadata

        for pdf in batches:
            outs, ns, bs = [], [], []
            for b in pdf[bytes_col]:
                if b is None:
                    # NULL blob → null row, like the phash/dhash/letterbox
                    # siblings' documented corrupt-blob path
                    outs.append(None); ns.append(None); bs.append(None)
                    continue
                raw = bytes(b)
                if raw[:8] == b"\x89PNG\r\n\x1a\n":
                    try:
                        clean, n, nb = strip_png_metadata(raw)
                        outs.append(clean); ns.append(n); bs.append(nb)
                    except ValueError:
                        outs.append(None); ns.append(None); bs.append(None)
                else:
                    outs.append(raw); ns.append(0); bs.append(0)
            pdf = pdf[in_cols].copy()
            pdf["bytes_clean"] = outs
            pdf["meta_chunks_removed"] = pd.array(ns, dtype="Int32")
            pdf["meta_bytes_removed"] = pd.array(bs, dtype="Int64")
            yield pdf

    return df.mapInPandas(_scrub, out_schema)


def scrub_jpeg_metadata(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """JPEG-side PII scrub + privacy flags: walk the REAL JPEG marker
    stream (imagecodec.strip_jpeg_metadata; length-prefixed segments
    per ITU-T T.81 §B — no codec needed, the entropy data is opaque)
    and drop APP1..APP15 + COM, where EXIF GPS fixes, camera serials,
    XMP author blocks and editor comments travel. APP0/JFIF and all
    coding segments stay; output decodes bit-identically. Before
    stripping, APP1 payloads are inspected (TIFF IFD0 walk for the GPS
    pointer tag 0x8825) so a pipeline can COUNT location leaks, not
    just erase them.

    The PNG sibling is scrub_image_metadata; together they cover the
    two containers a web image corpus actually stores. Non-JPEG blobs
    pass through unchanged (flags false); NULL/corrupt blobs yield
    null rows (the documented corrupt-blob path). One Arrow batch
    pass, no shuffle.

    Adds: bytes_clean, meta_segments_removed, meta_bytes_removed,
    had_exif, had_gps, had_xmp.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes_clean", T.BinaryType()),
            T.StructField("meta_segments_removed", T.IntegerType()),
            T.StructField("meta_bytes_removed", T.LongType()),
            T.StructField("had_exif", T.BooleanType()),
            T.StructField("had_gps", T.BooleanType()),
            T.StructField("had_xmp", T.BooleanType()),
        ]
    )
    in_cols = df.schema.fieldNames()

    def _scrub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..imagecodec import jpeg_privacy_flags, strip_jpeg_metadata

        for pdf in batches:
            outs, ns, bs = [], [], []
            ex, gp, xm = [], [], []
            for b in pdf[bytes_col]:
                if b is None:
                    outs.append(None); ns.append(None); bs.append(None)
                    ex.append(None); gp.append(None); xm.append(None)
                    continue
                raw = bytes(b)
                if raw[:2] == b"\xff\xd8":
                    try:
                        e, g, x = jpeg_privacy_flags(raw)
                        clean, n, nb = strip_jpeg_metadata(raw)
                        outs.append(clean); ns.append(n); bs.append(nb)
                        ex.append(e); gp.append(g); xm.append(x)
                    except ValueError:
                        outs.append(None); ns.append(None); bs.append(None)
                        ex.append(None); gp.append(None); xm.append(None)
                else:
                    outs.append(raw); ns.append(0); bs.append(0)
                    ex.append(False); gp.append(False); xm.append(False)
            pdf = pdf[in_cols].copy()
            pdf["bytes_clean"] = outs
            pdf["meta_segments_removed"] = pd.array(ns, dtype="Int32")
            pdf["meta_bytes_removed"] = pd.array(bs, dtype="Int64")
            pdf["had_exif"] = pd.array(ex, dtype="boolean")
            pdf["had_gps"] = pd.array(gp, dtype="boolean")
            pdf["had_xmp"] = pd.array(xm, dtype="boolean")
            yield pdf

    return df.mapInPandas(_scrub, out_schema)


def consensus_near_dup_pairs(df: DataFrame, max_hamming: int = 6,
                             id_col: str = "image_id",
                             phash_col: str = "phash",
                             dhash_col: str = "dhash",
                             bands: int = 4) -> DataFrame:
    """Two-family image near-dup pairs: candidates from the phash
    16-bit pigeonhole band join (phash_near_dup_pairs' scheme), kept
    only when BOTH hash families agree (phash Hamming ≤ t AND dhash
    Hamming ≤ t). Production image dedup requires the consensus: pHash
    alone merges structurally-similar-but-different shots (same DCT
    envelope), dHash alone merges different images with matching
    gradient signs — requiring both cuts false merges roughly
    multiplicatively while true near-dups (re-encodes, brightness
    shifts, mild noise) stay within both.

    Scale shape unchanged from the single-family op: band equi-join for
    candidates, codegen'd popcounts after; the dhash test adds one
    xor+bit_count per CANDIDATE (never per pair of the corpus).

    RECALL CAVEAT (same as phash_near_dup_pairs): candidates come from
    the 4×16-bit phash band join, which pigeonhole-GUARANTEES recall
    only up to phash Hamming distance 3 — a true pair at phash distance
    4–6 is found only if ≤3 of its differing bits avoid some band; pairs
    whose 4–6 phash diffs spread across all four bands are missed. With
    the default max_hamming=6 this op trades that tail recall for the
    4-band join's candidate volume; for GUARANTEED recall at distance 6
    pass bands=7 (pigeonhole over 10-bit chunks — see _hash_band_keys;
    the `phash_guaranteed_recall` contract query proves the guarantee
    against an exact all-pairs oracle).
    """
    sig = df.select(
        F.col(id_col).alias("img_id"),
        F.col(phash_col).alias("ph"),
        F.col(dhash_col).alias("dh"),
    )
    chunks = sig.select(
        "img_id", "ph", "dh",
        F.explode(F.array(*_hash_band_keys(F.col("ph"), bands)))
        .alias("chunk_key"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, (F.col("a.chunk_key") == F.col("b.chunk_key"))
               & (F.col("a.img_id") < F.col("b.img_id")))
        .select(
            F.col("a.img_id").alias("id_a"), F.col("b.img_id").alias("id_b"),
            F.col("a.ph").alias("ph_a"), F.col("b.ph").alias("ph_b"),
            F.col("a.dh").alias("dh_a"), F.col("b.dh").alias("dh_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "phash_hamming",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))),
        )
        .withColumn(
            "dhash_hamming",
            F.bit_count(F.col("dh_a").bitwiseXOR(F.col("dh_b"))),
        )
        .filter(
            (F.col("phash_hamming") <= max_hamming)
            & (F.col("dhash_hamming") <= max_hamming)
        )
        .select("id_a", "id_b", "phash_hamming", "dhash_hamming")
    )


# --- curation: eval-set decontamination, caption boilerplate, PSNR verify --


def phash_decontaminate(corpus: DataFrame, evalset: DataFrame,
                        max_hamming: int = 6,
                        id_col: str = "image_id",
                        phash_col: str = "phash",
                        broadcast_eval: bool = True) -> DataFrame:
    """Eval-set decontamination for an image corpus: drop every corpus
    row whose phash is within Hamming ``max_hamming`` of ANY eval-set
    (benchmark) phash — the image-side sibling of
    textdedup.decontaminate (which bans by n-gram overlap). The
    DataComp/LAION pipelines run exactly this step so a trained model
    is never scored on its own near-duplicate training images.

    EXACT contract, not probabilistic: bands = max_hamming + 1 bit
    chunks give guaranteed pigeonhole recall at distance ≤ max_hamming
    (see _hash_band_keys), so the result equals the all-pairs
    definition and the oracle needs no candidacy clause.

    Scale shape: the eval set is the small side (benchmark suites are
    1e5–1e6 hashes vs a 1e10 corpus) — its exploded band keys are
    broadcast (``broadcast_eval``), so candidate generation is a
    map-side hash join on the corpus scan with NO corpus shuffle. The
    exact popcount runs per CANDIDATE; banned ids are distinct'd (a
    shuffle bounded by the contaminated subset, not the corpus) and
    removed with a left_anti join on the id. Null corpus phashes are
    never candidates and are KEPT (can't prove contamination).
    """
    bands = max_hamming + 1
    ev = evalset.select(F.col(phash_col).alias("ev_ph"))
    ev_chunks = ev.select(
        "ev_ph",
        F.explode(F.array(*_hash_band_keys(F.col("ev_ph"), bands)))
        .alias("chunk_key"),
    ).distinct()
    if broadcast_eval:
        ev_chunks = F.broadcast(ev_chunks)
    co_chunks = corpus.select(
        F.col(id_col).alias("_ban_id"),
        F.col(phash_col).alias("co_ph"),
        F.explode(F.array(*_hash_band_keys(F.col(phash_col), bands)))
        .alias("chunk_key"),
    )
    banned = (
        co_chunks.join(ev_chunks, "chunk_key")
        .filter(
            F.bit_count(F.col("co_ph").bitwiseXOR(F.col("ev_ph")))
            <= max_hamming
        )
        .select(F.col("_ban_id"))
        .distinct()
    )
    return corpus.join(
        banned, corpus[id_col] == banned["_ban_id"], "left_anti"
    )


def flag_frequent_captions(df: DataFrame, caption_col: str = "caption",
                           min_freq: int = 100) -> DataFrame:
    """Caption boilerplate detection: flag rows whose NORMALIZED caption
    (lowercased, trimmed, inner whitespace collapsed) occurs at least
    ``min_freq`` times corpus-wide — at web scale these are the "stock
    photo", "image", alt-text-template captions that dominate crawled
    image+caption pairs and teach a contrastive model nothing (the
    LAION/DataComp frequency-cut). Downstream drops or down-weights
    flagged rows; this op only annotates, mirroring the
    flag-then-filter split of with_quality_score.

    Scale shape: one hash-groupBy on the normalized caption (map-side
    partial combine), then the SURVIVING frequent set — tiny by
    construction (captions repeated ≥ min_freq over 1e10 rows number in
    the thousands) — is broadcast back as a left join, so the corpus is
    never shuffled and the mega-caption skew key never lands on one
    reducer. Null captions normalize to null, never match the join, and
    come out freq=0 / boilerplate=false.

    Adds: caption_norm, caption_freq (corpus-wide count when frequent,
    else 0), caption_boilerplate (bool).
    """
    norm = F.regexp_replace(
        F.trim(F.lower(F.col(caption_col))), r"\s+", " "
    )
    with_norm = df.withColumn("caption_norm", norm)
    frequent = (
        with_norm.groupBy("caption_norm")
        .agg(F.count(F.lit(1)).alias("_cap_freq"))
        .filter(
            F.col("_cap_freq") >= min_freq
        )
        .filter(F.col("caption_norm").isNotNull())
    )
    out = with_norm.join(F.broadcast(frequent), "caption_norm", "left")
    return (
        out.withColumn(
            "caption_freq", F.coalesce(F.col("_cap_freq"), F.lit(0))
        )
        .withColumn(
            "caption_boilerplate", F.col("_cap_freq").isNotNull()
        )
        .drop("_cap_freq")
    )


def psnr_verify_pairs(pairs: DataFrame, images: DataFrame,
                      threshold_db: float = 40.0,
                      id_col: str = "image_id",
                      bytes_col: str = "bytes") -> DataFrame:
    """Exact pixel verification of near-dup CANDIDATE pairs: decode
    both blobs and compute PSNR; a pair is a verified duplicate only at
    PSNR ≥ ``threshold_db`` (the input_hint's ≥ 40 dB per-row
    invariant, applied pairwise). This is the precision stage the
    banded phash/dhash candidates need — perceptual hashes admit
    structurally-similar-but-different images; decoded-pixel PSNR does
    not. Run it AFTER consensus_near_dup_pairs, never on the corpus
    cross product.

    Scale shape: two equi-joins attach bytes to the candidate pairs
    (candidates ≪ corpus — both joins are keyed hash joins sized by
    the candidate set), then ONE Arrow batch pass decodes and scores.
    Dim-mismatched pairs score psnr_db=0.0/psnr_ok=false (different
    images by definition); undecodable or null blobs yield null
    psnr_db and psnr_ok=false (can't verify ⇒ not a confirmed dup —
    the conservative direction for a DROP decision downstream).

    Returns: id_a, id_b, psnr_db (double, 2dp; 999.0 for exact-equal
    pixels), psnr_ok (bool).
    """
    im = images.select(
        F.col(id_col).alias("_pid"), F.col(bytes_col).alias("_pbytes")
    )
    joined = (
        pairs.join(im, pairs["id_a"] == im["_pid"])
        .select("id_a", "id_b", F.col("_pbytes").alias("bytes_a"))
        .join(
            im.select(
                F.col("_pid").alias("_pid2"),
                F.col("_pbytes").alias("bytes_b"),
            ),
            F.col("id_b") == F.col("_pid2"),
        )
        .select("id_a", "id_b", "bytes_a", "bytes_b")
    )
    id_a_t = pairs.schema["id_a"].dataType
    id_b_t = pairs.schema["id_b"].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_a_t),
            T.StructField("id_b", id_b_t),
            T.StructField("psnr_db", T.DoubleType()),
            T.StructField("psnr_ok", T.BooleanType()),
        ]
    )

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dbs, oks = [], []
            for ba, bb in zip(pdf["bytes_a"], pdf["bytes_b"]):
                if ba is None or bb is None:
                    dbs.append(None); oks.append(False)
                    continue
                try:
                    arr_a = decode_image(bytes(ba))
                    arr_b = decode_image(bytes(bb))
                except Exception:
                    dbs.append(None); oks.append(False)
                    continue
                if arr_a.shape != arr_b.shape:
                    dbs.append(0.0); oks.append(False)
                    continue
                p = psnr(arr_a, arr_b)
                db = 999.0 if not np.isfinite(p) else round(p, 2)
                dbs.append(db); oks.append(db >= threshold_db)
            out = pdf[["id_a", "id_b"]].copy()
            out["psnr_db"] = pd.array(dbs, dtype="Float64")
            out["psnr_ok"] = oks
            yield out

    return joined.mapInPandas(_verify, out_schema)


# --- curation: low-information image signals (blur / entropy / solidity) --


_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("qual_entropy", T.DoubleType()),
        T.StructField("qual_lap_var", T.DoubleType()),
        T.StructField("qual_modal_count", T.LongType()),
        T.StructField("qual_n_pixels", T.LongType()),
        T.StructField("qual_grayscale", T.BooleanType()),
    ]
)


@pandas_udf(_QUALITY_SCHEMA)
def image_quality_stats_udf(data: pd.Series) -> pd.DataFrame:
    """Low-information image signals in ONE decode pass — the
    LAION/DataComp-style screens for blank thumbnails, blurred scans and
    solid-color placeholders that survive the dims/aspect gate:

    - qual_entropy: Shannon entropy (bits) of the gray histogram, where
      gray = R+G+B (exact integer, 766 bins). Solid color -> 0.0.
    - qual_lap_var: variance of the 4-neighbour integer Laplacian
      4*g - left - right - up - down over INTERIOR gray pixels — the
      classic variance-of-Laplacian blur score. Computed from exact
      int64 sums (n*SSE - S^2) / n^2, so the value is reproducible
      bit-for-bit under any batch split. Images with no interior
      (h < 3 or w < 3) score 0.0.
    - qual_modal_count / qual_n_pixels: occurrences of the most common
      exact RGB triple vs total — modal/total near 1.0 is a
      placeholder/border-dominated image.
    - qual_grayscale: every pixel has R == G == B.

    Undecodable or NULL blobs emit all-null rows (sibling-UDF
    convention); the JVM-side verdict (low_information_expr) maps null
    stats to a null verdict — can't judge, downstream decides.

    Both float stats are rounded to 4 decimals INSIDE the kernel from
    exact integer accumulators, so the VALUES oracle can reproduce them
    with an independent formulation (contract query image_quality_gate).
    """
    ent, lap, modal, npx, gs = [], [], [], [], []
    for b in data:
        if b is None:
            ent.append(None); lap.append(None); modal.append(None)
            npx.append(None); gs.append(None)
            continue
        try:
            arr = decode_image(bytes(b))
        except Exception:
            ent.append(None); lap.append(None); modal.append(None)
            npx.append(None); gs.append(None)
            continue
        h, w = arr.shape[0], arr.shape[1]
        n = h * w
        gray = arr.astype(np.int64).sum(axis=2)  # 0..765 exact
        counts = np.bincount(gray.reshape(-1), minlength=766)
        p = counts[counts > 0].astype(np.float64) / float(n)
        ent.append(round(float(-(p * np.log2(p)).sum()), 4))
        if h >= 3 and w >= 3:
            core = gray[1:-1, 1:-1]
            lapm = (
                4 * core
                - gray[1:-1, :-2] - gray[1:-1, 2:]
                - gray[:-2, 1:-1] - gray[2:, 1:-1]
            )
            ln = int(lapm.size)
            s = int(lapm.sum())
            ss = int((lapm.astype(np.int64) ** 2).sum())
            lap.append(round(float(ln * ss - s * s) / float(ln * ln), 4))
        else:
            lap.append(0.0)
        flat = np.ascontiguousarray(arr.reshape(-1, 3))
        triples = flat.view([("", np.uint8)] * 3).reshape(-1)
        _, cnt = np.unique(triples, return_counts=True)
        modal.append(int(cnt.max()))
        npx.append(n)
        gs.append(
            bool(
                np.array_equal(arr[..., 0], arr[..., 1])
                and np.array_equal(arr[..., 1], arr[..., 2])
            )
        )
    return pd.DataFrame(
        {
            "qual_entropy": pd.array(ent, dtype="Float64"),
            "qual_lap_var": pd.array(lap, dtype="Float64"),
            "qual_modal_count": pd.array(modal, dtype="Int64"),
            "qual_n_pixels": pd.array(npx, dtype="Int64"),
            "qual_grayscale": pd.array(gs, dtype="boolean"),
        }
    )


def with_image_quality_stats(df: DataFrame,
                             bytes_col: str = "bytes") -> DataFrame:
    """Attach the low-information signals as five typed columns — one
    Arrow pass, no shuffle; the scan stays partition-parallel at any
    corpus size because every signal is row-local."""
    s = image_quality_stats_udf(F.col(bytes_col))
    return (
        df.withColumn("_q", s)
        .select("*", "_q.*")
        .drop("_q")
    )


def low_information_expr(min_entropy: float = 1.0,
                         min_lap_var: float = 1.0,
                         max_modal_fraction: float = 0.9) -> Column:
    """JVM-side verdict over the attached quality stats (codegen'd —
    the gate logic never re-enters Python): an image is low-information
    when its histogram entropy is below ``min_entropy`` bits, its
    variance-of-Laplacian is below ``min_lap_var`` (blur/solid), or one
    exact RGB triple covers more than ``max_modal_fraction`` of the
    pixels. NULL stats (undecodable blob) -> NULL verdict."""
    return F.when(
        F.col("qual_entropy").isNull(), F.lit(None).cast("boolean")
    ).otherwise(
        (F.col("qual_entropy") < F.lit(float(min_entropy)))
        | (F.col("qual_lap_var") < F.lit(float(min_lap_var)))
        | (
            F.col("qual_modal_count").cast("double")
            > F.lit(float(max_modal_fraction))
            * F.col("qual_n_pixels").cast("double")
        )
    )


# --- curation: text-overlay (meme / scanned-text) screen ------------------


# transition threshold on the exact 0..765 gray scale (~96/channel) and
# the minimum text-like rows fraction are module constants so the
# VALUES oracle and the kernel stay in lockstep by construction
_TXT_DIFF_THRESH = 288

_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("txt_n_rows", T.LongType()),
        T.StructField("txt_text_rows", T.LongType()),
        T.StructField("txt_max_row_trans", T.LongType()),
        T.StructField("txt_total_trans", T.LongType()),
    ]
)


@pandas_udf(_TEXT_SCHEMA)
def text_overlay_stats_udf(data: pd.Series) -> pd.DataFrame:
    """Text-overlay signals in one decode pass — the screen that routes
    meme/scanned-text images away from a caption-supervision corpus
    (LAION runs an OCR/text-spotting model here; this is the
    deterministic heuristic stand-in with the same plumbing — swap the
    kernel for a real text detector, nothing else changes):

    - per image row of exact gray (R+G+B, 0..765): transitions =
      #adjacent-pixel diffs with |diff| >= 288 (~96/channel). Rendered
      text is dense in sharp horizontal transitions; photos are smooth.
    - a row is TEXT-LIKE when transitions >= max(6, w // 8) — scale-
      relative so wide scans don't need absolute counts.
    - emits n_rows / text_rows / max & total transitions; the verdict
      stays a JVM expression (text_overlay_expr).

    All integers, exact under any batch split; NULL/undecodable blobs
    emit all-null rows (sibling-UDF convention). Known limitation,
    documented: high-contrast MONOCHROME static also trips the
    transition test (independent-RGB noise largely cancels in the
    channel sum) — the entropy gate (image_quality_stats) and CLIP
    alignment screen are the complements that separate static from
    text.
    """
    nr, tr, mx, tot = [], [], [], []
    for b in data:
        if b is None:
            nr.append(None); tr.append(None)
            mx.append(None); tot.append(None)
            continue
        try:
            arr = decode_image(bytes(b))
        except Exception:
            nr.append(None); tr.append(None)
            mx.append(None); tot.append(None)
            continue
        h, w = arr.shape[0], arr.shape[1]
        gray = arr.astype(np.int64).sum(axis=2)
        if w > 1:
            trans = (
                np.abs(np.diff(gray, axis=1)) >= _TXT_DIFF_THRESH
            ).sum(axis=1)
        else:
            trans = np.zeros(h, dtype=np.int64)
        row_min = max(6, w // 8)
        nr.append(h)
        tr.append(int((trans >= row_min).sum()))
        mx.append(int(trans.max()) if h else 0)
        tot.append(int(trans.sum()))
    return pd.DataFrame(
        {
            "txt_n_rows": pd.array(nr, dtype="Int64"),
            "txt_text_rows": pd.array(tr, dtype="Int64"),
            "txt_max_row_trans": pd.array(mx, dtype="Int64"),
            "txt_total_trans": pd.array(tot, dtype="Int64"),
        }
    )


def with_text_overlay_stats(df: DataFrame,
                            bytes_col: str = "bytes") -> DataFrame:
    """Attach the text-overlay signals as four typed columns — one
    Arrow pass, row-local, no shuffle."""
    s = text_overlay_stats_udf(F.col(bytes_col))
    return df.withColumn("_t", s).select("*", "_t.*").drop("_t")


def text_overlay_expr(min_text_row_frac: float = 0.35) -> Column:
    """JVM-side verdict (codegen'd): text-heavy when the text-like-row
    fraction clears ``min_text_row_frac``. Exact-integer comparison
    (cross-multiplied — no float ULP at the boundary); NULL stats
    (undecodable) -> NULL verdict."""
    num, den = float(min_text_row_frac).as_integer_ratio()
    return F.when(
        F.col("txt_n_rows").isNull(), F.lit(None).cast("boolean")
    ).otherwise(
        F.col("txt_text_rows") * F.lit(den)
        >= F.col("txt_n_rows") * F.lit(num)
    )


# --- curation: EXIF-orientation normalization -----------------------------


_ORIENT_OPS = {
    1: lambda a: a,
    2: lambda a: a[:, ::-1],            # mirror horizontal
    3: lambda a: a[::-1, ::-1],         # rotate 180
    4: lambda a: a[::-1, :],            # mirror vertical
    5: lambda a: a.transpose(1, 0, 2),  # transpose (mirror + 90)
    6: lambda a: a.transpose(1, 0, 2)[:, ::-1],   # rotate 90 CW
    7: lambda a: a.transpose(1, 0, 2)[::-1, ::-1],  # transverse
    8: lambda a: a.transpose(1, 0, 2)[::-1, :],   # rotate 270 CW
}


def normalize_orientation(df: DataFrame, bytes_col: str = "bytes",
                          orientation_col: str = "orientation") -> DataFrame:
    """Apply the EXIF orientation (tag 0x0112, values 1-8) to the
    PIXELS and re-encode — the normalization every dedup/hash pass
    needs first: a camera-rotated duplicate has a different phash until
    its orientation is applied. The transform table is the TIFF/EXIF
    standard (mirror/rotate compositions), implemented as exact numpy
    index permutations — lossless, bit-reproducible.

    NULL orientation → treated as 1 (no tag = upright, the EXIF
    default). Orientation outside 1..8 or an undecodable blob → null
    row (corrupt-blob convention). Adds ``bytes_oriented``, ``out_w``,
    ``out_h``, ``was_rotated`` (dims swapped: orientations 5-8). One
    Arrow pass, no shuffle; pairs with scrub_jpeg_metadata, which
    REMOVES the tag after this pass applied it.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("bytes_oriented", T.BinaryType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("was_rotated", T.BooleanType()),
        ]
    )
    in_cols = df.schema.fieldNames()

    def _orient(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..imagecodec import encode_image

        for pdf in batches:
            outs, ws, hs, rot = [], [], [], []
            for b, o in zip(pdf[bytes_col], pdf[orientation_col]):
                # pd.isna covers None, float NaN AND pd.NA (extension
                # dtypes) — int(pd.NA) would kill the whole Arrow task
                o = 1 if o is None or pd.isna(o) else int(o)
                if b is None or o not in _ORIENT_OPS:
                    outs.append(None); ws.append(None)
                    hs.append(None); rot.append(None)
                    continue
                try:
                    arr = decode_image(bytes(b))
                except Exception:
                    outs.append(None); ws.append(None)
                    hs.append(None); rot.append(None)
                    continue
                out = np.ascontiguousarray(_ORIENT_OPS[o](arr))
                outs.append(encode_image(out.astype(np.uint8), "png"))
                hs.append(int(out.shape[0])); ws.append(int(out.shape[1]))
                rot.append(o >= 5)
            pdf = pdf[in_cols].copy()
            pdf["bytes_oriented"] = outs
            pdf["out_w"] = pd.array(ws, dtype="Int32")
            pdf["out_h"] = pd.array(hs, dtype="Int32")
            pdf["was_rotated"] = pd.array(rot, dtype="boolean")
            yield pdf

    return df.mapInPandas(_orient, out_schema)


# --- curation: watermark-band screen --------------------------------------


# Band height fraction (denominator): the bottom 1/5 of the rows is the
# overlay band — where stock-photo bars, site banners and watermark text
# overwhelmingly live. Shared module constant so the VALUES oracle and
# the kernel stay in lockstep by construction.
_WM_BAND_DEN = 5

_WM_SCHEMA = T.StructType(
    [
        T.StructField("wm_band_trans", T.LongType()),
        T.StructField("wm_band_px", T.LongType()),
        T.StructField("wm_rest_trans", T.LongType()),
        T.StructField("wm_rest_px", T.LongType()),
        T.StructField("wm_band_sum", T.LongType()),
        T.StructField("wm_rest_sum", T.LongType()),
    ]
)


def watermark_band_stats(arr: np.ndarray) -> tuple:
    """Per-image band statistics (the vectorized kernel, hoisted pure
    so the fuzz harness exercises THIS code against the scalar oracle
    — the test_fuzz_kernels convention). Returns the six int64 signals
    (band_trans, band_px, rest_trans, rest_px, band_sum, rest_sum)."""
    h, w = arr.shape[0], arr.shape[1]
    gray = arr.astype(np.int64).sum(axis=2)  # 0..765 exact
    band_h = max(1, h // _WM_BAND_DEN)
    band, rest = gray[h - band_h:], gray[: h - band_h]
    if w >= 2:
        band_t = int(
            (np.abs(band[:, 1:] - band[:, :-1]) >= _TXT_DIFF_THRESH).sum()
        )
        rest_t = int(
            (np.abs(rest[:, 1:] - rest[:, :-1]) >= _TXT_DIFF_THRESH).sum()
        ) if rest.size else 0
    else:
        band_t = rest_t = 0
    return (
        band_t, int(band.size), rest_t, int(rest.size),
        int(band.sum()), int(rest.sum()) if rest.size else 0,
    )


@pandas_udf(_WM_SCHEMA)
def watermark_stats_udf(data: pd.Series) -> pd.DataFrame:
    """Watermark-band signals in one decode pass — the heuristic screen
    for the two overlay archetypes a LAION-style image+caption corpus
    must route away from caption supervision (the learned
    watermark-classifier stand-in, honest about being a heuristic like
    text_overlay_stats_udf; the CLIP gate and low-information gate are
    its complements):

    1. TEXT/LOGO overlays: the bottom band is transition-BUSY while the
       rest of the image is smooth (sharp glyph edges concentrated in
       the band).
    2. SOLID BANNER strips: the bottom band is transition-SMOOTH but
       its mean brightness jumps away from the rest (stock-site bars,
       white/black strips).

    All six signals are EXACT int64 accumulators over the exact 0..765
    gray (R+G+B) — no float anywhere, so the VALUES oracle reproduces
    them bit-for-bit with scalar loops:

    - wm_band_trans / wm_rest_trans: horizontal transitions with
      |Δgray| ≥ _TXT_DIFF_THRESH (the text-overlay screen's shared
      constant) inside / outside the bottom band of
      max(1, h // _WM_BAND_DEN) rows.
    - wm_band_px / wm_rest_px: pixel counts of the two regions
      (wm_rest_px = 0 when the band IS the image, h == band rows).
    - wm_band_sum / wm_rest_sum: gray sums (for the cross-multiplied
      mean-delta arm — never divided kernel-side).

    Undecodable or NULL blobs emit all-null rows (sibling-UDF
    convention); watermark_expr maps null stats to a NULL verdict.
    """
    bt, bp, rt, rp, bs, rs = [], [], [], [], [], []
    for b in data:
        if b is None:
            bt.append(None); bp.append(None); rt.append(None)
            rp.append(None); bs.append(None); rs.append(None)
            continue
        try:
            arr = decode_image(bytes(b))
        except Exception:
            bt.append(None); bp.append(None); rt.append(None)
            rp.append(None); bs.append(None); rs.append(None)
            continue
        band_t, band_px, rest_t, rest_px, band_s, rest_s = (
            watermark_band_stats(arr)
        )
        bt.append(band_t); rt.append(rest_t)
        bp.append(band_px); rp.append(rest_px)
        bs.append(band_s); rs.append(rest_s)
    return pd.DataFrame(
        {
            "wm_band_trans": pd.array(bt, dtype="Int64"),
            "wm_band_px": pd.array(bp, dtype="Int64"),
            "wm_rest_trans": pd.array(rt, dtype="Int64"),
            "wm_rest_px": pd.array(rp, dtype="Int64"),
            "wm_band_sum": pd.array(bs, dtype="Int64"),
            "wm_rest_sum": pd.array(rs, dtype="Int64"),
        }
    )


def with_watermark_stats(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Attach the watermark-band signals as six typed int64 columns —
    one Arrow pass, row-local, no shuffle; the scan stays
    partition-parallel at any corpus size."""
    s = watermark_stats_udf(F.col(bytes_col))
    return df.withColumn("_w", s).select("*", "_w.*").drop("_w")


def watermark_expr(
    busy_band_pct: int = 8,
    trans_ratio: int = 3,
    smooth_band_pct: int = 2,
    mean_delta: int = 48,
) -> Column:
    """JVM-side watermark verdict over the attached band stats
    (codegen'd; every comparison cross-multiplied int64 — no float ULP
    at any boundary, so DuckDB re-derives it exactly):

    - TEXT/LOGO arm: band transition fraction > busy_band_pct/100 AND
      the band is > trans_ratio× busier than the rest
      (band_trans/band_px > ratio · rest_trans/rest_px, cross-
      multiplied; a zero-transition rest makes any busy band qualify).
    - BANNER arm: band transition fraction ≤ smooth_band_pct/100 AND
      |mean(band) − mean(rest)| > mean_delta gray units (of 765),
      as |band_sum·rest_px − rest_sum·band_px| > delta·band_px·rest_px.

    When the band is the whole image (wm_rest_px = 0) both arms are
    vacuously false — a 1-row image has no "rest" to contrast against.
    NULL stats (undecodable blob) → NULL verdict.

    int64 overflow bound: gray sums are ≤ 765·px, so the banner arm's
    products stay inside int64 for images up to ~10^8 px per region —
    far past any training corpus's decode gate.
    """
    band_t, band_p = F.col("wm_band_trans"), F.col("wm_band_px")
    rest_t, rest_p = F.col("wm_rest_trans"), F.col("wm_rest_px")
    band_s, rest_s = F.col("wm_band_sum"), F.col("wm_rest_sum")
    busy = (band_t * F.lit(100) > F.lit(int(busy_band_pct)) * band_p) & (
        band_t * rest_p > F.lit(int(trans_ratio)) * rest_t * band_p
    )
    banner = (band_t * F.lit(100) <= F.lit(int(smooth_band_pct)) * band_p) & (
        F.abs(band_s * rest_p - rest_s * band_p)
        > F.lit(int(mean_delta)) * band_p * rest_p
    )
    return F.when(
        band_p.isNull(), F.lit(None).cast("boolean")
    ).otherwise((rest_p > F.lit(0)) & (busy | banner))


# --- curation: rotation/flip-invariant dedup keys -------------------------


_ROT_SCHEMA = T.StructType(
    [
        T.StructField("phash_d4", T.LongType()),
        T.StructField("dhash_d4", T.LongType()),
    ]
)


def with_rot_invariant_hashes(df: DataFrame,
                              bytes_col: str = "bytes") -> DataFrame:
    """Rotation/flip-INVARIANT perceptual dedup keys: min over the 8
    dihedral transforms (the D4 group — exactly the EXIF orientation
    table _ORIENT_OPS) of phash64 and dhash64.

    normalize_orientation catches camera-rotated duplicates WHEN the
    EXIF tag survived; social-media re-uploads strip EXIF, so a rotated
    or mirrored re-post of the same photo phashes differently and
    slips every hash-equality dedup pass. Hashing all 8 transforms and
    keeping a canonical representative makes the key invariant under
    the whole group: any two images equal up to rotation/mirror get
    the SAME (phash_d4, dhash_d4) pair, at 8× the (cheap, row-local)
    hash cost and zero extra decode cost — the decode dominates.

    Canonical representative = LEAST SIGNED int64 of the 8 hashes — an
    arbitrary-but-fixed convention (only equality matters for a dedup
    key) chosen because both Spark's `least` and the oracle's SQL
    LEAST compare signed int64 natively, no unsigned shim.

    One Arrow pass, no shuffle. Undecodable/NULL blobs → null keys
    (sibling-UDF convention). Group-by on the pair for EXACT-up-to-D4
    dedup (rot_invariant_dedup). CAVEAT — near-dup banding over
    phash_d4 is NOT sound: for two near-identical (not pixel-equal)
    images the min can select DIFFERENT transforms, so the Hamming
    distance between d4-min keys is unbounded even when some aligned
    pair is close. Near-dup candidacy under rotation needs banding over
    ALL 8 per-transform hashes of one side (8× candidate volume), or
    orientation normalization first when EXIF survives.
    """
    out_schema = T.StructType(df.schema.fields + list(_ROT_SCHEMA.fields))
    in_cols = df.schema.fieldNames()

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ph, dh = [], []
            for b in pdf[bytes_col]:
                if b is None:
                    ph.append(None); dh.append(None)
                    continue
                try:
                    arr = decode_image(bytes(b))
                except Exception:
                    ph.append(None); dh.append(None)
                    continue
                phs, dhs = [], []
                for op in _ORIENT_OPS.values():
                    t = np.ascontiguousarray(op(arr))
                    phs.append(phash64(t))
                    dhs.append(dhash64(t))
                ph.append(min(phs)); dh.append(min(dhs))
            pdf = pdf[in_cols].copy()
            pdf["phash_d4"] = pd.array(ph, dtype="Int64")
            pdf["dhash_d4"] = pd.array(dh, dtype="Int64")
            yield pdf

    return df.mapInPandas(_hash, out_schema)


def rot_invariant_dedup(df: DataFrame, id_col: str = "image_id",
                        caption_col: str = "caption",
                        bytes_col: str = "bytes") -> DataFrame:
    """Rot/mirror-invariant exact dedup with keep-best-caption
    canonicalization — the pipeline step the d4-min keys enable: an
    EXIF-stripped rotated/mirrored re-post lands in the SAME group as
    its original, and the group keeps the most useful caption.

    Grouping key = the (phash_d4, dhash_d4) PAIR — both hash families
    must agree, which cuts cross-family collisions the way
    consensus_near_dup_pairs does for near-dups. Undecodable/NULL blobs
    get per-row singleton keys ('s:<id>', the contrastive_batches
    routing convention) so a corrupt blob is never merged with
    anything and never NULL-grouped.

    Representative = the row with the LONGEST caption, ties to the
    lowest id — computed as one min(struct(-caption_length, id))
    lexicographic argmin (partial-aggregating, NO rank window, so a
    spam mega-group never collapses to one window task; the
    cluster_representatives idiom). Negating the LENGTH (always int)
    instead of the id keeps the id type free — string or numeric ids
    both work. NULL captions sort below every real caption (length
    coalesced to -1).

    Scale shape: one Arrow decode pass (with_rot_invariant_hashes), one
    map-side-combining groupBy on the key, one AQE-splittable equi-join
    of the group dim back to the rows. No window, no cartesian.

    Adds: ``dup_key``, ``group_size``, ``rep_id``, ``is_kept``.
    """
    hashed = with_rot_invariant_hashes(df, bytes_col=bytes_col)
    key = F.when(
        F.col("phash_d4").isNull(),
        F.concat(F.lit("s:"), F.col(id_col).cast("string")),
    ).otherwise(
        F.concat(
            F.lit("k:"), F.col("phash_d4").cast("string"),
            F.lit(":"), F.col("dhash_d4").cast("string"),
        )
    )
    keyed = hashed.withColumn("dup_key", key)
    groups = keyed.groupBy("dup_key").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min(
            F.struct(
                (F.lit(0)
                 - F.coalesce(F.length(F.col(caption_col)), F.lit(-1)))
                .alias("neg_cap_len"),
                F.col(id_col).alias("rid"),
            )
        ).alias("_rep"),
    ).select(
        "dup_key", "group_size", F.col("_rep.rid").alias("rep_id")
    )
    return keyed.join(groups, "dup_key").withColumn(
        "is_kept", F.col(id_col) == F.col("rep_id")
    )


_D4ALL_SCHEMA = T.StructType(
    [T.StructField("phash_d4_all", T.ArrayType(T.LongType()))]
)


def with_d4_phashes(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """All 8 per-transform phashes as an array column (identity first —
    element 1 in Spark's 1-based element_at). The substrate for
    rotation-aware NEAR-dup candidacy: banding the d4-MIN key is
    unsound (see with_rot_invariant_hashes' caveat), but banding every
    per-transform hash of ONE side against the identity hash of the
    other is — if some aligned pair is close, that transform's hash
    bands with the other image's plain hash. One Arrow pass, no
    shuffle; null array for undecodable/NULL blobs."""
    out_schema = T.StructType(df.schema.fields + list(_D4ALL_SCHEMA.fields))
    in_cols = df.schema.fieldNames()

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[bytes_col]:
                if b is None:
                    out.append(None)
                    continue
                try:
                    arr = decode_image(bytes(b))
                except Exception:
                    out.append(None)
                    continue
                out.append([
                    phash64(np.ascontiguousarray(op(arr)))
                    for op in _ORIENT_OPS.values()
                ])
            pdf = pdf[in_cols].copy()
            pdf["phash_d4_all"] = out
            yield pdf

    return df.mapInPandas(_hash, out_schema)


def rot_near_dup_pairs(df: DataFrame, max_hamming: int = 6,
                       id_col: str = "image_id",
                       bytes_col: str = "bytes",
                       bands: int = 7) -> DataFrame:
    """NEAR-dup pairs under rotation/mirroring: pairs whose BEST-ALIGNED
    phash Hamming distance (min over the 8 dihedral alignments) is
    ≤ ``max_hamming`` — catches an EXIF-stripped rotated re-ENCODE,
    which neither rot_invariant_dedup (exact keys only) nor
    phash_near_dup_pairs (no alignment) can.

    METRIC (asymmetry, stated honestly): the pair distance is
    min over the 8 transforms applied to the LOWER-id image, vs the
    other image's identity hash. phash is not equivariant (p(T·X) is
    not a permutation of p(X)), so transforming the other side can
    give a slightly different min — but any true aligned near-dup is
    close under BOTH conventions, and fixing the transformed side
    makes candidacy and verdict agree exactly, which is what the
    pigeonhole guarantee needs. Candidacy: every per-transform hash of
    every image bands against identity hashes, join kept to
    a.id < b.id with a = the transformed side (8× band keys on one
    side, never 64×); the verdict re-derives the full
    min-over-alignments popcount per candidate.

    Recall: pigeonhole-GUARANTEED when the best alignment's distance
    ≤ bands-1 — the default bands=7 makes candidacy EXACT at the
    default max_hamming=6 (phash_guaranteed_recall's rule), so the
    DuckDB oracle needs no candidacy clause.

    Scale shape: band equi-join (8·bands keys per image on one side,
    bands on the other), distinct, then a codegen'd 8-element
    array_min popcount per CANDIDATE. No cartesian, no window.

    Output: id_a < id_b, ``rot_hamming``, ``best_transform`` (1-based
    EXIF orientation index of the argmin alignment, ties to the
    lowest index).
    """
    # ONE decode+8-hash Arrow pass: the hashed projection feeds four
    # plan subtrees (identity keys, exploded keys, both verdict
    # join-backs); a lazy localCheckpoint pins it after the first
    # materialization so the expensive pass never recomputes per
    # subtree (the arrays are 8 longs/row — tiny to hold)
    hashed = with_d4_phashes(df, bytes_col=bytes_col).filter(
        F.col("phash_d4_all").isNotNull()
    ).select(
        F.col(id_col).alias("img_id"), "phash_d4_all"
    ).localCheckpoint(eager=False)

    ident = hashed.select(
        F.col("img_id"), F.element_at("phash_d4_all", 1).alias("ph0")
    )
    right = ident.select(
        "img_id", "ph0",
        F.explode(F.array(*_hash_band_keys(F.col("ph0"), bands)))
        .alias("chunk_key"),
    )
    left = hashed.select(
        "img_id", F.explode("phash_d4_all").alias("ph_t")
    ).select(
        "img_id",
        F.explode(F.array(*_hash_band_keys(F.col("ph_t"), bands)))
        .alias("chunk_key"),
    )
    cand = (
        left.alias("a")
        .join(
            right.alias("b"),
            (F.col("a.chunk_key") == F.col("b.chunk_key"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("id_a"),
            F.col("b.img_id").alias("id_b"),
        )
        .distinct()
    )
    scored = (
        cand.join(
            hashed.select(F.col("img_id").alias("id_a"),
                          F.col("phash_d4_all").alias("arr_a")),
            "id_a",
        )
        .join(
            ident.select(F.col("img_id").alias("id_b"),
                         F.col("ph0").alias("ph_b")),
            "id_b",
        )
        .withColumn(
            "_dists",
            F.transform(
                F.col("arr_a"),
                lambda x: F.bit_count(x.bitwiseXOR(F.col("ph_b"))),
            ),
        )
        .withColumn("rot_hamming", F.array_min("_dists"))
        .withColumn(
            "best_transform",
            (F.array_position(
                F.col("_dists"), F.array_min("_dists")
            )).cast("int"),
        )
    )
    return scored.filter(
        F.col("rot_hamming") <= F.lit(int(max_hamming))
    ).select("id_a", "id_b", "rot_hamming", "best_transform")
