"""Property/fuzz tests (hypothesis) for the pure-Python kernels: none
may raise on arbitrary input, and the core invariants hold. These
kernels run inside Arrow batches on executors — an unhandled exception
there kills a whole task, so total robustness is a correctness property.
"""

from hypothesis import example, given, settings
from hypothesis import strategies as st

from lightcrawler_spark.functions.urlkit import (
    build_url_from_link,
    format_url,
    normalize_url,
    split_url,
    url_md5,
)
from lightcrawler_spark.operators.content import (
    html_text_struct,
    prune_link_blocks,
)
from lightcrawler_spark.operators.extract import extract_meta_tags, find_links
from lightcrawler_spark.plans.assemble import image_captions
from lightcrawler_spark.sources.fetcher import (
    decode_gzip_content,
    is_gzip_encoded,
    prepare_http_request_query,
)

TEXT = st.text(max_size=300)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_prepare_http_request_query_total(s):
    out = prepare_http_request_query(s)
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_format_url_total(base, link):
    out = format_url(base, link)
    assert out is None or isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(TEXT)
@example("@@")  # userinfo eats the first '@' -> host '@' (regression)
def test_normalize_and_md5_total(s):
    out = normalize_url(s)
    if out is not None:
        assert normalize_url(out) == out        # idempotent
        assert len(url_md5(out)) == 32


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_build_url_from_link_total(link, base):
    parts = split_url(base if base.startswith("http") else "http://h/a/b.htm")
    if parts is None or parts.host == "":
        parts = split_url("http://h/a/b.htm")
    out = build_url_from_link(link, parts)
    assert out is None or out.startswith(("http://", "https://", "ftp://")) \
        or "://" in out or out  # canonical or dropped


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_find_links_total(html):
    links = find_links(html, "http://h/a/b.htm", aggressive=True)
    raws = [l["link_raw"] for l in links]
    assert len(raws) == len(set(raws))           # first-wins dedup holds


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_html_kernels_total(html):
    extract_meta_tags(html)
    pruned = prune_link_blocks(html)
    assert isinstance(pruned, str)
    assert len(pruned) <= len(html)              # pruning only removes
    s = html_text_struct(html, keep_img=True)
    assert isinstance(s["text"], str)
    image_captions(s["text"])


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_gzip_total(b):
    if is_gzip_encoded(b):
        assert isinstance(decode_gzip_content(b), bytes)


# --- audio kernel (pure Python — no Spark session needed) -------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    st.sampled_from([8000, 11025, 16000, 44100]),
    st.integers(1, 4),
)
def test_wav_roundtrip_exact(samples, rate, channels):
    import numpy as np

    from lightcrawler_spark.operators.audio import make_wav_bytes, parse_wav

    frames = len(samples) // channels
    arr = np.array(samples[: frames * channels] or [0], dtype=np.int64)
    if frames == 0:
        frames, channels = len(arr), 1
    blob = make_wav_bytes(arr, rate, channels)
    m = parse_wav(blob)
    assert m is not None
    assert m["channels"] == channels and m["sample_rate"] == rate
    assert m["n_frames"] == frames and m["bits"] == 16
    got = np.frombuffer(
        blob, dtype="<i2", offset=m["data_off"], count=frames * channels
    ).astype(np.int64)
    assert np.array_equal(got, arr)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_wav_parser_total_on_garbage(blob):
    """parse_wav never raises — returns None or a well-formed dict whose
    spans stay inside the blob."""
    from lightcrawler_spark.operators.audio import parse_wav

    m = parse_wav(blob)
    if m is not None:
        assert 0 < m["channels"] and 0 < m["sample_rate"]
        assert m["data_off"] + m["data_len"] <= len(blob)
        assert m["n_frames"] >= 0


BYTES = st.binary(max_size=400)


@settings(max_examples=200, deadline=None)
@given(BYTES)
def test_jpeg_walker_total_on_garbage(blob):
    """strip_jpeg_metadata / jpeg_privacy_flags: ValueError or a valid
    result on ANY input — never another exception type."""
    from lightcrawler_spark.imagecodec import (
        jpeg_privacy_flags,
        strip_jpeg_metadata,
    )

    for fn in (strip_jpeg_metadata, jpeg_privacy_flags):
        try:
            fn(blob)
        except ValueError:
            pass


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(st.booleans(), st.booleans()), max_size=4),
    st.binary(max_size=40).filter(lambda b: b"\xff" not in b),
)
def test_jpeg_scrub_roundtrip_property(metas, entropy):
    """Any mix of EXIF/XMP APP1s scrubs to a re-walkable, meta-free
    container with the entropy data byte-identical."""
    from lightcrawler_spark.imagecodec import (
        _jpeg_segments,
        jpeg_privacy_flags,
        make_exif_app1,
        make_jpeg_container,
        make_xmp_app1,
        strip_jpeg_metadata,
    )

    segs = tuple(
        make_exif_app1(gps=g) if e else make_xmp_app1()
        for e, g in metas
    )
    j = make_jpeg_container(segs, entropy=entropy or b"\x00")
    clean, n, _ = strip_jpeg_metadata(j)
    assert n == len(segs)
    assert jpeg_privacy_flags(clean) == (False, False, False)
    _jpeg_segments(clean)
    assert (entropy or b"\x00") in clean


@settings(max_examples=200, deadline=None)
@given(BYTES)
def test_warc_parser_total_on_garbage(blob):
    """_warc_records (the parse_warc_segment walk) must terminate and
    yield well-typed tuples on ANY byte string; with a valid record
    prefix, record 0 always parses and any garbage tail is FLAGGED."""
    from lightcrawler_spark.operators.warc import _warc_records

    for rec_t in _warc_records(blob):
        assert len(rec_t) == 8
        assert isinstance(rec_t[0], int) and isinstance(rec_t[7], bool)

    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\nWARC-Date: d\r\n"
        b"Content-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    out = list(_warc_records(rec + blob))
    assert out[0][7] is True and out[0][6] == b"abc"
    assert all(len(t) == 8 for t in out)
    # the walk either consumed everything as records or flagged a tail
    assert out[-1][7] is True or out[-1][7] is False


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767),
             min_size=0, max_size=200),
    st.integers(min_value=0, max_value=2000),
)
def test_trim_silence_kernel_invariants(samples, threshold):
    """Scalar replica of the trim rule: trimmed span is exactly the
    [first, last] |s|>t window; idempotent."""
    idx = [i for i, s in enumerate(samples) if abs(s) > threshold]
    lo, hi = (idx[0], idx[-1] + 1) if idx else (0, 0)
    trimmed = samples[lo:hi]
    if trimmed:
        assert abs(trimmed[0]) > threshold
        assert abs(trimmed[-1]) > threshold
    idx2 = [i for i, s in enumerate(trimmed) if abs(s) > threshold]
    lo2, hi2 = (idx2[0], idx2[-1] + 1) if idx2 else (0, 0)
    assert trimmed[lo2:hi2] == trimmed


# --- watermark band stats vs scalar oracle; d4 invariance ------------------


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_watermark_stats_cross_formulation(h, w, seed):
    # the vectorized numpy band stats must agree with the independent
    # scalar index-loop oracle on ANY image shape, including 1-row
    # (band == image) and 1-column (no transitions) degenerates
    import numpy as np

    import __spark_entry__ as entry

    from lightcrawler_spark.operators.images import watermark_band_stats

    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)
    # the HOISTED production kernel itself vs the scalar oracle — a
    # future edit to the vectorized math is caught here
    assert watermark_band_stats(arr) == entry._scalar_watermark_stats(arr)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=7),
)
def test_d4_min_invariance_fuzz(h, w, seed, which):
    # min-over-D4 of phash/dhash is EXACTLY invariant under any of the
    # 8 dihedral pre-transforms, for any image shape — the group-closure
    # theorem, checked on raw pixels (no codec in the loop)
    import numpy as np

    from lightcrawler_spark.imagecodec import dhash64, phash64
    from lightcrawler_spark.operators.images import _ORIENT_OPS

    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)
    pre = np.ascontiguousarray(list(_ORIENT_OPS.values())[which](arr))

    def d4min(a):
        ph = [phash64(np.ascontiguousarray(op(a)))
              for op in _ORIENT_OPS.values()]
        dh = [dhash64(np.ascontiguousarray(op(a)))
              for op in _ORIENT_OPS.values()]
        return min(ph), min(dh)

    assert d4min(arr) == d4min(pre)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_scalar_d4_transforms_match_numpy(h, w, seed):
    # the oracle's explicit index-formula transforms must equal the
    # kernel's numpy-slicing table element-for-element on any shape
    import numpy as np

    import __spark_entry__ as entry
    from lightcrawler_spark.operators.images import _ORIENT_OPS

    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)
    for scalar_t, op in zip(
        entry._scalar_d4_transforms(arr), _ORIENT_OPS.values()
    ):
        assert np.array_equal(scalar_t, np.ascontiguousarray(op(arr)))
