"""North-rule end-to-end: crawl the fixture web (detail pages + image
binaries) with the BSP engine, assemble the image+caption product table
(input_hint schema: image_id, bytes, w, h, fmt, caption, phash), and
verify the per-row invariants — exact caption equality and decoded-pixel
fidelity (PSNR ≥ 40 dB lossy / exact lossless) against the fixture
source of truth.
"""

import numpy as np
import pytest

from lightcrawler_spark.fixtures import (
    ROBOTS_FIXTURE,
    default_spec,
    make_images,
    make_webgraph,
    webgraph_df,
)
from lightcrawler_spark.imagecodec import decode_image, psnr
from lightcrawler_spark.plans.assemble import build_image_caption_table, image_captions
from lightcrawler_spark.plans.crawl import CrawlEngine
from lightcrawler_spark.sources.fetcher import SyntheticFetcher


def test_image_captions_kernel():
    text = (
        "Doc 0-0-0[tag:img:/img/a.png]\n\nA quiet harbor at dawn\nback\n"
        "[tag:img:/img/b.png]\n"
    )
    got = image_captions(text)
    assert got == [
        {"src": "/img/a.png", "caption": "A quiet harbor at dawn"},
        {"src": "/img/b.png", "caption": ""},
    ]


@pytest.fixture(scope="module")
def assembled(spark):
    images = make_images(10)
    web = make_webgraph(n_lists=2, details_per_list=2, images=images)
    spec = default_spec(
        max_depth=4,
        budget=16,
        content_type_receive_rules=[r"#text/html# i", r"#image/# i"],
        # E17: list pages advertise countPage — without the feeds the
        # index_1+ pages (and their detail images) are unreachable
        pagination_rules=[(r"var\s+countPage\s*=\s*(\d+)", "index_{i}.htm")],
    )
    engine = CrawlEngine(
        spark, spec, SyntheticFetcher(webgraph_df(spark, web), spec),
        robots_fixture=ROBOTS_FIXTURE,
    )
    result = engine.run(max_rounds=30)
    table = build_image_caption_table(result.pages)
    return images, {r["image_id"]: r.asDict() for r in table.collect()}


def test_crawl_to_product_table(assembled):
    images, got = assembled
    fixture = {r["image_id"]: r for r in images}
    crawled = {k: v for k, v in got.items() if k.startswith("img_")}
    # every fixture image referenced by a crawled detail page made it
    assert len(crawled) == len(fixture)
    for image_id, row in crawled.items():
        src = fixture[image_id]
        # input_hint invariants: exact caption equality …
        assert row["caption"] == src["caption"], image_id
        assert (row["w"], row["h"], row["fmt"]) == (
            src["w"], src["h"], src["fmt"]), image_id
        assert row["phash"] == src["phash"], image_id
        # … and decoded-pixel fidelity vs the ORIGINAL pixel source
        # (lossless exact; lossy within the PSNR budget)
        from lightcrawler_spark.fixtures import make_image_array

        i = int(image_id.split("_")[1])
        ref = make_image_array(i, src["w"], src["h"])
        dec = decode_image(bytes(row["bytes"]))
        if src["fmt"] == "png":
            assert np.array_equal(dec, ref), image_id
        else:
            assert psnr(dec, ref) >= 40.0, image_id


def test_banner_images_have_empty_captions(assembled):
    _, got = assembled
    banners = {k: v for k, v in got.items() if k.startswith("banner")}
    assert banners  # cdn-host banners were crawled too (same domain)
    assert all(v["caption"] == "" for v in banners.values())
