"""Image codec + pHash tests (input_hint invariant: decoded-pixel allclose,
PSNR≥40dB for lossy, exact for png; reference path scrapper/core/images.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from realestate_scraper_spark.functions.images import (
    IMAGE_META_FIELDS,
    decode_image,
    decode_meta_batches,
    encode_image,
    hamming64,
    phash64,
    psnr,
    sha256_hex,
    sniff_format,
)
from realestate_scraper_spark.sources.synth import build_corpus


def _img(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 4 + yy * 2) % 256
    return (
        np.stack([base, base // 2, 255 - base], axis=-1)
        + rng.integers(0, 16, (h, w, 3))
    ).astype(np.uint8)


def test_png_roundtrip_exact():
    rgb = _img(1)
    data = encode_image(rgb, "png")
    assert sniff_format(data) == "png"
    out = decode_image(data)
    assert np.array_equal(out, rgb)
    assert psnr(rgb, out) == float("inf")


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_roundtrip_psnr(fmt):
    rgb = _img(2)
    data = encode_image(rgb, fmt)
    assert sniff_format(data) == fmt
    out = decode_image(data)
    assert out.shape == rgb.shape
    assert psnr(rgb, out) >= 40.0  # input_hint invariant
    assert np.allclose(out, rgb, atol=4)  # quant step bound


def test_sniff_matches_reference_magic_semantics():
    # scrapper/core/images.py:29-37 — JPEG ffd8ff, PNG 8-byte sig, RIFF/WEBP.
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_format(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WEBPrest") == "webp"
    assert sniff_format(b"GIF89a") is None


def test_phash_properties():
    a = _img(3)
    h_a = phash64(a)
    assert isinstance(h_a, int)
    assert -(2**63) <= h_a < 2**63
    # invariant under the lossy codec (≤ a couple of bits)
    a2 = decode_image(encode_image(a, "jpeg"))
    assert hamming64(phash64(a2), h_a) <= 4
    # different image → far hash
    b = _img(99)
    assert hamming64(phash64(b), h_a) > 10


def test_decode_meta_spark_stage(spark):
    _, images, _ = build_corpus(n_pages=2, cards_per_page=4)
    assert len(images) > 20
    df = spark.createDataFrame(images)
    meta = df.select("image_id", "bytes").mapInPandas(
        decode_meta_batches, schema=IMAGE_META_FIELDS
    )
    got = {r["image_id"]: r for r in meta.collect()}
    assert len(got) == len(images)
    for row in images:
        m = got[row["image_id"]]
        assert m["decode_ok"], row["image_id"]
        assert m["w"] == row["w"] and m["h"] == row["h"]
        assert m["fmt"] == row["fmt"]
        assert m["phash"] == row["phash"]  # UDF recompute == generation oracle
        assert m["sha256"] == sha256_hex(bytes(row["bytes"]))


def test_decode_meta_marks_bad_rows(spark):
    rows = [
        {"image_id": "ok", "bytes": bytearray(encode_image(_img(5), "png"))},
        {"image_id": "bad", "bytes": bytearray(b"GIF89a not an allowed format")},
        {"image_id": "trunc", "bytes": bytearray(b"\xff\xd8\xff\xe0\x00\x10JF")},
    ]
    df = spark.createDataFrame(rows)
    meta = {r["image_id"]: r for r in df.mapInPandas(
        decode_meta_batches, schema=IMAGE_META_FIELDS
    ).collect()}
    assert meta["ok"]["decode_ok"]
    assert not meta["bad"]["decode_ok"]
    assert not meta["trunc"]["decode_ok"]


def test_images_table_matches_input_hint_schema(spark):
    from realestate_scraper_spark.schemas import IMAGES_SCHEMA

    _, images, _ = build_corpus(n_pages=1, cards_per_page=4)
    df = spark.createDataFrame(images, schema=IMAGES_SCHEMA)
    assert [f.name for f in df.schema.fields] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]
    assert df.count() == len(images)


def test_bilinear_resize_properties():
    """Shape, constancy preservation, and a known-gradient oracle: a linear
    ramp resampled bilinearly stays a linear ramp (within rounding)."""
    from realestate_scraper_spark.functions.images import (
        resize_bilinear,
        thumbnail,
    )

    # constant image stays constant at any output size
    flat = np.full((40, 64, 3), 137, dtype=np.uint8)
    out = resize_bilinear(flat, 13, 29)
    assert out.shape == (13, 29, 3)
    assert np.all(out == 137)

    # horizontal linear ramp stays linear: column means must be monotone
    # and near-linear (align-corners=False keeps interior samples exact)
    ramp = np.tile(
        np.linspace(0, 255, 128).astype(np.uint8)[None, :, None], (32, 1, 3)
    )
    small = resize_bilinear(ramp, 16, 32).astype(np.float64)
    cols = small[:, :, 0].mean(axis=0)
    assert np.all(np.diff(cols) > 0)
    interior = cols[1:-1]
    fit = np.polyfit(np.arange(interior.size), interior, 1)
    resid = interior - np.polyval(fit, np.arange(interior.size))
    assert np.max(np.abs(resid)) < 1.5

    # thumbnail: aspect preserved, never upscales
    th = thumbnail(_img(3, h=48, w=96), 24)
    assert th.shape == (12, 24, 3)
    assert thumbnail(_img(3, h=8, w=8), 24).shape == (8, 8, 3)


def test_thumbnail_spark_stage(spark):
    """The q54 stage end-to-end: decode → downscale → re-encode, with bad
    rows marked not failed; thumbs decode back to the expected shape."""
    from realestate_scraper_spark.functions.images import (
        THUMB_FIELDS,
        make_thumbnail_batches,
    )

    rows = [
        {"image_id": "a", "bytes": bytearray(encode_image(_img(1, 48, 96), "png"))},
        {"image_id": "b", "bytes": bytearray(encode_image(_img(2, 64, 32), "jpeg"))},
        {"image_id": "bad", "bytes": bytearray(b"not an image at all....")},
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["image_id"]: r
        for r in df.mapInPandas(
            make_thumbnail_batches(max_dim=24, fmt="png"), schema=THUMB_FIELDS
        ).collect()
    }
    a = out["a"]
    assert a["decode_ok"] and (a["src_w"], a["src_h"]) == (96, 48)
    assert (a["thumb_w"], a["thumb_h"]) == (24, 12)
    rgb = decode_image(bytes(a["thumb"]), "png")
    assert rgb.shape == (12, 24, 3)
    b = out["b"]
    assert b["decode_ok"] and (b["thumb_w"], b["thumb_h"]) == (12, 24)
    assert not out["bad"]["decode_ok"] and out["bad"]["thumb_w"] == 0


def test_phash_banded_near_dup_recall(spark):
    """q51's banded scheme vs brute-force ground truth (the q53 pattern for
    images): 9 disjoint bit-bands guarantee recall 1.0 at Hamming ≤ 8 by
    pigeonhole, and the r4 top-byte-only bucketing's recall is measured —
    it is a strict subset whenever a true pair differs in a top-byte bit."""
    import itertools

    from realestate_scraper_spark.plans.images_queries import (
        _images_df,
        q51_phash_near_dup,
    )

    rows = _images_df(spark).select("image_id", "phash").collect()
    assert len(rows) > 50
    gt = set()
    topbyte_gt = set()
    for (ia, pa), (ib, pb) in itertools.combinations(
        sorted((r["image_id"], r["phash"]) for r in rows), 2
    ):
        if hamming64(pa, pb) <= 8:
            gt.add((ia, ib))
            if (pa >> 56) & 0xFF == (pb >> 56) & 0xFF:
                topbyte_gt.add((ia, ib))
    assert gt, "corpus must contain near-dup pairs for the bound to bite"

    out = q51_phash_near_dup(spark, "").collect()
    got = {(r["image_a"], r["image_b"]) for r in out}
    # guaranteed-complete: the banded candidate set finds EVERY true pair
    assert got == gt
    # the topbyte flag on each pair agrees with the python twin
    flagged = {
        (r["image_a"], r["image_b"]) for r in out if r["topbyte_candidate"]
    }
    assert flagged == topbyte_gt
    recall_topbyte = len(topbyte_gt) / len(gt)
    recall_banded = len(got & gt) / len(gt)
    assert recall_banded == 1.0
    assert recall_banded >= recall_topbyte


def test_executor_side_synth_bit_identical(spark):
    """image_blob is a pure function of (seed, ordinal, k): the executor-side
    mapInPandas synthesis (bench staging) produces byte-identical blobs to
    the driver-side corpus generator."""
    from realestate_scraper_spark.sources.synth import (
        SYNTH_IMAGE_FIELDS,
        image_spec_rows,
        make_image_rows,
        make_offers,
        synth_image_batches,
    )

    offers = make_offers(seed=42, n_pages=1, cards_per_page=4)
    want = {r["image_id"]: bytes(r["bytes"]) for r in make_image_rows(offers)}
    specs = spark.createDataFrame(
        image_spec_rows(offers), "image_id string, seed long, ordinal long, k long"
    )
    got = {
        r["image_id"]: bytes(r["bytes"])
        for r in specs.repartition(4)
        .mapInPandas(synth_image_batches, schema=SYNTH_IMAGE_FIELDS)
        .collect()
    }
    assert got == want and len(got) > 5
