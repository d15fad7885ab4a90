"""The in-crawl image stage: crawl → photos ⨝ bytes → decode/verify →
images table in the exact input_hint shape, pHash/caption equal to oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestate_scraper_spark.crawl.engine import CrawlEngine
from realestate_scraper_spark.schemas import IMAGES_SCHEMA
from realestate_scraper_spark.sources.synth import build_corpus, seed_urls


def test_process_images_end_to_end(spark, tmp_path):
    offers, images, graph = build_corpus(seed=42, n_pages=2, cards_per_page=6)
    eng = CrawlEngine(spark, str(tmp_path / "imgs"), graph, n_salts=2)
    eng.seed(seed_urls())
    eng.run(max_rounds=6)

    images_input = spark.createDataFrame(images, schema=IMAGES_SCHEMA)
    out = eng.process_images(images_input)
    assert [f.name for f in out.schema.fields] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    ]

    got = {r["image_id"]: r for r in out.collect()}
    robots_blocked = {o.offer_id for o in offers if o.ordinal % 23 == 21}
    by_id = {row["image_id"]: row for row in images}
    expected_ids = set()
    for o in offers:
        if o.offer_id in robots_blocked:
            continue
        expected_ids.update(o.photo_image_ids)
    assert set(got) == expected_ids
    for iid in expected_ids:
        src, r = by_id[iid], got[iid]
        # decode recomputation matches generation-time oracle (input_hint:
        # pHash + caption/field equality)
        assert r["phash"] == src["phash"], iid
        assert r["w"] == src["w"] and r["h"] == src["h"], iid
        assert r["fmt"] == src["fmt"], iid
        assert r["caption"] == src["caption"], iid
        assert bytes(r["bytes"]) == bytes(src["bytes"]), iid


def test_mime_pregate_quarantines_junk_bytes(spark, tmp_path):
    """S4/F21: bytes whose magic matches no allowed format (HTML pretending
    to be an image) are quarantined by the JVM-side sniff BEFORE the decode
    stage; valid rows are unaffected."""
    offers, images, graph = build_corpus(seed=42, n_pages=2, cards_per_page=6)
    eng = CrawlEngine(spark, str(tmp_path / "mime"), graph, n_salts=2)
    eng.seed(seed_urls())
    eng.run(max_rounds=6)

    # corrupt a handful of linked images: HTML payload under an image id
    victims = {row["image_id"] for row in images[:3]}
    tampered = [
        dict(row, bytes=bytearray(b"<html><body>not an image</body></html>"))
        if row["image_id"] in victims
        else row
        for row in images
    ]
    out = eng.process_images(
        spark.createDataFrame(tampered, schema=IMAGES_SCHEMA)
    )
    got_ids = {r["image_id"] for r in out.collect()}
    assert not (got_ids & victims)

    q = {
        r["image_id"]: r["reject_reason"]
        for r in eng.t_images_quarantine.read(spark).collect()
    }
    robots_blocked = {o.offer_id for o in offers if o.ordinal % 23 == 21}
    linked_victims = {
        iid
        for o in offers
        if o.offer_id not in robots_blocked
        for iid in o.photo_image_ids
        if iid in victims
    }
    assert linked_victims, "tampered images not linked by the crawl — widen"
    for iid in linked_victims:
        assert q.get(iid) == "mime_mismatch", iid


def test_process_images_with_thumbnails(spark, tmp_path):
    """Thumbnail stage wired into the engine sink: the curated images table
    carries (thumb, thumb_w, thumb_h) alongside the input_hint columns, the
    thumbs respect the max-dim and aspect ratio, and decode round-trips."""
    from realestate_scraper_spark.functions.images import decode_image

    offers, images, graph = build_corpus(seed=42, n_pages=1, cards_per_page=6)
    eng = CrawlEngine(spark, str(tmp_path / "thumbs"), graph, n_salts=2)
    eng.seed(seed_urls())
    eng.run(max_rounds=4)

    images_input = spark.createDataFrame(images, schema=IMAGES_SCHEMA)
    out = eng.process_images(images_input, thumbnails=48)
    assert [f.name for f in out.schema.fields] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "thumb", "thumb_w", "thumb_h",
    ]
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["thumb"] is not None, r["image_id"]
        assert max(r["thumb_w"], r["thumb_h"]) <= 48
        # aspect preserved within integer rounding
        assert abs(r["thumb_w"] / r["thumb_h"] - r["w"] / r["h"]) < 0.12
        px = decode_image(bytes(r["thumb"]), "png")
        assert px.shape == (r["thumb_h"], r["thumb_w"], 3)
