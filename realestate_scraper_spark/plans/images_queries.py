"""Image-pipeline queries (rows-only: binary decode UDFs are not
SQL-expressible, so the driver records the weaker rows-only check; the strict
pixel/pHash invariants are asserted in tests/test_images.py instead).

The images input is synthesized deterministically in-process (the exact
input_hint table shape) — no external data; sf_dir only scales row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_scraper_spark.functions.images import (
    IMAGE_META_FIELDS,
    decode_meta_batches,
)
from realestate_scraper_spark.schemas import IMAGES_SCHEMA
from realestate_scraper_spark.session import local_df
from realestate_scraper_spark.sources.synth import build_corpus

REGISTRY: dict = {}

_STAGED: dict = {}


def _images_df(spark: SparkSession, n_pages: int = 2) -> DataFrame:
    """Images table staged through parquet (once per process): the queries
    read a TABLE, like process_images at scale — no driver-held blobs
    serialized into every task that scans the images."""
    path = _STAGED.get(n_pages)
    if path is None:
        import tempfile

        _, images, _ = build_corpus(seed=42, n_pages=n_pages, cards_per_page=6)
        path = tempfile.mkdtemp(prefix="images_q_") + "/images"
        local_df(spark, images, IMAGES_SCHEMA, n_partitions=8).write.parquet(path)
        _STAGED[n_pages] = path
    return spark.read.parquet(path)


def q50_image_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized image UDF of the input_hint: sniff + decode + sha256 +
    pHash per Arrow batch (mapInPandas), over the exact input-hint schema."""
    return _images_df(spark).select("image_id", "bytes").mapInPandas(
        decode_meta_batches, schema=IMAGE_META_FIELDS
    )


# 9 disjoint bit-bands over the 64-bit pHash (top byte + eight 7-bit bands):
# a pair at Hamming ≤ 8 differs in ≤ 8 bands, so by pigeonhole at least one
# band is bit-equal — the banded scheme has GUARANTEED recall 1.0 for the
# d ≤ 8 threshold (tests/test_images.py proves it against brute-force ground
# truth). Band 0 is exactly the r4 top-byte bucket, whose standalone recall
# is measured alongside (any true pair with a differing top-byte bit never
# became a candidate under it).
_PHASH_BANDS = [(56, 8)] + [(s, 7) for s in range(49, -1, -7)]


def q51_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash near-dup via banded LSH (the q32 shape on bits): each image
    explodes into 9 (band, value) keys, candidates come from ONE equi-join
    on the band key — never all-pairs — and are verified by exact Hamming
    distance ≤ 8 via bit_count(xor), all JVM-side expressions after the
    decode stage. ``topbyte_candidate`` marks pairs the r4 top-byte-only
    bucketing would have found, so the board row carries the old scheme's
    recall (sum(topbyte_candidate)/count) next to the guaranteed-complete
    pair set."""
    imgs = _images_df(spark).select("image_id", "phash")
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("phash"), shift)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for i, (shift, width) in enumerate(_PHASH_BANDS)
        ]
    )
    sides = imgs.select("image_id", "phash", F.explode(bands).alias("bk"))
    a, b = sides.alias("a"), sides.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("image_a"),
            F.col("b.image_id").alias("image_b"),
            F.col("a.phash").alias("phash_a"),
            F.col("b.phash").alias("phash_b"),
        )
        .distinct()  # a pair may agree on several bands
    )
    ham = F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b")))
    topbyte = F.shiftrightunsigned(F.col("phash_a"), 56) == F.shiftrightunsigned(
        F.col("phash_b"), 56
    )
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= 8)
        .select(
            "image_a", "image_b", "hamming", topbyte.alias("topbyte_candidate")
        )
    )


def q52_crawl_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full crawl of the synthetic 4-portal web (mock fetch, politeness,
    Bloom dedup, bucketed seen store, parse, refine) returning the offers
    table — the engine's flagship path as a single query. The corpus is one
    listing page × 6 cards per portal (2 crawl rounds end-to-end) and every
    engine width is pinned to its toy-scale minimum, so the query costs
    ~1/3 of the r3 version and the WHOLE registry fits the driver's per-run
    time budget (the r3 failure: the board stopped before q52/q53/q54).
    The bench (bench.py) is where the crawl runs at depth."""
    import tempfile

    from realestate_scraper_spark.crawl.engine import CrawlEngine
    from realestate_scraper_spark.sources.synth import seed_urls

    _, _, graph = build_corpus(seed=42, n_pages=1, cards_per_page=6)
    run_dir = tempfile.mkdtemp(prefix="crawl_q52_")
    # The engine's jobs all execute INSIDE this callable (the returned
    # offers() view is the only lazy part), so a narrow-and-restore of the
    # shuffle width is safe and cuts the toy crawl's per-action scheduling
    # cost — 24 URLs through 32-wide exchanges is pure task overhead.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        eng = CrawlEngine(
            spark, run_dir, graph,
            n_salts=2, append_coalesce=1, seen_buckets=2,
            seen_compact_every=64,
        )
        eng.seed(seed_urls())
        eng.run(max_rounds=4)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return eng.offers()


def q54_image_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail stage (the brief's resize step as a first-class op): sniff →
    decode → aspect-preserving bilinear downscale to max-dim 48 → re-encode,
    per Arrow batch (mapInPandas, zero shuffle). Returns the metadata
    projection; the blob lands in the thumb column for sinks that keep it.
    Pixel-level invariants (shape, aspect, PSNR vs reference downscale) are
    asserted in tests/test_images.py."""
    from realestate_scraper_spark.functions.images import (
        THUMB_FIELDS,
        make_thumbnail_batches,
    )

    return (
        _images_df(spark)
        .select("image_id", "bytes")
        .mapInPandas(make_thumbnail_batches(max_dim=48), schema=THUMB_FIELDS)
        .select(
            "image_id", "thumb_w", "thumb_h", "src_w", "src_h", "decode_ok"
        )
    )


REGISTRY["q50_image_decode_meta"] = (q50_image_decode_meta, None)
REGISTRY["q51_phash_near_dup"] = (q51_phash_near_dup, None)
REGISTRY["q52_crawl_end_to_end"] = (q52_crawl_end_to_end, None)
REGISTRY["q54_image_thumbnails"] = (q54_image_thumbnails, None)
