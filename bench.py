#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], forcing full
materialization through the noop sink, plus crawl and image-decode
throughput runs on the deterministic synthetic corpus.

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec}, "sf": ...,
         "throughput": {crawl_pages_per_sec, offer_rows_per_sec,
                        images_decoded_per_sec}}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    "q01_pricing_summary",
    "q02_coverage_join",
    "q05_photo_seq_window",
    "q06_topk_per_group",
    "q07_state_replay",
    "q23_spatial_dup_join",
    "q26_sessionize",
    "q30_dedup_exact",
    "q31_minhash_signatures",
    "q32_minhash_band_pairs",
    "q34_simhash",
    "q39_ann_brute_topk",
    "q40_ann_lsh_buckets",
    "q41_embedding_near_dup",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def hw_probe(procs: int = 16) -> dict:
    """Bare-multiprocessing hardware-ceiling probe (images/s + parse pages/s),
    run BEFORE the JVM exists (fork-safe). Cross-round bench comparisons on
    this shared box are confounded by ~2× host-speed swings (measured r3→r4:
    image_decode doubled on untouched code); these fields let the reader
    ceiling-normalize round-over-round deltas."""
    sys.path.insert(0, str(REPO / "scripts"))
    from scaling_bench import hardware_baseline, hardware_parse_baseline

    return {
        "procs": procs,
        "images_per_sec": round(hardware_baseline(procs, total=12000), 1),
        "parse_pages_per_sec": round(
            hardware_parse_baseline(procs, total=6000), 1
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    probe = hw_probe()

    from realestate_scraper_spark.plans import relational, trainingdata
    from realestate_scraper_spark.session import get_spark, local_df

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    registry: dict = {}
    registry.update(relational.REGISTRY)
    registry.update(trainingdata.REGISTRY)

    # warm the JVM: parquet footers + the session's first-use execution
    # paths (Janino/codegen compiler stack, noop sink, shuffle + broadcast
    # join machinery, window exec, Arrow python runner, parquet WRITE
    # committer) on a 64-row frame. Steady-state is what a long-lived
    # cluster session runs in; none of the timed queries below are touched.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    wdf = local_df(
        spark,
        [(i, f"k{i % 4}", float(i)) for i in range(64)],
        "id long, k string, v double",
        n_partitions=4,
    )
    _force(wdf.groupBy("k").agg(F.sum("v").alias("s"), F.avg("v").alias("a")))
    _force(wdf.repartition(8, "k").join(
        wdf.select(F.col("id").alias("id2"), "k"), "k"))
    _force(wdf.join(F.broadcast(wdf.select("k").distinct()), "k"))
    _force(wdf.withColumn(
        "r", F.row_number().over(Window.partitionBy("k").orderBy("v"))))
    _force(wdf.mapInPandas(lambda it: it, schema="id long, k string, v double"))
    wdf.write.mode("overwrite").parquet(
        os.path.join(tempfile.mkdtemp(prefix="bench_warm_"), "w")
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = registry[name]
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    # ---- crawl throughput on the synthetic web
    from realestate_scraper_spark.crawl.engine import CrawlEngine
    from realestate_scraper_spark.sources.synth import (
        image_spec_rows,
        make_offers,
        make_site_graph,
        seed_urls,
        synth_image_batches,
        SYNTH_IMAGE_FIELDS,
    )

    # wide pages: throughput-representative (per-round driver cost is fixed;
    # work per round scales with cards — the cluster-scale shape)
    offers = make_offers(seed=42, n_pages=4, cards_per_page=64)
    graph = make_site_graph(offers, n_pages=4)
    run_dir = tempfile.mkdtemp(prefix="bench_crawl_")
    # crawl rounds move small frames; wide shuffles are pure overhead there
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    t0 = time.monotonic()
    # lookahead=4: the throughput configuration (rounds ≈ depth/4); strict
    # reference-equivalence runs keep lookahead=0 (see engine docstring).
    # Widths pinned to the LOAD, not the core count: this corpus is 1,152
    # pages — the auto-derived 32-core widths (128 salts, 64 seen buckets,
    # 32-file appends) are sized for fat rounds and pure overhead here;
    # the scale evidence for derived widths is the depth bench.
    eng = CrawlEngine(
        spark, run_dir, graph, n_salts=16, lookahead=4,
        append_coalesce=4, seen_buckets=8,
    )
    eng.seed(seed_urls())
    stats = eng.run(max_rounds=30)
    crawl_sec = time.monotonic() - t0
    timings["crawl_end_to_end"] = round(crawl_sec, 3)

    # ---- image decode throughput (Arrow-batched pandas stage)
    from realestate_scraper_spark.functions.images import (
        IMAGE_META_FIELDS,
        decode_meta_batches,
    )

    # stage the image corpus through parquet (untimed): the timed decode
    # reads a TABLE, like process_images at scale. The blobs are SYNTHESIZED
    # EXECUTOR-SIDE from KB-scale spec rows (image_blob is a pure function
    # of the key), so no driver-held blobs are serialized into tasks — the
    # r2/r4 "task of very large size" staging WARN is gone structurally.
    img_path = os.path.join(tempfile.mkdtemp(prefix="bench_imgs_"), "images")
    specs = local_df(
        spark,
        image_spec_rows(offers),
        "image_id string, seed long, ordinal long, k long",
        n_partitions=cpus,
    )
    specs.repartition(cpus).mapInPandas(
        synth_image_batches, schema=SYNTH_IMAGE_FIELDS
    ).write.parquet(img_path)
    img_df = spark.read.parquet(img_path).repartition(cpus)
    n_images = img_df.count()
    t0 = time.monotonic()
    _force(
        img_df.select("image_id", "bytes").mapInPandas(
            decode_meta_batches, schema=IMAGE_META_FIELDS
        )
    )
    img_sec = time.monotonic() - t0
    timings["image_decode"] = round(img_sec, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "throughput": {
            "crawl_pages_per_sec": round(stats["pages_fetched"] / crawl_sec, 2),
            "offer_rows_per_sec": round(stats["offers_parsed"] / crawl_sec, 2),
            "images_decoded_per_sec": round(n_images / img_sec, 2),
            "crawl_pages_fetched": stats["pages_fetched"],
            "crawl_offers_parsed": stats["offers_parsed"],
            "n_images": n_images,
            "cpus": cpus,
        },
        "hw_probe": probe,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
