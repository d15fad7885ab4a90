#!/usr/bin/env python
"""One depth-bench crawl at a fixed parallelism level (fresh JVM).

Crawls the deterministic synthetic web end-to-end through the round LOOP
(fetch → parse → Bloom+bucketed-seen dedup → refine → sinks) with pagination
lookahead, and reports loop throughput + round count. The knobs sweep pages
per round (cards) at fixed depth, so scripts/depth_bench.py can measure how
the fixed per-round driver latency amortizes with round size.
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
    ap.add_argument("--pages", type=int, default=16)
    ap.add_argument("--cards", type=int, default=128)
    ap.add_argument("--lookahead", type=int, default=8)
    ap.add_argument("--weight-kb", type=int, default=48)
    args = ap.parse_args()

    from realestate_scraper_spark.crawl.engine import CrawlEngine
    from realestate_scraper_spark.session import get_spark
    from realestate_scraper_spark.sources.synth import (
        make_offers,
        make_site_graph,
        seed_urls,
    )

    spark = get_spark(
        app_name=f"depth-{args.cpus}-{args.cards}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=16,
    )
    spark.range(1000).count()  # JVM warmup

    offers = make_offers(
        seed=42, n_pages=args.pages, cards_per_page=args.cards
    )
    graph = make_site_graph(
        offers, n_pages=args.pages, page_weight_kb=args.weight_kb
    )
    t0 = time.monotonic()
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix=f"depth{args.cpus}_{args.cards}_"),
        graph,
        # salts scale with the TARGET parallelism (same job at both levels):
        # 4 domains × 16 salts = 64 domain_salt keys hashed into the pinned
        # 16-partition fetch exchange — with only 16 keys, balls-into-bins
        # collisions leave ~1/3 of partitions empty and the parse inherits
        # the skewed cache layout (measured 1.6× on the staged path)
        n_salts=16,
        lookahead=args.lookahead,
    )
    eng.seed(seed_urls())
    stats = eng.run(max_rounds=args.pages + 4)
    crawl_sec = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "cards": args.cards,
                "depth": args.pages,
                "lookahead": args.lookahead,
                "weight_kb": args.weight_kb,
                "crawl_sec": round(crawl_sec, 2),
                "crawl_pages": stats["pages_fetched"],
                "rounds": stats["rounds"],
                "offers_parsed": stats["offers_parsed"],
                "pages_per_sec": round(stats["pages_fetched"] / crawl_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
