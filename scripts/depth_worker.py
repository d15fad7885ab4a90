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
    # probe knob: pin the salt-key count (default: engine derives 4×dp) —
    # used to isolate salt-width-proportional per-round costs
    ap.add_argument("--n-salts", type=int, default=None)
    # attribution knob: write a Spark event log here; with the engine's
    # per-phase spark.job.description tagging this yields an exact
    # job→stage→phase map (task metrics, GC, shuffle, python eval time)
    ap.add_argument("--eventlog-dir", type=str, default=None)
    # extra spark confs for A/B probes, e.g. --conf spark.sql.codegen.wholeStage=false
    ap.add_argument("--conf", action="append", default=[])
    # multi-JVM mode: run on local-cluster[N, cpus, 2048*cpus] — N separate
    # executor processes with their OWN heaps and python workers, torrent
    # broadcast and shuffle crossing process boundaries. --cpus then means
    # cores PER EXECUTOR; scaling evidence = grow N at fixed executor size,
    # the way a real cluster grows.
    ap.add_argument("--executors", type=int, default=None)
    args = ap.parse_args()

    from realestate_scraper_spark.crawl.engine import CrawlEngine
    from realestate_scraper_spark.session import get_spark
    from realestate_scraper_spark.sources.synth import (
        make_offers,
        make_site_graph,
        seed_urls,
    )

    extra_conf: dict[str, str] = {}
    if args.eventlog_dir:
        Path(args.eventlog_dir).mkdir(parents=True, exist_ok=True)
        extra_conf.update(
            {
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": args.eventlog_dir,
            }
        )
    for kv in args.conf:
        k, _, v = kv.partition("=")
        extra_conf[k] = v
    extra_conf = extra_conf or None
    if args.executors:
        total = args.executors * args.cpus
        master = f"local-cluster[{args.executors},{args.cpus},{2048 * args.cpus}]"
        # executor JVMs spawn their own python workers, which don't inherit
        # the driver's sys.path — ship the repo root explicitly
        extra_conf = dict(extra_conf or {})
        extra_conf["spark.executorEnv.PYTHONPATH"] = str(REPO)
    else:
        total = args.cpus
        master = f"local[{args.cpus}]"
    spark = get_spark(
        app_name=f"depth-{total}-{args.cards}",
        master=master,
        # the fetch exchange is pinned to this width — scale it with the
        # level so the data plane actually runs cluster-wide at both levels
        shuffle_partitions=total,
        extra_conf=extra_conf,
    )
    if args.executors:
        # executors register asynchronously; the engine derives its write
        # widths from defaultParallelism, so wait for the full cluster
        deadline = time.monotonic() + 60
        sc = spark.sparkContext
        while sc.defaultParallelism < total and time.monotonic() < deadline:
            time.sleep(0.5)
        assert sc.defaultParallelism == total, sc.defaultParallelism
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
        # widths all DERIVE from defaultParallelism (r3 verdict: fixed
        # append_coalesce=4 / n_salts / seen_buckets capped the in-loop
        # write stages at the same task count at every core count, and the
        # depth-bench asymptote read 0.28). Derived: salt keys ≈ 4×
        # partitions (balls-into-bins — fewer keys leave ~1/3 of partitions
        # empty), append width = defaultParallelism, seen buckets ≥ 2×
        # parallelism — each a per-level function, like executor-count-
        # scaled table properties on a real cluster.
        lookahead=args.lookahead,
        n_salts=args.n_salts,
    )
    eng.seed(seed_urls())
    stats = eng.run(max_rounds=args.pages + 4)
    crawl_sec = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cpus": total,
                "executors": args.executors,
                "cards": args.cards,
                "depth": args.pages,
                "lookahead": args.lookahead,
                "weight_kb": args.weight_kb,
                "crawl_sec": round(crawl_sec, 2),
                "crawl_pages": stats["pages_fetched"],
                "rounds": stats["rounds"],
                "offers_parsed": stats["offers_parsed"],
                "pages_per_sec": round(stats["pages_fetched"] / crawl_sec, 2),
                # driver-observed per-phase wall across the run — turns the
                # "where do the non-dataplane seconds go" question into a
                # measurement instead of a fit residual
                "phases": {
                    k: round(v, 2) for k, v in sorted(eng.phase_times.items())
                },
            }
        )
    )


if __name__ == "__main__":
    main()
