#!/usr/bin/env python
"""Long-horizon soak (VERDICT r5 ask #7): a 50+-round crawl shaped like the
resumable service a 100 TB crawl actually runs as — many small rounds over
deep pagination — asserting the three unbounded-growth risks stay bounded:

1. **seen-store file count** ≤ n_buckets × (compact_every + 1) at every
   round (compaction cadence bounds the scan's open cost at O(appends-
   since-compaction), never O(rounds));
2. **politeness clock monotone**: every domain#salt high-water mark is
   non-decreasing across rounds (ST7 cross-round continuity — a regression
   here silently re-opens the per-domain budget);
3. **driver memory flat**: Python-driver RSS and the JVM child's RSS in
   the late third of the run stay within 35 % of the early third (no
   per-round accumulation; the working set is rebuilt from O(batch)
   unions + periodic lineage cuts).

Drives CrawlEngine._one_round directly (run() would finalize + compact the
frontier per call, hiding the cadence under test). Prints one JSON line;
non-zero exit on any bound violation.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_LISTING_PAGES = 56  # rounds ≈ depth with lookahead 0
CARDS = 4
CPUS = 8
MIN_ROUNDS = 50
RSS_GROWTH_LIMIT = 0.35


def _rss_kb(pid: int | str = "self") -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _jvm_pid() -> int | None:
    me = os.getpid()
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().split()
            if "java" in parts[1] and int(parts[3]) == me:
                return int(p)
        except (OSError, IndexError, ValueError):
            continue
    return None


def main() -> None:
    from realestate_scraper_spark.crawl.engine import CrawlEngine
    from realestate_scraper_spark.session import get_spark
    from realestate_scraper_spark.sources.synth import (
        make_offers,
        make_site_graph,
        seed_urls,
    )

    spark = get_spark(
        app_name="soak", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.range(1000).count()
    jvm = _jvm_pid()

    offers = make_offers(
        seed=42, n_pages=N_LISTING_PAGES, cards_per_page=CARDS
    )
    graph = make_site_graph(offers, n_pages=N_LISTING_PAGES)
    eng = CrawlEngine(
        spark, tempfile.mkdtemp(prefix="soak_"), graph, n_salts=8
    )
    eng.seed(seed_urls())

    file_bound = eng.seen_store.n_buckets * (eng.seen_store.compact_every + 1)
    samples = []
    clock_prev: dict[str, float] = {}
    violations: list[str] = []
    t0 = time.monotonic()
    rounds = 0
    while rounds < N_LISTING_PAGES + 8:
        progressed, fetched_n, _offers_n = eng._one_round()
        if not progressed:
            break
        rounds += 1
        n_files = eng.seen_store.n_files()
        if n_files > file_bound:
            violations.append(
                f"round {rounds}: seen files {n_files} > bound {file_bound}"
            )
        for k, v in eng._salt_clock.items():
            if v < clock_prev.get(k, float("-inf")) - 1e-9:
                violations.append(
                    f"round {rounds}: politeness clock regressed for {k}: "
                    f"{clock_prev[k]} -> {v}"
                )
            clock_prev[k] = v
        samples.append(
            {
                "round": rounds,
                "fetched": fetched_n,
                "seen_files": n_files,
                "rss_py_kb": _rss_kb(),
                "rss_jvm_kb": _rss_kb(jvm) if jvm else 0,
            }
        )
    wall = time.monotonic() - t0

    assert rounds >= MIN_ROUNDS, f"soak too short: {rounds} rounds"
    third = max(len(samples) // 3, 1)

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    growth = {}
    for key in ("rss_py_kb", "rss_jvm_kb"):
        early = med([s[key] for s in samples[:third]])
        late = med([s[key] for s in samples[-third:]])
        g = (late - early) / early if early else 0.0
        growth[key] = round(g, 3)
        if g > RSS_GROWTH_LIMIT:
            violations.append(
                f"{key} grew {g:.0%} early->late (limit {RSS_GROWTH_LIMIT:.0%})"
            )

    out = {
        "rounds": rounds,
        "pages_fetched": sum(s["fetched"] for s in samples),
        "wall_sec": round(wall, 1),
        "seen_files_max": max(s["seen_files"] for s in samples),
        "seen_files_bound": file_bound,
        "rss_growth": growth,
        "rss_py_kb_first_last": [samples[0]["rss_py_kb"], samples[-1]["rss_py_kb"]],
        "rss_jvm_kb_first_last": [samples[0]["rss_jvm_kb"], samples[-1]["rss_jvm_kb"]],
        "clock_keys_tracked": len(clock_prev),
        "violations": violations,
    }
    print(json.dumps(out))
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
