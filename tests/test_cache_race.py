"""The round loop's output jobs race over the fused fetch+parse cache.

That race is compute-once ONLY inside a single JVM, where the BlockManager's
per-block get-or-compute lock serializes racing computes of the same
partition. On a multi-executor master (local-cluster / standalone / YARN /
k8s) the lock is executor-local: two racing jobs can compute the SAME
uncached partition on different executors, re-running the fused python parse
up to min(racers, executors) times per round. The engine therefore keys its
submission order off the master (engine.is_single_jvm_master): race when
single-JVM, materialize-the-cache-first (via the summary scan) when not.

These tests pin all three legs: the master classification, compute-once
under the single-JVM race, and compute-once under the multi-executor
materialize-first order (real local-cluster JVMs, via a subprocess — a
second SparkSession cannot share this suite's gateway).
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
import textwrap

from realestate_scraper_spark.crawl.engine import CrawlEngine, is_single_jvm_master
from realestate_scraper_spark.sources.synth import (
    make_offers,
    make_site_graph,
    seed_urls,
)
from tests.conftest import REPO


def test_master_classification():
    # single JVM: the in-process local modes (with or without thread count /
    # maxFailures suffixes)
    for m in ("local", "local[4]", "local[*]", "local[8,2]"):
        assert is_single_jvm_master(m), m
    # multi-executor: separate executor JVMs, executor-local cache locks
    for m in (
        "local-cluster[4,4,8192]",
        "spark://host:7077",
        "yarn",
        "k8s://https://host:6443",
    ):
        assert not is_single_jvm_master(m), m


def test_single_jvm_race_is_compute_once(spark, tmp_path):
    """local[N]: the racing consumers (staged / summary / insert / update)
    share ONE compute of every fused-stage partition — the accumulator
    ticks once per partition compute, so it must read exactly
    rounds x fetch-exchange-width."""
    offers = make_offers(seed=42, n_pages=3, cards_per_page=8)
    graph = make_site_graph(offers, n_pages=3, page_weight_kb=8)
    eng = CrawlEngine(spark, str(tmp_path / "run"), graph, lookahead=2)
    assert eng._single_jvm is True
    eng.parse_computes_acc = spark.sparkContext.accumulator(0)
    eng.seed(seed_urls())
    stats = eng.run(max_rounds=10)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert stats["rounds"] > 0
    assert eng.parse_computes_acc.value == stats["rounds"] * n_part


_PROBE = textwrap.dedent(
    """
    import sys, tempfile, time
    sys.path.insert(0, {repo!r})
    from realestate_scraper_spark.session import get_spark
    from realestate_scraper_spark.crawl.engine import CrawlEngine
    from realestate_scraper_spark.sources.synth import (
        make_offers, make_site_graph, seed_urls,
    )

    spark = get_spark(
        app_name="mjvm-race-test", master="local-cluster[2,2,2048]",
        shuffle_partitions=4,
        extra_conf={{"spark.executorEnv.PYTHONPATH": {repo!r}}},
    )
    sc = spark.sparkContext
    deadline = time.monotonic() + 120
    while sc.defaultParallelism < 4 and time.monotonic() < deadline:
        time.sleep(0.5)
    assert sc.defaultParallelism == 4, sc.defaultParallelism
    offers = make_offers(seed=42, n_pages=3, cards_per_page=8)
    graph = make_site_graph(offers, n_pages=3, page_weight_kb=8)
    eng = CrawlEngine(spark, tempfile.mkdtemp(), graph, lookahead=2)
    assert eng._single_jvm is False
    eng.parse_computes_acc = sc.accumulator(0)
    eng.seed(seed_urls())
    stats = eng.run(max_rounds=10)
    print("RESULT", stats["pages_fetched"], stats["rounds"],
          eng.parse_computes_acc.value, flush=True)
    spark.stop()
    """
)


def test_multi_executor_order_is_compute_once():
    """local-cluster (2 executor JVMs): with the materialize-first order the
    fused stage still computes each partition exactly once per round.
    (Forcing the single-JVM racing order on the same master measured 22
    computes for 16 partitions — the duplicate-compute failure this order
    exists to prevent; that demonstration lives in BENCH/BASELINE.md.)"""
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(_PROBE.format(repo=str(REPO)))
        path = fh.name
    out = subprocess.run(
        [sys.executable, path], capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][-1]
    _, pages, rounds, acc = line.split()
    assert int(pages) == 125
    assert int(acc) == int(rounds) * 4, line
