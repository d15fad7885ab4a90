"""Frontier eviction (re-crawl-after-TTL) and the deletable cuckoo
prefilter — the consumer of crawl/cuckoo.py (north_rule: "broadcast-
partitioned Bloom filter (with cuckoo-filter fallback for deletable
entries)").

The eviction semantics: a DONE offer URL older than the TTL is removed from
the durable bucketed seen store AND the in-memory prefilter, so the next
listing sweep that links it re-admits it through the Bloom/anti-join gate as
a fresh PENDING row. The reference can only re-crawl by starting a whole run
over a fresh DedupeSet (cli.py:128-139); at a 10^10-URL frontier the
eviction must be surgical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realestate_scraper_spark.crawl import frontier as frontier_mod
from realestate_scraper_spark.crawl.engine import CrawlEngine
from realestate_scraper_spark.schemas import STATUS_DONE
from realestate_scraper_spark.sources.synth import build_corpus, seed_urls

N_PAGES = 2
CARDS = 4

_LINK_SCHEMA = (
    "source string, page_idx int, parent_url string, parent_slot int, "
    "parent_kind string, dom_idx int, href string"
)


def _rediscovery_candidates(spark, eng, row):
    """One link row re-linking an already-crawled offer URL (what a later
    listing sweep emits), pushed through the exact insert path the engine
    runs per round: classify → Bloom verdict → bucketed anti-join."""
    links = spark.createDataFrame(
        [
            (
                row["source"], row["page_idx"],
                f"https://{row['domain']}/?page=1", 0, "listing", 0,
                row["url"],
            )
        ],
        _LINK_SCHEMA,
    )
    cands = frontier_mod.classify_and_key_links(
        links, eng.n_salts,
        dedup_partitions=eng.seen_store.n_buckets, bloom=eng.bloom,
    )
    return frontier_mod.anti_join_seen(cands, eng._seen(), eng.bloom)


@pytest.fixture(scope="module")
def cuckoo_run(spark, tmp_path_factory):
    _, _, graph = build_corpus(seed=42, n_pages=N_PAGES, cards_per_page=CARDS)
    run_dir = str(tmp_path_factory.mktemp("cuckoo_crawl"))
    eng = CrawlEngine(spark, run_dir, graph, n_salts=2, prefilter="cuckoo")
    eng.seed(seed_urls())
    stats = eng.run(max_rounds=12)
    return eng, stats


def test_cuckoo_prefilter_crawl_equals_bloom(spark, cuckoo_run, tmp_path_factory):
    """The prefilter choice is invisible to crawl semantics: identical
    frontier (url_canon, status) sets and offer counts under bloom vs
    cuckoo (false positives route through the same exact anti-join; false
    negatives cannot occur for inserted keys in either structure)."""
    eng, stats = cuckoo_run
    _, _, graph = build_corpus(seed=42, n_pages=N_PAGES, cards_per_page=CARDS)
    ref = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("bloom_crawl")), graph, n_salts=2
    )
    ref.seed(seed_urls())
    ref_stats = ref.run(max_rounds=12)
    assert stats == ref_stats
    got = sorted(
        (r["url_canon"], r["status"]) for r in eng.frontier().collect()
    )
    want = sorted(
        (r["url_canon"], r["status"]) for r in ref.frontier().collect()
    )
    assert got == want
    assert eng.offers().count() == ref.offers().count()


def test_sharded_cuckoo_save_load_delete(spark, cuckoo_run, tmp_path):
    from realestate_scraper_spark.crawl.cuckoo import ShardedCuckoo

    eng, _ = cuckoo_run
    path = str(tmp_path / "cuckoo.npz")
    eng.bloom.save(path)
    loaded = ShardedCuckoo.load(path)
    assert set(loaded.shards) == set(eng.bloom.shards)
    fr = eng.frontier().select("url_hash64", "domain_salt")
    flagged = loaded.filter_maybe_seen(fr)
    # no false negatives on inserted keys
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    # delete one key → that key (and only structurally-colliding ones) drops
    one = fr.limit(1)
    assert loaded.delete_df(one) == 1
    again = loaded.filter_maybe_seen(one)
    assert again.filter(F.col("maybe_seen")).count() == 0


def test_evict_seen_readmits_after_ttl(spark, cuckoo_run):
    """The end-to-end eviction property on the cuckoo path: a re-discovered
    DONE offer URL is blocked before eviction, admitted after; other URLs
    stay protected. (Runs LAST against the shared engine — it mutates the
    seen set.)"""
    eng, _ = cuckoo_run
    done = (
        eng.frontier()
        .filter((F.col("kind") == "offer") & (F.col("status") == STATUS_DONE))
        .select("url", "url_canon", "source", "domain", "page_idx")
        .limit(1)
        .collect()[0]
    )
    assert _rediscovery_candidates(spark, eng, done).count() == 0
    n = eng.evict_seen(ttl_rounds=0)
    assert n > 0
    fresh = _rediscovery_candidates(spark, eng, done)
    assert [r["url_canon"] for r in fresh.collect()] == [done["url_canon"]]
    # listing pages were NOT evicted (kind == "offer" only) — still blocked
    listing = (
        eng.frontier()
        .filter(F.col("kind") == "listing")
        .select("url", "url_canon", "source", "domain", "page_idx")
        .limit(1)
        .collect()[0]
    )
    assert _rediscovery_candidates(spark, eng, listing).count() == 0


def test_evict_seen_bloom_fallback_rebuilds(spark, tmp_path):
    """Under the default Bloom prefilter eviction still works — the filter
    is rebuilt from the post-delete store (the O(seen) cost the cuckoo
    variant avoids)."""
    _, _, graph = build_corpus(seed=42, n_pages=1, cards_per_page=4)
    eng = CrawlEngine(spark, str(tmp_path / "bloom_evict"), graph, n_salts=2)
    eng.seed(seed_urls())
    eng.run(max_rounds=8)
    done = (
        eng.frontier()
        .filter((F.col("kind") == "offer") & (F.col("status") == STATUS_DONE))
        .select("url", "url_canon", "source", "domain", "page_idx")
        .limit(1)
        .collect()[0]
    )
    assert _rediscovery_candidates(spark, eng, done).count() == 0
    assert eng.evict_seen(ttl_rounds=0) > 0
    fresh = _rediscovery_candidates(spark, eng, done)
    assert [r["url_canon"] for r in fresh.collect()] == [done["url_canon"]]
