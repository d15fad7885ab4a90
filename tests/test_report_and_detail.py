"""Coverage report (mierzalnosc analog) + detail-style direct offer seeding."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestate_scraper_spark.crawl.engine import CrawlEngine
from realestate_scraper_spark.crawl.report import coverage_report
from realestate_scraper_spark.sources.synth import build_corpus, seed_urls


def test_coverage_report_counts(spark, tmp_path):
    offers, _, graph = build_corpus(seed=42, n_pages=3, cards_per_page=6)
    eng = CrawlEngine(spark, str(tmp_path / "cov"), graph, n_salts=2)
    eng.seed(seed_urls())
    eng.run(max_rounds=10)

    rep = {
        r["source"]: r.asDict()
        for r in coverage_report(
            eng.frontier(), eng.offers(), eng.quarantine()
        ).collect()
    }
    assert set(rep) == {"otodom", "morizon", "gratka", "trojmiasto"}
    robots_blocked = {o.offer_id for o in offers if o.ordinal % 23 == 21}
    for src, row in rep.items():
        exp_urls = len({o.url for o in offers if o.source == src})
        exp_parsed = len(
            {
                o.offer_id
                for o in offers
                if o.source == src
                and o.golden_row() is not None
                and o.offer_id not in robots_blocked
            }
        )
        assert row["n_urls"] == exp_urls, (src, row)
        assert row["n_parsed"] == exp_parsed, (src, row)
        assert 0 < row["yield_pct"] <= 100.0
        # reject-reason columns materialize as pivot columns
        assert row.get("no_geo", 0) + row.get("no_price", 0) > 0


def test_detail_entry_direct_offer_seed(spark, tmp_path):
    """§3.3: seed the frontier with offer URLs directly (the reference's
    `detail` re-parse from an arbitrary urls.csv) — no listing crawl."""
    offers, _, graph = build_corpus(seed=42, n_pages=2, cards_per_page=5)
    robots_blocked = {o.offer_id for o in offers if o.ordinal % 23 == 21}
    chosen = [o for o in offers if o.source == "morizon"][:8]
    eng = CrawlEngine(spark, str(tmp_path / "detail"), graph, n_salts=2)
    eng.seed([(o.source, o.url) for o in chosen])
    stats = eng.run(max_rounds=3)
    assert stats["rounds"] == 1  # one wave: offers only, nothing discovered
    got = {r["offer_id"] for r in eng.offers().collect()}
    want = {
        o.offer_id
        for o in chosen
        if o.golden_row() is not None and o.offer_id not in robots_blocked
    }
    assert got == want
