"""realestate_scraper_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the capabilities of the reference scraper (M1A5TO/realestate-scraper,
a sequential requests/BeautifulSoup loop) as an idiomatic Spark DataFrame engine:

- ``crawl/``      — URL frontier, Bloom/anti-join URL-seen dedup, politeness
                    scheduler, round-based fetch/parse loop, checkpoint/resume.
- ``functions/``  — scalar expression library (URL canonicalization, price/date
                    parsing, geo math, image codecs + pHash) kept JVM-side
                    wherever Spark expressions can carry the semantics.
- ``operators/``  — relational + training-data operators (dedup families,
                    similarity search, text analysis) as DataFrame compositions.
- ``sources/``    — table IO (Parquet now, Iceberg-shaped interface) and the
                    deterministic synthetic site graph used in place of live
                    portals.

Design rules (SURVEY.md §7): DataFrame-first, Catalyst-planned; pandas/Arrow UDFs
only where expressions cannot express the semantics (HTML parse, image decode);
no per-row Python in any hot path; shuffles only at dedup/agg boundaries.
"""

__version__ = "0.1.0"
