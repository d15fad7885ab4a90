"""URL canonicalization — the F1 operator (SURVEY.md §2.8).

Semantics must be *value-equal* to the reference's ``normalize_url``
(scrapper/core/dedup.py:7-14):

1. drop the fragment,
2. rstrip ``/`` from the path,
3. sort non-empty ``&``-separated query segments.

Implemented twice, deliberately:

- :func:`canonicalize_url` — a pure Spark Column expression. This is the hot
  path: it runs JVM-side inside whole-stage codegen over billions of frontier
  rows; no Python is involved.
- :func:`canonicalize_url_py` — a dependency-free Python twin used by
  driver-side seed handling and by tests, which assert equality against the
  reference implementation directly.

The URL-seen keys (north_rule: "canonicalized+murmur3-hashed URLs"):
``F.hash`` = murmur3_32 (Spark's Murmur3Hash), ``F.xxhash64`` = 64-bit key for
the Bloom filter. Both are computed on the canonical form.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a Spark expression (codegen, no UDF).

    Equivalent to scrapper/core/dedup.py:7-14 for http(s) URLs with a
    non-empty authority (the only shape the crawler ever enqueues).
    """
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.substring_index(u, "#", 1)
    has_query = F.instr(no_frag, "?") > 0
    base = F.substring_index(no_frag, "?", 1)
    rawq = F.when(has_query, F.substring_index(no_frag, "?", -1)).otherwise(F.lit(""))
    # Path rstrip('/'): safe on the full base string because scheme://host
    # never ends in '/' unless the path part does ('//' after the scheme is
    # interior, not trailing, whenever an authority is present).
    base_stripped = F.regexp_replace(base, r"/+$", "")
    # But "http://host" with an *empty* authority would be corrupted; guard by
    # never stripping down past "scheme://". (Defensive only; crawler URLs
    # always carry a host.)
    base_final = F.when(base_stripped.endswith(":/"), base).otherwise(base_stripped)
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(rawq, "&"), lambda x: x != F.lit(""))), "&"
    )
    return F.when(qsorted != "", F.concat(base_final, F.lit("?"), qsorted)).otherwise(
        base_final
    )


def canonicalize_url_py(u: str) -> str:
    """Driver-side twin of :func:`canonicalize_url`.

    Independent implementation of the same published semantics
    (scrapper/core/dedup.py:7-14); tests assert tri-equality between this,
    the Spark expression, and the reference function.
    """
    parts = list(urlsplit(u))
    parts[2] = parts[2].rstrip("/")
    parts[3] = "&".join(sorted(q for q in parts[3].split("&") if q))
    parts[4] = ""
    return urlunsplit(parts)


def url_hash32(url_canon: Column | str) -> Column:
    """murmur3_32 of the canonical URL (Spark's built-in Murmur3Hash)."""
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.hash(c)


def url_hash64(url_canon: Column | str) -> Column:
    """xxhash64 of the canonical URL — Bloom-filter / exact-dedup key."""
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.xxhash64(c)


def url_domain(url: Column | str) -> Column:
    """Host part of the URL (JVM-side parse_url)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.parse_url(u, F.lit("HOST"))


def domain_salt(url_canon: Column | str, n_salts: int = 8) -> Column:
    """Partitioning key ``host#k`` with k in [0, n_salts).

    Salting splits a hot domain (the Otodom skew named in BASELINE.json)
    across ``n_salts`` partitions; the politeness budget for the domain is
    divided across its salt shards so the aggregate per-domain rate is
    unchanged (crawl/politeness.py).

    MUST be computed on the CANONICAL url: canonical-equal spellings of one
    URL have to land in the same salt shard, or the sharded Bloom filter sees
    a false negative and the dedup prefilter leaks duplicates.
    """
    u = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.concat_ws(
        "#", url_domain(u), (F.pmod(F.xxhash64(u), F.lit(n_salts))).cast("string")
    )


_KEY_COLS: dict = {}


def with_url_keys(df, url_col: str = "url", n_salts: int = 8):
    """Attach url_canon / url_hash32 / url_hash64 / domain / domain_salt.

    The two projection maps (canonical form, then the keys derived from it)
    are memoized per ``(url_col, n_salts)``: Column objects are immutable
    plan fragments, and rebuilding the canonicalization cascade per crawl
    round is pure driver latency (see engine._phase timings)."""
    memo = _KEY_COLS.get((url_col, n_salts))
    if memo is None:
        canon_map = {"url_canon": canonicalize_url(url_col)}
        key_map = {
            "url_hash32": url_hash32(F.col("url_canon")),
            "url_hash64": url_hash64(F.col("url_canon")),
            "domain": url_domain(url_col),
            "domain_salt": domain_salt(F.col("url_canon"), n_salts),
        }
        memo = (canon_map, key_map)
        _KEY_COLS[(url_col, n_salts)] = memo
    return df.withColumns(memo[0]).withColumns(memo[1])
