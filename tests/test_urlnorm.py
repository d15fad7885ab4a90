"""F1 URL canonicalization: tri-equality between the Spark expression, the
Python twin, and the reference's normalize_url (scrapper/core/dedup.py:7-14).
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realestate_scraper_spark.functions.urlnorm import (
    canonicalize_url,
    canonicalize_url_py,
    domain_salt,
    url_hash32,
    url_hash64,
)

CASES = [
    "https://www.otodom.pl/pl/oferta/mieszkanie-ID4abc",
    "https://www.otodom.pl/pl/oferta/mieszkanie-ID4abc/",
    "https://www.otodom.pl/pl/oferta/x?b=2&a=1",
    "https://www.otodom.pl/pl/oferta/x?a=1&b=2",
    "https://www.otodom.pl/pl/oferta/x?b=2&a=1#gallery",
    "https://www.morizon.pl/oferta/mzn123456///",
    "https://gratka.pl/nieruchomosci/ob/12345?page=3&sort=newest#top",
    "https://ogloszenia.trojmiasto.pl/ogl123456?x=1&&y=2",
    "http://example.com",
    "http://example.com/",
    "http://example.com/?z=9&a=0",
    "https://www.otodom.pl/pl/wyniki/sprzedaz/mieszkanie/pomorskie?page=2",
]


def test_python_twin_equals_reference(reference_normalize_url):
    for u in CASES:
        assert canonicalize_url_py(u) == reference_normalize_url(u), u


def test_spark_expression_equals_reference(spark, reference_normalize_url):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.select("url", canonicalize_url("url").alias("canon")).collect()
    }
    for u in CASES:
        assert got[u] == reference_normalize_url(u), u


_path_chars = st.text(alphabet=string.ascii_lowercase + string.digits + "-/", max_size=30)
_query = st.lists(
    st.tuples(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5),
        st.text(alphabet=string.ascii_lowercase + string.digits, max_size=5),
    ),
    max_size=4,
)


@settings(max_examples=200, deadline=None)
@given(path=_path_chars, query=_query, frag=st.text(alphabet=string.ascii_lowercase, max_size=6))
def test_property_twin_equals_reference(reference_normalize_url, path, query, frag):
    q = "&".join(f"{k}={v}" for k, v in query)
    u = f"https://www.otodom.pl/{path}"
    if q:
        u += f"?{q}"
    if frag:
        u += f"#{frag}"
    assert canonicalize_url_py(u) == reference_normalize_url(u)


def test_spark_expression_property_batch(spark, reference_normalize_url):
    # A broad deterministic batch through the Spark expression in one pass.
    urls = []
    for i in range(300):
        path = f"/a{i % 7}/b{i % 13}" + ("/" * (i % 3))
        q = "&".join(f"k{j}={i}" for j in range((i * 7) % 4))
        u = f"https://www.morizon.pl{path}"
        if q:
            u += "?" + q
        if i % 5 == 0:
            u += "#frag"
        urls.append(u)
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select("url", canonicalize_url("url").alias("canon")).collect()
    for r in rows:
        assert r["canon"] == reference_normalize_url(r["url"]), r["url"]


def test_hash_and_salt_shapes(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    out = df.select(
        canonicalize_url("url").alias("c"),
        url_hash32(canonicalize_url("url")).alias("h32"),
        url_hash64(canonicalize_url("url")).alias("h64"),
        domain_salt(canonicalize_url("url"), 8).alias("ds"),
    ).collect()
    for r in out:
        assert isinstance(r["h32"], int)
        assert isinstance(r["h64"], int)
        host, salt = r["ds"].rsplit("#", 1)
        assert 0 <= int(salt) < 8
        assert "." in host

    # Same canonical form → same hashes AND same salt shard (the Bloom
    # prefilter would leak duplicates otherwise — regression guard).
    a = [r for r in out if r["c"] == "https://www.otodom.pl/pl/oferta/x?a=1&b=2"]
    assert len(a) >= 3
    assert len({r["h64"] for r in a}) == 1
    assert len({r["h32"] for r in a}) == 1
    assert len({r["ds"] for r in a}) == 1


def test_absolutize_href_shapes(spark):
    """F4 urljoin parity incl. the path-less-parent edge (ADVICE r3): a
    bare-relative href against "https://host" / "https://host?page=2" must
    resolve to host-rooted, exactly like urllib's urljoin."""
    from urllib.parse import urljoin

    from pyspark.sql import functions as F

    from realestate_scraper_spark.crawl.frontier import absolutize_href_expr

    cases = [
        ("https://a.pl/list/sub", "https://b.pl/x"),
        ("https://a.pl/list/sub", "//cdn.pl/img"),
        ("https://a.pl/list/sub", "/pl/oferta/x"),
        ("https://a.pl/list/sub", "oferta/x"),
        ("https://a.pl", "oferta/x"),
        ("https://a.pl?page=2", "oferta/x"),
        ("https://a.pl/", "oferta/x"),
    ]
    df = spark.createDataFrame(cases, "parent string, href string")
    got = df.select(
        "parent",
        "href",
        absolutize_href_expr(F.col("href"), F.col("parent")).alias("abs"),
    ).collect()
    for r in got:
        assert r["abs"] == urljoin(r["parent"], r["href"]), (
            r["parent"], r["href"], r["abs"]
        )
