"""operators/spatial.py unit tests: haversine vs reference formula, dup-join
kernel correctness on crafted points, geocode dim fill."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realestate_scraper_spark.operators.spatial import (
    geocode_fill,
    haversine_m,
    mark_spatial_duplicates,
    spatial_duplicate_pairs,
)


def _haversine_py(lat1, lon1, lat2, lon2):
    # independent scalar twin (reference formula, morizon.py:337-346)
    r = 6371.0088 * 1000
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * r * math.asin(math.sqrt(a))


def test_haversine_matches_python(spark):
    pts = [
        (54.35, 18.65, 54.3505, 18.6502),   # ~57 m
        (52.23, 21.01, 52.23, 21.01),        # 0
        (52.0, 19.0, 52.0009, 19.0),         # ~100 m
        (49.0, 14.0, 54.9, 24.5),            # far
    ]
    df = spark.createDataFrame(pts, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for row, (a, b, c, d) in zip(got, pts):
        assert abs(row["d"] - _haversine_py(a, b, c, d)) < 1e-6


def _offers(spark, rows):
    return spark.createDataFrame(
        rows,
        "offer_id string, lat double, lon double, price_amount double, area_m2 double",
    )


def test_spatial_duplicate_pairs_kernel(spark):
    rows = [
        ("a", 52.0, 19.0, 500000.0, 50.0),
        ("b", 52.0003, 19.0, 500050.0, 50.5),    # ~33 m, Δprice 50, Δarea .5 → dup
        ("c", 52.0008, 19.0, 500000.0, 50.0),    # ~89 m → not dup
        ("d", 52.0, 19.0001, 500200.0, 50.0),    # Δprice 200 → not dup
        ("e", 52.0001, 19.0, 500000.0, 52.0),    # Δarea 2 → not dup
        # pair straddling a 0.001° cell boundary (~25 m apart) — kernel must catch
        ("f", 52.000995, 19.5, 400000.0, 40.0),
        ("g", 52.001005, 19.5, 400000.0, 40.0),
    ]
    pairs = {
        (r["offer_a"], r["offer_b"])
        for r in spatial_duplicate_pairs(_offers(spark, rows)).collect()
    }
    assert pairs == {("a", "b"), ("f", "g")}


def test_mark_spatial_duplicates_two_table(spark):
    stored = _offers(spark, [("s1", 52.0, 19.0, 500000.0, 50.0)])
    incoming = _offers(
        spark,
        [
            ("n1", 52.0002, 19.0, 500020.0, 50.2),  # dup of s1
            ("n2", 53.0, 20.0, 500000.0, 50.0),     # far
        ],
    )
    got = {r["offer_id"]: r for r in mark_spatial_duplicates(incoming, stored).collect()}
    assert got["n1"]["is_duplicate"] and got["n1"]["duplicate_of"] == "s1"
    assert not got["n2"]["is_duplicate"]


def test_geocode_fill(spark):
    offers = spark.createDataFrame(
        [
            ("o1", "Gdansk", None, None),
            ("o2", "Sopot", 54.44, 18.56),
            ("o3", "Nowhere", None, None),
        ],
        "offer_id string, city string, lat double, lon double",
    )
    dim = spark.createDataFrame(
        [("Gdansk", 54.35, 18.65), ("Sopot", 54.44, 18.56)],
        "city string, dim_lat double, dim_lon double",
    )
    got = {r["offer_id"]: r for r in geocode_fill(offers, dim).collect()}
    assert got["o1"]["lat"] == 54.35 and got["o1"]["lon"] == 18.65
    assert got["o2"]["lat"] == 54.44  # existing coords untouched
    assert got["o3"]["lat"] is None   # miss stays null (→ quarantine/geocode UDF)


def test_geocode_with_memo_batches_and_memoizes(spark, tmp_path):
    """First pass resolves misses through ONE batched resolver call and
    merges them into the dim; second pass is a pure memo hit (resolver not
    invoked) — the geocache_osm.json contract."""
    from realestate_scraper_spark.operators.spatial import geocode_with_memo
    from realestate_scraper_spark.sources.tables import ParquetTable

    dim_table = ParquetTable(str(tmp_path), "geocode_dim")
    dim_table.append(
        spark.createDataFrame(
            [("Gdansk", 54.35, 18.65)],
            "city string, dim_lat double, dim_lon double",
        ).coalesce(1),
        stage="seed",
    )
    offers = spark.createDataFrame(
        [
            ("o1", "Gdansk", None, None),     # dim hit
            ("o2", "Lublin", None, None),      # miss → resolver
            ("o3", "Lublin", None, None),      # same key — one lookup only
            ("o4", "Unknown", None, None),     # resolver can't resolve
        ],
        "offer_id string, city string, lat double, lon double",
    )
    calls = []

    def resolver(cities):
        calls.append(sorted(cities))
        table = {"Lublin": (51.25, 22.57)}
        return {c: table[c] for c in cities if c in table}

    got = {r["offer_id"]: r for r in geocode_with_memo(offers, dim_table, resolver).collect()}
    assert calls == [["Lublin", "Unknown"]]  # one batched call, distinct keys
    assert got["o1"]["lat"] == 54.35
    assert got["o2"]["lat"] == 51.25 and got["o3"]["lat"] == 51.25
    assert got["o4"]["lat"] is None

    # second pass: memo hit, resolver only sees the unresolvable key
    calls.clear()
    got2 = {r["offer_id"]: r for r in geocode_with_memo(offers, dim_table, resolver).collect()}
    assert calls == [["Unknown"]]
    assert got2["o2"]["lat"] == 51.25


def test_geocode_snap_override(spark):
    """J8 snap (_snap_geo_if_far, morizon.py:472-487): dim point replaces
    page geo when missing, out-of-bbox, or >800 m away; near/absent dim
    entries leave the page value alone."""
    from realestate_scraper_spark.operators.spatial import geocode_snap

    offers = spark.createDataFrame(
        [
            # >800 m off → snapped
            ("far", "Gdansk", "ul. A 1", 54.37, 18.67),
            # ~50 m off → kept
            ("near", "Gdansk", "ul. B 2", 54.3504, 18.6502),
            # page geo missing → filled from dim
            ("null", "Gdansk", "ul. C 3", None, None),
            # out-of-bbox page geo → replaced
            ("oob", "Gdansk", "ul. D 4", 61.2, 7.1),
            # no dim entry → untouched even though far from everything
            ("miss", "Gdansk", "ul. X 9", 51.0, 20.0),
        ],
        "offer_id string, city string, street string, lat double, lon double",
    )
    dim = spark.createDataFrame(
        [
            ("Gdansk", "ul. A 1", 54.35, 18.65),
            ("Gdansk", "ul. B 2", 54.35, 18.65),
            ("Gdansk", "ul. C 3", 54.35, 18.65),
            ("Gdansk", "ul. D 4", 54.35, 18.65),
        ],
        "city string, street string, dim_lat double, dim_lon double",
    )
    got = {
        r["offer_id"]: (r["lat"], r["lon"])
        for r in geocode_snap(offers, dim).collect()
    }
    assert got["far"] == (54.35, 18.65)
    assert got["near"] == (54.3504, 18.6502)
    assert got["null"] == (54.35, 18.65)
    assert got["oob"] == (54.35, 18.65)
    assert got["miss"] == (51.0, 20.0)
