"""Strict Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
same sorted column names, same row count, order-insensitive exact value
equality (floats must match bit-for-bit — query design owns determinism).
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    # numpy / pandas scalars → python
    if hasattr(v, "item"):
        return v.item()
    return v


def to_multiset(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    want = run_oracle(sql, sf_dir)
    gc, gr = to_multiset(got)
    wc, wr = to_multiset(want)
    assert gc == wc, f"column mismatch: spark={gc} duckdb={wc}"
    assert len(gr) == len(wr), f"row count: spark={len(gr)} duckdb={len(wr)}"
    for i, (a, b) in enumerate(zip(gr, wr)):
        assert a == b, f"row {i} mismatch:\n  spark : {a}\n  duckdb: {b}"
