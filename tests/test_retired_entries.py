"""Retired driver entries stay correct: each RETIRED registry entry is
run on Spark and compared against its DuckDB oracle with the driver's
own method (row count, column names, order-insensitive value multiset).

These entries were removed from the driver-graded registry only to keep
it within the driver's 50-entry grading window — every one is a strict
near-twin of a surviving graded entry (see entry_queries.RETIRED).
"""

import math
import os

import duckdb
import pytest

from noise_spark import entry_queries

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _multiset(rows):
    return sorted("|".join(_norm(v) for v in row) for row in rows)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", sorted(entry_queries.RETIRED))
def test_retired_entry_matches_oracle(spark, ddb, name):
    fn, sql = entry_queries.RETIRED[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    assert sql is not None
    res = ddb.sql(sql)
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]
    assert len(srows) == len(orows), f"{name}: row count"
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in ocols], f"{name}: columns"
    assert _multiset(srows) == _multiset(orows), f"{name}: values"
