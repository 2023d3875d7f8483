"""Geo bbox overlap + Z-order bucketing (the reference's R-tree family,
src/filters.rs:503-586 / repl-tests/geojson.noise, re-expressed as range
predicates + Morton-cell partition pruning)."""

import random

import pytest
from pyspark.sql import functions as F

from noise_spark.datapipe.geo import (
    bbox_overlap,
    bbox_struct,
    cells_for_bbox,
    zorder_cell,
)
from noise_spark.index.build import BuildConfig, build_index
from noise_spark.query import IndexReader
from noise_spark.query import plan as P
from noise_spark.query.parser import parse_query, run_query

BOXES = [
    # (doc_id, minx, miny, maxx, maxy)
    (0, -10.0, -10.0, 10.0, 10.0),
    (1, 20.0, 20.0, 30.0, 30.0),
    (2, -30.0, 5.0, -20.0, 15.0),
    (3, 9.0, 9.0, 12.0, 12.0),
    (4, 100.0, 40.0, 110.0, 50.0),
]


def brute_overlap(w, s, e, n):
    return sorted(
        d for d, x0, y0, x1, y1 in BOXES if x0 <= e and x1 >= w and y0 <= n and y1 >= s
    )


@pytest.fixture(scope="module")
def geo_df(spark):
    df = spark.createDataFrame(
        BOXES, "doc_id long, minx double, miny double, maxx double, maxy double"
    )
    return df.withColumn("g", bbox_struct(*(F.col(c) for c in ("minx", "miny", "maxx", "maxy"))))


def test_bbox_overlap_matches_bruteforce(geo_df):
    for w, s, e, n in [(-5, -5, 5, 5), (8, 8, 25, 25), (-180, -90, 180, 90), (50, 50, 60, 60)]:
        got = sorted(
            r["doc_id"]
            for r in geo_df.filter(bbox_overlap(F.col("g"), w, s, e, n)).collect()
        )
        assert got == brute_overlap(w, s, e, n), (w, s, e, n)


def test_parse_bbox_clause():
    spec = parse_query("find {g: && [-5, -5, 5.5, 5.5]}", analyzer="whitespace")
    assert spec.node == P.BboxOverlap("g", -5.0, -5.0, 5.5, 5.5)
    from noise_spark.query.parser import ParseError

    # reference error text (geojson.noise:48-60)
    with pytest.raises(ParseError, match="Bounding box needs to be"):
        parse_query("find {g: && [1, 2, 3]}", analyzer="whitespace")


def test_bbox_through_engine_and_parser(spark, tmp_path_factory):
    # bbox coords ride in the doc store as non-indexed extra_doc_cols
    # (the V-store re-expression); the query targets a VIRTUAL struct
    # field assembled from them — full parser → plan → engine path
    rows = [(d, f"body with shuffle {d}", x0, y0, x1, y1) for d, x0, y0, x1, y1 in BOXES]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, minx double, miny double, maxx double, maxy double"
    )
    idx = str(tmp_path_factory.mktemp("geo") / "idx")
    build_index(
        spark, df, idx,
        BuildConfig(
            analyzer="whitespace",
            doc_id_col="doc_id",
            block_size=4,
            extra_doc_cols=("minx", "miny", "maxx", "maxy"),
        ),
    )
    reader = IndexReader(spark, idx)
    reader.virtual_fields["g"] = lambda d: bbox_struct(
        *(F.col(c) for c in ("minx", "miny", "maxx", "maxy"))
    )
    got = [r["doc_id"] for r in run_query(reader, "find {g: && [8, 8, 25, 25]}").collect()]
    assert got == brute_overlap(8, 8, 25, 25)
    # combined with a term clause: text match AND window overlap
    got = [
        r["doc_id"]
        for r in reader._match_set(
            P.And((P.Term("shuffle"), P.BboxOverlap("g", -180, -90, 0, 90)))
        ).orderBy("doc_id").collect()
    ]
    assert got == brute_overlap(-180, -90, 0, 90)


def test_zorder_cells_complete_pruning(spark):
    """Every point inside a query window lands in a cell that
    cells_for_bbox returns — pruning by cell list never loses a match."""
    rng = random.Random(3)
    pts = [
        (i, rng.uniform(-180, 180), rng.uniform(-90, 90)) for i in range(400)
    ]
    df = spark.createDataFrame(pts, "id long, lon double, lat double").withColumn(
        "cell", zorder_cell(F.col("lon"), F.col("lat"), bits=6)
    )
    for w, s, e, n in [(-10, -10, 10, 10), (100, 20, 140, 60), (-180, -90, -170, -80)]:
        cells = cells_for_bbox(w, s, e, n, bits=6)
        inside = df.filter(
            (F.col("lon") >= w) & (F.col("lon") <= e)
            & (F.col("lat") >= s) & (F.col("lat") <= n)
        )
        escaped = inside.filter(~F.col("cell").isin(cells)).count()
        assert escaped == 0
        # and pruning is real: the cell list covers a minority of cells
        assert len(cells) < (1 << 12)


def test_zorder_cell_spark_matches_python(spark):
    from noise_spark.datapipe.geo import _interleave_py, _quantize  # noqa: F401

    pts = [(i, -180.0 + i * 7.3, -90.0 + i * 3.7) for i in range(49)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    got = {
        r["id"]: r["cell"]
        for r in df.withColumn("cell", zorder_cell(F.col("lon"), F.col("lat"), 8)).collect()
    }
    n = (1 << 8) - 1
    for i, lon, lat in pts:
        qx = max(0, min(n, int((lon - -180.0) / 360.0 * n)))
        qy = max(0, min(n, int((lat - -90.0) / 180.0 * n)))
        assert got[i] == _interleave_py(qx, qy, 8), i
