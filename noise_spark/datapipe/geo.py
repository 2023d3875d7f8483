"""Geo bounding boxes: overlap predicates + Z-order bucketing.

The reference indexes GeoJSON bboxes in a RocksDB R-tree column family
and answers ``{g: && [W,S,E,N]}`` overlap queries against it
(``/root/reference/src/filters.rs:503-586``, key layout
``src/key_builder.rs:140-160``). The Spark-first re-expression:

- a per-doc bbox is a typed struct column ``(minx, miny, maxx, maxy)``
  — :func:`bbox_struct` builds it from plain columns;
- overlap is four range conjunctions (:func:`bbox_overlap`) — pure
  Catalyst predicates, so parquet min/max pruning and whole-stage
  codegen apply for free;
- the R-tree's spatial locality at 100 TB is played by **Z-order
  (Morton) bucketing**: :func:`zorder_cell` interleaves quantized
  lon/lat bits into a cell id. Write the table partitioned (or
  clustered/bucketed) by the centroid's cell and a window query scans
  only the cells the window covers (:func:`cells_for_bbox`) — partition
  pruning instead of tree traversal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bbox_struct", "bbox_overlap", "zorder_cell", "cells_for_bbox"]

# world bounds used for quantization (lon, lat)
_XMIN, _XMAX = -180.0, 180.0
_YMIN, _YMAX = -90.0, 90.0


def bbox_struct(minx, miny, maxx, maxy) -> Column:
    """Assemble a bbox struct column from four numeric columns/values."""
    c = lambda v: v if isinstance(v, Column) else F.lit(float(v))  # noqa: E731
    return F.struct(
        c(minx).cast("double").alias("minx"),
        c(miny).cast("double").alias("miny"),
        c(maxx).cast("double").alias("maxx"),
        c(maxy).cast("double").alias("maxy"),
    )


def bbox_overlap(bbox: Column, west: float, south: float, east: float, north: float) -> Column:
    """True where ``bbox`` overlaps the query window — the reference's
    intersects test (src/filters.rs:544-559: an R-tree window query
    returns every stored rect intersecting [W,S,E,N]). Touching edges
    count as overlap, matching inclusive rtree range semantics."""
    return (
        (bbox["minx"] <= F.lit(float(east)))
        & (bbox["maxx"] >= F.lit(float(west)))
        & (bbox["miny"] <= F.lit(float(north)))
        & (bbox["maxy"] >= F.lit(float(south)))
    )


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    n = (1 << bits) - 1
    q = ((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n), q))


def zorder_cell(lon: Column, lat: Column, bits: int = 8) -> Column:
    """Morton (Z-order) cell id of a point: ``bits`` quantized bits per
    axis, interleaved lon/lat — JVM-side bit arithmetic only. Nearby
    points share cell prefixes, so clustering the table by this column
    gives spatially-local files whose min/max statistics prune window
    queries (the idiomatic lakehouse replacement for an R-tree)."""
    qx = _quantize(lon.cast("double"), _XMIN, _XMAX, bits)
    qy = _quantize(lat.cast("double"), _YMIN, _YMAX, bits)
    cell = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.lit(1 << i).cast("long")
        cell = (
            cell
            + (qx.bitwiseAND(bit) * F.lit(1 << i))  # x bit i → position 2i
            + (qy.bitwiseAND(bit) * F.lit(1 << (i + 1)))  # y bit i → 2i+1
        )
    return cell


def _interleave_py(qx: int, qy: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((qx >> i) & 1) << (2 * i)
        out |= ((qy >> i) & 1) << (2 * i + 1)
    return out


def cells_for_bbox(
    west: float, south: float, east: float, north: float, bits: int = 8
) -> list[int]:
    """All Z-order cells a query window touches (driver-side, tiny):
    the partition-pruning filter for a window query over a table
    clustered by :func:`zorder_cell`. A window of w° × h° touches
    O((w·2^bits/360) · (h·2^bits/180)) cells."""
    n = (1 << bits) - 1

    def q(v, lo, hi):
        return max(0, min(n, int((v - lo) / (hi - lo) * n)))

    x0, x1 = q(west, _XMIN, _XMAX), q(east, _XMIN, _XMAX)
    y0, y1 = q(south, _YMIN, _YMAX), q(north, _YMIN, _YMAX)
    return sorted(
        _interleave_py(qx, qy, bits)
        for qx in range(x0, x1 + 1)
        for qy in range(y0, y1 + 1)
    )
