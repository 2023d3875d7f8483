"""Per-bin tombstone bitmaps — broadcastable delete masks at any scale.

The reference applies deletes with per-key tombstones folded by the
storage engine's merge operator (``/root/reference/src/index.rs:271-322``).
Our row tombstones (``incremental.delete_docs``) are exact but join-shaped:
below ``IndexReader.BROADCAST_TOMBSTONES_MAX`` (5M rows ≈ 40 MB) the
anti-join side broadcasts; above it the join must shuffle the decoded
postings — transient (the compaction policy folds at 20% tombstones)
but real at 10¹⁰-doc scale, where 20% is 2×10⁹ rows ≈ 30 GB shuffled
per query.

This module re-shapes the SAME tombstone set into a docID-bin bitmap
table ``(bin, offs|words)`` whose total size is bounded by
``min(8·n_tombstones, universe/8)`` bytes — e.g. 2×10⁹ deletes over
10¹⁰ docs pack into ≤1.25 GB, and 6M scattered deletes into ≤48 MB —
so delete application stays a BROADCAST hash join (zero shuffle of the
match set) at any delete count. Lucene solves the same problem with
per-segment ``.liv`` bitsets; here the mask is a tiny side table the
optimizer streams past every scan.

Layout per bin (``BIN_SIZE`` = 2¹⁶ docIDs):

- sparse (≤ ``SPARSE_MAX`` deletes): ``offs`` = sorted in-bin offsets
  (≤4 KB) — a one-doc delete costs 8 bytes, not an 8 KB bitmap;
- dense: ``words`` = 1,024 packed longs (8 KB flat regardless of how
  full the bin is).

Both probe paths are pure JVM expressions (``element_at`` on an
UnsafeArrayData long array is O(1); ``shiftrightunsigned``/``& 1`` for
the bit test; ``array_contains`` over ≤512 longs for sparse bins), so
whole-stage codegen keeps the filter inside the scan stage. Build is
one Arrow-batched ``applyInPandas`` over ``groupBy(bin)`` — a write-path
job paid once per delete commit, never at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["BIN_BITS", "BIN_SIZE", "SPARSE_MAX", "build_tombstone_bitmaps", "not_deleted"]

BIN_BITS = 16
BIN_SIZE = 1 << BIN_BITS
SPARSE_MAX = 512  # per-bin offs list above this packs to dense words

_SCHEMA = "bin long, offs array<long>, words array<long>"


def _pack(key, pdf):
    import numpy as np
    import pandas as pd

    offs = np.unique(pdf["off"].to_numpy(dtype=np.int64))
    if len(offs) <= SPARSE_MAX:
        return pd.DataFrame(
            {"bin": [key[0]], "offs": [offs.tolist()], "words": [None]}
        )
    words = np.zeros(BIN_SIZE >> 6, dtype=np.uint64)
    np.bitwise_or.at(
        words, offs >> 6, np.left_shift(np.uint64(1), (offs & 63).astype(np.uint64))
    )
    return pd.DataFrame(
        {"bin": [key[0]], "offs": [None], "words": [words.view(np.int64).tolist()]}
    )


def build_tombstone_bitmaps(tombs: DataFrame) -> DataFrame:
    """``(doc_id)`` tombstone rows → ``(bin, offs|words)`` mask table.

    Distributed: the only shuffle is the ``groupBy(bin)`` (key space =
    universe/2¹⁶ bins), each group packs its own offsets with numpy in
    one Arrow batch."""
    binned = tombs.select(
        F.shiftright(F.col("doc_id"), BIN_BITS).alias("bin"),
        F.col("doc_id").bitwiseAND(F.lit(BIN_SIZE - 1)).alias("off"),
    )
    return binned.groupBy("bin").applyInPandas(_pack, _SCHEMA)


def not_deleted(df: DataFrame, bitmaps: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Rows of ``df`` whose ``doc_col`` is NOT masked — the broadcast
    bitmap equivalent of the tombstone anti-join. Output columns equal
    ``df``'s."""
    b = F.broadcast(
        bitmaps.select(
            F.col("bin").alias("__tbin"),
            F.col("offs").alias("__toffs"),
            F.col("words").alias("__twords"),
        )
    )
    joined = df.join(
        b, F.shiftright(F.col(doc_col), BIN_BITS) == F.col("__tbin"), "left"
    )
    off = f"(`{doc_col}` & {BIN_SIZE - 1})"
    keep = (
        "(__toffs IS NULL AND __twords IS NULL)"  # bin carries no deletes
        f" OR (__toffs IS NOT NULL AND NOT array_contains(__toffs, {off}))"
        " OR (__twords IS NOT NULL AND (shiftrightunsigned("
        f"element_at(__twords, cast(shiftright({off}, 6) AS int) + 1),"
        f" cast({off} & 63 AS int)) & 1) = 0)"
    )
    return joined.filter(F.expr(keep)).drop("__tbin", "__toffs", "__twords")
