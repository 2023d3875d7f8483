"""Word-level tombstone bitmaps — broadcastable delete masks at any scale.

The reference applies deletes with per-key tombstones folded by the
storage engine's merge operator (``/root/reference/src/index.rs:271-322``).
Our row tombstones (``incremental.delete_docs``) are exact but join-shaped:
below ``IndexReader.BROADCAST_TOMBSTONES_MAX`` (5M rows ≈ 40 MB) the
anti-join side broadcasts; above it the join must shuffle the decoded
postings — transient (the compaction policy folds at 20% tombstones)
but real at 10¹⁰-doc scale, where 20% is 2×10⁹ rows ≈ 30 GB shuffled
per query.

This module re-shapes the SAME tombstone set into a 64-doc-word mask
table ``(wbin = doc_id >> 6, word = OR of 1 << (doc_id & 63))`` whose
size is bounded by ``min(16·n, universe/4)`` bytes of rows — e.g.
2×10⁹ deletes over 10¹⁰ docs fit ≤1.56×10⁸ rows ≈ 2.5 GB, and 6M
scattered deletes ≤96 MB — so delete application stays a BROADCAST
hash join (zero shuffle of the match set) at any delete count. Lucene
solves the same problem with per-segment ``.liv`` bitsets; here the
mask is a narrow side table the optimizer streams past every scan.

The word granularity is deliberate: joined rows carry ONE long (a
per-BIN packed-array layout was measured 2× slower — every joined row
copied the bin's 8 KB array before the filter could drop it), the
probe is a single ``shiftrightunsigned(word, doc & 63) & 1`` inside
whole-stage codegen, and the BUILD is one pure-JVM map-side-combined
``groupBy(wbin).agg(bit_or(...))`` — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_tombstone_bitmaps", "not_deleted"]

_SCHEMA = "wbin long, word long"


def build_tombstone_bitmaps(tombs: DataFrame) -> DataFrame:
    """``(doc_id)`` tombstone rows → ``(wbin, word)`` mask table.

    One distributed aggregation; the only shuffle is the
    ``groupBy(wbin)`` (key space = universe/64, partial bit_or
    combines map-side)."""
    return (
        tombs.select(
            F.shiftright(F.col("doc_id"), 6).alias("wbin"),
            F.expr("shiftleft(1L, cast(doc_id & 63 AS int))").alias("bit"),
        )
        .groupBy("wbin")
        .agg(F.bit_or("bit").alias("word"))
    )


def not_deleted(df: DataFrame, bitmaps: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Rows of ``df`` whose ``doc_col`` is NOT masked — the broadcast
    bitmap equivalent of the tombstone anti-join. Output columns equal
    ``df``'s."""
    b = F.broadcast(
        bitmaps.select(
            F.col("wbin").alias("__twbin"), F.col("word").alias("__tword")
        )
    )
    joined = df.join(
        b, F.shiftright(F.col(doc_col), 6) == F.col("__twbin"), "left"
    )
    keep = F.expr(
        "__tword IS NULL OR (shiftrightunsigned(__tword,"
        f" cast(`{doc_col}` & 63 AS int)) & 1) = 0"
    )
    return joined.filter(keep).drop("__twbin", "__tword")
