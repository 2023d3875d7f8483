"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame/column expressions (JVM-side,
whole-stage-codegen) or Arrow-batched UDFs — no per-row Python. Scale
notes per operator:

- exact:   one shuffle on a 128-bit content hash; the hash (not the
           text) is the shuffle key, so payload bytes never move twice.
- minhash: signatures via explode+groupBy (map-side combine); LSH
           banding turns the O(n²) pair space into per-bucket joins.
- simhash: near-dup fingerprint (long arithmetic, no decimals);
           ``simhash_candidate_pairs`` bands the signature into equal
           bit chunks — by pigeonhole, any pair within hamming distance
           d < n_bands shares at least one identical band, so the
           per-band self-joins have PERFECT recall for d <= n_bands-1
           (the verify stage recomputes the true hamming distance and
           drops false positives).
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

    Pure long arithmetic (shiftright/bitwiseAND — decimal casts round
    HALF_UP and would corrupt the bit extraction): the term hash is the
    first 16 hex chars of md5 split into two 32-bit halves, each of
    which fits a long exactly. ``bits <= 32`` uses the low half only;
    up to 64 bits the signature is assembled as ``hi << 32 | lo`` (a
    two's-complement 64-bit value — bit 63 set yields a negative long,
    which is the correct 64-bit fingerprint). The aggregation is one
    groupBy with ``bits`` map-side-combined long sums."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    toks = _tokens(text_col)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    h_hex = F.md5(F.col("term"))
    # hex chars 1-8 = bits 63..32, chars 9-16 = bits 31..0 of the
    # 64-bit value conv(substr(md5,1,16)) — same value the decimal
    # version meant to use, extracted losslessly
    tf = tf.withColumn(
        "h_hi", F.conv(F.substring(h_hex, 1, 8), 16, 10).cast("long")
    ).withColumn("h_lo", F.conv(F.substring(h_hex, 9, 8), 16, 10).cast("long"))
    bit_cols = []
    for i in range(bits):
        src = F.col("h_lo") if i < 32 else F.col("h_hi")
        bit = F.shiftright(src, i % 32).bitwiseAND(F.lit(1))
        bit_cols.append(
            F.sum(F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))).alias(f"s{i}")
        )
    sums = tf.groupBy(id_col).agg(*bit_cols)
    lo = F.lit(0).cast("long")
    hi = F.lit(0).cast("long")
    for i in range(min(bits, 32)):
        lo = lo.bitwiseOR(
            F.when(F.col(f"s{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        )
    for i in range(32, bits):
        hi = hi.bitwiseOR(
            F.when(F.col(f"s{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i - 32)).otherwise(0)
        )
    sig = F.shiftleft(hi, 32).bitwiseOR(lo) if bits > 32 else lo
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_candidate_pairs(
    sigs: DataFrame,
    bits: int = 64,
    n_bands: int = 4,
    max_hamming: int | None = None,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
) -> DataFrame:
    """Hamming-ball near-dup pairs from SimHash signatures.

    Banding: the signature splits into ``n_bands`` equal bit chunks; a
    pair within hamming distance ``d <= n_bands - 1`` must share at
    least one unchanged band (pigeonhole), so per-band self-joins give
    perfect recall for ``max_hamming = n_bands - 1`` (the default).
    Each join's key is (band index, band value) — blocking, never a
    cross join. The verify stage computes the exact hamming distance
    with ``bit_count(a XOR b)`` and filters false positives.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    if max_hamming is None:
        max_hamming = n_bands - 1
    width = bits // n_bands
    if width * n_bands != bits:
        raise ValueError(f"bits={bits} not divisible by n_bands={n_bands}")
    mask = (1 << width) - 1
    sig = F.col(sig_col)
    bands = F.array(
        *[
            F.shiftright(sig, j * width).bitwiseAND(F.lit(mask)).cast("long")
            for j in range(n_bands)
        ]
    )
    keyed = sigs.select(
        F.col(id_col), sig.alias("_sig"), F.posexplode(bands).alias("band_idx", "band_val")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) over an undirected edge list; component = the
    smallest node id in the component. Near-dup PAIRS become dedup
    GROUPS here (keep ``component``, drop the rest).

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): converges in
    O(log n) rounds, every round is groupBy(min)+join — no vertex ever
    materializes its full neighborhood (no collect_list), so skewed
    high-degree dedup clusters (the 100 TB failure mode of naive label
    propagation) stay shuffle-bounded.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def large_star(e: DataFrame) -> DataFrame:
        # Γ(u) from BOTH orientations; m = min(Γ(u) ∪ {u}) via one agg
        # (never materializing Γ(u)); connect every larger neighbor to m
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient high → low, group by the high end, hook its smaller
        # neighbors (and itself) to the minimum
        hi_lo = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = hi_lo.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        j = hi_lo.join(mins, "u")
        out = j.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
            j.select(F.col("u"), F.col("m").alias("v"))
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    # fixpoint detection: (count, Σ xxhash64(u,v) as unbounded decimal).
    # Edge sets here only shrink/relabel toward the star fixpoint, so a
    # false-positive "converged" needs two DIFFERENT consecutive edge
    # sets whose 64-bit per-edge hashes SUM equal — ~2^-64 per round, vs
    # the old (count, Σ u*31+v) which collides for structured relabels.
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        e = large_star(e)
        e = small_star(e)
        e = e.localCheckpoint(eager=True)  # truncate the iterative lineage
        row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (alternating star rounds are O(log n) — raise max_iter)"
        )
    # at the fixpoint edges form stars: every non-root node points at its
    # component minimum; the roots themselves only appear on the v side
    comp = e.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("node"), "component"
    )
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .join(comp.select("node"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return comp.union(roots)


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram (token shingle) Jaccard similarity for all pairs
    sharing at least one shingle: |A∩B| from a shingle self-join,
    |A∪B| = |A|+|B|-|A∩B|. The shared-shingle join IS the blocking —
    no cross join ever materializes.

    ``max_shingle_df`` is the Zipf-head guard for corpus scale: a
    shingle shared by k docs fans the self-join out to k² rows, so one
    universal boilerplate shingle ("all rights reserved …") at k=10⁸
    is a 10¹⁶-row join. When set, shingles with document frequency
    above the cap are dropped from BOTH the intersection and the doc
    sizes — Jaccard is then exact over the retained (discriminative)
    shingle universe, the standard stop-shingle approximation (near-dup
    pairs of long docs lose ≤df-capped mass). ``None`` (default) keeps
    the fully exact semantics; production dedup at web scale should set
    it (a few hundred is typical)."""
    toks = _tokens(text_col)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    sh = df.select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("sh"))
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") <= max_shingle_df)
            .select("sh")
        )
        sh = sh.join(keep, "sh", "left_semi")
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
