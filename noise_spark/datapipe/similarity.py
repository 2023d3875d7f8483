"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products are JVM-side ``aggregate(zip_with(...))`` expressions
  (no Python in the row path).
- ``rp_lsh_buckets`` + ``ann_topk_lsh``: random-hyperplane LSH — the
  scale path. Hyperplanes are generated from a seed driver-side and
  broadcast as literal arrays; bucketing is a signature of sign bits,
  so at cluster scale the candidate scan is a partition-pruned read of
  one (or a few probed) buckets instead of the full table.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _lit_vec(v) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in v])


def cosine_topk(
    df: DataFrame, query_vec, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exact brute-force cosine top-k (TakeOrdered — per-partition top-k
    then driver merge; scans stay columnar and codegen'd)."""
    q = _lit_vec(query_vec)
    e = _as_double(F.col(vec_col))
    sim = _dot(e, q) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(q, q)))
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a random-hyperplane signature column ``bucket`` (int): bit i =
    sign(v · h_i). Writing the table partitioned/bucketed by this column
    gives partition-pruned ANN reads at scale."""
    planes = _hyperplanes(dim, n_planes, seed)
    e = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        bit = F.when(_dot(e, _lit_vec(h)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(2 ** i))
    return df.withColumn("bucket", bucket)


def rp_lsh_band_pairs(
    df: DataFrame,
    dim: int,
    r: int = 2,
    n_bands: int = 24,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate near-dup pairs via multi-band random-hyperplane LSH:
    ``n_bands`` independent signatures of ``r`` sign bits each; a pair is
    a candidate iff it matches in at least one band. Detection
    probability for a pair at angle θ is ``1-(1-(1-θ/π)^r)^L`` — pick
    (r, L) from the target cosine threshold: production near-dup
    (cos ≥ 0.85, θ ≤ 32°) wants r=8..16, L=8 (fine buckets, cheap);
    low thresholds like 0.45 (θ ≈ 63°) force r=2, L=24 for recall,
    at which point buckets are coarse — angular LSH genuinely degrades
    there, and the exact verify stage is what keeps the result correct.

    The join key is (band_idx, band_key) — an equi-join (shuffle/hash),
    never a cartesian product. Band keys are computed in ONE
    Arrow-batched numpy matmul (n × dim) @ (dim × r·L), not per-row
    Python. Returns distinct (id_a, id_b) with id_a < id_b.
    """
    import pandas as pd
    from pyspark.sql import types as T

    planes = _hyperplanes(dim, r * n_bands, seed)  # (r*L, dim)
    weights = (2 ** np.arange(r)).astype(np.int64)

    def keys_batch(it):
        for pdf in it:
            if not len(pdf):
                continue
            vecs = np.asarray(pdf["v"].tolist(), dtype=np.float64)  # (n, dim)
            bits = (vecs @ planes.T >= 0).astype(np.int64)  # (n, r*L)
            keys = bits.reshape(len(pdf), n_bands, r) @ weights  # (n, L)
            yield pd.DataFrame({"id": pdf["id"], "band_keys": list(keys)})

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("band_keys", T.ArrayType(T.LongType()), False),
        ]
    )
    keyed = (
        df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .mapInPandas(keys_batch, schema=schema)
        .select("id", F.posexplode("band_keys").alias("band_idx", "band_key"))
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def neardup_pairs_lsh(
    df: DataFrame,
    dim: int,
    threshold: float,
    r: int = 2,
    n_bands: int = 24,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """LSH-blocked near-duplicate pairs: multi-band candidate generation
    (:func:`rp_lsh_band_pairs`) then exact cosine verification — the
    scale-safe replacement for an all-pairs self-join. Returns
    (id_a, id_b, sim) with sim rounded to 4 places, sim >= threshold."""
    cands = rp_lsh_band_pairs(
        df, dim, r=r, n_bands=n_bands, seed=seed, vec_col=vec_col, id_col=id_col
    )
    vecs = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    av = vecs.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    bv = vecs.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    sim = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))),
        4,
    )
    return (
        cands.join(av, "id_a")
        .join(bv, "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def centroids_by(
    df: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Per-group mean vector (group_col, centroid array<double>) —
    JVM-side: posexplode → per-(group, dim) avg → re-assemble sorted by
    dim. At scale this is one map-side-combined groupBy; used as the
    IVF coarse quantizer (k-means with given assignments; a full Lloyd
    loop would alternate this with :func:`ivf_assign`)."""
    exploded = df.select(
        F.col(group_col), F.posexplode(_as_double(F.col(vec_col))).alias("dim", "x")
    )
    per_dim = exploded.groupBy(group_col, "dim").agg(F.avg("x").alias("m"))
    return (
        per_dim.groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def ivf_topk(
    df: DataFrame,
    query_vec,
    centroids: list,
    n_probe: int = 2,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid (max
    cosine), probe the ``n_probe`` centroids nearest the query, exact
    cosine rank within the probed cells. ``centroids``: [(cell_id,
    vector)] — small, embedded as literals (broadcast). At scale the
    assignment is computed once at ingest and the table is written
    partitioned by cell, making this a partition-pruned scan of
    n_probe/k_cells of the data."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)

    def cos_np(c):
        c = np.asarray(c, dtype=np.float64)
        return float(c @ q / (np.linalg.norm(c) * np.linalg.norm(q)))

    order = sorted(centroids, key=lambda cv: (-cos_np(cv[1]), cv[0]))
    probe_cells = [cid for cid, _ in order[:n_probe]]

    assigned = ivf_assign(df, centroids, vec_col=vec_col)
    cands = assigned.filter(F.col("cell").isin(probe_cells))
    return cosine_topk(cands, query_vec, k=k, vec_col=vec_col, id_col=id_col)


def ivf_assign(
    df: DataFrame, centroids: list, vec_col: str = "embedding", expr_max_cells: int = 16
) -> DataFrame:
    """Add a ``cell`` column = argmax-cosine centroid (ties → smaller
    cell id). Two physical strategies, same result:

    - few cells (≤ ``expr_max_cells``): chained JVM ``when`` expressions
      — no Python in the row path, whole-stage codegen
    - many cells: ONE numpy matmul per Arrow batch in ``mapInPandas``
      ((n × dim) @ (dim × k_cells)) — chained expressions would build a
      k_cells-deep codegen tree and evaluate k_cells aggregate-folds per
      row, which collapses at thousands-of-cells quantizers
    """
    if len(centroids) <= expr_max_cells:
        e = _as_double(F.col(vec_col))
        best = None
        # iterate in ascending cell id: a later candidate replaces only
        # on STRICTLY greater sim, so ties keep the smallest cell id.
        # (each `best` reference duplicates the Column subtree — keep it
        # to two references per level or the expression tree goes
        # exponential, which is also why the matmul path exists)
        for cid, cvec in sorted(centroids, key=lambda cv: int(cv[0])):
            c = _lit_vec(cvec)
            sim_c = _dot(e, c) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(c, c)))
            cand = F.struct(sim_c.alias("sim"), F.lit(int(cid)).alias("cell"))
            best = (
                cand
                if best is None
                else F.when(cand["sim"] > best["sim"], cand).otherwise(best)
            )
        return df.withColumn("cell", best["cell"])

    import pandas as pd
    from pyspark.sql import types as T

    cell_ids = np.array([int(cid) for cid, _ in centroids], dtype=np.int64)
    C = np.stack([np.asarray(v, dtype=np.float64) for _, v in centroids])  # (k, dim)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    in_fields = df.schema.fields

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            vecs = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)  # (n, dim)
            vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-300)
            sims = vn @ Cn.T  # (n, k) — one BLAS call per Arrow batch
            # argmax with smaller-cell-id tie-break (stable order: cells
            # sorted by id, argmax returns the first maximum)
            order_ix = np.argsort(cell_ids, kind="stable")
            best_ix = order_ix[np.argmax(sims[:, order_ix], axis=1)]
            out = pdf.copy()
            out["cell"] = pd.Series(cell_ids[best_ix], index=pdf.index)
            yield out

    schema = T.StructType(list(in_fields) + [T.StructField("cell", T.LongType(), False)])
    return df.mapInPandas(assign, schema=schema)


def ann_topk_lsh(
    df_bucketed: DataFrame,
    query_vec,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    seed: int = 42,
    n_probes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: scan the query's bucket plus ``n_probes``
    single-bit-flip neighbor buckets (multi-probe LSH), exact-rank the
    candidates. Recall/latency dial = n_planes × n_probes."""
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    bits = (planes @ q >= 0).astype(np.int64)
    base = int((bits * (2 ** np.arange(n_planes))).sum())
    # probe order: flip lowest-|margin| planes first
    margins = np.abs(planes @ q)
    probe_buckets = [base] + [
        base ^ (1 << int(i)) for i in np.argsort(margins)[:n_probes]
    ]
    cands = df_bucketed.filter(F.col("bucket").isin(probe_buckets))
    return cosine_topk(cands, query_vec, k=k, vec_col=vec_col, id_col=id_col)
