"""Incremental index maintenance: append / delete / upsert / compact.

Re-expresses the reference's write-path lifecycle
(``/root/reference/src/index.rs:131-179`` — upsert via shred-diff,
delete via derived-key tombstones, merge-operator counter decrements
``src/index.rs:301-322``) in table-format terms:

- **append**: new docs get fresh docIDs above the ``high_doc_id``
  watermark (the ``HDB`` high-seq header, ``src/index.rs:91-94``,
  re-expressed as a manifest property); a new *generation* of
  docs/postings/stats/segments is built by the exact same five-stage
  pipeline (``build_index(stage_prefix="genN/", doc_id_offset=wm)``)
  and committed. Nothing existing is rewritten — an append at 100 TB
  touches only the delta.
- **delete**: docIDs land in a ``tombstones`` stage; term/corpus stats
  are maintained *exactly* by committing negative (term, df, cf)
  deltas mined from the deleted docs' postings — so BM25 scores after
  a delete are rank-identical to a fresh build over the remaining
  corpus (Noise's merge-op decrement semantics; stricter than Lucene's
  stale-stats-until-merge).
- **upsert**: delete-by-url then append (Noise's shred-diff,
  ``src/json_shred.rs:452-475``, exists because it rewrites per-field
  KVs; in columnar land the delta generation IS the diff).
- **compact**: fold all generations minus tombstones into a fresh
  base build (the compaction-filter GC, ``src/index.rs:271-282``).

Readers (``IndexReader``) resolve the manifest into: postings/segments
= union of generations, tombstone exclusion, stats = Σ generations +
delete deltas. Segment block maxima are stats-independent
(max_tf/min_dl), so moving avg_dl never invalidates committed blocks.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import BuildConfig, build_index
from .catalog import IndexCatalog


def _generations(manifest: dict) -> list[str]:
    return sorted(
        {n.split("/")[0] for n in manifest["stages"] if n.startswith("gen") and "/" in n},
        key=lambda g: int(g[3:]),
    )


def high_doc_id(spark: SparkSession, index_dir: str) -> int:
    cat = IndexCatalog(index_dir)
    manifest = cat.current_manifest()
    hi = -1
    for g in [""] + _generations(manifest):
        stage = f"{g}/docs" if g else "docs"
        if stage in manifest["stages"]:
            row = (
                spark.read.parquet(manifest["stages"][stage]["path"])
                .agg(F.max("doc_id"))
                .collect()[0]
            )
            if row[0] is not None:
                hi = max(hi, row[0])
    return hi


def append_docs(
    spark: SparkSession,
    index_dir: str,
    new_pages: DataFrame,
    config: BuildConfig | None = None,
) -> dict:
    """Commit a new generation for ``new_pages`` (docIDs above the
    watermark) using the standard five-stage pipeline."""
    cat = IndexCatalog(index_dir)
    gens = _generations(cat.current_manifest())
    gen = f"gen{len(gens) + 1}"
    watermark = high_doc_id(spark, index_dir) + 1
    metrics = build_index(
        spark,
        new_pages,
        index_dir,
        config,
        stage_prefix=f"{gen}/",
        doc_id_offset=watermark,
    )
    return {"generation": gen, "watermark": watermark, **metrics}


def _replace_stage(spark, cat: IndexCatalog, stage: str, df: DataFrame, coalesce: int | None = None):
    """Overwrite-and-commit a mutable stage atomically: write to a temp
    dir, swap, commit a new snapshot manifest."""
    final = cat.stage_path(stage)
    tmp = final + "__tmp"
    w = df.coalesce(coalesce) if coalesce else df
    w.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    cat.commit_stage(stage, {})


def delete_docs(spark: SparkSession, index_dir: str, urls: list[str]) -> dict:
    """Tombstone docs by url; commit exact negative stat deltas."""
    from ..query.engine import IndexReader

    reader = IndexReader(spark, index_dir)  # excludes prior tombstones
    cat = IndexCatalog(index_dir)
    victims = reader.docs.filter(F.col("url").isin(urls)).select("doc_id")
    vic_posts = reader.postings.join(victims, "doc_id", "left_semi")
    removed = vic_posts.agg(
        F.count_distinct("doc_id").alias("nd"), F.sum("tf").alias("tt")
    ).collect()[0]
    n_removed, tok_removed = int(removed["nd"] or 0), int(removed["tt"] or 0)

    neg = vic_posts.groupBy("term").agg(
        (-F.count("*")).cast("long").alias("df"), (-F.sum("tf")).cast("long").alias("cf")
    )
    prior_delta = (
        spark.read.parquet(cat.stage_path("term_stats_delta"))
        if cat.stage_complete("term_stats_delta")
        else spark.createDataFrame([], "term string, df long, cf long")
    )
    new_delta = (
        prior_delta.unionByName(neg)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )
    prior_tombs = (
        spark.read.parquet(cat.stage_path("tombstones"))
        if cat.stage_complete("tombstones")
        else spark.createDataFrame([], "doc_id long")
    )
    all_tombs = prior_tombs.unionByName(victims).distinct()
    prior_cd = (
        spark.read.parquet(cat.stage_path("corpus_stats_delta")).collect()[0]
        if cat.stage_complete("corpus_stats_delta")
        else {"n_docs": 0, "total_tokens": 0}
    )
    cd = spark.createDataFrame(
        [(prior_cd["n_docs"] - n_removed, prior_cd["total_tokens"] - tok_removed)],
        "n_docs long, total_tokens long",
    )

    # materialize BEFORE swapping (the new delta is derived from the
    # prior delta's files, which the swap deletes). Tombstone/delta sets
    # are small relative to the corpus; at larger scale these would be
    # per-segment bitmaps folded at compaction.
    new_delta = spark.createDataFrame(
        new_delta.collect(), "term string, df long, cf long"
    )
    all_tombs = spark.createDataFrame(all_tombs.collect(), "doc_id long")

    _replace_stage(spark, cat, "tombstones", all_tombs, coalesce=1)
    _replace_stage(spark, cat, "term_stats_delta", new_delta, coalesce=1)
    _replace_stage(spark, cat, "corpus_stats_delta", cd, coalesce=1)
    return {"deleted": n_removed}


def upsert_docs(
    spark: SparkSession,
    index_dir: str,
    new_pages: DataFrame,
    config: BuildConfig | None = None,
) -> dict:
    """MERGE-by-url: replace existing docs, add new ones."""
    urls = [r["url"] for r in new_pages.select("url").distinct().collect()]
    d = delete_docs(spark, index_dir, urls)
    a = append_docs(spark, index_dir, new_pages, config)
    return {**a, **d}


def compact(
    spark: SparkSession, index_dir: str, out_dir: str, config: BuildConfig | None = None
) -> dict:
    """Fold all generations minus tombstones into a fresh base build."""
    from ..query.engine import IndexReader

    reader = IndexReader(spark, index_dir)
    pages = reader.docs.select("url", "warc_ts", "lang", "text")
    return build_index(spark, pages, out_dir, config)
