"""Checkpoint/resume: a build killed between stage commits resumes from
the last committed snapshot without recomputing committed stages, and
the final index is identical to an uninterrupted build."""

import os

import pytest

from noise_spark.corpus import generate_pages
from noise_spark.index.build import BuildConfig, build_index
from noise_spark.index.catalog import IndexCatalog


def _stage_mtimes(idx_dir, stage):
    root = os.path.join(idx_dir, stage)
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def test_resume_after_crash(spark, tmp_path):
    idx_dir = str(tmp_path / "idx")
    pages = generate_pages(spark, 300, seed=42, partitions=4)

    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, pages, idx_dir, BuildConfig(), fail_after_stage="segments")

    cat = IndexCatalog(idx_dir)
    assert cat.stage_complete("docs")
    assert cat.stage_complete("segments")
    assert not cat.stage_complete("term_stats")
    assert not cat.stage_complete("corpus_stats")
    # single-copy invariant: raw postings are never materialized on disk
    assert not os.path.exists(os.path.join(idx_dir, "postings"))

    docs_before = _stage_mtimes(idx_dir, "docs")
    segs_before = _stage_mtimes(idx_dir, "segments")

    metrics = build_index(spark, pages, idx_dir, BuildConfig())
    # committed stages were skipped, not recomputed
    assert metrics["stages"]["docs"].get("skipped") is True
    assert metrics["stages"]["segments"].get("skipped") is True
    assert _stage_mtimes(idx_dir, "docs") == docs_before
    assert _stage_mtimes(idx_dir, "segments") == segs_before
    assert cat.stage_complete("term_stats")
    assert cat.stage_complete("corpus_stats")
    assert not os.path.exists(os.path.join(idx_dir, "postings"))

    # resumed index == uninterrupted build
    idx2 = str(tmp_path / "idx2")
    build_index(spark, generate_pages(spark, 300, seed=42, partitions=4), idx2, BuildConfig())
    a = spark.read.parquet(os.path.join(idx_dir, "term_stats")).orderBy("term").collect()
    b = spark.read.parquet(os.path.join(idx2, "term_stats")).orderBy("term").collect()
    assert a == b


def test_resume_after_term_stats_matches_fresh_corpus_stats(spark, tmp_path):
    """corpus_stats per-field sums: the fresh build observes them on the
    term_stats write job; a resume (term_stats committed, corpus_stats
    not) must fall back to the distributed agg and land on the SAME
    values. Multi-field so the field-extraction branch is exercised."""
    rows = [
        (0, "alpha beta", "gamma delta epsilon"),
        (1, "beta", "delta delta zeta"),
        (2, "alpha alpha beta", "epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string, body string")
    cfg = BuildConfig(
        analyzer="whitespace", doc_id_col="doc_id", fields=("body", "title"), block_size=4
    )

    idx_resumed = str(tmp_path / "idx_resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, df, idx_resumed, cfg, fail_after_stage="term_stats")
    cat = IndexCatalog(idx_resumed)
    assert cat.stage_complete("term_stats")
    assert not cat.stage_complete("corpus_stats")
    build_index(spark, df, idx_resumed, cfg)

    idx_fresh = str(tmp_path / "idx_fresh")
    m = build_index(spark, df, idx_fresh, cfg)

    a = spark.read.parquet(os.path.join(idx_resumed, "corpus_stats")).orderBy("ordinal").collect()
    b = spark.read.parquet(os.path.join(idx_fresh, "corpus_stats")).orderBy("ordinal").collect()
    assert a == b
    # body: 3+3+1=7 tokens over 3 docs; title: 2+1+3=6
    stats = {r["field"]: r for r in a}
    assert stats["body"]["total_tokens"] == 7
    assert stats["body"]["avg_dl"] == pytest.approx(7 / 3)
    assert stats["title"]["total_tokens"] == 6
    # build_index's returned metrics skip the re-read only when computed
    # in-process — both paths must agree with the written table
    assert m["avg_dl"] == pytest.approx(7 / 3)
    assert m["n_docs"] == 3


def test_lineage_rows_recorded(spark, small_index):
    idx_dir, _ = small_index
    cat = IndexCatalog(idx_dir)
    for stage in ("docs", "term_stats", "corpus_stats", "segments"):
        info = cat.stage_info(stage)
        assert info is not None, stage
        assert info["rows"] > 0
        assert len(info["lineage"]) >= 1
        for row in info["lineage"]:
            assert row["rows"] >= 0 and row["bytes"] > 0 and row["checksum"]


def test_docid_stability_across_parallelism(spark, tmp_path):
    """docIDs must be identical regardless of partitioning (the
    determinism requirement for rank-identity across cluster sizes)."""
    from noise_spark.index.docids import assign_doc_ids

    p1 = generate_pages(spark, 500, seed=42, partitions=2)
    p2 = generate_pages(spark, 500, seed=42, partitions=16)
    a = {r["url"]: r["doc_id"] for r in assign_doc_ids(p1, partitions=3).select("url", "doc_id").collect()}
    b = {r["url"]: r["doc_id"] for r in assign_doc_ids(p2, partitions=11).select("url", "doc_id").collect()}
    assert a == b
    # exact dense rank over url: a permutation 0..n-1, ordered like urls
    # (guards the count-vs-numbering partitioning pin — a re-sampled range
    # shuffle between the two jobs produces duplicated/shifted ids)
    assert sorted(a.values()) == list(range(500))
    by_id = [u for u, _ in sorted(a.items(), key=lambda kv: kv[1])]
    assert by_id == sorted(a.keys())
