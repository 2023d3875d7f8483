"""Physical-plan evidence: the scans actually prune and push down.

At 100 TB a term query must not scan 64 bucket partitions or decode
non-matching blocks, and a doc-id projection must not read the text
column — these tests pin the plan shape, not just the results (the
explain-driven discipline SURVEY §4 commits to)."""

import pytest

from noise_spark.index.build import BuildConfig, build_index
from noise_spark.query import IndexReader


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


@pytest.fixture(scope="module")
def plan_reader(spark, tmp_path_factory):
    from noise_spark.corpus import generate_pages

    idx = str(tmp_path_factory.mktemp("plans") / "idx")
    pages = generate_pages(spark, 300, seed=42, partitions=4)
    build_index(spark, pages, idx, BuildConfig(block_size=64))
    return IndexReader(spark, idx)


def test_term_scan_pushes_filters_and_prunes_buckets(plan_reader):
    plan = _plan(plan_reader.postings_for(["w00001"]))
    # parquet-level pushdown of the term equality (dictionary/min-max
    # skip non-matching blocks inside each file)
    assert "PushedFilters" in plan
    assert "w00001" in plan.split("PushedFilters", 1)[1][:400]
    # hive-partition pruning on the term bucket: exactly one of 64
    # bucket dirs survives (PartitionFilters on the bucket column)
    after = plan.split("PartitionFilters", 1)
    assert len(after) == 2 and "bucket" in after[1][:200]


def test_docid_projection_prunes_text_column(plan_reader):
    plan = _plan(plan_reader.docs.select("doc_id"))
    # ReadSchema of the docs scan must not include the heavy text column
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_no_row_wise_python_in_scored_path(plan_reader):
    from noise_spark.query import plan as P

    plan = _plan(plan_reader.search(P.Or((P.Term("w00001"), P.Term("w00002"))), k=5))
    # Arrow-batched UDFs only (segment decode); never per-row Python
    assert "BatchEvalPython" not in plan


def test_exact_match_is_index_prefiltered(plan_reader):
    """ExactMatch must probe the postings index first and only verify
    ``text ==`` on the candidate semi-join — never a full doc-store
    scan (src/filters.rs:283-344; r3 VERDICT weak #2)."""
    from noise_spark.query import plan as P

    df = plan_reader._match_set(P.ExactMatch("w00001"))
    plan = _plan(df)
    # the stemmed literal reaches the segment scan as a pushed filter
    assert "PushedFilters" in plan
    assert "w00001" in plan.split("PushedFilters", 1)[1][:400]
    # verification joins candidates to the doc store (semi join), so the
    # doc-store text filter is applied post-join, not as a bare scan
    assert "LeftSemi" in plan


def test_exact_match_unanalyzable_literal_falls_back(plan_reader):
    """A literal the analyzer reduces to zero tokens (pure punctuation)
    can't be index-prefiltered — it must still answer (empty here)."""
    from noise_spark.query import plan as P

    assert plan_reader._match_set(P.ExactMatch("!!! ???")).count() == 0


def test_collation_order_rank_is_distributed(spark):
    """ft_collation_order's global rank must not use an unpartitioned
    Window (single-task row_number at scale); it uses the two-pass
    range-partition numbering (index/docids.py)."""
    from noise_spark.entry_queries import queries

    df = queries()["ft_collation_order"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "Window" not in plan
    # the range shuffle over the collation key is the distributed rank
    assert "rangepartitioning" in plan.lower()


def test_ascending_score_order_is_single_takeordered(plan_reader):
    """`order score()` (reference default = ASC) must plan ONE small
    TakeOrderedAndProject over the unordered scored match set — not a
    full descending sort barrier followed by a re-sort."""
    from noise_spark.query.parser import run_query

    df = run_query(plan_reader, 'find {text: ~= "w00001"} order score() limit 3')
    plan = _plan(df)
    physical = plan.split("== Physical Plan ==", 1)[-1]
    assert physical.count("TakeOrderedAndProject") == 1
    # no global all-rows Sort stage beyond the top-k operator
    assert "Sort [" not in physical
