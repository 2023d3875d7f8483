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
