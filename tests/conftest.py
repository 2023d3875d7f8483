import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noise_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("noise_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_index(spark, tmp_path_factory):
    """1000-doc synthetic corpus, built once per test session."""
    from noise_spark.corpus import generate_pages
    from noise_spark.index.build import BuildConfig, build_index

    idx_dir = str(tmp_path_factory.mktemp("index") / "idx")
    pages = generate_pages(spark, 1000, seed=42, partitions=8)
    metrics = build_index(spark, pages, idx_dir, BuildConfig(block_size=64))
    return idx_dir, metrics


@pytest.fixture(scope="session")
def small_oracle(spark, small_index):
    from noise_spark.oracle import OracleIndex

    idx_dir, _ = small_index
    docs = (
        spark.read.parquet(os.path.join(idx_dir, "docs"))
        .select("doc_id", "text")
        .collect()
    )
    return OracleIndex([(r["doc_id"], r["text"]) for r in docs])
