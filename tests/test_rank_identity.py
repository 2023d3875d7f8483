"""End-to-end rank-identity: Spark engine vs pinned pure-Python oracle.

Realizes the north rule's 'rank-identical top-k docIDs + BM25 scores'
over the reference query set shape (FIXTURES.md §3): single-term,
multi-term OR, AND, phrase, proximity, NOT."""

import pytest

from noise_spark.query import IndexReader
from noise_spark.query import plan as P

K = 10
# terms chosen across the Zipf range of the synthetic vocabulary
HEAD, MID, TAIL = "w00000", "w00050", "w01500"

QUERIES = {
    "single_head": P.Or((P.Term(HEAD),)),
    "single_mid": P.Or((P.Term(MID),)),
    "single_tail": P.Or((P.Term(TAIL),)),
    "or_2": P.Or((P.Term(MID), P.Term(TAIL))),
    "or_3_mixed": P.Or((P.Term(HEAD), P.Term("w00123"), P.Term("w00007"))),
    "or_4": P.Or((P.Term("w00011"), P.Term("w00222"), P.Term("w00333"), P.Term("w02000"))),
    "and_2": P.And((P.Term(MID), P.Term("w00007"))),
    "and_3": P.And((P.Term(HEAD), P.Term("w00002"), P.Term("w00010"))),
    "not_1": P.Not(P.Term(MID), P.Term("w00002")),
    "not_or": P.Not(P.Or((P.Term(MID), P.Term(TAIL))), P.Term(HEAD)),
    "phrase_fox": P.Phrase(("quick", "brown", "fox")),
    "phrase_multi": P.Phrase(("multi", "word", "sentenc")),  # 'sentence' stems
    "prox_5": P.Proximity(("quick", "fox"), window=5),
    "prox_10": P.Proximity((MID, "w00007"), window=10),
    "boost": P.Or((P.Term(MID, boost=2.0), P.Term("w00007"))),
}


def _spark_results(reader, node):
    rows = reader.search(node, k=K).collect()
    return [(r["doc_id"], r["score"]) for r in rows]


@pytest.fixture(scope="module")
def reader(spark, small_index):
    idx_dir, _ = small_index
    return IndexReader(spark, idx_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_rank_identity(name, reader, small_oracle):
    node = QUERIES[name]
    got = _spark_results(reader, node)
    want = small_oracle.search(node, k=K)
    assert [d for d, _ in got] == [d for d, _ in want], f"{name}: docIDs differ"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12, abs=1e-15), f"{name}: score {gd}"


def test_scores_bitwise_identical(reader, small_oracle):
    """Summation order is pinned (ascending term), so scores should be
    bitwise equal, not just approximately."""
    node = QUERIES["or_3_mixed"]
    got = _spark_results(reader, node)
    want = small_oracle.search(node, k=K)
    assert got == want


def test_exact_match(reader, spark, small_index, small_oracle):
    idx_dir, _ = small_index
    import os

    txt = (
        spark.read.parquet(os.path.join(idx_dir, "docs"))
        .filter("doc_id = 5")
        .collect()[0]["text"]
    )
    node = P.ExactMatch(txt)
    got = _spark_results(reader, node)
    want = small_oracle.search(node, k=K)
    assert got == want and len(got) >= 1 and got[0][1] == 1.0
