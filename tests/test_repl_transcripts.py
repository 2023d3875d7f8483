"""Reference-transcript replay parity (noise_spark.repltest): run the
reference's own REPL test files end-to-end — schemaless ingest → real
index build → full query language — and pin per-statement outcomes
against the transcripts' expected output.

Divergences that are DESIGN decisions (not bugs) are allowlisted per
transcript with the reason; everything else must pass exactly."""

import os

import pytest

from noise_spark.repltest import replay

REF = "/root/reference/repl-tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference transcripts not available"
)


def outcomes(spark, name, skip=None):
    rs = replay(spark, f"{REF}/{name}", skip=skip)
    bad = [r for r in rs if r.outcome in ("diverge", "error")]
    return rs, bad


def _assert_parity(spark, name, n_stmts, skip=None):
    rs, bad = outcomes(spark, name, skip)
    assert not bad, [
        f"L{r.line} {r.outcome}: {r.text[:60]} {r.detail[:150]}" for r in bad
    ]
    assert len(rs) == n_stmts


def test_group_transcript_full_parity(spark):
    _assert_parity(spark, "group.noise", 65)


def test_query_basic_transcript_full_parity(spark):
    _assert_parity(spark, "query_basic.noise", 66)


def test_collation_transcript_full_parity(spark):
    _assert_parity(spark, "collation.noise", 35)


def test_parameters_transcript_full_parity(spark):
    _assert_parity(spark, "parameters.noise", 91)


def test_deletion_updates_transcript_full_parity(spark):
    _assert_parity(spark, "deletion_updates.noise", 17)


def test_bind_var_transcript_full_parity(spark):
    _assert_parity(spark, "bind_var.noise", 12)


def test_ranges_transcript_parity(spark):
    # L239: `return score()` raw value — this engine scores BM25 where
    # the reference scores normalized TF-IDF (deliberate north-star
    # replacement); the match SET is verified by the unskipped twin
    # statements around it
    _assert_parity(
        spark,
        "ranges.noise",
        51,
        skip={239: "score VALUE: BM25 replaces the reference's TF-IDF"},
    )


def test_not_transcript_full_parity(spark):
    _assert_parity(spark, "not.noise", 32)


_SCORE_VALUE = "score VALUE: BM25 replaces the reference's TF-IDF (north star)"


def test_scoring_transcript_parity(spark):
    # every rank-bearing statement (order score() desc, return ._id)
    # passes; the 18 skipped lines are `return score()` RAW floats —
    # this engine scores BM25 where the reference scores query-norm
    # TF-IDF, a deliberate north-star replacement (noise_spark/
    # scoring.py), so the values differ by design while ranks agree
    _assert_parity(
        spark,
        "scoring.noise",
        30,
        skip={
            ln: _SCORE_VALUE
            for ln in (30, 36, 54, 60, 66, 75, 84, 93, 102, 111, 120, 129,
                       145, 154, 163, 172, 181, 190)
        },
    )


def test_geojson_transcript_parity(spark):
    # L107: the reference iterates bind captures in R-tree key order,
    # not array order (its bind_var transcript shows ARRAY order for
    # non-geo binds, which we follow); L142/149: score VALUES (binary
    # 1.0 here vs the reference's query-normalized TF-IDF), while the
    # row ORDER (seq) matches
    _assert_parity(
        spark,
        "geojson.noise",
        36,
        skip={
            107: "geo bind capture order: reference iterates R-tree keys",
            142: _SCORE_VALUE,
            149: _SCORE_VALUE,
        },
    )


def test_limit_transcript_parity(spark):
    # L59: order .A over equal keys — the reference's tie order is a
    # sort-buffer artifact (its own limit-1 twin at L66 returns a
    # DIFFERENT doc than L59's first row), not a semantic guarantee
    _assert_parity(
        spark,
        "limit.noise",
        20,
        skip={59: "tie order among equal sort keys is unstable in the reference"},
    )
