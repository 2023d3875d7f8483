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


def test_group_transcript_full_parity(spark):
    rs, bad = outcomes(spark, "group.noise")
    assert not bad, [f"L{r.line} {r.outcome}: {r.text[:60]} {r.detail[:120]}" for r in bad]
    assert len(rs) == 65
