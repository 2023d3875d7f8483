"""Query mini-syntax parser (CLI find clause)."""

from noise_spark.cli import parse_query
from noise_spark.query import plan as P


def test_or_terms():
    n = parse_query("running jumped")
    assert n == P.Or((P.Term("run"), P.Term("jump")))


def test_must_and_not():
    n = parse_query("+cats +dogs -fish")
    assert n == P.Not(P.And((P.Term("cat"), P.Term("dog"))), P.Term("fish"))


def test_phrase_and_proximity():
    assert parse_query('"quick brown fox"') == P.Phrase(("quick", "brown", "fox"))
    assert parse_query('~5 "quick fox"') == P.Proximity(("quick", "fox"), window=5)


def test_boost():
    assert parse_query("cats^2.5 dogs") == P.Or((P.Term("cat", boost=2.5), P.Term("dog")))


def test_mixed_must_should():
    n = parse_query("+spark shuffle joins")
    assert n == P.And((P.Term("spark"), P.Or((P.Term("shuffl"), P.Term("join")))))


def test_all_negated_illegal():
    import pytest

    with pytest.raises(ValueError, match="all-negated"):
        parse_query("-foo -bar")
