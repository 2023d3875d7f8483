"""Differential fuzz for the VARIANT predicate lowering
(query/variant.py): hundreds of random JSON values × a grid of
conditions, Spark expressions vs a pure-Python evaluator of the
documented semantics (src/json_value.rs type guards: booleans are not
numbers, "1" != 1, ranges are numeric-only, None matches a PRESENT
JSON null, != requires existence)."""

import json
import random

import pytest
from pyspark.sql import functions as F

from noise_spark.query.variant import v_eq, v_exists, v_ne, v_range


def _rand_scalar(rng):
    return rng.choice(
        [
            None,
            True,
            False,
            0,
            1,
            -3,
            2.5,
            1.0,
            "",
            "a",
            "1",
            "b",
            rng.randint(-50, 50),
            round(rng.uniform(-5, 5), 3),
        ]
    )


def _rand_value(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.45:
        return _rand_scalar(rng)
    if r < 0.75:
        return [_rand_value(rng, depth + 1) for _ in range(rng.randint(0, 4))]
    return {
        k: _rand_value(rng, depth + 1)
        for k in rng.sample(["a", "b", "c"], rng.randint(1, 2))
    }


def _is_num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def py_eq(v, lit, present):
    if not present:
        return False
    if lit is None:
        return v is None
    if isinstance(lit, bool):
        return isinstance(v, bool) and v == lit
    if isinstance(lit, (int, float)):
        return _is_num(v) and float(v) == float(lit)
    return isinstance(v, str) and v == lit


def py_ne(v, lit, present):
    return present and not py_eq(v, lit, present)


def py_range(v, lo, hi, present):
    if not present or not _is_num(v):
        return False
    x = float(v)
    return (lo is None or x > lo) and (hi is None or x < hi)


def py_elem_eq(v, lit, present):
    if not present or not isinstance(v, list):
        return False
    return any(py_eq(e, lit, True) for e in v)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_variant_predicates_match_python_semantics(spark, seed):
    rng = random.Random(seed)
    vals = [_rand_value(rng) for _ in range(120)]
    rows = []
    for i, v in enumerate(vals):
        doc = {"i": i}
        present = rng.random() > 0.15
        if present:
            doc["f"] = v
        rows.append((i, json.dumps(doc), present))
    df = spark.createDataFrame(
        [(i, js) for i, js, _ in rows], "i long, js string"
    ).select(
        "i",
        F.try_variant_get(F.parse_json("js"), "$.f", "variant").alias("f"),
    )
    presence = {i: p for i, _, p in rows}
    by_i = {i: v for i, v in enumerate(vals)}

    literals = [None, True, False, 0, 1, 2.5, "a", "1", ""]
    cases = []
    for lit in literals:
        cases.append(("eq", lit, v_eq(F.col("f"), lit), lambda v, p, lit=lit: py_eq(v, lit, p)))
        cases.append(("ne", lit, v_ne(F.col("f"), lit), lambda v, p, lit=lit: py_ne(v, lit, p)))
        if lit not in (None, True, False) and not isinstance(lit, str):
            cases.append(
                (
                    "gt",
                    lit,
                    v_range(F.col("f"), lo=lit, lo_inclusive=False),
                    lambda v, p, lit=lit: py_range(v, float(lit), None, p),
                )
            )
            cases.append(
                (
                    "lt",
                    lit,
                    v_range(F.col("f"), hi=lit, hi_inclusive=False),
                    lambda v, p, lit=lit: py_range(v, None, float(lit), p),
                )
            )
        cases.append(
            (
                "elem_eq",
                lit,
                v_exists(F.col("f"), ("cmp", None, "==", lit)),
                lambda v, p, lit=lit: py_elem_eq(v, lit, p),
            )
        )

    sel = df.select(
        "i", *[c.alias(f"c{j}") for j, (_, _, c, _) in enumerate(cases)]
    )
    got = {r["i"]: r for r in sel.collect()}
    mismatches = []
    for i in by_i:
        for j, (kind, lit, _, ref) in enumerate(cases):
            want = ref(by_i[i], presence[i])
            have = bool(got[i][f"c{j}"])
            if want != have:
                mismatches.append(
                    (kind, lit, by_i[i] if presence[i] else "<missing>", want, have)
                )
    assert not mismatches, mismatches[:10]
