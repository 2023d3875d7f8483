"""Cross-type collation ordering pinned to the reference's golden
transcript (repl-tests/collation.noise) and compare rules
(src/json_value.rs:67-123)."""

import json
import random

from pyspark.sql import functions as F

from noise_spark.query.collation import collation_key, encode_value

# the exact sorted order collation.noise pins for `order .bar asc`
GOLDEN = [
    None,
    False,
    True,
    1,
    1.00001,
    2.00001,
    "string",
    "string2",
    "string3",
    [],
    [None],
    [True],
    {},
    {"bar": "bar", "foo": "baz"},
    {"bar": "baz", "foo": "baz"},
    {"foo": "bar"},
    {"foo": "baz"},
]


def enc_list(vals):
    return [encode_value(v) for v in vals]


def test_encode_reproduces_collation_noise_order():
    rng = random.Random(7)
    vals = list(GOLDEN)
    for _ in range(5):
        rng.shuffle(vals)
        got = sorted(vals, key=encode_value)
        # compare ENCODINGS (python's ==/sort would conflate True and 1)
        assert enc_list(got) == enc_list(GOLDEN)


def test_encode_array_elementwise_then_length():
    # json_value.rs:67-85 — element-wise, shorter prefix first
    arrays = [[], [1], [1, 1], [1, 2], [2], [2, 0], ["a"], [[1]]]
    assert sorted(arrays, key=encode_value) == arrays
    # numbers < strings < arrays inside elements
    assert encode_value([1, "a"]) < encode_value([1, []])


def test_encode_numbers_total_order():
    nums = [-1e300, -2.5, -1, -0.1, 0, 0.1, 1, 1.00001, 2, 1e300]
    shuffled = nums[::-1]
    assert sorted(shuffled, key=encode_value) == nums


def test_encode_string_edge_cases():
    # prefix first; embedded NUL escaping keeps prefix-freeness
    strs = ["", "a", "a\x00", "a\x00b", "ab", "b"]
    assert sorted(strs[::-1], key=encode_value) == strs


def test_spark_orderby_collation_key(spark):
    rows = [(i, json.dumps(v)) for i, v in enumerate(GOLDEN)]
    df = spark.createDataFrame(rows, "id long, js string")
    got = [
        r["id"]
        for r in df.orderBy(collation_key(F.col("js")), "id").collect()
    ]
    assert got == list(range(len(GOLDEN)))
