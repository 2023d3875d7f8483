"""Property-based robustness for the query-language parser.

Every grammatically-plausible query must either parse into a QuerySpec
or raise ParseError — never an unhandled TypeError/IndexError/KeyError
(the reference parser's errors are all its own Error::Parse,
src/parser.rs). Pure parse-level: no SparkSession needed."""

import json

from hypothesis import given, settings, strategies as st

from noise_spark.query.parser import ParseError, parse_query

words = st.sampled_from(["text", "lang", "alpha", "x", "y", "limit", "order", "sum"])
numbers = st.integers(min_value=-5, max_value=99)


@st.composite
def conditions(draw, depth=0):
    field = draw(words)
    kind = draw(st.sampled_from(
        ["word", "eq", "neq", "range", "bind", "nested", "anon"]
        if depth < 2 else ["word", "eq", "range"]
    ))
    if kind == "word":
        return f'{field}: ~= "{draw(words)}"'
    if kind == "eq":
        v = draw(st.one_of(numbers, words.map(json.dumps), st.booleans(), st.none()))
        return f"{field}: == {json.dumps(v) if not isinstance(v, str) else v}"
    if kind == "neq":
        return f"{field}: != {draw(numbers)}"
    if kind == "range":
        return f"{field}: {draw(st.sampled_from(['>', '<', '>=', '<=']))} {draw(numbers)}"
    if kind == "bind":
        return f'{field}: b::[ == "{draw(words)}"]'
    if kind == "nested":
        return f"{field}: {{{draw(conditions(depth=depth + 1))}}}"
    return f'{field}: [ == "{draw(words)}" || == {draw(numbers)}]'


@st.composite
def boolean_trees(draw, depth=0):
    c = draw(conditions())
    if depth >= 2 or draw(st.booleans()):
        return c
    op = draw(st.sampled_from(["&&", "||"]))
    neg = draw(st.sampled_from(["", "!"]))
    rhs = draw(boolean_trees(depth=depth + 1))
    return f"({c} {op} {neg}{rhs})" if draw(st.booleans()) else f"{c} {op} {neg}{rhs}"


@st.composite
def returns(draw, depth=0):
    kind = draw(st.sampled_from(
        ["path", "id", "score", "whole", "obj", "arr", "agg", "literal"]
        if depth < 2 else ["path", "id", "literal"]
    ))
    if kind == "path":
        segs = draw(st.lists(words, min_size=0, max_size=2))
        tail = "".join(
            draw(st.sampled_from([".{}", "[0]", "[]"])).format(s) for s in segs
        )
        return f".{draw(words)}{tail}"
    if kind == "id":
        return "._id"
    if kind == "score":
        return "score()"
    if kind == "whole":
        return "."
    if kind == "obj":
        n = draw(st.integers(min_value=1, max_value=3))
        items = ", ".join(
            f"k{i}: {draw(returns(depth=depth + 1))}" for i in range(n)
        )
        return "{" + items + "}"
    if kind == "arr":
        n = draw(st.integers(min_value=1, max_value=2))
        return "[" + ", ".join(draw(returns(depth=depth + 1)) for _ in range(n)) + "]"
    if kind == "agg":
        fn = draw(st.sampled_from(
            ["count()", "sum(.y)", "avg(.y)", "group(.lang)", 'concat(.lang sep="|")',
             "array(.y)", "max_array(.y)"]
        ))
        return fn
    return draw(st.sampled_from(['"lit"', "3", "true", "null", "{}", "[]"]))


@st.composite
def queries(draw):
    q = "find {" + draw(st.one_of(st.just(""), boolean_trees())) + "}"
    if draw(st.booleans()):
        keys = ", ".join(
            draw(st.sampled_from([".url asc", ".lang desc", "score()", ".y default=0 desc"]))
            for _ in range(draw(st.integers(min_value=1, max_value=2)))
        )
        q += f" order {keys}"
    if draw(st.booleans()):
        q += " return " + draw(returns())
    if draw(st.booleans()):
        q += f" limit {draw(st.integers(min_value=1, max_value=50))}"
    return q


@settings(max_examples=400, deadline=None)
@given(queries())
def test_parser_never_crashes(q):
    try:
        spec = parse_query(q, analyzer="whitespace")
        assert spec is not None
    except ParseError:
        pass  # a clean grammar rejection is a valid outcome


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_parser_rejects_garbage_cleanly(s):
    try:
        parse_query(s, analyzer="whitespace")
    except ParseError:
        pass
