"""Noise query-language parser: golden queries incl. the reference's
two NOT-legality errors (repl-tests/not.noise:142-152) and
parser→plan→engine equivalence."""

import pytest

from noise_spark.index.build import BuildConfig, build_index
from noise_spark.query import IndexReader
from noise_spark.query import plan as P
from noise_spark.query.parser import (
    ERR_ALL_NOT,
    ERR_DOUBLE_NOT,
    ParseError,
    parse_query,
    run_query,
)

DOCS = [
    (0, "the shuffle moves data between executors", "en"),
    (1, "broadcast joins avoid the shuffle entirely", "en"),
    (2, "term frequency and document length drive bm25", "de"),
    (3, "sort based shuffle writes spill files", "de"),
    (4, "partition counts matter for shuffle heavy jobs", "fr"),
]


@pytest.fixture(scope="module")
def qreader(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    idx = str(tmp_path_factory.mktemp("ql") / "idx")
    build_index(
        spark, df, idx, BuildConfig(analyzer="whitespace", doc_id_col="doc_id", block_size=4)
    )
    return IndexReader(spark, idx)


def ids(df):
    col = df.columns[0]
    return [r[col] for r in df.collect()]


# -- plan construction golden tests (no Spark needed) --------------------------

def test_parse_single_word():
    spec = parse_query('find {text: ~= "shuffle"}', analyzer="whitespace")
    assert spec.node == P.Term("shuffle")


def test_parse_phrase_and_proximity():
    spec = parse_query('find {text: ~= "broadcast joins"}', analyzer="whitespace")
    assert spec.node == P.Phrase(("broadcast", "joins"))
    # ~N= counts words BETWEEN the terms (src/filters.rs:618-620), so
    # the engine-level max position difference is N+1
    spec = parse_query('find {text: ~3= "shuffle data"}', analyzer="whitespace")
    assert spec.node == P.Proximity(("shuffle", "data"), window=4)


def test_parse_boolean_tree_with_parens():
    spec = parse_query(
        'find {text: ~= "a" && (text: ~= "b" || text: ~= "c")}', analyzer="whitespace"
    )
    assert spec.node == P.And((P.Term("a"), P.Or((P.Term("b"), P.Term("c")))))


def test_parse_boost_and_field_predicates():
    spec = parse_query(
        'find {text: ~= "shuffle"^2.5 && lang: == "de" && doc_id: >= 1}',
        analyzer="whitespace",
    )
    assert spec.node == P.And(
        (P.Term("shuffle", boost=2.5), P.FieldEq("lang", "de"), P.FieldRange("doc_id", lo=1))
    )


def test_parse_negation_into_binary_not():
    spec = parse_query(
        'find {text: ~= "shuffle" && !text: ~= "broadcast"}', analyzer="whitespace"
    )
    assert spec.node == P.Not(P.Term("shuffle"), P.Term("broadcast"))


def test_parse_right_recursive_precedence():
    # the reference's obool consumes one operator then recurses on the
    # whole right side (parser.rs:732-746): a && b || c == a && (b || c)
    spec = parse_query(
        'find {text: ~= "a" && text: ~= "b" || text: ~= "c"}', analyzer="whitespace"
    )
    assert spec.node == P.And((P.Term("a"), P.Or((P.Term("b"), P.Term("c")))))
    # and symmetric: a || b && c == a || (b && c)
    spec = parse_query(
        'find {text: ~= "a" || text: ~= "b" && text: ~= "c"}', analyzer="whitespace"
    )
    assert spec.node == P.Or((P.Term("a"), P.And((P.Term("b"), P.Term("c")))))


def test_parse_or_with_negated_arm():
    # a negated OR arm is legal (repl-tests/not.noise:113) and resolves
    # to a complement against the doc universe
    spec = parse_query(
        'find {text: ~= "a" || !text: ~= "b"}', analyzer="whitespace"
    )
    assert spec.node == P.Or((P.Term("a"), P.Not(P.AllDocs(), P.Term("b"))))
    # all-negated conjunction under a positive OR arm: De Morgan
    spec = parse_query(
        'find {text: ~= "a" || (!text: ~= "b" && !text: ~= "c")}',
        analyzer="whitespace",
    )
    assert spec.node == P.Or(
        (P.Term("a"), P.Not(P.AllDocs(), P.Or((P.Term("b"), P.Term("c")))))
    )


def test_parse_top_level_not_object():
    # find {a} && !{b} — the reference's not_object form (parser.rs:672-714)
    spec = parse_query(
        'find {text: ~= "a"} && !{text: ~= "b"}', analyzer="whitespace"
    )
    assert spec.node == P.Not(P.Term("a"), P.Term("b"))
    with pytest.raises(ParseError) as e:
        parse_query('find !{text: ~= "a"}', analyzer="whitespace")
    assert ERR_ALL_NOT in str(e.value)
    # the golden double-not shape: find !{a} && !{b} nests the second
    # not under the first (not.noise:146-148)
    with pytest.raises(ParseError) as e:
        parse_query('find !{text: ~= "a"} && !{text: ~= "b"}', analyzer="whitespace")
    assert ERR_DOUBLE_NOT in str(e.value)


def test_parse_all_docs_and_clauses():
    spec = parse_query(
        "find {} order .lang desc, score() limit 7", analyzer="whitespace"
    )
    assert spec.node == P.AllDocs()
    from noise_spark.query.parser import OrderKey

    assert spec.orders == [
        OrderKey("field", "lang", False),
        OrderKey("score", "score", True),
    ]
    assert spec.limit == 7


def test_parse_params():
    spec = parse_query(
        'params {"w": "shuffle", "n": 2} find {text: ~= @w && doc_id: < @n}',
        analyzer="whitespace",
    )
    assert spec.node == P.And((P.Term("shuffle"), P.FieldRange("doc_id", hi=2, hi_inclusive=False)))
    with pytest.raises(ParseError, match="No matching parameter"):
        parse_query("find {text: ~= @nope}", analyzer="whitespace")


def test_error_all_negated():
    with pytest.raises(ParseError) as e:
        parse_query('find {!text: ~= "fox"}', analyzer="whitespace")
    assert ERR_ALL_NOT in str(e.value)
    with pytest.raises(ParseError) as e:
        parse_query('find {!text: ~= "fox" && !text: == "foo"}', analyzer="whitespace")
    assert ERR_ALL_NOT in str(e.value)


def test_error_double_negation():
    with pytest.raises(ParseError) as e:
        parse_query('find {text: ~= "a" && !(!text: ~= "fox")}', analyzer="whitespace")
    assert ERR_DOUBLE_NOT in str(e.value)
    with pytest.raises(ParseError) as e:
        parse_query('find {text: ~= "a" && !(text: ~= "b" && !text: ~= "c")}', analyzer="whitespace")
    assert ERR_DOUBLE_NOT in str(e.value)


def test_error_shapes():
    for bad in (
        "find {text ~= \"x\"}",      # missing colon
        'find {text: ~= "x"} limit 0',
        'find {text: >= "str"}',
        "find {text: }",
    ):
        with pytest.raises(ParseError):
            parse_query(bad, analyzer="whitespace")


# -- end-to-end: parse → plan → engine -----------------------------------------

def test_run_word_query_matches_engine(qreader):
    got = run_query(qreader, 'find {text: ~= "shuffle"} order score() desc limit 3')
    want = qreader.query(P.Term("shuffle"), k=3)
    assert ids(got) == [r["doc_id"] for r in want.collect()]


def test_run_phrase_and_not(qreader):
    got = ids(run_query(qreader, 'find {text: ~= "the shuffle"}'))
    assert set(got) == {0, 1}
    got = ids(run_query(qreader, 'find {text: ~= "shuffle" && !text: ~= "broadcast"}'))
    assert set(got) == {0, 3, 4}


def test_run_or_with_negated_arm(qreader):
    # docs matching only the complement arm surface with score 0.0:
    # 'bm25' matches {2}; !"the" matches {2, 3, 4} → union {2, 3, 4}
    got = run_query(
        qreader,
        'find {text: ~= "bm25" || !text: ~= "the"} order score() desc '
        "return {id: ._id, s: score()}",
    )
    rows = got.collect()
    assert [r["id"] for r in rows] == [2, 3, 4]
    # docs 3 and 4 match only through the complement arm → zero BM25 mass
    by_id = {r["id"]: r["s"] for r in rows}
    assert by_id[2] > 0.0 and by_id[3] == 0.0 and by_id[4] == 0.0


def test_run_score_ascending(qreader):
    # the reference defaults `order score()` to ASC (parser.rs:1124-1130):
    # limit must keep the LOWEST-scoring matches
    # 'shuffle' matches docs 0/1/3/4, tf=1 each; docs 0/1/3 tie on dl=6,
    # doc 4 has dl=7 → the strictly lowest score. Ascending limit 2 must
    # keep doc 4 then the smallest-docID member of the tied group (0) —
    # NOT the top of the descending ranking.
    asc2 = run_query(qreader, 'find {text: ~= "shuffle"} order score() limit 2')
    assert [r["doc_id"] for r in asc2.collect()] == [4, 0]
    desc2 = run_query(qreader, 'find {text: ~= "shuffle"} order score() desc limit 2')
    assert 4 not in {r["doc_id"] for r in desc2.collect()}


def test_run_field_predicates_and_order(qreader):
    got = run_query(
        qreader, 'find {text: ~= "shuffle" && lang: == "de"} order .doc_id desc'
    )
    assert ids(got) == [3]
    got = run_query(qreader, "find {doc_id: >= 2 && doc_id: < 4} order .doc_id asc")
    assert ids(got) == [2, 3]


def test_run_return_object_with_default(qreader):
    rows = run_query(
        qreader,
        'find {text: ~= "bm25"} return {id: ._id, lg: .lang, x: .nope default=42}',
    ).collect()
    assert len(rows) == 1
    r = rows[0]  # top-level object return = one column per key
    assert r["id"] == 2 and r["lg"] == "de" and r["x"] == 42
    # missing field WITHOUT default renders null — never an error (the
    # reference fills null for absent keypaths, returnable.rs:298;
    # query_basic.noise:197 `return .B` → [null])
    rows = run_query(qreader, 'find {text: ~= "bm25"} return .nope').collect()
    assert [r["result"] for r in rows] == [None]


def test_run_return_score_and_array(qreader):
    rows = run_query(
        qreader, 'find {text: ~= "bm25"} return [.lang, score()]'
    ).collect()
    assert rows[0]["result"][0] == "de"
    assert float(rows[0]["result"][1]) > 0


def test_parse_top_level_parens():
    # the reference's parens production (src/parser.rs:716-729):
    # object falls through to ( <object chain> ), optionally negated
    spec = parse_query('find ({a: == 1} || {b: == 2})', analyzer="whitespace")
    assert spec.node == P.Or((P.FieldEq("a", 1), P.FieldEq("b", 2)))
    spec = parse_query(
        'find {text: ~= "w"} && !({a: == 1} || {b: == 2})', analyzer="whitespace"
    )
    assert isinstance(spec.node, P.Not)
    # and exactly like the reference, a parenthesized group does NOT
    # take a trailing connective of its own
    with pytest.raises(ParseError, match="trailing"):
        parse_query('find ({a: == 1}) && {b: == 2}', analyzer="whitespace")


def test_run_missing_term_or_negated_arm(qreader):
    # every scoring term absent from the corpus (df=0): docs matching
    # through the negated arm still return, at score 0.0
    rows = run_query(
        qreader,
        'find {text: ~= "zzzqqq"} || !{text: ~= "broadcast"}'
        " order score() desc return {id: ._id, s: score()}",
    ).collect()
    assert [r["id"] for r in rows] == [0, 2, 3, 4]  # all docs w/o 'broadcast'
    assert all(r["s"] == 0.0 for r in rows)


def test_parse_bind_variable():
    spec = parse_query('find {tags: x::[== "red"]} return x', analyzer="whitespace")
    assert spec.node == P.Bind("x", "tags", P.cmp(None, "==", "red"))
    assert spec.binds == {"x": [spec.node]}


def test_parse_bind_object_condition():
    # arrays-of-objects element predicates with ||/&& combos
    # (repl-tests/bind_var.noise:10-37)
    spec = parse_query(
        'find {bar: x::[{a: == "foo" || a: == "bar"}]} return x.v',
        analyzer="whitespace",
    )
    assert spec.node == P.Bind(
        "x", "bar", ("or", P.cmp("a", "==", "foo"), P.cmp("a", "==", "bar"))
    )
    assert spec.ret.path == ("v",)
    # same-name binds across OR arms merge (bind_var.noise:40-45)
    spec2 = parse_query(
        'find {bar: x::[{a: == "foo"}] || bar: x::[{a: == "bar"}]} return x.v',
        analyzer="whitespace",
    )
    assert len(spec2.binds["x"]) == 2


def test_run_bind_variable(qreader):
    # bind over a VIRTUAL array field (the token list) — matches docs
    # with a qualifying element and returns the matched elements as an
    # array (src/filters.rs:1068-1152, src/returnable.rs:348-402)
    from pyspark.sql import functions as F

    qreader.virtual_fields["tokens"] = lambda d: F.split("text", " ", -1)
    try:
        rows = run_query(
            qreader,
            'find {tokens: x::[== "shuffle"]} return {id: ._id, m: x}',
        ).collect()
        assert [r["id"] for r in rows] == [0, 1, 3, 4]
        assert all(list(r["m"]) == ["shuffle"] for r in rows)
        # numeric element range over a derived numeric array
        qreader.virtual_fields["lens"] = lambda d: F.transform(
            F.split("text", " ", -1), lambda t: F.length(t)
        )
        rows = run_query(
            qreader, "find {lens: y::[>= 9]} return {id: ._id, n: y}"
        ).collect()
        # docs with a token of length >= 9 (executors/broadcast/frequency/partition)
        assert [r["id"] for r in rows] == [0, 1, 2, 4]
        assert all(all(n >= 9 for n in r["n"]) and r["n"] for r in rows)
    finally:
        qreader.virtual_fields.clear()


def test_run_bind_object_elements(spark, tmp_path_factory):
    # the reference's bind_var.noise golden shapes over a REAL
    # array-of-structs doc field (carried via extra_doc_cols):
    # add {"_id":"1","bar":[{"a":"foo","v":1},{"a":"bar","v":2}]}
    rows = [
        (1, "doc one", [("foo", 1), ("bar", 2)]),
        (2, "doc two", [("baz", 3)]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, bar array<struct<a:string,v:long>>"
    )
    idx = str(tmp_path_factory.mktemp("bind") / "idx")
    build_index(
        spark, df, idx,
        BuildConfig(
            analyzer="whitespace", doc_id_col="doc_id", block_size=4,
            extra_doc_cols=("bar",),
        ),
    )
    r = IndexReader(spark, idx)

    def run(q):
        return [list(row["result"]) for row in run_query(r, q).collect()]

    # return x → the matched elements (bind_var.noise:10-14)
    got = run('find {bar: x::[{a: == "foo"}]} return x')
    assert got == [[{"a": "foo", "v": 1}]] or got == [
        [type(got[0][0])(a="foo", v=1)]
    ]
    assert got[0][0]["a"] == "foo" and got[0][0]["v"] == 1 and len(got) == 1
    # return x.v → sub-path projection (bind_var.noise:16-20)
    assert run('find {bar: x::[{a: == "foo"}]} return x.v') == [[1]]
    # || inside the element condition (bind_var.noise:22-26)
    assert run(
        'find {bar: x::[{a: == "foo" || a: == "bar"}]} return x.v'
    ) == [[1, 2]]
    assert run(
        'find {bar: x::[{a: == "foo" || a: == "baz"}]} return x.v'
    ) == [[1], [3]]
    # same-name binds merge across OR arms (bind_var.noise:40-45)
    assert run(
        'find {bar: x::[{a: == "foo"}] || bar: x::[{a: == "bar"}]} return x.v'
    ) == [[1, 2]]
    # distinct binds + default on the unmatched one (bind_var.noise:47-60)
    got = run(
        'find {bar: x::[{a: == "foo"}] || bar: y::[{a: == "baz"}]}'
        " return [x.v, y.v default=0]"
    )
    assert got == [["[1]", "[0]"], ["[]", "[3]"]]
    # && where one side never matches → empty (bind_var.noise:62-65)
    assert run(
        'find {bar: x::[{a: == "foo"}] && bar: y::[{a: == "nope"}]} return x.v'
    ) == []


def test_parse_bind_aggregate():
    from noise_spark.query.parser import RetAgg, RetBind

    spec = parse_query(
        'find {bar: x::[{a: == "foo"}]} return {s: sum(x.v), w: array(x.)}',
        analyzer="whitespace",
    )
    items = dict(spec.ret.items)
    assert items["s"] == RetAgg("sum", None, bind=RetBind("x", ("v",)))
    assert items["w"] == RetAgg("array", None, bind=RetBind("x", ()))
    # an unbound name is neither a keypath nor a bind variable
    with pytest.raises(ParseError, match="keypath or bind variable"):
        parse_query("find {} return sum(z.v)", analyzer="whitespace")


def test_bind_aggregates_execute(spark, tmp_path_factory):
    # aggregates over a bind variable's matched elements
    # (src/parser.rs:286,308): sum/avg/concat/array_flat over x.v
    rows = [
        (1, "doc one", [("foo", 1), ("bar", 2)]),
        (2, "doc two", [("baz", 3)]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, bar array<struct<a:string,v:long>>"
    )
    idx = str(tmp_path_factory.mktemp("bindagg") / "idx")
    build_index(
        spark, df, idx,
        BuildConfig(
            analyzer="whitespace", doc_id_col="doc_id", block_size=4,
            extra_doc_cols=("bar",),
        ),
    )
    r = IndexReader(spark, idx)
    out = run_query(
        r,
        'find {bar: x::[{a: == "foo" || a: == "baz"}]} '
        'return {n: count(), s: sum(x.v), c: concat(x.a sep="|"), '
        "f: array_flat(x.v)}",
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n"] == 2
    assert row["s"] == 4.0  # 1 (doc 1's foo) + 3 (doc 2's baz)
    # ungrouped collects run reverse doc order (reference pops its
    # seq-ordered buffer from the back, src/query.rs; group.noise:187)
    assert row["c"] == "baz|foo"
    assert list(row["f"]) == [3, 1]
    # grouped: per-text group, bind sum within each group
    grouped = run_query(
        r,
        'find {bar: x::[{a: == "foo" || a: == "baz"}]} '
        "return {t: group(.text), s: sum(x.v)}",
    ).collect()
    assert [(g["t"], g["s"]) for g in grouped] == [("doc one", 1.0), ("doc two", 3.0)]
    # bare-bind + kwarg is whitespace-disambiguated (consume_no_ws):
    # `concat(x.a sep="|")` has a subpath; `concat(x. sep...)` would be
    # the whole element — here exercise the adjacency rule via group
    row = run_query(
        r,
        'find {bar: x::[{a: == "foo" || a: == "baz"}]} '
        'return {c: concat(x.a sep="|"), f: array_flat(x.)}',
    ).collect()[0]
    assert row["c"] == "baz|foo"  # ungrouped collects: reverse doc order
    # array_flat(x.) flattens the whole matched elements across docs
    assert [e["a"] for e in row["f"]] == ["baz", "foo"]


def test_bind_aggregate_bare_dot_with_kwarg_parses():
    # reference grammar: bind_name + keypath where bare `.` = the whole
    # element; a following kwarg (sep=/order=) must NOT be swallowed as
    # a sub-path segment (whitespace rule)
    from noise_spark.query.parser import RetAgg, RetBind

    spec = parse_query(
        'find {bar: x::[== "v"]} return concat(x. sep="|")', analyzer="whitespace"
    )
    assert spec.ret == RetAgg("concat", None, sep="|", bind=RetBind("x", ()))
    spec = parse_query(
        'find {bar: x::[== "v"]} return {g: group(x.)}', analyzer="whitespace"
    )
    assert dict(spec.ret.items)["g"] == RetAgg(
        "group", None, order="asc", bind=RetBind("x", ())
    )


def test_id_string_predicate_addresses_url(qreader):
    # the reference's _id is the USER's string id ({_id: =="14"},
    # repl-tests/query_basic.noise); our string-id surface is url —
    # numeric literals keep addressing the internal doc_id
    assert ids(run_query(qreader, 'find {_id: == "doc:000000000002"} return ._id')) == [2]
    assert ids(run_query(qreader, "find {_id: == 3} return ._id")) == [3]
    # negated string-id predicate composes with an AND scope
    got = ids(
        run_query(qreader, 'find {lang: == "de" && _id: != "doc:000000000002"} return ._id')
    )
    assert got == [3]


def test_quoted_dotted_field_name(spark, tmp_path_factory):
    # {"a.b": == 1} addresses a LITERAL dotted column (the reference
    # escapes delimiter chars in keypaths, src/key_builder.rs:385-397)
    df = spark.createDataFrame(
        [(1, "alpha one", 1), (2, "alpha two", 2)],
        "doc_id long, text string, `a.b` long",
    )
    idx = str(tmp_path_factory.mktemp("dotted") / "idx")
    build_index(
        spark, df, idx,
        BuildConfig(
            analyzer="whitespace", doc_id_col="doc_id", block_size=4,
            extra_doc_cols=("a.b",),
        ),
    )
    r = IndexReader(spark, idx)
    assert "a.b" in r.docs.columns
    assert ids(run_query(r, 'find {"a.b": == 1} return ._id')) == [1]
    assert ids(run_query(r, 'find {text: ~= "alpha" && "a.b": > 1} return ._id')) == [2]
    # the READ side must also address the literal name: whole-doc
    # return, quoted return path, and order key over the dotted column
    rows = run_query(r, 'find {"a.b": == 1} return .').collect()
    assert rows[0]["a.b"] == 1 and rows[0]["doc_id"] == 1
    rows = run_query(r, 'find {} return .["a.b"] limit 2').collect()
    assert [x["result"] for x in rows] == [1, 2]
    rows = run_query(r, 'find {} order .["a.b"] desc return ._id limit 2').collect()
    assert [x["result"] for x in rows] == [2, 1]
    # aggregate over the dotted column
    rows = run_query(r, 'find {} return sum(.["a.b"])').collect()
    assert rows[0]["result"] == 3


def test_run_exact_match_binary_score(qreader):
    rows = run_query(
        qreader, f'find {{text: == "{DOCS[2][1]}"}} return {{i: ._id, s: score()}}'
    ).collect()
    assert [(r["i"], r["s"]) for r in rows] == [(2, 1.0)]


def test_parse_nested_return_paths():
    from noise_spark.query.parser import OrderKey, RetObject, RetPath, parse_query

    spec = parse_query(
        'find {} order .meta.rank desc default=30 '
        'return {a: .meta.author, b: .tags[0], c: .links[].host, '
        'd: .["quoted key"].x} limit 5',
        analyzer="whitespace",
    )
    assert spec.orders == [
        OrderKey("field", "meta", False, (("f", "rank"),), 30, True)
    ]
    assert isinstance(spec.ret, RetObject)
    by_key = dict(spec.ret.items)
    assert by_key["a"] == RetPath("meta", rest=(("f", "author"),))
    assert by_key["b"] == RetPath("tags", rest=(("i", 0),))
    assert by_key["c"] == RetPath("links", rest=(("*",), ("f", "host")))
    assert by_key["d"] == RetPath("quoted key", rest=(("f", "x"),))


def test_parse_order_default_before_desc():
    # the reference lets asc/desc appear on either side of default=,
    # the later one winning (src/parser.rs:1090-1106)
    from noise_spark.query.parser import OrderKey, parse_query

    spec = parse_query(
        "find {} order .age asc default=30 desc limit 3", analyzer="whitespace"
    )
    assert spec.orders == [OrderKey("field", "age", False, (), 30, True)]


@pytest.fixture(scope="module")
def nested_reader(spark, tmp_path_factory):
    """Docs with struct / array / array-of-struct columns riding along
    in the doc store (extra_doc_cols) — the typed-column re-expression
    of the reference's nested keypaths."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("author", T.StringType()),
                        T.StructField("rank", T.LongType()),
                    ]
                ),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "links",
                T.ArrayType(
                    T.StructType([T.StructField("host", T.StringType())])
                ),
            ),
        ]
    )
    rows = [
        (0, "alpha shuffle", {"author": "ada", "rank": 3}, ["x", "y"],
         [{"host": "a.com"}, {"host": "b.org"}]),
        (1, "beta shuffle", {"author": "bob", "rank": None}, ["z"],
         [{"host": "c.net"}]),
        (2, "gamma shuffle", {"author": "cyd", "rank": 1}, [], []),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=[f.name for f in schema]), schema)
    idx = str(tmp_path_factory.mktemp("nested") / "idx")
    build_index(
        spark,
        df,
        idx,
        BuildConfig(
            analyzer="whitespace",
            doc_id_col="doc_id",
            block_size=4,
            extra_doc_cols=("meta", "tags", "links"),
        ),
    )
    return IndexReader(spark, idx)


def test_nested_return_paths_execute(nested_reader):
    out = run_query(
        nested_reader,
        'find {text: ~= "shuffle"} order .doc_id asc '
        "return {a: .meta.author, t: .tags[0], hosts: .links[].host}",
    ).collect()
    assert [r["a"] for r in out] == ["ada", "bob", "cyd"]
    assert [r["t"] for r in out] == ["x", "z", None]
    assert [list(r["hosts"]) for r in out] == [["a.com", "b.org"], ["c.net"], []]


def test_return_whole_doc_execute(qreader):
    # bare `return .` = the whole STORED document (returnable.rs:17-72;
    # pinned output repl-tests/query_basic.noise:249-252 includes every
    # field plus _id): one column per doc-store column, doc_id first
    out = run_query(qreader, 'find {lang: == "de"} return .')
    assert out.columns == qreader.docs.columns
    assert out.columns[0] == "doc_id"
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [2, 3]  # default order: doc_id asc
    docs = {r["doc_id"]: r.asDict() for r in qreader.docs.collect()}
    for r in rows:
        assert r.asDict() == docs[r["doc_id"]]


def test_return_whole_doc_nested_struct(qreader):
    # `.` inside a constructed object renders the doc as ONE struct
    out = run_query(qreader, 'find {lang: == "de"} return {d: ., id: ._id} limit 2')
    assert out.columns == ["d", "id"]
    for r in out.collect():
        assert r["d"]["doc_id"] == r["id"]
        assert r["d"]["lang"] == "de"
        assert r["d"]["text"]  # the full text column rides along


def test_return_whole_doc_mixed_with_aggregate_errors(qreader):
    with pytest.raises(ParseError):
        parse_query("find {} return [., count()]", analyzer="whitespace")


def test_whole_doc_vs_field_is_whitespace_sensitive():
    # reference consume_no_ws rule (src/parser.rs:343-356):
    # `return . limit 5` = whole doc + limit clause;
    # `return .limit` = a field literally named "limit"
    from noise_spark.query.parser import RetPath, RetWholeDoc

    spec = parse_query("find {} return . limit 5", analyzer="whitespace")
    assert isinstance(spec.ret, RetWholeDoc) and spec.limit == 5
    spec = parse_query("find {} return .limit", analyzer="whitespace")
    assert spec.ret == RetPath("limit")


def test_order_key_default_execute(nested_reader):
    # missing rank (null) compares as the stand-in 2: ranks 3,·(→2),1
    # → desc order is doc 0 (3), doc 1 (2), doc 2 (1)
    out = run_query(
        nested_reader,
        'find {text: ~= "shuffle"} order .meta.rank desc default=2 return ._id',
    ).collect()
    assert [r["result"] for r in out] == [0, 1, 2]


def test_parse_quoted_key_mid_path():
    from noise_spark.query.parser import RetPath, parse_query

    spec = parse_query(
        'find {} return {x: .a["weird key"].b} limit 1', analyzer="whitespace"
    )
    assert dict(spec.ret.items)["x"] == RetPath(
        "a", rest=(("f", "weird key"), ("f", "b"))
    )


def test_score_tie_secondary_order_key_decides_membership(qreader):
    """With `order score() desc, .doc_id desc limit 1` and two docs at
    EQUAL BM25 score, the secondary key decides which doc is IN the
    top-1 — the engine must sort the full scored set by the complete
    key, not pre-truncate with its own (score desc, doc_id asc)
    tie-break (r4 review finding)."""
    # docs 0 and 1 both contain 'the' once with dl=6 → identical scores
    got = ids(
        run_query(
            qreader,
            'find {text: ~= "the"} order score() desc, .doc_id desc limit 1',
        )
    )
    assert got == [1]


def test_parse_nested_object_predicate():
    spec = parse_query('find {meta: {rank: > 1}}', analyzer="whitespace")
    assert spec.node == P.FieldRange("meta.rank", lo=1, lo_inclusive=False)
    spec = parse_query(
        'find {a: {b: == 1 || c: {d: == 2}}}', analyzer="whitespace"
    )
    assert spec.node == P.Or((P.FieldEq("a.b", 1), P.FieldEq("a.c.d", 2)))


def test_parse_anonymous_array_filter():
    spec = parse_query('find {tags: [ == "x" || == "z" ]}', analyzer="whitespace")
    assert spec.node == P.Bind(
        "", "tags", ("or", P.cmp(None, "==", "x"), P.cmp(None, "==", "z"))
    )
    assert spec.binds == {}  # anonymous: no return surface registered
    spec = parse_query('find {links: [{host: == "c.net"}]}', analyzer="whitespace")
    assert spec.node == P.Bind("", "links", P.cmp("host", "==", "c.net"))


def test_nested_and_array_predicates_execute(nested_reader):
    # struct keypath range: ranks are 3, None, 1 → only doc 0 has rank>1
    got = ids(run_query(nested_reader, "find {meta: {rank: > 1}}"))
    assert got == [0]
    # scalar array disjunction, same-element object condition
    got = ids(run_query(nested_reader, 'find {tags: [ == "x" || == "z" ]}'))
    assert got == [0, 1]
    got = ids(run_query(nested_reader, 'find {links: [{host: == "c.net"}]}'))
    assert got == [1]
    # combined with word match and negation
    got = ids(
        run_query(
            nested_reader,
            'find {text: ~= "shuffle" && !links: [{host: == "c.net"}]}',
        )
    )
    assert got == [0, 2]


@pytest.fixture(scope="module")
def agg_reader(spark, tmp_path_factory):
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("baz", T.StringType()),
            T.StructField("bar", T.LongType()),
            T.StructField("vals", T.ArrayType(T.LongType())),
            T.StructField("deep", T.ArrayType(T.ArrayType(T.LongType()))),
        ]
    )
    rows = [
        (0, "agg doc", "a", 1, [1, 2, 3], [[1, 2], [3]]),
        (1, "agg doc", "b", 2, [4, 5], [[4]]),
        (2, "agg doc", None, 3, [], []),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in schema]), schema
    )
    idx = str(tmp_path_factory.mktemp("agg") / "idx")
    build_index(
        spark,
        df,
        idx,
        BuildConfig(
            analyzer="whitespace",
            doc_id_col="doc_id",
            extra_doc_cols=("baz", "bar", "vals", "deep"),
        ),
    )
    return IndexReader(spark, idx)


def test_aggregate_group_sum_count(agg_reader):
    rows = run_query(
        agg_reader,
        'find {text: ~= "agg"} return {baz: group(.baz) default="z", '
        "bar: sum(.bar), n: count()}",
    ).collect()
    assert [(r["baz"], r["bar"], r["n"]) for r in rows] == [
        ("a", 1, 1), ("b", 2, 1), ("z", 3, 1),
    ]


def test_aggregate_arrays_and_defaults(agg_reader):
    # element aggregates deep-flatten nested arrays (group.noise:224-249)
    row = run_query(
        agg_reader,
        'find {text: ~= "agg"} return {s: sum(.vals), a: avg(.vals), '
        "mx: max_array(.vals), mn: min_array(.vals), ds: sum(.deep)}",
    ).collect()[0]
    assert (row["s"], row["a"], row["mx"], row["mn"], row["ds"]) == (
        15.0, 3.0, 5, 1, 10.0,
    )
    # aggregate default= fills missing VALUES before aggregating
    # (group.noise:98-109); an entirely-absent field needs the default
    row = run_query(
        agg_reader,
        'find {text: ~= "agg"} return {m: max(.nosuch) default=120}',
    ).collect()[0]
    assert row["m"] == 120


def test_aggregate_global_and_ordering_rules(agg_reader):
    # no group() → one global row; UNGROUPED collects run reverse doc
    # order (the reference pops its seq-ordered buffer from the back,
    # src/query.rs do_ordering_and_ags; pinned by group.noise:187)
    row = run_query(
        agg_reader,
        'find {text: ~= "agg"} return concat(.baz sep="|")',
    ).collect()[0]
    assert row["result"] == "b|a"  # null baz skipped by array_join
    # grouped rows order by group keys in declared directions; limit after
    rows = run_query(
        agg_reader,
        'find {text: ~= "agg"} return [group(.bar order=desc), count()] limit 2',
    ).collect()
    assert [list(r["result"]) for r in rows] == [["3", "1"], ["2", "1"]]
    with pytest.raises(ParseError, match="aggregates and ordering"):
        parse_query('find {} order .bar return {n: count()}', analyzer="whitespace")
    with pytest.raises(ParseError, match="all have aggregate"):
        parse_query('find {} return {n: count(), x: .bar}', analyzer="whitespace")


def test_parse_quoted_field_comma_and_nested_array_conditions():
    # quoted field names, ',' ≡ '&&' inside object element conditions,
    # nested array conditions, and _id ≡ doc_id (query_basic.noise)
    spec = parse_query('find {"$A": == true}', analyzer="whitespace")
    assert spec.node == P.FieldEq("$A", True)
    spec = parse_query('find {_id: == 3}', analyzer="whitespace")
    assert spec.node == P.FieldEq("doc_id", 3)
    spec = parse_query(
        'find {A: [{B: == "B2", C: == "C2"}]}', analyzer="whitespace"
    )
    assert spec.node == P.Bind(
        "", "A", ("and", P.cmp("B", "==", "B2"), P.cmp("C", "==", "C2"))
    )
    spec = parse_query(
        'find {A: [{B: == "B2", C: [{D: == "D"}]}]}', analyzer="whitespace"
    )
    assert spec.node == P.Bind(
        "",
        "A",
        ("and", P.cmp("B", "==", "B2"), ("arr", "C", P.cmp("D", "==", "D"))),
    )


def test_nested_array_condition_executes(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField(
                "A",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("B", T.StringType()),
                            T.StructField("C", T.ArrayType(T.StringType())),
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        (0, "na doc", [{"B": "B2", "C": ["D", "E"]}]),
        (1, "na doc", [{"B": "B2", "C": ["X"]}]),
        (2, "na doc", [{"B": "B9", "C": ["D"]}]),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=[f.name for f in schema]), schema)
    idx = str(tmp_path / "na")
    build_index(
        spark, df, idx,
        BuildConfig(analyzer="whitespace", doc_id_col="doc_id", extra_doc_cols=("A",)),
    )
    r = IndexReader(spark, idx)
    # same-element: B == "B2" AND C contains "D" → only doc 0
    got = ids(run_query(r, 'find {A: [{B: == "B2", C: [ == "D" ]}]}'))
    assert got == [0]
    got = ids(run_query(r, "find {_id: == 2}"))
    assert got == [2]


def test_aggregate_null_hygiene_and_edge_legality(agg_reader):
    # doc 2 has baz=None: array() omits missing values (like concat and
    # the reference's absent-keypath behavior) instead of collecting null
    row = run_query(
        agg_reader, 'find {text: ~= "agg"} return array(.baz)'
    ).collect()[0]
    # reverse doc order: ungrouped collect pops from the buffer's back
    assert list(row["result"]) == ["b", "a"]
    # all-group return → distinct groups, no empty-agg crash
    rows = run_query(
        agg_reader, 'find {text: ~= "agg"} return {b: group(.bar)}'
    ).collect()
    assert [r["b"] for r in rows] == [1, 2, 3]
    # nested aggregates are rejected cleanly, not crashed on
    with pytest.raises(ParseError, match="top-level"):
        parse_query('find {} return {a: {n: count()}}', analyzer="whitespace")
    with pytest.raises(ParseError, match="no default"):
        parse_query('find {} return {n: count() default=5}', analyzer="whitespace")
    # quoted dotted field names lower to a backtick-escaped LITERAL
    # column ref (r5; previously rejected)
    spec = parse_query('find {"a.b": == 1}', analyzer="whitespace")
    assert spec.node == P.FieldEq("`a.b`", 1)


def test_aggregate_null_array_elements(spark, tmp_path):
    """A null array element must not null out sum/avg/array_flat for
    the whole group (F.aggregate/F.flatten propagate nulls otherwise)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("vals", T.ArrayType(T.LongType())),
        ]
    )
    rows = [(0, "nn doc", [1, None]), (1, "nn doc", [2]), (2, "nn doc", None)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=[f.name for f in schema]), schema)
    idx = str(tmp_path / "nn")
    build_index(
        spark, df, idx,
        BuildConfig(analyzer="whitespace", doc_id_col="doc_id", extra_doc_cols=("vals",)),
    )
    r = IndexReader(spark, idx)
    row = run_query(
        r,
        'find {text: ~= "nn"} return {s: sum(.vals), a: avg(.vals), f: array_flat(.vals)}',
    ).collect()[0]
    assert row["s"] == 3.0 and row["a"] == 1.5
    # ungrouped array_flat collects docs in reverse seq order
    assert list(row["f"]) == [2, 1]
