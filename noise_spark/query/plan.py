"""Query plan nodes — the re-expression of the reference's filter tree.

The reference parses its find-clause directly into a physical
``QueryRuntimeFilter`` tree (``/root/reference/src/parser.rs:1395-1398``,
``src/filters.rs:19-29``). Here the plan is a small declarative AST the
engine lowers onto DataFrame operations:

- ``Term``       ← StemmedWordFilter   (src/filters.rs:82-130)
- ``Or``         ← OrFilter            (src/filters.rs:811-942)
- ``And``        ← AndFilter leapfrog  (src/filters.rs:728-809)
- ``Not``        ← NotFilter           (src/filters.rs:944-1066)
- ``Phrase``     ← StemmedPhraseFilter (src/filters.rs:175-272)
- ``Proximity``  ← DistanceFilter      (src/filters.rs:588-726)
- ``ExactMatch`` ← ExactMatchFilter    (src/filters.rs:274-377)
- ``Boost``      ← BoostFilter         (src/filters.rs:1154-1195)

Scoring is BM25 (k1=1.2, b=0.75) summed over matched terms; boolean
filters shape the candidate set. Boost multiplies the subtree's score
contributions, as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from ..analysis.tokenizer import analyze


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Term(Node):
    """Stemmed-word match, optionally scoped to an indexed field — the
    reference's keypath-scoped ``{f: ~= "w"}`` (keypaths become field
    columns per SURVEY §1.5; key layout ``W<keypath>!<stem>``,
    src/key_builder.rs:64-82). ``field=None`` = the index's default
    (first) field."""

    term: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class Or(Node):
    children: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class And(Node):
    children: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class Not(Node):
    positive: Node
    negative: Node  # docs matching this are excluded


@dataclass(frozen=True)
class Phrase(Node):
    terms: tuple
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class Proximity(Node):
    terms: tuple
    window: int
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class ExactMatch(Node):
    literal: str


@dataclass(frozen=True)
class FieldEq(Node):
    """Typed-column equality over the document store (lang == 'en',
    bool/null equality — the reference's T/F/N key scans,
    src/filters.rs:413-451). ``value=None`` means IS NULL."""

    field: str
    value: object


@dataclass(frozen=True)
class FieldRange(Node):
    """Numeric/timestamp range over a document-store column — the
    reference's f-key range scans (src/filters.rs:379-501). Bounds are
    inclusive/exclusive per flags; None = unbounded."""

    field: str
    lo: object = None
    hi: object = None
    lo_inclusive: bool = True
    hi_inclusive: bool = True


@dataclass(frozen=True)
class AllDocs(Node):
    """Match every document, score 1.0 (find {} — src/filters.rs:42-80)."""


@dataclass(frozen=True)
class BboxOverlap(Node):
    """Geo bounding-box overlap — the reference's ``{g: && [W,S,E,N]}``
    over GeoJSON bboxes in an R-tree column family (BboxFilter,
    src/filters.rs:503-586; shred side src/json_shred.rs:88-109).

    Spark lowering: per-doc bboxes are a typed struct column
    ``(minx, miny, maxx, maxy)`` (possibly virtual) and overlap is four
    range conjunctions — plain Catalyst predicates with parquet min/max
    pushdown. The R-tree's role at scale is played by Z-order bucketing
    (:func:`noise_spark.datapipe.geo.zorder_cell`): write the table
    partitioned/clustered by the cell of the bbox centroid and the query
    prunes to the cells its window covers. Binary-scored (1.0), like the
    reference (src/filters.rs:572-577)."""

    field: str
    west: float
    south: float
    east: float
    north: float


@dataclass(frozen=True)
class ElemWord(Node):
    """Word-match condition over ARRAY ELEMENTS with same-element
    boolean semantics — the reference's stemmed filters inside array
    clauses (``{bar: [(~="fox" || ~="brown") && !~="quick"]}``,
    repl-tests/not.noise:50-98): ONE element must satisfy the whole
    tree, so a doc-level And/Not over the flattened element field
    would be wrong (doc 8 ["quick","fox"] matches via its "fox"
    element even though the DOC contains "quick").

    ``tree`` nodes: ("word", terms, window|None) /
    ("wand"|"wor", l, r) / ("wnot", t). ``depth`` scopes the
    arraypath (1 = direct elements, 2 = elements of nested arrays).

    Spark lowering (engine._elem_word_match): candidates come from an
    INDEX prefilter on the positive terms at the depth-scoped shadow
    field (a bucket-pruned postings scan — scale-sound); the
    same-element boolean is then ONE Arrow-batched verify over the
    stored field value (re-tokenize per element, evaluate the tree) —
    the same candidates+verify shape as phrase matching. Pure-positive
    trees never build this node: the parser rewrites them to plain
    Term/Or/And on the shadow field (index-only, scored)."""

    field: str
    tree: tuple
    depth: int = 1


@dataclass(frozen=True)
class ElemWordAll(Node):
    """∀-quantified nested word match: every DEPTH-1 element (itself
    an array) has a DEPTH-2 string element matching the tree; docs
    where the field is missing, scalar, or whose depth-1 elements are
    not arrays do NOT satisfy it. Only reachable negated — the
    reference's ``{f: [[!~="w"]]}`` complements exactly this set
    (not.noise:113-152: docs without the field and flat-array docs all
    match the negation)."""

    field: str
    tree: tuple


@dataclass(frozen=True)
class Bind(Node):
    """Bind variable over an array-valued field — the reference's
    ``{field: x::[<cond>]}`` (BindFilter, src/filters.rs:1068-1152):
    matches docs where at least one array element satisfies the
    condition, and records the MATCHING ELEMENTS under ``name`` for the
    return clause (``return x`` → always an array,
    src/returnable.rs:348-402).

    Spark lowering needs no explosion at all: the match is
    ``exists(field, pred)`` and the bound values are
    ``filter(field, pred)`` — both JVM-side higher-order functions, so
    the reference's per-element arraypath bookkeeping costs zero shuffle
    here.

    ``cond`` is a hashable element-condition tree (the subset the
    reference's bind grammar reaches, src/parser.rs:1054-1068 +
    repl-tests/bind_var.noise):

    - ``("cmp", key, op, value)`` — compare the element (``key=None``,
      scalar arrays) or the element's field ``key`` (arrays of objects,
      ``x::[{a: == "foo"}]``); ``op`` ∈ {==, !=, >, >=, <, <=},
      ``value=None`` means JSON null.
    - ``("or", left, right)`` / ``("and", left, right)`` — boolean
      combos INSIDE the element condition (``x::[{a: == "x" || a: ==
      "y"}]``): one element must satisfy the whole combo."""

    name: str
    field: str
    cond: tuple


def cmp(key, op, value) -> tuple:
    """Shorthand for a Bind comparison leaf."""
    return ("cmp", key, op, value)


def bind_element_pred(node: "Bind"):
    """Element-level predicate of a Bind as a Column → Column lambda,
    usable inside ``exists``/``filter`` higher-order functions."""
    return _cond_pred(node.cond)


def _cond_pred(cond: tuple):
    from pyspark.sql import functions as F

    tag = cond[0]
    if tag in ("or", "and"):
        lp, rp = _cond_pred(cond[1]), _cond_pred(cond[2])
        return (lambda e: lp(e) | rp(e)) if tag == "or" else (lambda e: lp(e) & rp(e))
    if tag in ("arr", "bindarr"):
        # ("arr", key, inner): the element's field (or, key=None, the
        # element ITSELF — anonymous nesting `{a: [[!= "v"]]}`,
        # not.noise:136) is an array — match when ANY inner element
        # satisfies. Nested HOFs are legal in Spark SQL. "bindarr" is
        # the same MATCH with nested-bind capture (parser._bind_column).
        _, key, inner = cond
        ip = _cond_pred(inner)
        return lambda e: F.exists(e if key is None else e[key], ip)
    if tag == "obj":
        # ("obj", key, inner): nested object condition on the
        # element's field — inner keys resolve relative to it
        # ([{geometry: {type: == "Point"}}], geojson.noise:44)
        _, key, inner = cond
        ip = _cond_pred(inner)
        return lambda e: ip(e[key])
    if tag == "bbox":
        # ("bbox", key, (w, s, e, n)): geo overlap on the element (or
        # its field) — geojson.noise:81-120. Works on typed structs
        # and variants alike (JSON-rendered coordinate extraction).
        from .variant import bbox_overlap_json

        _, key, (w, s, e_, n) = cond
        return lambda e: bbox_overlap_json(e if key is None else e[key], w, s, e_, n)
    _, key, op, v = cond

    def pred(e):
        t = e if key is None else e[key]
        if op == "==":
            return t.isNull() if v is None else t == F.lit(v)
        if op == "!=":
            return t.isNotNull() if v is None else t != F.lit(v)
        if op == ">":
            return t > F.lit(v)
        if op == ">=":
            return t >= F.lit(v)
        if op == "<":
            return t < F.lit(v)
        if op == "<=":
            return t <= F.lit(v)
        raise ValueError(f"unsupported bind element operator {op!r}")

    return pred


def terms_of(node: Node) -> List[str]:
    """All positive scoring terms of a plan (deduped, sorted)."""
    out: set[str] = set()

    def walk(n: Node, positive: bool):
        if isinstance(n, Term):
            if positive:
                out.add(n.term)
        elif isinstance(n, (Or, And)):
            for c in n.children:
                walk(c, positive)
        elif isinstance(n, Not):
            walk(n.positive, positive)
        elif isinstance(n, (Phrase, Proximity)):
            if positive:
                out.update(n.terms)
        elif isinstance(n, (ExactMatch, FieldEq, FieldRange, AllDocs)):
            pass

    walk(node, True)
    return sorted(out)


def negative_terms_of(node: Node) -> List[str]:
    out: set[str] = set()

    def walk(n: Node, negated: bool):
        if isinstance(n, Term):
            if negated:
                out.add(n.term)
        elif isinstance(n, (Or, And)):
            for c in n.children:
                walk(c, negated)
        elif isinstance(n, Not):
            walk(n.positive, negated)
            walk(n.negative, not negated)
        elif isinstance(n, (Phrase, Proximity)):
            if negated:
                out.update(n.terms)

    walk(node, False)
    return sorted(out)


def parse_terms(text: str, analyzer: str = "porter") -> List[str]:
    """Analyze query text with the same pinned tokenizer as the build."""
    return [t for _, t in analyze(text, analyzer)]


def or_query(text: str, analyzer: str = "porter") -> Or:
    return Or(tuple(Term(t) for t in dict.fromkeys(parse_terms(text, analyzer))))


def and_query(text: str, analyzer: str = "porter") -> And:
    return And(tuple(Term(t) for t in dict.fromkeys(parse_terms(text, analyzer))))


def phrase_query(text: str, analyzer: str = "porter") -> Phrase:
    return Phrase(tuple(parse_terms(text, analyzer)))
