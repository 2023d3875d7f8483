"""Noise query-language parser: find / order / return / limit.

A recursive-descent parser for the reference's query surface
(``/root/reference/src/parser.rs:665-1307``) onto the plan AST
(:mod:`noise_spark.query.plan`) plus order/return/limit specs executed
as DataFrame operations. Covered grammar:

- ``find {f: ~= "w"}``            stemmed word / phrase (multi-word)
- ``find {f: ~N= "w1 w2"}``       proximity within N words
- ``find {f: == <json>}``         exact string / number / bool / null
- ``find {f: > n}`` (``<, >=, <=``) numeric ranges
- ``&&``/``,``, ``||``, ``!``, parentheses, ``^N`` boost — one shared
  precedence level, right-associative, exactly the reference's ``obool``
  (``a && b || c`` = ``a && (b || c)``, src/parser.rs:732-746); ``!`` is
  a standalone complement resolved against the sibling AND scope or the
  doc universe (a negated OR arm is legal, repl-tests/not.noise:113)
- ``find {}``                     all docs
- ``{a: {b: <cond>}}``            nested object predicate — keypath
  sugar over typed struct columns (src/parser.rs:748-765)
- ``{a: [ == v || == w ]}`` / ``{a: [{b: == v}]}``  anonymous
  array-element condition, same-element semantics for object
  conditions (src/parser.rs:1070-1080, query_basic.noise:44-97)
- ``{f: x::[== <json>]}`` + ``return x``  bind variable over an
  array-valued (possibly virtual) field (src/filters.rs:1068-1152);
  element conditions support ||/&& chains on scalars and objects
- ``{g: && [W,S,E,N]}``           geo bbox overlap over a bbox struct
  field (src/filters.rs:503-586; Z-order bucketing is the scale path,
  see :mod:`noise_spark.datapipe.geo`)
- ``params {...}`` + ``@name``    parameters (src/parser.rs:172-215)
- ``order .f [asc|desc] [default=<json>], score() [desc]`` multi-key
  sort; keypaths may be nested (``.a.b[0]``)
- ``return ._id | .a.b[0].c | .a[].b | .["quoted key"] | score()
  | {k: .f default=<json>, ...} | [.f, .g] | <json literal>``
  keypath projection (nested paths lower to getField/getItem/transform,
  src/returnable.rs:17-72) / construction
- ``return {k: group(.g) [order=asc|desc] [default=X], s: sum(.n),
  n: count(), ...}`` return-clause aggregation (src/parser.rs:248-340,
  repl-tests/group.noise): group/count/sum/avg/max/min/max_array/
  min_array/array/array_flat/concat(sep=) — all-or-none across return
  items, exclusive with ``order`` (src/query.rs:244,285)
- ``limit n``

Legality checks mirror the reference (src/query.rs:220-228,
repl-tests/not.noise:142-152): an all-negated query and a
double-nested ``!`` are parse errors with the reference's texts.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field

from . import plan as P

__all__ = ["parse_query", "run_query", "ParseError", "QuerySpec"]


class ParseError(ValueError):
    pass


ERR_ALL_NOT = (
    "query cannot be made up of only logical not. "
    "Must have at least one match clause not negated."
)
ERR_DOUBLE_NOT = (
    'Logical not ("!") is nested inside of another logical not. This is not allowed.'
)
ERR_MIXED_AGG = (
    "Return keypaths must either all have aggregate functions, "
    "or none can them."
)
ERR_AGG_ORDER = "Cannot have aggregates and ordering in the same query"

# longest-match order irrelevant here (exact word tokens)
_AGG_FNS = frozenset(
    ("group", "sum", "avg", "max", "min", "max_array", "min_array",
     "array", "array_flat", "concat", "count")
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)
  | (?P<prox>~\d+=)
  | (?P<op>~=|==|!=|>=|<=|>|<|&&|\|\||[{}\[\]():,!^@]|\.|=)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
""",
    re.VERBOSE,
)


def _tokenize(text: str) -> tuple[list[tuple[str, str]], list[int]]:
    """Token list plus each token's START offset — offsets let the
    parser reproduce the reference's whitespace-sensitive spots (e.g.
    ``return .`` vs ``return .limit``: consume_no_ws('.') +
    immediately-adjacent field, src/parser.rs:343-356)."""
    out = []
    starts = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ParseError(f"unexpected character {text[i]!r} at offset {i}")
        start = i
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
        starts.append(start)
    out.append(("eof", ""))
    starts.append(len(text))
    return out, starts


# -- return-clause spec -------------------------------------------------------


@dataclass
class RetPath:
    """A document keypath: root column + trailing segments — the
    reference's ``ReturnPath`` (src/returnable.rs:17-72): ``.a.b[0].c``,
    ``.a[].b`` (array-all projects the rest per element),
    ``.["quoted key"]``. Lowered to ``getField``/``getItem``/
    ``transform`` over the typed doc columns."""

    path: str  # root field name, or "_id"
    default: object = None
    has_default: bool = False
    rest: tuple = ()  # (("f", name) | ("i", idx) | ("*",), ...)


@dataclass
class OrderKey:
    """One ``order`` clause key (src/parser.rs:1082-1155): score() or a
    keypath, asc/desc, optional ``default=<json>`` substituted for
    missing values before comparison (src/parser.rs:1137-1143)."""

    kind: str  # "score" | "field"
    name: str
    asc: bool = True
    rest: tuple = ()
    default: object = None
    has_default: bool = False


@dataclass
class RetWholeDoc:
    """Bare ``return .`` — the whole document (src/returnable.rs:17-72;
    pinned output at repl-tests/query_basic.noise:249-252 includes every
    field plus ``_id``). DataFrame-native rendering: at the top level,
    one column per doc-store column (``doc_id`` first — our ``_id``
    surface); nested inside a constructed object/array, a struct of the
    same columns. ``default=`` parses for grammar uniformity but never
    engages (the matched document always exists)."""

    default: object = None
    has_default: bool = False


@dataclass
class RetScore:
    pass


@dataclass
class RetLiteral:
    value: object


@dataclass
class RetBind:
    """``return x`` / ``return x.v`` for a bind variable — the matched
    array elements (optionally projected through a dotted sub-path),
    always as an array (src/returnable.rs:348-402). ``default`` applies
    when the bind matched nothing: the result is ``[default]``
    (repl-tests/bind_var.noise:56-60)."""

    name: str
    path: tuple = ()
    default: object = None
    has_default: bool = False


@dataclass
class RetAgg:
    """A return-clause aggregate — the reference's AggregateFun surface
    (src/parser.rs:248-340, repl-tests/group.noise): ``group(.k
    [order=asc|desc])`` grouping keys, ``count() sum avg max min
    max_array min_array array array_flat concat(.k sep=",")`` over each
    group (no group() → one global row). ``default=`` fills missing
    values BEFORE aggregation. Aggregates exclude an ``order`` clause
    and mix with nothing else (src/query.rs:244,285 error texts)."""

    fn: str
    path: object = None  # RetPath | None (count / bind aggregates)
    order: str | None = None  # group() only: "asc" | "desc"
    sep: str = ","  # concat() only
    default: object = None
    has_default: bool = False
    # aggregate over a BIND VARIABLE's matched elements — the
    # reference's optional bind_name before the keypath
    # (src/parser.rs:286,308): ``sum(x.)`` aggregates the bound
    # elements themselves, ``sum(x.v)`` each element's ``.v``
    bind: object = None  # RetBind | None


@dataclass
class RetObject:
    items: list  # [(key, ret)]


@dataclass
class RetArray:
    items: list


@dataclass
class QuerySpec:
    node: P.Node
    orders: list = dc_field(default_factory=list)  # [OrderKey, ...]
    ret: object = None  # None = default ._id
    limit: int | None = None
    binds: dict = dc_field(default_factory=dict)  # name -> [P.Bind, ...]


class _Parser:
    def __init__(
        self,
        tokens: list[tuple[str, str]] | tuple,
        params: dict | None,
        analyzer: str,
    ):
        if isinstance(tokens, tuple):
            self.toks, self.starts = tokens
        else:  # offset-less token list (unit tests) — adjacency unknowable
            self.toks, self.starts = tokens, None
        self.i = 0
        self.params = params or {}
        self.analyzer = analyzer
        self.binds: dict[str, list] = {}  # name -> [P.Bind, ...] (same-name merge)
        self._last_param = None  # name of the most recent @param literal

    # -- token helpers --------------------------------------------------------
    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, value: str):
        kind, v = self.next()
        if v != value:
            raise ParseError(f"expected {value!r}, got {v!r}")
        return v

    def accept(self, value: str) -> bool:
        if self.peek()[1] == value:
            self.i += 1
            return True
        return False

    def _adjacent(self, j: int) -> bool:
        """True iff token ``j`` starts exactly where token ``j-1`` ends
        (no intervening whitespace) — the reference's consume_no_ws
        disambiguation for ``return .`` (whole doc) vs ``return .limit``
        (a field named "limit"), src/parser.rs:343-356."""
        if self.starts is None:
            return True
        return self.starts[j] == self.starts[j - 1] + len(self.toks[j - 1][1])

    # -- json-ish literals ----------------------------------------------------
    def literal(self):
        kind, v = self.peek()
        self._last_param = None
        if v == "@":
            # reference error texts: src/parser.rs parameter handling,
            # pinned by repl-tests/parameters.noise:269-284
            self.next()
            k2, name = self.next()
            if k2 != "word":
                raise ParseError("No parameter name after @.")
            if name not in self.params:
                raise ParseError(f"No matching parameter for @{name}.")
            self._last_param = name
            return self.params[name]
        if kind == "string":
            self.next()
            return json.loads(v)
        if kind == "number":
            self.next()
            return json.loads(v)
        if v in ("true", "false", "null"):
            self.next()
            return {"true": True, "false": False, "null": None}[v]
        if v == "{":
            # full JSON object literal ({} and {k: v, ...} — the
            # reference's default= values, query_basic.noise:205)
            self.next()
            obj = {}
            while self.peek()[1] != "}":
                kk, key = self.next()
                if kk == "string":
                    key = json.loads(key)
                elif kk != "word":
                    raise ParseError(f"expected an object key, got {key!r}")
                self.expect(":")
                obj[key] = self.literal()
                if not self.accept(","):
                    break
            self.expect("}")
            return obj
        if v == "[":
            # JSON array literal
            self.next()
            arr = []
            while self.peek()[1] != "]":
                arr.append(self.literal())
                if not self.accept(","):
                    break
            self.expect("]")
            return arr
        if v == "[":
            self.next()
            self.expect("]")
            return []
        raise ParseError(f"expected a literal, got {v!r}")

    # -- find clause ----------------------------------------------------------
    def parse(self) -> QuerySpec:
        if self.peek()[1] == "params":
            self.next()
            self.params = {**self._json_object(), **self.params}
        self.expect("find")
        node = self.object()
        # global legality checks over the whole marker tree, exactly the
        # reference's post-parse walk (src/query.rs:220-228):
        # no ! nested under !, and at least one non-negated clause
        _check_double_not(node)
        if _is_all_not(node):
            raise ParseError(ERR_ALL_NOT)
        node = _resolve(node)
        spec = QuerySpec(node=node, binds=dict(self.binds))
        if self.accept("order"):
            spec.orders = self.order_keys()
        if self.accept("return"):
            spec.ret = self.ret_expr()
        if self.accept("limit"):
            kind, v = self.next()
            if kind != "number" or not v.lstrip("-").isdigit() or int(v) <= 0:
                raise ParseError("limit must be a positive integer")
            spec.limit = int(v)
        if self.peek()[0] != "eof":
            raise ParseError(f"trailing input at {self.peek()[1]!r}")
        # aggregate legality (src/query.rs:231-288): all-or-none across
        # the return items; aggregates and an order clause are exclusive
        leaves = _ret_leaves(spec.ret)
        has_ags = any(isinstance(r, RetAgg) for r in leaves)
        if has_ags:
            if spec.orders:
                raise ParseError(ERR_AGG_ORDER)
            if not all(isinstance(r, RetAgg) for r in leaves):
                raise ParseError(ERR_MIXED_AGG)
            top = (
                [r for _, r in spec.ret.items]
                if isinstance(spec.ret, RetObject)
                else list(spec.ret.items)
                if isinstance(spec.ret, RetArray)
                else [spec.ret]
            )
            if not all(isinstance(r, RetAgg) for r in top):
                raise ParseError(
                    "aggregates must be top-level return items "
                    "(not nested inside constructed objects/arrays)"
                )
        return spec

    def _json_object(self) -> dict:
        # params {...}: a real JSON object — re-lex the balanced braces
        kind, v = self.peek()
        if v != "{":
            raise ParseError("expected '{' after params")
        depth = 0
        parts = []
        while True:
            kind, v = self.next()
            if kind == "eof":
                raise ParseError("unterminated params object")
            parts.append(v)
            if v == "{":
                depth += 1
            elif v == "}":
                depth -= 1
                if depth == 0:
                    break
            elif v == ",":
                pass
        try:
            return json.loads(" ".join(p if p != ":" else ": " for p in parts))
        except json.JSONDecodeError as e:
            raise ParseError(f"invalid params JSON: {e}") from None

    def object(self) -> P.Node:
        """``not_object`` / ``object`` with the top-level connectives —
        mirrors the reference grammar (src/parser.rs:672-714): an
        optional leading ``!``, a braced boolean, then ``&&``/``||``
        recursing on the WHOLE right side (right-associative, equal
        precedence). A non-braced operand falls through to the parens
        production (src/parser.rs:716-729): ``( <object chain> )``,
        boostable, and — exactly like the reference — WITHOUT a trailing
        connective of its own (``find ({a} || {b})`` parses;
        ``find ({a}) && {b}`` is trailing-input, as in the reference)."""
        if self.accept("!"):
            return _Negated(self.object())
        if self.accept("("):
            node = self.object()
            self.expect(")")
            return self._boost(node)
        self.expect("{")
        if self.accept("}"):
            left: P.Node = P.AllDocs()
        else:
            left = self.bool_expr()
            self.expect("}")
        left = self._boost(left)
        if self.peek()[1] == "&&":
            self.next()
            return _combine(P.And, left, self.object())
        if self.accept("||"):
            return _combine(P.Or, left, self.object())
        return left

    def bool_expr(self, prefix: str = "") -> P.Node:
        """Boolean expression inside braces. The reference's ``obool``
        (src/parser.rs:732-746) consumes ONE operator then recurses on
        the whole right side — ``&&`` and ``||`` share one precedence
        level and associate right: ``a && b || c`` = ``a && (b || c)``.
        ``prefix`` carries the enclosing keypath for nested object
        predicates (the reference's KeyBuilder push/pop,
        src/parser.rs:748-765)."""
        left = self.unary_expr(prefix)
        if self.peek()[1] in ("&&", ","):
            self.next()
            return _combine(P.And, left, self.bool_expr(prefix))
        if self.accept("||"):
            return _combine(P.Or, left, self.bool_expr(prefix))
        return left

    def unary_expr(self, prefix: str = "") -> P.Node:
        if self.accept("!"):
            # legality (double-not / all-not) is checked globally after
            # the parse, as the reference does (src/query.rs:220-228)
            return _Negated(self.unary_expr(prefix))
        if self.accept("("):
            node = self.bool_expr(prefix)
            self.expect(")")
            return self._boost(node)
        return self.clause(prefix)

    def _boost(self, node: P.Node) -> P.Node:
        if self.accept("^"):
            kind, v = self.next()
            if kind != "number":
                raise ParseError("expected a number after '^'")
            mult = float(v)
            node = _apply_boost(node, mult)
        return node

    def clause(self, prefix: str = "") -> P.Node:
        kind, fname = self.next()
        if kind == "string":
            # quoted field names carry any chars ({"$A": == true},
            # query_basic.noise:~)
            fname = json.loads(fname)
            if "." in fname or "`" in fname:
                # a literal dot must NOT be mistaken for the
                # nested-keypath lowering (F.col("a.b") walks structs) —
                # the reference escapes delimiter chars in keypaths
                # (src/key_builder.rs:385-397); Spark's native escape is
                # backtick-quoting the column-path segment
                fname = _escape_col(fname)
        elif kind != "word":
            raise ParseError(f"expected a field name, got {fname!r}")
        fname = prefix + fname
        was_id = fname == "_id"
        if was_id:
            fname = "doc_id"  # the reference's primary key ≡ our doc_id
        self.expect(":")
        k, op = self.peek()
        if op == "{":
            # nested object predicate — keypath sugar: {a: {b: <cond>}}
            # applies <cond> at keypath a.b (the reference shreds nested
            # docs to keypaths, src/parser.rs:748-765; here the keypath
            # IS the nested struct column, resolved natively by Spark)
            self.next()
            node = self.bool_expr(prefix=fname + ".")
            self.expect("}")
            return self._boost(node)
        if op == "[":
            # anonymous array-element condition {a: [ == v || == w ]} /
            # {a: [{b: == v}]} — the reference's array filter
            # (src/parser.rs:1070-1080, query_basic.noise:44-97):
            # match when ANY element satisfies, same-element semantics
            # for object conditions. Same machinery as bind variables,
            # minus the capture (no return surface). WORD matches
            # inside the brackets ({a: [~="w" && !~="v"]}, single or
            # double-nested — not.noise:50-152 / scoring.noise:145-196)
            # parse as an element-word tree instead.
            self.next()
            nk, nv = self.peek()
            if nv in ("(", "!", "~=") or nk == "prox":
                tree = self._elem_word_tree()
                self.expect("]")
                return self._boost(self._lower_elem_word(fname, tree, depth=1))
            if nv == "[":
                # {a: [[ ... ]]}: elements of NESTED arrays — word
                # trees or comparison conditions (not.noise:113-140)
                self.next()
                nk2, nv2 = self.peek()
                if nv2 in ("(", "!", "~=") or nk2 == "prox":
                    tree = self._elem_word_tree()
                    self.expect("]")
                    self.expect("]")
                    return self._boost(
                        self._lower_elem_word(fname, tree, depth=2)
                    )
                inner = self._bind_cond(fname)
                self.expect("]")
                self.expect("]")
                return self._boost(P.Bind("", fname, ("arr", None, inner)))
            cond = self._bind_cond(fname)
            self.expect("]")
            return self._boost(P.Bind("", fname, cond))
        if op == "!" and self.toks[self.i + 1][1] == "[":
            # negated array clause {a: ![<word tree>]} — complement of
            # the array condition (not.noise:63,83: a missing field
            # satisfies the negation)
            self.next()
            self.next()
            tree = self._elem_word_tree()
            self.expect("]")
            return _Negated(self._lower_elem_word(fname, tree, depth=1))
        if op == "!" and (
            self.toks[self.i + 1][1] == "~="
            or self.toks[self.i + 1][0] == "prox"
        ):
            # negated scalar word match {f: !~="w"} (not.noise:32-47)
            self.next()
            k2, op2 = self.next()
            window = int(op2[1:-1]) if k2 == "prox" else None
            return _Negated(self._word_clause(fname, self.literal(), window))
        # bind variable: field: name::[<elem condition>]
        # (src/parser.rs:1054-1068, src/filters.rs:1068-1152)
        if (
            k == "word"
            and self.toks[self.i + 1][1] == ":"
            and self.toks[self.i + 2][1] == ":"
        ):
            name = self.next()[1]
            self.expect(":")
            self.expect(":")
            self.expect("[")
            cond = self._bind_cond(fname)
            self.expect("]")
            node = P.Bind(name, fname, cond)
            # same-name binds across ||/&& arms MERGE their matched
            # elements in the return (repl-tests/bind_var.noise:40-45)
            self.binds.setdefault(name, []).append(node)
            return self._boost(node)
        if op == "~=":
            self.next()
            return self._boost(self._word_clause(fname, self.literal(), window=None))
        if k == "prox":
            self.next()
            window = int(op[1:-1])
            return self._boost(self._word_clause(fname, self.literal(), window=window))
        if op == "==":
            self.next()
            val = self.literal()
            if isinstance(val, str) and fname == "text":
                return self._boost(P.ExactMatch(val))
            if was_id and isinstance(val, str):
                # the reference's _id is the USER's string id
                # (repl-tests/query_basic.noise `{_id: =="14"}`); our
                # public string-id surface is `url` — numeric literals
                # keep addressing the internal doc_id
                return self._boost(P.FieldEq("url", val))
            return self._boost(P.FieldEq(fname, val))
        if op == "!=":
            self.next()
            val = self.literal()
            if isinstance(val, str) and fname == "text":
                return _Negated(P.ExactMatch(val))
            if was_id and isinstance(val, str):
                return _Negated(P.FieldEq("url", val))
            return _Negated(P.FieldEq(fname, val))
        if op == "&&":
            # geo bbox overlap: {g: && [W, S, E, N]} (src/parser.rs bbox,
            # src/filters.rs:503-586); field = a bbox struct column or
            # a dynamic GeoJSON geometry (variant)
            self.next()
            w_, s_, e_, n_ = self._parse_bbox()
            return self._boost(P.BboxOverlap(fname, w_, s_, e_, n_))
        if op in (">", "<", ">=", "<="):
            self.next()
            val = self.literal()
            if not isinstance(val, (int, float)) or isinstance(val, bool):
                # reference error text (src/filters.rs range lowering;
                # repl-tests/parameters.noise:273-274)
                raise ParseError(
                    "Range operator on non-number JSON types "
                    "is not yet implemented!"
                )
            if op == ">":
                return self._boost(P.FieldRange(fname, lo=val, lo_inclusive=False))
            if op == ">=":
                return self._boost(P.FieldRange(fname, lo=val))
            if op == "<":
                return self._boost(P.FieldRange(fname, hi=val, hi_inclusive=False))
            return self._boost(P.FieldRange(fname, hi=val))
        raise ParseError(f"expected a comparison operator, got {op!r}")

    def _parse_bbox(self) -> tuple:
        """``[W, S, E, N]`` after ``&&`` — reference error texts
        (geojson.noise:48-74): wrong token → character-offset error,
        wrong shape/types → the bounding-box message."""
        k, v = self.peek()
        if v != "[":
            start = self.starts[self.i] if self.starts else 0
            found = v[0] if v else "EOF"
            raise ParseError(f"Expected '[' at character {start}, found {found}.")
        coords = self.literal()
        if (
            not isinstance(coords, list)
            or len(coords) != 4
            or not all(
                isinstance(c, (int, float)) and not isinstance(c, bool)
                for c in coords
            )
        ):
            raise ParseError("Bounding box needs to be `[west, south, east, north]`.")
        return tuple(float(c) for c in coords)

    def _elem_word_tree(self) -> tuple:
        """Boolean tree of word matches inside an array condition —
        right-recursive at equal precedence like the reference's
        abool (``(~="fox" || ~="brown") && !~="quick"``)."""
        left = self._elem_word_term()
        nxt = self.peek()[1]
        if nxt in ("||", "&&"):
            self.next()
            return ("wor" if nxt == "||" else "wand", left, self._elem_word_tree())
        return left

    def _elem_word_term(self) -> tuple:
        k, v = self.peek()
        if v == "!":
            self.next()
            return ("wnot", self._elem_word_term())
        if v == "(":
            self.next()
            t = self._elem_word_tree()
            self.expect(")")
            return t
        window = None
        if k == "prox":
            self.next()
            window = int(v[1:-1]) + 1  # ~N= words-between → position diff
        elif v == "~=":
            self.next()
        else:
            raise ParseError(f"expected a word match inside [...], got {v!r}")
        val = self.literal()
        if not isinstance(val, str):
            if self._last_param:
                raise ParseError(f"Parameter @{self._last_param} must be a string.")
            raise ParseError("word match (~=) needs a string")
        from ..analysis.tokenizer import analyze

        terms = tuple(t for _, t in analyze(val, self.analyzer))
        if not terms:
            raise ParseError(f"no terms in {val!r}")
        return ("word", terms, window)

    def _lower_elem_word(self, fname: str, tree: tuple, depth: int) -> P.Node:
        """Element-word condition → plan. The depth-scoped shadow field
        (``f__text1`` / ``f__text2``, ingest.py) carries exactly the
        text the reference's arraypath-scoped word keys would hold, so
        a PURE-POSITIVE tree rewrites to plain Term/Phrase/Or/And on
        that field — index-only and scored, no verify step (exists-any
        over elements ≡ doc-level match on the flattened field).
        Trees with negation need same-element semantics →
        P.ElemWord / P.ElemWordAll (engine-verified)."""
        from ..ingest import VARIANT_TEXT_SUFFIX

        fld = f"{fname}{VARIANT_TEXT_SUFFIX}{depth}"  # f__text1 / f__text2

        def pure(t) -> bool:
            if t[0] == "word":
                return True
            if t[0] in ("wand", "wor"):
                return pure(t[1]) and pure(t[2])
            return False

        def to_plan(t) -> P.Node:
            if t[0] == "word":
                terms, window = t[1], t[2]
                if window is not None:
                    return P.Proximity(terms, window=window, field=fld)
                if len(terms) > 1:
                    return P.Phrase(terms, field=fld)
                return P.Term(terms[0], field=fld)
            l, r = to_plan(t[1]), to_plan(t[2])
            return _combine(P.Or if t[0] == "wor" else P.And, l, r)

        if pure(tree):
            if tree[0] == "word" or tree[0] == "wor":
                return to_plan(tree)
            # a pure AND still needs same-element verification (one
            # element must hold ALL terms) — fall through
        if depth == 2 and tree[0] == "wnot" and pure(tree[1]):
            # {f: [[!W]]} complements "every depth-1 array has a
            # W-matching depth-2 element" (not.noise:113-131: missing
            # fields and flat arrays all satisfy the negation)
            return _Negated(P.ElemWordAll(fname, tree[1]))
        return P.ElemWord(fname, tree, depth)

    def _bind_cond(self, fname: str | None = None) -> tuple:
        """Element condition inside bind ``[...]`` — either a bare
        comparison (scalar arrays, ``x::[== 3]``) or an object condition
        over element fields with ``||``/``&&`` combos
        (``x::[{a: == "foo" || a: == "bar"}]`` —
        repl-tests/bind_var.noise:22-37). Right-recursive at equal
        precedence, like the reference's obool (parser.rs:732-746).
        ``fname`` (the clause's array field) lets NESTED bind
        declarations register their capture root."""
        _CMP = ("==", "!=", ">", ">=", "<", "<=")
        if self.peek()[1] == "{":
            self.next()
            cond = self._bind_obj_cond(_CMP, fname)
            self.expect("}")
            # a comma-separated SEQUENCE of object conditions is a
            # same-element conjunction: [{geometry: && ...},
            # {geometry: {type: == "Point"}}] (geojson.noise:42)
            while self.accept(","):
                self.expect("{")
                right = self._bind_obj_cond(_CMP, fname)
                self.expect("}")
                cond = ("and", cond, right)
            return cond
        if self.peek()[1] == "&&":
            # anonymous geo condition [&& [W,S,E,N]] — each element IS
            # a geometry (geojson.noise:81-93)
            self.next()
            return ("bbox", None, self._parse_bbox())
        return self._bind_scalar_cond(_CMP)

    def _bind_scalar_cond(self, _CMP) -> tuple:
        eop = self.peek()[1]
        if eop not in _CMP:
            raise ParseError(
                f"expected an element comparison inside bind [...], got {eop!r}"
            )
        self.next()
        left = P.cmp(None, eop, self.literal())
        # element disjunction/conjunction on scalars: [ == "A1" || == "A2" ]
        # (the reference's abool, repl-tests/query_basic.noise:91-97)
        nxt = self.peek()[1]
        if nxt in ("||", "&&"):
            self.next()
            return ("or" if nxt == "||" else "and", left, self._bind_scalar_cond(_CMP))
        return left

    def _bind_obj_cond(self, _CMP, fname: str | None = None) -> tuple:
        k, key = self.next()
        if k == "string":
            key = json.loads(key)
        elif k != "word":
            raise ParseError(f"expected an element field name, got {key!r}")
        self.expect(":")
        if self.peek()[1] == "[":
            # nested array condition on an element field:
            # {A: [{C: [{D: == "D"}]}]}  (query_basic.noise:39)
            self.next()
            inner = self._bind_cond(fname)
            self.expect("]")
            left = ("arr", key, inner)
        elif self.peek()[1] == "&&":
            # geo condition on an element field: [{geom: && [W,S,E,N]}]
            # (geojson.noise:119, 44)
            self.next()
            left = ("bbox", key, self._parse_bbox())
        elif self.peek()[1] == "{":
            # nested object condition on an element field:
            # [{geometry: {type: == "Point"}}] — sub-field sugar
            self.next()
            inner = self._bind_obj_cond(_CMP, fname)
            self.expect("}")
            left = ("obj", key, inner)
        elif (
            self.peek()[0] == "word"
            and self.toks[self.i + 1][1] == ":"
            and self.toks[self.i + 2][1] == ":"
        ):
            # NESTED bind on an element's array field:
            # {array: [{area: second::[{geom: && ...}]}]} — the bind
            # captures the INNER matched elements (geojson.noise:127);
            # the match itself is the plain nested-array condition
            name = self.next()[1]
            self.expect(":")
            self.expect(":")
            self.expect("[")
            inner = self._bind_cond(fname)
            self.expect("]")
            left = ("arr", key, inner)
            if fname is not None:
                node = P.Bind(name, fname, ("bindarr", key, inner))
                self.binds.setdefault(name, []).append(node)
        else:
            eop = self.peek()[1]
            if eop not in _CMP:
                raise ParseError(
                    f"expected an element comparison after {key!r}:, got {eop!r}"
                )
            self.next()
            left = P.cmp(key, eop, self.literal())
        nxt = self.peek()[1]
        if nxt in ("||", "&&", ","):
            self.next()
            op = "or" if nxt == "||" else "and"  # ',' ≡ '&&' (same element)
            return (op, left, self._bind_obj_cond(_CMP))
        return left

    def _word_clause(self, fname: str, val, window: int | None) -> P.Node:
        if not isinstance(val, str):
            # reference: a non-string parameter in a word match names
            # the parameter (parameters.noise:277-278)
            if getattr(self, "_last_param", None):
                raise ParseError(f"Parameter @{self._last_param} must be a string.")
            raise ParseError("word match (~=) needs a string")
        from ..analysis.tokenizer import analyze

        terms = tuple(t for _, t in analyze(val, self.analyzer))
        if not terms:
            raise ParseError(f"no terms in {val!r}")
        fld = None if fname == "text" else fname
        if window is not None:
            # the reference's ~N= counts words BETWEEN the matched
            # terms: positions may differ by up to N+1
            # (src/filters.rs:618-620 "distance is number of words
            # between searched words. add one"; pinned by
            # repl-tests/query_basic.noise ~1= "multi sentence" → doc 3,
            # where the terms sit 2 positions apart). The engine's
            # Proximity.window is the max POSITION difference, so the
            # language surface translates N → N+1 here.
            return P.Proximity(terms, window=window + 1, field=fld)
        if len(terms) == 1:
            return P.Term(terms[0], field=fld)
        return P.Phrase(terms, field=fld)

    # -- order / return --------------------------------------------------------
    def _path_segments(self) -> tuple:
        """Trailing keypath segments after the root: ``.field``,
        ``[int]``, ``[]`` (array-all) — the reference's consume_keypath
        loop (src/parser.rs:363-386)."""
        segs = []
        while True:
            if self.peek()[1] == "." and self.toks[self.i + 1][0] == "word":
                self.next()
                segs.append(("f", self.next()[1]))
            elif self.peek()[1] == "[":
                nxt_kind, nxt = self.toks[self.i + 1]
                if nxt == "]":
                    self.next(); self.next()
                    segs.append(("*",))
                elif nxt_kind == "number":
                    self.next()
                    idx = json.loads(self.next()[1])
                    if not isinstance(idx, int) or idx < 0:
                        raise ParseError("Expected array index integer or *.")
                    self.expect("]")
                    segs.append(("i", idx))
                elif nxt_kind == "string":
                    # quoted object key mid-path: .a["k"] — legal at any
                    # segment in the reference grammar (src/parser.rs:
                    # 344-347 root, same bracket form mid-path)
                    self.next()
                    segs.append(("f", json.loads(self.next()[1])))
                    self.expect("]")
                else:
                    return tuple(segs)  # a constructed array follows
            else:
                return tuple(segs)

    def _path_root(self) -> str | None:
        """Root of a keypath, assuming '.' was just consumed: a word, a
        ``["quoted key"]``, or None (bare '.' = whole doc)."""
        k2, v2 = self.peek()
        if k2 == "word":
            return self.next()[1]
        if v2 == "[" and self.toks[self.i + 1][0] == "string":
            self.next()
            root = json.loads(self.next()[1])
            self.expect("]")
            return root
        return None

    def order_keys(self) -> list:
        keys = []
        while True:
            kind, v = self.peek()
            if v == "score":
                self.next()
                self.expect("(")
                self.expect(")")
                asc = True
                if self.peek()[1] in ("asc", "desc"):
                    asc = self.next()[1] == "asc"
                keys.append(OrderKey("score", "score", asc))
            elif v == ".":
                self.next()
                name = self._path_root()
                if name is None:
                    raise ParseError("expected a field name after '.'")
                rest = self._path_segments()
                # asc/desc may appear before OR after default= — the
                # later one wins (src/parser.rs:1090-1106)
                asc = True
                if self.peek()[1] in ("asc", "desc"):
                    asc = self.next()[1] == "asc"
                dv, has_dv = None, False
                if self.accept("default"):
                    self.expect("=")
                    dv, has_dv = self.literal(), True
                if self.peek()[1] in ("asc", "desc"):
                    asc = self.next()[1] == "asc"
                keys.append(OrderKey("field", name, asc, rest, dv, has_dv))
            else:
                raise ParseError(f"expected an order key, got {v!r}")
            if not self.accept(","):
                return keys

    def _ret_aggregate(self, fn: str):
        self.next()  # fn word
        self.expect("(")
        if fn == "count":
            self.expect(")")
            agg = RetAgg("count")
        else:
            bind = None
            if (
                self.peek()[0] == "word"
                and self.peek()[1] in self.binds
                and self.toks[self.i + 1][1] == "."
            ):
                # aggregate over a bind variable's matched elements —
                # the reference's bind_name + keypath grammar
                # (src/parser.rs:286,308): sum(x.) / sum(x.v.w)
                bname = self.next()[1]
                self.next()  # "."
                subpath: list = []
                # first sub-path segment must be ADJACENT to the dot
                # (consume_no_ws rule): `concat(x. sep="|")` is a bare
                # bind + sep kwarg, `concat(x.sep)` a field named sep
                while self.peek()[0] == "word" and self._adjacent(self.i):
                    subpath.append(self.next()[1])
                    if self.peek()[1] == "." and self.toks[self.i + 1][0] == "word":
                        self.next()
                    else:
                        break
                bind = RetBind(bname, tuple(subpath))
            if bind is None and self.peek()[1] != ".":
                raise ParseError(
                    f"Expected keypath or bind variable in {fn}(...)"
                )
            if bind is not None:
                path = None
            else:
                self.next()
                root = self._path_root()
                if root is None:
                    raise ParseError(f"expected a keypath in {fn}(...)")
                path = RetPath(root, rest=self._path_segments())
            order = "asc" if fn == "group" else None
            sep = ","
            if fn == "group" and self.accept("order"):
                self.expect("=")
                d = self.next()[1]
                if d not in ("asc", "desc"):
                    raise ParseError("Expected asc or desc")
                order = d
            if fn == "concat" and self.accept("sep"):
                self.expect("=")
                k2, v2 = self.next()
                if k2 != "string":
                    raise ParseError("concat sep= needs a string")
                sep = json.loads(v2)
            self.expect(")")
            agg = RetAgg(fn, path, order, sep, bind=bind)
        if self.accept("default"):
            if fn == "count":
                raise ParseError("count() takes no default= (it has no input)")
            self.expect("=")
            agg.default = self.literal()
            agg.has_default = True
        return agg

    def ret_expr(self):
        kind, v = self.peek()
        if v == ".":
            self.next()
            # a path root must be ADJACENT to the '.' — `return .limit`
            # is a field named limit, `return . limit 5` is the whole
            # doc then a limit clause (reference consume_no_ws rule)
            name = self._path_root() if self._adjacent(self.i) else None
            if name is not None:
                ret = RetPath(name, rest=self._path_segments())
            else:
                ret = RetWholeDoc()  # bare `.` → the whole document
            if self.accept("default"):
                # reference syntax: default=<json> (src/parser.rs:235-246)
                self.expect("=")
                ret.default = self.literal()
                ret.has_default = True
            return ret
        if v == "_id":
            self.next()
            return RetPath("_id")
        if v == "score":
            self.next()
            self.expect("(")
            self.expect(")")
            return RetScore()
        if (
            kind == "word"
            and v in _AGG_FNS
            and self.toks[self.i + 1][1] == "("
        ):
            return self._ret_aggregate(v)
        if kind == "word" and v in self.binds:
            self.next()
            path = []
            while self.peek()[1] == "." and self.toks[self.i + 1][0] == "word":
                self.next()
                path.append(self.next()[1])
            ret = RetBind(v, tuple(path))
            if self.accept("default"):
                self.expect("=")
                ret.default = self.literal()
                ret.has_default = True
            return ret
        if v == "{":
            nxt = self.toks[self.i + 1][1]
            if nxt == "}":
                self.next(); self.next()
                return RetLiteral({})
            self.next()
            items = []
            while True:
                k2, key = self.next()
                if k2 != "word" and k2 != "string":
                    raise ParseError(f"expected a return key, got {key!r}")
                if k2 == "string":
                    key = json.loads(key)
                self.expect(":")
                items.append((key, self.ret_expr()))
                if not self.accept(","):
                    break
            self.expect("}")
            return RetObject(items)
        if v == "[":
            if self.toks[self.i + 1][1] == "]":
                self.next(); self.next()
                return RetLiteral([])
            self.next()
            items = [self.ret_expr()]
            while self.accept(","):
                items.append(self.ret_expr())
            self.expect("]")
            return RetArray(items)
        return RetLiteral(self.literal())


@dataclass(frozen=True)
class _Negated(P.Node):
    """Parser-internal marker for a negated subtree — the reference's
    standalone complement NotFilter (src/filters.rs:944-1066). Resolved
    by :func:`_resolve` into binary ``P.Not``: against the sibling AND
    scope when one exists (the efficient plan), else against the doc
    universe (``P.Not(AllDocs, inner)`` — e.g. a negated OR arm, legal
    per repl-tests/not.noise:113)."""

    inner: P.Node


def _combine(cls, left: P.Node, right: P.Node) -> P.Node:
    """Build And/Or, flattening same-class children (associativity) so
    chains like ``a && b && c`` stay one flat node — which is what the
    engine's one-scan intersection / WAND planner key off. Boosted
    subtrees are NOT flattened (the boost scopes the subtree)."""
    parts: list = []
    for p in (left, right):
        if isinstance(p, cls) and p.boost == 1.0:
            parts.extend(p.children)
        else:
            parts.append(p)
    return cls(tuple(parts))


def _check_double_not(node: P.Node, under_not: bool = False):
    """No ``!`` anywhere beneath another ``!`` — the reference's
    ``check_double_not`` walk (src/filters.rs:1051-1060)."""
    if isinstance(node, _Negated):
        if under_not:
            raise ParseError(ERR_DOUBLE_NOT)
        _check_double_not(node.inner, True)
    elif isinstance(node, (P.And, P.Or)):
        for c in node.children:
            _check_double_not(c, under_not)


def _is_all_not(node: P.Node) -> bool:
    """True iff every leaf clause is negated — the reference's
    ``is_all_not`` (src/filters.rs:1063-1065 and the And/Or folds)."""
    if isinstance(node, _Negated):
        return True
    if isinstance(node, (P.And, P.Or)):
        return all(_is_all_not(c) for c in node.children)
    return False


def _resolve(node: P.Node) -> P.Node:
    """Replace ``_Negated`` markers with executable ``P.Not`` nodes."""
    from dataclasses import replace

    if isinstance(node, _Negated):
        return P.Not(P.AllDocs(), _resolve(node.inner))
    if isinstance(node, P.And):
        pos = [_resolve(c) for c in node.children if not isinstance(c, _Negated)]
        neg = [_resolve(c.inner) for c in node.children if isinstance(c, _Negated)]
        if not pos:
            # all-negated conjunction under a positive sibling (e.g. the
            # right side of an OR): !a && !b ≡ !(a || b)  (De Morgan)
            inner = neg[0] if len(neg) == 1 else P.Or(tuple(neg))
            return P.Not(P.AllDocs(), inner)
        if len(pos) == 1:
            out = pos[0] if node.boost == 1.0 else _apply_boost(pos[0], node.boost)
        else:
            out = replace(node, children=tuple(pos))
        for n in neg:
            out = P.Not(out, n)
        return out
    if isinstance(node, P.Or):
        return replace(node, children=tuple(_resolve(c) for c in node.children))
    return node


def _apply_boost(node: P.Node, mult: float) -> P.Node:
    from dataclasses import replace

    if isinstance(node, (P.Term, P.Or, P.And, P.Phrase, P.Proximity)):
        return replace(node, boost=node.boost * mult)
    if isinstance(node, _Negated):
        return _Negated(_apply_boost(node.inner, mult))
    if isinstance(node, P.Not):
        return replace(node, positive=_apply_boost(node.positive, mult))
    return node  # binary-scored predicates ignore boost (score 1.0)


def parse_query(text: str, params: dict | None = None, analyzer: str = "porter") -> QuerySpec:
    """Parse a Noise-style query string into a :class:`QuerySpec`."""
    return _Parser(_tokenize(text), params, analyzer).parse()


# -- execution ----------------------------------------------------------------


def _escape_col(name: str) -> str:
    """Backtick-escape a LITERAL column name for F.col/select — so a
    doc column literally named ``a.b`` resolves by name instead of as a
    struct walk (mirrors build._raw_col on the write side)."""
    if name.startswith("`") and name.endswith("`"):
        return name  # already escaped (quoted find-clause field)
    return "`" + name.replace("`", "``") + "`"


def _unescape_col(name: str) -> str:
    """Inverse of the find-clause quoting: ``` `a.b` ``` → ``a.b`` —
    the RAW name as it appears in ``docs.columns`` (for membership
    checks)."""
    if name.startswith("`") and name.endswith("`"):
        return name[1:-1].replace("``", "`")
    return name


def _apply_path(col, segs, F):
    """Lower keypath segments over a typed column: object key →
    ``getField``/``getItem``, array index → ``getItem``, array-all →
    the rest of the path mapped per element with ``transform``
    (src/returnable.rs:17-72 / snapshot.rs fetch walk)."""
    for i, s in enumerate(segs):
        if s[0] == "*":
            rest = segs[i + 1 :]
            if not rest:
                return col
            # elements where the remaining path is ABSENT drop out (the
            # reference skips missing keypaths per element rather than
            # emitting nulls — query_basic.noise:269 `.a[].b[].c` over
            # partially-present c yields [[2],[4,5,6]])
            return F.filter(F.transform(col, _path_elem_fn(rest, F)), _notnull)
        if s[0] == "i":
            # F.get, not getItem: an out-of-bounds index is NULL (the
            # reference's missing-path semantics), never an ANSI error
            col = F.get(col, F.lit(s[1]))
        else:
            col = col[s[1]]
    return col


def _path_elem_fn(rest, F):
    # unary on purpose: pyspark HOF lambdas dispatch on arity
    return lambda e: _apply_path(e, rest, F)


def _nested_cap(key, ip, F):
    # UNARY lambda factories — pyspark HOF dispatch is arity-based
    def f(o):
        return F.filter(o if key is None else o[key], ip)

    return f


def _nested_cap_v(key, ip, V, F):
    from .variant import v_seg

    def f(o):
        t = o if key is None else F.try_variant_get(o, f"${v_seg(key)}", "variant")
        return F.filter(V.v_elements(t), ip)

    return f


def _bind_column(ret, F, binds: dict, variant_cols: frozenset = frozenset()):
    """The matched elements of a bind variable, always an array
    (src/returnable.rs:348-402); same-name binds merge: OR the element
    predicates per field, concatenate across fields
    (repl-tests/bind_var.noise:40-45). A dotted sub-path projects each
    matched element. Shared by ``return x`` and bind aggregates.
    VARIANT fields (schemaless ingest) filter their JSON-array elements
    through the variant condition lowering instead."""
    from . import variant as V

    by_field: dict[str, list] = {}
    for b in binds[ret.name]:
        by_field.setdefault(b.field, []).append(b.cond)
    # NB: higher-order-function lambdas must be UNARY — pyspark
    # dispatches on arity (a second param means (element, index)),
    # so no default-arg closure tricks here
    def _or_preds(preds):
        def pred(e):
            out = preds[0](e)
            for p in preds[1:]:
                out = out | p(e)
            return out

        return pred

    def _get(seg):
        return lambda e: e[seg]

    def _vget(seg):
        return lambda e: F.try_variant_get(e, f"${V.v_seg(seg)}", "variant")

    arrs = []
    is_v = []
    for fld, conds in by_field.items():
        isv = _unescape_col(fld) in variant_cols
        nested = [c for c in conds if c[0] == "bindarr"]
        plain = [c for c in conds if c[0] != "bindarr"]
        if isv:
            col0 = F.col(_escape_col(fld))
            if plain:
                arrs.append(
                    F.coalesce(
                        F.filter(
                            V.v_elements(col0),
                            _or_preds([V.v_cond_pred(c) for c in plain]),
                        ),
                        F.expr("cast(array() as array<variant>)"),
                    )
                )
                is_v.append(True)
            for _, key, inner in nested:
                # nested bind: capture the INNER matched elements of
                # each outer element's `key` array (geojson.noise:127)
                arrs.append(
                    F.coalesce(
                        F.flatten(
                            F.filter(
                                F.transform(
                                    V.v_elements(col0),
                                    _nested_cap_v(key, V.v_cond_pred(inner), V, F),
                                ),
                                _notnull,
                            )
                        ),
                        F.expr("cast(array() as array<variant>)"),
                    )
                )
                is_v.append(True)
        else:
            if plain:
                arrs.append(
                    F.filter(
                        F.col(fld), _or_preds([P._cond_pred(c) for c in plain])
                    )
                )
                is_v.append(False)
            for _, key, inner in nested:
                arrs.append(
                    F.flatten(
                        F.filter(
                            F.transform(
                                F.col(fld),
                                _nested_cap(key, P._cond_pred(inner), F),
                            ),
                            _notnull,
                        )
                    )
                )
                is_v.append(False)
    col = arrs[0] if len(arrs) == 1 else F.concat(*arrs)
    variant_elems = any(is_v)
    for seg in ret.path:  # x.v → project each matched element
        col = F.transform(col, _vget(seg) if variant_elems else _get(seg))
    return col


def _default_lit(F, v):
    """A default= value as a Column: scalars are plain literals,
    objects/arrays become variant (parse_json) — F.lit can't encode
    them, and variant renders back as the JSON value."""
    if isinstance(v, (dict, list)):
        return F.parse_json(F.lit(json.dumps(v)))
    return F.lit(v)


def _ret_column(
    ret,
    F,
    available: set,
    binds: dict | None = None,
    doc_cols: tuple = (),
    variant_cols: frozenset = frozenset(),
    id_col: str = "doc_id",
):
    binds = binds or {}
    if isinstance(ret, RetWholeDoc):
        # nested whole-doc (`return {d: .}`): a struct of the doc-store
        # columns, `_id` (doc_id) first — the reference reassembles the
        # full document as a JSON value (src/returnable.rs:17-72)
        return F.struct(
            F.col("doc_id"),
            *[F.col(_escape_col(c)).alias(c) for c in doc_cols if c != "doc_id"],
        )
    if isinstance(ret, RetPath):
        name = id_col if ret.path == "_id" else ret.path
        if name not in available:
            # an unknown keypath renders as its default, else null —
            # never an error (the reference fills `default` / null for
            # absent keypaths: returnable.rs:298, query_basic.noise:197)
            return _default_lit(F, ret.default if ret.has_default else None)
        # root is a LITERAL column name (possibly containing dots via
        # `.["a.b"]` quoting); nesting goes through `rest` segments
        if _unescape_col(name) in variant_cols:
            from .variant import v_path

            col = v_path(F.col(_escape_col(name)), ret.rest)
            if ret.has_default:
                # a variant default must stay variant: parse the JSON
                # rendering of the literal (null-vs-missing faithful)
                col = F.coalesce(
                    col, F.parse_json(F.lit(json.dumps(ret.default)))
                )
            return col
        col = _apply_path(F.col(_escape_col(name)), ret.rest, F)
        if ret.has_default:
            col = F.coalesce(col, _default_lit(F, ret.default))
        return col
    if isinstance(ret, RetScore):
        return F.col("score")
    if isinstance(ret, RetBind):
        col = _bind_column(ret, F, binds, variant_cols)
        if ret.has_default:
            col = F.when(F.size(col) > 0, col).otherwise(
                F.array(F.lit(ret.default))
            )
        return col
    if isinstance(ret, RetLiteral):
        if ret.value == {} or ret.value == []:
            return F.struct() if ret.value == {} else F.array()
        return F.lit(ret.value)
    if isinstance(ret, RetObject):
        return F.struct(
            *[
                _ret_column(
                    r, F, available, binds, doc_cols, variant_cols, id_col
                ).alias(k)
                for k, r in ret.items
            ]
        )
    if isinstance(ret, RetArray):
        # constructed arrays may mix types ([.lang, score()]); the
        # reference renders results as JSON text, so string-render the
        # elements rather than let Spark coerce to one numeric type
        return F.array(
            *[
                _ret_column(
                    r, F, available, binds, doc_cols, variant_cols, id_col
                ).cast(
                    "string"
                )
                for r in ret.items
            ]
        )
    raise TypeError(type(ret))


def run_query(reader, text: str, params: dict | None = None, default_k: int = 10):
    """Parse and execute a query against an :class:`IndexReader`,
    returning a DataFrame shaped by the return clause.

    Scoring engages when the query orders by or returns ``score()``
    (top-k through the WAND/exhaustive planner); otherwise the match
    set is binary and ordered by the order clause (default: doc_id,
    the reference's seq order)."""
    from pyspark.sql import functions as F

    from ..ingest import FULLDOC_COL, VARIANT_TEXT_SUFFIX

    spec = parse_query(text, params, analyzer=getattr(reader, "analyzer", "porter"))
    if any(isinstance(r, RetAgg) for r in _ret_leaves(spec.ret)):
        return _run_aggregate_query(reader, spec, F)
    wants_score = any(o.kind == "score" for o in spec.orders) or _ret_uses_score(spec.ret)
    limit = spec.limit or default_k  # default_k=None → no implicit top-k

    if wants_score:
        # the engine's top-k is score-DESCENDING; fetching only k rows is
        # correct only when the primary order is score desc (or there is
        # no order clause, whose default below is score desc). The
        # reference defaults `order score()` to ASC (src/parser.rs:1124-
        # 1130) — any other order needs every match scored: take the
        # UNORDERED scored match set so the order clause below plans ONE
        # small TakeOrdered on it (a huge-k query() here would plan a
        # full descending sort barrier first, then re-sort).
        if limit is not None and _score_primary_desc(spec):
            base = reader.query(spec.node, k=limit)
        else:
            base = reader.scored_matches(spec.node)
    else:
        base = reader._match_set(spec.node).withColumn("score", F.lit(1.0))

    order_fields = {o.name for o in spec.orders if o.kind == "field"}
    ret_fields: set = set()
    _collect_ret_fields(spec.ret, ret_fields, spec.binds)
    docs = reader.docs_view() if hasattr(reader, "docs_view") else reader.docs
    # schemaless-ingested indexes (ingest.py: the `_doc` variant column
    # is present) surface the reference's STRING `_id` — which is our
    # `url` column; typed webtext indexes keep the numeric doc_id
    doc_col_names = docs.columns if hasattr(docs, "columns") else ()
    id_col = "url" if FULLDOC_COL in doc_col_names else "doc_id"
    # bare `return .` = the whole STORED document: every reader.docs
    # column (not docs_view — virtual fields are derived, not part of
    # the doc the user added)
    wholedoc_cols: tuple = ()
    if _ret_has_wholedoc(spec.ret):
        wd = reader.docs if hasattr(reader, "docs") else docs
        # a schemaless index's `<f>__text*` shadows are INDEX inputs
        # derived from the variant field (ingest.py) — not part of the
        # document the user added, so `return .` must not render them
        shadows = {
            f"{n}{VARIANT_TEXT_SUFFIX}{d}"
            for n, dt in wd.dtypes
            if dt == "variant" and n != FULLDOC_COL
            for d in ("", "1", "2")
        }
        wholedoc_cols = tuple(c for c in wd.columns if c not in shadows)
        ret_fields |= set(wholedoc_cols)
    # default ordering surface: FILTERED finds iterate the reference's
    # seq (insertion) order — our doc_id — but the all-docs scan
    # (find {}) walks the primary-key space, i.e. STRING id order
    # (query_basic.noise:294-311 lists "1","10","11",…,"2" while
    # ranges.noise:57 lists filtered matches in insertion order)
    seq_col = (
        "url" if id_col == "url" and isinstance(spec.node, P.AllDocs) else "doc_id"
    )
    if id_col == "url":
        ret_fields.add("url")  # the string-id surface (`._id`, ret-None)
    need_fields = (order_fields | ret_fields) - {"doc_id"}  # always present
    order_fields = order_fields - {"doc_id"}
    docs_cols = set(docs.columns) if need_fields else set()
    join_cols = sorted(f for f in need_fields if f in docs_cols and f != "doc_id")
    missing = need_fields - set(join_cols)
    # Join placement: fields the SORT needs (order keys + the seq
    # tie-break) must ride the top-k; RETURN-only fields join AFTER the
    # limit, so only k rows fetch their payload — at scale the sort
    # compares (doc_id, score, keys), never whole documents (the
    # reference fetches return values per EMITTED row the same way,
    # src/returnable.rs fetch after the ordered buffer pops). Without a
    # limit there is nothing to defer behind — join everything up front.
    eff_limit = (
        spec.limit
        if spec.limit is not None
        else (default_k if wants_score and default_k is not None else None)
    )
    pre_need = set(order_fields)
    if seq_col != "doc_id":
        pre_need.add(seq_col)
    join_pre = (
        sorted(f for f in pre_need if f in docs_cols and f != "doc_id")
        if eff_limit is not None
        else join_cols
    )
    join_post = [f for f in join_cols if f not in join_pre]
    # unknown keypaths are never errors: a missing ORDER key compares
    # as null / its default=, a missing RETURN path renders as null /
    # its default= (returnable.rs:298; collation.noise:136 orders an
    # empty match set by fields that exist nowhere)
    if join_pre:
        # select by LITERAL name (a doc column may contain dots)
        base = base.join(
            docs.select(
                "doc_id", *[F.col(_escape_col(c)).alias(c) for c in join_pre]
            ),
            "doc_id",
            "left",
        )

    variant_cols = frozenset(n for n, dt in docs.dtypes if dt == "variant")
    order_cols = []
    for o in spec.orders:
        if o.kind == "score":
            col = F.col("score")
        elif o.name in missing:
            # unknown order keypath: every row compares equal (its
            # default= when given, else null)
            col = _default_lit(F, o.default if o.has_default else None)
        elif o.name in variant_cols:
            # cross-type collation over a schemaless (variant) order
            # key: the order-preserving byte encoding of the JSON value
            # (query/collation.py — null < bool < number < string <
            # array < object, the reference's json_value.rs order)
            from .variant import v_order_key, v_path

            vcol = v_path(F.col(_escape_col(o.name)), o.rest)
            if o.has_default:
                vcol = F.coalesce(
                    vcol, F.parse_json(F.lit(json.dumps(o.default)))
                )
            col = v_order_key(vcol)
        else:
            col = _apply_path(F.col(_escape_col(o.name)), o.rest, F)
            if o.has_default:
                # missing values compare as the stand-in, not as nulls
                # (src/parser.rs:1137-1143, repl-tests/collation.noise)
                col = F.coalesce(col, F.lit(o.default))
        order_cols.append(col.asc() if o.asc else col.desc())
    if not order_cols:
        # the REFERENCE never orders implicitly — even `return score()`
        # without an order clause lists seq order (geojson.noise:142).
        # The engine's own convenience surface (default_k set) keeps
        # score-descending top-k as the unordered-scored default.
        order_cols = (
            [F.desc("score"), F.asc(seq_col)]
            if wants_score and default_k is not None
            else [F.asc(seq_col)]
        )
    elif wants_score and seq_col == "url":
        # score-ordered ties on the all-docs scan break by the id
        # string DESCENDING: the reference's stable sort + back-popped
        # buffer emits equal-score rows in reverse id order
        # (query_basic.noise:314 `order score()` lists "9","8",…)
        order_cols.append(F.desc(seq_col))
    else:
        order_cols.append(F.asc(seq_col))  # deterministic tie-break
    out = base.orderBy(*order_cols)
    if eff_limit is not None:
        out = out.limit(eff_limit)
    if join_post:
        # deferred payload fetch for the k emitted rows only. INNER
        # join with the k rows BROADCAST: a left-outer with the tiny
        # side preserved cannot broadcast (the outer side must stream),
        # and would shuffle the whole doc store for a k-row fetch.
        # Inner is equivalent here — every emitted doc_id exists in the
        # doc store by construction (match sets root in the same
        # visible generations minus the same tombstones). Re-apply the
        # ordering (trivial at k rows) since a join drops it.
        out = (
            docs.select(
                "doc_id", *[F.col(_escape_col(c)).alias(c) for c in join_post]
            )
            .join(F.broadcast(out), "doc_id", "inner")
            .orderBy(*order_cols)
        )

    available = set(out.columns) | {"doc_id"}
    if spec.ret is None:
        return out.select(id_col)
    if isinstance(spec.ret, RetWholeDoc):
        # top-level `return .` → one column per doc-store column,
        # doc_id (our `_id`) first — the whole document, column-shaped
        return out.select(
            "doc_id",
            *[
                F.col(_escape_col(c)).alias(c)
                for c in wholedoc_cols
                if c != "doc_id"
            ],
        )
    if isinstance(spec.ret, RetObject):
        # a top-level constructed object maps to one COLUMN per key —
        # the DataFrame-native rendering of the reference's JSON object
        # rows (src/returnable.rs:119-160); nested objects stay structs
        return out.select(
            *[
                _ret_column(
                    r, F, available, spec.binds, wholedoc_cols, variant_cols, id_col
                ).alias(k)
                for k, r in spec.ret.items
            ]
        )
    return out.select(
        _ret_column(
            spec.ret, F, available, spec.binds, wholedoc_cols, variant_cols, id_col
        ).alias("result")
    )


def _notnull(x):
    return x.isNotNull()


def _to_str(x):
    return x.cast("string")


def _coalesce_fn(F, default):
    # unary on purpose: pyspark HOF lambdas dispatch on arity
    return lambda e: F.coalesce(e, F.lit(default))


def _variant_agg(a: "RetAgg", v, F, ordered_collect):
    """One aggregate over a VARIANT value column — JSON semantics
    (src/aggregates.rs): sum/avg deep-flatten nested number arrays,
    min/max compare whole values in collation order, min_array /
    max_array take the collation extreme over deep-flattened elements
    (an input with NO elements leaves the reference's init value, the
    empty array — group.noise:254-260), array/array_flat/concat
    collect (reverse doc order when ungrouped, via ordered_collect).
    The per-doc projection is an Arrow-batched pandas_udf over the
    JSON text; the cross-doc reduction stays a JVM aggregate
    (sum / min_by / max_by on binary collation keys)."""
    from .collation import collation_key
    from .variant import vjson_extreme_elem, vjson_flat_elems, vjson_flat_numbers

    js = F.to_json(v)
    if a.fn in ("sum", "avg"):
        nums = vjson_flat_numbers()(js)
        tot = F.sum(F.aggregate(nums, F.lit(0.0), lambda acc, x: acc + x))
        if a.fn == "sum":
            return F.coalesce(tot, F.lit(0.0))
        n = F.sum(F.size(nums))
        return F.when(n > 0, tot / n)
    if a.fn in ("min", "max"):
        # null (missing) values never win: they sort below/above
        # everything via sentinel keys, and an all-null group yields null
        key = F.when(js.isNotNull(), collation_key(js)).otherwise(
            F.lit(bytes([0])) if a.fn == "max" else F.lit(bytes([255]))
        )
        pick = F.max_by(js, key) if a.fn == "max" else F.min_by(js, key)
        return F.parse_json(pick)
    if a.fn in ("min_array", "max_array"):
        maximize = a.fn == "max_array"
        elem = vjson_extreme_elem(maximize)(js)
        key = F.when(elem.isNotNull(), collation_key(elem)).otherwise(
            F.lit(bytes([0])) if maximize else F.lit(bytes([255]))
        )
        pick = F.max_by(elem, key) if maximize else F.min_by(elem, key)
        return F.parse_json(F.coalesce(pick, F.lit("[]")))
    if a.fn == "array":
        coll = F.filter(ordered_collect(js), _notnull)
        return F.transform(coll, lambda e: F.parse_json(e))
    if a.fn == "array_flat":
        coll = F.flatten(F.filter(ordered_collect(vjson_flat_elems()(js)), _notnull))
        return F.transform(coll, lambda e: F.parse_json(e))
    if a.fn == "concat":
        coll = F.flatten(F.filter(ordered_collect(vjson_flat_elems()(js)), _notnull))
        return F.array_join(
            F.transform(coll, lambda e: F.parse_json(e).cast("string")), a.sep
        )
    raise ParseError(f"unknown aggregate {a.fn!r}")  # pragma: no cover


def _run_aggregate_query(reader, spec: QuerySpec, F):
    """Lower a return-clause aggregation (repl-tests/group.noise) to ONE
    groupBy over the match set joined to the doc store: group() paths
    become grouping expressions, everything else a per-group aggregate;
    no group() → a single global row. Result rows order by the group
    keys in their declared directions (the reference's GroupAsc /
    GroupDesc); ``limit`` applies to the grouped rows. Collected
    aggregates (array / array_flat / concat) order elements by doc_id
    for determinism — DESCENDING when there is no group clause: the
    reference's ungrouped aggregates consume the match buffer by
    popping from its back (src/query.rs do_ordering_and_ags), i.e.
    reverse seq order, pinned by group.noise:187 (``array(.baz)``
    lists the later doc first). VARIANT inputs (schemaless ingest)
    aggregate with JSON semantics: sum/avg over deeply-flattened
    numbers, min/max/min_array/max_array by collation order, group()
    by collation key (query/variant.py helpers)."""
    from pyspark.sql import types as T

    leaves = _ret_leaves(spec.ret)
    named = (
        [(k, r) for k, r in spec.ret.items]
        if isinstance(spec.ret, RetObject)
        else [(f"_c{i}", r) for i, r in enumerate(leaves)]
    )

    docs = reader.docs_view() if hasattr(reader, "docs_view") else reader.docs
    doc_cols = set(docs.columns)
    roots = set()
    for _, a in named:
        if a.bind is not None:
            # bind aggregates read the bind's array field(s) — RAW
            # names for membership (find-clause quoting escapes dots)
            roots |= {
                _unescape_col(b.field)
                for b in spec.binds[a.bind.name]
                if _unescape_col(b.field) in doc_cols
            }
        elif a.path is not None and a.path.path != "_id":
            # unknown keypaths aggregate their default= (else nulls) —
            # never an error (returnable.rs:298)
            if a.path.path in doc_cols:
                roots.add(a.path.path)
    base = reader._match_set(spec.node)
    joined = base.join(
        docs.select(
            "doc_id", *[F.col(_escape_col(c)).alias(c) for c in sorted(roots)]
        ),
        "doc_id",
        "left",
    )

    variant_cols = frozenset(n for n, dt in docs.dtypes if dt == "variant")

    def value_expr(a: RetAgg):
        if a.bind is not None:
            # the bind's matched elements (an array per doc); the
            # flatten-aware aggregate machinery below reduces it
            col = _bind_column(a.bind, F, spec.binds, variant_cols)
            if a.has_default:
                # default= fills missing values BEFORE aggregation —
                # for a bind that means per ELEMENT (a sub-path absent
                # on some matched elements), not per doc
                col = F.transform(col, _coalesce_fn(F, a.default))
            return col
        if a.path is None or a.path.path == "_id":
            col = F.col("doc_id")
        elif a.path.path not in doc_cols:
            return _default_lit(F, a.default if a.has_default else None)
        elif a.path.path in variant_cols:
            from .variant import v_path

            col = v_path(F.col(_escape_col(a.path.path)), a.path.rest)
            if a.has_default:
                col = F.coalesce(col, F.parse_json(F.lit(json.dumps(a.default))))
            return col
        else:
            col = _apply_path(F.col(_escape_col(a.path.path)), a.path.rest, F)
        if a.has_default:
            col = F.coalesce(col, F.lit(a.default))
        return col

    def dtype_of(expr):
        return joined.select(expr.alias("_t")).schema[0].dataType

    def flat_array(expr, dt):
        # deep-flatten nested arrays so element aggregates see scalars;
        # drop null elements at each level FIRST — flatten() of an array
        # containing a null element is NULL, and a null element inside
        # F.aggregate nulls the whole row's reduction (missing keypath
        # values are simply absent in the reference)
        expr = F.filter(expr, _notnull)
        while isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.ArrayType):
            expr, dt = F.flatten(expr), dt.elementType
            expr = F.filter(expr, _notnull)
        return expr, dt

    group_items = [(k, a) for k, a in named if a.fn == "group"]

    def ordered_collect(expr):
        # deterministic element order: collect (doc_id, v) structs, sort
        # by doc_id, project v back out — collect_list alone is
        # partition-order-dependent (and drops nulls; structs don't).
        # Ungrouped queries collect doc_id-DESCENDING: the reference
        # pops its (seq-ordered) match buffer from the back
        # (src/query.rs do_ordering_and_ags; group.noise:187).
        pairs = F.array_sort(
            F.collect_list(F.struct(F.col("doc_id").alias("_d"), expr.alias("_v")))
        )
        if not group_items:
            pairs = F.reverse(pairs)
        return F.transform(pairs, lambda x: x["_v"])

    def _ck(js_expr):
        from .collation import collation_key

        return collation_key(js_expr)

    gcols = []
    gvariant: dict[int, object] = {}  # slot -> variant value expr
    for i, (k, a) in enumerate(group_items):
        ge = value_expr(a)
        if isinstance(dtype_of(ge), T.VariantType):
            # group a dynamic value by its COLLATION KEY (binary,
            # orderable, cross-type — json_value.rs order); the
            # rendered value itself is carried as a first() aggregate
            js = F.coalesce(F.to_json(ge), F.lit("null"))
            gcols.append(_ck(js).alias(f"_g{i}"))
            gvariant[i] = F.parse_json(F.first(js)).alias(f"_gv{i}")
        else:
            gcols.append(ge.alias(f"_g{i}"))

    agg_exprs = [e for _, e in sorted(gvariant.items())]
    for k, a in named:
        if a.fn == "group":
            continue
        if a.fn == "count":
            agg_exprs.append(F.count(F.lit(1)).alias(k))
            continue
        v = value_expr(a)
        dt = dtype_of(v)
        if isinstance(dt, T.VariantType):
            agg_exprs.append(_variant_agg(a, v, F, ordered_collect).alias(k))
            continue
        is_arr = isinstance(dt, T.ArrayType)
        if is_arr:
            v, dt = flat_array(v, dt)
        if a.fn == "sum":
            e = (
                F.coalesce(
                    F.sum(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)),
                    F.lit(0.0),
                )
                if is_arr
                else F.coalesce(F.sum(v), F.lit(0))
            )
        elif a.fn == "avg":
            if is_arr:
                tot = F.sum(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x))
                n = F.sum(F.size(v))
                e = F.when(n > 0, tot / n)
            else:
                e = F.avg(v)
        elif a.fn == "max":
            e = F.max(v)
        elif a.fn == "min":
            e = F.min(v)
        elif a.fn == "max_array":
            e = F.max(F.array_max(v)) if is_arr else F.max(v)
        elif a.fn == "min_array":
            e = F.min(F.array_min(v)) if is_arr else F.min(v)
        elif a.fn == "array":
            # missing values are absent, not null entries (the reference
            # omits unmatched keypaths) — consistent with concat below
            e = F.filter(ordered_collect(v), _notnull)
        elif a.fn == "array_flat":
            e = (
                F.flatten(F.filter(ordered_collect(v), _notnull))
                if is_arr
                else F.filter(ordered_collect(v), _notnull)
            )
        elif a.fn == "concat":
            if is_arr:
                # array-valued input (bind elements / array keypath):
                # concatenate the ELEMENTS in doc_id order, not a
                # string-rendered array per doc
                coll = F.flatten(F.filter(ordered_collect(v), _notnull))
                e = F.array_join(F.transform(coll, _to_str), a.sep)
            else:
                e = F.array_join(ordered_collect(v.cast("string")), a.sep)
        else:  # pragma: no cover — parser gates the fn set
            raise ParseError(f"unknown aggregate {a.fn!r}")
        agg_exprs.append(e.alias(k))

    if not agg_exprs and gcols:
        # all-group return ({l: group(.lang)}): distinct groups only —
        # GroupedData.agg() asserts on an empty expr list
        agg_exprs = [F.first(F.lit(1)).alias("_one")]
    if gcols:
        out = joined.groupBy(*gcols).agg(*agg_exprs)
        order_cols = [
            F.col(f"_g{i}").asc() if a.order != "desc" else F.col(f"_g{i}").desc()
            for i, (k, a) in enumerate(group_items)
        ]
        out = out.orderBy(*order_cols)
        # surface the group keys under their return names (variant
        # groups surface the carried first() value, not the binary key)
        for i, (k, a) in enumerate(group_items):
            if i in gvariant:
                out = out.drop(f"_g{i}").withColumnRenamed(f"_gv{i}", k)
            else:
                out = out.withColumnRenamed(f"_g{i}", k)
    else:
        out = joined.agg(*agg_exprs)
    out = out.select(*[k for k, _ in named])
    if spec.limit is not None:
        out = out.limit(spec.limit)
    if isinstance(spec.ret, RetObject) or len(named) == 1 and not isinstance(spec.ret, RetArray):
        if not isinstance(spec.ret, (RetObject, RetArray)):
            out = out.withColumnRenamed(named[0][0], "result")
        return out
    # top-level constructed array → one string-rendered array column,
    # consistent with the non-aggregate RetArray rendering
    return out.select(
        F.array(*[F.col(k).cast("string") for k, _ in named]).alias("result")
    )


def _score_primary_desc(spec: QuerySpec) -> bool:
    """True iff the engine's (score desc, doc_id) top-k IS the query's
    full ordering, so fetching only k rows is membership-correct. A
    secondary key after score desc disqualifies it: on score ties the
    secondary key decides WHICH docs belong in the top-k, so membership
    needs the full scored set sorted by the complete key first."""
    if not spec.orders:
        return True  # default ordering below is (score desc, doc_id)
    o = spec.orders[0]
    return len(spec.orders) == 1 and o.kind == "score" and not o.asc


def _ret_leaves(ret) -> list:
    """Flat leaf list of a return spec — RECURSIVE through nested
    objects/arrays, so an aggregate hidden at any depth is seen by the
    all-or-none legality check."""
    if ret is None:
        return []
    if isinstance(ret, RetObject):
        return [x for _, r in ret.items for x in _ret_leaves(r)]
    if isinstance(ret, RetArray):
        return [x for r in ret.items for x in _ret_leaves(r)]
    return [ret]


def _ret_has_wholedoc(ret) -> bool:
    if isinstance(ret, RetWholeDoc):
        return True
    if isinstance(ret, RetObject):
        return any(_ret_has_wholedoc(r) for _, r in ret.items)
    if isinstance(ret, RetArray):
        return any(_ret_has_wholedoc(r) for r in ret.items)
    return False


def _ret_uses_score(ret) -> bool:
    if isinstance(ret, RetScore):
        return True
    if isinstance(ret, RetObject):
        return any(_ret_uses_score(r) for _, r in ret.items)
    if isinstance(ret, RetArray):
        return any(_ret_uses_score(r) for r in ret.items)
    return False


def _collect_ret_fields(ret, out: set, binds: dict | None = None):
    binds = binds or {}
    if isinstance(ret, RetPath) and ret.path != "_id":
        out.add(ret.path)
    elif isinstance(ret, RetBind):
        for b in binds[ret.name]:  # bound values project the array field(s)
            # find-clause quoting escapes dotted names — membership
            # checks compare against RAW docs.columns names
            out.add(_unescape_col(b.field))
    elif isinstance(ret, RetObject):
        for _, r in ret.items:
            _collect_ret_fields(r, out, binds)
    elif isinstance(ret, RetArray):
        for r in ret.items:
            _collect_ret_fields(r, out, binds)


