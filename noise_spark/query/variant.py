"""VARIANT-column query lowering — the schemaless half of the engine.

The reference shreds arbitrary JSON per document and discovers keypaths
at write time (``/root/reference/src/json_shred.rs:485-576``), so one
field may hold a string in one doc and an array of objects in the next
(``repl-tests/query_basic.noise`` doc set). Spark's typed columns can't
carry that, but Spark 4's VARIANT type can: :mod:`noise_spark.ingest`
stores type-conflicted fields as variant, and this module lowers the
query language's predicates / paths / order keys onto them with
JVM-side expressions only (``schema_of_variant`` / ``try_variant_get``
/ ``try_cast(.. as array<variant>)`` + higher-order functions) — no
Python UDF in any match path, so whole-stage codegen keeps working and
the plans scale exactly like the typed lowering.

Type fidelity follows the reference's JSON value semantics
(``src/json_value.rs``): ``== "1"`` matches only the STRING ``"1"``,
``== 1`` only numbers, ranges only numbers; equality of booleans and
null is type-guarded the same way. Cross-type ORDER over a variant
column reuses :func:`noise_spark.query.collation.collation_key` over
``to_json`` — the reference's collation total order.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "is_variant_dtype",
    "v_eq",
    "v_ne",
    "v_range",
    "v_path",
    "v_elements",
    "v_cond_pred",
    "v_order_key",
    "v_text",
]

_NUM_SCHEMAS = ("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT")


def is_variant_dtype(dtype: str) -> bool:
    """True for a DataFrame.dtypes entry of a variant column."""
    return dtype == "variant"


def _is_num(sch: Column) -> Column:
    return sch.isin(*_NUM_SCHEMAS) | sch.startswith("DECIMAL")


def v_eq(col: Column, value) -> Column:
    """Type-guarded JSON equality on a variant value (never-null).

    ``None`` matches the JSON null (``is_variant_null``), NOT a missing
    field (SQL NULL) — the reference distinguishes a stored null from
    an absent keypath (src/key_builder.rs N-key vs no key)."""
    if value is None:
        return F.coalesce(F.is_variant_null(col), F.lit(False))
    sch = F.schema_of_variant(col)
    if isinstance(value, bool):
        got = F.try_variant_get(col, "$", "boolean")
        guard = sch == "BOOLEAN"
    elif isinstance(value, (int, float)):
        got = F.try_variant_get(col, "$", "double")
        guard = _is_num(sch)
        value = float(value)
    elif isinstance(value, str):
        got = F.try_variant_get(col, "$", "string")
        guard = sch == "STRING"
    else:  # pragma: no cover - parser only produces scalars
        raise TypeError(f"unsupported equality literal {value!r}")
    return F.coalesce(guard & (got == F.lit(value)), F.lit(False))


def v_ne(col: Column, value) -> Column:
    """``!=`` — the value EXISTS and is not (JSON-)equal: a number is
    ``!= "word"``, but a missing field matches nothing (the reference
    scans the stored keyspace, so only present values can differ)."""
    return col.isNotNull() & ~v_eq(col, value)


def v_range(col: Column, lo=None, hi=None, lo_inclusive=True, hi_inclusive=True) -> Column:
    """Numeric range — only JSON numbers participate (the reference's
    ``f``-number keyspace, src/filters.rs:379-501: booleans/strings
    never match a number range)."""
    x = F.try_variant_get(col, "$", "double")
    cond = _is_num(F.schema_of_variant(col))
    if lo is not None:
        lo = float(lo)
        cond = cond & (x >= lo if lo_inclusive else x > lo)
    if hi is not None:
        hi = float(hi)
        cond = cond & (x <= hi if hi_inclusive else x < hi)
    return F.coalesce(cond, F.lit(False))


import re as _re

_IDENT_RE = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def v_seg(key: str) -> str:
    """Variant-path segment for an ARBITRARY object key. Plain
    identifiers render as ``.key``; anything else (dots, brackets,
    spaces, quotes, leading digits — the reference shreds arbitrary
    keypaths, and the query language quotes them as ``.["a.b"]``)
    bracket-quotes so the path addresses the literal key instead of
    walking nested objects. Spark's variant path grammar accepts
    ``['k']`` / ``["k"]`` with NO escape sequences, so a key containing
    BOTH quote kinds is unaddressable — emit a never-matching segment
    rather than an invalid path error."""
    if _IDENT_RE.fullmatch(key):
        return f".{key}"
    if '"' not in key:
        return f'["{key}"]'
    if "'" not in key:
        return f"['{key}']"
    return '["\x00unaddressable\x00"]'


def v_path(col: Column, segs) -> Column:
    """Walk return/order keypath segments over a variant: object key →
    ``$.key``, index → ``$[i]`` (out-of-bounds → NULL, the reference's
    missing-path semantics), array-all ``[]`` → per-element walk of the
    rest. Result stays variant (render with ``to_json`` or collect as
    VariantVal)."""
    for i, s in enumerate(segs):
        if s[0] == "*":
            rest = segs[i + 1 :]
            if not rest:
                return col
            return F.transform(v_elements(col), _elem_fn(rest))
        if s[0] == "i":
            col = F.try_variant_get(col, f"$[{int(s[1])}]", "variant")
        else:
            col = F.try_variant_get(col, f"${v_seg(s[1])}", "variant")
    return col


def _elem_fn(rest):
    # unary on purpose: pyspark HOF lambdas dispatch on arity
    return lambda e: v_path(e, rest)


def v_elements(col: Column) -> Column:
    """The element array of a variant that holds a JSON array; NULL for
    scalars/objects (so ``exists`` over it is NULL → coalesce at the
    call site). try_cast, not cast: never an ANSI error."""
    return col.try_cast("array<variant>")


def v_cond_pred(cond: tuple):
    """Variant mirror of :func:`noise_spark.query.plan._cond_pred` —
    the element-condition tree of array filters / bind variables
    (("cmp", key, op, value) / ("or"|"and", l, r) / ("arr", key,
    inner)) as a Column→Column lambda over VARIANT elements."""
    tag = cond[0]
    if tag in ("or", "and"):
        lp, rp = v_cond_pred(cond[1]), v_cond_pred(cond[2])
        return (lambda e: lp(e) | rp(e)) if tag == "or" else (lambda e: lp(e) & rp(e))
    if tag in ("arr", "bindarr"):
        _, key, inner = cond
        ip = v_cond_pred(inner)

        def arr_pred(e):
            t = e if key is None else F.try_variant_get(e, f"${v_seg(key)}", "variant")
            return F.coalesce(F.exists(v_elements(t), ip), F.lit(False))

        return arr_pred
    if tag == "obj":
        _, key, inner = cond
        ip = v_cond_pred(inner)
        return lambda e: ip(F.try_variant_get(e, f"${v_seg(key)}", "variant"))
    if tag == "bbox":
        _, key, (w, s, e_, n) = cond

        def bbox_pred(e):
            t = e if key is None else F.try_variant_get(e, f"${v_seg(key)}", "variant")
            return bbox_overlap_json(t, w, s, e_, n)

        return bbox_pred
    _, key, op, v = cond

    def pred(e):
        t = e if key is None else F.try_variant_get(e, f"${v_seg(key)}", "variant")
        if op == "==":
            return v_eq(t, v)
        if op == "!=":
            return v_ne(t, v)
        lo_ops = {">": (v, None, False, True), ">=": (v, None, True, True)}
        hi_ops = {"<": (None, v, True, False), "<=": (None, v, True, True)}
        if op in lo_ops or op in hi_ops:
            lo, hi, li, hin = (lo_ops | hi_ops)[op]
            return v_range(t, lo, hi, li, hin)
        raise ValueError(f"unsupported element operator {op!r}")

    return pred


def v_exists(col: Column, cond: tuple) -> Column:
    """Array-filter match over a variant field: ANY element of the JSON
    array satisfies the condition (same-element semantics for object
    conditions, like the typed Bind lowering). Non-arrays match
    nothing."""
    return F.coalesce(F.exists(v_elements(col), v_cond_pred(cond)), F.lit(False))


def v_matching_elements(col: Column, cond: tuple) -> Column:
    """``filter()`` of the element array by the condition — the bind
    capture surface (``return x``), variant edition."""
    return F.coalesce(
        F.filter(v_elements(col), v_cond_pred(cond)),
        F.array().cast("array<variant>"),
    )


def v_order_key(col: Column) -> Column:
    """Cross-type collation sort key for a variant order key: the
    order-preserving byte encoding of the JSON value
    (:func:`noise_spark.query.collation.collation_key` over
    ``to_json``). A missing field (SQL NULL) encodes as JSON null —
    the collation floor, matching the reference's absent-key order."""
    from .collation import collation_key

    return collation_key(F.coalesce(F.to_json(col), F.lit("null")))


def v_text(col: Column, depth: int = 0) -> Column:
    """The text content of a variant field at one ARRAY DEPTH, as
    array<string> — what the full-text index sees. The reference
    scopes word keys by keypath INCLUDING arraypath markers
    (src/key_builder.rs:64-82: ``bar`` vs ``bar$!`` vs ``bar$!$!``),
    so ``{f: ~= w}`` matches only a scalar string value (depth 0),
    ``{f: [~= w]}`` only direct array elements (depth 1), and
    ``{f: [[~= w]]}`` only elements of nested arrays (depth 2) —
    pinned by not.noise:33-47 (scalar ``~=`` excludes array docs).
    Nested OBJECT text belongs to deeper keypaths and is excluded."""
    if depth == 0:
        return F.when(
            F.schema_of_variant(col) == "STRING",
            F.array(F.try_variant_get(col, "$", "string")),
        )
    if depth == 1:
        inner = v_elements(col)
    else:  # depth 2: flatten the string elements of element-arrays
        inner = F.flatten(
            F.filter(
                F.transform(v_elements(col), lambda e: v_elements(e)),
                _notnull,
            )
        )
    return F.filter(
        F.transform(
            inner,
            lambda e: F.when(
                F.schema_of_variant(e) == "STRING",
                F.try_variant_get(e, "$", "string"),
            ),
        ),
        _notnull,
    )


def _notnull(x):
    return x.isNotNull()


_NUM_RE = r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"


def bbox_overlap_json(col: Column, w: float, s: float, e: float, n: float) -> Column:
    """GeoJSON bbox overlap for a DYNAMIC geometry value (variant or
    struct, any of Point/LineString/Polygon — the reference's
    BboxFilter, src/filters.rs:503-586). The geometry's bbox derives
    from the numeric content of its JSON rendering: GeoJSON coordinate
    arrays are the only numbers a geometry object carries (``type`` is
    text), and they alternate x,y at every nesting depth, so even
    positions are x and odd are y regardless of Point vs Polygon
    nesting. Pure JVM expressions (to_json → regexp_extract_all →
    indexed filter → array_min/max), usable inside higher-order
    lambdas — so the same predicate serves top-level fields, array
    elements, and bind conditions."""
    js = F.to_json(col)
    # numbers come ONLY from the value of the ``coordinates`` member(s)
    # — digits inside string values or extra numeric members (e.g.
    # {"type": "Point", "coordinates": [1, 2], "name": "Route 66"})
    # must not corrupt the extents or the x/y parity. A GeoJSON
    # coordinates value is a (nested) array of numbers, so it matches
    # ``\[[^"{}]*\]`` exactly (no quotes or braces inside); every
    # coordinates array holds x,y pairs, so concatenating several
    # members (GeometryCollection) preserves even/odd parity. A BARE
    # coordinate array (the value is the array itself) has no member
    # key — only then fall back to the whole rendering.
    coord_arrays = F.regexp_extract_all(
        js, F.lit(r'"coordinates"\s*:\s*(\[[^"{}]*\])'), 1
    )
    src = (
        F.when(F.size(coord_arrays) > 0, F.array_join(coord_arrays, ","))
        .when(js.startswith("["), js)
        .otherwise(F.lit(None))
    )
    nums = F.transform(
        F.regexp_extract_all(src, F.lit(_NUM_RE), 0),
        lambda x: x.cast("double"),
    )
    xs = F.filter(nums, lambda x, i: i % 2 == 0)
    ys = F.filter(nums, lambda x, i: i % 2 == 1)
    return F.coalesce(
        (F.array_min(xs) <= e)
        & (F.array_max(xs) >= w)
        & (F.array_min(ys) <= n)
        & (F.array_max(ys) >= s),
        F.lit(False),
    )


# -- aggregation prep ---------------------------------------------------------
# The return-clause aggregates (group.noise:180-260) reduce DYNAMIC
# values: sum/avg walk deeply-nested number arrays, min_array/max_array
# take the collation extreme over deep-flattened elements, min/max
# compare whole values cross-type. Static Spark expressions can't walk
# unknown depth, so the PER-DOC projection is one Arrow-batched
# pandas_udf over the JSON rendering (the reference walks JsonValue
# trees per doc the same way, src/aggregates.rs) — the AGGREGATION
# itself stays a distributed JVM groupBy (sum / min_by over binary
# collation keys), so the plan scales like any other agg.


def _deep_scalars(v, out: list) -> None:
    if isinstance(v, list):
        for x in v:
            _deep_scalars(x, out)
    else:
        out.append(v)


def _flat_numbers_one(s):
    if s is None:
        return None
    flat: list = []
    _deep_scalars(json.loads(s), flat)
    return [
        float(x)
        for x in flat
        if isinstance(x, (int, float)) and not isinstance(x, bool)
    ]


def vjson_flat_numbers():
    """array<double> of every number found when deep-flattening the
    JSON value (a scalar number counts; booleans/strings don't)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def f(js):
        return js.map(_flat_numbers_one)

    return f


def vjson_extreme_elem(maximize: bool):
    """The collation-extreme DEEP-FLATTENED element of the JSON value,
    as JSON text (None when there are no elements — e.g. an empty
    array, matching the reference's untouched init value)."""
    from pyspark.sql.functions import pandas_udf

    from .collation import encode_value

    def one(s):
        if s is None:
            return None
        flat: list = []
        _deep_scalars(json.loads(s), flat)
        if not flat:
            return None
        pick = (max if maximize else min)(flat, key=encode_value)
        return json.dumps(pick)

    @pandas_udf("string")
    def f(js):
        return js.map(one)

    return f


def _flat_elems_one(s):
    if s is None:
        return None
    flat: list = []
    _deep_scalars(json.loads(s), flat)
    return [json.dumps(x) for x in flat]


def vjson_flat_elems():
    """Every deep-flattened element of the JSON value, as an
    array of JSON-text elements (array_flat over a variant)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def f(js):
        return js.map(_flat_elems_one)

    return f
