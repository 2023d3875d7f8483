"""Schemaless JSON ingestion — arbitrary documents to an indexable
typed-plus-VARIANT DataFrame.

The reference accepts any JSON document and discovers keypaths per doc
at shred time (``/root/reference/src/json_shred.rs:485-576``). The
Spark-first equivalent is per-field schema inference with a VARIANT
fallback:

1. ``parse_json`` every document (one JVM expression, no driver work).
2. ONE distributed aggregation discovers the top-level field set and
   each field's merged type: cast the doc to ``map<string,variant>``,
   explode, ``groupBy(key).agg(schema_of_variant_agg(value))``. At
   100 TB this is a map-side-combined agg over (field, schema) pairs —
   the result is one row per field, driver-safe.
3. Fields whose merged schema is concrete (``STRING``,
   ``ARRAY<BIGINT>``, ``OBJECT<...>`` with no ``VARIANT`` inside) are
   extracted as real typed columns: Catalyst predicates, parquet
   pushdown, codegen — the fast path, and what a consistent corpus
   (the common case) always gets.
4. Type-CONFLICTED fields (merged schema contains ``VARIANT``, e.g. a
   field that is a string in one doc and an array of objects in the
   next) stay as one VARIANT column, queried via
   :mod:`noise_spark.query.variant`; their direct text content is
   additionally materialized as a ``<field>__text`` array<string>
   shadow column so the full-text index can cover them (the shadow is
   an index input; returns/whole-doc rendering ignore it).

The full parsed document rides along as the ``_doc`` variant column —
the reference's V-value store keeps the whole shredded doc
(``src/json_shred.rs:361-399``) and ``return .`` reassembles it; here
``_doc`` IS the document, null-vs-missing faithful.

Identity: the reference's ``_id`` (a user string) maps to our ``url``
column (the engine's string-id surface); ``doc_id`` (long) is the add
order when ingesting a driver-side list, or left to the build's
distributed numbering for the DataFrame path.
"""

from __future__ import annotations

import json
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "VARIANT_TEXT_SUFFIX",
    "FULLDOC_COL",
    "ingest_json",
    "infer_field_schemas",
    "indexable_fields",
]

VARIANT_TEXT_SUFFIX = "__text"
FULLDOC_COL = "_doc"


def _struct_ddl(sch: str) -> str:
    """schema_of_variant's ``OBJECT<a: T>`` notation → cast-able DDL
    (``STRUCT<a: T>``)."""
    return sch.replace("OBJECT<", "STRUCT<")


def ingest_json(
    spark: SparkSession,
    docs: DataFrame | Iterable,
    id_field: str = "_id",
    number_docs: bool = True,
    schemas: dict | None = None,
) -> DataFrame:
    """Ingest schemaless JSON documents.

    ``docs``: a DataFrame with one string column of JSON text (the
    scale path — e.g. ``spark.read.text(...)``), or an iterable of JSON
    strings / dicts (driver-side convenience: the REPL's add buffer).
    Returns a DataFrame with ``url`` (the ``_id`` string), optionally
    ``doc_id`` (iterable path only: add order), one column per
    discovered top-level field (typed when the merged schema is
    concrete, variant when conflicted), ``<f>__text`` shadows for
    variant fields, and the whole doc as ``_doc``.

    ``schemas``: optional ``{field: schema_of_variant string}`` map
    that SKIPS the inference aggregation — the 100 TB path: schema
    inference is inherently a full pass over the input (exactly like
    ``spark.read.json``'s), so a production pipeline infers once (on a
    first batch / sample via :func:`infer_field_schemas`) and reuses
    the result, making ingestion single-pass. A doc whose field
    conflicts with a supplied CONCRETE schema try_casts — lossless to
    a STRING target (variant-to-string renders the JSON text), null
    for other targets — and its true value always remains in ``_doc``;
    supply ``"VARIANT"`` for fields that must stay dynamic.
    """
    if isinstance(docs, DataFrame):
        if len(docs.columns) != 1:
            raise ValueError("DataFrame input must have exactly one JSON string column")
        src = docs.select(F.col(docs.columns[0]).alias("_js"))
        numbered = False
    else:
        rows = []
        for i, d in enumerate(docs):
            js = d if isinstance(d, str) else json.dumps(d)
            rows.append((i, js))
        if not rows:
            raise ValueError("no documents")
        src = spark.createDataFrame(rows, "doc_id long, _js string")
        numbered = number_docs
    parsed = src.withColumn(FULLDOC_COL, F.parse_json("_js")).drop("_js")

    if schemas is None:
        # ONE distributed agg: field set + merged per-field schema
        schemas = infer_field_schemas(parsed, id_field=id_field)
    else:
        schemas = {k: v for k, v in schemas.items() if k != id_field}

    from .query.variant import v_seg, v_text  # noqa: F811

    cols = []
    if numbered:
        cols.append(F.col("doc_id"))
    cols.append(
        F.try_variant_get(FULLDOC_COL, f"${v_seg(id_field)}", "string").alias("url")
    )
    from .query.variant import v_seg, v_text

    for name in sorted(schemas):
        sch = schemas[name]
        fld = F.try_variant_get(FULLDOC_COL, f"${v_seg(name)}", "variant")
        if "VARIANT" in sch or sch == "VOID":
            # conflicted (or all-null) → variant + one full-text shadow
            # per ARRAY DEPTH (the reference's arraypath-scoped word
            # keys: scalar / [elem] / [[elem]] are distinct keyspaces)
            cols.append(fld.alias(name))
            cols.append(v_text(fld, 0).alias(name + VARIANT_TEXT_SUFFIX))
            cols.append(v_text(fld, 1).alias(name + VARIANT_TEXT_SUFFIX + "1"))
            cols.append(v_text(fld, 2).alias(name + VARIANT_TEXT_SUFFIX + "2"))
        else:
            cols.append(fld.try_cast(_struct_ddl(sch)).alias(name))
    cols.append(F.col(FULLDOC_COL))
    return parsed.select(*cols)


def infer_field_schemas(parsed: DataFrame, id_field: str = "_id") -> dict:
    """``{field: merged schema_of_variant string}`` over a frame whose
    ``_doc`` column holds parsed variants — ONE distributed
    map-side-combined aggregation (explode the top-level map, merge
    per-field schemas); the result is one row per field, driver-safe
    at any corpus size. Run it on a first batch / deterministic sample
    and pass the result to :func:`ingest_json` ``schemas=`` to make
    steady-state ingestion single-pass."""
    return {
        r["k"]: r["sch"]
        for r in parsed.select(
            F.explode(F.col(FULLDOC_COL).try_cast("map<string,variant>")).alias(
                "k", "v"
            )
        )
        .groupBy("k")
        .agg(F.schema_of_variant_agg("v").alias("sch"))
        .collect()
        if r["k"] != id_field
    }


def indexable_fields(df: DataFrame) -> tuple:
    """The full-text-indexable columns of an ingested frame — every
    string / array<string> column (including ``__text`` shadows),
    excluding identity surfaces. Feed to
    ``BuildConfig(fields=indexable_fields(df) or skip full-text)``."""
    from pyspark.sql import types as T

    out = []
    for f in df.schema.fields:
        if f.name in ("url", "doc_id", FULLDOC_COL):
            continue
        if isinstance(f.dataType, T.StringType) or (
            isinstance(f.dataType, T.ArrayType)
            and isinstance(f.dataType.elementType, T.StringType)
        ):
            out.append(f.name)
    return tuple(sorted(out))
