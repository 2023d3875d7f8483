"""Schemaless-path scale probe (ROADMAP round-6 item 5).

Measures the VARIANT ingestion + index pipeline at sf1.0 shape
(500k docs by default) on local[32]:

1. ``ingest_json`` — distributed per-field inference agg + typed/variant
   materialization (the question at 10⁹ docs: the inference is ONE
   map-side-combined agg; here we record its wall cost and the
   materialized doc-store bytes, including the ``_doc`` whole-document
   variant column's overhead vs the typed corpus).
2. ``build_index(fields="auto")`` over the ingested frame (arraypath
   text shadows included).
3. Query-language latency over the schemaless index: element-word
   match, conflicted-field array condition + range, whole-doc return.

Writes ONE JSON line (also to BENCH/bench_schemaless_sf1.json when
``--out`` given).

Usage: python scripts/schemaless_probe.py [--docs N] [--out FILE]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from noise_spark.corpus import generate_pages
from noise_spark.session import get_spark


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(
        "schemaless_probe", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = "/tmp/noise_spark_schemaless_probe"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    # corpus → JSON docs with a type-CONFLICTED field (`tag`: string on
    # even ids, array on odd — the ingest's variant fallback) plus a
    # nested object and a numeric field (typed extraction paths)
    pages = generate_pages(spark, args.docs, seed=42, partitions=args.cpus * 2)
    base = [
        F.col("url").alias("_id"),
        F.col("text"),
        F.col("lang"),
        F.length("text").alias("n_chars"),
        F.struct(F.year("warc_ts").alias("y"), F.minute("warc_ts").alias("d")).alias(
            "meta"
        ),
    ]
    even = pages.filter(F.crc32("url") % 2 == 0).select(
        F.to_json(F.struct(*base, F.col("lang").alias("tag"))).alias("js")
    )
    odd = pages.filter(F.crc32("url") % 2 == 1).select(
        F.to_json(F.struct(*base, F.array("lang", F.lit("odd")).alias("tag"))).alias("js")
    )
    js_path = os.path.join(work, "js")
    even.union(odd).write.mode("overwrite").parquet(js_path)  # excluded from timing
    js = spark.read.parquet(js_path)

    from noise_spark.ingest import FULLDOC_COL, ingest_json

    t0 = time.time()
    ing = ingest_json(spark, js)  # runs the inference agg eagerly
    t_infer = time.time() - t0
    ing_path = os.path.join(work, "ingested")
    t0 = time.time()
    ing.write.mode("overwrite").parquet(ing_path)
    t_materialize = time.time() - t0
    ingested_bytes = dir_bytes(ing_path)

    # typed baseline doc-store bytes for the same corpus (url + the
    # typed columns, no _doc variant) — the variant overhead measure
    typed_path = os.path.join(work, "typed")
    js_parsed = spark.read.parquet(ing_path).drop(FULLDOC_COL)
    js_parsed.write.mode("overwrite").parquet(typed_path)
    typed_bytes = dir_bytes(typed_path)

    from noise_spark.index.build import BuildConfig, build_index

    idx = os.path.join(work, "idx")
    t0 = time.time()
    metrics = build_index(
        spark,
        spark.read.parquet(ing_path),
        idx,
        BuildConfig(
            analyzer="porter",
            fields="auto",
            extra_doc_cols=("n_chars", "meta", "tag", FULLDOC_COL),
            block_size=128,
        ),
    )
    t_build = time.time() - t0

    from noise_spark.query.engine import IndexReader
    from noise_spark.query.parser import run_query

    reader = IndexReader(spark, idx)
    queries = {
        "sq_word": 'find {text: ~= "quick"} order score() desc limit 10',
        "sq_array_or_range": 'find {tag: [== "odd"] || n_chars: > 900} '
        "order .n_chars desc return ._id limit 10",
        "sq_nested_range": "find {meta: {d: > 30}} order .n_chars desc "
        "return {id: ._id, d: .meta.d} limit 10",
        "sq_wholedoc": 'find {text: ~= "fox"} order score() desc return . limit 5',
    }
    qsec = {}
    for name, q in queries.items():
        t0 = time.time()
        n = run_query(reader, q, default_k=None).count()
        qsec[name] = round(time.time() - t0, 4)
        assert n > 0, name

    out = {
        "metric": "schemaless_ingest_build_query_sec",
        "value": round(t_infer + t_materialize + t_build, 3),
        "unit": "sec",
        "sf": args.docs / 500_000.0,
        "n_docs": args.docs,
        "infer_sec": round(t_infer, 3),
        "materialize_sec": round(t_materialize, 3),
        "build_sec": round(t_build, 3),
        "build_docs_per_sec": round(args.docs / max(t_build, 1e-9), 1),
        "ingested_doc_store_bytes": ingested_bytes,
        "typed_doc_store_bytes": typed_bytes,
        "variant_overhead_ratio": round(ingested_bytes / max(typed_bytes, 1), 3),
        "index_bytes": dir_bytes(idx),
        "indexed_fields": list(reader.fields),
        "queries": qsec,
        "cpus": args.cpus,
        "stage_stats": {
            k: {m: v[m] for m in ("seconds", "rows", "files") if m in v}
            for k, v in (metrics.get("stages") or {}).items()
        },
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
