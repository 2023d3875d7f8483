"""Structured Streaming: incremental index ingest (foreachBatch →
snapshot commits) and windowed aggregation with watermark."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from noise_spark.corpus import generate_pages
from noise_spark.index.build import BuildConfig, build_index
from noise_spark.oracle import OracleIndex
from noise_spark.query import IndexReader
from noise_spark.query import plan as P
from noise_spark.streaming import stream_ingest_pages, windowed_event_counts


def test_stream_ingest_builds_generations(spark, tmp_path):
    idx = str(tmp_path / "idx")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    # base index
    build_index(spark, generate_pages(spark, 200, seed=42, partitions=2), idx,
                BuildConfig(block_size=64))

    # two file drops → two micro-batches → two generations
    generate_pages(spark, 40, seed=100, partitions=1).write.mode("overwrite").parquet(
        f"{src}/drop1"
    )
    stream_ingest_pages(spark, f"{src}/drop*", idx, ckpt, BuildConfig(block_size=64))
    generate_pages(spark, 30, seed=200, partitions=1).write.mode("overwrite").parquet(
        f"{src}/drop2"
    )
    stream_ingest_pages(spark, f"{src}/drop*", idx, ckpt, BuildConfig(block_size=64))

    reader = IndexReader(spark, idx)
    assert reader.n_docs == 270
    # restart with same checkpoint: no reprocessing
    stream_ingest_pages(spark, f"{src}/drop*", idx, ckpt, BuildConfig(block_size=64))
    reader = IndexReader(spark, idx)
    assert reader.n_docs == 270

    rows = reader.docs.select("doc_id", "text").collect()
    oracle = OracleIndex([(r["doc_id"], r["text"]) for r in rows])
    node = P.Or((P.Term("w00050"), P.Term("w00007")))
    got = [(r["doc_id"], r["score"]) for r in reader.search(node, k=10).collect()]
    assert got == oracle.search(node, k=10)


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(2000)
    events.write.mode("overwrite").parquet(src)
    schema = events.schema

    stream = spark.readStream.schema(schema).parquet(src)
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("select * from win_counts").collect()
    }
    want = {
        (r["h"], r["event_type"]): (r["n"], round(r["s"], 6))
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want
