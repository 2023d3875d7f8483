"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the engine's input table with the exact shape fixed by the
input hint: ``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``. Generation is seeded and keyed by ``doc_id`` so any
slice of the corpus is reproducible independently of partitioning —
the generator runs distributed via ``mapInPandas`` over an id range,
which is how a 10^12-row synthetic table would be produced on a real
cluster (no driver-side materialization).

Synthesis rules follow FIXTURES.md §1: Zipf(s=1.1) vocabulary of
10,000 words ``w00000..w09999``, LogNormal(μ=5, σ=0.6) doc lengths
clipped to [10, 2000], 1% of docs embed pinned phrases for
phrase/proximity tests, ``html`` wraps ``text`` so extraction is
byte-identical per url.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VOCAB_SIZE = 10_000
ZIPF_S = 1.1
PHRASES = ["quick brown fox", "multi word sentence"]
_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# Zipf pmf over ranks 1..VOCAB_SIZE (deterministic, no RNG needed)
_ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_pmf = _ranks ** (-ZIPF_S)
_pmf /= _pmf.sum()
_CDF = np.cumsum(_pmf)
_WORDS = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])


def synth_rows(doc_ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate page rows for the given doc_id array (vectorized)."""
    out_url = []
    out_ts = []
    out_html = []
    out_text = []
    out_lang = []
    for doc_id in doc_ids.tolist():
        rng = np.random.default_rng(seed * 1_000_003 + doc_id)
        dl = int(np.clip(np.exp(rng.normal(5.0, 0.6)), 10, 2000))
        toks = _WORDS[np.searchsorted(_CDF, rng.random(dl))]
        text = " ".join(toks.tolist())
        if doc_id % 100 == 0:
            text = text + " " + PHRASES[(doc_id // 100) % len(PHRASES)]
        url = f"https://site{doc_id % 1000:04d}.example/{doc_id:06d}"
        lang = "en" if doc_id % 50 < 49 else ("de" if doc_id % 2 == 0 else "fr")
        out_url.append(url)
        out_ts.append(_EPOCH + _dt.timedelta(seconds=doc_id))
        out_html.append(b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        out_text.append(text)
        out_lang.append(lang)
    return pd.DataFrame(
        {
            "url": out_url,
            "warc_ts": out_ts,
            "html": out_html,
            "text": out_text,
            "lang": out_lang,
        }
    )


def extract_text_from_html(html: bytes) -> str:
    """The extraction step (html → text). For the synthetic corpus the
    wrapper is fixed, so extraction is exact and byte-identical per url —
    the invariant the tests pin. A real pipeline would plug a proper
    extractor in here (same UDF shape)."""
    body = html[len(b"<html><body>") : -len(b"</body></html>")]
    return body.decode("utf-8")


def generate_pages(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed corpus generation: id range → mapInPandas synth."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 8)
    ids = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield synth_rows(pdf["id"].to_numpy(), seed=seed)

    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)
