"""noise_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch, Spark-first rebuild of the query/data-processing
capabilities of pipedown/noise (reference at /root/reference), targeting
Iceberg-style tables of Common-Crawl-style web pages:

- ``analysis``: tokenizer (UAX-29-style segmentation, NFKC, Snowball
  English stemming) usable driver-side and inside Arrow UDFs.
- ``index``: posting-list construction, salted repartition-by-term merge
  with heavy-hitter splitting, docID-delta + varbyte block compression,
  snapshot/manifest commits with per-partition lineage (resume support).
- ``query``: BM25 (k1=1.2, b=0.75) top-k — exhaustive DataFrame path and
  block-max WAND path — plus boolean AND/OR/NOT, phrase, proximity,
  exact-match, range and aggregation surfaces per SURVEY.md §2.
- ``oracle``: pinned pure-Python single-node implementation used as the
  rank-identity ground truth in tests.
- ``datapipe``: training-data pipeline ops (dedup, similarity search,
  text quality, language id, fingerprinting) over document tables.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
