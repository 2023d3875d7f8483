"""Stable dense docID assignment.

Re-expresses the reference's monotonic doc-seq allocation
(``/root/reference/src/index.rs:146-155``) as a distributed,
parallelism-invariant numbering: docID = global rank of ``url`` under
its total order. Implementation is the classic two-pass scheme —
range-partition by url, sort within partitions, count rows per
partition, prefix-sum the counts driver-side (P integers only), then
number each partition with its offset inside a ``mapInPandas``. No
window-over-single-partition, no ``monotonically_increasing_id`` (which
is partitioning-dependent), so IDs are identical at local[8] and
local[32] — the determinism requirement for rank-identity (SURVEY.md §7
risks).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "pos",
    partitions: int | None = None,
    start: int = 0,
    require_unique: bool = False,
) -> DataFrame:
    """Distributed ``row_number() OVER (ORDER BY order_cols)``.

    Never a single-partition Window: range-partition by the order
    columns, sort within partitions, count rows per partition, driver
    prefix-sum (P integers only), number each partition with its offset
    in a ``mapInPandas``. ``order_cols`` must name real columns
    (materialize expressions with ``withColumn`` first) and the
    combination must be a total order for deterministic output.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2

    # The persist is LOAD-BEARING FOR CORRECTNESS, not a cache hint: the
    # count job and the numbering job must see the IDENTICAL physical
    # partitioning. Without it each action re-executes the range shuffle
    # with independently sampled boundaries (RangePartitioner seeds by
    # RDD id), so the driver-side offsets no longer match the partitions
    # being numbered — duplicate/shifted ranks (observed: top-k docIDs
    # diverged across parallelism levels when this was removed).
    ordered = df.repartitionByRange(partitions, *order_cols).sortWithinPartitions(
        *order_cols
    )
    ordered.persist(StorageLevel.MEMORY_AND_DISK)

    # exchange-free per-partition counts: one mapInPandas over the SAME
    # persisted partitioning emits (pid, n) rows — P rows collected, no
    # shuffle stage (the old groupBy(spark_partition_id()) added an
    # Exchange just to merge P integers)
    def _pcounts(iterator):
        import pandas as _pd

        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in iterator:
            n += len(pdf)
        yield _pd.DataFrame({"pid": [pid], "n": [n]})

    counts = ordered.mapInPandas(_pcounts, schema="pid int, n long").collect()
    offsets = {}
    acc = start
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["n"]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        ordered.schema.fields + [T.StructField(out_col, T.LongType(), False)]
    )

    def number(iterator):
        pid = TaskContext.get().partitionId()
        n = b_offsets.value.get(pid, start)
        # duplicate/null detection is EXACT and free here when asked:
        # equal keys range-partition to the same partition and sort
        # adjacent, so per-batch adjacency + the carry across batch
        # boundaries sees every global duplicate
        prev_last = None
        for pdf in iterator:
            pdf = pdf.copy()
            if require_unique:
                keys = pdf[order_cols[0]] if len(order_cols) == 1 else list(
                    zip(*[pdf[c] for c in order_cols])
                )
                import pandas as _pd

                s = _pd.Series(keys).reset_index(drop=True)
                if s.isnull().any():
                    raise ValueError(
                        f"null {order_cols} key cannot be numbered (it is "
                        "the document identity — fix the input)"
                    )
                dup = s[s.duplicated()]
                if len(dup) or (len(s) and prev_last is not None and s.iloc[0] == prev_last):
                    v = dup.iloc[0] if len(dup) else s.iloc[0]
                    raise ValueError(
                        f"duplicate {order_cols} key {v!r}: identity keys "
                        "must be unique (duplicates would corrupt docID "
                        "assignment — dedupe or upsert instead)"
                    )
                if len(s):
                    prev_last = s.iloc[len(s) - 1]
            pdf[out_col] = np.arange(n, n + len(pdf), dtype=np.int64)
            n += len(pdf)
            yield pdf

    out = ordered.mapInPandas(number, schema=out_schema)
    # let the caller release the numbering cache once consumed
    out._noise_persisted = ordered  # type: ignore[attr-defined]
    return out


def assign_doc_ids(pages: DataFrame, partitions: int | None = None) -> DataFrame:
    """Return ``pages`` with an added dense ``doc_id`` column (rank of
    url). urls must be unique and non-null — they are the document
    identity (delete/upsert key), and the slim-numbering join in the
    build fans out on duplicates; this numbering FAILS FAST on either
    instead of silently corrupting docIDs."""
    return global_row_number(
        pages, ["url"], out_col="doc_id", partitions=partitions, require_unique=True
    )
