"""Spark query engine: BM25 top-k + boolean/phrase/proximity retrieval.

Lowering strategy (SURVEY.md §2.3/§3.2): the plan AST becomes DataFrame
operations —

- term postings scan  → parquet read filtered by ``term`` (predicate
  pushdown + dictionary/min-max pruning; segments additionally prune by
  the deterministic term bucket partition)
- AND                 → match-set inner joins (semi)
- OR                  → match-set union
- NOT                 → left_anti join
- phrase / proximity  → per-doc position verification in an
  Arrow-batched grouped-map UDF (positions payload decoded per doc)
- scoring             → BM25 contributions as JVM-side column
  expressions; per-doc summation in ASCENDING TERM ORDER via
  ``aggregate(array_sort(collect_list(...)))`` so floating-point results
  are bitwise-reproducible across partitionings and parallelism levels
  (and bitwise-comparable to the pure-Python oracle)
- top-k               → ``orderBy(score desc, doc_id asc).limit(k)``,
  which Spark executes as TakeOrderedAndProject (per-partition top-k +
  driver merge; the reference's incremental sort/merge buffer,
  ``src/query.rs:511-553``)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import BM25_B, BM25_K1
from ..index.catalog import IndexCatalog
from ..scoring import bm25_idf
from . import plan as P


class IndexReader:
    """Reads a committed index snapshot and answers queries.

    Resolves the manifest into possibly-many *generations* (base build +
    incremental appends), a tombstone set (deletes), and exact stat
    deltas — so BM25 after incremental maintenance is rank-identical to
    a fresh build over the logical corpus (the reference's merge-op
    counter semantics, src/index.rs:301-322)."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ):
        self.spark = spark
        self.cat = IndexCatalog(index_dir)
        self.k1, self.b = k1, b
        manifest = self.cat.current_manifest()
        stages = manifest["stages"]
        gens = [""]
        gens += sorted(
            {n.split("/")[0] for n in stages if n.startswith("gen") and "/" in n},
            key=lambda g: int(g[3:]),
        )
        self._gens = gens

        def paths(kind: str) -> list[str]:
            out = []
            for g in gens:
                name = f"{g}/{kind}" if g else kind
                if name in stages:
                    out.append(stages[name]["path"])
            return out

        self._docs_paths = paths("docs")
        self._postings_paths = paths("postings")
        self._term_stats_paths = paths("term_stats")
        self._segments_paths = paths("segments")

        # corpus stats: Σ over generation rows + the delete-delta row
        n_docs = 0
        total_tokens = 0
        for p in paths("corpus_stats"):
            row = spark.read.parquet(p).collect()[0]
            n_docs += row["n_docs"]
            total_tokens += row["total_tokens"]
        if "corpus_stats_delta" in stages:
            d = spark.read.parquet(stages["corpus_stats_delta"]["path"]).collect()[0]
            n_docs += d["n_docs"]
            total_tokens += d["total_tokens"]
        self.n_docs = n_docs
        self.avg_dl = float(total_tokens) / max(n_docs, 1)

        self._tombstones: DataFrame | None = None
        self._tombstone_ids = None
        if "tombstones" in stages:
            t = spark.read.parquet(stages["tombstones"]["path"])
            ids = [r["doc_id"] for r in t.collect()]
            if ids:
                self._tombstones = t
                import numpy as np

                self._tombstone_ids = np.sort(np.array(ids, dtype=np.int64))
        self._term_stats_delta = (
            stages["term_stats_delta"]["path"] if "term_stats_delta" in stages else None
        )

    def _union(self, paths: list[str]) -> DataFrame:
        df = self.spark.read.parquet(paths[0])
        for p in paths[1:]:
            df = df.unionByName(self.spark.read.parquet(p))
        return df

    def _minus_tombstones(self, df: DataFrame) -> DataFrame:
        if self._tombstones is None:
            return df
        return df.join(self._tombstones, "doc_id", "left_anti")

    # -- table access ---------------------------------------------------------
    @property
    def postings(self) -> DataFrame:
        return self._minus_tombstones(self._union(self._postings_paths))

    @property
    def docs(self) -> DataFrame:
        return self._minus_tombstones(self._union(self._docs_paths))

    @property
    def segments(self) -> DataFrame:
        return self._union(self._segments_paths)

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        stats = self._union(self._term_stats_paths)
        if self._term_stats_delta:
            stats = stats.unionByName(self.spark.read.parquet(self._term_stats_delta))
        rows = (
            stats.filter(F.col("term").isin(list(terms)))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        return {r["term"]: r["df"] for r in rows if r["df"] and r["df"] > 0}

    def postings_for(self, terms: list[str], with_positions: bool = False) -> DataFrame:
        cols = ["term", "doc_id", "tf", "dl"] + (["positions"] if with_positions else [])
        return self.postings.filter(F.col("term").isin(list(terms))).select(*cols)

    # -- match sets -------------------------------------------------------------
    def _match_set(self, node: P.Node) -> DataFrame:
        """DataFrame[doc_id] of matching documents."""
        if isinstance(node, P.Term):
            return self.postings_for([node.term]).select("doc_id")
        if isinstance(node, P.Or):
            kids = [c for c in node.children]
            if all(isinstance(c, P.Term) for c in kids):
                terms = [c.term for c in kids]
                return self.postings_for(terms).select("doc_id").distinct()
            out = self._match_set(kids[0])
            for c in kids[1:]:
                out = out.union(self._match_set(c))
            return out.distinct()
        if isinstance(node, P.And):
            kids = list(node.children)
            if all(isinstance(c, P.Term) for c in kids):
                terms = sorted({c.term for c in kids})
                # one scan + count == n  (re-expresses leapfrog intersection)
                return (
                    self.postings_for(terms)
                    .groupBy("doc_id")
                    .agg(F.count("*").alias("n"))
                    .filter(F.col("n") == len(terms))
                    .select("doc_id")
                )
            out = self._match_set(kids[0])
            for c in kids[1:]:
                out = out.join(self._match_set(c), "doc_id", "left_semi")
            return out
        if isinstance(node, P.Not):
            pos = self._match_set(node.positive)
            neg = self._match_set(node.negative)
            return pos.join(neg, "doc_id", "left_anti")
        if isinstance(node, P.Phrase):
            return self._positional_match(list(node.terms), phrase=True)
        if isinstance(node, P.Proximity):
            return self._positional_match(list(node.terms), phrase=False, window=node.window)
        if isinstance(node, P.ExactMatch):
            return self.docs.filter(F.col("text") == node.literal).select("doc_id")
        if isinstance(node, P.FieldEq):
            cond = (
                F.col(node.field).isNull()
                if node.value is None
                else F.col(node.field) == F.lit(node.value)
            )
            return self.docs.filter(cond).select("doc_id")
        if isinstance(node, P.FieldRange):
            cond = F.lit(True)
            c = F.col(node.field)
            if node.lo is not None:
                cond = cond & (c >= node.lo if node.lo_inclusive else c > node.lo)
            if node.hi is not None:
                cond = cond & (c <= node.hi if node.hi_inclusive else c < node.hi)
            return self.docs.filter(cond).select("doc_id")
        if isinstance(node, P.AllDocs):
            return self.docs.select("doc_id")
        raise TypeError(type(node))

    def _positional_postings(self, terms: list[str]) -> DataFrame:
        """(term, doc_id, positions varbyte) decoded from the compressed
        segments — the bucket-partition-pruned path (the raw postings
        table is an intermediate; segments are the index)."""
        from ..index.build import term_bucket

        buckets = sorted({term_bucket(t) for t in terms})
        segs = self.segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(list(terms))
        ).select("term", "n_docs", "docs", "codec", "positions")

        def decode(iterator):
            from ..index import codec as C

            for pdf in iterator:
                out_term, out_doc, out_pos = [], [], []
                for term, n_docs, dbuf, cdc, pbuf in zip(
                    pdf["term"], pdf["n_docs"], pdf["docs"], pdf["codec"], pdf["positions"]
                ):
                    docs = (
                        C.for_decode(bytes(dbuf))
                        if cdc == "for"
                        else C.delta_decode(bytes(dbuf))
                    )
                    plists = C.decode_positions(bytes(pbuf), int(n_docs))
                    for d, pl in zip(docs.tolist(), plists):
                        out_term.append(term)
                        out_doc.append(d)
                        out_pos.append(C.positions_row(pl.tolist()))
                yield pd.DataFrame(
                    {"term": out_term, "doc_id": out_doc, "positions": out_pos}
                )

        schema = T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("positions", T.BinaryType(), False),
            ]
        )
        return self._minus_tombstones(segs.mapInPandas(decode, schema=schema))

    def _positional_match(self, terms: list[str], phrase: bool, window: int = 0) -> DataFrame:
        """Docs where ``terms`` occur consecutively (phrase) or within an
        N-word window (proximity). Candidate docs (containing all terms)
        are found relationally over the bucket-pruned segments; position
        verification is one Arrow-batched grouped-map over the per-doc
        position lists."""
        n_terms = len(set(terms))
        posts = self._positional_postings(sorted(set(terms)))
        grouped = (
            posts.groupBy("doc_id")
            .agg(
                F.count("*").alias("n"),
                F.map_from_entries(
                    F.collect_list(F.struct("term", "positions"))
                ).alias("posmap"),
            )
            .filter(F.col("n") == n_terms)
        )
        ordered_terms = list(terms)
        w = window

        def verify(iterator):
            from ..index.codec import decode_positions_row

            for pdf in iterator:
                keep = []
                for doc_id, posmap in zip(pdf["doc_id"], pdf["posmap"]):
                    lists = [decode_positions_row(bytes(posmap[t])) for t in ordered_terms]
                    if phrase:
                        cand = list(lists[0])
                        ok = False
                        for i, pl in enumerate(lists[1:], start=1):
                            s = set(pl)
                            cand = [p for p in cand if p + i in s]
                            if not cand:
                                break
                        ok = bool(cand)
                    else:
                        events = sorted(
                            (p, i) for i, pl in enumerate(lists) for p in pl
                        )
                        k = len(lists)
                        need: dict[int, int] = {}
                        have = 0
                        lo = 0
                        ok = False
                        for hi in range(len(events)):
                            ti = events[hi][1]
                            need[ti] = need.get(ti, 0) + 1
                            if need[ti] == 1:
                                have += 1
                            while have == k and not ok:
                                if events[hi][0] - events[lo][0] <= w:
                                    ok = True
                                    break
                                tlo = events[lo][1]
                                need[tlo] -= 1
                                if need[tlo] == 0:
                                    have -= 1
                                lo += 1
                            if ok:
                                break
                    if ok:
                        keep.append(doc_id)
                yield pd.DataFrame({"doc_id": pd.Series(keep, dtype="int64")})

        return grouped.mapInPandas(verify, schema=T.StructType([T.StructField("doc_id", T.LongType(), False)]))

    # -- scoring -------------------------------------------------------------------
    def _term_boosts(self, node: P.Node) -> dict[str, float]:
        boosts: dict[str, float] = {}

        def walk(n: P.Node, mult: float):
            if isinstance(n, P.Term):
                boosts[n.term] = mult * n.boost
            elif isinstance(n, (P.Or, P.And)):
                for c in n.children:
                    walk(c, mult * n.boost)
            elif isinstance(n, P.Not):
                walk(n.positive, mult)
            elif isinstance(n, (P.Phrase, P.Proximity)):
                for t in n.terms:
                    boosts[t] = mult * n.boost
            elif isinstance(n, P.ExactMatch):
                pass

        walk(node, 1.0)
        return boosts

    def search(self, node: P.Node, k: int = 10) -> DataFrame:
        """Top-k → DataFrame(doc_id, score) ordered by (score desc, doc_id).

        Pure filter plans (exact match, field predicates, all-docs) score
        binary 1.0 like the reference (src/filters.rs:363-368, 487-492);
        any plan containing scoring terms ranks by BM25 with the filters
        shaping the candidate set."""
        if isinstance(node, (P.ExactMatch, P.FieldEq, P.FieldRange, P.AllDocs)) or not self._term_boosts(node):
            return (
                self._match_set(node)
                .withColumn("score", F.lit(1.0))
                .orderBy(F.asc("doc_id"))
                .limit(k)
            )
        boosts = self._term_boosts(node)
        terms = sorted(boosts)
        dfs = self.term_dfs(terms)
        weights = [
            (t, bm25_idf(self.n_docs, dfs[t]) * boosts[t]) for t in terms if t in dfs
        ]
        if not weights:
            return self.spark.createDataFrame([], "doc_id long, score double")
        wdf = F.broadcast(self.spark.createDataFrame(weights, "term string, w double"))
        k1, b, avg_dl = self.k1, self.b, self.avg_dl
        # parenthesization mirrors oracle.bm25_tf_norm exactly:
        # w * ((tf*(k1+1)) / (tf + k1*((1-b) + b*(dl/avgdl))))
        contrib = F.col("w") * (
            (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avg_dl)))
            )
        )
        scored = (
            self.postings_for([t for t, _ in weights])
            .join(wdf, "term")
            .withColumn("contrib", contrib)
            .groupBy("doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ).alias("score")
            )
        )
        needs_filter = not (
            isinstance(node, P.Or) and all(isinstance(c, P.Term) for c in node.children)
        )
        if needs_filter:
            scored = scored.join(self._match_set(node), "doc_id", "left_semi")
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def query(self, node: P.Node, k: int = 10) -> DataFrame:
        """Planner entry point: flat scored Or/And of terms take the
        block-max WAND path over compressed segments (bucket-pruned scan,
        skip-heavy); everything else (positional, boolean trees, field
        predicates, binary-scored plans) takes the exhaustive DataFrame
        path. Both are rank-identical by construction."""
        flat_scored = isinstance(node, (P.Or, P.And)) and all(
            isinstance(c, P.Term) for c in getattr(node, "children", ())
        )
        if flat_scored:
            return self.search_wand(node, k)
        return self.search(node, k)

    # -- block-max WAND over compressed segments --------------------------------
    def search_wand(self, node: P.Node, k: int = 10, n_bins: int | None = None) -> DataFrame:
        """Top-k via distributed block-max WAND. Supports flat Or/And of
        Terms (the scored-retrieval hot path); other plans fall back to
        :meth:`search`. Rank-identical to the exhaustive path by
        construction (exact per-bin top-k + global merge)."""
        from ..index.build import term_bucket
        from .wand import wand_bin

        flat_or = isinstance(node, P.Or) and all(isinstance(c, P.Term) for c in node.children)
        flat_and = isinstance(node, P.And) and all(isinstance(c, P.Term) for c in node.children)
        if not (flat_or or flat_and):
            return self.search(node, k)
        mode = "and" if flat_and else "or"
        boosts = self._term_boosts(node)
        terms = sorted(boosts)
        dfs = self.term_dfs(terms)
        weights = {t: bm25_idf(self.n_docs, dfs[t]) * boosts[t] for t in terms if t in dfs}
        if not weights or (mode == "and" and len(weights) < len(terms)):
            return self.spark.createDataFrame([], "doc_id long, score double")

        if n_bins is None:
            n_bins = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        bin_width = max(1, -(-self.n_docs // n_bins))
        buckets = sorted({term_bucket(t) for t in weights})

        # partition-pruned scan: bucket prunes directories, term prunes
        # row groups via dictionary/min-max
        segs = (
            self.segments.filter(
                F.col("bucket").isin(buckets) & F.col("term").isin(list(weights))
            )
            .withColumn(
                "bin",
                F.explode(
                    F.sequence(
                        (F.col("first_doc") / F.lit(bin_width)).cast("int"),
                        (F.col("last_doc") / F.lit(bin_width)).cast("int"),
                    )
                ),
            )
        )
        w_map = dict(weights)
        avg_dl, k1, b = self.avg_dl, self.k1, self.b
        kk = k
        bw = bin_width
        excl = self._tombstone_ids

        def run_bin(key, pdf: pd.DataFrame) -> pd.DataFrame:
            (bin_id,) = key
            lo, hi = bin_id * bw, (bin_id + 1) * bw
            per_term: dict[str, tuple[float, list[dict]]] = {}
            for row in pdf.itertuples(index=False):
                d = row._asdict() if hasattr(row, "_asdict") else dict(row)
                per_term.setdefault(d["term"], (w_map[d["term"]], []))[1].append(d)
            for t in w_map:
                per_term.setdefault(t, (w_map[t], []))
            top = wand_bin(per_term, lo, hi, kk, avg_dl, k1, b, mode=mode, exclude=excl)
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([d for d, _ in top], dtype="int64"),
                    "score": pd.Series([s for _, s in top], dtype="float64"),
                }
            )

        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("score", T.DoubleType(), False),
            ]
        )
        candidates = segs.groupBy("bin").applyInPandas(run_bin, schema=out_schema)
        return candidates.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
