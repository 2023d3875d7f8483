"""Reference-transcript replay — execute the reference's own REPL test
files (``/root/reference/repl-tests/*.noise``) against this engine and
compare every statement's output with the transcript's pinned result.

A transcript is a sequence of ``;``-terminated statements, each
followed by its expected output block (JSON values, an id echo, or an
error message), e.g.::

    add {"_id":"1", "A":"word"};
    "1"
    find {A: ~= "word"};
    [
    "1"
    ]

Replay drives the real stack end-to-end: documents go through
schemaless ingestion (:mod:`noise_spark.ingest` — per-field inference
with VARIANT fallback), a real index build
(:func:`noise_spark.index.build.build_index`), and the full query
language (:func:`noise_spark.query.parser.run_query`). Write-batch
semantics (duplicate-id / delete-before-commit errors) mirror the
reference REPL (``src/repl.rs`` + ``repl-tests/deletion_updates.noise``).

Outcomes per statement: ``pass`` (output equal), ``diverge`` (ran,
output differs — e.g. raw ``score()`` float values: this engine scores
BM25 where the reference scores TF-IDF, a deliberate north-star
replacement), ``skip`` (feature documented as out of scope), ``error``
(unexpected exception — a bug). ``tests/test_repl_transcripts.py``
pins the per-transcript outcome counts and the exact divergence lists.
"""

from __future__ import annotations

import json
import math
import re
import shutil
import tempfile
from dataclasses import dataclass, field

__all__ = ["Stmt", "parse_transcript", "ReplaySession", "replay"]

_COMMANDS = ("drop ", "create ", "add ", "del ", "commit", "find", "params ")


@dataclass
class Stmt:
    line: int
    text: str  # statement text, ';' stripped
    expected: str  # raw expected block ('' if none)


def parse_transcript(path: str) -> list[Stmt]:
    lines = open(path, encoding="utf-8").read().splitlines()
    stmts: list[Stmt] = []
    i = 0
    n = len(lines)
    while i < n:
        ln = lines[i].strip()
        if not ln or ln.startswith("#"):
            i += 1
            continue
        # statement: accumulate until the ';' terminator line
        start = i
        buf = []
        while i < n:
            s = lines[i].rstrip()
            buf.append(s)
            i += 1
            if s.rstrip().endswith(";"):
                break
        text = "\n".join(buf).rstrip().rstrip(";").strip()
        # expected block: either nothing (next statement follows), one
        # scalar/status line, or a '[' ... ']' multi-line JSON array
        while i < n and (not lines[i].strip() or lines[i].strip().startswith("#")):
            i += 1
        exp: list[str] = []
        if i < n:
            s = lines[i].strip()
            if not any(s.startswith(c) for c in _COMMANDS):
                exp.append(s)
                i += 1
                if s.startswith("[") and s != "[]" and not s.endswith("]"):
                    while i < n:
                        s = lines[i].strip()
                        exp.append(s)
                        i += 1
                        if s == "]":
                            break
        stmts.append(Stmt(start + 1, text, "\n".join(exp)))
    return stmts


# reference REPL error texts (src/repl.rs / deletion_updates.noise)
ERR_NOT_OPEN = "Index isn't open"
ERR_DUP_ADD = "Write error: Attempt to insert multiple docs with same _id"
ERR_DEL_PENDING = "Write error: Attempt to delete doc with same _id added earlier"


class ReplaySession:
    """Replays one transcript's statements against a real index."""

    def __init__(self, spark, workdir: str | None = None, analyzer: str = "porter"):
        self.spark = spark
        # the reference's keypaths are case-sensitive (`a` and `A` are
        # different keys — query_basic.noise:256 adds both); Spark's
        # default resolver is not
        self._case_was = spark.conf.get("spark.sql.caseSensitive", "false")
        spark.conf.set("spark.sql.caseSensitive", "true")
        self.workdir = workdir or tempfile.mkdtemp(prefix="noise_replay_")
        self.analyzer = analyzer
        self.open = False
        self.committed: dict[str, dict] = {}  # _id -> doc (insertion-ordered)
        self.pending_adds: dict[str, dict] = {}
        self.pending_dels: set[str] = set()
        self.params: dict | None = None
        self._gen = 0
        self._reader = None

    # -- write-batch semantics (deletion_updates.noise) ---------------------
    def do_create(self, _path: str) -> str | None:
        self.open = True
        self.committed.clear()
        self.pending_adds.clear()
        self.pending_dels.clear()
        self._reader = None
        return None

    def do_drop(self, _path: str) -> str | None:
        self.open = False
        self.committed.clear()
        self.pending_adds.clear()
        self.pending_dels.clear()
        self._reader = None
        return None

    def do_add(self, doc_json: str) -> str:
        if not self.open:
            return ERR_NOT_OPEN
        doc = json.loads(doc_json)
        _id = doc.get("_id")
        if _id in self.pending_dels:
            # a pending delete blocks re-adding the id until commit
            # (deletion_updates.noise:31-37); a plain re-add is an
            # UPSERT that takes a fresh seq slot (group.noise:150+)
            return ERR_DUP_ADD
        self.pending_adds.pop(_id, None)
        self.pending_adds[_id] = doc
        self._reader = None
        return _id

    def do_del(self, _id: str) -> str:
        if not self.open:
            return ERR_NOT_OPEN
        if _id in self.pending_adds:
            return ERR_DEL_PENDING
        if _id not in self.committed:
            return "not found"
        self.pending_dels.add(_id)
        self._reader = None
        return "ok"

    def do_commit(self) -> None:
        for d in self.pending_dels:
            self.committed.pop(d, None)
        for k, v in self.pending_adds.items():
            self.committed.pop(k, None)  # re-add after delete+commit: upsert
            self.committed[k] = v
        self.pending_adds.clear()
        self.pending_dels.clear()

    def visible_docs(self) -> list[dict]:
        """find sees committed ∪ pending adds − pending deletes
        (query_basic finds without commit; ranges.noise del before
        find); a pending re-add SHADOWS the committed version and takes
        a fresh seq slot at the end."""
        out = [
            v
            for k, v in self.committed.items()
            if k not in self.pending_dels and k not in self.pending_adds
        ]
        out += list(self.pending_adds.values())
        return out

    # -- index ---------------------------------------------------------------
    def reader(self):
        from .index.build import BuildConfig, build_index
        from .ingest import FULLDOC_COL, ingest_json
        from .query.engine import IndexReader

        if self._reader is not None:
            return self._reader
        docs = self.visible_docs()
        if not docs:
            return None
        df = ingest_json(self.spark, [json.dumps(d) for d in docs])
        from pyspark.sql import types as T

        extra = tuple(
            f.name
            for f in df.schema.fields
            if f.name not in ("doc_id", "url")
            and not (
                isinstance(f.dataType, T.StringType)
                or (
                    isinstance(f.dataType, T.ArrayType)
                    and isinstance(f.dataType.elementType, T.StringType)
                )
            )
        )
        has_text = any(
            isinstance(f.dataType, T.StringType)
            or (
                isinstance(f.dataType, T.ArrayType)
                and isinstance(f.dataType.elementType, T.StringType)
            )
            for f in df.schema.fields
            if f.name not in ("url", "doc_id", FULLDOC_COL)
        )
        self._gen += 1
        idx = f"{self.workdir}/idx{self._gen}"
        shutil.rmtree(idx, ignore_errors=True)
        cfg = BuildConfig(
            analyzer=self.analyzer,
            fields="auto" if has_text else ("__no_text__",),
            doc_id_col="doc_id",
            extra_doc_cols=extra,
            block_size=8,
        )
        if not has_text:
            # a corpus with no string content still needs a (empty)
            # index: give the build one all-null string column
            from pyspark.sql import functions as F

            df = df.withColumn("__no_text__", F.lit(None).cast("string"))
            cfg = BuildConfig(
                analyzer=self.analyzer,
                fields=("__no_text__",),
                doc_id_col="doc_id",
                extra_doc_cols=extra,
                block_size=8,
            )
        build_index(self.spark, df, idx, cfg)
        if self._gen > 1:
            shutil.rmtree(f"{self.workdir}/idx{self._gen - 1}", ignore_errors=True)
        self._reader = IndexReader(self.spark, idx)
        return self._reader

    # -- query + render ------------------------------------------------------
    def do_find(self, text: str) -> list:
        from .query.parser import parse_query, run_query

        # find implicitly commits the write batch: the reference's del
        # of a just-added doc errors ONLY when no query ran in between
        # (deletion_updates.noise:20 vs ranges.noise:41 — same shape,
        # different outcome, the find between is the difference)
        self.do_commit()
        params, self.params = self.params, None  # params apply to ONE query
        reader = self.reader()
        if reader is None:
            return []
        spec = parse_query(text, params, analyzer=self.analyzer)
        # the reference REPL has no implicit top-k: default_k=None
        df = run_query(reader, text, params=params, default_k=None)
        rows = df.collect()
        return [_render_row(r, spec, df.columns) for r in rows]

    def execute(self, stmt: Stmt):
        """Run one statement; returns (rendered_output, expected_value)
        where rendered_output is a JSON value, an error/status string,
        or None (no output)."""
        t = stmt.text
        if t.startswith("drop "):
            return self.do_drop(t[5:]), None
        if t.startswith("create "):
            return self.do_create(t[7:]), None
        if t.startswith("add "):
            out = self.do_add(t[4:])
            return out, None
        if t.startswith("del "):
            return self.do_del(t[4:].strip().strip('"')), None
        if t == "commit":
            return self.do_commit(), None
        if t.startswith("params "):
            self.params = json.loads(t[7:])
            return None, None
        if t.startswith("find"):
            return self.do_find(t), None
        raise ValueError(f"unknown transcript statement at line {stmt.line}: {t!r}")


def _render_value(v):
    """A collected cell → JSON value (VariantVal → python, Row →
    object, Decimal → number)."""
    import decimal

    from pyspark.sql import Row
    from pyspark.sql.types import VariantVal

    if isinstance(v, VariantVal):
        return _render_value(v.toPython())
    if isinstance(v, Row):
        return {k: _render_value(x) for k, x in v.asDict().items()}
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, dict):
        return {k: _render_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_render_value(x) for x in v]
    return v


def _render_row(row, spec, columns):
    """One result row → the reference's JSON value for that row."""
    from .ingest import FULLDOC_COL
    from .query.parser import RetObject, RetWholeDoc

    if isinstance(spec.ret, RetWholeDoc) and FULLDOC_COL in columns:
        # `return .` on a schemaless index: the whole original document
        # IS the _doc variant (null-vs-missing faithful); _id is url
        doc = _render_value(row[FULLDOC_COL])
        return doc
    vals = [_render_value(row[c]) for c in columns]
    if spec.ret is None:
        return vals[0]  # the id column
    if isinstance(spec.ret, RetObject):
        return dict(zip(columns, vals))
    if len(columns) == 1:
        return vals[0]
    return dict(zip(columns, vals))


def _num_eq(a, b) -> bool:
    try:
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
    except (TypeError, ValueError):
        return False


def _num_eq_str(got: str, want) -> bool:
    try:
        return _num_eq(float(got), want)
    except ValueError:
        return False


def json_equal(got, want) -> bool:
    """Order-sensitive JSON equality with float tolerance. A STRING on
    our side may equal a non-string scalar on the reference side via
    its JSON rendering — the engine string-renders constructed-array
    elements (mixed-type arrays in one typed column; a documented
    rendering choice, parser._ret_column RetArray), so ``1`` arrives
    as ``"1"``."""
    if isinstance(want, bool) or isinstance(got, bool):
        if isinstance(got, str) and not isinstance(want, str):
            return got == json.dumps(want)
        return got is want
    if isinstance(want, (int, float)) and isinstance(got, (int, float)):
        return _num_eq(got, want)
    if isinstance(want, list) and isinstance(got, list):
        return len(got) == len(want) and all(
            json_equal(g, w) for g, w in zip(got, want)
        )
    if isinstance(want, dict) and isinstance(got, dict):
        return set(want) == set(got) and all(
            json_equal(got[k], want[k]) for k in want
        )
    if isinstance(got, str) and not isinstance(want, str) and want is not None:
        if isinstance(want, (int, float)):
            return _num_eq_str(got, want)
        return got == json.dumps(want)
    return got == want


@dataclass
class StmtResult:
    line: int
    text: str
    outcome: str  # pass / diverge / skip / error
    detail: str = ""


def replay(spark, path: str, skip: dict | None = None, analyzer: str = "porter") -> list[StmtResult]:
    """Replay a transcript; ``skip`` maps statement line numbers to a
    documented reason (counted as ``skip``, not executed)."""
    skip = skip or {}
    sess = ReplaySession(spark, analyzer=analyzer)
    results: list[StmtResult] = []
    try:
        for stmt in parse_transcript(path):
            if stmt.line in skip:
                results.append(StmtResult(stmt.line, stmt.text, "skip", skip[stmt.line]))
                continue
            exp_raw = stmt.expected
            try:
                got, _ = sess.execute(stmt)
            except Exception as e:  # noqa: BLE001 — errors may be EXPECTED
                msg = f"Parse error: {e}" if type(e).__name__ == "ParseError" else str(e)
                if exp_raw and exp_raw.strip() == msg:
                    results.append(StmtResult(stmt.line, stmt.text, "pass"))
                else:
                    results.append(
                        StmtResult(stmt.line, stmt.text, "error", f"{type(e).__name__}: {e}")
                    )
                continue
            if not exp_raw:
                results.append(StmtResult(stmt.line, stmt.text, "pass"))
                continue
            # expected: JSON value or literal status/error text
            try:
                want = json.loads(exp_raw)
                is_json = True
            except ValueError:
                want = exp_raw.strip()
                is_json = False
            if is_json:
                ok = json_equal(got, want)
            else:
                ok = got == want
            if ok:
                results.append(StmtResult(stmt.line, stmt.text, "pass"))
            else:
                results.append(
                    StmtResult(
                        stmt.line,
                        stmt.text,
                        "diverge",
                        f"got {json.dumps(got, default=str)[:300]} want {exp_raw[:300]}",
                    )
                )
    finally:
        spark.conf.set("spark.sql.caseSensitive", sess._case_was)
        shutil.rmtree(sess.workdir, ignore_errors=True)
    return results


def main():  # pragma: no cover — CLI convenience
    import sys

    from .session import get_spark

    spark = get_spark("noise_replay")
    for path in sys.argv[1:]:
        rs = replay(spark, path)
        counts: dict[str, int] = {}
        for r in rs:
            counts[r.outcome] = counts.get(r.outcome, 0) + 1
            if r.outcome != "pass":
                print(f"  {r.outcome} L{r.line}: {r.text[:80]!r} {r.detail[:200]}")
        print(path.split("/")[-1], counts)


if __name__ == "__main__":  # pragma: no cover
    main()
