"""Interactive CLI — the re-expression of the reference's REPL
(``/root/reference/src/repl.rs:68-207``: create/open/add/del/commit/
find/dumpkeys). Commands:

    open <index_dir>            open (or create on first commit) an index
    add <url> <text...>         buffer a document
    add {"url": ..., "text": ...}   buffer a document as JSON
    commit                      append buffered docs as a new generation
    del <url>                   tombstone a document
    find <query>                top-10 BM25 (flat mini-syntax below)
    query <noise query>         full Noise query language:
                                find {f: ~= "w" && ...} order ... return ... limit N
                                (noise_spark.query.parser — params, boosts,
                                nested booleans, NOT-legality errors)
    stats                       corpus stats
    stages                      manifest stage listing (the 'dumpkeys')
    compact <out_dir>           fold generations minus tombstones into a
                                fresh base at out_dir (docIDs preserved)
    gc [max_gens] [max_frac]    compaction-policy check (manifest
                                metrics only); prints the decision inputs
    exit

Query syntax (flat re-expression of Noise's find clause):
    word word        → OR of terms          {f: ~= "w"} ∥ ...
    +word            → required (AND)       a && b
    -word            → excluded (NOT)       !
    "multi word"     → phrase               {f: ~= "w1 w2"}
    ~N "w1 w2"       → proximity            {f: ~N= "w1 w2"}
    word^2.5         → boost                expr^N
"""

from __future__ import annotations

import json
import shlex
import sys

from .analysis.tokenizer import analyze
from .query import plan as P


def parse_query(text: str, analyzer: str = "porter") -> P.Node:
    """Parse the mini query syntax into a plan node."""
    toks = shlex.split(text, posix=False)
    must: list[P.Node] = []
    should: list[P.Node] = []
    must_not: list[P.Node] = []
    i = 0
    while i < len(toks):
        tok = toks[i]
        target = should
        window = None
        if tok.startswith("~") and tok[1:].isdigit():
            window = int(tok[1:])
            i += 1
            tok = toks[i]
        if tok.startswith("+"):
            target, tok = must, tok[1:]
        elif tok.startswith("-"):
            target, tok = must_not, tok[1:]
        boost = 1.0
        if "^" in tok and not tok.startswith('"'):
            tok, bs = tok.rsplit("^", 1)
            boost = float(bs)
        if tok.startswith('"') and tok.endswith('"'):
            terms = tuple(t for _, t in analyze(tok[1:-1], analyzer))
            node: P.Node = (
                P.Proximity(terms, window=window, boost=boost)
                if window is not None
                else P.Phrase(terms, boost=boost)
            )
        else:
            stemmed = [t for _, t in analyze(tok, analyzer)]
            node = P.Term(stemmed[0] if stemmed else tok, boost=boost)
        target.append(node)
        i += 1

    if must and should:
        positive: P.Node = P.And(tuple(must + [P.Or(tuple(should))]))
    elif must:
        positive = P.And(tuple(must)) if len(must) > 1 else must[0]
    elif should:
        positive = P.Or(tuple(should)) if len(should) > 1 else should[0]
    else:
        raise ValueError("query has no positive clause (all-negated queries are illegal, as in the reference)")
    if must_not:
        negative = P.Or(tuple(must_not)) if len(must_not) > 1 else must_not[0]
        return P.Not(positive, negative)
    return positive


def repl(index_dir: str | None = None):  # pragma: no cover — interactive
    import datetime

    from .index.build import BuildConfig
    from .index.incremental import append_docs, delete_docs
    from .query.engine import IndexReader
    from .session import get_spark

    spark = get_spark("noise_spark_cli")
    buffered: list[tuple] = []
    print("noise_spark CLI — 'help' for commands")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            continue
        cmd, _, rest = line.partition(" ")
        try:
            if cmd == "exit":
                break
            elif cmd == "help":
                print(__doc__)
            elif cmd == "open":
                index_dir = rest.strip()
                print(f"index: {index_dir}")
            elif cmd == "add":
                if rest.lstrip().startswith("{"):
                    d = json.loads(rest)
                    buffered.append((d["url"], datetime.datetime.now(), d["text"], d.get("lang", "en")))
                else:
                    url, _, text = rest.partition(" ")
                    buffered.append((url, datetime.datetime.now(), text, "en"))
                print(f"buffered {len(buffered)} doc(s)")
            elif cmd == "commit":
                df = spark.createDataFrame(
                    buffered, "url string, warc_ts timestamp, text string, lang string"
                )
                info = append_docs(spark, index_dir, df, BuildConfig())
                buffered.clear()
                print(json.dumps({k: v for k, v in info.items() if k != "stages"}, default=str))
            elif cmd == "del":
                print(delete_docs(spark, index_dir, [rest.strip()]))
            elif cmd == "find":
                reader = IndexReader(spark, index_dir)
                node = parse_query(rest)
                for r in reader.search(node, k=10).collect():
                    print(f"  {r['doc_id']}\t{r['score']:.6f}")
            elif cmd == "query":
                from .query.parser import run_query

                reader = IndexReader(spark, index_dir)
                for r in run_query(reader, line[len("query "):]).collect():
                    print(" ", json.dumps(r.asDict(recursive=True), default=str))
            elif cmd == "stats":
                reader = IndexReader(spark, index_dir)
                print(json.dumps({"n_docs": reader.n_docs, "avg_dl": reader.avg_dl}))
            elif cmd == "stages":
                from .index.catalog import IndexCatalog

                m = IndexCatalog(index_dir).current_manifest()
                for name, info in sorted(m["stages"].items()):
                    print(f"  {name}: rows={info['rows']} files={info['files']}")
            elif cmd == "compact":
                from .index.incremental import compact

                out = rest.strip()
                compact(spark, index_dir, out)
                print(f"compacted -> {out}")
            elif cmd == "gc":
                from .index.incremental import compaction_due

                args = rest.split()
                kw = {}
                if args:
                    kw["max_generations"] = int(args[0])
                if len(args) > 1:
                    kw["max_tombstone_frac"] = float(args[1])
                print(json.dumps(compaction_due(spark, index_dir, **kw)))
            else:
                print(f"unknown command: {cmd}")
        except Exception as e:  # noqa: BLE001
            print(f"error: {e}")


if __name__ == "__main__":  # pragma: no cover
    repl(sys.argv[1] if len(sys.argv) > 1 else None)
