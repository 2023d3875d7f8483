"""Pinned pure-Python single-node oracle — the rank-identity ground truth.

Plays the role of the reference's golden-transcript corpus (SURVEY.md
§5): the Spark engine's top-k must be rank-identical (docIDs AND
scores) to this implementation. Scoring is BM25 (k1=1.2, b=0.75) with
the exact same floating-point expression shape and summation order
(ascending term order) as the engine, so scores are bitwise-comparable,
with ties broken by ascending docID.

Semantics mirrored from the reference's filter tree:
- boolean AND/OR/NOT over match sets (src/filters.rs:728-1066)
- phrase = strictly consecutive positions (src/filters.rs:206-213)
- proximity = all terms within an N-word window (src/filters.rs:588-726)
- exact match scored 1.0 (src/filters.rs:363-368)
"""

from __future__ import annotations

from ..analysis.tokenizer import analyze
from ..query import plan as P
from ..scoring import BM25_B, BM25_K1, bm25_idf, bm25_tf_norm  # noqa: F401


class OracleIndex:
    def __init__(self, docs, analyzer: str = "porter", k1: float = BM25_K1, b: float = BM25_B):
        """``docs``: iterable of (doc_id, text)."""
        self.k1, self.b = k1, b
        self.analyzer = analyzer
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.dl: dict[int, int] = {}
        self.text: dict[int, str] = {}
        for doc_id, text in docs:
            toks = analyze(text if text is not None else "", analyzer)
            self.dl[doc_id] = len(toks)
            self.text[doc_id] = text
            for pos, term in toks:
                self.postings.setdefault(term, {}).setdefault(doc_id, []).append(pos)
        self.n_docs = len(self.dl)
        total = sum(self.dl.values())
        self.avg_dl = float(total) / max(self.n_docs, 1)

    # -- match sets -----------------------------------------------------------
    def _match(self, node: P.Node) -> set[int]:
        if isinstance(node, P.Term):
            return set(self.postings.get(node.term, {}))
        if isinstance(node, P.Or):
            out: set[int] = set()
            for c in node.children:
                out |= self._match(c)
            return out
        if isinstance(node, P.And):
            sets = [self._match(c) for c in node.children]
            out = sets[0]
            for s in sets[1:]:
                out &= s
            return out
        if isinstance(node, P.Not):
            return self._match(node.positive) - self._match(node.negative)
        if isinstance(node, P.Phrase):
            return self._phrase_match(node.terms)
        if isinstance(node, P.Proximity):
            return self._proximity_match(node.terms, node.window)
        if isinstance(node, P.ExactMatch):
            return {d for d, t in self.text.items() if t == node.literal}
        raise TypeError(type(node))

    def _phrase_match(self, terms) -> set[int]:
        lists = [self.postings.get(t, {}) for t in terms]
        docs = set(lists[0])
        for pl in lists[1:]:
            docs &= set(pl)
        out = set()
        for d in docs:
            cand = lists[0][d]
            for i, pl in enumerate(lists[1:], start=1):
                s = set(pl[d])
                cand = [p for p in cand if p + i in s]
                if not cand:
                    break
            if cand:
                out.add(d)
        return out

    def _proximity_match(self, terms, window: int) -> set[int]:
        lists = [self.postings.get(t, {}) for t in terms]
        docs = set(lists[0])
        for pl in lists[1:]:
            docs &= set(pl)
        out = set()
        k = len(terms)
        for d in docs:
            events = sorted(
                (p, i) for i, pl in enumerate(lists) for p in pl[d]
            )
            need = {}
            have = 0
            lo = 0
            for hi in range(len(events)):
                _, ti = events[hi]
                need[ti] = need.get(ti, 0) + 1
                if need[ti] == 1:
                    have += 1
                while have == k:
                    if events[hi][0] - events[lo][0] <= window:
                        out.add(d)
                        have = -1_000  # found; break out
                        break
                    tlo = events[lo][1]
                    need[tlo] -= 1
                    if need[tlo] == 0:
                        have -= 1
                    lo += 1
                if have < 0:
                    break
            # reset for next doc handled by loop scope
        return out

    # -- scoring ----------------------------------------------------------------
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

    def search(self, node: P.Node, k: int = 10) -> list[tuple[int, float]]:
        matched = self._match(node)
        if isinstance(node, P.ExactMatch):
            ranked = sorted(matched)[:k]
            return [(d, 1.0) for d in ranked]
        boosts = self._term_boosts(node)
        scored = []
        # weights computed once, same op order as the engine (idf * boost)
        weights = {
            t: bm25_idf(self.n_docs, len(self.postings[t])) * boosts[t]
            for t in sorted(boosts)
            if t in self.postings
        }
        for d in matched:
            dl = float(self.dl[d])
            acc = 0.0
            for term in sorted(weights):
                pl = self.postings[term]
                if d in pl:
                    tf = float(len(pl[d]))
                    acc = acc + weights[term] * bm25_tf_norm(tf, dl, self.avg_dl, self.k1, self.b)
            scored.append((d, acc))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
