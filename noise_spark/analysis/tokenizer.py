"""Text analysis: segmentation + normalization + stemming.

Re-expresses the reference's tokenizer semantics
(``/root/reference/src/stems.rs:23-63``):

1. segment raw text on word boundaries (the reference uses UAX-29
   ``split_word_bound_indices``; here a UAX-29-compatible regex over
   ``\\p{L}\\p{N}\\p{M}_`` runs with medial apostrophes, with every other
   char its own segment — identical on all the reference's own fixtures),
2. NFKC-normalize each segment,
3. keep segments whose first normalized char is alphabetic; lowercase
   and Snowball-English stem them,
4. positions are a dense token counter (0,1,2,...) over kept tokens,
5. if NO token is alphabetic, emit a single token at position 0 equal
   to the concatenation of the NFKC'd segments (the reference's
   non-alpha fallback, ``src/stems.rs:49-59``).

The same function is used driver-side (oracle, query parsing) and
executor-side (inside Arrow-batched pandas UDFs) so extraction is
byte-identical per url by construction.
"""

from __future__ import annotations

import unicodedata
from typing import List, Tuple

try:  # `regex` supports \p{...} classes; fall back to a close stdlib variant
    import regex as _re

    _WORD_RE = _re.compile(
        r"[\p{L}\p{N}_][\p{L}\p{N}\p{M}_]*(?:['’][\p{L}\p{N}\p{M}_]+)*"
        r"|\X",
        _re.DOTALL,
    )
except ImportError:  # pragma: no cover
    import re as _re

    _WORD_RE = _re.compile(r"\w+(?:['’]\w+)*|.", _re.DOTALL)

from . import porter2


def segments(text: str):
    """Yield UAX-29-style word-boundary segments of ``text``."""
    for m in _WORD_RE.finditer(text):
        yield m.group()


def _normalize(seg: str) -> str:
    # ASCII is NFKC-invariant — the overwhelming web-text case skips the
    # normalization call entirely (str.isascii is a C-level scan)
    return seg if seg.isascii() else unicodedata.normalize("NFKC", seg)


# segment-level memo: raw segment -> stemmed/lowered term, or None for
# non-alphabetic segments. Web text is Zipf-distributed, so the hit rate
# is ~1 after warm-up and the whole normalize→isalpha→lower→stem chain
# collapses to one dict probe per repeated segment. Keyed on the RAW
# segment, so cached and uncached paths are byte-identical. Bounded per
# executor worker; two caches because `stem` changes the mapping.
_SEG_CACHE_MAX = 1_000_000
_SEG_CACHE: dict = {True: {}, False: {}}
_MISS = object()


def stems(text: str, stem: bool = True) -> List[Tuple[int, str]]:
    """Tokenize ``text`` → list of ``(word_pos, term)``.

    Mirrors ``Stems::next`` (``src/stems.rs:36-63``): dense positions over
    alphabetic tokens; non-alpha fallback emits the whole normalized text
    as one token when nothing alphabetic exists (including empty text).
    """
    out: List[Tuple[int, str]] = []
    non_alpha: List[str] = []
    pos = 0
    cache = _SEG_CACHE[stem]
    # findall returns the matched strings directly (no Match objects —
    # the pattern's only group-free alternation makes this equivalent to
    # [m.group() for m in finditer])
    for seg in _WORD_RE.findall(text):
        tok = cache.get(seg, _MISS)
        if tok is _MISS:
            norm = _normalize(seg)
            if norm and norm[0].isalpha():
                low = norm.lower()
                tok = porter2.stem_cached(low) if stem else low
            else:
                tok = None
            if len(cache) < _SEG_CACHE_MAX:
                cache[seg] = tok
        if tok is not None:
            out.append((pos, tok))
            pos += 1
        elif pos == 0:
            non_alpha.append(_normalize(seg))
    if not out:
        return [(0, "".join(non_alpha))]
    return out


def whitespace_terms(text: str) -> List[Tuple[int, str]]:
    """Exact single-space split with positional indexes.

    Analyzer used for the driver-correctness queries over the synthetic
    ``documents`` table, chosen because it is exactly expressible in ANSI
    SQL (``string_split(text, ' ')`` / ``split(text, ' ')``), which keeps
    the Spark engine and the DuckDB oracle term-identical.
    """
    return list(enumerate(text.split(" ")))


ANALYZERS = {
    "porter": lambda t: stems(t, stem=True),
    "simple": lambda t: stems(t, stem=False),
    "whitespace": whitespace_terms,
}


def analyze(text: str, analyzer: str = "porter") -> List[Tuple[int, str]]:
    return ANALYZERS[analyzer](text)
