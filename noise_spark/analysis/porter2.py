"""Porter2 (Snowball English) stemmer — pure-Python implementation.

Implements the public Snowball "english" algorithm
(https://snowballstem.org/algorithms/english/stemmer.html), the same
algorithm the reference engine invokes through libstemmer
(``/root/reference/src/stems.rs:27`` — ``Stemmer::new("english")``).
Written from the published algorithm description; no code is derived
from the reference repo.

The stemmer is deterministic and dependency-free so the exact same
function runs driver-side (query parsing, the pure-Python oracle) and
executor-side (inside Arrow-batched pandas UDFs).
"""

from __future__ import annotations

VOWELS = frozenset("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms applied before the algorithm proper.
_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Words to leave alone after step 1a.
_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)

_STEP2_SUFFIXES = (
    # (suffix, replacement) — longest match wins; special-cased: ogi, li
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
)

_STEP3_SUFFIXES = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4_SUFFIXES = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "al",
    "er",
    "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _regions(word: str) -> tuple[int, int]:
    """Return (r1_start, r2_start) per the Porter2 definition."""
    n = len(word)
    r1 = n
    # special prefixes
    for pref in ("gener", "commun", "arsen"):
        if word.startswith(pref):
            r1 = len(pref)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        # vowel at n-2, non-vowel (not w,x,Y) at n-1, non-vowel at n-3
        return (
            _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
            and not _is_vowel(word, n - 3)
        )
    return False


def _contains_vowel(word: str, start: int, end: int) -> bool:
    return any(word[i] in VOWELS for i in range(start, end))


def stem(word: str) -> str:
    """Stem one already-lowercased word (non a-z chars are treated as
    consonants, matching Snowball's behavior on unusual input)."""
    if len(word) <= 2:
        return word

    # strip leading apostrophe
    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word

    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    # mark y consonants as Y
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # Step 0: longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word, 0, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part, 0, len(stem_part)):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(DOUBLES):
                        word = word[:-1]
                    elif _ends_short_syllable(word) and r1 >= len(word):
                        word += "e"
                break

    # Step 1c: y/Y -> i
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in VOWELS:
        word = word[:-1] + "i"

    # Step 2 (suffix must lie in R1)
    for suf, repl in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and len(word) >= 4 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and len(word) >= 3 and word[-3] in LI_ENDING:
                word = word[:-2]

    # Step 3 (suffix in R1; 'ative' requires R2)
    if word.endswith("ative"):
        if len(word) - 5 >= r2:
            word = word[:-5]
    else:
        for suf, repl in _STEP3_SUFFIXES:
            if word.endswith(suf):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)] + repl
                break

    # Step 4 (suffix in R2)
    if word.endswith("ion"):
        if len(word) - 3 >= r2 and len(word) >= 4 and word[-4] in "st":
            word = word[:-3]
    else:
        for suf in _STEP4_SUFFIXES:
            if word.endswith(suf):
                if len(word) - len(suf) >= r2:
                    word = word[: -len(suf)]
                break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


_CACHE: dict = {}
_CACHE_MAX = 1_000_000


def stem_cached(word: str) -> str:
    """Memoized stem — web text is Zipf-distributed, so the hit rate is
    near 1 after warm-up; bounded so a huge vocab can't exhaust memory."""
    v = _CACHE.get(word)
    if v is None:
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.clear()
        v = stem(word)
        _CACHE[word] = v
    return v
