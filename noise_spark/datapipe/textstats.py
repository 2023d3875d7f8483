"""Text analysis for training-data pipelines: language id, quality
scoring, token counting, fingerprinting. Column expressions only."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "que", "une", "dans", "pour"],
    "es": ["el", "la", "que", "de", "los", "una", "por", "con", "para", "es"],
}


def _tokens(text_col: str):
    return F.split(F.col(text_col), " ", -1)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(_tokens(text_col)).cast("long"))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / distinct-ratio / mean-token-length / punctuation-ratio —
    the standard cheap quality gates for web text."""
    toks = _tokens(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^\.,;:!?]", ""))
    return df.select(
        "*",
        n.cast("long").alias("n_tokens"),
        (nd.cast("double") / n).alias("distinct_ratio"),
        ((F.length(text_col) - n + 1).cast("double") / n).alias("mean_tok_len"),
        (n_punct.cast("double") / F.greatest(F.length(text_col), F.lit(1))).alias(
            "punct_ratio"
        ),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language id: argmax over per-language stopword
    hit counts; 'und' (undetermined) when nothing matches. Ties broken
    by language code order (deterministic)."""
    toks = F.array_distinct(_tokens(text_col))
    scores = []
    langs = sorted(STOPWORDS)
    for i, lang in enumerate(langs):
        hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
        # prio descends with code order so array_max (which picks the
        # lexicographically LAST struct on hit ties) lands on the FIRST
        # language code — ties genuinely break by code order
        scores.append(
            F.struct(
                hits.alias("hits"),
                F.lit(len(langs) - 1 - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "pred_lang",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set (bag fingerprint — robust to token reordering)."""
    return df.withColumn(
        "fp",
        F.md5(F.array_join(F.array_sort(F.array_distinct(_tokens(text_col))), " ")),
    )
