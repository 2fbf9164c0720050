"""Text-analysis operators for large-scale training-data pipelines.

Not part of the reference surface (GDS is a graph engine) — these are
the standard corpus-prep operators a 100 TB documents table needs:
language ID, quality scoring, token counting, document fingerprinting.
All are pure Column expressions (whole-stage codegen, no UDFs) and
aggregate-free per row, so they scale linearly with the scan and push
down column pruning to parquet (only `doc_id`/`text` read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small deterministic stopword lists for the n-gram/stopword language
# heuristic (language ID without models)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased), empty tokens dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0)


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish subword segmentation via regex: words, numbers, and
    punctuation runs as separate tokens (a deterministic proxy for a
    real tokenizer's pre-tokenization)."""
    return F.filter(
        F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+)"), 1),
        lambda t: F.length(t) > 0,
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars_seen)."""
    return df.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        F.length(text_col).alias("n_chars_seen"),
    )


def quality_columns(text_col: str = "text") -> dict:
    """The quality feature expressions keyed by output column name —
    pure Columns, reusable on batch AND streaming frames (the streaming
    document pipeline composes these verbatim, so the batch DuckDB
    oracle gates the exact expressions the stream runs)."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    alpha = (
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
        / F.greatest(F.length(text_col), F.lit(1))
    )
    mean_wl = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    stop_ratio = sw_hits / F.greatest(n_tok, F.lit(1)).cast("double")
    score = (
        F.least(F.lit(1.0), n_tok / F.lit(20.0))
        * alpha
        * F.least(F.lit(1.0), stop_ratio * 5.0 + 0.5)
    )
    return {
        "n_tokens": n_tok,
        "mean_word_len": F.round(mean_wl, 4),
        "alpha_ratio": F.round(alpha, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "quality": F.round(score, 4),
    }


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + combined score:
      - mean_word_len: avg token length
      - alpha_ratio: alphabetic chars / total chars
      - stopword_ratio: english stopword hits / tokens
      - score: product-style combination in [0, 1]
    """
    cols = quality_columns(text_col)
    return df.select("doc_id", *[expr.alias(name) for name, expr in cols.items()])


def language_columns(text_col: str = "text") -> dict:
    """pred_lang / stopword_hits expressions (pure Columns — see
    quality_columns for the batch/streaming reuse contract)."""
    toks = tokens(F.col(text_col))

    def _hits(words):
        sw = F.array([F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))

    langs = list(STOPWORDS)
    hits = {lang: _hits(words) for lang, words in STOPWORDS.items()}
    best = F.greatest(*[hits[l] for l in langs])
    pred = F.lit("und")
    # reverse order so earlier languages win ties
    for l in reversed(langs):
        pred = F.when(hits[l] == best, F.lit(l)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return {"pred_lang": pred, "stopword_hits": best}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic: argmax language by stopword
    hit count; 'und' (undetermined) when no list scores > 0."""
    cols = language_columns(text_col)
    return df.select("doc_id", *[expr.alias(name) for name, expr in cols.items()])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (a rolling-hash analogue that is stable under
    token reordering — near-dup clusters collapse to one fingerprint)."""
    toks = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    return df.select(
        "doc_id",
        F.md5(F.concat_ws(" ", toks)).alias("fingerprint"),
        F.size(toks).alias("n_distinct_tokens"),
    )
