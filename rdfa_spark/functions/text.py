"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting — all pure Spark built-ins (JVM-side,
whole-stage codegen) with integer-scaled arithmetic so the DuckDB
oracle reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists (public common words); order of
# LANGS is the deterministic tie-break order for language_id
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "los", "que", "y", "es", "una", "para"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men"],
}
LANGS = list(STOPWORDS)


def tokens_col(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), r"\s+")


def with_token_count(df: DataFrame, text_col: str = "text",
                     out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens_col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (portable to any engine with md5)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                            r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def with_language_id(df: DataFrame, text_col: str = "text",
                     out: str = "lang_pred") -> DataFrame:
    """n-gram/stopword language heuristic: per-language stopword hit
    counts, argmax with fixed tie-break order (LANGS order)."""
    toks = tokens_col(text_col)
    scores = {l: _stopword_hits(toks, ws) for l, ws in
              STOPWORDS.items()}
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    # reverse order => earlier langs win ties
    for lang in reversed(LANGS):
        pred = F.when((scores[lang] == best) & (best > 0),
                      F.lit(lang)).otherwise(pred)
    return df.withColumn(out, pred)


def with_quality_score(df: DataFrame, text_col: str = "text",
                       prefix: str = "q_") -> DataFrame:
    """Quality features, integer-scaled (per-mille) so every engine
    computes identical values:

    * ``q_n_chars`` / ``q_n_tokens``
    * ``q_mean_token_len_pm``  — 1000 * chars-in-tokens / tokens
    * ``q_stopword_pm``        — 1000 * english-stopword hits / tokens
    * ``q_alpha_pm``           — 1000 * [a-z] chars / chars
    * ``q_score_pm``           — composite gate used for filtering
    """
    toks = tokens_col(text_col)
    n_chars = F.length(F.col(text_col)).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    tok_chars = F.aggregate(toks, F.lit(0).cast("bigint"),
                            lambda acc, t: acc + F.length(t))
    stop_hits = _stopword_hits(toks, STOPWORDS["en"]).cast("bigint")
    alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)),
                                      "[^a-z]", "")).cast("bigint")
    # floor() is mirrored in the oracle SQL (DuckDB CAST rounds, so
    # an explicit floor keeps both engines identical)
    pm = lambda num, den: F.floor(  # noqa: E731
        (num * 1000) / F.greatest(den, F.lit(1))).cast("bigint")
    out = (df.withColumn(prefix + "n_chars", n_chars)
             .withColumn(prefix + "n_tokens", n_tokens)
             .withColumn(prefix + "mean_token_len_pm",
                         pm(tok_chars, n_tokens))
             .withColumn(prefix + "stopword_pm", pm(stop_hits, n_tokens))
             .withColumn(prefix + "alpha_pm", pm(alpha, n_chars)))
    score = (F.col(prefix + "alpha_pm")
             + F.col(prefix + "stopword_pm")
             + F.least(F.col(prefix + "n_tokens"), F.lit(100)) * 10)
    return out.withColumn(prefix + "score_pm", score.cast("bigint"))
