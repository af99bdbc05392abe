"""Text analysis operators: token stats, quality score, language ID,
document fingerprinting.

All pure column expressions (whole-stage codegen; one narrow projection per
operator — no shuffle, no Python). The reference's only text processing is
street-name normalization (CsvReader.java:153-189, OSMStreet.java:121-130);
these extend the same normalization layer to document-scale corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import ROLLING_BASE, MERSENNE31, h60_spark, tokens_spark

# Per-language marker-word profiles for the n-gram/stopword language-ID
# heuristic. Rank order (alphabetical) is the deterministic tie-break:
# earlier rank wins on equal score.
LANG_PROFILES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("de", ("der", "die", "das", "und", "ein", "mit", "nicht")),
    ("en", ("the", "a", "of", "and", "in", "to", "is")),
    ("es", ("el", "los", "y", "un", "de", "que", "no")),
    ("fr", ("le", "la", "et", "un", "des", "les", "pas")),
    ("zh", ("的", "是", "在", "了", "我", "不", "人")),
)

# English stopword list reused by the quality score (looked up by code,
# not position: inserting a profile that sorts before 'en' must not
# silently swap the quality gate to another language's markers).
QUALITY_STOPWORDS = dict(LANG_PROFILES)["en"]


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokenization (matches the oracle's regexp split)."""
    return F.expr(tokens_spark(text_col))


def n_tokens_col(text_col: str = "text") -> Column:
    """NULL-safe token count: 0 for NULL text (``F.size`` of a null array
    is -1, which would corrupt budget/pack arithmetic). Single source of
    truth for every token-count consumer (budget sampling, packing)."""
    return F.greatest(F.lit(0), F.size(tokens_col(text_col)))


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _count_in(words: tuple[str, ...]) -> Column:
    """Non-distinct count of tokens appearing in a word set (case-folded:
    a sentence-start 'The'/'Der' must hit the lowercase profiles)."""
    return F.expr(
        f"size(filter(toks, t -> "
        f"array_contains(array({_sql_list(words)}), lower(t))))"
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counts: total, unique, mean token length (6 dp)."""
    return (
        docs.withColumn("toks", tokens_col())
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_unique_tokens"),
            # NULL for zero-token docs (ANSI division by zero would
            # otherwise kill the job on a whitespace-only document)
            F.when(
                F.size("toks") > 0,
                F.round(
                    F.expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))")
                    / F.size("toks"),
                    6,
                ),
            ).alias("mean_token_len"),
        )
    )


def quality_score(docs: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Composite document-quality score in [0,1]: length, stopword ratio,
    mean word length — rational arithmetic only, identical in the oracle.

    ``keep_cols`` passes input columns through the projection, so a
    pipeline (text/corpus.py) attaches the score WITHOUT a self-join —
    joining a projection of docs back to docs would shuffle the full text
    twice at corpus scale for what is a narrow map."""
    d = docs.withColumn("toks", tokens_col())
    n_tokens = F.size("toks")
    n_stop = _count_in(QUALITY_STOPWORDS)
    sum_len = F.expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))")
    d = d.withColumns(
        {"__n": n_tokens.cast("long"), "__s": n_stop.cast("long"), "__sl": sum_len}
    )
    # micropoint integer arithmetic (floor division) — bit-exact across
    # engines; float sums land on round() boundaries nondeterministically
    quality_u = F.expr(
        "1000 * least(__n, 400)"
        " + (300000 * (__n - __s)) DIV greatest(__n, 1L)"
        " + least((37500 * __sl) DIV greatest(__n, 1L), 300000)"
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.col("__n").cast("int").alias("n_tokens"),
        (F.expr("(1000000 * __s) DIV greatest(__n, 1L)") / 1e6).alias("stopword_ratio"),
        (F.expr("(1000000 * __sl) DIV greatest(__n, 1L)") / 1e6).alias("mean_token_len"),
        (quality_u / 1e6).alias("quality"),
        *keep_cols,
    )


def lang_id(docs: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Stopword-profile language ID: argmax of per-language marker hits,
    ties broken by profile rank (array_max over (score, -rank) structs —
    a narrow projection, no shuffle). ``keep_cols`` as in
    :func:`quality_score`."""
    d = docs.withColumn("toks", tokens_col())
    scored = F.array(
        *[
            F.struct(
                _count_in(words).alias("score"),
                F.lit(-rank).alias("nr"),
            )
            for rank, (_lang, words) in enumerate(LANG_PROFILES)
        ]
    )
    langs = F.array(*[F.lit(lang) for lang, _ in LANG_PROFILES])
    d = d.withColumn("best", F.array_max(scored))
    # zero marker hits = no evidence for ANY language: emit 'und'
    # (undetermined) instead of silently classifying as the first profile
    pred = F.when(F.col("best.score") == 0, F.lit("und")).otherwise(
        F.element_at(langs, -F.col("best.nr") + 1)
    )
    return d.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.col("best.score").alias("lang_score"),
        F.col("lang").alias("label_lang"),
        *keep_cols,
    )


def lang_id_accuracy(docs: DataFrame) -> DataFrame:
    """Confusion counts of predicted vs labeled language."""
    return (
        lang_id(docs)
        .groupBy("label_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


FINGERPRINT_SHINGLE = 5


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: full-content 60-bit hash, polynomial rolling
    hash over tokens (acc*B + h31(token) mod 2^31-1), and the min word-
    5-gram hash (winnowing-style min-shingle)."""
    k = FINGERPRINT_SHINGLE
    d = docs.withColumn("toks", tokens_col())
    rolling = F.expr(
        f"aggregate(transform(toks, t -> {h60_spark('t')} % {MERSENNE31}), 0L, "
        f"(acc, h) -> (acc * {ROLLING_BASE} + h) % {MERSENNE31})"
    )
    gram = "concat_ws(' ', slice(toks, i, " + str(k) + "))"
    # short-doc fallback hashes the TOKEN JOIN, not the raw text, matching
    # dedup.shingle_expr's normalization: 'a  b' and 'a b' must fingerprint
    # identically
    short = h60_spark("concat_ws(' ', toks)")
    min_shingle = F.expr(
        f"CASE WHEN size(toks) >= {k} THEN "
        f"array_min(transform(sequence(1, size(toks) - {k - 1}), "
        f"i -> {h60_spark(gram)})) "
        f"ELSE {short} END"
    )
    return d.select(
        "doc_id",
        F.expr(h60_spark("text")).alias("content_hash"),
        rolling.alias("rolling_hash"),
        min_shingle.alias("min_shingle_hash"),
    )
