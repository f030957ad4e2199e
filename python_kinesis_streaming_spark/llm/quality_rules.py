"""Gopher-style document quality rules, entirely in JVM expressions.

The published heuristic rule set for pretraining-corpus filtering (Rae
et al., "Scaling Language Models: ... Gopher", 2021 — public paper)
expressed as Spark built-ins over arbitrary DataFrames: no UDF, no
Python on the hot path, so the filter rides whole-stage codegen and
pushes through the scan like any predicate.

Rules (each also surfaced as its own boolean column for auditability):

1. word count within [min_words, max_words]        (default 50..100000)
2. mean word length within [3, 10] characters
3. symbol-to-word ratio (# and ellipsis) <= 0.1
4. fewer than 90% of lines start with a bullet
5. fewer than 30% of lines end with an ellipsis
6. >= 80% of words contain an alphabetic character
7. at least 2 distinct English function words present
   (the/be/to/of/and/that/have/with — the paper's "stop word" check)

Scale notes (100 TB): one projection, zero shuffles; arrays are
per-document bounded and the overall ``gopher_keep`` boolean is an
ordinary pushable predicate for downstream scans once materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
BULLET_PREFIXES = ("-", "*", "•", "▪", "●")


def gopher_rules(
    df: DataFrame,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Append per-rule booleans, their measured values, and
    ``gopher_keep`` (the conjunction) to every row."""
    text = F.col(text_col)
    words = F.split(F.trim(text), "\\s+")
    wc = F.size(words).cast("double")
    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.greatest(F.size(lines).cast("double"), F.lit(1.0))

    mean_word_len = (
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.greatest(wc, F.lit(1.0))
    )
    symbol_ratio = (
        F.regexp_count(text, F.lit("#"))
        + F.regexp_count(text, F.lit("\\.\\.\\."))
        + F.regexp_count(text, F.lit("…"))
    ).cast("double") / F.greatest(wc, F.lit(1.0))

    def _starts_with_bullet(ln: Column) -> Column:
        t = F.trim(ln)
        cond = F.lit(False)
        for b in BULLET_PREFIXES:
            cond = cond | t.startswith(b)
        return cond

    bullet_frac = (
        F.size(F.filter(lines, _starts_with_bullet)).cast("double") / n_lines
    )
    ellipsis_frac = (
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).endswith("...")
                | F.trim(ln).endswith("…"),
            )
        ).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / F.greatest(wc, F.lit(1.0))
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, lambda w: F.lower(w))),
            F.array(*[F.lit(s) for s in STOP_WORDS]),
        )
    )

    out = (
        df.withColumn("g_word_count", wc.cast("long"))
        .withColumn("g_mean_word_len", F.round(mean_word_len, 4))
        .withColumn("g_symbol_ratio", F.round(symbol_ratio, 4))
        .withColumn("g_bullet_frac", F.round(bullet_frac, 4))
        .withColumn("g_ellipsis_frac", F.round(ellipsis_frac, 4))
        .withColumn("g_alpha_frac", F.round(alpha_frac, 4))
        .withColumn("g_stop_hits", stop_hits)
        .withColumn(
            "r_word_count", F.col("g_word_count").between(min_words, max_words)
        )
        .withColumn("r_word_len", F.col("g_mean_word_len").between(3.0, 10.0))
        .withColumn("r_symbols", F.col("g_symbol_ratio") <= 0.1)
        .withColumn("r_bullets", F.col("g_bullet_frac") < 0.9)
        .withColumn("r_ellipsis", F.col("g_ellipsis_frac") < 0.3)
        .withColumn("r_alpha", F.col("g_alpha_frac") >= 0.8)
        .withColumn("r_stop_words", F.col("g_stop_hits") >= 2)
    )
    keep = (
        F.col("r_word_count")
        & F.col("r_word_len")
        & F.col("r_symbols")
        & F.col("r_bullets")
        & F.col("r_ellipsis")
        & F.col("r_alpha")
        & F.col("r_stop_words")
    )
    return out.withColumn("gopher_keep", keep)
