"""Token-span exact dedup: find (and cut) passages of ≥ ``min_len``
consecutive tokens that occur more than once in the corpus — the
"repeated passage" dedup pass training pipelines run AFTER doc-level
dedup (boilerplate, licenses, quoted chunks survive doc-level hashing
because the surrounding document differs).

Method — the distributed equivalent of the suffix-array approach:
a span of length L ≥ k is repeated iff every one of its L−k+1
overlapping k-grams is repeated, so

1. slide a k-token window over every document IN-ROW (transform over
   a position sequence — no explode-per-token, one row per k-gram),
2. one shuffle groups k-gram hashes globally; hashes with count > 1
   (or appearing in >1 distinct position) mark duplicated positions,
3. per document, merge runs of consecutive duplicated positions into
   maximal spans with the gaps-and-islands trick (two window passes
   partitioned by doc_id — never global).

The result over-approximates by at most k−1 tokens at span edges and
may chain two distinct repeats that overlap — the standard, documented
trade of the k-gram method. ``cut_duplicated_spans`` additionally
keeps ONE canonical copy: a k-gram occurrence is removable only if a
strictly smaller (doc_id, pos) occurrence exists (min_by over the
duplicate group), so the first occurrence in global order survives.

Scale shape: k-gram rows are (doc_id, pos, hash) longs — ~8·n_tokens
bytes per column, the same order as the tokenized corpus itself. The
global groupBy is on a uniform 64-bit hash (no skew); the run-merge
windows are per-document. Nothing is ever collected; text
reconstruction is an in-row HOF filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def doc_kgrams(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc_id, pos, gram_hash) for every k-token window of every doc.

    Tokenization is the whitespace convention used across llm/; the
    hash is xxhash64 of the space-joined window (64-bit: collisions at
    corpus scale are ~n²/2⁶⁴ — billions of grams before one expected
    false merge, and a collision only ever over-marks one position).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.col(text_col), " "), lambda w: F.length(w) > 0
        ).alias("toks"),
    ).where(F.size("toks") >= k)
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - F.lit(k - 1)),
                lambda start: F.struct(
                    (start - 1).alias("pos"),
                    F.xxhash64(
                        F.concat_ws(" ", F.slice("toks", start, k))
                    ).alias("gram_hash"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), "g.gram_hash")


def _merge_runs(flagged: DataFrame, k: int, min_len: int) -> DataFrame:
    """Gaps-and-islands over duplicated positions → maximal spans."""
    island = (
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos"))
    ).alias("island")
    runs = flagged.select("doc_id", "pos", island)
    return (
        runs.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(k)).alias("span_len"),
        )
        .where(F.col("span_len") >= min_len)
        .select("doc_id", "span_start", "span_len")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_len: int = 16,
) -> DataFrame:
    """Maximal repeated token spans: (doc_id, span_start, span_len).

    A position is duplicated when its k-gram occurs at any OTHER
    (doc_id, pos) — within-doc repeats count. Spans shorter than
    ``min_len`` tokens are dropped (the k-gram method's precision
    knob; Lee et al. use 50 BPE tokens).
    """
    grams = doc_kgrams(df, id_col, text_col, k)
    dup_hashes = (
        grams.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("gram_hash")
    )
    flagged = grams.join(dup_hashes, "gram_hash").select("doc_id", "pos")
    return _merge_runs(flagged, k, min_len)


def cut_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_len: int = 16,
) -> DataFrame:
    """Remove repeated spans but KEEP the canonical first occurrence.

    Returns (doc_id, text, n_cut_tokens): every doc, with tokens
    belonging to a removable span deleted. An occurrence is removable
    iff a strictly earlier (doc_id, pos) occurrence of the same k-gram
    exists, so exactly one copy of each repeated passage survives
    (the one in the smallest doc_id, earliest position).
    """
    grams = doc_kgrams(df, id_col, text_col, k)
    # global first occurrence per duplicated hash: one min-of-struct agg
    # (lexicographic (doc_id, pos) order — no packed-ordinal arithmetic,
    # which would overflow for 64-bit hash doc ids)
    occ = F.struct("doc_id", "pos")
    firsts = (
        grams.groupBy("gram_hash")
        .agg(
            F.min(occ).alias("first_occ"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") > 1)
    )
    removable = (
        grams.join(firsts, "gram_hash")
        .where(occ > F.col("first_occ"))
        .select("doc_id", "pos")
    )
    spans = _merge_runs(removable, k, min_len)

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.col(text_col), " "), lambda w: F.length(w) > 0
        ).alias("toks"),
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("spans")
    )
    joined = toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("spans", F.array()).alias("spans"),
    )

    def covered(i):
        # i is a 0-based token index column; True if inside any span
        return F.exists(
            "spans",
            lambda s: (i >= s["span_start"])
            & (i < s["span_start"] + s["span_len"]),
        )

    kept = joined.select(
        "doc_id",
        F.filter(
            F.transform(
                "toks",
                lambda t, i: F.struct(t.alias("t"), covered(i).alias("cut")),
            ),
            lambda st: ~st["cut"],
        ).alias("kept_structs"),
        F.aggregate(
            F.transform("toks", lambda t, i: covered(i).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_cut_tokens"),
    )
    return kept.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform("kept_structs", lambda st: st["t"])
        ).alias("text"),
        F.col("n_cut_tokens").cast("long").alias("n_cut_tokens"),
    )


def span_dedup_report(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, min_len: int = 16
) -> DataFrame:
    """One-row audit: docs affected, spans, duplicated-token fraction —
    the artifact reviewed before committing a destructive cut pass."""
    spans = duplicated_spans(df, id_col, text_col, k, min_len)
    totals = df.select(
        F.sum(
            F.size(
                F.filter(
                    F.split(F.col(text_col), " "),
                    lambda w: F.length(w) > 0,
                )
            ).cast("long")
        ).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.countDistinct("doc_id").alias("docs_affected"),
        F.coalesce(F.sum("span_len"), F.lit(0)).cast("long").alias(
            "dup_tokens"
        ),
        F.coalesce(F.max("span_len"), F.lit(0)).cast("long").alias(
            "max_span_len"
        ),
    )
    return agg.crossJoin(totals).select(
        "n_spans",
        "docs_affected",
        "n_docs",
        "dup_tokens",
        "max_span_len",
        (F.col("dup_tokens") / F.col("total_tokens")).alias("dup_frac"),
    )
