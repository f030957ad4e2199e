"""Sequence packing: turn variable-length documents into fixed-length
training sequences — the step between a cleaned corpus and a dataloader.

Two packing strategies, each matching a real training-pipeline choice:

- ``pack_concat`` — GPT-style "concatenate everything, cut every
  ``seq_len`` tokens". Documents may cross sequence boundaries; zero
  padding waste by construction. Implemented ENTIRELY with JVM
  expressions: a deterministic bucket assignment, one running-sum
  window per bucket, integer arithmetic for the cut points. One
  shuffle (the window's partitionBy), no Python in the plan.
- ``pack_best_fit`` — bin packing with document integrity (no doc
  crosses a boundary; sequences are padded). Best-fit-decreasing
  inside deterministic hash buckets via ``applyInPandas`` — bin
  packing is genuinely imperative, so this is one of the documented
  places Python earns its seat; everything around it (bucketing,
  reporting) stays JVM-side.

``packing_report`` summarizes either output: sequences, fill rate,
padding waste, boundary-crossing fraction — the artifact a pipeline
owner reviews before committing a multi-day tokenization run.

Scale shape: both strategies key every shuffle by a bounded bucket id
(default 4096 buckets), so skew is capped at corpus_size/buckets and
the FFD state per task is a few thousand integers. Docs longer than
``seq_len`` are split into ``seq_len``-sized chunks FIRST (standard
practice), so no bin can be unpackable and the window never sees an
unbounded row. At 100 TB: one pass to measure lengths, one bucketed
shuffle to pack — no global sort, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_token_lengths(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens) via the whitespace tokenizer the rest of llm/ uses."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
        )
        .cast("long")
        .alias("n_tokens"),
    )


def _split_long_docs(lengths: DataFrame, seq_len: int) -> DataFrame:
    """Explode docs longer than seq_len into (doc_id, chunk_idx, n_tokens)
    chunks of at most seq_len tokens. JVM-side: sequence() + explode."""
    n_chunks = F.ceil(F.col("n_tokens") / F.lit(seq_len)).cast("int")
    return (
        lengths.where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.least(
                F.lit(seq_len),
                F.col("n_tokens") - F.col("chunk_idx") * F.lit(seq_len),
            )
            .cast("long")
            .alias("n_tokens"),
        )
    )


def pack_concat(
    lengths: DataFrame,
    seq_len: int,
    buckets: int = 4096,
) -> DataFrame:
    """GPT-style concat-and-cut packing over (doc_id, n_tokens) rows.

    Within each deterministic hash bucket, documents are laid head-to-
    tail in (hash, doc_id) order; the global token stream of the bucket
    is cut every ``seq_len`` tokens. Output: one row per (chunk ×
    sequence it starts in) with the in-sequence offset and whether the
    chunk crosses into the next sequence.

    Plan: one shuffle (window partitioned by bucket), all arithmetic
    in whole-stage codegen. Sequence ids are globally unique and
    deterministic: bucket * 2^40 + seq_in_bucket.
    """
    chunks = _split_long_docs(lengths, seq_len).select(
        "*",
        F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).alias("bucket"),
    )
    # doc-level shuffle (hash order) but chunk-level contiguity: a long
    # doc's chunks stay adjacent in the token stream.
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.xxhash64("doc_id"), "doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = chunks.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        "bucket",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok"),
    )
    seq_in_bucket = (F.col("start_tok") / F.lit(seq_len)).cast("long")
    seq_id = (
        F.col("bucket").cast("long") * F.lit(1 << 40) + seq_in_bucket
    )
    offset = F.pmod(F.col("start_tok"), F.lit(seq_len))
    crosses = offset + F.col("n_tokens") > F.lit(seq_len)
    primary = laid.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        seq_id.alias("seq_id"),
        offset.alias("offset"),
        F.least(F.col("n_tokens"), F.lit(seq_len) - offset).alias(
            "tokens_in_seq"
        ),
        crosses.alias("crosses_boundary"),
    )
    # A chunk is ≤ seq_len tokens, so it overlaps at most 2 sequences:
    # emit the spill row so every packed token appears in exactly one row.
    spill = laid.where(crosses).select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        (seq_id + 1).alias("seq_id"),
        F.lit(0).cast("long").alias("offset"),
        (offset + F.col("n_tokens") - F.lit(seq_len)).alias("tokens_in_seq"),
        F.lit(False).alias("crosses_boundary"),
    )
    return primary.unionByName(spill)


def pack_best_fit(
    lengths: DataFrame,
    seq_len: int,
    buckets: int = 4096,
) -> DataFrame:
    """Best-fit-decreasing bin packing with document integrity.

    Docs (pre-split into ≤seq_len chunks) are hash-bucketed, then each
    bucket is packed independently with BFD — sorted by (n_tokens desc,
    doc_id, chunk_idx), each chunk goes to the TIGHTEST bin that fits
    (smallest bin id on residual ties), so the output is deterministic
    regardless of partitioning. Output: (doc_id, chunk_idx, n_tokens,
    seq_id, offset, tokens_in_seq).

    Sequence ids: bucket * 2^40 + bin_in_bucket (globally unique,
    stable across reruns). The kernel keeps bin residuals in a
    bisect-sorted list — O(chunks · log bins) comparisons per bucket,
    not the O(chunks · bins) of a naive first-fit scan (which is what
    turns a large bucket into a quadratic straggler task).
    """
    chunks = _split_long_docs(lengths, seq_len).select(
        "*",
        F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).alias("bucket"),
    )

    def pack_bucket(pdf):
        import bisect

        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id", "chunk_idx"],
            ascending=[False, True, True],
        )
        bucket = int(pdf["bucket"].iloc[0])
        residuals: list[tuple[int, int]] = []  # sorted (residual, bin)
        nbins = 0
        out_seq, out_off = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            i = bisect.bisect_left(residuals, (n, -1))
            if i < len(residuals):
                r, b = residuals.pop(i)
                out_seq.append(b)
                out_off.append(seq_len - r)
                if r - n:
                    bisect.insort(residuals, (r - n, b))
            else:
                b = nbins
                nbins += 1
                out_seq.append(b)
                out_off.append(0)
                if seq_len - n:
                    bisect.insort(residuals, (seq_len - n, b))
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "chunk_idx": pdf["chunk_idx"],
                "n_tokens": pdf["n_tokens"],
                "seq_id": [bucket * (1 << 40) + b for b in out_seq],
                "offset": out_off,
                "tokens_in_seq": pdf["n_tokens"],
            }
        )

    return chunks.groupBy("bucket").applyInPandas(
        pack_bucket,
        schema=(
            "doc_id long, chunk_idx int, n_tokens long, seq_id long, "
            "offset long, tokens_in_seq long"
        ),
    )


def packing_report(packed: DataFrame, seq_len: int) -> DataFrame:
    """One-row summary of a packing: sequence count, fill rate, waste.

    ``crosses_boundary`` is consumed when present (pack_concat); for
    pack_best_fit the crossing count is 0 by construction. Tiny
    two-stage agg — safe at any corpus size.
    """
    has_cross = "crosses_boundary" in packed.columns
    per_seq = packed.groupBy("seq_id").agg(
        F.sum("tokens_in_seq").alias("seq_tokens"),
        (
            F.sum(F.col("crosses_boundary").cast("int"))
            if has_cross
            else F.lit(0)
        ).alias("n_cross"),
    )
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("seq_tokens").cast("long").alias("packed_tokens"),
        (
            F.sum("seq_tokens") / (F.count(F.lit(1)) * F.lit(seq_len))
        ).alias("fill_rate"),
        (
            F.count(F.lit(1)) * F.lit(seq_len) - F.sum("seq_tokens")
        ).cast("long").alias("padding_tokens"),
        F.sum("n_cross").cast("long").alias("boundary_crossings"),
    )
