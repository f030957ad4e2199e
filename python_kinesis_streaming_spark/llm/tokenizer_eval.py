"""Tokenizer evaluation: compare trained tokenizers (BPE vs unigram —
both trained from the SAME ``word_frequencies`` table) on compression,
fertility, and vocabulary utilization — the report a data team reads
before committing a tokenizer to a training run.

``tokenizer_report`` takes any (doc_id, pieces array<string>) encoding
output and computes corpus metrics with plain DataFrame aggregation:

- tokens/doc and chars/token (compression),
- fertility = tokens per whitespace word,
- vocab utilization = distinct pieces used / vocab size,
- single-char fallback rate = share of emitted pieces of length 1
  (high → the vocab is missing the corpus's real units).

``compare_tokenizers`` runs both families end to end on one corpus and
returns a two-row frame, one per tokenizer — the concrete artifact for
the "which tokenizer" decision. Everything is JVM aggregation over the
encoded outputs; the only Python is the encoders themselves (the
documented Arrow seams in llm/bpe.py and llm/unigram.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenizer_report(
    encoded: DataFrame,
    text_col: str,
    pieces_col: str,
    vocab_size: int,
    name: str,
) -> DataFrame:
    """One-row metrics frame for an encoding of the corpus."""
    per_doc = encoded.select(
        F.length(text_col).alias("n_chars"),
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
        ).alias("n_words"),
        F.size(pieces_col).alias("n_tokens"),
        F.size(
            F.filter(F.col(pieces_col), lambda p: F.length(p) == 1)
        ).alias("n_single"),
        F.array_distinct(pieces_col).alias("distinct_pieces"),
    )
    return per_doc.agg(
        F.lit(name).alias("tokenizer"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_chars") / F.sum("n_tokens")).alias("chars_per_token"),
        (F.sum("n_tokens") / F.sum("n_words")).alias("fertility"),
        (
            F.size(F.array_distinct(F.flatten(
                F.collect_list("distinct_pieces")
            ))) / F.lit(vocab_size)
        ).alias("vocab_utilization"),
        (F.sum("n_single") / F.sum("n_tokens")).alias("single_char_rate"),
    )


def compare_tokenizers(
    docs: DataFrame,
    text_col: str,
    vocab_size: int = 200,
    num_merges: int | None = None,
    max_piece_len: int = 6,
) -> DataFrame:
    """Train BPE and unigram on the same word-frequency evidence,
    encode the corpus with both, and return one metrics row each."""
    from python_kinesis_streaming_spark.llm.bpe import (
        apply_bpe,
        train_bpe,
        word_frequencies,
    )
    from python_kinesis_streaming_spark.llm.unigram import (
        train_unigram,
        viterbi_encode,
    )

    # Three consumers (char census, BPE seed, unigram trainer) share one
    # corpus pass: persist the word-frequency table; the census count
    # materializes it (guide §5 — reuse beats recompute here, the table
    # is |vocab| rows, not corpus-sized).
    wf = word_frequencies(docs, text_col).persist()
    n_chars = wf.select(
        F.explode(F.split("word", "")).alias("c")
    ).where(F.length("c") > 0).distinct().count()
    merges = num_merges if num_merges is not None else max(
        vocab_size - n_chars, 1
    )

    # Reuse the word-frequency table already built above (one corpus pass
    # shared by the char census, BPE, and unigram — guide §1.2).
    bpe_merges = train_bpe(docs, text_col, num_merges=merges, freqs=wf)
    bpe_enc = apply_bpe(docs, text_col, bpe_merges)  # emits `tokens`
    bpe_rep = tokenizer_report(
        bpe_enc, text_col, "tokens", n_chars + len(bpe_merges), "bpe"
    )

    uni = train_unigram(
        wf,
        vocab_size=vocab_size,
        seed_size=vocab_size * 3,
        max_piece_len=max_piece_len,
        em_iters=1,
        prune_rounds=2,
    )
    uni_enc = viterbi_encode(docs, text_col, uni["logp"], max_piece_len)
    uni_rep = tokenizer_report(
        uni_enc, text_col, "pieces", len(uni["logp"]), "unigram"
    )
    wf.unpersist()
    return bpe_rep.unionByName(uni_rep)
