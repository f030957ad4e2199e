"""Distributed BPE tokenizer training and encoding.

Byte-pair encoding (the public Sennrich et al. algorithm, the basis of
GPT-2/RoBERTa tokenizers) learns a merge list from corpus statistics.
The scalable formulation operates on the WORD-FREQUENCY table, not the
corpus: 100 TB of text collapses to millions of distinct words, and each
merge iteration is one distributed aggregation over that table —

1. pre-tokenize + count words (one shuffle over the corpus, done once);
2. per iteration: explode each word's adjacent symbol pairs weighted by
   word frequency, sum, take the argmax pair (driver sees ONE row);
3. apply the merge to the symbol arrays (Arrow-batched pandas UDF over
   the word table — bounded rows, not corpus rows) and repeat.

``train_bpe`` returns the ordered merge list; ``apply_bpe`` encodes text
with it (lowest-rank-first pair merging, memoized per distinct word in
the batch). Ties on pair count break lexicographically so training is
deterministic regardless of partitioning.

Scale notes (100 TB): step 1 is the only corpus-sized job; the iteration
loop touches |distinct words| rows (heavy-tailed — capping to words
covering 99.99% of mass bounds it further, ``min_word_freq``). K merges
= K bounded jobs with a driver round-trip of one row each; the word
table stays cached between iterations. Bare-session safe: worker
closures are nested functions (CLAUDE.md invariant 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-ish pre-tokenizer, simplified to re's ASCII classes: runs of
# letters, runs of digits, runs of other non-space, each optionally
# preceded by a space (kept as part of the token, GPT-2 style).
PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def word_frequencies(
    df: DataFrame, text_col: str, min_word_freq: int = 1
) -> DataFrame:
    """Corpus -> (word, freq) table: the one corpus-sized job."""
    # Column-API regexp_extract_all, NOT F.expr with the pattern inside a
    # SQL string literal: SQL literal unescaping would turn \s into s, so
    # whitespace runs ("a  b", "a\nb") would tokenize as words and the
    # training statistics would diverge from apply_bpe's Python-side re.
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), F.lit(0))
        ).alias("word")
    )
    out = words.groupBy("word").agg(F.count("*").alias("freq"))
    if min_word_freq > 1:
        out = out.where(F.col("freq") >= min_word_freq)
    return out


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_word_freq: int = 1,
    freqs: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns them in
    rank order. Deterministic: count desc, then pair lexicographic.

    ``freqs`` lets a caller that already built the ``word_frequencies``
    table (tokenizer comparison trains two families from the same
    evidence) pass it in instead of paying the corpus pass twice.
    """
    if freqs is None:
        freqs = word_frequencies(df, text_col, min_word_freq)
    # localCheckpoint (not persist): each iteration's plan builds on the
    # previous one, so without lineage truncation K merges compound into
    # an exponentially growing logical plan — the standard iterative-
    # algorithm failure mode. Checkpointing keeps every iteration's plan
    # flat: one explode + one agg over a materialized table.
    #
    # eager=False: the next iteration's argmax COLLECT is the first action
    # over the checkpoint, so materialization folds into that job — one
    # job per merge instead of two (guide §1.2: fewer passes). The loop
    # collects before building the next plan, so every plan is still one
    # explode + one agg over a (by then) materialized table; lineage
    # truncation is unchanged.
    syms = freqs.select(
        # Java split keeps the trailing empty match of the lookahead at
        # end-of-string — filter it, or phantom ('x','') pairs win rounds.
        F.expr("filter(split(word, '(?!^)'), x -> x != '')").alias("syms"),
        "freq",
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str]] = []
    current = syms
    for _ in range(num_merges):
        pairs = (
            current.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s as a, syms[i + 1] as b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["n"] < 2:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))

        def apply_merge(batches, a=a, b=b):
            import pandas as pd

            for pdf in batches:
                out = []
                for row_syms, freq in zip(pdf["syms"], pdf["freq"]):
                    s = list(row_syms)
                    merged = []
                    i = 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                            merged.append(a + b)
                            i += 2
                        else:
                            merged.append(s[i])
                            i += 1
                    out.append((merged, freq))
                yield pd.DataFrame(out, columns=["syms", "freq"])

        current = current.mapInPandas(
            apply_merge, schema="syms array<string>, freq long"
        ).localCheckpoint(eager=False)
    return merges


def apply_bpe(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Encode ``text_col`` with a trained merge list.

    Adds ``tokens array<string>`` and ``n_tokens int``. Classic encoder:
    repeatedly merge the present pair with the lowest rank; memoized per
    distinct word within each Arrow batch."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    pattern = PRETOKEN_RE
    tc = text_col

    def encode_batches(batches):
        import re

        import pandas as pd

        rx = re.compile(pattern)
        cache: dict[str, list[str]] = {}

        def encode_word(word: str) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            s = list(word)
            while len(s) > 1:
                best = None
                best_rank = None
                for i in range(len(s) - 1):
                    r = ranks.get((s[i], s[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = (s[i], s[i + 1]), r
                if best is None:
                    break
                a, b = best
                merged = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(s[i])
                        i += 1
                s = merged
            cache[word] = s
            return s

        for pdf in batches:
            toks = []
            for text in pdf[tc]:
                tokens: list[str] = []
                for word in rx.findall(text or ""):
                    tokens.extend(encode_word(word))
                toks.append(tokens)
            out = pdf.copy()
            out["tokens"] = toks
            out["n_tokens"] = [len(t) for t in toks]
            yield out

    types = {f.name: f.dataType.simpleString() for f in df.schema}
    ofields = ", ".join(f"`{c}` {types[c]}" for c in df.columns)
    return df.mapInPandas(
        encode_batches,
        schema=f"{ofields}, tokens array<string>, n_tokens int",
    )
