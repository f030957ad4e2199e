"""Distributed unigram-LM tokenizer training (the SentencePiece model,
Kudo 2018) — the second tokenizer family next to llm/bpe.py's BPE, with
the same bounded-driver-round-trip discipline.

The unigram model scores a segmentation of a word as the product of
independent piece probabilities; training is EM over the segmentation
lattice:

- **Seed**: every substring (up to ``max_piece_len``) of the corpus
  vocabulary, scored by frequency × length; top ``seed_size`` kept,
  plus every single character (guarantees any word stays encodable).
  One explode + groupBy + top-k — all JVM.
- **E-step**: per word, forward–backward over the segmentation
  lattice in log space yields the expected count of every piece
  occurrence. The lattice DP is genuinely imperative → Arrow-batched
  ``mapInPandas`` (the documented Python seam, same as BPE's apply),
  with the piece table shipped in the task closure (O(vocab)
  metadata, a few thousand entries). Each batch pre-aggregates into a
  dict, so the shuffle input is (piece, partial_sum) rows — the
  map-side-combine pattern — and unique words are memoized per batch.
- **M-step**: one groupBy(piece).sum, an O(vocab) collect, and a
  driver-side renormalize. The corpus-sized word table is cached once
  and never moves; the driver only ever holds the model.
- **Prune**: after each EM round, drop the lowest-probability pieces
  (never single chars) toward ``vocab_size`` — the standard
  expected-count pruning simplification of Kudo's loss-based rule.
- **Encode**: Viterbi (max instead of sum over the same lattice),
  ties broken toward FEWER pieces then lexicographically — pinned so
  tests and the pure-Python reference agree exactly.

Training statistics come from the SAME word-frequency table BPE uses
(``llm.bpe.word_frequencies``), so the two tokenizers are trained on
identical evidence and their vocab/compression trade-offs are directly
comparable (see ``tokenizer_compare`` in tests).

Scale: per EM iteration, one shuffle (piece partial sums) + one
O(vocab) collect. Words are independent — the lattice DP parallelizes
to partition count; per-word cost is O(len · max_piece_len) lattice
edges. At 100 TB the word-frequency table is the corpus bottleneck
(one explode + groupBy, shared with BPE), not the EM loop over the
(much smaller) unique-word table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seed_vocabulary(
    words: DataFrame,
    seed_size: int = 1000,
    max_piece_len: int = 8,
) -> DataFrame:
    """(piece, score) seed candidates from a (word, freq) table.

    Every substring of length 1..max_piece_len of every word, scored
    by total frequency × piece length (the SentencePiece seed
    heuristic: prefer long, frequent substrings); single characters
    are always kept regardless of rank. JVM in-row substring
    generation (flatten/transform over two index sequences), one
    groupBy, one top-k.
    """
    subs = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda n: F.substring(F.col("word"), i, n),
                    ),
                )
            )
        ).alias("piece"),
    )
    scored = subs.groupBy("piece").agg(
        (F.sum("freq") * F.length(F.first("piece"))).alias("score")
    )
    chars = scored.where(F.length("piece") == 1)
    multis = (
        scored.where(F.length("piece") > 1)
        .orderBy(F.desc("score"), "piece")
        .limit(seed_size)
    )
    return chars.unionByName(multis)


def _lattice_expected_counts(word: str, logp: dict, max_len: int) -> dict:
    """Forward–backward over one word's segmentation lattice.

    Returns {piece: expected_count} under the current model. Pure
    function of (word, logp) — safe to memoize per unique word.
    """
    n = len(word)
    NEG = -1e30
    fwd = [NEG] * (n + 1)
    fwd[0] = 0.0
    edges = []  # (start, end, piece, lp)
    for j in range(n):
        for e in range(j + 1, min(j + max_len, n) + 1):
            piece = word[j:e]
            lp = logp.get(piece)
            if lp is not None:
                edges.append((j, e, piece, lp))
    for j, e, piece, lp in edges:
        if fwd[j] > NEG / 2:
            cand = fwd[j] + lp
            m = max(fwd[e], cand)
            fwd[e] = m + math.log(
                math.exp(fwd[e] - m) + math.exp(cand - m)
            )
    if fwd[n] <= NEG / 2:
        return {}  # unsegmentable (cannot happen with char coverage)
    bwd = [NEG] * (n + 1)
    bwd[n] = 0.0
    for j, e, piece, lp in reversed(edges):
        if bwd[e] > NEG / 2:
            cand = bwd[e] + lp
            m = max(bwd[j], cand)
            bwd[j] = m + math.log(
                math.exp(bwd[j] - m) + math.exp(cand - m)
            )
    total = fwd[n]
    out: dict[str, float] = {}
    for j, e, piece, lp in edges:
        if fwd[j] > NEG / 2 and bwd[e] > NEG / 2:
            gamma = math.exp(fwd[j] + lp + bwd[e] - total)
            out[piece] = out.get(piece, 0.0) + gamma
    return out


def expected_piece_counts(
    words: DataFrame, logp: dict, max_piece_len: int
) -> DataFrame:
    """Distributed E-step: (piece, e_count) summed over the corpus.

    ``logp`` rides in the task closure (O(vocab)); each Arrow batch
    pre-aggregates into a dict so the shuffle sees per-batch partials.
    """
    # The kernel calls a function from THIS module: ship it by value so
    # a bare driver session (executors with no repo on sys.path) can
    # unpickle the task — the seam rule every other kernel follows.
    from pyspark import cloudpickle

    import python_kinesis_streaming_spark.llm.unigram as _self

    cloudpickle.register_pickle_by_value(_self)
    lattice_counts = _self._lattice_expected_counts

    items = sorted(logp.items())  # deterministic closure content

    def estep(batches):
        import pandas as pd

        model = dict(items)
        memo: dict[str, dict] = {}
        for pdf in batches:
            acc: dict[str, float] = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                ec = memo.get(word)
                if ec is None:
                    ec = lattice_counts(word, model, max_piece_len)
                    memo[word] = ec
                for piece, c in ec.items():
                    acc[piece] = acc.get(piece, 0.0) + c * freq
            if acc:
                yield pd.DataFrame(
                    {"piece": list(acc), "partial": list(acc.values())}
                )

    partials = words.mapInPandas(estep, schema="piece string, partial double")
    return partials.groupBy("piece").agg(
        F.sum("partial").alias("e_count")
    )


def train_unigram(
    words: DataFrame,
    vocab_size: int = 400,
    seed_size: int = 1000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_rounds: int = 3,
    shrink: float = 0.75,
) -> dict:
    """EM + prune loop. Returns {piece: logprob} of size ≤ vocab_size
    (single chars always survive) plus the per-round corpus log-lik.

    Driver state: the model dict and loss history — never data rows.
    """
    wf = words.select(
        F.col("word").cast("string").alias("word"),
        F.col("freq").cast("double").alias("freq"),
    ).persist()
    wf.count()

    seed = seed_vocabulary(wf, seed_size, max_piece_len).collect()
    total_score = sum(r["score"] for r in seed)
    logp = {
        r["piece"]: math.log(r["score"] / total_score) for r in seed
    }

    history: list[float] = []
    for _ in range(prune_rounds):
        for _ in range(em_iters):
            rows = expected_piece_counts(wf, logp, max_piece_len).collect()
            total = sum(r["e_count"] for r in rows)
            floor = math.log(1e-12)
            logp = {
                r["piece"]: math.log(r["e_count"] / total)
                if r["e_count"] > 0
                else floor
                for r in rows
            }
        # corpus log-likelihood under the refreshed model (one agg)
        history.append(corpus_loglik(wf, logp, max_piece_len))
        multis = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )
        n_chars = len(logp) - len(multis)
        keep = max(
            vocab_size - n_chars, int(len(multis) * shrink)
        )
        if len(multis) <= max(vocab_size - n_chars, 0):
            break
        logp = {
            **{p: lp for p, lp in logp.items() if len(p) == 1},
            **dict(multis[:keep]),
        }
    # final cut to the target size
    multis = sorted(
        ((p, lp) for p, lp in logp.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )
    chars = {p: lp for p, lp in logp.items() if len(p) == 1}
    logp = {**chars, **dict(multis[: max(vocab_size - len(chars), 0)])}
    wf.unpersist()
    return {"logp": logp, "history": history}


def corpus_loglik(
    words: DataFrame, logp: dict, max_piece_len: int
) -> float:
    """Σ freq · log P(word): marginal over all segmentations (the EM
    objective). One mapInPandas pass + a 1-row agg."""
    items = sorted(logp.items())

    def ll(batches):
        import pandas as pd

        model = dict(items)
        memo: dict[str, float] = {}
        for pdf in batches:
            s = 0.0
            for word, freq in zip(pdf["word"], pdf["freq"]):
                v = memo.get(word)
                if v is None:
                    n = len(word)
                    NEG = -1e30
                    fwd = [NEG] * (n + 1)
                    fwd[0] = 0.0
                    for j in range(n):
                        if fwd[j] <= NEG / 2:
                            continue
                        for e in range(
                            j + 1, min(j + max_piece_len, n) + 1
                        ):
                            lp = model.get(word[j:e])
                            if lp is None:
                                continue
                            cand = fwd[j] + lp
                            m = max(fwd[e], cand)
                            fwd[e] = m + math.log(
                                math.exp(fwd[e] - m)
                                + math.exp(cand - m)
                            )
                    v = fwd[n]
                    memo[word] = v
                s += freq * v
            yield pd.DataFrame({"partial": [s]})

    part = words.mapInPandas(ll, schema="partial double")
    return part.agg(F.sum("partial").alias("s")).collect()[0]["s"]


def viterbi_encode(
    df: DataFrame,
    text_col: str,
    logp: dict,
    max_piece_len: int = 8,
) -> DataFrame:
    """Add ``pieces`` (array<string>): per-word Viterbi segmentation,
    concatenated in word order with a "▁"-free plain-word convention
    (words are split on whitespace first, like the trainer's stats).

    Ties: higher total logprob wins; then fewer pieces; then the
    lexicographically smaller piece sequence — the same deterministic
    order as the pure-Python reference.
    """
    items = sorted(logp.items())
    mpl = max_piece_len

    def encode(batches):
        import pandas as pd

        model = dict(items)
        memo: dict[str, list] = {}

        def enc_word(word):
            hit = memo.get(word)
            if hit is not None:
                return hit
            n = len(word)
            NEG = -1e30
            # best[i] = (score, -n_pieces, pieces_tuple_reversed_neg?) —
            # track (score, -count, seq) and compare tuples directly
            best = [None] * (n + 1)
            best[0] = (0.0, 0, ())
            for j in range(n):
                bj = best[j]
                if bj is None:
                    continue
                for e in range(j + 1, min(j + mpl, n) + 1):
                    lp = model.get(word[j:e])
                    if lp is None:
                        continue
                    cand = (
                        bj[0] + lp,
                        bj[1] - 1,
                        bj[2] + (word[j:e],),
                    )
                    cur = best[e]
                    if cur is None or cand[0] > cur[0] + 1e-15:
                        best[e] = cand
                    elif abs(cand[0] - cur[0]) <= 1e-15 and (
                        cand[1] > cur[1]
                        or (cand[1] == cur[1] and cand[2] < cur[2])
                    ):
                        best[e] = cand
            out = list(best[n][2]) if best[n] else list(word)
            memo[word] = out
            return out

        for pdf in batches:
            pieces = []
            for text in pdf[text_col]:
                toks = [w for w in str(text).split(" ") if w]
                flat: list[str] = []
                for w in toks:
                    flat.extend(enc_word(w))
                pieces.append(flat)
            pdf = pdf.copy()
            pdf["pieces"] = pieces
            yield pdf

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(encode, schema=f"{fields}, pieces array<string>")
