"""Distributed linear quality classifier: hashed n-gram features +
logistic regression trained by full-batch gradient descent — the
fasttext-shaped "model-based quality filter" stage of a training-data
pipeline (score every document, keep the top slice), built so the hot
path never leaves the JVM.

Why this shape at 100 TB:

- **Features are rows, not vectors.** A document's sparse feature
  vector is (doc_id, idx, val) rows — explode + xxhash64 + groupBy,
  all whole-stage codegen. No Python, no giant array columns, and the
  feature table is itself a DataFrame you can checkpoint, sample, or
  re-weight.
- **The model is metadata, the data never moves.** Each GD iteration
  ships O(dim) weights OUT (a broadcast hash join against a tiny
  weights table) and O(dim) gradient sums BACK (one groupBy(idx)
  agg). The corpus-sized tables are hash-partitioned once and cached;
  iterations reuse them. This is the same driver-round-trip
  discipline as llm/bpe.py's argmax loop: the driver only ever sees
  bounded model state, never data.
- **Two shuffles, ONE action per iteration** (per-doc score agg, then
  the per-dim gradient agg UNIONED with the loss/bias sums via
  sentinel idx rows −1/−2 into a single collect — r14), both shuffles
  keyed on high-cardinality uniform keys (doc_id, hash idx) — no skew
  by construction.

Training math (pinned against a dense numpy reference in tests):
full-batch logistic regression, mean log-loss, optional L2;
w ← w − lr·(Xᵀ(σ(Xw+b) − y)/n + l2·w), b ← b − lr·mean(resid).

``binary_metrics`` computes AUC by the Mann-Whitney rank identity
(one global sort of n scores — the exact-AUC cost floor) plus
threshold metrics from a single conditional-agg pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1024,
    bigrams: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """(doc_id, idx, val) sparse hashed bag-of-ngrams features.

    Word unigrams (and bigrams when enabled) hash to ``idx ∈ [0, dim)``
    via xxhash64; ``val`` is the in-doc count, L2-normalized per doc
    when ``normalize`` (the fasttext default — keeps long docs from
    dominating the gradient). Empty docs produce no rows.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), " "),
            lambda w: F.length(w) > 0,
        ).alias("toks"),
    )
    pair_len = F.greatest(F.size("toks") - 1, F.lit(0))  # slice rejects <0
    grams = toks.select(
        "doc_id",
        (
            F.concat(
                F.col("toks"),
                F.zip_with(
                    F.slice(F.col("toks"), 1, pair_len),
                    F.slice(F.col("toks"), 2, pair_len),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            )
            if bigrams
            else F.col("toks")
        ).alias("grams"),
    ).where(F.size("grams") > 0)
    counts = (
        grams.select("doc_id", F.explode("grams").alias("g"))
        .groupBy("doc_id", F.pmod(F.xxhash64("g"), F.lit(dim)).alias("idx"))
        .agg(F.count(F.lit(1)).cast("double").alias("val"))
    )
    if not normalize:
        return counts
    norms = counts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("l2")
    )
    return counts.join(norms, "doc_id").select(
        "doc_id", "idx", (F.col("val") / F.col("l2")).alias("val")
    )


def _weights_df(spark: SparkSession, weights: list[float]) -> DataFrame:
    return spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "idx long, w double"
    )


def predict_scores(
    features: DataFrame, weights: list[float], bias: float
) -> DataFrame:
    """(doc_id, score, prob) from sparse features and a weight vector.

    The weights table is broadcast (O(dim) rows); the per-doc dot
    product is one map-side-combined agg keyed by doc_id.
    """
    spark = features.sparkSession
    wdf = F.broadcast(_weights_df(spark, weights))
    scored = (
        features.join(wdf, "idx")
        .groupBy("doc_id")
        .agg(F.sum(F.col("val") * F.col("w")).alias("dot"))
        .select(
            "doc_id",
            (F.col("dot") + F.lit(float(bias))).alias("score"),
        )
    )
    return scored.select(
        "doc_id",
        "score",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))).alias("prob"),
    )


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    dim: int,
    lr: float = 0.5,
    iters: int = 20,
    l2: float = 0.0,
) -> dict:
    """Full-batch logistic regression over (doc_id, idx, val) features
    and (doc_id, label∈{0,1}) labels. Returns weights, bias, and the
    per-iteration mean log-loss history.

    Driver state is O(dim) floats; each iteration runs ONE unioned
    action (the per-idx gradient aggregate plus the loss/bias sums
    multiplexed through sentinel idx values −1/−2) over the cached
    feature/label tables. Feature ``idx`` MUST lie in [0, dim) —
    validated up front, because a negative idx would collide with the
    sentinels and silently corrupt the loss/bias (ADVICE r14). Docs
    with a label but no features (empty text) still contribute through
    the bias term.
    """
    feats = features.persist()
    labs = labels.select(
        "doc_id", F.col("label").cast("double").alias("y")
    ).persist()
    n_docs = labs.count()  # also materializes the cache
    fstats = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("idx").alias("lo"),
        F.max("idx").alias("hi"),
    ).first()  # materializes the cache AND validates the idx contract
    if fstats["n"] and not (0 <= fstats["lo"] and fstats["hi"] < dim):
        raise ValueError(
            f"feature idx out of [0, {dim}): saw [{fstats['lo']}, "
            f"{fstats['hi']}] — negative idx would collide with the "
            "sentinel rows of the unioned gradient/loss action"
        )
    if n_docs == 0:
        raise ValueError("no labeled documents")

    weights = [0.0] * dim
    bias = 0.0
    history: list[float] = []
    spark = features.sparkSession

    for _ in range(iters):
        wdf = F.broadcast(_weights_df(spark, weights))
        dots = (
            feats.join(wdf, "idx")
            .groupBy("doc_id")
            .agg(F.sum(F.col("val") * F.col("w")).alias("dot"))
        )
        resid = (
            labs.join(dots, "doc_id", "left")
            .select(
                "doc_id",
                "y",
                (F.coalesce(F.col("dot"), F.lit(0.0)) + F.lit(bias)).alias(
                    "score"
                ),
            )
            .select(
                "doc_id",
                "y",
                "score",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))
                    - F.col("y")
                ).alias("r"),
            )
        ).persist()

        # mean log-loss via the numerically stable softplus identity:
        # loss = softplus(score) - y*score  (softplus(x)=log1p(exp(-|x|))+max(x,0)).
        # The loss/bias aggregate and the per-idx gradient are UNIONED into
        # one action (sentinel idx −1 = loss_sum, −2 = r_sum): one job per
        # iteration instead of two (guide §1.2 — fewer passes/scheduling
        # waves; measured parity at sf0.01 where the stages dominate, the
        # win is the halved driver round-trip count per iteration). The
        # aggregates themselves are unchanged, so weights/bias/history are
        # bit-identical; resid is persisted so both union legs share one
        # evaluation.
        loss_stats = (
            resid.agg(
                F.sum(
                    F.log1p(F.exp(-F.abs(F.col("score"))))
                    + F.greatest(F.col("score"), F.lit(0.0))
                    - F.col("y") * F.col("score")
                ).alias("loss_sum"),
                F.sum("r").alias("r_sum"),
            )
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.lit(-1).cast("long").alias("idx"),
                            F.col("loss_sum").alias("g"),
                        ),
                        F.struct(
                            F.lit(-2).cast("long").alias("idx"),
                            F.col("r_sum").alias("g"),
                        ),
                    )
                ).alias("s")
            )
            .select("s.idx", "s.g")
        )
        rows = (
            feats.join(resid.select("doc_id", "r"), "doc_id")
            .groupBy("idx")
            .agg(F.sum(F.col("val") * F.col("r")).alias("g"))
            .select(F.col("idx").cast("long").alias("idx"), "g")
            .unionByName(loss_stats)
            .collect()
        )
        resid.unpersist()
        grad = [0.0] * dim
        loss_sum = r_sum = 0.0
        for row in rows:
            if row["idx"] == -1:
                loss_sum = row["g"]
            elif row["idx"] == -2:
                r_sum = row["g"]
            else:
                grad[row["idx"]] = row["g"] / n_docs
        history.append(loss_sum / n_docs)
        weights = [
            w - lr * (g + l2 * w) for w, g in zip(weights, grad)
        ]
        bias -= lr * (r_sum / n_docs)

    feats.unpersist()
    labs.unpersist()
    return {"weights": weights, "bias": bias, "history": history}


def binary_metrics(
    scored: DataFrame, labels: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """One-row (auc, accuracy, precision, recall, n_pos, n_neg).

    AUC = (rank_sum_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) with
    average ranks for score ties (the exact Mann-Whitney estimator) —
    one global sort of the scores, then a single agg.
    """
    j = scored.join(labels, "doc_id").select(
        "score", F.col("label").cast("double").alias("y")
    )
    # average rank over ties: rank() spans + (count-1)/2
    ranked = j.select(
        "y",
        "score",
        (
            F.rank().over(Window.orderBy("score"))
            + (F.count(F.lit(1)).over(Window.partitionBy("score")) - 1)
            / 2.0
        ).alias("avg_rank"),
    )
    pred_pos = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))) >= F.lit(
        threshold
    )
    return ranked.agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.lit(1.0) - F.col("y")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("y") == 1.0, F.col("avg_rank"))).alias("rs"),
        F.avg(
            F.when(
                (pred_pos & (F.col("y") == 1.0))
                | (~pred_pos & (F.col("y") == 0.0)),
                1.0,
            ).otherwise(0.0)
        ).alias("accuracy"),
        (
            F.sum(F.when(pred_pos & (F.col("y") == 1.0), 1).otherwise(0))
            / F.greatest(
                F.sum(F.when(pred_pos, 1).otherwise(0)), F.lit(1)
            )
        ).alias("precision"),
        (
            F.sum(F.when(pred_pos & (F.col("y") == 1.0), 1).otherwise(0))
            / F.greatest(F.sum("y"), F.lit(1.0))
        ).alias("recall"),
    ).select(
        (
            (F.col("rs") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / F.greatest(F.col("n_pos") * F.col("n_neg"), F.lit(1))
        ).alias("auc"),
        "accuracy",
        "precision",
        "recall",
        "n_pos",
        "n_neg",
    )
