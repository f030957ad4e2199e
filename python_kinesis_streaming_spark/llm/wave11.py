"""Wave-11 pipeline ops (round 12, fifth batch) — corpus word
burstiness, confident-learning label noise, ranking-quality metrics,
seasonal Holt-Winters and token-mass concentration.

Five capabilities extending the corpus-statistics / retrieval-eval /
forecasting story:

- ``corpus_word_burstiness``: Church & Gale (1995) word burstiness —
  for the top collection-frequency words, cf/df and the probability a
  word re-occurs in a document that already contains it. The corpus
  statistic that separates topical words from function words before
  building LM training mixes.
- ``dq_label_noise_confident``: confident-learning label-noise
  estimation (Northcutt et al. 2021) — per-class self-confidence
  thresholds, the confident joint count matrix, and the off-diagonal
  noise-rate estimate, all from exact integer counts.
- ``sim_rank_quality_ndcg``: ranking-quality metrics of the truncated
  prefilter vs the exact cosine ranking — recall@10, MRR and nDCG@10
  with integer-micro frozen DCG terms (the metrics a retrieval stack
  reports, beyond the recall audits the registry already has).
- ``ts_holt_winters_seasonal``: additive Holt-Winters (level + trend +
  weekly seasonal) over per-type daily series — the seasonal recursion
  ts_holt_linear's two-state fold can't express; LIST accumulator on
  the DuckDB side (its STRUCT list_reduce accumulator mis-evaluates,
  see ts_holt_linear).
- ``corpus_token_concentration``: token-mass concentration — exact
  integer-rank Gini per source, top-decile share, and the global HHI
  across sources. The diversity audit run before weighting a mixture.

Same discipline as waves 7-10: JVM-only, integer-exact where a
comparison or a cross-partition sum follows, identical aliases, BIGINT
casts on DuckDB sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from python_kinesis_streaming_spark.functions.rounding import rnd, sql_rnd
from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# word burstiness (Church & Gale)
# ---------------------------------------------------------------------------


@op(
    "corpus_word_burstiness",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        dw AS (
            SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY doc_id, word
        ),
        w AS (
            SELECT word,
                   CAST(sum(c) AS BIGINT) AS cf,
                   CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS df_repeat
            FROM dw GROUP BY word
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        top AS (
            SELECT * FROM w ORDER BY cf DESC, word LIMIT 30
        )
        SELECT word, cf, df, df_repeat,
               {sql_rnd('cf * 1.0 / df', 4)} AS burstiness,
               {sql_rnd('df_repeat * 1.0 / df', 4)} AS p_repeat,
               {sql_rnd('df * 1.0 / n_docs', 4)} AS doc_share
        FROM top CROSS JOIN nd
    """,
    scale=(
        "Word burstiness (Church & Gale 1995): burstiness = cf/df "
        "(mean occurrences per containing doc) and p_repeat = "
        "P(count >= 2 | count >= 1) — the adaptation statistic that "
        "separates topical words (bursty) from function words "
        "(uniform) when profiling an LM corpus. Shape: explode -> "
        "(doc, word) partial-agg -> word agg — two map-side-combined "
        "shuffles whose key spaces are |docs|x|vocab-per-doc| then "
        "|vocab|; the top-30 is orderBy+limit (TakeOrderedAndProject, "
        "never a global window), and the doc count is a 1-row "
        "broadcast. All counts are exact integers; ratios round at "
        "1e-4 after the BIGINT sums."
    ),
)
def corpus_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 words by collection frequency: cf, df, burstiness=cf/df,
    repeat probability and document share."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    dw = tok.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = dw.groupBy("word").agg(
        F.sum("c").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("df_repeat"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    top = w.orderBy(F.desc("cf"), "word").limit(30)
    return top.crossJoin(F.broadcast(nd)).select(
        "word",
        "cf",
        "df",
        "df_repeat",
        rnd(F.col("cf") * F.lit(1.0) / F.col("df"), 4).alias("burstiness"),
        rnd(F.col("df_repeat") * F.lit(1.0) / F.col("df"), 4).alias(
            "p_repeat"
        ),
        rnd(F.col("df") * F.lit(1.0) / F.col("n_docs"), 4).alias(
            "doc_share"
        ),
    )


# ---------------------------------------------------------------------------
# confident-learning label-noise estimate
# ---------------------------------------------------------------------------

#: Deterministic logistic score in integer micro-units — the same
#: stand-in for a trained quality classifier's probability that
#: dq_calibration_report and dq_temperature_scaling use (wave-7/8).
_SCORE_MICRO_SQL = """CAST(floor(1000000.0
        / (1.0 + exp(-((n_chars - 250.0) / 100.0)))
        + 0.505) AS BIGINT)"""


@op(
    "dq_label_noise_confident",
    oracle=f"""
        WITH scored AS (
            SELECT {_SCORE_MICRO_SQL} AS s_micro,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ),
        thr AS (
            SELECT sum(CASE WHEN y = 1 THEN s_micro ELSE 0 END) * 1.0
                       / sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS t1,
                   sum(CASE WHEN y = 0 THEN 1000000 - s_micro ELSE 0 END)
                       * 1.0
                       / sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS t0
            FROM scored
        ),
        conf AS (
            SELECT y,
                   CASE
                       WHEN s_micro >= t1
                            AND (1000000 - s_micro) >= t0
                       THEN CASE WHEN 2 * s_micro >= 1000000
                                 THEN 1 ELSE 0 END
                       WHEN s_micro >= t1 THEN 1
                       WHEN (1000000 - s_micro) >= t0 THEN 0
                       ELSE CAST(NULL AS INTEGER)
                   END AS y_hat
            FROM scored CROSS JOIN thr
        ),
        cm AS (
            SELECT y, y_hat, CAST(count(*) AS BIGINT) AS n
            FROM conf WHERE y_hat IS NOT NULL GROUP BY y, y_hat
        ),
        spine AS (
            SELECT a.y, b.y_hat
            FROM (VALUES (0), (1)) a(y)
            CROSS JOIN (VALUES (0), (1)) b(y_hat)
        ),
        full_cm AS (
            SELECT s.y, s.y_hat,
                   CAST(COALESCE(cm.n, 0) AS BIGINT) AS n
            FROM spine s
            LEFT JOIN cm ON cm.y = s.y AND cm.y_hat = s.y_hat
        ),
        tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS n_conf,
                   CAST(sum(CASE WHEN y <> y_hat THEN n ELSE 0 END)
                        AS BIGINT) AS n_off
            FROM full_cm
        )
        SELECT CAST(f.y AS BIGINT) AS y,
               CAST(f.y_hat AS BIGINT) AS y_hat,
               f.n,
               {sql_rnd('f.n * 1.0 / t.n_conf', 4)} AS share,
               CAST(CASE WHEN f.y <> f.y_hat THEN 1 ELSE 0 END
                    AS BIGINT) AS off_diag,
               {sql_rnd('t.n_off * 1.0 / t.n_conf', 4)}
                   AS est_label_error
        FROM full_cm f CROSS JOIN tot t
    """,
    scale=(
        "Confident-learning label-noise estimation (Northcutt et al. "
        "2021, binary form): per-class self-confidence thresholds "
        "t_j = mean score-for-class-j among examples labeled j, then "
        "the confident joint — examples whose score clears a class "
        "threshold are counted into C[given_label][confident_label]; "
        "the off-diagonal mass estimates the label-error rate the "
        "quality classifier's training set carries. Score is the "
        "deterministic integer-micro logistic (the calibration ops' "
        "stand-in), so threshold comparisons are exact-integer vs a "
        "double computed from BIGINT sums — bit-identical across "
        "engines and partitionings. Shape: one map-only scoring pass, "
        "a 1-row threshold agg broadcast back, a 4-key agg joined to "
        "the literal 2x2 spine (absent cells register n=0, the "
        "stratified-audit lesson). 100 TB: two scans, no shuffle "
        "wider than 4 keys."
    ),
)
def dq_label_noise_confident(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning 2x2 joint over (given label, confident label)
    with per-cell share and the global off-diagonal error estimate."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.floor(
            F.lit(1000000.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -((F.col("n_chars") - F.lit(250.0)) / F.lit(100.0))
                )
            )
            + F.lit(0.505)
        )
        .cast("long")
        .alias("s_micro"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    thr = scored.agg(
        (
            F.sum(F.when(F.col("y") == 1, F.col("s_micro")).otherwise(0))
            * F.lit(1.0)
            / F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
        ).alias("t1"),
        (
            F.sum(
                F.when(
                    F.col("y") == 0, F.lit(1000000) - F.col("s_micro")
                ).otherwise(0)
            )
            * F.lit(1.0)
            / F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
        ).alias("t0"),
    )
    conf1 = F.col("s_micro") >= F.col("t1")
    conf0 = (F.lit(1000000) - F.col("s_micro")) >= F.col("t0")
    conf = scored.crossJoin(F.broadcast(thr)).select(
        "y",
        F.when(
            conf1 & conf0,
            F.when(F.lit(2) * F.col("s_micro") >= 1000000, 1).otherwise(0),
        )
        .when(conf1, 1)
        .when(conf0, 0)
        .otherwise(F.lit(None).cast("int"))
        .alias("y_hat"),
    )
    cm = (
        conf.where(F.col("y_hat").isNotNull())
        .groupBy("y", "y_hat")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spine = (
        spark.range(1)
        .select(F.explode(F.array(F.lit(0), F.lit(1))).alias("y"))
        .crossJoin(
            spark.range(1).select(
                F.explode(F.array(F.lit(0), F.lit(1))).alias("y_hat")
            )
        )
    )
    full_cm = spine.join(cm, ["y", "y_hat"], "left").select(
        "y",
        "y_hat",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )
    tot = full_cm.agg(
        F.sum("n").cast("long").alias("n_conf"),
        F.sum(F.when(F.col("y") != F.col("y_hat"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_off"),
    )
    return full_cm.crossJoin(F.broadcast(tot)).select(
        F.col("y").cast("long").alias("y"),
        F.col("y_hat").cast("long").alias("y_hat"),
        "n",
        rnd(F.col("n") * F.lit(1.0) / F.col("n_conf"), 4).alias("share"),
        F.when(F.col("y") != F.col("y_hat"), 1)
        .otherwise(0)
        .cast("long")
        .alias("off_diag"),
        rnd(F.col("n_off") * F.lit(1.0) / F.col("n_conf"), 4).alias(
            "est_label_error"
        ),
    )


# ---------------------------------------------------------------------------
# ranking-quality metrics: recall@10 / MRR / nDCG@10 of the prefilter
# ---------------------------------------------------------------------------


@op(
    "sim_rank_quality_ndcg",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        x AS (
            SELECT vec_id, CAST(u.i AS INTEGER) AS j, v[u.i + 1] AS x
            FROM e, unnest(range(0, 64)) AS u(i)
        ),
        vr AS (
            SELECT j, {sql_rnd("var_pop(x)", 6)} AS variance
            FROM x GROUP BY j
        ),
        dims AS (
            SELECT j FROM (
                SELECT j, row_number() OVER (
                    ORDER BY variance DESC, j
                ) AS rk FROM vr
            ) WHERE rk <= 16
        ),
        xk AS (SELECT x.* FROM x JOIN dims USING (j)),
        tn AS (
            SELECT vec_id, sqrt(sum(x * x)) AS tn FROM xk GROUP BY vec_id
        ),
        td AS (
            SELECT q.vec_id AS qid, v.vec_id, sum(q.x * v.x) AS tdot
            FROM xk q JOIN xk v ON v.j = q.j AND v.vec_id <> q.vec_id
            WHERE q.vec_id % 50 = 0
            GROUP BY 1, 2
        ),
        atop AS (
            SELECT qid, vec_id, rank AS arank FROM (
                SELECT td.qid, td.vec_id, row_number() OVER (
                    PARTITION BY td.qid
                    ORDER BY {sql_rnd("td.tdot / (nq.tn * nv.tn)", 4)}
                                 DESC,
                             td.vec_id
                ) AS rank
                FROM td
                JOIN tn nq ON nq.vec_id = td.qid
                JOIN tn nv ON nv.vec_id = td.vec_id
            ) WHERE rank <= 10
        ),
        ex AS (
            SELECT q.vec_id AS qid, v.vec_id,
                   floor(list_cosine_similarity(q.v, v.v)
                         * 10000.0 + 0.505) / 10000.0 AS sim
            FROM e q JOIN e v ON v.vec_id <> q.vec_id
            WHERE q.vec_id % 50 = 0
        ),
        etop AS (
            SELECT qid, vec_id, rank AS erank FROM (
                SELECT qid, vec_id, row_number() OVER (
                    PARTITION BY qid ORDER BY sim DESC, vec_id
                ) AS rank FROM ex
            ) WHERE rank <= 10
        ),
        terms AS (
            SELECT a.qid,
                   CASE WHEN et.vec_id IS NOT NULL THEN 1 ELSE 0 END
                       AS hit,
                   CAST(floor(
                       COALESCE(11 - et.erank, 0)
                       / (ln(a.arank + 1.0) / ln(2.0))
                       * 1000000.0 + 0.505) AS BIGINT) AS g_micro,
                   CASE WHEN et.erank = 1
                        THEN CAST(floor(1000000.0 / a.arank + 0.505)
                                  AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS rr_micro
            FROM atop a
            LEFT JOIN etop et
              ON et.qid = a.qid AND et.vec_id = a.vec_id
        ),
        idcg AS (
            SELECT CAST(sum(CAST(floor(
                       (11 - i) / (ln(i + 1.0) / ln(2.0))
                       * 1000000.0 + 0.505) AS BIGINT)) AS BIGINT)
                       AS idcg_micro
            FROM unnest(range(1, 11)) AS r(i)
        ),
        perq AS (
            SELECT qid,
                   CAST(sum(hit) AS BIGINT) AS hits,
                   CAST(sum(g_micro) AS BIGINT) AS dcg_micro,
                   CAST(max(rr_micro) AS BIGINT) AS rr_micro
            FROM terms GROUP BY qid
        )
        SELECT CAST(q.vec_id AS BIGINT) AS qid,
               CAST(COALESCE(p.hits, 0) AS BIGINT) AS hits,
               {sql_rnd("COALESCE(p.hits, 0) / 10.0", 4)} AS recall_at_10,
               {sql_rnd("COALESCE(p.rr_micro, 0) / 1000000.0", 4)} AS mrr,
               {sql_rnd(
                   "COALESCE(p.dcg_micro, 0) * 1.0 / i.idcg_micro", 4
               )} AS ndcg_at_10
        FROM e q
        LEFT JOIN perq p ON p.qid = q.vec_id
        CROSS JOIN idcg i
        WHERE q.vec_id % 50 = 0
    """,
    scale=(
        "Ranking-quality metrics of the variance-top-16 truncated "
        "prefilter against the exact cosine ranking: recall@10, MRR "
        "(reciprocal rank of the exact top-1 inside the approximate "
        "list) and nDCG@10 with graded gains rel = 11 - exact_rank — "
        "the triple a retrieval stack reports, beyond the plain "
        "recall audits already registered. Determinism: sims round at "
        "1e-4 with vec_id tie-breaks before every ranking; each DCG "
        "term freezes to integer micro-units BEFORE the per-query sum "
        "(10-double sums are not associativity-safe across "
        "partitions), and IDCG is derived from the same literal "
        "10-row spine in both engines rather than a typed constant. "
        "100 TB: the truncated leg is |sample|*N*16 and is the stage "
        "an IVF index replaces; the exact leg is sample-bounded "
        "(1-in-50 queries), never all-pairs."
    ),
)
def sim_rank_quality_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 / MRR / nDCG@10 of the truncated-dims prefilter
    ranking vs the exact cosine top-10, per sampled query."""
    from python_kinesis_streaming_spark.llm.similarity import dot, l2norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    x = emb.select("vec_id", F.posexplode(F.col("v")).alias("j", "x"))
    vr = x.groupBy("j").agg(rnd(F.var_pop("x"), 6).alias("variance"))
    dims = (
        vr.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("variance"), "j")),
        )
        .where(F.col("rk") <= 16)
        .select("j")
    )
    xk = x.join(F.broadcast(dims), "j")
    tn = xk.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("tn")
    )
    xq = xk.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), "j", F.col("x").alias("xq")
    )
    td = (
        xq.join(xk, "j")
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum(F.col("xq") * F.col("x")).alias("tdot"))
    )
    nq, nv = tn.alias("nq"), tn.alias("nv")
    atop = (
        td.alias("td")
        .join(nq, F.col("nq.vec_id") == F.col("td.qid"))
        .join(nv, F.col("nv.vec_id") == F.col("td.vec_id"))
        .select(
            F.col("td.qid").alias("qid"),
            F.col("td.vec_id").alias("vec_id"),
            rnd(
                F.col("td.tdot") / (F.col("nq.tn") * F.col("nv.tn")), 4
            ).alias("tsim"),
        )
        .withColumn(
            "arank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("tsim"), "vec_id")
            ),
        )
        .where(F.col("arank") <= 10)
        .select("qid", "vec_id", "arank")
    )
    # per-ROW norms hoisted out of the per-PAIR kernel (the r12
    # SemDeDup lesson): one HOF per pair instead of three,
    # bit-identical doubles, oracle untouched
    embn = emb.withColumn("norm", l2norm(F.col("v")))
    eq = embn.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    q = eq.where(F.col("qid") % 50 == 0)
    ex = embn.join(
        F.broadcast(q), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "vec_id",
        rnd(
            dot(F.col("qv"), F.col("v"))
            / (F.col("qnorm") * F.col("norm")),
            4,
        ).alias("sim"),
    )
    etop = (
        ex.withColumn(
            "erank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
            ),
        )
        .where(F.col("erank") <= 10)
        .select("qid", "vec_id", "erank")
    )
    log2_arank = F.log(F.col("arank") + F.lit(1.0)) / F.log(F.lit(2.0))
    terms = atop.join(etop, ["qid", "vec_id"], "left").select(
        "qid",
        F.when(F.col("erank").isNotNull(), 1).otherwise(0).alias("hit"),
        F.floor(
            F.coalesce(F.lit(11) - F.col("erank"), F.lit(0))
            / log2_arank
            * F.lit(1000000.0)
            + F.lit(0.505)
        )
        .cast("long")
        .alias("g_micro"),
        F.when(
            F.col("erank") == 1,
            F.floor(F.lit(1000000.0) / F.col("arank") + F.lit(0.505)).cast(
                "long"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("rr_micro"),
    )
    idcg = (
        spark.range(1, 11)
        .select(
            F.floor(
                (F.lit(11) - F.col("id"))
                / (F.log(F.col("id") + F.lit(1.0)) / F.log(F.lit(2.0)))
                * F.lit(1000000.0)
                + F.lit(0.505)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("idcg_micro"))
    )
    perq = terms.groupBy("qid").agg(
        F.sum("hit").cast("long").alias("hits"),
        F.sum("g_micro").cast("long").alias("dcg_micro"),
        F.max("rr_micro").cast("long").alias("rr_micro"),
    )
    return (
        q.select("qid")
        .join(perq, "qid", "left")
        .crossJoin(F.broadcast(idcg))
        .select(
            "qid",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            rnd(F.coalesce(F.col("hits"), F.lit(0)) / F.lit(10.0), 4).alias(
                "recall_at_10"
            ),
            rnd(
                F.coalesce(F.col("rr_micro"), F.lit(0)) / F.lit(1000000.0),
                4,
            ).alias("mrr"),
            rnd(
                F.coalesce(F.col("dcg_micro"), F.lit(0))
                * F.lit(1.0)
                / F.col("idcg_micro"),
                4,
            ).alias("ndcg_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# additive Holt-Winters with weekly seasonality
# ---------------------------------------------------------------------------


@op(
    "ts_holt_winters_seasonal",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type, cents,
                   CAST(row_number() OVER (
                       PARTITION BY event_type ORDER BY d
                   ) - 1 AS BIGINT) AS t
            FROM daily
        ),
        seq AS (
            SELECT event_type,
                   list([CAST(cents AS DOUBLE), CAST(t AS DOUBLE)]
                        ORDER BY t) AS xs,
                   CAST(count(*) AS BIGINT) AS n_days
            FROM idx GROUP BY event_type
        ),
        init AS (
            SELECT event_type, xs, n_days,
                   (xs[1][1] + xs[2][1] + xs[3][1] + xs[4][1]
                    + xs[5][1] + xs[6][1] + xs[7][1]) / 7.0 AS l0
            FROM seq WHERE n_days >= 8
        ),
        folded AS (
            -- accumulator is a flat DOUBLE[9]: [level, trend, s0..s6].
            -- DuckDB 1.0's list_reduce mis-evaluates STRUCT
            -- accumulators (see ts_holt_linear) — LIST accumulators
            -- fold correctly and match Spark bit-for-bit.
            SELECT event_type, n_days,
                   list_reduce(
                       list_prepend(
                           [l0, 0.0]
                               || list_transform(xs[1:7],
                                                 e -> e[1] - l0),
                           xs[8:CAST(n_days AS INT)]),
                       (acc, s) -> [
                           0.5 * (s[1]
                               - acc[3 + (CAST(s[2] AS INT) % 7)])
                               + 0.5 * (acc[1] + acc[2]),
                           0.3 * ((0.5 * (s[1]
                               - acc[3 + (CAST(s[2] AS INT) % 7)])
                               + 0.5 * (acc[1] + acc[2])) - acc[1])
                               + 0.7 * acc[2]
                       ]
                       || acc[3:2 + (CAST(s[2] AS INT) % 7)]
                       || [0.2 * (s[1] - (0.5 * (s[1]
                               - acc[3 + (CAST(s[2] AS INT) % 7)])
                               + 0.5 * (acc[1] + acc[2])))
                               + 0.8 * acc[3
                                   + (CAST(s[2] AS INT) % 7)]]
                       || acc[4 + (CAST(s[2] AS INT) % 7):9]
                   ) AS hw
            FROM init
        )
        SELECT event_type, n_days,
               {sql_rnd("hw[1] / 100.0", 6)} AS level,
               {sql_rnd("hw[2] / 100.0", 6)} AS trend,
               {sql_rnd(
                   "hw[3 + (CAST(n_days AS INT) % 7)] / 100.0", 6
               )} AS s_next,
               {sql_rnd(
                   "(hw[1] + 1 * hw[2]"
                   " + hw[3 + (CAST(n_days AS INT) % 7)]) / 100.0", 6
               )} AS forecast_h1,
               {sql_rnd(
                   "(hw[1] + 7 * hw[2]"
                   " + hw[3 + (CAST((n_days + 6) AS INT) % 7)]) / 100.0",
                   6
               )} AS forecast_h7
        FROM folded
    """,
    scale=(
        "Additive Holt-Winters (alpha=0.5, beta=0.3, gamma=0.2, m=7) "
        "over per-type daily value totals — the level+trend+seasonal "
        "recursion ts_holt_linear's two-state fold cannot express. "
        "Same bounded in-row fold shape: one event_type shuffle "
        "collects the daily series (days, not events — the "
        "aggregation happens first, so the array is |days| long no "
        "matter the row count), then a codegen HOF folds a 9-slot "
        "accumulator [l, b, s0..s6], rebuilding the seasonal slot by "
        "slice-concat. Day values enter as exact integer cents; init "
        "is the first-7-day mean with s_j = x_j - l0; slots key on "
        "the POSITIONAL day index (identical groupBy output both "
        "engines), so a sparse day at tiny SF shifts both engines "
        "identically. Both engines fold the identical order with "
        "identical double arithmetic — level/trend/seasonal and the "
        "h=1/h=7 forecasts are bit-reproducible at 1e-6. Unbounded "
        "keys -> the applyInPandasWithState shape, state = "
        "(l, b, s[0..6])."
    ),
)
def ts_holt_winters_seasonal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-event-type additive Holt-Winters over daily value cents
    (weekly season): final level/trend/next-slot seasonal + h=1, h=7
    forecasts."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("cents")
    )
    idx = daily.select(
        "event_type",
        F.col("cents").cast("double").alias("x"),
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            )
            - 1
        )
        .cast("long")
        .alias("t"),
    )
    seq = idx.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("t", "x"))).alias("a"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    ).where(F.col("n_days") >= 8)
    withl0 = seq.withColumn(
        "l0",
        (
            F.element_at("a", 1).getField("x")
            + F.element_at("a", 2).getField("x")
            + F.element_at("a", 3).getField("x")
            + F.element_at("a", 4).getField("x")
            + F.element_at("a", 5).getField("x")
            + F.element_at("a", 6).getField("x")
            + F.element_at("a", 7).getField("x")
        )
        / F.lit(7.0),
    )
    hw = F.expr(
        """
        aggregate(
            slice(a, 8, CAST(n_days AS INT) - 7),
            named_struct(
                'l', l0,
                'b', CAST(0.0 AS DOUBLE),
                's', transform(slice(a, 1, 7), e -> e.x - l0)),
            (acc, s) -> named_struct(
                'l', 0.5D * (s.x
                        - element_at(acc.s, CAST(s.t % 7 AS INT) + 1))
                        + 0.5D * (acc.l + acc.b),
                'b', 0.3D * ((0.5D * (s.x
                        - element_at(acc.s, CAST(s.t % 7 AS INT) + 1))
                        + 0.5D * (acc.l + acc.b)) - acc.l)
                        + 0.7D * acc.b,
                's', concat(
                        slice(acc.s, 1, CAST(s.t % 7 AS INT)),
                        array(0.2D * (s.x - (0.5D * (s.x
                            - element_at(acc.s,
                                         CAST(s.t % 7 AS INT) + 1))
                            + 0.5D * (acc.l + acc.b)))
                            + 0.8D * element_at(
                                acc.s, CAST(s.t % 7 AS INT) + 1)),
                        slice(acc.s, CAST(s.t % 7 AS INT) + 2,
                              6 - CAST(s.t % 7 AS INT)))))
        """
    )
    folded = withl0.select(
        "event_type", "n_days", hw.alias("hw")
    )
    s_next = F.element_at(
        F.col("hw").getField("s"),
        (F.col("n_days") % 7).cast("int") + 1,
    )
    s_h7 = F.element_at(
        F.col("hw").getField("s"),
        ((F.col("n_days") + 6) % 7).cast("int") + 1,
    )
    return folded.select(
        "event_type",
        "n_days",
        rnd(F.col("hw").getField("l") / F.lit(100.0), 6).alias("level"),
        rnd(F.col("hw").getField("b") / F.lit(100.0), 6).alias("trend"),
        rnd(s_next / F.lit(100.0), 6).alias("s_next"),
        rnd(
            (
                F.col("hw").getField("l")
                + F.lit(1) * F.col("hw").getField("b")
                + s_next
            )
            / F.lit(100.0),
            6,
        ).alias("forecast_h1"),
        rnd(
            (
                F.col("hw").getField("l")
                + F.lit(7) * F.col("hw").getField("b")
                + s_h7
            )
            / F.lit(100.0),
            6,
        ).alias("forecast_h7"),
    )


# ---------------------------------------------------------------------------
# token-mass concentration: Gini per source, top-decile share, HHI
# ---------------------------------------------------------------------------


@op(
    "corpus_token_concentration",
    oracle=f"""
        WITH dt AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ),
        ranked AS (
            SELECT source, n_tok,
                   CAST(row_number() OVER (
                       PARTITION BY source ORDER BY n_tok, doc_id
                   ) AS BIGINT) AS rk,
                   CAST(row_number() OVER (
                       PARTITION BY source ORDER BY n_tok DESC, doc_id
                   ) AS BIGINT) AS rk_desc,
                   CAST(count(*) OVER (PARTITION BY source)
                        AS BIGINT) AS cnt
            FROM dt
        ),
        per_source AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                   CAST(sum(rk * n_tok) AS BIGINT) AS s1,
                   CAST(sum(CASE WHEN rk_desc <= CAST(floor(
                            (cnt + 9) / 10.0) AS BIGINT)
                        THEN n_tok ELSE 0 END) AS BIGINT) AS top_tok
            FROM ranked GROUP BY source
        ),
        grand AS (
            SELECT CAST(sum(total_tokens) AS BIGINT) AS g
            FROM per_source
        ),
        hhi AS (
            SELECT CAST(sum(CAST(floor(
                       (total_tokens * 1.0 / g)
                       * (total_tokens * 1.0 / g)
                       * 1000000000.0 + 0.505) AS BIGINT)) AS BIGINT)
                       AS hhi_nano
            FROM per_source CROSS JOIN grand
        )
        SELECT p.source, p.n_docs, p.total_tokens,
               {sql_rnd(
                   "(2.0 * p.s1 - (p.n_docs + 1.0) * p.total_tokens)"
                   " / (p.n_docs * 1.0 * p.total_tokens)", 6
               )} AS gini,
               {sql_rnd("p.top_tok * 1.0 / p.total_tokens", 6)}
                   AS top_decile_share,
               {sql_rnd("h.hhi_nano / 1000000000.0", 6)} AS source_hhi
        FROM per_source p CROSS JOIN hhi h
    """,
    scale=(
        "Token-mass concentration — the diversity audit run before "
        "weighting a mixture: exact integer-rank Gini per source "
        "(G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over the "
        "ascending-sorted docs, every term a BIGINT so the statistic "
        "is partition-order-free), the token share held by the "
        "top-decile largest docs, and the Herfindahl index of token "
        "mass across sources (per-source shares squared, frozen to "
        "integer nano-units before the cross-source sum — 20-double "
        "sums are not associativity-safe). Shape: one map-only "
        "tokenize pass, rank windows PARTITIONED BY source (bounded "
        "per-key, never global), a per-source agg and a 1-row HHI "
        "broadcast back. 100 TB: the windows sort within source "
        "partitions only; skewed sources salt into the two-level "
        "rank pattern corpus_epoch_plan uses."
    ),
)
def corpus_token_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source token-count Gini, top-decile token share, and the
    global across-source HHI."""
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w_src = Window.partitionBy("source")
    ranked = dt.select(
        "source",
        "n_tok",
        F.row_number()
        .over(w_src.orderBy("n_tok", "doc_id"))
        .cast("long")
        .alias("rk"),
        F.row_number()
        .over(w_src.orderBy(F.desc("n_tok"), "doc_id"))
        .cast("long")
        .alias("rk_desc"),
        F.count(F.lit(1)).over(w_src).cast("long").alias("cnt"),
    )
    per_source = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(F.col("rk") * F.col("n_tok")).cast("long").alias("s1"),
        F.sum(
            F.when(
                F.col("rk_desc")
                <= F.floor((F.col("cnt") + 9) / F.lit(10.0)).cast("long"),
                F.col("n_tok"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("top_tok"),
    )
    grand = per_source.agg(F.sum("total_tokens").cast("long").alias("g"))
    hhi = (
        per_source.crossJoin(F.broadcast(grand))
        .select(
            F.floor(
                (F.col("total_tokens") * F.lit(1.0) / F.col("g"))
                * (F.col("total_tokens") * F.lit(1.0) / F.col("g"))
                * F.lit(1000000000.0)
                + F.lit(0.505)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("hhi_nano"))
    )
    return per_source.crossJoin(F.broadcast(hhi)).select(
        "source",
        "n_docs",
        "total_tokens",
        rnd(
            (
                F.lit(2.0) * F.col("s1")
                - (F.col("n_docs") + F.lit(1.0)) * F.col("total_tokens")
            )
            / (F.col("n_docs") * F.lit(1.0) * F.col("total_tokens")),
            6,
        ).alias("gini"),
        rnd(
            F.col("top_tok") * F.lit(1.0) / F.col("total_tokens"), 6
        ).alias("top_decile_share"),
        rnd(F.col("hhi_nano") / F.lit(1000000000.0), 6).alias(
            "source_hhi"
        ),
    )
