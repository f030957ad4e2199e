"""Round-14 wave-25 ops (SURVEY §2.37): feature encoding, whiteness
testing, hash-bit quality, distributional treatment effects,
boilerplate detection.

- ``feat_woe_iv_encoding``: weight-of-evidence / information value of
  literal value bands against the purchase label — the classic
  credit-scoring feature audit (pairs feat_target_encode_loo with an
  interpretable strength score).
- ``ts_ljung_box_whiteness``: Ljung-Box portmanteau Q over lags 1-7 of
  the DIFFERENCED daily series — is what's left after removing the
  trend white noise? (the residual-diagnostic companion of
  ts_autocorr's raw ACF screen), critical value as a literal.
- ``emb_sign_bit_balance_audit``: per-bit 1-share and adjacent-bit
  agreement of the 64-bit sign signatures — a usable binary index
  needs ~50/50 bits with independent neighbors (the index-quality
  dual of emb_sign_binarize_recall's recall view).
- ``events_quantile_treatment_effect``: arm-vs-arm value quantiles at
  a literal phi grid via the VALUE-GROUPED cumulative pattern — the
  distributional lens mean-lift A/B readouts miss (a lift that lives
  only above the median is a tail effect, not a level effect).
- ``corpus_boilerplate_df_ngrams``: top word-5-grams by DOCUMENT
  frequency + the share of docs carrying any of them — the
  boilerplate screen (DF-based, corpus-level) that complements
  dedup_substring_spans' pairwise repeats.

Same discipline as waves 7-24: exact integers before any
cross-partition sum, identical aliases both engines, BIGINT casts in
oracles, 1.0::DOUBLE where sums multiply, literal grids, bounded
windows (value-grouped aggregates only), broadcast-bounded joins; ln
only on identical integer rationals, never exp/pow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from python_kinesis_streaming_spark.functions.rounding import rnd, sql_rnd
from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# weight-of-evidence / information value
# ---------------------------------------------------------------------------

#: literal value-band upper bounds in cents (last band open-ended)
_WOE_BANDS = (1000, 2500, 5000, 10000, 25000)


def _band_case_sql() -> str:
    parts = []
    prev = 0
    for i, ub in enumerate(_WOE_BANDS):
        parts.append(f"WHEN cents <= {ub} THEN {i}")
        prev = ub
    return (
        "CASE " + " ".join(parts) + f" ELSE {len(_WOE_BANDS)} END"
    )


@op(
    "feat_woe_iv_encoding",
    oracle=f"""
        WITH t AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS label
            FROM events
        ),
        b AS (
            SELECT CAST({_band_case_sql()} AS BIGINT) AS band,
                   label
            FROM t
        ),
        per AS (
            SELECT band,
                   CAST(sum(label) AS BIGINT) AS goods,
                   CAST(count(*) - sum(label) AS BIGINT) AS bads
            FROM b GROUP BY band
        ),
        tot AS (
            SELECT CAST(sum(goods) AS BIGINT) AS g,
                   CAST(sum(bads) AS BIGINT) AS bb
            FROM per
        ),
        woe AS (
            -- WoE = ln((goods/G)/(bads/B)) = ln(goods*B / (bads*G)):
            -- ln on an integer rational (Adamic-Adar precedent);
            -- IV terms micro-frozen BEFORE the cross-band sum
            SELECT p.band, p.goods, p.bads, t.g, t.bb,
                   CASE WHEN p.goods > 0 AND p.bads > 0
                        THEN ln(p.goods * 1.0::DOUBLE * t.bb
                                / (p.bads * 1.0::DOUBLE * t.g))
                        ELSE 0.0 END AS w,
                   CASE WHEN p.goods > 0 AND p.bads > 0
                        THEN CAST(floor(
                            (p.goods * 1.0::DOUBLE / t.g
                             - p.bads * 1.0::DOUBLE / t.bb)
                            * ln(p.goods * 1.0::DOUBLE * t.bb
                                 / (p.bads * 1.0::DOUBLE * t.g))
                            * 1000000.0 + 0.505) AS BIGINT)
                        ELSE 0 END AS iv_micro
            FROM per p CROSS JOIN tot t
        ),
        ivt AS (
            SELECT CAST(sum(iv_micro) AS BIGINT) AS iv_total_micro
            FROM woe
        )
        SELECT w.band, w.goods, w.bads,
               {sql_rnd("w.goods * 1.0 / w.g", 4)} AS good_share,
               {sql_rnd("w.bads * 1.0 / w.bb", 4)} AS bad_share,
               {sql_rnd("w.w", 4)} AS woe,
               {sql_rnd("i.iv_total_micro / 1000000.0", 4)}
                   AS iv_total
        FROM woe w CROSS JOIN ivt i
    """,
    scale=(
        "Weight-of-evidence encoding of literal value bands against "
        "the purchase label, plus the information value of the whole "
        "feature (IV < 0.02 useless, > 0.5 suspicious — the classic "
        "credit-scoring vocabulary). WoE is ln of the integer "
        "rational goods*B/(bads*G) (ln only on identical doubles); "
        "each band's IV term is micro-frozen BEFORE the cross-band "
        "BIGINT sum (order-free); empty-side bands emit 0 with the "
        "standard guard in both engines. Shape: one map-side "
        "combinable band agg, a 1-row total, a 6-row report. 100 TB: "
        "one pass; WoE tables are the interpretable cousin of "
        "feat_target_encode_loo and feed the same model prep."
    ),
)
def feat_woe_iv_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoE per literal value band + feature IV vs purchase label."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    band = F.lit(len(_WOE_BANDS)).cast("long")
    for i in range(len(_WOE_BANDS) - 1, -1, -1):
        band = F.when(
            cents <= _WOE_BANDS[i], F.lit(i).cast("long")
        ).otherwise(band)
    per = (
        ev.select(
            band.alias("band"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("label"),
        )
        .groupBy("band")
        .agg(
            F.sum("label").cast("long").alias("goods"),
            (F.count(F.lit(1)) - F.sum("label"))
            .cast("long")
            .alias("bads"),
        )
    )
    tot = per.agg(
        F.sum("goods").cast("long").alias("g"),
        F.sum("bads").cast("long").alias("bb"),
    )
    both = F.broadcast(tot).crossJoin(per).select(
        "band", "goods", "bads", "g", "bb"
    )
    ok = (F.col("goods") > 0) & (F.col("bads") > 0)
    w_expr = F.log(
        F.col("goods")
        * F.lit(1.0)
        * F.col("bb")
        / (F.col("bads") * F.lit(1.0) * F.col("g"))
    )
    woe = both.select(
        "band",
        "goods",
        "bads",
        "g",
        "bb",
        F.when(ok, w_expr).otherwise(F.lit(0.0)).alias("w"),
        F.when(
            ok,
            F.floor(
                (
                    F.col("goods") * F.lit(1.0) / F.col("g")
                    - F.col("bads") * F.lit(1.0) / F.col("bb")
                )
                * w_expr
                * F.lit(1000000.0)
                + F.lit(0.505)
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("iv_micro"),
    )
    ivt = woe.agg(
        F.sum("iv_micro").cast("long").alias("iv_total_micro")
    )
    return woe.crossJoin(F.broadcast(ivt)).select(
        "band",
        "goods",
        "bads",
        rnd(F.col("goods") * F.lit(1.0) / F.col("g"), 4).alias(
            "good_share"
        ),
        rnd(F.col("bads") * F.lit(1.0) / F.col("bb"), 4).alias(
            "bad_share"
        ),
        rnd(F.col("w"), 4).alias("woe"),
        rnd(F.col("iv_total_micro") / F.lit(1000000.0), 4).alias(
            "iv_total"
        ),
    )


# ---------------------------------------------------------------------------
# Ljung-Box whiteness of the differenced daily series
# ---------------------------------------------------------------------------

#: lags tested; chi-square 95% critical value for df=7 (literal)
_LB_LAGS = 7
_LB_CHI2_95 = 14.0671


@op(
    "ts_ljung_box_whiteness",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                        AS BIGINT) AS d,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events GROUP BY 1
        ),
        diff AS (
            -- day-over-day difference removes the level: whiteness of
            -- the differences is the random-walk diagnostic
            SELECT d, cents - lag(cents) OVER (ORDER BY d) AS x
            FROM daily
        ),
        xs AS (SELECT d, x FROM diff WHERE x IS NOT NULL),
        lagk AS (
            SELECT a.x AS x, b.x AS y, k.k
            FROM xs a
            JOIN (SELECT CAST(u.k AS BIGINT) AS k
                  FROM unnest(range(1, {_LB_LAGS + 1})) AS u(k)) k
              ON true
            JOIN xs b ON b.d = a.d - k.k
        ),
        mom AS (
            SELECT k,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM lagk GROUP BY k
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n_obs FROM xs),
        r AS (
            SELECT m.k, nn.n_obs,
                   -- lag-k Pearson r from BIGINT moments (1.0::DOUBLE
                   -- load-bearing), zero-variance guarded
                   CASE WHEN (m.n * 1.0::DOUBLE * m.sxx
                              - m.sx * 1.0::DOUBLE * m.sx)
                             * (m.n * 1.0::DOUBLE * m.syy
                                - m.sy * 1.0::DOUBLE * m.sy) > 0
                        THEN (m.n * 1.0::DOUBLE * m.sxy
                              - m.sx * 1.0::DOUBLE * m.sy)
                             / sqrt((m.n * 1.0::DOUBLE * m.sxx
                                     - m.sx * 1.0::DOUBLE * m.sx)
                                    * (m.n * 1.0::DOUBLE * m.syy
                                       - m.sy * 1.0::DOUBLE * m.sy))
                        ELSE 0.0 END AS rk
            FROM mom m CROSS JOIN nn
        ),
        q AS (
            -- Q = n(n+2) * sum rk^2/(n-k); terms nano-frozen before
            -- the cross-lag BIGINT sum (order-free)
            SELECT CAST(sum(CAST(floor(rk * rk / (n_obs - k)
                       * 1000000000.0 + 0.505) AS BIGINT)) AS BIGINT)
                       AS s_nano,
                   max(n_obs) AS n_obs
            FROM r
        )
        SELECT r.k AS lag, {sql_rnd("r.rk", 4)} AS acf_diff,
               {sql_rnd(
                   "q.n_obs * (q.n_obs + 2.0)"
                   " * (q.s_nano / 1000000000.0)", 4
               )} AS q_stat,
               {_LB_CHI2_95} AS chi2_crit_95,
               (q.n_obs * (q.n_obs + 2.0)
                * (q.s_nano / 1000000000.0) <= {_LB_CHI2_95})
                   AS is_white_95
        FROM r CROSS JOIN q
    """,
    scale=(
        "Ljung-Box portmanteau whiteness test on the day-over-day "
        "differenced series: lag-1..7 autocorrelations from exact "
        "BIGINT cent moments (the wave-21 Pearson template per lag, "
        "zero-variance guarded), Q = n(n+2)*sum(rk^2/(n-k)) with "
        "each term nano-frozen before the order-free sum, compared "
        "to the LITERAL chi-square 95% critical value for df=7 (no "
        "p-value transcendentals). Differences white -> the daily "
        "series is a random walk and ts_holt_linear's trend is "
        "noise; Q blowing past 14.07 -> real structure remains and "
        "the seasonal models (HW/Croston) have something to model. "
        "Shape: one day agg, a |days|-row bounded lag window + "
        "7-lag equi self-join on day index, a 7-key moment agg, "
        "7-row report. 100 TB: everything after the first agg is "
        "|days|-bounded."
    ),
)
def ts_ljung_box_whiteness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lag-1..7 ACF of daily differences + Ljung-Box Q vs literal."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            (F.unix_micros(F.col("ts")) / F.lit(86400000000))
            .cast("long")
            .alias("d"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    diff = daily.select(
        "d",
        (
            F.col("cents")
            - F.lag("cents").over(Window.orderBy("d"))
        ).alias("x"),
    )
    # xs feeds both lag-join ends and the n_obs scalar — cached, the
    # |days|-row diamond plans once (wave-22 Exchange-count precedent)
    xs = diff.where(F.col("x").isNotNull()).cache()
    kgrid = spark.range(1, _LB_LAGS + 1).select(F.col("id").alias("k"))
    a = xs.select(F.col("d").alias("da"), F.col("x").alias("x"))
    b = xs.select(F.col("d").alias("db"), F.col("x").alias("y"))
    lagk = (
        a.crossJoin(F.broadcast(kgrid))
        .join(b, F.col("db") == F.col("da") - F.col("k"))
    )
    mom = lagk.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nn = xs.agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    vx = F.col("n") * F.lit(1.0) * F.col("sxx") - F.col("sx") * F.lit(
        1.0
    ) * F.col("sx")
    vy = F.col("n") * F.lit(1.0) * F.col("syy") - F.col("sy") * F.lit(
        1.0
    ) * F.col("sy")
    rk = (
        F.col("n") * F.lit(1.0) * F.col("sxy")
        - F.col("sx") * F.lit(1.0) * F.col("sy")
    ) / F.sqrt(vx * vy)
    r = mom.crossJoin(F.broadcast(nn)).select(
        "k",
        "n_obs",
        F.when(vx * vy > 0, rk).otherwise(F.lit(0.0)).alias("rk"),
    )
    q = r.agg(
        F.sum(
            F.floor(
                F.col("rk")
                * F.col("rk")
                / (F.col("n_obs") - F.col("k"))
                * F.lit(1000000000.0)
                + F.lit(0.505)
            ).cast("long")
        )
        .cast("long")
        .alias("s_nano"),
        F.max("n_obs").alias("n_obs2"),
    )
    qstat = (
        F.col("n_obs2")
        * (F.col("n_obs2") + F.lit(2.0))
        * (F.col("s_nano") / F.lit(1000000000.0))
    )
    return r.crossJoin(F.broadcast(q)).select(
        F.col("k").alias("lag"),
        rnd(F.col("rk"), 4).alias("acf_diff"),
        rnd(qstat, 4).alias("q_stat"),
        F.lit(_LB_CHI2_95).alias("chi2_crit_95"),
        (qstat <= F.lit(_LB_CHI2_95)).alias("is_white_95"),
    )


# ---------------------------------------------------------------------------
# sign-bit balance / independence audit
# ---------------------------------------------------------------------------


@op(
    "emb_sign_bit_balance_audit",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        bits AS (
            SELECT vec_id, CAST(u.j AS BIGINT) AS j,
                   CASE WHEN v[CAST(u.j AS INTEGER) + 1] >= 0
                        THEN 1 ELSE 0 END AS b
            FROM e, unnest(range(0, 64)) AS u(j)
        ),
        per AS (
            SELECT j,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(b) AS BIGINT) AS ones
            FROM bits GROUP BY j
        ),
        adj AS (
            -- adjacent-bit agreement: share of vectors where bit j
            -- and bit j+1 agree (independent balanced bits -> 0.5)
            SELECT a.j,
                   CAST(sum(CASE WHEN a.b = b.b THEN 1 ELSE 0 END)
                        AS BIGINT) AS agree,
                   CAST(count(*) AS BIGINT) AS n
            FROM bits a JOIN bits b
              ON b.vec_id = a.vec_id AND b.j = a.j + 1
            GROUP BY a.j
        ),
        worst AS (
            SELECT CAST(max(abs(2 * ones - n)) AS BIGINT)
                       AS worst_dev2
            FROM per
        )
        SELECT p.j AS bit, p.ones,
               {sql_rnd("p.ones * 1.0 / p.n", 4)} AS ones_share,
               {sql_rnd("abs(2 * p.ones - p.n) * 1.0 / (2 * p.n)", 4)}
                   AS imbalance,
               {sql_rnd(
                   "COALESCE(a.agree * 1.0 / a.n, 0.5)", 4
               )} AS adj_agree_share,
               {sql_rnd("w.worst_dev2 * 1.0 / (2 * p.n)", 4)}
                   AS max_imbalance
        FROM per p
        LEFT JOIN adj a ON a.j = p.j
        CROSS JOIN worst w
    """,
    scale=(
        "Index-quality dual of emb_sign_binarize_recall: a 64-bit "
        "sign index is only as good as its bits — each should split "
        "the corpus ~50/50 (imbalance = |share - 0.5|) and neighbors "
        "should agree ~50% (independence). A bit at 0.9 ones-share "
        "carries 0.47 bits of information instead of 1; correlated "
        "neighbors make Hamming distances collapse (the hubness "
        "failure mode). All counts exact BIGINTs (|2*ones - n| is "
        "the doubled-integer imbalance, the MAD trick); ratios are "
        "single frozen rationals; bit 63 has no neighbor and emits "
        "the independent-ideal 0.5 via COALESCE in both engines. "
        "Shape: one posexplode, a 64-key agg, an in-vector adjacent "
        "self-join (vec_id co-partitioned, N*63 rows), a 1-row max. "
        "100 TB: map passes + d-bounded aggs; run it whenever the "
        "binarized index is rebuilt."
    ),
)
def emb_sign_bit_balance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-bit balance + adjacent independence of sign signatures."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bits = emb.select(
        "vec_id", F.posexplode("v").alias("j", "xd")
    ).select(
        "vec_id",
        F.col("j").cast("long").alias("j"),
        F.when(F.col("xd") >= 0, 1).otherwise(0).alias("b"),
    )
    per = bits.groupBy("j").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("b").cast("long").alias("ones"),
    )
    a, b = bits.alias("a"), bits.alias("b")
    adj = (
        a.join(
            b,
            (F.col("b.vec_id") == F.col("a.vec_id"))
            & (F.col("b.j") == F.col("a.j") + 1),
        )
        .groupBy(F.col("a.j").alias("ja"))
        .agg(
            F.sum(
                F.when(F.col("a.b") == F.col("b.b"), 1).otherwise(0)
            )
            .cast("long")
            .alias("agree"),
            F.count(F.lit(1)).cast("long").alias("na"),
        )
    )
    worst = per.agg(
        F.max(F.abs(2 * F.col("ones") - F.col("n")))
        .cast("long")
        .alias("worst_dev2")
    )
    return (
        per.join(adj, F.col("ja") == F.col("j"), "left")
        .crossJoin(F.broadcast(worst))
        .select(
            F.col("j").alias("bit"),
            "ones",
            rnd(F.col("ones") * F.lit(1.0) / F.col("n"), 4).alias(
                "ones_share"
            ),
            rnd(
                F.abs(2 * F.col("ones") - F.col("n"))
                * F.lit(1.0)
                / (2 * F.col("n")),
                4,
            ).alias("imbalance"),
            rnd(
                F.coalesce(
                    F.col("agree") * F.lit(1.0) / F.col("na"),
                    F.lit(0.5),
                ),
                4,
            ).alias("adj_agree_share"),
            rnd(
                F.col("worst_dev2") * F.lit(1.0) / (2 * F.col("n")), 4
            ).alias("max_imbalance"),
        )
    )


# ---------------------------------------------------------------------------
# quantile treatment effects (distributional A/B)
# ---------------------------------------------------------------------------

#: quantiles compared between arms, integer percents
_QTE_PHIS = (25, 50, 75, 90, 99)


@op(
    "events_quantile_treatment_effect",
    oracle=f"""
        WITH t AS (
            SELECT CAST(user_id % 2 AS BIGINT) AS arm,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
        ),
        vc AS (
            SELECT arm, cents, CAST(count(*) AS BIGINT) AS cnt
            FROM t GROUP BY arm, cents
        ),
        cum AS (
            SELECT arm, cents,
                   CAST(sum(cnt) OVER (PARTITION BY arm ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM vc
        ),
        na AS (
            SELECT arm, CAST(sum(cnt) AS BIGINT) AS n
            FROM vc GROUP BY arm
        ),
        phis AS (SELECT CAST(u.p AS BIGINT) AS p
                 FROM unnest([{", ".join(str(p) for p in _QTE_PHIS)}])
                      AS u(p)),
        want AS (
            SELECT ph.p, na.arm, na.n,
                   (ph.p * na.n + 99) // 100 AS target
            FROM phis ph CROSS JOIN na
        ),
        qq AS (
            SELECT w.p, w.arm, min(c.cents) AS q_cents
            FROM want w JOIN cum c
              ON c.arm = w.arm AND c.cum >= w.target
            GROUP BY w.p, w.arm
        ),
        piv AS (
            SELECT p,
                   max(CASE WHEN arm = 0 THEN q_cents END) AS q_a,
                   max(CASE WHEN arm = 1 THEN q_cents END) AS q_b
            FROM qq GROUP BY p
        )
        SELECT {sql_rnd("p / 100.0", 2)} AS phi,
               q_a AS q_control_cents, q_b AS q_treat_cents,
               CAST(q_b - q_a AS BIGINT) AS qte_cents,
               {sql_rnd(
                   "(q_b - q_a) * 1.0 / q_a", 4
               )} AS qte_relative
        FROM piv
    """,
    scale=(
        "Distributional treatment effect: per-arm EXACT value "
        "quantiles at a literal phi grid (the VALUE-GROUPED "
        "cumulative pattern — rank windows only over the per-arm "
        "cents aggregate, never raw facts), differenced into the "
        "quantile treatment effect. A mean lift (events_ab_test_"
        "lift) that lives only above the 90th percentile is a tail "
        "effect — winsorize-sensitivity flags it, THIS op localizes "
        "it. All ranks exact BIGINTs, target = ceil(phi*n) in "
        "integer arithmetic; the only doubles are the final frozen "
        "ratios. Shape: one (arm, cents) agg, two bounded per-arm "
        "cumulative windows, a 5-phi probe join over the value "
        "domain, 5-row report. 100 TB: value domains are bounded "
        "(cents), so the cumulative table is tiny regardless of row "
        "count — the same reason the quantile-sketch audit scales."
    ),
)
def events_quantile_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact per-arm quantiles at a literal grid + their difference."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        (F.col("user_id") % 2).cast("long").alias("arm"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    # vc feeds the cumulative AND the per-arm totals — cached
    vc = (
        t.groupBy("arm", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .cache()
    )
    cum = vc.withColumn(
        "cum",
        F.sum("cnt")
        .over(
            Window.partitionBy("arm")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    na = vc.groupBy("arm").agg(F.sum("cnt").cast("long").alias("n"))
    phis = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(int(p)) for p in _QTE_PHIS])
        ).alias("p0")
    ).select(F.col("p0").cast("long").alias("p"))
    want = phis.crossJoin(na).select(
        "p",
        "arm",
        "n",
        F.expr("(p * n + 99) div 100").alias("target"),
    )
    qq = (
        F.broadcast(want)
        .alias("w")
        .join(
            cum.alias("c"),
            (F.col("c.arm") == F.col("w.arm"))
            & (F.col("c.cum") >= F.col("w.target")),
        )
        .groupBy("w.p", "w.arm")
        .agg(F.min("c.cents").alias("q_cents"))
    )
    piv = qq.groupBy("p").agg(
        F.max(F.when(F.col("arm") == 0, F.col("q_cents"))).alias("q_a"),
        F.max(F.when(F.col("arm") == 1, F.col("q_cents"))).alias("q_b"),
    )
    return piv.select(
        rnd(F.col("p") / F.lit(100.0), 2).alias("phi"),
        F.col("q_a").alias("q_control_cents"),
        F.col("q_b").alias("q_treat_cents"),
        (F.col("q_b") - F.col("q_a")).cast("long").alias("qte_cents"),
        rnd(
            (F.col("q_b") - F.col("q_a")) * F.lit(1.0) / F.col("q_a"),
            4,
        ).alias("qte_relative"),
    )


# ---------------------------------------------------------------------------
# boilerplate detection via document-frequency n-grams
# ---------------------------------------------------------------------------

#: word-n-gram order and how many top boilerplate grams to report
_BP_N = 5
_BP_TOP = 10


@op(
    "corpus_boilerplate_df_ngrams",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, source,
                   string_split(text, ' ') AS ws
            FROM documents
        ),
        -- literal spine + range filter: DuckDB range() can't take
        -- lateral column args (engine-quirk note, wave-7 pattern)
        spine AS (SELECT i FROM range(1, 512) t(i)),
        grams AS (
            SELECT DISTINCT doc_id, source,
                   list_aggregate(ws[i:i + {_BP_N - 1}],
                                  'string_agg', ' ') AS gram
            FROM words JOIN spine ON i <= len(ws) - {_BP_N - 1}
        ),
        df AS (
            SELECT gram,
                   CAST(count(*) AS BIGINT) AS doc_freq,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources
            FROM grams GROUP BY gram
        ),
        top AS (
            SELECT gram, doc_freq, n_sources,
                   row_number() OVER (ORDER BY doc_freq DESC, gram)
                       AS rk
            FROM df
        ),
        sel AS (SELECT * FROM top WHERE rk <= {_BP_TOP}),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
               FROM documents),
        cov AS (
            SELECT CAST(count(DISTINCT g.doc_id) AS BIGINT)
                       AS docs_covered
            FROM grams g JOIN sel s ON s.gram = g.gram
        )
        SELECT s.rk, s.gram, s.doc_freq, s.n_sources,
               {sql_rnd("s.doc_freq * 1.0 / nd.n_docs", 4)}
                   AS doc_share,
               cov.docs_covered,
               {sql_rnd("cov.docs_covered * 1.0 / nd.n_docs", 4)}
                   AS coverage_share
        FROM sel s CROSS JOIN nd CROSS JOIN cov
    """,
    scale=(
        "Boilerplate screen: the top word-{N}-grams by DOCUMENT "
        "frequency (each doc counted once per gram — DISTINCT before "
        "the count) plus how many sources they span and what share "
        "of the corpus carries at least one of them. High-DF grams "
        "spanning many sources are templates/disclaimers — the "
        "C4-style 'remove boilerplate lines' rule gets its line "
        "list HERE (complements dedup_substring_spans, which finds "
        "pairwise repeats, not corpus-wide templates). The rank "
        "window runs over the gram-count AGGREGATE (value-grouped, "
        "bounded); ties broken by the gram text itself. Shape: one "
        "in-row slice explode, a distinct, a gram-keyed agg, top-10 "
        "rank, one semi-join back for coverage. 100 TB: gram tables "
        "shard by hash; the top-k is TakeOrdered-scale."
    ).replace("{N}", str(_BP_N)),
)
def corpus_boilerplate_df_ngrams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top document-frequency word-5-grams + corpus coverage."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    # grams feeds the DF agg AND the coverage semi-join — cached
    grams = (
        words.where(F.size("ws") >= _BP_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(ws) - {_BP_N}), "
                    f"i -> array_join(slice(ws, i + 1, {_BP_N}), ' '))"
                )
            ).alias("gram"),
        )
        .distinct()
        .cache()
    )
    df = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    sel = (
        df.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("doc_freq"), "gram")
            ),
        )
        .where(F.col("rk") <= _BP_TOP)
    )
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    cov = (
        grams.join(
            F.broadcast(sel.select(F.col("gram").alias("sgram"))),
            F.col("gram") == F.col("sgram"),
        )
        .agg(
            F.countDistinct("doc_id").cast("long").alias("docs_covered")
        )
    )
    return (
        sel.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(cov))
        .select(
            "rk",
            "gram",
            "doc_freq",
            "n_sources",
            rnd(
                F.col("doc_freq") * F.lit(1.0) / F.col("n_docs"), 4
            ).alias("doc_share"),
            "docs_covered",
            rnd(
                F.col("docs_covered") * F.lit(1.0) / F.col("n_docs"), 4
            ).alias("coverage_share"),
        )
    )
