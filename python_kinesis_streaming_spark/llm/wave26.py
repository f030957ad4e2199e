"""Round-14 wave-26 ops (SURVEY §2.38): multi-touch attribution,
instrumentation QA, metric-space labels, budget planning, seasonal
ANOVA.

- ``events_attribution_position``: U-shaped (40/20/40) position-based
  credit per touch type — the multi-touch member of the attribution
  family (first_touch and time_decay exist); credits are EXACT
  integer micros with a deterministic remainder rule, so the 1.0 per
  user conservation is an identity, not an approximation.
- ``dq_event_double_fire_audit``: same-user same-type events closer
  than a literal 1 s are client double-fires — the instrumentation
  bug every funnel metric silently absorbs; per-type rates + the
  minimum observed gap.
- ``emb_triplet_margin_audit``: per sign-bit cell, sampled anchors'
  best same-label vs best other-label cosine — the margin that tells
  whether labels are metrically separable BEFORE anyone trains a
  probe (in-cell bounded, never all-pairs).
- ``corpus_token_budget_plan``: greedy half-budget source selection
  by integer-frozen quality rank with running token cost — the
  knapsack-lite plan corpus_mixture_temperature's weights feed into.
- ``ts_weekday_anova``: one-way ANOVA of daily cent totals across the
  7 day-of-week classes from exact BIGINT moments, F against a
  LITERAL conservative 95% critical value — is the weekly cycle
  real before ts_holt_winters_seasonal models it?

Same discipline as waves 7-25: exact integers before any
cross-partition sum, identical aliases both engines, BIGINT casts in
oracles, 1.0::DOUBLE where sums multiply, literal grids, bounded
windows (value-grouped / per-key only), broadcast-bounded joins; no
exp/pow, ln only on identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from python_kinesis_streaming_spark.functions.rounding import rnd, sql_rnd
from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# U-shaped position-based attribution
# ---------------------------------------------------------------------------

#: touch event types credited by the U-shaped model
_AT_TOUCHES = ("click", "view")


@op(
    "events_attribution_position",
    oracle=f"""
        WITH t AS (
            SELECT user_id, event_type,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
                       AS ts_us,
                   event_id
            FROM events
            WHERE event_type IN ('click', 'view')
        ),
        o AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id) AS rn,
                   CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
                       AS k
            FROM t
        ),
        c AS (
            -- EXACT integer micro credits: 1 touch -> 1.0; 2 -> 0.5
            -- each; k>2 -> 0.4 first, 0.4 last, 0.2 split over the
            -- middles with the remainder going to the earliest
            -- middles (deterministic, conserves 1.0 per user)
            SELECT user_id, event_type,
                   CASE
                     WHEN k = 1 THEN 1000000
                     WHEN k = 2 THEN 500000
                     WHEN rn = 1 OR rn = k THEN 400000
                     ELSE 200000 // (k - 2)
                          + CASE WHEN rn - 1 <= 200000 % (k - 2)
                                 THEN 1 ELSE 0 END
                   END AS credit_micro
            FROM o
        ),
        agg AS (
            SELECT event_type,
                   CAST(sum(credit_micro) AS BIGINT) AS credit_micro,
                   CAST(count(*) AS BIGINT) AS n_touches
            FROM c GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(sum(credit_micro) AS BIGINT) AS total_micro,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM c
        )
        SELECT a.event_type, a.n_touches, a.credit_micro,
               {sql_rnd("a.credit_micro / 1000000.0", 2)}
                   AS credit_users,
               {sql_rnd(
                   "a.credit_micro * 1.0 / t.total_micro", 4
               )} AS credit_share,
               t.n_users,
               (t.total_micro = t.n_users * 1000000)
                   AS conservation_ok
        FROM agg a CROSS JOIN tot t
    """,
    scale=(
        "U-shaped (position-based 40/20/40) multi-touch attribution — "
        "the third member of the attribution family (first_touch, "
        "time_decay). Credits are exact integer micros with a "
        "deterministic remainder rule (200000 div (k-2) plus one "
        "extra micro to the earliest middles), so sum(credit) = "
        "1000000 per user is an IDENTITY — emitted as the "
        "conservation_ok boolean, which both engines must derive "
        "from their own sums. Shape: one filtered scan, one per-user "
        "window pair (row_number + count — the sessionize sort), a "
        "|touch-types|-key agg, 1-row total. 100 TB: identical "
        "shuffle to sessionization; attribution models differ only "
        "in the per-row credit expression."
    ),
)
def events_attribution_position(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """U-shaped touch credit per type, exact micro conservation."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.where(F.col("event_type").isin(*_AT_TOUCHES)).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
    )
    wu = Window.partitionBy("user_id")
    o = t.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(wu.orderBy("ts_us", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(wu).cast("long").alias("k"),
    )
    credit = (
        F.when(F.col("k") == 1, F.lit(1000000))
        .when(F.col("k") == 2, F.lit(500000))
        .when(
            (F.col("rn") == 1) | (F.col("rn") == F.col("k")),
            F.lit(400000),
        )
        .otherwise(
            F.expr("200000 div (k - 2)")
            + F.when(
                F.col("rn") - 1 <= F.expr("200000 % (k - 2)"), 1
            ).otherwise(0)
        )
    )
    c = o.select("user_id", "event_type", credit.alias("credit_micro"))
    agg = c.groupBy("event_type").agg(
        F.sum("credit_micro").cast("long").alias("credit_micro"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
    )
    tot = c.agg(
        F.sum("credit_micro").cast("long").alias("total_micro"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_touches",
        "credit_micro",
        rnd(F.col("credit_micro") / F.lit(1000000.0), 2).alias(
            "credit_users"
        ),
        rnd(
            F.col("credit_micro") * F.lit(1.0) / F.col("total_micro"),
            4,
        ).alias("credit_share"),
        "n_users",
        (F.col("total_micro") == F.col("n_users") * 1000000).alias(
            "conservation_ok"
        ),
    )


# ---------------------------------------------------------------------------
# double-fire instrumentation audit
# ---------------------------------------------------------------------------

#: gap below which a same-user same-type repeat is a double-fire (µs)
_DF_GAP_US = 1000000


@op(
    "dq_event_double_fire_audit",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_type,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
                       AS ts_us,
                   event_id
            FROM events
        ),
        g AS (
            SELECT event_type,
                   ts_us - lag(ts_us) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts_us, event_id) AS gap_us
            FROM e
        ),
        agg AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN gap_us < {_DF_GAP_US}
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_double_fires,
                   CAST(min(gap_us) AS BIGINT) AS min_gap_us
            FROM g GROUP BY event_type
        )
        SELECT event_type, n_events, n_double_fires,
               {sql_rnd("n_double_fires * 1.0 / n_events", 6)}
                   AS double_fire_rate,
               {sql_rnd("min_gap_us / 1000.0", 3)} AS min_gap_ms
        FROM agg
    """,
    scale=(
        "Client double-fire screen: a same-user same-type event "
        "landing under 1 s after its predecessor is (with "
        "overwhelming odds) a retry/double-tap, and every funnel and "
        "count metric silently absorbs them. Per type: the "
        "double-fire count, rate and the minimum observed gap (a "
        "min_gap of ~0 ms is the smoking gun; a clean type bottoms "
        "out at human-scale gaps). Gap arithmetic is exact BIGINT "
        "micros from one (user, type)-keyed lag window. Shape: one "
        "equi-keyed fact window + a |types|-key agg. 100 TB: the "
        "same shuffle the dedup-within-watermark operator runs; this "
        "is its offline calibration table (what dedup window would "
        "kill the double-fires without eating real repeats)."
    ),
)
def dq_event_double_fire_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-type double-fire counts/rates from one keyed lag window."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    g = ev.select(
        "event_type",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("gap_us") < _DF_GAP_US, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_double_fires"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_double_fires",
        rnd(
            F.col("n_double_fires") * F.lit(1.0) / F.col("n_events"), 6
        ).alias("double_fire_rate"),
        rnd(F.col("min_gap_us") / F.lit(1000.0), 3).alias("min_gap_ms"),
    )


# ---------------------------------------------------------------------------
# in-cell triplet margin audit (label separability)
# ---------------------------------------------------------------------------


@op(
    "emb_triplet_margin_audit",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings
        ),
        cell AS (
            -- 16 cells from the first four sign bits (deterministic,
            -- index-free); anchors are the 1-in-10 sample
            SELECT vec_id, label, v,
                   CAST((CASE WHEN v[1] >= 0 THEN 8 ELSE 0 END)
                      + (CASE WHEN v[2] >= 0 THEN 4 ELSE 0 END)
                      + (CASE WHEN v[3] >= 0 THEN 2 ELSE 0 END)
                      + (CASE WHEN v[4] >= 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS cid
            FROM e
        ),
        anch AS (SELECT * FROM cell WHERE vec_id % 10 = 0),
        pair AS (
            SELECT a.vec_id AS aid, a.cid, a.label AS alabel,
                   c.label AS clabel,
                   floor(list_cosine_similarity(a.v, c.v) * 10000.0
                         + 0.505) / 10000.0 AS sim
            FROM anch a JOIN cell c
              ON c.cid = a.cid AND c.vec_id <> a.vec_id
        ),
        best AS (
            SELECT aid, cid,
                   max(CASE WHEN clabel = alabel THEN sim END)
                       AS pos_sim,
                   max(CASE WHEN clabel <> alabel THEN sim END)
                       AS neg_sim
            FROM pair GROUP BY aid, cid
        ),
        ok AS (
            SELECT cid,
                   CAST(count(*) AS BIGINT) AS n_anchors,
                   CAST(sum(CASE WHEN pos_sim > neg_sim
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                   CAST(sum(CAST(floor((pos_sim - neg_sim)
                       * 1000000.0 + 0.505) AS BIGINT)) AS BIGINT)
                       AS margin_micro
            FROM best
            WHERE pos_sim IS NOT NULL AND neg_sim IS NOT NULL
            GROUP BY cid
        )
        SELECT cid AS cell, n_anchors, n_pos,
               floor(n_pos * 1.0 / n_anchors * 10000.0 + 0.505)
                   / 10000.0 AS pos_margin_share,
               floor(margin_micro / (1000000.0 * n_anchors)
                     * 10000.0 + 0.505) / 10000.0 AS mean_margin
        FROM ok
    """,
    scale=(
        "Label separability in embedding space BEFORE training any "
        "probe: per sign-bit cell (16 deterministic cells from the "
        "first four sign bits — bounded, index-free), each sampled "
        "anchor's best same-label cosine vs best other-label cosine; "
        "a positive margin means the nearest neighbor of the right "
        "class beats every impostor (the triplet-loss quantity, "
        "audited not trained). Sims are rnd-frozen per pair BEFORE "
        "the max (max of frozen values is order-free); margins "
        "micro-frozen before the per-cell BIGINT sum. Shape: in-cell "
        "anchor-sample join (|anchors| x cell size, never all-"
        "pairs), one agg. 100 TB: cells shard the pair space exactly "
        "like SemDeDup's; the anchor rate bounds the cost linearly."
    ),
)
def emb_triplet_margin_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-cell best-pos vs best-neg cosine margins for anchors."""
    from python_kinesis_streaming_spark.llm.similarity import dot, l2norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cid = (
        F.when(F.element_at("v", 1) >= 0, 8).otherwise(0)
        + F.when(F.element_at("v", 2) >= 0, 4).otherwise(0)
        + F.when(F.element_at("v", 3) >= 0, 2).otherwise(0)
        + F.when(F.element_at("v", 4) >= 0, 1).otherwise(0)
    ).cast("long")
    cell = emb.select(
        "vec_id", "label", "v", cid.alias("cid"), l2norm("v").alias("nrm")
    )
    anch = cell.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("alabel"),
        F.col("v").alias("av"),
        F.col("cid").alias("acid"),
        F.col("nrm").alias("anrm"),
    )
    pair = cell.join(
        F.broadcast(anch),
        (F.col("cid") == F.col("acid"))
        & (F.col("vec_id") != F.col("aid")),
    ).select(
        "aid",
        F.col("acid").alias("pcid"),
        "alabel",
        F.col("label").alias("clabel"),
        rnd(
            dot(F.col("av"), F.col("v"))
            / (F.col("anrm") * F.col("nrm")),
            4,
        ).alias("sim"),
    )
    best = pair.groupBy("aid", "pcid").agg(
        F.max(
            F.when(F.col("clabel") == F.col("alabel"), F.col("sim"))
        ).alias("pos_sim"),
        F.max(
            F.when(F.col("clabel") != F.col("alabel"), F.col("sim"))
        ).alias("neg_sim"),
    )
    ok = (
        best.where(
            F.col("pos_sim").isNotNull() & F.col("neg_sim").isNotNull()
        )
        .groupBy(F.col("pcid").alias("cell"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            F.sum(
                F.when(
                    F.col("pos_sim") > F.col("neg_sim"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_pos"),
            F.sum(
                F.floor(
                    (F.col("pos_sim") - F.col("neg_sim"))
                    * F.lit(1000000.0)
                    + F.lit(0.505)
                ).cast("long")
            )
            .cast("long")
            .alias("margin_micro"),
        )
    )
    return ok.select(
        "cell",
        "n_anchors",
        "n_pos",
        rnd(F.col("n_pos") * F.lit(1.0) / F.col("n_anchors"), 4).alias(
            "pos_margin_share"
        ),
        rnd(
            F.col("margin_micro")
            / (F.lit(1000000.0) * F.col("n_anchors")),
            4,
        ).alias("mean_margin"),
    )


# ---------------------------------------------------------------------------
# greedy token budget plan
# ---------------------------------------------------------------------------


@op(
    "corpus_token_budget_plan",
    oracle=f"""
        WITH d AS (
            SELECT source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
            FROM documents
        ),
        per AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS docs_s,
                   CAST(sum(toks) AS BIGINT) AS toks_s,
                   CAST(sum(is_en) AS BIGINT) AS en_s
            FROM d GROUP BY source
        ),
        q AS (
            -- integer-frozen quality key: micro en-share (exact
            -- integer division — identical rank both engines)
            SELECT source, docs_s, toks_s,
                   en_s * 1000000 // docs_s AS quality_micro
            FROM per
        ),
        r AS (
            SELECT *,
                   row_number() OVER (ORDER BY quality_micro DESC,
                                      source) AS rk,
                   CAST(sum(toks_s) OVER (ORDER BY quality_micro DESC,
                        source ROWS BETWEEN UNBOUNDED PRECEDING AND
                        CURRENT ROW) AS BIGINT) AS cum_toks
            FROM q
        ),
        b AS (
            SELECT CAST(sum(toks_s) AS BIGINT) AS total,
                   CAST(sum(toks_s) // 2 AS BIGINT) AS budget
            FROM per
        )
        SELECT r.rk, r.source, r.quality_micro, r.toks_s, r.cum_toks,
               b.budget, b.total,
               (r.cum_toks <= b.budget) AS selected,
               {sql_rnd("r.cum_toks * 1.0 / b.total", 4)}
                   AS cum_share
        FROM r CROSS JOIN b
    """,
    scale=(
        "Greedy half-budget selection: rank sources by an "
        "integer-frozen quality key (micro en-share — exact integer "
        "division, identical rank both engines, totally tie-broken "
        "by source), take them in order while the running token cost "
        "fits the budget (= half the corpus). The knapsack-lite plan "
        "whose complement is exactly what corpus_mixture_temperature "
        "re-weights and corpus_source_ablation_matrix prices "
        "removing. All tokens and ranks exact BIGINTs; the rank and "
        "cumulative windows run over the |sources|-row AGGREGATE "
        "(value-grouped, bounded). Shape: one source agg, two "
        "bounded 20-row windows, a 1-row budget scalar. 100 TB: the "
        "plan is arithmetic on the datasheet aggregate — free."
    ),
)
def corpus_token_budget_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Greedy quality-ranked source selection under a half budget."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    # per feeds the quality rank AND the budget scalar — cached
    per = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_s"),
            F.sum("toks").cast("long").alias("toks_s"),
            F.sum("is_en").cast("long").alias("en_s"),
        )
        .cache()
    )
    q = per.select(
        "source",
        "docs_s",
        "toks_s",
        F.expr("en_s * 1000000 div docs_s").alias("quality_micro"),
    )
    wq = Window.orderBy(F.desc("quality_micro"), "source")
    r = q.select(
        F.row_number().over(wq).alias("rk"),
        "source",
        "quality_micro",
        "toks_s",
        F.sum("toks_s")
        .over(
            wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("cum_toks"),
    )
    b = per.agg(
        F.sum("toks_s").cast("long").alias("total"),
        (F.sum("toks_s") / 2).cast("long").alias("budget"),
    )
    return r.crossJoin(F.broadcast(b)).select(
        "rk",
        "source",
        "quality_micro",
        "toks_s",
        "cum_toks",
        "budget",
        "total",
        (F.col("cum_toks") <= F.col("budget")).alias("selected"),
        rnd(F.col("cum_toks") * F.lit(1.0) / F.col("total"), 4).alias(
            "cum_share"
        ),
    )


# ---------------------------------------------------------------------------
# weekday one-way ANOVA of daily totals
# ---------------------------------------------------------------------------

#: conservative literal F critical value: F(6, 20) at 95% = 2.599;
#: for df2 > 20 the true critical is smaller, so F > this is
#: significant at 95% for ANY df2 >= 20 (documented one-sided gate)
_AN_F_CRIT = 2.599


@op(
    "ts_weekday_anova",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                        AS BIGINT) AS d,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events GROUP BY 1
        ),
        grp AS (
            SELECT d % 7 AS wd, cents FROM daily
        ),
        per AS (
            SELECT wd,
                   CAST(count(*) AS BIGINT) AS n_g,
                   CAST(sum(cents) AS BIGINT) AS s1_g,
                   CAST(sum(cents * cents) AS BIGINT) AS s2_g
            FROM grp GROUP BY wd
        ),
        w2 AS (
            -- per-group s1^2/n term, frozen to WHOLE cents^2 BEFORE
            -- the cross-group sum (order-free): a micro freeze of a
            -- squared-cents quantity overflows int64 (the wave-15
            -- lesson); 1.0::DOUBLE load-bearing
            SELECT wd, n_g, s1_g, s2_g,
                   CAST(floor(s1_g * 1.0::DOUBLE * s1_g / n_g
                        + 0.505) AS BIGINT) AS t_int
            FROM per
        ),
        tot AS (
            SELECT CAST(sum(n_g) AS BIGINT) AS n,
                   CAST(sum(s1_g) AS BIGINT) AS s1,
                   CAST(sum(s2_g) AS BIGINT) AS s2,
                   CAST(sum(t_int) AS BIGINT) AS t_int,
                   CAST(count(*) AS BIGINT) AS k
            FROM w2
        ),
        f AS (
            -- SSB = sum(s1_g^2/n_g) - S1^2/N; SSW = S2 - sum(...)
            SELECT n, k,
                   (t_int * 1.0::DOUBLE
                    - s1 * 1.0::DOUBLE * s1 / n) AS ssb,
                   (s2 * 1.0::DOUBLE - t_int * 1.0::DOUBLE) AS ssw
            FROM tot
        )
        SELECT n AS n_days, k AS n_groups,
               {sql_rnd("ssb", 2)} AS ss_between,
               {sql_rnd("ssw", 2)} AS ss_within,
               {sql_rnd(
                   "(ssb / (k - 1)) / (ssw / (n - k))", 4
               )} AS f_stat,
               {_AN_F_CRIT} AS f_crit_95,
               ((ssb / (k - 1)) / (ssw / (n - k)) > {_AN_F_CRIT})
                   AS weekday_effect_95
        FROM f
    """,
    scale=(
        "One-way ANOVA of daily cent totals across the 7 day-of-week "
        "classes: F = (SSB/(k-1))/(SSW/(N-k)) from exact BIGINT "
        "moments (per-group s1^2/n micro-frozen before the only "
        "cross-group sum; N and k are data-derived), compared to a "
        "LITERAL conservative critical value — F(6,20) at 95% = "
        "2.599 bounds the true critical from above for any df2 >= "
        "20, so the boolean is a sound one-sided 95% gate (no "
        "F-distribution transcendentals). Significant -> the weekly "
        "cycle is real and ts_holt_winters_seasonal has something "
        "to model; not -> ts_holt_linear suffices. Shape: one day "
        "agg, a 7-key moment agg, 1-row report. 100 TB: everything "
        "after the first agg is 7 rows."
    ),
)
def ts_weekday_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row weekday ANOVA F report on daily cent totals."""
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
    per = (
        daily.select((F.col("d") % 7).alias("wd"), "cents")
        .groupBy("wd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("cents").cast("long").alias("s1_g"),
            F.sum(F.col("cents") * F.col("cents"))
            .cast("long")
            .alias("s2_g"),
        )
    )
    w2 = per.select(
        "wd",
        "n_g",
        "s1_g",
        "s2_g",
        # WHOLE-cents^2 freeze: micro^2 overflows int64 (wave-15)
        F.floor(
            F.col("s1_g")
            * F.lit(1.0)
            * F.col("s1_g")
            / F.col("n_g")
            + F.lit(0.505)
        )
        .cast("long")
        .alias("t_int"),
    )
    tot = w2.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s1_g").cast("long").alias("s1"),
        F.sum("s2_g").cast("long").alias("s2"),
        F.sum("t_int").cast("long").alias("t_int"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    ssb = F.col("t_int") * F.lit(1.0) - F.col("s1") * F.lit(
        1.0
    ) * F.col("s1") / F.col("n")
    ssw = F.col("s2") * F.lit(1.0) - F.col("t_int") * F.lit(1.0)
    fstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return tot.select(
        F.col("n").alias("n_days"),
        F.col("k").alias("n_groups"),
        rnd(ssb, 2).alias("ss_between"),
        rnd(ssw, 2).alias("ss_within"),
        rnd(fstat, 4).alias("f_stat"),
        F.lit(_AN_F_CRIT).alias("f_crit_95"),
        (fstat > F.lit(_AN_F_CRIT)).alias("weekday_effect_95"),
    )
