"""Physical-plan audit (the 100 TB gate): lock in pushdown, broadcast,
partial aggregation, top-k pushdown, and shuffle counts as regression tests.

Plans are inspected with the table cache disabled so the real parquet scans
(and their PushedFilters / ReadSchema) are visible — the cached
InMemoryRelation would otherwise hide them.
"""

from __future__ import annotations

import pytest

from python_kinesis_streaming_spark.registry import all_queries
from python_kinesis_streaming_spark.sources import tables

Q = all_queries()


@pytest.fixture()
def no_table_cache(monkeypatch, spark):
    """Disable the load_table cache AND drop Spark's cached relations:
    the CacheManager substitutes InMemoryRelation into any matching plan
    fragment, so clearing our dict alone wouldn't expose the parquet scan."""
    monkeypatch.setenv("SPARK_GRAFT_NO_TABLE_CACHE", "1")
    spark.catalog.clearCache()
    tables._CACHE.clear()
    yield
    tables._CACHE.clear()  # stale entries are no longer persisted; re-cache lazily


from python_kinesis_streaming_spark.plans import (  # noqa: E402
    plan_of,
    shuffle_count,
)


def test_filter_pushdown_reaches_parquet(spark, sf_dir, no_table_cache):
    """filter_pred's predicates must appear as PushedFilters on the scan
    (row-group stats skipping at scale depends on this)."""
    p = plan_of(Q["filter_pred"](spark, sf_dir))
    assert "PushedFilters: [" in p
    pushed = p.split("PushedFilters: ")[1].splitlines()[0]
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed


def test_column_pruning_reaches_parquet(spark, sf_dir, no_table_cache):
    """project_compute reads a handful of lineitem columns; the ReadSchema
    must NOT contain unused wide columns."""
    p = plan_of(Q["project_compute"](spark, sf_dir))
    rs = p.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_comment" not in rs  # no such col in fixture, but guard anyway
    assert "l_returnflag" not in rs and "l_shipdate" not in rs, rs


def test_dim_joins_are_broadcast(spark, sf_dir, no_table_cache):
    """join_broadcast and every dim join in join_multiway must be BHJ —
    a shuffled dim join at 100 TB is a plan bug."""
    assert "BroadcastHashJoin" in plan_of(Q["join_broadcast"](spark, sf_dir))
    p5 = plan_of(Q["join_multiway"](spark, sf_dir))
    assert p5.count("BroadcastHashJoin") >= 3, "Q5 dims must broadcast"


def test_q1_partial_aggregation(spark, sf_dir, no_table_cache):
    """The Q1 groupBy must partial-aggregate map-side (HashAggregate appears
    as partial+final pair) so the shuffle carries 6 rows per partition."""
    p = plan_of(Q["agg_groupby_q1"](spark, sf_dir), "simple")
    assert p.count("HashAggregate") >= 2
    assert "partial_sum" in p


def test_topk_is_take_ordered(spark, sf_dir, no_table_cache):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global sort."""
    p = plan_of(Q["topk_global"](spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in p


def test_knn_has_no_shuffle(spark, sf_dir, no_table_cache):
    """Brute-force knn is scan → TakeOrdered: zero Exchanges."""
    p = plan_of(Q["sim_knn_cosine"](spark, sf_dir), "simple")
    assert "Exchange" not in p
    assert "TakeOrderedAndProject" in p


def test_window_topn_single_shuffle(spark, sf_dir, no_table_cache):
    """win_rank_topn needs exactly one Exchange (hash by o_custkey); the
    rank filter must not add more."""
    p = plan_of(Q["win_rank_topn"](spark, sf_dir), "simple")
    assert shuffle_count(p) == 1, p


def test_pandas_udf_is_arrow(spark, sf_dir, no_table_cache):
    """udf_pandas_scalar must run via ArrowEvalPython (vectorized), the plain
    python UDF via BatchEvalPython (the documented slow path)."""
    assert "ArrowEvalPython" in plan_of(Q["udf_pandas_scalar"](spark, sf_dir), "simple")
    assert "BatchEvalPython" in plan_of(Q["udf_scalar_py"](spark, sf_dir), "simple")


def test_whole_stage_codegen_on_hot_path(spark, sf_dir, no_table_cache):
    """Q1's filter+project+partial-agg must sit inside WholeStageCodegen.
    AQE only finalizes the physical plan at execution, so run the query and
    read the executed plan (codegen stages render as `*(n)`)."""
    df = Q["agg_groupby_q1"](spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in p, p.splitlines()[:10]


def test_semi_anti_join_plans(spark, sf_dir, no_table_cache):
    """Semi/anti joins must compile to semi/anti hash joins, not inner join
    + distinct."""
    assert "LeftSemi" in plan_of(Q["join_semi"](spark, sf_dir), "simple")
    assert "LeftAnti" in plan_of(Q["join_anti"](spark, sf_dir), "simple")


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_table_cache):
    """Both sides bucketed+sorted on the join key: the SMJ must need neither
    an Exchange nor (after bucket sort files) a shuffle-induced sort."""
    # Disable broadcast so the co-located SMJ path is what's planned (at
    # fixture scale AQE would otherwise just broadcast the small side).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = Q["join_bucketed"](spark, sf_dir)
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in p, p
    assert "SortMergeJoin" in p, p
    # join inputs are bucket-co-located: no hash repartitioning of either side
    assert "Exchange hashpartitioning(l_orderkey" not in p, p
    assert "Exchange hashpartitioning(o_orderkey" not in p, p


def test_salted_join_spreads_key(spark, sf_dir, no_table_cache):
    """Salted join output must equal the plain join (already oracle-pinned);
    here: the join condition really includes the salt column."""
    df = Q["join_skew_salted"](spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in p


def test_partition_pruning(spark, sf_dir, no_table_cache):
    """The partition-column IN filter must appear as PartitionFilters on the
    hive-partitioned scan (2 of 5 event_type dirs read)."""
    df = Q["scan_partition_pruned"](spark, sf_dir)
    p = plan_of(df)
    assert "PartitionFilters: [" in p, p
    pf = p.split("PartitionFilters: ")[1].splitlines()[0]
    assert "event_type" in pf, pf


def test_range_bucketed_join_is_equi_hash(spark, sf_dir, no_table_cache):
    """join_range_bucketed must plan as an equi hash/SMJ join on
    (user_id, bucket) — never BroadcastNestedLoop/Cartesian (the exact
    failure the bucketization exists to prevent)."""
    p = plan_of(Q["join_range_bucketed"](spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    ), p


def test_quantize_is_map_only(spark, sf_dir, no_table_cache):
    """emb_normalize_quantize is index prep over the corpus: pure per-row
    math, so its plan must contain ZERO exchanges."""
    p = plan_of(Q["emb_normalize_quantize"](spark, sf_dir))
    assert "Exchange" not in p, p


def test_funnel_single_join_chain(spark, sf_dir, no_table_cache):
    """funnel_conversion: two partial aggs + joins on user_id; no
    nested-loop/cartesian pair expansion may appear."""
    p = plan_of(Q["funnel_conversion"](spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "partial_min" in p or "partial" in p.lower(), p


def test_mode_preaggregates_before_window(spark, sf_dir, no_table_cache):
    """agg_mode must aggregate (user,type) counts BEFORE the rank window —
    the window sorting raw events would be the 100 TB failure mode."""
    p = plan_of(Q["agg_mode"](spark, sf_dir), "extended")
    agg_pos = p.find("count(1)")
    win_pos = p.find("row_number")
    assert agg_pos != -1 and win_pos != -1
    # In the optimized logical plan (printed after == Optimized ==), the
    # Window node must sit ABOVE the Aggregate (appear before it textually).
    opt = p.split("== Optimized Logical Plan ==")[1]
    assert opt.find("Window") < opt.find("Aggregate"), opt[:2000]


#: Ops whose plan legitimately contains a BroadcastNestedLoopJoin or a
#: 1-row cartesian — each joins against a TINY side (1-row query vector or
#: global-agg result, 5-row region, query batch), so the "nested loop" is
#: O(n·k) with constant k.
BNLJ_ALLOWED = {
    "sim_ann_lsh",
    "join_cross_bounded",
    "sim_query_batch",
    "agg_sketch_merge",  # 1-row exact × 1-row merged-sketch estimate
    "q22_idle_above_avg",  # theta join against the 1-row global-avg scalar
    "corpus_mix_planner",  # |sources| rows × 1-row grand total
    "sim_truncated_dims",  # corpus × 1-row broadcast query vector
    "emb_kmeans_one_iter",  # corpus × k=8-row broadcast centroid table
    "agg_bitmap_distinct",  # |types| rows × 1-row OR-merged global bitmap
    "events_ab_test_lift",  # 1-row variant-A summary × 1-row variant-B summary
    "events_error_rate_alert",  # |hours| rows × 1-row control-band stats
    "q11_important_stock",  # |parts| rows × 1-row broadcast threshold scalar
    "li_discount_uplift",  # 11 bucket rows × 1-row zero-discount baseline
    "agg_minhash_jaccard",  # 5-row signature table × itself (type_a < type_b)
    "dedup_eval_precision_recall",  # three 1-row count aggregates joined
    "ts_rolling_distinct_hll",  # exact-audit leg: ~30-row day spine range join
    "emb_random_projection",  # 64x16 literal sign-matrix range cross
    "events_score_decile_lift",  # 10 decile rows × 1-row overall base rate
    "agg_ecdf_grid",  # stream × 6-row literal threshold grid (pre-agg fan-out)
    "funnel_three_step_windowed",  # three 1-row step-count scalars joined
    "part_assortment_gaps",  # 25-brand × 50-size dim grid + 1-row size count
    "sink_sketch_roundtrip",  # 1-row merged estimate × 1-row direct audit
    "agg_distinct_methods_matrix",  # four 1-row method legs × 1-row truth
    "ts_forecast_backtest",  # holdout days × 1-row fitted (level, trend) state
    "part_brand_positioning",  # 25 brand rows × 1-row global split points
    # wave-2 (r9): exact-baseline legs join the corpus against the
    # broadcast 1-in-50 query sample (vec_id != qid — same shape as
    # sim_truncated_dims); funnel/leakage cross 1-row count aggregates
    "sim_ivf_nprobe_sweep",
    "sim_cascade_recall_audit",
    # wave-3: 64x16 Rademacher-Omega spine (range(64) x range(16) literal
    # cross) + the broadcast sample-bounded exact-baseline leg — the same
    # bounded shape as sim_cascade_recall_audit / emb_random_projection
    "sim_cascade_sketch_recall_audit",
    # wave-3: |sources| rows × 3-row literal alpha grid + × 1-row
    # token-budget scalar — both broadcast, bounded by construction
    "corpus_mixture_temperature",
    # wave-4: every cross is bounded — 64x16 Ω spine + 3-row legs
    # table + sample-bounded broadcast exact legs (report), 4-row lvls
    # table (matryoshka), 2-row stages table + broadcast exact leg
    # (nndescent), 1-row quartile-splits scalar (curriculum)
    "sim_prefilter_quality_report",
    "emb_matryoshka_prefix_recall",
    "emb_nndescent_round",
    "corpus_curriculum_order",
    # wave-5: corpus × broadcast sample (MMR relevance leg), |sources|
    # rows × 1-row corpus-total scalar (reservoir), corpus × 8-row
    # broadcast seed table (IVF balance) — all bounded
    "sim_mmr_diversify",
    "sample_reservoir_hash",
    "emb_ivf_balance_audit",
    # wave-6: 1-row |sources| scalar (signature terms), 2-row eps grid
    # (DP release), 3-row splits x broadcast |sources| spine + 1-row
    # grand-total scalar (split audit) — all broadcast-bounded
    "text_source_signature_terms",
    "dq_dp_count_release",
    "corpus_split_stratified_audit",
    # wave-7: SemDeDup ops cross the corpus with the broadcast 8-row
    # centroid table (emb_kmeans_one_iter shape) + a 3-row eps grid and
    # a 1-row total (sweep); DSIR crosses two 1-row count scalars into
    # the 64-row LLR table; calibration crosses the 10-row bin table
    # with its 1-row ECE scalar — all bounded by construction
    "dedup_semdedup_prune",
    "dedup_semdedup_eps_sweep",
    "corpus_dsir_weights",
    "dq_calibration_report",
    # wave-8: temperature grid is a 4-row literal cross; Benford crosses
    # the 9-digit table with its 1-row total; centroid shift reuses the
    # SemDeDup broadcast-centroid cross; novelty crosses one broadcast
    # max-doc-id scalar — all bounded by construction
    "dq_temperature_scaling",
    "dq_benford_audit",
    "emb_semdedup_centroid_shift",
    "corpus_ngram_novelty_curve",
    # wave-9: incremental top-k crosses the 1-row broadcast query vector
    # + 1-row cut scalar (sim_truncated_dims shape); label agreement
    # reuses the SemDeDup broadcast-centroid cross — bounded
    "sim_topk_incremental_delta",
    "emb_neardup_label_agreement",
    # wave-10: BM25/QL cross 1-row collection-stats scalars + the 3-row
    # literal query-term grid; RRF crosses the 1-row query doc/vector;
    # negative mining crosses the broadcast 1-in-50 anchor sample
    # (sim_truncated_dims bound) — all bounded
    "text_bm25_topk",
    "text_ql_dirichlet_topk",
    "sim_rrf_fusion",
    "sim_negative_mining_audit",
    # wave-11: burstiness crosses a 1-row doc-count scalar; label noise
    # crosses a 1-row threshold scalar + the literal 2x2 spine + a 1-row
    # total; rank metrics reuse the broadcast 1-in-50 exact leg
    # (sim_truncated_dims bound) + a 1-row IDCG scalar; concentration
    # crosses 1-row grand-total and HHI scalars — all bounded
    "corpus_word_burstiness",
    "dq_label_noise_confident",
    "sim_rank_quality_ndcg",
    "corpus_token_concentration",
    # wave-12: heavy hitters cross a 1-row token-count scalar; z-order
    # crosses a 1-row min/max extent scalar + the 16-row literal probe
    # grid; the SemDeDup cell assignment is the broadcast 8-row
    # centroid cross (emb_kmeans_one_iter shape); isotropy crosses
    # three 1-row report scalars — all bounded
    "text_heavy_hitters_mg",
    "lakehouse_zorder_layout_audit",
    "corpus_cluster_balanced_sample",
    "emb_isotropy_audit",
    # wave-13: gate sweep crosses the 4-row literal grid + a 1-row
    # total; contrast reuses the broadcast 1-in-50 query sample
    # (sim_truncated_dims bound); b-bit crosses a 1-row max-doc-id
    # scalar; Rocchio crosses the 1-row collection-stats scalar in
    # each BM25 pass — all bounded
    "dq_quality_gate_sweep",
    "sim_distance_contrast_audit",
    "dedup_bbit_minhash_estimate",
    "text_rocchio_prf_expansion",
    # wave-14: KN crosses a 1-row bigram-type total; CM crosses a
    # 1-row token-count scalar; LOO crosses the 1-row global prior;
    # beam search reuses the SemDeDup broadcast-centroid cross — all
    # bounded
    "text_kneser_ney_bigram",
    "text_count_min_sketch_audit",
    "feat_target_encode_loo",
    "sim_graph_beam_recall",
    # wave-15: HT crosses a 3-row literal k-grid + 1-row totals; ADC
    # crosses the 1-row query vector + broadcast 64-row codebook/LUT;
    # strength/CUPED cross 1-row moment scalars — all bounded
    "sample_ht_estimator_audit",
    "sim_pq_adc_recall",
    "events_cuped_adjustment",
    "ts_decomposition_strength",
    # wave-16: hubness reuses the SemDeDup broadcast-centroid cross;
    # PPS crosses the 2-row k-grid against the 101-row winner set +
    # a 1-row total; bootstrap crosses two 1-row order-stat scalars;
    # power analysis is a 1-row moment report — all bounded
    "sim_hubness_audit",
    "sample_pps_priority_audit",
    "events_bootstrap_ci_hash",
    "events_power_analysis_mde",
    # wave-17: AA reuses the SemDeDup broadcast-centroid cross;
    # truncation crosses the 3-row literal L-grid; the chart joins
    # the literal weight tables (broadcast); bayes is a 1-row report
    "graph_adamic_adar_linkpred",
    "corpus_truncation_loss_curve",
    "ts_ewma_control_chart",
    "events_bayes_ab_posterior",
    # wave-18: fertility crosses the 3-row literal L-grid; perplexity
    # crosses the 1-row bigram-type total + 1-row corpus-mean scalar;
    # staleness crosses the broadcast 8-row stale/fresh centroid
    # tables (emb_kmeans_one_iter shape) — all bounded
    "text_tokenizer_fertility",
    "text_kn_doc_perplexity",
    "emb_ivf_staleness_audit",
    "corpus_contamination_embedding",  # SemDeDup broadcast-centroid cross
    # wave-19: vocab curve crosses the 3-row literal V-grid; PQ audit
    # crosses the 8-row literal subspace grid; CUSUM crosses the 1-row
    # (N, S) total scalar — all bounded by construction
    "text_vocab_coverage_curve",
    "emb_pq_train_audit",
    "ts_cusum_page_alarm",
    # wave-20: whitening crosses five 1-row stat scalars; calibration
    # drift crosses the 1-row midpoint + 1-row drift scalars; padding
    # crosses the 3-row L-grid; binarize-recall joins the broadcast
    # 1-in-50 query sample (sim_truncated_dims bound); winsorize
    # crosses the 3-row literal cap grid — all bounded
    "emb_whitening_audit",
    "dq_calibration_drift",
    "corpus_padding_waste_curve",
    "emb_sign_binarize_recall",
    "events_winsorize_sensitivity",
    # wave-21: sequential crosses the 1-row day-count scalar; init
    # sensitivity crosses the two broadcast 8-row centroid tables +
    # 1-row cost/purity scalars; redundancy crosses the 1-row
    # mean-|r| scalar; stickiness crosses the 7-row literal offset
    # grid + 1-row min-day scalar — all bounded
    "events_sequential_boundary_check",
    "emb_kmeans_init_sensitivity",
    "emb_dim_redundancy_audit",
    "events_dau_wau_stickiness",
    # wave-22: token funnel crosses four 1-row token scalars; cohort
    # crosses the 1-row first-signup scalar; peak audit crosses the
    # 1-row count/median/MAD scalars; histogram crosses 1-row totals;
    # JS pairs the |sources|x|sources| aggregate (20x20) against the
    # broadcast vocab-count tables — all aggregate/scalar-bounded
    "corpus_dedup_token_funnel",
    "events_retention_cohort_matrix",
    "emb_peak_outlier_audit",
    "dedup_bucket_size_histogram",
    "text_js_divergence_sources",
    # wave-23: the quantile audit probes 256-row merged/4-row phi
    # aggregates by rank inequality (cumw >= target) and crosses 1-row
    # total/bound scalars; vocab overlap pairs the 20-row per-source
    # top-V size table (a < b) and OR-probes the broadcast 190-row
    # pair grid; lateness crosses the 6-row literal delay grid; neyman
    # crosses two 1-row moment scalars — all aggregate/grid-bounded
    "agg_mergeable_quantile_audit",
    "text_vocab_overlap_matrix",
    "events_watermark_lateness_audit",
    "sample_neyman_allocation_audit",
    # wave-24: session sweep crosses the 5-row literal gap grid +
    # 1-row totals; Heaps fit crosses the 1-row bounds/half/hapax
    # scalars; ablation crosses the 1-row grand total — all bounded
    "events_session_gap_sweep",
    "text_heaps_law_fit",
    "corpus_source_ablation_matrix",
    # wave-25: WoE crosses the 1-row G/B total + 1-row IV scalar;
    # Ljung-Box crosses the 7-row literal lag grid + 1-row n_obs/Q
    # scalars; bit balance crosses the 1-row worst-dev scalar; QTE
    # probes the per-arm cumulative by rank inequality (cum >= target,
    # 10-row broadcast want side); boilerplate crosses 1-row totals —
    # all aggregate/grid-bounded
    "feat_woe_iv_encoding",
    "ts_ljung_box_whiteness",
    "emb_sign_bit_balance_audit",
    "events_quantile_treatment_effect",
    "corpus_boilerplate_df_ngrams",
    # wave-26: attribution crosses the 1-row conservation total;
    # budget plan crosses the 1-row budget scalar — both bounded
    "events_attribution_position",
    "corpus_token_budget_plan",
    # wave-27: bloom crosses the 4-row literal seed grid (build +
    # probe) + 1-row bit-count scalar; collision crosses the 3-row
    # literal m grid; DB index crosses the 1-row index scalar;
    # simpson crosses two 1-row sign/flag scalars — all bounded
    "agg_bloom_membership_audit",
    "feat_hash_collision_audit",
    "emb_cluster_separation_db_index",
    "events_simpson_paradox_check",
    # wave-28: sample-bias crosses the 3-row literal rate grid +
    # 1-row full-corpus scalar; rollup crosses the 3-row width grid +
    # 1-row base moments; hazard crosses the 1-row d0/max-week
    # scalars — all bounded
    "dedup_sample_bias_audit",
    "ts_rollup_variance_retention",
    "events_weekly_churn_hazard",
    # wave-29: energy crosses the 4-row literal cut grid; squares
    # cross the 1-row edge-count scalar; I-chart crosses the 1-row
    # moment scalar + 1-row alarm count; shard balance crosses the
    # 1-row total scalar — all bounded
    "emb_prefix_energy_share",
    "graph_bipartite_square_density",
    "ts_individuals_control_chart",
    "corpus_shard_balance_plan",
    "corpus_dedup_funnel",  # four 1-row stage-count aggregates crossed
    "corpus_split_leakage_audit",  # 1-row split counts × 1-row leak counts
    # r9-flip promotions: packing audits cross their 1-row conservation
    # totals (chunk count / byte sum) against the packed layout
    "pack_concat_audit",
    "pack_best_fit_audit",
    "text_source_kl_divergence",  # |sources| rows × 50-token vocab spine
    "dedup_idf_weighted_jaccard",  # IDF table × 1-row corpus-size scalar
    "events_ks_two_sample",  # ECDF rows × 1-row (n1, n2) totals
    "events_day_n_retention",  # 1-row horizon aggregate × 1-row signup count
    "events_churn_last_touch",  # 5-row last-type groups × 1-row denominator
    "agg_chi_square",  # 1-row statistic × 1-row degrees-of-freedom
    "emb_hamming_knn",  # corpus × 1-row broadcast query signature
    "corpus_sample_weighted",  # |sources| rate rows × 1-row grand total
    "emb_pca_power_iter",  # 64 loading rows × 1-row Rayleigh eigenvalue
    "graph_triangle_count",  # 1-row edge × 1-row wedge × 1-row triangle aggs
    "text_collocations_pmi",  # supported bigrams × two 1-row grand totals
    "dq_freshness",  # |types| rows × 1-row global-watermark max
    "dq_distribution_drift",  # binned events × broadcast 8-row bin spine
    "text_bpe_merge_step",  # corpus × 1-row broadcast argmax merge pair
    "emb_quantization_recall",  # corpus × 5-row broadcast query panel
    "dedup_lsh_tuning",  # three 1-row pair-count × 1-row bucket-count aggs
    "join_cardinality_estimate",  # 1-row actual × 1-row estimate
    "orders_abc_classification",  # |parts| agg × 1-row grand total
    "emb_mips_transform",  # norms × 1-row global-max broadcast
    "text_vocab_coverage",  # |vocab| ranked rows × 1-row totals broadcast
    "ts_campaign_overlap",  # sessions × 3-row broadcast campaign windows
    "events_audience_overlap",  # |users| masks × 10-row broadcast pair spine
    "text_df_drift",  # docs × 1-row max-doc-id broadcast (half split point)
}

#: Ops that execute real work (streams, sinks, iterative algorithms, disk
#: prep) when the DataFrame is BUILT — excluded from the cheap global audit
#: (their joins are covered by op-specific tests above and by execution).
# The executing-on-build classification (trainer loops, loopback servers,
# snapshot writes, streaming drains) moved to tests/corpus_sets.py — it is
# what the session-shared plan_corpus fixture excludes, and this file's
# global sweep now reads that corpus instead of rebuilding every plan.


def test_no_unbounded_nested_loop_anywhere(plan_corpus):
    """Global net: NO op may plan a CartesianProduct, and
    BroadcastNestedLoopJoin only with a documented tiny broadcast side.
    A regressed join condition (lost equi key) shows up here first.

    Reads the session-shared ``plan_corpus`` (built once under the
    no-table-cache regime — the same plans this test used to rebuild
    itself, r15 verify-budget fix)."""
    from tests.corpus_sets import EXECUTES_BUT_AUDITED

    audited = 0
    for name, (_df, p) in plan_corpus.items():
        if name in EXECUTES_BUT_AUDITED:
            continue  # disk-prep/count-check builders, skipped here since r6
        if name not in BNLJ_ALLOWED:
            assert "CartesianProduct" not in p, f"{name} plans a cartesian product"
            assert "BroadcastNestedLoopJoin" not in p, (
                f"{name} plans an unlisted nested-loop join"
            )
        audited += 1
    assert audited >= 100, audited


def test_join_hints_honored(spark, sf_dir, no_table_cache):
    """join_hinted_sql's /*+ MERGE */ and /*+ BROADCAST */ hints must both
    survive into the physical plan (the optimizer-override escape hatch:
    customer would otherwise auto-broadcast at fixture size)."""
    p = plan_of(Q["join_hinted_sql"](spark, sf_dir))
    assert "SortMergeJoin" in p, "MERGE hint ignored"
    assert "BroadcastHashJoin" in p, "BROADCAST hint ignored"


def test_q6_full_pushdown(spark, sf_dir, no_table_cache):
    """Q6 is the pure-pushdown benchmark: shipdate/discount/quantity
    predicates must all reach the parquet scan as PushedFilters."""
    p = plan_of(Q["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters: [" in p
    pushed = p.split("PushedFilters: ")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed, pushed
    assert "l_quantity" in pushed, pushed


def test_q18_semi_join_before_fact_join(spark, sf_dir, no_table_cache):
    """Q18's HAVING subquery must plan as a LeftSemi (never inner+distinct),
    keeping the qualifying-order filter ahead of the 3-way join."""
    p = plan_of(Q["q18_large_orders"](spark, sf_dir), "simple")
    assert "LeftSemi" in p, p


def test_q10_topk_is_take_ordered(spark, sf_dir, no_table_cache):
    """Q10's ORDER BY + LIMIT 20 over the join must compile to
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    p = plan_of(Q["q10_returned_topk"](spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in p, p


def test_runtime_bloom_filter_injection(spark, sf_dir, no_table_cache):
    """Spark 4's runtime semi-join reduction: a selective build side injects
    a bloom filter (`might_contain(xxhash64(key))`) into the probe-side scan
    of a shuffle join. The 100 TB shape: the probe side skips shuffling rows
    whose keys can't match, bought for one tiny bloom_filter_agg — verified
    here with the local thresholds lowered (defaults gate on a 10 GB probe
    scan, exactly the cluster regime where it pays)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li.createOrReplaceTempView("bloom_li")
        orders.createOrReplaceTempView("bloom_ord")
        df = spark.sql(
            """
            SELECT o_orderpriority, count(*) AS n
            FROM bloom_li JOIN (SELECT o_orderkey, o_orderpriority
                                FROM bloom_ord WHERE o_totalprice > 450000) f
              ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
            """
        )
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, "runtime bloom filter not injected"
        assert "bloom_filter_agg" in opt
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, sf_dir, no_table_cache):
    """join_dpp_partition_pruned: the dim's category filter cannot prune the
    fact statically (it lives in a separate parquet), so the executed plan
    must carry a dynamicpruning subquery inside the fact's PartitionFilters
    — the runtime skip-90%-of-the-scan lever for partitioned star joins."""
    df = Q["join_dpp_partition_pruned"](spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in p, p[:4000]
    # the pruning subquery must sit on the partitioned fact scan
    fact_scan = [
        ln for ln in p.splitlines()
        if "FileScan" in ln and "part_events" in ln
    ]
    assert fact_scan and "dynamicpruning" in fact_scan[0], fact_scan


def test_feature_encoders_broadcast_stats_back(spark, sf_dir, no_table_cache):
    """Every two-pass encoder must broadcast its tiny stats table back onto
    the fact scan — a shuffled stats join at 100 TB re-shuffles the facts."""
    for op_name in ("feat_target_encode", "feat_minmax_scale", "feat_winsorize"):
        p = plan_of(Q[op_name](spark, sf_dir), "simple")
        assert "BroadcastHashJoin" in p, op_name
        assert "SortMergeJoin" not in p, op_name


def test_bloom_prefilter_broadcasts_bitset(spark, sf_dir, no_table_cache):
    """The 128-word bloom bitset must reach the probe side as a broadcast;
    the orders scan must never shuffle for the membership test."""
    p = plan_of(Q["join_bloom_prefilter"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in p
    # build + probe joins both broadcast; the only exchanges allowed are
    # aggregation shuffles (bitset build + per-order candidate agg + final).
    assert "SortMergeJoin" not in p


def test_hashing_trick_partial_aggregates(spark, sf_dir, no_table_cache):
    """feat_hashing_trick's 32-bucket agg must partial-aggregate map-side:
    the exchange carries 32 rows per task, not the event stream."""
    p = plan_of(Q["feat_hashing_trick"](spark, sf_dir), "simple")
    assert p.count("HashAggregate") >= 2
    assert "partial_" in p


def test_hopping_window_single_shuffle(spark, sf_dir, no_table_cache):
    """ts_hopping_agg: explode-to-4-windows is map-side; exactly one
    aggregation exchange follows."""
    p = plan_of(Q["ts_hopping_agg"](spark, sf_dir), "simple")
    assert shuffle_count(p) == 1, p


def test_holt_fold_single_shuffle(spark, sf_dir, no_table_cache):
    """ts_holt_linear: one user_id shuffle; the fold itself is a projection
    (no window sort, no extra exchange)."""
    p = plan_of(Q["ts_holt_linear"](spark, sf_dir), "simple")
    assert shuffle_count(p) == 1, p
    assert "Window" not in p


def test_pq_codebook_broadcast(spark, sf_dir, no_table_cache):
    """sim_pq_assign: the 64-row codebook must broadcast; assignment work
    is map-side against the vector scan."""
    p = plan_of(Q["sim_pq_assign"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_rank_filter_uses_window_group_limit(spark, sf_dir, no_table_cache):
    """win_rank_topn (rank <= k) must trigger Spark's WindowGroupLimit
    pushdown — each partition keeps a k-sized heap BEFORE the full window
    sort, the difference between sorting all rows and sorting k per group
    at 100 TB."""
    p = plan_of(Q["win_rank_topn"](spark, sf_dir), "simple")
    assert "WindowGroupLimit" in p


def test_in_and_like_predicates_push_down(spark, sf_dir, no_table_cache):
    """filter_in_like's IN-list and LIKE ('%widget%') predicates must reach
    the parquet scan as PushedFilters (In / StringContains inside the OR) —
    dictionary-encoded columns prune row groups on both, and a full-scan
    regression here is silent and expensive at 100 TB."""
    p = plan_of(Q["filter_in_like"](spark, sf_dir))
    assert "PushedFilters: [" in p
    pushed = p.split("PushedFilters: ")[1].splitlines()[0]
    assert "In(" in pushed, pushed
    assert "StringContains" in pushed, pushed


def test_velocity_multi_horizon_single_window(spark, sf_dir, no_table_cache):
    """All three trailing range frames share one window spec — Spark must
    fuse them into a single Window operator over a single user_id exchange
    (three sorts here would triple the dominant cost at scale)."""
    import re

    p = plan_of(Q["feat_velocity_multi_horizon"](spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p
    assert shuffle_count(p) == 1, p


def test_markov_model_join_is_broadcast(spark, sf_dir, no_table_cache):
    """The 5-row argmax model must broadcast onto held-out pairs — a
    shuffled model join would re-exchange the full pair stream."""
    p = plan_of(Q["events_markov_accuracy"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_knn_graph_all_joins_are_equi(spark, sf_dir, no_table_cache):
    """Mutual-kNN builds from a label-blocked equi-join plus an edge-list
    self-join — nothing here may degrade to a nested-loop/cartesian."""
    p = plan_of(Q["emb_knn_graph"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_recursive_cte_runs_as_union_loop(spark, sf_dir, no_table_cache):
    """fn_sql_recursive_cte must execute via Spark 4's iterative UnionLoop
    node (engine-side recursion), not via any driver-side expansion."""
    p = plan_of(Q["fn_sql_recursive_cte"](spark, sf_dir))
    assert "UnionLoop" in p, p


def test_cluster_by_is_hash_exchange_plus_local_sort(spark, sf_dir, no_table_cache):
    """CLUSTER BY must plan a hash repartition + partition-local sort —
    never a global (range-exchange) sort."""
    p = plan_of(Q["fn_sql_cluster_by"](spark, sf_dir))
    assert "hashpartitioning" in p, p
    assert "rangepartitioning" not in p, p


def test_cbo_stats_reach_the_plan(spark, sf_dir, no_table_cache):
    """ANALYZE TABLE stats must flow into the optimized plan: after
    register+analyze, cost-mode explain carries rowCount estimates, and a
    star join over the CATALOG tables (stats attached) broadcasts the dims
    under CBO. This converts SURVEY §4's CBO plan from doc to code."""
    from python_kinesis_streaming_spark.plans import plan_of
    from python_kinesis_streaming_spark.sources.stats import (
        CBO_CONFS,
        analyze_tables,
        enable_cbo,
        register_catalog_tables,
        table_stats,
    )

    cats = register_catalog_tables(spark, sf_dir, ["nation", "region", "customer"])
    analyze_tables(spark, cats, columns={c: None for c in cats})
    nation, region, customer = cats

    stats = table_stats(spark, nation)
    assert "rows" in stats.get("Statistics", ""), stats

    prev = {k: spark.conf.get(k, None) for k in CBO_CONFS}
    enable_cbo(spark)
    try:
        df = spark.sql(f"""
            SELECT r.r_name, count(*) AS n
            FROM {customer} c
            JOIN {nation} n ON c.c_nationkey = n.n_nationkey
            JOIN {region} r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """)
        cost = plan_of(df, "cost")
        assert "rowCount=" in cost, "CBO stats absent from optimized plan"
        assert plan_of(df).count("BroadcastHashJoin") >= 2
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def test_catalog_registration_normalizes_bare_session_confs(spark, sf_dir):
    """ADVICE r5 item 3: register_catalog_tables with DEFAULT names (all
    fixture tables, events included) must work on a session that never set
    the runtime confs — it now normalizes them itself. Simulate the bare
    session by unsetting the conf ensure_runtime_confs exists to set."""
    from python_kinesis_streaming_spark.sources.stats import (
        analyze_tables,
        register_catalog_tables,
        table_stats,
    )

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        cats = register_catalog_tables(spark, sf_dir)
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        ev = next(c for c in cats if c.endswith("_events"))
        analyze_tables(spark, [ev], columns={ev: ["event_type"]})
        assert "rows" in table_stats(spark, ev).get("Statistics", "")
        assert spark.sql(f"SELECT count(*) AS n FROM {ev}").collect()[0].n > 0
    finally:
        from python_kinesis_streaming_spark.session import ensure_runtime_confs

        ensure_runtime_confs(spark)
