"""Physical-plan regression guards: the catalog's headline plans must
KEEP the shapes SCALE.md promises — filters pushed to the scan, dims
broadcast, top-k as TakeOrdered, rank pushdown via WindowGroupLimit.
A refactor that silently turns a broadcast join into a shuffle join or
un-pushes a filter passes every value-level test and only shows up at
scale; these assertions catch it at test time.
"""

from __future__ import annotations

import pytest

from data_integration_project_spark import plans


def _executed_plan(spark, name: str, sf_dir: str) -> str:
    df = plans.REGISTRY[name].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only after execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_and_partial_agg(spark, sf_small):
    plan = _executed_plan(spark, "q1_pricing_summary", sf_small)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # two-level aggregate: partial (map-side) + final
    assert plan.count("HashAggregate") >= 2


def test_q3_broadcasts_and_takeordered(spark, sf_small):
    plan = _executed_plan(spark, "q3_shipping_priority", sf_small)
    assert "TakeOrderedAndProject" in plan, "top-10 must not be a global sort"
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_fact_shuffles_once(spark, sf_small):
    plan = _executed_plan(spark, "q5_local_supplier_volume", sf_small)
    # every dim leg is broadcast; no SortMergeJoin anywhere in the tree
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_star_revenue_dims_broadcast(spark, sf_small):
    plan = _executed_plan(spark, "star_revenue_by_region", sf_small)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_top10_orders_is_takeordered(spark, sf_small):
    plan = _executed_plan(spark, "top10_orders", sf_small)
    assert "TakeOrderedAndProject" in plan


def test_tfidf_rank_pushdown(spark, sf_small):
    plan = _executed_plan(spark, "doc_tfidf_top_terms", sf_small)
    assert "WindowGroupLimit" in plan, "per-doc top-3 must prune before sorting"


def test_top3_per_customer_rank_pushdown(spark, sf_small):
    plan = _executed_plan(spark, "orders_top3_per_customer", sf_small)
    assert "WindowGroupLimit" in plan


def test_decontamination_eval_side_broadcast(spark, sf_small):
    plan = _executed_plan(spark, "benchmark_decontamination", sf_small)
    assert "BroadcastHashJoin" in plan


def test_pit_join_dim_broadcast(spark, sf_small):
    plan = _executed_plan(spark, "orders_pit_dimension_join", sf_small)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q18_aggregates_before_wide_joins(spark, sf_small):
    plan = _executed_plan(spark, "q18_large_volume_customer", sf_small)
    assert "TakeOrderedAndProject" in plan, "top-100 must not be a global sort"
    assert "CartesianProduct" not in plan
    # the HAVING filter runs on the aggregate, pre-join
    assert "HashAggregate" in plan


def test_charlm_model_is_broadcast(spark, sf_small):
    plan = _executed_plan(spark, "doc_charlm_score", sf_small)
    # |alphabet|^2 model rows must broadcast into the scoring join, not
    # shuffle the corpus-side bigram stream on the model key
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dup_substring_no_cartesian(spark, sf_small):
    plan = _executed_plan(spark, "doc_dup_substring_coverage", sf_small)
    assert "CartesianProduct" not in plan


def test_prefix_filter_join_no_cartesian(spark, sf_small):
    plan = _executed_plan(spark, "dedup_prefix_filter_join", sf_small)
    # candidate generation must be an equi-join on the prefix token
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_near_dup_banded_equijoin(spark, sf_small):
    # perceptual-hash candidates come from the Hamming-band LSH
    # equi-join on (chunk_idx, chunk_value) — never an all-pairs scan
    plan = _executed_plan(spark, "multimodal_image_near_dup", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_audio_near_dup_banded_equijoin(spark, sf_small):
    # the audio fingerprint shares the banded-join helper — same contract
    plan = _executed_plan(spark, "multimodal_audio_near_dup", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_video_near_dup_banded_equijoin(spark, sf_small):
    # per-keyframe signatures band on the frame slot — same contract
    plan = _executed_plan(spark, "multimodal_video_near_dup", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bradley_terry_games_shape(spark, sf_small):
    # the corpus-side stage (the only data-sized work): adjacent-line
    # pairing is an equi-join on (orderkey, linenumber+1) and supplier
    # nations attach via broadcast — no cartesian anywhere
    from data_integration_project_spark.plans.relational_q import (
        _bt_win_matrix,
    )

    df = _bt_win_matrix(spark, sf_small)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dedup_cascade_no_cartesian(spark, sf_small):
    # both funnel stages must keep their banded/fingerprint equi-joins
    plan = _executed_plan(spark, "corpus_dedup_cascade", sf_small)
    assert "CartesianProduct" not in plan


def test_context_packing_broadcasts_topk(spark, sf_small):
    # the |queries|*k top-k result broadcasts into the token-dim join
    # (an equi-join — the document side never reshuffles for packing).
    # NOTE: the retrieval stage upstream is brute_force_topk's
    # DELIBERATE cross join (the exact baseline), so no global
    # no-nested-loop assertion here — the packing join is the contract.
    plan = _executed_plan(spark, "ann_context_packing", sf_small)
    assert "BroadcastHashJoin" in plan


def test_bpe_encode_corpus_side_is_equijoin(spark, sf_small):
    # corpus tokens join the vocab-sized encode table — no cartesian,
    # no per-token Python; the interpreted HOFs live on distinct words
    plan = _executed_plan(spark, "doc_bpe_encode", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skyline_single_window_no_selfjoin(spark, sf_small):
    plan = _executed_plan(spark, "parts_skyline_2d", sf_small)
    # the 2D skyline must be the window rewrite, not a domination self-join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_also_bought_rank_pushdown(spark, sf_small):
    plan = _executed_plan(spark, "parts_also_bought_topk", sf_small)
    assert "WindowGroupLimit" in plan, "per-anchor top-3 must prune before sort"


def test_integrity_audit_no_cartesian(spark, sf_small):
    plan_runs = plans.REGISTRY["catalog_integrity_audit"].fn(spark, sf_small)
    assert plan_runs.count() == 13  # all legs present, driver-assembled


def test_q2_dims_broadcast_single_shuffle_key(spark, sf_small):
    plan = _executed_plan(spark, "q2_min_cost_supplier", sf_small)
    # supplier/nation/region and the part filter fold into broadcasts;
    # the min-cost join may legitimately shuffle on ps_partkey (both
    # sides scale with |part|) but must never cross-join
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q4_semi_join_no_fanout(spark, sf_small):
    plan = _executed_plan(spark, "q4_order_priority", sf_small)
    assert "LeftSemi" in plan, "EXISTS must decorrelate to a semi join"
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_phrase_search_filters_below_join(spark, sf_small):
    plan = _executed_plan(spark, "doc_phrase_search", sf_small)
    # only the two query terms' postings shuffle: term equality filters
    # must sit under the join, not above it
    assert "token = table" in plan.replace("'", "") or "table" in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_zonemap_partial_scan_broadcasts_block_list(spark, sf_small):
    plan = _executed_plan(spark, "lineitem_zonemap_pruning", sf_small)
    # the partial-block list is dimension-sized metadata: broadcast it
    assert "BroadcastHashJoin" in plan


def test_cdc_chunking_no_cartesian_one_doc_shuffle(spark, sf_small):
    plan = _executed_plan(spark, "doc_cdc_chunk_dedup", sf_small)
    # boundary assembly is a doc-keyed groupBy + equi-join back; never a
    # cross join. (The final single-row summary join of the two 1-row
    # aggregates is legitimately a nested loop over 1x1 rows.)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_semdedup_pairs_equijoin_on_cluster(spark, sf_small):
    plan = _executed_plan(spark, "corpus_semdedup", sf_small)
    # the quadratic must be confined to clusters: an equi-join on
    # _cluster, never an all-pairs scan
    assert "CartesianProduct" not in plan


def test_dsir_ratio_table_broadcast(spark, sf_small):
    plan = _executed_plan(spark, "corpus_dsir_weights", sf_small)
    # the 64-row bucket log-ratio table joins the corpus side as a
    # broadcast — the feature stream must not shuffle on the bucket key
    assert "BroadcastHashJoin" in plan


def test_kneser_ney_no_corpus_rescan(spark, sf_small):
    """The bigram table is built once and persisted; marginals and
    scoring reuse it — the documents scan appears at most twice in the
    executed plan (persist materialization path), never once per
    marginal."""
    plan = _executed_plan(spark, "doc_kneser_ney_lm", sf_small)
    assert plan.count("InMemoryTableScan") >= 1 or plan.count("Scan parquet") <= 2


def test_dtw_reference_is_broadcast_free_mapinpandas(spark, sf_small):
    """DTW runs per-series inside one Python stage; there must be no
    cartesian/cross join anywhere (the reference series is driver
    metadata, not a joined table)."""
    plan = _executed_plan(spark, "nations_dtw_profiles", sf_small)
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_fd_discovery_stacked_reaggregation(spark, sf_small):
    """Three stacked aggregates: (fd,lhs,rhs) -> (fd,lhs) -> (fd); the
    customer dim is broadcast into the row-stream join."""
    plan = _executed_plan(spark, "orders_fd_discovery", sf_small)
    assert plan.count("HashAggregate") >= 4  # partial+final at two levels
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_isotonic_minimax_runs_on_summary(spark, sf_small):
    """The 10^3 grid must be built from the 10-row bin summary — every
    join in the plan is a broadcast join over tiny inputs."""
    plan = _executed_plan(spark, "orders_isotonic_calibration", sf_small)
    assert "SortMergeJoin" not in plan


def test_eigencentrality_is_join_plus_sum(spark, sf_small):
    """Each SpMV round is an equi-join + grouped sum; nothing may
    degenerate into a cartesian product."""
    plan = _executed_plan(spark, "doc_word_eigencentrality", sf_small)
    assert "CartesianProduct" not in plan


def test_als_no_unbounded_cartesian(spark, sf_small):
    """ALS half-steps are equi-joins; the only cross join is the final
    3-user recommendation scoring (bounded by the pick list)."""
    plan = _executed_plan(spark, "lineitem_als_recommend", sf_small)
    # the only cartesian is the 3-user recommendation scoring cross
    # (bounded by the pick list; the shared subtree prints twice in the
    # executed-plan string); the ALS half-steps are all equi-joins
    assert plan.count("CartesianProduct") <= 2
    assert plan.count("HashAggregate") >= 4


def test_gains_lift_single_rank(spark, sf_small):
    """Decile assignment is ONE total-order rank; training aggregates
    are map-side combined."""
    plan = _executed_plan(spark, "customers_gains_lift", sf_small)
    assert "CartesianProduct" not in plan


def test_ks_window_over_distinct_values(spark, sf_small):
    """CDFs evaluate on the distinct-value table, not raw rows — the
    window input is the grouped aggregate."""
    plan = _executed_plan(spark, "events_ks_two_sample", sf_small)
    assert "SortMergeJoin" not in plan


def test_kcore_rounds_are_joins(spark, sf_small):
    plan = _executed_plan(spark, "doc_kcore_decomposition", sf_small)
    assert "CartesianProduct" not in plan


def test_rake_phrase_scoring_joins_vocab(spark, sf_small):
    plan = _executed_plan(spark, "doc_rake_keyphrases", sf_small)
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan


def test_ngram_jaccard_no_cartesian(spark, sf_small):
    # r2 verdict item 3: candidates must come from the prefix-filter
    # equi-join, not a subset self-crossJoin (quadratic at scale)
    plan = _executed_plan(spark, "dedup_ngram_jaccard", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_golden_records_city_dim_broadcast(spark, sf_small):
    # the canonical city dim must come in as a broadcast, never a
    # shuffle join (it is vocabulary-sized at any fact scale)
    plan = _executed_plan(spark, "khachhang_golden_records", sf_small)
    assert "BroadcastHashJoin" in plan


def test_target_encoding_no_window_no_cartesian(spark, sf_small):
    # LOO encoding must be category-stats-broadcast + rollup, not a
    # per-row window over the fact (window = full shuffle + sort)
    plan = _executed_plan(spark, "orders_target_encoding_loo", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_leakage_safe_split_single_fp_shuffle(spark, sf_small):
    # split-by-cluster-rep: fingerprint groupBy + join, no window, no
    # cartesian; the fingerprint fold stays a codegen expression
    plan = _executed_plan(spark, "corpus_leakage_safe_split", sf_small)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_geo_radius_join_is_equijoin(spark, sf_small):
    # grid bucketing must make the spatial join an equi-join on the
    # cell key — no cartesian, no nested-loop fallback
    plan = _executed_plan(spark, "suppliers_geo_radius_join", sf_small)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_neardup_ingest_probe_is_equijoin(spark, sf_small):
    # the per-batch store probe must stay a (band, bucket) equi-join
    # (left-semi) — never an all-pairs or nested-loop scan
    from pyspark.sql import functions as F

    from data_integration_project_spark.streaming.neardup import (
        batch_neardup_flags,
        build_band_store,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    store = build_band_store(docs, "doc_id", "text").localCheckpoint()
    flags = batch_neardup_flags(docs.limit(50), store, "doc_id", "text")
    flags.collect()
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan


def test_kll_level_counts_single_aggregate(spark, sf_small):
    # the level-count pass must be ONE map-side-combined aggregate over
    # the base scan (no row explosion, no join before the groupBy)
    from pyspark.sql import functions as F

    from data_integration_project_spark.operators.quantiles import (
        level_counts,
    )
    from data_integration_project_spark.operators.sketch import hll_hash

    o = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        F.col("o_orderkey").alias("id"),
        hll_hash(F.col("o_orderkey")).alias("h"),
        F.pmod(F.col("o_orderkey"), F.lit(4)).alias("shard"),
    )
    counts = level_counts(o, ["shard"])
    counts.collect()
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final
    # the stack() unpivot must sit ABOVE the aggregate (parents print
    # first), i.e. it explodes the |groups|-row panel, never the data
    assert "Generate stack" in plan
    assert plan.index("Generate stack") < plan.index("HashAggregate")


def test_threshold_sweep_no_cartesian(spark, sf_small):
    # the 4-threshold sweep must be ONE conditional-sum aggregate over
    # the pair stream, not a 4-row crossJoin: Catalyst plans the latter
    # as a CartesianProduct whose pair-pipeline side re-executes once
    # per left partition (measured 87s of an 11s pipeline at sf1.0)
    plan = _executed_plan(spark, "dedup_threshold_sweep", sf_small)
    assert "CartesianProduct" not in plan


def test_als_recommend_no_cartesian(spark, sf_small):
    # the 3-user × item-factor scoring cross join must broadcast the
    # 3-user side (the checkpointed item RDD has no stats, so an
    # unmarked crossJoin falls back to CartesianProduct)
    plan = _executed_plan(spark, "lineitem_als_recommend", sf_small)
    assert "CartesianProduct" not in plan


def test_t_closeness_spines_broadcast(spark, sf_small):
    # the 5-bucket spine, the 5-row global cumulative distribution, and
    # the 1-row total must all broadcast into the class-level EMD fold —
    # the only shuffles are the class/bucket counts and their windows
    plan = _executed_plan(spark, "customers_t_closeness", sf_small)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_pass_at_k_spine_broadcast(spark, sf_small):
    # the 3-row k spine joins the task table via broadcast; the task
    # build is the single row-scale aggregate
    plan = _executed_plan(spark, "orders_pass_at_k", sf_small)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_fx_normalized_daily_dim_broadcast(spark, sf_small):
    # the rate series expands to its daily effective grain (dim-sized)
    # and the fact side must pick its rate via a BROADCAST equi-join —
    # a shuffle join here would re-sort the whole fact table per rate
    # refresh at 100 TB (SCALE.md round-7 fix; r8 added the same-day
    # keep-last dedup, which must not change the join strategy)
    plan = _executed_plan(spark, "orders_fx_normalized", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_curriculum_histogram_rank_no_global_sort(spark, sf_small):
    # corpus_curriculum_phases promises NTILE semantics WITHOUT a global
    # sort: the cumsum join must be broadcast and the only windows are
    # the tiny histogram cumsum + the per-length partitioned row_number
    plan = _executed_plan(spark, "corpus_curriculum_phases", sf_small)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pmi_marginals_broadcast(spark, sf_small):
    # doc_token_class_pmi derives n_l and N from the count table and
    # broadcasts them — the corpus is exploded and shuffled exactly
    # twice (groupBy(lang, token), then the token-partitioned window);
    # the per-language totals must never arrive via a shuffle join
    plan = _executed_plan(spark, "doc_token_class_pmi", sf_small)
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_acf_moments_single_aggregate_row(spark, sf_small):
    # events_hourly_autocorrelation: the raw stream is touched by ONE
    # map-side-combined groupBy(hour); the lag windows and all 30
    # moments run over the calendar-bounded hourly series
    plan = _executed_plan(spark, "events_hourly_autocorrelation", sf_small)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_negative_sampling_band_local_anti_join(spark, sf_small):
    # orders_negative_sampling: the anti-join must run against the
    # band-local positives broadcast (only positives in the user's own
    # hash band can collide with a candidate), never shuffle the full
    # ~256-per-user candidate expansion on (custkey, partkey) — the
    # sort-merge form was the sf1.0 sweep's worst row at 92s.  The
    # top-3-per-user filter must push into the window as a group limit,
    # and the expansion must stay wide (explicit round-robin
    # repartition; AQE would coalesce the tiny user-distinct to one
    # task and serialize the whole expansion).
    plan = _executed_plan(spark, "orders_negative_sampling", sf_small)
    assert "SortMergeJoin" not in plan
    assert "LeftAnti, BuildRight" in plan, "anti-join must be broadcast"
    assert "WindowGroupLimit" in plan
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan


def test_cogroup_recon_stays_wide_under_aqe(spark, sf_small):
    # customers_cogroup_recon: cogrouped applyInPandas costs ~1-2 ms of
    # Python per KEY, invisible to AQE's byte-based coalescing — it
    # folded the co-partitioned shuffles to 2 partitions and serialized
    # ~15k per-key calls (35s at sf0.1, 3.4s wide).  The explicit keyed
    # repartitions are exempt from coalescing and must stay.
    plan = _executed_plan(spark, "customers_cogroup_recon", sf_small)
    assert "FlatMapCoGroupsInPandas" in plan
    assert "AQEShuffleRead coalesced" not in plan, (
        "cogroup inputs must keep their explicit partition count"
    )


def test_fuzzy_match_deletion_neighborhood_candidates(spark, sf_small):
    # customer_fuzzy_match: candidates must come from the (nation,
    # prefix, deletion-1 variant) equi-join, not the bare 16-char
    # prefix block — prefix blocks GROW with the table on sequential-ID
    # names (sf0.1 max 14 → sf1.0 max 140, Σ|b|² ×100), and the
    # single-split customer file must be round-robin repartitioned so
    # the probe + levenshtein stage isn't one task.
    plan = _executed_plan(spark, "customer_fuzzy_match", sf_small)
    assert "vkey" in plan, "join must include the deletion-1 variant key"
    assert "RoundRobinPartitioning" in plan or "REPARTITION_BY_NUM" in plan
    assert "CartesianProduct" not in plan
