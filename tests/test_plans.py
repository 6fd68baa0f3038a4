"""Physical-plan assertions (SURVEY.md §4): the optimizations the
engine's scale story depends on must be visible in explain output —
filter pushdown to parquet, column pruning, broadcast joins for dims,
TakeOrderedAndProject for top-k, partial aggregation. A correct result
from a bad plan is a 100 TB incident waiting to happen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airline_data_pipeline_spark.io.readers import table
from airline_data_pipeline_spark.queries.suite import registry

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushed_to_parquet_scan(spark):
    df = registry()["filter_range_eq"].fn(spark, SF)
    plan = plan_of(df)
    # both the date range and (in DataFilters, which the string doesn't
    # truncate as aggressively) the equality reach the scan
    assert "PushedFilters: [IsNotNull" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "(l_returnflag" in plan.split("FileScan")[1]


def test_column_pruning_reaches_scan(spark):
    df = registry()["proj_rename"].fn(spark, SF)
    plan = plan_of(df)
    # only the 4 projected columns in ReadSchema — not all 11
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_returnflag" not in read_schema and "l_shipdate" not in read_schema


def test_star_join_broadcasts_dims(spark):
    df = registry()["revenue_by_nation"].fn(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # nation/region never shuffle the fact


def test_topk_uses_take_ordered(spark):
    df = registry()["group_count_topk"].fn(spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_aggregation_is_partial_then_final(spark):
    df = registry()["perf_metrics"].fn(spark, SF)
    plan = plan_of(df)
    # map-side combine: two HashAggregate stages around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_whole_stage_codegen_active(spark):
    df = registry()["pricing_summary"].fn(spark, SF)
    df.collect()  # AQE finalizes the physical plan at execution
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    assert "*(" in plan  # codegen stage markers span scan→agg


def test_anti_semi_joins_not_cartesian(spark):
    for name in ("customers_no_urgent", "customers_with_urgent_orders"):
        plan = plan_of(registry()[name].fn(spark, SF))
        assert "CartesianProduct" not in plan
        assert "Anti" in plan or "Semi" in plan


def test_asof_join_is_single_window_no_range_join(spark):
    plan = plan_of(registry()["asof_purchase_view"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan  # the union+last(ignorenulls) formulation


def test_range_join_is_equi_join_on_buckets(spark):
    plan = plan_of(registry()["range_join_views_after_purchase"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decimal_free_aggregates_stay_double(spark):
    # floor-based rounding must not sneak Decimal into agg buffers
    df = registry()["pricing_summary"].fn(spark, SF)
    assert all(
        f.dataType.simpleString() in ("string", "double", "bigint")
        for f in df.schema.fields
    )


def test_minhash_pipeline_no_cross_join(spark):
    from airline_data_pipeline_spark.operators.dedup import minhash_candidates

    d = table(spark, SF, "documents")
    plan = plan_of(minhash_candidates(d))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_star_top20_broadcasts_and_take_ordered(spark):
    # Q10 shape: dims broadcast (fact never shuffles for the join) and
    # the top-20 is TakeOrderedAndProject, not a global sort
    plan = plan_of(registry()["returned_item_customers"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_exists_semi_join_stays_hash(spark):
    # Q4 shape: correlated EXISTS with a non-equi conjunct must still
    # join on the equi key — never a nested-loop/cartesian fallback
    plan = plan_of(registry()["exists_late_shipment"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan


def test_grouping_sets_single_expand_pass(spark):
    # one Expand over the scan, not one scan per grouping set
    plan = plan_of(registry()["grouping_sets_order_counts"].fn(spark, SF))
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1


def test_argmax_window_over_aggregate_only(spark):
    # Q15 shape: the single-partition window runs over the per-supplier
    # aggregate (O(suppliers) rows), never over raw lineitem
    plan = plan_of(registry()["top_supplier_by_revenue"].fn(spark, SF))
    assert "Window" in plan
    # the window's child must already be an aggregate
    win_idx = plan.index("Window")
    assert "HashAggregate" in plan[win_idx:]


def test_q6_all_predicates_pushed(spark):
    # Q6 shape: every predicate reaches the parquet scan; the plan is
    # scan → filter → partial agg → single-row final agg, no shuffle of
    # data rows
    import contextlib
    import io

    df = registry()["forecast_revenue_change"].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")  # formatted output doesn't truncate filters
    plan = buf.getvalue()
    scan = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThanOrEqual(l_discount,0.05)" in scan
    assert "LessThanOrEqual(l_discount,0.07)" in scan
    assert "LessThan(l_quantity,24" in scan
    assert "Exchange hashpartitioning" not in plan  # only the final gather


def test_join_cycle_and_pair_shapes_stay_hash(spark):
    # Q5 (join cycle), Q7 (same dim in two roles), Q17 (decorrelated
    # per-part threshold): dims broadcast, no cartesian/nested-loop
    for name in (
        "local_supplier_volume",
        "volume_shipping_pairs",
        "small_quantity_revenue",
    ):
        plan = plan_of(registry()[name].fn(spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_disjunctive_predicate_common_conjuncts_push(spark):
    # Q19: the per-branch common bounds (p_size >= 1, quantity windows)
    # can't fully push, but the join must stay a hash join and the
    # lineitem scan must not read all columns
    plan = plan_of(registry()["disjunctive_predicate_revenue"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_returnflag" not in read_schema


def test_lsh_candidate_dedup_carries_ids_only(spark):
    # the candidate dedup (the widest shuffle of the LSH path) must
    # move (query_id, neighbor_id) pairs, never embedding vectors —
    # vectors join back only for surviving candidates
    from airline_data_pipeline_spark.operators.similarity import lsh_topk

    e = table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    opt = optimized_of(lsh_topk(e, q, k=10))
    lines = opt.splitlines()
    agg_idx = next(
        i for i, ln in enumerate(lines)
        if "Aggregate [query_id" in ln and "neighbor_id" in ln
    )
    dedup_child = lines[agg_idx + 1]
    assert "__qv" not in dedup_child and "__cv" not in dedup_child, dedup_child


def test_exact_jaccard_inverted_index_no_cartesian(spark):
    from airline_data_pipeline_spark.operators.dedup import exact_jaccard_pairs

    d = table(spark, SF, "documents")
    for prefix in (False, True):
        plan = plan_of(exact_jaccard_pairs(d, threshold=0.5, prefix_filter=prefix))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    # naive path: the pair-intersection count is a partial→final aggregate
    plan = plan_of(exact_jaccard_pairs(d, threshold=0.5))
    assert plan.count("HashAggregate") >= 2


def test_hot_bucket_guard_uses_broadcast_anti_join(spark):
    from airline_data_pipeline_spark.operators.dedup import minhash_candidates

    d = table(spark, SF, "documents")
    plan = plan_of(minhash_candidates(d, max_bucket_size=10))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan  # the guard is an anti-join on hot keys


def test_knn_broadcasts_queries_not_corpus(spark):
    from airline_data_pipeline_spark.operators.similarity import brute_force_topk

    e = table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    plan = plan_of(brute_force_topk(e, q, k=10))
    # the query side is broadcast; corpus streams through map-side
    assert "BroadcastNestedLoopJoin BuildRight" in plan


def test_hll_aggregation_is_two_level_partial(spark):
    """The HLL registers must partial-aggregate map-side: the exchange
    carries at most 2^p register rows per task, never raw values."""
    df = registry()["hll_distinct_estimate"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 4  # partial+final for registers & sum
    assert "hashpartitioning(bucket" in plan  # register exchange keyed on bucket


def test_bloom_probe_broadcasts_positions(spark):
    """The probe join key is the position set (<= m_bits rows): it must
    broadcast, never shuffle the probe side for the membership join."""
    df = registry()["bloom_prefilter_semi_join"].fn(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan or "rows=1" in plan


def test_winnow_pairs_equi_join_no_cartesian(spark):
    """Fingerprint postings self-join must be a hash join on the 8-byte
    fingerprint with the id inequality as a post-condition."""
    df = registry()["winnow_fingerprint_pairs"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_winnow_fingerprint_stage_window_plus_aggregate(spark):
    """The sliding-min winnowing formulation (dedup.winnow_fingerprints
    docstring contract): the per-position frame minimum runs in a
    WindowExec whose input is a codegen'd hash projection, and the
    per-(doc, min-hash) groupBy pipeline-breaker sits between the
    window and the downstream self-join — with NO interpreted
    array-HOF (aggregate/transform over shingles) anywhere in the
    plan, which is the pathology the rewrite removed.

    Asserted on `winnow_fingerprints` itself since r15: the registry
    row's plan truncates at the fingerprint stage's localCheckpoint
    (dedup._reuse — the self-join reads the stage's output blocks once
    instead of deriving it per side), so the Window no longer appears
    in the TOP-LEVEL plan; the stage plan is where the contract lives."""
    from airline_data_pipeline_spark.operators.dedup import winnow_fingerprints

    docs = table(spark, SF, "documents")
    plan = plan_of(winnow_fingerprints(docs, "text", "doc_id", 3, 4))
    assert "Window" in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan
    # the array formulation's interpreted HOFs must not reappear
    assert "aggregate(" not in plan, "interpreted fold crept back in"
    assert "transform(" not in plan, "interpreted transform crept back in"


def test_winnow_pairs_top_level_plan_no_interpreted_hof(spark):
    """Companion to the stage assertion above (ADVICE r15): the
    registry row's TOP-LEVEL plan truncates at the _reuse checkpoint,
    so an interpreted array-HOF reintroduced DOWNSTREAM of the
    checkpoint (postings self-join / min_shared stage) would escape
    the stage-plan assertion — pin the top-level plan too."""
    df = registry()["winnow_fingerprint_pairs"].fn(spark, SF)
    plan = plan_of(df)
    assert "aggregate(" not in plan, "interpreted fold above the checkpoint"
    assert "transform(" not in plan, "interpreted transform above the checkpoint"


def test_ngram_overlap_contamination_hash_join_no_cartesian(spark):
    """The eval-shingles x train-shingles membership join must be a
    hash join on the 8-byte shingle hash — never a nested loop — and
    the train side carries NO broadcast hint (it is corpus-sized at
    scale; AQE may still choose broadcast at tiny SF on its own)."""
    df = registry()["ngram_overlap_contamination"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_temperature_sample_no_datasized_shuffle(spark):
    """temperature_sample's only exchanges are the source-count
    aggregate and the tiny rates frame: the per-row filter side joins
    the rates via BROADCAST, so document rows never shuffle."""
    from airline_data_pipeline_spark.operators.corpus import temperature_sample

    d = table(spark, SF, "documents")
    plan = plan_of(temperature_sample(d))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quality_classifier_model_join_is_broadcast(spark):
    """The hashed-linear scorer's weight table must join as a
    BROADCAST (model-apply = dimension join; document rows never
    shuffle for the model), with no cartesian fallback."""
    from airline_data_pipeline_spark.operators.corpus import score_hashed_linear

    d = table(spark, SF, "documents")
    plan = plan_of(score_hashed_linear(d, carry_cols=["source"]))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_filter_pushed_rowlocal(spark):
    """The per-stratum hash filter is row-local: no exchange before the
    final counting aggregation's own shuffle."""
    df = registry()["stratified_sample_counts"].fn(spark, SF)
    plan = plan_of(df)
    # exactly one exchange: the groupBy; the sampling itself adds none
    assert plan.count("Exchange") <= 2  # partial/final agg exchange only


def test_tfidf_takeordered_no_global_sort(spark):
    """The corpus-wide top-20 must be TakeOrderedAndProject (per-partition
    heaps + driver merge), never a global sort of the term table; the
    term aggregation partial-aggregates map-side."""
    df = registry()["tfidf_top_terms"].fn(spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_salted_agg_two_level_spreads_hot_key(spark):
    """The salted aggregation must shuffle on (key, salt) for partials,
    then on the key alone for the combine — two distinct exchanges, so
    a hot key fans across num_salts reducers in the expensive pass."""
    df = registry()["salted_agg_order_totals"].fn(spark, SF)
    plan = plan_of(df)
    assert "hashpartitioning(o_orderpriority" in plan
    assert "__salt" in plan  # partial pass keyed on (key, salt)
    assert plan.count("Exchange hashpartitioning") >= 2


def test_packing_window_is_hash_partitioned(spark):
    """The packing cumsum window must partition by shard — a global
    single-partition window packs the whole corpus in one task."""
    df = registry()["token_packing_bins"].fn(spark, SF)
    plan = plan_of(df)
    win_idx = plan.index("Window")
    window_input = plan[win_idx:]
    assert "hashpartitioning(shard" in window_input
    assert "SinglePartition" not in window_input


def test_upsert_single_shuffle_on_merge_key(spark):
    """Union is shuffle-free; the only exchange is the window partition
    on the merge key."""
    df = registry()["upsert_latest_wins"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Union" in plan


def test_scd2_single_window_pass(spark):
    """The SCD2 interval build must be ONE shuffle on the entity key
    feeding one Window operator — no self-join, no second exchange for
    the is_current flag (both lead() calls share the same window)."""
    df = registry()["scd2_user_value_history"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("Window") >= 1
    assert "hashpartitioning(user_id" in plan
    # exactly one hash exchange (the final orderBy adds a range exchange)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_ngram_udtf_aggregates_partial_then_takeordered(spark):
    """The trigram top-20 must partial-aggregate the UDTF fan-out
    map-side and pick the top k via TakeOrderedAndProject — never a
    global sort of the full n-gram table."""
    df = registry()["ngram_udtf_top_trigrams"].fn(spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_airline_rollup_is_expand_single_shuffle(spark):
    """rollup() compiles to Expand (one row per grouping set) + a
    partial/final aggregate pair — one shuffle total, not one job per
    summary level like the reference's two-step rollup."""
    df = registry()["airline_rollup_metrics"].fn(spark, SF)
    plan = plan_of(df)
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2


def test_contamination_shuffles_keys_never_text(spark):
    """The contamination semi-join must shuffle hashed shingle keys —
    no cartesian product, and the text column must not appear in any
    exchange (only 8-byte hashes and ids move)."""
    df = registry()["contamination_check_splits"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    for chunk in plan.split("Exchange")[1:]:
        head = chunk.splitlines()[0]
        assert "text" not in head, f"text column in a shuffle: {head}"


def test_source_gate_broadcasts_dimension_sized_gate(spark):
    """The per-source gate table (#sources rows) must broadcast into a
    left-semi join — the corpus itself never hash-shuffles to be
    filtered."""
    df = registry()["source_quality_gate"].fn(spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_quantize_summary_single_aggregate_shuffle(spark):
    """int8 quantization is row-local; the only hash exchange is the
    label aggregate."""
    df = registry()["embedding_quantize_summary"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_histogram_sketch_broadcasts_stats(spark):
    """The min/max row rides a broadcast join; the data-sized exchange
    is the fixed-width bin aggregate, and the quantile probe joins the
    (tiny) q-list by broadcast."""
    df = registry()["histogram_quantile_prices"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("BroadcastExchange") >= 2  # stats row + q-list
    assert "CartesianProduct" not in plan


def test_market_share_joins_stay_hash_supplier_ungated(spark):
    """Q8 shape: the fixed-size dims (nation x2, region) and the
    type-filtered part slice broadcast, but supplier — which grows with
    scale factor — carries NO explicit hint (VERDICT r5): at testdata
    scale AQE/the planner may still pick broadcast from actual size, and
    at 100 TB it falls back to shuffle hash. Either way every join must
    stay an equi hash join — no cartesian/nested-loop fallback."""
    plan = plan_of(registry()["market_share_by_year"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the hinted dims at minimum


def test_product_profit_two_shuffle_shape(spark):
    """Q9 shape: part (name-filtered), supplier, nation broadcast; the
    only shuffle joins are lineitem-orders and the (nation, year) agg —
    and the part-name LIKE filter reaches the parquet scan."""
    df = registry()["product_profit_by_nation_year"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation
    assert "StringContains(p_name,widget)" in plan or "widget" in plan


def test_streaming_interval_join_batch_restore_no_cartesian(spark):
    """The batch tail of the stream-stream join query (zero-match
    restore + count) must stay equi-hash; the streamed pairs are
    driver-localized so only the purchase-key join remains."""
    plan = plan_of(registry()["streaming_interval_join_views"].fn(spark, SF))
    assert "CartesianProduct" not in plan


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The 100 TB skew story's runtime half: beyond explicit salting
    (operators/skew.py), AQE must detect a skewed shuffle partition and
    split it — final plan shows SortMergeJoin(skew=true) with a skewed
    AQEShuffleRead. Run in a newSession() so the threshold/broadcast
    conf overrides never leak into the shared fixture session."""
    s = spark.newSession()
    for k, v in {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "20KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }.items():
        s.conf.set(k, v)
    big = s.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("key"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
    )
    small = s.range(50_000).select(F.col("id").alias("key"), F.col("id").alias("w"))
    j = big.join(small, "key")
    # df.collect() drives the SAME Dataset/QueryExecution, so the
    # adaptive plan inspected below is the one that actually ran.
    # 180k hot-key rows match key 0, plus the 5k multiples of 10 below
    # the small side's 50k key range.
    assert len(j.collect()) == 185_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan  # the AQEShuffleRead that carries the split


def test_simhash_fingerprints_stay_codegen_no_hof_fold(spark):
    """Regression guard for the round-7 SimHash reformulation: the
    fingerprint stage must be explode -> hash-once projection -> plain
    vote aggregates. An `aggregate`/`zip_with` HOF fold here is
    interpreted (CodegenFallback, no CSE) and recomputes the md5 token
    hash once per bit — the 25-57 s pathology this guards against."""
    from airline_data_pipeline_spark.operators.dedup import simhash_fingerprints
    from airline_data_pipeline_spark.functions.text import portable_hash60

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id long, text string",
    )
    fp = simhash_fingerprints(docs, n_bits=60, token_hash=portable_hash60)
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" not in plan, plan[:2000]  # the HOF fold
    assert "zip_with" not in plan
    assert "HashAggregate" in plan  # the codegen'd vote sums
    # and the whole thing still produces one fingerprint per doc
    assert fp.count() == 2


def test_duplicate_spans_single_pass_window_merge(spark):
    """ExactSubstr span detection (dedup.duplicate_spans docstring
    contract): duplicate occurrences come from ONE row_number window
    over the hash — the scan→shingle→md5 subtree appears exactly once
    (the earlier aggregate+self-join form evaluated it twice; its two
    Exchange branches can't ReuseExchange) — the interval merge runs
    in WindowExec, the per-source stats join is a hash join (never a
    cartesian/nested loop), and no interpreted array-HOF appears
    anywhere (the shingle construction is the linear zip_with form)."""
    df = registry()["duplicate_span_stats"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    assert "Window" in plan
    assert plan.count("posexplode") == 1, "md5 pipeline evaluated twice"
    assert "aggregate(" not in plan, "interpreted fold crept in"


def test_bucketed_join_zero_exchange_below_sort(spark):
    """write_bucketed layout contract (io/writers.py docstring): the
    fact⋈fact join AND the bucket-keyed aggregate over two same-count
    bucketed tables run with ZERO exchange — the only Exchange in the
    whole plan is the final presentation sort's range partitioning.
    This is the pay-the-shuffle-once-at-write-time property the
    100 TB co-located join story rests on."""
    import re
    import shutil

    from airline_data_pipeline_spark.queries.suite import _bucketed_join_frame

    root = None
    try:
        df, root = _bucketed_join_frame(spark, SF)
        plan = plan_of(df)
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2
        exchanges = re.findall(r"Exchange (\w+)", plan)
        assert len(exchanges) == 1 and exchanges[0].startswith(
            "rangepartitioning"
        ), exchanges
    finally:
        spark.sql("DROP TABLE IF EXISTS graft_bucketed_orders")
        spark.sql("DROP TABLE IF EXISTS graft_bucketed_lineitem")
        if root:
            shutil.rmtree(root, ignore_errors=True)


def test_minhash_index_gate_never_shuffles_index(spark):
    """dedup_minhash_against_index's contract is that the stored index
    is scanned but never exchanged: batch keys broadcast against the
    bucket scan, candidate pairs broadcast against the shingle scan,
    and the final anti-join broadcasts the (batch-bounded)
    contaminated-id set. Assert the FINAL adaptive plan holds only
    broadcast joins — a SortMergeJoin/ShuffledHashJoin in a final
    section means an index-sized exchange crept in."""
    import shutil
    import tempfile

    from airline_data_pipeline_spark.operators import dedup

    d = table(spark, SF, "documents")
    ref = d.filter(F.col("source") == "src0")
    inc = d.filter(F.col("source") != "src0")
    root = tempfile.mkdtemp(prefix="spark_graft_mhidx_plan_")
    try:
        dedup.write_minhash_index(ref, root, num_hashes=32, bands=16)
        out = dedup.dedup_minhash_against_index(inc, root, threshold=0.7)
        out.collect()  # AQE finalizes the plan only on execution
        final_lines = []
        in_initial = False
        for line in plan_of(out).splitlines():
            if "== Initial Plan ==" in line:
                in_initial = True
            elif "== Final Plan ==" in line or "== Current Plan ==" in line:
                in_initial = False
            elif not in_initial:
                final_lines.append(line)
        final = "\n".join(final_lines)
        assert "SortMergeJoin" not in final, final
        assert "ShuffledHashJoin" not in final, final
        assert final.count("BroadcastHashJoin") >= 3
        assert "CartesianProduct" not in final
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_gopher_rules_single_scan_single_shuffle(spark):
    """All five Gopher rule flags come from ONE tokenization in one
    scan: a single hash exchange (the source aggregate), zero joins,
    and the scan pruned to exactly the two columns the rules need."""
    df = registry()["gopher_rules_stats"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "ReadSchema" in plan and "[text" in plan and "source" in plan
    assert "n_chars" not in plan  # pruned — rules never read it


def test_canonical_selection_one_cluster_shuffle_two_windows(spark):
    """Survivor selection computes row_number AND member count over the
    SAME cluster_id partitioning: exactly one hash exchange below both
    Window execs (shared shuffle), and no cartesian anywhere."""
    df = registry()["canonical_doc_selection"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(cluster_id" in plan
    assert plan.count("Window [") == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_perplexity_buckets_equi_join_scoring_no_cartesian(spark):
    """The LM scoring join is a hash EQUI-join on the bigram string
    (broadcast at small vocab, shuffled-hash at scale — both fine);
    the head/middle/tail tiling adds exactly two Window execs (per-lang
    ntile + the LM history mass), never a cartesian."""
    df = registry()["perplexity_bucket_mix"].fn(spark, SF)
    plan = plan_of(df)
    assert any(
        f"{j} [__bg" in plan
        for j in ("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin")
    )
    assert plan.count("Window [") == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_pairs_expand_after_vocab_aggregate(spark):
    """BPE pair counting must be aggregate-then-expand: the word-length
    filter sits BELOW the vocab aggregate (Catalyst pushes it through
    the grouping key), both exchanges carry vocab-bounded keys with
    map-side partial aggregation, the pair Generate consumes the
    POST-aggregate vocab (so expansion work is per-distinct-word, not
    per-occurrence), the top-30 is TakeOrdered, and the scan reads only
    the text column."""
    df = registry()["bpe_pair_counts"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_count" in plan and "partial_sum" in plan
    assert "TakeOrderedAndProject" in plan
    # pair Generate (substring transform) is downstream of the vocab
    # count: plans print root-first, so the Generate line must appear
    # BEFORE the vocab partial_count (which sits at the leaf side) and
    # AFTER the pair partial_sum that consumes it
    i_gen = plan.index("explode(transform(sequence(1, (length(")
    assert plan.index("partial_sum") < i_gen < plan.index("partial_count")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema
    assert "doc_id" not in read_schema and "source" not in read_schema


def test_source_overlap_reuses_corpus_shuffle_broadcasts_sizes(spark):
    """The source-pair overlap matrix executes the corpus-sized
    distinct-shingle shuffle ONCE: both per-source size branches reuse
    the groupBy-shingle exchange at runtime (2 ReusedExchange in the
    final adaptive plan), the size joins are broadcast (#sources rows),
    the pair expansion is map-side (no self-join on the shingle
    column), and the shuffled shingle key is the 8-byte xxhash64, never
    the shingle string."""
    df = registry()["source_overlap_matrix"].fn(spark, SF)
    assert len(df.collect()) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # assert on the FINAL adaptive section only (the toString appends
    # the pre-execution Initial Plan, which repeats every operator)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ReusedExchange") == 2
    assert final.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    assert "hashpartitioning(g#" in final  # the hashed-shingle key


def test_knn_label_vote_sample_broadcasts_corpus_streams(spark):
    """The 5-NN vote audit keeps the kNN family's scale shape: ONE
    BroadcastNestedLoopJoin whose build side is the eval sample (the
    corpus streams through the scorer unshuffled), the truth join is
    broadcast hash, and everything after the top-5 cut is
    sample-bounded (vote window + confusion agg) — no corpus-keyed
    window, no cartesian."""
    df = registry()["knn_label_vote"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("BroadcastNestedLoopJoin BuildRight") == 1
    assert "CartesianProduct" not in plan
    # exactly the top-5 rounded rank + the vote winner — the scorer is
    # brute_force_scores (unranked), so no discarded inner rank pass
    assert plan.count("Window [") == 2
    # both post-score joins resolve as broadcast hash joins
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_knn_graph_pagerank_no_corpus_broadcast_no_cartesian(spark):
    """The self-kNN graph build must stay bucket-equi-joined: the
    scorer plan (lsh_scores with broadcast_query_vectors=False) has no
    BroadcastNestedLoopJoin (that would be the all-pairs scorer) and no
    cartesian, and its candidate join is keyed on the (tbl, bucket)
    pair. The full query materializes the edge table once via
    localCheckpoint, so its final plan contains NO Window and no
    rebuild of the LSH construction."""
    from airline_data_pipeline_spark.operators.similarity import lsh_scores

    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    scorer_plan = plan_of(
        lsh_scores(e, e, n_bits=2, n_tables=24, broadcast_query_vectors=False)
    )
    assert "BroadcastNestedLoopJoin" not in scorer_plan
    assert "CartesianProduct" not in scorer_plan
    assert "tbl" in scorer_plan and "bucket" in scorer_plan

    df = registry()["knn_graph_pagerank"].fn(spark, SF)
    plan = plan_of(df)
    assert plan.count("Window [") == 0  # construction ran at checkpoint time
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(df.collect()) == 20


def test_dedup_exact_is_join_free_minby_with_partial_agg(spark):
    """dedup_exact plans as ONE aggregate pair (partial min_by on the
    mappers, final after one hash exchange) with NO join: the old
    groupBy+left_semi form evaluated the upstream lineage twice and its
    broadcast escape hatch dies at corpus scale (interleaved A/B at a
    10x corpus: semi med 3.19 s vs 1.33 s here; BASELINE.md round-8
    close). Map-side partial aggregation is the skew story — a hot
    fingerprint collapses per-mapper instead of landing on one task."""
    from airline_data_pipeline_spark.operators.dedup import dedup_exact_text

    df = dedup_exact_text(table(spark, SF, "documents"))
    plan = plan_of(df)
    assert "Join" not in plan
    assert "partial_min_by" in plan
    assert plan.count("min_by") >= 2  # partial + final
    assert plan.count("Exchange") == 1


def test_fan_out_barrier_keeps_filter_above_exchange(spark):
    """Catalyst pushes deterministic filters below fan_out's
    round-robin exchange, re-serializing expensive row-local gates onto
    the starved single-partition scan (corpus_prep's trigram gate ran
    on 1 core with 31 idle; interleaved A/B: 2.80 s -> 0.80 s with the
    barrier). Assert the barrier holds: in corpus_prep's plan the gate
    filter evaluates ABOVE the repartition exchange."""
    df = registry()["corpus_prep_end_to_end"].fn(spark, SF)
    plan = plan_of(df)
    i_gate = plan.index("array_distinct")  # the trigram-ratio filter
    i_exch = plan.index("RoundRobinPartitioning")
    # executedPlan prints top-down: the gate above the exchange means
    # the gate's Filter node appears BEFORE the Exchange node
    assert i_gate < i_exch, "repetition gate was pushed below fan_out"
    # and the dedup stage stayed join-free
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan


def test_gopher_repetition_single_scan_no_python(spark):
    """The 13-rule repetition audit builds all nine n-gram widths from
    ONE windowed token pass: exactly one scan of the documents parquet
    feeds the gram branch (+ one for lines/paras, + one for the
    norm-chars base — three total, not eleven), the unit pipeline has
    zero Python nodes, and the gram-side aggregates reuse the window's
    doc_id partitioning (no exchange between the window and the
    per-kind rollup)."""
    df = registry()["gopher_repetition_stats"].fn(spark, SF)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") <= 3, plan.count("Scan parquet")
    # the gram construction is the window(lead) + generate(stack) pair
    assert "Window" in plan and "Generate" in plan


def test_epoch_replication_broadcasts_rates_no_data_shuffle(spark):
    """The epoch plan is a broadcast of the tiny per-source rate table
    onto a row-local explode — the corpus side must reach the explode
    without any hash-partitioned exchange (the only exchanges feed the
    source-count aggregate and the final summary, both group-sized)."""
    from airline_data_pipeline_spark.operators.corpus import (
        epoch_replication_plan,
    )

    d = table(spark, SF, "documents")
    out = epoch_replication_plan(d)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate" in plan  # the explode(sequence) replica expansion


def test_local_df_plans_as_jvm_local_scan(spark):
    """Model-sized driver frames must stay JVM-side: local_df routes
    rows through pandas/Arrow so the plan is a LocalTableScan with NO
    Python evaluation node — the plain createDataFrame(list) path
    plans a 32-slice Python-evaluated RDD scan whose coalesce(1)
    write measured 4-5 s per tiny artifact (BASELINE.md 'Measured
    lessons', r10). A fallback to the RDD path (e.g. a pandas/Arrow
    conversion regression) fails here instead of silently re-taxing
    every index build."""
    from airline_data_pipeline_spark.io.localrel import local_df

    df = local_df(
        spark,
        [(i, [float(i), 2.0], f"s{i}") for i in range(16)],
        "cell int, vec array<double>, name string",
    )
    plan = plan_of(df)
    assert "LocalTableScan" in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "Scan ExistingRDD"):
        assert node not in plan, plan
    rows = df.orderBy("cell").collect()
    assert rows[3]["cell"] == 3 and rows[3]["vec"] == [3.0, 2.0]
    # empty row lists are valid (schema-only frames)
    assert local_df(spark, [], "a int, b string").count() == 0


def test_local_df_rejects_arrow_disabled_session(spark):
    """ADVICE r10: local_df's LocalTableScan guarantee silently rode on
    spark.sql.execution.arrow.pyspark.enabled — on a session without it
    the pandas bridge degrades to the exact 32-slice Python-RDD path
    the helper exists to avoid, with no signal. The conf is asserted at
    call time so misuse fails loudly instead of re-taxing every write."""
    import pytest

    from airline_data_pipeline_spark.io.localrel import local_df

    key = "spark.sql.execution.arrow.pyspark.enabled"
    spark.conf.set(key, "false")
    try:
        with pytest.raises(RuntimeError, match="arrow"):
            local_df(spark, [(1,)], "a int")
    finally:
        spark.conf.set(key, "true")
    assert local_df(spark, [(1,)], "a int").count() == 1


def test_ivf_index_probe_prunes_cell_partitions(spark, tmp_path):
    """Round-11: the stored-IVF probe's "reads only its nprobe cells'
    files" claim must be visible in the PLAN, not aspirational — Spark
    inserts no dynamic partition pruning for this broadcast-UDF build
    side (pre-fix PartitionFilters held only isnotnull(cell), i.e.
    every cell's files were listed and scanned). The probe batch is
    driver-small by contract, so its distinct cell set ships as a
    literal IN-list and prunes at file-listing time."""
    import tempfile

    from pyspark.sql import functions as F

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity

    e = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    root = str(tmp_path / "ivf_prune")
    similarity.write_ivf_index(e, root, n_centroids=8)
    scored = similarity.ivf_index_scores(
        e.filter(F.col("vec_id") < 3), root, nprobe=2
    )
    plan = plan_of(scored)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and " IN (" in pf[0], plan
    # ≤ nprobe × |batch| distinct cells in the pushed list (3 queries
    # × 2 probes here), strictly fewer than the 8 stored cells
    in_list = pf[0].split(" IN (")[1].split(")")[0]
    assert 1 <= len(in_list.split(",")) <= 6, pf[0]


def test_pq_probe_prunes_both_scans(spark, tmp_path):
    """The IVF-PQ probe's two scans — pqcodes for ADC candidates, cells
    for the exact re-rank — must BOTH carry the probe's literal cell
    IN-list in PartitionFilters: an unpruned codes scan would read
    every cell's code files (defeating candidate generation's scan
    economy), and an unpruned re-rank scan would read every cell's
    full vectors (defeating PQ entirely)."""
    import tempfile

    from pyspark.sql import functions as F

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity

    e = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    root = str(tmp_path / "pq_prune")
    similarity.write_ivf_index(e, root, n_centroids=8)
    similarity.add_pq_to_ivf_index(spark, root, m=8, ksub=16)
    scored = similarity.ivf_pq_index_scores(
        e.filter(F.col("vec_id") < 3), root, nprobe=2, rerank=20
    )
    plan = plan_of(scored)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert len(pf) == 2, plan
    for ln in pf:
        assert " IN (" in ln, ln
        in_list = ln.split(" IN (")[1].split(")")[0]
        assert 1 <= len(in_list.split(",")) <= 6, ln


def test_ivf_retraction_rewrite_broadcasts_and_never_shuffles_index(
    spark, tmp_path
):
    """retract_from_ivf_index's 100 TB contract: the retraction set
    broadcasts against each table's scan as a LeftAnti hash join — the
    index rows are read IO-parallel and land straight in the writer's
    (cell, salt) repartition, never exchanged FOR THE JOIN itself, and
    never sort-merge joined (which would shuffle the whole index on
    neighbor_id). Asserted on the kept-rows plan the verb writes."""
    from pyspark.sql import functions as F

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity

    e = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    root = str(tmp_path / "retr_plan")
    similarity.write_ivf_index(e, root, n_centroids=8)
    rid = e.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("neighbor_id")
    )
    cells = spark.read.parquet(root + "/cells")
    kept = cells.join(F.broadcast(rid.distinct()), on="neighbor_id",
                      how="left_anti")
    plan = plan_of(kept)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_srp_index_gate_broadcasts_batch_and_never_shuffles_index(
    spark, tmp_path
):
    """The stored SRP gate's 100 TB contract: the batch side broadcasts
    at BOTH joins (bucket collision and vector verify), so the stored
    buckets/vectors tables are scanned and never exchanged — no
    SortMergeJoin anywhere in the gate plan (which would shuffle the
    artifact on its keys)."""
    from pyspark.sql import functions as F

    from airline_data_pipeline_spark.io.readers import table
    from airline_data_pipeline_spark.operators import similarity

    e = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    root = str(tmp_path / "srp_plan")
    similarity.write_srp_index(
        e.filter(F.col("label") == 0), root, dims=64, n_bits=2, n_tables=24
    )
    kept = similarity.embedding_gate_against_index(
        e.filter(F.col("label") != 0), root, threshold=0.45, round_digits=4
    )
    plan = plan_of(kept)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
