"""Physical-plan assertions: the scale-critical properties must be
visible in the executed plan, not just hoped for — pushdown reaches
the parquet scan, dims broadcast, no Python UDFs in JVM-expressible
operators, and the fraud pipeline uses exactly one exchange."""

from __future__ import annotations

import pytest

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.registry import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    scan_line = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in scan_line and "l_discount" in scan_line


def test_q6_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    scan = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # only the 4 needed columns of 11 are read
    assert "l_extendedprice" in scan and "l_returnflag" not in scan and "l_orderkey" not in scan


def test_q5_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_fraud_scores_single_exchange(spark, sf_dir):
    plan = _plan(spark, sf_dir, "fraud_scores")
    # one hash partitioning by card_id feeds both window functions
    assert plan.count("Exchange hashpartitioning") == 1
    assert "pythonUDF" not in plan.lower()


@pytest.mark.parametrize("name", ["fraud_scores", "q1_pricing_summary",
                                  "sessionize", "token_count", "doc_fingerprint",
                                  "dedup_exact", "lang_id", "bigram_lm_score",
                                  "events_props_stats"])
def test_no_python_udf_in_jvm_operators(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_multimodal_decode_uses_arrow_python(spark, sf_dir):
    # the ONE operator allowed Python: mapInPandas (Arrow-batched)
    plan = _plan(spark, sf_dir, "multimodal_decode")
    assert "MapInPandas" in plan


def test_ann_ivf_broadcast_only_no_pairwise(spark, sf_dir):
    """IVF must never sort-merge or shuffle-pairwise: centroids and
    probe lists are broadcast, assignment argmax partial-aggregates
    map-side (max_by shows up in the partial agg before its
    exchange)."""
    plan = _plan(spark, sf_dir, "ann_ivf")
    assert "SortMergeJoin" not in plan
    assert "max_by" in plan
    assert plan.count("BroadcastExchange") >= 3


def test_ann_lsh_hyperplanes_not_inlined_as_literal(spark, sf_dir):
    """The 80×64-double hyperplane constant must arrive via the
    broadcast 1-row relation, not an F.lit nested-array literal (a
    ~5000-node tree costing seconds of Catalyst time per query). If
    someone reverts to the literal, the plan string balloons with
    inline doubles."""
    plan = _plan(spark, sf_dir, "ann_lsh")
    assert "BroadcastExchange" in plan
    assert len(plan) < 100_000


def test_minhash_fast_is_arrow_batched(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh_fast")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_shingle_explode_not_pushed_below_exchange(spark, sf_dir):
    """Plain `explode` plants an implicit size()>0 pre-filter holding
    the whole shingle expression, which Catalyst pushes below the
    spread() repartition — re-running the n-gram transform on the
    narrow pre-shuffle side (10× the stage cost on a 1-partition
    scan). `shingles` must keep the expensive expression strictly
    above the exchange (explode_outer + attribute filter)."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.functions.partitioning import spread
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import shingles
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (shingles(spread(docs))
            ._jdf.queryExecution().executedPlan().toString())
    below = plan.split("Exchange", 1)[1] if "Exchange" in plan else ""
    assert "concat_ws" not in below, "shingle expression sank below the exchange"


def test_spread_ignores_shuffle_words_in_identifiers(spark, sf_dir):
    """spread()'s shuffle detection walks logical-plan node CLASSES —
    an attribute merely NAMED like a shuffle node ("JoinSortWindow")
    must not suppress widening of a narrow single-file scan."""
    from real_time_fraud_detection_flink_kafka_spark.functions.partitioning import spread
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    docs = (load_table(spark, sf_dir, "documents")
            .withColumnRenamed("text", "JoinSortWindowAggregate"))
    out = spread(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan, "narrow scan was not widened"
    # and the same frame grouped (a REAL shuffle node) is left alone
    grouped = docs.groupBy("doc_id").count()
    assert spread(grouped) is grouped


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """At 100 TB the win on a selective fact⋈fact join is pruning the
    big side BEFORE the shuffle: Spark's runtime Bloom filter builds
    a filter from the selective side and applies might_contain on the
    other side's scan. Verify the engine setup can inject it (thresholds
    lowered; broadcast disabled so the shuffle join makes it relevant)."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    saved = {k: spark.conf.get(k, None) for k in [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold"]}
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
        li = load_table(spark, sf_dir, "lineitem")
        j = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
               .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark):
    """SURVEY §4 claims "AQE handles skew" — prove it: on a join with
    one hot key (and no downstream requirement on the join's
    partitioning — OptimizeSkewedJoin declines when splitting would
    force an extra shuffle), the finalized adaptive plan must carry
    the skew=true marker on the sort-merge join, i.e. the hot
    partition was split into parallel tasks. Thresholds are lowered
    to make test-scale data register as skewed; the mechanism is
    identical at 100 TB with the defaults."""
    from pyspark.sql import functions as F

    keys = ["spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold"]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(0, 300_000).select(
            F.when(F.col("id") < 290_000, 0).otherwise(F.col("id") % 100).alias("k"),
            F.col("id").alias("payload"))
        small = spark.range(0, 5_000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v"))
        j = big.join(small, "k").agg(F.sum("payload").alias("s"))
        j.collect()  # AQE finalizes the plan during execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


TPCH_PLAN_GOLDENS = {
    # query -> (max SortMergeJoins allowed, min BroadcastHashJoins, a
    # column whose filter must reach a parquet scan)
    "q1_pricing_summary": (0, 0, "l_shipdate"),
    "q2_top_supplier_per_nation": (0, 1, "s_suppkey"),
    "q6_forecast_revenue": (0, 0, "l_discount"),
    "q13_customer_distribution": (1, 1, None),
    "q3_shipping_priority": (1, 1, "o_orderdate"),
    "q4_order_priority": (0, 1, "o_orderdate"),
    "q5_local_supplier": (1, 3, "o_orderdate"),
    "q7_nation_volume": (1, 3, "l_shipdate"),
    "q8_market_share": (1, 4, "o_orderdate"),
    "q10_returned_items": (1, 2, "l_returnflag"),
    "q14_promo_revenue": (0, 1, "l_shipdate"),
    "q18_large_orders": (0, 2, None),
    "q19_discounted_revenue": (0, 1, "l_quantity"),
    "q22_sales_opportunity": (1, 1, "c_acctbal"),
    # the orders join is the one permitted fact⋈fact SMJ; filtered
    # part keys + synthesized partsupp + dims all broadcast
    "q9_product_type_profit": (1, 4, "p_name"),
    "q20_potential_part_promotion": (1, 3, "p_name"),
    # Q11/Q15/Q16/Q17: every join side is either a dim, a filtered
    # key set, or a 1-row scalar — all broadcast, zero SMJs at any
    # scale. Q12/Q21 carry the one fact⋈fact orders join (BHJ at
    # test scale, the permitted SMJ at 100 TB).
    "q11_important_stock": (0, 2, "n_name"),
    "q12_shipmode_priority": (1, 1, "l_shipdate"),
    "q15_top_supplier": (0, 2, "l_shipdate"),
    "q16_parts_supplier_relationship": (0, 2, "p_brand"),
    "q17_small_quantity_revenue": (0, 2, "p_brand"),
    "q21_suppliers_kept_waiting": (1, 2, "o_orderstatus"),
}


@pytest.mark.parametrize("name", sorted(TPCH_PLAN_GOLDENS))
def test_tpch_plan_goldens(spark, sf_dir, name):
    """Join-strategy + pushdown goldens for the TPC-H family: dims
    must broadcast (SMJ only where two fact-sized inputs meet) and
    the selective predicate must reach its parquet scan."""
    max_smj, min_bhj, pushed_col = TPCH_PLAN_GOLDENS[name]
    plan = _plan(spark, sf_dir, name)
    assert plan.count("SortMergeJoin") <= max_smj, name
    assert plan.count("BroadcastHashJoin") >= min_bhj, name
    if pushed_col:
        pushed = [l for l in plan.splitlines()
                  if "PushedFilters" in l and pushed_col in l]
        assert pushed, f"{name}: no pushed filter on {pushed_col}"


def test_bigram_lm_unigram_join_broadcasts(spark, sf_dir):
    """The LM probability join must broadcast the |V|-row unigram
    relation (stopword-skewed key; streaming twin already broadcasts
    it at streaming/corpus.py:96 — batch and stream must run the same
    strategy). Auto-broadcast is disabled so the explicit hint, not
    size estimation, is what's under test: the only SortMergeJoin
    allowed is the bigram-count join (its build side can exceed
    memory at 100 TB vocab scale)."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, sf_dir, "bigram_lm_score")
        assert plan.count("BroadcastHashJoin") >= 1, plan[:3000]
        assert plan.count("SortMergeJoin") <= 1, plan[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_fraud_rules_single_pass(spark, sf_dir):
    """The tagged-union rules relation is ONE scored lineage (one
    card_id exchange, the two shared window passes) with a row-local
    explode — never three filtered copies of the pipeline."""
    plan = _plan(spark, sf_dir, "fraud_rules")
    import re
    assert plan.count("Exchange hashpartitioning") == 1
    assert len(re.findall(r"\bWindow\b", plan)) == 2
    assert "Union" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_customer_order_semijoins_broadcast(spark, sf_dir):
    """Both branches broadcast the filtered orders side: one
    BroadcastHashJoin LeftAnti + one LeftSemi, no sort-merge."""
    plan = _plan(spark, sf_dir, "customer_order_semijoins")
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_merges_winner_broadcast_not_collected(spark, sf_dir):
    """Each round's winning pair enters the next round's replace as a
    broadcast 1-row relation (4 broadcast nested-loop joins for 4
    rounds), all Python-free."""
    plan = _plan(spark, sf_dir, "bpe_merges")
    assert plan.count("BroadcastNestedLoopJoin") >= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_arrow_stage_and_broadcast(spark, sf_dir):
    """Shingling runs as Arrow-batched Python over two DISJOINT
    pre-filtered slices (eval/train split happens before the opaque
    mapInPandas, so the corpus is shingled exactly once in total);
    the eval side of the overlap join is broadcast."""
    plan = _plan(spark, sf_dir, "decontaminate")
    assert plan.count("MapInPandas") == 2
    assert "BroadcastHashJoin" in plan
    # each Python stage is fed by its own filtered scan, not a rescan
    # of the other side's output
    import re
    filters = re.findall(r"\(doc_id#\d+L % 50\)", plan)
    assert len(filters) >= 2


def test_blocked_dedup_broadcasts_centroids_no_cartesian(spark, sf_dir):
    """dedup_embedding_blocked's assignment must broadcast the
    centroid relation and the pair stage must join ON the cell key —
    the plan may not contain a cartesian/broadcast-nested-loop pair
    join (that would be the quadratic shape the operator exists to
    avoid). The centroid crossJoin is a 16-row broadcast, so BNLJ is
    permitted ONLY against the centroid scan, never assigned×assigned."""
    plan = _plan(spark, sf_dir, "dedup_embedding_blocked")
    assert plan.count("BroadcastHashJoin") >= 1 or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the vec-pair join must be keyed by cell (hash or sort-merge on
    # cell), visible as a join whose keys include the cell column
    keyed = [l for l in plan.splitlines()
             if ("SortMergeJoin" in l or "BroadcastHashJoin" in l
                 or "ShuffledHashJoin" in l) and "cell" in l]
    assert keyed, plan[:2000]


def test_quality_gate_quantile_runs_on_histogram_not_corpus(spark, sf_dir):
    """quality_percentile_gate's exact quantile must run over the
    VALUE HISTOGRAM (groupBy quality, ≤1e6+1 rows), never as a global
    row_number over the corpus — no range-partitioned global sort and
    no per-row ranking anywhere in the plan; the one Window is the
    running sum on the aggregated relation, and the threshold comes
    back as a broadcast."""
    plan = _plan(spark, sf_dir, "quality_percentile_gate")
    assert "rangepartitioning" not in plan
    assert "row_number" not in plan
    assert plan.count("Window") == 1
    assert "BroadcastExchange" in plan


@pytest.mark.parametrize("name,max_md5", [("dedup_winnow", 4),
                                          ("boilerplate_ngrams", 2)])
def test_gram_hash_expression_not_reinlined(spark, sf_dir, name, max_md5):
    """The gram-hash subtree must stay LET-BOUND (dedup._let): without
    the binding, Catalyst's projection collapse re-inlines the md5
    transform at every reference site and the HOF lambdas re-evaluate
    the token split per element — measured 112 s vs 5.5 s at sf0.1
    for dedup_winnow. A reverted binding shows up as the md5 subtree
    repeated across the plan string."""
    plan = _plan(spark, sf_dir, name)
    assert plan.count("md5(") <= max_md5, (
        f"{name}: md5 subtree inlined {plan.count('md5(')}× — "
        "let-binding regressed")


def test_coincident_events_binned_equi_join_no_cartesian(spark, sf_dir):
    """The range join must execute as a shuffled EQUI-join on the
    time-bin key — the whole point of bin bucketing. A cartesian or
    nested-loop pair join is the O(n²) shape the operator exists to
    replace (the tiny quantile/extremes broadcasts elsewhere are hash
    joins, so any BNLJ here would be the pair join)."""
    plan = _plan(spark, sf_dir, "coincident_events")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    keyed = [l for l in plan.splitlines()
             if ("SortMergeJoin" in l or "ShuffledHashJoin" in l
                 or "BroadcastHashJoin" in l) and "bin" in l]
    assert keyed, plan[:2000]


def test_histogram_quantiles_no_global_sort_single_scan_pair(spark, sf_dir):
    """value_histogram_quantiles must never globally sort the data:
    no range partitioning and no per-row ranking — the only ordered
    work is the cumulative-sum Window over the ≤ n_bins histogram
    rows. Exactly two scans of events (extremes pass + binning pass),
    both full-parallel."""
    plan = _plan(spark, sf_dir, "value_histogram_quantiles")
    assert "row_number" not in plan
    assert plan.count("Window") == 1
    scans = [l for l in plan.splitlines()
             if "FileScan parquet" in l or "Scan parquet" in l]
    assert len(scans) == 2, plan[:2000]


def test_graph_ops_no_cartesian_joins(spark, sf_dir):
    """The two graph queries are built ONLY from equi-joins on node
    keys (plus tiny 1-row broadcasts): a cartesian or nested-loop
    join on DATA relations would mean the pair/wedge stage regressed
    to the quadratic shape. PageRank's only BNLJs are the 1-row node
    count cross-broadcast (re-printed per cached-`nodes` reference —
    the plan STRING over-counts InMemoryRelation subtrees); every
    one must be the BuildRight-Cross shape, never a conditioned
    nested loop over data. Triangles has none at all."""
    for name in ("coincidence_pagerank", "coincidence_triangles"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        bnlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
        if name == "coincidence_triangles":
            assert not bnlj, plan[:2000]
        else:
            assert all("BuildRight, Cross" in l for l in bnlj), bnlj


def test_skyline_verify_join_is_bin_keyed(spark, sf_dir):
    """The skyline's dominance verify must join survivors ON the
    price-bin key (with the dominance predicates as residuals) — a
    cartesian/nested-loop there would be the catalog² shape the grid
    pruning exists to avoid. The 1-row extremes broadcast is the only
    permitted BNLJ."""
    plan = _plan(spark, sf_dir, "skyline_parts")
    assert "CartesianProduct" not in plan
    bnlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
    assert all("BuildRight, Cross" in l for l in bnlj), bnlj
    keyed = [l for l in plan.splitlines()
             if ("SortMergeJoin" in l or "ShuffledHashJoin" in l
                 or "BroadcastHashJoin" in l) and "bin" in l]
    assert keyed, plan[:2000]


def test_pq_adc_broadcasts_codebooks_and_dtab_no_cartesian(spark, sf_dir):
    """PQ's scale contract: codebook and distance-table relations are
    bounded (≤ PQ_M·PQ_K and n_queries·PQ_M·PQ_K rows) and must reach
    the corpus-sized scans as broadcasts — assignment, encode and ADC
    scoring each ride a BroadcastHashJoin; nothing falls back to a
    cartesian or a corpus×corpus sort-merge."""
    plan = _plan(spark, sf_dir, "ann_pq_adc")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # train-assign (×iters), final encode, dtab build, ADC join
    assert plan.count("BroadcastHashJoin") >= 4


def test_ivfpq_broadcasts_everywhere_no_pairwise(spark, sf_dir):
    """IVF-PQ's scale contract: centroids, probes, codebooks,
    distance tables and the per-query cell table are all bounded
    relations and must reach the corpus-sized side as broadcasts
    (cells/codebook fan-outs appear as broadcast nested-loop joins,
    exactly like ann_ivf's centroid cross); candidate generation is
    the probes⋈assigned equi-join on cell — never a sort-merge or an
    unbroadcast product — and both argmin/argmax assignments partial-
    aggregate map-side."""
    plan = _plan(spark, sf_dir, "ann_ivfpq")
    assert "CartesianProduct" not in plan
    assert "max_by" in plan and "min_by" in plan
    # the ONE permitted shuffle join: candv⋈enc — both corpus-sized,
    # co-keyed on vec_id, where sort-merge IS the scale plan; every
    # bounded relation must broadcast instead
    smj = [l for l in plan.splitlines() if "SortMergeJoin" in l]
    assert len(smj) == 1 and "vec_id" in smj[0]
    # coarse assign + probes + qctab crosses, dtab/codebook joins,
    # candv, ADC dtab join, residual fetch
    assert plan.count("BroadcastExchange") >= 6


def test_dsir_model_joins_broadcast_no_cartesian(spark, sf_dir):
    """DSIR's scoring join must broadcast the ≤4096-row bucket model
    (explicit hint, not size estimation — auto-broadcast disabled),
    and the whole DAG must stay cartesian-free; the 1-row g6 factor
    rides a broadcast nested-loop (the trained-relation pattern,
    expected), never a CartesianProduct."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name in ("dsir_weights", "dsir_resample"):
            plan = _plan(spark, sf_dir, name)
            assert plan.count("BroadcastHashJoin") >= 1, (name, plan[:3000])
            assert "CartesianProduct" not in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_source_overlap_no_cartesian_sizes_broadcast(spark, sf_dir):
    """The source-pair stage joins ON the shingle (fan-out bounded by
    source count) and per-source sizes broadcast — no cartesian
    anywhere."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, sf_dir, "source_overlap")
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_zipf_rank_window_on_topk_survivors_only(spark, sf_dir):
    """The Zipf fit's rank window must run on the distributed top-R
    survivors (TakeOrderedAndProject), never a full-vocabulary global
    sort exchange."""
    plan = _plan(spark, sf_dir, "zipf_slope")
    assert "TakeOrderedAndProject" in plan


def test_span_corruption_is_pure_map(spark, sf_dir):
    """The mask generator is row-local by design: the executed plan
    must contain NO shuffle exchange at all — at 100 TB this stage
    streams through the scan."""
    plan = _plan(spark, sf_dir, "span_corruption")
    assert "Exchange" not in plan, plan[:2000]


def test_temperature_mix_corpus_never_shuffles(spark, sf_dir):
    """Only the |sources|-row stats relation may shuffle (its
    groupBy); the corpus-side join must be a broadcast, so exactly
    the rate model moves — never the documents."""
    plan = _plan(spark, sf_dir, "temperature_mix")
    assert "CartesianProduct" not in plan
    # the only join touching the corpus scan is broadcast
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_contrastive_pairs_negative_map_broadcast(spark, sf_dir):
    """The negative map is a bounded |buckets|-row relation: its join
    back onto the scan must broadcast; no sort-merge, no cartesian."""
    plan = _plan(spark, sf_dir, "contrastive_pairs")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_dedup_ppjoin_no_cartesian(spark, sf_dir):
    """Candidates come from the prefix-token equi-join and set
    verification from doc_id equi-joins — a cartesian anywhere means
    the prefix filter fell out of the plan."""
    plan = _plan(spark, sf_dir, "dedup_ppjoin")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]


def test_mmr_rerank_no_cartesian_pool_bounded(spark, sf_dir):
    """The MMR loop's joins are all bounded-relation broadcasts (the
    ≤POOL-row pool against 1-row winners / ≤k selected ids): a
    CartesianProduct or a SortMergeJoin anywhere means a corpus-sized
    relation leaked into the greedy loop. The relevance pool itself
    must come from per-partition heaps (TakeOrderedAndProject), not a
    global sort — asserted on the pool relation directly (`_mmr_pool`)
    because the greedy rounds localCheckpoint since r14, so the full
    query's final plan only shows checkpointed leaves."""
    plan = _plan(spark, sf_dir, "mmr_rerank")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan[:3000]
    from real_time_fraud_detection_flink_kafka_spark.operators.retrieval import (
        _mmr_pool,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    pool_plan = _mmr_pool(load_table(spark, sf_dir, "embeddings"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in pool_plan, pool_plan[:3000]
    assert "CartesianProduct" not in pool_plan


def test_knn_diversity_sample_no_cartesian(spark, sf_dir):
    """Strong-edge extraction, two-star rounds, the quality join and
    the component aggregates are all equi-joins; a cartesian means
    the cell blocking fell out of the candidate join."""
    plan = _plan(spark, sf_dir, "knn_diversity_sample")
    assert "CartesianProduct" not in plan


def test_decontaminate_fuzzy_broadcast_only_joins(spark, sf_dir):
    """The eval side (benchmark suite) is bounded, so BOTH its band
    rows and its shingle-hash sets must broadcast, and the corpus
    must never sort-merge: a SortMergeJoin here means the training
    corpus got shuffled for a benchmark-sized lookup."""
    plan = _plan(spark, sf_dir, "decontaminate_fuzzy")
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
