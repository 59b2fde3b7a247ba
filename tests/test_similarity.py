from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
    BITS_PER_TABLE,
    N_TABLES,
    ann_topk,
    ann_topk_fast,
    lsh_signatures_array,
)
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table


def test_fast_path_equals_exact_path(spark, sf_dir):
    """The dim-sequential Arrow kernel must reproduce the
    expression-fold exact path BIT-FOR-BIT (same float64 op sequence
    per pair) — neighbors, ranks, and cos values exactly equal, which
    is what lets ann_topk_fast share ann_topk's value oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = ann_topk(emb).toPandas().set_index(["query_id", "rnk"]).sort_index()
    fast = ann_topk_fast(emb).toPandas().set_index(["query_id", "rnk"]).sort_index()
    assert list(exact.index) == list(fast.index)
    assert (exact["neighbor_id"] == fast["neighbor_id"]).all()
    assert (exact["cos_sim"] == fast["cos_sim"]).all()


def test_lsh_candidates_are_bounded(spark, sf_dir):
    """Banded multi-table LSH must generate FAR fewer candidate pairs
    than brute force — the scale property the bucketing exists for.
    Expected within-bucket pairs per table ~ n²/2^BITS_PER_TABLE, so
    total candidates should stay under ~2·N_TABLES/2^B of brute force
    even with skewed bucket occupancy."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    buckets = emb.select("vec_id", F.posexplode(
        lsh_signatures_array(v)).alias("tbl", "bucket"))
    n = emb.count()
    occ = (buckets.groupBy("tbl", "bucket").count()
           .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
                F.max("count").alias("max_occ")).collect()[0])
    brute_pairs = n * (n - 1) / 2
    bound = 2 * N_TABLES / (1 << BITS_PER_TABLE)
    assert occ.pairs / brute_pairs < bound, (
        f"candidate ratio {occ.pairs / brute_pairs:.4f} exceeds {bound:.4f}")
    assert occ.max_occ < n / 4, "one bucket swallowed the corpus"


def test_ann_ivf_with_learned_centroids(spark, sf_dir):
    """kmeans_centroids output is a drop-in centroid relation for
    ann_ivf: full top-k per query, self-excluding, cos in [-1,1]."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators import similarity as sim
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    learned = (sim.kmeans_centroids(emb)
               .groupBy("cell")
               .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid_val")))
                    .alias("pairs"))
               .select("cell", F.expr("transform(pairs, p -> p.centroid_val)").alias("cv")))
    out = sim.ann_ivf(emb, centroids=learned).toPandas()
    assert (out.groupby("query_id").rnk.count() == sim.TOP_K).all()
    assert (out.query_id != out.neighbor_id).all()
    assert out.cos_sim.between(-1.0, 1.0).all()


def test_blocked_dedup_pairs_subset_of_exact(spark, sf_dir):
    """Every cell-blocked near-dup pair must appear in the exact
    quadratic baseline with the identical cosine (blocking changes
    RECALL, never a surviving pair's value), and no emitted pair may
    span two cells."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BRUTE_MAX_ID,
        dedup_embedding_blocked,
        dedup_embedding_cosine,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    blocked = dedup_embedding_blocked(emb).toPandas()
    exact = dedup_embedding_cosine(emb).toPandas()
    ex = exact.set_index(["vec_a", "vec_b"])["cos_sim"]
    in_slice = blocked[(blocked.vec_a < BRUTE_MAX_ID)
                       & (blocked.vec_b < BRUTE_MAX_ID)]
    for row in in_slice.itertuples():
        assert (row.vec_a, row.vec_b) in ex.index, row
        assert abs(ex.loc[(row.vec_a, row.vec_b)] - row.cos_sim) < 1e-9
    # one cell per vector: a vec_id appearing on either side always
    # carries the same cell
    cells = {}
    for row in blocked.itertuples():
        for vid in (row.vec_a, row.vec_b):
            assert cells.setdefault(vid, row.cell) == row.cell


def test_lsh_bits_formula():
    """Width grows one bit per corpus doubling past LSH_BASE_N, floored
    at BITS_PER_TABLE and capped at MAX_BITS — the three-engine
    integer formula (similarity.lsh_bits_for)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        LSH_BASE_N,
        MAX_BITS,
        lsh_bits_for,
    )

    assert lsh_bits_for(0) == BITS_PER_TABLE
    assert lsh_bits_for(LSH_BASE_N) == BITS_PER_TABLE
    assert lsh_bits_for(LSH_BASE_N + 1) == BITS_PER_TABLE + 1
    assert lsh_bits_for(2 * LSH_BASE_N) == BITS_PER_TABLE + 1
    assert lsh_bits_for(10 * LSH_BASE_N) == BITS_PER_TABLE + 4
    assert lsh_bits_for(30 * LSH_BASE_N) == BITS_PER_TABLE + 5
    assert lsh_bits_for(10 ** 12) == MAX_BITS


def test_ann_lsh_scale_aware_width_lockstep(spark, sf_dir):
    """At a corpus size past LSH_BASE_N the engine's dynamic width
    (sequence-fold truncated at `bits` from the 1-row count broadcast)
    must STILL match the DuckDB oracle (full MAX_BITS signature masked
    by 2^bits, bits recomputed in SQL) — the widened branch of the
    lockstep, which the base testdata (n <= LSH_BASE_N) never takes."""
    import duckdb

    from real_time_fraud_detection_flink_kafka_spark.oracles_llm import (
        _similarity_oracles,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        LSH_BASE_N,
        ann_lsh,
        ann_lsh_fast,
        lsh_bits_for,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n0 = emb.count()
    reps = LSH_BASE_N // n0 + 2          # enough replicas to cross BASE_N
    assert lsh_bits_for(reps * n0) > BITS_PER_TABLE
    big = emb
    for r in range(1, reps):
        big = big.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * n0)))
    got = (ann_lsh(big).toPandas()
           .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))
    fast = (ann_lsh_fast(big).toPandas()
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, fast)

    con = duckdb.connect()
    con.register("embeddings", big.toPandas())
    want = (con.execute(_similarity_oracles()["ann_lsh"]).fetchdf()
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_blocked_dedup_scale_aware_cells_lockstep(spark, sf_dir):
    """Past IVF_K*IVF_DIV vectors the cell count grows (one cell per
    IVF_DIV vectors) and the engine's dynamic branch (vec_id <
    broadcast _cells) must still match the DuckDB oracle (cells
    recomputed in SQL) — the widened-quantizer branch the base
    testdata never takes."""
    import duckdb

    from real_time_fraud_detection_flink_kafka_spark.oracles_llm import (
        _blocked_pairs_sql,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        IVF_DIV,
        IVF_K,
        dedup_embedding_blocked,
        ivf_cells_for,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n0 = emb.count()
    reps = (IVF_K * IVF_DIV) // n0 + 2
    assert ivf_cells_for(reps * n0) > IVF_K
    big = emb
    for r in range(1, reps):
        big = big.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * n0)))
    cols = ["vec_a", "vec_b", "cos_sim", "cell"]
    got = (dedup_embedding_blocked(big).toPandas()[cols]
           .sort_values(cols).reset_index(drop=True))

    con = duckdb.connect()
    con.register("embeddings", big.toPandas())
    want = (con.execute(_blocked_pairs_sql()).fetchdf()[cols]
            .sort_values(cols).reset_index(drop=True))
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_embedding_cosine_arrow_kernel_bit_equals_expression(spark, sf_dir):
    """The collected-slice Arrow kernel must reproduce the expression
    join bit-for-bit — pair set AND cos values exactly equal — which
    is what lets the fast path keep the quadratic baseline's oracle."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        dedup_embedding_cosine,
        dedup_embedding_cosine_expr,
    )
    emb = load_table(spark, sf_dir, "embeddings")
    fast = (dedup_embedding_cosine(emb).toPandas()
            .set_index(["vec_a", "vec_b"]).sort_index())
    expr = (dedup_embedding_cosine_expr(emb).toPandas()
            .set_index(["vec_a", "vec_b"]).sort_index())
    assert list(fast.index) == list(expr.index)
    assert (fast["cos_sim"] == expr["cos_sim"]).all()


def test_sq8_reconstruction_error_bounded(spark, sf_dir):
    """Every dequantized component must sit within HALF a quantization
    step of the raw value — |x − x̂| ≤ (mx−mn)/(2·SQ_LEVELS) — the
    property that makes SQ8 rank near-exactly, checked for EVERY
    (vector, dimension) in one scan (arrays_zip keeps the check
    row-local; the tiny float slack covers the decode expression's
    rounding, not the bound itself)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        SQ_LEVELS,
        _sq8_decoded,
        sq_params,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    raw = emb.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
    j = (raw.join(_sq8_decoded(emb).select("vec_id", "xh"), "vec_id")
            .join(F.broadcast(sq_params(emb))))
    viol = F.exists(
        F.arrays_zip("v", "xh", "qp"),
        lambda s: F.abs(s["v"] - s["xh"]) >
            (s["qp"]["mx"] - s["qp"]["mn"]) / (2 * SQ_LEVELS) + F.lit(1e-12))
    assert j.where(viol).count() == 0


def test_sq8_ladder_recall_and_plan(spark, sf_dir):
    """SQ8's index-ladder claim, measured: 8× compression should cost
    ~nothing in recall@5 vs exact (1.0 at both test SFs when written;
    bounds left slack for future corpus regeneration), and the scorer
    plan must stay all-broadcast — the 1-row params and the bounded
    query set ride BroadcastNestedLoopJoins; a SortMergeJoin or
    CartesianProduct would mean the corpus scan started shuffling."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        ann_sq8,
        ann_sq8_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    r = ann_sq8_recall(emb).toPandas()
    assert r["recall_sq8"].mean() >= 0.95
    assert r["recall_sq8"].min() >= 0.8
    plan = ann_sq8(emb)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_jl_rerank_dominates_direct_and_plan(spark, sf_dir):
    """Structural invariant: the re-rank stage consumes `ann_jl`'s own
    ranking as its shortlist, so direct top-k ⊆ shortlist and re-rank
    recall can NEVER be below direct recall — per query, not just on
    average. Measured levels (0.12 direct / 0.78 re-ranked at 32 dims,
    sf0.01) get slack bounds for corpus regeneration; the plan gate
    pins the all-broadcast scorer (no shuffle join, no cartesian)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        ann_jl,
        ann_jl_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    r = ann_jl_recall(emb).toPandas()
    assert (r["n_rerank"] >= r["n_jl"]).all()
    assert r["recall_rerank"].mean() >= 0.5
    plan = ann_jl(emb)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ann_ivf_ndcg_replays_by_hand(spark, sf_dir):
    """The nDCG accounting replayed in plain pandas from the two
    source rankings: per query, DCG must equal the sum of
    (k+1−exact_rank)·w_fp[approx_rank] over hits, ndcg == dcg/IDCG
    rounded, and every value sits in [0, 1]."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        NDCG_IDCG_FP,
        NDCG_W_FP,
        TOP_K,
        ann_ivf,
        ann_ivf_ndcg,
        ann_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = {r["query_id"]: r for r in ann_ivf_ndcg(emb).collect()}
    exact = {(r["query_id"], r["neighbor_id"]): r["rnk"]
             for r in ann_topk(emb).collect()}
    approx = ann_ivf(emb).collect()
    dcg = {}
    for r in approx:
        g = TOP_K + 1 - exact.get((r["query_id"], r["neighbor_id"]),
                                  TOP_K + 1)
        dcg[r["query_id"]] = (dcg.get(r["query_id"], 0)
                              + g * NDCG_W_FP[r["rnk"] - 1])
    assert set(out) == set(dcg)
    for q, row in out.items():
        assert row["dcg_fp"] == dcg[q]
        assert row["ndcg"] == round(dcg[q] / NDCG_IDCG_FP, 6)
        assert 0.0 <= row["ndcg"] <= 1.0


def test_ann_ivf_ndcg_k_derived_ideal(spark):
    """The weight table and ideal DCG must derive from the CALL's k:
    on a corpus where every vector seeds its own cell (n <= IVF_K),
    probing self + NPROBE−1 nearest cells makes the IVF top-3 equal
    the exact top-3, so ndcg at k=3 must be EXACTLY 1.0 — constants
    fixed to TOP_K=5 would score this perfect ranking ~0.45."""
    import math

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        ann_ivf_ndcg,
    )

    rows = []
    for i in range(12):
        raw = [1.0, 0.1 * (i + 1), 0.05 * ((i * i) % 7), 0.03 * (i % 5),
               0.0, 0.0, 0.0, 0.0]
        n = math.sqrt(sum(c * c for c in raw))
        rows.append((i, [c / n for c in raw]))
    edf = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = ann_ivf_ndcg(edf, k=3).collect()
    assert len(out) == 10
    assert all(r["ndcg"] == 1.0 for r in out)


def test_mmr_rerank_pool_exhaustion_emits_no_null_rows(spark):
    """When the pool exhausts before k selections (3 candidates,
    k=5), the output must stop at 3 real rows — the aggregate over an
    empty candidate set yields an all-NULL row that must be filtered,
    matching the oracle's empty LIMIT 1."""
    import math

    from real_time_fraud_detection_flink_kafka_spark.operators.retrieval import (
        mmr_rerank,
    )

    def unit(*comps):
        n = math.sqrt(sum(c * c for c in comps))
        v = [c / n for c in comps] + [0.0] * (8 - len(comps))
        return v[:8]

    edf = spark.createDataFrame(
        [(0, unit(1.0)), (1, unit(1.0, 0.2)), (2, unit(1.0, -0.3)),
         (3, unit(0.2, 1.0))],
        "vec_id bigint, embedding array<double>")
    out = mmr_rerank(edf, k=5).orderBy("rnk").collect()
    assert [r["rnk"] for r in out] == [1, 2, 3]
    assert all(r["vec_id"] is not None and r["mmr_fp"] is not None
               for r in out)


def test_mrl_rerank_dominates_direct_and_plan(spark, sf_dir):
    """The MRL twin of the JL dominance invariant: re-rank consumes
    `ann_mrl`'s own ranking as its shortlist, so re-rank recall >=
    direct recall PER QUERY; on untrained embeddings direct recall
    is near-noise (0.08 measured at 16 of 64 dims, sf0.01) while the
    pipeline recovers 0.68 — slack bounds for corpus regeneration.
    Plan gate: truncation is a row-local slice, so the scorer stays
    all-broadcast (no shuffle join, no cartesian)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        ann_mrl,
        ann_mrl_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    r = ann_mrl_recall(emb).toPandas()
    assert (r["n_rerank"] >= r["n_mrl"]).all()
    assert r["recall_rerank"].mean() >= 0.4
    plan = ann_mrl(emb)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_hard_negatives_exclude_own_label(spark, sf_dir):
    """Every mined negative carries a different label than its query,
    each query gets a full top-k, and the best hard negative can
    never beat the best UNCONSTRAINED neighbor (it solves a
    constrained max of the same objective)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        TOP_K,
        ann_topk,
        hard_negatives,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    hn = hard_negatives(emb).toPandas()
    assert (hn["query_label"] != hn["neighbor_label"]).all()
    assert (hn.groupby("query_id").size() == TOP_K).all()
    best_any = (ann_topk(emb).toPandas().query("rnk == 1")
                .set_index("query_id")["cos_sim"])
    best_neg = hn.query("rnk == 1").set_index("query_id")["cos_sim"]
    assert (best_neg <= best_any.loc[best_neg.index] + 1e-9).all()


def test_label_outliers_are_farthest_per_label(spark, sf_dir):
    """Per label: exactly OUTLIER_TOP flagged rows, ranked by
    non-increasing centroid distance, and the flagged set really is
    the label's distance tail (every flagged dist2 >= that label's
    median member distance)."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        OUTLIER_TOP,
        label_outliers,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = label_outliers(emb).toPandas()
    n_labels = emb.select("label").distinct().count()
    sizes = out.groupby("label").size()
    assert len(sizes) == n_labels
    assert (sizes == OUTLIER_TOP).all()
    for lbl, grp in out.groupby("label"):
        d = grp.sort_values("rnk")["dist2"].to_numpy()
        assert (d[:-1] >= d[1:]).all(), lbl


def test_knn_graph_degree_and_rank_contiguity(spark, sf_dir):
    """Graph contract: per-vector ranks are contiguous 1..deg with
    deg <= KNN_K, every edge stays inside one cell (nbr's cell equals
    the vector's), and rank order is non-increasing in cosine."""
    import pandas as pd

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        KNN_K,
        knn_graph,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    out = knn_graph(load_table(spark, sf_dir, "embeddings")).toPandas()
    assert len(out) > 0
    for _vid, g in out.groupby("vec_id"):
        assert sorted(g.rnk) == list(range(1, len(g) + 1))
        assert len(g) <= KNN_K
        by_rnk = g.sort_values("rnk")
        assert (by_rnk.cos_sim.diff().dropna() <= 1e-12).all()
    cell_of = out.drop_duplicates("vec_id").set_index("vec_id")["cell"]
    nbr_cells = out.nbr_id.map(cell_of)
    # nbr may have no out-edges (singleton after k-cut is impossible,
    # but keep the check on rows where the nbr appears as a source)
    mask = nbr_cells.notna()
    assert (out.cell[mask] == nbr_cells[mask]).all()


def test_knn_triangle_stats_invariants_and_clique(spark, sf_dir):
    """Corpus invariants: clustering_ppm ∈ [0, 1e6], Σ n_triangles
    divisible by 3 (every triangle touches exactly 3 corners), one
    row per graph node. Constructed check: 3 near-identical vectors
    in one cell form a mutual triangle — each gets n_triangles ≥ 1
    and clustering 1e6 when its only 2 edges close the triangle."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        knn_graph,
        knn_triangle_stats,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = knn_triangle_stats(emb).collect()
    nodes = {r["vec_id"] for r in rows}
    g_nodes = {r["vec_id"] for r in knn_graph(emb).collect()} | {
        r["nbr_id"] for r in knn_graph(emb).collect()}
    assert nodes == g_nodes
    assert all(0 <= r["clustering_ppm"] <= 1_000_000 for r in rows)
    assert all(r["degree"] >= 1 for r in rows)
    assert sum(r["n_triangles"] for r in rows) % 3 == 0

    import math

    def unit(*comps):
        n = math.sqrt(sum(c * c for c in comps))
        v = [c / n for c in comps] + [0.0] * (8 - len(comps))
        return v[:8]

    # 17 vectors → 16 cells; 0-15 seed the cells, 16/17 join vec 0's
    # cell as slight e0 perturbations → {0, 16, 17} is a 3-clique
    vecs = [(0, unit(1.0))]
    axes = []
    for i in range(1, 8):
        axes.append(unit(*([0.0] * i + [1.0])))
        axes.append(unit(*([0.0] * i + [-1.0])))
    for i, v in enumerate(axes[:15], start=1):
        vecs.append((i, v))
    vecs.append((16, unit(1.0, 0.02)))
    vecs.append((17, unit(1.0, -0.02)))
    edf = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    tri = {r["vec_id"]: r for r in knn_triangle_stats(edf).collect()}
    for v in (0, 16, 17):
        assert tri[v]["n_triangles"] >= 1
    # a node whose only two edges are the clique's closes exactly one
    # triangle → clustering 2·1·1e6/(2·1) = 1e6
    closed = [v for v in (0, 16, 17) if tri[v]["degree"] == 2]
    assert all(tri[v]["clustering_ppm"] == 1_000_000 for v in closed)


def test_knn_diversity_sample_constructed_graph(spark):
    """On a constructed corpus with two known dense neighborhoods the
    sampler must recover exactly those components, keep exactly the
    max-quality doc per component, and report the clique degrees.

    Geometry (dim 8, 21 vectors → 16 seeded cells): vecs 0-15 are the
    cell centroids (c0 = e0, c1..c14 = ±e1..±e7, c15 = e1+e2 mix);
    vecs 16-18 perturb e0 slightly → cell 0 with vec 0 (a 4-clique of
    strong edges); vecs 19-20 perturb e1 → cell 1 with vec 1 (a
    3-clique). Every other vector is alone in its cell and must be
    absent (implicitly kept)."""
    import math

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        knn_diversity_sample,
    )

    def unit(*comps):
        n = math.sqrt(sum(c * c for c in comps))
        v = [c / n for c in comps] + [0.0] * (8 - len(comps))
        return v[:8]

    def axis(i, sign=1.0):
        v = [0.0] * 8
        v[i] = sign
        return v

    emb = [(0, axis(0))]
    emb += [(1 + 2 * j, axis(1 + j)) for j in range(7)]          # +e1..+e7
    emb += [(2 + 2 * j, axis(1 + j, -1.0)) for j in range(7)]    # -e1..-e7
    emb += [(15, unit(0.0, 1.0, 1.0))]
    # group A: near e0, distinct tiny perturbations (no cos ties)
    emb += [(16, unit(1.0, 0.05)),
            (17, unit(1.0, 0.0, 0.06)),
            (18, unit(1.0, 0.0, 0.0, 0.07))]
    # group B: near +e1 (careful: perturb dims away from c15's e1+e2)
    emb += [(19, unit(0.0, 1.0, 0.0, 0.05)),
            (20, unit(0.0, 1.0, 0.0, 0.0, 0.06))]
    edf = spark.createDataFrame(emb, "vec_id bigint, embedding array<double>")

    lo = "the the the"
    hi = {17: "seventeen magnificent wonderful extraordinary "
              "remarkable distinctive astonishing exceptional",
          19: "nineteen magnificent wonderful extraordinary "
              "remarkable distinctive astonishing exceptional"}
    docs = spark.createDataFrame(
        [(i, hi.get(i, lo)) for i in range(21)], "doc_id bigint, text string")

    out = {r["doc_id"]: r
           for r in knn_diversity_sample(docs, edf).collect()}
    assert set(out) == {0, 16, 17, 18, 1, 19, 20}
    for d in (0, 16, 17, 18):
        assert out[d]["cluster_id"] == 0
        assert out[d]["cluster_size"] == 4
        assert out[d]["strong_degree"] == 3       # 4-clique
    for d in (1, 19, 20):
        assert out[d]["cluster_id"] == 1
        assert out[d]["cluster_size"] == 3
        assert out[d]["strong_degree"] == 2       # 3-clique
    assert {d for d in out if out[d]["keep"]} == {17, 19}


def test_knn_graph_hier_contract_and_agreement(spark, sf_dir):
    """The two-level graph keeps the flat graph's contract (ranks
    contiguous 1..deg ≤ k, cosine non-increasing in rank) while the
    agreement row stays arithmetically exact (n_same ≤ n_vectors,
    ppm an exact floor division) — and the END metric holds: the
    hier graph's edge overlap with exact top-k must be within a few
    points of the flat graph's (measured 0.197 vs 0.198 — blocking
    drift does not cost recall on this corpus)."""
    import pyspark.sql.functions as SF

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        KNN_K,
        ann_topk,
        ivf_hier_agreement,
        knn_graph,
        knn_graph_hier,
    )

    emb = (load_table(spark, sf_dir, "embeddings")
           .where(SF.col("vec_id") < 500))
    out = knn_graph_hier(emb).toPandas()
    assert len(out) > 0
    for _vid, g in out.groupby("vec_id"):
        assert sorted(g.rnk) == list(range(1, len(g) + 1))
        assert len(g) <= KNN_K
        assert (g.sort_values("rnk").cos_sim.diff().dropna() <= 1e-12).all()
    row = ivf_hier_agreement(emb).collect()[0]
    assert 0 < row["n_same"] <= row["n_vectors"]
    assert row["agreement_ppm"] == (1_000_000 * row["n_same"]) // row["n_vectors"]

    n = emb.count()
    exact = ann_topk(emb, k=KNN_K, n_queries=n).select(
        SF.col("query_id").alias("vec_id"),
        SF.col("neighbor_id").alias("nbr_id"))

    def edge_recall(g):
        hit = exact.join(
            g.select("vec_id", "nbr_id", SF.lit(1).alias("h")),
            ["vec_id", "nbr_id"], "left")
        r = hit.agg(SF.count(SF.lit(1)).alias("n"),
                    SF.sum(SF.coalesce("h", SF.lit(0))).alias("f")).collect()[0]
        return r["f"] / r["n"]

    assert edge_recall(knn_graph_hier(emb)) >= edge_recall(knn_graph(emb)) - 0.05


def test_scale_aware_assignment_switch(spark, sf_dir, monkeypatch):
    """The r10 scale-aware default (`_ivf_assigned_auto`) must be
    BIT-EXACT flat below HIER_CELLS_MIN cells and BIT-EXACT two-level
    at/above it — the two regimes of the one nl1-CASE plan, pinned
    both ways. Below: sf cells = IVF_K = 16 < 1024, so auto must
    reproduce `_ivf_assigned`'s flat argmax row-for-row. Above:
    monkeypatching the threshold under the corpus's cell count flips
    the same plan to ⌊√cells⌋ anchors, which must reproduce
    `_ivf_assigned_hier` row-for-row. (This is what lets knn_graph /
    dedup_embedding_blocked / knn_diversity_sample /
    semantic_canonicalize keep their flat-path oracles at test scale
    while riding the O(n·√cells) plan past the threshold.)"""
    from real_time_fraud_detection_flink_kafka_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")

    def rows(df):
        return sorted((r["vec_id"], r["cell"])
                      for r in df.select("vec_id", "cell").collect())

    assert rows(sim._ivf_assigned_auto(emb)) == rows(sim._ivf_assigned(emb))
    monkeypatch.setattr(sim, "HIER_CELLS_MIN", 1)
    assert rows(sim._ivf_assigned_auto(emb)) == rows(sim._ivf_assigned_hier(emb))


def test_knn_graph_recall_accounting(spark, sf_dir):
    """Recall accounting must be exact set arithmetic: true edges =
    n_vectors x KNN_K (every slice vector has >= K candidates),
    found <= true, recall = found/true in (0, 1] — and every found
    edge must actually BE an exact-kNN edge found by the graph
    (spot-checked via the per-edge relations)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        KNN_K,
        knn_graph_recall,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    row = knn_graph_recall(load_table(spark, sf_dir, "embeddings")).collect()[0]
    assert row["n_true_edges"] == row["n_vectors"] * KNN_K
    assert 0 < row["n_found"] <= row["n_true_edges"]
    assert row["recall"] == round(row["n_found"] / row["n_true_edges"], 6)


def test_ann_graph_search_walk_improves_and_recall_bounds(spark, sf_dir):
    """Structural contract of the greedy graph walk: one row per
    query, the endpoint is never the query itself, and the endpoint's
    cosine is >= the entry node's cosine (a hill-climb can stay put
    but never move downhill). Recall row: n_top1 <= n_topk <=
    n_queries and the ppms are exact floor divisions."""
    import math

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        ann_graph_recall,
        ann_graph_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r["query_id"]: r for r in ann_graph_search(emb).collect()}
    assert len(rows) == N_QUERIES
    vecs = {r["vec_id"]: r["embedding"]
            for r in emb.where(F.col("vec_id") <= max(N_QUERIES, 2))
            .collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a)) / math.sqrt(
            sum(x * x for x in b))

    for qid, r in rows.items():
        assert r["found_id"] != qid
        entry = 1 if qid == 0 else 0
        assert r["cos_sim"] >= round(cos(vecs[qid], vecs[entry]), 6) - 1e-6

    rec = ann_graph_recall(emb).collect()[0]
    assert rec["n_queries"] == N_QUERIES
    assert 0 <= rec["n_top1"] <= rec["n_topk"] <= rec["n_queries"]
    assert rec["top1_ppm"] == rec["n_top1"] * 1_000_000 // rec["n_queries"]
    assert rec["topk_ppm"] == rec["n_topk"] * 1_000_000 // rec["n_queries"]


def test_probe1_is_auto_assignment_bitexact(spark, sf_dir):
    """_ivf_probed's prn=1 row must be _ivf_assigned_auto's cell to
    the bit — same candidate chain, same (cos DESC, lower cell)
    order, only the reducer differs (row_number vs max_by)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        _ivf_assigned_auto,
        _ivf_probed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    auto = _ivf_assigned_auto(emb).select("vec_id", "cell")
    p1 = (_ivf_probed(emb).where(F.col("prn") == 1)
          .select("vec_id", F.col("cell").alias("pcell")))
    j = auto.join(p1, "vec_id")
    assert j.count() == emb.count()
    assert j.where(F.col("cell") != F.col("pcell")).count() == 0


def test_knn_graph_nprobe_structure(spark, sf_dir):
    """Multi-probe graph contract: per-vector ranks are 1..k dense
    with no duplicate (vec, nbr) pair, no self-edge, and the edge set
    is a SUPERSET-or-equal improvement in within-graph quality: every
    vector's top-1 multi-probe neighbor cosine >= its top-1
    single-probe neighbor cosine (the probe-1 candidates are a subset
    of the probe-2 candidates)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        knn_graph,
        knn_graph_nprobe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    g = knn_graph_nprobe(emb)
    rows = g.collect()
    assert all(r["vec_id"] != r["nbr_id"] for r in rows)
    seen = {(r["vec_id"], r["nbr_id"]) for r in rows}
    assert len(seen) == len(rows)
    per = {}
    for r in rows:
        per.setdefault(r["vec_id"], []).append(r["rnk"])
    for v, rnks in per.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
    top1_multi = {r["vec_id"]: r["cos_sim"] for r in rows if r["rnk"] == 1}
    top1_single = {r["vec_id"]: r["cos_sim"]
                   for r in knn_graph(emb).collect() if r["rnk"] == 1}
    for v, c in top1_single.items():
        assert top1_multi[v] >= c - 1e-9


def test_beam_width_one_is_greedy_and_recall_lift(spark, sf_dir):
    """ann_beam_search at beam=1 must equal the greedy walk over the
    same multi-probe graph (ann_beam_recall's baseline row is exactly
    that), and the recall relation the rung exists for must hold on
    this corpus: beam >= greedy on BOTH counters. NOT a theorem — a
    beam can in principle drop a mediocre node whose neighborhood
    hides the answer — but it is the measured property the r11
    verdict asked for; if a graph/walk change regresses it, this
    test should go red."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        ann_beam_recall,
        ann_beam_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    one = sorted((r["query_id"], r["found_id"], r["cos_sim"])
                 for r in ann_beam_search(emb, beam=1).collect())
    assert len(one) == N_QUERIES
    rec = {r["method"]: r for r in ann_beam_recall(emb).collect()}
    assert set(rec) == {"greedy", "beam"}
    for m in rec.values():
        assert 0 <= m["n_top1"] <= m["n_topk"] <= m["n_queries"] == N_QUERIES
    assert rec["beam"]["n_topk"] >= rec["greedy"]["n_topk"]
    assert rec["beam"]["n_top1"] >= rec["greedy"]["n_top1"]


def test_beam_topk_serving_contract(spark, sf_dir):
    """ann_beam_topk serves ann_topk's shape from the beam frontier:
    k dense ranks per query ordered by cos, no self, no duplicate
    neighbor; recall row counts |found ∩ exact| with an exact ppm;
    and the best-endpoint consistency holds — rank-1 of the served
    top-k IS ann_beam_search's found_id at the same width."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_EF,
        N_QUERIES,
        TOP_K,
        ann_beam_search,
        ann_beam_topk,
        ann_beam_topk_recall,
    )
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    rows = ann_beam_topk(emb).collect()
    per = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per.setdefault(r["query_id"], []).append(r)
    assert len(per) == N_QUERIES
    for q, rs in per.items():
        assert sorted(x["rnk"] for x in rs) == list(range(1, len(rs) + 1))
        assert len({x["neighbor_id"] for x in rs}) == len(rs)
        ordered = sorted(rs, key=lambda x: x["rnk"])
        assert all(a["cos_sim"] >= b["cos_sim"]
                   for a, b in zip(ordered, ordered[1:]))
    best = {r["query_id"]: r["neighbor_id"]
            for r in rows if r["rnk"] == 1}
    search = {r["query_id"]: r["found_id"]
              for r in ann_beam_search(emb, beam=BEAM_EF).collect()}
    assert best == search
    rec = ann_beam_topk_recall(emb).collect()[0]
    assert rec["k"] == TOP_K and rec["n_queries"] == N_QUERIES
    assert 0 <= rec["n_hits"] <= rec["n_queries"] * rec["k"]
    assert rec["recall_ppm"] == (rec["n_hits"] * 1_000_000
                                 // (rec["n_queries"] * rec["k"]))
    with pytest.raises(ValueError):
        ann_beam_topk(emb, k=TOP_K, beam=TOP_K - 1)


def test_nav_graph_stats_cross_cell_claim(spark, sf_dir):
    """The navigability fix's load-bearing numbers: the single-probe
    graph has ZERO cross-primary-cell edges by construction (the r10
    trapped-walk defect), the multi-probe graph has a nonzero share,
    and the ppm is the exact floor division."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        nav_graph_stats,
    )

    rows = {r["graph"]: r for r in nav_graph_stats(
        load_table(spark, sf_dir, "embeddings")).collect()}
    assert set(rows) == {"single_probe", "multi_probe"}
    assert rows["single_probe"]["n_cross_cell"] == 0
    assert rows["multi_probe"]["n_cross_cell"] > 0
    for r in rows.values():
        assert 0 < r["n_edges"]
        assert r["cross_ppm"] == (r["n_cross_cell"] * 1_000_000
                                  // r["n_edges"])


def test_beam_pq_adc_lookup_equals_join_score(spark, sf_dir):
    """The DiskANN rung's load-bearing encoding claim: the row-local
    positional lookup Σ_m tabs[m][pcodes[m]] must equal the
    (sub, code)-equijoin ADC sum for every (query, vector) pair —
    this is exactly the sparse-code robustness the dense `pos` rank
    exists for (Lloyd can drop a code, leaving code ids sparse; a
    code-VALUE-indexed table would silently misalign)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        PQ_M,
        PQ_SCALE,
        _adc_fp,
        _pq_cb_pos,
        _pq_pos_arrays,
        _pq_query_tabs,
        _subvectors,
        dot,
        pq_codebooks_rel,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(400)
    cb = pq_codebooks_rel(emb)
    cbp = _pq_cb_pos(cb)
    pa = _pq_pos_arrays(emb, cbp)
    tabs = _pq_query_tabs(emb, cbp, N_QUERIES)
    # positions are dense per subspace and the arrays are PQ_M long
    for r in pa.collect():
        assert len(r["pcodes"]) == PQ_M
        assert all(p >= 0 for p in r["pcodes"])
    # join-based reference: encode -> dtab equijoin -> per-pair sum
    enc = pq_encode(emb, cb)
    q = (_subvectors(emb)
         .where(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), "sub",
                 F.col("sv").alias("qsv")))
    dtab = (q.join(cb, "sub")
             .select("query_id", "sub", "code",
                     F.round(dot(F.col("qsv"), F.col("cv")) * PQ_SCALE)
                      .cast("bigint").alias("fp")))
    ref = (enc.join(dtab, ["sub", "code"])
              .groupBy("query_id", "vec_id")
              .agg(F.sum("fp").alias("fp_ref")))
    got = (pa.crossJoin(F.broadcast(tabs))
             .select("query_id", "vec_id",
                     _adc_fp(F.col("tabs"), F.col("pcodes")).alias("fp_got")))
    j = ref.join(got, ["query_id", "vec_id"]).collect()
    assert len(j) == 400 * N_QUERIES
    assert all(r["fp_ref"] == r["fp_got"] for r in j)


def test_beam_pq_serving_contract_and_rerank_exactness(spark, sf_dir):
    """ann_beam_pq_topk serves ann_beam_topk's schema (dense ranks,
    no self, no dup, cos descending) and its emitted cos_sim values
    are EXACT cosines — the rerank step's whole point — verified by
    recomputing each emitted pair full-precision. The recall row
    labels both walks and its ppm is the exact floor division."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ann_beam_pq_recall,
        ann_beam_pq_topk,
        cosine,
    )
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    rows = ann_beam_pq_topk(emb).collect()
    per = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per.setdefault(r["query_id"], []).append(r)
    assert len(per) == N_QUERIES
    for rs in per.values():
        assert sorted(x["rnk"] for x in rs) == list(range(1, len(rs) + 1))
        assert len({x["neighbor_id"] for x in rs}) == len(rs)
        ordered = sorted(rs, key=lambda x: x["rnk"])
        assert all(a["cos_sim"] >= b["cos_sim"]
                   for a, b in zip(ordered, ordered[1:]))
    # rerank exactness: emitted cos == full-precision cosine
    pairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in rows}
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    b = e.select(F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
    import functools
    cond = functools.reduce(
        lambda acc, p: acc | ((F.col("qid") == p[0]) & (F.col("nid") == p[1])),
        list(pairs), F.lit(False))
    want = {(r["qid"], r["nid"]): r["c"] for r in
            a.crossJoin(b).where(cond)
             .select("qid", "nid",
                     F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("c"))
             .collect()}
    assert want == pairs
    rec = {r["method"]: r for r in ann_beam_pq_recall(emb).collect()}
    assert set(rec) == {"exact_walk", "pq_walk"}
    for m in rec.values():
        assert m["k"] == TOP_K and m["n_queries"] == N_QUERIES
        assert 0 <= m["n_hits"] <= m["n_queries"] * m["k"]
        assert m["recall_ppm"] == (m["n_hits"] * 1_000_000
                                   // (m["n_queries"] * m["k"]))
    with pytest.raises(ValueError):
        ann_beam_pq_topk(emb, k=TOP_K, beam=TOP_K - 1)


def test_knn_graph_insert_contract(spark, sf_dir):
    """Incremental insert: every new node gets exactly k dense-ranked
    edges, every edge points INTO the base corpus (vec_id >= cutoff,
    nbr_id < cutoff — the walk can only reach indexed nodes), cos
    descending per node, and the recall row's accounting is exact.
    The split is the 90/10 boundary the operator derives itself."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        INSERT_DEN,
        INSERT_NUM,
        KNN_K,
        N_QUERIES,
        knn_graph_insert,
        knn_graph_insert_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cutoff = emb.count() * INSERT_NUM // INSERT_DEN
    rows = knn_graph_insert(emb).collect()
    per = {}
    for r in rows:
        assert r["vec_id"] >= cutoff      # only new nodes emit edges
        assert r["nbr_id"] < cutoff       # edges point into the base
        per.setdefault(r["vec_id"], []).append(r)
    n_new = emb.count() - cutoff
    assert len(per) == n_new
    for rs in per.values():
        assert sorted(x["rnk"] for x in rs) == list(range(1, KNN_K + 1))
        assert len({x["nbr_id"] for x in rs}) == KNN_K
        ordered = sorted(rs, key=lambda x: x["rnk"])
        assert all(a["cos_sim"] >= b["cos_sim"]
                   for a, b in zip(ordered, ordered[1:]))
    rec = knn_graph_insert_recall(emb).collect()[0]
    assert rec["n_inserted"] == min(N_QUERIES, n_new)
    assert rec["k"] == KNN_K
    assert 0 <= rec["n_hits"] <= rec["n_inserted"] * KNN_K
    assert rec["recall_ppm"] == (rec["n_hits"] * 1_000_000
                                 // (rec["n_inserted"] * KNN_K))


def test_knn_graph_arrow_is_bit_identical(spark, sf_dir):
    """The r12 default pair stage (`_knn_from_assigned_arrow`) must
    reproduce the expression path ROW-FOR-ROW including cos values —
    what lets the shipped `knn_graph`/`knn_graph_hier` keep the
    expression path's value oracle (driver slot 15 stays hash-green).
    Checked over BOTH assignment regimes the dispatch serves: the
    scale-aware auto default and an explicit flat n_cells."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        knn_graph,
        knn_graph_hier,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    for fn, kw in ((knn_graph, {}), (knn_graph, {"n_cells": 7}),
                   (knn_graph_hier, {})):
        a = (fn(emb, impl="expr", **kw).toPandas()
             .sort_values(["vec_id", "rnk"]).reset_index(drop=True))
        b = (fn(emb, **kw).toPandas()
             .sort_values(["vec_id", "rnk"]).reset_index(drop=True))
        assert a.shape == b.shape and list(a.columns) == list(b.columns)
        assert (a.values == b.values).all(), (fn.__name__, kw)


def test_knn_graph_nprobe_fast_is_bit_identical(spark, sf_dir):
    """The Arrow twin (dim-sequential kernel, in-kernel partial
    top-k, stable-argsort tie-breaks over id-sorted members) must
    reproduce the expression path ROW-FOR-ROW including cos values —
    what lets it share the value oracle and serve as the beam
    family's construction base (`_nprobe_und` rides it)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        knn_graph_nprobe,
        knn_graph_nprobe_fast,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = (knn_graph_nprobe(emb).toPandas()
         .sort_values(["vec_id", "rnk"]).reset_index(drop=True))
    b = (knn_graph_nprobe_fast(emb).toPandas()
         .sort_values(["vec_id", "rnk"]).reset_index(drop=True))
    assert a.shape == b.shape
    assert (a.values == b.values).all()


def test_pair_kernel_block_size_invariance():
    """The r13 hot-cell fix: the pair-stage Arrow kernels score in
    probe-row blocks (KNN_ARROW_BLOCK_ELEMS) so a pathological cell
    costs O(block·occ) score memory, not O(occ²). Row blocking must
    be INVISIBLE — the 1-row-block extreme (block_elems=1 forces
    bs=1) must reproduce the single-block run bit-for-bit, rows AND
    cos values, for both kernels. That invariance is what lets the
    bounded kernel keep the expression twins' value oracles."""
    import numpy as np

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        _probe_pair_topk_blocked,
        _self_pair_topk_blocked,
    )

    rng = np.random.RandomState(7)
    n, dim = 47, 8

    self_pdf = pd.DataFrame({
        "cell": np.zeros(n, dtype=np.int64),
        "vec_id": np.arange(n, dtype=np.int64),
        "v": [rng.randn(dim).tolist() for _ in range(n)],
    })
    self_pdf["v_norm"] = [float(np.sqrt(np.dot(v, v)))
                          for v in self_pdf["v"]]
    one_row = _self_pair_topk_blocked(self_pdf, 5, 1)
    one_block = _self_pair_topk_blocked(self_pdf, 5, 10**12)
    assert one_row.shape == one_block.shape
    assert (one_row.values == one_block.values).all()

    # probe kernel: 30 members (prn=1) + the same ids re-appearing as
    # probes of this cell (prn=2) + 17 foreign probes — covers the
    # self-exclusion rows and the keep-mask path in every block
    mem_ids = np.arange(30, dtype=np.int64)
    probe_ids = np.arange(17, dtype=np.int64) + 100
    ids = np.concatenate([mem_ids, mem_ids, probe_ids])
    prn = np.concatenate([np.ones(30, dtype=np.int64),
                          np.full(30 + 17, 2, dtype=np.int64)])
    vecs = [rng.randn(dim).tolist() for _ in range(30)]
    vecs = vecs + vecs + [rng.randn(dim).tolist() for _ in range(17)]
    probe_pdf = pd.DataFrame({"vec_id": ids, "prn": prn, "v": vecs})
    probe_pdf["v_norm"] = [float(np.sqrt(np.dot(v, v)))
                           for v in probe_pdf["v"]]
    one_row = _probe_pair_topk_blocked(probe_pdf, 5, 1)
    one_block = _probe_pair_topk_blocked(probe_pdf, 5, 10**12)
    assert one_row.shape == one_block.shape
    assert (one_row.values == one_block.values).all()


def test_knn_graph_arrow_hot_cell_bounded(spark, sf_dir):
    """Adversarial assignment skew: EVERY vector in one cell (occ = n,
    ≥10× the auto assignment's average occupancy) must still match
    the expression path row-for-row — and because the kernel scores
    in ≤ KNN_ARROW_BLOCK_ELEMS-element row blocks (invariance pinned
    above), its peak score allocation in this worst case is
    O(block·occ), not the occ² matrix the r12 kernel materialized."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        KNN_K,
        _knn_from_assigned,
        _knn_from_assigned_arrow,
        _vecs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    hot = _vecs(emb).withColumn("cell", F.lit(0).cast("int"))
    a = (_knn_from_assigned(hot, KNN_K).toPandas()
         .sort_values(["vec_id", "rnk"]).reset_index(drop=True))
    b = (_knn_from_assigned_arrow(hot, KNN_K).toPandas()
         .sort_values(["vec_id", "rnk"]).reset_index(drop=True))
    assert len(a) == n * KNN_K  # every vector emits k edges
    assert a.shape == b.shape and list(a.columns) == list(b.columns)
    assert (a.values == b.values).all()


def test_insert_scaled_default_enforces_beam_floor(spark, sf_dir):
    """The scaled-default path (beam=None) floors at BEAM_EF, so a k
    above BEAM_EF must fail loudly instead of silently emitting fewer
    than k edges per inserted node (the explicit-int path already
    raises; r13 extends the guard to the default path)."""
    import pytest

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_EF,
        knn_graph_insert,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="BEAM_EF"):
        knn_graph_insert(emb, k=BEAM_EF + 1)


def test_pq_serving_default_is_curve_crossover():
    """The DiskANN serving pair (ann_beam_pq_topk + its streaming
    twin) must default to PQ_SERVE_BEAM — the width its own curve
    measured as the crossover with the exact ef=8 walk (42/50 vs
    41/50 at sf0.01) — while the recall relation keeps BEAM_EF as
    the floor measurement."""
    import inspect

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        BEAM_EF,
        PQ_BEAM_CURVE,
        PQ_SERVE_BEAM,
        ann_beam_pq_recall,
        ann_beam_pq_topk,
    )

    assert PQ_SERVE_BEAM in PQ_BEAM_CURVE and PQ_SERVE_BEAM > BEAM_EF
    assert (inspect.signature(ann_beam_pq_topk).parameters["beam"].default
            == PQ_SERVE_BEAM)
    assert (inspect.signature(ann_beam_pq_recall).parameters["beam"].default
            == BEAM_EF)
