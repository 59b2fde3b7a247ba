"""Arrow minhash fast path must be BIT-identical to the expression
path: same md5-derived bases, same (a·h+b) mod P permutations, same
bands — so the two operators share one oracle."""

from __future__ import annotations

import pandas as pd

from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_minhash_lsh_fast,
    minhash_signatures,
    minhash_signatures_arrow,
)
from real_time_fraud_detection_flink_kafka_spark.functions import hashing as H
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_signatures_bit_identical(spark, sf_dir):
    """ALL columns including sh_set: both paths emit the sorted 60-bit
    shingle hashes, so the frames must be exactly equal."""
    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "sh_set"] + [f"m{i}" for i in range(H.N_PERM)]
    slow = minhash_signatures(docs).select(cols).toPandas()
    fast = minhash_signatures_arrow(docs).select(cols).toPandas()
    slow["sh_set"] = slow["sh_set"].apply(list)
    fast["sh_set"] = fast["sh_set"].apply(list)
    order = ["doc_id"]
    slow = slow.sort_values(order, kind="mergesort").reset_index(drop=True)
    fast = fast.sort_values(order, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(slow, fast)


def test_fast_pipeline_equals_expression_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    slow = _norm(dedup_minhash_lsh(docs).toPandas())
    fast = _norm(dedup_minhash_lsh_fast(docs).toPandas())
    pd.testing.assert_frame_equal(slow, fast)


def test_ann_lsh_arrow_buckets_bit_identical(spark, sf_dir):
    """The Arrow signature stage must reproduce the expression path's
    buckets EXACTLY (the sequential-across-dims fold argument) — not
    just the final verified pairs."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators import similarity as sim
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    e = sim._vecs(emb)
    expr = (sim._with_hyperplanes(e)
            .select("vec_id", F.posexplode(
                sim.lsh_signatures_array(F.col("v"), F.col("_hps"))
            ).alias("tbl", "bucket"))
            .toPandas().sort_values(["vec_id", "tbl"]).reset_index(drop=True))
    arrow = (sim.lsh_signatures_arrow(emb)
             .toPandas().sort_values(["vec_id", "tbl"]).reset_index(drop=True))
    assert (expr.vec_id == arrow.vec_id).all()
    assert (expr.tbl == arrow.tbl).all()
    assert (expr.bucket.astype("int64") == arrow.bucket.astype("int64")).all()


def test_ann_lsh_fast_equals_expression_path(spark, sf_dir):
    from real_time_fraud_detection_flink_kafka_spark.operators import similarity as sim
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cols = ["vec_a", "vec_b", "cos_sim"]
    slow = sim.ann_lsh(emb).toPandas().sort_values(cols).reset_index(drop=True)
    fast = sim.ann_lsh_fast(emb).toPandas().sort_values(cols).reset_index(drop=True)
    assert slow.equals(fast)


def test_dedup_clusters_transitive_chain(spark):
    """Label propagation must merge a-b-c chains where a-c is itself
    below threshold (transitivity through b), pick the min id as
    canonical, and omit docs with no near-dup pair."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import dedup_clusters

    w = [f"w{i}" for i in range(20)]
    docs = spark.createDataFrame(
        [(10, " ".join(w[0:12])),    # a: w0..w11
         (11, " ".join(w[1:13])),    # b: w1..w12 (j(a,b) = 9/11 >= 0.8)
         (12, " ".join(w[2:14])),    # c: w2..w13 (j(a,c) = 8/12 < 0.8)
         (13, "solo doc with nothing similar at all")],
        "doc_id long, text string")
    out = dedup_clusters(docs).toPandas().set_index("doc_id")
    assert sorted(out.index) == [10, 11, 12]
    assert (out.canonical_id == 10).all()
    assert (out.cluster_size == 3).all()


def test_dedup_incremental_statuses(spark):
    """Delta docs (doc_id % 10 == 0) judged against the rest: exact
    match wins over near, near requires >= 3 words (shingleable), and
    counts expand over identical corpus copies."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import dedup_incremental

    w = [f"w{i}" for i in range(20)]
    long_a = " ".join(w[0:12])        # w0..w11
    near_a = " ".join(w[1:13])        # j = 9/11 ≈ 0.818 >= 0.8
    docs = spark.createDataFrame(
        [(1, long_a), (2, long_a),            # corpus: 2 identical copies
         (3, "totally different corpus text here"),
         (4, "x y"),                          # short corpus doc
         (10, long_a),                        # delta: exact dup (2 copies)
         (20, near_a),                        # delta: near dup of 1 and 2
         (30, "brand new unseen delta text"), # delta: new
         (40, "x y"),                         # delta: identical but short —
                                              # exact_dup with n_near = 0
         (50, "q")],                          # delta: short and unseen
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_incremental(docs).collect()}
    assert out[10]["status"] == "exact_dup"
    assert out[10]["n_exact"] == 2
    assert out[10]["n_near"] == 2          # jaccard 1.0 vs both copies
    assert out[20]["status"] == "near_dup"
    assert (out[20]["n_exact"], out[20]["n_near"]) == (0, 2)
    assert out[30]["status"] == "new"
    assert out[40]["status"] == "exact_dup"
    assert (out[40]["n_exact"], out[40]["n_near"]) == (1, 0)
    assert out[50]["status"] == "new"
    assert set(out) == {10, 20, 30, 40, 50}


def test_components_twostar_deep_path_and_cycles(spark):
    """Star contraction must label a DEEP path (diameter 29) within its
    log-round budget — the graph shape label propagation CANNOT take
    (its logical plan references the prior round's labels twice, so
    the analyzer tree doubles per round: ~2^30 nodes at diameter 29,
    driver OOM before any data moves; that asymmetry is this engine's
    reason to exist). Expected labels are hand-computed; cycle and
    2-clique stay separate components."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        components_twostar)

    path = [(i, i + 1) for i in range(29)]                # 0-1-...-29
    cycle = [(100, 101), (101, 102), (102, 100)]
    pair = [(200, 201)]
    pairs = spark.createDataFrame(path + cycle + pair,
                                  "doc_a long, doc_b long")
    two = {r["id"]: r["label"]
           for r in components_twostar(pairs, max_iters=20).collect()}
    assert all(two[i] == 0 for i in range(30))
    assert all(two[i] == 100 for i in (100, 101, 102))
    assert two[200] == 200 and two[201] == 200
    assert len(two) == 35


def test_components_twostar_agrees_with_propagation(spark):
    """On a SHALLOW graph (where propagation is the right engine) the
    two engines must emit identical (id, label) sets."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        components_twostar, min_label_components)

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1),          # triangle
         (10, 11), (11, 12), (10, 13),    # star + chain
         (20, 21),                        # pair
         (30, 30)],                       # self-loop only -> singleton
        "doc_a long, doc_b long")
    two = {r["id"]: r["label"] for r in components_twostar(pairs).collect()}
    prop = {r["id"]: r["label"]
            for r in min_label_components(pairs).collect()}
    assert two == prop
    assert two == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 30: 30}


def test_dedup_clusters_twostar_equals_propagation(spark, sf_dir):
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_clusters, dedup_clusters_twostar)
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    slow = _norm(dedup_clusters(docs).toPandas())
    fast = _norm(dedup_clusters_twostar(docs).toPandas())
    pd.testing.assert_frame_equal(slow, fast)


def test_dedup_substring_spans(spark):
    """Exact-substring spans: a 12-token run shared by two docs yields
    one maximal span per doc at its own offset (run + k - 1 length
    arithmetic); a WITHIN-doc 8-token repeat is still duplication
    (total-occurrence counting, per Lee et al.); docs shorter than k
    or overlapping by < k tokens emit nothing."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import dedup_substring

    w = [f"w{i}" for i in range(40)]
    shared = w[5:17]                       # 12 tokens
    rep = w[20:28]                         # 8 tokens
    docs = spark.createDataFrame(
        [(1, " ".join(w[0:5] + shared + w[17:20])),   # shared at tok 6..17
         (2, " ".join(["x1", "x2"] + shared + ["x3"])),  # shared at 3..14
         (3, " ".join(rep + ["y1", "y2"] + rep)),     # self-repeat at 1, 11
         (4, " ".join(w[30:35]))],                    # 5 tokens: too short
        "doc_id long, text string")
    out = sorted((r["doc_id"], r["span_start"], r["span_len"])
                 for r in dedup_substring(docs).collect())
    assert out == [(1, 6, 12), (2, 3, 12), (3, 1, 8), (3, 11, 8)]


def test_dedup_substring_hot_hash_skew(spark):
    """Skew fixture for the occurrence-count stage: ONE boilerplate
    shingle shared by every doc (the mega-hot hash a window-based
    count would funnel into a single partition). Correctness must
    hold, and the plan must count hashes with a COMBINABLE groupBy
    (partial_count visible) rather than count().over(partitionBy(h))
    — exactly one Window (the per-doc islands row_number) survives."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import dedup_substring

    boiler = [f"b{i}" for i in range(8)]          # one hot 8-shingle
    docs = spark.createDataFrame(
        [(i, " ".join(boiler + [f"u{i}_{j}" for j in range(6)]))
         for i in range(200)],
        "doc_id long, text string")
    out = dedup_substring(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, "hash count lost its map-side combine"
    assert plan.count("Window") == 1, plan
    rows = sorted((r["doc_id"], r["span_start"], r["span_len"])
                  for r in out.collect())
    # every doc: exactly the boilerplate span, position 1, length 8
    assert rows == [(i, 1, 8) for i in range(200)]


def test_apply_span_removal_cut_arithmetic(spark):
    """Span removal replays dedup_substring's cut list: shared spans
    are cut at each doc's own offset, a self-repeat is cut at both
    sites, short docs pass through whole, and a doc that is ENTIRELY
    one duplicated span is emptied (n_tokens_after = 0)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        apply_span_removal,
    )

    w = [f"w{i}" for i in range(40)]
    shared = w[5:17]                       # 12 tokens
    rep = w[20:28]                         # 8 tokens
    whole = [f"z{i}" for i in range(8)]    # exactly k tokens, duplicated
    docs = spark.createDataFrame(
        [(1, " ".join(w[0:5] + shared + w[17:20])),
         (2, " ".join(["x1", "x2"] + shared + ["x3"])),
         (3, " ".join(rep + ["y1", "y2"] + rep)),
         (4, " ".join(w[30:35])),
         (5, " ".join(whole)),
         (6, " ".join(whole))],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in apply_span_removal(docs).collect()}
    assert len(got) == 6
    assert (got[1]["n_tokens_before"], got[1]["n_tokens_after"]) == (20, 8)
    assert got[1]["text_clean"] == " ".join(w[0:5] + w[17:20])
    assert (got[2]["n_tokens_before"], got[2]["n_tokens_after"]) == (15, 3)
    assert got[2]["text_clean"] == "x1 x2 x3"
    assert (got[3]["n_tokens_before"], got[3]["n_tokens_after"]) == (18, 2)
    assert got[3]["text_clean"] == "y1 y2"
    assert (got[4]["n_tokens_before"], got[4]["n_tokens_after"]) == (5, 5)
    assert got[4]["text_clean"] == " ".join(w[30:35])
    for d in (5, 6):
        assert (got[d]["n_tokens_before"], got[d]["n_tokens_after"]) == (8, 0)
        assert got[d]["text_clean"] == ""


def test_apply_span_removal_overlapping_token_spans(spark):
    """Two position runs separated by one non-duplicated position have
    OVERLAPPING token extents (gap < k - 1): per-token coverage must
    cut the union, not double-count or miss the overlap."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        SUBSTR_K,
        apply_span_removal,
        dedup_substring,
    )

    a = [f"a{i}" for i in range(SUBSTR_K)]      # 8-token run A
    b = [f"b{i}" for i in range(SUBSTR_K)]      # 8-token run B
    # doc 1: A ++ B back to back → positions 1 and 9 duplicated, the
    # gap positions 2..8 are unique to doc 1 (A⧺B junction shingles)
    docs = spark.createDataFrame(
        [(1, " ".join(a + b)),
         (2, " ".join(a + ["q1", "q2"])),
         (3, " ".join(["r1", "r2"] + b))],
        "doc_id long, text string")
    spans = sorted((r["doc_id"], r["span_start"], r["span_len"])
                   for r in dedup_substring(docs).collect())
    assert spans == [(1, 1, 8), (1, 9, 8), (2, 1, 8), (3, 3, 8)]
    got = {r["doc_id"]: r.asDict() for r in apply_span_removal(docs).collect()}
    # doc 1: spans [1..8] and [9..16] tile the doc exactly → emptied
    assert (got[1]["n_tokens_before"], got[1]["n_tokens_after"]) == (16, 0)
    assert got[2]["text_clean"] == "q1 q2"
    assert got[3]["text_clean"] == "r1 r2"


def test_dedup_substring_incremental_equals_filtered_full(spark, sf_dir):
    """The asymmetric delta-vs-corpus plan (corpus collapsed to a
    distinct hash index, delta probed against it + its own local
    count) must equal the full-corpus spans restricted to delta docs
    — the semantic identity the docstring claims. Also: a delta-only
    within-doc repeat is caught without any corpus hit."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        DELTA_MOD,
        dedup_substring,
        dedup_substring_incremental,
    )

    docs = load_table(spark, sf_dir, "documents")
    inc = _norm(dedup_substring_incremental(docs).toPandas())
    full = dedup_substring(docs)
    want = _norm(full.where(full["doc_id"] % DELTA_MOD == 0).toPandas())
    pd.testing.assert_frame_equal(inc, want)

    rep = " ".join(f"r{i}" for i in range(8))
    fixture = spark.createDataFrame(
        [(0, rep + " gap1 gap2 " + rep),          # delta: self-repeat only
         (1, "plain corpus words with no repeats at all")],
        "doc_id long, text string")
    got = sorted((r["doc_id"], r["span_start"], r["span_len"])
                 for r in dedup_substring_incremental(fixture).collect())
    assert got == [(0, 1, 8), (0, 11, 8)]


def test_dedup_paragraph_reconstruction_identity(spark, sf_dir):
    """A document with zero duplicate blocks must reconstruct EXACTLY:
    clean_md5 == md5(text) and token counts unchanged — the blocks
    partition the word sequence, so the ' '-join of kept blocks is the
    original text. Dup-bearing docs must strictly shrink."""
    import pyspark.sql.functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_paragraph,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = dedup_paragraph(docs)
    joined = out.join(
        docs.select("doc_id", F.md5(F.trim("text")).alias("orig_md5")),
        "doc_id").toPandas()
    clean = joined[joined.n_dup_blocks == 0]
    dirty = joined[joined.n_dup_blocks > 0]
    assert len(clean) > 0 and len(dirty) > 0  # corpus exercises both
    assert (clean.clean_md5 == clean.orig_md5).all()
    assert (clean.n_tokens_after == clean.n_tokens_before).all()
    assert (dirty.n_tokens_after < dirty.n_tokens_before).all()


def test_dedup_paragraph_keeper_is_first_occurrence(spark):
    """Cross-doc and within-doc duplicate blocks: the lowest
    (doc_id, block_idx) copy survives, every other copy is cut."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        PARA_W,
        dedup_paragraph,
    )

    blk_a = " ".join(f"a{i}" for i in range(PARA_W))
    blk_b = " ".join(f"b{i}" for i in range(PARA_W))
    blk_c = " ".join(f"c{i}" for i in range(PARA_W))
    blk_d = " ".join(f"d{i}" for i in range(PARA_W))
    rows = [
        (0, f"{blk_a} {blk_b}"),          # first occurrences: keeps both
        (1, f"{blk_c} {blk_a}"),          # blk_a dup (cross-doc)
        (2, f"{blk_d} {blk_d}"),          # within-doc: 2nd copy cut
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in dedup_paragraph(docs).collect()}
    assert out[0]["n_dup_blocks"] == 0
    assert out[1]["n_dup_blocks"] == 1
    assert out[1]["n_tokens_after"] == PARA_W  # blk_c only
    assert out[2]["n_dup_blocks"] == 1
    assert out[2]["n_tokens_after"] == PARA_W


def test_dedup_ppjoin_equals_quadratic_baseline(spark, sf_dir):
    """Prefix-filtering completeness: PPJoin's exact-verified output
    must equal dedup_ngram_jaccard row-for-row on the real corpus —
    the same engine-equivalence bar the LSH and Arrow paths meet."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_ppjoin,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    want = sorted(map(tuple, dedup_ngram_jaccard(docs).collect()))
    got = sorted(map(tuple, dedup_ppjoin(docs).collect()))
    assert len(want) > 0
    assert got == want


def test_dedup_ppjoin_survives_universal_boilerplate_token(spark):
    """The case prefix filtering exists for: a shingle shared by EVERY
    doc (df = n) must not enter any prefix (it sorts last in the
    (df, hash) order when rarer tokens exist), yet true near-dup
    pairs are still found through their rare shingles."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_ppjoin,
    )

    boiler = "click here now"
    rows = []
    for i in range(30):
        # each doc: universal boilerplate + its own distinct tail
        rows.append((i, f"{boiler} item{i} alpha{i} beta{i} gamma{i} delta{i}"))
    # one true near-dup pair: doc 100/101 share almost everything
    base = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16 x17 x18 x19 x20"
    rows.append((100, f"{boiler} {base}"))
    rows.append((101, f"{boiler} {base}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(map(tuple, dedup_ppjoin(docs).collect()))
    want = sorted(map(tuple, dedup_ngram_jaccard(docs).collect()))
    assert got == want
    assert (100, 101, 1.0) in [(a, b, j) for a, b, j in got]


def test_dedup_ppjoin_complete_below_default_threshold(spark):
    """The prefix rational must DERIVE from the τ argument: with the
    old hard-coded 4/5 prefix, τ = 0.5 silently pruned qualifying
    pairs at candidate generation. Pairs at jaccard ≈ 0.6 must
    survive a τ = 0.5 call, matching the quadratic baseline."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_ppjoin,
    )

    rows = []
    for i in range(8):
        # pairs (2i, 2i+1): share a core, diverge on tails → mid jaccard
        core = " ".join(f"c{i}w{k}" for k in range(12))
        rows.append((2 * i, f"{core} a{i}1 a{i}2 a{i}3"))
        rows.append((2 * i + 1, f"{core} b{i}1 b{i}2 b{i}3"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    want = sorted(map(tuple, dedup_ngram_jaccard(docs, 0.5).collect()))
    got = sorted(map(tuple, dedup_ppjoin(docs, 0.5).collect()))
    assert len(want) >= 8          # the mid-similarity pairs qualify
    assert got == want             # completeness at the LOWER τ
    # and the default-τ path is unchanged
    assert (sorted(map(tuple, dedup_ppjoin(docs).collect()))
            == sorted(map(tuple, dedup_ngram_jaccard(docs).collect())))


def test_ppjoin_stats_pruning_evidence(spark, sf_dir):
    """The stats row must show the filter actually filtering —
    prefix rows a strict subset of representative token rows
    (prefix_ppm < 1e6), rep-verified <= candidates — and the clique
    accounting must be self-consistent: n_sets = sum of clique sizes
    >= n_distinct_sets, clique_pairs the exact-duplicate pair floor
    of n_verified, and n_verified equal to the join's own output
    count (the stats and the join can't disagree)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_ppjoin,
        ppjoin_stats,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    row = ppjoin_stats(docs).collect()[0]
    assert 0 < row["n_prefix_rows"] < row["n_token_rows"]
    assert row["prefix_ppm"] < 1_000_000
    assert row["n_verified_reps"] <= row["n_candidates"]
    assert row["n_sets"] >= row["n_distinct_sets"] >= 1
    assert row["max_clique"] >= 1
    assert row["clique_pairs"] <= row["n_verified"]
    assert row["n_verified"] == dedup_ppjoin(docs).count()
    if row["max_clique"] == 1:
        # no duplicate sets: expansion is the identity, so the
        # expanded count must equal rep pairs + (zero) clique pairs
        assert row["clique_pairs"] == 0
        assert row["n_verified"] == row["n_verified_reps"]


def test_containment_catches_subset_pairs_jaccard_misses(spark):
    """The operator's reason to exist: a short doc wholly embedded in
    a long one has containment 1.0 but Jaccard |A|/|B| below the 0.8
    gate. Fixture: A = 20-word doc (18 shingles), B = A + 15 novel
    words (33 shingles, one straddle shingle shared... shingles of B
    include all of A's contiguous ones), C = unrelated. Expect
    (A,B) from dedup_containment at τ=0.9 and NOT from
    dedup_ngram_jaccard at τ=0.8; plus an identical-set clique pair
    at containment 1.0."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_containment,
        dedup_ngram_jaccard,
    )

    a_words = [f"w{i}" for i in range(20)]
    b_words = a_words + [f"extra{i}" for i in range(15)]
    docs = spark.createDataFrame(
        [(1, " ".join(a_words)),
         (2, " ".join(b_words)),
         (3, " ".join(a_words)),          # clique twin of 1
         (4, " ".join(f"zz{i}" for i in range(12)))],
        "doc_id long, text string")
    cont = {(r["doc_a"], r["doc_b"]): r["containment"]
            for r in dedup_containment(docs).collect()}
    jac = {(r["doc_a"], r["doc_b"]) for r in
           dedup_ngram_jaccard(docs).collect()}
    # subset pairs caught at full containment
    assert cont[(1, 2)] == 1.0 and cont[(2, 3)] == 1.0
    assert cont[(1, 3)] == 1.0            # identical-set clique pair
    assert (1, 2) not in jac              # Jaccard 18/33 < 0.8 → missed
    assert not any(4 in p for p in cont)  # unrelated never pairs


def test_containment_two_evidence_completeness_edges(spark):
    """The r11 2-evidence extended-prefix filter demands TWO matched
    token rows per candidate pair — soundly only when ⌈τ·n_a⌉ ≥ 2.
    Pin the theorem's boundary: (a) a 1-shingle doc (c = 1: only one
    evidence row can exist) contained in a larger one must still
    pair; (b) a 2-shingle doc (c = 2: both rows required and both
    exist); (c) equivalence with the quadratic baseline on a mixed
    corpus where near-miss pairs share exactly one rare shingle —
    the noise class the filter exists to kill must be killed
    CORRECTLY (those pairs are below τ, not merely pruned)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        CONTAIN_THRESHOLD,
        dedup_containment,
        shingle_sets,
        spread,
    )
    from real_time_fraud_detection_flink_kafka_spark.functions import hashing as H
    from pyspark.sql import functions as F

    # (a) exactly 3 words -> 1 shingle; B extends A -> containment 1.0
    # (b) 4 words -> 2 shingles; D extends C
    base = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "pq rs tu vw"),
        (4, "pq rs tu vw xy zz qq"),
        # (c) noise: shares ONE shingle with doc 2's tail, plus
        # enough novel content to sit far below tau
        (5, "epsilon zeta eta TOTALLY different words here now ok"),
        (6, "unrelated content entirely of its own kind"),
    ]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["containment"]
           for r in dedup_containment(docs).collect()}
    assert got[(1, 2)] == 1.0     # c = 1 edge: single-evidence pair kept
    assert got[(3, 4)] == 1.0     # c = 2: both evidence rows exist
    # quadratic ground truth over the same shingle sets
    hs = {r["doc_id"]: set(r["hset"]) for r in
          shingle_sets(spread(docs)).select(
              "doc_id",
              F.transform("sh_set", lambda s: H.md5_int60(s)).alias("hset"))
          .collect()}
    truth = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not hs[a] or not hs[b]:
                continue
            c = round(len(hs[a] & hs[b]) / min(len(hs[a]), len(hs[b])), 6)
            if c >= CONTAIN_THRESHOLD:
                truth[(a, b)] = c
    assert got == truth


def test_containment_stats_filter_cascade(spark):
    """containment_stats' candidate cascade must be internally
    consistent: candidates ≥ verified_reps (completeness) and the
    clique accounting must balance (n_verified = expanded reps +
    clique pairs is NOT an identity here — inter-clique expansion
    multiplies — but clique_pairs lower-bounds n_verified)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        containment_stats,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))),
         (2, " ".join([f"w{i}" for i in range(20)] + ["x1", "x2"])),
         (3, " ".join(f"w{i}" for i in range(20))),   # clique twin of 1
         (4, " ".join(f"y{i}" for i in range(15)))],
        "doc_id long, text string")
    row = containment_stats(docs).collect()[0]
    assert row["n_sets"] == 4 and row["n_distinct_sets"] == 3
    assert row["max_clique"] == 2 and row["clique_pairs"] == 1
    assert row["n_candidates"] >= row["n_verified_reps"]
    assert row["n_verified"] >= row["clique_pairs"]
    # the fixture's two rep pairs (1,2),(... both subset pairs) verify
    assert row["n_verified_reps"] == 1    # rep pair (1,2) only
    assert row["n_verified"] == 3         # (1,2),(2,3) expanded + (1,3)


def test_ppjoin_clique_expansion(spark):
    """Canonicalize-first must expand duplicate-set cliques exactly:
    3 identical docs (one clique) + 1 near-dup of them + 1 unrelated
    doc. Expected pairs: C(3,2)=3 intra-clique at Jaccard 1.0 plus
    3 inter-clique (near-dup × each clique member) at the same
    rep-pair Jaccard — and the result must equal the quadratic
    baseline pair-for-pair."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_ppjoin,
        ppjoin_stats,
    )

    base = "a b c d e f g h i j k l m n o p q r s t"
    near = "a b c d e f g h i j k l m n o p q r s z"
    other = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base), (4, near), (5, other)],
        "doc_id long, text string")
    got = sorted(map(tuple, dedup_ppjoin(docs, 0.5).collect()))
    want = sorted(map(tuple, dedup_ngram_jaccard(docs, 0.5).collect()))
    assert got == want
    intra = [(a, b, j) for a, b, j in got
             if a in (1, 2, 3) and b in (1, 2, 3)]
    assert len(intra) == 3 and all(j == 1.0 for _, _, j in intra)
    inter = [(a, b, j) for a, b, j in got if 4 in (a, b)]
    assert len(inter) == 3
    assert len({j for _, _, j in inter}) == 1  # inherited rep Jaccard
    row = ppjoin_stats(docs, 0.5).collect()[0]
    assert row["n_sets"] == 5 and row["n_distinct_sets"] == 3
    assert row["max_clique"] == 3 and row["clique_pairs"] == 3
    assert row["n_verified"] == 6
    assert (row["n_verified"]
            == row["clique_pairs"] + 3 * row["n_verified_reps"])


def test_image_phash_banding_is_complete(spark, sf_dir):
    """dedup_image_phash's banded candidate join must find EVERY pair
    at hamming <= 3 — the pigeonhole guarantee (<=3 differing bits
    leave >=1 of the 4 15-bit bands equal), checked against the
    quadratic brute force over the same signatures. Also pins the
    fixture: every injected twin pairs with its original (one changed
    byte moves <=1 pooled cell -> <=2 flipped dHash bits)."""
    from itertools import combinations

    from real_time_fraud_detection_flink_kafka_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        PHASH_TWIN_MOD,
        PHASH_TWIN_OFFSET,
        dedup_image_phash,
        image_phash_signatures,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = {r["doc_id"]: r["phash"]
            for r in image_phash_signatures(docs).collect()}
    brute = {(a, b) for a, b in combinations(sorted(sigs), 2)
             if bin(sigs[a] ^ sigs[b]).count("1") <= PHASH_HAMMING_MAX}
    banded = {(r["doc_a"], r["doc_b"])
              for r in dedup_image_phash(docs).collect()}
    assert banded == brute
    twins = [d for d in sigs if d >= PHASH_TWIN_OFFSET]
    assert twins, "fixture must inject at least one twin"
    for t in twins:
        orig = t - PHASH_TWIN_OFFSET
        assert orig % PHASH_TWIN_MOD == 0
        assert bin(sigs[orig] ^ sigs[t]).count("1") <= 2, (
            "a one-byte twin must stay within 2 dHash bits")
        assert (orig, t) in banded


def test_audio_segmentation_covers_every_sample(spark, sf_dir):
    """multimodal_segment_audio's window contract: windows tile each
    audio doc with 50% hop — consecutive seg_starts differ by sr/2,
    the first starts at 0, no window starts at/past the end, the tail
    is truncated (never zero or negative), and the union of windows
    covers [0, n_samples)."""
    from collections import defaultdict

    from real_time_fraud_detection_flink_kafka_spark.operators.multimodal import (
        multimodal_segment_audio,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    rows = multimodal_segment_audio(
        load_table(spark, sf_dir, "documents")).collect()
    assert rows
    per = defaultdict(list)
    for r in rows:
        per[r["doc_id"]].append(r)
    for segs in per.values():
        segs.sort(key=lambda r: r["seg_idx"])
        sr, n = segs[0]["sr"], segs[0]["n_samples"]
        hop = sr // 2
        assert [s["seg_idx"] for s in segs] == list(range(len(segs)))
        assert segs[0]["seg_start"] == 0
        for s in segs:
            assert s["seg_start"] == s["seg_idx"] * hop < n
            assert 0 < s["seg_len"] <= sr
            assert s["seg_start"] + s["seg_len"] <= n
        # coverage: each next window starts inside the previous one
        assert all(b["seg_start"] <= a["seg_start"] + a["seg_len"]
                   for a, b in zip(segs, segs[1:]))
        assert segs[-1]["seg_start"] + segs[-1]["seg_len"] == n


def test_band_stats_invariants(spark, sf_dir):
    """simhash_stats / phash_stats internal consistency against their
    own dedup operators: one row per band; n_docs equals the
    signature count on every row; per-band candidate contributions
    bound the global distinct-candidate count from above (a pair can
    collide in several bands) and from below via the densest bucket;
    n_verified equals the dedup operator's emitted pair count."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        SIMHASH_BANDS,
        dedup_simhash,
        simhash_signatures,
        simhash_stats,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.multimodal import (
        PHASH_BANDS,
        dedup_image_phash,
        image_phash_signatures,
        phash_stats,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    for stats_fn, sig_fn, dedup_fn, n_bands in (
            (simhash_stats, simhash_signatures, dedup_simhash,
             SIMHASH_BANDS),
            (phash_stats, image_phash_signatures, dedup_image_phash,
             PHASH_BANDS)):
        rows = sorted(stats_fn(docs).collect(), key=lambda r: r["band_idx"])
        assert [r["band_idx"] for r in rows] == list(range(n_bands))
        n_docs = sig_fn(docs).count()
        assert all(r["n_docs"] == n_docs for r in rows)
        for r in rows:
            assert 1 <= r["n_buckets"] <= min(n_docs, 1 << 15)
            assert 1 <= r["max_occ"] <= n_docs
            assert (r["band_cand_pairs"]
                    >= r["max_occ"] * (r["max_occ"] - 1) // 2)
        total_band_pairs = sum(r["band_cand_pairs"] for r in rows)
        n_cand = rows[0]["n_candidates"]
        assert all(r["n_candidates"] == n_cand for r in rows)
        assert (max(r["band_cand_pairs"] for r in rows)
                <= n_cand <= total_band_pairs)
        n_ver = rows[0]["n_verified"]
        assert all(r["n_verified"] == n_ver for r in rows)
        assert n_ver <= n_cand
        assert n_ver == dedup_fn(docs).count()


def test_minhash_band_stats_invariants(spark, sf_dir):
    """minhash_band_stats internal consistency against the LSH
    pipeline's own stages: one row per band; n_docs equals the
    distinct-text count (the md5 collapse the pipeline shuffles);
    n_candidates equals lsh_candidates' distinct-pair count over the
    same signature relation; per-band Σ C(occ,2) bounds the global
    distinct count from above (a pair can collide in several bands)
    and the densest band from below; verified ≤ candidates."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        lsh_candidates,
        minhash_band_stats,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(minhash_band_stats(docs).collect(),
                  key=lambda r: r["band_idx"])
    assert [r["band_idx"] for r in rows] == list(range(H.N_BANDS))
    n_reps = docs.select(F.md5("text")).distinct().count()
    assert all(r["n_docs"] == n_reps for r in rows)
    reps = (docs.groupBy(F.md5("text").alias("m"))
                .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    sig = minhash_signatures(docs.join(F.broadcast(reps), "doc_id"))
    n_cand = lsh_candidates(sig).count()
    assert all(r["n_candidates"] == n_cand for r in rows)
    total_band_pairs = sum(r["band_cand_pairs"] for r in rows)
    assert (max(r["band_cand_pairs"] for r in rows)
            <= n_cand <= total_band_pairs)
    for r in rows:
        assert 1 <= r["max_occ"] <= n_reps
        assert r["band_cand_pairs"] >= r["max_occ"] * (r["max_occ"] - 1) // 2
        assert 0 <= r["n_verified_reps"] <= r["n_candidates"]
