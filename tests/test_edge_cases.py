"""Targeted regressions for the round-2 ADVICE edge cases:

(a) identical docs shorter than SHINGLE_N words must NOT yield
    intra-cluster 1.0 pairs from dedup_minhash_lsh (the exact-Jaccard
    baseline emits nothing for empty shingle sets);
(b) the streaming detector's velocity count must use RANGE-frame tie
    semantics — events sharing a ts_us are peers and all count toward
    each other — matching the batch oracle;
(c) stream_dedup_events must agree with an order-insensitive DISTINCT
    oracle when the input carries byte-identical redelivered rows.
"""

from __future__ import annotations

import os

import pandas as pd

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from real_time_fraud_detection_flink_kafka_spark.operators.fraud import fraud_scores
from real_time_fraud_detection_flink_kafka_spark.streaming.dedup_stream import (
    dedup_events_stream,
)
from real_time_fraud_detection_flink_kafka_spark.streaming.fraud_stream import (
    detect_stream,
    tx_stream_from_events,
)

CFG = RuleConfig.for_events_table()

EVENTS_SCHEMA = ("event_id bigint, ts bigint, user_id bigint, "
                 "event_type string, value double, props string")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_minhash_short_docs_emit_no_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"),            # < SHINGLE_N words
         (3, "a b c d e f"), (4, "a b c d e f"),      # shingled dup pair
         (5, "totally different words entirely here now")],
        "doc_id bigint, text string")
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup_minhash_lsh(docs).collect()}
    exact = {(r.doc_a, r.doc_b): r.jaccard
             for r in dedup_ngram_jaccard(docs).collect()}
    assert (1, 2) not in got, "short identical docs must not pair"
    assert got == exact == {(3, 4): 1.0}


def _run_detector_stream(spark, pdf: pd.DataFrame, tmp_path, name: str):
    from pyspark.sql import functions as F

    chunk_dir = str(tmp_path / "events")
    os.makedirs(chunk_dir, exist_ok=True)
    pdf.to_parquet(os.path.join(chunk_dir, "chunk_0.parquet"))
    stream = (spark.readStream.schema(EVENTS_SCHEMA).parquet(chunk_dir)
              .withColumn("ts", F.timestamp_micros(F.col("ts"))))
    out = detect_stream(tx_stream_from_events(stream), CFG, with_ttl=False)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def test_detector_equal_ts_velocity_matches_batch(spark, tmp_path):
    # 3 purchases on one card at the SAME microsecond: the batch RANGE
    # frame gives every peer velocity_cnt=3 (all flagged RAPID); a
    # naive sequential count would emit 1, 2, 3.
    t0 = 1_700_000_000_000_000
    rows = [
        (1, t0, 7, "purchase", 10.0, '{"k": 1}'),
        (2, t0, 7, "purchase", 20.0, '{"k": 1}'),
        (3, t0, 7, "purchase", 30.0, '{"k": 1}'),
        (4, t0 + 7 * 3600 * 1_000_000, 7, "purchase", 40.0, '{"k": 1}'),
        (5, t0 + 1_000_000, 9, "purchase", 15.0, '{"k": 2}'),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    got = _norm(_run_detector_stream(spark, pdf, tmp_path,
                                     "t_equal_ts").toPandas())
    from pyspark.sql import functions as F
    events = (spark.createDataFrame(pdf, EVENTS_SCHEMA)
              .withColumn("ts", F.timestamp_micros(F.col("ts"))))
    want = _norm(fraud_scores(events, CFG).toPandas())
    assert (got.set_index("event_id")["velocity_cnt"].loc[[1, 2, 3]] == 3).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_dedup_matches_distinct_on_redelivery(spark, tmp_path):
    from pyspark.sql import functions as F

    t0 = 1_700_000_000_000_000
    row = (1, t0, 5, "click", 1.5, "{}")
    other = (2, t0 + 1_000_000, 6, "purchase", 9.0, "{}")
    chunk_dir = str(tmp_path / "dup_events")
    os.makedirs(chunk_dir)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    # identical row redelivered in a LATER file (at-least-once source)
    pd.DataFrame([row, other], columns=cols).to_parquet(
        os.path.join(chunk_dir, "a.parquet"))
    pd.DataFrame([row], columns=cols).to_parquet(
        os.path.join(chunk_dir, "b.parquet"))
    os.utime(os.path.join(chunk_dir, "a.parquet"), (1000, 1000))
    os.utime(os.path.join(chunk_dir, "b.parquet"), (1001, 1001))

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(chunk_dir)
              .withColumn("ts", F.timestamp_micros(F.col("ts"))))
    out = dedup_events_stream(stream)
    q = (out.writeStream.format("memory").queryName("t_dedup_redeliver")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = _norm(spark.table("t_dedup_redeliver").toPandas())

    want = pd.DataFrame(
        [(1, 5, "click", 1.5, t0), (2, 6, "purchase", 9.0, t0 + 1_000_000)],
        columns=["event_id", "user_id", "event_type", "value", "ts_us"])
    pd.testing.assert_frame_equal(got, _norm(want), check_dtype=False)


def test_winnow_short_docs_excluded_and_guarantee_holds(spark):
    """(r6) Docs shorter than WINNOW_K tokens have no k-gram and must
    vanish from the pair graph; and the winnowing guarantee — two
    docs sharing a run of w+k-1 tokens share ≥1 selected hash —
    must hold on a constructed containment case."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        dedup_winnow,
    )

    shared_run = " ".join(f"tok{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    rows = [
        (0, "short doc"),                               # < k tokens
        (1, shared_run + " aaa bbb ccc ddd eee fff"),   # contains the run
        (2, "xxx yyy zzz www vvv uuu " + shared_run),   # contains it too
        (3, " ".join(f"other{i}" for i in range(30))),  # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup_winnow(docs, min_shared=1).toPandas()
    assert 0 not in set(pairs.doc_a) | set(pairs.doc_b)
    assert ((pairs.doc_a == 1) & (pairs.doc_b == 2)).any(), (
        "winnowing guarantee violated: shared w+k-1 run yielded no pair")


def test_quality_gate_uniform_quality_keeps_all(spark):
    """(r6) When every doc has identical quality the threshold equals
    that value and the gate must keep ALL docs (>=, not >)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        quality_percentile_gate,
    )

    text = " ".join(f"w{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(i, text, "en", "src0", len(text)) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars int")
    out = quality_percentile_gate(docs).toPandas()
    assert len(out) == 8
    assert out.quality.nunique() == 1
    assert (out.q_threshold == out.quality).all()


def test_mix_rebalance_absent_target_source_is_safe(spark):
    """(r6) A target source with no documents must not break the
    derivation (it simply never binds), and docs from unlisted
    sources are excluded."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        mix_rebalance,
    )

    text = " ".join(f"w{i}" for i in range(40))
    rows = ([(i, text, "en", "src0", 1) for i in range(10)]
            + [(100 + i, text, "en", "unlisted", 1) for i in range(5)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    out = mix_rebalance(docs, {"src0": 500_000, "src1": 500_000}).toPandas()
    assert set(out.source) <= {"src0"}
    assert len(out) > 0


def test_histogram_quantile_within_one_bin_of_exact(spark, sf_dir):
    """(r6) The fixed-bin sketch's error contract: for every q the
    estimated quantile (qualifying bin's upper edge) must sit within
    one bin width of the exact discrete quantile — est >= exact (the
    ceil(q·n)-th value lies inside the bin whose upper edge we
    return) and est - exact <= width."""
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        HIST_BINS,
        HIST_QS,
        value_histogram_quantiles,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    events = load_table(spark, sf_dir, "events")
    est = {r["q"]: r["est"]
           for r in value_histogram_quantiles(events).collect()}
    vals = sorted(v["value"] for v in events.select("value").collect())
    lo, hi, n = vals[0], vals[-1], len(vals)
    width = (hi - lo) / HIST_BINS
    import math
    for q in HIST_QS:
        exact = vals[max(1, math.ceil(q * n)) - 1]
        assert est[q] >= exact - 1e-9, (q, est[q], exact)
        assert est[q] - exact <= width + 1e-9, (q, est[q], exact, width)


def test_skyline_matches_bruteforce_with_ties(spark):
    """(r6) Grid-pruned skyline vs in-Python brute force on seeded
    random points, including exact duplicates (neither dominates the
    other — both must be kept) and same-price / same-size ties."""
    import random

    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        skyline_parts,
    )

    rng = random.Random(11)
    pts = [(k, round(rng.uniform(1.0, 100.0), 2), rng.randrange(1, 50))
           for k in range(200)]
    pts.append((200, pts[0][1], pts[0][2]))      # exact duplicate
    pts.append((201, pts[1][1], pts[1][2] + 1))  # same price, bigger size
    pts.append((202, pts[2][1] + 0.01, pts[2][2]))  # same size, pricier
    part = spark.createDataFrame(
        [(k, f"name{k}", "B", "T", s, p) for k, p, s in pts],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double")
    got = {r.p_partkey for r in skyline_parts(part).collect()}
    want = set()
    for k, p, s in pts:
        dominated = any(
            q_p <= p and q_s >= s and (q_p < p or q_s > s)
            for q_k, q_p, q_s in pts if q_k != k)
        if not dominated:
            want.add(k)
    assert got == want


def test_tfidf_ubiquitous_term_zero_unique_term_first(spark):
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        tfidf_topk,
    )
    docs = spark.createDataFrame(
        [(1, "common alpha alpha"), (2, "common beta"), (3, "common gamma")],
        "doc_id bigint, text string")
    out = tfidf_topk(docs, k=3).toPandas()
    # idf of a term in every doc is ln(1) = 0 → tfidf exactly 0
    common = out[out.word == "common"]
    assert (common.tfidf == 0.0).all() and (common.df == 3).all()
    # a doc's unique term beats the ubiquitous one (rank 1)
    top = out[out.rnk == 1].set_index("doc_id").word.to_dict()
    assert top == {1: "alpha", 2: "beta", 3: "gamma"}


def test_cohort_retention_offset0_full_and_bounded(spark, sf_dir):
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        cohort_retention,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
    out = cohort_retention(load_table(spark, sf_dir, "orders")).toPandas()
    zero = out[out.month_offset == 0]
    # every cohort has its offset-0 row, fully retained by construction
    assert len(zero) == out.cohort_month.nunique()
    assert (zero.n_active == zero.cohort_size).all()
    assert (zero.retention_rate == 1.0).all()
    # later offsets never exceed the cohort and rates stay in (0, 1]
    assert (out.n_active <= out.cohort_size).all()
    assert ((out.retention_rate > 0) & (out.retention_rate <= 1.0)).all()


def test_pq_rerank_dominates_adc_and_matches_exact_on_shortlist(spark, sf_dir):
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        ann_pq_recall,
        ann_pq_rerank,
        ann_topk,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    rec = ann_pq_recall(emb).toPandas()
    # exact re-rank of a superset shortlist can never do worse than
    # ranking in the compressed domain
    assert (rec.n_rerank >= rec.n_adc).all()
    assert (rec.recall_rerank >= rec.recall_adc).all()
    # rerank rows carry TRUE cosine: every (query, neighbor) it emits
    # that the exact top-k also emits must agree on cos_sim exactly
    rr = ann_pq_rerank(emb).toPandas()[["query_id", "neighbor_id", "cos_sim"]]
    ex = ann_topk(emb).toPandas()[["query_id", "neighbor_id", "cos_sim"]]
    m = rr.merge(ex, on=["query_id", "neighbor_id"], suffixes=("_rr", "_ex"))
    assert len(m) > 0 and (m.cos_sim_rr == m.cos_sim_ex).all()


def test_pq_tiny_corpus_fewer_seeds_than_codes(spark):
    """A corpus smaller than PQ_K seeds fewer codes per subspace; the
    argmin and encode must still work (and agree between the stateful
    groupBy path and the row-local array_min path) — the empty-cell /
    short-seed edge every quantizer hits on a cold-start corpus."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        DIM,
        PQ_M,
        _pq_assign,
        _subvectors,
        pq_codebooks_rel,
        pq_encode,
    )
    rows = [(i, [float((i * 7 + j) % 5) - 2.0 for j in range(DIM)])
            for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = pq_codebooks_rel(emb)
    cb_rows = cb.collect()
    # at most 3 seeds per subspace survive, none beyond the corpus
    assert 0 < len(cb_rows) <= 3 * PQ_M
    assert all(r.code < 3 for r in cb_rows)
    # stateful and row-local encode agree exactly
    grouped = {(r.vec_id, r.sub): r.code
               for r in _pq_assign(_subvectors(emb), cb).collect()}
    stateless = {(r.vec_id, r.sub): r.code for r in pq_encode(emb, cb=cb).collect()}
    assert stateless == grouped and len(stateless) == 3 * PQ_M


def test_new_text_ops_tolerate_degenerate_docs(spark):
    """Single-word, whitespace-padded and tiny docs through the r8
    text ops: none may throw, and each op's documented exclusion rule
    must hold (short docs emit no spans / no pairs / no blocks cut;
    entropy of a 1-word doc is 0 with norm 0; gopher flags still
    produced for every doc)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_paragraph,
        dedup_ppjoin,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        contrastive_pairs,
        span_corruption,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        gopher_rules,
        word_entropy,
    )

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "  padded  "), (3, "a b"),
         (4, "one two three four five")],
        "doc_id bigint, text string")
    g = gopher_rules(docs).toPandas()
    assert len(g) == 4 and not g.pass_all.any()
    e = {r["doc_id"]: r for r in word_entropy(docs).collect()}
    assert e[1]["entropy"] == 0.0 and e[1]["norm_entropy"] == 0.0
    assert e[2]["n_words"] == 1  # trim handles the padding
    assert span_corruption(docs).count() == 0        # all < 20 words
    assert contrastive_pairs(docs).count() == 0      # all < 32 words
    p = dedup_paragraph(docs).toPandas()
    assert len(p) == 4 and (p.n_dup_blocks == 0).all()
    assert (p.n_blocks == 1).all()                   # every doc: one short block
    assert dedup_ppjoin(docs).count() == 0           # no shingled dups
