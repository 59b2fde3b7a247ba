"""Streaming corpus twins: update-mode drain semantics and the state
bound the scale-contract docstrings promise (streaming/corpus.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
from real_time_fraud_detection_flink_kafka_spark.streaming.corpus import (
    run_corpus_dedup_stream_update,
)


def test_update_mode_dedup_equals_batch_and_bounds_state(spark, sf_dir):
    """The update-mode drain (after upsert compaction) must equal the
    batch exact-dedup relation, and the streaming state must hold
    EXACTLY one row per distinct text hash — the documented bound
    (complete and update mode share state size; update mode fixes the
    per-trigger OUTPUT volume, TTL/compaction would bound state in a
    continuous deployment)."""
    progress: list = []
    out = run_corpus_dedup_stream_update(spark, sf_dir,
                                         query_name="corpus_dedup_upd_test",
                                         progress_out=progress)
    docs = load_table(spark, sf_dir, "documents")
    batch = (docs.groupBy(F.md5("text").alias("text_md5"))
             .agg(F.min("doc_id").alias("canonical_doc_id"),
                  F.count(F.lit(1)).alias("n_copies")))
    n_distinct = batch.count()

    got = {r["text_md5"]: (r["canonical_doc_id"], r["n_copies"])
           for r in out.collect()}
    want = {r["text_md5"]: (r["canonical_doc_id"], r["n_copies"])
            for r in batch.collect()}
    assert got == want

    assert progress, "no final progress captured"
    state_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
    assert state_rows == n_distinct, (
        f"state holds {state_rows} rows, expected one per distinct "
        f"text hash ({n_distinct})")


def test_asof_stream_is_stateless_and_equals_batch(spark, sf_dir):
    """The as-of streaming twin must carry ZERO state rows — the
    point-in-time index is on the static side and every stream-side
    op is a projection, so the drain's progress reports no stateful
    operators; the drained rows equal the batch window formulation."""
    from real_time_fraud_detection_flink_kafka_spark.operators.asof import (
        asof_event_order,
    )
    from real_time_fraud_detection_flink_kafka_spark.streaming.dedup_stream import (
        run_asof_stream,
    )

    progress: list = []
    out = run_asof_stream(spark, sf_dir, query_name="asof_stream_test",
                          progress_out=progress)
    batch = asof_event_order(load_table(spark, sf_dir, "events"),
                             load_table(spark, sf_dir, "orders"))
    got = sorted(map(tuple, out.collect()), key=lambda t: t[0])
    want = sorted(map(tuple, batch.collect()), key=lambda t: t[0])
    assert got == want
    assert progress and not progress[-1]["stateOperators"], (
        progress[-1].get("stateOperators"))


def test_scd2_stream_equals_batch_closed_rows(spark, sf_dir):
    """The drained stateful SCD2 fold must equal the batch operator's
    CLOSED version set row-for-row (the open is_current rows live in
    the state store by contract), and every user with >= 2 versions
    must contribute exactly versions 1..n-1."""
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        scd2_user_segments,
    )
    from real_time_fraud_detection_flink_kafka_spark.streaming.scd2_stream import (
        run_scd2_stream,
    )

    got = sorted(map(tuple, run_scd2_stream(
        spark, sf_dir, query_name="scd2_stream_test").collect()))
    batch = scd2_user_segments(load_table(spark, sf_dir, "events"))
    want = sorted(map(tuple, batch.where(~F.col("is_current"))
                  .select("user_id", "version", "segment",
                          "valid_from_us", "valid_to_us", "n_events")
                  .collect()))
    assert got == want and len(got) > 0
    n_users_closed = len({t[0] for t in got})
    n_open = batch.where(F.col("is_current")).count()
    n_users = batch.select("user_id").distinct().count()
    assert n_open == n_users  # exactly one open version per user
    assert n_users_closed <= n_users


def test_beam_serve_stream_equals_batch(spark, sf_dir):
    """The query-stream serving drain must equal batch ann_beam_topk
    row-for-row: the index is static, the walk is per-query
    deterministic, so batching cannot change any answer."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        ann_beam_topk,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
    from real_time_fraud_detection_flink_kafka_spark.streaming.corpus import (
        run_beam_serve_stream,
    )

    got = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cos_sim"])
        for r in run_beam_serve_stream(spark, sf_dir,
                                       "beam_serve_eqtest").collect())
    want = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cos_sim"])
        for r in ann_beam_topk(load_table(spark, sf_dir,
                                          "embeddings")).collect())
    assert got == want and len(got) > 0


def test_beam_pq_serve_stream_equals_batch(spark, sf_dir):
    """The DiskANN serving drain must equal batch ann_beam_pq_topk
    row-for-row: the compressed navigation index is static and
    persisted across batches, walk scores are fixed-point integers,
    and the walk is per-query deterministic — batching cannot change
    any answer."""
    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        ann_beam_pq_topk,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
    from real_time_fraud_detection_flink_kafka_spark.streaming.corpus import (
        run_beam_pq_serve_stream,
    )

    got = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cos_sim"])
        for r in run_beam_pq_serve_stream(spark, sf_dir,
                                          "beam_pq_serve_eqtest").collect())
    want = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cos_sim"])
        for r in ann_beam_pq_topk(load_table(spark, sf_dir,
                                             "embeddings")).collect())
    assert got == want and len(got) > 0


def test_weighted_sample_stream_equals_batch_and_merges(spark, sf_dir):
    """The streaming A-ES reservoir drain must equal batch
    weighted_sample_es row-for-row, and the mergeability identity it
    rides on — topk(A ∪ B) = topk(topk(A) ∪ topk(B)) — must hold on
    an explicit 3-way split of the corpus (what multi-batch intake
    does to the data)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        es_keyed,
        es_ranked,
        es_topk,
        weighted_sample_es,
    )
    from real_time_fraud_detection_flink_kafka_spark.streaming.corpus import (
        run_weighted_sample_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    want = sorted(
        (r["doc_id"], r["w_tokens"], r["rnk"], r["es_key"])
        for r in weighted_sample_es(docs).collect())
    got = sorted(
        (r["doc_id"], r["w_tokens"], r["rnk"], r["es_key"])
        for r in run_weighted_sample_stream(
            spark, sf_dir, "weighted_sample_eqtest").collect())
    assert got == want and len(got) > 0
    # mergeability on an explicit split (the multi-batch shape)
    keyed = es_keyed(docs)
    parts = [keyed.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
             for i in range(3)]
    merged = es_topk(es_topk(parts[0])
                     .unionByName(es_topk(parts[1]))
                     .unionByName(es_topk(parts[2])))
    via_parts = sorted(
        (r["doc_id"], r["w_tokens"], r["rnk"], r["es_key"])
        for r in es_ranked(merged).collect())
    assert via_parts == want


def test_phash_dedup_stream_equals_batch(spark, sf_dir):
    """The perceptual-dedup intake twin drains to exactly the batch
    delta-vs-corpus verdicts (same contract, shared oracle): one row
    per delta image, identical (status, n_same_hash, n_near). The
    fixture's injected twins are corpus-side by construction, so the
    increment must FIND at least one near/same hit and also contain
    genuinely new images."""
    from real_time_fraud_detection_flink_kafka_spark.operators.multimodal import (
        dedup_phash_incremental,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
    from real_time_fraud_detection_flink_kafka_spark.streaming.corpus import (
        run_phash_dedup_stream,
    )

    batch = {r["doc_id"]: (r["status"], r["n_same_hash"], r["n_near"])
             for r in dedup_phash_incremental(
                 load_table(spark, sf_dir, "documents")).collect()}
    drained = {r["doc_id"]: (r["status"], r["n_same_hash"], r["n_near"])
               for r in run_phash_dedup_stream(
                   spark, sf_dir, query_name="phash_dedup_t").collect()}
    assert drained == batch
    statuses = {s for s, _, _ in batch.values()}
    assert "new" in statuses
    assert statuses & {"near_dup", "same_hash"}
