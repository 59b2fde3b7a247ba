"""State TTL parity (Flink StateTtlConfig, fraud_detection.py:56-61):
with the processing-time timeout armed, idle card state must be
EVICTED — a later event that would have tripped IMPOSSIBLE_TRAVEL
against remembered state sees a clean slate instead.

Also: the detector runs identically on the RocksDB state store (the
reference's recommended production backend)."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig

SEC_US = 1_000_000


def _write_chunk(path: str, rows: list[tuple], mtime: int) -> None:
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    pdf.to_parquet(path)
    os.utime(path, (mtime, mtime))


def test_ttl_evicts_idle_state(spark, tmp_path):
    """card 0: event at NY, then (after TTL expires in processing
    time) an event at CA only 60 event-time seconds later. Without
    TTL the second event is IMPOSSIBLE_TRAVEL (+50); with TTL the
    state is gone → score 0."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.streaming.fraud_stream import (
        detect_stream,
        tx_stream_from_events,
    )

    cfg = RuleConfig(state_ttl_ms=3_000)  # 3 s TTL for the test
    chunk_dir = str(tmp_path / "ttl_chunks")
    os.makedirs(chunk_dir)
    base_us = 1_704_067_200_000_000
    # props k=0 → NY; k=1 → CA (LOCATIONS order NY,CA,TX,FL,IL)
    _write_chunk(os.path.join(chunk_dir, "c0.parquet"),
                 [(1, base_us, 0, "purchase", 10.0, '{"k": 0}')], 1000)

    schema = ("event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double, props string")
    stream = (spark.readStream.schema(schema).parquet(chunk_dir)
              .withColumn("ts", F.timestamp_micros(F.col("ts"))))
    out = detect_stream(tx_stream_from_events(stream), cfg, with_ttl=True)
    q = (out.writeStream.format("memory").queryName("ttl_test")
         .outputMode("append").start())
    try:
        deadline = time.time() + 60
        while spark.table("ttl_test").count() < 1 and time.time() < deadline:
            time.sleep(0.5)
        assert spark.table("ttl_test").count() == 1

        # idle past the TTL so the timeout fires and evicts card_0
        time.sleep(8)

        _write_chunk(os.path.join(chunk_dir, "c1.parquet"),
                     [(2, base_us + 60 * SEC_US, 0, "purchase", 10.0, '{"k": 1}')], 2000)
        while spark.table("ttl_test").count() < 2 and time.time() < deadline:
            time.sleep(0.5)
        rows = {r.event_id: r for r in spark.table("ttl_test").collect()}
    finally:
        q.stop()
        q.awaitTermination()

    assert rows[2].location == "CA"
    assert rows[2].score == 0, "state must be TTL-evicted → no IMPOSSIBLE_TRAVEL"
    assert rows[2].velocity_cnt == 1


def test_detector_on_rocksdb_state_store(spark, sf_dir):
    """Full drain on the RocksDB provider equals the batch analog.
    (providerClass is a runtime SQL conf read at query start.)"""
    from real_time_fraud_detection_flink_kafka_spark.operators.fraud import fraud_scores
    from real_time_fraud_detection_flink_kafka_spark.session import ROCKSDB_PROVIDER
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
    from real_time_fraud_detection_flink_kafka_spark.streaming.fraud_stream import (
        run_stream_over_events_dir,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        cfg = RuleConfig.for_events_table()
        got = run_stream_over_events_dir(spark, sf_dir, cfg,
                                         query_name="rocks_t").toPandas()
        want = fraud_scores(load_table(spark, sf_dir, "events"), cfg).toPandas()
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_dedup_durable_checkpoint_on_rocksdb(spark, sf_dir, tmp_path):
    """The durable-checkpoint dedup drain (parquet sink + offsets) on
    the RocksDB state store: same rows as the batch dedup, AND the
    provider is PROVEN engaged — the stateful operator must report
    rocksdb* custom metrics, which the default HDFS-backed map never
    emits. This is the 'RocksDB-ready' claim as a test: the
    production state backend runs the exactly-once file-source drain,
    not just the conf wiring."""
    from real_time_fraud_detection_flink_kafka_spark.session import ROCKSDB_PROVIDER
    from real_time_fraud_detection_flink_kafka_spark.sources.files import (
        _normalize_ns,
        load_table,
        raw_events_schema,
    )
    from real_time_fraud_detection_flink_kafka_spark.streaming.dedup_stream import (
        dedup_events_stream,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        raw_schema = raw_events_schema(spark, sf_dir)
        stream = (spark.readStream.schema(raw_schema)
                  .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
        stream = _normalize_ns(stream, ["ts"])
        q = (dedup_events_stream(stream)
             .writeStream.format("parquet")
             .option("path", str(tmp_path / "out"))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        metrics = {k for p in q.recentProgress
                   for op in p.get("stateOperators", [])
                   for k in op.get("customMetrics", {})}
        assert any(k.startswith("rocksdb") for k in metrics), metrics

        got = spark.read.parquet(str(tmp_path / "out")).toPandas()
        want = dedup_events_stream(
            load_table(spark, sf_dir, "events")).toPandas()
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
