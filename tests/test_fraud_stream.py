"""Streaming correctness: the stateful Structured-Streaming detector
must equal the batch window-function analog row-for-row (single batch
AND multi-batch with time-ordered chunks), and the alert router's
side-output analogs must match the batch side outputs."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.operators.fraud import fraud_alerts, fraud_scores
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
from real_time_fraud_detection_flink_kafka_spark.streaming.fraud_stream import (
    detect_stream,
    run_stream_over_events_dir,
    tx_stream_from_events,
)

CFG = RuleConfig.for_events_table()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_stream_equals_batch_single_batch(spark, sf_dir):
    got = _norm(run_stream_over_events_dir(spark, sf_dir, CFG,
                                           query_name="t_single").toPandas())
    want = _norm(fraud_scores(load_table(spark, sf_dir, "events"), CFG).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_equals_batch_multi_batch(spark, sf_dir, tmp_path):
    """Chunk events into 3 time-ordered files → 3 micro-batches;
    keyed state must carry across batches."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    pdf = events.toPandas().sort_values("ts").reset_index(drop=True)
    # epoch µs (dodges parquet ts-unit mismatch; toPandas may yield ns)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    n = len(pdf)
    chunk_dir = str(tmp_path / "chunks")
    os.makedirs(chunk_dir)
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        chunk = pdf.iloc[lo:lo + (n + 2) // 3]
        p = os.path.join(chunk_dir, f"chunk_{i}.parquet")
        chunk.to_parquet(p)
        os.utime(p, (1000 + i, 1000 + i))  # deterministic file order

    schema = "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(chunk_dir)
              .withColumn("ts", F.timestamp_micros(F.col("ts"))))
    out = detect_stream(tx_stream_from_events(stream), CFG, with_ttl=False)
    q = (out.writeStream.format("memory").queryName("t_multi")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = _norm(spark.table("t_multi").toPandas())
    want = _norm(fraud_scores(events, CFG).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_alert_router_side_outputs(spark, sf_dir, tmp_path):
    from real_time_fraud_detection_flink_kafka_spark.streaming.router import run_alert_router

    sinks = run_alert_router(spark, sf_dir, CFG, str(tmp_path / "router"))
    events = load_table(spark, sf_dir, "events")
    n_total = events.count()
    want_alerts = _norm(fraud_alerts(events, CFG).toPandas())
    got_alerts = _norm(sinks["fraud_alerts"].toPandas())
    pd.testing.assert_frame_equal(got_alerts, want_alerts, check_dtype=False)
    assert sinks["fraud_alerts"].count() + sinks["legit"].count() == n_total
    assert sinks["risk_audit"].count() == n_total


def test_generator_determinism_and_domains(spark):
    from real_time_fraud_detection_flink_kafka_spark.sources.generator import (
        CUSTOMER_CARDS,
        generate_transactions,
    )

    a = generate_transactions(spark, 2000).toPandas()
    b = generate_transactions(spark, 2000).toPandas()
    pd.testing.assert_frame_equal(a, b)  # deterministic
    assert set(a["card_id"]) <= {k for _, k in CUSTOMER_CARDS}
    assert set(a["event_type"]) <= {"NORMAL", "CARD_TESTING", "VELOCITY", "IMPOSSIBLE_TRAVEL"}
    mix = a["event_type"].value_counts(normalize=True)
    assert 0.7 < mix["NORMAL"] < 0.9  # 80% nominal
    assert a["amount"].between(1, 300).all()
    ct = a[a["event_type"] == "CARD_TESTING"]["amount"]
    assert ct.between(1, 5).all()


def test_kafka_json_contract(spark):
    """from_json round-trip of a producer-shaped payload (no broker
    needed: the value-parsing contract is what matters)."""
    import json

    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.sources.kafka import parse_transaction_json

    payload = {
        "schema_version": "1.0", "event_id": "evt-1", "transaction_id": "t1",
        "customer_id": "Alice", "card_id": "card_1", "merchant_id": "amazon",
        "merchant_category": "ECOM", "amount": 42.5, "currency": "USD",
        "location": "NY", "ip_address": "1.2.3.4", "event_type": "NORMAL",
        "timestamp": "2024-01-01T00:00:00Z",
    }
    df = spark.createDataFrame([(json.dumps(payload),)], "value string")
    row = df.select(parse_transaction_json(F.col("value")).alias("tx")).select("tx.*").collect()[0]
    assert row.card_id == "card_1" and row.amount == 42.5
    assert row.merchant_category == "ECOM" and row.timestamp == "2024-01-01T00:00:00Z"
