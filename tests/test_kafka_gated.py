"""Kafka end-to-end tests, gated on a real broker.

This container has no broker (the reference runs one via
docker-compose), so these skip cleanly here. Point
``KAFKA_BOOTSTRAP`` at a broker (e.g. ``localhost:9092``) and they
run the REAL paths: produce the events table in wire format to a
topic, stream it back through the shared from_json contract, and run
the stateful detector over the Kafka source — the reference's full
producer → broker → detector loop.
"""

from __future__ import annotations

import os
import uuid

import pytest

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.sources import kafka as K
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table
from real_time_fraud_detection_flink_kafka_spark.streaming.fraud_stream import (
    detect_stream,
    tx_stream_from_events,
)

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="no Kafka broker here: set KAFKA_BOOTSTRAP=host:port")


def _produce_events(spark, sf_dir: str, topic: str, n: int) -> int:
    events = load_table(spark, sf_dir, "events").limit(n)
    wire = K.events_to_wire(events)
    (wire.write.format("kafka")
         .option("kafka.bootstrap.servers", BOOTSTRAP)
         .option("topic", topic)
         .save())
    return wire.count()


def test_wire_roundtrip_through_broker(spark, sf_dir):
    topic = f"events_rt_{uuid.uuid4().hex[:8]}"
    n = _produce_events(spark, sf_dir, topic, 200)
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", BOOTSTRAP)
           .option("subscribe", topic)
           .option("startingOffsets", "earliest")
           .load())
    name = f"kafka_rt_{uuid.uuid4().hex[:8]}"
    q = (K.events_from_wire(raw)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table(name)
    assert got.count() == n
    assert {f.name for f in got.schema} == {
        "event_id", "user_id", "event_type", "value", "ts_us"}


def test_detector_over_kafka_source(spark, sf_dir):
    """Full reference loop: producer wire → broker → keyed stateful
    detector → memory sink; output must cover every produced event."""
    from pyspark.sql import functions as F

    topic = f"events_det_{uuid.uuid4().hex[:8]}"
    n = _produce_events(spark, sf_dir, topic, 500)
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", BOOTSTRAP)
           .option("subscribe", topic)
           .option("startingOffsets", "earliest")
           .load())
    events = K.events_from_wire(raw).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))).withColumn(
        "props", F.lit('{"k": 0}'))
    out = detect_stream(tx_stream_from_events(events), RuleConfig(),
                        with_ttl=False)
    name = f"kafka_det_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.table(name).count() == n
