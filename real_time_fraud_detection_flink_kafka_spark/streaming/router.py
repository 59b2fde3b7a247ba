"""Stream routing — the analog of the reference's side outputs
(/root/reference/flink/fraud_detector_TAG.py:34-36, 134-144):
FRAUD_ALERT_TAG (score >= threshold), RISK_AUDIT_TAG (every event),
plus the fraud/legit split prints of fraud_detection.py:193-202.

Implemented as a foreachBatch router: one pass over each micro-batch
fans out to three sinks. foreachBatch gives exactly-once-per-batch
semantics with idempotent (overwrite-by-batch-id) or transactional
sinks at scale; here the sinks are parquet directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.sources.files import raw_events_schema

ALERT_COLS = ["event_id", "card_id", "amount", "location", "score",
              "severity", "reasons", "ts_us"]
AUDIT_COLS = ["card_id", "score", "reasons", "ts_us"]


def make_router(out_dir: str, cfg: RuleConfig):
    """foreachBatch function splitting detector output into
    fraud-alerts / legit / risk-audit parquet sinks."""

    def route(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            (batch.where(F.col("score") >= cfg.fraud_threshold)
                  .select(*ALERT_COLS)
                  .write.mode("append").parquet(os.path.join(out_dir, "fraud_alerts")))
            (batch.where(F.col("score") < cfg.fraud_threshold)
                  .select(*ALERT_COLS)
                  .write.mode("append").parquet(os.path.join(out_dir, "legit")))
            (batch.select(*AUDIT_COLS)
                  .write.mode("append").parquet(os.path.join(out_dir, "risk_audit")))
        finally:
            batch.unpersist()

    return route


def run_alert_router(spark, sf_dir: str, cfg: RuleConfig, out_dir: str) -> dict[str, DataFrame]:
    """Run detector + router over the events table end-to-end; return
    the three sink frames."""
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns
    from real_time_fraud_detection_flink_kafka_spark.streaming.fraud_stream import (
        detect_stream,
        tx_stream_from_events,
    )

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = detect_stream(tx_stream_from_events(stream), cfg, with_ttl=False)
    q = (out.writeStream.foreachBatch(make_router(out_dir, cfg))
         .outputMode("append")
         .option("checkpointLocation", os.path.join(out_dir, "_chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return {name: spark.read.parquet(os.path.join(out_dir, name))
            for name in ["fraud_alerts", "legit", "risk_audit"]}
