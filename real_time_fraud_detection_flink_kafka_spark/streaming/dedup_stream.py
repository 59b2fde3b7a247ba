"""Streaming deduplication + stream-stream interval join — the two
remaining Structured-Streaming state primitives a stream processor
needs beyond keyed process functions and windowed aggs.

- `dedup_events_stream`: exactly-once event delivery per event_id
  using dropDuplicatesWithinWatermark — state bounded by the
  watermark horizon (at-least-once Kafka ingestion → exactly-once
  downstream, the usual production pattern).
- `purchase_error_join_stream`: stream-stream interval join (each
  purchase joined to errors by the same user within the preceding
  10 min) with watermarks bounding both join buffers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from real_time_fraud_detection_flink_kafka_spark.sources.files import raw_events_schema


def dedup_events_stream(events: DataFrame,
                        watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate event_ids; state expires past the watermark."""
    out = events.withWatermark("ts", watermark) if events.isStreaming else events
    if events.isStreaming:
        out = out.dropDuplicatesWithinWatermark(["event_id"])
    else:
        out = out.dropDuplicates(["event_id"])
    return out.select("event_id", "user_id", "event_type",
                      F.col("value"), F.unix_micros("ts").alias("ts_us"))


JOIN_WINDOW_S = 600


def purchase_error_join_stream(events: DataFrame,
                               watermark: str = "5 seconds") -> DataFrame:
    """purchases ⋈ errors of the same user with error in
    (purchase_ts - 10 min, purchase_ts]; event-time interval join."""
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"), F.col("value").alias("purchase_value"))
    e = events.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("event_id").alias("error_id"),
        F.col("ts").alias("e_ts"))
    if events.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        e = e.withWatermark("e_ts", watermark)
    cond = ((F.col("p_user") == F.col("e_user"))
            & (F.col("e_ts") > F.col("p_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_S} SECONDS"))
            & (F.col("e_ts") <= F.col("p_ts")))
    j = p.join(e, cond)
    return j.select(
        F.col("p_user").alias("user_id"), "purchase_id", "error_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("e_ts").alias("error_ts_us"),
        "purchase_value")


def run_dedup_stream(spark, sf_dir: str, query_name: str = "dedup_stream") -> DataFrame:
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = dedup_events_stream(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_interval_join_stream(spark, sf_dir: str,
                             query_name: str = "ssjoin_stream") -> DataFrame:
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = purchase_error_join_stream(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_dedup_stream_durable(spark, sf_dir: str, out_dir: str,
                             checkpoint_dir: str) -> DataFrame:
    """Production-shaped run: parquet sink + durable checkpoint
    (reference README parity — Flink checkpointing with a mounted
    flink-checkpoints volume). A restart resumes from committed source
    offsets and re-reads nothing, so the sink never sees a row twice:
    file-source exactly-once. The memory-sink runners above stay
    checkpoint-free on purpose — the memory sink cannot recover from a
    checkpoint, an ephemeral one is correct for bounded drains."""
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    q = (dedup_events_stream(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.read.parquet(out_dir)
