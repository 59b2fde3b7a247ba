"""Streaming windowed aggregation with event-time watermarks — the
Structured-Streaming counterpart of the reference's event-time
processing (watermarks at fraud_detection.py:182-188) applied to
tumbling-window counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from real_time_fraud_detection_flink_kafka_spark.sources.files import raw_events_schema


def windowed_counts_stream(events: DataFrame, window: str = "1 hour",
                           watermark: str = "5 seconds") -> DataFrame:
    """Tumbling-window per-type counts. With a watermark + append mode
    a window emits once it can no longer receive late data."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (events.groupBy(F.window("ts", window), "event_type")
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       (F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
                        / 1_000_000.0).alias("total_value"))
                  .select(F.unix_micros(F.col("window.start")).alias("window_start_us"),
                          "event_type", "n_events", "total_value"))


def run_windowed_counts_stream(spark, sf_dir: str,
                               query_name: str = "windowed_stream") -> DataFrame:
    """Bounded run over the events table via a file stream; complete
    output mode so every window (incl. the last, never-closed one)
    lands in the memory sink — result equals the batch operator."""
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = windowed_counts_stream(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


SESSION_GAP = "30 minutes"
SESSION_GAP_US = 30 * 60 * 1_000_000


def session_counts_stream(events: DataFrame, gap: str = SESSION_GAP,
                          watermark: str = "5 seconds") -> DataFrame:
    """Native `session_window` gap-session aggregation — the Spark
    counterpart of Flink session windows (the reference's framework
    headlines them). State merges adjacent windows as events arrive;
    a session closes once the watermark passes its end.

    Boundary semantics: session_window merges an event iff
    ts < prev_end (= prev_ts + gap) — an EXACTLY-gap-apart event
    starts a NEW session. The oracle mirrors this (diff >= gap splits)
    rather than reusing `sessionize`'s diff > gap rule.

    session_window.end is max(ts) + gap, so subtracting the gap
    yields the last event time — emitted as session_end_us to match
    the batch analog's schema."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (events.groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
                  / 1_000_000.0).alias("total_value"))
            .select("user_id",
                    F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
                    (F.unix_micros(F.col("session_window.end"))
                     - SESSION_GAP_US).alias("session_end_us"),
                    "n_events", "total_value"))


def run_session_counts_stream(spark, sf_dir: str,
                              query_name: str = "session_stream") -> DataFrame:
    """Bounded drain of the session-window aggregation over the events
    table; complete mode so open sessions land too — result equals
    the batch analog."""
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = session_counts_stream(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def sliding_counts_stream(events: DataFrame, window: str = "1 hour",
                          slide: str = "15 minutes",
                          watermark: str = "5 seconds") -> DataFrame:
    """SLIDING-window per-type counts — Spark's native hop windows
    (`F.window` with a slideDuration). Native hop starts align to
    epoch multiples of the slide, which is exactly the start set the
    batch `sliding_window_counts` enumerates with integer modular
    arithmetic, so the drained result shares the batch oracle
    row-exactly. State is one row per OPEN (window, type) — the
    overlap factor multiplies state and output identically in batch
    and stream; that is the cost of hop windows, not a streaming
    artifact."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (events.groupBy(F.window("ts", window, slide), "event_type")
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       (F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
                        / 1_000_000.0).alias("total_value"))
                  .select(F.unix_micros(F.col("window.start")).alias("window_start_us"),
                          "event_type", "n_events", "total_value"))


def run_sliding_counts_stream(spark, sf_dir: str,
                              query_name: str = "sliding_stream") -> DataFrame:
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = sliding_counts_stream(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
