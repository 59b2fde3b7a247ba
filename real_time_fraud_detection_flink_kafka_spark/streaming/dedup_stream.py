"""Streaming joins & dedup over the events stream — the remaining
Structured-Streaming primitives a stream processor needs beyond
keyed process functions and windowed aggs.

- `dedup_events_stream`: exactly-once event delivery per event_id
  using dropDuplicatesWithinWatermark — state bounded by the
  watermark horizon (at-least-once Kafka ingestion → exactly-once
  downstream, the usual production pattern).
- `purchase_error_join_stream`: stream-stream interval join (each
  purchase joined to errors by the same user within the preceding
  10 min) with watermarks bounding both join buffers.
- `coincident_events_stream`: the non-equi time-proximity self-join
  as a binned stream-stream equi-join (shared batch algorithm).
- `run_asof_stream`: the as-of join's stream-static serving shape —
  stateless point-in-time lookups against a batch-built index.
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


def coincident_events_stream(events: DataFrame,
                             watermark: str = "60 seconds") -> DataFrame:
    """Streaming twin of `operators.cep.coincident_events` — the
    NON-EQUI time-proximity self-join as a stream-stream join. The
    batch op's bin-bucketing trick pays off twice here: Spark
    REQUIRES an equality predicate on stream-stream joins, and the
    time-bin key (left emits its bin, right explodes to bin and
    bin-1 — stateless projections, legal pre-join on streams) IS
    that equality key, so batch and stream literally share the
    algorithm. The event-time range condition rides alongside so the
    watermark bounds both join buffers to watermark + 60 s — state
    O(rate · window) regardless of stream length. Tie-break and
    cross-user predicates are residual filters; output equals the
    batch op exactly (shared oracle).

    Watermark contract (the standard stream-stream one): output is
    row-exact with the batch oracle iff no input row arrives more
    than `watermark` behind the max event time already seen — beyond
    that, join state for its partners may already be evicted and/or
    the row itself discarded as late, in ANY multi-microbatch drain.
    The default therefore matches COINCIDENCE_US (60 s): one full
    coincidence window of cross-microbatch reorder tolerance, so a
    chunked source (maxFilesPerTrigger) whose disorder is bounded by
    the window itself stays exact; a 5 s default would silently drop
    cross-boundary pairs (pinned by
    test_coincident_stream_multi_microbatch_exact). A single-file
    availableNow drain is one microbatch and trivially exact at any
    watermark."""
    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        COINCIDENCE_US,
    )

    a = events.select(F.col("event_id").alias("event_a"),
                      F.col("user_id").alias("user_a"),
                      F.col("ts").alias("ts_a"),
                      F.floor(F.unix_micros("ts")
                              / F.lit(COINCIDENCE_US)).alias("bin_a"))
    b_bin = F.floor(F.unix_micros("ts") / F.lit(COINCIDENCE_US))
    b = events.select(F.col("event_id").alias("event_b"),
                      F.col("user_id").alias("user_b"),
                      F.col("ts").alias("ts_b"),
                      F.explode(F.array(b_bin, b_bin - 1)).alias("bin_b"))
    if events.isStreaming:
        a = a.withWatermark("ts_a", watermark)
        b = b.withWatermark("ts_b", watermark)
    secs = COINCIDENCE_US // 1_000_000
    cond = ((F.col("bin_a") == F.col("bin_b"))
            & (F.col("ts_b") >= F.col("ts_a"))
            & (F.col("ts_b") < F.col("ts_a")
               + F.expr(f"INTERVAL {secs} SECONDS"))
            & ((F.col("ts_a") < F.col("ts_b"))
               | (F.col("event_a") < F.col("event_b")))
            & (F.col("user_a") != F.col("user_b")))
    gap = F.unix_micros("ts_b") - F.unix_micros("ts_a")
    return (a.join(b, cond)
             .select("event_a", "event_b", "user_a", "user_b",
                     gap.alias("gap_us")))


def run_coincident_stream(spark, sf_dir: str,
                          query_name: str = "coincident_stream") -> DataFrame:
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = coincident_events_stream(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_benford_stream(spark, sf_dir: str,
                       query_name: str = "benford_stream") -> DataFrame:
    """Benford digit accounting ON the event stream: per-digit counts
    are the query's ONE stateful aggregation (integer counts —
    arrival-order free in complete mode); shares/expectations/
    deviations are derived from the DRAINED 9-row table batch-side
    (the post-drain projection a dashboard runs), so the result
    equals batch `benford_audit` exactly and shares its oracle."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        BENFORD_EXPECTED,
    )

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    cents = F.round(F.col("value") * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    per = (stream.where(F.col("value") > 0)
                 .select(digit.alias("digit"))
                 .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    q = (per.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    drained = spark.table(query_name)
    tot = drained.agg(F.sum("n").cast("double").alias("_tot"))
    expected = F.lit(None).cast("double")
    for d, p in BENFORD_EXPECTED.items():
        expected = F.when(F.col("digit") == d, F.lit(p)).otherwise(expected)
    share = F.col("n") / F.col("_tot")
    return (drained.crossJoin(F.broadcast(tot))
            .select("digit", "n",
                    F.round(share, 6).alias("share"),
                    expected.alias("benford"),
                    F.round(F.abs(share - expected), 6).alias("abs_dev")))


def run_mv_maintain_stream(spark, sf_dir: str,
                           query_name: str = "mv_stream") -> DataFrame:
    """Materialized-view maintenance with the DELTA ON THE STREAM:
    yesterday's per-type partial aggregates come from the batch base
    slice, the arriving delta (event_id % MV_DELTA_MOD == 0) streams
    through ONE stateful integer aggregation (complete mode —
    arrival-order free), and the view merges post-drain through the
    same coalesce+add join as batch `mv_maintain` — the incremental
    shape a streaming MV engine runs continuously. Equals the full
    recompute exactly (shared oracle: the parity gate proves
    incremental-with-streamed-delta ≡ recompute)."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        MV_DELTA_MOD,
        SCALE,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    fp = F.round(F.col("value") * SCALE).cast("bigint")
    batch = load_table(spark, sf_dir, "events")
    v1 = (batch.where(F.col("event_id") % MV_DELTA_MOD != 0)
               .select("event_type", fp.alias("vfp"))
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n1"), F.sum("vfp").alias("s1")))

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    delta = (stream.where(F.col("event_id") % MV_DELTA_MOD == 0)
                   .select("event_type", fp.alias("vfp"))
                   .groupBy("event_type")
                   .agg(F.count(F.lit(1)).alias("nd"), F.sum("vfp").alias("sd")))
    q = (delta.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    drained = spark.table(query_name)
    z = F.lit(0).cast("bigint")
    return (v1.join(drained, "event_type", "full_outer")
              .select("event_type",
                      (F.coalesce("n1", z) + F.coalesce("nd", z)).alias("n_events"),
                      ((F.coalesce("s1", z) + F.coalesce("sd", z))
                       / F.lit(float(SCALE))).alias("total_value")))


def run_asof_stream(spark, sf_dir: str,
                    query_name: str = "asof_stream",
                    progress_out: list | None = None) -> DataFrame:
    """STREAMING twin of the as-of join — events arrive as a file
    stream and each resolves its point-in-time order match against
    the STATIC per-customer history index (batch-built once, exactly
    what a serving pipeline persists). Everything on the stream side
    is a stateless projection after a stream-static broadcast join,
    so the drain runs in append mode with ZERO state rows and equals
    the batch `asof_event_order` exactly — shared oracle."""
    from real_time_fraud_detection_flink_kafka_spark.operators.asof import (
        asof_event_order_lookup,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import (
        _normalize_ns,
        load_table,
    )

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    orders = load_table(spark, sf_dir, "orders")
    out = asof_event_order_lookup(stream, orders)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    if progress_out is not None:
        progress_out.append(q.lastProgress)
    return spark.table(query_name)
