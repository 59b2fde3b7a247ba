"""Kafka source/sink builders — parity with the reference's Kafka
wiring (fraud_detection.py:135-180: bootstrap servers, topic, group,
offsets, JSON value deserialization into the 13-field transaction
row).

There is no broker in this environment, so these builders only
construct the (lazy) streaming DataFrames; tests cover the JSON
schema contract via from_json on static data. On a real cluster they
are production-ready: the kafka source partitions 1:1 with topic
partitions and the detector's groupBy(card_id) re-keys exactly like
the reference's key_by — keying by card at the producer (as the
reference does) makes that shuffle local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# JsonRowDeserializationSchema parity (fraud_detection.py:142-176)
TRANSACTION_SCHEMA = T.StructType([
    T.StructField("schema_version", T.StringType()),
    T.StructField("event_id", T.StringType()),
    T.StructField("transaction_id", T.StringType()),
    T.StructField("customer_id", T.StringType()),
    T.StructField("card_id", T.StringType()),
    T.StructField("merchant_id", T.StringType()),
    T.StructField("merchant_category", T.StringType()),
    T.StructField("amount", T.DoubleType()),
    T.StructField("currency", T.StringType()),
    T.StructField("location", T.StringType()),
    T.StructField("ip_address", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("timestamp", T.StringType()),
])


def parse_transaction_json(value: Column) -> Column:
    """Kafka value bytes → typed transaction struct."""
    return F.from_json(value.cast("string"), TRANSACTION_SCHEMA)


def transactions_from_kafka(spark: SparkSession, bootstrap_servers: str,
                            topic: str = "transactions",
                            starting_offsets: str = "latest") -> DataFrame:
    """readStream from Kafka → flattened transaction columns with an
    event-time timestamp parsed from the ISO payload field
    (timestamp_assigner parity, fraud_detection.py:182-188)."""
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", bootstrap_servers)
           .option("subscribe", topic)
           .option("startingOffsets", starting_offsets)
           .load())
    tx = raw.select(parse_transaction_json(F.col("value")).alias("tx")).select("tx.*")
    return tx.withColumn(
        "ts", F.to_timestamp(F.replace(F.col("timestamp"), F.lit("Z"), F.lit("")))
    ).withColumn("ts_us", F.unix_micros(F.col("ts")))


def alerts_to_kafka(alerts: DataFrame, bootstrap_servers: str,
                    topic: str = "fraud-alerts"):
    """writeStream of detector output back to Kafka as JSON, keyed by
    card (same partitioning contract as the reference producer)."""
    payload = F.to_json(F.struct(*[F.col(c) for c in alerts.columns]))
    return (alerts.select(F.col("card_id").cast("string").alias("key"),
                          payload.alias("value"))
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic))


# --- broker-free wire-format smoke path ------------------------------------

# Wire contract for the events table, mirroring the transaction JSON
# contract above (value = JSON payload, key = partition key).
EVENT_WIRE_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("ts_us", T.LongType()),
])


def events_to_wire(events: DataFrame) -> DataFrame:
    """events rows → Kafka wire shape (key, JSON value) — the exact
    frame `alerts_to_kafka` would hand to a broker, keyed by user so
    downstream per-user operators shuffle locally."""
    payload = F.to_json(F.struct(
        F.col("event_id"), F.col("user_id"), F.col("event_type"),
        F.col("value"), F.unix_micros("ts").alias("ts_us")))
    return events.select(F.col("user_id").cast("string").alias("key"),
                         payload.alias("value"))


def events_from_wire(raw: DataFrame) -> DataFrame:
    """Wire frame → typed event rows (same deserialization step the
    Kafka source applies in `transactions_from_kafka`)."""
    e = F.from_json(F.col("value").cast("string"), EVENT_WIRE_SCHEMA)
    return raw.select(e.alias("e")).select("e.*")


def run_wire_smoke_stream(spark: SparkSession, sf_dir: str,
                          query_name: str = "wire_stream") -> DataFrame:
    """Deterministic end-to-end exercise of the streaming source path
    WITHOUT a broker: stage the events table in wire format (key +
    JSON value, exactly what a Kafka topic would carry), stream the
    staging dir back with readStream, deserialize with the shared
    from_json contract, drain to a memory sink. Output equals the
    events table — oracle-checkable. Swapping the file stage for
    `.format("kafka")` is the only delta on a real cluster."""
    import tempfile

    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    events = load_table(spark, sf_dir, "events")
    wire_dir = tempfile.mkdtemp(prefix="wire_events_")
    events_to_wire(events).write.mode("overwrite").parquet(wire_dir)
    raw = spark.readStream.schema("key string, value string").parquet(wire_dir)
    q = (events_from_wire(raw)
         .writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
