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
