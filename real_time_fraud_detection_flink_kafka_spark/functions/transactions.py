"""Map the synthetic `events` table onto the reference's transaction
schema (producer/transaction-kafka-producer.py:79-93): card_id,
amount, location (one of the reference's 5 cities), merchant
category, event-time. The derivation is deterministic and mirrored
verbatim in the DuckDB oracle SQL (oracles.py) — keep both in sync.

All expressions are JVM-side Column arithmetic (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.config import LOCATIONS

# event_type → merchant_category (producer's ECOM/POS/ATM domains)
EVENT_TYPE_CATEGORY = {
    "purchase": "ECOM",
    "click": "POS",
    "view": "POS",
    "signup": "ECOM",
    "error": "ATM",
}


def props_k(props: Column) -> Column:
    """Extract integer `k` from the props JSON string."""
    return F.get_json_object(props, "$.k").cast("int")


def derived_location(props: Column) -> Column:
    """Deterministic city code: LOCATIONS[k % 5]."""
    return F.element_at(
        F.array(*[F.lit(c) for c in LOCATIONS]),
        (props_k(props) % len(LOCATIONS)) + 1,
    )


def merchant_category(event_type: Column) -> Column:
    expr = F.lit("ATM")
    for k, v in EVENT_TYPE_CATEGORY.items():
        expr = F.when(event_type == k, F.lit(v)).otherwise(expr)
    return expr


def transactions_from_events(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) →
    transaction frame with the reference's field names."""
    return events.select(
        F.col("event_id"),
        F.concat(F.lit("card_"), F.col("user_id").cast("string")).alias("card_id"),
        F.col("value").alias("amount"),
        derived_location(F.col("props")).alias("location"),
        merchant_category(F.col("event_type")).alias("merchant_category"),
        F.col("ts"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
