"""CEP-style sequence detection — the reference's "Future
Enhancements: Add Flink CEP patterns for complex fraud sequences"
(README) realized Spark-first: sequence patterns over keyed
event-time order expressed as conditional window aggregates, so they
stay in whole-stage codegen instead of an NFA library.

Pattern implemented (card-testing burst): N+ small probe
transactions followed by a large one on the same card within a time
window — the classic stolen-card validation sequence the reference's
producer injects (transaction-kafka-producer.py:67-71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.functions.transactions import (
    transactions_from_events,
)

SMALL_MAX = 10.0
LARGE_MIN = 200.0
SEQ_WINDOW_US = 24 * 3600 * 1_000_000
MIN_PROBES = 2


def cep_card_testing(events: DataFrame,
                     small_max: float = SMALL_MAX,
                     large_min: float = LARGE_MIN,
                     window_us: int = SEQ_WINDOW_US,
                     min_probes: int = MIN_PROBES) -> DataFrame:
    """Emit each large transaction preceded by >= min_probes small
    probes on the same card within the window. One shuffle on
    card_id; the pattern is a conditional RANGE-frame sum."""
    tx = transactions_from_events(events)
    w = (Window.partitionBy("card_id").orderBy("ts_us")
         .rangeBetween(-window_us, -1))  # strictly-preceding window
    probes = F.sum(
        F.when(tx["amount"] < small_max, 1).otherwise(0)
    ).over(w)
    df = tx.withColumn("n_probes", F.coalesce(probes, F.lit(0)).cast("bigint"))
    return (df.where((df["amount"] > large_min) & (df["n_probes"] >= min_probes))
              .select("event_id", "card_id", "amount", "n_probes", "ts_us"))


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join: customers with no URGENT order (the unfiltered
    variant is empty on this data — every customer has orders)."""
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (customer.join(urgent, customer["c_custkey"] == urgent["o_custkey"],
                          "left_anti")
                    .select("c_custkey", "c_name", "c_mktsegment"))


def customers_with_big_orders(customer: DataFrame, orders: DataFrame,
                              min_total: float = 400_000.0) -> DataFrame:
    """Semi join: customers having at least one order above min_total."""
    big = orders.where(F.col("o_totalprice") > min_total)
    return (customer.join(big, customer["c_custkey"] == big["o_custkey"],
                          "left_semi")
                    .select("c_custkey", "c_name", "c_acctbal"))


def distinct_users_approx(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog distinct users per event_type (the at-scale
    companion to the exact count; sketch values are engine-specific →
    rows-only check, accuracy asserted in pytest)."""
    return (events.groupBy("event_type")
                  .agg(F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
                       F.count_distinct("user_id").alias("n_users_exact")))
