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

from real_time_fraud_detection_flink_kafka_spark.functions import hashing as H
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


def customer_order_semijoins(customer: DataFrame, orders: DataFrame,
                             min_total: float = 400_000.0) -> DataFrame:
    """Anti + semi join coverage as ONE tagged relation: customers
    with no URGENT order (left_anti) unioned with customers having at
    least one order above min_total (left_semi). Both branches
    broadcast the filtered orders side — hinted explicitly so the
    plan shape holds above autoBroadcastJoinThreshold too (the
    filtered key set stays small even when raw orders does not)."""
    urgent = F.broadcast(orders.where(F.col("o_orderpriority") == "1-URGENT"))
    big = F.broadcast(orders.where(F.col("o_totalprice") > min_total))
    anti = (customer.join(urgent, customer["c_custkey"] == urgent["o_custkey"],
                          "left_anti")
                    .select(F.lit("anti_no_urgent").alias("join_type"),
                            "c_custkey", "c_name", "c_mktsegment"))
    semi = (customer.join(big, customer["c_custkey"] == big["o_custkey"],
                          "left_semi")
                    .select(F.lit("semi_big_order").alias("join_type"),
                            "c_custkey", "c_name", "c_mktsegment"))
    return anti.unionAll(semi)


def distinct_users_approx(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog distinct users per event_type (the at-scale
    companion to the exact count; sketch values are engine-specific →
    rows-only check, accuracy asserted in pytest)."""
    return (events.groupBy("event_type")
                  .agg(F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
                       F.count_distinct("user_id").alias("n_users_exact")))


KMV_K = 64
KMV_NORM = float(1 << 60)


def distinct_users_kmv(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-day approximate distinct users via a K-MINIMUM-VALUES
    sketch — the engine-PORTABLE alternative to HLL
    (`distinct_users_approx` stays rows-only because HLL registers
    are engine-internal; KMV is pure arithmetic on portable md5
    hashes, so this one is fully oracle-checked).

    Estimator: hash each user to (0,1); with fewer than k distinct
    hashes the count is exact, otherwise est = (k-1)/h_(k) (the k-th
    smallest hash). At scale the per-group state is the k smallest
    hashes — mergeable across partitions like any sketch; here the
    rank is computed with one window over the distinct hashes."""
    h = (H.md5_int60(F.col("user_id").cast("string")) / F.lit(KMV_NORM))
    d = (events.select(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                       h.alias("hv"))
               .distinct())
    w = Window.partitionBy("day").orderBy("hv")
    ranked = d.select(
        "day", "hv", F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("day")).alias("m"))
    est = F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("hk"))
    return (ranked.groupBy("day")
            .agg(F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("hk"),
                 F.max("m").alias("m"))
            .select("day", est.alias("n_users_est"))
            .orderBy("day"))
