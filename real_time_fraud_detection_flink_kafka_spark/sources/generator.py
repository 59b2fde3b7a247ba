"""Deterministic synthetic transaction generator — producer parity
(/root/reference/producer/transaction-kafka-producer.py:52-100)
re-expressed Spark-first: no driver loops, no Python RNG — a
``spark.range(n)`` scan with md5-derived pseudo-random columns, so it
scales linearly across executors and the DuckDB oracle reproduces it
exactly. The streaming variant feeds the same expressions from a
rate source.

Distribution parity with the producer:
- 5 customers with 1-2 cards each (8 cards)           (:18-24)
- locations NY/CA/TX/FL/IL                            (:26)
- merchant categories ECOM/POS/ATM with merchants     (:28-32)
- fraud mix NORMAL/CARD_TESTING/VELOCITY/IMPOSSIBLE_TRAVEL
  at 80/8/6/6                                         (:56-59)
- amounts: U(20,300); CARD_TESTING: U(1,5); VELOCITY: U(80,200)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.config import LOCATIONS
from real_time_fraud_detection_flink_kafka_spark.functions.hashing import md5_int60

CUSTOMER_CARDS = [
    ("Alice", "card_1"), ("Alice", "card_2"),
    ("Bob", "card_3"),
    ("Charlie", "card_4"), ("Charlie", "card_5"),
    ("David", "card_6"),
    ("Eva", "card_7"), ("Eva", "card_8"),
]

MERCHANTS = [
    ("ECOM", "amazon"), ("ECOM", "ebay"), ("ECOM", "shopify"),
    ("POS", "walmart"), ("POS", "target"), ("POS", "costco"),
    ("ATM", "chase_atm"), ("ATM", "boa_atm"),
]

FRAUD_TYPES = ["NORMAL", "CARD_TESTING", "VELOCITY", "IMPOSSIBLE_TRAVEL"]
FRAUD_CUM_PCT = [80, 88, 94, 100]  # weights 80/8/6/6

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01 UTC


def _h(tag: str) -> Column:
    """Per-row 60-bit hash stream seeded by column `id` and a tag."""
    return md5_int60(F.concat(F.lit(tag + ":"), F.col("id").cast("string")))


def _pick(col_idx: Column, values: list[str]) -> Column:
    return F.element_at(F.array(*[F.lit(v) for v in values]), (col_idx + 1).cast("int"))


def _tx_columns() -> dict[str, Column]:
    card_i = _h("card") % len(CUSTOMER_CARDS)
    merch_i = _h("merch") % len(MERCHANTS)
    fraud_pct = _h("fraud") % 100
    fraud_type = F.lit(FRAUD_TYPES[-1])
    for ft, cum in zip(reversed(FRAUD_TYPES), reversed(FRAUD_CUM_PCT)):
        fraud_type = F.when(F.lit(True) & (fraud_pct < cum), F.lit(ft)).otherwise(fraud_type)
    # integer cents → exact /100 division: no engine-dependent
    # round-half ties (Spark rounds the shortest-decimal repr,
    # DuckDB the binary double — they disagree on .xx5)
    cents = _h("amt")
    amount = (
        F.when(fraud_type == "CARD_TESTING", 100 + cents % 401)       # 1.00-5.00
         .when(fraud_type == "VELOCITY", 8000 + cents % 12001)        # 80.00-200.00
         .otherwise(2000 + cents % 28001)                             # 20.00-300.00
    ) / 100.0
    # VELOCITY events arrive in quick bursts; others spaced out
    step_us = F.when(fraud_type == "VELOCITY", 150_000).otherwise(400_000)
    ts_us = F.lit(BASE_TS_US) + F.col("id") * 400_000 + step_us
    return {
        "event_id": F.concat(F.lit("evt-"), F.col("id").cast("string")),
        "transaction_id": F.md5(F.concat(F.lit("tx:"), F.col("id").cast("string"))),
        "customer_id": _pick(card_i, [c for c, _ in CUSTOMER_CARDS]),
        "card_id": _pick(card_i, [k for _, k in CUSTOMER_CARDS]),
        "merchant_category": _pick(merch_i, [c for c, _ in MERCHANTS]),
        "merchant_id": _pick(merch_i, [m for _, m in MERCHANTS]),
        "amount": amount,
        "currency": F.lit("USD"),
        "location": _pick(_h("loc") % len(LOCATIONS), LOCATIONS),
        "ip_address": F.concat_ws(".",
                                  (_h("ip1") % 245 + 1).cast("string"),
                                  (_h("ip2") % 245 + 1).cast("string"),
                                  (_h("ip3") % 245 + 1).cast("string"),
                                  (_h("ip4") % 245 + 1).cast("string")),
        "event_type": fraud_type,
        "ts_us": ts_us,
    }


GENERATOR_N = 10_000


def generate_transactions(spark: SparkSession, n: int = GENERATOR_N) -> DataFrame:
    """Bounded deterministic transaction batch (13-field schema parity
    with the producer, timestamps as epoch µs)."""
    cols = _tx_columns()
    return spark.range(n).select(*[c.alias(name) for name, c in cols.items()])


def generate_transactions_chained(spark: SparkSession,
                                  n: int = GENERATOR_N) -> DataFrame:
    """Producer-faithful variant (batch): per-card CHAINED event times
    (each card's next event 1-5 s after its previous one; impossible-
    travel events exactly 90 s after with a forced location change —
    producer get_event_time/:73-77). Two window functions over one
    card partition; row-local everywhere else.

    The location change approximates 'differs from the previous
    event's base pick' (exact previous-final-location recursion isn't
    expressible without sequential state; rule-firing behavior is
    preserved)."""
    from pyspark.sql import Window

    card_i = _h("card") % len(CUSTOMER_CARDS)
    fraud_pct = _h("fraud") % 100
    fraud_type = F.lit(FRAUD_TYPES[-1])
    for ft, cum in zip(reversed(FRAUD_TYPES), reversed(FRAUD_CUM_PCT)):
        fraud_type = F.when(fraud_pct < cum, F.lit(ft)).otherwise(fraud_type)
    cents = _h("amt")
    amount = (
        F.when(fraud_type == "CARD_TESTING", 100 + cents % 401)
         .when(fraud_type == "VELOCITY", 8000 + cents % 12001)
         .otherwise(2000 + cents % 28001)
    ) / 100.0
    base = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("evt-"), F.col("id").cast("string")).alias("event_id"),
        _pick(card_i, [k for _, k in CUSTOMER_CARDS]).alias("card_id"),
        fraud_type.alias("event_type"),
        amount.alias("amount"),
        (_h("loc") % len(LOCATIONS)).alias("base_loc_idx"),
        (_h("locjump") % (len(LOCATIONS) - 1)).alias("loc_jump"),
        F.when(fraud_type == "IMPOSSIBLE_TRAVEL", 90)
         .otherwise(1 + _h("gap") % 5).alias("gap_s"),
    )
    w = Window.partitionBy("card_id").orderBy("id")
    off_s = F.sum("gap_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    prev_idx = F.lag("base_loc_idx").over(w)
    g = base.withColumns({"off_s": off_s, "prev_idx": prev_idx})
    final_idx = F.when(
        (g["event_type"] == "IMPOSSIBLE_TRAVEL") & g["prev_idx"].isNotNull(),
        (g["prev_idx"] + 1 + g["loc_jump"]) % len(LOCATIONS),
    ).otherwise(g["base_loc_idx"])
    return g.select(
        "event_id", "card_id", "event_type", "amount",
        _pick(final_idx, LOCATIONS).alias("location"),
        (F.lit(BASE_TS_US) + g["off_s"] * 1_000_000).cast("bigint").alias("ts_us"),
    )


def generate_transactions_stream(spark: SparkSession,
                                 rows_per_second: int = 100) -> DataFrame:
    """Unbounded variant: rate source → same deterministic columns
    (keyed by the rate source's monotonically increasing `value`)."""
    cols = _tx_columns()
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second)).load()
            .withColumnRenamed("value", "id"))
    return rate.select(*[c.alias(name) for name, c in cols.items()])
