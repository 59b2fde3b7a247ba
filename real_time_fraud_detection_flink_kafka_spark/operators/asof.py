"""As-of (temporal) join: each event matched to the same customer's
most recent order at event time.

Implemented the scalable way — NOT a quadratic inequality join:
union both sides tagged, one shuffle on the key, and a running
``last(..., ignorenulls=True)`` window carries the latest order
forward onto each event row. O(n log n) per key regardless of fan-in,
the standard pattern for as-of joins at 100 TB (a point-in-time
lookup over a slowly-changing side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_event_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """event → (most recent o_orderkey / orderdate / totalprice of the
    same customer at or before the event's time); NULLs if none."""
    e = events.select(
        F.col("user_id").alias("k"),
        F.unix_micros(F.col("ts")).alias("t"),
        F.lit(0).alias("is_order"),
        F.col("event_id"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("bigint").alias("o_ts_us"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    o = orders.select(
        F.col("o_custkey").alias("k"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("o_orderkey"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_ts_us"),
        F.col("o_totalprice"),
    )
    u = e.unionByName(o)
    # at equal t an order is visible to the event (at-or-before), and
    # concurrent orders tie-break on the highest orderkey
    w = (Window.partitionBy("k")
         .orderBy("t", F.desc("is_order"), "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = u.select(
        "k", "t", "is_order", "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_ts_us", ignorenulls=True).over(w).alias("last_order_ts_us"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("last_totalprice"),
    )
    return (carried.where(F.col("is_order") == 0)
                   .select(F.col("event_id"), F.col("k").alias("user_id"),
                           F.col("t").alias("ts_us"),
                           "last_orderkey", "last_order_ts_us", "last_totalprice"))
