from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.functions.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # hot key: 90% of the big side is key=1
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"))
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim"))

    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"),
        F.first("dim").alias("d"))
    salted = salted_join(big, small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"),
        F.first("dim").alias("d"))

    a = {r.k: (r.n, r.s, r.d) for r in plain.collect()}
    b = {r.k: (r.n, r.s, r.d) for r in salted.collect()}
    assert a == b

    # the hot key really is spread across salts on the big side
    spread = (big.withColumn("_salt", F.pmod(F.hash("k", "payload"), F.lit(8)))
                 .where(F.col("k") == 1)
                 .select(F.countDistinct("_salt").alias("n")).collect()[0].n)
    assert spread == 8


def test_coincident_hot_bin_aqe_skew_split(spark):
    """The flash-crowd case for the binned range join
    (`cep.coincident_events`): one 60 s bin holding most of the
    events is an ordinary skewed join key, and the docstring's claim
    that AQE splits it must hold ON THIS OPERATOR's finalized plan —
    skew=true on the bin self-join — while the output still equals
    the brute-force inequality join. Thresholds are lowered so
    test-scale bytes register as skewed; the mechanism is identical
    at 100 TB with the defaults."""
    import datetime

    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        COINCIDENCE_US,
        coincident_events,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # hot bin: 800 events inside one coincidence window
    for i in range(800):
        rows.append((i, base + datetime.timedelta(milliseconds=i * 70),
                     i % 7, "view", 1.0, "{}"))
    # background: 500 events spread over ~100 later windows
    for i in range(500):
        rows.append((1000 + i,
                     base + datetime.timedelta(seconds=3600 + i * 13),
                     i % 5, "view", 1.0, "{}"))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    keys = ["spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold"]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = coincident_events(events)
        got = len(out.collect())  # AQE finalizes THIS frame's plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # ground truth: the plain inequality self-join (the oracle shape)
    b = events.select(F.col("event_id").alias("eb"),
                      F.col("user_id").alias("ub"),
                      F.unix_micros("ts").alias("tb"))
    a = events.select(F.col("event_id").alias("ea"),
                      F.col("user_id").alias("ua"),
                      F.unix_micros("ts").alias("ta"))
    want = (a.join(b, (F.col("tb") >= F.col("ta"))
                   & (F.col("tb") < F.col("ta") + COINCIDENCE_US)
                   & ((F.col("ta") < F.col("tb"))
                      | (F.col("ea") < F.col("eb")))
                   & (F.col("ua") != F.col("ub"))).count())
    assert got == want
