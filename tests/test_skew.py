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
