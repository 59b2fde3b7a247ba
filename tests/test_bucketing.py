"""Bucketing = pay the shuffle once at write time: a join of two
same-key same-count bucketed tables must compile with ZERO Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    import shutil

    for t in ["ev_b", "pr_b"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    events = load_table(spark, sf_dir, "events")
    profile = (events.groupBy("user_id")
                     .agg(F.count(F.lit(1)).alias("n_events")))
    write_bucketed(events.select("event_id", "user_id", "value"),
                   "ev_b", "user_id", buckets=8)
    write_bucketed(profile, "pr_b", "user_id", buckets=8)

    # force SMJ so the demonstration is about bucket alignment, not
    # the broadcast fallback the tiny test tables would trigger
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "ev_b", "pr_b", "user_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() == events.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # contrast: the same join on plain parquet shuffles
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.table("ev_b").write.mode("overwrite").parquet(str(tmp_path / "ev_p"))
        plain = (spark.read.parquet(str(tmp_path / "ev_p"))
                 .join(profile, "user_id"))
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
