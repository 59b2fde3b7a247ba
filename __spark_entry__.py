"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fraud-scoring pipeline at
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.registry import ORACLES, QUERIES
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

CFG = RuleConfig.for_events_table()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full fraud-rule scoring over sf0.001 events."""
    from real_time_fraud_detection_flink_kafka_spark.operators.fraud import fraud_scores

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return fraud_scores(events, CFG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
