"""Central registry: SURVEY §2 name → (spark callable, oracle SQL).

``QUERIES[name]`` is ``Callable[[SparkSession, str sf_dir], DataFrame]``.
``ORACLES[name]`` is DuckDB SQL over the pre-registered table views.
Names absent from ORACLES get the driver's weaker rows-only check
(non-SQL-expressible operators only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.operators import fraud
from real_time_fraud_detection_flink_kafka_spark.oracles import fraud_oracles
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

CFG = RuleConfig.for_events_table()

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _events_query(op: Callable[..., DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return op(load_table(spark, sf_dir, "events"), CFG)
    return run


_FRAUD_ORACLES = fraud_oracles(CFG)
for _name, _op in [
    ("fraud_scores", fraud.fraud_scores),
    ("rule_high_amount", fraud.rule_high_amount),
    ("rule_velocity", fraud.rule_velocity),
    ("rule_impossible_travel", fraud.rule_impossible_travel),
    ("fraud_alerts", fraud.fraud_alerts),
    ("risk_audit", fraud.risk_audit),
    ("fraud_summary", fraud.fraud_summary),
    ("card_risk_profile", fraud.card_risk_profile),
    ("merchant_risk", fraud.merchant_risk),
]:
    register(_name, _events_query(_op), _FRAUD_ORACLES[_name])
