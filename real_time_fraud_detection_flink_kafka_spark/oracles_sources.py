"""DuckDB oracle for the deterministic transaction generator —
mirrors sources/generator.py expression-for-expression over
range(GENERATOR_N)."""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.config import LOCATIONS
from real_time_fraud_detection_flink_kafka_spark.functions.hashing import md5_int60_sql
from real_time_fraud_detection_flink_kafka_spark.sources.generator import (
    BASE_TS_US,
    CUSTOMER_CARDS,
    FRAUD_CUM_PCT,
    FRAUD_TYPES,
    GENERATOR_N,
    MERCHANTS,
)


def _h(tag: str) -> str:
    return md5_int60_sql(f"'{tag}:' || CAST(id AS VARCHAR)")


def _pick(idx_expr: str, values: list[str]) -> str:
    lit = "[" + ", ".join(f"'{v}'" for v in values) + "]"
    return f"({lit}[({idx_expr}) + 1])"


def generator_oracle() -> str:
    card_i = f"({_h('card')} % {len(CUSTOMER_CARDS)})"
    merch_i = f"({_h('merch')} % {len(MERCHANTS)})"
    pct = f"({_h('fraud')} % 100)"
    ft_whens = " ".join(
        f"WHEN {pct} < {cum} THEN '{ft}'"
        for ft, cum in zip(FRAUD_TYPES[:-1], FRAUD_CUM_PCT[:-1])
    )
    fraud_type = f"(CASE {ft_whens} ELSE '{FRAUD_TYPES[-1]}' END)"
    cents = _h("amt")
    amount = (f"((CASE WHEN {fraud_type} = 'CARD_TESTING' THEN 100 + {cents} % 401 "
              f"WHEN {fraud_type} = 'VELOCITY' THEN 8000 + {cents} % 12001 "
              f"ELSE 2000 + {cents} % 28001 END) / 100.0)")
    step = f"(CASE WHEN {fraud_type} = 'VELOCITY' THEN 150000 ELSE 400000 END)"
    ip_part = lambda tag: f"CAST(({_h(tag)} % 245 + 1) AS VARCHAR)"  # noqa: E731
    return f"""
SELECT 'evt-' || CAST(id AS VARCHAR) AS event_id,
       md5('tx:' || CAST(id AS VARCHAR)) AS transaction_id,
       {_pick(card_i, [c for c, _ in CUSTOMER_CARDS])} AS customer_id,
       {_pick(card_i, [k for _, k in CUSTOMER_CARDS])} AS card_id,
       {_pick(merch_i, [c for c, _ in MERCHANTS])} AS merchant_category,
       {_pick(merch_i, [m for _, m in MERCHANTS])} AS merchant_id,
       {amount} AS amount,
       'USD' AS currency,
       {_pick(f"({_h('loc')} % {len(LOCATIONS)})", LOCATIONS)} AS location,
       concat_ws('.', {ip_part('ip1')}, {ip_part('ip2')}, {ip_part('ip3')}, {ip_part('ip4')}) AS ip_address,
       {fraud_type} AS event_type,
       ({BASE_TS_US} + id * 400000 + {step}) AS ts_us
FROM range({GENERATOR_N}) t(id)"""
