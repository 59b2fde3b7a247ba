"""Oracles for the chained generator and the full-system query
(producer → detector with the REFERENCE'S OWN constants) — the entire
reference pipeline reproduced as one SQL-checkable expression."""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.config import LOCATIONS, RuleConfig
from real_time_fraud_detection_flink_kafka_spark.oracles import _loc_case, _scored_cte
from real_time_fraud_detection_flink_kafka_spark.oracles_sources import _h, _pick
from real_time_fraud_detection_flink_kafka_spark.sources.generator import (
    BASE_TS_US,
    CUSTOMER_CARDS,
    FRAUD_CUM_PCT,
    FRAUD_TYPES,
    GENERATOR_N,
)

N_LOC = len(LOCATIONS)


def _chained_tx_cte(n: int = GENERATOR_N) -> str:
    card_i = f"({_h('card')} % {len(CUSTOMER_CARDS)})"
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
    final_idx = (f"(CASE WHEN event_type = 'IMPOSSIBLE_TRAVEL' AND prev_idx IS NOT NULL "
                 f"THEN (prev_idx + 1 + loc_jump) % {N_LOC} ELSE base_loc_idx END)")
    return f"""gen0 AS (
  SELECT id,
         'evt-' || CAST(id AS VARCHAR) AS event_id,
         {_pick(card_i, [k for _, k in CUSTOMER_CARDS])} AS card_id,
         {fraud_type} AS event_type,
         {amount} AS amount,
         ({_h('loc')} % {N_LOC}) AS base_loc_idx,
         ({_h('locjump')} % {N_LOC - 1}) AS loc_jump,
         (CASE WHEN {fraud_type} = 'IMPOSSIBLE_TRAVEL' THEN 90
               ELSE 1 + {_h('gap')} % 5 END) AS gap_s
  FROM range({n}) t(id)
),
gen1 AS (
  SELECT *,
         sum(gap_s) OVER (PARTITION BY card_id ORDER BY id
                          ROWS UNBOUNDED PRECEDING) AS off_s,
         lag(base_loc_idx) OVER (PARTITION BY card_id ORDER BY id) AS prev_idx
  FROM gen0
),
tx AS (
  SELECT event_id, card_id, event_type, amount,
         {_loc_case(final_idx)} AS location,
         CAST({BASE_TS_US} + off_s * 1000000 AS BIGINT) AS ts_us
  FROM gen1
)"""


def generated_oracles() -> dict[str, str]:
    ref_cfg = RuleConfig()  # the reference's own constants
    status = f"CASE WHEN score >= {ref_cfg.fraud_threshold} THEN 'FRAUD' ELSE 'LEGIT' END"
    severity = f"CASE WHEN score >= {ref_cfg.high_severity_threshold} THEN 'HIGH' ELSE 'NONE' END"
    return {
        "txn_generator_chained": f"""WITH {_chained_tx_cte()}
SELECT event_id, card_id, event_type, amount, location, ts_us FROM tx""",
        "generated_fraud_scores": f"""{_scored_cte(ref_cfg, _chained_tx_cte())}
SELECT event_id, card_id, amount, location, velocity_cnt, score,
       {status} AS status, {severity} AS severity, reasons, ts_us
FROM final""",
    }
