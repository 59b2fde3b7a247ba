"""DuckDB oracle SQL for every SQL-expressible query in SURVEY §2.

Each string is ANSI-ish SQL runnable by DuckDB against pre-registered
views (region nation customer supplier part orders lineitem events
documents embeddings). The SQL is generated from the SAME constants
(RuleConfig, LOCATION_COORDS, EVENT_TYPE_CATEGORY) the Spark
operators use, and mirrors the Spark expression structure so doubles
come out bitwise-identical where they matter.
"""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.config import (
    EARTH_RADIUS_KM,
    LOCATION_COORDS,
    LOCATIONS,
    RuleConfig,
)
from real_time_fraud_detection_flink_kafka_spark.functions.transactions import EVENT_TYPE_CATEGORY


def _loc_case(k_expr: str) -> str:
    """LOCATIONS[k % 5] as a CASE chain."""
    whens = "".join(
        f" WHEN {i} THEN '{c}'" for i, c in enumerate(LOCATIONS)
    )
    return f"(CASE (({k_expr}) % {len(LOCATIONS)}){whens} END)"


def _cat_case(et: str = "event_type") -> str:
    whens = "".join(
        f" WHEN {et} = '{k}' THEN '{v}'" for k, v in EVENT_TYPE_CATEGORY.items()
    )
    return f"(CASE{whens} ELSE 'ATM' END)"


def _latlon_case(loc: str, idx: int) -> str:
    whens = "".join(
        f" WHEN {loc} = '{c}' THEN CAST({coords[idx]!r} AS DOUBLE)"
        for c, coords in LOCATION_COORDS.items()
    )
    return f"(CASE{whens} END)"


def _haversine(loc_a: str, loc_b: str) -> str:
    """Same op order as functions/geo.py:haversine_km."""
    lat1, lon1 = _latlon_case(loc_a, 0), _latlon_case(loc_a, 1)
    lat2, lon2 = _latlon_case(loc_b, 0), _latlon_case(loc_b, 1)
    dlat = f"radians({lat2} - {lat1})"
    dlon = f"radians({lon2} - {lon1})"
    x = (f"(pow(sin({dlat} / 2), 2) + cos(radians({lat1})) * cos(radians({lat2}))"
         f" * pow(sin({dlon} / 2), 2))")
    return f"(2 * {EARTH_RADIUS_KM!r} * atan2(sqrt({x}), sqrt(1 - {x})))"


TX_CTE = f"""tx AS (
  SELECT event_id,
         'card_' || CAST(user_id AS VARCHAR) AS card_id,
         value AS amount,
         {_loc_case("CAST(json_extract_string(props, '$.k') AS INTEGER)")} AS location,
         {_cat_case()} AS merchant_category,
         ts,
         epoch_us(ts) AS ts_us
  FROM events
)"""


def _scored_cte(cfg: RuleConfig, tx_cte: str | None = None) -> str:
    """Scoring CTE chain over any tx source CTE exposing
    (event_id, card_id, amount, location, ts_us)."""
    w_us = cfg.rapid_window_ms * 1000
    t_us = cfg.impossible_travel_ms * 1000
    hav = _haversine("prev_loc", "location")
    return f"""WITH {tx_cte if tx_cte is not None else TX_CTE},
win AS (
  SELECT *,
    count(*) OVER (PARTITION BY card_id ORDER BY ts_us
                   RANGE BETWEEN {w_us} PRECEDING AND CURRENT ROW) AS velocity_cnt,
    lag(location) OVER (PARTITION BY card_id ORDER BY ts_us, event_id) AS prev_loc,
    lag(ts_us)   OVER (PARTITION BY card_id ORDER BY ts_us, event_id) AS prev_ts_us
  FROM tx
),
scored AS (
  SELECT *,
    coalesce(amount > {cfg.max_amount!r}, FALSE) AS r_high,
    coalesce(velocity_cnt >= {cfg.rapid_tx_count}, FALSE) AS r_rapid,
    coalesce(prev_loc IS NOT NULL AND location <> prev_loc
             AND (ts_us - prev_ts_us) <= {t_us}
             AND {hav} > {cfg.travel_min_km!r}, FALSE) AS r_travel
  FROM win
),
final AS (
  SELECT *,
    CAST(  CASE WHEN r_high   THEN {cfg.score_high_amount} ELSE 0 END
         + CASE WHEN r_rapid  THEN {cfg.score_rapid}       ELSE 0 END
         + CASE WHEN r_travel THEN {cfg.score_travel}      ELSE 0 END AS INTEGER) AS score,
    concat_ws(',',
      CASE WHEN r_high   THEN 'HIGH_AMOUNT' END,
      CASE WHEN r_rapid  THEN 'RAPID_TRANSACTIONS' END,
      CASE WHEN r_travel THEN 'IMPOSSIBLE_TRAVEL' END) AS reasons
  FROM scored
)"""


def fraud_oracles(cfg: RuleConfig) -> dict[str, str]:
    base = _scored_cte(cfg)
    status = f"CASE WHEN score >= {cfg.fraud_threshold} THEN 'FRAUD' ELSE 'LEGIT' END"
    severity = f"CASE WHEN score >= {cfg.high_severity_threshold} THEN 'HIGH' ELSE 'NONE' END"
    hav = _haversine("prev_loc", "location")
    return {
        "fraud_scores": f"""{base}
SELECT event_id, card_id, amount, location, velocity_cnt, score,
       {status} AS status, {severity} AS severity, reasons, ts_us
FROM final""",
        "fraud_rules": f"""{base}
SELECT 'HIGH_AMOUNT' AS rule, event_id, card_id, amount AS measure, ts_us
FROM final WHERE r_high
UNION ALL
SELECT 'RAPID_TRANSACTIONS' AS rule, event_id, card_id,
       CAST(velocity_cnt AS DOUBLE) AS measure, ts_us
FROM final WHERE r_rapid
UNION ALL
SELECT 'IMPOSSIBLE_TRAVEL' AS rule, event_id, card_id,
       round({hav}, 3) AS measure, ts_us
FROM final WHERE r_travel""",
        "rule_high_amount": f"""WITH {TX_CTE}
SELECT event_id, card_id, amount, location, ts_us
FROM tx WHERE amount > {cfg.max_amount!r}""",
        "rule_velocity": f"""{base}
SELECT event_id, card_id, velocity_cnt, ts_us FROM final WHERE r_rapid""",
        "rule_impossible_travel": f"""{base}
SELECT event_id, card_id, prev_loc, location,
       round({hav}, 3) AS travel_km, ts_us
FROM final WHERE r_travel""",
        "fraud_alerts": f"""{base}
SELECT event_id, card_id, amount, location, score,
       {severity} AS severity, reasons, ts_us
FROM final WHERE score >= {cfg.fraud_threshold}""",
        "risk_audit": f"""{base}
SELECT card_id, score, reasons AS rules_triggered, ts_us AS event_time_us
FROM final""",
        "fraud_summary": f"""{base}
SELECT {status} AS status, {severity} AS severity,
       count(*) AS n_events,
       round(avg(amount), 6) AS avg_amount,
       round(sum(amount), 6) AS total_amount,
       round(avg(score), 6) AS avg_score
FROM final GROUP BY 1, 2""",
        "card_risk_profile": f"""{base}
SELECT card_id, count(*) AS n_tx,
       CAST(sum(CASE WHEN score >= {cfg.fraud_threshold} THEN 1 ELSE 0 END) AS BIGINT) AS n_fraud,
       max(score) AS max_score,
       round(sum(amount), 6) AS total_amount
FROM final GROUP BY 1""",
        "merchant_risk": f"""{base}
SELECT merchant_category, count(*) AS n_tx,
       CAST(sum(CASE WHEN score >= {cfg.fraud_threshold} THEN 1 ELSE 0 END) AS BIGINT) AS n_fraud,
       round(avg(CASE WHEN score >= {cfg.fraud_threshold} THEN 1.0 ELSE 0.0 END), 6) AS fraud_rate
FROM final GROUP BY 1""",
    }
