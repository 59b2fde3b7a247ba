"""Batch analog of the reference's Flink KeyedProcessFunction
(/root/reference/flink/fraud_detection.py:54-128 and
fraud_detector_TAG.py:53-146), re-expressed Spark-first.

The Flink job keeps keyed state per card (recent tx timestamps, last
location, last event time) and scores each event. Over a bounded
table with event-time ordering, that state machine is exactly two
window functions over ONE hash partitioning by card_id:

- RAPID_TRANSACTIONS: ``count(*) OVER (PARTITION BY card_id ORDER BY
  ts_us RANGE BETWEEN W PRECEDING AND CURRENT ROW)`` — identical to
  the ListState filtered to the trailing window
  (fraud_detection.py:90-96), assuming event-time order (which the
  batch sort guarantees; the streaming variant handles disorder with
  a watermark like the reference does).
- IMPOSSIBLE_TRAVEL: ``lag(location), lag(ts_us)`` — identical to
  last_loc/last_time ValueState (fraud_detection.py:98-111).

Everything stays in whole-stage codegen: no Python UDFs, one shuffle
(Exchange hashpartitioning(card_id)), two in-partition sorts. At
cluster scale this is the minimal plan for keyed scoring: shuffle is
unavoidable (keyed semantics), and cards are high-cardinality/small
so no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.config import RuleConfig
from real_time_fraud_detection_flink_kafka_spark.functions.geo import haversine_between_locations
from real_time_fraud_detection_flink_kafka_spark.functions.transactions import transactions_from_events

REASON_HIGH = "HIGH_AMOUNT"
REASON_RAPID = "RAPID_TRANSACTIONS"
REASON_TRAVEL = "IMPOSSIBLE_TRAVEL"


def with_rule_columns(tx: DataFrame, cfg: RuleConfig) -> DataFrame:
    """Add velocity_cnt, prev_loc/prev_ts_us, rule booleans, score,
    status, severity, reasons to a transaction frame.

    Requires columns: event_id, card_id, amount, location, ts_us.
    """
    w_range = (
        Window.partitionBy("card_id")
        .orderBy("ts_us")
        .rangeBetween(-cfg.rapid_window_ms * 1000, 0)
    )
    w_lag = Window.partitionBy("card_id").orderBy("ts_us", "event_id")

    df = tx.withColumns({
        "velocity_cnt": F.count(F.lit(1)).over(w_range),
        "prev_loc": F.lag("location").over(w_lag),
        "prev_ts_us": F.lag("ts_us").over(w_lag),
    })

    r_high = df["amount"] > F.lit(cfg.max_amount)
    r_rapid = df["velocity_cnt"] >= F.lit(cfg.rapid_tx_count)
    travel_km = haversine_between_locations(df["prev_loc"], df["location"])
    r_travel = (
        df["prev_loc"].isNotNull()
        & (df["location"] != df["prev_loc"])
        & ((df["ts_us"] - df["prev_ts_us"]) <= F.lit(cfg.impossible_travel_ms * 1000))
        & (travel_km > F.lit(cfg.travel_min_km))
    )
    # materialize booleans first so score/status/reasons reference the
    # named columns instead of re-expanding the haversine tree 6×
    # (null-safe: any NULL rule input means the rule did not fire)
    df = df.withColumns({
        "r_high_amount": F.coalesce(r_high, F.lit(False)),
        "r_rapid": F.coalesce(r_rapid, F.lit(False)),
        "r_travel": F.coalesce(r_travel, F.lit(False)),
    })

    score = (
        F.when(df["r_high_amount"], cfg.score_high_amount).otherwise(0)
        + F.when(df["r_rapid"], cfg.score_rapid).otherwise(0)
        + F.when(df["r_travel"], cfg.score_travel).otherwise(0)
    ).cast("int")
    df = df.withColumn("score", score)

    return df.withColumns({
        "status": F.when(df["score"] >= cfg.fraud_threshold, "FRAUD").otherwise("LEGIT"),
        "severity": F.when(df["score"] >= cfg.high_severity_threshold, "HIGH").otherwise("NONE"),
        "reasons": F.concat_ws(
            ",",
            F.when(df["r_high_amount"], REASON_HIGH),
            F.when(df["r_rapid"], REASON_RAPID),
            F.when(df["r_travel"], REASON_TRAVEL),
        ),
    })


OUTPUT_COLS = ["event_id", "card_id", "amount", "location", "velocity_cnt",
               "score", "status", "severity", "reasons", "ts_us"]


def fraud_scores(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    """Full scoring pipeline over the events table (flagship).

    Output parity with the reference's result dict
    (fraud_detector_TAG.py:116-126), reasons as a comma-joined string.
    """
    return with_rule_columns(transactions_from_events(events), cfg).select(*OUTPUT_COLS)


def rule_high_amount(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    tx = transactions_from_events(events)
    return (tx.where(tx["amount"] > cfg.max_amount)
              .select("event_id", "card_id", "amount", "location", "ts_us"))


def rule_velocity(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    """Per-event trailing-window transaction count; rows that trip the
    rapid-transactions rule."""
    df = with_rule_columns(transactions_from_events(events), cfg)
    return (df.where(df["r_rapid"])
              .select("event_id", "card_id", "velocity_cnt", "ts_us"))


def rule_impossible_travel(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    df = with_rule_columns(transactions_from_events(events), cfg)
    return (df.where(df["r_travel"])
              .select("event_id", "card_id", "prev_loc", "location",
                      F.round(haversine_between_locations(df["prev_loc"], df["location"]), 3).alias("travel_km"),
                      "ts_us"))


def fraud_rules(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    """All three reference rules (fraud_detection.py:87-111) as ONE
    tagged relation: (rule, event_id, card_id, measure, ts_us), where
    measure is the rule's own evidence (amount / trailing count /
    travel km). A row-local explode of a 3-struct rules array over
    one scored lineage — ONE scan, one card_id exchange, one window
    pass, versus 3× each for a union of per-rule filters.
    explode_outer, not explode: the same pre-filter-sinking trap as
    dedup.shingles (plain explode plants a size()>0 pre-filter whose
    array expression re-evaluates below the exchange)."""
    df = with_rule_columns(transactions_from_events(events), cfg)
    rules = F.array(
        F.struct(F.lit(REASON_HIGH).alias("rule"),
                 df["r_high_amount"].alias("fired"),
                 df["amount"].alias("measure")),
        F.struct(F.lit(REASON_RAPID).alias("rule"),
                 df["r_rapid"].alias("fired"),
                 df["velocity_cnt"].cast("double").alias("measure")),
        F.struct(F.lit(REASON_TRAVEL).alias("rule"),
                 df["r_travel"].alias("fired"),
                 F.round(haversine_between_locations(df["prev_loc"], df["location"]), 3)
                  .alias("measure")),
    )
    return (df.select("event_id", "card_id", "ts_us",
                      F.explode_outer(rules).alias("r"))
              .where(F.col("r.fired"))
              .select(F.col("r.rule").alias("rule"), "event_id", "card_id",
                      F.col("r.measure").alias("measure"), "ts_us"))


def fraud_alerts(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    """Side-output analog: FRAUD_ALERT_TAG rows (score >= threshold),
    fraud_detector_TAG.py:134-135."""
    df = with_rule_columns(transactions_from_events(events), cfg)
    return (df.where(df["score"] >= cfg.fraud_threshold)
              .select("event_id", "card_id", "amount", "location",
                      "score", "severity", "reasons", "ts_us"))


def risk_audit(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    """Side-output analog: RISK_AUDIT_TAG rows (every event),
    fraud_detector_TAG.py:137-144."""
    df = with_rule_columns(transactions_from_events(events), cfg)
    return df.select("card_id", "score",
                     F.col("reasons").alias("rules_triggered"),
                     F.col("ts_us").alias("event_time_us"))


def fraud_summary(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    """Aggregate fraud mix by status × severity."""
    df = with_rule_columns(transactions_from_events(events), cfg)
    return (df.groupBy("status", "severity")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.avg("amount"), 6).alias("avg_amount"),
                   F.round(F.sum("amount"), 6).alias("total_amount"),
                   F.round(F.avg("score"), 6).alias("avg_score")))


def card_risk_profile(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    """Per-card risk rollup (the 'state at end of stream' view)."""
    df = with_rule_columns(transactions_from_events(events), cfg)
    return (df.groupBy("card_id")
              .agg(F.count(F.lit(1)).alias("n_tx"),
                   F.sum(F.when(df["status"] == "FRAUD", 1).otherwise(0)).cast("bigint").alias("n_fraud"),
                   F.max("score").alias("max_score"),
                   F.round(F.sum("amount"), 6).alias("total_amount")))


def merchant_risk(events: DataFrame, cfg: RuleConfig) -> DataFrame:
    """Fraud rate by derived merchant category."""
    df = with_rule_columns(transactions_from_events(events), cfg)
    return (df.groupBy("merchant_category")
              .agg(F.count(F.lit(1)).alias("n_tx"),
                   F.sum(F.when(df["status"] == "FRAUD", 1).otherwise(0)).cast("bigint").alias("n_fraud"),
                   F.round(F.avg(F.when(df["status"] == "FRAUD", 1.0).otherwise(0.0)), 6).alias("fraud_rate")))
