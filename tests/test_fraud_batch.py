"""Rule unit tests on hand-built frames with known outcomes, incl.
boundary conditions from the reference constants
(fraud_detection.py:20-24, 87-122)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_fraud_detection_flink_kafka_spark.config import LOCATION_COORDS, RuleConfig
from real_time_fraud_detection_flink_kafka_spark.functions.geo import haversine_between_locations
from real_time_fraud_detection_flink_kafka_spark.operators.fraud import with_rule_columns

CFG = RuleConfig()  # reference defaults: 200 / 10s / 3 / 120s / 500km

SCHEMA = "event_id long, card_id string, amount double, location string, ts_us long"


def _tx(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _scores(spark, rows):
    out = with_rule_columns(_tx(spark, rows), CFG).orderBy("event_id")
    return [r.asDict() for r in out.collect()]


SEC = 1_000_000  # µs


def test_high_amount_boundary(spark):
    rows = [(1, "c", 200.0, "NY", 0), (2, "c", 200.01, "NY", 60 * SEC * 1000)]
    r = _scores(spark, rows)
    assert r[0]["r_high_amount"] is False  # strictly greater, ref :87
    assert r[1]["r_high_amount"] is True
    assert r[1]["score"] == 40 and r[1]["status"] == "FRAUD"


def test_velocity_exact_count(spark):
    # 3 tx within 10s trips the rule on the 3rd (ref :95-96 includes current)
    rows = [(1, "c", 10.0, "NY", 0),
            (2, "c", 10.0, "NY", 4 * SEC),
            (3, "c", 10.0, "NY", 9 * SEC),
            (4, "c", 10.0, "NY", 30 * SEC)]  # window slid: only 2 in range? (21s gap)
    r = _scores(spark, rows)
    assert [x["velocity_cnt"] for x in r] == [1, 2, 3, 1]
    assert [x["r_rapid"] for x in r] == [False, False, True, False]
    assert r[2]["score"] == 30 and r[2]["status"] == "LEGIT"  # 30 < 40


def test_velocity_window_boundary_inclusive(spark):
    rows = [(1, "c", 10.0, "NY", 0), (2, "c", 10.0, "NY", 10 * SEC)]
    r = _scores(spark, rows)
    assert r[1]["velocity_cnt"] == 2  # event_time - t <= 10_000 (ref :91)


def test_impossible_travel(spark):
    rows = [(1, "c", 10.0, "NY", 0),
            (2, "c", 10.0, "CA", 90 * SEC),        # 90s, NY→CA > 500km → trip
            (3, "c", 10.0, "CA", 200 * SEC),       # same location → no
            (4, "c", 10.0, "TX", 1000 * SEC)]      # 800s gap > 120s → no
    r = _scores(spark, rows)
    assert [x["r_travel"] for x in r] == [False, True, False, False]
    assert r[1]["score"] == 50 and r[1]["status"] == "FRAUD"
    assert "IMPOSSIBLE_TRAVEL" in r[1]["reasons"]


def test_travel_boundary_120s_inclusive(spark):
    rows = [(1, "c", 10.0, "NY", 0), (2, "c", 10.0, "CA", 120 * SEC)]
    r = _scores(spark, rows)
    assert r[1]["r_travel"] is True  # <= IMPOSSIBLE_TRAVEL_MS (ref :105)


def test_combined_score_and_severity(spark):
    # high amount + travel = 90 → FRAUD/HIGH; reasons ordered
    rows = [(1, "c", 10.0, "NY", 0), (2, "c", 300.0, "CA", 60 * SEC)]
    r = _scores(spark, rows)
    assert r[1]["score"] == 90
    assert r[1]["severity"] == "HIGH"
    assert r[1]["reasons"] == "HIGH_AMOUNT,IMPOSSIBLE_TRAVEL"


def test_keys_are_independent(spark):
    rows = [(1, "a", 10.0, "NY", 0), (2, "b", 10.0, "CA", 30 * SEC)]
    r = _scores(spark, rows)
    assert [x["r_travel"] for x in r] == [False, False]
    assert [x["velocity_cnt"] for x in r] == [1, 1]


@pytest.mark.parametrize("a,b,expect_km", [
    ("NY", "CA", 3935.7),  # NYC–LA
    ("NY", "IL", 1145.4),  # NYC–Chicago
])
def test_haversine_known_distances(spark, a, b, expect_km):
    df = spark.range(1).select(
        haversine_between_locations(F.lit(a), F.lit(b)).alias("km"))
    km = df.collect()[0]["km"]
    assert km == pytest.approx(expect_km, rel=0.01)


def test_all_city_pairs_exceed_500km(spark):
    # the travel rule's 500 km floor never filters these 5 cities
    cities = list(LOCATION_COORDS)
    pairs = [(a, b) for a in cities for b in cities if a < b]
    df = spark.createDataFrame(pairs, "a string, b string").select(
        haversine_between_locations(F.col("a"), F.col("b")).alias("km"))
    assert all(r["km"] > 500 for r in df.collect())
