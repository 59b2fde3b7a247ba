"""Local mirror of the driver's t2 gate: every registered oracle runs
on DuckDB and Spark at sf0.001 and must match (sorted, value-exact up
to dtype widening)."""

from __future__ import annotations

import pandas as pd
import pytest

from real_time_fraud_detection_flink_kafka_spark.registry import ORACLES, QUERIES


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    got = _norm(QUERIES[name](spark, sf_dir).toPandas())
    want = _norm(duck.execute(ORACLES[name]).fetchdf())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert got.shape == want.shape, f"{name}: shape {got.shape} != {want.shape}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0
