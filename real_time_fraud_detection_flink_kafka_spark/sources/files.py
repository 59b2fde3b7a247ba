"""Parquet table loaders.

The testdata parquet stores timestamps as INT64 TIMESTAMP(NANOS),
which Spark's vectorized reader rejects. With
``spark.sql.legacy.parquet.nanosAsLong=true`` they arrive as long
nanoseconds; we normalize to microsecond TimestampType here (all
generated values are µs-aligned, so ``DIV 1000`` is lossless and
matches DuckDB's read of the same files).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# table -> columns stored as TIMESTAMP(NANOS)
NS_TIMESTAMP_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings"]


def _normalize_ns(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_ns(df, NS_TIMESTAMP_COLS.get(name, []))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    out = {}
    for n in TABLE_NAMES:
        if os.path.exists(os.path.join(sf_dir, f"{n}.parquet")):
            out[n] = load_table(spark, sf_dir, n)
    return out
