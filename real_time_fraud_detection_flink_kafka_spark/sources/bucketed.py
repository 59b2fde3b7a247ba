"""Bucketed-table helpers: pre-shuffle data ONCE at write time so
repeated joins/aggregations on the bucket key run exchange-free.

At 100 TB this is the difference between re-shuffling the fact table
on every query and paying the shuffle once at ingest: a join of two
tables bucketed on the same key with the same bucket count compiles
to SortMergeJoin with zero Exchange (verified in
tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 8,
                   sort: bool = True) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), key)
