"""Partition-width control for CPU-bound per-row stages.

A stage whose per-row cost dwarfs its I/O (interpreted HOF folds,
Arrow-batched Python decode) is throughput-bound by the number of
partitions feeding it. At 100 TB the file scan yields thousands of
splits and this is a no-op; on a small input (one parquet file → one
partition) the stage runs on a single core unless widened. `spread`
repartitions ONLY when the input is narrower than the cluster — it
never adds a shuffle to an already-wide plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen `df` to at least the cluster's default parallelism before
    a CPU-heavy stage; no-op when the input is already wide enough."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
