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

import math

from pyspark.sql import DataFrame


def _bytes_conf(spark, key: str, default: int) -> int:
    """Parse a Spark byte-string conf ("128MB", "4194304b", "1g")."""
    raw = spark.conf.get(key, None)
    if raw is None:
        return default
    s = raw.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    for suffix, mult in [("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                         ("tb", 1 << 40), ("b", 1)]:
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def _estimated_scan_splits(df: DataFrame) -> int:
    """Estimate how many input partitions the file scan will yield,
    WITHOUT touching `df.rdd` (which forces physical planning + RDD
    conversion — a fixed per-call cost this helper exists to avoid).

    Mirrors FilePartition packing: splits ≈ (bytes + n_files·openCost)
    / maxPartitionBytes, floored at 1. Size comes from the optimized
    plan's statistics (for parquet relations: actual on-disk bytes),
    file count from `inputFiles()` — both analysis-level, no job, no
    physical plan. Returns 0 for non-file-backed frames (caller then
    leaves the input untouched: `spread` is documented for scan-rooted
    inputs, and shuffle-produced frames are already
    `spark.sql.shuffle.partitions` wide)."""
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return 0
    if n_files == 0:
        return 0
    spark = df.sparkSession
    optimized = df._jdf.queryExecution().optimizedPlan()
    plan_str = optimized.toString()
    # a shuffle-introducing node anywhere means the OUTPUT width is
    # spark.sql.shuffle.partitions, not the scan's split count
    # (inputFiles() traverses through shuffles, so the file estimate
    # below would be wrong for such frames)
    if any(node in plan_str for node in
           ("Repartition", "Aggregate", "Join", "Window", "Sort")):
        return 0
    size = int(str(optimized.stats().sizeInBytes()))
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    return max(1, math.ceil((size + n_files * open_cost) / max(max_pb, 1)))


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen `df` to at least the cluster's default parallelism before
    a CPU-heavy stage; no-op when the input is already wide enough
    (estimated from plan-side scan statistics, never `.rdd`)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    splits = _estimated_scan_splits(df)
    if 0 < splits < target:
        return df.repartition(target)
    return df
