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


# logical nodes whose presence means the frame's OUTPUT width is the
# shuffle width (spark.sql.shuffle.partitions), not the scan's split
# count — matched EXACTLY against node class names from a plan walk
# (never substrings of the plan string: an attribute named "JoinDate"
# must not disable widening)
_SHUFFLE_NODE_NAMES = frozenset({
    "Repartition", "RepartitionByExpression", "RebalancePartitions",
    "Aggregate", "Join", "Window", "Sort", "Deduplicate",
})


def _logical_node_names(optimized) -> list[str]:
    """Exact class names of every node in the optimized logical plan
    (py4j tree walk, same move as the cache-audit tests' physical
    walk — no string parsing)."""
    names = []
    stack = [optimized]
    while stack:
        p = stack.pop()
        names.append(p.getClass().getSimpleName())
        ch = p.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return names


def _estimated_scan_splits(df: DataFrame) -> int:
    """Estimate how many input partitions the file scan will yield,
    WITHOUT touching `df.rdd` (which forces physical planning + RDD
    conversion — a fixed per-call cost this helper exists to avoid).

    Mirrors FilePartition packing: splits ≈ (bytes + n_files·openCost)
    / maxPartitionBytes, floored at 1. Size comes from the optimized
    plan's statistics (for parquet relations: actual on-disk bytes),
    file count from `inputFiles()` — both analysis-level, no job, no
    physical plan.

    Returns 0 (caller leaves the input untouched) for frames whose
    width is NOT the scan's split count:
    - shuffle-downstream frames — already shuffle-partitions wide
      (inputFiles() traverses through shuffles, so the file estimate
      would be wrong);
    - non-file-backed frames — LocalRelation scans self-parallelize
      (LocalTableScanExec slices rows across min(n_rows,
      defaultParallelism) partitions), so a CPU-heavy stage over a
      local test frame is already as wide as the cluster; ranges
      likewise default to defaultParallelism slices."""
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return 0
    if n_files == 0:
        return 0
    spark = df.sparkSession
    optimized = df._jdf.queryExecution().optimizedPlan()
    if any(n in _SHUFFLE_NODE_NAMES for n in _logical_node_names(optimized)):
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
