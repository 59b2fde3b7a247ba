"""Cache-lifetime tracking for persisted intermediates.

Every `persist()` inside a query builder goes through
`tracked_persist()`; `release_caches()` frees everything tracked.

Contract: a builder CANNOT unpersist its own intermediates — the
returned DataFrame is lazy and still reads the cached relations when
the caller finally materializes it. So cache lifetime is owned by the
caller: run-once drivers (the grading driver collects one query per
process) may skip cleanup entirely and let session teardown free the
storage; long-lived sessions running many queries (bench.py, the
oracle sim, the pytest suite) call `release_caches()` after each
materialization so storage memory never accumulates across queries.

Loop-internal relations whose lifetime ends INSIDE the builder
(per-round label frontiers in `dedup_clusters`) are freed early with
`untrack_unpersist()`.

`localCheckpoint(eager=True)` (the iterative engines' per-round
lineage cut) persists INTERNAL RDDs that no DataFrame-level
`unpersist()` reaches — left alone they accumulate across a
long-lived session until JVM GC + ContextCleaner get around to them.
`release_caches()` therefore also sweeps the context's remaining
persistent RDDs. That makes release STRICTLY a between-queries
operation: a checkpointed result CANNOT be re-materialized after
release (its lineage is truncated to the freed blocks) — every
caller (bench reps, oracle sim, pytest) rebuilds the query from the
registry instead of re-running a released DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for later release_caches()."""
    out = df.persist()
    _TRACKED.append(out)
    return out


def untrack_unpersist(df: DataFrame) -> None:
    """Free a tracked relation early (builder-internal lifetime)."""
    df.unpersist()
    try:
        _TRACKED.remove(df)
    except ValueError:
        pass


def release_caches(blocking: bool = False) -> int:
    """Unpersist every tracked relation, then sweep localCheckpoint
    residue (see module docstring); returns how many TRACKED
    relations were freed. Safe to call with dead SparkSessions in the
    list (errors ignored: an unpersist on a stopped session has
    nothing to free)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    try:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        if sc is not None:
            jmap = sc._jsc.getPersistentRDDs()
            for k in list(jmap.keys()):
                jmap[k].unpersist(blocking)
    except Exception:
        pass
    return n
