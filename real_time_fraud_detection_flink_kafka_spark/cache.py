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
    """Unpersist every tracked relation; returns how many were freed.
    Safe to call with dead SparkSessions in the list (errors ignored:
    an unpersist on a stopped session has nothing to free)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n
