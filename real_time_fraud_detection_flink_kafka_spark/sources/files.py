"""Parquet table loaders.

The driver-generated testdata has shipped timestamps two ways across
rounds, and we normalize BOTH to session-UTC microsecond
TimestampType here so every operator sees one type:

- INT64 TIMESTAMP(NANOS) (rounds 1-3): Spark's vectorized reader
  rejects it outright; with ``spark.sql.legacy.parquet.nanosAsLong=
  true`` it arrives as long nanoseconds (µs-aligned, so ``DIV 1000``
  is lossless and matches DuckDB's read of the same files).
- TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 4+): arrives as
  TIMESTAMP_NTZ, which ``unix_micros``/watermarks won't take; the
  NTZ wall-clock is cast to an instant under the session tz, which
  ``ensure_session_confs`` pins to UTC — the same interpretation
  DuckDB's ``epoch_us`` gives the naive value.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# table -> timestamp columns needing normalization on read
NS_TIMESTAMP_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TABLE_NAMES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings"]


def _normalize_ns(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):  # TIMESTAMP(NANOS) via nanosAsLong
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, T.TimestampNTZType):  # TIMESTAMP(MICROS) unadjusted
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Set runtime confs required to read the testdata parquet on ANY
    SparkSession, including ones not built by our session.py (e.g. the
    correctness driver's).

    - ``nanosAsLong``: the testdata stores INT64 TIMESTAMP(NANOS), which
      the vectorized reader rejects outright without this flag.
    - UTC session tz: oracles compare epoch-µs values; any
      ``date_trunc``/``to_date`` path is tz-sensitive under a session
      whose tz we don't control.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # If the session still has Spark's out-of-the-box shuffle
    # parallelism (200), size it to the actual cluster instead: AQE
    # coalesces over-partitioned BATCH shuffles at runtime, but
    # stateful STREAMING shuffles cannot coalesce — each of the 200
    # partitions materializes its own state store per micro-batch,
    # which dominates small-to-medium drains. A user who tuned the
    # conf themselves is left alone.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(spark.sparkContext.defaultParallelism))
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Spark's Python WORKERS.

    The grading driver imports ``__spark_entry__`` from an arbitrary
    cwd; its ``sys.path`` insert only fixes the DRIVER process. Pandas
    UDFs / mapInPandas / applyInPandasWithState pickle functions BY
    REFERENCE to this module, and the forked workers then fail with
    ``ModuleNotFoundError`` unless the package is shipped to them. A
    zip via ``addPyFile`` is the standard mechanism and lands on every
    worker's ``sys.path`` (works identically on a real cluster).
    """
    sc = spark.sparkContext
    if getattr(sc, "_rtfd_pkg_shipped", False):
        return
    pkg_dir = Path(__file__).resolve().parent.parent
    zip_path = Path(tempfile.gettempdir()) / f"rtfd_pkg_{os.getpid()}.zip"
    if not zip_path.exists():
        with zipfile.ZipFile(zip_path, "w") as zf:
            for p in sorted(pkg_dir.rglob("*.py")):
                zf.write(p, arcname=str(Path(pkg_dir.name)
                                        / p.relative_to(pkg_dir)))
    sc.addPyFile(str(zip_path))
    sc._rtfd_pkg_shipped = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_ns(df, NS_TIMESTAMP_COLS.get(name, []))


def raw_events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Schema of events.parquet as stored (ts as long ns or NTZ,
    format-dependent) — for ``readStream`` schema inference in the
    streaming runners, which normalize with ``_normalize_ns``."""
    ensure_session_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    out = {}
    for n in TABLE_NAMES:
        if os.path.exists(os.path.join(sf_dir, f"{n}.parquet")):
            out[n] = load_table(spark, sf_dir, n)
    return out
