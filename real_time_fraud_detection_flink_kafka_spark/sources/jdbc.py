"""JDBC sink — parity with the reference's staged Postgres connector
jars (/root/reference/custom_lib/: flink-connector-jdbc-postgres +
postgresql driver; no reference job wires them, so this is the
matching "ready to point at a database" surface).

Streaming writes go through foreachBatch: Spark's jdbc relation is a
batch sink, and foreachBatch is the supported exactly-once-per-batch
bridge — the stream checkpoint records the batch id, and a restart
re-runs only uncommitted batches. True exactly-once then needs the
write itself idempotent: include `batch_id` in the target table and
upsert/merge on it (or stage to a batch-id-named table and swap), as
noted per-batch below.

No JDBC driver ships in this environment, so tests inject a recorder
in place of the actual `.save()`; the builder logic (options, modes,
batch wiring) is exercised for real.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def write_jdbc_batch(batch: DataFrame, url: str, table: str,
                     properties: dict[str, str] | None = None,
                     mode: str = "append") -> None:
    """One batch → one JDBC write. numPartitions bounds the connection
    count (one connection per partition is the Spark JDBC model —
    at 1000 executors you cap this well below the DB's limit)."""
    w = (batch.write.format("jdbc")
         .option("url", url)
         .option("dbtable", table))
    for k, v in (properties or {}).items():
        w = w.option(k, v)
    w.mode(mode).save()


def jdbc_batch_writer(url: str, table: str,
                      properties: dict[str, str] | None = None,
                      with_batch_id: bool = True,
                      save: Callable[..., None] = write_jdbc_batch
                      ) -> Callable[[DataFrame, int], None]:
    """foreachBatch function appending each micro-batch to `table`.

    `with_batch_id` stamps the epoch id on every row so a replayed
    batch (restart between sink write and checkpoint commit) is
    detectable/idempotent on the DB side (unique index on
    (batch_id, key) or MERGE). `save` is injectable for tests."""
    from pyspark.sql import functions as F

    def write(batch: DataFrame, batch_id: int) -> None:
        if with_batch_id:
            batch = batch.withColumn("batch_id", F.lit(batch_id))
        save(batch, url, table, properties)

    return write


def alerts_to_jdbc(alerts: DataFrame, url: str, table: str,
                   checkpoint_dir: str,
                   properties: dict[str, str] | None = None
                   ) -> DataStreamWriter:
    """writeStream of detector output into a JDBC table (the
    reference's staged-but-unwired Postgres path, completed).
    Caller `.start()`s; the checkpoint makes restarts resume from the
    last committed batch."""
    return (alerts.writeStream
            .foreachBatch(jdbc_batch_writer(url, table, properties))
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir))
