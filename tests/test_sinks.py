"""JDBC sink wiring + checkpointed-restart (exactly-once) semantics."""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.sources.jdbc import jdbc_batch_writer
from real_time_fraud_detection_flink_kafka_spark.streaming.dedup_stream import (
    run_dedup_stream_durable,
)


def test_jdbc_batch_writer_wiring(spark):
    """No JDBC driver in this env: inject a recorder in place of the
    actual save and check the batch-id stamping + option plumbing."""
    recorded = []

    def fake_save(batch, url, table, properties):
        recorded.append((batch.columns, batch.count(), url, table, properties))

    write = jdbc_batch_writer("jdbc:postgresql://db/frauddb", "alerts",
                              {"user": "fraud"}, save=fake_save)
    df = spark.range(3).toDF("event_id")
    write(df, 42)
    (cols, n, url, table, props), = recorded
    assert cols == ["event_id", "batch_id"] and n == 3
    assert url.startswith("jdbc:postgresql") and table == "alerts"
    assert props == {"user": "fraud"}
    assert df.sparkSession is spark  # no hidden session swap


def test_checkpoint_restart_writes_no_duplicates(spark, sf_dir, tmp_path):
    """With a durable checkpoint + parquet sink, a restarted drain
    resumes from committed source offsets and re-reads NOTHING: the
    sink holds exactly the same rows after run 2 as after run 1 —
    file-source exactly-once."""
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    first = run_dedup_stream_durable(spark, sf_dir, out, chk).count()
    assert first > 0
    second = run_dedup_stream_durable(spark, sf_dir, out, chk).count()
    assert second == first
