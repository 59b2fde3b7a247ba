"""Streaming SCD Type-2 history maintenance — the CDC consumer shape
of `operators/analytics.scd2_user_segments`: a keyed stateful fold
(applyInPandasWithState, keyed by user) holds each user's OPEN
dimension version in state and EMITS a history row the moment a
change CLOSES it — exactly what a CDC→SCD2 pipeline does
incrementally instead of rebuilding history each night.

Contract vs the batch operator: the stream emits the CLOSED versions
(valid_to_us always real); the open (is_current) version lives in the
state store until a later change closes it, so the drained result
equals the batch history MINUS its open rows — the registry oracle
states precisely that (`WHERE NOT is_current`).

Rows within a micro-batch are processed in event-time order per user
(same discipline as the fraud detector, fraud_stream.py), so a
single-batch drain is row-for-row identical to the batch operator's
closed set; an unbounded deployment would add watermark-delayed
buffering for cross-batch reordering.

Scale: state per user is 4 scalars (open segment, start, count,
version) — O(1) regardless of stream length; users partition across
executors like Flink key groups.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from real_time_fraud_detection_flink_kafka_spark.sources.files import raw_events_schema

SCD2_OUTPUT_SCHEMA = ("user_id bigint, version int, segment string, "
                      "valid_from_us bigint, valid_to_us bigint, "
                      "n_events int")
SCD2_STATE_SCHEMA = ("segment string, valid_from_us bigint, "
                     "n_events int, version int")
_OUT_COLS = ["user_id", "version", "segment",
             "valid_from_us", "valid_to_us", "n_events"]


def scd2_collapse(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold a user's events into run-collapsed versions; emit each
    version as its successor closes it, keep the open one in state."""
    (user_id,) = key
    seg, vfrom, n, ver = (state.get if state.exists else (None, 0, 0, 0))
    rows = (pd.concat(list(pdfs), ignore_index=True)
            .sort_values(["ts_us", "event_id"]))  # event-time order
    # ordering is guaranteed only WITHIN a micro-batch; an event
    # arriving in a later batch with ts before the open version's
    # start would silently corrupt the history (valid_to < valid_from)
    # — fail loudly until watermark-delayed cross-batch buffering
    # exists. availableNow over one parquet file never trips this.
    if seg is not None and len(rows) and int(rows["ts_us"].iloc[0]) < vfrom:
        raise ValueError(
            f"scd2_collapse: out-of-order cross-batch event for user "
            f"{user_id} (ts_us {int(rows['ts_us'].iloc[0])} < open "
            f"version start {vfrom}); cross-batch reordering needs "
            f"watermark-delayed buffering")
    out: list[dict] = []
    for r in rows.itertuples(index=False):
        ts_us = int(r.ts_us)
        etype = r.event_type
        if seg is None:
            seg, vfrom, n, ver = etype, ts_us, 1, 1
        elif etype == seg:
            n += 1
        else:
            out.append({"user_id": int(user_id), "version": int(ver),
                        "segment": seg, "valid_from_us": int(vfrom),
                        "valid_to_us": ts_us, "n_events": int(n)})
            seg, vfrom, n, ver = etype, ts_us, 1, ver + 1
    state.update((seg, int(vfrom), int(n), int(ver)))
    if out:
        # single-run users yield nothing (an empty all-NA frame would
        # also trip pandas' concat-dtype FutureWarning in the Arrow
        # serializer) — the generator just ends
        yield pd.DataFrame(out, columns=_OUT_COLS)


def scd2_stream(events: DataFrame, watermark: str = "5 seconds") -> DataFrame:
    """Apply the stateful SCD2 fold to a (streaming) events frame."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    sel = e.select("user_id", "event_id", "event_type", "ts",
                   F.unix_micros("ts").alias("ts_us"))
    return (sel.groupBy("user_id")
            .applyInPandasWithState(
                scd2_collapse,
                outputStructType=SCD2_OUTPUT_SCHEMA,
                stateStructType=SCD2_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_scd2_stream(spark, sf_dir: str,
                    query_name: str = "scd2_stream") -> DataFrame:
    """File-source stream → stateful fold → memory sink; bounded
    input drains under availableNow and stops itself."""
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = scd2_stream(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
