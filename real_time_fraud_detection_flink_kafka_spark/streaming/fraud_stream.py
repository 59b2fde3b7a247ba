"""Structured Streaming fraud detector — the direct analog of the
reference's KeyedProcessFunction
(/root/reference/flink/fraud_detection.py:54-128):

Flink concept                      → Spark concept here
-----------------------------------------------------------------
key_by(card_id)                    → groupBy("card_id") + applyInPandasWithState
ListState("txs") (+TTL)            → state tuple field tx_times (array<long>)
ValueState("loc"/"time") (+TTL)    → state tuple fields last_loc/last_time
StateTtlConfig 10 min              → GroupStateTimeout.ProcessingTimeTimeout
for_bounded_out_of_orderness(5 s)  → withWatermark("ts", "5 seconds")
side outputs (fraud/audit tags)    → foreachBatch router (router.py)

Rows within a micro-batch are processed in event-time order per card,
so a single-batch run is row-for-row identical to the batch analog
(operators/fraud.py) — that equivalence is the streaming correctness
gate (tests/test_fraud_stream.py and the `stream_fraud_detector`
registry entry, which shares the batch oracle).

Scale: state per card is O(events in the rapid window) + 2 scalars,
TTL-evicted — bounded regardless of stream length; cards partition
across executors exactly like Flink's key groups.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from real_time_fraud_detection_flink_kafka_spark.config import (
    LOCATION_COORDS,
    RuleConfig,
)
from real_time_fraud_detection_flink_kafka_spark.functions.transactions import (
    EVENT_TYPE_CATEGORY,
)
from real_time_fraud_detection_flink_kafka_spark.sources.files import raw_events_schema

OUTPUT_SCHEMA = ("event_id bigint, card_id string, amount double, "
                 "location string, velocity_cnt bigint, score int, "
                 "status string, severity string, reasons string, ts_us bigint")

STATE_SCHEMA = "tx_times array<bigint>, last_loc string, last_time bigint"


def _haversine_km(a: tuple[float, float], b: tuple[float, float]) -> float:
    import math

    lat1, lon1 = a
    lat2, lon2 = b
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    x = (math.sin(dlat / 2) ** 2
         + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
         * math.sin(dlon / 2) ** 2)
    return 2 * 6371.0 * math.atan2(math.sqrt(x), math.sqrt(1 - x))


def make_detector(cfg: RuleConfig, with_ttl: bool = True):
    """Build the applyInPandasWithState function for a RuleConfig.

    with_ttl=True arms a processing-time timeout per update (Flink's
    StateTtlConfig OnCreateAndWrite). Use False for bounded drains:
    an armed timeout makes the engine schedule state-cleanup
    micro-batches forever, so an availableNow run never terminates."""

    def detect(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry — same effect as Flink's StateTtlConfig
            state.remove()
            return

        (card_id,) = key
        tx_times, last_loc, last_time = (
            state.get if state.exists else ([], None, None))
        tx_times = list(tx_times)

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])  # event-time order

        # Velocity with RANGE-frame tie semantics (matches the batch
        # oracle's `RANGE BETWEEN w PRECEDING AND CURRENT ROW`): events
        # sharing a ts_us are peers — each counts ALL of them, not just
        # the ones that sorted earlier.
        window_us = cfg.rapid_window_ms * 1000
        vel_cnt: dict[int, int] = {}
        for ts_us, n_peers in rows["ts_us"].astype("int64").value_counts().sort_index().items():
            ts_us = int(ts_us)
            tx_times = [t for t in tx_times if ts_us - t <= window_us]
            tx_times.extend([ts_us] * int(n_peers))
            vel_cnt[ts_us] = len(tx_times)

        out: list[dict] = []
        for r in rows.itertuples(index=False):
            ts_us = int(r.ts_us)
            score = 0
            reasons = []

            if r.amount > cfg.max_amount:
                score += cfg.score_high_amount
                reasons.append("HIGH_AMOUNT")

            if vel_cnt[ts_us] >= cfg.rapid_tx_count:
                score += cfg.score_rapid
                reasons.append("RAPID_TRANSACTIONS")

            if (last_loc is not None and last_time is not None
                    and r.location != last_loc
                    and ts_us - last_time <= cfg.impossible_travel_ms * 1000
                    and r.location in LOCATION_COORDS
                    and last_loc in LOCATION_COORDS):
                dist = _haversine_km(LOCATION_COORDS[last_loc],
                                     LOCATION_COORDS[r.location])
                if dist > cfg.travel_min_km:
                    score += cfg.score_travel
                    reasons.append("IMPOSSIBLE_TRAVEL")

            out.append({
                "event_id": int(r.event_id),
                "card_id": card_id,
                "amount": float(r.amount),
                "location": r.location,
                "velocity_cnt": vel_cnt[ts_us],
                "score": score,
                "status": "FRAUD" if score >= cfg.fraud_threshold else "LEGIT",
                "severity": "HIGH" if score >= cfg.high_severity_threshold else "NONE",
                "reasons": ",".join(reasons),
                "ts_us": ts_us,
            })
            last_loc, last_time = r.location, ts_us

        state.update((tx_times, last_loc, last_time))
        if with_ttl:
            state.setTimeoutDuration(cfg.state_ttl_ms)  # TTL OnCreateAndWrite
        yield pd.DataFrame(out)

    return detect


def tx_stream_from_events(events: DataFrame) -> DataFrame:
    """events (streaming or static) → transaction columns, mirroring
    functions/transactions.py, plus the event-time column for the
    watermark."""
    loc_arr = F.array(*[F.lit(c) for c in LOCATION_COORDS])
    cat = F.lit("ATM")
    for k, v in EVENT_TYPE_CATEGORY.items():
        cat = F.when(F.col("event_type") == k, F.lit(v)).otherwise(cat)
    return events.select(
        F.col("event_id"),
        F.concat(F.lit("card_"), F.col("user_id").cast("string")).alias("card_id"),
        F.col("value").alias("amount"),
        F.element_at(loc_arr, (F.get_json_object("props", "$.k").cast("int")
                               % len(LOCATION_COORDS)) + 1).alias("location"),
        F.col("ts"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )


def detect_stream(tx: DataFrame, cfg: RuleConfig,
                  watermark: str = "5 seconds",
                  with_ttl: bool = True) -> DataFrame:
    """Apply the stateful detector to a (streaming) transaction frame.
    with_ttl=False for bounded drains (see make_detector)."""
    if tx.isStreaming:
        tx = tx.withWatermark("ts", watermark)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if with_ttl
               else GroupStateTimeout.NoTimeout)
    return (tx.groupBy("card_id")
              .applyInPandasWithState(
                  make_detector(cfg, with_ttl=with_ttl),
                  outputStructType=OUTPUT_SCHEMA,
                  stateStructType=STATE_SCHEMA,
                  outputMode="append",
                  timeoutConf=timeout))


def run_stream_over_events_dir(spark, sf_dir: str, cfg: RuleConfig,
                               query_name: str = "fraud_stream") -> DataFrame:
    """Run the streaming detector over the events table via a real
    file-source stream into a memory sink; return the result frame.
    (Bounded input → the stream drains and stops.)"""
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns

    raw_schema = raw_events_schema(spark, sf_dir)  # ts as stored
    stream = (spark.readStream.schema(raw_schema)
              .option("maxFilesPerTrigger", "1")
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = detect_stream(tx_stream_from_events(stream), cfg, with_ttl=False)
    # availableNow: drain everything, then the query stops itself —
    # with ProcessingTimeTimeout state, processAllAvailable() would
    # chase timeout-driven empty micro-batches forever
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
