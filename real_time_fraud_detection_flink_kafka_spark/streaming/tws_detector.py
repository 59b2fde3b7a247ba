"""transformWithStateInPandas fraud detector — the Spark 4.x API
whose state model maps 1:1 onto the reference's Flink
KeyedProcessFunction (/root/reference/flink/fraud_detection.py:54-73):

Flink                                  → transformWithStateInPandas
---------------------------------------------------------------------
ListStateDescriptor("txs", LONG)+TTL   → handle.getListState("txs", "ts BIGINT", ttlDurationMs)
ValueStateDescriptor("loc", STRING)+TTL→ handle.getValueState("loc", ..., ttlDurationMs)
ValueStateDescriptor("time", LONG)+TTL → handle.getValueState("t", ..., ttlDurationMs)
StateTtlConfig OnCreateAndWrite        → native per-state ttlDurationMs
process_element                        → handleInputRows (event-time sorted)

Requires the RocksDB state store (get_spark(rocksdb_state=True)) AND
the `protobuf` package (the TWS control channel speaks protobuf);
this container ships pyspark without protobuf, so the path is gated
by `tws_available()` and its test skips here. The
applyInPandasWithState detector (fraud_stream.py) is the tested
production path; this module is the drop-in upgrade where protobuf
exists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from real_time_fraud_detection_flink_kafka_spark.config import LOCATION_COORDS, RuleConfig
from real_time_fraud_detection_flink_kafka_spark.sources.files import raw_events_schema
from real_time_fraud_detection_flink_kafka_spark.streaming.fraud_stream import (
    OUTPUT_SCHEMA,
    _haversine_km,
)


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf at runtime."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class FraudStatefulProcessor(StatefulProcessor):
    """Rule scoring with native TTL'd keyed state."""

    def __init__(self, cfg: RuleConfig, with_ttl: bool = True):
        self.cfg = cfg
        self.with_ttl = with_ttl

    def init(self, handle: StatefulProcessorHandle) -> None:
        ttl = self.cfg.state_ttl_ms if self.with_ttl else None
        self.tx_state = handle.getListState("txs", "ts BIGINT", ttlDurationMs=ttl)
        self.last_loc = handle.getValueState("loc", "loc STRING", ttlDurationMs=ttl)
        self.last_time = handle.getValueState("t", "t BIGINT", ttlDurationMs=ttl)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timer_values) -> Iterator[pd.DataFrame]:
        cfg = self.cfg
        (card_id,) = key
        tx_times = [r[0] for r in self.tx_state.get()] if self.tx_state.exists() else []
        last_loc = self.last_loc.get()[0] if self.last_loc.exists() else None
        last_time = self.last_time.get()[0] if self.last_time.exists() else None

        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "event_id"])

        # RANGE-frame tie semantics (see fraud_stream.make_detector):
        # same-ts peers all count toward each other's velocity.
        window_us = cfg.rapid_window_ms * 1000
        vel_cnt: dict[int, int] = {}
        for ts_us, n_peers in pdf["ts_us"].astype("int64").value_counts().sort_index().items():
            ts_us = int(ts_us)
            tx_times = [t for t in tx_times if ts_us - t <= window_us]
            tx_times.extend([ts_us] * int(n_peers))
            vel_cnt[ts_us] = len(tx_times)

        out: list[dict] = []
        for r in pdf.itertuples(index=False):
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
                if _haversine_km(LOCATION_COORDS[last_loc],
                                 LOCATION_COORDS[r.location]) > cfg.travel_min_km:
                    score += cfg.score_travel
                    reasons.append("IMPOSSIBLE_TRAVEL")
            out.append({
                "event_id": int(r.event_id), "card_id": card_id,
                "amount": float(r.amount), "location": r.location,
                "velocity_cnt": vel_cnt[ts_us], "score": score,
                "status": "FRAUD" if score >= cfg.fraud_threshold else "LEGIT",
                "severity": "HIGH" if score >= cfg.high_severity_threshold else "NONE",
                "reasons": ",".join(reasons), "ts_us": ts_us,
            })
            last_loc, last_time = r.location, ts_us

        self.tx_state.put([(t,) for t in tx_times])
        self.last_loc.update((last_loc,))
        self.last_time.update((last_time,))
        yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def detect_stream_tws(tx: DataFrame, cfg: RuleConfig,
                      watermark: str = "5 seconds",
                      with_ttl: bool = True) -> DataFrame:
    """Apply the TWS detector (streaming frame; RocksDB store)."""
    if tx.isStreaming:
        tx = tx.withWatermark("ts", watermark)
    return (tx.groupBy("card_id")
              .transformWithStateInPandas(
                  FraudStatefulProcessor(cfg, with_ttl=with_ttl),
                  outputStructType=OUTPUT_SCHEMA,
                  outputMode="Append",
                  timeMode="ProcessingTime" if with_ttl else "None"))


def run_tws_over_events_dir(spark, sf_dir: str, cfg: RuleConfig,
                            query_name: str = "tws_stream") -> DataFrame:
    from real_time_fraud_detection_flink_kafka_spark.sources.files import _normalize_ns
    from real_time_fraud_detection_flink_kafka_spark.streaming.fraud_stream import (
        tx_stream_from_events,
    )

    raw_schema = raw_events_schema(spark, sf_dir)
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    stream = _normalize_ns(stream, ["ts"])
    out = detect_stream_tws(tx_stream_from_events(stream), cfg, with_ttl=False)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
