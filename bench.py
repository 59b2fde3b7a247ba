"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": <sf>}

Each query is forced end-to-end with a noop sink (full computation,
no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from real_time_fraud_detection_flink_kafka_spark.registry import QUERIES
from real_time_fraud_detection_flink_kafka_spark.session import get_spark

HEADLINE = [
    "fraud_scores",
    "fraud_alerts",
    "card_risk_profile",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "sessionize",
    "windowed_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_simhash",
    "ann_topk",
    "ann_lsh",
    "ann_lsh_fast",
    "ann_ivf",
    "token_count",
    "doc_fingerprint",
    "multimodal_decode",
    "q18_large_orders",
    "q19_discounted_revenue",
    "decontaminate",
    "vocab_topk",
    "chunk_documents",
    "pack_sequences",
    "stream_fraud_detector",  # full Structured Streaming drain (file → state → sink)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/session so query 1 doesn't pay startup cost, and the
    # Python/Arrow worker pool so the first mapInPandas query doesn't
    # pay the one-time fork+import cost (workers are reused after)
    QUERIES["q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    def _warm(it):
        import numpy  # noqa: F401  (preload into reused workers)
        yield from it

    (spark.range(64).repartition(32)
     .mapInPandas(_warm, "id long")
     .write.format("noop").mode("overwrite").save())

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
