"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": <sf>,
 "scale": {"replicas": R, "queries": {...}, "ratio_per_replica": {...}}}

Each query is forced end-to-end with a noop sink (full computation,
no driver collect).

The "scale" section is the measured scaling curve: for each factor R
in SPARK_GRAFT_SCALE (comma-separated, default "10,30") a re-keyed
R× copy of the base sf (see scale_testdata.py) is built once into
/tmp and a representative query subset re-run against it.
ratio_per_replica = t_scaled / t_base / R — 1.0 is perfectly linear
scaling, >1 flags super-linear plans. Two factors give the curve a
SHAPE: a query whose ratio grows from 10× to 30× is super-linear
even if both points are individually < 1. Disable with
SPARK_GRAFT_SCALE=0.

Cache hygiene: tracked persisted intermediates are released after
every query, and spark.catalog.clearCache() runs between the base
pass and each scale pass — without this the scaled runs inherit the
base pass's hot caches and ratio_per_replica is systematically
flattered (fixed-cost amortization masking a real regression).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from real_time_fraud_detection_flink_kafka_spark.registry import (
    DRIVER_WINDOW,
    QUERIES,
)
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
    "coincident_events",      # bin-bucketed non-equi range join (r6)
    "coincidence_pagerank",   # 5 power-iteration rounds over the pair graph (r6)
    "stream_fraud_detector",  # full Structured Streaming drain (file → state → sink)
]

# representative subset re-run at REPLICAS× the base sf: one per
# heavyweight operator family (keyed windows, joins/agg, pushdown,
# group-HAVING, hash dedup, banded LSH dedup, hyperplane LSH, corpus
# top-k, 8-gram decontamination)
SCALE_SUBSET = [
    "coincident_events",
    "fraud_scores",
    "q1_pricing_summary",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q18_large_orders",
    "dedup_exact",
    "dedup_minhash_lsh_fast",
    "ann_lsh_fast",
    "vocab_topk",
    "decontaminate",
]

# at factors >= BIG_FACTOR the curve narrows to one query per
# heavyweight family (keyed windows, full-fact agg, hash dedup,
# banded minhash LSH, scale-aware hyperplane LSH) — the third curve
# point exists to show where fixed overheads stop dominating, not to
# re-time the whole subset at 100x wall cost
BIG_FACTOR = 100
SCALE_SUBSET_BIG = [
    "fraud_scores",
    "q1_pricing_summary",
    "dedup_exact",
    "dedup_minhash_lsh_fast",
    "ann_lsh_fast",
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

    from real_time_fraud_detection_flink_kafka_spark.cache import release_caches

    def run_suite(names, data_dir, reps=1):
        """Per-query wall time; with reps > 1 the MIN over reps is
        reported — the stable estimator under transient host load (a
        co-tenant burst once produced a phantom 1.7× 'regression'
        that isolated re-timing disproved)."""
        out: dict[str, float] = {}
        for name in names:
            best = None
            for _ in range(reps):
                t0 = time.monotonic()
                QUERIES[name](spark, data_dir).write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
                release_caches()  # no persisted intermediates leak into the next timing
            out[name] = round(best, 3)
        return out

    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    times = run_suite(HEADLINE, sf_dir, reps=reps)
    total = round(sum(times.values()), 3)

    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "reps": reps,
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # one coarse (reps=1) timing of EVERY driver-window slot, so a
    # regression in the ~21 window rows outside HEADLINE (e.g. the
    # synthesized-partsupp TPC-H joins) is visible round over round.
    # Disable with SPARK_GRAFT_WINDOW=0.
    if os.environ.get("SPARK_GRAFT_WINDOW", "1") != "0":
        wtimes = run_suite(DRIVER_WINDOW, sf_dir)
        result["window"] = {
            "value": round(sum(wtimes.values()), 3),
            "reps": 1,
            "queries": wtimes,
        }

    factors = [int(r) for r in
               os.environ.get("SPARK_GRAFT_SCALE", "10,30,100").split(",")
               if int(r) > 1]
    if factors:
        from scale_testdata import build_scaled

        result["scale"] = []
        for replicas in factors:
            out_dir = (f"/tmp/spark_graft_scale{replicas}_"
                       f"{os.path.basename(sf_dir.rstrip('/'))}")
            t0 = time.monotonic()
            build_scaled(spark, sf_dir, replicas, out_dir)
            build_s = round(time.monotonic() - t0, 3)
            # cold caches: the scaled pass must not inherit the prior
            # pass's persisted/LRU state or ratios are flattered
            spark.catalog.clearCache()
            subset = (SCALE_SUBSET_BIG if replicas >= BIG_FACTOR
                      else SCALE_SUBSET)
            stimes = run_suite(subset, out_dir)
            result["scale"].append({
                "replicas": replicas,
                "build_seconds": build_s,
                "cold_caches": True,
                "value": round(sum(stimes.values()), 3),
                "queries": stimes,
                "ratio_per_replica": {
                    n: round(stimes[n] / max(times[n], 1e-9) / replicas, 3)
                    for n in subset},
            })

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
