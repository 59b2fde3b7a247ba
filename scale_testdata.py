"""Build an N× re-keyed replica of a testdata sf dir for scaling runs.

The point is a MEASURED scaling curve: bench.py runs the headline
subset at the base sf and at REPLICAS× the base, and reports per-query
normalized ratios (time_scaled / time_base / replicas ≈ 1.0 means the
plan scales linearly; super-linear ratios flag quadratic candidate
blow-ups or driver bottlenecks).

Replication is RE-KEYED so cardinalities and join fan-outs scale the
way real data growth does, not the degenerate way naive row-copying
does:
- every key column is offset by replica × (max_key + 1), consistently
  across referencing tables (l_orderkey matches o_orderkey within a
  replica, o_custkey matches c_custkey, ...), so joins behave as if
  the business simply had N× the customers/orders/events;
- `documents.text` is token-ROTATED per replica (same vocabulary,
  same length/quality profile, different shingle sets) so the dedup /
  decontamination operators see N× distinct documents instead of an
  artificial 10-deep exact-duplicate pile that the exact-collapse
  stage would erase;
- `embeddings.embedding` is dimension-rotated per replica (same norm,
  decorrelated directions) so LSH/IVF bucket occupancy grows like a
  corpus, not like 10 identical copies per bucket (which would turn
  the within-bucket pair count quadratic in the replica count).
- dims (region, nation) stay fixed, like the real world.

Usage: python scale_testdata.py [base_sf_dir] [replicas] [out_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# key columns to offset: table -> {column: key-space it belongs to}
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
# key-space -> (table, column) that defines its size
KEY_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
COPY_ONLY = ["region", "nation"]
TABLES = COPY_ONLY + list(KEYED)


def _rotate_text(text_col, r: int):
    """Rotate the token array by r positions (no-op for r=0 / short
    docs): same tokens, different n-gram shingles per replica."""
    from pyspark.sql import functions as F

    if r == 0:
        return text_col
    ws = F.split(text_col, " ")
    n = F.size(ws)
    k = F.lit(r) % n
    rotated = F.concat(F.slice(ws, k + 1, n - k), F.slice(ws, F.lit(1), k))
    return F.when(n > 1, F.array_join(rotated, " ")).otherwise(text_col)


def _rotate_vec(vec_col, r: int, dim: int | None = None):
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import DIM

    if dim is None:
        dim = DIM  # track the engine's real dimensionality — a local
        # default here would silently truncate if DIM ever changes
    if r == 0:
        return vec_col
    k = r % dim
    if k == 0:
        return vec_col
    return F.concat(F.slice(vec_col, k + 1, dim - k), F.slice(vec_col, 1, k))


def build_scaled(spark, base_dir: str, replicas: int, out_dir: str) -> str:
    """Write the re-keyed replicas to `out_dir` (skips work if the
    marker file already says the build is complete and matching)."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    marker = os.path.join(out_dir, "_SCALE_OK")
    # bump the version when the builder's transform changes — the
    # marker must not let a stale replica layout satisfy a new build
    tag = f"{os.path.abspath(base_dir)}|{replicas}|v2-ts-shift"
    if os.path.exists(marker) and Path(marker).read_text().strip() == tag:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    offsets = {
        space: int(load_table(spark, base_dir, t).agg(
            F.max(c).cast("long")).collect()[0][0]) + 1
        for space, (t, c) in KEY_SOURCE.items()
    }

    for t in COPY_ONLY:
        (load_table(spark, base_dir, t).write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"{t}.parquet")))

    for t, keycols in KEYED.items():
        base = load_table(spark, base_dir, t)
        parts = []
        for r in range(replicas):
            df = base
            for col, space in keycols.items():
                df = df.withColumn(
                    col, (F.col(col) + F.lit(r * offsets[space])).cast("long"))
            if t == "events":
                # shift each replica by 31 days so the replica set is
                # N× the HISTORY (longer time axis), not N× the event
                # RATE in the same month — temporal-proximity
                # workloads (coincident_events and kin) grow linearly
                # like a real longer history, instead of rate², which
                # would be a replica artifact, not a plan property
                df = df.withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {r * 31} DAYS"))
            if t == "documents":
                df = df.withColumn("text", _rotate_text(F.col("text"), r))
            if t == "embeddings":
                df = df.withColumn(
                    "embedding", _rotate_vec(F.col("embedding"), r))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        n_files = max(4, spark.sparkContext.defaultParallelism // 2)
        (out.repartition(n_files).write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"{t}.parquet")))

    Path(marker).write_text(tag)
    return out_dir


def main() -> None:
    from real_time_fraud_detection_flink_kafka_spark.session import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = (sys.argv[3] if len(sys.argv) > 3 else
           f"/tmp/spark_graft_scale{replicas}_{os.path.basename(base.rstrip('/'))}")
    spark = get_spark("scale_testdata")
    spark.sparkContext.setLogLevel("ERROR")
    print(build_scaled(spark, base, replicas, out))
    spark.stop()


if __name__ == "__main__":
    main()
