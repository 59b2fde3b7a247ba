"""End-to-end corpus-preparation pipeline (the composition a training
-data pipeline actually runs): exact dedup → near-dup removal
(MinHash-LSH verified) → quality filter → token stats + fingerprint.

One pass per stage, each stage the scale-path variant of its operator
family; the whole composition stays declarative so Catalyst plans it
as one DAG (shared scans, pushed filters)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    dedup_minhash_lsh_fast,
)
from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
    doc_fingerprint,
    quality_score,
)

MIN_QUALITY = 0.5


def corpus_prep(documents: DataFrame,
                jaccard_threshold: float = JACCARD_THRESHOLD,
                min_quality: float = MIN_QUALITY) -> DataFrame:
    """Kept documents with their stats after the full prep pipeline."""
    # 1. exact dedup: canonical doc per identical text — a window
    # filter (one shuffle), not a groupBy+self-join
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id"))
    d1 = (documents.withColumn("_rn", rn).where(F.col("_rn") == 1)
                   .drop("_rn"))
    # 2. near-dup removal: drop the larger doc of each verified pair.
    # The Arrow signature stage is bit-identical to the expression
    # path (same md5 integer hashes) and ~2× faster end-to-end here,
    # so the composition uses it; the oracle is unchanged.
    pairs = dedup_minhash_lsh_fast(d1, threshold=jaccard_threshold)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    d2 = d1.join(drop, "doc_id", "left_anti")
    # 3. quality gate + 4. stats/fingerprint
    q = quality_score(d2)
    fp = doc_fingerprint(d2)
    out = (q.join(fp, "doc_id")
            .where(F.col("quality") >= min_quality)
            .select("doc_id", "n_words", "uniq_ratio", "quality", "fingerprint"))
    return out
