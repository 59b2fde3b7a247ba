"""Streaming corpus ingestion: the documents table consumed as a
file stream through the row-local quality scorer — the shape of a
continuous training-data intake pipeline (new crawl shards land in a
directory; quality gating runs incrementally). Stateless (no
aggregation/state store), so append mode streams rows straight
through and the drained result must equal the batch operator —
enforced by sharing `quality_score`'s oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame

from real_time_fraud_detection_flink_kafka_spark.operators.textops import quality_score
from real_time_fraud_detection_flink_kafka_spark.sources.files import ensure_session_confs


def run_corpus_quality_stream(spark, sf_dir: str,
                              query_name: str = "corpus_stream") -> DataFrame:
    """Bounded drain of the quality scorer over a documents file
    stream (schema from a one-off batch read; availableNow trigger)."""
    ensure_session_confs(spark)
    import os

    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir))
    out = quality_score(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_corpus_dedup_stream(spark, sf_dir: str,
                            query_name: str = "corpus_dedup_stream") -> DataFrame:
    """Incremental exact dedup over the corpus stream: a streaming
    groupBy(md5(text)) keeping the canonical (min) doc_id and copy
    count. An AGGREGATION, not dropDuplicates — dropDuplicates keeps
    the first-ARRIVING row, which races across partitions; min() is
    order-free, so the drained state equals the batch `dedup_exact`
    exactly and shares its oracle. Complete mode emits the final
    state table."""
    from pyspark.sql import functions as F

    ensure_session_confs(spark)
    import os

    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir))
    out = (stream.groupBy(F.md5("text").alias("text_md5"))
           .agg(F.min("doc_id").alias("canonical_doc_id"),
                F.count(F.lit(1)).alias("n_copies"))
           .select("canonical_doc_id", "n_copies", "text_md5"))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_lm_score_stream(spark, sf_dir: str,
                        query_name: str = "lm_stream") -> DataFrame:
    """STREAM-STATIC join coverage: documents arriving as a file
    stream are scored against the bigram LM trained on the BATCH
    corpus — the model-trained-offline / applied-online shape every
    production quality filter runs. The static count relations are
    broadcast into each micro-batch; |V| is collected once as model
    metadata (a constant of the trained model, not per-row data).
    Per-doc aggregation is a stateful streaming agg (complete mode) —
    fixed-point integer sums make the drained state arrival-order
    free, so it equals the batch `bigram_lm_score` exactly and shares
    its oracle."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        doc_bigrams,
        lm_model,
        score_pairs_with_lm,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    import os

    batch = load_table(spark, sf_dir, "documents")
    uni, big = lm_model(batch)
    v = uni.count()  # model metadata: vocabulary size

    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir))
    pairs = doc_bigrams(stream)
    j = pairs.join(F.broadcast(big), ["a", "b"]).join(F.broadcast(uni), "a")
    out = score_pairs_with_lm(j, F.lit(v))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
