"""Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
semantic (embedding-cosine) rankers — the serving-side composition
every RAG / retrieval stack runs (Cormack et al. SIGIR'09 RRF;
reference scope: query-side analytics over the corpus). The two
rankers already exist (`textops.bm25_scored`,
`similarity`'s cosine machinery); this module only FUSES them, which
is exactly how a production stack layers it.

Scale shape: the lexical side is bm25's one corpus shuffle; the
semantic side is a broadcast 1-row query vector against one
embeddings scan; each ranker emits a bounded RRF_POOL-row list via
orderBy+limit (TakeOrderedAndProject — per-partition heaps, never a
global sort), and the fusion is a full-outer join of two ≤POOL-row
relations (broadcast-sized by construction).

Determinism: RRF contributions are EXACT bigint floor divisions
RRF_SCALE // (RRF_K + rank) — ranks are integers, so the fused score
is an integer sum with no FP anywhere; ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.operators.similarity import _vecs, dot
from real_time_fraud_detection_flink_kafka_spark.operators.textops import bm25_scored

RRF_K = 60               # the canonical RRF damping constant
RRF_POOL = 50            # per-ranker candidate list length
RRF_TOPN = 20            # fused rows returned
RRF_SCALE = 10 ** 12     # fixed-point numerator for exact 1/(k+r)


def _rrf_term(rank_col: F.Column) -> F.Column:
    """floor(RRF_SCALE / (RRF_K + rank)) as an exact bigint (the
    num - num % d trick — both operands non-negative)."""
    d = (F.lit(RRF_K) + rank_col).cast("bigint")
    num = F.lit(RRF_SCALE).cast("bigint")
    return ((num - num % d) / d).cast("bigint")


def hybrid_rrf(documents: DataFrame, embeddings: DataFrame,
               topn: int = RRF_TOPN) -> DataFrame:
    """Fused more-like-this for the lowest-doc_id query document:
    BM25 over `documents` + exact cosine over `embeddings` (vec_id
    aligns with doc_id), each truncated to RRF_POOL, RRF-fused.
    rank_lex / rank_sem report each source rank (0 = absent)."""
    qid = documents.agg(F.min("doc_id").alias("_qid"))

    lex_top = (bm25_scored(documents)
               .orderBy(F.desc("fp"), F.asc("doc_id")).limit(RRF_POOL))
    w_lex = Window.orderBy(F.desc("fp"), F.asc("doc_id"))
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("rank_lex"))

    e = _vecs(embeddings)
    q = (e.join(F.broadcast(qid), F.col("vec_id") == F.col("_qid"))
          .select(F.col("v").alias("qv"), F.col("v_norm").alias("q_norm"),
                  F.col("vec_id").alias("_q")))
    cos = dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm"))
    sem_scored = (e.join(F.broadcast(q), F.col("vec_id") != F.col("_q"))
                   .select(F.col("vec_id").alias("doc_id"),
                           cos.alias("cos_raw")))
    sem_top = (sem_scored.orderBy(F.desc("cos_raw"), F.asc("doc_id"))
               .limit(RRF_POOL))
    w_sem = Window.orderBy(F.desc("cos_raw"), F.asc("doc_id"))
    sem = sem_top.select(
        "doc_id", F.row_number().over(w_sem).alias("rank_sem"))

    fused = (lex.join(sem, "doc_id", "full_outer")
             .select("doc_id",
                     F.coalesce("rank_lex", F.lit(0)).alias("rank_lex"),
                     F.coalesce("rank_sem", F.lit(0)).alias("rank_sem")))
    score = (F.when(F.col("rank_lex") > 0,
                    _rrf_term(F.col("rank_lex"))).otherwise(F.lit(0))
             + F.when(F.col("rank_sem") > 0,
                      _rrf_term(F.col("rank_sem"))).otherwise(F.lit(0)))
    top = (fused.withColumn("rrf_fp", score.cast("bigint"))
                .orderBy(F.desc("rrf_fp"), F.asc("doc_id")).limit(topn))
    w = Window.orderBy(F.desc("rrf_fp"), F.asc("doc_id"))
    return (top.withColumn("rnk", F.row_number().over(w))
               .select("doc_id", F.col("rnk").cast("int").alias("rnk"),
                       F.col("rank_lex").cast("int").alias("rank_lex"),
                       F.col("rank_sem").cast("int").alias("rank_sem"),
                       F.round(F.col("rrf_fp") / float(RRF_SCALE), 6)
                        .alias("rrf")))
