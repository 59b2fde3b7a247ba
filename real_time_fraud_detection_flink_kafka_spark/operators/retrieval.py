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


# --- maximal marginal relevance re-ranking -----------------------------------

MMR_LAMBDA_NUM, MMR_LAMBDA_DEN = 7, 10  # λ = 0.7, exact rational
MMR_POOL = 50      # relevance-ranked candidate pool fed to MMR
MMR_K = 5          # greedy selections emitted
MMR_FP = 10 ** 6   # fixed-point scale for cosines


def _mmr_pool(embeddings: DataFrame, pool_n: int = MMR_POOL) -> DataFrame:
    """The MMR relevance pool: one corpus scan against the broadcast
    query vector, truncated to `pool_n` via orderBy+limit — plans as
    TakeOrderedAndProject (per-partition heaps, no global sort).
    Factored out of `mmr_rerank` so the plan pytest can assert the
    heap shape directly: since the greedy rounds localCheckpoint, the
    full query's final plan only shows checkpointed leaves."""
    e = _vecs(embeddings)
    qid = embeddings.agg(F.min("vec_id").alias("_qid"))
    q = (e.join(F.broadcast(qid), F.col("vec_id") == F.col("_qid"))
          .select(F.col("v").alias("qv"), F.col("v_norm").alias("qn"),
                  F.col("vec_id").alias("_q")))
    cos_q = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("v_norm"))
    scored = (e.join(F.broadcast(q), F.col("vec_id") != F.col("_q"))
               .select("vec_id", "v", "v_norm",
                       F.round(cos_q * MMR_FP).cast("bigint").alias("rel_fp")))
    return scored.orderBy(F.desc("rel_fp"), F.asc("vec_id")).limit(pool_n)


def mmr_rerank(embeddings: DataFrame, k: int = MMR_K,
               pool_n: int = MMR_POOL) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98) — the diversity-aware selection every RAG context
    builder and few-shot-example picker runs after retrieval: greedily
    pick argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), so the second
    pick stops being a near-copy of the first. Query = the lowest
    vec_id (the `hybrid_rrf` convention).

    Determinism: relevance and pairwise similarities are fixed-point
    bigints (round(cos·1e6)); the MMR objective is kept as the
    UNDIVIDED integer 7·rel_fp − 3·max_sim_fp (dividing by 10 is
    monotone, and integer division of negatives truncates toward zero
    in Spark but floors in DuckDB — so the division is simply never
    performed). Winner per round: max_by on (mmr_fp, −vec_id) — one
    1-row relation, never collected (the `bpe_merges` chained-winner
    discipline; the oracle replays every round as chained CTEs).

    Each round's 1-row winner is localCheckpoint'ed (r14 opt, guide
    §7.2 'duplicated subtrees'): round r's candidate set references
    the union of ALL previous winners, and each winner's own tree
    embeds its predecessors — uncut, the analyzed plan doubles per
    round (2^k pool subtrees by round 5; the `ann_graph_search`
    lineage lesson at k=5 instead of steps=6). Five eager 1-row jobs
    replace the exponential re-analysis: measured 8.3 s → 1.6 s at
    sf0.1, output identical (the checkpoint only truncates lineage).

    Scale shape: ONE corpus scan against the broadcast query vector,
    truncated to `pool_n` via orderBy+limit (TakeOrderedAndProject —
    per-partition heaps, no global sort); everything after operates
    on the persisted ≤pool_n-row pool (pairwise sims ≤ pool_n² rows,
    broadcast; k rounds of 1-row aggregates). The greedy loop cost is
    independent of corpus size by construction."""
    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist

    pool = tracked_persist(_mmr_pool(embeddings, pool_n))
    pa = pool.select("vec_id", F.col("v").alias("va"),
                     F.col("v_norm").alias("na"))
    pb = pool.select(F.col("vec_id").alias("sel_id"),
                     F.col("v").alias("vb"), F.col("v_norm").alias("nb"))
    cos_p = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    sims = tracked_persist(
        pa.join(F.broadcast(pb), F.col("vec_id") != F.col("sel_id"))
          .select("vec_id", "sel_id",
                  F.round(cos_p * MMR_FP).cast("bigint").alias("sim_fp")))
    cand0 = pool.select("vec_id", "rel_fp")

    selected = None
    rounds = []
    for rnk in range(1, k + 1):
        if selected is None:
            cand = cand0.withColumn("max_sim_fp", F.lit(0).cast("bigint"))
        else:
            sel_ids = selected.select(F.col("vec_id").alias("sel_id"))
            pen = (sims.join(F.broadcast(sel_ids), "sel_id")
                       .groupBy("vec_id")
                       .agg(F.max("sim_fp").alias("max_sim_fp")))
            # inner join: sims covers every ordered pool pair, so each
            # unselected candidate has a row against every selected id
            cand = (cand0.join(selected.select("vec_id"),
                               "vec_id", "left_anti")
                         .join(pen, "vec_id"))
        mmr = (F.lit(MMR_LAMBDA_NUM) * F.col("rel_fp")
               - F.lit(MMR_LAMBDA_DEN - MMR_LAMBDA_NUM)
               * F.col("max_sim_fp")).cast("bigint")
        # the isNotNull filter matters when the pool exhausts before k
        # selections (corpus smaller than k, or k > pool_n): agg over
        # an EMPTY cand still yields one all-NULL row, while the
        # oracle's `ORDER BY ... LIMIT 1` over the empty CTE yields
        # none — without the filter the output carries NULL ranks the
        # oracle doesn't have
        w = (cand.withColumn("mmr_fp", mmr)
                 .agg(F.expr("max_by(struct(vec_id, rel_fp, mmr_fp), "
                             "struct(mmr_fp, -vec_id))").alias("w"))
                 .select(F.lit(rnk).cast("int").alias("rnk"),
                         F.col("w.vec_id").alias("vec_id"),
                         F.col("w.rel_fp").alias("rel_fp"),
                         F.col("w.mmr_fp").alias("mmr_fp"))
                 .where(F.col("vec_id").isNotNull())
                 .localCheckpoint(eager=True))
        rounds.append(w)
        selected = w if selected is None else selected.unionAll(w)

    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionAll(r)
    return out.select(
        "rnk", "vec_id",
        F.round(F.col("rel_fp") / float(MMR_FP), 6).alias("relevance"),
        "mmr_fp")
