"""Training-data pipeline operators over `documents`: the end-to-end
corpus-prep composition plus the corpus-level preparation steps a
pretraining pipeline runs — benchmark decontamination, vocabulary
mining, stratified language sampling, and sequence chunking.

Each stage is declarative DataFrame ops (no UDFs), so Catalyst plans
compositions as one DAG (shared scans, pushed filters)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.functions.hashing import md5_int60
from real_time_fraud_detection_flink_kafka_spark.functions.partitioning import spread
from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    dedup_minhash_lsh_fast,
    shingles,
)
from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
    _words,
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


# --- benchmark decontamination ----------------------------------------------

EVAL_MOD = 50  # doc_id % EVAL_MOD == 0 plays the held-out benchmark set
DECON_NGRAM = 8  # decontamination n-gram size (8-13 words is standard)


def decontaminate(documents: DataFrame, eval_mod: int = EVAL_MOD,
                  n: int = DECON_NGRAM) -> DataFrame:
    """Train/eval n-gram-overlap decontamination: flag every training
    document sharing at least one word 8-gram with the (small)
    held-out set, with overlap counts for thresholding.

    The n-gram SIZE is the selectivity knob: at n=8 only genuinely
    copied passages collide, so the shingle join stays ~linear; short
    n-grams (3) collide on common phrases and the join degenerates
    quadratically (measured 30s vs 2s at sf0.1 on this corpus — the
    same blowup would OOM a real cluster).

    Scale shape: the eval side of the join is the benchmark suite —
    thousands of docs against a 100 TB corpus — so its shingle set is
    BROADCAST and the training corpus streams through map-side; the
    only shuffle is the per-train-doc overlap aggregation, keyed on
    doc_id (never text). The join carries shingle strings; at bigger
    shingle sizes hash them first (same md5 trick as MinHash)."""
    sh = shingles(spread(documents), n)
    ev = (sh.where(F.col("doc_id") % eval_mod == 0)
            .select(F.col("doc_id").alias("eval_doc_id"), "shingle"))
    tr = sh.where(F.col("doc_id") % eval_mod != 0)
    j = tr.join(F.broadcast(ev), "shingle")
    return (j.groupBy(F.col("doc_id").alias("train_doc_id"))
             .agg(F.count_distinct("shingle").alias("n_shared_shingles"),
                  F.count_distinct("eval_doc_id").alias("n_eval_docs"))
             .orderBy("train_doc_id"))


# --- vocabulary mining ------------------------------------------------------

VOCAB_K = 100


def vocab_topk(documents: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """Corpus vocabulary: top-k tokens by term frequency (ties to the
    lexicographically first token), with document frequency — the
    counting pass under tokenizer/BPE training.

    Scale shape: one explode + one groupBy(token) with map-side
    partial aggregation, then a DISTRIBUTED top-k (orderBy+limit plans
    as TakeOrderedAndProject — per-partition heaps, no single-task
    global sort); the rank column is computed on the k survivors
    only, so the window never sees the full vocabulary."""
    tok = documents.select("doc_id", F.explode(_words(F.col("text"))).alias("token"))
    agg = (tok.groupBy("token")
              .agg(F.count(F.lit(1)).alias("tf"),
                   F.count_distinct("doc_id").alias("df")))
    top = agg.orderBy(F.desc("tf"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return top.withColumn("rnk", F.row_number().over(w))


# --- stratified sampling ----------------------------------------------------

# per-language keep rates (basis points of 10_000): the dominant
# language is downsampled, rare ones kept whole — the usual
# pretraining language-balance move
SAMPLE_RATES_BP: dict[str, int] = {
    "en": 2_000, "fr": 5_000, "de": 5_000, "es": 5_000, "zh": 10_000,
}
SAMPLE_MOD = 10_000


def stratified_sample(documents: DataFrame,
                      rates_bp: dict[str, int] | None = None) -> DataFrame:
    """Deterministic per-language sampling: keep a document iff
    md5(doc_id) mod 10k falls under its language's rate. Hash-gated
    (not `rand()`) so the sample is reproducible across runs, engines
    and retries — a row-local filter with NO shuffle, and the same
    doc keeps/drops regardless of partitioning. Unknown languages
    default to keep-all."""
    rates_bp = SAMPLE_RATES_BP if rates_bp is None else rates_bp
    bucket = F.pmod(md5_int60(F.col("doc_id").cast("string")), F.lit(SAMPLE_MOD))
    rate = F.lit(SAMPLE_MOD)
    for lang, bp in rates_bp.items():
        rate = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(rate)
    return (documents.where(bucket < rate)
                     .select("doc_id", "lang", bucket.alias("sample_bucket")))


# --- sequence chunking ------------------------------------------------------

CHUNK_LEN = 128   # tokens per training sequence
CHUNK_STRIDE = 64  # overlap stride


def chunk_documents(documents: DataFrame, chunk_len: int = CHUNK_LEN,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """Split each document into overlapping fixed-length token windows
    (the standard pretraining chunking step). Row-local: tokenize
    once, explode the chunk starts, slice — no shuffle anywhere, and
    chunk text rides as an md5 so the wide strings never leave the
    executor."""
    ws = _words(F.col("text"))
    d = documents.select("doc_id", ws.alias("ws"), F.size(ws).alias("nw"))
    starts = F.sequence(F.lit(0), F.col("nw") - 1, F.lit(stride))
    d = d.select("doc_id", "ws", F.explode(starts).alias("start"))
    chunk = F.slice(F.col("ws"), F.col("start") + 1, chunk_len)
    return d.select(
        "doc_id",
        (F.col("start") / stride).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"))


# --- sequence packing -------------------------------------------------------

PACK_BUDGET = 512  # max tokens per training sequence pack
PACK_SHARDS = 8    # independent packing shards


def pack_sequences(documents: DataFrame, budget: int = PACK_BUDGET,
                   n_shards: int = PACK_SHARDS) -> DataFrame:
    """Greedy sequential bin packing of documents into training
    sequences: within a shard, docs are taken in doc_id order and a
    new pack starts whenever the running token count would exceed
    `budget` (an oversize doc gets a pack of its own).

    Packing is inherently ITERATIVE (each decision depends on the
    running remainder), so this is the one corpus op that earns
    `applyInPandas`: shards pack independently — exactly how a
    distributed packer works at scale, where shard = worker and the
    only shuffle is the groupBy(shard). The per-shard loop is O(rows)
    Python over Arrow batches. Deterministic: shard and order are
    pure functions of doc_id, so the oracle (a recursive CTE) replays
    the identical fold."""
    import pandas as pd

    ws = _words(F.col("text"))
    base = documents.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(ws).alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs, acc, pid = [], 0, 0
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if acc > 0 and acc + nt > budget:
                pid, acc = pid + 1, nt
            else:
                acc += nt
            packs.append(pid)
        pdf["pack_id"] = packs
        return pdf[["doc_id", "shard", "pack_id", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        pack, "doc_id bigint, shard int, pack_id int, n_tokens int")


# --- BPE merge-pair counting ------------------------------------------------

BIGRAM_K = 50


def bigram_topk(documents: DataFrame, k: int = BIGRAM_K) -> DataFrame:
    """Adjacent-token-pair frequencies — the counting pass inside one
    BPE training iteration (most-frequent pair becomes the next
    merge). Pairs are built row-local with a zip of the token array
    against its own tail (no self-join), then one groupBy + the same
    distributed top-k shape as `vocab_topk`."""
    ws = _words(F.col("text"))
    pairs = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b))
    tok = documents.select(F.explode(pairs).alias("pair"))
    agg = tok.groupBy("pair").agg(F.count(F.lit(1)).alias("tf"))
    top = agg.orderBy(F.desc("tf"), F.asc("pair")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("pair"))
    return top.withColumn("rnk", F.row_number().over(w))


# --- full intake composition ------------------------------------------------


def corpus_to_packs(documents: DataFrame,
                    jaccard_threshold: float = JACCARD_THRESHOLD,
                    min_quality: float = MIN_QUALITY) -> DataFrame:
    """The COMPLETE training-data intake as one declarative DAG:
    exact dedup → MinHash near-dup removal → benchmark
    decontamination (flagged train docs AND the eval slice itself
    dropped) → stratified language sampling → quality gate → greedy
    sequence packing. Every stage is the scale-path variant of its
    operator family; the whole composition is one oracle-checked
    query (the oracle chains the same six stages, ending in the
    recursive packing CTE)."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
    d1 = documents.withColumn("_rn", rn).where(F.col("_rn") == 1).drop("_rn")
    pairs = dedup_minhash_lsh_fast(d1, threshold=jaccard_threshold)
    d2 = d1.join(pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
                 "doc_id", "left_anti")
    flagged = decontaminate(d2).select(
        F.col("train_doc_id").alias("doc_id"))
    d3 = (d2.where(F.col("doc_id") % EVAL_MOD != 0)
            .join(flagged, "doc_id", "left_anti"))
    d4 = d3.join(stratified_sample(d3).select("doc_id"), "doc_id", "left_semi")
    good = quality_score(d4).where(F.col("quality") >= min_quality).select("doc_id")
    d5 = d4.join(good, "doc_id", "left_semi")
    return pack_sequences(d5)
