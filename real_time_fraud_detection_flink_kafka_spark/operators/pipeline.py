"""Training-data pipeline operators over `documents`: the end-to-end
corpus-prep composition plus the corpus-level preparation steps a
pretraining pipeline runs — benchmark decontamination, vocabulary
mining, stratified language sampling, and sequence chunking.

Each stage is declarative DataFrame ops (no UDFs), so Catalyst plans
compositions as one DAG (shared scans, pushed filters)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist
from real_time_fraud_detection_flink_kafka_spark.functions.hashing import md5_int60
from real_time_fraud_detection_flink_kafka_spark.functions.partitioning import spread
from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    dedup_minhash_lsh_fast,
    shingle_hashes_arrow,
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
    doc_id (never text). The join carries 60-bit md5 shingle HASHES
    (Arrow-batched stage, same md5 identity the MinHash path uses):
    overlap counts equal the string version short of 2⁻⁶⁰ collisions,
    the broadcast side shrinks to fixed-width ints, and shingling
    runs at C speed instead of the interpreted 8-term transform
    (measured ~4× at sf0.1)."""
    base = spread(documents)
    # split BEFORE the Python stage: filters on an opaque mapInPandas
    # can't push through it, so shingling after the split would run
    # the full corpus twice (once per side); shingling each disjoint
    # slice keeps the total at one corpus pass and the eval-side
    # Python stage at benchmark size
    ev = (shingle_hashes_arrow(base.where(F.col("doc_id") % eval_mod == 0), n)
          .select(F.col("doc_id").alias("eval_doc_id"), "shingle"))
    tr = shingle_hashes_arrow(base.where(F.col("doc_id") % eval_mod != 0), n)
    j = tr.join(F.broadcast(ev), "shingle")
    return (j.groupBy(F.col("doc_id").alias("train_doc_id"))
             .agg(F.count_distinct("shingle").alias("n_shared_shingles"),
                  F.count_distinct("eval_doc_id").alias("n_eval_docs"))
             .orderBy("train_doc_id"))


def decontaminate_fuzzy(documents: DataFrame, eval_mod: int = EVAL_MOD,
                        threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Fuzzy (whole-document) benchmark decontamination: flag every
    training document whose shingle Jaccard with ANY held-out eval
    document reaches `threshold` — the MinHash-LSH complement to
    `decontaminate`'s exact 8-gram passage overlap. Exact n-gram
    catches verbatim contamination; this catches lightly-edited
    copies of eval items (reworded benchmark questions survive the
    8-gram filter but not a 0.8-Jaccard one).

    Scale shape — the asymmetry IS the plan: the eval side is the
    benchmark suite (thousands of docs against a 100 TB corpus), so
    its band rows AND its shingle-hash sets are BROADCAST; the
    training corpus streams through broadcast joins only (band match →
    exact set verification; zero SortMergeJoins, plan-gated) and the
    only corpus-scale shuffle is the final per-train-doc aggregation
    (the candidate `distinct` shuffles candidate-sized rows only).
    MinHash signatures are computed once
    over the full corpus and persisted (four consumers: both bands,
    both verify sides), exactly as `_minhash_lsh_pipeline` does.

    Correctness contract: candidates are LSH (r=2, b=8 bands) but
    every emitted row is verified with EXACT Jaccard on the 60-bit
    shingle-hash sets, so output ⊆ exact; completeness at
    threshold=0.8 rides the same band-curve argument as
    `dedup_minhash_lsh` (its oracle is likewise the exact join).
    Docs shorter than the shingle width have empty sets — their
    Jaccard is NULL and they are (correctly) never flagged."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        _band_rows,
        minhash_signatures,
    )

    sig = tracked_persist(minhash_signatures(spread(documents)))
    ev_sig = sig.where(F.col("doc_id") % eval_mod == 0)
    tr_sig = sig.where(F.col("doc_id") % eval_mod != 0)

    eb = _band_rows(ev_sig).select(
        F.col("doc_id").alias("eval_doc_id"), "band_idx", "band_key")
    cand = (_band_rows(tr_sig)
            .join(F.broadcast(eb), ["band_idx", "band_key"])
            .select(F.col("doc_id").alias("train_doc_id"), "eval_doc_id")
            .distinct())

    tr_sets = tr_sig.select(F.col("doc_id").alias("train_doc_id"),
                            F.col("sh_set").alias("set_t"))
    ev_sets = ev_sig.select(F.col("doc_id").alias("eval_doc_id"),
                            F.col("sh_set").alias("set_e"))
    j = (cand.join(tr_sets, "train_doc_id")
             .join(F.broadcast(ev_sets), "eval_doc_id"))
    inter = F.size(F.array_intersect("set_t", "set_e"))
    jac = F.round(
        inter / (F.size("set_t") + F.size("set_e") - inter), 6)
    return (j.where(jac >= threshold)
             .groupBy("train_doc_id")
             .agg(F.count(F.lit(1)).alias("n_eval_docs"),
                  F.max(jac).alias("max_jaccard"))
             .orderBy("train_doc_id"))


# --- leakage-safe train/val split -------------------------------------------

VAL_PCT = 10  # % of GROUPS (not docs) assigned to the held-out split


def leakage_safe_split(documents: DataFrame,
                       threshold: float = JACCARD_THRESHOLD,
                       val_pct: int = VAL_PCT) -> DataFrame:
    """Group-aware train/val split: every document is assigned to
    `train` or `val` such that NO exact or near-duplicate pair
    (shingle Jaccard ≥ threshold) crosses the split — the standard
    guard against evaluation leakage when a held-out set is carved
    from the same crawl as the training corpus (a random doc-level
    split puts one copy of a duplicated page in train and its twin in
    val, and the val loss silently measures memorization).

    Unit of assignment is the near-dup GROUP: connected components
    over the verified pair graph, with the minimum doc_id as the
    group id; the split decision is a deterministic hash of the group
    id (the same md5 bucket `dataset_split` applies per-doc — that
    operator keeps a doc's split stable across reruns, this one
    additionally keeps every duplicate of it on the SAME side), so
    the assignment is stable under recomputation and corpus growth
    only moves NEW groups.

    Scale shape — the group graph is built at REP level, never doc
    level: exact duplicates collapse first (md5 groupBy, the one
    corpus-wide shuffle, on a 32-byte key), near-dup pairs are mined
    between unique texts only (`dedup_minhash_lsh_fast` — banded
    candidates, Arrow signatures), and components run on that
    rep-level pair relation, which is duplication-independent: the
    quadratic-under-duplication doc-level pair expansion is never
    materialized, membership rides the md5 collapse back out as one
    broadcast join. Output: (doc_id, group_id, split) for EVERY
    document; singletons are their own group.

    Oracle: DuckDB recursive-CTE closure over the exact rep-level
    Jaccard pairs + the same md5 split hash."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        min_label_components,
    )

    members = documents.select("doc_id", F.md5("text").alias("text_md5"))
    reps = (members.groupBy("text_md5")
                   .agg(F.min("doc_id").alias("rep_id")))
    members = members.join(F.broadcast(reps), "text_md5")
    rep_docs = documents.join(
        F.broadcast(reps.select(F.col("rep_id").alias("doc_id"))), "doc_id")
    rep_pairs = dedup_minhash_lsh_fast(rep_docs, threshold)
    labels = (min_label_components(rep_pairs)
              .select(F.col("id").alias("rep_id"),
                      F.col("label").alias("group_label")))
    assign = (members.join(F.broadcast(labels), "rep_id", "left")
              .select("doc_id",
                      F.coalesce("group_label", "rep_id").alias("group_id")))
    is_val = F.pmod(md5_int60(F.col("group_id").cast("string")),
                    F.lit(100)) < val_pct
    return assign.select(
        F.col("doc_id"),
        F.col("group_id").cast("bigint").alias("group_id"),
        F.when(is_val, F.lit("val")).otherwise(F.lit("train"))
         .alias("split"))


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


ES_SAMPLE_K = 200   # exact sample size (without replacement)
_TWO60 = float(1 << 60)


def weighted_sample_es(documents: DataFrame,
                       k: int = ES_SAMPLE_K) -> DataFrame:
    """EXACTLY-k weighted sampling WITHOUT replacement, proportional
    to token count — the Efraimidis-Spirakis A-ES algorithm (IPL
    2006): each doc draws key = ln(u)/w with u ~ U(0,1] and weight w,
    and the k LARGEST keys are a weight-proportional sample without
    replacement. The corpus-prep primitive the hash-GATE samplers
    (`stratified_sample`, `dsir_resample`) can't express: those fix a
    RATE (sample size varies with the corpus), this fixes the SIZE —
    "draw exactly k docs, long docs proportionally more often", the
    token-budgeted draw a training-mix builder runs.

    Deterministic: u = (md5(doc_id)+1)/2^60 — the repo's portable
    hash gate turned into a uniform variate, so the same doc draws
    the same key across runs, engines, retries and partitionings
    (rand() would be none of those). ln(u)/w ranks identically to
    the paper's u^(1/w) (monotone transform; both engines evaluate
    the same token sequence, no pow).

    Scale shape: ONE row-local projection (tokenize, hash, one ln)
    and a global top-k — which Spark plans as TakeOrderedAndProject:
    per-partition heap of k, then a k·n_partitions merge on one
    reducer. NO full sort, NO shuffle of the corpus; the only data
    movement is k rows per partition. The rank window runs on the
    ≤ k merged rows, not the corpus."""
    top = es_topk(es_keyed(documents), k)
    return es_ranked(top)


def es_keyed(documents: DataFrame) -> DataFrame:
    """(doc_id, w_tokens, es_key RAW) — the A-ES key projection,
    row-local. Raw keys (no rounding) so downstream top-k merges
    stay exact; `es_ranked` rounds at emission only."""
    ws = _words(F.col("text"))
    w_tok = (F.size(ws) + 1).cast("bigint")
    u = ((md5_int60(F.col("doc_id").cast("string")) + 1) / F.lit(_TWO60))
    key = F.log(u) / F.col("w_tokens").cast("double")
    return (documents
            .select("doc_id", w_tok.alias("w_tokens"))
            .select("doc_id", "w_tokens", key.alias("es_key")))


def es_topk(keyed: DataFrame, k: int = ES_SAMPLE_K) -> DataFrame:
    """Global top-k of an A-ES key relation (TakeOrderedAndProject).
    MERGEABLE: topk(A ∪ B) = topk(topk(A) ∪ topk(B)) — what lets the
    streaming reservoir append per-batch top-ks and merge at drain."""
    return keyed.orderBy(F.desc("es_key"), F.asc("doc_id")).limit(k)


def es_ranked(top: DataFrame) -> DataFrame:
    """Final emission over a ≤k-row top relation: dense rank + the
    6dp-rounded key (rank computed BEFORE rounding)."""
    rnk = F.row_number().over(
        Window.orderBy(F.desc("es_key"), F.asc("doc_id")))
    return top.select("doc_id", "w_tokens",
                      rnk.cast("int").alias("rnk"),
                      F.round("es_key", 6).alias("es_key"))


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
PACK_SHARDS = 8    # oracle-pinned shard count (registry/oracle use this)


def pack_sequences(documents: DataFrame, budget: int = PACK_BUDGET,
                   n_shards: int | None = None) -> DataFrame:
    """Greedy sequential bin packing of documents into training
    sequences: within a shard, docs are taken in doc_id order and a
    new pack starts whenever the running token count would exceed
    `budget` (an oversize doc gets a pack of its own).

    Packing is inherently ITERATIVE (each decision depends on the
    running remainder), so this is the one corpus op that earns
    `applyInPandas`: shards pack independently — exactly how a
    distributed packer works at scale, where shard = worker and the
    only shuffle is the groupBy(shard). The per-shard loop is O(rows)
    Python over Arrow batches. Deterministic GIVEN the shard count:
    shard and order are pure functions of (doc_id, n_shards), so the
    oracle (a recursive CTE) replays the identical fold at the pinned
    PACK_SHARDS.

    `n_shards` defaults to the cluster's default parallelism (floored
    at PACK_SHARDS): a fixed 8 would cap the entire packing stage at
    8 tasks on a 1000-executor cluster. The registry/oracle pin
    n_shards=PACK_SHARDS because pack assignments depend on the shard
    count and the oracle must replay the same fold."""
    import pandas as pd

    if n_shards is None:
        n_shards = max(
            PACK_SHARDS, documents.sparkSession.sparkContext.defaultParallelism)

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


# --- corpus-trained bigram-LM fluency score ----------------------------------

LM_FP = 1_000_000_000  # fixed-point scale for per-doc probability sums


def bigram_lm_score(documents: DataFrame) -> DataFrame:
    """Statistical-LM fluency scoring — the CCNet/Gopher-class filter
    that trains a language model ON the corpus and scores each
    document's fluency under it (low scores = unnatural token
    sequences → filter candidates). Model: bigram LM with Laplace
    smoothing, score = mean smoothed bigram probability
    p(b|a) = (count(a,b) + 1) / (count(a) + |V|).

    The MEAN probability (not mean log-prob) ranks the same direction
    and keeps the oracle value-exact: probabilities are one IEEE
    division of exact integer counts, while ln/log2 is libm-dependent
    across engines (last-ulp drift would break the hash gate).

    Engine-determinism: per-doc sums accumulate FIXED-POINT integers
    (round(p·1e9), the `kmeans_centroids` move), so partial-agg order
    cannot change the result.

    Scale shape: unigram and bigram counts are two groupBys with
    map-side partial aggregation (shuffle keys are tokens/pairs,
    never documents); the probability join carries fixed-width ints;
    |V| rides as a 1-row broadcast (the `source_mix` move); the final
    per-doc aggregation is ONE doc_id-keyed shuffle. Docs with fewer
    than 2 tokens have no bigrams and are absent from the output (the
    oracle's inner joins agree).

    Join strategy: the unigram relation is |V| rows (fixed-width, far
    under any broadcast threshold) while its join key `a` is
    stopword-skewed — a handful of tokens dominate every
    natural-language corpus — so the unigram join is an explicit
    broadcast (skew is irrelevant map-side; also removes one full
    shuffle of the occurrence-level token stream). This matches the
    streaming twin's plan (streaming/corpus.py:96): batch and stream
    now execute the same join strategy for the same oracle. The
    bigram-count join stays a shuffle join: at 100 TB corpus scale
    the distinct-pair relation can exceed executor memory, and its
    composite (a, b) key dilutes the stopword skew (AQE skew-join
    covers the residual hot pairs)."""
    pairs = doc_bigrams(documents)
    uni, big = lm_model(documents)
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    j = (pairs.join(big, ["a", "b"])
              .join(F.broadcast(uni), "a")
              .crossJoin(F.broadcast(vocab)))
    return score_pairs_with_lm(j, F.col("v"))


def doc_bigrams(documents: DataFrame) -> DataFrame:
    """(doc_id, a, b) — one row per adjacent token pair, built
    row-local (zip against the array's own tail, no self-join)."""
    ws = _words(F.col("text"))
    n_pairs = F.greatest(F.size(ws) - 1, F.lit(0))
    bigrams = F.zip_with(F.slice(ws, 1, n_pairs), F.slice(ws, 2, n_pairs),
                         lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return (documents.select("doc_id", F.explode(bigrams).alias("p"))
                     .select("doc_id", F.col("p.a").alias("a"),
                             F.col("p.b").alias("b")))


def lm_model(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The 'trained' bigram LM: (unigram counts, bigram counts) —
    reused by the streaming twin, which applies the batch-trained
    model to a document stream (stream-static join)."""
    ws = _words(F.col("text"))
    uni = (documents.select(F.explode(ws).alias("a"))
                    .groupBy("a").agg(F.count(F.lit(1)).alias("cnt_a")))
    big = doc_bigrams(documents).groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("cnt_ab"))
    return uni, big


def score_pairs_with_lm(joined: DataFrame, v_col) -> DataFrame:
    """Per-doc mean smoothed probability over a (doc_id, cnt_ab,
    cnt_a) joined relation; `v_col` is the vocabulary size as a
    Column (1-row-relation column batch-side, literal stream-side —
    same value, same IEEE ops)."""
    p = (F.col("cnt_ab") + 1) / (F.col("cnt_a") + v_col)
    pf = F.round(p * F.lit(LM_FP)).cast("bigint")
    per = joined.groupBy("doc_id").agg(F.sum(pf).alias("s"),
                                       F.count(F.lit(1)).alias("n_bigrams"))
    return per.select(
        "doc_id", "n_bigrams",
        F.round(F.col("s") / F.lit(float(LM_FP)) / F.col("n_bigrams"), 6)
         .alias("avg_bigram_p"))


# --- corpus-trained trigram LM with stupid backoff ---------------------------

# stupid-backoff weight λ = 0.4 (Brants et al., EMNLP 2007 "Large
# Language Models in Machine Translation") as the exact rational 2/5 —
# applied as integer multiply + floor-div on the fixed-point
# probability so both engines compute the identical bigint
TRI_BACKOFF_NUM, TRI_BACKOFF_DEN = 2, 5
TRI_TRAIN_MOD = 2  # model trains on doc_id % 2 == 0; scores ALL docs


def doc_trigrams(documents: DataFrame) -> DataFrame:
    """(doc_id, a, b, c) — one row per adjacent token triple, built
    row-local (three aligned slices of the let-bound token array —
    without the let, projection collapse re-inlines the split 4×
    per row: the dedup_winnow lesson)."""
    from real_time_fraud_detection_flink_kafka_spark.functions.expr import let

    def tri_of(ws):
        n = F.greatest(F.size(ws) - 2, F.lit(0))
        ab = F.zip_with(F.slice(ws, 1, n), F.slice(ws, 2, n),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")))
        return F.zip_with(
            ab, F.slice(ws, 3, n),
            lambda p, c: F.struct(p["a"].alias("a"), p["b"].alias("b"),
                                  c.alias("c")))

    tri = let(_words(F.col("text")), tri_of)
    return (documents.select("doc_id", F.explode(tri).alias("t"))
                     .select("doc_id", F.col("t.a").alias("a"),
                             F.col("t.b").alias("b"), F.col("t.c").alias("c")))


def trigram_lm_score(documents: DataFrame) -> DataFrame:
    """Trigram-LM fluency scoring with stupid backoff — the next
    CCNet-class rung above `bigram_lm_score`: the model trains on a
    deterministic REFERENCE HALF of the corpus (doc_id % 2 == 0, the
    train/score split CCNet makes with Wikipedia vs the crawl) and
    scores EVERY document, so held-out documents genuinely contain
    unseen trigrams and the backoff path runs on real data instead of
    being vacuous (a model trained on the full corpus has cnt ≥ 1 for
    every scored trigram).

    Per trigram: seen (a,b,c) → Laplace trigram probability
    p = (cnt_abc + 1)/(cnt_ab + |V|); unseen → stupid backoff to the
    bigram λ·(cnt_bc + 1)/(cnt_b + |V|) with λ = 2/5 applied as
    bigint multiply + floor-div on the fixed-point probability
    (integer-exact mixture — no double λ multiply whose rounding
    could diverge across engines).

    Engine-determinism: each probability is ONE IEEE division of
    exact integer counts, scaled to a round()ed bigint (LM_FP); per-doc
    sums are integer adds, so partial-agg order is irrelevant —
    the `bigram_lm_score` discipline extended one order up.

    Scale shape: model counts are three map-side-combined groupBys
    over the train half (keys: trigrams / bigrams / tokens — never
    documents); the trigram- and bigram-count joins stay shuffle
    joins (at 100 TB the distinct-trigram relation exceeds executor
    memory; composite keys dilute stopword skew, AQE covers residual
    hot pairs); the unigram relation and |V| ride as broadcasts; the
    final per-doc aggregation is ONE doc_id-keyed shuffle. Docs with
    fewer than 3 tokens have no trigrams and are absent (oracle
    agrees). `n_backoff` is emitted per doc — the observability
    column that shows how far off-model a document sits."""
    train = documents.where(F.col("doc_id") % TRI_TRAIN_MOD == 0)
    uni, big, tric = trigram_model(train)
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    t = doc_trigrams(documents).crossJoin(F.broadcast(vocab))
    return score_trigrams_with_lm(t, uni, big, tric, F.col("v"))


def trigram_model(train: DataFrame):
    """The 'trained' trigram LM: (unigram, bigram, trigram counts) —
    the bigram/unigram relations double as the backoff model. Reused
    by the streaming twin (model trained offline on the batch corpus,
    applied to the stream)."""
    uni, big = lm_model(train)
    tric = doc_trigrams(train).groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("cnt_abc"))
    return uni, big, tric


def score_trigrams_with_lm(trigrams: DataFrame, uni: DataFrame,
                           big: DataFrame, tric: DataFrame, v_col,
                           broadcast_model: bool = False) -> DataFrame:
    """Per-doc trigram score over a (doc_id, a, b, c) relation:
    Laplace trigram probability for model trigrams, λ=2/5 stupid
    backoff to the bigram otherwise — all fixed-point bigints.
    `broadcast_model` forces every model join map-side (the streaming
    twin's stream-static shape); batch keeps the trigram/bigram joins
    as shuffle joins (at 100 TB those relations exceed executor
    memory) and broadcasts only the |V|-bounded unigram side."""
    maybe_b = F.broadcast if broadcast_model else (lambda df: df)
    back = big.select(F.col("a").alias("b"), F.col("b").alias("c"),
                      F.col("cnt_ab").alias("cnt_bc"))
    unib = uni.select(F.col("a").alias("b"), F.col("cnt_a").alias("cnt_b"))
    j = (trigrams
         .join(maybe_b(tric), ["a", "b", "c"], "left")
         .join(maybe_b(big), ["a", "b"], "left")
         .join(maybe_b(back), ["b", "c"], "left")
         .join(F.broadcast(unib), "b", "left"))
    p_tri = (F.col("cnt_abc") + 1) / (F.col("cnt_ab") + v_col)
    p_back = ((F.coalesce("cnt_bc", F.lit(0)) + 1)
              / (F.coalesce("cnt_b", F.lit(0)) + v_col))
    pf_tri = F.round(p_tri * F.lit(LM_FP)).cast("bigint")
    scored = j.select(
        "doc_id", F.col("cnt_abc").isNull().alias("backoff"),
        F.round(p_back * F.lit(LM_FP)).cast("bigint").alias("pf_back_raw"),
        pf_tri.alias("pf_tri"))
    pf = F.when(~F.col("backoff"), F.col("pf_tri")).otherwise(
        F.expr(f"(pf_back_raw * {TRI_BACKOFF_NUM}) div {TRI_BACKOFF_DEN}"))
    per = (scored.select("doc_id", "backoff", pf.alias("pf"))
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_trigrams"),
                F.sum(F.when(F.col("backoff"), 1).otherwise(0))
                 .alias("n_backoff"),
                F.sum("pf").alias("s")))
    return per.select(
        "doc_id", "n_trigrams", "n_backoff",
        F.round(F.col("s") / F.lit(float(LM_FP)) / F.col("n_trigrams"), 6)
         .alias("avg_trigram_p"))


# --- LM ranking-quality lift (bigram vs trigram, labeled fixtures) -----------

# fixture ids sit far above any corpus (or scale-replica) doc_id and
# are ODD so they can never leak into the trigram train half
# (doc_id % 2 == 0); id % 4 == 1 → fluent, 3 → garbled
LM_FIX_OFF = 1 << 41
LM_FIX_N = 16


def _lm_fixture_union(documents: DataFrame) -> DataFrame:
    """Corpus ∪ labeled fixtures: the first LM_FIX_N train-half docs
    (by doc_id — a TakeOrderedAndProject, never a global sort)
    re-keyed twice — verbatim ('fluent': on-model by construction)
    and word-REVERSED ('garbled': same unigrams, destroyed bigram/
    trigram structure — the deterministic-injection move pii_scrub
    uses for a corpus that ships no labels)."""
    base = (documents.select("doc_id", "text")
            .where(F.col("doc_id") % TRI_TRAIN_MOD == 0)
            .orderBy("doc_id").limit(LM_FIX_N))
    fluent = base.select(
        (F.lit(LM_FIX_OFF) + F.col("doc_id") * 4 + 1).alias("doc_id"),
        "text")
    garbled = base.select(
        (F.lit(LM_FIX_OFF) + F.col("doc_id") * 4 + 3).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.trim(F.col("text")), " ")), " ")
         .alias("text"))
    return (documents.select("doc_id", "text")
            .unionAll(fluent).unionAll(garbled))


def _lm_fixture_metrics(name: str, scored: DataFrame) -> DataFrame:
    """One summary row for a scorer's (doc_id, score) relation:
    pairwise fluent>garbled accuracy over the fixture label pairs,
    and the mean population-rank gap between fluent and garbled
    fixtures. Ranks are counted against the scorer's own population
    (corpus ∪ fixtures) by streaming it ONCE against the broadcast
    ≤2·LM_FIX_N fixture rows — never a global sort/window. All
    divisions are floor-div over non-negative integers (the gap is
    offset by +1·n_pop so a garbled-above-fluent scorer cannot go
    negative — Spark `div` truncates while DuckDB `//` floors)."""
    scored = tracked_persist(scored)
    fix = (scored.where(F.col("doc_id") >= LM_FIX_OFF)
           .select(F.col("doc_id").alias("fid"), F.col("score").alias("fs")))
    # ONE pass over the scored population (r14 opt): the crossJoin
    # against the broadcast ≤2·LM_FIX_N fixture rows yields exactly
    # n_pop rows per fid, so counting ALL rows per fid gives n_pop in
    # the same aggregate that counts the below-rank rows — the
    # separate population-count scan (and the left join that patched
    # rank-0 fixtures back in) folds away; every fid is present with
    # rnk = 0 when nothing ranks below it, identical values.
    below_cond = ((F.col("score") < F.col("fs"))
                  | ((F.col("score") == F.col("fs"))
                     & (F.col("doc_id") < F.col("fid"))))
    fr = (scored.crossJoin(F.broadcast(fix))
          .groupBy("fid")
          .agg(F.first("fs").alias("fs"),
               F.count(F.lit(1)).alias("n_pop_f"),
               F.sum(F.when(below_cond, 1).otherwise(0)).alias("rnk")))
    sums = fr.agg(
        F.sum(F.when(F.col("fid") % 4 == 1, F.col("rnk"))).alias("sum_rf"),
        F.sum(F.when(F.col("fid") % 4 == 3, F.col("rnk"))).alias("sum_rg"),
        F.sum(F.when(F.col("fid") % 4 == 1, 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("fid") % 4 == 3, 1).otherwise(0)).alias("n_g"),
        F.max("n_pop_f").alias("n_pop"))
    fl = fr.where(F.col("fid") % 4 == 1).select(F.col("fs").alias("s_f"))
    gb = fr.where(F.col("fid") % 4 == 3).select(F.col("fs").alias("s_g"))
    pairs = fl.crossJoin(F.broadcast(gb)).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("s_f") > F.col("s_g"), 1).otherwise(0))
         .alias("correct_pairs"))
    return (pairs.crossJoin(F.broadcast(sums))
                 .select(
        F.lit(name).alias("scorer"),
        F.col("n_pop").cast("int").alias("n_pop"),
        F.col("n_f").cast("int").alias("n_fluent"),
        F.col("n_g").cast("int").alias("n_garbled"),
        F.col("n_pairs").cast("int").alias("n_pairs"),
        F.col("correct_pairs").cast("int").alias("correct_pairs"),
        F.expr("correct_pairs * 1000000 div n_pairs")
         .cast("bigint").alias("acc_ppm"),
        F.expr("((sum_rf * n_g - sum_rg * n_f) + n_f * n_g * n_pop)"
               " * 1000000 div (n_f * n_g * n_pop)")
         .cast("bigint").alias("rank_gap_offset_ppm")))


def _bigram_lm_score_split(pop: DataFrame, train: DataFrame) -> DataFrame:
    """`bigram_lm_score` with a SEPARATE training corpus: the model
    (unigram/bigram counts, |V|) comes from `train`, every doc of
    `pop` is scored. Unlike the self-trained scorer the count joins
    are LEFT joins with Laplace zero-coalesce — a held-out bigram has
    cnt_ab = 0 (p = 1/(cnt_a + |V|)), an unseen first token cnt_a = 0
    (p = 1/|V|) — so off-model docs keep every bigram row instead of
    silently losing the unseen ones to an inner join."""
    pairs = doc_bigrams(pop)
    uni, big = lm_model(train)
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    j = (pairs.join(big, ["a", "b"], "left")
              .join(F.broadcast(uni), "a", "left")
              .crossJoin(F.broadcast(vocab))
              .withColumn("cnt_ab", F.coalesce("cnt_ab", F.lit(0)))
              .withColumn("cnt_a", F.coalesce("cnt_a", F.lit(0))))
    return score_pairs_with_lm(j, F.col("v"))


def lm_quality_lift(documents: DataFrame) -> DataFrame:
    """Ranking-quality comparison of the two corpus-trained LM rungs
    — the `ann_recall_compare` habit applied to fluency scoring: the
    score parity gates prove each scorer's ARITHMETIC, this measures
    whether the trigram rung actually ranks better. Labeled fixtures
    (verbatim train-half docs = fluent, word-reversed twins =
    garbled) are injected into the corpus; both scorers score the
    whole population; the output is one row per scorer with its
    pairwise fluent>garbled accuracy (acc_ppm) and its mean
    population-rank separation (rank_gap_offset_ppm, 1e6 = no gap).
    A trigram lift shows as acc/gap ≥ the bigram row — measured on
    the same fixtures under the same population, every number an
    exact integer both engines replay.

    BOTH models train on the PRISTINE even-doc_id corpus half and
    never see a fixture (fixture ids are odd; the bigram side uses
    `_bigram_lm_score_split`, not the self-trained scorer — a model
    trained on the fixture-injected population would have learned the
    garbled docs' reversed bigrams, contaminating the very comparison
    this operator exists to make). Symmetric training also makes the
    rungs directly comparable: same train half, same held-out
    fixtures.

    Scale shape: fixture injection is a bounded union (≤2·LM_FIX_N
    rows); both scorers keep their production plans; rank counting
    streams each scored population once against broadcast fixtures.
    The reversed garble keeps unigram counts identical, so the
    comparison isolates exactly what the higher-order model is
    supposed to buy: sequence structure."""
    pop = tracked_persist(_lm_fixture_union(documents))
    train = (documents.select("doc_id", "text")
             .where(F.col("doc_id") % TRI_TRAIN_MOD == 0))
    big = _bigram_lm_score_split(pop, train).select(
        "doc_id", F.col("avg_bigram_p").alias("score"))
    tri = trigram_lm_score(pop).select(
        "doc_id", F.col("avg_trigram_p").alias("score"))
    return (_lm_fixture_metrics("bigram", big)
            .unionAll(_lm_fixture_metrics("trigram", tri)))


# --- intra-document repetition filter ----------------------------------------

TOP_TOK_MAX = 0.2    # max share of the single most frequent token
DUP_BIGRAM_MAX = 0.2  # max share of repeated (non-first-occurrence) bigrams


def repetition_stats(documents: DataFrame,
                     top_tok_max: float = TOP_TOK_MAX,
                     dup_bigram_max: float = DUP_BIGRAM_MAX) -> DataFrame:
    """Per-document repetition metrics — the boilerplate/spam filter
    class applied before pretraining (most-frequent-token share and
    repeated-bigram share), with a flag at the standard thresholds.

    Scale shape: the top-token share is explode → per-(doc, token)
    count → per-doc max, i.e. ONE shuffle keyed by doc_id with
    map-side partial aggregation; the bigram duplication share is
    entirely row-local (zip the token array with its tail,
    array_distinct). Nothing carries text bodies across the wire
    except the exploded tokens."""
    ws = _words(F.col("text"))
    toks = (spread(documents)
            .select("doc_id", F.explode(ws).alias("tok"))
            .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    top = toks.groupBy("doc_id").agg(F.max("tf").alias("top_tf"),
                                     F.sum("tf").alias("n_tokens"))
    from real_time_fraud_detection_flink_kafka_spark.functions.expr import let

    # bigram array let-bound: referenced twice below (size + distinct
    # size) — unbound, the zip_with (and the split under it) runs
    # twice per row (see functions/expr.let)
    def bigrams_of(wsv):
        n_pairs = F.greatest(F.size(wsv) - 1, F.lit(0))
        return F.zip_with(F.slice(wsv, 1, n_pairs), F.slice(wsv, 2, n_pairs),
                          lambda a, b: F.concat_ws(" ", a, b))

    counts = let(ws, lambda wsv: let(bigrams_of(wsv), lambda bg: F.struct(
        F.size(bg).alias("n"), F.size(F.array_distinct(bg)).alias("u"))))
    row_local = (documents
                 .select("doc_id", counts.alias("_c"))
                 .select("doc_id", F.col("_c.n").alias("n_bigrams"),
                         F.col("_c.u").alias("n_uniq_bigrams")))
    j = top.join(row_local, "doc_id")
    top_frac = F.round(F.col("top_tf") / F.col("n_tokens"), 6)
    dup_frac = F.when(F.col("n_bigrams") > 0,
                      F.round((F.col("n_bigrams") - F.col("n_uniq_bigrams"))
                              / F.col("n_bigrams"), 6)).otherwise(F.lit(0.0))
    return j.select(
        "doc_id", "n_tokens",
        top_frac.alias("top_tok_frac"),
        dup_frac.alias("dup_bigram_frac"),
        ((top_frac > top_tok_max) | (dup_frac > dup_bigram_max)).alias("flagged"))


# --- source / domain mixing ---------------------------------------------------


def source_mix(documents: DataFrame) -> DataFrame:
    """Per-source corpus composition: document and token counts plus
    each source's token share — the numbers behind domain-mixing
    weights when assembling a pretraining blend. One groupBy(source)
    over row-local token counts; the share divides by a broadcast
    1-row total, never a second scan."""
    per = (documents
           .select("source", F.size(_words(F.col("text"))).alias("nt"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("nt").alias("n_tokens")))
    total = per.agg(F.sum("n_tokens").alias("tot"))
    return (per.crossJoin(F.broadcast(total))
               .select("source", "n_docs", "n_tokens",
                       F.round(F.col("n_tokens") / F.col("tot"), 6)
                        .alias("token_share")))


N_MERGES = 4
MERGE_JOINER = "_"  # corpus charset is [a-y ]: '_' can never collide


def bpe_merges(documents: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Multi-round BPE merge-rule training: each round counts adjacent
    token pairs corpus-wide, picks the most frequent (ties to the
    lexicographically first pair), and MERGES every occurrence before
    the next round counts — the actual training loop of a BPE
    tokenizer, where round i's counts depend on rounds 1..i-1's
    merges. Output: one (merge_rank, pair, tf) row per learned rule.

    Iterative-algorithm shape (like `kmeans_centroids`): a driver
    loop over fully declarative passes. The winning pair is a 1-ROW
    RELATION crossJoin-broadcast into the next round's merge
    expression — never collected to the driver, so the whole loop is
    one lazy DAG and each round is one corpus scan + one pair-count
    shuffle (inherent to BPE: counts after a merge are not derivable
    without applying it).

    Each round's merged corpus is persist()ed: the final union of
    per-round winners has round i's relation in EVERY later round's
    lineage, so without the persist the worst case is O(rounds²)
    corpus scans (exchange reuse is not guaranteed across the union
    branches). With it, the documents parquet is scanned exactly once
    and each round's merge applied exactly once —
    tests/test_pipeline_ops.py asserts the scan count in the plan. At
    100 TB the same move is checkpointing the merged corpus between
    rounds (or training merges on a sampled slice, which changes
    nothing here but the input).

    Greedy left-to-right merge == plain non-overlapping string
    replace, via a double-space encoding: tokens are separated by two
    spaces and a pair pattern ``" a  b "`` claims ONE boundary space
    per side, so adjacent occurrences share the two-space gap and
    self-overlapping matches (``b b b`` with rule ``b b``) are
    impossible — exactly BPE's greedy scan, and identical semantics
    in Spark and the DuckDB oracle (which replays every round as
    chained CTEs)."""
    outs, _ = _bpe_train(documents, n_merges)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _bpe_train(documents: DataFrame,
               n_merges: int) -> tuple[list[DataFrame], DataFrame]:
    """Shared BPE training loop: returns (per-round winner frames,
    the fully-merged corpus after all rounds — i.e. the ENCODED
    corpus, consumed by `bpe_apply`)."""
    t = tracked_persist(documents.select(
        "doc_id",
        F.concat(F.lit(" "),
                 F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("  ")),
                 F.lit(" ")).alias("t")))
    outs = []
    for i in range(n_merges):
        ws = F.split(F.trim(F.col("t")), "  ")
        n_pairs = F.greatest(F.size(ws) - 1, F.lit(0))
        pairs = F.zip_with(F.slice(ws, 1, n_pairs), F.slice(ws, 2, n_pairs),
                           lambda a, b: F.struct(a.alias("a"), b.alias("b")))
        cnt = (t.select(F.explode(pairs).alias("p"))
                .groupBy(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
                .agg(F.count(F.lit(1)).alias("tf")))
        best = (cnt.orderBy(F.desc("tf"), F.asc("tok_a"), F.asc("tok_b"))
                   .limit(1))
        outs.append(best.select(
            F.lit(i + 1).alias("merge_rank"),
            F.concat_ws(" ", "tok_a", "tok_b").alias("pair"),
            "tf"))
        t = tracked_persist(
            t.crossJoin(F.broadcast(best))
             .select("doc_id", F.replace(
                 F.col("t"),
                 F.concat(F.lit(" "), F.col("tok_a"), F.lit("  "),
                          F.col("tok_b"), F.lit(" ")),
                 F.concat(F.lit(" "), F.col("tok_a"), F.lit(MERGE_JOINER),
                          F.col("tok_b"), F.lit(" "))).alias("t")))
    return outs, t


def bpe_apply(documents: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Tokenizer ENCODE pass: apply the learned merge rules to every
    document — greedy left-to-right, rules in rank order, exactly the
    corpus state after the training loop's final merge (training and
    encoding share `_bpe_train`, so the rules enter the replace as
    broadcast 1-row relations here too; nothing is collected).
    Output per doc: post-merge token count and an md5 of the encoded
    text, so the wide encoded strings never leave the executors (the
    `chunk_documents` move). Oracle replays the same chain and ends
    with the same projection."""
    _, t = _bpe_train(documents, n_merges)
    ws = F.split(F.trim(F.col("t")), "  ")
    return t.select("doc_id", F.size(ws).alias("n_tokens"),
                    F.md5(F.array_join(ws, " ")).alias("encoded_md5"))


# --- full intake composition ------------------------------------------------


def corpus_to_packs(documents: DataFrame,
                    jaccard_threshold: float = JACCARD_THRESHOLD,
                    min_quality: float = MIN_QUALITY,
                    n_shards: int | None = None) -> DataFrame:
    """The COMPLETE training-data intake as one declarative DAG:
    exact dedup → MinHash near-dup removal → benchmark
    decontamination (flagged train docs AND the eval slice itself
    dropped) → stratified language sampling → quality gate → greedy
    sequence packing. Every stage is the scale-path variant of its
    operator family; the whole composition is one oracle-checked
    query (the oracle chains the same six stages, ending in the
    recursive packing CTE)."""
    *_, d5 = _intake_stages(documents, jaccard_threshold, min_quality)
    return pack_sequences(d5, n_shards=n_shards)


def _intake_stages(documents: DataFrame, jaccard_threshold: float,
                   min_quality: float,
                   persist_all_stages: bool = False) -> tuple[DataFrame, ...]:
    """The shared intake stage chain (d1..d5), consumed by
    `corpus_to_packs` (packs d5 — the default single-consumer-per-
    stage shape) and `corpus_filter_funnel` (counts EVERY stage —
    passes `persist_all_stages=True` so d3/d4 are also cached:
    without it the funnel's six count branches re-derive the suffix
    independently and `decontaminate` — the 8-gram shingle job, the
    costliest stage — runs up to 3×)."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
    d1 = documents.withColumn("_rn", rn).where(F.col("_rn") == 1).drop("_rn")
    pairs = dedup_minhash_lsh_fast(d1, threshold=jaccard_threshold)
    # d2 feeds FOUR downstream consumers (decontaminate's eval + train
    # shingle slices and the d3 anti-join, then transitively the
    # sample/quality/pack stages): persist() computes the exact-dedup
    # + near-dup anti-join prefix once instead of once per consumer.
    # At 100 TB the same boundary is where a real intake pipeline
    # checkpoints to parquet between stages.
    d2 = tracked_persist(
        d1.join(pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
                "doc_id", "left_anti"))
    flagged = decontaminate(d2).select(
        F.col("train_doc_id").alias("doc_id"))
    d3 = (d2.where(F.col("doc_id") % EVAL_MOD != 0)
            .join(flagged, "doc_id", "left_anti"))
    if persist_all_stages:
        d3 = tracked_persist(d3)
    d4 = d3.join(stratified_sample(d3).select("doc_id"), "doc_id", "left_semi")
    if persist_all_stages:
        d4 = tracked_persist(d4)
    good = quality_score(d4).where(F.col("quality") >= min_quality).select("doc_id")
    d5 = d4.join(good, "doc_id", "left_semi")
    return d1, d2, d3, d4, d5


def corpus_filter_funnel(documents: DataFrame,
                         jaccard_threshold: float = JACCARD_THRESHOLD,
                         min_quality: float = MIN_QUALITY) -> DataFrame:
    """Per-stage ATTRITION report over the intake chain: document and
    token counts after every filter stage — the observability piece a
    production pipeline ships next to the pipeline itself (how much
    did dedup / decontamination / sampling / the quality gate each
    cost?). Seven tiny aggregates over the shared stage chain, with
    EVERY interior stage persisted (`persist_all_stages=True`): each
    count branch reads its stage from cache, so the expensive interior
    stages (decontaminate's shingle job above all) run exactly once
    instead of once per downstream branch — the cache-audit test pins
    the top-level plan to exactly two direct parquet scans. Each stage
    count is one map-side partial aggregation.

    Stage 06 is the Lee et al. exact-substring CUT applied to the
    quality survivors: `apply_span_removal(d5)` — n_tokens is the
    post-cut token total and docs left with zero tokens (entirely
    duplicated) drop out, so 05 → 06 attrition is the span-dedup cost
    the paper reports."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        apply_span_removal,
    )

    d1, d2, d3, d4, d5 = _intake_stages(documents, jaccard_threshold,
                                        min_quality,
                                        persist_all_stages=True)
    stages = [("00_raw", documents), ("01_exact_dedup", d1),
              ("02_near_dup", d2), ("03_decontaminated", d3),
              ("04_sampled", d4), ("05_quality", d5)]
    ws = _words(F.col("text"))
    outs = [
        df.agg(F.count(F.lit(1)).alias("n_docs"),
               F.sum(F.size(ws)).alias("n_tokens"))
          .select(F.lit(name).alias("stage"), "n_docs", "n_tokens")
        for name, df in stages
    ]
    d6 = apply_span_removal(d5).where(F.col("n_tokens_after") > 0)
    outs.append(
        d6.agg(F.count(F.lit(1)).alias("n_docs"),
               F.sum("n_tokens_after").alias("n_tokens"))
          .select(F.lit("06_span_dedup").alias("stage"), "n_docs", "n_tokens"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# --- target-mix rebalancing ---------------------------------------------------

# target blend weights in ppm (sum ≤ 1e6); sources absent from the
# dict are excluded from the blend
MIX_TARGET_PPM: dict[str, int] = {
    "src0": 400_000, "src1": 300_000, "src2": 200_000, "src3": 100_000,
}


def mix_rebalance(documents: DataFrame,
                  target_ppm: dict[str, int] | None = None) -> DataFrame:
    """Domain-mixing downsampler: given TARGET blend shares, derive
    per-source keep rates from the data and hash-gate documents to
    hit the blend — the step between `source_mix` (measure the
    composition) and training (consume the blend).

    The max feasible blend size is N* = min_s(tokens_s / w_s) (the
    binding source is kept whole); every other source keeps
    rate_s = w_s · N* / tokens_s of its tokens. Rates are derived in
    ONE tiny aggregation (|sources| rows, broadcast back), the keep
    decision is the same deterministic md5 gate as
    `stratified_sample` — row-local, reproducible across engines,
    retries and partitionings; all rate arithmetic is
    identical-ordered IEEE doubles from exact integer token counts,
    so the oracle replays it bit-for-bit.

    Scale shape: one groupBy(source) with map-side partials over
    row-local token counts, a 1-row global min, then a broadcast
    join back onto the scan — the corpus itself never shuffles."""
    target_ppm = MIX_TARGET_PPM if target_ppm is None else target_ppm
    w = F.lit(None).cast("double")
    for src, ppm in target_ppm.items():
        w = F.when(F.col("source") == src,
                   F.lit(ppm) / F.lit(1_000_000.0)).otherwise(w)
    # persisted: both nstar and the rate projection consume this
    # |sources|-row relation — without the persist the full corpus
    # token-count scan runs twice (plan-audited)
    per_src = tracked_persist(
        documents
        .select("source", F.size(_words(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("tokens_s"))
        .withColumn("w", w)
        .where(F.col("w").isNotNull()))
    nstar = per_src.agg(F.min(F.col("tokens_s") / F.col("w")).alias("nstar"))
    rates = (per_src.crossJoin(F.broadcast(nstar))
             .select("source",
                     F.least(F.lit(1.0),
                             F.col("w") * F.col("nstar") / F.col("tokens_s"))
                      .alias("rate")))
    bucket = F.pmod(md5_int60(F.col("doc_id").cast("string")),
                    F.lit(SAMPLE_MOD))
    return (documents.join(F.broadcast(rates), "source")
            .where(bucket < F.floor(F.col("rate") * SAMPLE_MOD))
            .select("doc_id", "source",
                    F.floor(F.col("rate") * SAMPLE_MOD)
                     .cast("int").alias("rate_bp")))


# --- relative quality gating --------------------------------------------------

QUALITY_GATE_Q = 0.30  # drop the bottom 30% by corpus quality


def quality_percentile_gate(documents: DataFrame,
                            q: float = QUALITY_GATE_Q) -> DataFrame:
    """Keep documents at or above the corpus's q-th quality
    percentile — RELATIVE gating (FineWeb-style "drop the worst
    30%"), vs `corpus_to_packs`' absolute threshold. The threshold is
    the exact DISCRETE percentile (an actual data value, so the gate
    is engine-exact — interpolated percentiles differ in final-ulp FP
    across engines).

    Scale shape: the naive global row_number over all docs is a
    single-task sort at 100 TB; instead the quantile runs over the
    VALUE HISTOGRAM — groupBy(quality) with map-side partials, a
    running sum over the distinct-value relation (hard-bounded at
    ≤ 10⁶+1 rows: quality is 6dp-rounded in [0,1]), and a 1-row
    threshold broadcast back. The corpus is scanned, never globally
    sorted."""
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        quality_score,
    )
    from pyspark.sql import Window

    qd = quality_score(documents).select("doc_id", "quality")
    counts = qd.groupBy("quality").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("quality").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("quality", F.sum("c").over(w).alias("cum"))
    n = qd.agg(F.count(F.lit(1)).alias("n"))
    thr = (cum.crossJoin(F.broadcast(n))
           .where(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")))
           .agg(F.min("quality").alias("q_threshold")))
    return (qd.crossJoin(F.broadcast(thr))
            .where(F.col("quality") >= F.col("q_threshold"))
            .select("doc_id", "quality", "q_threshold"))


CAL_PPM = 1_000_000
CAL_KEEP_PPM = 600_000  # keep docs above their source's 60th percentile


def quality_calibrate_by_source(documents: DataFrame,
                                keep_ppm: int = CAL_KEEP_PPM) -> DataFrame:
    """Per-SOURCE quality calibration — the cross-corpus fairness fix
    for relative gating: a global percentile gate
    (`quality_percentile_gate`) lets one well-written source crowd
    out every other source's entire tail, so production mixes gate
    each source against ITS OWN distribution (FineWeb runs its
    filters per dump for exactly this reason). Each doc gets the
    exact fraction of its source strictly below its quality
    (below_ppm, an integer ppm floor division) and a keep flag at
    the keep_ppm cut.

    Scale shape: the per-doc window over raw rows would single-task
    a hot source at 100 TB; instead the distribution runs over the
    per-source VALUE HISTOGRAM — groupBy(source, quality) with
    map-side partials (quality is 6dp-rounded, so the relation is
    hard-bounded at |sources|·(10⁶+1) rows and in practice tiny), a
    running sum window over THAT bounded relation, and one
    (source, quality)-keyed join back to the corpus.

    Determinism: counts are integers; below_ppm = (10⁶·cnt_below)
    div n_source is an exact bigint floor both engines share;
    quality values are the same 6dp-rounded doubles in both engines
    so the histogram keys agree."""
    from pyspark.sql import Window

    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        quality_score,
    )

    qd = (documents.select("doc_id", "source")
          .join(quality_score(documents).select("doc_id", "quality"),
                "doc_id"))
    hist = qd.groupBy("source", "quality").agg(F.count(F.lit(1)).alias("c"))
    w_below = (Window.partitionBy("source").orderBy("quality")
               .rowsBetween(Window.unboundedPreceding, -1))
    w_all = (Window.partitionBy("source")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    calib = hist.select(
        "source", "quality",
        F.coalesce(F.sum("c").over(w_below), F.lit(0)).alias("cnt_below"),
        F.sum("c").over(w_all).alias("n_source"))
    return (qd.join(calib, ["source", "quality"])
            .select("doc_id", "source", "quality",
                    F.col("n_source").cast("int").alias("n_source"),
                    F.expr(f"({CAL_PPM} * cnt_below) div n_source")
                     .cast("bigint").alias("below_ppm"))
            .withColumn("keep", F.col("below_ppm") >= keep_ppm))


DOMAIN_CAP_K = 10


def domain_cap(documents: DataFrame, cap: int = DOMAIN_CAP_K) -> DataFrame:
    """Per-source document cap — the FineWeb/C4-class domain-balance
    step: no source contributes more than `cap` documents to the
    blend, keepers chosen as the source's top-`cap` under
    (quality DESC, doc_id ASC). Complements
    `quality_calibrate_by_source` (relative gate) with the ABSOLUTE
    budget production mixes also enforce — one hot crawl domain must
    not drown the mix no matter how well-written it is.

    Scale shape: never a per-doc window over `source` (a hot source
    would single-task its whole partition at 100 TB). The
    strictly-above count comes from the per-source quality HISTOGRAM
    (groupBy(source, quality) — 6dp rounding bounds it at
    |sources|·(10⁶+1) rows, in practice tiny), cumulated by a window
    over that bounded relation. Whole histogram buckets then decide
    row-locally: a bucket entirely inside the cap keeps every doc,
    entirely outside drops every doc; ONLY the single per-source
    BOUNDARY bucket (the one straddling the cap) needs an
    intra-bucket doc_id rank, and that window partitions only the
    boundary bucket's rows — ≤ |sources| partitions of tie-width
    size, not corpus-sized.

    Determinism: bucket counts are integers; the boundary rank is a
    row_number under (doc_id) — total order, no ties. The oracle
    states the same contract as one per-source rank; equality holds
    because rank = cnt_above + tie_rn inside the boundary bucket."""
    from pyspark.sql import Window

    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        quality_score,
    )

    qd = (documents.select("doc_id", "source")
          .join(quality_score(documents).select("doc_id", "quality"),
                "doc_id"))
    hist = qd.groupBy("source", "quality").agg(F.count(F.lit(1)).alias("c"))
    w_above = (Window.partitionBy("source").orderBy(F.desc("quality"))
               .rowsBetween(Window.unboundedPreceding, -1))
    calib = hist.select(
        "source", "quality", "c",
        F.coalesce(F.sum("c").over(w_above), F.lit(0)).alias("cnt_above"))
    j = qd.join(calib, ["source", "quality"])
    boundary = j.where((F.col("cnt_above") < cap)
                       & (F.col("cnt_above") + F.col("c") > cap))
    wb = Window.partitionBy("source", "quality").orderBy("doc_id")
    brk = (boundary.withColumn("tie_rn", F.row_number().over(wb))
           .select("doc_id",
                   (F.col("tie_rn") <= cap - F.col("cnt_above"))
                   .alias("kept_b")))
    return (j.join(brk, "doc_id", "left")
            .select("doc_id", "source", "quality",
                    F.when(F.col("cnt_above") + F.col("c") <= cap,
                           F.lit(True))
                     .when(F.col("cnt_above") >= cap, F.lit(False))
                     .otherwise(F.coalesce("kept_b", F.lit(False)))
                     .alias("kept")))


def dedup_rate_by_source(documents: DataFrame) -> DataFrame:
    """Per-source exact-duplication observability: doc count, distinct
    text count, dup rate — the number a curation dashboard tracks per
    crawl/source to catch a misbehaving feed early. One groupBy with
    a two-phase distinct aggregate on md5(text) (32-byte keys shuffle,
    never bodies)."""
    return (documents
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count_distinct(F.md5("text")).alias("n_uniq"))
            .select("source", "n_docs", "n_uniq",
                    F.round(1 - F.col("n_uniq") / F.col("n_docs"), 6)
                     .alias("dup_rate"))
            .orderBy("source"))


# --- cross-document boilerplate detection -------------------------------------

BOILER_N = 10    # tokens per n-gram
BOILER_MIN_DF = 2  # docs an n-gram must appear in
BOILER_K = 50    # report top-k by document frequency


def boilerplate_ngrams(documents: DataFrame, n: int = BOILER_N,
                       min_df: int = BOILER_MIN_DF,
                       k: int = BOILER_K) -> DataFrame:
    """Cross-document repeated n-gram report — the boilerplate signal
    behind substring-level dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): long n-grams shared by many
    documents are headers, footers, licenses, navigation chrome. The
    report ranks n-gram HASHES by document frequency with an example
    doc and total occurrence count; a removal pass would match on the
    same hash.

    Scale shape: row-local guarded gram transform (hashes only — the
    gram text never leaves the executor), explode, one
    groupBy(gram hash) with map-side partials, then distributed top-k
    (TakeOrderedAndProject). Ties rank to the lower hash so the
    cut is deterministic."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import _let

    # let-bound token array: without the binding the HOF lambda
    # re-evaluates the split per gram index (see dedup._let)
    ws = _words(F.col("text"))
    grams = _let(ws, lambda wsv: F.when(
        F.size(wsv) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(wsv) - n + 1),
            lambda i: md5_int60(F.concat_ws(" ", F.slice(wsv, i, n))))
    ).otherwise(F.array().cast("array<bigint>")))
    e = (spread(documents)
         .select("doc_id", F.explode(F.array_distinct(grams)).alias("h"))
         .groupBy("h")
         .agg(F.count(F.lit(1)).alias("df"),
              F.min("doc_id").alias("example_doc")))
    return (e.where(F.col("df") >= min_df)
             .orderBy(F.desc("df"), F.asc("h"))
             .limit(k))


# --- count-min frequency sketch ----------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 512  # counters per row
CMS_K = 20   # heavy hitters reported


def _cms_bucket(col, j: int):
    """Row-j counter index: portable md5 of 'j:token' mod CMS_W."""
    return md5_int60(F.concat(F.lit(f"{j}:"), col)) % CMS_W


def heavy_hitters_cms(documents: DataFrame, k: int = CMS_K) -> DataFrame:
    """Heavy hitters via a COUNT-MIN SKETCH, measured against the
    exact counts — the frequency sketch completing the sketch family
    (KMV / HLL estimate CARDINALITY; CMS estimates per-item
    FREQUENCY). Like `ann_lsh_recall`, the accuracy story is
    measured, not claimed: the output carries exact_tf next to the
    sketch's est_tf for the top-k tokens, and est >= exact (the CMS
    one-sided guarantee) is pinned in pytest.

    Sketch build, the actual scale path: each token occurrence
    increments CMS_D counters chosen by portable md5 row-hashes; as a
    groupBy(j, bucket) with map-side combine every executor emits AT
    MOST CMS_D·CMS_W rows regardless of corpus size — the sketch is
    the mergeable bounded state that replaces a |V|-row shuffle when
    the vocabulary is unbounded (URLs, n-grams, user ids). The probe
    side re-derives each candidate's CMS_D buckets and takes the
    integer MIN over rows — all-integer arithmetic end to end, so the
    whole pipeline (build + probe) is value-exact between engines.
    The sketch relation joins broadcast (it is bounded by
    construction); the exact-count branch exists only to measure the
    sketch, exactly as the LSH recall curve carries its quadratic
    baseline."""
    tok = documents.select(F.explode(_words(F.col("text"))).alias("w"))
    jb = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"), _cms_bucket(F.col("w"), j).alias("b"))
        for j in range(CMS_D)])).alias("jb")
    sketch = (tok.select(jb)
                 .select(F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
                 .groupBy("j", "b").agg(F.count(F.lit(1)).alias("cnt")))
    exact = tok.groupBy("w").agg(F.count(F.lit(1)).alias("exact_tf"))
    top = exact.orderBy(F.desc("exact_tf"), F.asc("w")).limit(k)
    probes = (top.select("w", "exact_tf", jb)
                 .select("w", "exact_tf",
                         F.col("jb.j").alias("j"), F.col("jb.b").alias("b")))
    est = (probes.join(F.broadcast(sketch), ["j", "b"])
                 .groupBy("w", "exact_tf")
                 .agg(F.min("cnt").alias("est_tf")))
    rnk = Window.orderBy(F.desc("exact_tf"), F.asc("w"))
    return est.select("w", "exact_tf", "est_tf",
                      F.row_number().over(rnk).cast("int").alias("rnk"))


# --- feature hashing ---------------------------------------------------------

FEAT_D = 1024  # feature space size


def feature_hash_docs(documents: DataFrame, d: int = FEAT_D) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.) — the
    fixed-width ML feature map that needs NO vocabulary pass: token →
    bucket md5(token) % d, with the sign trick (an independent hash
    bit flips the contribution) so collisions cancel in expectation
    instead of biasing upward. Emitted in ROW form (doc_id, feature,
    weight) — the sparse-matrix COO layout a trainer ingests, and the
    exactly-shuffleable shape (fixed-width rows, no arrays).

    Scale shape: one explode + one groupBy(doc_id, feature) with
    map-side combine — weight is an INTEGER signed count, so partial
    aggregation is associative and the whole map is value-exact
    between engines; no vocabulary relation exists at all, which is
    the hashing trick's point (contrast `vocab_topk`'s |V|-row
    state). d bounds features per doc at min(n_tokens, d)."""
    tok = documents.select("doc_id", F.explode(_words(F.col("text"))).alias("w"))
    feat = md5_int60(F.concat(F.lit("feat:"), F.col("w"))) % d
    sign = F.when(md5_int60(F.concat(F.lit("sign:"), F.col("w"))) % 2 == 0,
                  F.lit(1)).otherwise(F.lit(-1))
    return (tok.select("doc_id", feat.alias("feature"), sign.alias("s"))
               .groupBy("doc_id", "feature")
               .agg(F.sum("s").cast("bigint").alias("weight"))
               .where(F.col("weight") != 0))


# --- DSIR: importance resampling toward a target distribution ------------------

DSIR_BUCKETS = 4096          # hashed-bigram feature space
DSIR_TARGET_QUALITY = 0.64   # target carve: top-quality slice of the corpus


def dsir_feature_counts(documents: DataFrame,
                        n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(doc_id, f, c) — hashed-BIGRAM feature counts, the DSIR
    feature map (Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling"): bigram → md5 bucket in [0, n_buckets).
    Row-local bigram zip (`doc_bigrams`) + one combinable groupBy —
    the fixed-width relation every DSIR stage shuffles instead of
    document bodies."""
    f = F.pmod(md5_int60(F.concat_ws(" ", "a", "b")), F.lit(n_buckets))
    return (doc_bigrams(documents)
            .select("doc_id", f.alias("f"))
            .groupBy("doc_id", "f").agg(F.count(F.lit(1)).alias("c")))


def dsir_model(documents: DataFrame,
               n_buckets: int = DSIR_BUCKETS,
               target_quality: float = DSIR_TARGET_QUALITY
               ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The 'trained' DSIR model: (feature counts, per-bucket model,
    1-row global factor) — reused by the streaming twin, which
    applies the batch-trained model to a document stream
    (stream-static broadcast join, the `lm_model` pattern).

    feats: (doc_id, f, c) persisted — it feeds three aggregates here
    and the per-doc score join in `dsir_weights`. model: ≤ n_buckets
    rows (f, cnt_r, cnt_t, p) with p = (cnt_t+1)·1e6 div (cnt_r+1).
    g6: the global constant (tot_r+B)·1e6 div (tot_t+B)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        quality_score,
    )

    feats = tracked_persist(dsir_feature_counts(documents, n_buckets))
    raw = feats.groupBy("f").agg(F.sum("c").alias("cnt_r"))
    tgt_ids = (quality_score(documents)
               .where(F.col("quality") >= target_quality).select("doc_id"))
    tgt = (feats.join(tgt_ids, "doc_id", "left_semi")
                .groupBy("f").agg(F.sum("c").alias("cnt_t")))
    tots = (raw.agg(F.sum("cnt_r").alias("tot_r"))
               .crossJoin(F.broadcast(
                   tgt.agg(F.coalesce(F.sum("cnt_t"), F.lit(0))
                           .alias("tot_t")))))
    model = (raw.join(tgt, "f", "left")
             .select("f", "cnt_r",
                     F.coalesce("cnt_t", F.lit(0).cast("bigint")).alias("cnt_t"))
             .withColumn("p", F.expr(
                 "(cnt_t + 1) * 1000000 div (cnt_r + 1)")))
    g6 = tots.select(F.expr(
        f"(tot_r + {n_buckets}) * 1000000 div (tot_t + {n_buckets})").alias("g6"))
    return feats, model, g6


def dsir_weights(documents: DataFrame,
                 n_buckets: int = DSIR_BUCKETS,
                 target_quality: float = DSIR_TARGET_QUALITY) -> DataFrame:
    """DSIR importance weights: how much more likely is each document
    under the TARGET feature distribution than under the RAW corpus
    distribution? Target here is the corpus's own high-quality slice
    (quality ≥ `target_quality`, the `quality_score` gate — in
    production it is Wikipedia/books vs the crawl). Two hashed-bigram
    bag-of-features models with Laplace smoothing, per Xie et al.;
    the per-doc statistic is the MEAN per-occurrence likelihood
    ratio, in 1e6 fixed point.

    Engine-exactness (the `bigram_lm_score` discipline, taken
    further): the ratio
      (cnt_t+1)/(tot_t+B) ÷ (cnt_r+1)/(tot_r+B)
    factors into a per-bucket part (cnt_t+1)/(cnt_r+1) and a GLOBAL
    constant (tot_r+B)/(tot_t+B), so every number is an exact bigint
    floor division: p_f = (cnt_t+1)·1e6 div (cnt_r+1), global
    g6 = (tot_r+B)·1e6 div (tot_t+B), per doc
    mean_ratio6 = ((Σ c·p) div Σc) · g6 div 1e6. No doubles, no
    logs — the log-ratio's ranking survives the monotone per-feature
    substitution while libm never enters the hash gate. Overflow
    headroom: p ≤ 2e6 (target ⊆ raw ⇒ cnt_r ≥ cnt_t), Σc·p ≤ 2e10
    per doc, g6·m1 ≤ ~1e13 — int64-safe at 100 TB token counts.

    Scale shape: feature counts persist once and feed three
    aggregates (raw model, target model, per-doc score join); the
    models are ≤ n_buckets rows (broadcast); tot/g6 ride as 1-row
    broadcasts; the only doc-keyed shuffle is the final per-doc sum.
    Docs with < 2 tokens have no bigrams and are absent (oracle's
    inner joins agree)."""
    feats, model, g6 = dsir_model(documents, n_buckets, target_quality)
    per_doc = (feats.join(F.broadcast(model.select("f", "p")), "f")
               .groupBy("doc_id")
               .agg(F.sum(F.col("c") * F.col("p")).alias("num"),
                    F.sum("c").alias("den")))
    return (per_doc.crossJoin(F.broadcast(g6))
            .select("doc_id", F.col("den").alias("n_bigrams"),
                    F.expr("(num div den) * g6 div 1000000")
                     .alias("mean_ratio6")))


def dsir_resample(documents: DataFrame,
                  n_buckets: int = DSIR_BUCKETS,
                  target_quality: float = DSIR_TARGET_QUALITY) -> DataFrame:
    """Importance RESAMPLING over the DSIR weights: keep each doc
    with probability proportional to its weight (rate_bp =
    weight·10000 div max-weight basis points), decided by the same
    deterministic md5 gate as `stratified_sample` — reproducible
    across engines, retries and partitionings (the paper's Gumbel
    top-k is one global sort; the proportional hash gate is the
    shuffle-free equivalent at corpus scale). Output: kept docs with
    their keep rate. The max weight rides as a 1-row broadcast."""
    w = tracked_persist(dsir_weights(documents, n_buckets, target_quality))
    wmax = w.agg(F.max("mean_ratio6").alias("wmax"))
    gated = (w.crossJoin(F.broadcast(wmax))
             .withColumn("rate_bp", F.expr(
                 f"mean_ratio6 * {SAMPLE_MOD} div wmax")))
    bucket = F.pmod(md5_int60(F.col("doc_id").cast("string")),
                    F.lit(SAMPLE_MOD))
    return (gated.where(bucket < F.col("rate_bp"))
            .select("doc_id", F.col("rate_bp").cast("bigint").alias("rate_bp")))


# --- corpus-law diagnostics -----------------------------------------------------

ZIPF_TOP = 1000  # fit over the top-R vocabulary (R >> this corpus's |V|)


def zipf_slope(documents: DataFrame, top: int = ZIPF_TOP) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: OLS slope of
    ln(tf) vs ln(rank) for the top-`top` tokens — the corpus-health
    diagnostic (natural language sits near slope −1; a synthetic or
    templated corpus shows up immediately as a flat or cliffed
    curve). One row: (n_points, slope, intercept).

    Engine-exactness (the `linreg_value_by_hour` discipline): each
    point's logs are snapped to 1e6 fixed-point bigints — ln runs on
    identical INTEGER args in both engines, and the sufficient
    statistics (Σx, Σy, Σxy, Σx²) are exact integer sums, so
    partial-agg order cannot drift; slope/intercept are token-
    identical IEEE expressions over those exact ints (the fixed-point
    scale cancels in cov/var). Overflow headroom: xq·yq ≤ ~1e14,
    summed over ≤1000 points ≤ 1e17 — int64-safe.

    Scale shape: one explode + one combinable groupBy(token); the
    rank window runs on the `top` SURVIVORS of a distributed top-R
    (TakeOrderedAndProject — the `vocab_topk` move), never the full
    vocabulary; the final fit is a 1-row aggregate."""
    tok = documents.select(F.explode(_words(F.col("text"))).alias("token"))
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    topr = tf.orderBy(F.desc("tf"), F.asc("token")).limit(top)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    pts = (topr.withColumn("rank", F.row_number().over(w))
           .select(F.round(F.log(F.col("rank").cast("double")) * 1e6, 0)
                    .cast("bigint").alias("xq"),
                   F.round(F.log(F.col("tf").cast("double")) * 1e6, 0)
                    .cast("bigint").alias("yq")))
    s = pts.agg(F.count(F.lit(1)).alias("n_points"),
                F.sum("xq").alias("sx"), F.sum("yq").alias("sy"),
                F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
                F.sum(F.col("xq") * F.col("xq")).alias("sxx"))
    n = F.col("n_points").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy / F.lit(1e6) - slope * (sx / F.lit(1e6))) / n
    return s.select("n_points", F.round(slope, 6).alias("slope"),
                    F.round(intercept, 6).alias("intercept"))


# --- cross-source contamination matrix ------------------------------------------


def source_overlap(documents: DataFrame, n: int = 3) -> DataFrame:
    """Which sources copy from each other? Pairwise n-gram-shingle
    Jaccard BETWEEN SOURCES — the corpus-forensics matrix run before
    mixing crawls (a source pair with high overlap double-counts its
    content in the blend and leaks dedup pressure across mix weights).
    One row per unordered source pair: shared shingle count + the
    Jaccard of the sources' distinct-shingle SETS, 6dp-rounded.

    Scale shape: doc-level distinct shingles (row-local, the
    `shingle_sets` HOF) collapse to DISTINCT (source, shingle) — the
    per-source vocabulary, shrinking with corpus redundancy; the
    pair stage self-joins that relation ON THE SHINGLE, so fan-out
    per shingle is bounded by the SOURCE count (≤ a few dozen in any
    real mix), never document count; per-source set sizes ride a
    |sources|-row broadcast. Output is |sources|² / 2 rows."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        shingles,
    )

    src_sh = tracked_persist(
        shingles(documents.select("doc_id", "text"), n)
        .join(documents.select("doc_id", "source"), "doc_id")
        .select("source", "shingle").distinct())
    sizes = src_sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = src_sh.select(F.col("source").alias("src_a"), "shingle")
    b = src_sh.select(F.col("source").alias("src_b"), "shingle")
    inter = (a.join(b, "shingle")
             .where(F.col("src_a") < F.col("src_b"))
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).alias("n_shared")))
    jac = F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return (inter
            .join(F.broadcast(sizes.select(F.col("source").alias("src_a"),
                                           F.col("n_sh").alias("na"))), "src_a")
            .join(F.broadcast(sizes.select(F.col("source").alias("src_b"),
                                           F.col("n_sh").alias("nb"))), "src_b")
            .select("src_a", "src_b", "n_shared",
                    F.round(jac, 6).alias("jaccard")))


# --- curriculum phase assignment -------------------------------------------------

CURRICULUM_PHASES = 4


def curriculum_phases(documents: DataFrame,
                      n_phases: int = CURRICULUM_PHASES) -> DataFrame:
    """Curriculum-learning phase assignment: bucket every document
    into one of `n_phases` corpus-relative quality bands (phase
    ascends with quality; a clean-first curriculum consumes phases in
    descending order, an anti-curriculum ascending). The operator a
    training scheduler joins against when the corpus is staged rather
    than shuffled wholesale.

    NOT an ntile(): a global ntile is one single-task sort of the
    whole corpus. Thresholds are exact DISCRETE percentiles computed
    over the VALUE HISTOGRAM (the `quality_percentile_gate` move —
    groupBy(quality) bounded at ≤1e6+1 distinct 6dp values), cut
    points land on actual data values via the integer-exact
    ceil(k·n/P) = (k·n+P−1) div P rank, and the ≤ P−1 thresholds
    collapse into ONE broadcast array row — phase is then a row-local
    count of thresholds strictly below the doc's quality. Ties share
    a phase by construction (strict > against the cut value), so the
    assignment is engine- and partitioning-independent."""
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        quality_score,
    )

    qd = quality_score(documents).select("doc_id", "quality")
    counts = qd.groupBy("quality").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("quality").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select("quality", F.sum("c").over(w).alias("cum"))
    n = qd.agg(F.count(F.lit(1)).alias("n"))
    ks = (n.sparkSession.range(1, n_phases)
          .select(F.col("id").alias("k")))
    thr = (cum.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ks))
           .where(F.col("cum") >= F.expr(
               f"(k * n + {n_phases} - 1) div {n_phases}"))
           .groupBy("k").agg(F.min("quality").alias("t")))
    ts = thr.groupBy().agg(F.sort_array(F.collect_list("t")).alias("ts"))
    phase = (F.lit(1) + F.size(F.filter(
        F.col("ts"), lambda t: F.col("quality") > t))).cast("bigint")
    return (qd.crossJoin(F.broadcast(ts))
            .select("doc_id", "quality", phase.alias("phase")))


TEMP_ALPHA = 0.3        # mT5/XLM-R temperature exponent
TEMP_WEIGHT_SCALE = 10 ** 9  # fixed-point p^alpha weights


def temperature_mix(documents: DataFrame,
                    alpha: float = TEMP_ALPHA) -> DataFrame:
    """Temperature-scaled source sampling (mT5 / XLM-R, Conneau et
    al. 2020): blend shares q_s ∝ p_s^α flatten the source
    distribution (α<1 upsamples small sources, α=1 is proportional =
    keep everything), realized as per-source keep rates with the max
    feasible blend N* = min_s(tokens_s / q_s) — the POLICY cousin of
    `mix_rebalance` (there the blend is user-given; here it is
    derived from the corpus itself).

    Scale shape: identical to mix_rebalance — one groupBy(source)
    with map-side partials, |sources|-row arithmetic, broadcast rates
    joined back onto the scan (the corpus never shuffles); the keep
    decision is the shared deterministic md5 gate.

    Determinism: the only cross-row reductions are an INTEGER sum of
    fixed-point weights (round(p^α·1e9) bigint — order-free) and a
    min over per-row doubles; every double op is per-row with a fixed
    operation order, so the oracle replays it bit-for-bit. pow()'s
    last ulp can flip the weight round only exactly at a 5e-10
    boundary (the tfidf ln() trade, stated there)."""
    return apply_mix_gate(documents, temperature_rates(documents, alpha))


def temperature_rates(documents: DataFrame,
                      alpha: float = TEMP_ALPHA) -> DataFrame:
    """The trained side of `temperature_mix`: the |sources|-row
    (source, rate) relation — reusable as a broadcast model by the
    streaming twin (`streaming.corpus.run_temperature_mix_stream`)."""
    per_src = tracked_persist(
        documents
        .select("source", F.size(_words(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("tokens_s")))
    tot = per_src.agg(F.sum("tokens_s").alias("_tot"))
    wts = (per_src.crossJoin(F.broadcast(tot))
           .withColumn("pa_fp",
                       F.round(F.pow(F.col("tokens_s") / F.col("_tot"),
                                     F.lit(alpha)) * TEMP_WEIGHT_SCALE)
                        .cast("bigint")))
    z = wts.agg(F.sum("pa_fp").alias("_z"))
    wq = (wts.crossJoin(F.broadcast(z))
             .withColumn("q", F.col("pa_fp") / F.col("_z")))
    ns = wq.agg(F.min(F.col("tokens_s") / F.col("q")).alias("_nstar"))
    return (wq.crossJoin(F.broadcast(ns))
              .select("source",
                      F.least(F.lit(1.0),
                              F.col("q") * F.col("_nstar") / F.col("tokens_s"))
                       .alias("rate")))


def apply_mix_gate(documents: DataFrame, rates: DataFrame) -> DataFrame:
    """Row-local md5 keep gate against a broadcast (source, rate)
    relation — shared by `temperature_mix` and its streaming twin
    (zero state: the gate is a filter, not an aggregation)."""
    bucket = F.pmod(md5_int60(F.col("doc_id").cast("string")),
                    F.lit(SAMPLE_MOD))
    return (documents.join(F.broadcast(rates), "source")
            .where(bucket < F.floor(F.col("rate") * SAMPLE_MOD))
            .select("doc_id", "source",
                    F.floor(F.col("rate") * SAMPLE_MOD)
                     .cast("int").alias("rate_bp")))


SPAN_RATE_PCT = 15   # tokens masked, as % of doc length (T5's 15%)
SPAN_LEN = 3         # fixed span length (T5's mean noise span)


def span_corruption(documents: DataFrame) -> DataFrame:
    """T5-style span-corruption mask generation (Raffel et al. 2020
    §3.1.4): pick ~SPAN_RATE_PCT% of each document's tokens in
    SPAN_LEN-token spans and emit one row per masked span —
    (sentinel_id, span_start, span_len, span_text) — the
    objective-construction pass a pretraining pipeline runs over
    every document.

    Deterministic placement instead of T5's RNG: the document is cut
    into n_spans equal segments (n_spans = ⌊n·0.15⌋/SPAN_LEN, so
    segments are ≥ 20 tokens and spans can never collide or overrun)
    and each segment hosts one span at offset
    md5(doc_id ':' k) % (seg_len − SPAN_LEN + 1) — reproducible
    across engines, retries and partitionings, same statistical
    shape.

    Scale shape: ENTIRELY row-local (transform over a sentinel
    sequence + posexplode) — zero shuffles, pure map; the mask
    relation streams straight to the trainer's collator.

    Determinism: integer floor divisions and the md5 gate only — no
    FP anywhere."""
    w = SPAN_LEN
    ws = _words(F.col("text"))
    docs = documents.select("doc_id", ws.alias("ws"),
                            F.size(ws).alias("n"))
    n_spans = F.expr(f"(n * {SPAN_RATE_PCT}) div 100 div {w}")
    seg_len = F.expr(f"n div ((n * {SPAN_RATE_PCT}) div 100 div {w})")
    spans_arr = F.transform(
        F.sequence(F.lit(0), n_spans.cast("int") - 1),
        lambda k: (k * seg_len
                   + F.pmod(md5_int60(F.concat(F.col("doc_id").cast("string"),
                                               F.lit(":"), k.cast("string"))),
                            F.greatest(seg_len - w + 1, F.lit(1)))))
    b = (docs.where(n_spans >= 1)
             .select("doc_id", "ws",
                     F.posexplode(spans_arr).alias("sentinel_id", "span_start")))
    return b.select(
        "doc_id", F.col("sentinel_id").cast("int").alias("sentinel_id"),
        F.col("span_start").cast("int").alias("span_start"),
        F.lit(w).cast("int").alias("span_len"),
        F.concat_ws(" ", F.slice("ws", F.col("span_start").cast("int") + 1, w))
         .alias("span_text"))


CONTRAST_SPAN = 16     # words per crop
CONTRAST_BUCKETS = 64  # negative-pairing hash buckets


def contrastive_pairs(documents: DataFrame) -> DataFrame:
    """Contrastive-pair mining for retriever pretraining (Contriever,
    Izacard et al. 2022 — independent cropping): anchor and positive
    are two disjoint CONTRAST_SPAN-word crops of the SAME document
    (front / immediately following), the negative is another
    document's anchor crop, paired deterministically: docs hash into
    CONTRAST_BUCKETS md5 buckets and each doc takes the lowest-doc_id
    member of the NEXT bucket as its negative — reproducible across
    engines and partitionings, no RNG.

    Scale shape: crops are row-local slices; the negative map is one
    |buckets|-row aggregation broadcast back onto the scan (its texts
    ride along, ≤ B·SPAN words) — the corpus itself NEVER shuffles.
    Docs shorter than 2·CONTRAST_SPAN words are skipped (no partial
    crops), as are docs whose next bucket is empty or resolves to
    themselves.

    Determinism: md5 bucket arithmetic and integer mins only."""
    w = CONTRAST_SPAN
    ws = _words(F.col("text"))
    base = (documents
            .select("doc_id", ws.alias("ws"))
            .where(F.size("ws") >= 2 * w)
            .select("doc_id",
                    F.concat_ws(" ", F.slice("ws", 1, w)).alias("anchor_text"),
                    F.concat_ws(" ", F.slice("ws", w + 1, w)).alias("positive_text"),
                    F.pmod(md5_int60(F.col("doc_id").cast("string")),
                           F.lit(CONTRAST_BUCKETS)).alias("bucket")))
    neg_map = (base.groupBy("bucket")
                   .agg(F.min(F.struct("doc_id", "anchor_text")).alias("m"))
                   .select(F.pmod(F.col("bucket") - 1, F.lit(CONTRAST_BUCKETS))
                            .alias("bucket"),
                           F.col("m.doc_id").alias("neg_doc_id"),
                           F.col("m.anchor_text").alias("negative_text")))
    return (base.join(F.broadcast(neg_map), "bucket")
                .where(F.col("neg_doc_id") != F.col("doc_id"))
                .select("doc_id", "anchor_text", "positive_text",
                        "neg_doc_id", "negative_text"))


SPLIT_TRAIN_PCT = 90   # md5 bucket < 90 → train
SPLIT_VAL_PCT = 95     # 90-94 → val, 95-99 → test


def dataset_split(documents: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment — the split every
    training pipeline needs to be REPRODUCIBLE and LEAK-FREE across
    reruns, retries and repartitions: the md5 bucket of doc_id alone
    decides (never position or randomness), so a document keeps its
    split for life even as the corpus around it grows — the property
    that prevents silent eval-set contamination between dataset
    versions. Row-local, zero shuffles.

    Stratification note: hash buckets are uniform per source, so
    per-source split rates converge to 90/5/5 without a per-source
    pass (asserted at test time); an exact-quota stratified variant
    would need the curriculum_phases histogram machinery."""
    bucket = F.pmod(md5_int60(F.col("doc_id").cast("string")),
                    F.lit(100))
    split = (F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
              .when(bucket < SPLIT_VAL_PCT, F.lit("val"))
              .otherwise(F.lit("test")))
    return documents.select("doc_id", "source",
                            bucket.cast("int").alias("bucket"),
                            split.alias("split"))
