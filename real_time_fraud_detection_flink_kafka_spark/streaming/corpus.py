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


def _documents_stream(spark, sf_dir: str):
    import os

    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    return (spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir))


def _dedup_agg(stream: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return (stream.groupBy(F.md5("text").alias("text_md5"))
            .agg(F.min("doc_id").alias("canonical_doc_id"),
                 F.count(F.lit(1)).alias("n_copies"))
            .select("canonical_doc_id", "n_copies", "text_md5"))


def run_corpus_dedup_stream(spark, sf_dir: str,
                            query_name: str = "corpus_dedup_stream") -> DataFrame:
    """Incremental exact dedup over the corpus stream: a streaming
    groupBy(md5(text)) keeping the canonical (min) doc_id and copy
    count. An AGGREGATION, not dropDuplicates — dropDuplicates keeps
    the first-ARRIVING row, which races across partitions; min() is
    order-free, so the drained state equals the batch `dedup_exact`
    exactly and shares its oracle.

    SCALE CONTRACT — bounded drain only: complete mode re-emits the
    ENTIRE state table every trigger and keeps every key in state
    forever. That is exactly right for this harness shape (drain a
    bounded corpus, compare the final table to the batch oracle) and
    exactly wrong for a genuinely continuous 100 TB intake, where the
    per-trigger output volume alone is a scale-killer — use the
    update-mode twin (`run_corpus_dedup_stream_update`) with an
    upsert sink for that, and bound state with TTL/periodic
    compaction (documents carry no event time, so watermark eviction
    does not apply). The batch `dedup_exact` remains the production
    path for full-corpus dedup."""
    ensure_session_confs(spark)
    out = _dedup_agg(_documents_stream(spark, sf_dir))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_corpus_dedup_stream_update(spark, sf_dir: str,
                                   query_name: str = "corpus_dedup_update",
                                   progress_out: list | None = None) -> DataFrame:
    """UPDATE-mode twin of `run_corpus_dedup_stream` — the continuous-
    intake shape: each trigger emits ONLY the keys whose state changed
    (complete mode re-emits the whole state table, output volume
    O(all keys) per trigger; update mode is O(changed keys)). Update
    mode pairs with an idempotent upsert sink in production; the
    memory-sink drain applies the same upsert compaction batch-side —
    latest emission per key, expressed as min/max since both
    aggregates are MONOTONE (canonical id only falls, copy count only
    rises), so multi-batch drains reduce to the final state and the
    result stays equal to batch `dedup_exact` (same shared oracle).

    State is still one row per distinct text hash — `progress_out`
    (appended with the final StreamingQueryProgress) lets tests pin
    numRowsTotal to exactly that bound; a continuous deployment
    bounds it further with state TTL or periodic compaction, since
    no event time exists to watermark on."""
    from pyspark.sql import functions as F

    ensure_session_confs(spark)
    out = _dedup_agg(_documents_stream(spark, sf_dir))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    if progress_out is not None:
        progress_out.append(q.lastProgress)
    return (spark.table(query_name)
            .groupBy("text_md5")
            .agg(F.min("canonical_doc_id").alias("canonical_doc_id"),
                 F.max("n_copies").alias("n_copies"))
            .select("canonical_doc_id", "n_copies", "text_md5"))


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
    its oracle.

    SCALE CONTRACT — bounded drain only: complete mode re-emits all
    per-doc state every trigger and retains it forever; right for
    this harness (drain a bounded corpus, compare final state),
    wrong for continuous 100 TB intake. The continuous shape is the
    update-mode + upsert-sink pattern — `run_lm_score_stream_update`
    below IS that twin (registered, same oracle) — with TTL-bounded
    state; the batch scorer stays the production path for
    full-corpus scoring."""
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


def run_trigram_lm_stream(spark, sf_dir: str,
                          query_name: str = "trigram_stream") -> DataFrame:
    """STREAM-STATIC twin of `trigram_lm_score`: the trigram model
    (with its bigram/unigram backoff relations) trains on the batch
    corpus's even-doc_id half, then scores documents arriving as a
    file stream — the model-trained-offline / applied-online shape,
    one rung above `run_lm_score_stream`. All model relations are
    broadcast into each micro-batch (stream-static joins must be
    map-side); |V| is collected once as model metadata. Per-doc sums
    are fixed-point integers, so the complete-mode drained state is
    arrival-order free and equals the batch scorer exactly (shared
    oracle).

    SCALE CONTRACT — bounded drain only (the run_lm_score_stream
    contract): complete mode retains and re-emits all per-doc state;
    a continuous intake uses update mode + upsert sink with
    TTL-bounded state, and the batch scorer remains the full-corpus
    production path."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        TRI_TRAIN_MOD,
        doc_trigrams,
        score_trigrams_with_lm,
        trigram_model,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    batch = load_table(spark, sf_dir, "documents")
    uni, big, tric = trigram_model(
        batch.where(F.col("doc_id") % TRI_TRAIN_MOD == 0))
    # the model is TRAINED ONCE, offline — persist the three count
    # relations so the stream side never re-tokenizes the train half:
    # unpersisted, each micro-batch plan rebuilt uni/big/tric from raw
    # text, and `big` evaluates TWICE per batch (trigram-denominator
    # join + the backoff relation derived from it). |V| rides as a
    # broadcast 1-row agg exactly like the batch scorer — no blocking
    # driver-side count before the stream starts.
    #
    # MEASURED FLOOR (r12, sf0.1 warm): the r11 bench read this drain
    # at 1,596 docs/s — 30× below the event-keyed drains — but the
    # denominator differs (5,000 docs vs 100,000 events) AND the
    # complete-mode drain re-runs the FULL batch scoring plan, so the
    # drain is lower-bounded by the batch `trigram_lm_score` wall time
    # itself (~1.6 s at sf0.1 → ≤ ~3,100 docs/s on this host no matter
    # what the stream side does). The persist + deferred-|V| rework
    # cuts the duplicated model build; what remains IS the scorer.
    uni, big, tric = (tracked_persist(uni), tracked_persist(big),
                      tracked_persist(tric))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))

    out = score_trigrams_with_lm(
        doc_trigrams(_documents_stream(spark, sf_dir))
        .crossJoin(F.broadcast(vocab)),
        uni, big, tric, F.col("v"), broadcast_model=True)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_pii_scrub_stream(spark, sf_dir: str,
                         query_name: str = "pii_stream") -> DataFrame:
    """Bounded drain of the PII scrubber over a documents file stream
    — the compliance pass run AT INTAKE, where a production pipeline
    wants it (scrub before anything else persists the raw text).
    Stateless row-local regexes → append mode streams rows straight
    through; the drained result must equal batch `pii_scrub` exactly
    (shared oracle)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        pii_scrub,
    )

    ensure_session_confs(spark)
    out = pii_scrub(_documents_stream(spark, sf_dir))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_lm_score_stream_update(spark, sf_dir: str,
                               query_name: str = "lm_stream_update",
                               progress_out: list | None = None) -> DataFrame:
    """UPDATE-mode twin of `run_lm_score_stream` — the continuous-
    intake output shape for the online quality filter: each trigger
    emits only the docs whose state changed (O(changed docs), not
    O(all docs) like complete mode). The memory-sink drain applies
    the production upsert compaction batch-side: per doc, keep the
    emission with the LARGEST n_bigrams — the per-doc bigram count
    only grows as the doc's pair rows accumulate, so that emission IS
    the final state and the result equals batch `bigram_lm_score`
    (same shared oracle). State is one row per doc; a continuous
    deployment bounds it with TTL, since scored docs never update
    again once their file is consumed."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        doc_bigrams,
        lm_model,
        score_pairs_with_lm,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    batch = load_table(spark, sf_dir, "documents")
    uni, big = lm_model(batch)
    v = uni.count()  # model metadata: vocabulary size
    pairs = doc_bigrams(_documents_stream(spark, sf_dir))
    j = pairs.join(F.broadcast(big), ["a", "b"]).join(F.broadcast(uni), "a")
    out = score_pairs_with_lm(j, F.lit(v))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    if progress_out is not None:
        progress_out.append(q.lastProgress)
    return (spark.table(query_name)
            .groupBy("doc_id")
            .agg(F.expr("max_by(struct(n_bigrams, avg_bigram_p), n_bigrams)")
                  .alias("_x"))
            .select("doc_id", F.col("_x.n_bigrams").alias("n_bigrams"),
                    F.col("_x.avg_bigram_p").alias("avg_bigram_p")))


def run_dedup_incremental_stream(spark, sf_dir: str,
                                 query_name: str = "inc_dedup_stream"
                                 ) -> DataFrame:
    """STREAMING twin of `dedup.dedup_incremental` — the production
    daily-intake shape as an actual intake: the DELTA documents
    arrive as a file stream and are judged against the STATIC
    existing corpus (its md5 clusters and minhash-signature band
    index batch-built and persisted, exactly what a production
    pipeline keeps between increments). Same output contract, same
    oracle: (doc_id, status, n_exact, n_near) per delta doc.

    Plan shape — everything before the last step is STATELESS:
    - exact branch: stream md5(text) ⋈ static corpus clusters
      (stream-static broadcast join);
    - near branch: per-doc minhash signatures (row-local expressions)
      → band explode → stream-static band join against the corpus
      band index → per-pair set-intersection verify. Cross-band
      duplicate candidates (a pair sharing >1 band) are eliminated
      ROW-LOCALLY instead of with a stateful distinct: both sides
      carry their full band-key arrays, and a match only counts at
      the pair's FIRST common band (no earlier index agrees) — the
      standard trick for turning LSH's `distinct()` into a
      stateless predicate;
    - one streaming groupBy(doc_id) folds exact/near/self branches
      into the counts (the single stateful op; complete-mode drain,
      same bounded-drain contract as `run_corpus_dedup_stream` —
      production uses the update-mode + upsert-sink shape with one
      state row per in-flight delta doc)."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist
    from real_time_fraud_detection_flink_kafka_spark.functions import hashing as H
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        DELTA_MOD,
        JACCARD_THRESHOLD,
        minhash_signatures,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    is_delta = (F.col("doc_id") % DELTA_MOD) == F.lit(0)

    def band_keys_col():
        return F.array(*[
            (F.col(f"m{2 * j}") * H.P + F.col(f"m{2 * j + 1}"))
            for j in range(H.N_BANDS)])

    # static side: the persisted between-increments corpus index
    batch = load_table(spark, sf_dir, "documents")
    corpus = batch.where(~is_delta)
    c_clusters = tracked_persist(
        corpus.groupBy(F.md5("text").alias("text_md5"))
              .agg(F.count(F.lit(1)).alias("c_size"),
                   F.min("doc_id").alias("c_rep")))
    c_rep_docs = batch.join(
        c_clusters.select(F.col("c_rep").alias("doc_id")), "doc_id")
    c_index = tracked_persist(
        minhash_signatures(c_rep_docs)
        .withColumn("c_bands", band_keys_col())
        .join(c_clusters.select(F.col("c_rep").alias("doc_id"), "c_size"),
              "doc_id")
        .select(F.col("doc_id").alias("c_rep"), "c_size",
                F.col("sh_set").alias("set_c"), "c_bands",
                F.posexplode("c_bands").alias("band_idx", "band_key")))

    # stream side: the delta increment arriving as files
    delta = _documents_stream(spark, sf_dir).where(is_delta)
    dsig = (minhash_signatures(delta)
            .withColumn("d_bands", band_keys_col())
            .select("doc_id", F.col("sh_set").alias("set_d"), "d_bands",
                    F.posexplode("d_bands").alias("band_idx", "band_key")))
    cand = dsig.join(F.broadcast(c_index), ["band_idx", "band_key"])
    first_match = F.when(F.col("band_idx") == 0, F.lit(True)).otherwise(
        F.size(F.filter(
            F.sequence(F.lit(0), F.col("band_idx") - 1),
            lambda j: F.element_at(F.col("d_bands"), j + 1)
            == F.element_at(F.col("c_bands"), j + 1))) == 0)
    inter = F.size(F.array_intersect("set_d", "set_c"))
    jac = inter / (F.size("set_d") + F.size("set_c") - inter)
    near = (cand.where(first_match)
                .where((F.size("set_d") > 0) & (F.size("set_c") > 0))
                .where(F.round(jac, 6) >= JACCARD_THRESHOLD)
                .select("doc_id", F.lit("near").alias("kind"),
                        F.col("c_size").alias("size")))
    exact = (delta.select("doc_id", F.md5("text").alias("text_md5"))
                  .join(F.broadcast(c_clusters), "text_md5")
                  .select("doc_id", F.lit("exact").alias("kind"),
                          F.col("c_size").alias("size")))
    self_rows = delta.select("doc_id", F.lit("self").alias("kind"),
                             F.lit(0).cast("bigint").alias("size"))
    counts = (near.unionByName(exact).unionByName(self_rows)
              .groupBy("doc_id")
              .agg(F.sum(F.when(F.col("kind") == "exact", F.col("size")))
                    .alias("x"),
                   F.sum(F.when(F.col("kind") == "near", F.col("size")))
                    .alias("n")))
    out = counts.select(
        "doc_id",
        F.when(F.coalesce("x", F.lit(0)) > 0, F.lit("exact_dup"))
         .when(F.coalesce("n", F.lit(0)) > 0, F.lit("near_dup"))
         .otherwise(F.lit("new")).alias("status"),
        F.coalesce("x", F.lit(0).cast("bigint")).alias("n_exact"),
        F.coalesce("n", F.lit(0).cast("bigint")).alias("n_near"))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_phash_dedup_stream(spark, sf_dir: str,
                           query_name: str = "phash_dedup_stream"
                           ) -> DataFrame:
    """STREAMING twin of `multimodal.dedup_phash_incremental` —
    perceptual image dedup ON the ingest path: the image increment
    arrives as a file stream and is judged against the STATIC
    corpus's banded dHash index (batch-built and persisted — what a
    production media pipeline keeps between increments). Same output
    contract, same oracle: (doc_id, status, n_same_hash, n_near) per
    delta image.

    Plan shape mirrors `run_dedup_incremental_stream`: the signature
    is a row-local expression over arriving rows (`phash_expr` —
    identical to the batch expression, no twin union on the stream
    side since injected twins are corpus-side by construction); band
    explode → stream-static broadcast join on (band_idx, band_key);
    cross-band duplicate candidates removed ROW-LOCALLY by the
    first-common-band predicate over both sides' band-key arrays
    (banding's `distinct()` as a stateless filter); hamming verify
    row-local; one streaming groupBy(doc_id) folds hit/self rows into
    the counts — the single stateful op (complete-mode bounded
    drain; production uses update mode + an upsert sink).

    Band explode is posexplode_OUTER — the `dedup.shingles` lesson in
    streaming form: plain posexplode plants an implicit
    `size(bands) > 0` pre-filter containing the WHOLE inlined phash
    expression, and the streaming microbatch planner pushed that
    predicate below the length(text) guard — evaluating the pooling
    on short rows, where the empty-cell sequence() DESCENDS through
    index 0 (INVALID_INDEX_OF_ZERO, measured r14). The outer variant
    has no pre-filter; the band array is always 4-long so no null
    rows appear."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist
    from real_time_fraud_detection_flink_kafka_spark.operators.multimodal import (
        MODALITIES,
        PHASH_BANDS,
        PHASH_HAMMING_MAX,
        PHASH_MIN_LEN,
        _phash_is_delta,
        image_phash_signatures,
        phash_expr,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)

    def band_arr():
        return F.array(*[
            F.shiftright(F.col("phash"), 15 * j).bitwiseAND((1 << 15) - 1)
            for j in range(PHASH_BANDS)])

    batch_sig = image_phash_signatures(load_table(spark, sf_dir, "documents"))
    c_index = tracked_persist(
        batch_sig.where(~_phash_is_delta())
        .withColumn("c_bands", band_arr())
        .select(F.col("phash").alias("ph_c"), "c_bands",
                F.posexplode_outer("c_bands").alias("band_idx", "band_key")))

    img_idx = MODALITIES.index("image")
    delta = (_documents_stream(spark, sf_dir)
             .where((F.col("doc_id") % len(MODALITIES) == img_idx)
                    & (F.length("text") >= PHASH_MIN_LEN)
                    & _phash_is_delta())
             .select("doc_id", F.expr(phash_expr()).alias("phash")))
    d = (delta.withColumn("d_bands", band_arr())
         .select("doc_id", F.col("phash").alias("ph_d"), "d_bands",
                 F.posexplode_outer("d_bands").alias("band_idx", "band_key")))
    cand = d.join(F.broadcast(c_index), ["band_idx", "band_key"])
    first_match = F.when(F.col("band_idx") == 0, F.lit(True)).otherwise(
        F.size(F.filter(
            F.sequence(F.lit(0), F.col("band_idx") - 1),
            lambda j: F.element_at(F.col("d_bands"), j + 1)
            == F.element_at(F.col("c_bands"), j + 1))) == 0)
    hamming = F.bit_count(F.col("ph_d").bitwiseXOR(F.col("ph_c")))
    hits = (cand.where(first_match).where(hamming <= PHASH_HAMMING_MAX)
            .select("doc_id",
                    F.when(F.col("ph_d") == F.col("ph_c"), 1)
                     .otherwise(0).alias("same"),
                    F.lit(1).alias("near")))
    self_rows = delta.select("doc_id", F.lit(0).alias("same"),
                             F.lit(0).alias("near"))
    counts = (hits.unionByName(self_rows)
              .groupBy("doc_id")
              .agg(F.sum("same").alias("s"), F.sum("near").alias("n")))
    out = counts.select(
        "doc_id",
        F.when(F.col("s") > 0, F.lit("same_hash"))
         .when(F.col("n") > 0, F.lit("near_dup"))
         .otherwise(F.lit("new")).alias("status"),
        F.col("s").cast("bigint").alias("n_same_hash"),
        F.col("n").cast("bigint").alias("n_near"))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_pq_encode_stream(spark, sf_dir: str,
                         query_name: str = "pq_encode_stream") -> DataFrame:
    """STREAM-STATIC serving path for the PQ index: codebooks trained
    on the BATCH corpus, vectors arriving as a file stream encoded to
    their PQ_M code ids per micro-batch — the
    model-trained-offline / applied-online shape a production vector
    store runs at ingest. `pq_encode` is row-local (the argmin over a
    subspace's codes happens inside the row via array_min, not a
    groupBy), so the stream needs ZERO state and append mode streams
    code rows straight through; the drained result must equal the
    batch encode exactly (shared oracle)."""
    import os

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        pq_codebooks_rel,
        pq_encode,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    cb = pq_codebooks_rel(load_table(spark, sf_dir, "embeddings"))
    schema = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "embeddings.parquet")
              .parquet(sf_dir))
    out = pq_encode(stream, cb=cb)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_sq8_encode_stream(spark, sf_dir: str,
                          query_name: str = "sq8_encode_stream") -> DataFrame:
    """STREAM-STATIC serving path for the SQ8 index — the
    `run_pq_encode_stream` shape at the other compression rung:
    per-dim [mn, mx] params learned on the BATCH corpus (one min/max
    pass, a 1-row broadcast), vectors arriving as a file stream
    encoded to their byte codes per micro-batch. Encode is row-local
    (zip_with against the broadcast params), so the stream needs ZERO
    state, append mode streams code rows straight through, and the
    drained result equals the batch encode exactly (shared oracle)."""
    import os

    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        sq8_encode_rel,
        sq_params,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    params = sq_params(load_table(spark, sf_dir, "embeddings"))
    schema = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "embeddings.parquet")
              .parquet(sf_dir))
    out = (sq8_encode_rel(stream, params)
           .select("vec_id", F.posexplode("codes").alias("dim", "code")))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_dsir_weights_stream(spark, sf_dir: str,
                            query_name: str = "dsir_stream") -> DataFrame:
    """DSIR scoring AS an intake stage: the importance model is
    trained on the BATCH corpus (`dsir_model` — per-bucket ratios +
    the 1-row global factor) and applied to documents arriving as a
    file stream — the offline-trained / online-scored shape of every
    production data-selection filter (the `run_lm_score_stream`
    pattern). The per-doc sum runs over bigram OCCURRENCES (one row
    per bigram, bucket join against the ≤4096-row broadcast model) so
    the whole query has exactly ONE stateful aggregation — Spark
    forbids stacked streaming aggs, and Σ_occurrences p ≡ Σ_f c·p
    keeps the arithmetic identical to the batch path. g6 rides as
    collected model metadata (a constant of the trained model, the
    `v = uni.count()` move). Integer sums make the drained complete-
    mode state arrival-order free: equals batch `dsir_weights`
    exactly, shares its oracle."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.functions.hashing import (
        md5_int60,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        DSIR_BUCKETS,
        doc_bigrams,
        dsir_model,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    batch = load_table(spark, sf_dir, "documents")
    _, model, g6_rel = dsir_model(batch)
    g6 = g6_rel.first()["g6"]  # model metadata, like the LM's |V|

    occ = (doc_bigrams(_documents_stream(spark, sf_dir))
           .select("doc_id",
                   F.pmod(md5_int60(F.concat_ws(" ", "a", "b")),
                          F.lit(DSIR_BUCKETS)).alias("f")))
    out = (occ.join(F.broadcast(model.select("f", "p")), "f")
           .groupBy("doc_id")
           .agg(F.sum("p").alias("num"), F.count(F.lit(1)).alias("den"))
           .select("doc_id", F.col("den").alias("n_bigrams"),
                   F.expr(f"(num div den) * {g6} div 1000000")
                    .alias("mean_ratio6")))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_temperature_mix_stream(spark, sf_dir: str,
                               query_name: str = "temp_mix_stream") -> DataFrame:
    """Temperature sampling AT INTAKE: the per-source keep rates are
    trained on the BATCH corpus (`temperature_rates` — a |sources|-row
    broadcast model) and applied to documents arriving as a file
    stream through the shared row-local md5 gate (`apply_mix_gate`) —
    the offline-trained / online-gated shape of `run_dsir_weights_stream`
    with ZERO stateful aggregations (the gate is a filter), so append
    mode streams kept rows straight through and the drained result
    equals batch `temperature_mix` exactly (shared oracle)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        apply_mix_gate,
        temperature_rates,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    rates = temperature_rates(load_table(spark, sf_dir, "documents"))
    out = apply_mix_gate(_documents_stream(spark, sf_dir), rates)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_span_corruption_stream(spark, sf_dir: str,
                               query_name: str = "span_corr_stream") -> DataFrame:
    """Span-corruption mask generation AT INTAKE: `span_corruption`
    is entirely row-local (deterministic md5 offsets — no model, no
    corpus statistics), so the stream twin needs ZERO state and no
    batch-trained relation at all: append mode streams mask rows
    straight through and the drained result equals the batch pass
    exactly (shared oracle) — the objective-construction stage moved
    onto the ingest path."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        span_corruption,
    )

    ensure_session_confs(spark)
    out = span_corruption(_documents_stream(spark, sf_dir))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_gopher_rules_stream(spark, sf_dir: str,
                            query_name: str = "gopher_stream") -> DataFrame:
    """The Gopher rule battery ON the ingest path: the row-local
    reformulation (`gopher_rules_rowlocal` — sorted-run max_tf fold,
    array_distinct/intersect counts, zero shuffles) needs ZERO state
    and no trained relation, so append mode streams per-doc rule rows
    straight through; the drained result equals the batch tf-path
    battery exactly (equivalence-pinned; shared oracle)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        gopher_rules_rowlocal,
    )

    ensure_session_confs(spark)
    out = gopher_rules_rowlocal(_documents_stream(spark, sf_dir))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)


def run_beam_serve_stream(spark, sf_dir: str,
                          query_name: str = "beam_serve_stream") -> DataFrame:
    """Query-stream SERVING path for the navigable-graph ANN index —
    what an index deployment actually runs: the multi-probe edge
    relation is built ONCE from the static corpus (and stays
    persisted across batches — construction never re-runs), then each
    micro-batch of arriving query vectors is answered with the beam
    walk's top-k.

    The beam walk is ITERATIVE (rounds of broadcast joins with a
    localCheckpoint per round), which Structured Streaming's
    incremental planner cannot express as one streaming plan — so
    this twin uses foreachBatch, the supported run-a-full-batch-plan-
    per-micro-batch escape hatch (same shape as the alert router and
    the JDBC sink), appending each batch's answers to a parquet sink.
    The drained result equals batch `ann_beam_topk` exactly for the
    same query set (shared oracle): the walk is per-query
    deterministic, so batching queries differently cannot change any
    row."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        _beam_nav_edges,
        _vecs,
        ann_beam_topk,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    edges = _beam_nav_edges(emb)  # the INDEX: built once, persisted
    base = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_{query_name}")
    shutil.rmtree(base, ignore_errors=True)
    out_dir = os.path.join(base, "answers")

    def serve(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        qrel = _vecs(batch_df).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"), F.col("v_norm").alias("q_norm"))
        (ann_beam_topk(emb, queries=qrel, edges=edges)
         .write.mode("append").parquet(out_dir))

    schema = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "embeddings.parquet")
              .parquet(sf_dir)
              .where(F.col("vec_id") < N_QUERIES))
    q = (stream.writeStream.foreachBatch(serve)
         .outputMode("append")
         .option("checkpointLocation", os.path.join(base, "_chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not os.path.exists(out_dir):
        # serve() skips empty batches, so a query stream that never
        # yields a non-empty batch leaves no sink — the drain of an
        # empty stream is zero answers, not an AnalysisException
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, rnk int, "
                "cos_sim double")
    return spark.read.parquet(out_dir)


def run_beam_pq_serve_stream(spark, sf_dir: str,
                             query_name: str = "beam_pq_serve_stream"
                             ) -> DataFrame:
    """Query-stream SERVING for the DiskANN rung — `ann_beam_pq_topk`
    deployed the way `run_beam_serve_stream` deploys the exact-scored
    walk: the ENTIRE navigation index (dense-position codebook,
    per-vector code arrays, PQ-code-carrying multi-probe edges —
    `pq_walk_index`) is built ONCE from the static corpus and stays
    persisted across batches; each micro-batch of arriving query
    vectors builds only its own ADC tables (≤ batch rows of
    PQ_M·PQ_K ints) and walks the frozen index, appending its top-k
    answers via foreachBatch (the iterative walk cannot be an
    incremental streaming plan). Integer fixed-point walk scores make
    every in-walk tie-break exact, and the walk is per-query
    deterministic, so the drain is batching-invariant and equals
    batch `ann_beam_pq_topk` exactly (shared oracle)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
        N_QUERIES,
        ann_beam_pq_topk,
        pq_walk_index,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    ensure_session_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    index = pq_walk_index(emb)  # built once, persisted
    base = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_{query_name}")
    shutil.rmtree(base, ignore_errors=True)
    out_dir = os.path.join(base, "answers")

    def serve(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        (ann_beam_pq_topk(emb, queries=batch_df, index=index)
         .write.mode("append").parquet(out_dir))

    schema = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")).schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "embeddings.parquet")
              .parquet(sf_dir)
              .where(F.col("vec_id") < N_QUERIES))
    q = (stream.writeStream.foreachBatch(serve)
         .outputMode("append")
         .option("checkpointLocation", os.path.join(base, "_chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not os.path.exists(out_dir):
        # serve() skips empty batches — same guard as the exact-walk
        # twin and run_weighted_sample_stream: an all-empty query
        # stream drains to zero answers, not an AnalysisException
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, rnk int, "
                "cos_sim double")
    return spark.read.parquet(out_dir)


def run_weighted_sample_stream(spark, sf_dir: str,
                               query_name: str = "weighted_sample_stream"
                               ) -> DataFrame:
    """Streaming A-ES reservoir — exactly-k weight-proportional
    sampling WITHOUT replacement maintained over an unbounded
    document stream (the streaming face of
    `pipeline.weighted_sample_es`). The reservoir never needs
    mutable state: the A-ES top-k is a MERGEABLE summary —
    topk(A ∪ B) = topk(topk(A) ∪ topk(B)) — so each micro-batch
    appends only its LOCAL top-k (≤ k rows per trigger, whatever the
    batch size) and the drain's global top-k over the ≤ k·n_batches
    appended rows IS the batch answer for ANY batching. Because the
    keys are deterministic per-doc hash draws, this is an algebraic
    identity, not a determinism-of-execution argument — the strongest
    drained-equals-batch claim in the streaming suite. foreachBatch
    because per-batch top-k (sort + limit) isn't an incremental
    streaming plan; shares `weighted_sample_es`'s oracle."""
    import os
    import shutil
    import tempfile

    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        es_keyed,
        es_ranked,
        es_topk,
    )

    ensure_session_confs(spark)
    base = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_{query_name}")
    shutil.rmtree(base, ignore_errors=True)
    out_dir = os.path.join(base, "reservoir")

    def absorb(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        es_topk(es_keyed(batch_df)).write.mode("append").parquet(out_dir)

    q = (_documents_stream(spark, sf_dir)
         .writeStream.foreachBatch(absorb)
         .outputMode("append")
         .option("checkpointLocation", os.path.join(base, "_chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not os.path.exists(out_dir):
        # absorb() skips empty batches, so a stream that never yields
        # a non-empty batch leaves no sink — the drain of an empty
        # stream is the empty reservoir, not an AnalysisException
        return spark.createDataFrame(
            [], "doc_id bigint, w_tokens bigint, rnk int, es_key double")
    return es_ranked(es_topk(spark.read.parquet(out_dir)))


def run_segment_audio_stream(spark, sf_dir: str,
                             query_name: str = "segment_audio_stream"
                             ) -> DataFrame:
    """Audio segmentation ON the ingest path: modality routing and
    per-row window synthesis are stateless row-local expressions
    (filter + sequence + explode — `multimodal_segment_audio`
    verbatim over the stream), so append mode streams segment rows
    straight through with ZERO state; the drained result equals the
    batch segmentation exactly (shared oracle — the
    stream_span_corruption/stream_pii_scrub twin discipline)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.multimodal import (
        multimodal_segment_audio,
    )

    ensure_session_confs(spark)
    out = multimodal_segment_audio(_documents_stream(spark, sf_dir))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
