"""Deduplication operators over the `documents` table (SURVEY §2
#26-29): the training-data-pipeline dedup family.

Scale design:
- `dedup_exact` — one hash-groupBy on md5(text): the only full-data
  shuffle is on a 32-byte key, never the document body.
- `dedup_ngram_jaccard` — EXACT pairwise Jaccard via a shingle
  self-join. This is the correctness baseline/oracle; its candidate
  blow-up is quadratic in shingle document-frequency, so at 100 TB it
  is only run on candidate pairs produced by LSH.
- `dedup_minhash_lsh` — the scale path: shingle → 16 portable minhash
  permutations → 8 banded buckets (r=2) → candidate pairs from bucket
  joins → exact-Jaccard verification of candidates only. Shuffle
  volume is O(docs × bands), independent of pair count. At a 0.8
  threshold the r=2/b=8 curve catches j≥0.8 pairs with
  P ≈ 1-(1-0.64)^8 ≈ 0.9997 (and ≈1 for the near-identical dups this
  pipeline hunts), so verified LSH output equals the exact baseline —
  which is exactly what the oracle checks.
- `dedup_simhash` — 60-bit SimHash with 4×15-bit band buckets and
  hamming≤3 verification. Deterministic (no sampling), so the oracle
  mirrors it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.cache import (
    tracked_persist,
)
from real_time_fraud_detection_flink_kafka_spark.functions import hashing as H
from real_time_fraud_detection_flink_kafka_spark.functions.partitioning import spread

SHINGLE_N = 3
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 15 bits each
HAMMING_MAX = 3


def _words(text):
    return F.split(F.trim(text), " ")


# canonical home: functions/expr.py (re-exported here for the
# operators that grew up with it)
from real_time_fraud_detection_flink_kafka_spark.functions.expr import let as _let  # noqa: E402


def shingle_sets(documents: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, sh_set) — DISTINCT word n-gram array per document.
    Computed row-local (no explode/shuffle). The token array is
    let-bound (_let): HOF lambdas evaluate interpreted, outside
    codegen subexpression elimination, so an unbound `ws` re-runs the
    split at every element_at site per shingle index."""
    ws = _words(F.col("text"))

    def grams_of(wsv):
        return F.when(
            F.size(wsv) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(wsv) - n),
                lambda i: F.concat_ws(" ", *[F.element_at(wsv, (i + j + 1).cast("int")) for j in range(n)]),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return documents.select(
        "doc_id", F.array_distinct(_let(ws, grams_of)).alias("sh_set"))


def shingles(documents: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) — exploded distinct n-grams (for self-joins).

    `explode_outer` + an attribute-level null filter, NOT `explode`:
    plain explode plants an implicit ``size(sh_set) > 0`` pre-filter
    containing the whole shingle EXPRESSION, which Catalyst then
    pushes below any repartition exchange — re-evaluating the n-gram
    transform per row on the narrow pre-shuffle side (measured 10×
    the stage cost on a 1-partition scan). The outer variant has no
    pre-filter, and filtering the generated ATTRIBUTE afterwards
    cannot sink below the Generate."""
    return (shingle_sets(documents, n)
            .select("doc_id", F.explode_outer("sh_set").alias("shingle"))
            .where(F.col("shingle").isNotNull()))


def shingle_hashes_arrow(documents: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) rows with 60-bit md5 shingle hashes — the
    Arrow-batched twin of ``shingles()`` for consumers that only need
    hash identity (joins, distinct counts), not the gram text.
    hashlib md5 == Spark md5 == DuckDB md5 on the same string, so
    counts/joins over these hashes equal the string versions short of
    2⁻⁶⁰ collisions. C-speed shingling instead of the interpreted
    higher-order transform (measured ~4× on the 8-gram
    decontamination stage at sf0.1)."""
    import hashlib

    import pandas as pd

    def sh(it):
        for pdf in it:
            ids: list[int] = []
            hs: list[int] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL text yields no shingles, matching the expression
                # path (split(trim(NULL)) -> NULL -> empty gram array)
                ws = text.strip().split(" ") if text is not None else []
                grams = ({" ".join(ws[i:i + n])
                          for i in range(len(ws) - n + 1)}
                         if len(ws) >= n else set())
                for g in grams:
                    ids.append(int(doc_id))
                    hs.append(int(hashlib.md5(g.encode()).hexdigest()[:15], 16))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "shingle": pd.Series(hs, dtype="int64")})

    return documents.select("doc_id", "text").mapInPandas(
        sh, "doc_id bigint, shingle bigint")


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup: canonical doc per identical text + copy count."""
    return (documents.groupBy(F.md5("text").alias("text_md5"))
                     .agg(F.min("doc_id").alias("canonical_doc_id"),
                          F.count(F.lit(1)).alias("n_copies"))
                     .select("canonical_doc_id", "n_copies", "text_md5"))


SOFT_DEDUP_PPM = 1_000_000


def soft_dedup_weights(documents: DataFrame) -> DataFrame:
    """SOFT deduplication — reweight instead of remove (the
    SoftDeDup idea: duplicated text carries signal, so down-weight it
    rather than drop it; a training loader then samples by weight):
    every copy of an n-times-duplicated text gets sampling weight
    1/n, so each distinct text contributes exactly one copy of
    probability mass however many times it was crawled.

    Determinism: the weight is the exact ppm floor division
    SOFT_DEDUP_PPM div n_copies — integers in both engines, never a
    double reciprocal.

    Scale shape: one combinable groupBy on the text md5 (map-side
    partial counts) + ONE md5-keyed join back to the corpus — the
    `dedup_exact` discipline, deliberately NOT a window over the
    hash: a boilerplate text with 10⁹ copies would make that window's
    partition a straggler, while the groupBy pre-combines per task
    and AQE splits the skewed join."""
    grp = (documents.select("doc_id", F.md5("text").alias("text_md5"))
                    .groupBy("text_md5")
                    .agg(F.count(F.lit(1)).alias("n_copies")))
    return (documents.select("doc_id", F.md5("text").alias("text_md5"))
            .join(grp, "text_md5")
            .select("doc_id", "text_md5", "n_copies",
                    F.expr(f"{SOFT_DEDUP_PPM} div n_copies")
                     .cast("bigint").alias("weight_ppm")))


def _pair_jaccard(sh: DataFrame) -> DataFrame:
    """Jaccard for all co-shingled pairs from a (doc_id, shingle) frame.

    The self-join runs on 60-bit shingle hashes, not the shingle
    strings — same counts (collision odds ~n²/2⁶¹), ~3× less shuffle
    volume on this data and far less at web scale where shingles are
    long."""
    sh = sh.select("doc_id", H.md5_int60(F.col("shingle")).alias("sh_h"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (a.join(b, (F.col("a.sh_h") == F.col("b.sh_h"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
               .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
               .agg(F.count(F.lit(1)).alias("n_common")))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = common.join(na, "doc_a").join(nb, "doc_b")
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return j.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))


def dedup_ngram_jaccard(documents: DataFrame,
                        threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Exact n-gram-shingle Jaccard near-dup pairs (baseline path)."""
    pairs = _pair_jaccard(shingles(spread(documents)))
    return pairs.where(pairs["jaccard"] >= threshold)


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """doc_id + sh_set + m0..m{N_PERM-1} minhash columns (portable
    md5-based). Entirely row-local and single-pass: shingles are
    md5-hashed to 60-bit ints ONCE, then one fused fold element-wise-
    mins all permutations over the hash set (separate per-perm
    expressions would get their md5 subtrees re-inlined by Catalyst's
    projection collapse and cost N_PERM× the hashing). sh_set carries
    the HASHES, not the gram strings, SORTED (array_sort) so the
    column is bit-identical to the Arrow path's sorted sh_set —
    ~8 bytes/shingle through the persist + candidate joins + per-pair
    intersections instead of the gram text."""
    sets = shingle_sets(documents).select(
        "doc_id",
        F.array_sort(
            F.transform("sh_set", lambda s: H.md5_int60(s))).alias("sh_set"))
    sets = sets.withColumn("sig", H.minhash_sig_from_hashes(F.col("sh_set")))
    return sets.select("doc_id", "sh_set",
                       *[F.col("sig")[i].alias(f"m{i}") for i in range(H.N_PERM)])


def _band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) — one row per LSH band per doc.
    r=2 rows per band fused into one 60-bit*P + 60-bit key."""
    r = H.N_PERM // H.N_BANDS
    assert r == 2
    bands = F.array(*[
        F.struct(F.lit(j).alias("band_idx"),
                 (F.col(f"m{2 * j}") * H.P + F.col(f"m{2 * j + 1}")).alias("band_key"))
        for j in range(H.N_BANDS)
    ])
    return sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key"))


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Banded LSH: distinct candidate pairs sharing any band bucket.

    Width note (why this banding has no `lsh_bits_for`-style growth
    lever, unlike sign-LSH in operators/similarity.py): a random
    UNRELATED pair collides in an r-row band with probability s^r
    where s is the pair's actual Jaccard — for random text s≈0, so
    expected false candidates are Σpairs s_ij^r, driven by the
    corpus's SIMILARITY STRUCTURE, not by n²/2^bits volume the way
    random-hyperplane buckets are. Growing the corpus with
    non-duplicate text adds ~zero collisions per new doc; growing it
    with duplicates adds candidates you WANT. The r (rows/band) knob
    trades recall at low Jaccard for precision and is a design-point
    choice (r=2 catches pairs well below the 0.8 threshold), not a
    scale valve."""
    e = _band_rows(sig)
    a, b = e.alias("a"), e.alias("b")
    return (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
             .distinct())


def dedup_minhash_lsh(documents: DataFrame,
                      threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """MinHash-LSH candidates, verified with exact Jaccard (scale path).

    Verification is per candidate PAIR via set-array intersection —
    O(candidate_pairs × shingles/doc) — never a shingle self-join
    over candidate docs (which degenerates to the exact quadratic
    path when the corpus is duplicate-heavy: every doc is then a
    candidate).

    Exact duplicates are collapsed FIRST (md5 groupBy): shingling,
    minhashing and verification run only on unique texts, and results
    expand back to all member pairs — identical texts have Jaccard
    exactly 1.0 (intra-cluster) or their representatives' Jaccard
    (inter-cluster). On duplicate-heavy corpora (the norm in web
    crawls) this shrinks the LSH input by the duplication factor.

    Output schema/content matches `dedup_ngram_jaccard` whenever the
    band curve catches every pair above threshold (see module doc)."""
    return _minhash_lsh_pipeline(documents, minhash_signatures, threshold)


def _minhash_lsh_pipeline(documents: DataFrame, sig_fn, threshold: float
                          ) -> DataFrame:
    """Shared collapse → sign → band → verify → expand pipeline.
    `sig_fn(rep_docs)` must return (doc_id, sh_set, m0..m{N_PERM-1});
    sh_set may be strings (expression path) or 60-bit hashes (Arrow
    path) — intersection/union counts are identical either way short
    of 2⁻⁶⁰ collisions."""
    members = documents.select(
        "doc_id", F.md5("text").alias("text_md5"))
    reps = (members.groupBy("text_md5")
                   .agg(F.min("doc_id").alias("rep_id")))
    members = members.join(F.broadcast(reps), "text_md5")
    rep_docs = spread(documents).join(
        F.broadcast(reps.select(F.col("rep_id").alias("doc_id"))), "doc_id")

    # LSH + per-pair set-intersection verification on unique texts
    # only. The signature relation feeds THREE consumers (band
    # explode + both verify sides); without persist() each one
    # re-runs the full shingle+minhash fold — measured 3× the
    # signature cost at sf0.1. At cluster scale the same move is
    # persisting (or writing) the signature table before the
    # candidate join; size is O(docs × N_PERM), never the texts.
    sig = tracked_persist(sig_fn(rep_docs))
    cand = lsh_candidates(sig)
    sets = sig.select("doc_id", "sh_set")
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    j = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    jac = inter / (F.size("set_a") + F.size("set_b") - inter)
    rep_pairs = (j.select(F.col("doc_a").alias("rep_a"), F.col("doc_b").alias("rep_b"),
                          F.round(jac, 6).alias("jaccard"))
                  .where(F.round(jac, 6) >= threshold))

    # expand: intra-cluster pairs (jaccard exactly 1.0) ...
    # Docs shorter than SHINGLE_N words have an EMPTY shingle set:
    # their Jaccard is undefined and the exact baseline emits nothing
    # for them, so identical short docs must not expand to 1.0 pairs.
    shingled = sig.where(F.size("sh_set") > 0).select(F.col("doc_id").alias("r"))
    ma = members.select(F.col("rep_id").alias("r"), F.col("doc_id").alias("da"))
    mb = members.select(F.col("rep_id").alias("r"), F.col("doc_id").alias("db"))
    intra = (ma.join(mb, "r").join(F.broadcast(shingled), "r")
               .where(F.col("da") < F.col("db"))
               .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
                       F.lit(1.0).alias("jaccard")))
    # ... and inter-cluster pairs at their representatives' jaccard
    mra = members.select(F.col("rep_id").alias("rep_a"), F.col("doc_id").alias("da"))
    mrb = members.select(F.col("rep_id").alias("rep_b"), F.col("doc_id").alias("db"))
    inter_pairs = (rep_pairs.join(mra, "rep_a").join(mrb, "rep_b")
                   .select(F.least("da", "db").alias("doc_a"),
                           F.greatest("da", "db").alias("doc_b"),
                           "jaccard"))
    return intra.unionByName(inter_pairs)


SIG_SCHEMA = ("doc_id bigint, sh_set array<bigint>, "
              + ", ".join(f"m{i} bigint" for i in range(H.N_PERM)))


def minhash_signatures_arrow(documents: DataFrame) -> DataFrame:
    """Arrow/numpy fast path for `minhash_signatures`: same md5-based
    universal hashes (hashlib md5 == Spark md5 == DuckDB md5, and the
    (a·h+b) mod P products stay in int64), shingle hashing in C and
    all N_PERM minima in one numpy matmul-shaped pass per doc.
    Output is bit-identical to the expression path — the tolerance
    test asserts exact frame equality — so the same oracle applies.
    sh_set carries the 60-bit shingle hashes (not strings): enough
    for pair verification, and far lighter on the candidate join."""
    import hashlib

    import numpy as np
    import pandas as pd

    A = np.array([a for a, _ in H.PERMS], dtype=np.int64)
    B = np.array([b for _, b in H.PERMS], dtype=np.int64)

    def sign(it):
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL text -> empty shingle set -> all-P signature,
                # matching the expression path's treatment of NULLs
                ws = text.strip().split(" ") if text is not None else []
                grams = ({" ".join(ws[i:i + SHINGLE_N])
                          for i in range(len(ws) - SHINGLE_N + 1)}
                         if len(ws) >= SHINGLE_N else set())
                hs = sorted({int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                             for g in grams})
                bases = np.array(hs, dtype=np.int64) % H.P
                if len(bases):
                    sig = ((A[None, :] * bases[:, None] + B[None, :]) % H.P
                           ).min(axis=0)
                else:
                    sig = np.full(H.N_PERM, H.P, dtype=np.int64)
                rows.append((int(doc_id), hs, *sig.tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "sh_set",
                                              *[f"m{i}" for i in range(H.N_PERM)]])

    return documents.select("doc_id", "text").mapInPandas(sign, SIG_SCHEMA)


def dedup_minhash_lsh_fast(documents: DataFrame,
                           threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """`dedup_minhash_lsh` with the Arrow-vectorized signature stage —
    identical output (same hashes, same bands, same verification)."""
    return _minhash_lsh_pipeline(documents, minhash_signatures_arrow, threshold)


def minhash_band_stats(documents: DataFrame,
                       threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Band-bucket occupancy audit for the MinHash-LSH candidate join
    — the third member of the stats discipline (`ppjoin_stats`,
    `simhash_stats`/`phash_stats`), closing it over every banded
    family in the catalog. One row per LSH band: bucket count, max
    occupancy, exact candidate-pair contribution (Σ C(occ,2) per
    bucket, counted BEFORE the cross-band distinct), plus the global
    distinct-candidate and verified-rep-pair counts.

    What it measures is the CONVERSE of the hamming audits: minhash
    band keys are two fused 60-bit minima (domain ~P², effectively
    unbounded), so occupancy is driven by the corpus's SIMILARITY
    STRUCTURE — near-dup groups and the all-``P`` sentinel bucket of
    sub-shingle-length docs — not by key-space exhaustion the way
    fixed 15-bit hamming bands fill up. Concretely: `max_occ` tracks
    the largest near-dup/short-doc group, `band_cand_pairs` vs
    `n_candidates` shows how often true pairs collide in several
    bands (recall margin), and `n_candidates` vs `n_verified_reps`
    is the false-candidate rate the r=2 curve admits. A growing
    corpus whose max_occ stays flat is the healthy case; max_occ
    tracking corpus size means a dominant clone group (or a flood of
    sub-3-word docs all hashing to the sentinel bucket) and predicts
    the candidate join's densest task.

    Measured over one representative per distinct text (the same md5
    collapse the pipeline shuffles, so the numbers describe the join
    the operator actually runs). Scale shape: signatures row-local;
    occupancy one map-side-combinable groupBy on the band key (the
    operator's own exchange); candidates/verification rerun the
    banded join once — an audit-time measurement rung."""
    reps = (documents.select("doc_id", F.md5("text").alias("text_md5"))
            .groupBy("text_md5").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"))
    sig = tracked_persist(minhash_signatures(
        documents.join(F.broadcast(reps), "doc_id")))
    e = _band_rows(sig)
    occ = (e.groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("occ")))
    per_band = occ.groupBy("band_idx").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("occ").alias("max_occ"),
        F.sum(F.expr("occ * (occ - 1) div 2")).alias("band_cand_pairs"))
    cand = lsh_candidates(sig)
    sets = sig.select("doc_id", "sh_set")
    a = sets.select(F.col("doc_id").alias("doc_a"),
                    F.col("sh_set").alias("set_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"),
                    F.col("sh_set").alias("set_b"))
    j = cand.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    jac = inter / (F.size("set_a") + F.size("set_b") - inter)
    c_docs = sig.agg(F.count(F.lit(1)).alias("n_docs"))
    c_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    c_ver = (j.where(F.round(jac, 6) >= threshold)
              .agg(F.count(F.lit(1)).alias("n_verified_reps")))
    return (per_band
            .crossJoin(F.broadcast(c_docs))
            .crossJoin(F.broadcast(c_cand))
            .crossJoin(F.broadcast(c_ver))
            .select(F.col("band_idx").cast("int").alias("band_idx"),
                    F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.col("n_buckets").cast("bigint").alias("n_buckets"),
                    F.col("max_occ").cast("int").alias("max_occ"),
                    F.col("band_cand_pairs").cast("bigint")
                     .alias("band_cand_pairs"),
                    F.col("n_candidates").cast("bigint")
                     .alias("n_candidates"),
                    F.col("n_verified_reps").cast("bigint")
                     .alias("n_verified_reps")))


CLUSTER_MAX_ITERS = 20  # safety bound; convergence check exits earlier


def min_label_components(pairs: DataFrame, col_a: str = "doc_a",
                         col_b: str = "doc_b",
                         max_iters: int = CLUSTER_MAX_ITERS) -> DataFrame:
    """Connected components over an undirected pair relation via
    min-label propagation → (id, label) with label = min id reachable.
    The shared engine under `dedup_clusters` (text near-dups) and
    `semantic_canonicalize` (embedding near-dups): each round is one
    join + one min-aggregate with the label relation persisted;
    rounds = component diameter; the driver-side per-round count is
    the standard convergence control loop (GraphX/Pregel do the
    same). Raises rather than return wrong labels if `max_iters` is
    hit un-converged.

    SHALLOW GRAPHS preferred (the dedup regime: observed diameters
    ≤ 3) — rounds = component diameter, so a deep graph pays one
    join+agg round per hop and `components_twostar`'s O(log n)
    heavier rounds win past the measured crossover (bench.py
    `_bench_components_engines`). Each round's label relation is
    localCheckpoint'ed (r14 opt): `new` references `labels` twice
    (the neighbor join and the update join) and the convergence
    count a third time, so a persist-only round DOUBLED the analyzed
    logical plan per round — 2^rounds copies of the upstream pair
    subtree in Catalyst (persist truncates execution, never
    analysis). That growth was measured as ~18 s of pure planning
    for a 33-pair graph under `semantic_canonicalize` at sf0.1, and
    as the r8 heap OOM at path depth 16 in the engine shoot-out;
    the checkpoint truncates the tree to a leaf per round, exactly
    the `components_twostar` discipline."""
    edges = tracked_persist(pairs.select(col_a, col_b))
    adj = (edges.select(F.col(col_a).alias("src"), F.col(col_b).alias("dst"))
           .unionAll(edges.select(F.col(col_b).alias("src"),
                                  F.col(col_a).alias("dst"))))
    labels = (adj.select(F.col("src").alias("id")).distinct()
              .select("id", F.col("id").alias("label"))
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        nb = (adj.join(labels.withColumnRenamed("id", "src"), "src")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.min("label").alias("nb_min")))
        new = (labels.join(nb, "id", "left")
               .select("id", F.least(
                   "label", F.coalesce("nb_min", "label")).alias("label"))
               .localCheckpoint(eager=True))
        changed = (new.withColumnRenamed("label", "new_label")
                   .join(labels, "id")
                   .where(F.col("new_label") != F.col("label")).count())
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"min_label_components did not converge in {max_iters} rounds")


def dedup_clusters_twostar(documents: DataFrame,
                           threshold: float = JACCARD_THRESHOLD,
                           max_iters: int = CLUSTER_MAX_ITERS) -> DataFrame:
    """`dedup_clusters` with the star-contraction engine swapped in
    for label propagation — identical pairs, identical output
    contract, identical oracle (components are engine-independent);
    the per-round scale trade is documented on each engine."""
    pairs = dedup_minhash_lsh_fast(documents, threshold)
    labels = components_twostar(pairs, max_iters=max_iters)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (labels.join(sizes, "label")
            .select(F.col("id").alias("doc_id"),
                    F.col("label").alias("canonical_id"), "cluster_size"))


def components_twostar(pairs: DataFrame, col_a: str = "doc_a",
                       col_b: str = "doc_b",
                       max_iters: int = CLUSTER_MAX_ITERS) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log n)-ROUND engine next to
    `min_label_components`, whose round count is the component
    DIAMETER. Near-dup clusters are shallow so label propagation wins
    there; on a 100 TB entity/link graph one long path (diameter in
    the thousands) stalls propagation cold, while star contraction
    halves path lengths per round pair. Same output contract (id,
    label = min reachable id), so the equivalence is pytest-pinned
    against the propagation engine on identical pairs.

    Each round is groupBy(min) + join — the same shuffle budget per
    round as one propagation step, on an edge relation that only
    SHRINKS (toward the star (child, root) fixpoint). Convergence is
    the standard driver-side control loop: stop when the small-star
    pass leaves the edge set unchanged — checked as ONE
    symmetric-difference job (±1-tagged union, groupBy(u, v), any
    non-zero sum = changed; both inputs are checkpointed so the scan
    is cache-local). r14 opt, guide §1.2: the check was two separate
    `exceptAll` actions per round — two extra shuffle jobs whose cost
    was pure driver-loop overhead (multiset equality is what both
    forms test; labels pytest-pinned identical).

    Each round's edge relation is localCheckpoint'ed, not just
    persisted: one round references its predecessor ~16× (union+swap
    × two join sides × two emit arms), so the LOGICAL plan grows
    16^rounds without truncation and Catalyst canonicalization blows
    the stack around round 4 even though the cached data is tiny —
    persist truncates execution, never the analyzed tree. Truncating
    lineage per round is exactly what GraphX/production CC jobs do
    (reliable checkpoints there; local here). Since r14
    min_label_components checkpoints per round too (its 2×-per-round
    reference pattern was the same disease at a slower doubling
    rate); the engines now differ only in round COUNT — diameter
    there, O(log n) here."""
    e = pairs.select(F.col(col_a).cast("bigint").alias("u"),
                     F.col(col_b).cast("bigint").alias("v"))
    nodes = (e.select(F.col("u").alias("id"))
              .unionAll(e.select(F.col("v").alias("id"))).distinct()
              .localCheckpoint(eager=True))
    edges = (e.where(F.col("u") != F.col("v")).distinct()
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        # large-star: every neighbor v > u hangs off m = min(Γ(u) ∪ {u})
        adj = (edges.unionAll(edges.select(F.col("v").alias("u"),
                                           F.col("u").alias("v"))))
        mins = (adj.groupBy("u")
                   .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        large = (adj.join(mins, "u")
                    .where(F.col("v") > F.col("u"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v"))
                    .where(F.col("u") != F.col("v")).distinct())
        # small-star: orient (big=u, small=v); u and every smaller
        # neighbor hang off m = min of the smaller neighbors
        oriented = large.select(F.greatest("u", "v").alias("u"),
                                F.least("u", "v").alias("v"))
        smins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (oriented.join(smins, "u")
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .unionAll(oriented.join(smins, "u")
                           .select("u", F.col("m").alias("v")))
                 .where(F.col("u") != F.col("v")).distinct()
                 .localCheckpoint(eager=True))
        changed = (edges.select("u", "v", F.lit(1).alias("_s"))
                   .unionAll(small.select("u", "v", F.lit(-1).alias("_s")))
                   .groupBy("u", "v").agg(F.sum("_s").alias("_d"))
                   .where(F.col("_d") != 0).limit(1).count())
        edges = small
        if changed == 0:
            labels = nodes.join(
                edges.select(F.col("u").alias("id"),
                             F.col("v").alias("root")), "id", "left")
            return labels.select(
                "id", F.coalesce("root", F.col("id")).alias("label"))
    raise RuntimeError(
        f"components_twostar did not converge in {max_iters} rounds")


def dedup_clusters(documents: DataFrame,
                   threshold: float = JACCARD_THRESHOLD,
                   max_iters: int = CLUSTER_MAX_ITERS) -> DataFrame:
    """Near-duplicate CLUSTERS from the verified MinHash-LSH pairs:
    connected components with the minimum doc_id as the canonical
    representative — the step a real dedup pipeline runs after pair
    mining to decide which copies to keep (one canonical per cluster).
    Output: (doc_id, canonical_id, cluster_size) for every doc in at
    least one near-dup pair (singletons are their own canonical and
    are omitted, matching the oracle's pair-derived node set).

    Spark-first iterative-graph shape: min-label propagation over the
    pair graph — each round is one join + one min-aggregate, with the
    label relation persisted per round, until a fixpoint. The driver
    checks CONVERGENCE (one count per round, the standard control
    loop of distributed connected components — GraphX/Pregel do the
    same); labels themselves never leave the executors. Rounds needed
    = graph diameter, which for near-dup clusters (dense, small) is
    almost always ≤3; `max_iters` is a safety bound only, and the
    loop raises if it is ever hit un-converged rather than return
    wrong labels. The edge relation is O(near-dup pairs) — tiny
    relative to the corpus — so per-round cost is bounded by pair
    count, not corpus size.

    Oracle: DuckDB recursive-CTE transitive closure over the same
    pairs, min reachable id per node."""
    pairs = dedup_minhash_lsh_fast(documents, threshold)
    labels = min_label_components(pairs, max_iters=max_iters)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (labels.join(sizes, "label")
            .select(F.col("id").alias("doc_id"),
                    F.col("label").alias("canonical_id"), "cluster_size"))


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """60-bit SimHash per doc over word tokens (term-frequency
    weighted — implemented as ±1 per token OCCURRENCE, which sums to
    exactly the tf-weighted contributions over distinct tokens, so the
    former (doc, tok) tf pre-aggregation shuffle is unnecessary and
    dropped: token STRINGS never shuffle at all now, measured 1.5× at
    sf0.1).

    Shape: explode token occurrences (narrow) → md5 hash → explode 60
    bit positions → per-(doc, bit) ±1 sums → recombine. The 60× bit
    blow-up is map-local CPU inside whole-stage codegen; partial
    aggregation collapses it to ≤ docs×60 rows per partition before
    the exchange. (The tempting alternative — one groupBy(doc_id)
    carrying 60 conditional-sum aggregates — is 2.7× SLOWER: sixty
    when-branches per input row in one generated update method beat
    the JIT, while this shape's single tight ±1 sum stays hot.)"""
    bits = (spread(documents)
            .select("doc_id", F.explode(_words(F.col("text"))).alias("tok"))
            .select("doc_id", H.md5_int60(F.col("tok")).alias("h"))
            .select("doc_id",
                    F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
                    "h"))
    contrib = F.when(F.expr("shiftright(h, bit)").bitwiseAND(1) == 1,
                     F.lit(1)).otherwise(F.lit(-1))
    per_bit = (bits.groupBy("doc_id", "bit")
                   .agg(F.sum(contrib).alias("s")))
    bit_val = F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0)
    return per_bit.groupBy("doc_id").agg(F.sum(bit_val).cast("bigint").alias("simhash"))


def dedup_simhash(documents: DataFrame, hamming_max: int = HAMMING_MAX) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= hamming_max,
    candidates from 4×15-bit band buckets (deterministic, oracle-exact).
    Band-bucket occupancy — the quantity that drives this join's cost
    and grows with corpus size on low-entropy corpora — is measured by
    `simhash_stats` (the ppjoin_stats discipline)."""
    sig = simhash_signatures(documents)
    bands = F.array(*[
        F.struct(F.lit(j).alias("band_idx"),
                 F.shiftright(F.col("simhash"), 15 * j).bitwiseAND((1 << 15) - 1).alias("band_key"))
        for j in range(SIMHASH_BANDS)
    ])
    e = sig.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
        "doc_id", "simhash", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key"))
    a, b = e.alias("a"), e.alias("b")
    cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                     F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
             .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("doc_a", "doc_b", hamming.alias("hamming"))
                .where(F.col("hamming") <= hamming_max))


def _hamming_band_stats(sig: DataFrame, sig_col: str, n_bands: int,
                        hamming_max: int, band_bits: int = 15) -> DataFrame:
    """Occupancy observability for the hamming-band pair stages —
    `ppjoin_stats`' treatment applied to the fixed-band-key family
    (the r13 verdict's watch item): the band keys are FIXED-width
    (band_bits bits → ≤ 2^band_bits buckets per band), so bucket
    occupancy grows LINEARLY with corpus size and the candidate join
    is Σ C(occ, 2) per bucket — superlinear on low-entropy corpora.
    This relation turns that risk into a measured number: one row per
    band with its bucket count, max occupancy and exact candidate-
    pair contribution (band_cand_pairs = Σ C(occ,2), counted BEFORE
    the cross-band distinct), plus the global distinct-candidate and
    verified-pair counts. A deployment reads max_occ / band_cand_
    pairs growth across snapshots to decide when the corpus needs
    wider bands (more bits per band, lower hamming guarantee) or
    pre-banding entropy (e.g. per-source salting).

    Scale shape: signatures row-local; occupancy is one map-side-
    combinable groupBy on the band key (the same exchange the dedup
    operator itself shuffles on); the candidate/verified counts rerun
    the banded join once — a measurement rung, run at audit time."""
    sig = tracked_persist(sig)
    bands = F.array(*[
        F.struct(F.lit(j).alias("band_idx"),
                 F.shiftright(F.col(sig_col), band_bits * j)
                  .bitwiseAND((1 << band_bits) - 1).alias("band_key"))
        for j in range(n_bands)])
    e = (sig.select("doc_id", sig_col, F.explode(bands).alias("b"))
         .select("doc_id", sig_col, F.col("b.band_idx").alias("band_idx"),
                 F.col("b.band_key").alias("band_key")))
    occ = (e.groupBy("band_idx", "band_key")
            .agg(F.count(F.lit(1)).alias("occ")))
    per_band = occ.groupBy("band_idx").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("occ").alias("max_occ"),
        F.sum(F.expr("occ * (occ - 1) div 2")).alias("band_cand_pairs"))
    a, b = e.alias("a"), e.alias("b")
    cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col(f"a.{sig_col}").alias("s_a"),
                    F.col(f"b.{sig_col}").alias("s_b"))
            .distinct())
    hamming = F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b")))
    c_docs = sig.agg(F.count(F.lit(1)).alias("n_docs"))
    c_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    c_ver = (cand.where(hamming <= hamming_max)
                 .agg(F.count(F.lit(1)).alias("n_verified")))
    return (per_band
            .crossJoin(F.broadcast(c_docs))
            .crossJoin(F.broadcast(c_cand))
            .crossJoin(F.broadcast(c_ver))
            .select(F.col("band_idx").cast("int").alias("band_idx"),
                    F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.col("n_buckets").cast("bigint").alias("n_buckets"),
                    F.col("max_occ").cast("int").alias("max_occ"),
                    F.col("band_cand_pairs").cast("bigint")
                     .alias("band_cand_pairs"),
                    F.col("n_candidates").cast("bigint")
                     .alias("n_candidates"),
                    F.col("n_verified").cast("bigint").alias("n_verified")))


def simhash_stats(documents: DataFrame,
                  hamming_max: int = HAMMING_MAX) -> DataFrame:
    """`dedup_simhash`'s band-occupancy audit: one row per 15-bit
    band (see `_hamming_band_stats` for the columns and the 100 TB
    argument). Value-oracled against a DuckDB replay of the exact
    signature + banding pipeline."""
    return _hamming_band_stats(simhash_signatures(documents), "simhash",
                               SIMHASH_BANDS, hamming_max)


# --- winnowing fingerprints ---------------------------------------------------

WINNOW_K = 5        # tokens per k-gram
WINNOW_W = 4        # k-gram hashes per winnowing window
WINNOW_MIN_SHARED = 2  # shared selected hashes to emit a pair


def dedup_winnow(documents: DataFrame, k: int = WINNOW_K,
                 w: int = WINNOW_W,
                 min_shared: int = WINNOW_MIN_SHARED) -> DataFrame:
    """Winnowing-fingerprint near-dup pairs (Schleimer et al.,
    SIGMOD'03 — the MOSS algorithm): hash every token k-gram, slide a
    window of `w` hashes, keep each window's minimum; documents
    sharing ≥ `min_shared` selected hashes pair up. The guarantee the
    window gives — any shared run of w+k-1 tokens yields at least one
    shared selected hash — is what makes the sparse fingerprint safe
    for plagiarism-style containment detection, a different axis from
    MinHash (whole-doc resemblance) and SimHash (topic similarity).

    Scale shape: selection is entirely ROW-LOCAL higher-order
    expressions (transform over index sequences, array_min per
    window) — ~2/w of the grams survive, so the exploded relation
    shuffles a fraction of the corpus' grams; the pair stage is the
    same bucketed join-on-hash as LSH banding (candidates bounded by
    per-hash occupancy, never all-pairs). Docs shorter than k tokens
    have no k-gram and are excluded (mirrored in the oracle)."""
    # All array expressions are LET-BOUND (_let): Catalyst's
    # projection collapse re-inlines a referenced expression subtree
    # at every use site, and HOF lambdas re-evaluate free subtrees per
    # element — without the binding, the token split re-runs per gram
    # index and the whole gram-hash array re-materializes per window
    # index (measured 112 s → ~2 s at sf0.1). The when-guards (not
    # just the row filter) keep every sequence ascending even under
    # speculative evaluation on short docs.
    def win_of(grams):
        return F.when(
            F.size(grams) >= w,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(grams) - w + 1, F.lit(1))),
                lambda j: F.array_min(F.slice(grams, j, w)))
        ).otherwise(grams)

    def grams_of(wsv):
        return F.when(
            F.size(wsv) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(wsv) - k + 1),
                lambda i: H.md5_int60(F.concat_ws(" ", F.slice(wsv, i, k))))
        ).otherwise(F.array().cast("array<bigint>"))

    ws = _words(F.col("text"))
    sels = _let(ws, lambda wsv: _let(grams_of(wsv), win_of))
    e = (spread(documents)
         .where(F.size(ws) >= k)
         .select("doc_id", F.explode(F.array_distinct(sels)).alias("h")))
    a = e.select(F.col("doc_id").alias("doc_a"), "h")
    b = e.select(F.col("doc_id").alias("doc_b"), "h")
    return (a.join(b, "h")
             .where(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("n_shared"))
             .where(F.col("n_shared") >= min_shared))


# --- exact-substring span dedup -----------------------------------------------

SUBSTR_K = 8  # minimum duplicated span, in tokens


def dedup_substring(documents: DataFrame, k: int = SUBSTR_K) -> DataFrame:
    """Maximal duplicated token spans of ≥ `k` tokens — the
    exact-substring dedup of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"), re-expressed for Spark:
    instead of the paper's corpus-wide suffix array (a global sort of
    every suffix — the one primitive that does NOT distribute well),
    hash every POSITIONAL k-token shingle and mark positions whose
    hash occurs ≥ 2 times corpus-wide; a run of r consecutive
    duplicated positions in a doc is exactly a maximal duplicated
    span of r + k - 1 tokens, recovered islands-and-gaps style
    (p − row_number() run key). Emits (doc_id, span_start, span_len)
    in 1-based token coordinates — the cut list a pipeline feeds to a
    span-removal pass. Occurrence counting is total (a span repeated
    twice inside ONE doc is still training-data duplication, per the
    paper), not distinct-doc.

    Scale shape: rows = corpus token count (linear — never the suffix
    array's O(n log n) global sort). The corpus-wide occurrence count
    is a groupBy(h).count() ≥ 2 collapsed to its distinct hashes and
    semi-joined back — NOT count().over(Window.partitionBy(h)):
    the window form ships every position row to its hash's partition
    with no map-side combine, and ONE mega-boilerplate shingle (a
    header repeated across millions of docs) hot-keys a single task
    that AQE cannot split (window exchanges aren't skew-splittable;
    skew-join splitting on the semi-join IS). The groupBy arrives
    pre-combined — per input partition each hash contributes one
    partial row, so the hot hash costs one long-tail reduce of
    |partitions| rows instead of |occurrences| rows. Exchanges: the
    combinable groupBy + the (AQE-splittable) semi-join by h, then
    one by doc_id for the islands window — at real scale the narrow
    already-duplicated remnant. Shingling itself is row-local
    let-bound HOF expression, same discipline as `dedup_winnow`.
    Docs shorter than k tokens have no position and drop out
    (mirrored in the oracle)."""
    from pyspark.sql import Window

    pos = tracked_persist(substring_positions(documents, k))
    dup_h = (pos.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
                .where(F.col("cnt") >= 2))
    dup = pos.join(dup_h.select("h"), "h", "left_semi")
    return _spans_from_positions(dup, k)


def substring_positions(documents: DataFrame, k: int = SUBSTR_K) -> DataFrame:
    """(doc_id, p, h): every 1-based token position with its k-shingle
    md5 hash — the shared position relation under the substring-dedup
    family. Row-local let-bound HOF shingling; docs shorter than k
    drop out."""

    def pos_hashes(wsv):
        return F.when(
            F.size(wsv) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(wsv) - k + 1),
                lambda p: H.md5_int60(F.concat_ws(" ", F.slice(wsv, p, k)))),
        ).otherwise(F.array().cast("array<bigint>"))

    ws = _words(F.col("text"))
    return (spread(documents)
            .select("doc_id", F.posexplode_outer(_let(ws, pos_hashes))
                    .alias("p0", "h"))
            .where(F.col("h").isNotNull())
            .select("doc_id", (F.col("p0") + 1).cast("bigint").alias("p"), "h"))


def _spans_from_positions(dup: DataFrame, k: int) -> DataFrame:
    """Islands-and-gaps span recovery over duplicated (doc_id, p)
    rows: a run of r consecutive positions is a maximal duplicated
    span of r + k − 1 tokens."""
    from pyspark.sql import Window

    run = F.col("p") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("p"))
    return (dup.select("doc_id", "p", run.alias("run"))
               .groupBy("doc_id", "run")
               .agg(F.min("p").alias("span_start"),
                    (F.count(F.lit(1)) + k - 1).alias("span_len"))
               .select("doc_id", "span_start", "span_len"))


def dedup_substring_incremental(documents: DataFrame,
                                k: int = SUBSTR_K,
                                delta_mod: int | None = None) -> DataFrame:
    """Delta-vs-corpus exact-substring spans — the daily-intake twin
    of `dedup_substring` (the `dedup_incremental` asymmetry applied
    to the Lee et al. pipeline): today's increment (doc_id %
    delta_mod == 0) is cut against the standing corpus WITHOUT
    re-counting the corpus. A delta position is duplicated iff its
    shingle hash appears anywhere in the CORPUS INDEX (the distinct
    corpus hash set — what production persists between increments)
    OR ≥ 2 times within the delta itself; that disjunction equals
    total-count ≥ 2 restricted to delta positions, so the oracle is
    the full-corpus spans filtered to delta docs while the PLAN
    touches corpus text only to build the reusable index.

    Scale shape: the corpus side collapses to DISTINCT hashes (the
    persisted index — fixed-width, shrinking with redundancy); delta
    positions (small) probe it with one semi-join plus one
    delta-local combinable count; islands run on the duplicated
    remnant of the DELTA only."""
    if delta_mod is None:
        delta_mod = DELTA_MOD  # module global, defined below
    is_delta = (F.col("doc_id") % delta_mod) == F.lit(0)
    corpus_index = (substring_positions(documents.where(~is_delta), k)
                    .select("h").distinct())
    dpos = tracked_persist(
        substring_positions(documents.where(is_delta), k))
    ddup_h = (dpos.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
                  .where(F.col("cnt") >= 2))
    dup = (dpos.join(corpus_index, "h", "left_semi")
           .unionAll(dpos.join(ddup_h.select("h"), "h", "left_semi"))
           .select("doc_id", "p").distinct())
    return _spans_from_positions(dup, k)


def apply_span_removal(documents: DataFrame, k: int = SUBSTR_K) -> DataFrame:
    """Span REMOVAL — the second half of the Lee et al. 2022
    exact-substring pipeline: consume `dedup_substring`'s cut list,
    drop every token covered by ≥ 1 duplicated span, and re-emit the
    cleaned text plus before/after token counts (the cut arithmetic a
    training-data pipeline reports next to the cut itself). One row
    per input document: docs with no spans pass through whole; a doc
    that is ENTIRELY duplicated spans comes out with
    n_tokens_after = 0 and empty text_clean (the funnel drops it).

    Adjacent spans can overlap in TOKEN space even though their
    position runs are disjoint (a run gap shorter than k - 1 still
    extends into the next span's tokens); coverage is judged per
    token against ALL of the doc's spans, so overlap needs no special
    casing.

    Scale shape: the cut list aggregates to one narrow array row per
    AFFECTED doc (the already-duplicated remnant), joins back keyed
    by doc_id, and the cut itself is a row-local filter over the
    let-bound token array — the corpus body shuffles once (the
    doc_id join) and never explodes per token."""
    spans = (dedup_substring(documents, k)
             .groupBy("doc_id")
             .agg(F.collect_list(F.struct("span_start", "span_len"))
                   .alias("spans")))
    ws = _words(F.col("text"))
    sp = F.coalesce(
        F.col("spans"),
        F.array().cast("array<struct<span_start:bigint,span_len:bigint>>"))

    def out_of(wsv):
        kept = F.filter(
            wsv,
            lambda t, i: ~F.exists(
                sp, lambda s: (s["span_start"] <= i + 1)
                & (i + 1 < s["span_start"] + s["span_len"])))
        return _let(kept, lambda kp: F.struct(
            F.size(wsv).cast("bigint").alias("n_tokens_before"),
            F.size(kp).cast("bigint").alias("n_tokens_after"),
            F.array_join(kp, " ").alias("text_clean")))

    return (spread(documents)
            .join(spans, "doc_id", "left")
            .select("doc_id", _let(ws, out_of).alias("_r"))
            .select("doc_id", "_r.n_tokens_before", "_r.n_tokens_after",
                    "_r.text_clean"))


DELTA_MOD = 10  # doc_id % DELTA_MOD == 0 → the incoming increment


def dedup_incremental(documents: DataFrame,
                      delta_mod: int = DELTA_MOD,
                      threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Incremental (delta-vs-corpus) dedup — the production daily-intake
    shape: a new increment of documents is judged against an existing
    corpus, never corpus-vs-corpus. Here the increment is carved out
    deterministically (doc_id % delta_mod == 0); in production it is
    yesterday's corpus vs today's crawl.

    One row per DELTA doc: (doc_id, status, n_exact, n_near) where
    n_exact = corpus docs with byte-identical text, n_near = corpus
    docs whose 3-gram Jaccard vs this doc rounds to >= threshold
    (includes the identical ones — identical text is Jaccard 1.0), and
    status = 'exact_dup' | 'near_dup' | 'new' by that priority.

    Scale design (the asymmetric twin of `dedup_minhash_lsh`):
    - Exact stage joins 16-byte md5 keys only; the corpus side is
      pre-collapsed to (text_md5, cluster size, representative), so
      the join input is one row per UNIQUE corpus text.
    - Near stage signs unique texts only (delta reps × corpus reps)
      and band-joins DELTA bands against CORPUS bands — candidate
      volume is O(delta × bands), never corpus²; the corpus signature
      relation is the thing a production pipeline would persist
      between increments and is persisted here.
    - Per-candidate verification is an array-intersect over the
      already-carried 60-bit shingle-hash sets; matches expand by the
      corpus cluster size arithmetically (identical texts have
      identical shingle sets), so duplicate-heavy corpora never
      re-verify per copy.
    """
    is_delta = (F.col("doc_id") % delta_mod) == F.lit(0)
    delta = documents.where(is_delta)
    corpus = documents.where(~is_delta)

    d_h = delta.select("doc_id", F.md5("text").alias("text_md5"))
    c_clusters = tracked_persist(
        corpus.groupBy(F.md5("text").alias("text_md5"))
              .agg(F.count(F.lit(1)).alias("c_size"),
                   F.min("doc_id").alias("c_rep")))
    d_reps = tracked_persist(
        d_h.groupBy("text_md5").agg(F.min("doc_id").alias("d_rep")))

    docs = spread(documents)
    d_rep_docs = docs.join(
        d_reps.select(F.col("d_rep").alias("doc_id")), "doc_id")
    c_rep_docs = docs.join(
        c_clusters.select(F.col("c_rep").alias("doc_id")), "doc_id")
    dsig = tracked_persist(minhash_signatures(d_rep_docs))
    csig = tracked_persist(minhash_signatures(c_rep_docs))

    cand = (_band_rows(dsig).alias("a")
            .join(_band_rows(csig).alias("b"),
                  (F.col("a.band_idx") == F.col("b.band_idx"))
                  & (F.col("a.band_key") == F.col("b.band_key")))
            .select(F.col("a.doc_id").alias("d_rep"),
                    F.col("b.doc_id").alias("c_rep"))
            .distinct())
    da = dsig.select(F.col("doc_id").alias("d_rep"), F.col("sh_set").alias("set_d"))
    ca = csig.select(F.col("doc_id").alias("c_rep"), F.col("sh_set").alias("set_c"))
    j = cand.join(da, "d_rep").join(ca, "c_rep")
    inter = F.size(F.array_intersect("set_d", "set_c"))
    jac = inter / (F.size("set_d") + F.size("set_c") - inter)
    matched = (j.where((F.size("set_d") > 0) & (F.size("set_c") > 0))
                .where(F.round(jac, 6) >= threshold)
                .select("d_rep", "c_rep"))
    near = (matched
            .join(c_clusters.select("c_rep", "c_size"), "c_rep")
            .groupBy("d_rep").agg(F.sum("c_size").alias("n_near")))

    return (d_h.join(d_reps, "text_md5")
               .join(c_clusters.select(
                   "text_md5", F.col("c_size").alias("n_exact")),
                   "text_md5", "left")
               .join(near, "d_rep", "left")
               .select(
                   "doc_id",
                   F.when(F.coalesce("n_exact", F.lit(0)) > 0, F.lit("exact_dup"))
                    .when(F.coalesce("n_near", F.lit(0)) > 0, F.lit("near_dup"))
                    .otherwise(F.lit("new")).alias("status"),
                   F.coalesce("n_exact", F.lit(0).cast("bigint")).alias("n_exact"),
                   F.coalesce("n_near", F.lit(0).cast("bigint")).alias("n_near")))


PARA_W = 16          # words per paragraph-block
PARA_ENC = 1 << 20   # (doc_id, bidx) -> one orderable bigint key


def dedup_paragraph(documents: DataFrame) -> DataFrame:
    """Paragraph-granularity exact dedup — the MassiveText/CCNet move
    (Rae et al. 2021 §A1.2 "remove duplicate paragraphs/lines";
    reference scope: corpus hygiene ahead of ingestion) adapted to a
    newline-free corpus: paragraphs are the non-overlapping PARA_W-word
    blocks of each document. Every block is hashed corpus-wide; the
    FIRST occurrence (lowest (doc_id, block_idx), encoded as one
    orderable bigint) is the keeper and every other copy is cut; each
    document re-emits its surviving blocks in order.

    Sits between `dedup_exact` (whole-doc) and `dedup_substring`
    (arbitrary-offset spans): block-aligned, so one corpus hash pass
    instead of per-position shingles — the cheap first knife a 100 TB
    pipeline runs before span-level recovery.

    Scale shape: blocks are built ROW-LOCALLY (transform over a
    0..n_blocks-1 sequence + posexplode — the array is sliced in one
    projection, never duplicated per block row); the keeper election
    is a combinable groupBy(h).agg(min(key)) + co-keyed join back
    (the dedup_substring skew discipline — never a window over a
    possibly-hot hash); the per-doc rollup is one more map-side
    combined groupBy. Cleaned text leaves as clean_md5, not the
    string — the checked relation stays narrow.

    Determinism: keeper election is an integer min; clean_md5 re-joins
    kept blocks in block order, so a dup-free document's clean_md5
    equals md5(text) exactly (pinned by pytest)."""
    w = PARA_W
    docs = documents.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("ws"))
    n_blocks = F.floor((F.size("ws") + w - 1) / w).cast("int")  # ceil(n/w)
    blocks_arr = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice("ws", i * w + 1, w)).alias("block"),
            F.size(F.slice("ws", i * w + 1, w)).alias("n_tok")))
    b = (docs.select("doc_id", F.posexplode(blocks_arr).alias("bidx", "bs"))
             .select("doc_id", "bidx",
                     F.col("bs.block").alias("block"),
                     F.col("bs.n_tok").alias("n_tok"),
                     F.md5("bs.block").alias("h")))
    keep = b.groupBy("h").agg(
        F.min(F.col("doc_id") * PARA_ENC + F.col("bidx")).alias("keep_key"))
    j = (b.join(keep, "h")
          .withColumn("is_dup",
                      F.col("doc_id") * PARA_ENC + F.col("bidx")
                      != F.col("keep_key")))
    kept_sorted = F.array_sort(F.collect_list(
        F.when(~F.col("is_dup"), F.struct("bidx", "block"))))
    return (j.groupBy("doc_id")
             .agg(F.count(F.lit(1)).cast("int").alias("n_blocks"),
                  F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
                   .cast("int").alias("n_dup_blocks"),
                  F.sum("n_tok").cast("int").alias("n_tokens_before"),
                  F.sum(F.when(~F.col("is_dup"), F.col("n_tok"))
                         .otherwise(0)).cast("int").alias("n_tokens_after"),
                  F.md5(F.concat_ws(" ", F.transform(
                      kept_sorted, lambda s: s["block"])))
                   .alias("clean_md5")))


# prefix-filtering constants: the default threshold 0.8 as the exact
# rational 4/5 (documentation value; the actual rational is derived
# from the call's `threshold` so every threshold keeps the
# completeness theorem — see _pp_rational)
PP_NUM, PP_DEN = 4, 5


def _pp_rational(threshold: float) -> tuple[int, int]:
    """The candidate-side τ as an exact rational (num, den), RELAXED
    by half a 6-dp ulp: verification keeps round(sim, 6) ≥ τ, which
    admits sims down to τ − 5·10⁻⁷ (half-up rounding), so every
    candidate filter derived from τ itself — prefix length
    p = s − ⌈τ·s⌉ + 1, size filter den·min ≥ num·max, positional
    bound — would silently drop a pair whose exact similarity sits in
    [τ − 5·10⁻⁷, τ) yet rounds up to pass the verify/oracle contract
    (reachable once sets grow past ~2·10⁶ tokens — 100 TB territory).
    Using (2·⌊τ·10⁶⌉ − 1)/(2·10⁶) keeps the completeness theorem
    against the ROUNDED verify for every τ, at the cost of at most
    one extra prefix token and a vanishing candidate surplus."""
    t6 = round(threshold * 1_000_000)
    if not 0 < t6 <= 1_000_000:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    return 2 * t6 - 1, 2_000_000


def dedup_ppjoin(documents: DataFrame,
                 threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Prefix-filtering set-similarity self-join (PPJoin-style, Xiao
    et al. WWW'08) — the EXACT-COMPLETE scale path for the n-gram
    Jaccard contract, next to the probabilistic `dedup_minhash_lsh`:
    any pair with Jaccard ≥ τ must share at least one token in each
    set's PREFIX (its p = s − ⌈τ·s⌉ + 1 rarest tokens under one
    global total order) — and, since r11, at least TWO tokens in each
    set's EXTENDED (p+1) prefix whenever the forced overlap
    c_req = ⌈τ·(s_a+s_b)/(1+τ)⌉ is ≥ 2 (the 2-evidence theorem, see
    `_ppjoin_parts`) — so candidates come from a self-join keyed only
    on RARE tokens with the single-shared-rare-token noise pairs
    filtered before any array is shuffled. Identical output to
    `dedup_ngram_jaccard` by the prefix-filtering completeness
    theorem (equivalence pytest-pinned; shares its oracle).

    Scale shape: token df is one vocab-bounded combinable groupBy;
    the global token order is (df, sh_h) — NO global rank/sort, each
    doc ranks only its own tokens (per-doc window, keyed by doc_id);
    the candidate join is keyed by prefix token, whose fan-out is
    bounded by that token's df (rare by construction); verification
    re-joins the two bounded candidate columns against per-doc hash
    SETS and intersects row-locally. Size filter 5·min ≥ 4·max
    (τ = 4/5 cross-multiplied, integer-exact) prunes before the
    verify join.

    Determinism: candidates are exact set logic; the final jaccard is
    the same n_common/(n_a+n_b−n_common) rounded to 6 dp and
    thresholded AFTER rounding, exactly as `dedup_ngram_jaccard`.

    CANONICALIZE-FIRST (r10): docs with IDENTICAL shingle sets are
    grouped into cliques before any join — the prefix/candidate/
    verify pipeline runs over one representative per distinct set,
    and clique members are expanded back into output pairs afterwards
    (intra-clique pairs are Jaccard 1.0 by identity; inter-clique
    pairs inherit their representatives' exact Jaccard, which depends
    only on the sets). The r9 30×/100× bench measured the old
    all-docs pipeline super-linear (0.459/replica at 30×, /tmp
    exhaustion at 100×) — and the profile showed why: under content
    duplication the OUTPUT is quadratic in the copy count (every
    m-clique owes C(m,2) pairs — 256 base pairs → 2.1M at 30×), and
    the old plan paid that quadratic factor again in every stage
    (candidate rows 43k → 41M, each verify row carrying two full hash
    arrays). Canonicalize-first pays it exactly once, in the final
    expansion join that emits the answer — filter + verify cost is
    per-DISTINCT-set, constant per replica. At 100 TB, where
    duplicated content is the workload's defining property (that's
    why you dedup), this is the only shape that survives."""
    parts = _ppjoin_parts(documents, threshold)
    return parts["verified"]


def _set_cliques(documents: DataFrame) -> dict:
    """Canonicalize-first substrate shared by the exact set-similarity
    joins (`dedup_ppjoin`, `dedup_containment`): docs grouped into
    cliques of IDENTICAL shingle sets, one representative per
    distinct set. Returns hsets (doc_id, sorted hash array), grp
    (fp, rep, m, hset — one row per distinct set), members
    (doc_id → rep), sh (REPRESENTATIVE token rows with row-local
    n_sh — the only relation any downstream join touches)."""
    # per-doc sorted 60-bit shingle-hash set, row-local (no shuffle);
    # docs with no shingles (< n words) never pair in the quadratic
    # baseline, so they are excluded before clique-building — an
    # empty-set "clique" must NOT emit similarity-1.0 pairs
    hsets = tracked_persist(
        shingle_sets(spread(documents))
        .select("doc_id",
                F.array_sort(F.transform(
                    "sh_set", lambda s: H.md5_int60(s))).alias("hset"))
        .where(F.size("hset") >= 1))
    # set fingerprint: md5 over the sorted hash list — a 128-bit
    # row-local group key so clique-building shuffles 32 bytes per
    # doc, never the array itself
    fp = F.md5(F.concat_ws(",", F.transform(
        "hset", lambda h: h.cast("string"))))
    docs_fp = hsets.select("doc_id", fp.alias("fp"))
    # clique groupBy over scalars only (hash-agg, map-side combine);
    # the representative's array is joined back afterwards — a
    # first(hset) in the agg would force a SortAggregate that sorts
    # every doc's array payload by fp
    grp = tracked_persist(
        docs_fp.groupBy("fp").agg(
            F.min("doc_id").alias("rep"),
            F.count(F.lit(1)).alias("m"))
        .join(hsets.select(F.col("doc_id").alias("rep"), "hset"), "rep"))
    members = docs_fp.join(
        grp.select("fp", "rep"), "fp").select("doc_id", "rep")
    # representative token rows: re-exploded from the already-hashed
    # set, with n_sh row-local from the array size. Everything from
    # here to verification is per-distinct-set.
    sh = tracked_persist(
        grp.select(F.col("rep").alias("doc_id"),
                   F.size("hset").alias("n_sh"),
                   F.explode("hset").alias("sh_h")))
    return {"hsets": hsets, "grp": grp, "members": members, "sh": sh}


def _expand_cliques(verified_reps: DataFrame, members: DataFrame,
                    value_col: str, identical_value) -> DataFrame:
    """Clique expansion — the ONLY stage whose size is the (possibly
    quadratic-under-duplication) answer itself: inter-clique pairs
    inherit the representatives' exact similarity, intra-clique pairs
    are identical sets (similarity = `identical_value`); least/
    greatest restores the doc_a < doc_b contract since member ids
    interleave."""
    ma = members.select(F.col("rep").alias("doc_a"),
                        F.col("doc_id").alias("da"))
    mb = members.select(F.col("rep").alias("doc_b"),
                        F.col("doc_id").alias("db"))
    inter = (verified_reps.join(ma, "doc_a").join(mb, "doc_b")
             .select(F.least("da", "db").alias("doc_a"),
                     F.greatest("da", "db").alias("doc_b"), value_col))
    intra = (members.select("rep", F.col("doc_id").alias("da"))
             .join(members.select("rep", F.col("doc_id").alias("db")), "rep")
             .where(F.col("da") < F.col("db"))
             .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
                     F.lit(identical_value).alias(value_col)))
    return inter.unionAll(intra)


def _ppjoin_parts(documents: DataFrame,
                  threshold: float = JACCARD_THRESHOLD) -> dict:
    """Named stages of the canonicalize-first PPJoin pipeline, shared
    by `dedup_ppjoin` (returns 'verified') and `ppjoin_stats` (counts
    every stage): members (doc→clique), grp (one row per distinct
    set), sh (REPRESENTATIVE token rows — the only relation the
    prefix order and candidate join ever touch), prefix, cand,
    verified_reps (rep pairs passing exact verification), verified
    (clique-expanded output pairs)."""
    from pyspark.sql import Window

    num, den = _pp_rational(threshold)
    cl = _set_cliques(documents)
    grp, members, sh = cl["grp"], cl["members"], cl["sh"]
    dfr = sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
    shd = sh.join(dfr, "sh_h")
    w = Window.partitionBy("doc_id").orderBy("df", "sh_h")
    # EXTENDED prefix (r11): p2 = p + 1 = s − ⌈τ·s⌉ + 2 (capped at s),
    # with ⌈num·s/den⌉ = (num·s + den − 1) div den. One token past the
    # classic PPJoin prefix buys the 2-EVIDENCE pair filter below —
    # the same theorem that cut dedup_containment's measured candidate
    # amplification: let c_req = ⌈num·(n_a+n_b)/(num+den)⌉ be the
    # overlap Jaccard ≥ num/den forces, and w1 < w2 the globally
    # first/second common tokens under the one (df, sh_h) order. The
    # size filter gives num·n_x ≤ den·n_y both ways, so
    # c_req ≥ ⌈num·n_x/den⌉ for BOTH sides; if w2 (exists iff
    # c_req ≥ 2) were outside either EXTENDED prefix, the commons
    # besides w1 would fit in that side's n − p2 = ⌈num·n/den⌉ − 2
    # suffix slots — contradiction. So every qualifying pair shows
    # BOTH evidence rows in the ext-prefix×ext-prefix join, and the
    # pair filter may demand ov ≥ min(2, c_req) matched rows — which
    # kills the pairs sharing exactly ONE rare token, the class the
    # r10 100× bench measured as 71M candidates for 24.3M output
    # pairs ahead of the array-verify shuffle (the 100× cost center).
    prefix_len = F.expr(
        f"least(n_sh, n_sh - (({num} * n_sh + {den - 1}) div {den}) + 2)")
    prefix = (shd.withColumn("rn", F.row_number().over(w))
                 .where(F.col("rn") <= prefix_len)
                 .select("doc_id", "sh_h", "n_sh", "rn"))
    a = prefix.select(F.col("doc_id").alias("doc_a"), "sh_h",
                      F.col("n_sh").alias("n_a"), F.col("rn").alias("rn_a"))
    b = prefix.select(F.col("doc_id").alias("doc_b"), "sh_h",
                      F.col("n_sh").alias("n_b"), F.col("rn").alias("rn_b"))
    # POSITIONAL FILTER (Xiao et al. WWW'08 §3.2), unchanged: min
    # matched positions land on the globally FIRST common token (both
    # rankings restrict one total order, and w1 is matched — it sits
    # inside both classic prefixes, hence both extended ones), so
    # |common| ≤ 1 + min(n_a − i*, n_b − j*). The groupBy is the same
    # map-side-combinable shuffle as before, now also counting the
    # matched evidence rows (ov).
    c_req = F.expr(f"(({num} * (n_a + n_b) + {num + den - 1})"
                   f" div {num + den})")
    cand = (a.join(b, "sh_h")
             .where((F.col("doc_a") < F.col("doc_b"))
                    & (den * F.least("n_a", "n_b")
                       >= num * F.greatest("n_a", "n_b")))
             .groupBy("doc_a", "doc_b", "n_a", "n_b")
             .agg(F.min("rn_a").alias("i1"), F.min("rn_b").alias("j1"),
                  F.count(F.lit(1)).alias("ov"))
             .where(((num + den)
                     * (1 + F.least(F.col("n_a") - F.col("i1"),
                                    F.col("n_b") - F.col("j1")))
                     >= num * (F.col("n_a") + F.col("n_b")))
                    & (F.col("ov") >= F.least(F.lit(2), c_req)))
             .select("doc_a", "doc_b", "n_a", "n_b"))
    sa = grp.select(F.col("rep").alias("doc_a"),
                    F.col("hset").alias("set_a"))
    sb = grp.select(F.col("rep").alias("doc_b"),
                    F.col("hset").alias("set_b"))
    v = (cand.join(sa, "doc_a").join(sb, "doc_b")
             .withColumn("n_common",
                         F.size(F.array_intersect("set_a", "set_b"))))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    verified_reps = (v.select("doc_a", "doc_b",
                              F.round(jac, 6).alias("jaccard"))
                      .where(F.col("jaccard") >= threshold))
    verified = _expand_cliques(verified_reps, members, "jaccard", 1.0)
    return {"hsets": cl["hsets"], "grp": grp, "members": members, "sh": sh,
            "prefix": prefix, "cand": cand,
            "verified_reps": verified_reps, "verified": verified}


def ppjoin_stats(documents: DataFrame,
                 threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Pruning-evidence audit for the prefix filter — the numbers
    that justify PPJoin at scale, measured not argued. Since the r10
    canonicalize-first rework the row names BOTH cost components:

    - the per-distinct-set filter cost: n_token_rows vs n_prefix_rows
      (the candidate join only ever keys on the prefix fraction,
      prefix_ppm; since r11 the prefix is the EXTENDED p+1 prefix
      that buys the 2-evidence pair filter) and n_candidates →
      n_verified_reps, all measured over one representative per
      distinct shingle set — constant per replica under content
      duplication;
    - the OUTPUT-driven term: n_sets vs n_distinct_sets, max_clique,
      and clique_pairs = Σ C(m,2) — the exact-duplicate pair floor
      that grows quadratically in the copy count and lower-bounds
      n_verified. This is the super-linear component the r9 30×/100×
      bench observed: it is the answer's size, not a plan defect
      (n_verified = Σ m_a·m_b over verified rep pairs + clique_pairs).

    One summary row; every count an integer, the fraction an exact
    ppm floor division. No quadratic stage anywhere except the
    expansion that emits the (quadratic-under-duplication) answer."""
    p = _ppjoin_parts(documents, threshold)
    c_tok = p["sh"].agg(F.count(F.lit(1)).alias("n_token_rows"))
    c_grp = p["grp"].agg(
        F.count(F.lit(1)).alias("n_distinct_sets"),
        F.sum("m").alias("n_sets"),
        F.max("m").alias("max_clique"),
        F.sum(F.expr("m * (m - 1) div 2")).alias("clique_pairs"))
    c_pre = p["prefix"].agg(F.count(F.lit(1)).alias("n_prefix_rows"))
    c_cand = p["cand"].agg(F.count(F.lit(1)).alias("n_candidates"))
    c_vr = p["verified_reps"].agg(
        F.count(F.lit(1)).alias("n_verified_reps"))
    c_ver = p["verified"].agg(F.count(F.lit(1)).alias("n_verified"))
    out = (c_grp.crossJoin(F.broadcast(c_tok))
                .crossJoin(F.broadcast(c_pre))
                .crossJoin(F.broadcast(c_cand))
                .crossJoin(F.broadcast(c_vr))
                .crossJoin(F.broadcast(c_ver)))
    return out.select(
        # n_sets and the row counts are BIGINT (r11, was int32):
        # r9 measured ~1e9 shingle rows at 100x — token/prefix rows
        # and doc counts are not int32-safe widths at extreme SFs
        F.col("n_sets").cast("bigint").alias("n_sets"),
        F.col("n_distinct_sets").cast("int").alias("n_distinct_sets"),
        F.col("max_clique").cast("int").alias("max_clique"),
        F.col("clique_pairs").cast("bigint").alias("clique_pairs"),
        F.col("n_token_rows").cast("bigint").alias("n_token_rows"),
        F.col("n_prefix_rows").cast("bigint").alias("n_prefix_rows"),
        F.expr("n_prefix_rows * 1000000 div n_token_rows")
         .cast("bigint").alias("prefix_ppm"),
        # pair counts are BIGINT: n_verified >= clique_pairs, which is
        # quadratic under duplication (C(66k, 2) already overflows int)
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
        F.col("n_verified_reps").cast("bigint").alias("n_verified_reps"),
        F.col("n_verified").cast("bigint").alias("n_verified"))


CONTAIN_THRESHOLD = 0.9



def _containment_parts(documents: DataFrame,
                       threshold: float = CONTAIN_THRESHOLD) -> dict:
    """Named stages of the canonicalize-first containment pipeline,
    shared by `dedup_containment` (returns 'verified') and
    `containment_stats` (counts every stage). See dedup_containment
    for the completeness theorems; this is where they are encoded.

    Candidate completeness (2-EVIDENCE extended prefix, r11): wlog
    |A| <= |B|, c = ceil(tau*n_a) commons required. Order every
    set's tokens under the one global (df, sh_h) order; let w1, w2 be
    the globally FIRST and SECOND common tokens. Then
    - w1 sits within A's p = n_a - c + 1 prefix (else all c commons
      fit in the n_a - p = c - 1 suffix slots: contradiction) and
      within B's first n_b - c + 1 positions (the other c - 1 commons
      all rank after it in B);
    - when c >= 2, w2 exists and sits within A's EXTENDED prefix of
      p2 = p + 1 tokens (else the c - 1 commons besides w1 fit in
      n_a - p2 = c - 2 slots) and within B's first n_b - c + 2
      positions (c - 2 commons rank after it).
    So the join of A's p2-prefix rows against B's full token rows,
    row-filtered to rn_b <= n_b - c + 2, retains BOTH evidence rows
    of every qualifying pair, and the pair-level filter can demand
    ov >= min(2, c) matched rows with min(rn_b) <= n_b - c + 1.
    The r10 plan's single-evidence filter (any shared prefix token,
    positional bound from min positions) admitted every pair sharing
    ONE rare token anywhere early in B — the measured ~57M-candidate
    amplification for ~2M verified at 30x; demanding the second
    evidence row kills exactly that one-shared-token noise while the
    theorem above keeps exact completeness. c is computed from the
    half-ulp-relaxed rational (_pp_rational), so completeness holds
    against the ROUNDED verify contract."""
    from pyspark.sql import Window

    num, den = _pp_rational(threshold)

    def ceil_t(col: str) -> str:
        # ceil(num*col/den) over positive ints, SQL-exact
        return f"(({num} * {col} + {den - 1}) div {den})"

    cl = _set_cliques(documents)
    grp, members, sh = cl["grp"], cl["members"], cl["sh"]
    dfr = sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
    shd = sh.join(dfr, "sh_h")
    w = Window.partitionBy("doc_id").orderBy("df", "sh_h")
    ranked = tracked_persist(
        shd.withColumn("rn", F.row_number().over(w))
           .select("doc_id", "sh_h", "n_sh", "rn"))
    # extended prefix p2 = n_sh - c + 2 (one token past the classic
    # prefix), capped at the set size for 1-token sets
    prefix2 = ranked.where(
        F.col("rn") <= F.expr(f"least(n_sh, n_sh - {ceil_t('n_sh')} + 2)"))
    a = prefix2.select(F.col("doc_id").alias("doc_a"), "sh_h",
                       F.col("n_sh").alias("n_a"), F.col("rn").alias("rn_a"))
    b = ranked.select(F.col("doc_id").alias("doc_b"), "sh_h",
                      F.col("n_sh").alias("n_b"), F.col("rn").alias("rn_b"))
    cand = (a.join(b, "sh_h")
             .where((F.col("n_a") < F.col("n_b"))
                    | ((F.col("n_a") == F.col("n_b"))
                       & (F.col("doc_a") < F.col("doc_b"))))
             # ROW-level B-position filter: both evidence rows satisfy
             # rn_b <= n_b - c + 2 (w1 even <= n_b - c + 1); rows
             # whose shared token sits deeper in B cannot be evidence
             .where(F.expr(f"rn_b + {ceil_t('n_a')} <= n_b + 2"))
             .groupBy("doc_a", "doc_b", "n_a", "n_b")
             .agg(F.count(F.lit(1)).alias("ov"),
                  F.min("rn_b").alias("j1"))
             # PAIR-level: w1's row forces min(rn_b) <= n_b - c + 1,
             # and when c >= 2 the pair must show BOTH evidence rows
             .where(F.expr(f"j1 + {ceil_t('n_a')} <= n_b + 1")
                    & (F.col("ov")
                       >= F.least(F.lit(2), F.expr(ceil_t("n_a")))))
             .select("doc_a", "doc_b", "n_a", "n_b"))
    sa = grp.select(F.col("rep").alias("doc_a"),
                    F.col("hset").alias("set_a"))
    sb = grp.select(F.col("rep").alias("doc_b"),
                    F.col("hset").alias("set_b"))
    v = (cand.join(sa, "doc_a").join(sb, "doc_b")
             .withColumn("n_common",
                         F.size(F.array_intersect("set_a", "set_b"))))
    cont = F.col("n_common") / F.least("n_a", "n_b")
    verified_reps = (
        v.select(F.least("doc_a", "doc_b").alias("doc_a"),
                 F.greatest("doc_a", "doc_b").alias("doc_b"),
                 F.round(cont, 6).alias("containment"))
         .where(F.col("containment") >= threshold))
    verified = _expand_cliques(verified_reps, members, "containment", 1.0)
    return {"grp": grp, "members": members, "sh": sh, "ranked": ranked,
            "prefix2": prefix2, "cand": cand,
            "verified_reps": verified_reps, "verified": verified}


def dedup_containment(documents: DataFrame,
                      threshold: float = CONTAIN_THRESHOLD) -> DataFrame:
    """Exact CONTAINMENT-similarity self-join — the near-SUBSET dedup
    the Jaccard family structurally misses: max-containment
    C(A,B) = |A∩B| / min(|A|,|B|) stays 1.0 when a short document is
    wholly embedded in a long one while Jaccard shrinks with the size
    ratio (|A|/|B| for A ⊂ B), so a τ_J = 0.8 Jaccard gate passes any
    doc padded past 25% new content. Emits (doc_a, doc_b,
    containment ≥ τ) with the same exact-complete guarantee as
    `dedup_ppjoin`, via the shared canonicalize-first substrate
    (`_set_cliques`: identical sets → cliques, all joins over one
    representative per distinct set, output expanded at the end —
    intra-clique pairs are containment 1.0 by identity).

    Candidate generation is the 2-EVIDENCE extended-prefix join
    (theorem in `_containment_parts`): A's prefix is ONE token longer
    than the classic p = n_a − ⌈τ·n_a⌉ + 1, which buys the right to
    demand TWO matched token rows per candidate pair (both
    row-filtered to early-enough positions in B) whenever
    ⌈τ·n_a⌉ ≥ 2. The asymmetric measure still admits no size filter
    and the probe side is still B's FULL token set (|A| ≤ |B|, ties
    by rep id) — that structural cost stands — but the r10
    single-evidence plan's measured amplification (~57M candidates
    for ~2M verified pairs at 30×, candidate×2-full-arrays verify
    shuffle as the cost center) came almost entirely from pairs
    sharing exactly ONE rare token, which the second evidence row
    eliminates before any array is shuffled. `containment_stats`
    measures every stage of exactly this pipeline.

    Determinism: containment is one IEEE division of exact integer
    counts rounded to 6 dp, thresholded AFTER rounding."""
    return _containment_parts(documents, threshold)["verified"]


def containment_stats(documents: DataFrame,
                      threshold: float = CONTAIN_THRESHOLD) -> DataFrame:
    """Pruning-evidence audit for the containment join — ppjoin_stats'
    discipline applied to the asymmetric measure, so the candidate
    amplification the r10 bench observed is a MEASURED, oracle-checked
    number per workload rather than a docstring claim:

    - n_sets / n_distinct_sets / max_clique / clique_pairs — the
      canonicalize-first accounting (the quadratic-under-duplication
      answer floor, shared shape with ppjoin_stats);
    - n_token_rows vs n_prefix2_rows (prefix2_ppm) — the extended
      prefix is the JOIN's build side, one token wider than PPJoin's;
    - n_candidates → n_verified_reps → n_verified — the filter
      cascade; candidates/verified_reps is the amplification factor
      the 2-evidence filter exists to bound.

    One summary row; every count an integer, fractions exact ppm
    floor divisions; pair counts BIGINT (clique_pairs lower-bounds
    n_verified and is quadratic under duplication), and the row
    counts are BIGINT too — r9 measured ~1e9 shingle rows at 100×,
    int32 is not a scale-safe width for token rows."""
    p = _containment_parts(documents, threshold)
    c_tok = p["sh"].agg(F.count(F.lit(1)).alias("n_token_rows"))
    c_grp = p["grp"].agg(
        F.count(F.lit(1)).alias("n_distinct_sets"),
        F.sum("m").alias("n_sets"),
        F.max("m").alias("max_clique"),
        F.sum(F.expr("m * (m - 1) div 2")).alias("clique_pairs"))
    c_pre = p["prefix2"].agg(F.count(F.lit(1)).alias("n_prefix2_rows"))
    c_cand = p["cand"].agg(F.count(F.lit(1)).alias("n_candidates"))
    c_vr = p["verified_reps"].agg(
        F.count(F.lit(1)).alias("n_verified_reps"))
    c_ver = p["verified"].agg(F.count(F.lit(1)).alias("n_verified"))
    out = (c_grp.crossJoin(F.broadcast(c_tok))
                .crossJoin(F.broadcast(c_pre))
                .crossJoin(F.broadcast(c_cand))
                .crossJoin(F.broadcast(c_vr))
                .crossJoin(F.broadcast(c_ver)))
    return out.select(
        F.col("n_sets").cast("bigint").alias("n_sets"),
        F.col("n_distinct_sets").cast("int").alias("n_distinct_sets"),
        F.col("max_clique").cast("int").alias("max_clique"),
        F.col("clique_pairs").cast("bigint").alias("clique_pairs"),
        F.col("n_token_rows").cast("bigint").alias("n_token_rows"),
        F.col("n_prefix2_rows").cast("bigint").alias("n_prefix2_rows"),
        F.expr("n_prefix2_rows * 1000000 div n_token_rows")
         .cast("bigint").alias("prefix2_ppm"),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
        F.col("n_verified_reps").cast("bigint").alias("n_verified_reps"),
        F.col("n_verified").cast("bigint").alias("n_verified"))
