"""Similarity search over the `embeddings` table (SURVEY §2 #30-32).

- `ann_topk` — brute-force cosine top-k: broadcast the (small) query
  set against a single scan of the corpus; no shuffle except the
  final per-query top-k. Linear in corpus size — the exact baseline.
- `ann_lsh` — banded random-hyperplane LSH (the MinHash r/b design
  applied to cosine): N_TABLES independent signature tables of
  BITS_PER_TABLE sign-bits each; candidates match a FULL table
  signature in at least one table, then exact-cosine verify. Expected
  candidate pairs per table ≈ n²/2^B, so B scales with log(n) to keep
  candidates ~linear — at 100 TB you raise BITS_PER_TABLE, not the
  algorithm. More tables = more recall, more bits = more precision.
  The candidate join carries only (vec_id, table, bucket) — vectors
  are re-joined for verification, so the wide embedding column never
  rides the candidate shuffle.
- `ann_ivf` — IVF-Flat: coarse-quantize into cells (broadcast
  centroids, map-side argmax assignment), probe nprobe cells per
  query, exact re-rank inside probed cells. The list-pruning
  scale path complementary to `ann_lsh`'s hashing one.
- `dedup_embedding_cosine` — near-dup pairs by cosine ≥ τ. Brute
  force all-pairs as the correctness baseline (quadratic — bounded
  to a slice here; at scale you run `ann_lsh` and verify its
  candidates instead, same pattern as MinHash→Jaccard).

All dot products are JVM-side higher-order folds over
``array<double>`` (left-to-right, mirroring DuckDB's list_dot_product
accumulation order so oracle doubles match bitwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist
from real_time_fraud_detection_flink_kafka_spark.functions.partitioning import spread

N_QUERIES = 10
TOP_K = 5
COS_THRESHOLD = 0.45
N_TABLES = 8          # independent LSH tables (recall knob)
BITS_PER_TABLE = 10   # MINIMUM sign-bits per table signature
MAX_BITS = 20         # pregenerated hyperplanes per table (width ceiling)
LSH_BASE_N = 2000     # corpus size at which width starts growing
WIDE_BITS = 14        # the widened width ann_recall_compare measures
BRUTE_MAX_ID = 1500  # baseline slice bound for the quadratic path
IVF_K = 16           # coarse-quantizer cells (floor; see ivf_cells_for)
NPROBE = 4           # cells probed per query (recall knob)
IVF_DIV = 128        # target occupancy: one cell per IVF_DIV vectors
# cell count at/above which the DEFAULT coarse assignment switches
# from the flat argmax (exact, O(n·cells)) to two-level/IMI
# (approximate, O(n·√cells)). The r9 100× bench MEASURED the flat
# path's super-linearity — 297.6 s vs 76.5 s for the hier twin at
# ~1562 cells (0.933 vs 0.209 per replica) with edge recall unchanged
# (0.197 vs 0.198) — so past ~a thousand cells the exact argmax buys
# nothing but the quadratic term. Below the threshold flat assignment
# costs ≤ HIER_CELLS_MIN cos-folds per vector and stays the
# bit-exact default.
# r11 RE-TUNED 1024 → 256: the 30×-bracket measurement the r10
# setting never had. At 468 cells (60k vectors — below the old
# threshold) the flat candidate relation is n·cells ≈ 28M folds and
# _ivf_probed ALONE read 22-25 s — the whole knn_graph_nprobe
# construction's measured cost center and the scale curve's worst
# row (0.51/replica at 30×). Two-level at 468 cells is n·(√cells +
# occupancy) ≈ 2.6M folds. 256 keeps flat exact where it is
# genuinely cheap (≤ 256 folds/vector, ≤ 32k vectors at IVF_DIV=128)
# and engages the hier path at ≥ 32,768 vectors.
HIER_CELLS_MIN = 256


def ivf_cells_for(n: int) -> int:
    """Scale-aware cell count for PAIR-BLOCKING (dedup): cells grow
    LINEARLY with the corpus (one per IVF_DIV vectors, floored at
    IVF_K), holding expected within-cell candidate pairs per row
    Σ|cell|²/n ≈ n/cells ≈ IVF_DIV constant as the corpus grows —
    the same lever as `lsh_bits_for`, for the quantizer family.
    (Query-path IVF trades differently — probe cost n/cells vs
    centroid-scan cost cells — hence ann_ivf keeps its explicit
    knob.) Integer-exact in all three engines: plain floor division,
    mirrored in the oracle as `count(*) // IVF_DIV`."""
    return max(IVF_K, n // IVF_DIV)


def ivf_cell_params(embeddings: DataFrame) -> DataFrame:
    """1-row (_cells int) relation computing `ivf_cells_for(count)`
    engine-side (broadcast, no driver collect)."""
    return embeddings.agg(
        F.greatest(F.lit(IVF_K),
                   F.expr(f"count(1) div {IVF_DIV}"))
         .cast("int").alias("_cells"))


def lsh_bits_for(n: int) -> int:
    """Scale-aware signature width: one extra sign-bit per corpus
    DOUBLING beyond ``LSH_BASE_N``, floored at ``BITS_PER_TABLE`` and
    capped at ``MAX_BITS`` (the number of pregenerated hyperplanes —
    at >2M vectors you regenerate more planes and raise the cap).

    Expected within-bucket pairs per table are n²/2^bits, so holding
    bits fixed makes candidates grow quadratically; adding a bit per
    doubling holds candidates-per-row ~CONSTANT as the corpus grows —
    the lever the 100 TB path needs. Integer-exact everywhere: the
    same formula is written as `bin`/`div` arithmetic in Spark SQL
    and as `bin`/`//` in the DuckDB oracle (see
    oracles_llm._similarity_oracles), so all three engines agree
    bit-for-bit on the width, and the oracle masks a full
    ``MAX_BITS`` signature by 2^bits — arithmetically identical to
    truncating the fold at `bits` terms."""
    m1 = max(n - 1, 0) // LSH_BASE_N
    d = 0 if m1 <= 0 else m1.bit_length()
    return min(MAX_BITS, BITS_PER_TABLE + d)


def lsh_width_params(embeddings: DataFrame) -> DataFrame:
    """1-row (_bits int) relation computing `lsh_bits_for(count(*))`
    ENGINE-SIDE — broadcast into the signature stage so width rides
    the DAG (a cheap count aggregate, the same move as
    mix_rebalance's rate broadcast; no driver collect)."""
    m1 = F.expr(f"greatest(count(1) - 1, 0) div {LSH_BASE_N}")
    d = F.when(m1 <= 0, F.lit(0)).otherwise(F.length(F.bin(m1)))
    return embeddings.agg(
        F.least(F.lit(MAX_BITS), F.lit(BITS_PER_TABLE) + d)
         .cast("int").alias("_bits"))


def _lcg_floats(n: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random floats in [-1, 1] (shared with the
    oracle as literals)."""
    state = seed
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(((state >> 11) % 2_000_001) / 1_000_000.0 - 1.0)
    return out


DIM = 64
# layout: table t's bit i is HYPERPLANES[t * MAX_BITS + i] — widening
# the active width appends bits to every table without re-seeding the
# ones already in use
HYPERPLANES: list[list[float]] = [
    _lcg_floats(DIM, seed=7 + i) for i in range(N_TABLES * MAX_BITS)
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _vecs(embeddings: DataFrame) -> DataFrame:
    """vec_id, v, and the vector's norm — norms are computed ONCE per
    vector here, never per pair (3× fewer 64-dim folds in every
    pairwise operator; the value is bitwise-identical to computing
    sqrt(dot(v,v)) at the pair site, so oracles are unaffected)."""
    v = F.col("embedding").cast("array<double>")
    return embeddings.select("vec_id", v.alias("v"),
                             F.sqrt(dot(v, v)).alias("v_norm"))


def ann_topk(embeddings: DataFrame, k: int = TOP_K,
             n_queries: int = N_QUERIES) -> DataFrame:
    """Exact cosine top-k for the first `n_queries` vectors: broadcast
    queries × corpus scan, per-query top-k."""
    e = _vecs(embeddings)
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"))
    cand = e.select(F.col("vec_id").alias("neighbor_id"), "v", "v_norm")
    j = cand.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm"))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (j.select("query_id", "neighbor_id", cos.alias("cos_raw"))
             .withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= k)
             .select("query_id", "neighbor_id",
                     F.round(F.col("cos_raw"), 6).alias("cos_sim"), "rnk"))


def lsh_signatures_array(v: Column, hps: Column | None = None,
                         bits: Column | int | None = None) -> Column:
    """All N_TABLES table-signatures as ONE array expression.

    Expression-shape matters twice here: (1) each dot sits directly in
    the per-(table, bit) lambda, so exactly N_TABLES·BITS_PER_TABLE
    dots are evaluated per row (a subexpression shared across HOF
    lambdas gets RE-EVALUATED per element — the CollapseProject/HOF
    inlining trap); (2) the 80×64-double hyperplane constant should be
    passed as a COLUMN from a broadcast 1-row frame (`hps`, see
    `_with_hyperplanes`) — the `F.lit` fallback expands to a ~5000-node
    CreateArray tree that costs seconds of Catalyst/py4j time per
    query. Either shape evaluates identically: the per-hyperplane dot
    is the same left fold as `dot`, so sign decisions (and the oracle)
    are unchanged."""
    if hps is None:
        hps = F.lit(HYPERPLANES)
    if bits is None:
        bits = F.lit(BITS_PER_TABLE)
    elif isinstance(bits, int):
        bits = F.lit(bits)
    pows = F.lit([1 << i for i in range(MAX_BITS)])
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_TABLES - 1)),
        lambda t: F.aggregate(
            F.sequence(F.lit(0), bits - 1),
            F.lit(0),
            lambda acc, i: acc + F.when(
                dot(v, F.element_at(hps, t * MAX_BITS + i + 1)) > 0,
                F.element_at(pows, i + 1)).otherwise(0)))


def lsh_table_signature(v: Column, table: int,
                        bits: int = BITS_PER_TABLE) -> Column:
    """`bits`-wide sign signature for one LSH table."""
    return F.element_at(lsh_signatures_array(v, bits=bits), table + 1)


def _with_hyperplanes(df: DataFrame) -> DataFrame:
    """Attach the hyperplane constant as a `_hps` column via a
    broadcast single-row cross join. A nested-array literal of
    N_TABLES·BITS_PER_TABLE·DIM doubles costs ~5 s of expression
    construction + Catalyst walking PER QUERY; one Arrow-shipped row
    joined broadcast costs ~0.3 s and the evaluated values are
    bitwise identical."""
    spark = df.sparkSession
    hdf = spark.createDataFrame([(HYPERPLANES,)], "_hps array<array<double>>")
    return df.crossJoin(F.broadcast(hdf))


def ann_lsh(embeddings: DataFrame, threshold: float = COS_THRESHOLD,
            bits: int | None = None) -> DataFrame:
    """Banded multi-table LSH: a pair is a candidate iff it matches a
    FULL table signature in ≥1 of the N_TABLES tables (union via
    DISTINCT), then exact-cosine verified.

    Scale shape: the candidate join shuffles only (vec_id, tbl,
    bucket) — the 64-dim vectors are re-joined afterwards for
    verification, so candidate generation is O(n · N_TABLES) rows of
    ~20 bytes, and expected within-bucket pairs per table are
    n²/2^bits. Width is SCALE-AWARE by default (`bits=None`):
    `lsh_width_params` broadcasts `lsh_bits_for(count)` — one bit per
    corpus doubling past LSH_BASE_N — so candidates-per-row stay
    ~constant as the corpus grows instead of quadrupling per
    doubling; pass an explicit `bits` to pin the width (the recall
    operators do, to keep their measured curves width-comparable).
    The recall price of widening is itself measured:
    `ann_recall_compare` carries an `lsh_w14` generator row.

    Recall profile at 8×10 bits (sign-bit collision p = 1 - θ/π):
    ~97% at cos 0.95, ~85% at 0.9, ~12% at 0.5 — i.e. this is the
    scale path for NEAR-DUP mining; pairs barely above a low
    threshold are inherently hard for sign-LSH (use `ann_topk` /
    `ann_topk_fast` for exact low-threshold search)."""
    e = _vecs(spread(embeddings))
    bits_col: Column | int
    if bits is None:
        withp = _with_hyperplanes(e).crossJoin(
            F.broadcast(lsh_width_params(embeddings)))
        bits_col = F.col("_bits")
    else:
        withp = _with_hyperplanes(e)
        bits_col = bits
    # both self-join sides consume the signature relation; the
    # candidate join broadcasts one side, so there is no exchange for
    # Catalyst to reuse and the 80-hyperplane signature fold would run
    # TWICE — persist() computes it once (rows are (id, tbl, bucket),
    # ~20 bytes; at cluster scale this is the persisted/written
    # signature table every LSH system maintains)
    buckets = tracked_persist(withp.select("vec_id", F.posexplode(
        lsh_signatures_array(F.col("v"), F.col("_hps"), bits_col))
        .alias("tbl", "bucket")))
    return _lsh_candidates_verified(e, buckets, threshold)


def _lsh_candidates_verified(e: DataFrame, buckets: DataFrame,
                             threshold: float) -> DataFrame:
    """Shared candidate-join + exact-cosine verify over a (vec_id,
    tbl, bucket) signature relation (expression or Arrow path)."""
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("vec_a"),
                     F.col("b.vec_id").alias("vec_b"))
             .distinct())
    va = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("av"),
                  F.col("v_norm").alias("a_norm"))
    vb = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("bv"),
                  F.col("v_norm").alias("b_norm"))
    cos = dot(F.col("av"), F.col("bv")) / (F.col("a_norm") * F.col("b_norm"))
    return (cand.join(va, "vec_a").join(vb, "vec_b")
                .select("vec_a", "vec_b", cos.alias("cos_raw"))
                .where(F.col("cos_raw") >= threshold)
                .select("vec_a", "vec_b",
                        F.round(F.col("cos_raw"), 6).alias("cos_sim")))


def lsh_signatures_arrow(embeddings: DataFrame,
                         bits: int | None = None) -> DataFrame:
    """Arrow/numpy fast path for the LSH signature stage: (vec_id,
    tbl, bucket) rows, BIT-IDENTICAL to `lsh_signatures_array`.
    `bits=None` sizes the width from the corpus count with the same
    `lsh_bits_for` formula as the expression path (the count here is
    one driver-side count job — the closure needs the scalar before
    the numpy arrays are built; same O(1)-result pass as the 1-row
    broadcast, materialized instead of joined).

    Bit-identity argument: the expression path folds each hyperplane
    dot STRICTLY left-to-right in doubles (0 + v₀h₀ + v₁h₁ + …).
    Here the same fold runs vectorized ACROSS rows/planes but
    sequential across dims — `acc += V[:, d] · H[:, d]` one dim at a
    time — so every (row, plane) accumulator performs the exact same
    IEEE operation sequence as the scalar fold, and sign decisions
    (hence buckets, hence candidates) cannot differ. This is the same
    trick as `minhash_signatures_arrow`'s integer path, applied to
    floats; a single matmul would NOT be safe (SIMD/pairwise
    summation reorders the adds and could flip near-zero signs)."""
    import numpy as np
    import pandas as pd

    if bits is None:
        bits = lsh_bits_for(embeddings.count())
    # active planes only: table t's first `bits` rows of the
    # t*MAX_BITS block — (N_TABLES*bits, 64)
    idx = np.concatenate([np.arange(t * MAX_BITS, t * MAX_BITS + bits)
                          for t in range(N_TABLES)])
    HP = np.array(HYPERPLANES, dtype=np.float64)[idx]
    pows = (1 << np.arange(bits, dtype=np.int64))
    width = bits

    def sign(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            acc = np.zeros((n, HP.shape[0]), dtype=np.float64)
            for d in range(HP.shape[1]):
                acc += V[:, d, None] * HP[None, :, d]
            signs = (acc > 0).reshape(n, N_TABLES, width)
            sigs = (signs * pows[None, None, :]).sum(axis=2)  # (n, N_TABLES)
            ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame({
                "vec_id": np.repeat(ids, N_TABLES),
                "tbl": np.tile(np.arange(N_TABLES), n),
                "bucket": sigs.reshape(-1).astype(np.int32),
            })

    return (embeddings.select("vec_id", "embedding")
            .mapInPandas(sign, "vec_id bigint, tbl int, bucket int"))


def ann_lsh_fast(embeddings: DataFrame,
                 threshold: float = COS_THRESHOLD,
                 bits: int | None = None) -> DataFrame:
    """`ann_lsh` with the Arrow signature stage — bit-identical
    buckets (see `lsh_signatures_arrow`), so it shares `ann_lsh`'s
    oracle; the verify stage is unchanged JVM-side expression code.
    Width is scale-aware by default, exactly like `ann_lsh`."""
    e = _vecs(spread(embeddings))
    buckets = tracked_persist(lsh_signatures_arrow(spread(embeddings), bits))
    return _lsh_candidates_verified(e, buckets, threshold)


def ann_ivf(embeddings: DataFrame, k: int = TOP_K,
            n_queries: int = N_QUERIES, n_cells: int = IVF_K,
            nprobe: int = NPROBE,
            centroids: DataFrame | None = None) -> DataFrame:
    """IVF-Flat ANN: coarse-quantize the corpus into `n_cells` cells,
    probe the `nprobe` nearest cells per query, exact-cosine re-rank
    within the probed cells only.

    Centroids here are SEEDED (the first `n_cells` corpus vectors) so
    the whole operator — assignment included — is deterministic and
    oracle-checkable; at scale the centroids come from an offline
    k-means job and this operator is unchanged (they're just a small
    broadcast relation either way).

    Scale shape:
    - assignment = broadcast(centroids) × ONE corpus scan; the
      per-vector argmax runs as `max_by` with map-side partial
      aggregation, so the shuffle carries one row per vector, not
      n_cells per vector;
    - probing touches ~nprobe/n_cells of the corpus per query (the
      IVF selectivity claim), and the probe list is a tiny broadcast
      (n_queries × nprobe rows);
    - no pairwise candidate join exists anywhere — candidate count is
      bounded by cell occupancy, not n².
    Tie-breaks (equal cosine) go to the lower cell / neighbor id,
    mirrored exactly in the oracle SQL."""
    e = _vecs(embeddings)
    if centroids is None:
        cents = e.where(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("cv"),
            F.col("v_norm").alias("c_norm"))
    else:
        # learned centroids: any (cell, cv) relation — e.g. the
        # kmeans_centroids output re-assembled — is a drop-in; the
        # probe/assign/re-rank plan is unchanged (it's just a small
        # broadcast relation either way)
        cents = centroids.select(
            "cell", "cv", F.sqrt(dot(F.col("cv"), F.col("cv"))).alias("c_norm"))
    cos_c = dot(F.col("v"), F.col("cv")) / (F.col("v_norm") * F.col("c_norm"))
    assigned = (e.join(F.broadcast(cents))
                 .select("vec_id", "v", "v_norm", "cell", cos_c.alias("cos_c"))
                 .groupBy("vec_id")
                 .agg(F.expr("max_by(cell, struct(cos_c, -cell))").alias("cell"),
                      F.first("v").alias("v"),
                      F.first("v_norm").alias("v_norm")))
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"))
    cos_qc = dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm"))
    from pyspark.sql import Window
    wp = Window.partitionBy("query_id").orderBy(F.desc("cos_qc"), F.asc("cell"))
    probes = (q.join(F.broadcast(cents))
               .select("query_id", "qv", "q_norm", "cell", cos_qc.alias("cos_qc"))
               .withColumn("prn", F.row_number().over(wp))
               .where(F.col("prn") <= nprobe)
               .select("query_id", "qv", "q_norm", "cell"))
    cand = (assigned.join(F.broadcast(probes), "cell")
                    .where(F.col("vec_id") != F.col("query_id")))
    cos = dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm"))
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (cand.select("query_id", F.col("vec_id").alias("neighbor_id"),
                        cos.alias("cos_raw"))
                .withColumn("rnk", F.row_number().over(wr))
                .where(F.col("rnk") <= k)
                .select("query_id", "neighbor_id",
                        F.round(F.col("cos_raw"), 6).alias("cos_sim"), "rnk"))


def ann_topk_fast(embeddings: DataFrame, k: int = TOP_K,
                  n_queries: int = N_QUERIES) -> DataFrame:
    """Arrow-vectorized brute-force top-k — BIT-IDENTICAL to
    `ann_topk` and value-oracled since r7.

    Queries (tiny) are collected once and closed over — the broadcast
    pattern; the corpus streams through mapInPandas. The kernel is
    DIM-SEQUENTIAL accumulation (`S += V[:,j]·Q[:,j]` for ascending
    j): vectorized ACROSS rows but left-to-right ACROSS dims, so
    every pair's float64 op sequence — ((0+p₀)+p₁)+… — is exactly
    the expression fold's and DuckDB's list_dot_product. That's ~2-4×
    slower than one BLAS matmul (whose SIMD/pairwise summation
    reorders the adds and drifts last-ulp) but still vectorized, and
    it buys exact oracle parity — the same trade the minhash/lsh fast
    paths make with integer hashing. Norms use the same sequential
    kernel; multiplication/division operand order mirrors the
    expression (commutative ops are bit-exact either way)."""
    import numpy as np

    def _seq_dot(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
        S = np.zeros((A.shape[0], B.shape[0]))
        for j in range(A.shape[1]):
            S += A[:, j][:, None] * B[:, j][None, :]
        return S

    def _seq_norm(A: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(A.shape[0])
        for j in range(A.shape[1]):
            acc += A[:, j] * A[:, j]
        return np.sqrt(acc)

    q_rows = (embeddings.where(F.col("vec_id") < n_queries)
              .select("vec_id", "embedding").collect())
    qids = [int(r.vec_id) for r in q_rows]
    Q = np.array([list(r.embedding) for r in q_rows], dtype=np.float64)
    qn = _seq_norm(Q)

    def score(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = _seq_norm(V)
            S = _seq_dot(V, Q) / (qn[None, :] * vn[:, None])
            n, m = S.shape
            yield pd.DataFrame({
                "query_id": np.tile(np.array(qids, dtype=np.int64), n),
                "neighbor_id": np.repeat(pdf["vec_id"].to_numpy(dtype=np.int64), m),
                "cos_raw": S.ravel(),
            })

    scored = (embeddings.select("vec_id", "embedding")
              .mapInPandas(score, "query_id bigint, neighbor_id bigint, cos_raw double")
              .where(F.col("neighbor_id") != F.col("query_id")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .where(F.col("rnk") <= k)
                  .select("query_id", "neighbor_id",
                          F.round(F.col("cos_raw"), 6).alias("cos_sim"), "rnk"))


def dedup_embedding_cosine_expr(embeddings: DataFrame,
                                threshold: float = COS_THRESHOLD,
                                max_id: int = BRUTE_MAX_ID) -> DataFrame:
    """Brute-force near-dup pairs via the pure expression fold — the
    reference implementation the Arrow kernel below must reproduce
    bit-for-bit (pinned by pytest); kept for that gate, not the
    registry path."""
    e = _vecs(embeddings).where(F.col("vec_id") < max_id)
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.v_norm") * F.col("b.v_norm"))
    return (pairs.select(F.col("a.vec_id").alias("vec_a"),
                         F.col("b.vec_id").alias("vec_b"),
                         cos.alias("cos_raw"))
                 .where(F.col("cos_raw") >= threshold)
                 .select("vec_a", "vec_b", F.round(F.col("cos_raw"), 6).alias("cos_sim")))


def dedup_embedding_cosine(embeddings: DataFrame,
                           threshold: float = COS_THRESHOLD,
                           max_id: int = BRUTE_MAX_ID) -> DataFrame:
    """Brute-force near-dup pairs on a bounded slice (ground-truth
    baseline for the blocked/LSH paths; quadratic by construction —
    which is exactly why the slice bound exists).

    Arrow fast path since r7: the slice is BOUNDED (≤ max_id rows —
    1500 × 64 dims × 8 B ≈ 768 KB of float64 at the default), so it
    collects once and closes
    over the mapInPandas scorer (the ann_topk_fast broadcast
    pattern); each Arrow batch of left-side rows scores against the
    whole slice with the DIM-SEQUENTIAL kernel — vectorized across
    pairs, left-to-right across dims — so every pair's float64 op
    sequence (dot fold, per-vector norms, a.norm*b.norm, divide,
    ≥ threshold) is bit-identical to the expression join in
    `dedup_embedding_cosine_expr` (equality pytest) and to the DuckDB
    oracle. The threshold filter runs inside the kernel on identical
    doubles, so only surviving pairs ride the Arrow return path
    (~1/50 of the 1.1M candidate pairs at the default τ)."""
    import numpy as np

    rows = (embeddings.where(F.col("vec_id") < max_id)
            .select("vec_id", "embedding").collect())
    ids = np.array([int(r.vec_id) for r in rows], dtype=np.int64)
    M = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    acc = np.zeros(M.shape[0])
    for j in range(M.shape[1]):
        acc += M[:, j] * M[:, j]
    norms = np.sqrt(acc)

    def score(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            A = np.array(list(pdf["embedding"]), dtype=np.float64)
            aid = pdf["vec_id"].to_numpy(dtype=np.int64)
            an = np.zeros(A.shape[0])
            S = np.zeros((A.shape[0], M.shape[0]))
            for j in range(A.shape[1]):
                an += A[:, j] * A[:, j]
                S += A[:, j][:, None] * M[:, j][None, :]
            an = np.sqrt(an)
            C = S / (an[:, None] * norms[None, :])
            keep = (aid[:, None] < ids[None, :]) & (C >= threshold)
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame({
                "vec_a": aid[ai],
                "vec_b": ids[bi],
                "cos_raw": C[ai, bi],
            })

    scored = (embeddings.where(F.col("vec_id") < max_id)
              .select("vec_id", "embedding")
              .mapInPandas(score, "vec_a bigint, vec_b bigint, cos_raw double"))
    return scored.select("vec_a", "vec_b",
                         F.round(F.col("cos_raw"), 6).alias("cos_sim"))


RECALL_BAND_EDGES = (0.95, 0.80, 0.60)  # cos bands for recall accounting


def ann_lsh_recall(embeddings: DataFrame,
                   threshold: float = COS_THRESHOLD,
                   max_id: int = BRUTE_MAX_ID) -> DataFrame:
    """MEASURED recall of the banded sign-LSH candidate generator
    against the exact cosine baseline, per cosine band — the recall
    curve every production ANN deployment monitors, built in as an
    oracle-checked query instead of a docstring claim. Sign-LSH
    recall falls with cosine (collision p = 1 - θ/π per bit), so
    the bands make the honest profile visible: near-1.0 at cos≥0.95,
    degrading toward the low threshold where `ann_topk` is the right
    tool.

    Runs on the same bounded slice as the exact baseline (the
    quadratic side is the BASELINE's cost, not LSH's); counts are
    integers and recall one rounded division, so the whole metric is
    value-exact against the oracle."""
    sl = embeddings.where(F.col("vec_id") < max_id)
    exact = dedup_embedding_cosine(embeddings, threshold, max_id)
    # width pinned to the floor so the curve measures the BASE design
    # point (the slice is ≤BRUTE_MAX_ID rows, under LSH_BASE_N anyway)
    lsh = ann_lsh(sl, threshold, bits=BITS_PER_TABLE).select(
        "vec_a", "vec_b", F.lit(1).alias("found"))
    hi, mid, lo = RECALL_BAND_EDGES
    band = (F.when(F.col("cos_sim") >= hi, "band_095_100")
             .when(F.col("cos_sim") >= mid, "band_080_095")
             .when(F.col("cos_sim") >= lo, "band_060_080")
             .otherwise("band_thr_060"))
    j = exact.join(lsh, ["vec_a", "vec_b"], "left")
    agg = (j.groupBy(band.alias("cos_band"))
            .agg(F.count(F.lit(1)).alias("n_true"),
                 F.sum(F.coalesce(F.col("found"), F.lit(0))).alias("n_found")))
    return agg.select(
        "cos_band", "n_true", "n_found",
        F.round(F.col("n_found").cast("double") / F.col("n_true"), 6)
         .alias("recall"))


def ann_recall_compare(embeddings: DataFrame,
                       threshold: float = COS_THRESHOLD,
                       max_id: int = BRUTE_MAX_ID,
                       n_cells: int = IVF_K) -> DataFrame:
    """Candidate-generator recall COMPARISON per cosine band: banded
    sign-LSH next to IVF same-cell blocking, both against the exact
    cosine baseline on the same slice — `ann_lsh_recall` extended to
    answer "which index for which threshold" with one measured,
    oracle-checked relation instead of two separate claims. Sign-LSH
    recall decays smoothly with cosine; IVF cell-blocking is
    all-or-nothing per pair (same coarse cell or not), so its recall
    profile is flatter but bounded by cell granularity — seeing both
    per band is the index-selection table a production ANN deployment
    keeps.

    IVF `found` means the pair lands in the SAME nearest-centroid
    cell (nprobe=1 blocking — the pair-mining analog of the IVF
    probe; assignment reuses `ann_ivf`'s broadcast-centroid argmax
    with identical tie-breaks). The assignment relation is ≤max_id
    rows and broadcasts into the ground-truth pairs, so the only
    quadratic work remains the baseline's own. Counts are integers
    and recall one rounded division — value-exact."""
    exact = dedup_embedding_cosine(embeddings, threshold, max_id)
    sl = embeddings.where(F.col("vec_id") < max_id)
    lsh = ann_lsh(sl, threshold, bits=BITS_PER_TABLE).select(
        "vec_a", "vec_b", F.lit(1).alias("lsh_found"))
    # the widened design point: what `lsh_bits_for` switches to as the
    # corpus grows — its recall cost measured on the same slice, so
    # the width lever's price is a checked relation, not a claim
    lsh_w = ann_lsh(sl, threshold, bits=WIDE_BITS).select(
        "vec_a", "vec_b", F.lit(1).alias("lshw_found"))
    e = _vecs(sl)
    cn = (e.where(F.col("vec_id") < n_cells)
           .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"),
                   F.col("v_norm").alias("c_norm")))
    cos_c = dot(F.col("v"), F.col("cv")) / (F.col("v_norm") * F.col("c_norm"))
    assigned = (e.join(F.broadcast(cn))
                 .select("vec_id", F.col("cell"), cos_c.alias("cos_c"))
                 .groupBy("vec_id")
                 .agg(F.expr("max_by(cell, struct(cos_c, -cell))").alias("cell")))
    j = (exact
         .join(lsh, ["vec_a", "vec_b"], "left")
         .join(lsh_w, ["vec_a", "vec_b"], "left")
         .join(F.broadcast(assigned.select(F.col("vec_id").alias("vec_a"),
                                           F.col("cell").alias("cell_a"))),
               "vec_a")
         .join(F.broadcast(assigned.select(F.col("vec_id").alias("vec_b"),
                                           F.col("cell").alias("cell_b"))),
               "vec_b"))
    hi, mid, lo = RECALL_BAND_EDGES
    band = (F.when(F.col("cos_sim") >= hi, "band_095_100")
             .when(F.col("cos_sim") >= mid, "band_080_095")
             .when(F.col("cos_sim") >= lo, "band_060_080")
             .otherwise("band_thr_060"))
    per = (j.groupBy(band.alias("cos_band"))
            .agg(F.count(F.lit(1)).alias("n_true"),
                 F.sum(F.coalesce("lsh_found", F.lit(0))).alias("lsh_f"),
                 F.sum(F.coalesce("lshw_found", F.lit(0))).alias("lshw_f"),
                 F.sum((F.col("cell_a") == F.col("cell_b")).cast("long"))
                  .alias("ivf_f")))
    return (per.select(
                "cos_band", "n_true",
                F.expr(f"stack(3, 'lsh', lsh_f, 'lsh_w{WIDE_BITS}', lshw_f,"
                       " 'ivf_cell', ivf_f) as (generator, n_found)"))
            .select("generator", "cos_band", "n_true", "n_found",
                    F.round(F.col("n_found").cast("double") / F.col("n_true"),
                            6).alias("recall")))


KM_K = 8       # learned-centroid count (per-cell relation feeds ann_ivf)
KM_ITERS = 2   # Lloyd iterations (driver loop, each fully declarative)


def kmeans_cells(embeddings: DataFrame, k: int = KM_K,
                 iters: int = KM_ITERS) -> DataFrame:
    """(cell, cv) spherical k-means centroid relation (cosine
    assignment, seeded with the first k vectors) — the offline job
    whose output table replaces `ann_ivf`'s seeded centroid relation
    at scale (`ann_ivf_learned` is exactly that wiring).

    Iterative, but each Lloyd iteration is a fully DECLARATIVE
    broadcast-assign + aggregate pass driven by a plain Python loop —
    the idiomatic Spark shape for bounded-iteration ML (the loop count
    is a constant; no RDD lineage explosion at 2 iterations).
    Engine-determinism: assignment ties break to the lower cell
    (`max_by` on struct(cos, -cell)), and the centroid update is a
    per-dimension FIXED-POINT mean (sum of round(v*1e6) ints / n), so
    partial-aggregation order cannot change the result and the DuckDB
    oracle replays the identical iterations as chained CTEs.

    Centroid-update shape (r14 opt, guide §1.2 'per-task work'): the
    update is posexplode(v) → ONE narrow groupBy(cell, dim) sum →
    array_sort(collect_list(struct(dim, val))) reassembly, instead of
    DIM separate sum(round(v[i]·1e6)) aggregate expressions. The wide
    form made Catalyst plan + codegen O(DIM) expression trees PER
    ITERATION (measured 3.7 s → 1.27 s for the 2-iteration job at
    sf0.1, bit-identical output); the narrow form's per-element work
    is one hash-agg probe — same O(n·DIM) element pass with map-side
    partials either way, and the exchange still carries only
    k·DIM summary rows at any corpus size. dim is unique per cell so
    the struct sort is total; the division (s/1e6)/n reproduces the
    wide form's float64 token sequence exactly."""
    scale = 1_000_000
    e = _vecs(embeddings)
    cents = e.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
    for _ in range(iters):
        cn = cents.select("cell", "cv",
                          F.sqrt(dot(F.col("cv"), F.col("cv"))).alias("c_norm"))
        cos_c = dot(F.col("v"), F.col("cv")) / (F.col("v_norm") * F.col("c_norm"))
        assigned = (e.join(F.broadcast(cn))
                     .select("vec_id", "v", "v_norm", "cell", cos_c.alias("cos_c"))
                     .groupBy("vec_id")
                     .agg(F.expr("max_by(cell, struct(cos_c, -cell))").alias("cell"),
                          F.first("v").alias("v")))
        upd = (assigned.select("cell", F.posexplode("v").alias("dim", "x"))
               .groupBy("cell", "dim")
               .agg(F.sum(F.round(F.col("x") * scale).cast("bigint")).alias("s"),
                    F.count(F.lit(1)).alias("n")))
        val = (F.col("s") / F.lit(float(scale))) / F.col("n")
        cents = (upd.select("cell",
                            F.struct(F.col("dim"), val.alias("val")).alias("p"))
                 .groupBy("cell")
                 .agg(F.expr("transform(array_sort(collect_list(p)), "
                             "q -> q.val)").alias("cv")))
    return cents


def kmeans_centroids(embeddings: DataFrame, k: int = KM_K,
                     iters: int = KM_ITERS) -> DataFrame:
    """`kmeans_cells` exploded to (cell, dim, centroid_val) rows:
    scalar columns sort/hash cleanly in the compare harness, unlike
    array cells."""
    return (kmeans_cells(embeddings, k, iters)
            .select("cell", F.posexplode("cv").alias("dim", "centroid_val"))
            .orderBy("cell", "dim"))


def ann_ivf_learned(embeddings: DataFrame, k: int = TOP_K,
                    n_queries: int = N_QUERIES, n_cells: int = KM_K,
                    nprobe: int = NPROBE) -> DataFrame:
    """IVF-Flat over LEARNED centroids: the `kmeans_cells` Lloyd job
    feeds `ann_ivf`'s centroid hook — the full production IVF
    pipeline (train coarse quantizer → build inverted lists → probe)
    as one declarative DAG. The centroid relation stays k rows, so it
    broadcasts exactly like the seeded one; assignment, probing and
    re-rank plans are unchanged. Oracle: the k-means CTE chain
    composed with the IVF probe SQL (oracles_llm._ivf_tail, via
    oracles_llm._ann_ivf_learned_oracle)."""
    return ann_ivf(embeddings, k=k, n_queries=n_queries, n_cells=n_cells,
                   nprobe=nprobe, centroids=kmeans_cells(embeddings, k=n_cells))


def _ivf_assigned(embeddings: DataFrame,
                  n_cells: int | None = None) -> DataFrame:
    """(vec_id, v, v_norm, cell): every vector with its seeded-IVF
    cell — broadcast(centroids) × one corpus scan, map-side `max_by`
    argmax, one shuffled row per vector (shared by
    `dedup_embedding_blocked` and `knn_graph`; assignment ordering is
    identical to `ann_ivf`'s arn=1)."""
    e = _vecs(embeddings)
    if n_cells is None:
        seed = (e.crossJoin(F.broadcast(ivf_cell_params(embeddings)))
                 .where(F.col("vec_id") < F.col("_cells")))
    else:
        seed = e.where(F.col("vec_id") < n_cells)
    cents = seed.select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"),
        F.col("v_norm").alias("c_norm"))
    cos_c = dot(F.col("v"), F.col("cv")) / (F.col("v_norm") * F.col("c_norm"))
    return (e.join(F.broadcast(cents))
             .select("vec_id", "v", "v_norm", "cell", cos_c.alias("cos_c"))
             .groupBy("vec_id")
             .agg(F.expr("max_by(cell, struct(cos_c, -cell))").alias("cell"),
                  F.first("v").alias("v"),
                  F.first("v_norm").alias("v_norm")))


def _ivf_assigned_auto(embeddings: DataFrame) -> DataFrame:
    """(vec_id, v, v_norm, cell): the SCALE-AWARE default coarse
    assignment — bit-exactly the flat argmax below `HIER_CELLS_MIN`
    cells, two-level/IMI at or above it. One plan shape serves both
    regimes because two-level assignment with a SINGLE level-1 anchor
    degenerates to flat: every cell maps to the one anchor group,
    every vector scans that group's cells — i.e. all of them — under
    the identical (cos DESC, lower cell) argmax, so the sub-threshold
    result is the flat argmax to the bit (pytest-pinned both ways).
    The anchor count is data, not plan structure: a 1-row broadcast
    `_nl1 = CASE cells < HIER_CELLS_MIN THEN 1 ELSE ⌊√cells⌋`, the
    same engine-side lever as `lsh_bits_for` (no driver collect; the
    oracle replays the CASE integer-exactly). Shared default under
    `knn_graph`, `knn_diversity_sample`, `dedup_embedding_blocked`
    and `semantic_canonicalize` — the r10 fix for the r9-measured
    flat-assignment super-linearity (see HIER_CELLS_MIN)."""
    return _ivf_assigned_hier(embeddings, scale_aware=True)


def _ivf_assigned_hier(embeddings: DataFrame,
                       scale_aware: bool = False) -> DataFrame:
    """(vec_id, v, v_norm, cell) via TWO-LEVEL coarse assignment —
    the fix for the flat quantizer's measured super-linearity: with
    cells = n/IVF_DIV, flat assignment scans every centroid per
    vector, O(n·cells) = O(n²/IVF_DIV) total — the r9 100× bench
    point read 1.698× per replica (475 s vs the 2.8 s base), a
    quadratic bomb hidden behind a broadcast. Here the first
    ⌈√cells⌉ seeds double as LEVEL-1 anchors: each CELL maps to its
    nearest anchor once (cells × √cells, bounded), each VECTOR scans
    only the anchors (n·√cells) and then only its anchor-group's
    cells (n·~√cells expected) — O(n·√cells) total, the standard
    two-level/IMI shape every production IVF uses past a few
    thousand cells.

    The assignment is an APPROXIMATION of the flat argmax (a vector
    whose true cell sits in another anchor group picks its group's
    best instead); `ivf_hier_agreement` measures exactly how often,
    oracle-checked. Measured at sf0.01 (500 vectors, 16 cells, 4
    anchors): cell agreement 50.6% — random synthetic embeddings are
    the adversarial case for anchor pruning (no cluster structure) —
    yet the END metric is unchanged: k-NN edge recall vs exact top-5
    reads 0.197 (hier) vs 0.198 (flat), because any similarly-sized
    blocking captures the same share of true neighbors. Tie-breaks
    mirror the flat path (cos DESC, lower id) at both levels, so the
    oracle replays every argmax.

    With ``scale_aware=True`` (via `_ivf_assigned_auto`) the anchor
    count collapses to 1 below `HIER_CELLS_MIN` cells, which makes
    this exactly the flat argmax — see `_ivf_assigned_auto`."""
    e = _vecs(embeddings)
    params = ivf_cell_params(embeddings)
    seeds = (e.crossJoin(F.broadcast(params))
              .where(F.col("vec_id") < F.col("_cells")))
    nl1 = F.expr("greatest(1, cast(floor(sqrt(_cells)) as int))")
    if scale_aware:
        nl1 = (F.when(F.col("_cells") < HIER_CELLS_MIN, F.lit(1))
                .otherwise(nl1))
    cents = seeds.select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"),
        F.col("v_norm").alias("c_norm"),
        nl1.cast("int").alias("_nl1"))
    l1 = cents.where(F.col("cell") < F.col("_nl1")).select(
        F.col("cell").alias("g"), F.col("cv").alias("gv"),
        F.col("c_norm").alias("g_norm"))
    cosg = dot(F.col("cv"), F.col("gv")) / (F.col("c_norm") * F.col("g_norm"))
    cellmap = (cents.join(F.broadcast(l1))
               .select("cell", "cv", "c_norm", "g", cosg.alias("cg"))
               .groupBy("cell")
               .agg(F.expr("max_by(g, struct(cg, -g))").alias("g"),
                    F.first("cv").alias("cv"),
                    F.first("c_norm").alias("c_norm")))
    cosv = dot(F.col("v"), F.col("gv")) / (F.col("v_norm") * F.col("g_norm"))
    vg = (e.join(F.broadcast(l1))
           .select("vec_id", "v", "v_norm", "g", cosv.alias("cg"))
           .groupBy("vec_id")
           .agg(F.expr("max_by(g, struct(cg, -g))").alias("g"),
                F.first("v").alias("v"), F.first("v_norm").alias("v_norm")))
    cos_c = dot(F.col("v"), F.col("cv")) / (F.col("v_norm") * F.col("c_norm"))
    return (vg.join(F.broadcast(cellmap), "g")
              .select("vec_id", "v", "v_norm", "cell", cos_c.alias("cos_c"))
              .groupBy("vec_id")
              .agg(F.expr("max_by(cell, struct(cos_c, -cell))").alias("cell"),
                   F.first("v").alias("v"),
                   F.first("v_norm").alias("v_norm")))


KNN_K = 5

# Per-block float64 element budget for the pair-stage Arrow kernels'
# score matrices (~32 MB at 4M elements). The kernels score probe
# rows against the cell's members in blocks of
# max(1, BLOCK_ELEMS // n_members) rows, so a pathologically hot cell
# (unbounded occupancy under adversarial assignment skew) costs
# O(block·occ) score memory instead of O(occ²) — the group's own
# O(occ·DIM) vector payload is applyInPandas's floor either way.
# Blocking is over ROWS only: each element's dim-sequential float64
# accumulation is unchanged, so the expression-twin bit-identity pins
# hold at any block size.
KNN_ARROW_BLOCK_ELEMS = 4_000_000


def _knn_from_assigned(assigned: DataFrame, k: int) -> DataFrame:
    """Per-vector top-k cosine neighbors WITHIN the assigned cell —
    the shared graph construction under `knn_graph` (flat assignment)
    and `knn_graph_hier` (two-level assignment)."""
    from pyspark.sql import Window

    a = assigned.select("cell", "vec_id",
                        F.col("v").alias("va"), F.col("v_norm").alias("na"))
    b = assigned.select("cell", F.col("vec_id").alias("nbr_id"),
                        F.col("v").alias("vb"), F.col("v_norm").alias("nb"))
    pairs = a.join(b, "cell").where(F.col("vec_id") != F.col("nbr_id"))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_raw"), F.asc("nbr_id"))
    return (pairs.select("vec_id", "nbr_id", "cell", cos.alias("cos_raw"))
                 .withColumn("rnk", F.row_number().over(w))
                 .where(F.col("rnk") <= k)
                 .select("vec_id", "nbr_id", F.col("rnk").cast("int").alias("rnk"),
                         F.round(F.col("cos_raw"), 6).alias("cos_sim"),
                         F.col("cell").cast("long").alias("cell")))


def _self_pair_topk_blocked(pdf, kk: int, block_elems: int):
    """Numeric core of `_knn_from_assigned_arrow`'s per-cell kernel,
    module-level so tests can pin BLOCK-SIZE INVARIANCE directly
    (same rows and bit-identical cos values at block_elems=1 vs one
    block): per member row, the top-`kk` cosine neighbors within the
    cell, scored in probe-row blocks of ≤ block_elems float64
    elements. Row blocking changes only how many rows share one
    allocation — each element's dim-sequential accumulation, the
    single norm division, and the per-row stable argsort are
    untouched, which is why any block size reproduces the expression
    fold bit-for-bit."""
    import numpy as np
    import pandas as pd

    n = len(pdf)
    if n <= 1:  # singleton cells emit no rows (degree-0 contract)
        return pd.DataFrame({
            "vec_id": pd.Series([], dtype="int64"),
            "nbr_id": pd.Series([], dtype="int64"),
            "rnk": pd.Series([], dtype="int32"),
            "cos_raw": pd.Series([], dtype="float64"),
            "cell": pd.Series([], dtype="int64")})
    V = np.array(list(pdf["v"]), dtype=np.float64)
    vn = pdf["v_norm"].to_numpy(dtype=np.float64)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    cell = np.int64(pdf["cell"].iloc[0])
    # id-sort once: members and probes are the same rows here, and
    # id-sorted members make the stable argsort break score ties
    # by lower nbr_id with no per-row loop
    order = np.argsort(ids, kind="stable")
    V, vn, ids = V[order], vn[order], ids[order]
    take = min(kk, n - 1)  # one -inf per row → top take all finite
    bs = max(1, block_elems // n)
    out = []
    for s0 in range(0, n, bs):
        s1 = min(n, s0 + bs)
        S = np.zeros((s1 - s0, n))
        for j in range(V.shape[1]):  # dim-sequential: the fold's order
            S += V[s0:s1, j][:, None] * V[:, j][None, :]
        S = S / (vn[s0:s1][:, None] * vn[None, :])
        assert np.isfinite(S).all(), (
            "non-finite cosine (zero-norm or NaN embedding): the "
            "argsort tie-break would diverge from Spark DESC ordering")
        Sx = S.copy()
        Sx[np.arange(s1 - s0), np.arange(s0, s1)] = -np.inf  # self
        topk = np.argsort(-Sx, axis=1, kind="stable")[:, :take]
        rows = np.repeat(np.arange(s1 - s0), take)
        cols = topk.ravel()
        out.append(pd.DataFrame({
            "vec_id": np.repeat(ids[s0:s1], take),
            "nbr_id": ids[cols],
            "rnk": np.tile(np.arange(1, take + 1, dtype=np.int32),
                           s1 - s0),
            "cos_raw": S[rows, cols],
            "cell": np.full((s1 - s0) * take, cell, dtype=np.int64)}))
    return pd.concat(out, ignore_index=True)


def _knn_from_assigned_arrow(assigned: DataFrame, k: int) -> DataFrame:
    """BIT-IDENTICAL Arrow twin of `_knn_from_assigned` — the scale
    path the r11 curve demanded (the knn_graph_nprobe_fast finding
    applied to the single-assignment construction): the two-level
    coarse assignment skews cell occupancy (measured max 1054 vs avg
    128 at 30×), and the expression pair stage pays occ² codegen'd
    64-dim folds PLUS occ² window rows in ONE partition for the hot
    cell — the r11 100× curve's worst row (knn_graph 0.322/replica,
    RISING 0.286→0.295→0.322 across the curve). Here each cell is one
    numpy matrix inside a per-cell `applyInPandas` kernel and emits
    only k rows per member, so the hot cell costs one vectorized
    seq-dot instead of a single-task quadratic window.

    Bit-identity discipline (shared with `knn_graph_nprobe_fast`, so
    the expression path's value oracle transfers):
    - dim-SEQUENTIAL numpy accumulation reproduces the expression
      fold's float64 op sequence exactly (S += A[:,j]·B[:,j] for
      j = 0..DIM-1 is the same adds in the same order per element);
    - one division by the na·nb product, exactly like the pair site;
    - members sorted by vec_id, then a STABLE argsort of -S breaks
      cosine ties by lower nbr_id — row_number's (cos DESC, nbr ASC);
    - cos_sim rounded Spark-side with the same F.round(…, 6).
    Because every vector's candidates live entirely inside its one
    cell group, the in-kernel top-k IS the final ranking — no merge
    window, and the groupBy(cell) exchange is the plan's ONLY
    corpus-sized shuffle (the expression path shuffles the pair
    relation, occupancy× larger). Equality is pytest-pinned row-for-
    row including cos values (test_knn_graph_arrow_is_bit_identical).

    Precondition (shared with the nprobe kernel): finite, non-zero
    vector norms — numpy argsort places NaN last while Spark DESC
    treats NaN as greatest, so a degenerate corpus must fail loudly
    rather than silently diverge from the shared oracle; asserted
    in-kernel.

    Hot-cell memory bound (r13, per the r12 verdict's watch): the
    score matrix is computed in PROBE-ROW BLOCKS of
    ≤ `KNN_ARROW_BLOCK_ELEMS` float64 elements instead of one dense
    occ×occ allocation — each row's top-k needs only its own score
    row, and per-element the blocked dim-sequential accumulation
    performs the identical float64 adds in the identical order, so
    bit-identity survives (pytest-pinned). Peak kernel memory is now
    O(occ·DIM) for the group's vectors (which `applyInPandas`
    materializes regardless) + O(block·occ) for scores (~32 MB),
    instead of O(occ²) — a pathological 30k-member cell costs
    ~15 MB + 32 MB, not 7.2 GB."""
    import numpy as np
    import pandas as pd

    import pandas as pd

    kk = int(k)

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return _self_pair_topk_blocked(pdf, kk, KNN_ARROW_BLOCK_ELEMS)

    part = (assigned.groupBy("cell")
            .applyInPandas(kernel, "vec_id bigint, nbr_id bigint, "
                                   "rnk int, cos_raw double, cell bigint"))
    return part.select("vec_id", "nbr_id", "rnk",
                       F.round(F.col("cos_raw"), 6).alias("cos_sim"),
                       "cell")


def knn_graph_hier(embeddings: DataFrame, k: int = KNN_K,
                   impl: str = "arrow") -> DataFrame:
    """`knn_graph` over the TWO-LEVEL assignment — the 100-TB-shaped
    construction: total work O(n·√cells) for assignment plus the same
    within-cell pair stage, instead of flat assignment's O(n·cells).
    Same output contract; the blocking differs only where the
    two-level argmax picks a different cell (`ivf_hier_agreement`
    measures that rate, oracle-checked). Pair stage defaults to the
    bit-identical Arrow kernel (see `_knn_from_assigned_arrow`);
    ``impl="expr"`` keeps the expression twin for the equality pin."""
    assigned = _ivf_assigned_hier(embeddings)
    if impl == "expr":
        return _knn_from_assigned(assigned, k)
    return _knn_from_assigned_arrow(assigned, k)


def ivf_hier_agreement(embeddings: DataFrame) -> DataFrame:
    """How often the two-level assignment lands in the flat argmax's
    cell — the honesty metric for `knn_graph_hier`'s speedup: one
    row, integer counts, exact ppm floor division."""
    flat = _ivf_assigned(embeddings).select("vec_id",
                                            F.col("cell").alias("cell_flat"))
    hier = _ivf_assigned_hier(embeddings).select(
        "vec_id", F.col("cell").alias("cell_hier"))
    j = flat.join(hier, "vec_id")
    return (j.agg(F.count(F.lit(1)).alias("n_vectors"),
                  F.sum(F.when(F.col("cell_flat") == F.col("cell_hier"), 1)
                         .otherwise(0)).alias("n_same"))
             .select(F.col("n_vectors").cast("int").alias("n_vectors"),
                     F.col("n_same").cast("int").alias("n_same"),
                     F.expr("(1000000 * n_same) div n_vectors")
                      .cast("bigint").alias("agreement_ppm")))


def knn_graph(embeddings: DataFrame, k: int = KNN_K,
              n_cells: int | None = None,
              impl: str = "arrow") -> DataFrame:
    """k-NN graph over the embedding corpus, cell-blocked: each
    vector's top-`k` cosine neighbors WITHIN its IVF cell — the
    construction step for graph-based curation (SemDeDup cluster
    audits, diversity sampling, label-propagation seeds) at the same
    sub-quadratic candidate bound as `dedup_embedding_blocked`
    (Σ|cell|²/corpus, never n²). Cross-cell edges are traded away by
    construction; `ann_recall_compare` measures that trade honestly.

    Scale shape: shared `_ivf_assigned` (broadcast centroids, one
    shuffled row per vector), self-join keyed ON the cell, per-vector
    row_number window (partitioned by vec_id — no global sort, no hot
    key beyond cell size, which the scale-aware cell count keeps
    ~constant).

    Degree ≤ k (singleton-cell vectors emit no rows); rank breaks
    cosine ties on nbr_id — same raw-double ordering trade as
    `ann_topk`, stated there.

    MEASURED SCALE LIMIT (r9, 100× bench): with cells = n/IVF_DIV the
    flat assignment is O(n·cells) = O(n²/IVF_DIV) — 1.698× per
    replica at 100× (475 s vs the 2.8 s base). r10 therefore made the
    DEFAULT assignment scale-aware (`_ivf_assigned_auto`): bit-exact
    flat below HIER_CELLS_MIN cells, two-level O(n·√cells) past it,
    the switch an engine-side 1-row broadcast the oracle replays
    (`ivf_hier_agreement` quantifies the assignment drift; edge
    recall measured unchanged, 0.197 vs 0.198). An explicit
    `n_cells` pins the flat argmax at that cell count (the bounded
    slice/debug path — the caller asserted the count is small).

    r12: the PAIR STAGE ships the bit-identical Arrow kernel
    (`_knn_from_assigned_arrow`) — the r11 100× curve measured the
    expression pair stage as the curve's worst row (0.322/replica,
    rising 0.286→0.295→0.322: two-level assignment skews cell
    occupancy ~8×, and the hot cell pays occ² codegen folds + occ²
    window rows in ONE partition), while the bit-identical kernel
    measured 0.09/replica on the sibling nprobe construction. The
    expression twin stays behind ``impl="expr"`` for the row-for-row
    equality pin; both share one value oracle."""
    assigned = (_ivf_assigned_auto(embeddings) if n_cells is None
                else _ivf_assigned(embeddings, n_cells))
    if impl == "expr":
        return _knn_from_assigned(assigned, k)
    return _knn_from_assigned_arrow(assigned, k)


def knn_triangle_stats(embeddings: DataFrame, k: int = KNN_K) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over
    the k-NN graph — the graph-density observability next to the
    components/pagerank/diversity consumers: a dense-cluster node
    (high clustering) sits in redundant content a curation pass can
    thin aggressively, while a bridge node (low clustering at equal
    degree) connects otherwise-distinct regions and is exactly what
    diversity sampling must keep. Emits (vec_id, degree, n_triangles,
    clustering_ppm = 2T·10⁶ div d(d−1), 0 below degree 2).

    Scale shape: the undirected edge set is k-degree-bounded by
    construction (≤ k·n edges after the distinct), so the wedge join
    (edges ⋈ edges on the shared middle vertex, a<b<c canonical
    orientation — each triangle counted exactly once) is O(n·k²)
    rows, and the closing edge check is one more equi-join — never a
    matrix product or an all-pairs stage. Corner counts are one
    map-side-combined groupBy after a row-local 3-corner explode.

    Determinism: pure integer set arithmetic; the ppm is an exact
    floor division of non-negative integers."""
    g = knn_graph(embeddings, k)
    # five downstream references (wedge x/y, closing edge, two degree
    # union sides) — persist or the whole graph build replays per use
    und = tracked_persist(
        g.select(F.least("vec_id", "nbr_id").alias("a"),
                 F.greatest("vec_id", "nbr_id").alias("b"))
         .distinct())
    w = (und.alias("x")
         .join(und.alias("y"), F.col("x.b") == F.col("y.a"))
         .select(F.col("x.a").alias("a"), F.col("x.b").alias("b"),
                 F.col("y.b").alias("c")))
    closing = und.select(F.col("a").alias("ca"), F.col("b").alias("cc"))
    tri = w.join(closing, (F.col("a") == F.col("ca"))
                 & (F.col("c") == F.col("cc"))).select("a", "b", "c")
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("vec_id"))
    tcnt = corners.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_triangles"))
    deg = (und.select(F.col("a").alias("vec_id"))
           .unionAll(und.select(F.col("b").alias("vec_id")))
           .groupBy("vec_id").agg(F.count(F.lit(1)).alias("degree")))
    return (deg.join(tcnt, "vec_id", "left")
            .select("vec_id",
                    F.col("degree").cast("int").alias("degree"),
                    F.coalesce("n_triangles", F.lit(0)).cast("int")
                     .alias("n_triangles"),
                    F.expr("CASE WHEN degree >= 2 THEN "
                           "(2 * coalesce(n_triangles, 0) * 1000000)"
                           " div (degree * (degree - 1)) ELSE 0 END")
                     .cast("bigint").alias("clustering_ppm")))


GS_STEPS = 6


def _graph_search_edges(embeddings: DataFrame, k: int = KNN_K) -> DataFrame:
    """Bidirected k-NN edge set with the neighbor's vector attached —
    the persisted navigation structure `ann_graph_search` walks (one
    build, reused by every round; at most 2k·n edges)."""
    g = knn_graph(embeddings, k).select("vec_id", "nbr_id")
    und = (g.unionAll(g.select(F.col("nbr_id").alias("vec_id"),
                               F.col("vec_id").alias("nbr_id")))
            .distinct())
    e = _vecs(embeddings).select(F.col("vec_id").alias("_nid"),
                                 F.col("v").alias("nv"),
                                 F.col("v_norm").alias("n_norm"))
    return tracked_persist(
        und.join(e, und["nbr_id"] == e["_nid"])
           .select(F.col("vec_id").alias("src"), "nbr_id", "nv", "n_norm"))


def ann_graph_search(embeddings: DataFrame, steps: int = GS_STEPS,
                     n_queries: int = N_QUERIES) -> DataFrame:
    """Greedy graph-walk ANN — the navigable-graph rung of the index
    ladder (the HNSW/DiskANN family's base mechanism, Malkov &
    Yashunin 2018, stripped to its deterministic core): from a fixed
    entry node, each round moves every query to the best-cosine
    vertex among the current node and its k-NN-graph neighbors
    (bidirected edges), for a fixed `steps` rounds — a hill-climb
    whose state is one (node, cos) row per query. Emits
    (query_id, found_id, cos_sim); `ann_graph_recall` scores it
    against the exact top-k.

    Scale shape: the navigation structure is the persisted bidirected
    k-NN edge set (≤2k·n rows, vector payload attached once); each
    round is ONE broadcast of the ≤n_queries current rows against the
    edge relation plus a bounded per-query argmax — rounds × linear
    scans, no pairwise stage, and the walk state never grows. The
    argmax window partitions by query_id over ≤(k+1)·n_queries rows.

    Determinism: fixed entry (vec 0; vec 1 for query 0), every argmax
    ordered (cos DESC, lower cand id), raw cosines compared (rounding
    only at emission) — the oracle replays each round as a chained
    CTE."""
    from pyspark.sql import Window

    ev = _vecs(embeddings)
    q = (ev.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")))
    entry = F.when(F.col("query_id") == 0, F.lit(1)).otherwise(F.lit(0))
    edges = _graph_search_edges(embeddings)
    ent = q.withColumn("node", entry)
    cur = (ev.join(F.broadcast(ent), ev["vec_id"] == ent["node"])
             .select("query_id", "qv", "q_norm", "node",
                     (dot(F.col("qv"), F.col("v"))
                      / (F.col("q_norm") * F.col("v_norm")))
                     .alias("cur_cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"),
                                               F.asc("cand_id"))
    for _ in range(steps):
        moved = (edges.join(F.broadcast(cur.select("query_id", "qv",
                                                   "q_norm", "node")),
                            edges["src"] == F.col("node"))
                 .where(F.col("nbr_id") != F.col("query_id"))
                 .select("query_id", "qv", "q_norm",
                         F.col("nbr_id").alias("cand_id"),
                         (dot(F.col("qv"), F.col("nv"))
                          / (F.col("q_norm") * F.col("n_norm")))
                         .alias("cos_raw")))
        stay = cur.select("query_id", "qv", "q_norm",
                          F.col("node").alias("cand_id"),
                          F.col("cur_cos").alias("cos_raw"))
        # localCheckpoint the ≤n_queries-row walk state each round:
        # `cur` is referenced twice per round (moved + stay), so an
        # uncut lineage doubles per round and Catalyst re-analyzes
        # the 2^steps tree — measured ~31 s of pure PLANNING overhead
        # between steps 4 and 6 at ANY data size (a persist caches
        # execution but not analysis; the checkpoint truncates the
        # logical plan to a leaf). One tiny eager job per round over
        # the persisted edge relation — rounds × linear, as designed.
        cur = (moved.unionByName(stay)
               .withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") == 1)
               .select("query_id", "qv", "q_norm",
                       F.col("cand_id").alias("node"),
                       F.col("cos_raw").alias("cur_cos"))
               .localCheckpoint(eager=True))
    return cur.select("query_id", F.col("node").alias("found_id"),
                      F.round("cur_cos", 6).alias("cos_sim"))


def ann_graph_recall(embeddings: DataFrame, steps: int = GS_STEPS,
                     n_queries: int = N_QUERIES) -> DataFrame:
    """Measured quality of the greedy graph walk vs the exact ranking
    — the honesty row every index rung carries: for each query, is
    the walk's endpoint the TRUE nearest neighbor (top-1) or at least
    in the exact top-k? One summary row of exact integer counts (the
    ppms are floor divisions both engines replay)."""
    found = ann_graph_search(embeddings, steps, n_queries)
    exact = ann_topk(embeddings).select(
        F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en"),
        "rnk")
    j = found.join(F.broadcast(exact), (F.col("query_id") == F.col("eq"))
                   & (F.col("found_id") == F.col("en")), "left")
    return j.agg(
        F.count(F.lit(1)).cast("int").alias("n_queries"),
        F.sum(F.when(F.col("rnk") == 1, 1).otherwise(0)).cast("int")
         .alias("n_top1"),
        F.sum(F.when(F.col("rnk").isNotNull(), 1).otherwise(0)).cast("int")
         .alias("n_topk"),
    ).select(
        "n_queries", "n_top1", "n_topk",
        F.expr("n_top1 * 1000000 div n_queries").cast("bigint")
         .alias("top1_ppm"),
        F.expr("n_topk * 1000000 div n_queries").cast("bigint")
         .alias("topk_ppm"))


GRAPH_NPROBE = 2
BEAM_B = 4


def _ivf_probed(embeddings: DataFrame,
                nprobe: int = GRAPH_NPROBE) -> DataFrame:
    """(vec_id, v, v_norm, cell, prn): every vector with its `nprobe`
    BEST coarse cells (prn = 1..nprobe, ordered cos DESC then lower
    cell) under the same scale-aware two-level scheme as
    `_ivf_assigned_auto` — the prn=1 row is that assignment to the
    bit (same candidate set, same (cos, -cell) order; pytest-pinned).
    Multi-probe is what graph CONSTRUCTION needs: a vector near a
    cell boundary owes its best edges to the neighboring cell, and
    single-cell blocking measurably severs them (the r10 greedy walk
    read topk 2/10 because the cell-blocked graph wasn't even
    connected — 36 of 500 nodes reachable from the entry).

    Scale shape: identical candidate relation as the auto assignment
    (n·√cells rows past HIER_CELLS_MIN, n·cells in the flat regime);
    the only change is the reducer — a per-vector top-nprobe
    row_number instead of a max_by, one exchange keyed by vec_id
    either way. A row-local alternative (group cells broadcast as one
    array per group, transform → array_sort → slice — zero exchange)
    was MEASURED SLOWER at 30× (28.5 s vs 24.3 s): higher-order
    functions evaluate interpreted, so 150k × 68 nested-HOF dot
    products cost more than shuffling the 10M-row candidate relation
    through the codegen'd window — the exchange is not this plan's
    bottleneck, the scoring arithmetic is, and codegen wins it."""
    return _ivf_probed_rel(embeddings, _vecs(embeddings), nprobe)


def _ivf_probed_rel(base: DataFrame, probes: DataFrame,
                    nprobe: int = GRAPH_NPROBE) -> DataFrame:
    """`_ivf_probed` generalized to rank the BASE corpus's cells for
    an arbitrary probe relation (vec_id, v, v_norm) — cells, anchors
    and the scale-aware switch all come from `base`; only the ranked
    rows come from `probes`. `_ivf_probed(e)` is exactly
    `_ivf_probed_rel(e, _vecs(e))` (the refactor is plan-identical —
    the bit-identity pins on prn=1 are unaffected). The insert rung
    probes the ARRIVING vectors against the frozen base's cells to
    seed their walks (see `_insert_seeds`)."""
    from pyspark.sql import Window

    e = probes
    params = ivf_cell_params(base)
    seeds = (_vecs(base).crossJoin(F.broadcast(params))
             .where(F.col("vec_id") < F.col("_cells")))
    nl1 = (F.when(F.col("_cells") < HIER_CELLS_MIN, F.lit(1))
            .otherwise(F.expr(
                "greatest(1, cast(floor(sqrt(_cells)) as int))")))
    cents = seeds.select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"),
        F.col("v_norm").alias("c_norm"),
        nl1.cast("int").alias("_nl1"))
    l1 = cents.where(F.col("cell") < F.col("_nl1")).select(
        F.col("cell").alias("g"), F.col("cv").alias("gv"),
        F.col("c_norm").alias("g_norm"))
    cosg = dot(F.col("cv"), F.col("gv")) / (F.col("c_norm") * F.col("g_norm"))
    cellmap = (cents.join(F.broadcast(l1))
               .select("cell", "cv", "c_norm", "g", cosg.alias("cg"))
               .groupBy("cell")
               .agg(F.expr("max_by(g, struct(cg, -g))").alias("g"),
                    F.first("cv").alias("cv"),
                    F.first("c_norm").alias("c_norm")))
    cosv = dot(F.col("v"), F.col("gv")) / (F.col("v_norm") * F.col("g_norm"))
    vg = (e.join(F.broadcast(l1))
           .select("vec_id", "v", "v_norm", "g", cosv.alias("cg"))
           .groupBy("vec_id")
           .agg(F.expr("max_by(g, struct(cg, -g))").alias("g"),
                F.first("v").alias("v"), F.first("v_norm").alias("v_norm")))
    cos_c = dot(F.col("v"), F.col("cv")) / (F.col("v_norm") * F.col("c_norm"))
    wp = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"),
                                              F.asc("cell"))
    return (vg.join(F.broadcast(cellmap), "g")
              .select("vec_id", "v", "v_norm", "cell", cos_c.alias("cos_c"))
              .withColumn("prn", F.row_number().over(wp))
              .where(F.col("prn") <= nprobe)
              .select("vec_id", "v", "v_norm", "cell", "prn"))


def knn_graph_nprobe(embeddings: DataFrame, k: int = KNN_K,
                     nprobe: int = GRAPH_NPROBE) -> DataFrame:
    """Multi-probe k-NN graph — `knn_graph`'s construction with each
    vector's candidates drawn from its `nprobe` nearest cells instead
    of one. The single-cell graph is the r10 walk rung's measured
    weakness: boundary vectors lose their true neighbors to the
    adjacent cell, and the resulting graph isn't even CONNECTED (36
    of 500 nodes reachable from the walk entry at sf0.01), so no
    walk — greedy or beam — can leave the entry's island. Probing 2
    cells restores the severed cross-cell edges AND bridges the
    islands (probe-2 edges cross cells by construction); measured at
    sf0.01 the beam walk over this graph reads topk 10/10 vs 2/10
    over the single-probe graph, at ~2x construction cost.

    Scale shape: the join is keyed by cell exactly as `knn_graph` —
    the probe side just carries nprobe rows per vector instead of
    one, so candidate rows scale by nprobe (NOT nprobe²: the member
    side stays primary-assignment-only). Each (vec, nbr) pair arises
    at most once because a member's primary cell is unique.

    Determinism: per-vector ranking ordered (cos DESC, lower nbr id);
    cos_sim rounded at emission only."""
    from pyspark.sql import Window

    probes = tracked_persist(_ivf_probed(embeddings, nprobe))
    members = (probes.where(F.col("prn") == 1)
               .select(F.col("cell").alias("_mc"),
                       F.col("vec_id").alias("nbr_id"),
                       F.col("v").alias("nv"),
                       F.col("v_norm").alias("n_norm")))
    cosn = dot(F.col("v"), F.col("nv")) / (F.col("v_norm") * F.col("n_norm"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_raw"),
                                             F.asc("nbr_id"))
    return (probes.join(members, probes["cell"] == members["_mc"])
            .where(F.col("vec_id") != F.col("nbr_id"))
            .select("vec_id", "nbr_id", cosn.alias("cos_raw"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("vec_id", "nbr_id", F.col("rnk").cast("int").alias("rnk"),
                    F.round("cos_raw", 6).alias("cos_sim")))


def _probe_pair_topk_blocked(pdf, kk: int, block_elems: int):
    """Numeric core of `knn_graph_nprobe_fast`'s per-cell kernel,
    module-level so tests can pin block-size invariance directly
    (the `_self_pair_topk_blocked` discipline): per probe row, the
    top-`kk` cosine members of the cell (prn=1 subset), scored in
    probe-row blocks of ≤ block_elems float64 elements. Self rows
    are ranked out via a -inf copy; emitted scores are the ORIGINAL
    values."""
    import numpy as np
    import pandas as pd

    V = np.array(list(pdf["v"]), dtype=np.float64)
    vn = pdf["v_norm"].to_numpy(dtype=np.float64)
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mmask = pdf["prn"].to_numpy() == 1
    if not mmask.any():
        return pd.DataFrame({"vec_id": [], "nbr_id": [],
                             "cos_raw": []})
    M, mn, mids = V[mmask], vn[mmask], ids[mmask]
    # members sorted by id: a STABLE argsort of -S then breaks
    # score ties by lower nbr_id automatically (no per-row loop)
    morder = np.argsort(mids, kind="stable")
    M, mn, mids = M[morder], mn[morder], mids[morder]
    # self-exclusion: a probe's own row appears iff this is its
    # primary cell; mids is sorted, so locate by searchsorted
    pos = np.searchsorted(mids, ids)
    pos_c = np.minimum(pos, len(mids) - 1)
    selfmask = mids[pos_c] == ids
    take = min(kk, len(mids))
    bs = max(1, block_elems // len(mids))
    out = []
    for s0 in range(0, len(ids), bs):
        s1 = min(len(ids), s0 + bs)
        S = np.zeros((s1 - s0, len(mids)))
        for j in range(V.shape[1]):  # dim-sequential: the fold's order
            S += V[s0:s1, j][:, None] * M[:, j][None, :]
        S = S / (vn[s0:s1][:, None] * mn[None, :])
        assert np.isfinite(S).all(), (
            "non-finite cosine (zero-norm or NaN embedding): the "
            "argsort tie-break would diverge from Spark DESC ordering")
        Sx = S.copy()
        blk_self = selfmask[s0:s1]
        Sx[np.arange(s1 - s0)[blk_self], pos_c[s0:s1][blk_self]] = -np.inf
        order = np.argsort(-Sx, axis=1, kind="stable")[:, :take]
        rows = np.repeat(np.arange(s1 - s0), take)
        cols = order.ravel()
        keep = Sx[rows, cols] != -np.inf
        out.append(pd.DataFrame({
            "vec_id": np.repeat(ids[s0:s1], take)[keep],
            "nbr_id": mids[cols][keep],
            # emit the ORIGINAL scores: the -inf copy only ranks
            "cos_raw": S[rows, cols][keep],
        }))
    return pd.concat(out, ignore_index=True)


def knn_graph_nprobe_fast(embeddings: DataFrame, k: int = KNN_K,
                          nprobe: int = GRAPH_NPROBE,
                          probes: DataFrame | None = None) -> DataFrame:
    """Arrow-vectorized twin of `knn_graph_nprobe` — BIT-IDENTICAL
    output (the ann_topk_fast discipline: dim-SEQUENTIAL numpy
    accumulation reproduces the expression fold's float64 op
    sequence exactly, so it shares the value oracle), attacking the
    curve's measured worst row (construction read 0.51-0.58 per
    replica at 10-30×; the docstring'd cost center is the ~2·occ·n
    codegen'd 64-dim folds plus the candidate-relation window).

    Two changes vs the expression path, both inside one per-cell
    Arrow kernel (`applyInPandas` over the probe relation grouped by
    cell — members are exactly the prn=1 subset of the group, so ONE
    grouped pass sees both roles):
    1. scoring is one vectorized seq-dot per cell (probes × members)
       instead of 64 codegen'd array lookups per pair;
    2. the per-(probe, cell) PARTIAL top-k happens in-kernel (full
       lexsort per probe row — (cos DESC, nbr ASC), exact ties), so
       the merge window sees ≤ nprobe·k rows per vector instead of
       ~nprobe·occupancy — global top-k over partial top-ks is exact
       by mergeability (pairs are unique across cells: a member's
       primary cell is unique).

    Precondition: finite, non-zero vector norms — numpy argsort
    places NaN last while Spark's DESC ordering treats NaN as
    greatest, and the -inf sentinel/keep-mask logic assumes finite
    scores, so a zero-norm/NaN embedding would silently diverge from
    the expression twin; asserted in-kernel so a degenerate corpus
    fails loudly instead.

    Scale shape: the ONLY corpus-sized exchange left is the probe
    relation's groupBy(cell); the merge window's input is
    nprobe·k·n skinny rows. Also SKEW-ROBUST: the two-level
    assignment can overload a cell ~8× (measured max 1054 vs avg 128
    at 30×), which costs the expression path occ² codegen'd folds +
    window rows in one partition, while here the hot cell is one
    numpy matrix and still emits only k rows per probe. MEASURED at
    30× (60k vectors, post-HIER_CELLS_MIN-retune): 4.3 s vs the
    expression path's 30.2 s warm — 7×; the shared `_ivf_probed`
    is 2.0 s of both.

    Hot-cell memory: scored in probe-row blocks of
    ≤ `KNN_ARROW_BLOCK_ELEMS` float64 elements
    (`_probe_pair_topk_blocked`) — O(block·members) score memory per
    cell instead of O(probes·members), bit-identity preserved (row
    blocking never reorders an element's accumulation)."""
    import pandas as pd
    from pyspark.sql import Window

    kk = int(k)

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return _probe_pair_topk_blocked(pdf, kk, KNN_ARROW_BLOCK_ELEMS)

    # `probes` (r14 opt): reuse an already-built `_ivf_probed`
    # relation — the insert rung derives BOTH its base graph and its
    # seed membership from one persisted probe relation instead of
    # re-running the two-level assignment per consumer
    if probes is None:
        probes = _ivf_probed(embeddings, nprobe)
    partial = (probes.groupBy("cell")
               .applyInPandas(kernel,
                              "vec_id bigint, nbr_id bigint, cos_raw double"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_raw"),
                                             F.asc("nbr_id"))
    return (partial.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("vec_id", "nbr_id",
                    F.col("rnk").cast("int").alias("rnk"),
                    F.round("cos_raw", 6).alias("cos_sim")))


def nav_graph_stats(embeddings: DataFrame, k: int = KNN_K,
                    nprobe: int = GRAPH_NPROBE) -> DataFrame:
    """The navigability claim as a MEASURED, oracle-checked row: the
    r10 single-probe graph failed because no edge crossed a cell
    boundary (walks were trapped on the entry's island); multi-probe
    construction exists to create those crossings. This row counts
    them instead of asserting them: per graph (single-probe
    `knn_graph` vs multi-probe `knn_graph_nprobe`), the edge count
    and how many edges join vectors whose PRIMARY cells differ —
    cross_ppm = 0 for single-probe BY CONSTRUCTION (both endpoints
    share the candidate cell), > 0 for multi-probe or the fix isn't
    real. Joins each edge to the auto assignment twice (cell lookup
    per endpoint) — corpus-keyed equi-joins, one combinable agg."""
    assigned = tracked_persist(
        _ivf_assigned_auto(embeddings).select("vec_id", "cell"))
    ca = assigned.select(F.col("vec_id").alias("_va"),
                         F.col("cell").alias("cell_a"))
    cb = assigned.select(F.col("vec_id").alias("_vb"),
                         F.col("cell").alias("cell_b"))

    def row(name: str, edges: DataFrame) -> DataFrame:
        e = (edges.join(ca, edges["vec_id"] == ca["_va"])
                  .join(cb, edges["nbr_id"] == cb["_vb"]))
        return e.agg(
            F.lit(name).alias("graph"),
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.sum(F.when(F.col("cell_a") != F.col("cell_b"), 1)
                   .otherwise(0)).cast("bigint").alias("n_cross_cell"),
        ).select(
            "graph", "n_edges", "n_cross_cell",
            F.expr("n_cross_cell * 1000000 div n_edges")
             .cast("bigint").alias("cross_ppm"))

    single = row("single_probe", knn_graph(embeddings, k)
                 .select("vec_id", "nbr_id"))
    multi = row("multi_probe", knn_graph_nprobe(embeddings, k, nprobe)
                .select("vec_id", "nbr_id"))
    return single.unionByName(multi)


def _nprobe_und(embeddings: DataFrame, k: int = KNN_K,
                nprobe: int = GRAPH_NPROBE,
                probes: DataFrame | None = None) -> DataFrame:
    """The bidirected distinct multi-probe edge set (src, nbr_id) —
    graph CONSTRUCTION, the expensive part, factored out so
    compositions that walk the same graph twice (exact-scored vs
    PQ-scored in `ann_beam_pq_recall`) build it once. `probes`
    forwards a prebuilt `_ivf_probed` relation (r14 opt — the insert
    rung shares it with seed selection)."""
    # the Arrow twin is BIT-IDENTICAL (pytest-pinned at base SFs and
    # verified at 30×) and 7× faster at scale, so every beam-walk
    # consumer rides it; oracles are unaffected by construction
    g = knn_graph_nprobe_fast(embeddings, k, nprobe, probes=probes).select(
        "vec_id", "nbr_id")
    return (g.unionAll(g.select(F.col("nbr_id").alias("vec_id"),
                                F.col("vec_id").alias("nbr_id")))
             .distinct()
             .select(F.col("vec_id").alias("src"), "nbr_id"))


def _beam_nav_edges(embeddings: DataFrame, k: int = KNN_K,
                    nprobe: int = GRAPH_NPROBE,
                    und: DataFrame | None = None) -> DataFrame:
    """Bidirected multi-probe k-NN edge set with the neighbor's vector
    attached — the navigation structure `ann_beam_search` walks (one
    build, reused every round; at most 2k·n edges). Pass `und` to
    reuse an already-built (src, nbr_id) graph."""
    if und is None:
        und = _nprobe_und(embeddings, k, nprobe)
    e = _vecs(embeddings).select(F.col("vec_id").alias("_nid"),
                                 F.col("v").alias("nv"),
                                 F.col("v_norm").alias("n_norm"))
    return tracked_persist(
        und.join(e, und["nbr_id"] == e["_nid"])
           .select("src", "nbr_id", "nv", "n_norm"))


def _beam_frontier(embeddings: DataFrame, steps: int,
                   n_queries: int, beam: int,
                   queries: DataFrame | None = None,
                   edges: DataFrame | None = None,
                   seeds: DataFrame | None = None,
                   beam_rel: DataFrame | None = None) -> DataFrame:
    """The beam walk's final frontier — ≤ beam rows per query of
    (query_id, qv, q_norm, node, cur_cos) after `steps` rounds over
    the multi-probe navigation graph. Shared by `ann_beam_search`
    (emits the best row), `ann_beam_topk` (emits the k best — the
    frontier IS the result heap, as in HNSW's ef-search), and the
    streaming serving twin (which passes each micro-batch's rows as
    `queries` and the PREBUILT persisted edge relation as `edges` —
    index construction must not re-run per batch).

    `seeds` (query_id, node), optional: per-query walk ENTRY points
    replacing the fixed entry node — the insert rung seeds each
    arriving vector's walk from its own multi-probe cells
    (`_insert_seeds`), which puts round 0 inside the query's
    neighborhood instead of wherever node 0 happens to sit. Must be
    distinct per (query_id, node); the initial frontier is ≤
    |seeds-per-query| rows and round 1's per-(query, cand) dedup +
    top-beam applies as usual.

    `beam_rel` (1-row `_beam` int), optional: a DATA-DEPENDENT
    frontier width riding the DAG as a broadcast (the insert rung's
    log2-scaled ef, `insert_beam_params`) — overrides the `beam`
    int; each round's top filter cross-joins the 1-row relation
    instead of comparing to a literal."""
    from pyspark.sql import Window

    ev = _vecs(embeddings)
    q = (queries if queries is not None else
         ev.where(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")))
    entry = F.when(F.col("query_id") == 0, F.lit(1)).otherwise(F.lit(0))
    if edges is None:
        edges = _beam_nav_edges(embeddings)
    if seeds is not None:
        ent = q.join(seeds, "query_id")
    else:
        ent = q.withColumn("node", entry)
    cur = (ev.join(F.broadcast(ent), ev["vec_id"] == ent["node"])
             .select("query_id", "qv", "q_norm", "node",
                     (dot(F.col("qv"), F.col("v"))
                      / (F.col("q_norm") * F.col("v_norm")))
                     .alias("cur_cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"),
                                               F.asc("cand_id"))
    for _ in range(steps):
        moved = (edges.join(F.broadcast(cur.select("query_id", "qv",
                                                   "q_norm", "node")),
                            edges["src"] == F.col("node"))
                 .where(F.col("nbr_id") != F.col("query_id"))
                 .select("query_id", "qv", "q_norm",
                         F.col("nbr_id").alias("cand_id"),
                         (dot(F.col("qv"), F.col("nv"))
                          / (F.col("q_norm") * F.col("n_norm")))
                         .alias("cos_raw")))
        stay = cur.select("query_id", "qv", "q_norm",
                          F.col("node").alias("cand_id"),
                          F.col("cur_cos").alias("cos_raw"))
        # dedup before ranking: a node reachable from two frontier
        # rows (or staying AND re-reached) must appear once per
        # query; the per-pair max over bit-identical duplicates is
        # the value itself in both engines. localCheckpoint per round
        # cuts the doubled lineage exactly as the greedy walk does
        # (measured 2^steps Catalyst re-analysis otherwise).
        # repartition by query_id FIRST (r14 opt, guide §2.4): hash
        # partitioning on query_id satisfies both the (query_id,
        # cand_id) dedup grouping AND the ranking window's
        # distribution, so the round runs ONE exchange instead of two
        # — the same candidate rows cross the wire once either way.
        ranked = (moved.unionByName(stay)
                  .repartition("query_id")
                  .groupBy("query_id", "cand_id")
                  .agg(F.max("cos_raw").alias("cos_raw"),
                       F.first("qv").alias("qv"),
                       F.first("q_norm").alias("q_norm"))
                  .withColumn("_rn", F.row_number().over(w)))
        if beam_rel is not None:
            ranked = (ranked.crossJoin(F.broadcast(beam_rel))
                      .where(F.col("_rn") <= F.col("_beam")))
        else:
            ranked = ranked.where(F.col("_rn") <= beam)
        cur = (ranked
               .select("query_id", "qv", "q_norm",
                       F.col("cand_id").alias("node"),
                       F.col("cos_raw").alias("cur_cos"))
               .localCheckpoint(eager=True))
    return cur


def ann_beam_search(embeddings: DataFrame, steps: int = GS_STEPS,
                    n_queries: int = N_QUERIES,
                    beam: int = BEAM_B,
                    edges: DataFrame | None = None) -> DataFrame:
    """Deterministic BEAM graph-walk ANN — `ann_graph_search`'s greedy
    hill-climb generalized to a width-`beam` frontier (what HNSW's
    ef-search parameter buys, Malkov & Yashunin 2018 §4), walking the
    MULTI-PROBE k-NN graph (`knn_graph_nprobe` — the connected
    navigation structure; see there for why the single-cell graph
    cannot be walked out of the entry's island): each round expands
    every frontier node's neighbors, dedups candidates per query, and
    keeps the `beam` best (cos DESC, lower id) — the search no longer
    commits to one path, so single-step local maxima stop terminating
    it. beam=1 is exactly the greedy walk over the same graph; that
    IS the baseline row `ann_beam_recall` measures the lift against
    (measured at sf0.01: greedy topk 5/10 -> beam=4 topk 10/10 with
    ~15%% of the corpus scored).

    Scale shape: identical to the greedy walk with the state beam×
    larger — the navigation structure is one persisted bidirected
    edge relation; each round is ONE broadcast of ≤ beam·n_queries
    frontier rows against it plus a bounded per-query top-beam window
    over ≤ beam·(2k+1)·n_queries candidate rows. Rounds × linear, and
    the frontier never grows past beam·n_queries.

    Determinism: same fixed entry as the greedy rung, candidate dedup
    via per-(query, cand) max — duplicate rows carry bit-identical
    cosines (pure function of the pair) so the max is the value
    itself — every ranking ordered (cos_raw DESC, cand_id ASC), raw
    cosines carried between rounds, rounding only at emission; the
    oracle replays each round as a chained materialized CTE."""
    from pyspark.sql import Window

    cur = _beam_frontier(embeddings, steps, n_queries, beam, edges=edges)
    wbest = Window.partitionBy("query_id").orderBy(F.desc("cur_cos"),
                                                   F.asc("node"))
    return (cur.withColumn("_rn", F.row_number().over(wbest))
               .where(F.col("_rn") == 1)
               .select("query_id", F.col("node").alias("found_id"),
                       F.round("cur_cos", 6).alias("cos_sim")))


BEAM_EF = 8


def ann_beam_topk(embeddings: DataFrame, k: int = TOP_K,
                  steps: int = GS_STEPS, n_queries: int = N_QUERIES,
                  beam: int = BEAM_EF,
                  queries: DataFrame | None = None,
                  edges: DataFrame | None = None) -> DataFrame:
    """TOP-K serving from the beam frontier — what an ANN index
    actually answers (`ann_topk`'s schema, approximately): run the
    beam walk with frontier width `beam` ≥ k (HNSW serves top-k from
    its ef ≥ k result heap the same way, Malkov & Yashunin 2018
    §Alg.5) and emit each query's k best frontier rows as
    (query_id, neighbor_id, rnk, cos_sim). `ann_beam_topk_recall`
    measures set recall@k against the exact ranking — the standard
    ANN serving metric, not just best-endpoint membership.

    Scale shape: exactly `ann_beam_search` (the frontier IS the
    result heap — no extra pass); emission is one bounded per-query
    window over ≤ beam·n_queries rows."""
    from pyspark.sql import Window

    if beam < k:
        raise ValueError(f"beam ({beam}) must be >= k ({k})")
    cur = _beam_frontier(embeddings, steps, n_queries, beam,
                         queries=queries, edges=edges)
    wbest = Window.partitionBy("query_id").orderBy(F.desc("cur_cos"),
                                                   F.asc("node"))
    return (cur.withColumn("rnk", F.row_number().over(wbest))
               .where(F.col("rnk") <= k)
               .select("query_id", F.col("node").alias("neighbor_id"),
                       F.col("rnk").cast("int").alias("rnk"),
                       F.round("cur_cos", 6).alias("cos_sim")))


def ann_beam_topk_recall(embeddings: DataFrame, k: int = TOP_K,
                         steps: int = GS_STEPS,
                         n_queries: int = N_QUERIES,
                         beam: int = BEAM_EF) -> DataFrame:
    """Set recall@k of the beam-served top-k vs the exact ranking:
    |found ∩ exact top-k| summed over queries, as exact integers and
    one ppm floor division — the honesty row the serving path owes
    (best-endpoint membership alone overstates an index that finds
    one good neighbor and pads the rest)."""
    found = ann_beam_topk(embeddings, k, steps, n_queries, beam)
    exact = ann_topk(embeddings, k=k, n_queries=n_queries).select(
        F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en"))
    hit = found.join(
        F.broadcast(exact), (F.col("query_id") == F.col("eq"))
        & (F.col("neighbor_id") == F.col("en")), "left_semi")
    n_hits = hit.agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    n_q = found.agg(
        F.countDistinct("query_id").cast("int").alias("n_queries"))
    return (n_hits.crossJoin(F.broadcast(n_q))
            .select("n_queries",
                    F.lit(int(k)).alias("k"),
                    "n_hits",
                    F.expr(f"n_hits * 1000000 div (n_queries * {int(k)})")
                     .cast("bigint").alias("recall_ppm")))


def _concurrent_build(builders):
    """Construct independent walk/recall chains on a small driver
    thread pool (guide §2.6 'overlap independent jobs'): each chain's
    eager per-round localCheckpoint jobs are tiny and driver-
    sequential, so running two-to-five independent chains from
    threads lets the scheduler back-fill idle cores with the next
    chain's rounds instead of idling between jobs. Returns the built
    DataFrames in builder order. Plans and results are unchanged —
    the same DAGs are constructed, only their eager construction jobs
    overlap (measured: ann_beam_pq_recall 12.4 s → 8.2 s at sf0.1,
    output identical). Shared PERSISTED inputs must be materialized
    before forking so the chains read the cache instead of racing to
    fill it."""
    from concurrent.futures import ThreadPoolExecutor

    if len(builders) == 1:
        return [builders[0]()]
    with ThreadPoolExecutor(max_workers=min(4, len(builders))) as pool:
        futures = [pool.submit(b) for b in builders]
        return [f.result() for f in futures]


def _materialize(df: DataFrame) -> DataFrame:
    """Force a persisted relation into cache NOW (noop sink — full
    computation, no driver collect) so concurrently-built consumers
    read it instead of computing it."""
    df.write.format("noop").mode("overwrite").save()
    return df


def _walk_recall(found: DataFrame, exact: DataFrame,
                 method: str) -> DataFrame:
    """One labeled recall row for a graph-walk result vs the exact
    top-k ranking (shared by ann_beam_recall's method rows)."""
    j = found.join(F.broadcast(exact), (F.col("query_id") == F.col("eq"))
                   & (F.col("found_id") == F.col("en")), "left")
    return j.agg(
        F.count(F.lit(1)).cast("int").alias("n_queries"),
        F.sum(F.when(F.col("rnk") == 1, 1).otherwise(0)).cast("int")
         .alias("n_top1"),
        F.sum(F.when(F.col("rnk").isNotNull(), 1).otherwise(0)).cast("int")
         .alias("n_topk"),
    ).select(
        F.lit(method).alias("method"),
        "n_queries", "n_top1", "n_topk",
        F.expr("n_top1 * 1000000 div n_queries").cast("bigint")
         .alias("top1_ppm"),
        F.expr("n_topk * 1000000 div n_queries").cast("bigint")
         .alias("topk_ppm"))


def ann_beam_recall(embeddings: DataFrame, steps: int = GS_STEPS,
                    n_queries: int = N_QUERIES,
                    beam: int = BEAM_B) -> DataFrame:
    """The greedy-vs-beam comparison the walk rung owes (r10 verdict):
    one labeled recall row per method over the SAME corpus, SAME
    multi-probe graph, SAME entry and round count — so the measured
    delta is exactly what frontier width buys (greedy = beam 1).
    The exact top-k relation is computed once and reused by both
    rows. The legacy single-probe walk keeps its own honesty row
    (`ann_graph_recall`), so the artifact also shows what graph
    CONSTRUCTION bought: single-probe greedy topk 2/10 ->
    multi-probe greedy 5/10 -> multi-probe beam-4 10/10 at sf0.01."""
    exact = tracked_persist(ann_topk(embeddings).select(
        F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en"),
        "rnk"))
    # ONE graph construction shared by both walks (r14 opt, guide
    # §1.2/§2.4: the comparison is about frontier WIDTH over the SAME
    # graph, so building the multi-probe edge relation per walk was
    # pure duplicate work — construction is the dominant cost at
    # every scale; measured 11.1 s → 8.7 s at sf0.1). `_beam_nav_edges`
    # is tracked_persist'ed, so both walks read the same cached
    # relation; results are bit-identical (same edges either way).
    edges = _materialize(_beam_nav_edges(embeddings, und=tracked_persist(
        _nprobe_und(embeddings))))
    greedy, beamr = _concurrent_build([
        lambda: _walk_recall(
            ann_beam_search(embeddings, steps, n_queries, beam=1,
                            edges=edges), exact, "greedy"),
        lambda: _walk_recall(
            ann_beam_search(embeddings, steps, n_queries, beam,
                            edges=edges), exact, "beam"),
    ])
    return greedy.unionByName(beamr)


BEAM_CURVE = (1, 2, 4, 8)


def ann_beam_curve(embeddings: DataFrame, steps: int = GS_STEPS,
                   n_queries: int = N_QUERIES,
                   beams: tuple[int, ...] = BEAM_CURVE) -> DataFrame:
    """The ef-search TRADE-OFF CURVE as one checked relation — the
    plot every ANN benchmark publishes (recall vs frontier width),
    measured instead of asserted: one labeled recall row per beam
    width over the SAME corpus, graph, entry and round count, so a
    regression anywhere on the curve (graph construction, walk
    ranking, dedup) moves a checked number. MEASURED at sf0.01:
    topk 5/10 → 9/10 → 10/10 → 10/10 and top1 1 → 4 → 7 → 8 across
    beams 1/2/4/8 — width buys recall monotonically on this corpus,
    and the curve shows where it saturates.

    Scale shape: len(beams) independent walks, each exactly
    `ann_beam_search`'s rounds × linear shape; the exact top-k
    relation is computed once and reused by every row."""
    exact = tracked_persist(ann_topk(embeddings).select(
        F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en"),
        "rnk"))
    # one shared graph construction for every width row (r14 opt —
    # same move as ann_beam_recall; len(beams) builds of the same
    # deterministic relation collapse to one), materialized before
    # the width walks are built CONCURRENTLY (_concurrent_build)
    edges = _materialize(_beam_nav_edges(embeddings, und=tracked_persist(
        _nprobe_und(embeddings))))
    rows = _concurrent_build([
        (lambda bb: lambda: _walk_recall(
            ann_beam_search(embeddings, steps, n_queries, beam=bb,
                            edges=edges),
            exact, str(bb))
            .select(F.lit(int(bb)).alias("beam"),
                    "n_queries", "n_top1", "n_topk",
                    "top1_ppm", "topk_ppm"))(b)
        for b in beams])
    out = rows[0]
    for row in rows[1:]:
        out = out.unionByName(row)
    return out


def dedup_embedding_blocked(embeddings: DataFrame,
                            threshold: float = COS_THRESHOLD,
                            n_cells: int | None = None) -> DataFrame:
    """Cell-blocked semantic near-dup pairs — the SCALE path next to
    the quadratic `dedup_embedding_cosine` baseline (SemDeDup-style:
    coarse-quantize, then compare only within a cell).

    Scale shape: assignment is broadcast(centroids) × ONE corpus scan
    with a map-side `max_by` argmax (one shuffled row per vector,
    identical to `ann_ivf`'s assignment); the pair join is a
    self-join ON the cell key, so the shuffle is keyed by cell and
    candidate count is bounded by Σ|cell|² / corpus — never the
    global n². Misses cross-cell pairs by construction; that recall
    trade is measured honestly by `ann_recall_compare`'s IVF rows.
    Runs the FULL table (no slice bound) precisely because the
    blocking keeps it sub-quadratic.

    Centroids are the seeded first-`n_cells` vectors (deterministic,
    oracle-replayable); swap in `kmeans_cells` for learned cells —
    the plan is unchanged, exactly as `ann_ivf_learned` does.
    `n_cells=None` (the default) sizes the cell count from the corpus
    via `ivf_cells_for` — one cell per IVF_DIV vectors, a 1-row count
    broadcast replayed integer-exactly by the oracle — so within-cell
    candidate pairs per row stay ~constant as the corpus grows; the
    ASSIGNMENT is likewise scale-aware (`_ivf_assigned_auto`:
    bit-exact flat argmax below HIER_CELLS_MIN cells, two-level
    O(n·√cells) past it — the r9-measured flat super-linearity fix).
    An explicit `n_cells` pins the flat argmax at that count."""
    assigned = (_ivf_assigned_auto(embeddings) if n_cells is None
                else _ivf_assigned(embeddings, n_cells))
    a = assigned.select(F.col("cell"), F.col("vec_id").alias("vec_a"),
                        F.col("v").alias("va"), F.col("v_norm").alias("na"))
    b = assigned.select(F.col("cell"), F.col("vec_id").alias("vec_b"),
                        F.col("v").alias("vb"), F.col("v_norm").alias("nb"))
    pairs = a.join(b, "cell").where(F.col("vec_a") < F.col("vec_b"))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (pairs.select("cell", "vec_a", "vec_b", cos.alias("cos_raw"))
                 .where(F.col("cos_raw") >= threshold)
                 .select("vec_a", "vec_b",
                         F.round(F.col("cos_raw"), 6).alias("cos_sim"),
                         F.col("cell").cast("long").alias("cell")))


def semantic_canonicalize(documents: DataFrame,
                          embeddings: DataFrame,
                          threshold: float = COS_THRESHOLD,
                          n_cells: int | None = None) -> DataFrame:
    """Semantic dedup END-TO-END: cell-blocked embedding near-dup
    pairs → connected components → one canonical doc per cluster,
    chosen by QUALITY (`textops.quality_score`, ties to the lower
    doc_id) rather than by id — keep the best-written copy, not the
    first-crawled one. This is the composition a 100 TB curation
    pipeline actually runs (SemDeDup: block, cluster, keep-best);
    each piece is the already-scale-shaped operator, wired together:

    - pairs: `dedup_embedding_blocked` (candidates bounded per cell);
    - components: `dedup.min_label_components` (per-round join +
      min-agg, checkpointed labels, convergence-checked). Fallback
      contract: near-dup graphs are shallow (diameter ≤ 3 observed),
      where propagation's cheap rounds win; rounds = diameter, so if
      cluster diameters can exceed a handful of hops (entity/link
      graphs, chained paraphrases), swap in `dedup_clusters_twostar`
      / `components_twostar` — same (id, label) contract, same
      oracle, pytest-pinned equivalence. (The r8-measured depth-16
      driver OOM in the propagation engine was per-round analyzer-
      tree doubling — fixed r14 by per-round localCheckpoint, see
      min_label_components; the engine shoot-out in bench.py
      re-measures the round-count crossover each clean run);
    - canonical: one `max_by(doc_id, struct(quality, -doc_id))`
      aggregate per cluster — quality is the 6dp-rounded score, so
      the argmax compares identical doubles in both engines.

    `vec_id` is the document's embedding id (doc_id == vec_id in the
    testdata). Output: every clustered doc with its cluster, the
    cluster's canonical doc, and a `keep` flag; singletons never
    enter the pair graph and are implicitly kept (same node-set
    contract as `dedup_clusters`)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        min_label_components,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        quality_score,
    )

    pairs = dedup_embedding_blocked(embeddings, threshold, n_cells).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    labels = min_label_components(pairs)
    q = quality_score(documents).select("doc_id", "quality")
    member = (labels.join(q, labels["id"] == q["doc_id"])
              .select(F.col("id").alias("doc_id"),
                      F.col("label").alias("cluster_id"), "quality"))
    canon = member.groupBy("cluster_id").agg(
        F.expr("max_by(doc_id, struct(quality, -doc_id))").alias("canonical_id"),
        F.count(F.lit(1)).alias("cluster_size"))
    return (member.join(canon, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size", "quality",
                    "canonical_id",
                    (F.col("doc_id") == F.col("canonical_id")).alias("keep")))


KNN_STRONG_TAU = 0.4  # an edge this similar marks a DENSE neighborhood


def knn_diversity_sample_hier(documents: DataFrame,
                              embeddings: DataFrame,
                              k: int = KNN_K,
                              tau: float = KNN_STRONG_TAU) -> DataFrame:
    """`knn_diversity_sample` consuming the PURE two-level graph
    (`knn_graph_hier`) — pins the O(n·√cells) constructor regardless
    of corpus size, so the flat-vs-hier comparison stays measurable
    at every scale. Since r10 the default-named
    `knn_diversity_sample` rides the scale-aware auto assignment and
    executes this same plan past HIER_CELLS_MIN cells; this entry
    remains the explicit hier path (and the one the sub-threshold
    agreement/recall harness exercises). Same strong-edge →
    components → quality-argmax pipeline, same output contract."""
    return knn_diversity_sample(documents, embeddings, k, tau,
                                graph=knn_graph_hier(embeddings, k))


def knn_diversity_sample(documents: DataFrame,
                         embeddings: DataFrame,
                         k: int = KNN_K,
                         tau: float = KNN_STRONG_TAU,
                         graph: DataFrame | None = None) -> DataFrame:
    """Graph-based diversity downsampling — the consumer that closes
    the `knn_graph` loop (SemDeDup-over-graph): keep ONE max-quality
    document per dense semantic neighborhood, drop the rest. Dense
    neighborhoods are the connected components of the k-NN graph
    restricted to its STRONG edges (cos_sim ≥ τ after the 6-dp
    rounding, so the cut is engine-exact); within each component the
    survivor is the quality argmax (ties to the lower doc_id). Docs
    with no strong neighbor never enter the graph and are implicitly
    kept — the same node-set contract as `semantic_canonicalize`.

    Why consume the GRAPH rather than threshold-pairs
    (`dedup_embedding_blocked`): k-NN edges bound per-node DEGREE at
    k, so a pathologically dense region (10⁶ boilerplate near-copies
    in one cell) contributes O(k·n) edges instead of O(n²) pairs —
    the property that keeps the pair relation linear in the corpus at
    100 TB. The trade (a dense clique is linked through neighbor
    chains rather than all-pairs) is exactly why components run over
    the edges.

    Components use `dedup.components_twostar` (O(log n) rounds):
    strong-edge k-NN graphs chain neighbor-of-neighbor, so component
    diameter is NOT bounded by a near-dup argument — this is the
    unbounded-diameter regime where label propagation measurably OOMs
    (bench.py `_bench_components_engines`, crossover depth 16).

    Output per clustered doc: cluster id (min reachable doc_id),
    cluster size, `strong_degree` (distinct strong neighbors — the
    density signal a curation run thresholds on), quality, and the
    keep flag.

    Scale shape: knn_graph's one cell-keyed self-join + per-vector
    window; the strong filter prunes before anything else moves;
    two-star rounds operate on the strong-edge relation only (tiny
    relative to the corpus); quality join + two |components|-bounded
    aggregates. Oracle: recursive-CTE closure over the identical
    edge set."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        components_twostar,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.textops import (
        quality_score,
    )

    if graph is None:
        # scale-aware default graph (r10): knn_graph rides
        # _ivf_assigned_auto — bit-exact flat assignment below
        # HIER_CELLS_MIN cells, two-level O(n·√cells) past it, so the
        # default-named entry executes the 100-TB plan at scale
        # (knn_diversity_sample_hier pins the PURE two-level path for
        # the measured flat-vs-hier story)
        graph = knn_graph(embeddings, k)
    strong = graph.where(F.col("cos_sim") >= tau)
    # pairs feeds THREE scans (deg, and components_twostar's nodes +
    # edges checkpoints) — unpersisted, each scan re-ran the whole
    # knn_graph construction (r14 opt, guide §5 'caching is worth it
    # when a DataFrame is reused and recomputing is expensive':
    # measured 8.6 s → 6.2 s at sf0.1, output identical)
    pairs = tracked_persist(strong.select(
        F.least("vec_id", "nbr_id").alias("doc_a"),
        F.greatest("vec_id", "nbr_id").alias("doc_b")).distinct())
    deg = (pairs.select(F.col("doc_a").alias("id"))
                .unionAll(pairs.select(F.col("doc_b").alias("id")))
                .groupBy("id")
                .agg(F.count(F.lit(1)).alias("strong_degree")))
    labels = components_twostar(pairs)
    q = quality_score(documents).select("doc_id", "quality")
    member = (labels.join(deg, "id")
              .join(q, labels["id"] == q["doc_id"])
              .select(F.col("id").alias("doc_id"),
                      F.col("label").alias("cluster_id"),
                      "strong_degree", "quality"))
    canon = member.groupBy("cluster_id").agg(
        F.expr("max_by(doc_id, struct(quality, -doc_id))").alias("keep_id"),
        F.count(F.lit(1)).alias("cluster_size"))
    return (member.join(canon, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size",
                    F.col("strong_degree").cast("int").alias("strong_degree"),
                    "quality",
                    (F.col("doc_id") == F.col("keep_id")).alias("keep")))


def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension distribution statistics of the embedding column
    — the feature-store DRIFT MONITOR: mean/variance/extremes per
    dimension are what a production pipeline tracks batch-over-batch
    to catch a broken encoder or input shift before it poisons
    training (the observability twin of the ANN/k-means consumers).

    Scale shape: posexplode to (dim, component) — fixed 16-byte rows
    — then ONE groupBy(dim) with map-side partials; output is exactly
    DIM rows however many vectors stream through. Engine-exact
    moments: mean and variance derive from fixed-point component sums
    (`fsum`: associative integer adds) via the sum-of-squares
    identity var = (Σx² − (Σx)²/n)/n, written token-identically in
    the oracle — no running-variance recurrence whose FP order Spark
    could reorder."""
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import fsum

    comp = embeddings.select(
        F.posexplode("embedding").alias("dim", "x"))
    agg = comp.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        fsum(F.col("x")).alias("sx"),
        fsum(F.col("x") * F.col("x")).alias("sxx"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"))
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - (F.col("sx") * F.col("sx")) / F.col("n")) / F.col("n")
    return (agg.select("dim", "n", mean.alias("mean"), var.alias("var"),
                       "mn", "mx")
               .orderBy("dim"))


# --- product quantization (PQ / ADC) ----------------------------------------
# The third production ANN index family next to sign-LSH and IVF:
# compress each vector to PQ_M codebook ids (here 4 bytes vs 256
# float bytes — the memory lever that lets a 100 TB corpus's index
# fit executor RAM), then rank by ASYMMETRIC distance: exact query
# subvectors scored against a tiny per-query distance table instead
# of the raw corpus floats (Jégou et al., TPAMI 2011). Training and
# encoding are the kmeans_cells discipline per subspace: broadcast
# codebooks, argmin assignment with a lower-code tie-break,
# fixed-point centroid means — so the DuckDB oracle replays the
# identical iterations.
PQ_M = 4              # subspaces (contiguous dim blocks)
PQ_SUB = DIM // PQ_M  # dims per subspace
PQ_K = 16             # codes per subspace codebook
PQ_ITERS = 2          # Lloyd iterations (same budget as kmeans_cells)
PQ_SCALE = 1_000_000  # fixed-point scale for order-free float sums


def _subvectors(embeddings: DataFrame) -> DataFrame:
    """(vec_id, sub, sv[PQ_SUB]) — each vector split into PQ_M
    contiguous subvector rows (a projection + explode, no shuffle)."""
    v = F.col("embedding").cast("array<double>")
    subs = F.array(*[
        F.struct(F.lit(m).alias("sub"),
                 F.slice(v, m * PQ_SUB + 1, PQ_SUB).alias("sv"))
        for m in range(PQ_M)])
    return (embeddings.select("vec_id", F.explode(subs).alias("s"))
            .select("vec_id", F.col("s.sub").alias("sub"),
                    F.col("s.sv").alias("sv")))


def _pq_assign(e: DataFrame, cb: DataFrame) -> DataFrame:
    """argmin code per (vec_id, sub); ties to the lower code —
    broadcast(codebook) × one scan, map-side combinable min_by.

    Ranks by the RANK-EQUIVALENT distance |c|² − 2⟨sv,c⟩ (the ‖sv‖²
    term is constant per row, so dropping it can't change the argmin)
    with |c|² computed ONCE on the PQ_M·PQ_K-row codebook relation —
    one 16-dim fold per (row, code) pair instead of three. The oracle
    evaluates the identical token sequence."""
    cbn = cb.select("sub", "code", "cv",
                    dot(F.col("cv"), F.col("cv")).alias("cv2"))
    d2 = F.col("cv2") - 2 * dot(F.col("sv"), F.col("cv"))
    return (e.join(F.broadcast(cbn), "sub")
             .select("vec_id", "sub", "sv", "code", d2.alias("d2"))
             .groupBy("vec_id", "sub")
             .agg(F.expr("min_by(code, struct(d2, code))").alias("code"),
                  F.first("sv").alias("sv")))


def pq_codebooks_rel(embeddings: DataFrame, k: int = PQ_K,
                     iters: int = PQ_ITERS) -> DataFrame:
    """(sub, code, cv[PQ_SUB]) trained codebooks — PQ_M independent
    Lloyd jobs ride ONE declarative DAG by keying every stage on
    `sub`: assignment is broadcast(all codebooks) × one subvector
    scan, the update one groupBy(sub, code) of fixed-point dim sums.
    Codebook rows are ≤ PQ_M·PQ_K regardless of corpus size, so the
    broadcast never grows with data. Seeded with the first k vectors'
    subvectors (deterministic, oracle-replayable); a code that loses
    all members drops out of later iterations in both engines."""
    e = _subvectors(embeddings)
    cb = (e.where(F.col("vec_id") < k)
           .select("sub", F.col("vec_id").alias("code"),
                   F.col("sv").alias("cv")))
    for _ in range(iters):
        assigned = _pq_assign(e, cb)
        # narrow centroid update (r14 opt — the kmeans_cells move):
        # posexplode(sv) → one groupBy(sub, code, dim) sum → sorted
        # reassembly, instead of PQ_SUB aggregate expressions whose
        # plan/codegen grows O(PQ_SUB) per iteration; (s/1e6)/n is the
        # identical float64 token sequence, output bit-identical
        upd = (assigned.select("sub", "code",
                               F.posexplode("sv").alias("dim", "x"))
               .groupBy("sub", "code", "dim")
               .agg(F.sum(F.round(F.col("x") * PQ_SCALE).cast("bigint"))
                    .alias("s"),
                    F.count(F.lit(1)).alias("n")))
        val = (F.col("s") / F.lit(float(PQ_SCALE))) / F.col("n")
        cb = (upd.select("sub", "code",
                         F.struct(F.col("dim"), val.alias("val")).alias("p"))
              .groupBy("sub", "code")
              .agg(F.expr("transform(array_sort(collect_list(p)), "
                          "q -> q.val)").alias("cv")))
    return cb


def pq_codebooks(embeddings: DataFrame, k: int = PQ_K,
                 iters: int = PQ_ITERS) -> DataFrame:
    """`pq_codebooks_rel` exploded to (sub, code, dim, centroid_val)
    scalar rows for the compare harness (the kmeans_centroids move)."""
    return (pq_codebooks_rel(embeddings, k, iters)
            .select(F.col("sub").cast("int").alias("sub"),
                    F.col("code").cast("int").alias("code"),
                    F.posexplode("cv").alias("dim", "centroid_val"))
            .orderBy("sub", "code", "dim"))


def ann_pq_adc(embeddings: DataFrame, k: int = TOP_K,
               n_queries: int = N_QUERIES) -> DataFrame:
    """PQ top-k by asymmetric distance computation: encode the corpus
    once (argmin code per subspace — the 4-byte index), build the
    per-query distance table dot(q_m, c_{m,code}) (≤ n_queries · PQ_M
    · PQ_K rows — broadcast), and score every corpus vector by summing
    its PQ_M table entries. The scan side carries codes, not floats:
    per-row work is PQ_M integer adds instead of a DIM-dim fold, and
    the shuffle key is (query, vec) with fixed-point partial sums —
    order-free, so the groupBy is map-side combinable at any
    partitioning. approx_dot ≈ dot(q, v) with reconstruction bias
    measured honestly by `ann_pq_recall`."""
    cb = pq_codebooks_rel(embeddings)
    e = _subvectors(embeddings)
    enc = _pq_assign(e, cb).select("vec_id", "sub", "code")
    q = (e.where(F.col("vec_id") < n_queries)
          .select(F.col("vec_id").alias("query_id"), "sub",
                  F.col("sv").alias("qsv")))
    dtab = (q.join(cb, "sub")
             .select("query_id", "sub", "code",
                     F.round(dot(F.col("qsv"), F.col("cv")) * PQ_SCALE)
                      .cast("bigint").alias("pdot_fp")))
    scored = (enc.join(F.broadcast(dtab), ["sub", "code"])
                 .where(F.col("vec_id") != F.col("query_id"))
                 .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
                 .agg(F.sum("pdot_fp").alias("fp")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("fp"), F.asc("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .where(F.col("rnk") <= k)
                  .select("query_id", "neighbor_id",
                          F.round(F.col("fp") / float(PQ_SCALE), 6)
                           .alias("approx_dot"),
                          F.col("rnk").cast("int").alias("rnk")))


def ann_pq_recall(embeddings: DataFrame, k: int = TOP_K,
                  n_queries: int = N_QUERIES) -> DataFrame:
    """Measured recall@k of BOTH PQ stages against the exact cosine
    top-k, per query — the `ann_lsh_recall` habit applied to the
    compressed index: pure compressed-domain ADC ranking
    (reconstruction bias included) next to the shortlist+exact-re-rank
    pipeline, so the relation shows what re-ranking buys (the
    index-tuning table a PQ deployment keeps). Counts are integers,
    recalls rounded divisions — value-exact."""
    exact = ann_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id")
    adc = ann_pq_adc(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_adc"))
    rr = ann_pq_rerank(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_rr"))
    j = (exact.join(adc, ["query_id", "neighbor_id"], "left")
              .join(rr, ["query_id", "neighbor_id"], "left"))
    return (j.groupBy("query_id")
             .agg(F.count(F.lit(1)).cast("int").alias("n_true"),
                  F.sum(F.coalesce(F.col("hit_adc"), F.lit(0)))
                   .cast("int").alias("n_adc"),
                  F.sum(F.coalesce(F.col("hit_rr"), F.lit(0)))
                   .cast("int").alias("n_rerank"))
             .select("query_id", "n_true", "n_adc", "n_rerank",
                     F.round(F.col("n_adc") / F.col("n_true"), 6)
                      .alias("recall_adc"),
                     F.round(F.col("n_rerank") / F.col("n_true"), 6)
                      .alias("recall_rerank")))


PQ_SHORTLIST = 100  # ADC candidates re-ranked exactly per query


def _pq_shortlist(embeddings: DataFrame, n_queries: int,
                  shortlist: int) -> DataFrame:
    """(query_id, neighbor_id) — the top-`shortlist` corpus vectors
    per query by fixed-point ADC score (the compressed-domain pass
    shared by ann_pq_adc and the re-rank path)."""
    cb = pq_codebooks_rel(embeddings)
    e = _subvectors(embeddings)
    enc = _pq_assign(e, cb).select("vec_id", "sub", "code")
    q = (e.where(F.col("vec_id") < n_queries)
          .select(F.col("vec_id").alias("query_id"), "sub",
                  F.col("sv").alias("qsv")))
    dtab = (q.join(cb, "sub")
             .select("query_id", "sub", "code",
                     F.round(dot(F.col("qsv"), F.col("cv")) * PQ_SCALE)
                      .cast("bigint").alias("pdot_fp")))
    scored = (enc.join(F.broadcast(dtab), ["sub", "code"])
                 .where(F.col("vec_id") != F.col("query_id"))
                 .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
                 .agg(F.sum("pdot_fp").alias("fp")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("fp"), F.asc("neighbor_id"))
    return (scored.withColumn("srnk", F.row_number().over(w))
                  .where(F.col("srnk") <= shortlist)
                  .select("query_id", "neighbor_id"))


def ann_pq_rerank(embeddings: DataFrame, k: int = TOP_K,
                  n_queries: int = N_QUERIES,
                  shortlist: int = PQ_SHORTLIST) -> DataFrame:
    """The full production PQ pipeline: compressed-domain ADC
    shortlist (`PQ_SHORTLIST` per query — a fixed candidate budget,
    so its share of the corpus SHRINKS as data grows), then EXACT
    cosine re-rank of only those candidates. Exact scoring touches
    shortlist·n_queries rows, never the corpus; the candidate ids
    broadcast back onto one corpus scan to fetch raw vectors. Output
    ranks by true cosine, so recall vs `ann_topk` equals the
    shortlist's capture rate — measured per query by
    `ann_pq_recall.recall_rerank`."""
    short = _pq_shortlist(embeddings, n_queries, shortlist)
    e = _vecs(embeddings)
    qv = (e.where(F.col("vec_id") < n_queries)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")))
    cand = (e.join(F.broadcast(short),
                   e.vec_id == short.neighbor_id)
             .select("query_id", "neighbor_id", "v", "v_norm"))
    j = cand.join(F.broadcast(qv), "query_id")
    cos = dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm"))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (j.select("query_id", "neighbor_id", cos.alias("cos_raw"))
             .withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= k)
             .select("query_id", "neighbor_id",
                     F.round(F.col("cos_raw"), 6).alias("cos_sim"),
                     F.col("rnk").cast("int").alias("rnk")))


def _pq_codebook_array(cb: DataFrame) -> DataFrame:
    """(sub, codes: array<struct<code, cv, cv2>>) — the codebook
    collapsed to one row per subspace with |c|² precomputed, sorted
    by code (array_sort on the struct orders by its FIRST field, and
    codes are unique per sub — deterministic regardless of
    collect_list arrival order). PQ_M rows total; broadcasts into
    any scan."""
    return (cb.groupBy("sub")
              .agg(F.array_sort(F.collect_list(F.struct(
                   "code", "cv",
                   dot(F.col("cv"), F.col("cv")).alias("cv2"))))
                   .alias("codes")))


def pq_encode(embeddings: DataFrame, cb: DataFrame | None = None) -> DataFrame:
    """STATELESS PQ encode — the serving-path shape: one row in, PQ_M
    code rows out, no shuffle after the broadcast join. The argmin
    over a subspace's PQ_K codes happens INSIDE the row (transform →
    array_min over struct(d2, code) — struct comparison is
    field-ordered, so ties break to the lower code exactly like
    `_pq_assign`'s min_by), which is what lets the streaming twin run
    in append mode with zero state. Same codes as the stateful
    groupBy path, same oracle."""
    if cb is None:
        cb = pq_codebooks_rel(embeddings)
    e = _subvectors(embeddings)
    j = e.join(F.broadcast(_pq_codebook_array(cb)), "sub")
    scored = F.transform(
        F.col("codes"),
        lambda c: F.struct(
            (c["cv2"] - 2 * dot(F.col("sv"), c["cv"])).alias("d2"),
            c["code"].alias("code")))
    return j.select("vec_id", F.col("sub").cast("int").alias("sub"),
                    F.array_min(scored)["code"].cast("int").alias("code"))


def ann_ivfpq(embeddings: DataFrame, k: int = TOP_K,
              n_queries: int = N_QUERIES, n_cells: int = KM_K,
              nprobe: int = NPROBE) -> DataFrame:
    """IVF-PQ — the full FAISS-style composition and the realistic
    100 TB serving index: coarse-quantize into LEARNED k-means cells
    (broadcast centroids, map-side argmax — `kmeans_cells`, the same
    Lloyd job `ann_ivf_learned` wires in), PQ the RESIDUAL v−c of
    each vector, then answer queries by probing nprobe cells and
    scoring candidates entirely in the compressed domain.

    Centroids MUST be learned means here, not seeded raw vectors:
    the residual's magnitude is what the PQ codebook has to cover,
    and v−mean(cell) is small while v−(arbitrary corpus vector) is
    not — measured on this corpus, seeded coarse cells give 0.04
    recall@5 vs exact, learned cells 0.30 (matching pure-ADC
    `ann_pq_adc` while scoring only probed cells). Scoring:

        dot(q, v) = dot(q, c) + dot(q, r)
                  ≈ qctab[q, cell] + Σ_m dtab[q, m, code_m]

    — both tables are tiny broadcasts (n_queries·n_cells and
    n_queries·PQ_M·PQ_K rows) of FIXED-POINT ints, so the per-candidate
    work is PQ_M integer adds, the scoring groupBy is order-free, and
    the scan side carries code ids, never floats. Candidate count is
    bounded by probed-cell occupancy (the IVF claim) AND each
    candidate costs O(PQ_M) (the PQ claim). Residual recon bias is
    the accuracy trade; like ann_pq_adc, rank is by approximate dot.
    Tie-breaks (cell, code, neighbor) all go to the lower id,
    mirrored in the oracle."""
    from pyspark.sql import Window

    e = _vecs(embeddings)
    # cents feeds FOUR consumers (assign, residual fetch, probes,
    # qctab) and cb TWO (encode, dtab) — persist both tiny relations
    # so the Lloyd training DAGs materialize once, not per consumer
    cents = tracked_persist(kmeans_cells(embeddings, k=n_cells).select(
        "cell", "cv", F.sqrt(dot(F.col("cv"), F.col("cv"))).alias("c_norm")))
    cos_c = dot(F.col("v"), F.col("cv")) / (F.col("v_norm") * F.col("c_norm"))
    assigned = (e.join(F.broadcast(cents))
                 .select("vec_id", "v", "v_norm", "cell", cos_c.alias("cos_c"))
                 .groupBy("vec_id")
                 .agg(F.expr("max_by(cell, struct(cos_c, -cell))").alias("cell"),
                      F.first("v").alias("v")))
    # residuals feed codebook training (iterative) AND the encode —
    # persist so the coarse assignment isn't replayed per Lloyd pass
    res = tracked_persist(
        assigned.join(F.broadcast(cents.select("cell", "cv")), "cell")
                .select("vec_id", "cell",
                        F.zip_with("v", "cv", lambda a, b: a - b)
                         .alias("embedding")))
    cb = tracked_persist(pq_codebooks_rel(res))
    enc = _pq_assign(_subvectors(res), cb).select("vec_id", "sub", "code")

    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"))
    cos_qc = dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm"))
    wp = Window.partitionBy("query_id").orderBy(F.desc("cos_qc"), F.asc("cell"))
    probes = (q.join(F.broadcast(cents))
               .select("query_id", "cell", cos_qc.alias("cos_qc"))
               .withColumn("prn", F.row_number().over(wp))
               .where(F.col("prn") <= nprobe)
               .select("query_id", "cell"))

    qsubs = (q.select("query_id", F.explode(F.array(*[
                 F.struct(F.lit(m).alias("sub"),
                          F.slice(F.col("qv"), m * PQ_SUB + 1, PQ_SUB)
                           .alias("qsv"))
                 for m in range(PQ_M)])).alias("s"))
              .select("query_id", F.col("s.sub").alias("sub"),
                      F.col("s.qsv").alias("qsv")))
    dtab = (qsubs.join(cb, "sub")
                 .select("query_id", "sub", "code",
                         F.round(dot(F.col("qsv"), F.col("cv")) * PQ_SCALE)
                          .cast("bigint").alias("fp_tab")))
    qctab = (q.join(F.broadcast(cents.select("cell", "cv")))
              .select("query_id", "cell",
                      F.round(dot(F.col("qv"), F.col("cv")) * PQ_SCALE)
                       .cast("bigint").alias("fp_qc")))

    # (vec_id, cell) comes off the PERSISTED residual relation — the
    # unpersisted `assigned` would replay the coarse assignment here
    candv = (res.select("vec_id", "cell")
                .join(F.broadcast(probes), "cell")
                .where(F.col("vec_id") != F.col("query_id")))
    scored = (candv.join(enc, "vec_id")
                   .join(F.broadcast(dtab), ["query_id", "sub", "code"])
                   .groupBy("query_id", "vec_id", "cell")
                   .agg(F.sum("fp_tab").alias("fp_res")))
    total = (scored.join(F.broadcast(qctab), ["query_id", "cell"])
                   .select("query_id", F.col("vec_id").alias("neighbor_id"),
                           (F.col("fp_qc") + F.col("fp_res")).alias("fp")))
    wr = Window.partitionBy("query_id").orderBy(F.desc("fp"), F.asc("neighbor_id"))
    return (total.withColumn("rnk", F.row_number().over(wr))
                 .where(F.col("rnk") <= k)
                 .select("query_id", "neighbor_id",
                         F.round(F.col("fp") / float(PQ_SCALE), 6)
                          .alias("approx_dot"),
                         F.col("rnk").cast("int").alias("rnk")))


# --- incremental graph maintenance -------------------------------------------
# New vectors join an EXISTING navigable graph without a rebuild —
# how every deployed graph index absorbs writes (HNSW inserts by
# searching itself, Malkov & Yashunin 2018 §Alg.1; DiskANN's
# FreshVantage/streaming variant batches the same move): beam-walk
# the base graph from each new vector and adopt the walk's best k as
# the node's out-edges. Batch-parallel form: every new vector walks
# the SAME frozen base graph (sequential insert — each insert seeing
# its predecessors — is order-dependent and serializes; the parallel
# form is deterministic and embarrassingly parallel, at the cost of
# no new-new edges inside one batch, which the next rebuild or batch
# picks up).

INSERT_NUM, INSERT_DEN = 9, 10  # existing : corpus = 9 : 10


def _insert_split(embeddings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(existing, new) — the first ⌊9n/10⌋ vec_ids are the indexed
    base, the rest the arriving batch. The cutoff rides as a 1-row
    broadcast (no driver-side count).

    Precondition (repo-wide id convention): vec_ids are DENSE
    0..n-1 — the count-based cutoff assumes it (sparse ids would
    skew the 90/10 split, and `knn_graph_insert_recall`'s sample
    window `vec_id < cutoff + n_sample` could then select fewer than
    n_sample nodes). The DuckDB oracle mirrors the same convention
    exactly, so this is a documented assumption, not a divergence."""
    cut = embeddings.agg(
        F.expr(f"count(*) * {INSERT_NUM} div {INSERT_DEN}")
         .cast("bigint").alias("cutoff"))
    e = embeddings.crossJoin(F.broadcast(cut))
    cols = embeddings.columns
    old = e.where(F.col("vec_id") < F.col("cutoff")).select(*cols)
    new = e.where(F.col("vec_id") >= F.col("cutoff")).select(*cols)
    return old, new


# ef-construction width coefficient: beam = max(BEAM_EF,
# INSERT_BEAM_COEF·⌊log2 n⌋). r12 shipped 2 and measured the residual
# density decay 0.64/0.58/0.38 at sf0.001/0.01/0.1 — the sweep showed
# width is the lever (capture 0.34/0.58/0.80 at beam 8/16/32, sf0.01)
# and HNSW's efConstruction sits FAR above 2·log2 n (typically a
# fixed 100-200). r13 raises the coefficient to 4: the scaled default
# becomes 32 at sf0.001/0.01 and 40 at sf0.1, and MEASURED capture at
# the default went 0.64/0.58/0.38 → 0.90/0.80/0.58 across
# sf0.001/0.01/0.1 — still logarithmic growth, 2× the frontier
# constant, bracketed by INSERT_BEAM_CURVE's oracle-checked rows.
INSERT_BEAM_COEF = 4


def insert_beam_params(base: DataFrame) -> DataFrame:
    """1-row (_beam int) relation: the insert walk's ef-construction
    width scaled with the BASE size — beam = max(BEAM_EF,
    INSERT_BEAM_COEF·⌊log2 n⌋), integer-exact in both engines via
    binary-string length (the `lsh_bits_for` discipline; no float
    log anywhere). Rationale is HNSW's scaled ef: the r11 fixed-width
    walk's MEASURED capture fell with corpus density (0.58 at
    sf0.001 → 0.34 at sf0.01 at beam 8) because a denser corpus
    packs more near-ties into the same frontier; the r12 beam sweep
    measured capture 0.34 → 0.58 → 0.80 at beam 8/16/32 over sf0.01
    with steps saturated at 6 — width, not depth, is the lever (see
    INSERT_BEAM_COEF for the r13 coefficient calibration). Growth is
    logarithmic so the per-round frontier broadcast stays ≤
    COEF·⌊log2 n⌋·|batch| rows at any scale. Rides the DAG as a
    broadcast (no driver collect); the oracle replays it as
    `greatest(BEAM_EF, COEF*(length(bin(count(*)))-1))`."""
    bl = F.length(F.bin(F.expr("count(1)"))) - F.lit(1)
    return base.agg(
        F.greatest(F.lit(BEAM_EF), F.lit(INSERT_BEAM_COEF) * bl)
         .cast("int").alias("_beam"))


def _insert_seeds(old: DataFrame, newq: DataFrame,
                  nprobe: int = GRAPH_NPROBE,
                  members: DataFrame | None = None) -> DataFrame:
    """(query_id, node): per arriving vector, its walk ENTRY points —
    the minimum-id PRIMARY member of each of the vector's `nprobe`
    best BASE cells (the coarse structure the index already
    maintains: `_ivf_probed_rel` ranks the frozen base's cells for
    the new vectors under the same scale-aware two-level scheme),
    plus node 0 as the connectivity fallback (a probed cell can in
    principle hold no primary member — the seed join must never
    leave a query with an empty frontier). DISTINCT so the initial
    frontier carries no duplicate (query, node) rows.

    This is the r12 capture fix: seeding from the fixed entry made
    every insert walk traverse from node 0's island outward, and the
    measured capture fell with corpus density (0.58 at sf0.001 →
    0.34 at sf0.01 at the same walk budget); cell-local seeds start
    the walk inside the query's own neighborhood, which is exactly
    HNSW's upper-layer descent shortcut expressed with the structure
    an IVF-backed index already has."""
    probes = _ivf_probed_rel(
        old, newq.select(F.col("query_id").alias("vec_id"),
                         F.col("qv").alias("v"),
                         F.col("q_norm").alias("v_norm")), nprobe)
    if members is None:
        # `members` (r14 opt): callers holding a persisted
        # `_ivf_probed(old)` pass its prn=1 slice — bit-identical to
        # this assignment (pytest-pinned) without re-running it
        members = _ivf_assigned_auto(old).select("vec_id", "cell")
    minm = members.groupBy("cell").agg(F.min("vec_id").alias("node"))
    return (probes.select(F.col("vec_id").alias("query_id"), "cell")
            .join(minm, "cell").select("query_id", "node")
            .unionByName(newq.select(
                "query_id", F.lit(0).cast("long").alias("node")))
            .distinct())


def knn_graph_insert(embeddings: DataFrame, k: int = KNN_K,
                     steps: int = GS_STEPS,
                     beam: int | None = None) -> DataFrame:
    """INCREMENTAL INDEX MAINTENANCE: wire the arriving 10% of
    vectors into the multi-probe navigable graph built over the
    other 90% — beam-walk the frozen base graph from each new vector
    (the walk machinery of `ann_beam_search` with the new vectors as
    the query relation, seeded from each vector's own multi-probe
    cells per `_insert_seeds` — r12; the r11 fixed-entry walk's
    capture fell with corpus density) and emit each node's k best
    walk endpoints as its out-edges (query_id→vec_id renamed:
    these ARE graph edges now, `knn_graph`'s schema). No rebuild:
    construction cost is ONE walk per new vector over the persisted
    base edge relation — rounds × |batch|, independent of base
    corpus size — vs re-running the full O(n·k) construction.
    `knn_graph_insert_recall` measures edge quality vs the exact
    k-NN of the same nodes (the walk's candidate-capture rate).

    Scale shape: the base edge relation is built once and persisted
    (≤ 2k·0.9n rows); each round broadcasts ≤ beam·|batch| frontier
    rows against it. The insert batch never joins the corpus
    directly — only the graph and the |cells|-bounded coarse
    structure (seed selection). SCALE CONTRACT: the per-round
    broadcast is bounded by beam·|batch|, so the INSERT BATCH SIZE is
    the deployment's lever — a production intake bounds each batch
    (say ≤1M rows into a 10B-vector base) and runs batches serially;
    the 10% split here is the measurement fixture, not a claim that
    an unbounded batch broadcasts (past broadcast limits, drop the
    explicit broadcast hint and let AQE pick a shuffled join on
    src — the walk stays rounds × linear either way).

    `beam=None` (the default) scales the frontier width with the
    base size (`insert_beam_params`: max(BEAM_EF,
    INSERT_BEAM_COEF·⌊log2 n⌋) as a
    1-row broadcast) — the r12 fix for the r11-measured capture
    decay at fixed width (see `insert_beam_params` for the measured
    sweep); an explicit int pins the width (the walk-budget debug
    path)."""
    from pyspark.sql import Window

    if beam is not None and beam < k:
        raise ValueError(
            f"beam ({beam}) must be >= k ({k}): the frontier holds at "
            "most beam rows per inserted node, so beam < k would "
            "silently emit fewer than k edges per node")
    if beam is None and BEAM_EF < k:
        # the scaled default's floor is BEAM_EF (insert_beam_params:
        # greatest(BEAM_EF, INSERT_BEAM_COEF·⌊log2 n⌋)); enforce the
        # same invariant on the default path so a future KNN_K bump
        # past BEAM_EF fails loudly instead of silently under-emitting
        raise ValueError(
            f"scaled-default beam floor BEAM_EF ({BEAM_EF}) must be "
            f">= k ({k})")
    old, new = _insert_split(embeddings)
    # ONE persisted multi-probe relation feeds BOTH the base-graph
    # construction and the seed membership (r14 opt, guide §1.2: the
    # prn=1 slice IS the coarse assignment, pytest-pinned bit-equal,
    # so the two-level assignment over the base ran twice for
    # nothing; measured 15.8 s → 8.3 s contended / 10.5 → ~7 s clean
    # at sf0.1, output identical)
    probes_old = _materialize(tracked_persist(_ivf_probed(old)))
    edges = _beam_nav_edges(old, und=_nprobe_und(old, probes=probes_old))
    newq = _vecs(new).select(F.col("vec_id").alias("query_id"),
                             F.col("v").alias("qv"),
                             F.col("v_norm").alias("q_norm"))
    beam_rel = (tracked_persist(insert_beam_params(old))
                if beam is None else None)
    seeds = tracked_persist(_insert_seeds(
        old, newq,
        members=probes_old.where(F.col("prn") == 1).select("vec_id", "cell")))
    # the base edge relation and the seed relation are independent
    # given the shared probe relation — overlap their builds (guide
    # §2.6; measured 8.2 → 7.0 s, output identical)
    _concurrent_build([lambda: _materialize(edges),
                       lambda: _materialize(seeds)])
    cur = _beam_frontier(old, steps, 0, beam if beam is not None else 0,
                         queries=newq, edges=edges,
                         seeds=seeds,
                         beam_rel=beam_rel)
    w = Window.partitionBy("query_id").orderBy(F.desc("cur_cos"),
                                               F.asc("node"))
    return (cur.withColumn("rnk", F.row_number().over(w))
               .where(F.col("rnk") <= k)
               .select(F.col("query_id").alias("vec_id"),
                       F.col("node").alias("nbr_id"),
                       F.col("rnk").cast("int").alias("rnk"),
                       F.round("cur_cos", 6).alias("cos_sim")))


def knn_graph_insert_recall(embeddings: DataFrame, k: int = KNN_K,
                            steps: int = GS_STEPS,
                            beam: int | None = None,
                            n_sample: int = N_QUERIES) -> DataFrame:
    """Insert-quality measurement: for the first `n_sample` inserted
    nodes, |walk-adopted edges ∩ exact k-NN vs the base corpus| —
    the capture rate of incremental insertion against what a full
    rebuild would have given those nodes. The exact reference is
    computed ONLY for the sampled nodes (n_sample·|base| pairs — a
    measurement rung, never a corpus-quadratic join).

    MEASURED (r12, after the multi-probe seeding + log2-scaled beam
    rework): 32/50 (0.64) at sf0.001, 29/50 (0.58) at sf0.01, 19/50
    (0.38) at sf0.1 — the r11 fixed-entry/fixed-width walk read 0.58
    / 0.34 / unmeasured, so the rework bought +0.24 at sf0.01 at the
    same asymptotic cost. The r12 sweep isolated WIDTH as the lever
    (beam 8/16/32 → 0.34/0.58/0.80 at sf0.01; steps saturate at 6;
    seeding alone moved nothing at fixed width) — the scaled default
    (`insert_beam_params`) spends INSERT_BEAM_COEF·⌊log2 n⌋ (4·, raised
    from r12's 2· — see INSERT_BEAM_COEF), and the residual
    density decay is the honest record of what logarithmic width
    buys (a deployment wanting flat capture pays a larger constant —
    beam 48 measured 0.64 at sf0.1)."""
    ins = knn_graph_insert(embeddings, k, steps, beam)
    old, new = _insert_split(embeddings)
    cut = embeddings.agg(
        F.expr(f"count(*) * {INSERT_NUM} div {INSERT_DEN}")
         .cast("bigint").alias("cutoff"))
    sample = (new.crossJoin(F.broadcast(cut))
                 .where(F.col("vec_id") < F.col("cutoff") + n_sample))
    sq = _vecs(sample).select(F.col("vec_id").alias("sid"),
                              F.col("v").alias("sv"),
                              F.col("v_norm").alias("s_norm"))
    ev = _vecs(old)
    from pyspark.sql import Window
    cos = dot(F.col("sv"), F.col("v")) / (F.col("s_norm") * F.col("v_norm"))
    w = Window.partitionBy("sid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    exact = (ev.crossJoin(F.broadcast(sq))
               .select("sid", "vec_id", cos.alias("cos_raw"))
               .withColumn("rnk", F.row_number().over(w))
               .where(F.col("rnk") <= k)
               .select(F.col("sid").alias("eq"),
                       F.col("vec_id").alias("en")))
    got = ins.join(F.broadcast(exact.select("eq").distinct()),
                   ins["vec_id"] == F.col("eq"), "left_semi")
    hit = got.join(F.broadcast(exact), (F.col("vec_id") == F.col("eq"))
                   & (F.col("nbr_id") == F.col("en")), "left_semi")
    n_hits = hit.agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    n_s = got.agg(F.countDistinct("vec_id").cast("int").alias("n_inserted"))
    return (n_hits.crossJoin(F.broadcast(n_s))
            .select("n_inserted", F.lit(int(k)).cast("int").alias("k"),
                    "n_hits",
                    F.expr(f"n_hits * 1000000 div (n_inserted * {int(k)})")
                     .cast("bigint").alias("recall_ppm")))


# fixed ef-construction widths for the insert curve — brackets the
# log2-scaled default (with INSERT_BEAM_COEF=4: 32 at sf0.001/0.01's
# 450-vector bases, 40 at sf0.1's 1800); 48 joined in r13 so the
# deployment-scale width has an oracle-checked capture row ABOVE the
# default, not just below it; 64 joined in r14 (the r13 verdict's
# task 5) to extend the sf0.1 capture-vs-width relation PAST the
# 48 bracket — whether the log-width law saturates or keeps paying
# at deployment densities is now a measured point, not a question
# (the bench's insert_capture section records the curve at sf0.1)
INSERT_BEAM_CURVE = (8, 16, 32, 48, 64)


def knn_graph_insert_curve(embeddings: DataFrame, k: int = KNN_K,
                           steps: int = GS_STEPS,
                           n_sample: int = N_QUERIES) -> DataFrame:
    """The insert-tuning trade-off as ONE oracle-checked relation
    (the `ann_beam_curve` discipline applied to index maintenance):
    one labeled capture row per fixed ef-construction width in
    `INSERT_BEAM_CURVE` — what an index operator reads to budget
    insert cost against edge quality, and the formalization of the
    r12 sweep that picked the shipped log2-scaled default (measured
    0.34/0.58/0.80 at beam 8/16/32 over sf0.01; WIDTH is the capture
    lever — steps saturate at 6 and seeding alone moves nothing at
    fixed width; see `insert_beam_params`).

    Scale shape: each width re-runs the full insert chain exactly as
    the oracle's self-contained blocks do — a measurement rung run
    at tuning time, never in the serving path. The chains are fully
    independent (each builds its own persisted base graph), so they
    are constructed concurrently (r14 opt, _concurrent_build)."""
    rows = _concurrent_build([
        (lambda bb: lambda:
            knn_graph_insert_recall(embeddings, k, steps, beam=bb,
                                    n_sample=n_sample)
            .select(F.lit(int(bb)).cast("int").alias("beam"),
                    "n_inserted", "k", "n_hits", "recall_ppm"))(b)
        for b in INSERT_BEAM_CURVE])
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- DiskANN-style compressed-domain graph walk ------------------------------
# The composition a disk-resident graph index actually runs (Jayaram
# Subramanya et al., NeurIPS'19 "DiskANN"): navigate the beam walk
# with CHEAP compressed distances — PQ code positions ride the edge
# relation, PQ_M small ints per neighbor instead of DIM doubles, so
# the walk's working set shrinks ~(DIM·8)/(PQ_M·4)-fold and the
# navigation structure stays memory-resident at 100 TB — then re-rank
# ONLY the final frontier with exact full-precision vectors (the
# "fetch from SSD" step, bounded by beam·n_queries rows, never the
# corpus). Integer fixed-point ADC scores also make every walk
# ranking tie-break EXACT across engines: no float-order question
# anywhere inside the rounds.


def _pq_cb_pos(cb: DataFrame) -> DataFrame:
    """Codebook with a DENSE per-subspace position (row_number over
    code, 0-based): Lloyd can drop a code that loses all its members
    (`pq_codebooks_rel`), leaving code ids SPARSE, so positional
    array lookups must go through this rank — the per-query tables
    and the per-vector code arrays both index by `pos`, derived from
    the same (sub, code) ordering in both engines."""
    from pyspark.sql import Window

    w = Window.partitionBy("sub").orderBy("code")
    return cb.select("sub", "code", "cv",
                     (F.row_number().over(w) - 1).alias("pos"))


def _pq_pos_arrays(embeddings: DataFrame, cbp: DataFrame) -> DataFrame:
    """(vec_id, pcodes: array<int>[PQ_M]) — each vector's PQ code
    POSITIONS ordered by subspace: the compressed payload the edge
    relation carries. Stateless encode (broadcast codebook, row-local
    argmin) + one tiny broadcast join to the dense position; the
    groupBy packs PQ_M rows per vector (array_sort on struct(sub, …)
    makes collect_list arrival order irrelevant; subs are unique)."""
    enc = pq_encode(embeddings, cbp.select("sub", "code", "cv"))
    j = enc.join(F.broadcast(cbp.select(F.col("sub").cast("int").alias("sub"),
                                        F.col("code").cast("int").alias("code"),
                                        "pos")),
                 ["sub", "code"])
    return (j.groupBy("vec_id")
             .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("sub", "pos"))),
                  lambda s: s["pos"]).alias("pcodes")))


def _pq_query_tabs(embeddings: DataFrame, cbp: DataFrame,
                   n_queries: int,
                   queries: DataFrame | None = None) -> DataFrame:
    """(query_id, tabs: array<array<bigint>>) — the per-query ADC
    lookup table as ONE nested array row: tabs[sub][pos] =
    round(dot(q_sub, c_{sub,pos}) · PQ_SCALE). ≤ n_queries rows of
    PQ_M·PQ_K ints; broadcasts into every walk round. With `queries`
    (raw embedding schema — the streaming twin's micro-batch), the
    table is built for exactly those rows instead of the id-filtered
    corpus prefix."""
    if queries is not None:
        q = _subvectors(queries).select(
            F.col("vec_id").alias("query_id"), "sub",
            F.col("sv").alias("qsv"))
    else:
        e = _subvectors(embeddings)
        q = (e.where(F.col("vec_id") < n_queries)
              .select(F.col("vec_id").alias("query_id"), "sub",
                      F.col("sv").alias("qsv")))
    d = (q.join(F.broadcast(cbp), "sub")
          .select("query_id", "sub", "pos",
                  F.round(dot(F.col("qsv"), F.col("cv")) * PQ_SCALE)
                   .cast("bigint").alias("fp")))
    per_sub = (d.groupBy("query_id", "sub")
                .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "fp"))),
                     lambda s: s["fp"]).alias("tab")))
    return (per_sub.groupBy("query_id")
                   .agg(F.transform(
                        F.array_sort(F.collect_list(F.struct("sub", "tab"))),
                        lambda s: s["tab"]).alias("tabs")))


def _adc_fp(tabs: Column, pcodes: Column) -> Column:
    """Σ_m tabs[m][pcodes[m]] as one UNROLLED codegen expression —
    PQ_M integer adds per candidate row, no HOF (the measured r11
    anti-lesson in `_ivf_probed`: interpreted HOFs lose when the
    arithmetic dominates). element_at is 1-based; pos is 0-based."""
    terms = [F.element_at(F.element_at(tabs, m + 1),
                          F.element_at(pcodes, m + 1) + 1)
             for m in range(PQ_M)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _beam_pq_edges(und_graph: DataFrame, pa: DataFrame) -> DataFrame:
    """(src, nbr_id, pcodes) — the bidirected multi-probe navigation
    edges with the NEIGHBOR'S code positions attached instead of its
    raw vector: the DiskANN layout. ≤ 2k·n edges of PQ_M ints each
    (vs `_beam_nav_edges`' DIM doubles)."""
    return tracked_persist(
        und_graph.join(pa.select(F.col("vec_id").alias("_nid"), "pcodes"),
                       und_graph["nbr_id"] == F.col("_nid"))
                 .select("src", "nbr_id", "pcodes"))


def pq_walk_index(embeddings: DataFrame,
                  und: DataFrame | None = None):
    """(cbp, pa, edges) — the DiskANN navigation INDEX built once
    from the static corpus, all three persisted: dense-position
    codebook, per-vector code arrays, and the bidirected multi-probe
    edges carrying neighbor codes. The streaming serving twin builds
    this outside its foreachBatch loop so construction never re-runs
    per micro-batch (the `run_beam_serve_stream` discipline)."""
    cbp = tracked_persist(_pq_cb_pos(pq_codebooks_rel(embeddings)))
    pa = tracked_persist(_pq_pos_arrays(embeddings, cbp))
    if und is None:
        und = _nprobe_und(embeddings)
    edges = _beam_pq_edges(und, pa)
    return cbp, pa, edges


def _beam_pq_frontier(embeddings: DataFrame, steps: int,
                      n_queries: int, beam: int,
                      und: DataFrame | None = None,
                      queries: DataFrame | None = None,
                      index=None) -> DataFrame:
    """(query_id, node, cur_fp) after `steps` beam rounds ranked by
    fixed-point ADC score — `_beam_frontier` with the exact dot
    replaced by PQ_M integer table lookups. The per-(query, cand)
    dedup max is over bit-identical INTEGERS (pure function of the
    codes), so cross-engine determinism needs no float argument at
    all inside the walk. Pass `und` to reuse an already-built
    (src, nbr_id) graph, `index` (from `pq_walk_index`) to reuse the
    whole navigation structure, and `queries` (raw embedding schema)
    to serve an arriving batch instead of the corpus prefix."""
    from pyspark.sql import Window

    cbp, pa, edges = (index if index is not None
                      else pq_walk_index(embeddings, und))
    tabs = _pq_query_tabs(embeddings, cbp, n_queries, queries=queries)
    ent = tabs.withColumn(
        "node", F.when(F.col("query_id") == 0, F.lit(1)).otherwise(F.lit(0)))
    cur = (pa.join(F.broadcast(ent), pa["vec_id"] == ent["node"])
             .select("query_id", "tabs", "node",
                     _adc_fp(F.col("tabs"), F.col("pcodes")).alias("cur_fp")))
    w = Window.partitionBy("query_id").orderBy(F.desc("fp_raw"),
                                               F.asc("cand_id"))
    for _ in range(steps):
        moved = (edges.join(F.broadcast(cur.select("query_id", "tabs",
                                                   "node")),
                            edges["src"] == F.col("node"))
                 .where(F.col("nbr_id") != F.col("query_id"))
                 .select("query_id", "tabs",
                         F.col("nbr_id").alias("cand_id"),
                         _adc_fp(F.col("tabs"), F.col("pcodes"))
                          .alias("fp_raw")))
        stay = cur.select("query_id", "tabs",
                          F.col("node").alias("cand_id"),
                          F.col("cur_fp").alias("fp_raw"))
        # one exchange per round: hash(query_id) satisfies the dedup
        # grouping and the ranking window (see _beam_frontier)
        cur = (moved.unionByName(stay)
               .repartition("query_id")
               .groupBy("query_id", "cand_id")
               .agg(F.max("fp_raw").alias("fp_raw"),
                    F.first("tabs").alias("tabs"))
               .withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") <= beam)
               .select("query_id", "tabs",
                       F.col("cand_id").alias("node"),
                       F.col("fp_raw").alias("cur_fp"))
               .localCheckpoint(eager=True))
    return cur


# The PQ-domain SERVING width — the measured crossover from
# `ann_beam_pq_curve`: pq recall@5 15/25/32/42 per 50 at beam
# 8/16/32/64 (sf0.01), crossing the exact ef=8 walk's 41/50 exactly
# at 64 — where DiskANN's default L (64-128) says compressed routing
# lands. The serving pair (this op + its streaming twin) defaults
# here; BEAM_EF stays the exact-domain width (that curve saturates at
# 4-8) and the recall/curve relations keep their explicit ef=8 floor
# rows as measurements.
PQ_SERVE_BEAM = 64


def ann_beam_pq_topk(embeddings: DataFrame, k: int = TOP_K,
                     steps: int = GS_STEPS, n_queries: int = N_QUERIES,
                     beam: int = PQ_SERVE_BEAM,
                     und: DataFrame | None = None,
                     queries: DataFrame | None = None,
                     index=None) -> DataFrame:
    """DiskANN-style serving (Jayaram Subramanya et al., NeurIPS'19):
    beam-walk the multi-probe graph scoring candidates ONLY in the
    compressed PQ domain — edges carry PQ_M code positions, each
    candidate costs PQ_M integer adds against a broadcast per-query
    table — then re-rank the ≤ beam·n_queries final frontier rows
    with exact full-precision cosine and emit each query's k best as
    (query_id, neighbor_id, rnk, cos_sim), `ann_beam_topk`'s schema.

    Scale shape: identical to `ann_beam_topk` except the payload the
    walk joins and checkpoints per round is PQ_M ints instead of a
    DIM-double vector (~16× less navigation state at DIM=64/PQ_M=4 —
    the change that keeps the graph memory-resident at 100 TB), plus
    ONE bounded rerank join: broadcast the frontier ids onto a single
    corpus scan to fetch raw vectors (DiskANN's SSD fetch), exact
    cosine over ≤ beam·n_queries rows. `ann_beam_pq_recall` measures
    what compressed navigation costs vs the exact-scored walk.

    `queries` (raw embedding schema) + `index` (from `pq_walk_index`)
    are the streaming serving twin's parameters: arriving micro-batch
    rows walk the PREBUILT index — construction never re-runs per
    batch.

    Serves at `PQ_SERVE_BEAM` (=64) by default — the width its own
    curve (`ann_beam_pq_curve`) measured as the crossover where
    PQ-domain recall (42/50) first meets the exact ef=8 walk's
    (41/50); `ann_beam_pq_recall` keeps the explicit ef=8 row as the
    routing-bias floor measurement."""
    from pyspark.sql import Window

    if beam < k:
        raise ValueError(f"beam ({beam}) must be >= k ({k})")
    cur = _beam_pq_frontier(embeddings, steps, n_queries, beam, und=und,
                            queries=queries, index=index)
    e = _vecs(embeddings)
    if queries is not None:
        qv = _vecs(queries).select(F.col("vec_id").alias("query_id"),
                                   F.col("v").alias("qv"),
                                   F.col("v_norm").alias("q_norm"))
    else:
        qv = (e.where(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("qv"),
                       F.col("v_norm").alias("q_norm")))
    cand = (e.join(F.broadcast(cur.select("query_id", "node")),
                   e["vec_id"] == F.col("node"))
             .select("query_id", F.col("node").alias("neighbor_id"),
                     "v", "v_norm"))
    cos = dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"),
                                               F.asc("neighbor_id"))
    return (cand.join(F.broadcast(qv), "query_id")
                .select("query_id", "neighbor_id", cos.alias("cos_raw"))
                .withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= k)
                .select("query_id", "neighbor_id",
                        F.col("rnk").cast("int").alias("rnk"),
                        F.round("cos_raw", 6).alias("cos_sim")))


def ann_beam_pq_recall(embeddings: DataFrame, k: int = TOP_K,
                       steps: int = GS_STEPS, n_queries: int = N_QUERIES,
                       beam: int = BEAM_EF) -> DataFrame:
    """What compressed-domain NAVIGATION costs, measured: one labeled
    set-recall@k row for the exact-scored beam serve (`ann_beam_topk`)
    and one for the PQ-scored walk + exact rerank
    (`ann_beam_pq_topk`), both against the same exact ranking over
    the same graph, entry, rounds and width — so the delta is exactly
    the reconstruction bias's effect on ROUTING (the rerank already
    removes its effect on the final ordering). The index-tuning row a
    DiskANN deployment keeps next to its ef-search curve.

    MEASURED at sf0.01: exact_walk 41/50, pq_walk 15/50 — and 0.30
    is exactly `ann_pq_recall`'s pure-ADC recall on this corpus: on
    random-uniform (incompressible) vectors, compressed routing
    inherits the full reconstruction bias; the rerank can't recover
    candidates the walk never visited. Real embedding distributions
    (low intrinsic dimension) and production PQ_M sit far above this
    floor — the relation exists to MEASURE that gap, not to hide
    it."""
    exact = tracked_persist(
        ann_topk(embeddings, k=k, n_queries=n_queries)
        .select(F.col("query_id").alias("eq"),
                F.col("neighbor_id").alias("en")))

    def row(method: str, found: DataFrame) -> DataFrame:
        hit = found.join(F.broadcast(exact), (F.col("query_id") == F.col("eq"))
                         & (F.col("neighbor_id") == F.col("en")),
                         "left_semi")
        n_hits = hit.agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
        n_q = found.agg(F.countDistinct("query_id").cast("int")
                        .alias("n_queries"))
        return (n_hits.crossJoin(F.broadcast(n_q))
                .select(F.lit(method).alias("method"), "n_queries",
                        F.lit(int(k)).cast("int").alias("k"), "n_hits",
                        F.expr(f"n_hits * 1000000 div (n_queries * {int(k)})")
                         .cast("bigint").alias("recall_ppm")))

    # ONE graph construction for both walks — the comparison is
    # about SCORING, so sharing the structure is the honest setup;
    # it also removes the duplicate construction, which is noise at
    # toy scale (walks+training dominate) but the dominant cost at
    # scale (knn_graph_nprobe is the curve's heaviest builder).
    # r14 opt (guide §2.6, two layers of overlap, results identical):
    # graph construction and PQ training are independent, so their
    # materializations run concurrently; then the two walk chains'
    # eagerly-checkpointed rounds are built concurrently. Measured
    # 12.4 → 8.2 s (chains) → 7.2 s (+input overlap) at sf0.1.
    und = tracked_persist(_nprobe_und(embeddings))
    cbp = tracked_persist(_pq_cb_pos(pq_codebooks_rel(embeddings)))
    pa = tracked_persist(_pq_pos_arrays(embeddings, cbp))
    _concurrent_build([lambda: _materialize(und),
                       lambda: _materialize(pa)])
    index = (cbp, pa, _beam_pq_edges(und, pa))
    ex, pq = _concurrent_build([
        lambda: row("exact_walk",
                    ann_beam_topk(embeddings, k, steps, n_queries, beam,
                                  edges=_beam_nav_edges(embeddings,
                                                        und=und))),
        lambda: row("pq_walk",
                    ann_beam_pq_topk(embeddings, k, steps, n_queries, beam,
                                     index=index)),
    ])
    return ex.unionByName(pq)


# PQ-domain ef widths for the curve — DiskANN's actual serving lever
# (its L defaults to 64-128 where the exact-domain family saturates
# at 4-8); starts at BEAM_EF because serving k=5 needs beam >= k
PQ_BEAM_CURVE = (8, 16, 32, 64)


def ann_beam_pq_curve(embeddings: DataFrame, k: int = TOP_K,
                      steps: int = GS_STEPS,
                      n_queries: int = N_QUERIES) -> DataFrame:
    """The COMPRESSED-DOMAIN ef-search trade-off curve — what beam
    WIDTH buys back of the pure-ADC routing floor, measured (the r11
    verdict's open question after `ann_beam_pq_recall` recorded
    pq_walk 15/50 vs exact_walk 41/50 at the shared ef=8): one
    labeled set-recall@k row per PQ-domain width in `PQ_BEAM_CURVE`,
    plus the exact-scored walk at the ef=8 serving default as the
    CROSSOVER reference — the row pair a DiskANN deployment reads to
    pick L (its L defaults to 64-128 precisely because compressed
    routing needs width to compensate reconstruction bias; the
    exact-domain curve `ann_beam_curve` saturates at 4-8).

    MEASURED at sf0.01: pq_walk set recall@5 rises MONOTONICALLY
    with width — 15/50 → 25/50 → 32/50 → 42/50 over beam 8/16/32/64
    — and CROSSES the exact walk's ef=8 reading (41/50) at width 64:
    the reconstruction bias costs WIDTH, not reachability, on this
    corpus, and the crossover lands exactly where DiskANN's default
    L (64-128) says it should. A deployment picks: exact-domain
    ef=8 (DIM-double edge payloads) or PQ-domain ef=64 (PQ_M-int
    payloads, ~16× less navigation state) for the same recall.

    Scale shape: one shared graph construction (`_nprobe_und`) AND
    one shared compressed index (`pq_walk_index` — codebook, code
    arrays, code-carrying edges, all persisted) for all five walks;
    each PQ walk is rounds × (≤ beam·n_queries broadcast rows of
    PQ_M ints) — the widest width multiplies only the frontier,
    never the corpus-sized relations. (The oracle's CTE blocks each
    retrain the codebook — deterministic Lloyd, identical results,
    so sharing engine-side changes nothing but time.)"""
    exact = tracked_persist(
        ann_topk(embeddings, k=k, n_queries=n_queries)
        .select(F.col("query_id").alias("eq"),
                F.col("neighbor_id").alias("en")))

    def row(method: str, beam: int, found: DataFrame) -> DataFrame:
        hit = found.join(F.broadcast(exact), (F.col("query_id") == F.col("eq"))
                         & (F.col("neighbor_id") == F.col("en")),
                         "left_semi")
        n_hits = hit.agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
        n_q = found.agg(F.countDistinct("query_id").cast("int")
                        .alias("n_queries"))
        return (n_hits.crossJoin(F.broadcast(n_q))
                .select(F.lit(method).alias("method"),
                        F.lit(int(beam)).cast("int").alias("beam"),
                        "n_queries",
                        F.lit(int(k)).cast("int").alias("k"), "n_hits",
                        F.expr(f"n_hits * 1000000 div (n_queries * {int(k)})")
                         .cast("bigint").alias("recall_ppm")))

    # overlap the two independent input builds (graph vs PQ training —
    # the ann_beam_pq_recall move), then materialize the code-carrying
    # edge relation every concurrent width walk scans per round
    und = tracked_persist(_nprobe_und(embeddings))
    cbp = tracked_persist(_pq_cb_pos(pq_codebooks_rel(embeddings)))
    pa = tracked_persist(_pq_pos_arrays(embeddings, cbp))
    _concurrent_build([lambda: _materialize(und),
                       lambda: _materialize(pa)])
    index = (cbp, pa, _materialize(_beam_pq_edges(und, pa)))
    rows = _concurrent_build(
        [lambda: row("exact_walk", BEAM_EF,
                     ann_beam_topk(embeddings, k, steps, n_queries, BEAM_EF,
                                   edges=_beam_nav_edges(embeddings,
                                                         und=und)))]
        + [(lambda bb: lambda: row("pq_walk", bb,
                                   ann_beam_pq_topk(embeddings, k, steps,
                                                    n_queries, bb,
                                                    index=index)))(b)
           for b in PQ_BEAM_CURVE])
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- scalar quantization (SQ8) ----------------------------------------------
# The FOURTH production ANN index family next to sign-LSH, IVF, and
# PQ: per-dimension linear quantization to one byte (FAISS
# ScalarQuantizer QT_8bit). SQ8 is the middle of the memory/accuracy
# ladder — 8× smaller than float64 where PQ is 64×, but with
# per-DIMENSION reconstruction error bounded by (mx−mn)/2·255 instead
# of PQ's per-SUBSPACE codebook residual, so it needs no training
# iterations (one min/max pass) and typically ranks near-exactly.
# `ann_sq8_recall` measures exactly that trade on this corpus.
SQ_LEVELS = 255  # code range 0..255 → one byte per dimension


def sq_params(embeddings: DataFrame) -> DataFrame:
    """1-row (qp: array<struct<mn,mx>>) per-dimension quantization
    range learned from the corpus in ONE pass: posexplode to
    (dim, x) — fixed 16-byte rows — a map-side-combinable
    groupBy(dim) min/max, then the DIM-row result collapses to a
    single broadcastable array (array_sort on struct(dim,…) makes
    collect_list's arrival order irrelevant; dims are unique).
    Output is DIM structs however many vectors flow through — the
    same any-scale-fits-in-a-broadcast shape as PQ's codebooks."""
    comp = embeddings.select(
        F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("dim", "x"))
    st = comp.groupBy("dim").agg(F.min("x").alias("mn"),
                                 F.max("x").alias("mx"))
    return (st.agg(F.array_sort(F.collect_list(
                F.struct("dim", "mn", "mx"))).alias("s"))
              .select(F.transform("s", lambda r: F.struct(
                  r["mn"].alias("mn"), r["mx"].alias("mx"))).alias("qp")))


def sq8_encode_rel(embeddings: DataFrame,
                   params: DataFrame | None = None) -> DataFrame:
    """(vec_id, codes array<int>) — SQ8 encode: each dimension
    linearly mapped to an integer code 0..SQ_LEVELS over the corpus'
    per-dim [mn, mx] range. Row-local after the 1-row params
    broadcast — zero shuffle, zero state (the pq_encode property, so
    a streaming twin runs append-mode). The clamp only bites for
    vectors OUTSIDE the training range (the serving case: params are
    trained once, later data may exceed historical extremes); a
    degenerate dimension (mx == mn) encodes as 0. All arithmetic is
    token-identical in the DuckDB oracle — `(x−mn)/(mx−mn)·255`,
    round, clamp, int — and the rounded value is exactly integral, so
    Spark's truncating int cast and DuckDB's rounding one agree."""
    if params is None:
        params = sq_params(embeddings)
    v = F.col("embedding").cast("array<double>")
    code = F.zip_with(
        v, F.col("qp"),
        lambda x, p: F.when(
            p["mx"] > p["mn"],
            F.least(F.lit(SQ_LEVELS), F.greatest(F.lit(0), F.round(
                (x - p["mn"]) / (p["mx"] - p["mn"]) * SQ_LEVELS))))
         .otherwise(F.lit(0)).cast("int"))
    return (embeddings.join(F.broadcast(params))
            .select("vec_id", code.alias("codes")))


def sq8_encode(embeddings: DataFrame) -> DataFrame:
    """`sq8_encode_rel` exploded to (vec_id, dim, code) scalar rows
    for the compare harness (the pq_codebooks move)."""
    return (sq8_encode_rel(embeddings)
            .select("vec_id", F.posexplode("codes").alias("dim", "code"))
            .orderBy("vec_id", "dim"))


def _sq8_decoded(embeddings: DataFrame) -> DataFrame:
    """(vec_id, xh, xh_norm) — the dequantized corpus the asymmetric
    scorer scans: x̂[i] = mn[i] + code[i]·(mx[i]−mn[i])/255. In
    production the SCAN SIDE stores only the 1-byte codes (the 8×
    lever); decode is a row-local projection at read time, token-
    identical in the oracle so x̂ doubles match bitwise."""
    params = tracked_persist(sq_params(embeddings))
    enc = sq8_encode_rel(embeddings, params)
    xh = F.zip_with(
        F.col("codes"), F.col("qp"),
        lambda c, p: p["mn"] + c * (p["mx"] - p["mn"]) / F.lit(SQ_LEVELS))
    return (enc.join(F.broadcast(params))
               .select("vec_id", xh.alias("xh"))
               .select("vec_id", "xh",
                       F.sqrt(dot(F.col("xh"), F.col("xh"))).alias("xh_norm")))


def ann_sq8(embeddings: DataFrame, k: int = TOP_K,
            n_queries: int = N_QUERIES) -> DataFrame:
    """SQ8 top-k by asymmetric scoring: EXACT query floats against
    the dequantized corpus (queries are few and arrive raw; only the
    corpus pays the compression). Plan shape is `ann_topk`'s —
    broadcast queries × one corpus scan, per-query top-k window —
    with the scan side derived from 1-byte codes instead of raw
    floats. Rank is by approximate cosine; the reconstruction error
    this costs vs exact is measured per query by `ann_sq8_recall`."""
    from pyspark.sql import Window

    e = _vecs(embeddings)
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"))
    d = _sq8_decoded(embeddings).select(
        F.col("vec_id").alias("neighbor_id"), "xh", "xh_norm")
    j = d.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("qv"), F.col("xh")) / (F.col("q_norm") * F.col("xh_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"),
                                               F.asc("neighbor_id"))
    return (j.select("query_id", "neighbor_id", cos.alias("cos_raw"))
             .withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= k)
             .select("query_id", "neighbor_id",
                     F.round(F.col("cos_raw"), 6).alias("approx_cos"),
                     F.col("rnk").cast("int").alias("rnk")))


# --- Johnson-Lindenstrauss random projection ---------------------------------
# The third lever on the ANN cost ladder, ORTHOGONAL to quantization:
# where SQ8/PQ shrink bytes-per-dimension, a random projection
# shrinks the DIMENSION COUNT itself (JL lemma: pairwise distances
# survive k ~ O(log n / eps^2) random directions). At 100 TB the two
# compose — project 64→16 dims, then quantize the projection — and
# every downstream fold costs DIM/JL_DIM× less. Deterministic LCG
# directions shared with the oracle as literals (the HYPERPLANES
# move; seeds disjoint from the LSH range).
#
# Dimension budget is MEASURED, not guessed (sf0.01, capture of the
# exact top-5): direct top-5 in projected space reads 0.08 / 0.12 /
# 0.18 at 16/32/48 dims — dense-cluster corpora punish rank-by-
# projection hard — but as a SHORTLIST-100 stage the same
# projections capture 0.56 / 0.78 / 0.96. So the operator family is
# shaped like PQ's: project → shortlist → exact re-rank
# (`ann_jl_rerank`), at JL_DIM=32 = a 2× cut on every scan fold with
# 0.78 end-to-end recall, and `ann_jl_recall` keeps both stages'
# numbers honest.
JL_DIM = 32
JL_SHORTLIST = 100  # projected-space candidates re-ranked exactly per query


JL_MATRIX: list[list[float]] = [
    _lcg_floats(DIM, seed=9001 + j) for j in range(JL_DIM)
]


def _with_jl_matrix(df: DataFrame) -> DataFrame:
    """Attach the JL_DIM×DIM direction matrix as a `_jl` column via a
    broadcast single-row cross join (the `_with_hyperplanes` shape —
    one Arrow-shipped row instead of a ~1000-node literal tree)."""
    spark = df.sparkSession
    jdf = spark.createDataFrame([(JL_MATRIX,)], "_jl array<array<double>>")
    return df.crossJoin(F.broadcast(jdf))


def _jl_projected(embeddings: DataFrame) -> DataFrame:
    """(vec_id, pv[JL_DIM]) — each component one left-fold dot against
    a broadcast direction row; row-local, zero shuffle, and the fold
    is the shared `dot`, so the oracle's list_dot_product doubles
    match bitwise."""
    v = F.col("embedding").cast("array<double>")
    pv = F.transform(F.col("_jl"), lambda r: dot(v, r))
    return (_with_jl_matrix(embeddings)
            .select("vec_id", pv.alias("pv")))


def jl_project(embeddings: DataFrame) -> DataFrame:
    """`_jl_projected` exploded to (vec_id, dim, val) scalar rows for
    the compare harness (the sq8_encode move)."""
    return (_jl_projected(embeddings)
            .select("vec_id", F.posexplode("pv").alias("dim", "val"))
            .orderBy("vec_id", "dim"))


def _reduced_ann(projected: DataFrame, k: int, n_queries: int) -> DataFrame:
    """Top-k by cosine in a REDUCED space given (vec_id, pv) — the
    shared engine under `ann_jl` (random projection) and `ann_mrl`
    (prefix truncation): broadcast queries × one scan of the reduced
    vectors, per-query row_number window. Identical expression
    sequence for both families, so each oracle replays it."""
    from pyspark.sql import Window

    p = tracked_persist(projected.select(
        "vec_id", "pv", F.sqrt(dot(F.col("pv"), F.col("pv"))).alias("p_norm")))
    q = p.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("pv").alias("qp_v"),
        F.col("p_norm").alias("q_norm"))
    cand = p.select(F.col("vec_id").alias("neighbor_id"), "pv", "p_norm")
    j = cand.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("qp_v"), F.col("pv")) / (F.col("q_norm") * F.col("p_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"),
                                               F.asc("neighbor_id"))
    return (j.select("query_id", "neighbor_id", cos.alias("cos_raw"))
             .withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= k)
             .select("query_id", "neighbor_id",
                     F.round(F.col("cos_raw"), 6).alias("approx_cos"),
                     F.col("rnk").cast("int").alias("rnk")))


def _shortlist_exact_rerank(embeddings: DataFrame, short: DataFrame,
                            k: int, n_queries: int) -> DataFrame:
    """EXACT cosine re-rank of a (query_id, neighbor_id) shortlist —
    the shared second stage of every shortlist pipeline (JL, MRL):
    exact scoring touches shortlist·n_queries rows, never the corpus;
    the candidate ids broadcast back onto one corpus scan."""
    from pyspark.sql import Window

    e = _vecs(embeddings)
    qv = (e.where(F.col("vec_id") < n_queries)
           .select(F.col("vec_id").alias("query_id"),
                   F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")))
    cand = (e.join(F.broadcast(short), e.vec_id == short.neighbor_id)
             .select("query_id", "neighbor_id", "v", "v_norm"))
    j = cand.join(F.broadcast(qv), "query_id")
    cos = dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"),
                                               F.asc("neighbor_id"))
    return (j.select("query_id", "neighbor_id", cos.alias("cos_raw"))
             .withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= k)
             .select("query_id", "neighbor_id",
                     F.round(F.col("cos_raw"), 6).alias("cos_sim"),
                     F.col("rnk").cast("int").alias("rnk")))


def ann_jl(embeddings: DataFrame, k: int = TOP_K,
           n_queries: int = N_QUERIES) -> DataFrame:
    """Top-k by cosine IN THE PROJECTED SPACE — `ann_topk`'s
    broadcast-queries × one-scan plan with every fold 2× shorter
    (JL_DIM=32 vs DIM=64). Rank quality is what the JL lemma buys at
    this dimension budget, measured per query by `ann_jl_recall`;
    production composes this as a shortlist stage with exact re-rank
    (the ann_pq_rerank shape) once the corpus no longer fits raw."""
    return _reduced_ann(_jl_projected(embeddings), k, n_queries)


def ann_jl_rerank(embeddings: DataFrame, k: int = TOP_K,
                  n_queries: int = N_QUERIES,
                  shortlist: int = JL_SHORTLIST) -> DataFrame:
    """The production JL pipeline (the ann_pq_rerank shape with a
    dimension cut instead of quantization as the cheap stage):
    shortlist JL_SHORTLIST candidates per query in the projected
    space — a fixed budget, so its corpus share SHRINKS as data
    grows — then EXACT cosine re-rank of only those. Because the
    shortlist ranking IS `ann_jl`'s, re-rank recall ≥ direct recall
    by construction (pinned by pytest); measured 0.78 vs 0.12 at 32
    dims on sf0.01."""
    short = ann_jl(embeddings, k=shortlist, n_queries=n_queries).select(
        "query_id", "neighbor_id")
    return _shortlist_exact_rerank(embeddings, short, k, n_queries)


def ann_jl_recall(embeddings: DataFrame, k: int = TOP_K,
                  n_queries: int = N_QUERIES) -> DataFrame:
    """Measured recall@k of BOTH JL stages vs the exact top-k, per
    query (the ann_pq_recall habit) — the dimension-reduction rows of
    the index ladder: what ranking INSIDE the projected space costs
    (brutal on dense clusters: 0.12 at 32 dims) vs the
    shortlist+re-rank pipeline (0.78) — the table that justifies
    never serving direct projected-space ranks."""
    exact = ann_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id")
    jl = ann_jl(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_jl"))
    rr = ann_jl_rerank(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_rr"))
    j = (exact.join(jl, ["query_id", "neighbor_id"], "left")
              .join(rr, ["query_id", "neighbor_id"], "left"))
    return (j.groupBy("query_id")
             .agg(F.count(F.lit(1)).cast("int").alias("n_true"),
                  F.sum(F.coalesce(F.col("hit_jl"), F.lit(0)))
                   .cast("int").alias("n_jl"),
                  F.sum(F.coalesce(F.col("hit_rr"), F.lit(0)))
                   .cast("int").alias("n_rerank"))
             .select("query_id", "n_true", "n_jl", "n_rerank",
                     F.round(F.col("n_jl") / F.col("n_true"), 6)
                      .alias("recall_jl"),
                     F.round(F.col("n_rerank") / F.col("n_true"), 6)
                      .alias("recall_rerank")))


# graded-relevance rank quality (nDCG@k): discount weights
# 1/log2(i+1) precomputed as fixed-point LITERALS shared with the
# oracle (the BENFORD_EXPECTED move — no log2() runs at query time in
# either engine, so there is nothing libm-dependent to drift); the
# ideal DCG is a Python-computed integer constant because the gain
# scale (k+1−rank over the exact top-k) is fixed
def _ndcg_params(k: int) -> tuple[list[int], int]:
    """(per-rank fixed-point weights, ideal DCG) for a given k — the
    constants must be DERIVED from the call's k: a weight table fixed
    to TOP_K would silently NULL ranks past 5 for larger k and make a
    perfect k=3 ranking score ~0.45 against the k=5 ideal."""
    import math

    w = [round(1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)]
    idcg = sum((k + 1 - i) * w[i - 1] for i in range(1, k + 1))
    return w, idcg


NDCG_W_FP, NDCG_IDCG_FP = _ndcg_params(TOP_K)


def ann_ivf_ndcg(embeddings: DataFrame, k: int = TOP_K,
                 n_queries: int = N_QUERIES) -> DataFrame:
    """nDCG@k of the IVF probe ranking against the exact cosine
    top-k — the RANK-QUALITY row of the index evaluation harness,
    complementing the recall@k family: recall says how many true
    neighbors an index finds, nDCG says whether it puts the BEST ones
    first (an index that finds all five but inverts their order
    serves worse RAG contexts than one that nails the top two).
    Gain = k+1 − exact_rank for hits, 0 for non-neighbors; weights
    are the fixed-point 1/log2(i+1) literals; per-query DCG is an
    integer sum, so the only FP op is the final ideal-DCG division.

    Scale shape: both rankings are the existing broadcast-query
    operators; the join is (query_id, neighbor_id)-keyed over
    ≤ k·n_queries rows; one query-keyed aggregate."""
    w_fp, idcg_fp = _ndcg_params(k)
    exact = ann_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id",
        (F.lit(k + 1) - F.col("rnk")).alias("gain"))
    appr = ann_ivf(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", "rnk")
    w = F.lit(None).cast("bigint")
    for i, wf in enumerate(w_fp, start=1):
        w = F.when(F.col("rnk") == i, F.lit(wf)).otherwise(w)
    j = (appr.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
             .select("query_id",
                     (F.coalesce("gain", F.lit(0)) * w).alias("gw")))
    per = j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_ranked"),
        F.sum("gw").alias("dcg_fp"))
    return per.select(
        "query_id", "n_ranked", "dcg_fp",
        F.round(F.col("dcg_fp") / F.lit(idcg_fp), 6).alias("ndcg"))


# --- Matryoshka (prefix-truncation) dimension reduction ----------------------
# MRL-trained embeddings (Kusupati et al., NeurIPS'22) nest coarse
# representations in their PREFIX dims, so production stacks serve the
# first d components as the cheap stage — no projection matrix at all,
# just a slice: zero extra state to ship, and the truncated vector is
# a physical prefix of the stored one (column pruning reads less).
# Same pipeline shape as JL: truncate → shortlist → exact re-rank,
# with `ann_mrl_recall` keeping both stages' numbers honest. (The
# synthetic corpus is NOT MRL-trained, so the measured direct recall
# quantifies what truncating untrained embeddings costs — the honest
# baseline an MRL-trained model is compared against.)
#
# Measured at sf0.01 (2000 vectors, 16 of 64 dims): direct
# truncated-space top-5 recall 0.08 — untrained prefixes carry no
# privileged signal, as expected — vs 0.68 for shortlist-100 +
# exact re-rank. Same story as JL-16's 0.56: never serve the reduced
# rank directly; the re-rank stage is the pipeline.
MRL_DIM = 16
MRL_SHORTLIST = 100


def _mrl_truncated(embeddings: DataFrame) -> DataFrame:
    """(vec_id, pv[MRL_DIM]) — the vector's first MRL_DIM components.
    Row-local slice, zero shuffle, no matrix state."""
    v = F.col("embedding").cast("array<double>")
    return embeddings.select("vec_id", F.slice(v, 1, MRL_DIM).alias("pv"))


def ann_mrl(embeddings: DataFrame, k: int = TOP_K,
            n_queries: int = N_QUERIES) -> DataFrame:
    """Top-k by cosine in the TRUNCATED space (first MRL_DIM dims) —
    every scan fold DIM/MRL_DIM = 4× cheaper; rank quality measured
    by `ann_mrl_recall`. Shares `_reduced_ann` with the JL family."""
    return _reduced_ann(_mrl_truncated(embeddings), k, n_queries)


def ann_mrl_rerank(embeddings: DataFrame, k: int = TOP_K,
                   n_queries: int = N_QUERIES,
                   shortlist: int = MRL_SHORTLIST) -> DataFrame:
    """The production MRL pipeline: shortlist in the truncated space
    (fixed budget), exact re-rank of only the shortlist — the
    ann_jl_rerank shape with a slice instead of a projection as the
    cheap stage. Re-rank recall ≥ direct recall by construction
    (the shortlist ranking IS `ann_mrl`'s; pytest-pinned)."""
    short = ann_mrl(embeddings, k=shortlist, n_queries=n_queries).select(
        "query_id", "neighbor_id")
    return _shortlist_exact_rerank(embeddings, short, k, n_queries)


def ann_mrl_recall(embeddings: DataFrame, k: int = TOP_K,
                   n_queries: int = N_QUERIES) -> DataFrame:
    """Measured recall@k of BOTH MRL stages vs the exact top-k, per
    query — the truncation rows of the index ladder next to JL's:
    what ranking inside the first-16-dims space costs vs the
    shortlist+re-rank pipeline, on embeddings that were NOT
    MRL-trained (the pessimistic bound)."""
    exact = ann_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id")
    mr = ann_mrl(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_mrl"))
    rr = ann_mrl_rerank(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_rr"))
    j = (exact.join(mr, ["query_id", "neighbor_id"], "left")
              .join(rr, ["query_id", "neighbor_id"], "left"))
    return (j.groupBy("query_id")
             .agg(F.count(F.lit(1)).cast("int").alias("n_true"),
                  F.sum(F.coalesce(F.col("hit_mrl"), F.lit(0)))
                   .cast("int").alias("n_mrl"),
                  F.sum(F.coalesce(F.col("hit_rr"), F.lit(0)))
                   .cast("int").alias("n_rerank"))
             .select("query_id", "n_true", "n_mrl", "n_rerank",
                     F.round(F.col("n_mrl") / F.col("n_true"), 6)
                      .alias("recall_mrl"),
                     F.round(F.col("n_rerank") / F.col("n_true"), 6)
                      .alias("recall_rerank")))


def ann_sq8_recall(embeddings: DataFrame, k: int = TOP_K,
                   n_queries: int = N_QUERIES) -> DataFrame:
    """Measured recall@k of SQ8 ranking vs the exact cosine top-k,
    per query (the ann_pq_recall habit) — the row that places SQ8 on
    the index ladder between exact floats and PQ: expect near-1.0
    here where ADC sits far lower, at 8× compression instead of 64×.
    Counts are integers, recall a rounded division — value-exact."""
    exact = ann_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id")
    sq = ann_sq8(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_sq"))
    j = exact.join(sq, ["query_id", "neighbor_id"], "left")
    return (j.groupBy("query_id")
             .agg(F.count(F.lit(1)).cast("int").alias("n_true"),
                  F.sum(F.coalesce(F.col("hit_sq"), F.lit(0)))
                   .cast("int").alias("n_sq8"))
             .select("query_id", "n_true", "n_sq8",
                     F.round(F.col("n_sq8") / F.col("n_true"), 6)
                      .alias("recall_sq8")))


# --- label-aware training-data ops ---------------------------------------------

OUTLIER_TOP = 5  # flagged farthest-from-centroid vectors per label


def hard_negatives(embeddings: DataFrame, k: int = TOP_K,
                   n_queries: int = N_QUERIES) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for
    each query vector, the top-k most-similar vectors with a
    DIFFERENT label — the highest-value negatives a triplet/InfoNCE
    batch builder wants (easy negatives teach nothing; the near-miss
    wrong-label neighbors carry the gradient). `ann_topk`'s broadcast
    queries × one corpus scan plan with the label inequality fused
    into the join predicate, so wrong-label filtering happens
    map-side before any ranking state exists; per-query top-k is the
    same rank window + lower-id tie-break."""
    from pyspark.sql import Window

    v = F.col("embedding").cast("array<double>")
    e = embeddings.select("vec_id", "label", v.alias("v"),
                          F.sqrt(dot(v, v)).alias("v_norm"))
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"), F.col("v_norm").alias("q_norm"))
    cand = e.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("neighbor_label"), "v", "v_norm")
    j = cand.join(F.broadcast(q),
                  F.col("neighbor_label") != F.col("query_label"))
    cos = dot(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"),
                                               F.asc("neighbor_id"))
    return (j.select("query_id", "query_label", "neighbor_id",
                     "neighbor_label", cos.alias("cos_raw"))
             .withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= k)
             .select("query_id", "query_label", "neighbor_id",
                     "neighbor_label",
                     F.round(F.col("cos_raw"), 6).alias("cos_sim"), "rnk"))


def label_outliers(embeddings: DataFrame, top: int = OUTLIER_TOP) -> DataFrame:
    """Mislabeled-point candidates (the CleanLab-flavored audit): the
    `top` vectors FARTHEST from their own label's centroid, per
    label — the rows a labeling-quality review queue surfaces first.

    Engine-determinism: centroids are per-dimension FIXED-POINT means
    (sum of round(v·1e6) bigints / n — the `kmeans_cells`
    discipline), and the distance is the token-identical composition
    d² = ⟨v,v⟩ − 2⟨v,c⟩ + ⟨c,c⟩ of the same left-fold dot both
    engines already agree on. Scale shape: one groupBy(label) with
    map-side partials builds the |labels|-row centroid relation,
    which BROADCASTS back onto the scan; the per-label top-n window
    partitions by label — no global sort, no pairwise join
    anywhere."""
    from pyspark.sql import Window

    scale = 1_000_000
    v = F.col("embedding").cast("array<double>")
    e = embeddings.select("vec_id", "label", v.alias("v"))
    sums = [F.sum(F.round(F.col("v")[i] * scale).cast("bigint")).alias(f"s{i}")
            for i in range(DIM)]
    cent = (e.groupBy("label").agg(*sums, F.count(F.lit(1)).alias("n"))
            .select("label", F.array(*[
                (F.col(f"s{i}") / float(scale)) / F.col("n")
                for i in range(DIM)]).alias("cv")))
    d2 = (dot(F.col("v"), F.col("v"))
          - 2 * dot(F.col("v"), F.col("cv"))
          + dot(F.col("cv"), F.col("cv")))
    w = Window.partitionBy("label").orderBy(F.desc("d2"), F.asc("vec_id"))
    return (e.join(F.broadcast(cent), "label")
             .select("label", "vec_id", d2.alias("d2"))
             .withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") <= top)
             .select("label", "vec_id", F.round(F.col("d2"), 6).alias("dist2"),
                     "rnk"))


def knn_graph_recall(embeddings: DataFrame, k: int = KNN_K) -> DataFrame:
    """Measured edge recall of the cell-blocked k-NN graph vs the
    exact k-NN graph on the bounded baseline slice (vec_id <
    BRUTE_MAX_ID) — the same measured-recall discipline every ANN
    rung carries (`ann_lsh_recall`, `ann_pq_recall`, ...): the
    blocking trades cross-cell edges away; this row prices that
    trade. One summary row: vectors, true edges, found edges,
    recall. Counts are integers, recall one rounded division."""
    from pyspark.sql import Window

    sl = embeddings.where(F.col("vec_id") < BRUTE_MAX_ID)
    e = _vecs(sl)
    a = e.select("vec_id", F.col("v").alias("va"), F.col("v_norm").alias("na"))
    b = e.select(F.col("vec_id").alias("nbr_id"),
                 F.col("v").alias("vb"), F.col("v_norm").alias("nb"))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_raw"), F.asc("nbr_id"))
    exact = (a.join(b, F.col("vec_id") != F.col("nbr_id"))
              .select("vec_id", "nbr_id", cos.alias("cos_raw"))
              .withColumn("rnk", F.row_number().over(w))
              .where(F.col("rnk") <= k)
              .select("vec_id", "nbr_id"))
    found = knn_graph(sl, k=k).select(
        "vec_id", "nbr_id", F.lit(1).alias("hit"))
    j = exact.join(found, ["vec_id", "nbr_id"], "left")
    return (j.agg(F.countDistinct("vec_id").cast("int").alias("n_vectors"),
                  F.count(F.lit(1)).cast("int").alias("n_true_edges"),
                  F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                   .cast("int").alias("n_found"))
             .select("n_vectors", "n_true_edges", "n_found",
                     F.round(F.col("n_found") / F.col("n_true_edges"), 6)
                      .alias("recall")))
