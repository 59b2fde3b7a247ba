"""CEP-style sequence detection — the reference's "Future
Enhancements: Add Flink CEP patterns for complex fraud sequences"
(README) realized Spark-first: sequence patterns over keyed
event-time order expressed as conditional window aggregates, so they
stay in whole-stage codegen instead of an NFA library.

Pattern implemented (card-testing burst): N+ small probe
transactions followed by a large one on the same card within a time
window — the classic stolen-card validation sequence the reference's
producer injects (transaction-kafka-producer.py:67-71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.functions import hashing as H
from real_time_fraud_detection_flink_kafka_spark.functions.transactions import (
    transactions_from_events,
)

SMALL_MAX = 10.0
LARGE_MIN = 200.0
SEQ_WINDOW_US = 24 * 3600 * 1_000_000
MIN_PROBES = 2


def cep_card_testing(events: DataFrame,
                     small_max: float = SMALL_MAX,
                     large_min: float = LARGE_MIN,
                     window_us: int = SEQ_WINDOW_US,
                     min_probes: int = MIN_PROBES) -> DataFrame:
    """Emit each large transaction preceded by >= min_probes small
    probes on the same card within the window. One shuffle on
    card_id; the pattern is a conditional RANGE-frame sum."""
    tx = transactions_from_events(events)
    w = (Window.partitionBy("card_id").orderBy("ts_us")
         .rangeBetween(-window_us, -1))  # strictly-preceding window
    probes = F.sum(
        F.when(tx["amount"] < small_max, 1).otherwise(0)
    ).over(w)
    df = tx.withColumn("n_probes", F.coalesce(probes, F.lit(0)).cast("bigint"))
    return (df.where((df["amount"] > large_min) & (df["n_probes"] >= min_probes))
              .select("event_id", "card_id", "amount", "n_probes", "ts_us"))


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join: customers with no URGENT order (the unfiltered
    variant is empty on this data — every customer has orders)."""
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (customer.join(urgent, customer["c_custkey"] == urgent["o_custkey"],
                          "left_anti")
                    .select("c_custkey", "c_name", "c_mktsegment"))


def customers_with_big_orders(customer: DataFrame, orders: DataFrame,
                              min_total: float = 400_000.0) -> DataFrame:
    """Semi join: customers having at least one order above min_total."""
    big = orders.where(F.col("o_totalprice") > min_total)
    return (customer.join(big, customer["c_custkey"] == big["o_custkey"],
                          "left_semi")
                    .select("c_custkey", "c_name", "c_acctbal"))


def customer_order_semijoins(customer: DataFrame, orders: DataFrame,
                             min_total: float = 400_000.0) -> DataFrame:
    """Anti + semi join coverage as ONE tagged relation: customers
    with no URGENT order (left_anti) unioned with customers having at
    least one order above min_total (left_semi). Both branches
    broadcast the filtered orders side — hinted explicitly so the
    plan shape holds above autoBroadcastJoinThreshold too (the
    filtered key set stays small even when raw orders does not)."""
    urgent = F.broadcast(orders.where(F.col("o_orderpriority") == "1-URGENT"))
    big = F.broadcast(orders.where(F.col("o_totalprice") > min_total))
    anti = (customer.join(urgent, customer["c_custkey"] == urgent["o_custkey"],
                          "left_anti")
                    .select(F.lit("anti_no_urgent").alias("join_type"),
                            "c_custkey", "c_name", "c_mktsegment"))
    semi = (customer.join(big, customer["c_custkey"] == big["o_custkey"],
                          "left_semi")
                    .select(F.lit("semi_big_order").alias("join_type"),
                            "c_custkey", "c_name", "c_mktsegment"))
    return anti.unionAll(semi)


def distinct_users_approx(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog distinct users per event_type (the at-scale
    companion to the exact count; sketch values are engine-specific →
    rows-only check, accuracy asserted in pytest)."""
    return (events.groupBy("event_type")
                  .agg(F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
                       F.count_distinct("user_id").alias("n_users_exact")))


KMV_K = 64
KMV_NORM = float(1 << 60)


def distinct_users_kmv(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-day approximate distinct users via a K-MINIMUM-VALUES
    sketch — the engine-PORTABLE alternative to HLL
    (`distinct_users_approx` stays rows-only because HLL registers
    are engine-internal; KMV is pure arithmetic on portable md5
    hashes, so this one is fully oracle-checked).

    Estimator: hash each user to (0,1); with fewer than k distinct
    hashes the count is exact, otherwise est = (k-1)/h_(k) (the k-th
    smallest hash). At scale the per-group state is the k smallest
    hashes — mergeable across partitions like any sketch; here the
    rank is computed with one window over the distinct hashes."""
    h = (H.md5_int60(F.col("user_id").cast("string")) / F.lit(KMV_NORM))
    d = (events.select(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                       h.alias("hv"))
               .distinct())
    w = Window.partitionBy("day").orderBy("hv")
    ranked = d.select(
        "day", "hv", F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("day")).alias("m"))
    est = F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("hk"))
    return (ranked.groupBy("day")
            .agg(F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("hk"),
                 F.max("m").alias("m"))
            .select("day", est.alias("n_users_est"))
            .orderBy("day"))


COINCIDENCE_US = 60 * 1_000_000  # pairs closer than 60 s


def coincident_events(events: DataFrame,
                      delta_us: int = COINCIDENCE_US) -> DataFrame:
    """Cross-user temporal-proximity pairs — the NON-EQUI range join
    (|t_b - t_a| < delta with no equi key at all) that backs
    coordinated-activity detection: two different users acting within
    the same delta window. The naive plan is a BroadcastNestedLoop
    cross join — O(n²) comparisons, a non-starter at scale.

    Scale shape — bin bucketing turns the range predicate into an
    equi key: events land in floor(ts/delta) bins; the right side
    emits (bin, bin-1) so every ordered pair with 0 <= gap < delta
    shares EXACTLY ONE join key (gap < delta bounds the later event
    to the earlier one's bin or the next — matching via bin when
    co-binned, via bin-1 when adjacent — so no distinct/dedup pass is
    needed). The join is a plain shuffled equi-join whose candidate
    count is sum over bins of |bin|·|adjacent|, i.e. rate²·delta —
    LINEAR in time span for steady event rates, vs n² for the nested
    loop. Hot bins (flash events) are ordinary skewed join keys: AQE
    skew-join splits them. Exactly-once membership: ties (gap = 0)
    break on event_id so each unordered pair appears once, as one
    ordered row (earlier first).

    The oracle is the plain inequality self-join — the binned plan
    must reproduce it row-exactly."""
    base = events.select("event_id", "user_id",
                         F.unix_micros("ts").alias("us"))
    left = base.withColumn("bin", F.floor(F.col("us") / F.lit(delta_us)))
    b_bin = F.floor(F.col("us_b") / F.lit(delta_us))
    right = (base.select(F.col("event_id").alias("event_b"),
                         F.col("user_id").alias("user_b"),
                         F.col("us").alias("us_b"))
                 .withColumn("bin", F.explode(F.array(b_bin, b_bin - 1))))
    gap = F.col("us_b") - F.col("us")
    return (left.join(right, "bin")
                .where((gap >= 0) & (gap < delta_us)
                       & ((F.col("us") < F.col("us_b"))
                          | (F.col("event_id") < F.col("event_b")))
                       & (F.col("user_id") != F.col("user_b")))
                .select(F.col("event_id").alias("event_a"),
                        F.col("event_b"),
                        F.col("user_id").alias("user_a"),
                        F.col("user_b"),
                        gap.alias("gap_us")))


PR_ITERS = 5
PR_DAMP = 0.85
PR_FP = 1_000_000_000  # fixed-point units for rank mass


def coincidence_pagerank(events: DataFrame,
                         n_iters: int = PR_ITERS,
                         damp: float = PR_DAMP) -> DataFrame:
    """PageRank over the coincidence graph — the iterative GRAPH
    algorithm beyond label propagation (`dedup_clusters` converges to
    components; this converges to a stationary rank): users are
    nodes, an edge joins every cross-user pair `coincident_events`
    emits, and n_iters synchronous power-iteration rounds yield the
    coordination-centrality ranking (who sits at the center of the
    temporally-clustered activity).

    Engine-exact iteration: rank mass lives in FIXED-POINT units
    (bigint 1e-9ths). Per round each node sends floor(units/degree)
    to every neighbor; the receive side SUMS INTEGERS (associative —
    partial-agg order cannot change the result), and the damped
    update floor(0.15·1e9/N) + floor(0.85·Σ) is the same IEEE double
    sequence in Spark and DuckDB, so 5 rounds of drift-free
    arithmetic replay exactly (the `kmeans_centroids` fixed-point
    move applied to Pregel). The symmetric edge set means no dangling
    nodes — every node has degree >= 1 in both directions, so no
    lost-mass redistribution term is needed.

    Scale shape: the classic Pregel round as TWO relational ops — one
    shuffle join (edges x ranks on src) and one groupBy(dst) with
    map-side combine; messages are 16-byte (id, units) rows, never
    adjacency lists. Edges and the degree relation are multi-round
    consumers, persisted once. n_iters is fixed → the whole run is
    n_iters stages of the same shape, the standard distributed
    PageRank schedule (GraphX/Pregel do exactly this under an RDD
    API)."""
    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist

    pairs = coincident_events(events).select("user_a", "user_b")
    edges = tracked_persist(
        pairs.select(F.col("user_a").alias("src"), F.col("user_b").alias("dst"))
             .unionAll(pairs.select(F.col("user_b").alias("src"),
                                    F.col("user_a").alias("dst")))
             .distinct())
    deg = edges.groupBy(F.col("src").alias("user_id")).agg(
        F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    nodes = tracked_persist(deg.crossJoin(F.broadcast(n)))
    pr = nodes.select(
        "user_id", "deg", "n",
        F.floor(F.lit(float(PR_FP)) / F.col("n")).alias("pr_units"))
    base = F.floor(F.lit(1.0 - damp) * F.lit(float(PR_FP)) / F.col("n"))
    for _ in range(n_iters):
        contrib = (edges.join(pr, edges["src"] == pr["user_id"])
                        .select(F.col("dst").alias("user_id"),
                                F.floor(F.col("pr_units") / F.col("deg"))
                                 .alias("c")))
        recv = contrib.groupBy("user_id").agg(F.sum("c").alias("s"))
        pr = (nodes.join(recv, "user_id")
                   .select("user_id", "deg", "n",
                           (base + F.floor(F.lit(damp) * F.col("s")))
                            .alias("pr_units")))
    return pr.select("user_id", "deg", "pr_units",
                     (F.col("pr_units") / F.lit(float(PR_FP))).alias("pr"))


def coincidence_triangles(events: DataFrame) -> DataFrame:
    """Triangle counts + local clustering coefficient per node of the
    coincidence graph — the densest-subgraph observability metric on
    top of the pair/component/rank family (a user whose neighbors
    also co-occur with EACH OTHER is a tight ring, not a hub).

    Scale shape — DEGREE-ORDERED triangle counting (the
    Suri-Vassilvitskii MapReduce algorithm): orient every undirected
    edge from the lower-(degree, id) endpoint to the higher, so each
    wedge is enumerated at its lowest-degree apex — the join fan-out
    per node is out-degree², bounded by the orientation instead of
    blowing up on hubs (a hub's edges point INTO it, so the hub
    enumerates no wedges). Wedges close against the directed edge
    set with one more equi-join; every triangle is found exactly
    once. Three shuffle joins total, all on node keys. The
    coefficient (2·T)/(deg·(deg−1)) is exact integer arithmetic and
    one IEEE division — engine-portable."""
    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist

    pairs = coincident_events(events).select("user_a", "user_b")
    und = (pairs.select(F.least("user_a", "user_b").alias("u"),
                        F.greatest("user_a", "user_b").alias("v"))
                .distinct())
    deg = tracked_persist(
        und.select(F.col("u").alias("user_id"))
           .unionAll(und.select(F.col("v").alias("user_id")))
           .groupBy("user_id").agg(F.count(F.lit(1)).alias("deg")))
    e = (und.join(deg.select(F.col("user_id").alias("u"),
                             F.col("deg").alias("deg_u")), "u")
            .join(deg.select(F.col("user_id").alias("v"),
                             F.col("deg").alias("deg_v")), "v"))
    lo_first = ((F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v"))
                   & (F.col("u") < F.col("v"))))
    dire = tracked_persist(e.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lo_first, F.col("deg_v")).otherwise(F.col("deg_u"))
         .alias("deg_dst")))
    e1 = dire.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                     F.col("deg_dst").alias("deg_b"))
    e2 = dire.select(F.col("src").alias("a"), F.col("dst").alias("c"),
                     F.col("deg_dst").alias("deg_c"))
    wedge = e1.join(e2, "a").where(
        (F.col("deg_b") < F.col("deg_c"))
        | ((F.col("deg_b") == F.col("deg_c")) & (F.col("b") < F.col("c"))))
    tri = wedge.join(dire.select(F.col("src").alias("b"),
                                 F.col("dst").alias("c")), ["b", "c"])
    tn = (tri.select(F.explode(F.array("a", "b", "c")).alias("user_id"))
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_tri")))
    out = deg.join(tn, "user_id", "left")
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0))
    lcc = F.when(F.col("deg") >= 2,
                 (F.lit(2) * n_tri) / (F.col("deg") * (F.col("deg") - 1))
                 ).otherwise(F.lit(0.0))
    return out.select("user_id", "deg", n_tri.alias("n_tri"),
                      lcc.alias("lcc"))


BLOOM_SIZES = [4096, 65536]  # m — measured as a sizing curve
BLOOM_K = 4            # hash functions
BLOOM_WORD = 32        # bits per word — 1 << 31 max keeps masks
                       # positive in both engines' int64 (no sign-bit
                       # portability edge at 1 << 63)


def _bloom_word_mask(col, j: int, m: int):
    """(word index, bit mask) of hash j for a key column under an
    m-bit filter. shiftleft takes only a literal count, so the mask
    is a 32-element lookup array indexed by the bit position
    (element_at is 1-based)."""
    masks = F.array(*[F.lit(1 << i).cast("bigint") for i in range(BLOOM_WORD)])
    bit = H.md5_int60(F.concat(F.lit(f"bloom{j}:"), col.cast("string"))) % m
    return (F.floor(bit / BLOOM_WORD).cast("bigint").alias("word"),
            F.element_at(masks, ((bit % BLOOM_WORD) + 1).cast("int"))
             .alias("mask"))


def bloom_membership(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Bloom-filter membership with the false-positive rate MEASURED
    per filter size — completing the sketch quartet (KMV/HLL:
    cardinality, count-min: frequency, fixed-bin histogram:
    quantiles, Bloom: membership), presented the `ann_recall_compare`
    way: one row per m showing how an underdimensioned filter's FPR
    collapses as m grows, so the sizing lever (m proportional to n)
    is demonstrated with numbers, not quoted from the formula. Build
    over the customer key set; member probes are the distinct user
    ids that ARE in that key set (semi-join — so zero false negatives
    is a structural guarantee of the filter, valid on ANY keying of
    the data, not an accident of user_id ⊆ custkey); non-member
    probes are user ids shifted past max(key) by a DATA-DERIVED
    offset (max(key) + 1 − min(user_id), a 1-row broadcast), so they
    are provably outside the key domain at every scale/re-key.

    Scale shape: each filter is m/32 word rows built by
    groupBy(word) + bit_or with map-side combine — mergeable bounded
    state, the same argument as the CMS counters; executors emit at
    most m/32 rows each no matter how many keys stream through. The
    probe side joins the broadcast filter on the word key; a probe is
    positive iff ALL k of its bits are set. All integer bit
    arithmetic end to end (portable md5 bits, 32-bit words so no
    int64 sign-bit edge) — filter contents AND verdict counts are
    value-exact between engines; the one division per row is the
    FPR."""
    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist

    # the key and probe relations are shared by EVERY point on the
    # sizing curve — computed and persisted once, so adding filter
    # sizes never rescans events/customer
    keys = tracked_persist(customer.select(F.col("c_custkey").alias("key")))
    users = tracked_persist(
        events.select(F.col("user_id").alias("probe")).distinct())
    shift = (keys.agg(F.max("key").alias("_maxk"))
                 .crossJoin(users.agg(F.min("probe").alias("_minp")))
                 .select((F.col("_maxk") + 1 - F.col("_minp"))
                         .alias("_shift")))
    members = users.join(keys.select(F.col("key").alias("probe")),
                         "probe", "semi")
    non_members = users.crossJoin(F.broadcast(shift)).select(
        (F.col("probe") + F.col("_shift")).alias("probe"))
    probes = tracked_persist(
        members.select("probe", F.lit(1).alias("is_member"))
               .unionAll(non_members.select(
                   "probe", F.lit(0).alias("is_member"))))
    out = None
    for m in BLOOM_SIZES:
        row = _bloom_one(keys, probes, m)
        out = row if out is None else out.unionAll(row)
    return out


def _bloom_one(keys: DataFrame, probes: DataFrame, m: int) -> DataFrame:
    # one scan of the key relation: all k (word, mask) pairs ride a
    # single explode (k unioned scans would re-read a 100 TB key set
    # k times)
    kw = keys.select(F.explode(F.array(*[
        F.struct(*_bloom_word_mask(F.col("key"), j, m))
        for j in range(BLOOM_K)])).alias("wm"))
    bloom = (kw.select(F.col("wm.word").alias("word"),
                       F.col("wm.mask").alias("mask"))
               .groupBy("word")
               .agg(F.bit_or("mask").alias("bits")))
    pw = probes.select("probe", "is_member", F.explode(F.array(*[
        F.struct(*_bloom_word_mask(F.col("probe"), j, m))
        for j in range(BLOOM_K)])).alias("wm"))
    hits = (pw.select("probe", "is_member",
                      F.col("wm.word").alias("word"),
                      F.col("wm.mask").alias("mask"))
              .join(F.broadcast(bloom), "word", "left")
              .select("probe", "is_member",
                      (F.coalesce(F.col("bits"), F.lit(0))
                       .bitwiseAND(F.col("mask")) == F.col("mask"))
                       .cast("int").alias("hit")))
    verdict = (hits.groupBy("probe", "is_member")
                   .agg((F.sum("hit") == BLOOM_K).cast("int").alias("pos")))
    agg = verdict.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("is_member").cast("bigint").alias("n_members"),
        F.sum("pos").cast("bigint").alias("n_bloom_pos"),
        F.sum(((F.col("is_member") == 0) & (F.col("pos") == 1)).cast("int"))
         .cast("bigint").alias("n_false_pos"),
        F.sum(((F.col("is_member") == 1) & (F.col("pos") == 0)).cast("int"))
         .cast("bigint").alias("n_false_neg"),
        (F.sum(((F.col("is_member") == 0) & (F.col("pos") == 1)).cast("int"))
         / F.sum((F.col("is_member") == 0).cast("int"))).alias("fpr"))
    return agg.select(F.lit(m).cast("bigint").alias("m_bits"), "*")


EWMA_K = 8  # trailing transactions in the smoothing window


def ewma_card_amount(events: DataFrame, k: int = EWMA_K) -> DataFrame:
    """Per-card EWMA of transaction amounts — the time-series
    behavioral baseline behind 'is this amount unusual FOR THIS
    card': each transaction carries the exponentially-weighted mean
    of its trailing window plus the spike ratio against it (the
    feature a production fraud scorer adds next to the reference's
    absolute >200 threshold).

    Engine-exact smoothing: the decay is alpha = 1/2, so every
    weight 2^-d is an EXACT binary double — scaling by it is
    error-free (exponent arithmetic only), and the k lag terms are
    summed in one fixed textual order mirrored token-identically in
    the oracle, so the whole smoothing is the same IEEE sequence on
    both engines (no fixed-point needed, unlike data-dependent
    sums whose grouping Spark may reorder). The window is STRICTLY
    TRAILING (lags 1..k — the scored transaction never contaminates
    its own baseline, else a 100x spike would read as at most 2x);
    short histories renormalize by the sum of PRESENT weights, and a
    card's first transaction has no baseline — ewma and spike_ratio
    are NULL, not a fabricated 1.0.

    Scale shape: k lag() columns over ONE card-keyed window — a
    single hash partition + sort per card, the `fraud_scores`
    exchange, reused; everything else is row-local projection."""
    tx = transactions_from_events(events)
    w = Window.partitionBy("card_id").orderBy("ts_us", "event_id")
    num = None
    den = None
    for d in range(1, k + 1):
        weight = F.lit(2.0 ** -d)
        lagged = F.lag("amount", d).over(w)
        term = F.when(lagged.isNotNull(), lagged * weight).otherwise(F.lit(0.0))
        present = F.when(lagged.isNotNull(), weight).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = present if den is None else den + present
    ewma = F.when(den > 0.0, num / den)
    return (tx.select("event_id", "card_id", "ts_us", "amount",
                      ewma.alias("ewma"),
                      (F.col("amount") / ewma).alias("spike_ratio")))


REACH_HOPS = 3


def coincidence_bfs_reach(events: DataFrame,
                          n_hops: int = REACH_HOPS) -> DataFrame:
    """Bounded BFS over the coincidence graph: hop distance from a
    deterministic seed (the minimum user id in the edge set) out to
    n_hops — the traversal primitive completing the graph family
    (components = where you can get, PageRank = how central you are,
    triangles = how tight your ring is, BFS = how FAR everything is).
    The investigation query: 'who is within k hops of this account'.

    Scale shape: the textbook frontier expansion — per hop one
    shuffle join (edges × frontier on the node key) + one distinct +
    one anti-join against the visited set; the anti-join IS the
    min-distance guarantee (a node joins the frontier the first hop
    it is reached, so its recorded dist is the BFS distance — equal
    to the oracle's min-over-all-paths). Frontier and visited are
    persisted per round (the `dedup_clusters` loop discipline);
    messages are 8-byte node ids. n_hops fixed → n_hops identical
    stages, the Pregel BFS schedule."""
    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist

    pairs = coincident_events(events).select("user_a", "user_b")
    edges = tracked_persist(
        pairs.select(F.col("user_a").alias("src"), F.col("user_b").alias("dst"))
             .unionAll(pairs.select(F.col("user_b").alias("src"),
                                    F.col("user_a").alias("dst")))
             .distinct())
    seed = edges.agg(F.min("src").alias("user_id")).select(
        "user_id", F.lit(0).cast("int").alias("dist"))
    visited = tracked_persist(seed)
    frontier = visited
    for h in range(1, n_hops + 1):
        nxt = (edges.join(frontier.select(F.col("user_id").alias("src")), "src")
                    .select(F.col("dst").alias("user_id")).distinct()
                    .join(visited, "user_id", "left_anti")
                    .select("user_id", F.lit(h).cast("int").alias("dist")))
        nxt = tracked_persist(nxt)
        visited = tracked_persist(visited.unionAll(nxt))
        frontier = nxt
    return visited


def user_activity_twins(events: DataFrame) -> DataFrame:
    """Behavioral-twin detection: each user's 24-hour activity
    PROFILE (hourly event counts) matched to its most-similar other
    user by cosine — the time-series similarity search that surfaces
    accounts acting on the same schedule (bot rings, shared
    operators). Profiles are built in ONE pass (24 conditional sums
    per user — a pivot without the pivot operator), and similarity
    runs at PROFILE level: |users| rows, the 'resolve the value
    domain' move — event volume never reaches the pair stage. The
    pair stage itself is quadratic in users (the bounded baseline,
    like `dedup_embedding_cosine`); at larger user counts the same
    profiles feed `ann_lsh`/`ann_ivf` as 24-dim vectors — the scale
    path already exists, this query is its exact ground truth.

    Engine-exact similarity WITHOUT fixed-point: counts are integers,
    so the dot product and both norms are exact integer sums (any
    fold order); the only FP is one double multiply, one
    IEEE-correctly-rounded sqrt, and one division — written
    token-identically in the oracle. Twin pick is argmax with an id
    tie-break."""
    hour = F.hour("ts").cast("int")
    prof = events.groupBy("user_id").agg(*[
        F.sum(F.when(hour == h, 1).otherwise(0)).cast("bigint").alias(f"h{h}")
        for h in range(24)])
    a = prof.select(F.col("user_id").alias("u"),
                    *[F.col(f"h{h}").alias(f"a{h}") for h in range(24)])
    b = prof.select(F.col("user_id").alias("v"),
                    *[F.col(f"h{h}").alias(f"b{h}") for h in range(24)])
    dot = sum(F.col(f"a{h}") * F.col(f"b{h}") for h in range(24))
    na = sum(F.col(f"a{h}") * F.col(f"a{h}") for h in range(24))
    nb = sum(F.col(f"b{h}") * F.col(f"b{h}") for h in range(24))
    cos = (dot.cast("double")
           / F.sqrt(na.cast("double") * nb.cast("double")))
    pairs = (a.join(b, F.col("u") != F.col("v"))
              .select("u", "v", cos.alias("cos")))
    w = Window.partitionBy("u").orderBy(F.desc("cos"), F.asc("v"))
    return (pairs.withColumn("rn", F.row_number().over(w))
                 .where(F.col("rn") == 1)
                 .select(F.col("u").alias("user_id"),
                         F.col("v").alias("twin_id"), "cos"))


def coincidence_components(events: DataFrame,
                           delta_us: int = COINCIDENCE_US) -> DataFrame:
    """Coordinated-activity RINGS: connected components over the
    cross-user coincidence graph — users linked whenever they act
    within the same delta window (`coincident_events`' binned
    non-equi join), transitively closed into rings with sizes. The
    fraud-ops composition: pairs flag coincidence, components name
    the GROUP.

    Engine choice: `components_twostar` (Kiveris et al. SoCC'14),
    NOT min-label propagation — temporal chains make this graph's
    diameter unbounded (user A ~ B at t, B ~ C at t+50s, ... builds
    long paths), which is exactly the regime the r8 engine shoot-out
    measured propagation OOMing in (crossover depth 16, documented
    in both engines' docstrings). O(log n) rounds, flat plan growth.

    Oracle: recursive-CTE transitive closure over the same pair SQL
    (the dedup_clusters discipline)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        components_twostar,
    )

    pairs = (coincident_events(events, delta_us)
             .select("user_a", "user_b").distinct())
    labels = components_twostar(pairs, "user_a", "user_b")
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("ring_size"))
    return (labels.join(sizes, "label")
            .select(F.col("id").alias("user_id"),
                    F.col("label").alias("ring_id"),
                    "ring_size"))
