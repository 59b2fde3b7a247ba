"""General analytics operators (SURVEY §2 #15-25): TPC-H-shaped
queries over the star schema plus event-stream analytics
(sessionization, tumbling windows, funnels).

Scale notes:
- Double sums are made engine-deterministic with fixed-point
  aggregation: ``sum(cast(round(x * 1e6) as bigint)) / 1e6`` — exact
  integer addition is associative, so Spark's partial/final
  aggregation and DuckDB's single-node sum agree bitwise. Plain
  double sums would drift in the last ulps between engines and
  across partition counts.
- Date filters use TIMESTAMP_NTZ literals against the stored
  millis-timestamp columns so predicates push into the parquet scan
  (PushedFilters); filtering a derived/recast column would not.
- Dim tables (region/nation/customer/supplier) are broadcast —
  fact-side shuffles only where an aggregation key requires it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

SCALE = 1_000_000  # fixed-point 6dp


def fsum(col: Column) -> Column:
    """Engine-deterministic 6dp fixed-point sum (see module doc)."""
    return F.sum(F.round(col * SCALE).cast("bigint")) / F.lit(float(SCALE))


def favg(col: Column) -> Column:
    return fsum(col) / F.count(F.lit(1))


def ntz(date_str: str) -> Column:
    """'YYYY-MM-DD' → TIMESTAMP_NTZ literal (orders/lineitem store
    naive millis timestamps; an NTZ literal keeps the comparison
    pushable into the parquet scan)."""
    return F.expr(f"TIMESTAMP_NTZ '{date_str} 00:00:00'")


# --- TPC-H-shaped -----------------------------------------------------------

Q1_CUTOFF = "1998-09-02"


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: big scan + filter + groupBy agg; the shipdate
    predicate pushes into the parquet scan."""
    li = lineitem.where(F.col("l_shipdate") <= ntz(Q1_CUTOFF))
    disc_price = li["l_extendedprice"] * (1 - li["l_discount"])
    charge = disc_price * (1 + li["l_tax"])
    return (li.groupBy("l_returnflag", "l_linestatus")
              .agg(fsum(li["l_quantity"]).alias("sum_qty"),
                   fsum(li["l_extendedprice"]).alias("sum_base_price"),
                   fsum(disc_price).alias("sum_disc_price"),
                   fsum(charge).alias("sum_charge"),
                   favg(li["l_quantity"]).alias("avg_qty"),
                   favg(li["l_extendedprice"]).alias("avg_price"),
                   favg(li["l_discount"]).alias("avg_disc"),
                   F.count(F.lit(1)).alias("count_order"))
              .orderBy("l_returnflag", "l_linestatus"))


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"


def q3_shipping_priority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into two fact
    joins + agg + deterministic top-10."""
    cust = customer.where(F.col("c_mktsegment") == Q3_SEGMENT).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < ntz(Q3_DATE))
    li = lineitem.where(F.col("l_shipdate") > ntz(Q3_DATE))
    j = (li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
           .join(F.broadcast(cust), ords["o_custkey"] == cust["c_custkey"]))
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    return (j.groupBy("o_orderkey",
                      F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                      "o_orderpriority")
             .agg(fsum(rev).alias("revenue"))
             .orderBy(F.desc("revenue"), "o_orderdate", "o_orderkey")
             .limit(10))


Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1998-01-01"


def q5_local_supplier(region: DataFrame, nation: DataFrame, customer: DataFrame,
                      supplier: DataFrame, orders: DataFrame,
                      lineitem: DataFrame) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; every dim side broadcast, facts
    shuffle only on the join keys; revenue by nation."""
    r = region.where(F.col("r_name") == Q5_REGION)
    n = nation.join(F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"]).select("n_nationkey", "n_name")
    o = orders.where((F.col("o_orderdate") >= ntz(Q5_FROM))
                     & (F.col("o_orderdate") < ntz(Q5_TO)))
    j = (lineitem
         .join(o, F.col("l_orderkey") == o["o_orderkey"])
         .join(F.broadcast(supplier), F.col("l_suppkey") == supplier["s_suppkey"])
         .join(F.broadcast(customer), F.col("o_custkey") == customer["c_custkey"]))
    # local-supplier condition: customer and supplier share the nation
    j = j.where(j["c_nationkey"] == j["s_nationkey"])
    j = j.join(F.broadcast(n), j["s_nationkey"] == n["n_nationkey"])
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    return (j.groupBy("n_name").agg(fsum(rev).alias("revenue"))
             .orderBy(F.desc("revenue"), "n_name"))


Q6_FROM, Q6_TO = "1996-01-01", "1997-01-01"


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan-level filters + single agg.
    Every predicate pushes to the parquet scan."""
    li = lineitem.where(
        (F.col("l_shipdate") >= ntz(Q6_FROM))
        & (F.col("l_shipdate") < ntz(Q6_TO))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return li.agg(fsum(li["l_extendedprice"] * li["l_discount"]).alias("revenue"))


def top_customers(customer: DataFrame, orders: DataFrame, k: int = 20) -> DataFrame:
    """Window rank over an aggregate (top-k pattern)."""
    spend = (orders.groupBy("o_custkey")
                   .agg(fsum(F.col("o_totalprice")).alias("total_spend"),
                        F.count(F.lit(1)).alias("n_orders")))
    j = spend.join(F.broadcast(customer), spend["o_custkey"] == customer["c_custkey"])
    w = Window.orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    return (j.select("c_custkey", "c_name", "c_mktsegment", "total_spend", "n_orders",
                     F.row_number().over(w).alias("rnk"))
             .where(F.col("rnk") <= k)
             .orderBy("rnk"))


def q2_top_supplier_per_nation(supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """TPC-H Q2 shape (adapted to the slimmed schema — no partsupp):
    per-group argmax via ONE window pass instead of a correlated
    subquery; the nation dim is broadcast. Ties go to the lower
    s_suppkey so the pick is deterministic."""
    j = supplier.join(F.broadcast(nation),
                      supplier["s_nationkey"] == nation["n_nationkey"])
    w = Window.partitionBy("n_nationkey").orderBy(F.desc("s_acctbal"),
                                                  F.asc("s_suppkey"))
    return (j.withColumn("rnk", F.row_number().over(w))
             .where(F.col("rnk") == 1)
             .select("n_name", "s_suppkey", "s_name", "s_acctbal")
             .orderBy("n_name"))


Q4_FROM, Q4_TO = "1996-01-01", "1996-07-01"


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with a
    non-equi residual (l_shipdate > o_orderdate — 'shipped after it
    was ordered' stands in for the reference's commit/receipt lag).
    The semi join keeps the orders side's row count; lineitem never
    widens the output."""
    o = orders.where((F.col("o_orderdate") >= ntz(Q4_FROM))
                     & (F.col("o_orderdate") < ntz(Q4_TO)))
    late = o.join(lineitem,
                  (o["o_orderkey"] == lineitem["l_orderkey"])
                  & (lineitem["l_shipdate"] > o["o_orderdate"]),
                  "left_semi")
    return (late.groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n_orders"))
                .orderBy("o_orderpriority"))


Q7_FROM, Q7_TO = "1996-01-01", "1998-01-01"


def q7_nation_volume(nation: DataFrame, customer: DataFrame, supplier: DataFrame,
                     orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between every (supplier nation,
    customer nation) pair by year. Both nation lookups broadcast; the
    only shuffle is the final group-by on the (small) pair×year key."""
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    li = lineitem.where((F.col("l_shipdate") >= ntz(Q7_FROM))
                        & (F.col("l_shipdate") < ntz(Q7_TO)))
    j = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
           .join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
           .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
           .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
           .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
           .where(F.col("supp_nation") != F.col("cust_nation")))
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("int").alias("l_year"))
             .agg(fsum(rev).alias("revenue"))
             .orderBy("supp_nation", "cust_nation", "l_year"))


Q10_FROM, Q10_TO = "1996-01-01", "1996-07-01"


def q10_returned_items(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame,
                       k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer over a
    quarter-ish window, deterministic top-k. The returnflag and date
    predicates push to the scans; customer/nation broadcast."""
    o = orders.where((F.col("o_orderdate") >= ntz(Q10_FROM))
                     & (F.col("o_orderdate") < ntz(Q10_TO)))
    li = lineitem.where(F.col("l_returnflag") == "R")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(customer), o["o_custkey"] == customer["c_custkey"])
           .join(F.broadcast(nation),
                 F.col("c_nationkey") == nation["n_nationkey"]))
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    return (j.groupBy("c_custkey", "c_name", "n_name")
             .agg(fsum(rev).alias("revenue"))
             .orderBy(F.desc("revenue"), F.asc("c_custkey"))
             .limit(k))


Q14_FROM, Q14_TO = "1996-01-01", "1996-07-01"


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue
    share). One scan, one broadcast join, two fixed-point sums; the
    ratio divides two engine-deterministic doubles so the result is
    bitwise reproducible."""
    li = lineitem.where((F.col("l_shipdate") >= ntz(Q14_FROM))
                        & (F.col("l_shipdate") < ntz(Q14_TO)))
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    promo = F.when(j["p_type"] == "PROMO", rev).otherwise(F.lit(0.0))
    return j.agg((fsum(promo) * 100.0 / fsum(rev)).alias("promo_revenue_pct"))


Q18_MIN_QTY = 250


def q18_large_orders(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame) -> DataFrame:
    """TPC-H Q18 shape: group-by-HAVING on the fact table, then join
    the (tiny) surviving key set back to orders/customer. The HAVING
    side aggregates BEFORE joining, so the join input is a few keys,
    not 6 M rows — broadcast the survivors, not the facts."""
    qty = (lineitem.groupBy("l_orderkey")
                   .agg(fsum(F.col("l_quantity")).alias("total_qty"))
                   .where(F.col("total_qty") > Q18_MIN_QTY))
    j = (orders.join(F.broadcast(qty), orders["o_orderkey"] == qty["l_orderkey"])
               .join(F.broadcast(customer),
                     orders["o_custkey"] == customer["c_custkey"]))
    return (j.select("c_custkey", "c_name", "o_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                     "o_totalprice", "total_qty")
             .orderBy(F.desc("total_qty"), F.asc("o_orderkey")))


Q19_BRANDS = [
    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#13", 1, 15, 1, 30),
    ("Brand#20", 10, 30, 10, 40),
    ("Brand#9", 20, 50, 20, 50),
]


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-branch predicate across both
    join sides. The per-side conjuncts (brand/size on part, quantity
    on lineitem) stay pushable; the cross-side disjunction evaluates
    post-join inside codegen."""
    j = lineitem.join(F.broadcast(part),
                      lineitem["l_partkey"] == part["p_partkey"])
    branch = None
    for brand, slo, shi, qlo, qhi in Q19_BRANDS:
        b = ((j["p_brand"] == brand)
             & (j["p_size"] >= slo) & (j["p_size"] <= shi)
             & (j["l_quantity"] >= qlo) & (j["l_quantity"] <= qhi))
        branch = b if branch is None else (branch | b)
    sel = j.where(branch)
    rev = sel["l_extendedprice"] * (1 - sel["l_discount"])
    return sel.agg(fsum(rev).alias("revenue"))


# --- event analytics --------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessionization: lag + cumulative sum of new-session
    flags — one shuffle on user_id, all codegen."""
    ts_us = F.unix_micros(F.col("ts"))
    df = events.select("user_id", "event_id", "value", ts_us.alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_s = F.when(
        (F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us, 1
    ).otherwise(F.when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0))
    df = df.withColumn("session_idx",
                       F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (df.groupBy("user_id", "session_idx")
              .agg(F.min("ts_us").alias("session_start_us"),
                   F.max("ts_us").alias("session_end_us"),
                   F.count(F.lit(1)).alias("n_events"),
                   fsum(F.col("value")).alias("total_value")))


WINDOW_US = 3600 * 1_000_000  # 1 h tumbling


def windowed_counts(events: DataFrame, window_us: int = WINDOW_US) -> DataFrame:
    """Tumbling-window counts per event_type (batch analog of the
    streaming windowed aggregation)."""
    ts_us = F.unix_micros(F.col("ts"))
    # integer arithmetic (not double division) so bucket edges are exact
    bucket = ts_us - (ts_us % F.lit(window_us))
    return (events.groupBy(bucket.alias("window_start_us"), "event_type")
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       fsum(F.col("value")).alias("total_value")))


def event_funnel(events: DataFrame) -> DataFrame:
    """Event-type transition matrix per user (lag over event time)."""
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    df = events.withColumn("prev_type", F.lag("event_type").over(w))
    return (df.where(df["prev_type"].isNotNull())
              .groupBy("prev_type", F.col("event_type").alias("next_type"))
              .agg(F.count(F.lit(1)).alias("n_transitions")))


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_events(events: DataFrame) -> DataFrame:
    """Pivot event_type counts into columns per user."""
    p = (events.groupBy("user_id")
               .pivot("event_type", EVENT_TYPES)
               .agg(F.count(F.lit(1))))
    cols = [F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in EVENT_TYPES]
    return p.select("user_id", *cols)


def rollup_orders(orders: DataFrame) -> DataFrame:
    """ROLLUP over (status, priority): multi-level totals in one pass."""
    return (orders.rollup("o_orderstatus", "o_orderpriority")
                  .agg(F.count(F.lit(1)).alias("n_orders"),
                       fsum(F.col("o_totalprice")).alias("total_price")))


def distinct_users_daily(events: DataFrame) -> DataFrame:
    """Per-day exact distinct users. Day as ISO string: date-typed
    outputs hit datetime-resolution mismatches between engines."""
    return (events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
                  .agg(F.count_distinct(F.col("user_id")).alias("n_users"),
                       F.count(F.lit(1)).alias("n_events")))


Q8_REGION = "ASIA"
Q8_NATION = "NATION_12"
Q8_FROM, Q8_TO = "1995-01-01", "1997-01-01"


def q8_market_share(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    supplier: DataFrame, orders: DataFrame,
                    lineitem: DataFrame) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share of a region's market
    by year. Seven-relation join with every dim broadcast; the share
    is a conditional fixed-point sum over the SAME joined rows (one
    pass, no second scan), divided per group — both operands
    engine-deterministic, so the ratio is too."""
    r = region.where(F.col("r_name") == Q8_REGION)
    n1 = (nation.join(F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"])
                .select(F.col("n_nationkey").alias("c_nk")))
    n2 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    o = orders.where((F.col("o_orderdate") >= ntz(Q8_FROM))
                     & (F.col("o_orderdate") < ntz(Q8_TO)))
    j = (lineitem.join(o, F.col("l_orderkey") == o["o_orderkey"])
         .join(F.broadcast(customer), o["o_custkey"] == customer["c_custkey"])
         .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
         .join(F.broadcast(supplier), F.col("l_suppkey") == supplier["s_suppkey"])
         .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk")))
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    target = F.when(j["supp_nation"] == Q8_NATION, rev).otherwise(F.lit(0.0))
    return (j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
             .agg((fsum(target) / fsum(rev)).alias("mkt_share"))
             .orderBy("o_year"))


def skew_salted_spend(events: DataFrame, customer: DataFrame,
                      n_salt: int = 8) -> DataFrame:
    """Hot-key join demo: events carry only ~15 distinct user_ids, so
    an unsalted shuffle join lands every row on ≤15 reduce tasks no
    matter how many executors exist. `salted_join` scatters each hot
    key over `n_salt` sub-keys (small side replicated n_salt×), so
    the hot key's rows spread across n_salt tasks. The salt is
    dropped before the aggregate, so the result is EXACTLY the plain
    join's — which is what the oracle checks.

    Use when AQE's skew split can't help: a single key bigger than a
    task's memory, or a skewed shuffle feeding a stateful op."""
    from real_time_fraud_detection_flink_kafka_spark.functions.skew import salted_join

    ev = events.select(F.col("user_id"), F.col("value"))
    cust = customer.select(F.col("c_custkey").alias("user_id"),
                           F.col("c_mktsegment"))
    j = salted_join(ev, cust, "user_id", n_salt=n_salt)
    return (j.groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  fsum(F.col("value")).alias("total_value"))
             .orderBy("c_mktsegment"))


Q13_EXCLUDED_PRIORITY = "1-URGENT"


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. The order
    predicate lives in the OUTER JOIN CONDITION, not a WHERE — the
    Q13 trap: filtering after the join would drop zero-order
    customers, filtering before changes nothing here but a WHERE on
    the nullable side post-join silently turns the outer join inner.
    Two aggregations: per-customer count (counts only matched rows
    via count(o_orderkey)), then the histogram over counts."""
    j = customer.join(
        orders,
        (customer["c_custkey"] == orders["o_custkey"])
        & (orders["o_orderpriority"] != Q13_EXCLUDED_PRIORITY),
        "left_outer")
    per_cust = (j.groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
                    .agg(F.count(F.lit(1)).alias("custdist"))
                    .orderBy(F.desc("custdist"), F.desc("c_count")))


def q22_sales_opportunity(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no
    orders — a scalar aggregate broadcast back over the scan plus an
    ANTI join. The threshold uses the fixed-point sum/count (not
    avg()) so both engines compute the identical double and no
    boundary customer can flip."""
    pos = customer.where(F.col("c_acctbal") > 0.0)
    thresh = pos.agg((fsum(F.col("c_acctbal"))
                      / F.count(F.lit(1))).alias("avg_bal"))
    rich = (customer.crossJoin(F.broadcast(thresh))
                    .where(F.col("c_acctbal") > F.col("avg_bal")))
    no_orders = rich.join(orders, rich["c_custkey"] == orders["o_custkey"],
                          "left_anti")
    return (no_orders.groupBy("c_nationkey")
                     .agg(F.count(F.lit(1)).alias("numcust"),
                          fsum(F.col("c_acctbal")).alias("totacctbal"))
                     .orderBy("c_nationkey"))


PCTS = [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)]


def event_value_percentiles(events: DataFrame) -> DataFrame:
    """Exact DISCRETE percentiles of `value` per event_type — the
    OLAP quantile op done engine-portably: rank rows per group and
    pick the ceil(p·n)-th value. Interpolating percentiles
    (percentile_cont) would hash-mismatch across engines because the
    two interpolation FORMS differ in final-ulp FP; the discrete pick
    returns an actual data value, so equality is exact. One shuffle
    on event_type; the per-group sort is the same work a
    percentile_cont aggregation does internally."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = events.select(
        "event_type", "value", "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"))
    aggs = [
        F.max(F.when(F.col("rn") == F.greatest(
            F.lit(1), F.ceil(F.lit(p) * F.col("n"))), F.col("value"))
        ).alias(name)
        for name, p in PCTS
    ]
    return (ranked.groupBy("event_type").agg(*aggs)
                  .orderBy("event_type"))


def cube_orders(orders: DataFrame) -> DataFrame:
    """CUBE over (status, priority) with an explicit grouping_id —
    all four aggregation levels (full, per-status, per-priority,
    grand total) in ONE pass with map-side partial aggregation;
    grouping_id disambiguates real NULL keys from subtotal rows."""
    return (orders.cube("o_orderstatus", "o_orderpriority")
                  .agg(F.grouping_id().cast("int").alias("gid"),
                       F.count(F.lit(1)).alias("n_orders"),
                       fsum(F.col("o_totalprice")).alias("total_price"))
                  .select("gid", "o_orderstatus", "o_orderpriority",
                          "n_orders", "total_price"))


# --- partsupp (synthesized) + Q9 --------------------------------------------

PS_PER_PART = 4          # suppliers per part — the TPC-H partsupp shape
PS_COST_MOD = 20_000     # supplycost = ((31p + 7s) % MOD)/100 + 1
PS_QTY_MOD = 9_999       # availqty   = (13p + 17s) % MOD + 1
Q9_NAME_FRAG = "rod"     # p_name LIKE '%rod%' — Q9's '%green%' analog


def partsupp_synth(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """Deterministic `partsupp` derived from part × supplier — the
    testdata ships no partsupp table, so both engines SYNTHESIZE the
    same relation from the same parquet inputs (the oracle replays
    this derivation as a CTE; cf. TPC-H dbgen, which also generates
    partsupp from the part/supplier key spaces by modular striding).

    Per part, PS_PER_PART suppliers: suppkey = (p_partkey + i·stride)
    mod n_supp + min_supp, stride = max(n_supp div 4, 1) — all
    integer arithmetic, so Spark and DuckDB agree bit-for-bit;
    supplycost/availqty are seeded integer formulas (one IEEE
    division for the cost, identical across engines). The supplier
    key-space parameters ride as a 1-row broadcast; generation is a
    row-local explode over the part scan — no shuffle, scales with
    |part| exactly like dbgen's streams."""
    ks = supplier.agg(F.count(F.lit(1)).alias("n_supp"),
                      F.min("s_suppkey").alias("min_supp"))
    stride = F.greatest(F.floor(F.col("n_supp") / PS_PER_PART), F.lit(1))
    rows = (part.select("p_partkey")
            .crossJoin(F.broadcast(ks))
            .select("p_partkey", "n_supp", "min_supp",
                    F.explode(F.sequence(
                        F.lit(0), F.lit(PS_PER_PART - 1))).alias("i")))
    suppkey = ((F.col("p_partkey") + F.col("i") * stride) % F.col("n_supp")
               + F.col("min_supp"))
    return (rows.select(F.col("p_partkey").alias("ps_partkey"),
                        suppkey.cast("long").alias("ps_suppkey"))
            .select("ps_partkey", "ps_suppkey",
                    (((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7)
                      % PS_COST_MOD) / 100.0 + 1.0).alias("ps_supplycost"),
                    ((F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 17)
                     % PS_QTY_MOD + 1).cast("int").alias("ps_availqty")))


def q9_product_type_profit(part: DataFrame, supplier: DataFrame,
                           lineitem: DataFrame, orders: DataFrame,
                           nation: DataFrame,
                           name_frag: str = Q9_NAME_FRAG) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over
    parts matching a name fragment — the five-fact-dim join with a
    derived cost input. Join strategy for 100 TB: the name-filtered
    part key set broadcasts into the lineitem scan FIRST (prunes ~90%
    of the fact before anything wider); partsupp is joined on the
    composite (partkey, suppkey) — synthesized here it is |part|×4
    rows and broadcasts, while a real materialized partsupp would be
    fact-sized and AQE would pick the shuffle side; supplier/nation
    dims broadcast; the orders join (orderkey → orderdate) is the one
    fact⋈fact sort-merge. Profit is a fixed-point sum (fsum), so
    partial-agg order cannot change the result."""
    p = part.where(F.col("p_name").contains(name_frag)).select("p_partkey")
    ps = partsupp_synth(part, supplier)
    s = supplier.select("s_suppkey", "s_nationkey")
    n = nation.select("n_nationkey", "n_name")
    o = orders.select("o_orderkey", "o_orderdate")
    j = (lineitem
         .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
         .join(F.broadcast(ps), (F.col("l_partkey") == F.col("ps_partkey"))
               & (F.col("l_suppkey") == F.col("ps_suppkey")))
         .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .join(o, F.col("l_orderkey") == F.col("o_orderkey")))
    amount = (j["l_extendedprice"] * (1 - j["l_discount"])
              - j["ps_supplycost"] * j["l_quantity"])
    return (j.groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").cast("int").alias("o_year"))
             .agg(fsum(amount).alias("sum_profit"))
             .orderBy("nation", F.desc("o_year")))


Q20_NATION = "NATION_3"
Q20_FROM, Q20_TO = "1995-01-01", "1996-01-01"


def q20_potential_part_promotion(part: DataFrame, supplier: DataFrame,
                                 lineitem: DataFrame, nation: DataFrame,
                                 name_frag: str = Q9_NAME_FRAG,
                                 nation_name: str = Q20_NATION,
                                 from_date: str = Q20_FROM,
                                 to_date: str = Q20_TO) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation holding excess stock
    of name-matched parts — availqty > half the year's shipped
    quantity for that (part, supplier). The correlated subquery
    becomes one aggregate-then-join: shipped quantities groupBy
    (partkey, suppkey) with map-side partials, the filtered part keys
    and the synthesized partsupp broadcast, the nation filter
    broadcasts into the supplier dim. Quantity sums are integral in
    TPC-H (l_quantity is a whole number), so the half-comparison uses
    the fixed-point sum and stays engine-exact."""
    p = part.where(F.col("p_name").contains(name_frag)).select("p_partkey")
    ps = (partsupp_synth(part, supplier)
          .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
          .drop("p_partkey"))
    shipped = (lineitem
               .where((F.col("l_shipdate") >= ntz(from_date))
                      & (F.col("l_shipdate") < ntz(to_date)))
               .join(F.broadcast(ps.select("ps_partkey", "ps_suppkey")),
                     (F.col("l_partkey") == F.col("ps_partkey"))
                     & (F.col("l_suppkey") == F.col("ps_suppkey")))
               .groupBy("ps_partkey", "ps_suppkey")
               .agg(fsum(F.col("l_quantity")).alias("qty_shipped")))
    excess = (ps.join(shipped, ["ps_partkey", "ps_suppkey"])
                .where(F.col("ps_availqty") > 0.5 * F.col("qty_shipped"))
                .select("ps_suppkey").distinct())
    n = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    return (supplier
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(excess), F.col("s_suppkey") == F.col("ps_suppkey"))
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))

# --- Q11/Q12/Q15/Q16/Q17/Q21 — the rest of the TPC-H 22 ---------------------

Q11_NATION = "NATION_1"
Q11_MULT = 1.3  # threshold = MULT × mean per-part stock value (scale-free)


def q11_important_stock(part: DataFrame, supplier: DataFrame,
                        nation: DataFrame,
                        nation_name: str = Q11_NATION,
                        mult: float = Q11_MULT) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value within one nation,
    keeping parts whose value exceeds a global threshold. TPC-H's
    `fraction/SF` cutoff is a scale normalization; here the threshold
    is MULT × the mean per-part value — scale-free by construction,
    so the selectivity is stable from sf0.001 to 100 TB. The scalar
    subquery becomes a 1-row aggregate broadcast (crossJoin of a
    single row, not a shuffle); the nation-filtered supplier keys
    broadcast into the synthesized partsupp. One shuffle total: the
    groupBy on ps_partkey."""
    n = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    s = (supplier.join(F.broadcast(n),
                       F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey"))
    ps = (partsupp_synth(part, supplier)
          .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey")))
    per_part = (ps.groupBy("ps_partkey")
                  .agg(fsum(F.col("ps_supplycost") * F.col("ps_availqty"))
                       .alias("value")))
    # favg, not F.avg: the mean must be the fixed-point form so the
    # threshold is bit-identical across engines AND partition orders
    # (a plain double mean can drift an ulp with combine order, and a
    # boundary part would then flip in/out of the result)
    thresh = per_part.agg(
        (favg(F.col("value")) * F.lit(mult)).alias("threshold"))
    return (per_part.crossJoin(F.broadcast(thresh))
            .where(F.col("value") > F.col("threshold"))
            .select("ps_partkey", "value")
            .orderBy(F.desc("value"), "ps_partkey"))


Q12_MODES = ["MAIL", "SHIP", "AIR", "TRUCK", "RAIL"]
Q12_PICKED = ["MAIL", "SHIP"]
Q12_FROM, Q12_TO = "1996-01-01", "1997-01-01"
Q12_LATE_DAYS = 60
Q12_HIGH = ["1-URGENT", "2-HIGH"]


def shipmode_synth(lineitem: DataFrame) -> Column:
    """Deterministic `l_shipmode` (the testdata ships none): mode =
    MODES[(7·orderkey + linenumber) mod 5] — pure integer arithmetic,
    replayed identically by the oracle, row-local, no shuffle."""
    idx = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % len(Q12_MODES)
    return F.element_at(F.array(*[F.lit(m) for m in Q12_MODES]),
                        (idx + 1).cast("int"))


def q12_shipmode_priority(orders: DataFrame, lineitem: DataFrame,
                          from_date: str = Q12_FROM,
                          to_date: str = Q12_TO) -> DataFrame:
    """TPC-H Q12 shape: late-line counts split by order priority per
    ship mode. `l_shipdate > o_orderdate + 60 days` stands in for the
    reference's receipt-after-commit lag (same adaptation as Q4/Q21);
    the shipdate year-window pushes into the parquet scan. The
    orders join carries only (orderkey, priority, orderdate); the
    groupBy key is 2 modes wide, so the final agg is a near-free
    shuffle after map-side partials."""
    li = (lineitem
          .where((F.col("l_shipdate") >= ntz(from_date))
                 & (F.col("l_shipdate") < ntz(to_date)))
          .withColumn("ship_mode", shipmode_synth(lineitem))
          .where(F.col("ship_mode").isin(Q12_PICKED)))
    o = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .where(F.col("l_shipdate")
                  > F.col("o_orderdate")
                  + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")))
    high = F.col("o_orderpriority").isin(Q12_HIGH)
    return (j.groupBy("ship_mode")
             .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                  F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
             .orderBy("ship_mode"))


Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame,
                     from_date: str = Q15_FROM,
                     to_date: str = Q15_TO) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarter revenue.
    The revenue view is one groupBy(l_suppkey) with map-side partials;
    the MAX scalar subquery is a 1-row aggregate broadcast and the
    equality filter is exact because revenue is a fixed-point sum
    (`fsum`) — double-sum drift would make `= max` flaky across
    partitionings, the classic Q15 pitfall."""
    rev = (lineitem
           .where((F.col("l_shipdate") >= ntz(from_date))
                  & (F.col("l_shipdate") < ntz(to_date)))
           .groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (rev.crossJoin(F.broadcast(mx))
            .where(F.col("total_revenue") == F.col("max_revenue"))
            .join(F.broadcast(supplier),
                  F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


Q16_BRAND_EX = "Brand#45"
Q16_TYPE_EX = "MEDIUM"
Q16_SIZES = [1, 4, 9, 14, 19, 23, 36, 45]
Q16_COMPLAINT_MOD = 7  # suppkey % 7 == 0 → 'complaints' analog


def q16_parts_supplier_relationship(part: DataFrame,
                                    supplier: DataFrame) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type,
    size) over partsupp, excluding one brand, one type prefix, and
    'complaint' suppliers. The slim supplier table has no s_comment,
    so the complaint set is a deterministic key predicate
    (suppkey % 7 == 0) — an anti-join against a broadcast of that
    set, same plan shape as the reference's NOT IN. count(DISTINCT)
    runs as Spark's two-phase distinct-aggregate: partial distinct on
    (group key, suppkey), then the final count — no row ever carries
    a set."""
    p = (part.where((F.col("p_brand") != Q16_BRAND_EX)
                    & (~F.col("p_type").startswith(Q16_TYPE_EX))
                    & (F.col("p_size").isin(Q16_SIZES)))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (supplier.where(F.col("s_suppkey") % Q16_COMPLAINT_MOD == 0)
           .select("s_suppkey"))
    ps = (partsupp_synth(part, supplier)
          .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"),
                "left_anti")
          .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey")))
    return (ps.groupBy("p_brand", "p_type", "p_size")
              .agg(F.count_distinct(F.col("ps_suppkey"))
                   .alias("supplier_cnt"))
              .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


Q17_BRAND = "Brand#23"
Q17_QTY_FRACTION = 0.2


def q17_small_quantity_revenue(lineitem: DataFrame,
                               part: DataFrame,
                               brand: str = Q17_BRAND) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of one
    brand's parts (brand stands in for brand+container — the slim
    part table has no p_container). The correlated per-part AVG
    decorrelates to one aggregate-then-join: per-part mean quantity
    (fixed-point sum / count — bit-identical across engines) is a
    |brand parts|-row relation that BROADCASTS back onto the same
    filtered join, so the fact side is scanned twice but shuffled
    zero times."""
    p = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(p),
                       F.col("l_partkey") == F.col("p_partkey"))
    per_part = (li.groupBy(F.col("l_partkey").alias("pk"))
                  .agg((fsum(F.col("l_quantity")) / F.count(F.lit(1)))
                       .alias("avg_qty")))
    return (li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
              .where(F.col("l_quantity")
                     < F.lit(Q17_QTY_FRACTION) * F.col("avg_qty"))
              .agg((fsum(F.col("l_extendedprice")) / 7.0)
                   .alias("avg_yearly")))


Q21_NATION = "NATION_1"
Q21_LATE_DAYS = 30


def q21_suppliers_kept_waiting(supplier: DataFrame, lineitem: DataFrame,
                               orders: DataFrame, nation: DataFrame,
                               nation_name: str = Q21_NATION,
                               k: int = 100) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finished order. Lateness is `l_shipdate >
    o_orderdate + 30 days` (commit/receipt-lag adaptation, as Q4/Q12).
    The EXISTS / NOT EXISTS pair decorrelates to ONE pass over the
    order's lineitems: per orderkey count distinct suppliers, distinct
    late suppliers, the (unique-when-count=1) late supplier, and that
    supplier's late-row count — then filter n_supp ≥ 2 ∧ n_late = 1.
    Instead of three self-joins of the fact (the naive plan), the
    fact shuffles once on orderkey; numwait sums late rows exactly as
    the reference counts qualifying l1 rows."""
    o = (orders.where(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    j = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
           .withColumn("is_late",
                       F.col("l_shipdate")
                       > F.col("o_orderdate")
                       + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")))
    per_order = (j.groupBy("o_orderkey")
                 .agg(F.count_distinct("l_suppkey").alias("n_supp"),
                      F.count_distinct(F.when(F.col("is_late"),
                                              F.col("l_suppkey")))
                       .alias("n_late_supp"),
                      F.max(F.when(F.col("is_late"), F.col("l_suppkey")))
                       .alias("late_supp"),
                      F.count(F.when(F.col("is_late"), 1))
                       .alias("late_rows")))
    qualifying = per_order.where((F.col("n_supp") >= 2)
                                 & (F.col("n_late_supp") == 1))
    n = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    s = (supplier.join(F.broadcast(n),
                       F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name"))
    return (qualifying
            .groupBy("late_supp")
            .agg(F.sum("late_rows").alias("numwait"))
            .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), "s_name")
            .limit(k))


# --- semi-structured props ---------------------------------------------------


def events_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured handling: parse the `props` JSON column with a
    TYPED from_json (stays inside whole-stage codegen — no Python, no
    schema inference scan) and aggregate the extracted field per
    event type. The schema-on-read shape every event pipeline needs;
    at 100 TB the win is that extraction is a row-local JVM
    expression and only the extracted int rides the shuffle, never
    the JSON string."""
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (events
            .select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("k").cast("bigint").alias("sum_k"),
                 F.count_distinct("k").alias("n_distinct_k"),
                 F.max("k").alias("max_k"))
            .orderBy("event_type"))


HIST_BINS = 256
HIST_QS = [0.5, 0.9, 0.95, 0.99]


def value_histogram_quantiles(events: DataFrame,
                              n_bins: int = HIST_BINS,
                              qs: list[float] | None = None) -> DataFrame:
    """FIXED-BIN histogram quantile sketch over `value` — the
    one-pass bounded-error quantile for CONTINUOUS columns, next to
    the two exact baselines (`event_value_percentiles`: per-group
    sort; `quality_percentile_gate`: distinct-value histogram, which
    is only bounded because quality is 6dp-rounded). For a raw double
    column the distinct-value relation is O(n); the fixed-bin sketch
    is the production shape: state is exactly `n_bins` counters
    regardless of cardinality, and the estimate (the qualifying bin's
    upper edge) is wrong by at most one bin width — asserted against
    the exact quantile in tests/test_edge_cases.py.

    Scale shape: one extremes pass (min/max/count, map-side partials,
    1-row broadcast back), one histogram pass (groupBy on the bin id,
    <= n_bins rows out), then a cumulative sum + threshold pick over
    the n_bins-row relation. The single-partition window and the
    non-equi quantile join both run on <= n_bins rows — O(n_bins·|qs|)
    driver-adjacent work, never on data. The column is scanned twice
    and sorted never; a global sort-based quantile at 100 TB is a
    single straggler task, this is two embarrassingly-parallel scans.

    Engine-exact despite being approximate: the binning arithmetic
    ((value-lo)/width, floor, clamp) is the same IEEE double sequence
    in Spark and DuckDB, so the SKETCH ITSELF is value-oracle-checked
    — approximation error is vs the true quantile, not between
    engines."""
    qs = HIST_QS if qs is None else qs
    ext = events.agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
                     F.count(F.lit(1)).alias("n"))
    width = (F.col("hi") - F.col("lo")) / n_bins
    bin_id = (F.when(F.col("hi") > F.col("lo"),
                     F.least(F.floor((F.col("value") - F.col("lo")) / width),
                             F.lit(n_bins - 1).cast("bigint")))
               .otherwise(F.lit(0).cast("bigint")))
    binned = (events.crossJoin(F.broadcast(ext))
                    .select(bin_id.alias("bin"), "lo", "hi", "n"))
    hist = (binned.groupBy("bin", "lo", "hi", "n")
                  .agg(F.count(F.lit(1)).alias("cnt")))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bin", "lo", "hi", "n",
                      F.sum("cnt").over(wcum).alias("cum"))
    q_rel = (events.sparkSession.range(1)
             .select(F.explode(F.array(*[F.lit(float(q)) for q in qs]))
                      .alias("q")))
    sel = cum.join(F.broadcast(q_rel),
                   F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
    return (sel.groupBy("q")
               .agg(F.min("bin").alias("bin"),
                    F.min(F.col("lo") + (F.col("bin") + 1) * width)
                     .alias("est"))
               .orderBy("q"))


DQ_TS_LO = "2024-01-01"
DQ_TS_HI = "2024-02-01"
DQ_NEG_MOD = 97    # value negated
DQ_TS_MOD = 101    # ts pushed out of range
DQ_DUP_MOD = 103   # row duplicated
DQ_FK_MOD = 89     # user_id pointed at a missing customer


def _inject_dq_faults(events: DataFrame) -> DataFrame:
    """Deterministic fault injection (the `pii_scrub` move — the
    testdata is clean, so an audit over it would report all-zero
    violations and prove nothing; seeded faults make every check
    exercised AND oracle-replayable): negated values, out-of-range
    timestamps, duplicated event_ids, dangling user FKs."""
    base = events.select(
        "event_id",
        F.when(F.col("event_id") % DQ_TS_MOD == 0,
               F.col("ts") + F.expr("INTERVAL 400 DAYS"))
         .otherwise(F.col("ts")).alias("ts"),
        F.when(F.col("user_id") % DQ_FK_MOD == 0,
               F.col("user_id") + 10_000_000)
         .otherwise(F.col("user_id")).alias("user_id"),
        F.when(F.col("event_id") % DQ_NEG_MOD == 0,
               -F.col("value") - 1.0)
         .otherwise(F.col("value")).alias("value"))
    return base.unionAll(base.where(F.col("event_id") % DQ_DUP_MOD == 0))


def dq_audit(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Deequ-style data-quality audit: declared constraints →
    one metrics row per check (rows scanned, violations, rate). The
    production intake gate every large pipeline runs before letting
    a batch into the lake.

    Scale shape: ALL single-column checks (range, uniqueness,
    bounds) ride ONE aggregation pass with map-side partials —
    violations are conditional sums, uniqueness is
    count - count_distinct — and the referential check joins the
    broadcast dim key set in the same pass, so the whole audit is
    one pass over the audited relation + one broadcast join, never
    one scan per check (the fault-injection union re-reads events
    once more — a harness artifact that disappears when auditing
    real data). The per-check rows come from exploding the 1-row
    metrics relation — no driver collect."""
    faulty = _inject_dq_faults(events)
    ck = customer.select(F.col("c_custkey").alias("user_id"),
                         F.lit(1).alias("_fk_ok"))
    j = faulty.join(F.broadcast(ck), "user_id", "left")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("value") < 0).cast("int")).alias("v_neg"),
        (F.count(F.lit(1)) - F.count_distinct("event_id")).alias("v_dup"),
        F.sum(((F.col("ts") < F.lit(DQ_TS_LO).cast("timestamp"))
               | (F.col("ts") >= F.lit(DQ_TS_HI).cast("timestamp")))
              .cast("int")).alias("v_ts"),
        F.sum(F.col("_fk_ok").isNull().cast("int")).alias("v_fk"))
    checks = [("value_nonnegative", "v_neg"),
              ("event_id_unique", "v_dup"),
              ("ts_in_expected_range", "v_ts"),
              ("user_fk_in_customer", "v_fk")]
    rows = F.explode(F.array(*[
        F.struct(F.lit(name).alias("check_name"),
                 F.col("n").alias("n_rows"),
                 F.col(col).alias("n_violations"))
        for name, col in checks])).alias("r")
    return (m.select(rows)
             .select("r.check_name", "r.n_rows", "r.n_violations",
                     (F.col("r.n_violations") / F.col("r.n_rows"))
                      .alias("violation_rate")))


def linreg_value_by_hour(events: DataFrame) -> DataFrame:
    """Closed-form OLS (value ~ hour-of-day) trained IN the engine —
    the distributed-ML primitive done the MLlib-summarizer way: one
    pass accumulates the mergeable sufficient statistics
    (n, Σx, Σx², Σy, Σxy, Σy²) with map-side partial aggregation,
    then slope/intercept/R² are pure arithmetic on the 1-row stats
    relation. No gradient loop, no driver-side math, no per-row
    state — the one-pass shape that scales to any row count because
    the shuffle carries exactly six numbers per partition.

    Engine-exact: x is an integer (hour), so Σx/Σx² are exact; the
    y-sums use the fixed-point `fsum` (associative integer adds), and
    the closed-form expressions are written token-identically in the
    oracle so both engines run the same IEEE sequence. Logistic/GD
    variants need exp() — libm-dependent across engines — which is
    exactly why the demo is OLS: the strongest model whose training
    is value-oracle-checkable."""
    x = F.hour("ts").cast("bigint")
    y = F.col("value")
    stats = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        fsum(y).alias("sy"),
        fsum(x * y).alias("sxy"),
        fsum(y * y).alias("syy"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / den_x
    return stats.select(
        "n", slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
        ((num * num) / (den_x * den_y)).alias("r2"))


CO_MIN_SUPPORT = 3
CO_TOPK = 50


def copurchase_lift(lineitem: DataFrame, min_support: int = CO_MIN_SUPPORT,
                    k: int = CO_TOPK) -> DataFrame:
    """Market-basket co-occurrence mining: part pairs ordered
    together, with support and LIFT (the association-rule strength —
    lift > 1 means the pair co-occurs more than independence
    predicts). The frequent-itemset primitive at the pair level.

    Scale shape: the pair stage is a self-join ON THE BASKET KEY
    (l_orderkey), so fan-out per order is basket_size² — bounded by
    how many distinct parts one order holds (≤ 13 here, never by
    catalog or order count); the classic reason market-basket mining
    scales where an unkeyed part×part join cannot. Item supports are
    a |parts|-row relation broadcast into the lift computation; the
    order count rides as a 1-row broadcast; the support filter and a
    deterministic distributed top-k bound the output. Lift is exact
    integer products with ONE division, written token-identically in
    the oracle."""
    d = lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = d.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    item = d.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c_item"))
    a = d.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = d.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (a.join(b, "l_orderkey")
              .where(F.col("part_a") < F.col("part_b"))
              .groupBy("part_a", "part_b")
              .agg(F.count(F.lit(1)).alias("support"))
              .where(F.col("support") >= min_support))
    ia = item.select(F.col("l_partkey").alias("part_a"),
                     F.col("c_item").alias("c_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"),
                     F.col("c_item").alias("c_b"))
    j = (pairs.join(F.broadcast(ia), "part_a")
              .join(F.broadcast(ib), "part_b")
              .crossJoin(F.broadcast(n_orders)))
    lift = (F.col("n_orders") * F.col("support")) / (F.col("c_a") * F.col("c_b"))
    # distributed top-k FIRST (TakeOrderedAndProject — the
    # heavy_hitters_cms move), then rank the <= k survivors; a bare
    # row_number over the full pair relation would be the global
    # single-partition sort the module's scale notes forbid
    top = (j.select("part_a", "part_b", "support", "c_a", "c_b",
                    lift.alias("lift"))
            .orderBy(F.desc("support"), "part_a", "part_b")
            .limit(k))
    w = Window.orderBy(F.desc("support"), "part_a", "part_b")
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


def scd2_order_history(orders: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval construction: each
    customer's order stream becomes versioned rows with
    [effective_from, effective_to) validity — effective_to is the
    NEXT version's start (lead over the customer-keyed window), NULL
    marks the current version. The warehouse pattern that turns an
    append-only change log into a point-in-time joinable dimension
    (the `asof_event_order` join consumes exactly this shape).

    One shuffle on the dimension key + a per-key sort — the same
    single-exchange budget as the fraud pipeline; lead() is the
    mirror of sessionize's lag(). Interval bounds ride as epoch
    micros so the oracle compares integers."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (orders.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.unix_micros("o_orderdate").alias("effective_from_us"),
        F.unix_micros(F.lead("o_orderdate").over(w)).alias("effective_to_us"),
        F.row_number().over(w).cast("int").alias("version"))
        .withColumn("is_current", F.col("effective_to_us").isNull()))


SKY_BINS = 64


def skyline_parts(part: DataFrame, n_bins: int = SKY_BINS) -> DataFrame:
    """SKYLINE (Pareto frontier) of parts — cheapest-for-the-size:
    keep every part no other part dominates (lower-or-equal price AND
    greater-or-equal size, strict in at least one). The
    multi-criteria OLAP operator behind product/plan recommendation.

    Scale shape — GRID PRUNING instead of the quadratic NOT EXISTS
    the oracle runs: prices land in fixed bins (the
    `value_histogram_quantiles` move); the per-bin max size (<= n_bins
    rows) and its strictly-cheaper-bins running max broadcast back,
    and any part whose size fails its bin's cheaper-prefix max is
    dominated by construction (a strictly cheaper bin holds a
    no-smaller size) — pruned before any join. Dominators for the
    survivors can only sit in the SAME bin (cheaper bins were just
    ruled out, pricier bins cannot dominate), so the exact verify is
    a bin-KEYED self-join over the pruned survivor set — the
    candidate count is bounded per bin, never catalog². Pruning is
    conservative at any binning, so FP bin placement affects cost
    only, never the result."""
    ext = part.agg(F.min("p_retailprice").alias("lo"),
                   F.max("p_retailprice").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / n_bins
    bin_id = (F.when(F.col("hi") > F.col("lo"),
                     F.least(F.floor((F.col("p_retailprice") - F.col("lo"))
                                     / width),
                             F.lit(n_bins - 1).cast("bigint")))
               .otherwise(F.lit(0).cast("bigint")))
    binned = (part.crossJoin(F.broadcast(ext))
                  .select("p_partkey", "p_retailprice", "p_size",
                          bin_id.alias("bin")))
    binmax = binned.groupBy("bin").agg(F.max("p_size").alias("mx"))
    wprev = (Window.orderBy("bin")
                   .rowsBetween(Window.unboundedPreceding, -1))
    prev = binmax.select("bin", F.max("mx").over(wprev).alias("prev_mx"))
    cand = (binned.join(F.broadcast(prev), "bin")
                  .where(F.col("prev_mx").isNull()
                         | (F.col("p_size") > F.col("prev_mx"))))
    q = cand.select(F.col("bin"), F.col("p_retailprice").alias("q_price"),
                    F.col("p_size").alias("q_size"),
                    F.col("p_partkey").alias("q_key"))
    dominated = cand.join(
        q, (cand["bin"] == q["bin"])
           & (q["q_price"] <= cand["p_retailprice"])
           & (q["q_size"] >= cand["p_size"])
           & ((q["q_price"] < cand["p_retailprice"])
              | (q["q_size"] > cand["p_size"])),
        "left_semi")
    return (cand.join(dominated.select("p_partkey"), "p_partkey", "left_anti")
                .select("p_partkey", "p_retailprice", "p_size"))


def daily_activity_full_outer(events: DataFrame, orders: DataFrame) -> DataFrame:
    """FULL OUTER join coverage (completing the join-type matrix:
    inner/left/semi/anti/broadcast-cross are exercised elsewhere):
    per-day event counts against per-day order counts, keeping days
    present on EITHER side with zero-filled gaps — the ops-dashboard
    'activity by source' comparison. Both sides aggregate BEFORE the
    join (map-side partials; the join carries |days| rows, never raw
    facts), which is the scale rule for outer joins: never full-outer
    two fact tables, full-outer their aggregates."""
    ev = (events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
                .agg(F.count(F.lit(1)).alias("n_events")))
    od = (orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
                .agg(F.count(F.lit(1)).alias("n_orders")))
    return (ev.join(od, "day", "full_outer")
              .select("day",
                      F.coalesce("n_events", F.lit(0)).alias("n_events"),
                      F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
              .orderBy("day"))


SETOP_Y1_FROM, SETOP_Y1_TO = "1996-01-01", "1997-01-01"
SETOP_Y2_FROM, SETOP_Y2_TO = "1997-01-01", "1998-01-01"


def customer_retention_setops(orders: DataFrame) -> DataFrame:
    """Set-operation coverage (INTERSECT / EXCEPT as first-class
    relational ops): customers ordering in BOTH years (retained) and
    in year 1 but NOT year 2 (churned), one tagged relation. Set ops
    compile to the same aggregate/join machinery underneath — both
    inputs are pre-aggregated distinct key sets, so the shuffle
    carries keys only."""
    y1 = (orders.where((F.col("o_orderdate") >= ntz(SETOP_Y1_FROM))
                       & (F.col("o_orderdate") < ntz(SETOP_Y1_TO)))
                .select("o_custkey").distinct())
    y2 = (orders.where((F.col("o_orderdate") >= ntz(SETOP_Y2_FROM))
                       & (F.col("o_orderdate") < ntz(SETOP_Y2_TO)))
                .select("o_custkey").distinct())
    retained = y1.intersect(y2).select(
        F.lit("retained").alias("cohort"), "o_custkey")
    churned = y1.exceptAll(y2).select(
        F.lit("churned").alias("cohort"), "o_custkey")
    return retained.unionAll(churned)


MAD_K = 3.0


def mad_outliers(events: DataFrame, k: float = MAD_K) -> DataFrame:
    """Robust outlier detection per event type: flag values more than
    k MADs from the median (median absolute deviation — the robust
    z-score; unlike mean/stddev, a burst of fraud amounts cannot
    drag its own detection threshold). Both the median and the MAD
    are exact DISCRETE picks (the `event_value_percentiles` move:
    rank + ceil(n/2), actual data values), so the thresholds — and
    therefore the flag set — are engine-exact; no distributional
    stddev drift.

    Scale shape: two ranked passes, both partitioned on event_type —
    the second sorts a derived column under the SAME partitioning, so
    the exchange is paid once (the `fraud_scores` two-window
    discipline); the per-type median/MAD relations are type-cardinality
    rows broadcast back. dev_ratio is one IEEE division."""
    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist

    w_n = Window.partitionBy("event_type")
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    # persisted at the post-exchange boundary: the median branch, the
    # deviation ranking, and the final flag filter all read this one
    # partitioned relation, so the event_type exchange is computed
    # once and every later window pass is sort-only on top of the
    # cached partitioning
    ranked = tracked_persist(events.select(
        "event_id", "event_type", "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n")))
    med = (ranked.where(F.col("rn") == F.greatest(
                F.lit(1), F.ceil(F.lit(0.5) * F.col("n"))))
                 .select("event_type", F.col("value").alias("med")))
    d = (ranked.join(F.broadcast(med), "event_type")
               .select("event_id", "event_type", "value", "med",
                       F.abs(F.col("value") - F.col("med")).alias("dev")))
    w_rank2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    ranked2 = d.select(
        "event_type", "dev",
        F.row_number().over(w_rank2).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"))
    mad = (ranked2.where(F.col("rn") == F.greatest(
                F.lit(1), F.ceil(F.lit(0.5) * F.col("n"))))
                  .select("event_type", F.col("dev").alias("mad")))
    return (d.join(F.broadcast(mad), "event_type")
             .where(F.col("dev") > F.lit(k) * F.col("mad"))
             .select("event_id", "event_type", "value", "med", "mad",
                     (F.col("dev") / F.col("mad")).alias("dev_ratio")))


def daily_orders_gapfilled(orders: DataFrame) -> DataFrame:
    """Calendar-spine gap filling: per-day order counts over a DENSE
    date axis — days with no orders appear as explicit zeros. The
    resample/reindex step every time-series consumer (forecasting,
    charting, window regression) needs, because a groupBy alone
    silently drops empty days and downstream lag/window math shifts.

    Scale shape: the spine is GENERATED, not scanned — one
    sequence() over the [min, max] date range exploded from a 1-row
    extremes aggregate (a relation source from thin air, like the
    generator family); the daily aggregate joins it by date. The
    outer side is |days| rows regardless of fact volume, so the join
    broadcasts the spine, and the fact side is one map-side-combined
    groupBy."""
    ext = orders.agg(
        F.date_trunc("DAY", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("DAY", F.max("o_orderdate")).alias("hi"))
    spine = (ext.select(F.explode(F.sequence(
                 F.col("lo"), F.col("hi"),
                 F.expr("INTERVAL 1 DAY"))).alias("d"))
                .select(F.date_format("d", "yyyy-MM-dd").alias("day")))
    daily = (orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd")
                             .alias("day"))
                   .agg(F.count(F.lit(1)).alias("n_orders"),
                        fsum(F.col("o_totalprice")).alias("total_price")))
    # hint the BUILD (right) side: Spark cannot broadcast-build the
    # streamed left of a LeftOuter join, so a left-side hint is
    # silently dropped; `daily` is equally bounded at |days| rows
    # post-aggregation
    return (spine.join(F.broadcast(daily), "day", "left")
             .select("day",
                     F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
                     F.coalesce("total_price", F.lit(0.0)).alias("total_price"))
             .orderBy("day"))


def customer_order_ranks(orders: DataFrame) -> DataFrame:
    """Ranking-function coverage in one relation (row_number and
    rank appear elsewhere; this adds the remaining four): per
    customer order count with dense_rank / percent_rank / cume_dist
    over the TIE-PRONE count key — all three are functions of the KEY
    VALUE, not row order, so ties are engine-deterministic — plus the
    decile via ntile, which DOES depend on row position and therefore
    ranks over a TOTAL order (count, custkey). percent_rank's
    (rank−1)/(n−1) is one exact-integer-fed IEEE division.

    Scale note: a global ranking is a range-partitioned sort (Spark
    parallelizes the sort; the window itself runs per range) — fine
    for |customers| rows, and the deterministic tie-break is what
    makes the result reproducible at any partitioning."""
    spend = (orders.groupBy("o_custkey")
                   .agg(F.count(F.lit(1)).alias("n_orders")))
    w_ties = Window.orderBy("n_orders")
    w_total = Window.orderBy("n_orders", "o_custkey")
    return (spend.select(
        "o_custkey", "n_orders",
        F.dense_rank().over(w_ties).cast("int").alias("drank"),
        F.percent_rank().over(w_ties).alias("prank"),
        F.cume_dist().over(w_ties).alias("cdist"),
        F.ntile(10).over(w_total).cast("int").alias("decile")))


def value_histogram_quantiles_by_type(events: DataFrame,
                                      n_bins: int = HIST_BINS,
                                      qs: list[float] | None = None
                                      ) -> DataFrame:
    """GROUPED fixed-bin quantile sketch: per-event_type quantiles
    from per-(type, bin) counters — the bounded-error companion to
    the exact `event_value_percentiles` baseline (which sorts per
    group; this never sorts data). State is |types|·n_bins counters;
    extremes ride a broadcast |types|-row relation; the cumulative
    sum and threshold pick run per group over the counter relation.
    Same engine-exact binning arithmetic as the global sketch."""
    qs = HIST_QS if qs is None else qs
    ext = events.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"))
    width = (F.col("hi") - F.col("lo")) / n_bins
    bin_id = (F.when(F.col("hi") > F.col("lo"),
                     F.least(F.floor((F.col("value") - F.col("lo")) / width),
                             F.lit(n_bins - 1).cast("bigint")))
               .otherwise(F.lit(0).cast("bigint")))
    binned = (events.join(F.broadcast(ext), "event_type")
                    .select("event_type", bin_id.alias("bin"),
                            "lo", "hi", "n"))
    hist = (binned.groupBy("event_type", "bin", "lo", "hi", "n")
                  .agg(F.count(F.lit(1)).alias("cnt")))
    wcum = (Window.partitionBy("event_type").orderBy("bin")
                  .rowsBetween(Window.unboundedPreceding, 0))
    cum = hist.select("event_type", "bin", "lo", "hi", "n",
                      F.sum("cnt").over(wcum).alias("cum"))
    q_rel = (events.sparkSession.range(1)
             .select(F.explode(F.array(*[F.lit(float(q)) for q in qs]))
                      .alias("q")))
    sel = cum.join(F.broadcast(q_rel),
                   F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
    return (sel.groupBy("event_type", "q")
               .agg(F.min("bin").alias("bin"),
                    F.min(F.col("lo") + (F.col("bin") + 1) * width)
                     .alias("est"))
               .orderBy("event_type", "q"))


SLIDE_US = WINDOW_US // 4  # 4 hops per window


def sliding_window_counts(events: DataFrame,
                          window_us: int = WINDOW_US,
                          slide_us: int = SLIDE_US) -> DataFrame:
    """SLIDING (hop) window counts — the overlap-window shape
    `windowed_counts`' tumbling buckets can't express: every event
    contributes to window_us / slide_us overlapping windows. The
    assignment is a row-local explode over the fixed hop offsets
    (exact integer arithmetic, no window library), then the same
    map-side-combined aggregation; output volume is a deterministic
    overlap-factor multiple of the tumbling result, which is the
    honest cost of hop windows at any scale."""
    n_hops = window_us // slide_us
    ts_us = F.unix_micros(F.col("ts"))
    # hop k's window start: the largest value congruent to
    # k·slide_us (mod window_us) that is <= ts; over k = 0..n_hops-1
    # this enumerates exactly the n_hops valid starts, one per
    # residue class — pure integer arithmetic
    exploded = events.select(
        "event_type", "value",
        F.explode(F.array(*[
            (ts_us - ((ts_us - F.lit(k * slide_us))
                      % F.lit(window_us))).alias(f"w{k}")
            for k in range(n_hops)])).alias("window_start_us"))
    return (exploded.groupBy("window_start_us", "event_type")
                    .agg(F.count(F.lit(1)).alias("n_events"),
                         fsum(F.col("value")).alias("total_value")))


def weekly_revenue_growth(orders: DataFrame) -> DataFrame:
    """Week-over-week growth — the reporting composition the
    gap-filled spine exists for: weekly fixed-point revenue sums on a
    DENSE week axis (a silently-missing week would make lag() skip a
    period and misstate growth — the gap-fill guarantees adjacency),
    then lag + one division. Growth is NULL for the first week and
    for a zero-revenue predecessor (explicit CASE, no fabricated
    infinities). One groupBy + a |weeks|-row window — data-scale work
    is the aggregation only."""
    ext = orders.agg(
        F.date_trunc("WEEK", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("WEEK", F.max("o_orderdate")).alias("hi"))
    spine = (ext.select(F.explode(F.sequence(
                 F.col("lo"), F.col("hi"),
                 F.expr("INTERVAL 7 DAYS"))).alias("w"))
                .select(F.date_format("w", "yyyy-MM-dd").alias("week")))
    weekly = (orders.groupBy(F.date_format(
                  F.date_trunc("WEEK", "o_orderdate"), "yyyy-MM-dd")
                  .alias("week"))
                    .agg(fsum(F.col("o_totalprice")).alias("revenue")))
    dense = (spine.join(F.broadcast(weekly), "week", "left")
                  .select("week", F.coalesce("revenue", F.lit(0.0))
                                   .alias("revenue")))
    w = Window.orderBy("week")
    prev = F.lag("revenue").over(w)
    growth = F.when(prev > 0.0, (F.col("revenue") - prev) / prev)
    return dense.select("week", "revenue", growth.alias("wow_growth"))


def grouping_sets_revenue(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the aggregation-level shape neither
    CUBE nor ROLLUP can express: {(year), (status), ()} skips the
    (year, status) cross level entirely (cube would compute it,
    rollup can't produce the two independent single-column levels).
    Still ONE pass with map-side partial aggregation; grouping_id
    disambiguates subtotal rows from real NULL keys, mirrored
    bit-for-bit by the oracle's GROUPING()."""
    base = orders.withColumn("o_year", F.year("o_orderdate").cast("int"))
    return (base.groupingSets([["o_year"], ["o_orderstatus"], []],
                              "o_year", "o_orderstatus")
                .agg(F.grouping_id().cast("int").alias("gid"),
                     F.count(F.lit(1)).alias("n_orders"),
                     fsum(F.col("o_totalprice")).alias("total_price"))
                .select("gid", "o_year", "o_orderstatus",
                        "n_orders", "total_price"))


def activity_gini(events: DataFrame) -> DataFrame:
    """Gini coefficient of per-user activity — the concentration
    metric that tells a platform whether traffic is organic (spread)
    or dominated by a few hot accounts (bots, scrapers): 0 = uniform,
    →1 = concentrated. Computed from the closed form over rank-sorted
    counts: G = 2·Σ(rank·count) / (n·Σcount) − (n+1)/n.

    Scale shape: the sort ranks the |users|-row COUNT relation (the
    value-domain move), never events; every sum is an exact integer
    with any fold order, and the final expression is three integer-fed
    IEEE divisions written token-identically in the oracle.

    Overflow: Σ(rank·count) is bounded by n_users·total_events —
    ~1e21 at the 1e9-user/1e12-event scale this engine targets, past
    int64 — so the rank·count products and the n·Σc denominator
    accumulate as DECIMAL(38,0) (exact to 1e38) and convert to double
    only for the final division, identically in the oracle."""
    per_user = (events.groupBy("user_id")
                      .agg(F.count(F.lit(1)).alias("c")))
    w = Window.orderBy("c", "user_id")
    ranked = per_user.select(
        "c", F.row_number().over(w).cast("bigint").alias("rnk"))
    num = F.lit(2) * F.sum(F.col("rnk").cast("decimal(38,0)") * F.col("c"))
    den = F.count(F.lit(1)).cast("decimal(38,0)") * F.sum("c")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c").cast("bigint").alias("total_events"),
        (num.cast("double") / den.cast("double")
         - (F.count(F.lit(1)) + 1) / F.count(F.lit(1))).alias("gini"))


FUNNEL_STEPS = ["view", "click", "purchase"]


def funnel_ordered(events: DataFrame) -> DataFrame:
    """Strict-ORDER conversion funnel — the product-analytics
    primitive `event_funnel`'s transition matrix doesn't give: how
    many users did view, then click strictly AFTER that view, then
    purchase strictly after that click. Each stage keeps the EARLIEST
    qualifying timestamp (min is order-free — engine-exact), and the
    next stage joins on the user key and filters to strictly-later
    events: three user-keyed joins that all share one hash
    partitioning (co-partitioned chain, AQE coalesces the tiny
    tails). Output is the attrition row — the same observability
    shape as `corpus_filter_funnel`, for user journeys."""
    us = F.unix_micros("ts")
    s1 = (events.where(F.col("event_type") == FUNNEL_STEPS[0])
                .groupBy("user_id").agg(F.min(us).alias("t1")))
    s2 = (events.where(F.col("event_type") == FUNNEL_STEPS[1])
                .join(s1, "user_id")
                .where(us > F.col("t1"))
                .groupBy("user_id").agg(F.min(us).alias("t2")))
    s3 = (events.where(F.col("event_type") == FUNNEL_STEPS[2])
                .join(s2, "user_id")
                .where(us > F.col("t2"))
                .groupBy("user_id").agg(F.min(us).alias("t3")))
    c1 = s1.agg(F.count(F.lit(1)).alias("n_view"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_then_click"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_then_purchase"))
    return (c1.crossJoin(F.broadcast(c2)).crossJoin(F.broadcast(c3))
              .select("n_view", "n_then_click", "n_then_purchase",
                      (F.col("n_then_purchase") / F.col("n_view"))
                       .alias("conversion")))


def cohort_retention(orders: DataFrame) -> DataFrame:
    """Cohort retention matrix — customers cohorted by first-order
    month; for each (cohort_month, month_offset) count how many of
    that cohort ordered again `offset` months later. The standard
    growth-analytics triangle, all integer arithmetic (counts and
    calendar month diffs) so parity is exact; the single float
    (retention_rate) is a rounded ratio of two integers.

    Scale shape: ONE pass over the fact table — `active`
    (distinct custkey × month) is persisted and every downstream
    relation derives from it: the first-order month is min(mon) over
    `active` (identical to min over raw orders), the cohort join is
    custkey⋈custkey on the persisted relation (co-partitioned with
    the agg that produced it), and the final groupBy is |months|²
    rows. `ret` is also persisted because cohort_size reads its
    offset-0 slice — without it, the self-reference would replay the
    whole lineage including the fact scan. No window over the fact
    table, no global sort.
    """
    from real_time_fraud_detection_flink_kafka_spark.cache import tracked_persist

    active = tracked_persist(orders.select(
        "o_custkey",
        F.date_format(F.trunc("o_orderdate", "month"), "yyyy-MM-dd").alias("mon"))
        .distinct())
    first = active.groupBy("o_custkey").agg(F.min("mon").alias("cohort_month"))
    j = active.join(first, "o_custkey").select(
        "cohort_month",
        F.months_between(F.to_date("mon"), F.to_date("cohort_month"))
         .cast("int").alias("month_offset"),
        "o_custkey")
    ret = tracked_persist(j.groupBy("cohort_month", "month_offset").agg(
        F.count_distinct("o_custkey").alias("n_active")))
    size = (ret.where(F.col("month_offset") == 0)
               .select("cohort_month", F.col("n_active").alias("cohort_size")))
    return (ret.join(F.broadcast(size), "cohort_month")
               .select("cohort_month",
                       F.col("month_offset"),
                       F.col("n_active").cast("int").alias("n_active"),
                       F.col("cohort_size").cast("int").alias("cohort_size"),
                       F.round(F.col("n_active") / F.col("cohort_size"), 6)
                        .alias("retention_rate")))


# Benford first-digit expectations log10(1 + 1/d), d = 1..9, rounded
# to 6 dp as shared literals — both engines consume these constants,
# so no log10() runs anywhere at query time
BENFORD_EXPECTED = {
    d: round(__import__("math").log10(1 + 1 / d), 6) for d in range(1, 10)
}


def benford_audit(events: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit over transaction values — the
    classic fraud-forensics screen (fabricated amounts flatten the
    digit histogram; reference scope: the rule battery's statistical
    cousin). Emits per-digit observed counts/shares against the
    log10(1+1/d) expectation and the absolute deviation.

    Determinism: the first significant digit comes from the DECIMAL
    STRING of integer cents (CAST(round(value·100) AS BIGINT) — the
    fsum fixed-point move), so no log10/floor-of-log floats anywhere;
    expectations are shared 6-dp literals; shares/deviations are
    per-row double ops in one fixed order.

    Scale shape: one map-side-combined groupBy over 9 digit keys, the
    1-row total broadcast back — nothing else moves."""
    # gate on the INTEGER cents (>= 1), not value > 0: a value in
    # (0, 0.005) rounds to 0 cents and would emit a malformed digit-0
    # row with NULL benford/abs_dev that also inflates the share
    # denominator
    cents = F.round(F.col("value") * 100).cast("bigint")
    digit = F.substring(F.col("cents").cast("string"), 1, 1).cast("int")
    per = (events.select(cents.alias("cents"))
                 .where(F.col("cents") >= 1)
                 .select(digit.alias("digit"))
                 .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    tot = per.agg(F.sum("n").cast("double").alias("_tot"))
    expected = F.lit(None).cast("double")
    for d, p in BENFORD_EXPECTED.items():
        expected = F.when(F.col("digit") == d, F.lit(p)).otherwise(expected)
    share = F.col("n") / F.col("_tot")
    return (per.crossJoin(F.broadcast(tot))
               .select("digit", "n",
                       F.round(share, 6).alias("share"),
                       expected.alias("benford"),
                       F.round(F.abs(share - expected), 6).alias("abs_dev")))


CUSUM_SCALE = 1_000_000
CUSUM_H_FP = 400_000_000  # alarm at 400 value-units of accumulated drift


def cusum_value_drift(events: DataFrame) -> DataFrame:
    """Per-user CUSUM drift detector over transaction values (Page
    1954 — the sequential changepoint test behind spend-pattern
    monitoring): the classic recursion S_i = max(0, S_{i-1} + x_i − μ)
    rewritten as the WINDOW identity max_j(C_j − min_{i≤j} C_i) over
    the running sum C of (x − μ), so the sequential fold becomes two
    ordered window passes — no applyInPandas, no per-key Python.

    Determinism: values and the global mean are fixed-point bigints
    (μ = Σv div n), the event order key (ts_us, event_id) is unique,
    so every window value is integer-exact in both engines.

    Scale shape: one shuffle (partitionBy user_id, both windows share
    it), then a map-side-combined per-user rollup."""
    from pyspark.sql import Window

    v = F.round(F.col("value") * CUSUM_SCALE).cast("bigint")
    e = events.select("user_id", F.unix_micros(F.col("ts")).alias("tsu"),
                      "event_id", v.alias("v"))
    mu = (e.agg(F.sum("v").alias("_s"), F.count(F.lit(1)).alias("_n"))
           .select(F.expr("_s div _n").alias("mu")))  # exact bigint floor
    w = (Window.partitionBy("user_id").orderBy("tsu", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cs = F.sum(F.col("v") - F.col("mu")).over(w)
    # Page's recursion anchors at S_0 = 0, so the window identity is
    # S_j = C_j - min(0, min_{i<=j} C_i): the virtual C_0 = 0 must
    # participate in the running min, else a user whose running sum
    # never dips below its FIRST value (all values above the mean)
    # gets max_cusum underreported by that positive prefix — exactly
    # the strongest drifters.
    withcs = (e.crossJoin(F.broadcast(mu))
               .withColumn("cs", cs)
               .withColumn("up", F.col("cs")
                           - F.least(F.min("cs").over(w), F.lit(0))))
    return (withcs.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_events"),
                 F.max("up").alias("max_fp"))
            .select("user_id", "n_events",
                    F.round(F.col("max_fp") / CUSUM_SCALE, 6)
                     .alias("max_cusum"),
                    (F.col("max_fp") >= CUSUM_H_FP).alias("alarm")))


DIFF_DROP_MOD = 10   # v2 drops event_id % 10 == 0 (removed rows)
DIFF_EDIT_MOD = 7    # v2 bumps value on event_id % 7 == 0 (changed rows)
# v2 appends re-keyed rows (added). A HIGH BIT, not max-sf + slack:
# scale runs replicate event_ids past the old 10M offset, so synthetic
# keys collided with real rows (duplicate keys in v2/changes →
# full-outer fan-out, identically in both engines — parity-invisible).
# No benchmark scale factor reaches 2^40 distinct event_ids.
DIFF_ADD_OFFSET = 1 << 40


def table_diff(events: DataFrame) -> DataFrame:
    """Keyed table reconciliation — the data-engineering diff between
    two snapshot versions of a fact table (CDC backfill validation,
    replica drift audits): full-outer join on the key, row-content
    md5 on each side, verdict ∈ {added, removed, changed} (identical
    rows are dropped — the diff is the EXCEPTION report).

    The two versions are derived deterministically from the one
    events table so the oracle replays them: v2 drops every
    DIFF_DROP_MOD-th row (→ removed), perturbs value on every
    DIFF_EDIT_MOD-th row (→ changed), and appends a re-keyed copy of
    3 rows (→ added).

    Scale shape: one co-keyed full-outer shuffle join on event_id;
    row hashes are computed in the scan projections, so only (key,
    32-byte hash) columns move for the unchanged majority — the
    pattern that keeps a 100 TB reconciliation network-bound on keys,
    not payloads.

    Determinism: the content hash is md5 of a fixed-order concat of
    the fixed-point value and event_type — no doubles in the key."""
    base = events.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    v1 = base
    edited = F.when(F.col("event_id") % DIFF_EDIT_MOD == 0,
                    F.col("cents") + 100).otherwise(F.col("cents"))
    v2 = (base.where(F.col("event_id") % DIFF_DROP_MOD != 0)
              .select("event_id", "event_type", edited.alias("cents")))
    added = (base.where(F.col("event_id") < 3)
                 .select((F.col("event_id") + DIFF_ADD_OFFSET).alias("event_id"),
                         "event_type", "cents"))
    v2 = v2.unionByName(added)

    def h(df):
        return df.select(
            "event_id",
            F.md5(F.concat_ws("|", F.col("cents").cast("string"),
                              F.col("event_type"))).alias("row_md5"))

    a = h(v1).withColumnRenamed("row_md5", "md5_v1")
    b = h(v2).withColumnRenamed("row_md5", "md5_v2")
    j = a.join(b, "event_id", "full_outer")
    status = (F.when(F.col("md5_v1").isNull(), F.lit("added"))
               .when(F.col("md5_v2").isNull(), F.lit("removed"))
               .when(F.col("md5_v1") != F.col("md5_v2"), F.lit("changed")))
    return (j.withColumn("status", status)
             .where(F.col("status").isNotNull())
             .select("event_id", "status", "md5_v1", "md5_v2"))


MERGE_CHECK_MOD = 1_000_003  # fold row hashes before the checksum sum


def merge_upsert(events: DataFrame) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg lakehouse write path):
    apply a keyed change-set to a base snapshot — matched+newer →
    UPDATE, unmatched → INSERT, tombstone → DELETE — and emit the
    audit row a writer logs: per-action counts plus an ORDER-FREE
    integer checksum of the merged table (sum of per-row md5-int60s —
    commutative, so partitioning can't change it).

    Base/changes derive deterministically from events (the table_diff
    discipline): changes = every DIFF_EDIT_MOD-th row re-valued
    (updates) + 3 re-keyed rows (inserts) + every DIFF_DROP_MOD-th
    key as a tombstone (deletes).

    Scale shape: ONE co-keyed full-outer shuffle join; counts and the
    checksum are map-side-combined integer aggregates — the merged
    table itself never leaves the executors."""
    from real_time_fraud_detection_flink_kafka_spark.functions.hashing import (
        md5_int60,
    )

    base = events.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    upd = (base.where(F.col("event_id") % DIFF_EDIT_MOD == 0)
               .select("event_id", "event_type",
                       (F.col("cents") + 100).alias("cents"),
                       F.lit(False).alias("tombstone")))
    ins = (base.where(F.col("event_id") < 3)
               .select((F.col("event_id") + DIFF_ADD_OFFSET).alias("event_id"),
                       "event_type", "cents", F.lit(False).alias("tombstone")))
    dele = (base.where((F.col("event_id") % DIFF_DROP_MOD == 0)
                       & (F.col("event_id") % DIFF_EDIT_MOD != 0))
                .select("event_id", "event_type", "cents",
                        F.lit(True).alias("tombstone")))
    changes = upd.unionByName(ins).unionByName(dele)
    j = (base.select("event_id", F.col("event_type").alias("bt"),
                     F.col("cents").alias("bc"))
             .join(changes.select("event_id",
                                  F.col("event_type").alias("ct"),
                                  F.col("cents").alias("cc"), "tombstone"),
                   "event_id", "full_outer"))
    action = (F.when(F.col("bc").isNull(), F.lit("insert"))
               .when(F.col("cc").isNull(), F.lit("keep"))
               .when(F.col("tombstone"), F.lit("delete"))
               .otherwise(F.lit("update")))
    merged_cents = F.when(F.col("cc").isNotNull() & ~F.coalesce("tombstone", F.lit(False)),
                          F.col("cc")).otherwise(F.col("bc"))
    merged_type = F.coalesce("ct", "bt")
    # per-row hash folded mod CHECK_MOD so the commutative sum stays
    # far from bigint overflow even at 10^12 rows (raw 60-bit values
    # would overflow — and DuckDB's sum(BIGINT) widens to HUGEINT
    # while Spark's wraps, so the engines would even disagree)
    rh = md5_int60(F.concat_ws("|", F.col("event_id").cast("string"),
                               merged_type, merged_cents.cast("string"))) \
        % MERGE_CHECK_MOD
    live = action != "delete"
    return (j.select(action.alias("action"), live.alias("live"),
                     F.when(live, rh).otherwise(F.lit(0)).alias("rh"))
             .groupBy()
             .agg(F.sum(F.when(F.col("action") == "insert", 1).otherwise(0)).alias("n_inserted"),
                  F.sum(F.when(F.col("action") == "update", 1).otherwise(0)).alias("n_updated"),
                  F.sum(F.when(F.col("action") == "delete", 1).otherwise(0)).alias("n_deleted"),
                  F.sum(F.when(F.col("action") == "keep", 1).otherwise(0)).alias("n_unchanged"),
                  F.sum("rh").alias("table_checksum")))


def scd2_user_segments(events: DataFrame) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 history build — the lakehouse
    dimension-maintenance pattern next to MERGE (`merge_upsert`) and
    diff (`table_diff`): each user's observed event_type is the
    tracked attribute, and the output is its full validity history —
    one row per RUN of consecutive equal values with
    [valid_from_us, valid_to_us) interval semantics, valid_to_us = -1
    and is_current = true on the open (latest) run. This is exactly
    the history table an SCD2 pipeline materializes from a CDC
    change stream: consecutive duplicate values collapse (no new
    version when nothing changed), each change CLOSES the prior
    version at the successor's start.

    Scale shape: gaps-and-islands entirely inside per-user windows
    ordered by (ts_us, event_id) — one keyed exchange reused by the
    lag/run-sum/lead passes (same partition key, Catalyst plans one
    Exchange); run collapse is a map-side-combinable groupBy on
    (user_id, run). User keys are high-cardinality (no hot-partition
    risk) and runs are bounded by per-user activity. Times are
    BIGINT epoch-micros (the ts_us contract).

    Determinism: (ts_us, event_id) is a total order; run ids are
    integer prefix sums of change flags; -1 (not NULL) marks the
    open interval so the value hash never compares NaN."""
    from pyspark.sql import Window

    e = events.select(
        "user_id", "event_id", F.col("event_type").alias("segment"),
        F.unix_micros(F.col("ts")).alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = F.when(
        F.lag("segment").over(w).isNull()
        | (F.lag("segment").over(w) != F.col("segment")), 1).otherwise(0)
    runs = (e.withColumn("chg", chg)
             .withColumn("run", F.sum("chg").over(
                 w.rowsBetween(Window.unboundedPreceding, 0))))
    collapsed = (runs.groupBy("user_id", "run")
                 .agg(F.first("segment").alias("segment"),
                      F.min("ts_us").alias("valid_from_us"),
                      F.count(F.lit(1)).alias("n_events")))
    w_run = Window.partitionBy("user_id").orderBy("run")
    nxt = F.lead("valid_from_us").over(w_run)
    return collapsed.select(
        "user_id",
        F.col("run").cast("int").alias("version"),
        "segment", "valid_from_us",
        F.coalesce(nxt, F.lit(-1)).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        F.col("n_events").cast("int").alias("n_events"))


MV_DELTA_MOD = 10  # event_id % 10 == 0 → the arriving delta batch


def mv_maintain(events: DataFrame) -> DataFrame:
    """Incremental materialized-view maintenance (self-maintainable
    aggregate views, Gupta & Mumick): the per-type revenue view is
    NOT recomputed from scratch — yesterday's partial aggregates
    (base slice) merge with the arriving delta's partial aggregates
    through one |types|-sized outer join of aggregate rows. The
    ORACLE is the full recompute over the union, so the parity gate
    itself proves incremental ≡ full — the associativity contract
    every streaming/lakehouse MV engine rests on.

    Determinism: counts and fixed-point sums are integers; the merge
    is coalesce+add; the final division is the shared fsum form.

    Scale shape: two map-side-combined groupBys over DISJOINT slices
    (together one pass of the fact table) and a tiny aggregate-row
    join — at 10^12 rows the delta side touches only the delta."""
    fp = F.round(F.col("value") * SCALE).cast("bigint")
    base = events.select("event_type", "event_id", fp.alias("vfp"))
    v1 = (base.where(F.col("event_id") % MV_DELTA_MOD != 0)
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n1"), F.sum("vfp").alias("s1")))
    delta = (base.where(F.col("event_id") % MV_DELTA_MOD == 0)
                 .groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("nd"), F.sum("vfp").alias("sd")))
    z = F.lit(0).cast("bigint")
    merged = v1.join(delta, "event_type", "full_outer")
    return merged.select(
        "event_type",
        (F.coalesce("n1", z) + F.coalesce("nd", z)).alias("n_events"),
        ((F.coalesce("s1", z) + F.coalesce("sd", z)) / F.lit(float(SCALE)))
        .alias("total_value"))


ATTR_WINDOW_US = 3_600 * 1_000_000  # 1 h lookback


def attribution_credit(events: DataFrame) -> DataFrame:
    """First/last-touch attribution: for every `purchase`, the
    earliest and latest non-purchase touch by the same user in the
    preceding hour — the marketing-analytics join every event
    platform ships. One RANGE-frame window pass instead of a
    self-join: touches ride the same per-user ordering as the
    conversions they credit.

    Determinism: a RANGE frame has no intra-frame order, so
    first/last come from min/max over (ts_us, event_id, type)
    STRUCTS — total integer order, not frame position. Purchases
    inside the window are excluded from touches via null-struct
    arithmetic (min/max ignore nulls in both engines).

    Scale shape: one shuffle (partitionBy user_id shared by all
    three window aggregates), then a row filter — no joins."""
    from pyspark.sql import Window

    e = events.select("event_id", "user_id", "event_type",
                      F.unix_micros(F.col("ts")).alias("tsu"))
    touch = F.when(F.col("event_type") != "purchase",
                   F.struct("tsu", "event_id", "event_type"))
    w = (Window.partitionBy("user_id").orderBy("tsu")
         .rangeBetween(-ATTR_WINDOW_US, -1))
    out = (e.withColumn("ft", F.min(touch).over(w))
            .withColumn("lt", F.max(touch).over(w))
            .withColumn("n_touches",
                        F.count(touch["event_id"]).over(w))
            .where(F.col("event_type") == "purchase"))
    return out.select(
        F.col("event_id").alias("conv_event_id"), "user_id",
        F.col("ft.event_type").alias("first_touch"),
        F.col("lt.event_type").alias("last_touch"),
        F.col("n_touches").cast("int").alias("n_touches"))


COMPACT_TARGET_BYTES = 2_000   # target compacted-file size (scaled to
                               # the synthetic manifest's ~70-700 B
                               # hourly files; production: 128-1024 MB)
COMPACT_FILE_US = 3_600_000_000  # one manifest "file" per hour of data


SNAP_HOUR_US = 3_600_000_000   # one snapshot per ingest hour
SNAP_KEEP_LAST = 5             # retention: always keep the newest N
# plus one DAILY anchor (the day's last snapshot) for all history —
# the standard lakehouse retention ladder (Delta VACUUM/Iceberg
# expire_snapshots keep-last + time-travel anchors)


def expire_snapshots(events: DataFrame) -> DataFrame:
    """Snapshot-retention planning — the lakehouse EXPIRE maintenance
    pass that closes the family next to `compact_small_files`
    (OPTIMIZE), `merge_upsert` (write), `mv_maintain` (views) and
    `table_diff` (reconciliation): a streaming ingest commits one
    snapshot per trigger; unbounded history bloats metadata and
    blocks data-file deletion, so the expirer keeps the newest
    SNAP_KEEP_LAST snapshots plus each day's LAST snapshot as the
    time-travel anchor, and marks everything else expired. The
    snapshot manifest derives deterministically from events (one
    snapshot per ingest hour with integer row/byte tallies).

    Output: one audit row per snapshot — kept flag, the reason
    ('recent' wins over 'daily_anchor'; NULL when expired), and the
    reclaimable byte tally a scheduler thresholds on.

    Scale shape: the only row-scale work is the manifest aggregation
    (map-side-combined groupBy on the hour bucket); retention logic
    runs on the MANIFEST — |hours| rows, metadata not data — so the
    unpartitioned recency window orders thousands of manifest rows,
    never the table (the compact_small_files discipline).

    Determinism: hour/day ids are exact bigint floor divisions;
    recency rank orders by the integer snapshot hour; the daily
    anchor is an integer max per day."""
    def idiv(num, den: int):
        return ((num - num % den) / den).cast("bigint")

    manifest = (events.groupBy(
        idiv(F.unix_micros(F.col("ts")), SNAP_HOUR_US).alias("snap_hour"))
        .agg(F.count(F.lit(1)).alias("n_rows"),
             (F.count(F.lit(1)) * 64
              + F.sum(F.length("event_type"))).alias("size_bytes")))
    manifest = manifest.withColumn("day", F.expr("snap_hour div 24"))
    w_recent = Window.orderBy(F.desc("snap_hour"))
    w_day = Window.partitionBy("day")
    planned = (manifest
               .withColumn("recency", F.row_number().over(w_recent))
               .withColumn("day_last", F.max("snap_hour").over(w_day)))
    reason = (F.when(F.col("recency") <= SNAP_KEEP_LAST, F.lit("recent"))
               .when(F.col("snap_hour") == F.col("day_last"),
                     F.lit("daily_anchor")))
    return (planned.select(
        "snap_hour", "day", F.col("n_rows").cast("int").alias("n_rows"),
        "size_bytes", reason.alias("keep_reason"))
        .withColumn("kept", F.col("keep_reason").isNotNull())
        .withColumn("reclaim_bytes",
                    F.when(~F.col("kept"), F.col("size_bytes"))
                     .otherwise(F.lit(0)).cast("bigint")))


def compact_small_files(events: DataFrame) -> DataFrame:
    """Small-file compaction planning — the lakehouse OPTIMIZE
    maintenance pass that complements `merge_upsert` (write path),
    `mv_maintain` (view maintenance) and `table_diff`
    (reconciliation). A streaming ingest leaves one small file per
    trigger per partition; the compactor packs them into
    target-sized output files. The manifest derives deterministically
    from events (one "file" per event_type × hour, an integer size
    proxy), and the plan is the greedy SEQUENTIAL bin-pack every
    production compactor (Delta OPTIMIZE, Iceberg rewrite_data_files)
    uses: files in insertion order, a new output bin whenever the
    running total crosses the target — expressed as
    `bin = (cumsum_before) // TARGET`, one window over the manifest.
    Greedy property (pytest-pinned): a bin never splits a file, and
    for every bin except each partition's last the cumulative byte
    count at its closing file crosses the bin's boundary — no output
    file stops short of the target while input files remain. (A
    single input file larger than TARGET occupies its own bin and
    skips bin ids, exactly like production compactors passing
    already-large files through untouched.)

    Scale shape: the only row-scale work is the manifest aggregation
    (map-side-combined groupBy). Planning then runs on the MANIFEST —
    files, not rows, exactly like production compactors that read
    table metadata only — so the per-partition-key window sorts
    thousands of manifest rows, never the table. Output: one audit
    row per planned output file with its fill level, the relation a
    maintenance job logs and a scheduler thresholds on."""
    # exact bigint floor division: subtract the remainder first so the
    # double division is of an exact multiple (quotients stay far
    # below 2^53 at any plausible manifest size)
    def idiv(num, den: int):
        return ((num - num % den) / den).cast("bigint")

    manifest = (events.groupBy(
        "event_type",
        idiv(F.unix_micros(F.col("ts")), COMPACT_FILE_US).alias("file_id"))
        .agg((F.count(F.lit(1)) * 64
              + F.sum(F.length("event_type"))).alias("size_bytes")))
    w = (Window.partitionBy("event_type").orderBy("file_id")
         .rowsBetween(Window.unboundedPreceding, 0))

    prior = F.sum("size_bytes").over(w) - F.col("size_bytes")
    planned = manifest.withColumn(
        "bin_id", idiv(prior, COMPACT_TARGET_BYTES))
    return (planned.groupBy("event_type", "bin_id")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(F.when(F.col("size_bytes")
                              < COMPACT_TARGET_BYTES // 2, 1)
                        .otherwise(0)).alias("n_small_files"),
                 F.sum("size_bytes").alias("bytes_total"),
                 idiv(F.sum("size_bytes") * 1_000_000,
                      COMPACT_TARGET_BYTES).alias("fill_ppm"))
            .orderBy("event_type", "bin_id"))
