"""DuckDB oracles for CEP/join-type operators (operators/cep.py)."""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.functions.hashing import md5_int60_sql
from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
    COINCIDENCE_US,
    KMV_K,
    KMV_NORM,
    LARGE_MIN,
    MIN_PROBES,
    PR_DAMP,
    PR_FP,
    PR_ITERS,
    REACH_HOPS,
    SEQ_WINDOW_US,
    SMALL_MAX,
)

# shared by coincident_events and the PageRank oracle's edge CTE
_COINCIDENT_SQL = f"""
SELECT a.event_id AS event_a, b.event_id AS event_b,
       a.user_id AS user_a, b.user_id AS user_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON epoch_us(b.ts) - epoch_us(a.ts) >= 0
 AND epoch_us(b.ts) - epoch_us(a.ts) < {COINCIDENCE_US}
 AND (epoch_us(a.ts) < epoch_us(b.ts) OR a.event_id < b.event_id)
 AND a.user_id <> b.user_id"""


def _pagerank_sql() -> str:
    """n_iters chained power-iteration CTEs; every constant is the
    repr of the exact Python double the Spark expression uses, so the
    damped update is the same IEEE sequence on both engines."""
    base = f"CAST(floor({1.0 - PR_DAMP!r} * {float(PR_FP)!r} / d.n) AS BIGINT)"
    ctes = [f"pairs AS ({_COINCIDENT_SQL})",
            """e AS (
  SELECT user_a AS src, user_b AS dst FROM pairs
  UNION
  SELECT user_b AS src, user_a AS dst FROM pairs
)""",
            "deg AS (SELECT src AS user_id, count(*) AS deg FROM e GROUP BY 1)",
            "nn AS (SELECT count(*) AS n FROM deg)",
            f"""pr0 AS (
  SELECT user_id, deg, n,
         CAST(floor({float(PR_FP)!r} / n) AS BIGINT) AS pr_units
  FROM deg, nn
)"""]
    for i in range(1, PR_ITERS + 1):
        ctes.append(f"""pr{i} AS (
  SELECT d.user_id, d.deg, d.n,
         {base} + CAST(floor({PR_DAMP!r} * s.s) AS BIGINT) AS pr_units
  FROM (SELECT user_id, deg, n FROM pr0) d
  JOIN (SELECT e.dst AS user_id,
               sum(CAST(floor(p.pr_units / p.deg) AS BIGINT)) AS s
        FROM e JOIN pr{i - 1} p ON e.src = p.user_id
        GROUP BY 1) s USING (user_id)
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT user_id, deg, pr_units,
       pr_units / {float(PR_FP)!r} AS pr
FROM pr{PR_ITERS}""")
def _bloom_sql() -> str:
    """Same md5 bit scheme as operators.cep._bloom_word_mask; all
    integer bit arithmetic, so filter contents and verdict counts are
    value-exact across engines. One SELECT per filter size, unioned —
    mirrors the Spark sizing-curve union."""
    from real_time_fraud_detection_flink_kafka_spark.functions.hashing import (
        md5_int60_sql,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        BLOOM_K,
        BLOOM_SIZES,
        BLOOM_WORD,
    )

    def one(m: int) -> str:
        def bit(key: str) -> str:
            h = md5_int60_sql(
                f"'bloom' || CAST(j AS VARCHAR) || ':' || CAST({key} AS VARCHAR)")
            return f"({h} % {m})"

        return f"""
SELECT * FROM (
WITH keys AS (SELECT c_custkey AS key FROM customer),
js AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j),
kb AS (SELECT {bit('key')} AS bit FROM keys, js),
bloom AS (
  SELECT CAST(floor(bit / {BLOOM_WORD}) AS BIGINT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(bit % {BLOOM_WORD} AS INTEGER))
           AS bits
  FROM kb GROUP BY 1
),
users AS (SELECT DISTINCT user_id AS probe FROM events),
members AS (SELECT probe FROM users WHERE probe IN (SELECT key FROM keys)),
probes AS (
  SELECT probe, 1 AS is_member FROM members
  UNION ALL
  SELECT probe + (SELECT max(key) + 1 FROM keys)
               - (SELECT min(probe) FROM users), 0 FROM users
),
pb AS (SELECT probe, is_member, {bit('probe')} AS bit FROM probes, js),
pw AS (
  SELECT probe, is_member,
         CAST(floor(bit / {BLOOM_WORD}) AS BIGINT) AS word,
         CAST(1 AS BIGINT) << CAST(bit % {BLOOM_WORD} AS INTEGER) AS mask
  FROM pb
),
hits AS (
  SELECT probe, is_member,
         CASE WHEN (coalesce(b.bits, 0) & mask) = mask THEN 1 ELSE 0 END AS hit
  FROM pw LEFT JOIN bloom b USING (word)
),
verdict AS (
  SELECT probe, is_member,
         CASE WHEN sum(hit) = {BLOOM_K} THEN 1 ELSE 0 END AS pos
  FROM hits GROUP BY 1, 2
)
SELECT CAST({m} AS BIGINT) AS m_bits,
       count(*) AS n_probes,
       CAST(sum(is_member) AS BIGINT) AS n_members,
       CAST(sum(pos) AS BIGINT) AS n_bloom_pos,
       CAST(sum(CASE WHEN is_member = 0 AND pos = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(sum(CASE WHEN is_member = 1 AND pos = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_neg,
       sum(CASE WHEN is_member = 0 AND pos = 1 THEN 1 ELSE 0 END)
         / sum(CASE WHEN is_member = 0 THEN 1 ELSE 0 END) AS fpr
FROM verdict
)"""

    return "\nUNION ALL\n".join(one(m) for m in BLOOM_SIZES)


def _ewma_sql() -> str:
    """Same fixed-order lag-term sum as operators.cep.ewma_card_amount
    — exact binary weights, token-identical term order, so the IEEE
    sequence matches."""
    from real_time_fraud_detection_flink_kafka_spark.operators.cep import EWMA_K
    from real_time_fraud_detection_flink_kafka_spark.oracles import TX_CTE

    nums, dens = [], []
    for d in range(1, EWMA_K + 1):
        weight = repr(2.0 ** -d)
        lagged = f"lag(amount, {d}) OVER w"
        nums.append(f"(CASE WHEN {lagged} IS NOT NULL "
                    f"THEN {lagged} * {weight} ELSE 0.0 END)")
        dens.append(f"(CASE WHEN {lagged} IS NOT NULL "
                    f"THEN {weight} ELSE 0.0 END)")
    num = " + ".join(nums)
    den = " + ".join(dens)
    return f"""
WITH {TX_CTE},
sm AS (
  SELECT event_id, card_id, ts_us, amount,
         CASE WHEN ({den}) > 0.0 THEN ({num}) / ({den}) END AS ewma
  FROM tx
  WINDOW w AS (PARTITION BY card_id ORDER BY ts_us, event_id)
)
SELECT event_id, card_id, ts_us, amount, ewma,
       amount / ewma AS spike_ratio
FROM sm"""


def _twins_sql() -> str:
    """Integer dot/norms (fold-order free), then the same one
    multiply + IEEE sqrt + division as the Spark column."""
    hcols = ",\n         ".join(
        f"CAST(sum(CASE WHEN hour(ts) = {h} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS h{h}" for h in range(24))
    dot = " + ".join(f"a.h{h} * b.h{h}" for h in range(24))
    na = " + ".join(f"a.h{h} * a.h{h}" for h in range(24))
    nb = " + ".join(f"b.h{h} * b.h{h}" for h in range(24))
    return f"""
WITH prof AS (
  SELECT user_id,
         {hcols}
  FROM events GROUP BY 1
),
pairs AS (
  SELECT a.user_id AS u, b.user_id AS v,
         CAST(({dot}) AS DOUBLE)
           / sqrt(CAST(({na}) AS DOUBLE) * CAST(({nb}) AS DOUBLE)) AS cos
  FROM prof a JOIN prof b ON a.user_id <> b.user_id
)
SELECT u AS user_id, v AS twin_id, cos
FROM pairs
QUALIFY row_number() OVER (PARTITION BY u ORDER BY cos DESC, v) = 1"""


from real_time_fraud_detection_flink_kafka_spark.oracles import TX_CTE


def cep_oracles() -> dict[str, str]:
    return {
        # mirrors cep.coincidence_components: recursive-CTE closure
        # over the same coincidence pair SQL (dedup_clusters shape)
        "coincidence_components": f"""
WITH RECURSIVE cpairs AS (
  SELECT DISTINCT user_a, user_b FROM ({_COINCIDENT_SQL}) q
),
cedges AS (
  SELECT user_a AS src, user_b AS dst FROM cpairs
  UNION ALL
  SELECT user_b, user_a FROM cpairs
),
creach(id, r) AS (
  SELECT DISTINCT src, src FROM cedges
  UNION
  SELECT e.dst, creach.r FROM creach JOIN cedges e ON e.src = creach.id
),
clabels AS (SELECT id, min(r) AS ring_id FROM creach GROUP BY 1),
csizes AS (SELECT ring_id, count(*) AS ring_size FROM clabels GROUP BY 1)
SELECT l.id AS user_id, l.ring_id, s.ring_size
FROM clabels l JOIN csizes s ON s.ring_id = l.ring_id""",
        "distinct_users_kmv": f"""
WITH d AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
         ({md5_int60_sql("CAST(user_id AS VARCHAR)")} / {KMV_NORM!r}) AS hv
  FROM events
), ranked AS (
  SELECT day, hv,
         row_number() OVER (PARTITION BY day ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY day) AS m
  FROM d
), agg AS (
  SELECT day, max(CASE WHEN rn = {KMV_K} THEN hv END) AS hk, max(m) AS m
  FROM ranked GROUP BY 1
)
SELECT day,
       CASE WHEN m < {KMV_K} THEN CAST(m AS DOUBLE)
            ELSE {float(KMV_K - 1)!r} / hk END AS n_users_est
FROM agg ORDER BY day""",
        "cep_card_testing": f"""WITH {TX_CTE},
p AS (
  SELECT *,
    CAST(coalesce(sum(CASE WHEN amount < {SMALL_MAX!r} THEN 1 ELSE 0 END)
         OVER (PARTITION BY card_id ORDER BY ts_us
               RANGE BETWEEN {SEQ_WINDOW_US} PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_probes
  FROM tx
)
SELECT event_id, card_id, amount, n_probes, ts_us
FROM p WHERE amount > {LARGE_MIN!r} AND n_probes >= {MIN_PROBES}""",
        "customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')""",
        "customers_with_big_orders": """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""",
        "customer_order_semijoins": """
SELECT 'anti_no_urgent' AS join_type, c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
UNION ALL
SELECT 'semi_big_order' AS join_type, c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""",
        "asof_event_order": """
WITH u AS (
  SELECT user_id AS k, epoch_us(ts) AS t, 0 AS is_order, event_id,
         CAST(NULL AS BIGINT) AS o_orderkey,
         CAST(NULL AS BIGINT) AS o_ts_us,
         CAST(NULL AS DOUBLE) AS o_totalprice
  FROM events
  UNION ALL
  SELECT o_custkey, epoch_us(o_orderdate), 1, NULL,
         o_orderkey, epoch_us(o_orderdate), o_totalprice
  FROM orders
)
SELECT event_id, k AS user_id, t AS ts_us,
       last_value(o_orderkey IGNORE NULLS) OVER w AS last_orderkey,
       last_value(o_ts_us IGNORE NULLS) OVER w AS last_order_ts_us,
       last_value(o_totalprice IGNORE NULLS) OVER w AS last_totalprice
FROM u
WINDOW w AS (PARTITION BY k ORDER BY t, is_order DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
QUALIFY is_order = 0""",
        # the binned equi-join plan must reproduce the plain
        # inequality self-join row-exactly (pair order: earlier
        # event first, event_id tie-break at gap = 0)
        "coincident_events": _COINCIDENT_SQL,
        "coincidence_pagerank": _pagerank_sql(),
        "bloom_membership": _bloom_sql(),
        "ewma_card_amount": _ewma_sql(),
        "user_activity_twins": _twins_sql(),
        # min-over-all-paths == BFS first-reach distance (Spark's
        # anti-join discipline); bounded depth keeps the recursion
        # finite on both engines
        "coincidence_bfs_reach": f"""
WITH RECURSIVE pairs AS ({_COINCIDENT_SQL}),
e AS (
  SELECT user_a AS src, user_b AS dst FROM pairs
  UNION
  SELECT user_b AS src, user_a AS dst FROM pairs
),
seed AS (SELECT min(src) AS s FROM e),
reach(user_id, dist) AS (
  SELECT s, 0 FROM seed
  UNION ALL
  SELECT e.dst, reach.dist + 1
  FROM reach JOIN e ON e.src = reach.user_id
  WHERE reach.dist < {REACH_HOPS}
)
SELECT user_id, CAST(min(dist) AS INTEGER) AS dist
FROM reach GROUP BY 1""",
        # degree-ordered triangle enumeration — same orientation rule
        # ((deg, id) lexicographic) as the Spark plan, so each
        # triangle closes exactly once on both engines
        "coincidence_triangles": f"""
WITH pairs AS ({_COINCIDENT_SQL}),
und AS (
  SELECT DISTINCT least(user_a, user_b) AS u, greatest(user_a, user_b) AS v
  FROM pairs
),
deg AS (
  SELECT user_id, count(*) AS deg
  FROM (SELECT u AS user_id FROM und UNION ALL SELECT v AS user_id FROM und)
  GROUP BY 1
),
e AS (
  SELECT u, v, du.deg AS deg_u, dv.deg AS deg_v
  FROM und JOIN deg du ON du.user_id = u JOIN deg dv ON dv.user_id = v
),
dire AS (
  SELECT CASE WHEN deg_u < deg_v OR (deg_u = deg_v AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN deg_u < deg_v OR (deg_u = deg_v AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN deg_u < deg_v OR (deg_u = deg_v AND u < v)
              THEN deg_v ELSE deg_u END AS deg_dst
  FROM e
),
w AS (
  SELECT x.src AS a, x.dst AS b, x.deg_dst AS deg_b,
         y.dst AS c, y.deg_dst AS deg_c
  FROM dire x JOIN dire y ON x.src = y.src
  WHERE x.deg_dst < y.deg_dst
     OR (x.deg_dst = y.deg_dst AND x.dst < y.dst)
),
tri AS (
  SELECT w.a, w.b, w.c FROM w JOIN dire d ON d.src = w.b AND d.dst = w.c
),
tn AS (
  SELECT user_id, count(*) AS n_tri
  FROM (SELECT a AS user_id FROM tri
        UNION ALL SELECT b AS user_id FROM tri
        UNION ALL SELECT c AS user_id FROM tri)
  GROUP BY 1
)
SELECT deg.user_id, deg.deg, coalesce(tn.n_tri, 0) AS n_tri,
       CASE WHEN deg.deg >= 2
            THEN (2 * coalesce(tn.n_tri, 0)) / (deg.deg * (deg.deg - 1))
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN tn USING (user_id)""",
    }
