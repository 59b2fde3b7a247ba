"""DuckDB oracles for the general-analytics operators
(operators/analytics.py). Fixed-point sums mirror ``fsum``:
sum(cast(round(x*1e6) as bigint)) / 1e6 — associative integer
addition, so Spark partial aggregation and DuckDB agree exactly.
"""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
    EVENT_TYPES,
    Q1_CUTOFF,
    Q3_DATE,
    Q3_SEGMENT,
    Q4_FROM,
    Q4_TO,
    Q5_FROM,
    Q5_REGION,
    Q5_TO,
    Q6_FROM,
    Q6_TO,
    Q7_FROM,
    Q7_TO,
    Q8_FROM,
    Q8_NATION,
    Q8_REGION,
    Q8_TO,
    Q10_FROM,
    Q10_TO,
    Q11_MULT,
    Q11_NATION,
    Q12_FROM,
    Q12_HIGH,
    Q12_LATE_DAYS,
    Q12_MODES,
    Q12_PICKED,
    Q12_TO,
    Q15_FROM,
    Q15_TO,
    Q16_BRAND_EX,
    Q16_COMPLAINT_MOD,
    Q16_SIZES,
    Q16_TYPE_EX,
    Q17_BRAND,
    Q17_QTY_FRACTION,
    Q21_LATE_DAYS,
    Q21_NATION,
    Q13_EXCLUDED_PRIORITY,
    Q14_FROM,
    Q14_TO,
    Q18_MIN_QTY,
    Q19_BRANDS,
    Q20_FROM,
    Q20_NATION,
    Q20_TO,
    CO_MIN_SUPPORT,
    CO_TOPK,
    MAD_K,
    SLIDE_US,
    SETOP_Y1_FROM,
    SETOP_Y1_TO,
    SETOP_Y2_FROM,
    SETOP_Y2_TO,
    DQ_DUP_MOD,
    DQ_FK_MOD,
    DQ_NEG_MOD,
    DQ_TS_HI,
    DQ_TS_LO,
    DQ_TS_MOD,
    HIST_BINS,
    HIST_QS,
    PCTS,
    PS_COST_MOD,
    PS_PER_PART,
    PS_QTY_MOD,
    Q9_NAME_FRAG,
    SCALE,
    SESSION_GAP_US,
    WINDOW_US,
)

# partsupp synthesized from part × supplier exactly as
# operators/analytics.partsupp_synth does it (integer modular
# striding + seeded cost/qty formulas — bit-identical across engines)
_PARTSUPP_CTES = f"""ks AS (
  SELECT count(*) AS n_supp, min(s_suppkey) AS min_supp FROM supplier
), ps AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey + t.i * greatest(n_supp // {PS_PER_PART}, 1))
              % n_supp + min_supp AS BIGINT) AS ps_suppkey
  FROM part, ks, range({PS_PER_PART}) t(i)
), partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         ((ps_partkey * 31 + ps_suppkey * 7) % {PS_COST_MOD}) / 100.0 + 1.0
           AS ps_supplycost,
         CAST((ps_partkey * 13 + ps_suppkey * 17) % {PS_QTY_MOD} + 1
              AS INTEGER) AS ps_availqty
  FROM ps
)"""


# Deterministic synthesized l_shipmode — replays
# operators/analytics.shipmode_synth's integer arithmetic in SQL.
_SHIPMODE_CASE = (
    f"(CASE CAST((l_orderkey * 7 + l_linenumber) % {len(Q12_MODES)} AS INTEGER) "
    + " ".join(f"WHEN {i} THEN '{m}'" for i, m in enumerate(Q12_MODES))
    + " END)"
)


def _fsum(expr: str) -> str:
    return f"(sum(CAST(round(({expr}) * {SCALE}) AS BIGINT)) / {float(SCALE)!r})"


def _favg(expr: str) -> str:
    return f"({_fsum(expr)} / count(*))"


def _attribution_sql() -> str:
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        ATTR_WINDOW_US,
    )

    touch = ("CASE WHEN event_type <> 'purchase' THEN "
             "{'tsu': tsu, 'event_id': event_id, 'event_type': event_type} END")
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu FROM events
), t AS (
  SELECT *,
         min({touch}) OVER w AS ft,
         max({touch}) OVER w AS lt,
         count(CASE WHEN event_type <> 'purchase' THEN event_id END)
           OVER w AS n_touches
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tsu
               RANGE BETWEEN {ATTR_WINDOW_US} PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS conv_event_id, user_id,
       ft.event_type AS first_touch, lt.event_type AS last_touch,
       CAST(n_touches AS INTEGER) AS n_touches
FROM t WHERE event_type = 'purchase'"""


def _expire_snapshots_sql() -> str:
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        SNAP_HOUR_US,
        SNAP_KEEP_LAST,
    )

    return f"""
WITH manifest AS (
  SELECT epoch_us(ts) // {SNAP_HOUR_US} AS snap_hour,
         count(*) AS n_rows,
         count(*) * 64 + sum(length(event_type)) AS size_bytes
  FROM events GROUP BY 1
), m AS (
  SELECT *, snap_hour // 24 AS day,
         row_number() OVER (ORDER BY snap_hour DESC) AS recency,
         max(snap_hour) OVER (PARTITION BY snap_hour // 24) AS day_last
  FROM manifest
)
SELECT snap_hour, day, CAST(n_rows AS INTEGER) AS n_rows,
       CAST(size_bytes AS BIGINT) AS size_bytes,
       CASE WHEN recency <= {SNAP_KEEP_LAST} THEN 'recent'
            WHEN snap_hour = day_last THEN 'daily_anchor' END
         AS keep_reason,
       (recency <= {SNAP_KEEP_LAST} OR snap_hour = day_last) AS kept,
       CAST(CASE WHEN recency <= {SNAP_KEEP_LAST} OR snap_hour = day_last
            THEN 0 ELSE size_bytes END AS BIGINT) AS reclaim_bytes
FROM m"""


def _compact_sql() -> str:
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        COMPACT_FILE_US,
        COMPACT_TARGET_BYTES,
    )

    return f"""
WITH manifest AS (
  SELECT event_type,
         epoch_us(ts) // {COMPACT_FILE_US} AS file_id,
         count(*) * 64 + sum(length(event_type)) AS size_bytes
  FROM events GROUP BY 1, 2
),
planned AS (
  SELECT event_type, size_bytes,
         (sum(size_bytes) OVER (PARTITION BY event_type ORDER BY file_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - size_bytes) // {COMPACT_TARGET_BYTES} AS bin_id
  FROM manifest
)
SELECT event_type, bin_id, count(*) AS n_files,
       sum(CASE WHEN size_bytes < {COMPACT_TARGET_BYTES // 2}
                THEN 1 ELSE 0 END) AS n_small_files,
       sum(size_bytes) AS bytes_total,
       sum(size_bytes) * 1000000 // {COMPACT_TARGET_BYTES} AS fill_ppm
FROM planned GROUP BY 1, 2 ORDER BY 1, 2"""


def _merge_upsert_sql() -> str:
    from real_time_fraud_detection_flink_kafka_spark.functions.hashing import (
        md5_int60_sql,
    )
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        DIFF_ADD_OFFSET,
        DIFF_DROP_MOD,
        DIFF_EDIT_MOD,
        MERGE_CHECK_MOD,
    )

    rh = md5_int60_sql(
        "CAST(event_id AS VARCHAR) || '|' || mt || '|' || CAST(mc AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), changes AS (
  SELECT event_id, event_type, cents + 100 AS cents, FALSE AS tombstone
  FROM base WHERE event_id % {DIFF_EDIT_MOD} = 0
  UNION ALL
  SELECT event_id + {DIFF_ADD_OFFSET}, event_type, cents, FALSE
  FROM base WHERE event_id < 3
  UNION ALL
  SELECT event_id, event_type, cents, TRUE
  FROM base WHERE event_id % {DIFF_DROP_MOD} = 0
    AND event_id % {DIFF_EDIT_MOD} <> 0
), j AS (
  SELECT coalesce(b.event_id, c.event_id) AS event_id,
         b.event_type AS bt, b.cents AS bc,
         c.event_type AS ct, c.cents AS cc, c.tombstone
  FROM base b FULL JOIN changes c ON b.event_id = c.event_id
), r AS (
  SELECT event_id,
         CASE WHEN bc IS NULL THEN 'insert'
              WHEN cc IS NULL THEN 'keep'
              WHEN tombstone THEN 'delete'
              ELSE 'update' END AS action,
         CASE WHEN cc IS NOT NULL AND NOT coalesce(tombstone, FALSE)
              THEN cc ELSE bc END AS mc,
         coalesce(ct, bt) AS mt
  FROM j
)
SELECT CAST(sum(CASE WHEN action = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
       CAST(sum(CASE WHEN action = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       CAST(sum(CASE WHEN action = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
       CAST(sum(CASE WHEN action = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       CAST(sum(CASE WHEN action <> 'delete'
                THEN ({rh}) % {MERGE_CHECK_MOD} ELSE 0 END) AS BIGINT) AS table_checksum
FROM r"""


def _table_diff_sql() -> str:
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        DIFF_ADD_OFFSET,
        DIFF_DROP_MOD,
        DIFF_EDIT_MOD,
    )

    return f"""
WITH base AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), v2 AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % {DIFF_EDIT_MOD} = 0 THEN cents + 100
              ELSE cents END AS cents
  FROM base WHERE event_id % {DIFF_DROP_MOD} <> 0
  UNION ALL
  SELECT event_id + {DIFF_ADD_OFFSET}, event_type, cents
  FROM base WHERE event_id < 3
), a AS (
  SELECT event_id,
         md5(CAST(cents AS VARCHAR) || '|' || event_type) AS md5_v1
  FROM base
), b AS (
  SELECT event_id,
         md5(CAST(cents AS VARCHAR) || '|' || event_type) AS md5_v2
  FROM v2
), j AS (
  SELECT coalesce(a.event_id, b.event_id) AS event_id, md5_v1, md5_v2
  FROM a FULL JOIN b ON a.event_id = b.event_id
)
SELECT event_id,
       CASE WHEN md5_v1 IS NULL THEN 'added'
            WHEN md5_v2 IS NULL THEN 'removed'
            WHEN md5_v1 <> md5_v2 THEN 'changed' END AS status,
       md5_v1, md5_v2
FROM j
WHERE (md5_v1 IS NULL OR md5_v2 IS NULL OR md5_v1 <> md5_v2)"""


def _cusum_sql() -> str:
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        CUSUM_H_FP,
        CUSUM_SCALE,
    )

    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tsu, event_id,
         CAST(round(value * {CUSUM_SCALE}) AS BIGINT) AS v
  FROM events
), g AS (SELECT sum(v) // count(*) AS mu FROM e),
c AS (
  SELECT user_id, tsu, event_id,
         sum(v - mu) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                           ROWS UNBOUNDED PRECEDING) AS cs
  FROM e, g
), m AS (
  SELECT user_id,
         cs - least(min(cs) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                                  ROWS UNBOUNDED PRECEDING), 0) AS up
  FROM c
)
SELECT user_id, CAST(count(*) AS INTEGER) AS n_events,
       round(max(up) / {CUSUM_SCALE}, 6) AS max_cusum,
       (max(up) >= {CUSUM_H_FP}) AS alarm
FROM m GROUP BY user_id"""


def _benford_sql() -> str:
    from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
        BENFORD_EXPECTED,
    )

    case = " ".join(f"WHEN digit = {d} THEN {p!r}"
                    for d, p in BENFORD_EXPECTED.items())
    return f"""
WITH cents AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
), per AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         count(*) AS n
  FROM cents WHERE cents >= 1 GROUP BY 1
), tot AS (SELECT CAST(sum(n) AS DOUBLE) AS _tot FROM per)
SELECT digit, n, round(n / _tot, 6) AS share,
       (CASE {case} END) AS benford,
       round(abs(n / _tot - (CASE {case} END)), 6) AS abs_dev
FROM per, tot"""


def analytics_oracles() -> dict[str, str]:
    return {
        "q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       {_fsum('l_quantity')} AS sum_qty,
       {_fsum('l_extendedprice')} AS sum_base_price,
       {_fsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_fsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_favg('l_quantity')} AS avg_qty,
       {_favg('l_extendedprice')} AS avg_price,
       {_favg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY 1, 2 ORDER BY 1, 2""",
        "q3_shipping_priority": f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
       {_fsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderdate, o_orderkey
LIMIT 10""",
        "q5_local_supplier": f"""
SELECT n_name, {_fsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q5_TO}'
GROUP BY 1 ORDER BY revenue DESC, n_name""",
        "q6_forecast_revenue": f"""
SELECT {_fsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q6_TO}'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
        "q2_top_supplier_per_nation": """
SELECT n_name, s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
QUALIFY row_number() OVER (PARTITION BY n_nationkey
                           ORDER BY s_acctbal DESC, s_suppkey) = 1
ORDER BY n_name""",
        "q4_order_priority": f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q4_TO}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1 ORDER BY 1""",
        "q7_nation_volume": f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {_fsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '{Q7_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q7_TO}'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        "q8_market_share": f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {_fsum(f"CASE WHEN n2.n_name = '{Q8_NATION}' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       / {_fsum('l_extendedprice * (1 - l_discount)')} AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_orderdate >= TIMESTAMP '{Q8_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q8_TO}'
GROUP BY 1 ORDER BY 1""",
        "q10_returned_items": f"""
SELECT c_custkey, c_name, n_name,
       {_fsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q10_TO}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
        "q14_promo_revenue": f"""
SELECT {_fsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       * 100.0 / {_fsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q14_TO}'""",
        "q18_large_orders": f"""
WITH big AS (
  SELECT l_orderkey, {_fsum('l_quantity')} AS total_qty
  FROM lineitem GROUP BY 1
  HAVING {_fsum('l_quantity')} > {Q18_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey""",
        "q19_discounted_revenue": f"""
SELECT {_fsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE """ + "\n   OR ".join(
            f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
            f" AND l_quantity BETWEEN {qlo} AND {qhi})"
            for b, slo, shi, qlo, qhi in Q19_BRANDS
        ),
        "top_customers": f"""
WITH spend AS (
  SELECT o_custkey, {_fsum('o_totalprice')} AS total_spend, count(*) AS n_orders
  FROM orders GROUP BY 1
), ranked AS (
  SELECT c_custkey, c_name, c_mktsegment, total_spend, n_orders,
         CAST(row_number() OVER (ORDER BY total_spend DESC, c_custkey) AS INTEGER) AS rnk
  FROM spend JOIN customer ON o_custkey = c_custkey
)
SELECT * FROM ranked WHERE rnk <= 20 ORDER BY rnk""",
        "sessionize": f"""
WITH t AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT *, CASE WHEN (ts_us - lag(ts_us) OVER w) > {SESSION_GAP_US} THEN 1
                 WHEN lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       count(*) AS n_events, {_fsum('value')} AS total_value
FROM sess GROUP BY 1, 2""",
        "windowed_counts": f"""
SELECT epoch_us(ts) - (epoch_us(ts) % {WINDOW_US}) AS window_start_us,
       event_type, count(*) AS n_events, {_fsum('value')} AS total_value
FROM events GROUP BY 1, 2""",
        "event_funnel": """
WITH t AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2""",
        "pivot_events": "SELECT user_id, "
        + ", ".join(
            f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
            for t in EVENT_TYPES
        )
        + " FROM events GROUP BY 1",
        "cube_orders": f"""
SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       o_orderstatus, o_orderpriority, count(*) AS n_orders,
       {_fsum('o_totalprice')} AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
        "rollup_orders": f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       {_fsum('o_totalprice')} AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
        "grouping_sets_revenue": f"""
SELECT CAST(GROUPING(o_year, o_orderstatus) AS INTEGER) AS gid,
       o_year, o_orderstatus, count(*) AS n_orders,
       {_fsum('o_totalprice')} AS total_price
FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             o_orderstatus, o_totalprice
      FROM orders)
GROUP BY GROUPING SETS ((o_year), (o_orderstatus), ())""",
        # mirrors analytics.attribution_credit: struct-ordered min/max
        # over the same RANGE frame — no intra-frame position anywhere
        "attribution_credit": _attribution_sql(),
        # the mv_maintain oracle IS the full recompute: parity proves
        # the incremental merge path equals recomputation
        "mv_maintain": f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       {_fsum('value')} AS total_value
FROM events GROUP BY event_type""",
        # mirrors analytics.merge_upsert: derived change-set, one
        # full-outer join, mod-folded commutative checksum
        "merge_upsert": _merge_upsert_sql(),
        # mirrors analytics.compact_small_files: hourly manifest,
        # greedy sequential bin-pack via cumsum-before floor-div
        "compact_small_files": _compact_sql(),
        # mirrors analytics.expire_snapshots: hourly manifest,
        # keep-last-N recency rank + per-day anchor, exact integers
        "expire_snapshots": _expire_snapshots_sql(),
        # mirrors analytics.table_diff: derived v1/v2 snapshots,
        # full-outer keyed join, md5 row hashes, exception verdicts
        "table_diff": _table_diff_sql(),
        # mirrors analytics.scd2_user_segments: gaps-and-islands over
        # (ts_us, event_id), run collapse, lead() closes intervals
        "scd2_user_segments": """
WITH e AS (
  SELECT user_id, event_id, event_type AS segment, epoch_us(ts) AS ts_us
  FROM events
),
r AS (
  SELECT *, CASE WHEN lag(segment) OVER w IS NULL
                  OR lag(segment) OVER w <> segment THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
rr AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM r
),
c AS (
  SELECT user_id, run, min(segment) AS segment,
         min(ts_us) AS valid_from_us, count(*) AS n_events
  FROM rr GROUP BY 1, 2
)
SELECT user_id, CAST(run AS INTEGER) AS version, segment, valid_from_us,
       coalesce(lead(valid_from_us)
                OVER (PARTITION BY user_id ORDER BY run), -1) AS valid_to_us,
       (lead(valid_from_us)
        OVER (PARTITION BY user_id ORDER BY run) IS NULL) AS is_current,
       CAST(n_events AS INTEGER) AS n_events
FROM c""",
        # mirrors analytics.cusum_value_drift: fixed-point running
        # sum / running min windows, floor-div global mean
        "cusum_value_drift": _cusum_sql(),
        # mirrors analytics.benford_audit: first digit from the
        # decimal string of integer cents, shared 6-dp expectations
        "benford_audit": _benford_sql(),
        "activity_gini": """
WITH per_user AS (
  SELECT user_id, count(*) AS c FROM events GROUP BY 1
),
ranked AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c, user_id) AS BIGINT) AS rnk
  FROM per_user
)
SELECT count(*) AS n_users,
       CAST(sum(c) AS BIGINT) AS total_events,
       CAST(2 * sum(CAST(rnk AS DECIMAL(38,0)) * c) AS DOUBLE)
         / CAST(CAST(count(*) AS DECIMAL(38,0)) * sum(c) AS DOUBLE)
         - (count(*) + 1) / count(*) AS gini
FROM ranked""",
        "funnel_ordered": """
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(epoch_us(ts)) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE event_type = 'click' AND epoch_us(ts) > t1
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(epoch_us(ts)) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND epoch_us(ts) > t2
  GROUP BY 1
)
SELECT (SELECT count(*) FROM s1) AS n_view,
       (SELECT count(*) FROM s2) AS n_then_click,
       (SELECT count(*) FROM s3) AS n_then_purchase,
       (SELECT count(*) FROM s3) / (SELECT count(*) FROM s1) AS conversion""",
        "q13_customer_distribution": f"""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY 1
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY 1
ORDER BY custdist DESC, c_count DESC""",
        "q22_sales_opportunity": f"""
WITH thresh AS (
  SELECT {_fsum('c_acctbal')} / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust, {_fsum('c_acctbal')} AS totacctbal
FROM customer, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1 ORDER BY 1""",
        # same discrete pick both sides — an actual data value, so
        # equality is exact (interpolated percentiles differ in ulps)
        "event_value_percentiles": """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       """ + ",\n       ".join(
            f"max(CASE WHEN rn = greatest(1, CAST(ceil({p} * n) AS BIGINT)) "
            f"THEN value END) AS {name}"
            for name, p in PCTS
        ) + """
FROM ranked GROUP BY 1 ORDER BY 1""",
        # mirrors session_window's boundary rule: an event EXACTLY
        # gap after its predecessor starts a NEW session (>=, not >)
        "session_window_counts": f"""
WITH t AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT *, CASE WHEN (ts_us - lag(ts_us) OVER w) >= {SESSION_GAP_US} THEN 1
                 WHEN lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       count(*) AS n_events, {_fsum('value')} AS total_value
FROM sess GROUP BY user_id, session_idx""",
        # the salted plan must produce EXACTLY the plain join's result
        "skew_salted_spend": f"""
SELECT c_mktsegment, count(*) AS n_events, {_fsum('value')} AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1 ORDER BY 1""",
        "distinct_users_daily": """
SELECT strftime(ts, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY 1""",
        "q9_product_type_profit": f"""
WITH {_PARTSUPP_CTES}
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {_fsum('l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity')}
         AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%{Q9_NAME_FRAG}%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC""",
        "q20_potential_part_promotion": f"""
WITH {_PARTSUPP_CTES},
psf AS (
  SELECT partsupp.* FROM partsupp
  JOIN part ON ps_partkey = p_partkey
  WHERE p_name LIKE '%{Q9_NAME_FRAG}%'
), shipped AS (
  SELECT ps_partkey, ps_suppkey, {_fsum('l_quantity')} AS qty_shipped
  FROM lineitem JOIN psf ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE l_shipdate >= TIMESTAMP '{Q20_FROM}'
    AND l_shipdate <  TIMESTAMP '{Q20_TO}'
  GROUP BY 1, 2
), excess AS (
  SELECT DISTINCT ps_suppkey
  FROM psf JOIN shipped USING (ps_partkey, ps_suppkey)
  WHERE ps_availqty > 0.5 * qty_shipped
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN excess ON s_suppkey = ps_suppkey
WHERE n_name = '{Q20_NATION}'
ORDER BY s_suppkey""",
        "q11_important_stock": f"""
WITH {_PARTSUPP_CTES},
per_part AS (
  SELECT ps_partkey, {_fsum('ps_supplycost * ps_availqty')} AS value
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT ps_partkey, value
FROM per_part
WHERE value > (SELECT {_favg('value')} * {Q11_MULT!r} FROM per_part)
ORDER BY value DESC, ps_partkey""",
        "q12_shipmode_priority": f"""
SELECT {_SHIPMODE_CASE} AS ship_mode,
       CAST(sum(CASE WHEN o_orderpriority IN {tuple(Q12_HIGH)}
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN {tuple(Q12_HIGH)}
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_FROM}'
  AND l_shipdate <  TIMESTAMP '{Q12_TO}'
  AND {_SHIPMODE_CASE} IN {tuple(Q12_PICKED)}
  AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY 1 ORDER BY 1""",
        "q15_top_supplier": f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         {_fsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
    AND l_shipdate <  TIMESTAMP '{Q15_TO}'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey""",
        "q16_parts_supplier_relationship": f"""
WITH {_PARTSUPP_CTES}
SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> '{Q16_BRAND_EX}'
  AND p_type NOT LIKE '{Q16_TYPE_EX}%'
  AND p_size IN {tuple(Q16_SIZES)}
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_suppkey % {Q16_COMPLAINT_MOD} = 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
        "q17_small_quantity_revenue": f"""
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
), per_part AS (
  SELECT l_partkey AS pk, {_favg('l_quantity')} AS avg_qty
  FROM li GROUP BY 1
)
SELECT ({_fsum('l_extendedprice')} / 7.0) AS avg_yearly
FROM li JOIN per_part ON l_partkey = pk
WHERE l_quantity < {Q17_QTY_FRACTION!r} * avg_qty""",
        "q21_suppliers_kept_waiting": f"""
WITH j AS (
  SELECT o_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT o_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp,
         max(CASE WHEN is_late THEN l_suppkey END) AS late_supp,
         count(CASE WHEN is_late THEN 1 END) AS late_rows
  FROM j GROUP BY 1
)
SELECT s_name, CAST(sum(late_rows) AS BIGINT) AS numwait
FROM per_order
JOIN supplier ON late_supp = s_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE n_supp >= 2 AND n_late_supp = 1 AND n_name = '{Q21_NATION}'
GROUP BY 1
ORDER BY numwait DESC, s_name LIMIT 100""",
        "events_props_stats": """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER))
         AS n_distinct_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY 1 ORDER BY 1""",
        # the sketch itself is engine-exact: identical IEEE binning
        # arithmetic both sides; approximation is only vs the TRUE
        # quantile (bounded by one bin width, asserted in pytest)
        "value_histogram_quantiles": f"""
WITH ext AS (SELECT min(value) AS lo, max(value) AS hi, count(*) AS n
             FROM events),
binned AS (
  SELECT CASE WHEN hi > lo THEN least(
                CAST(floor((value - lo) / ((hi - lo) / {HIST_BINS})) AS BIGINT),
                {HIST_BINS - 1})
              ELSE 0 END AS bin, lo, hi, n
  FROM events, ext
),
hist AS (SELECT bin, lo, hi, n, count(*) AS cnt FROM binned
         GROUP BY bin, lo, hi, n),
cum AS (SELECT bin, lo, hi, n,
               sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist),
qs AS (SELECT unnest([{", ".join(repr(float(q)) for q in HIST_QS)}]) AS q)
SELECT q, min(bin) AS bin,
       min(lo + (bin + 1) * ((hi - lo) / {HIST_BINS})) AS est
FROM cum, qs
WHERE cum >= CAST(ceil(q * n) AS BIGINT)
GROUP BY q ORDER BY q""",
        # same deterministic fault injection as _inject_dq_faults, so
        # every check reports non-zero violations on clean testdata
        "dq_audit": f"""
WITH base AS (
  SELECT event_id,
         CASE WHEN event_id % {DQ_TS_MOD} = 0
              THEN ts + INTERVAL 400 DAY ELSE ts END AS ts,
         CASE WHEN user_id % {DQ_FK_MOD} = 0
              THEN user_id + 10000000 ELSE user_id END AS user_id,
         CASE WHEN event_id % {DQ_NEG_MOD} = 0
              THEN -value - 1.0 ELSE value END AS value
  FROM events
),
faulty AS (
  SELECT * FROM base
  UNION ALL
  SELECT * FROM base WHERE event_id % {DQ_DUP_MOD} = 0
),
j AS (
  SELECT faulty.*, c.c_custkey
  FROM faulty LEFT JOIN customer c ON faulty.user_id = c.c_custkey
),
m AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_neg,
         count(*) - count(DISTINCT event_id) AS v_dup,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{DQ_TS_LO}'
                         OR ts >= TIMESTAMP '{DQ_TS_HI}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_ts,
         CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS v_fk
  FROM j
)
SELECT 'value_nonnegative' AS check_name, n AS n_rows,
       v_neg AS n_violations, v_neg / n AS violation_rate FROM m
UNION ALL
SELECT 'event_id_unique', n, v_dup, v_dup / n FROM m
UNION ALL
SELECT 'ts_in_expected_range', n, v_ts, v_ts / n FROM m
UNION ALL
SELECT 'user_fk_in_customer', n, v_fk, v_fk / n FROM m""",
        # token-identical closed-form expressions: both engines run
        # the same IEEE sequence over the same fixed-point stats
        "linreg_value_by_hour": f"""
WITH stats AS (
  SELECT count(*) AS n,
         CAST(sum(hour(ts)) AS BIGINT) AS sx,
         CAST(sum(hour(ts) * hour(ts)) AS BIGINT) AS sxx,
         {_fsum('value')} AS sy,
         {_fsum('hour(ts) * value')} AS sxy,
         {_fsum('value * value')} AS syy
  FROM events
)
SELECT n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
         AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM stats""",
        # lift is exact integer products with one division, same
        # expression shape as the Spark column
        "copurchase_lift": f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM d),
item AS (SELECT l_partkey, count(*) AS c_item FROM d GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS support
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {CO_MIN_SUPPORT}
),
j AS (
  SELECT part_a, part_b, support, ia.c_item AS c_a, ib.c_item AS c_b,
         (no.n_orders * support) / (ia.c_item * ib.c_item) AS lift
  FROM pairs
  JOIN item ia ON ia.l_partkey = part_a
  JOIN item ib ON ib.l_partkey = part_b
  CROSS JOIN no
),
r AS (
  SELECT *, CAST(row_number() OVER (ORDER BY support DESC, part_a, part_b)
                 AS INTEGER) AS rnk
  FROM j
)
SELECT part_a, part_b, support, c_a, c_b, lift, rnk
FROM r WHERE rnk <= {CO_TOPK}""",
        "scd2_order_history": """
SELECT o_custkey, o_orderkey, o_totalprice,
       epoch_us(o_orderdate) AS effective_from_us,
       epoch_us(lead(o_orderdate) OVER w) AS effective_to_us,
       CAST(row_number() OVER w AS INTEGER) AS version,
       (lead(o_orderdate) OVER w) IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
        # ground truth is the quadratic NOT EXISTS; the grid-pruned
        # plan must reproduce it row-exactly (pruning is conservative
        # at any binning)
        "skyline_parts": """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)""",
        "daily_activity_full_outer": """
WITH ev AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
  FROM events GROUP BY 1
),
od AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT coalesce(ev.day, od.day) AS day,
       coalesce(n_events, 0) AS n_events,
       coalesce(n_orders, 0) AS n_orders
FROM ev FULL OUTER JOIN od USING (day)
ORDER BY 1""",
        "customer_retention_setops": f"""
WITH y1 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{SETOP_Y1_FROM}'
    AND o_orderdate <  TIMESTAMP '{SETOP_Y1_TO}'
),
y2 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{SETOP_Y2_FROM}'
    AND o_orderdate <  TIMESTAMP '{SETOP_Y2_TO}'
)
SELECT 'retained' AS cohort, o_custkey FROM (
  SELECT o_custkey FROM y1 INTERSECT SELECT o_custkey FROM y2)
UNION ALL
SELECT 'churned' AS cohort, o_custkey FROM (
  SELECT o_custkey FROM y1 EXCEPT SELECT o_custkey FROM y2)""",
        # same discrete median/MAD picks (rank + ceil(n/2), same
        # tie-break) — thresholds and flag set are engine-exact
        "mad_outliers": f"""
WITH ranked AS (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, value AS med FROM ranked
  WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
),
d AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS dev
  FROM events e JOIN med m USING (event_type)
),
ranked2 AS (
  SELECT event_type, dev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY dev, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (
  SELECT event_type, dev AS mad FROM ranked2
  WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
)
SELECT d.event_id, d.event_type, d.value, d.med, mad.mad,
       d.dev / mad.mad AS dev_ratio
FROM d JOIN mad USING (event_type)
WHERE d.dev > {MAD_K!r} * mad.mad""",
        "daily_orders_gapfilled": f"""
WITH ext AS (
  SELECT date_trunc('day', min(o_orderdate)) AS lo,
         date_trunc('day', max(o_orderdate)) AS hi
  FROM orders
),
spine AS (
  SELECT strftime(CAST(d AS TIMESTAMP), '%Y-%m-%d') AS day
  FROM ext, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) t(d)
),
daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         count(*) AS n_orders,
         {_fsum('o_totalprice')} AS total_price
  FROM orders GROUP BY 1
)
SELECT spine.day,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(total_price, 0.0) AS total_price
FROM spine LEFT JOIN daily USING (day)
ORDER BY 1""",
        "customer_order_ranks": """
WITH spend AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
)
SELECT o_custkey, n_orders,
       CAST(dense_rank() OVER (ORDER BY n_orders) AS INTEGER) AS drank,
       percent_rank() OVER (ORDER BY n_orders) AS prank,
       cume_dist() OVER (ORDER BY n_orders) AS cdist,
       CAST(ntile(10) OVER (ORDER BY n_orders, o_custkey) AS INTEGER)
         AS decile
FROM spend""",
        "value_histogram_quantiles_by_type": f"""
WITH ext AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi, count(*) AS n
  FROM events GROUP BY 1
),
binned AS (
  SELECT e.event_type,
         CASE WHEN hi > lo THEN least(
                CAST(floor((value - lo) / ((hi - lo) / {HIST_BINS})) AS BIGINT),
                {HIST_BINS - 1})
              ELSE 0 END AS bin, lo, hi, n
  FROM events e JOIN ext USING (event_type)
),
hist AS (SELECT event_type, bin, lo, hi, n, count(*) AS cnt FROM binned
         GROUP BY event_type, bin, lo, hi, n),
cum AS (SELECT event_type, bin, lo, hi, n,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist),
qs AS (SELECT unnest([{", ".join(repr(float(q)) for q in HIST_QS)}]) AS q)
SELECT event_type, q, min(bin) AS bin,
       min(lo + (bin + 1) * ((hi - lo) / {HIST_BINS})) AS est
FROM cum, qs
WHERE cum >= CAST(ceil(q * n) AS BIGINT)
GROUP BY event_type, q ORDER BY event_type, q""",
        "sliding_window_counts": f"""
WITH ks AS (SELECT unnest(generate_series(0, {WINDOW_US // SLIDE_US - 1})) AS k),
assigned AS (
  SELECT event_type, value,
         epoch_us(ts) - ((epoch_us(ts) - k * {SLIDE_US}) % {WINDOW_US})
           AS window_start_us
  FROM events, ks
)
SELECT window_start_us, event_type,
       count(*) AS n_events, {_fsum('value')} AS total_value
FROM assigned GROUP BY 1, 2""",
        "weekly_revenue_growth": f"""
WITH ext AS (
  SELECT date_trunc('week', min(o_orderdate)) AS lo,
         date_trunc('week', max(o_orderdate)) AS hi
  FROM orders
),
spine AS (
  SELECT strftime(CAST(w AS TIMESTAMP), '%Y-%m-%d') AS week
  FROM ext, unnest(generate_series(lo, hi, INTERVAL 7 DAY)) t(w)
),
weekly AS (
  SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week,
         {_fsum('o_totalprice')} AS revenue
  FROM orders GROUP BY 1
),
dense AS (
  SELECT spine.week, coalesce(revenue, 0.0) AS revenue
  FROM spine LEFT JOIN weekly USING (week)
)
SELECT week, revenue,
       CASE WHEN lag(revenue) OVER (ORDER BY week) > 0.0
            THEN (revenue - lag(revenue) OVER (ORDER BY week))
                 / lag(revenue) OVER (ORDER BY week) END AS wow_growth
FROM dense""",
        # mirrors analytics.cohort_retention: all-integer matrix, the
        # one float is a rounded ratio of two integers
        "cohort_retention": """
WITH o AS (
  SELECT o_custkey,
         strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon
  FROM orders
),
first AS (SELECT o_custkey, min(mon) AS cohort_month FROM o GROUP BY 1),
active AS (SELECT DISTINCT o_custkey, mon FROM o),
j AS (
  SELECT f.cohort_month,
         CAST(datediff('month', CAST(f.cohort_month AS DATE),
                       CAST(a.mon AS DATE)) AS INTEGER) AS month_offset,
         a.o_custkey
  FROM active a JOIN first f USING (o_custkey)
),
ret AS (SELECT cohort_month, month_offset,
               count(DISTINCT o_custkey) AS n_active
        FROM j GROUP BY 1, 2),
size AS (SELECT cohort_month, n_active AS cohort_size
         FROM ret WHERE month_offset = 0)
SELECT r.cohort_month, r.month_offset,
       CAST(r.n_active AS INTEGER) AS n_active,
       CAST(s.cohort_size AS INTEGER) AS cohort_size,
       round(CAST(r.n_active AS DOUBLE) / s.cohort_size, 6) AS retention_rate
FROM ret r JOIN size s USING (cohort_month)""",
    }
