"""Data-layout operators: z-order (Morton) clustering and the
zone-map pruning it buys.

At 100 TB the scan you SKIP is the cheapest scan: engines prune
parquet files/row-groups by per-file min/max zone maps, and a layout
clustered on ONE column prunes only that column's predicates. Z-order
interleaves the bits of two dimensions so every z-prefix cell is a
small rectangle in (dim1, dim2) space — point/range predicates on
EITHER dimension (or both) touch a bounded fraction of cells. This is
the layout move behind Databricks Delta's OPTIMIZE ZORDER BY and
Iceberg's z-ordered rewrites, built here from first principles.

Scale shape: no global sort anywhere — the classic implementation
range-partitions by z-value (a shuffle), but cell assignment is pure
row-local arithmetic (min-max scale each dim to ZO_BITS bits from a
1-row broadcast stats relation, interleave with shift/mask terms),
and the zone-map audit is one groupBy(cell). At cluster scale the
writer would `repartitionByRange(zval)` + sortWithinPartitions to
physically materialize files; the operators here emit the layout
DECISION (cell assignment + the zone maps a reader would prune with),
which is the part with testable semantics.

Everything is integer arithmetic (scaling via bigint floor division,
disjoint-bit interleave as a sum of shift terms) so the DuckDB oracle
reproduces values exactly — no doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZO_BITS = 8          # bits per dimension -> 16-bit z-values
ZO_FILE_SHIFT = 10   # keep the top 6 z-bits -> up to 64 cells ("files")
# 1-D layouts keep the top 6 bits of their single dimension, so ALL
# THREE layouts have the same 64-cell ("file") granularity and the
# prune audit compares layout QUALITY, never file-count advantage
LIN_SHIFT = ZO_BITS - (16 - ZO_FILE_SHIFT)
# prune-audit query box, as integer percent of each dimension's range:
# selective in BOTH dims (the case 1-D layouts half-lose)
ZO_BOX_PCT = (25, 50, 25, 50)  # user lo, user hi, ts lo, ts hi


def _scale(col: Column, mn: Column, mx: Column, bits: int = ZO_BITS) -> Column:
    """((x - min) * (2^bits - 1)) div max(range, 1) — bigint throughout."""
    top = F.lit((1 << bits) - 1).cast("bigint")
    rng = F.greatest((mx - mn).cast("bigint"), F.lit(1).cast("bigint"))
    num = (col.cast("bigint") - mn.cast("bigint")) * top
    return (num - (num % rng)) / rng  # exact: num, rng >= 0


def _zval(ux: Column, tx: Column, bits: int = ZO_BITS) -> Column:
    """Morton interleave: dim1 on even bits, dim2 on odd bits. Disjoint
    targets, so plain addition composes the terms."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(ux, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(tx, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def _with_cells(events: DataFrame) -> DataFrame:
    """events + (ux, tx, z_cell, u_cell, t_cell): the three candidate
    layouts' cell ids. Corpus stats arrive as a 1-row broadcast
    cross-join — the same move as every trained-relation operator."""
    ts_us = F.unix_micros(F.col("ts"))
    stats = events.agg(
        F.min("user_id").cast("bigint").alias("umin"),
        F.max("user_id").cast("bigint").alias("umax"),
        F.min(F.unix_micros(F.col("ts"))).alias("tmin"),
        F.max(F.unix_micros(F.col("ts"))).alias("tmax"))
    e = events.crossJoin(F.broadcast(stats))
    ux = _scale(F.col("user_id"), F.col("umin"), F.col("umax")).cast("bigint")
    tx = _scale(ts_us, F.col("tmin"), F.col("tmax")).cast("bigint")
    e = e.withColumn("ux", ux).withColumn("tx", tx)
    return (e.withColumn("z_cell", F.shiftright(
                _zval(F.col("ux"), F.col("tx")), ZO_FILE_SHIFT))
             .withColumn("u_cell", F.shiftright(F.col("ux"), LIN_SHIFT))
             .withColumn("t_cell", F.shiftright(F.col("tx"), LIN_SHIFT)))


def zorder_layout(events: DataFrame) -> DataFrame:
    """Per-z-cell zone maps: (cell, n_rows, min/max of both dims).
    This is the relation a reader prunes with — each z-cell's box is a
    small rectangle, so BOTH dims' min/max ranges are tight (a 1-D
    layout leaves the other dim's range near-full in every file)."""
    ts_us = F.unix_micros(F.col("ts"))
    return (_with_cells(events)
            .groupBy(F.col("z_cell").alias("cell"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("user_id").alias("min_user"),
                 F.max("user_id").alias("max_user"),
                 F.min(ts_us).alias("min_ts_us"),
                 F.max(ts_us).alias("max_ts_us")))


def zorder_prune_compare(events: DataFrame,
                         box_pct: tuple[int, int, int, int] = ZO_BOX_PCT
                         ) -> DataFrame:
    """Zone-map pruning audit: for one rectangular predicate
    (user_id AND time range, `box_pct` of each dim's extent), how many
    cells — and how many rows — does each layout force a reader to
    scan? Layouts: `zorder` (interleaved cells), `user_linear` /
    `ts_linear` (single-dim prefix cells, the layout you get from
    partitioning by one column). One wide groupBy computes all three
    zone maps in a single shuffle (cells stacked via explode of a
    3-element row-local array); the verdict is 3 rows.

    rows_scanned/n_rows_hit for `zorder` should undercut both linear
    layouts whenever the predicate constrains both dims — that
    inequality is the measured claim, asserted at test time rather
    than stated."""
    plo, phi, qlo, qhi = box_pct
    e = _with_cells(events)
    ts_us = F.unix_micros(F.col("ts"))
    cells = e.select(
        "user_id", ts_us.alias("ts_us"),
        F.col("umin"), F.col("umax"), F.col("tmin"), F.col("tmax"),
        F.explode(F.array(
            F.struct(F.lit("zorder").alias("layout"), F.col("z_cell").alias("cell")),
            F.struct(F.lit("user_linear").alias("layout"), F.col("u_cell").alias("cell")),
            F.struct(F.lit("ts_linear").alias("layout"), F.col("t_cell").alias("cell")),
        )).alias("lc"))
    def pct_point(mn, mx, p):
        num = (F.col(mx).cast("bigint") - F.col(mn).cast("bigint")) * F.lit(p).cast("bigint")
        return F.col(mn).cast("bigint") + (num - (num % 100)) / 100
    zone = (cells.groupBy(F.col("lc.layout").alias("layout"), F.col("lc.cell").alias("cell"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("user_id").alias("min_u"), F.max("user_id").alias("max_u"),
                 F.min("ts_us").alias("min_t"), F.max("ts_us").alias("max_t"),
                 F.first("umin").alias("umin"), F.first("umax").alias("umax"),
                 F.first("tmin").alias("tmin"), F.first("tmax").alias("tmax")))
    box_ulo = pct_point("umin", "umax", plo).cast("bigint")
    box_uhi = pct_point("umin", "umax", phi).cast("bigint")
    box_tlo = pct_point("tmin", "tmax", qlo).cast("bigint")
    box_thi = pct_point("tmin", "tmax", qhi).cast("bigint")
    hit = ((F.col("min_u") <= box_uhi) & (F.col("max_u") >= box_ulo)
           & (F.col("min_t") <= box_thi) & (F.col("max_t") >= box_tlo))
    return (zone.groupBy("layout")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum(F.when(hit, 1).otherwise(0)).alias("n_cells_hit"),
                 F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).alias("rows_scanned")))


def _scale_sql(expr: str, mn: str, mx: str, bits: int = ZO_BITS) -> str:
    top = (1 << bits) - 1
    return (f"(CAST({expr} AS BIGINT) - {mn}) * {top} "
            f"// greatest({mx} - {mn}, 1)")


def _zval_sql(ux: str, tx: str, bits: int = ZO_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({ux} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({tx} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _cells_sql() -> str:
    """Shared CTE prefix: events scaled + all three cell ids."""
    return f"""
stats AS (
  SELECT CAST(min(user_id) AS BIGINT) AS umin, CAST(max(user_id) AS BIGINT) AS umax,
         min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
  FROM events
), scaled AS (
  SELECT user_id, epoch_us(ts) AS ts_us, umin, umax, tmin, tmax,
         {_scale_sql('user_id', 'umin', 'umax')} AS ux,
         {_scale_sql('epoch_us(ts)', 'tmin', 'tmax')} AS tx
  FROM events, stats
), celled AS (
  SELECT *, ({_zval_sql('ux', 'tx')}) >> {ZO_FILE_SHIFT} AS z_cell,
         ux >> {LIN_SHIFT} AS u_cell, tx >> {LIN_SHIFT} AS t_cell
  FROM scaled
)"""


def layout_oracles() -> dict[str, str]:
    plo, phi, qlo, qhi = ZO_BOX_PCT
    return {
        "zorder_layout": f"""
WITH {_cells_sql()}
SELECT z_cell AS cell, count(*) AS n_rows,
       min(user_id) AS min_user, max(user_id) AS max_user,
       min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us
FROM celled GROUP BY z_cell""",
        "zorder_prune_compare": f"""
WITH {_cells_sql()}, stacked AS (
  SELECT user_id, ts_us, umin, umax, tmin, tmax, 'zorder' AS layout, z_cell AS cell FROM celled
  UNION ALL
  SELECT user_id, ts_us, umin, umax, tmin, tmax, 'user_linear', u_cell FROM celled
  UNION ALL
  SELECT user_id, ts_us, umin, umax, tmin, tmax, 'ts_linear', t_cell FROM celled
), zone AS (
  SELECT layout, cell, count(*) AS n_rows,
         min(user_id) AS min_u, max(user_id) AS max_u,
         min(ts_us) AS min_t, max(ts_us) AS max_t,
         any_value(umin) AS umin, any_value(umax) AS umax,
         any_value(tmin) AS tmin, any_value(tmax) AS tmax
  FROM stacked GROUP BY layout, cell
), judged AS (
  SELECT layout, n_rows,
         (min_u <= umin + (umax - umin) * {phi} // 100
          AND max_u >= umin + (umax - umin) * {plo} // 100
          AND min_t <= tmin + (tmax - tmin) * {qhi} // 100
          AND max_t >= tmin + (tmax - tmin) * {qlo} // 100) AS hit
  FROM zone
)
SELECT layout, count(*) AS n_cells,
       sum(CASE WHEN hit THEN 1 ELSE 0 END) AS n_cells_hit,
       sum(CASE WHEN hit THEN n_rows ELSE 0 END) AS rows_scanned
FROM judged GROUP BY layout""",
    }


# --- Hilbert layout ----------------------------------------------------------
# The space-filling-curve UPGRADE over Morton: a Hilbert cell prefix
# is a connected rectangle-ish region with no Morton "jumps", so box
# predicates touch fewer cells at equal granularity. Same 8-bit
# scaled dims, same 64-cell file granularity — only the curve differs.

from real_time_fraud_detection_flink_kafka_spark.functions.expr import let as _let


def _hilbert_step(st: Column, s: int) -> Column:
    """One xy2d level (classic Hilbert bit loop, Warren/Wikipedia
    formulation): extract the s-bit of each dim, accumulate
    d += s²·((3·rx) xor ry), then rotate/reflect the sub-square.
    `st` is a LET-BOUND struct(x, y, d) — each level re-binds, so the
    8-level unroll stays linear in expression size instead of the
    4^8-node tree naive substitution builds."""
    x, y, d = st["x"], st["y"], st["d"]
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    rx = F.when(x.bitwiseAND(F.lit(s)) > 0, one).otherwise(zero)
    ry = F.when(y.bitwiseAND(F.lit(s)) > 0, one).otherwise(zero)
    d2 = d + F.lit(s * s).cast("bigint") * (rx * 3).bitwiseXOR(ry)
    inv = (ry == 0) & (rx == 1)
    x1 = F.when(inv, F.lit(s - 1) - x).otherwise(x)
    y1 = F.when(inv, F.lit(s - 1) - y).otherwise(y)
    swap = ry == 0
    xs = F.when(swap, y1).otherwise(x1)
    ys = F.when(swap, x1).otherwise(y1)
    nxt = F.struct(xs.alias("x"), ys.alias("y"), d2.alias("d"))
    if s == 1:
        return nxt["d"]
    return _let(nxt, lambda b: _hilbert_step(b, s // 2))


def _hval(ux: Column, tx: Column, bits: int = ZO_BITS) -> Column:
    """Hilbert index of the two scaled dims (16-bit for ZO_BITS=8)."""
    st0 = F.struct(ux.alias("x"), tx.alias("y"),
                   F.lit(0).cast("bigint").alias("d"))
    return _let(st0, lambda st: _hilbert_step(st, 1 << (bits - 1)))


def hilbert_layout(events: DataFrame) -> DataFrame:
    """Per-Hilbert-cell zone maps — `zorder_layout`'s contract on the
    Hilbert curve (same scaled dims, same 64-cell granularity, same
    one-groupBy audit), so the two layouts' prune behavior is directly
    comparable."""
    ts_us = F.unix_micros(F.col("ts"))
    return (_with_cells(events)
            .withColumn("h_cell", F.shiftright(
                _hval(F.col("ux"), F.col("tx")), ZO_FILE_SHIFT))
            .groupBy(F.col("h_cell").alias("cell"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("user_id").alias("min_user"),
                 F.max("user_id").alias("max_user"),
                 F.min(ts_us).alias("min_ts_us"),
                 F.max(ts_us).alias("max_ts_us")))


def hilbert_prune_compare(events: DataFrame,
                          box_pct: tuple[int, int, int, int] = ZO_BOX_PCT
                          ) -> DataFrame:
    """`zorder_prune_compare`'s audit for curve-vs-curve: hilbert and
    zorder zone maps at the SAME 64-cell granularity against the same
    both-dims box predicate — the relation an engine consults when
    choosing its OPTIMIZE layout. 2 verdict rows, same columns as the
    z-order audit."""
    plo, phi, qlo, qhi = box_pct
    e = (_with_cells(events)
         .withColumn("h_cell", F.shiftright(
             _hval(F.col("ux"), F.col("tx")), ZO_FILE_SHIFT)))
    ts_us = F.unix_micros(F.col("ts"))
    cells = e.select(
        "user_id", ts_us.alias("ts_us"),
        F.col("umin"), F.col("umax"), F.col("tmin"), F.col("tmax"),
        F.explode(F.array(
            F.struct(F.lit("hilbert").alias("layout"), F.col("h_cell").alias("cell")),
            F.struct(F.lit("zorder").alias("layout"), F.col("z_cell").alias("cell")),
        )).alias("lc"))

    def pct_point(mn, mx, p):
        num = (F.col(mx).cast("bigint") - F.col(mn).cast("bigint")) * F.lit(p).cast("bigint")
        return F.col(mn).cast("bigint") + (num - (num % 100)) / 100

    zone = (cells.groupBy(F.col("lc.layout").alias("layout"), F.col("lc.cell").alias("cell"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("user_id").alias("min_u"), F.max("user_id").alias("max_u"),
                 F.min("ts_us").alias("min_t"), F.max("ts_us").alias("max_t"),
                 F.first("umin").alias("umin"), F.first("umax").alias("umax"),
                 F.first("tmin").alias("tmin"), F.first("tmax").alias("tmax")))
    box_ulo = pct_point("umin", "umax", plo).cast("bigint")
    box_uhi = pct_point("umin", "umax", phi).cast("bigint")
    box_tlo = pct_point("tmin", "tmax", qlo).cast("bigint")
    box_thi = pct_point("tmin", "tmax", qhi).cast("bigint")
    hit = ((F.col("min_u") <= box_uhi) & (F.col("max_u") >= box_ulo)
           & (F.col("min_t") <= box_thi) & (F.col("max_t") >= box_tlo))
    return (zone.groupBy("layout")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum(F.when(hit, 1).otherwise(0)).alias("n_cells_hit"),
                 F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).alias("rows_scanned")))


def _hval_ctes() -> str:
    """8 chained CTEs h7..h0 replaying _hilbert_step exactly (DuckDB
    optimizes repeated small CASE expressions; no exponential tree)."""
    ctes = ["""h_in AS (
  SELECT *, CAST(ux AS BIGINT) AS hx, CAST(tx AS BIGINT) AS hy,
         CAST(0 AS BIGINT) AS hd
  FROM celled
)"""]
    prev = "h_in"
    for k in range(ZO_BITS - 1, -1, -1):
        s = 1 << k
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        d2 = f"hd + {s * s} * xor(3 * {rx}, {ry})"
        inv = f"({ry} = 0 AND {rx} = 1)"
        x1 = f"(CASE WHEN {inv} THEN {s - 1} - hx ELSE hx END)"
        y1 = f"(CASE WHEN {inv} THEN {s - 1} - hy ELSE hy END)"
        xs = f"(CASE WHEN {ry} = 0 THEN {y1} ELSE {x1} END)"
        ys = f"(CASE WHEN {ry} = 0 THEN {x1} ELSE {y1} END)"
        name = f"h{k}"
        ctes.append(f"""{name} AS (
  SELECT * REPLACE ({xs} AS hx, {ys} AS hy, {d2} AS hd) FROM {prev}
)""")
        prev = name
    ctes.append(f"hcelled AS (SELECT *, hd >> {ZO_FILE_SHIFT} AS h_cell FROM {prev})")
    return ", ".join(ctes)


def hilbert_oracles() -> dict[str, str]:
    plo, phi, qlo, qhi = ZO_BOX_PCT
    return {
        "hilbert_layout": f"""
WITH {_cells_sql()}, {_hval_ctes()}
SELECT h_cell AS cell, count(*) AS n_rows,
       min(user_id) AS min_user, max(user_id) AS max_user,
       min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us
FROM hcelled GROUP BY h_cell""",
        "hilbert_prune_compare": f"""
WITH {_cells_sql()}, {_hval_ctes()}, stacked AS (
  SELECT user_id, ts_us, umin, umax, tmin, tmax, 'hilbert' AS layout, h_cell AS cell FROM hcelled
  UNION ALL
  SELECT user_id, ts_us, umin, umax, tmin, tmax, 'zorder', z_cell FROM hcelled
), zone AS (
  SELECT layout, cell, count(*) AS n_rows,
         min(user_id) AS min_u, max(user_id) AS max_u,
         min(ts_us) AS min_t, max(ts_us) AS max_t,
         any_value(umin) AS umin, any_value(umax) AS umax,
         any_value(tmin) AS tmin, any_value(tmax) AS tmax
  FROM stacked GROUP BY layout, cell
), judged AS (
  SELECT layout, n_rows,
         (min_u <= umin + (umax - umin) * {phi} // 100
          AND max_u >= umin + (umax - umin) * {plo} // 100
          AND min_t <= tmin + (tmax - tmin) * {qhi} // 100
          AND max_t >= tmin + (tmax - tmin) * {qlo} // 100) AS hit
  FROM zone
)
SELECT layout, count(*) AS n_cells,
       sum(CASE WHEN hit THEN 1 ELSE 0 END) AS n_cells_hit,
       sum(CASE WHEN hit THEN n_rows ELSE 0 END) AS rows_scanned
FROM judged GROUP BY layout""",
    }
