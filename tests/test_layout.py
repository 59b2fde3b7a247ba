"""Z-order layout: registration, equal file granularity, and the
dominance claim the docstring makes — a box predicate selective in
BOTH dimensions scans fewer rows under the z-ordered layout than
under either single-column linear layout (oracle-parity vs DuckDB is
covered separately by test_oracle_parity.py)."""

from __future__ import annotations

from real_time_fraud_detection_flink_kafka_spark.operators import layout
from real_time_fraud_detection_flink_kafka_spark.registry import ORACLES, QUERIES
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table


def test_layout_registered_with_oracles():
    for name in ("zorder_layout", "zorder_prune_compare"):
        assert name in QUERIES and name in ORACLES


def test_equal_cell_granularity():
    """All three layouts get the same cell budget (64 "files") so the
    prune comparison measures layout quality, not file-count
    advantage (ADVICE r7: LIN_SHIFT must give 1-D layouts the same
    2^6 cells the z-order layout gets)."""
    z_cells = 1 << (2 * layout.ZO_BITS - layout.ZO_FILE_SHIFT)
    lin_cells = 1 << (layout.ZO_BITS - layout.LIN_SHIFT)
    assert z_cells == lin_cells == 64


def test_zorder_zone_maps_cover_corpus(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    n = events.count()
    zones = layout.zorder_layout(events).toPandas()
    assert zones["n_rows"].sum() == n
    assert (zones["cell"] >= 0).all()
    assert (zones["cell"] < 64).all()
    # z-cells are rectangles: every cell's user range must be a
    # proper sub-range (no cell spans the full user extent unless
    # there is only one populated user stripe)
    assert len(zones) > 1


def test_zorder_prune_dominates_linear_layouts(spark, sf_dir):
    """The measured claim: for the default box (25-50% of BOTH dims)
    z-order forces a reader to scan fewer rows than either 1-D
    layout, at identical cell granularity."""
    events = load_table(spark, sf_dir, "events")
    rows = {r["layout"]: r.asDict()
            for r in layout.zorder_prune_compare(events).collect()}
    assert set(rows) == {"zorder", "user_linear", "ts_linear"}
    z = rows["zorder"]["rows_scanned"]
    assert z < rows["user_linear"]["rows_scanned"]
    assert z < rows["ts_linear"]["rows_scanned"]
    # and it is not pruning by file-count advantage: cell budgets match
    assert rows["zorder"]["n_cells"] <= 64
    assert rows["user_linear"]["n_cells"] <= 64
    assert rows["ts_linear"]["n_cells"] <= 64


def test_hilbert_index_is_a_continuous_bijection(spark):
    """The two properties that make Hilbert a layout curve at all,
    checked exhaustively on the 16x16 grid (bits=4): (1) bijection —
    the 256 (x, y) points map to exactly the d values 0..255; (2)
    CONTINUITY — consecutive d are manhattan-adjacent cells (|dx| +
    |dy| == 1), the property Morton lacks (its jumps are why equal-
    granularity Hilbert cells prune at least as well)."""
    import pyspark.sql.functions as F

    bits = 4
    pts = spark.range(256).select(
        (F.col("id") % 16).cast("bigint").alias("x"),
        (F.col("id") / 16).cast("bigint").alias("y"))
    out = pts.select("x", "y",
                     layout._hval(F.col("x"), F.col("y"), bits=bits)
                     .alias("d")).toPandas()
    assert sorted(out.d) == list(range(256))
    srt = out.sort_values("d").reset_index(drop=True)
    steps = (srt.x.diff().abs() + srt.y.diff().abs()).dropna()
    assert (steps == 1).all()
    # production width (bits=8): bijection over the full 65536-point
    # grid, verified distributed (no collect)
    pts8 = spark.range(65536).select(
        (F.col("id") % 256).cast("bigint").alias("x"),
        (F.col("id") / 256).cast("bigint").alias("y"))
    d8 = pts8.select(layout._hval(F.col("x"), F.col("y")).alias("d"))
    stats = d8.agg(F.countDistinct("d").alias("nd"),
                   F.min("d").alias("lo"), F.max("d").alias("hi")).first()
    assert (stats["nd"], stats["lo"], stats["hi"]) == (65536, 0, 65535)


def test_hilbert_prunes_at_least_as_well_as_zorder(spark, sf_dir):
    """Equal 64-cell granularity, same box predicate: the Hilbert
    layout's rows_scanned must not exceed z-order's (connected cells
    have no Morton jumps), and both beat the 1-D layouts (the z-order
    dominance test's bar)."""
    events = load_table(spark, sf_dir, "events")
    hp = {r["layout"]: r for r in
          layout.hilbert_prune_compare(events).collect()}
    zp = {r["layout"]: r for r in
          layout.zorder_prune_compare(events).collect()}
    assert hp["hilbert"]["n_cells"] == hp["zorder"]["n_cells"] == 64
    assert hp["zorder"]["rows_scanned"] == zp["zorder"]["rows_scanned"]
    assert (hp["hilbert"]["rows_scanned"]
            <= hp["zorder"]["rows_scanned"])
    for lin in ("user_linear", "ts_linear"):
        assert hp["hilbert"]["rows_scanned"] < zp[lin]["rows_scanned"]
