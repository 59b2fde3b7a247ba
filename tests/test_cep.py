from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
    cep_card_testing,
    distinct_users_approx,
)
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

SEC_US = 1_000_000


def test_cep_pattern_on_known_sequence(spark):
    # card A: probe, probe, large → match; card B: one probe, large → no
    rows = [
        (1, 0, "purchase", 2.0, '{"k": 0}'),
        (2, 0, "purchase", 3.0, '{"k": 0}'),
        (3, 0, "purchase", 250.0, '{"k": 0}'),
        (4, 1, "purchase", 2.0, '{"k": 0}'),
        (5, 1, "purchase", 250.0, '{"k": 0}'),
    ]
    import datetime

    base = datetime.datetime(2024, 1, 1)
    data = [(eid, base + datetime.timedelta(seconds=eid * 60), uid, et, v, p)
            for eid, uid, et, v, p in rows]
    events = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    got = {(r.event_id, r.n_probes) for r in cep_card_testing(events).collect()}
    assert got == {(3, 2)}


def test_approx_distinct_within_rsd(spark, sf_dir):
    df = distinct_users_approx(load_table(spark, sf_dir, "events")).collect()
    assert len(df) == 5
    for r in df:
        assert abs(r.n_users_approx - r.n_users_exact) <= max(2, 0.15 * r.n_users_exact)


def test_kmv_estimator_branch_error_bound(spark, sf_dir):
    """With k below the true cardinality the (k-1)/h_k estimator
    engages; KMV's relative standard error is ~1/sqrt(k-2), so allow
    3 RSEs. Exact-branch behavior (m < k) is covered by the oracle
    parity test at k=64."""
    from real_time_fraud_detection_flink_kafka_spark.operators.cep import distinct_users_kmv
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    events = load_table(spark, sf_dir, "events")
    k = 8
    est = distinct_users_kmv(events, k=k).toPandas().set_index("day")
    exact = (events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
             .agg(F.count_distinct("user_id").alias("n")).toPandas()
             .set_index("day"))
    joined = est.join(exact)
    engaged = joined[joined.n >= k]
    assert len(engaged) > 0, "estimator branch never engaged — lower k"
    rel_err = ((engaged.n_users_est - engaged.n).abs() / engaged.n)
    assert (rel_err < 3 / (k - 2) ** 0.5).all(), rel_err


def test_pagerank_star_graph_center_dominates(spark):
    """(r6) Structural PageRank property on an exactly-known graph: a
    star built from event timings (center user co-occurs with every
    leaf inside the 60 s window; leaves are 120 s apart so they never
    pair with each other). The center must out-rank every leaf, the
    leaves must tie EXACTLY (fixed-point determinism), and total rank
    mass must stay within floor-loss of 1."""
    import datetime

    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        PR_FP,
        coincidence_pagerank,
    )

    base = datetime.datetime(2024, 1, 1)
    n_leaves, rows, eid = 6, [], 0
    for i in range(n_leaves):
        rows.append((eid, base + datetime.timedelta(seconds=i * 120), 100, "c", 1.0, "{}"))
        eid += 1
        rows.append((eid, base + datetime.timedelta(seconds=i * 120 + 30), 200 + i, "c", 1.0, "{}"))
        eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    pr = {r.user_id: r.pr_units for r in coincidence_pagerank(events).collect()}
    assert set(pr) == {100, *range(200, 200 + n_leaves)}
    leaf_units = {pr[200 + i] for i in range(n_leaves)}
    assert len(leaf_units) == 1, "leaves must tie exactly"
    assert pr[100] > max(leaf_units)
    total = sum(pr.values())
    assert 0.999 * PR_FP < total <= PR_FP


def test_triangles_known_graph(spark):
    """(r6) Exactly-known graph: a K3 (users 1,2,3 co-occur within
    one minute) plus a pendant (user 4 pairs only with user 1 in a
    later window). Checks triangle counts and the clustering
    coefficient against hand arithmetic."""
    import datetime

    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        coincidence_triangles,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [(0, base, 1, "c", 1.0, "{}"),
            (1, base + datetime.timedelta(seconds=10), 2, "c", 1.0, "{}"),
            (2, base + datetime.timedelta(seconds=20), 3, "c", 1.0, "{}"),
            (3, base + datetime.timedelta(seconds=1000), 4, "c", 1.0, "{}"),
            (4, base + datetime.timedelta(seconds=1030), 1, "c", 1.0, "{}")]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r.user_id: (r.deg, r.n_tri, r.lcc)
           for r in coincidence_triangles(events).collect()}
    assert got == {1: (3, 1, 2 * 1 / (3 * 2)),
                   2: (2, 1, 1.0),
                   3: (2, 1, 1.0),
                   4: (1, 0, 0.0)}


def test_bloom_no_false_negatives_and_fpr_shrinks(spark, sf_dir):
    """(r6) The Bloom guarantees: NEVER a false negative (a member's
    bits are all set by construction, at any filter size), and the
    measured FPR must not increase as m grows."""
    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        bloom_membership,
    )
    from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table

    rows = bloom_membership(load_table(spark, sf_dir, "events"),
                            load_table(spark, sf_dir, "customer")).collect()
    assert len(rows) >= 2
    assert all(r.n_false_neg == 0 for r in rows)
    by_m = sorted(rows, key=lambda r: r.m_bits)
    fprs = [r.fpr for r in by_m]
    assert fprs == sorted(fprs, reverse=True) or len(set(fprs)) == 1


def test_coincident_matches_bruteforce_with_boundary_gaps(spark):
    """(r6) Binned range join vs an in-Python brute force on seeded
    random timestamps, with adversarial cases mixed in: gap exactly 0
    (tie-break path), gap exactly delta-1 (inclusive edge), gap
    exactly delta (exclusive edge), and bin-boundary-straddling
    pairs."""
    import random

    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        COINCIDENCE_US,
        coincident_events,
    )

    rng = random.Random(7)
    rows = []
    eid = 0
    for _ in range(120):
        us = rng.randrange(0, 3_600_000_000)
        rows.append((eid, us, rng.randrange(0, 12)))
        eid += 1
    # adversarial: equal ts, gap = delta-1, gap = delta, bin edge
    base = 7_200_000_000
    for du, ub in [(0, 1), (COINCIDENCE_US - 1, 2), (COINCIDENCE_US, 3),
                   (1, 4)]:
        rows.append((eid, base, 0)); eid += 1
        rows.append((eid, base + du, ub)); eid += 1
        base += 10 * COINCIDENCE_US
    # exactly at a bin boundary
    edge = (base // COINCIDENCE_US + 1) * COINCIDENCE_US
    rows.append((eid, edge - 1, 5)); eid += 1
    rows.append((eid, edge, 6)); eid += 1

    import datetime
    data = [(i, datetime.datetime(2024, 1, 1)
             + datetime.timedelta(microseconds=us), u, "c", 1.0, "{}")
            for i, us, u in rows]
    events = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r.event_a, r.event_b, r.gap_us)
           for r in coincident_events(events).collect()}
    want = set()
    for i, us_i, u_i in rows:
        for j, us_j, u_j in rows:
            gap = us_j - us_i
            if (0 <= gap < COINCIDENCE_US and u_i != u_j
                    and (us_i < us_j or (us_i == us_j and i < j))):
                want.add((i, j, gap))
    assert got == want


def test_coincident_stream_multi_microbatch_exact(spark, tmp_path):
    """Stream-stream exactness contract: the drain matches the batch
    operator whenever input lateness is bounded by the watermark
    delay. The default delay equals the 60 s coincidence window, so a
    multi-microbatch source (one file per trigger) whose disorder is
    bounded by the window stays row-exact. The fixture discriminates:
    event B (t=41 s) arrives three microbatches late, 59 s behind the
    max event time (100 s) — within the 60 s default, so all 6 batch
    pairs appear; under the old 5 s watermark the intermediate
    batches advance the watermark past A/f0's join state and B's own
    event time, silently dropping the 4 cross-boundary pairs
    (measured: that variant emits only 2 of 6)."""
    import os

    import pandas as pd

    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        coincident_events,
    )
    from real_time_fraud_detection_flink_kafka_spark.streaming.dedup_stream import (
        coincident_events_stream,
    )

    chunk_dir = str(tmp_path / "chunks")
    os.makedirs(chunk_dir)
    sec = 1_000_000
    t = 1_700_000_000 * sec
    rows_by_chunk = [
        [(0, t + 1 * sec, 1, "view", 1.0, "{}"),      # A
         (1, t + 10 * sec, 99, "view", 1.0, "{}")],   # f0
        [(2, t + 95 * sec, 98, "view", 1.0, "{}")],   # f1 (advances wm)
        [(3, t + 100 * sec, 97, "view", 1.0, "{}")],  # f2 (advances wm)
        [(4, t + 41 * sec, 2, "view", 1.0, "{}")],    # B: 59 s late
    ]
    cols6 = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, rows in enumerate(rows_by_chunk):
        p = os.path.join(chunk_dir, f"chunk_{i}.parquet")
        pd.DataFrame(rows, columns=cols6).to_parquet(p)
        os.utime(p, (1000 + i, 1000 + i))  # deterministic file order

    schema = ("event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double, props string")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(chunk_dir)
              .withColumn("ts", F.timestamp_micros(F.col("ts"))))
    q = (coincident_events_stream(stream)
         .writeStream.format("memory").queryName("t_coin_multi")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    batch = spark.createDataFrame(
        [r for rows in rows_by_chunk for r in rows], ", ".join(
            f"{c} {t_}" for c, t_ in zip(
                cols6, ["bigint", "bigint", "bigint", "string",
                        "double", "string"]))
    ).withColumn("ts", F.timestamp_micros(F.col("ts")))

    out_cols = ["event_a", "event_b", "user_a", "user_b", "gap_us"]
    got = (spark.table("t_coin_multi").toPandas()[out_cols]
           .sort_values(out_cols).reset_index(drop=True))
    want = (coincident_events(batch).toPandas()[out_cols]
            .sort_values(out_cols).reset_index(drop=True))
    # 4 of the 6 ground-truth pairs involve the late row B
    assert len(want) == 6
    assert (want[["event_a", "event_b"]].to_numpy() == 4).any(axis=1).sum() == 4
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_coincidence_components_transitive_chain(spark):
    """A temporal chain A~B (t, t+30s), B~C (t+30s, t+55s) with C
    outside A's window must still land all three users in ONE ring —
    transitivity is the whole point of the components layer over the
    pair relation — while an isolated user far away forms no ring."""
    from datetime import datetime, timedelta

    from real_time_fraud_detection_flink_kafka_spark.operators.cep import (
        coincidence_components,
    )

    t0 = datetime(2026, 1, 1)
    rows = [
        (1, t0, 10, "a", 1.0, "{}"),
        (2, t0 + timedelta(seconds=30), 20, "a", 1.0, "{}"),
        (3, t0 + timedelta(seconds=55), 30, "a", 1.0, "{}"),
        (4, t0 + timedelta(hours=5), 40, "a", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    out = {r["user_id"]: r for r in coincidence_components(events).collect()}
    assert set(out) == {10, 20, 30}          # user 40 isolated
    assert len({r["ring_id"] for r in out.values()}) == 1
    assert all(r["ring_size"] == 3 for r in out.values())
