"""Property tests (hypothesis) for the two portability invariants the
entire oracle strategy rests on:

1. the portable 60-bit md5 hash is IDENTICAL across Spark, DuckDB and
   hashlib for arbitrary unicode strings — every dedup/LSH/sampling
   oracle assumes this;
2. the fixed-point sum (``fsum``) is exactly equal between Spark (any
   partitioning) and DuckDB for 6dp-bounded values — every aggregate
   oracle assumes this.

Each example batches all its rows into ONE Spark job, so the suite
stays fast despite hypothesis' repeated calls."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.functions.hashing import (
    md5_int60,
    md5_int60_sql,
)
from real_time_fraud_detection_flink_kafka_spark.operators.analytics import (
    SCALE,
    fsum,
)

# printable-ish unicode without surrogates and NUL (VARCHAR-hostile,
# never present in the corpus contract)
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    min_size=0, max_size=40)


@given(st.lists(_TEXT, min_size=1, max_size=8, unique=True))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_md5_int60_identical_across_engines(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {r["t"]: r["h"] for r in
           df.select("t", md5_int60(F.col("t")).alias("h")).collect()}
    con = duckdb.connect()
    for t in texts:
        want_duck = con.execute(
            f"SELECT {md5_int60_sql('?')}", [t]).fetchone()[0]
        want_py = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert got[t] == want_duck == want_py, repr(t)
    con.close()


# 6dp-bounded values: the fixed-point contract's domain (prices,
# rounded scores). Integer micro-units avoid generating .5-ulp round
# boundaries that the contract never claims to cover.
_MICROS = st.integers(min_value=-10**12, max_value=10**12)


@given(st.lists(_MICROS, min_size=1, max_size=50))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fsum_partition_invariant_and_engine_exact(spark, micros):
    vals = [m / float(SCALE) for m in micros]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    one = df.coalesce(1).agg(fsum(F.col("x")).alias("s")).collect()[0]["s"]
    many = df.repartition(7).agg(fsum(F.col("x")).alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    import pandas as pd

    con.register("t", pd.DataFrame({"x": vals}))
    want = con.execute(
        f"SELECT sum(CAST(round(x * {SCALE}) AS BIGINT)) / {float(SCALE)!r} "
        "FROM t").fetchone()[0]
    con.close()
    assert one == many == want


# ---------------------------------------------------------------------------
# 2-evidence prefix-filter completeness (r11): the extended-prefix
# candidate filters in dedup_ppjoin and dedup_containment must be
# COMPLETE against the quadratic contract on adversarial corpora —
# dense shared vocab (lots of near-miss pairs), tiny sets (the
# c_req < 2 edges), exact duplicates (clique expansion), and ties.

_WORDS = [f"w{i}" for i in range(12)]  # small vocab => dense sharing


@st.composite
def _corpus(draw):
    n_docs = draw(st.integers(min_value=2, max_value=8))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(min_value=3, max_value=10))
        words = [ _WORDS[draw(st.integers(0, len(_WORDS) - 1))]
                  for _ in range(n_words) ]
        docs.append((i, " ".join(words)))
    if draw(st.booleans()) and len(docs) >= 2:
        # plant an exact duplicate set (clique path)
        docs[-1] = (docs[-1][0], docs[0][1])
    return docs


def _truth_pairs(spark, docs, measure):
    """Quadratic ground truth over the same shingle-hash sets."""
    from real_time_fraud_detection_flink_kafka_spark.functions import hashing as H
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        shingle_sets,
        spread,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    hs = {r["doc_id"]: set(r["hset"]) for r in
          shingle_sets(spread(df)).select(
              "doc_id",
              F.transform("sh_set", lambda s: H.md5_int60(s)).alias("hset"))
          .collect()}
    out = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not hs[a] or not hs[b]:
                continue
            inter = len(hs[a] & hs[b])
            if measure == "jaccard":
                sim = round(inter / (len(hs[a]) + len(hs[b]) - inter), 6)
                from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
                    JACCARD_THRESHOLD as tau,
                )
            else:
                sim = round(inter / min(len(hs[a]), len(hs[b])), 6)
                from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
                    CONTAIN_THRESHOLD as tau,
                )
            if sim >= tau:
                out[(a, b)] = sim
    return out


@given(_corpus())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_two_evidence_filters_complete_on_random_corpora(spark, docs):
    """dedup_ppjoin == Jaccard quadratic truth and dedup_containment
    == containment quadratic truth on hypothesis-generated corpora
    with dense vocabulary sharing — the adversarial class for prefix
    filtering (many pairs share exactly one or two rare tokens, sets
    are tiny enough to hit every c_req edge case)."""
    from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
        dedup_containment,
        dedup_ppjoin,
    )

    got_j = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup_ppjoin(spark.createDataFrame(
                 docs, "doc_id long, text string")).collect()}
    assert got_j == _truth_pairs(spark, docs, "jaccard")
    got_c = {(r["doc_a"], r["doc_b"]): r["containment"]
             for r in dedup_containment(spark.createDataFrame(
                 docs, "doc_id long, text string")).collect()}
    assert got_c == _truth_pairs(spark, docs, "containment")


def test_weighted_sample_es_inclusion_dominance(spark):
    """A-ES soundness on a constructed corpus: when one doc's weight
    dwarfs every other (a 10,000-token doc among 1-token docs), it
    must be sampled — P(excluded) < (1 - k/n)^(w_ratio) is
    astronomically small, and with the DETERMINISTIC hash draw the
    outcome is fixed, so this pins the key formula's direction (a
    sign error in ln(u)/w would systematically exclude heavy docs
    instead). Also: with equal weights, the draw must equal the
    unweighted hash top-k — the formula degenerates correctly."""
    from real_time_fraud_detection_flink_kafka_spark.operators.pipeline import (
        es_keyed,
        weighted_sample_es,
    )
    from pyspark.sql import functions as F

    n = 600
    rows = [(i, "w " * 1 if i else "w " * 10_000) for i in range(n)]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string")
    got = {r["doc_id"] for r in weighted_sample_es(docs, k=50).collect()}
    assert 0 in got  # the heavy doc is in the sample
    # equal weights: ranking reduces to the raw hash order (ln(u)/w
    # with constant w is a monotone transform of u)
    eq = spark.createDataFrame([(i, "a b c") for i in range(n)],
                               "doc_id long, text string")
    got_eq = [r["doc_id"] for r in weighted_sample_es(eq, k=20).collect()]
    want = [r["doc_id"] for r in
            es_keyed(eq).orderBy(F.desc("es_key"), F.asc("doc_id"))
            .limit(20).collect()]
    assert got_eq == want
