"""Cache-lifetime discipline: every persist() in the query builders is
tracked, and release_caches() returns storage memory to zero — a
long-lived session (bench, oracle sim) running the whole registry must
not accumulate cached relations across queries."""

from __future__ import annotations

import pytest

from real_time_fraud_detection_flink_kafka_spark.cache import release_caches
from real_time_fraud_detection_flink_kafka_spark.registry import QUERIES


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


# one query per persisting builder family: intake composition (d2 +
# minhash sig), funnel (d2/d3/d4 + sig), BPE rounds, label
# propagation (edges + final labels), LSH bucket relations
PERSISTING_QUERIES = [
    "corpus_to_packs",
    "corpus_filter_funnel",
    "bpe_merges",
    "dedup_clusters",
    "ann_lsh_fast",
    "dedup_minhash_lsh_fast",
    "semantic_canonicalize",  # shared label-propagation engine (r6)
    "mix_rebalance",          # per-source token relation (r6)
    "coincidence_pagerank",   # edges + nodes across iterations (r6)
    "coincidence_triangles",  # deg + oriented edge relation (r6)
    "mad_outliers",           # post-exchange ranked relation (r6)
]


@pytest.mark.parametrize("name", PERSISTING_QUERIES)
def test_query_leaves_no_persisted_rdds_after_release(spark, sf_dir, name):
    release_caches()  # prior tests' leftovers are not this test's subject
    before = _n_persistent_rdds(spark)
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert release_caches() > 0, f"{name} persisted nothing tracked"
    assert _n_persistent_rdds(spark) <= before, (
        f"{name} left persisted RDDs behind after release_caches()")


def test_release_caches_is_idempotent(spark):
    assert release_caches() == 0
    assert release_caches() == 0
