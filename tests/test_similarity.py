from __future__ import annotations

import pandas as pd

from real_time_fraud_detection_flink_kafka_spark.operators.similarity import (
    ann_topk,
    ann_topk_fast,
)
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table


def test_fast_path_equals_exact_path(spark, sf_dir):
    """numpy-matmul fast path returns the same neighbors/ranks as the
    expression-fold exact path (cos within float tolerance)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = ann_topk(emb).toPandas().set_index(["query_id", "rnk"]).sort_index()
    fast = ann_topk_fast(emb).toPandas().set_index(["query_id", "rnk"]).sort_index()
    assert list(exact.index) == list(fast.index)
    assert (exact["neighbor_id"] == fast["neighbor_id"]).all()
    pd.testing.assert_series_equal(exact["cos_sim"], fast["cos_sim"],
                                   rtol=0, atol=1e-6)
