"""Arrow minhash fast path must be BIT-identical to the expression
path: same md5-derived bases, same (a·h+b) mod P permutations, same
bands — so the two operators share one oracle."""

from __future__ import annotations

import pandas as pd

from real_time_fraud_detection_flink_kafka_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_minhash_lsh_fast,
    minhash_signatures,
    minhash_signatures_arrow,
)
from real_time_fraud_detection_flink_kafka_spark.functions import hashing as H
from real_time_fraud_detection_flink_kafka_spark.sources.files import load_table


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_signatures_bit_identical(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id"] + [f"m{i}" for i in range(H.N_PERM)]
    slow = _norm(minhash_signatures(docs).select(cols).toPandas())
    fast = _norm(minhash_signatures_arrow(docs).select(cols).toPandas())
    pd.testing.assert_frame_equal(slow, fast)


def test_fast_pipeline_equals_expression_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    slow = _norm(dedup_minhash_lsh(docs).toPandas())
    fast = _norm(dedup_minhash_lsh_fast(docs).toPandas())
    pd.testing.assert_frame_equal(slow, fast)
