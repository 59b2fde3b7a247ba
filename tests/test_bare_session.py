"""Regression gate for the round-1/2 driver failure: every query must
run correctly on a SparkSession the builder did NOT construct.

The correctness driver builds its own bare
``SparkSession.builder.master(...).getOrCreate()`` — none of the confs
from our ``session.py`` apply.  Rounds 1-2 died on
``PARQUET_TYPE_ILLEGAL: INT64 TIMESTAMP(NANOS)`` because
``spark.sql.legacy.parquet.nanosAsLong`` was only set at build time.
``load_table``/``raw_events_schema`` now set the required confs at
runtime (sources/files.py: ``ensure_session_confs``); this test runs a
genuinely fresh JVM with a vanilla session to prove it, and can never
pass while that class of bug exists.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent

# Representative slice: batch windowed scoring, gap sessionization,
# date_trunc (tz-sensitive), HLL sketch, a stateful stream drain, a
# mapInPandas op (workers must be able to import the package), an
# applyInPandas op (r3 packing), and a native session_window drain.
NAMES = ["fraud_scores", "sessionize", "distinct_users_daily",
         "distinct_users_approx", "stream_windowed_counts",
         "multimodal_decode", "pack_sequences", "stream_session_counts"]

CHILD = r"""
import json, sys
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .appName("bare-driver-mirror").getOrCreate())
sys.path.insert(0, sys.argv[1])
import __spark_entry__ as entry

names, sf_dir = json.loads(sys.argv[2]), sys.argv[3]
out = {}
for name in names:
    pdf = entry.queries()[name](spark, sf_dir).toPandas()
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    out[name] = {"columns": list(pdf.columns),
                 "records": json.loads(pdf.to_json(orient="values"))}
print("RESULT::" + json.dumps(out))
spark.stop()
"""


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_bare_session_matches_oracles(duck, sf_dir, tmp_path):
    # cwd must be FOREIGN to the repo: the grading driver runs from its
    # own directory, so workers can't rely on cwd-relative imports.
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, str(REPO), json.dumps(NAMES), sf_dir],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, f"bare-session run failed:\n{proc.stderr[-4000:]}"
    payload = [l for l in proc.stdout.splitlines() if l.startswith("RESULT::")]
    assert payload, f"no result line in stdout:\n{proc.stdout[-2000:]}"
    results = json.loads(payload[0][len("RESULT::"):])

    from real_time_fraud_detection_flink_kafka_spark.registry import ORACLES

    for name in NAMES:
        got = pd.DataFrame(results[name]["records"],
                           columns=results[name]["columns"])
        if name not in ORACLES:
            assert len(got) >= 0
            continue
        want = _norm(duck.execute(ORACLES[name]).fetchdf())
        assert list(got.columns) == list(want.columns), f"{name}: columns"
        assert got.shape == want.shape, f"{name}: shape {got.shape} != {want.shape}"
        # JSON round-trip loses dtypes and µs-timestamps arrive as ints;
        # compare values after coercing both sides through the same trip.
        want_rt = pd.DataFrame(
            json.loads(_norm(want).to_json(orient="values")),
            columns=list(want.columns))
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want_rt,
                                      check_dtype=False, rtol=1e-6, atol=1e-9)
