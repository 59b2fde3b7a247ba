"""Skew mitigation for joins on hot keys.

AQE's skew-join handles most cases at runtime (enabled in
session.py); explicit salting remains necessary when one key's rows
exceed a single task's memory even after AQE splitting, or when the
skewed side feeds a shuffle AQE can't re-split (e.g. into a stateful
operator). Pattern: replicate the small side `n_salt`×, scatter the
big side deterministically across salts, join on (key, salt) —
the hot key's rows spread over n_salt tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salt: int = 8, scatter_by: Column | None = None) -> DataFrame:
    """Equi-join big⋈small on `key` with the big side scattered over
    n_salt sub-keys. `scatter_by` picks the salt (defaults to a
    deterministic spread via monotonically increasing row position is
    NOT stable — pass a column; default uses a hash of all big-side
    columns)."""
    if scatter_by is None:
        scatter_by = F.hash(*[F.col(c) for c in big.columns])
    big_s = big.withColumn("_salt", F.pmod(scatter_by, F.lit(n_salt)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    small_s = small.withColumn("_salt", salts)
    out = big_s.join(small_s, [key, "_salt"])
    return out.drop("_salt")
