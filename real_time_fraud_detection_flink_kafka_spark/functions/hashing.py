"""Engine-portable deterministic hashing.

Spark's builtin hash functions (murmur3/xxhash64) have no DuckDB
equivalent, so every hash the oracle must reproduce is derived from
md5 (identical in both engines): take 15 hex chars → 60-bit int.
MinHash permutations are universal hashes (a*h + b) mod P with P =
1e9+7 so products stay within int64. Constants come from a fixed LCG
(seed 42) and are baked into both the Spark expressions and the
generated oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
N_PERM = 16
N_BANDS = 8  # r = 2 rows/band: catches candidates well below j=0.8
ROLL_MULT = 31


def _lcg_constants(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for universal hashing."""
    state = seed
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state >> 16) % (P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (state >> 16) % P
        out.append((a, b))
    return out


PERMS = _lcg_constants(N_PERM)


def md5_int60(col: Column) -> Column:
    """First 15 hex chars of md5 as a 60-bit bigint (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int60_sql(expr: str) -> str:
    """DuckDB mirror of md5_int60."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def base_mod_p(col: Column) -> Column:
    return md5_int60(col) % P


def base_mod_p_sql(expr: str) -> str:
    return f"({md5_int60_sql(expr)} % {P})"


def perm_hash(base: Column, i: int) -> Column:
    a, b = PERMS[i]
    return (F.lit(a) * base + F.lit(b)) % P


def perm_array(base: Column) -> Column:
    """All N_PERM permutation hashes of one base value as an array.
    `base` must already be a computed value (lambda variable), so the
    md5 underneath is evaluated once regardless of N_PERM."""
    return F.array(*[perm_hash(base, i) for i in range(N_PERM)])


def minhash_sig_array(shingle_set: Column) -> Column:
    """MinHash signature (array of N_PERM minima) in ONE expression:
    bases computed once per shingle, element-wise-min fold across the
    set. Single-pass, row-local, no shuffle. Empty sets yield the P
    sentinel in every slot (can never collide with a real minimum
    below P... they collide with each other, but empty docs verify to
    jaccard null and drop out)."""
    bases = F.transform(shingle_set, base_mod_p)
    init = F.array(*[F.lit(P).cast("bigint")] * N_PERM)
    return F.aggregate(bases, init,
                       lambda acc, b: F.zip_with(acc, perm_array(b),
                                                 lambda x, y: F.least(x, y)))


def minhash_sig_from_hashes(hash_set: Column) -> Column:
    """`minhash_sig_array` over PRE-HASHED shingles (md5_int60 values):
    identical minima — base_mod_p(s) == md5_int60(s) % P — without
    re-running md5 inside the fold."""
    bases = F.transform(hash_set, lambda h: h % P)
    init = F.array(*[F.lit(P).cast("bigint")] * N_PERM)
    return F.aggregate(bases, init,
                       lambda acc, b: F.zip_with(acc, perm_array(b),
                                                 lambda x, y: F.least(x, y)))


def perm_hash_sql(base_expr: str, i: int) -> str:
    a, b = PERMS[i]
    return f"(({a} * {base_expr} + {b}) % {P})"


def rolling_hash(tokens: Column) -> Column:
    """Order-sensitive polynomial hash over a token array:
    fold acc → (acc*31 + md5_60(tok) % P) % P. JVM-side higher-order
    aggregate, no UDF."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("bigint"),
        lambda acc, w: (acc * ROLL_MULT + md5_int60(w) % P) % P,
    )


def rolling_hash_sql(tokens_expr: str) -> str:
    """DuckDB mirror via list_reduce (prepend 0 as the seed acc)."""
    per_tok = f"list_transform({tokens_expr}, w -> {md5_int60_sql('w')} % {P})"
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), {per_tok}), "
            f"(acc, x) -> (acc * {ROLL_MULT} + x) % {P})")
