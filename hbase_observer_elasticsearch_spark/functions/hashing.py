"""Engine-portable hashing for dedup sketches (MinHash / SimHash / LSH).

Spark's xxhash64 and DuckDB's hash() are different algorithms, so sketches
built on them could never be oracle-checked.  Instead every hash here is
derived from md5 (identical bytes in both engines): the token code is the
first 8 hex chars parsed as an integer, and the k-th hash function is the
affine map (A_k * code + B_k) mod P over that code.

P = 1e9+7 keeps A*code + B below 2^63 (code < 2^32, A,B < P), so the whole
family runs in exact BIGINT arithmetic on both engines — fully
deterministic, fully portable, and JVM-side (no Python) in Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007

# Affine-family coefficients, frozen (do not reorder: signatures depend on
# them). Generated once from a fixed congruential formula.
N_HASHES = 48  # 16 for MinHash (4 bands × 4 rows) + 32 for SimHash bits
A = [((j + 1) * 2654435761) % P for j in range(N_HASHES)]
B = [((j * j + 12345) * 104729) % P for j in range(N_HASHES)]

MINHASH_K = 16
BANDS = 4
ROWS_PER_BAND = 4
SIMHASH_BITS = 32


def token_code(col: Column) -> Column:
    """Token → uniform 32-bit integer code via md5 prefix (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def sql_token_code(expr: str) -> str:
    return f"CAST(CONCAT('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"


def affine(code: Column, j: int) -> Column:
    return (code * F.lit(A[j]) + F.lit(B[j])) % F.lit(P)


def sql_affine(expr: str, j: int) -> str:
    return f"(({expr} * {A[j]} + {B[j]}) % {P})"
