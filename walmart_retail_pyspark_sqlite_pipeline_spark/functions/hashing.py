"""Deterministic, engine-portable hashing primitives.

Everything here is defined so the SAME value is computable in Spark (built-in
Column expressions — JVM-side, codegen-friendly, no Python UDFs) and in ANSI
SQL (the DuckDB oracle). That rules out engine-native hashes (Spark
``xxhash64`` ≠ DuckDB ``hash``), so we use a classic 31-polynomial rolling
hash mod a Mersenne prime — collision quality is fine for shingling/minhash
demo purposes, and every intermediate stays < 2^52 so 64-bit signed math never
overflows in either engine.

At scale: these are per-row projections (no shuffle); the fold over
characters is executor-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — keeps acc*31+255 < 2^36, and a*h+b < 2^52.
MERSENNE_P = 2147483647

#: (a, b) parameters for the minhash permutation family h_j(x) = (a*x+b) % P.
#: Small odd multipliers keep a*x well inside int64.
MINHASH_PERMS: tuple[tuple[int, int], ...] = (
    (735632797, 1234567),
    (471219107, 7654321),
    (383845423, 2468013),
    (259336153, 8642097),
    (149774591, 1357911),
    (971902247, 9753197),
    (862648679, 3141592),
    (655360001, 2718281),
)

#: Sign-LSH hyperplanes for 64-dim embeddings: integer components in
#: [-10, 10] from a fixed affine-mod formula, so both engines can inline the
#: exact same literals (floating hyperplanes would risk sign flips from ulp
#: differences).
LSH_PLANES = 8
LSH_DIM = 64


def lsh_plane_component(j: int, d: int) -> int:
    return ((j * 97 + d * 31) % 21) - 10


def poly_hash(col: Column) -> Column:
    """31-polynomial rolling hash of a string column, mod 2^31-1.

    TOTAL function: NULL hashes like the empty string (0). Without the
    coalesce the engines split on NULL text — Spark's aggregate over a
    NULL array is NULL (and a NULL bucket falls through every split
    CASE arm to 'test'), while the DuckDB twin's list_prepend(0, NULL)
    reduces to 0 and lands in 'train' — found by the edge-sf sweep on
    corpus_split_train_val_test / text_fingerprint.

    Spark side of the pair; SQL twin in :func:`poly_hash_sql`.
    """
    return F.aggregate(
        F.split(F.coalesce(col, F.lit("")), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(MERSENNE_P),
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB SQL computing exactly :func:`poly_hash` for ``expr``."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(COALESCE({expr}, ''), ''), "
        "c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {MERSENNE_P})"
    )


def hash_uniform(col: Column, m: int) -> Column:
    """Deterministic uniform u ∈ (0,1) from a string column's content hash:
    ``(poly_hash(col) % m + 0.5) / m``. The reproducible "RNG" behind the
    weighted samplers — same doc content → same u on every run, engine,
    and cluster layout. SQL twin: :func:`hash_uniform_sql`."""
    return ((poly_hash(col) % m).cast("double") + F.lit(0.5)) / F.lit(float(m))


def hash_uniform_sql(expr: str, m: int) -> str:
    """DuckDB twin of :func:`hash_uniform`."""
    return f"(CAST(({poly_hash_sql(expr)}) % {m} AS DOUBLE) + 0.5) / {float(m)}"


def minhash_value(hash_col: Column, perm: tuple[int, int]) -> Column:
    a, b = perm
    return (hash_col * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_value_sql(hash_expr: str, perm: tuple[int, int]) -> str:
    a, b = perm
    return f"(({hash_expr}) * {a} + {b}) % {MERSENNE_P}"
