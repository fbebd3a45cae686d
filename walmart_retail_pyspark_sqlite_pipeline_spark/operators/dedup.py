"""Reusable near-duplicate detection API over ANY DataFrame.

The registry queries in ``plans/llm.py`` exercise these operators against
the driver's ``documents`` test table; this module is the library surface
a user points at their own corpus:

    from walmart_retail_pyspark_sqlite_pipeline_spark.operators.dedup import near_dup_pairs
    pairs = near_dup_pairs(my_docs, id_col="id", text_col="body")

Stage decomposition (each stage is separately reusable — e.g. persist the
shingle index or the signature table between nightly runs):

1. :func:`shingle_index` — distinct ``(id, shingle, hash)`` rows; ONE
   corpus tokenize+explode pass. At 100 TB, persist this bucketed by
   shingle.
2. :func:`minhash_signatures` — k min-hash values per doc: one groupBy
   with map-side partial ``min`` (tiny shuffle).
3. :func:`lsh_candidate_pairs` — banding: docs sharing any
   ``(band, key)`` become candidates. A groupBy-shaped join, never
   all-pairs.
4. :func:`verify_jaccard` — true shingle-Jaccard for candidates only.

``near_dup_pairs`` composes 1-4. All thresholds/parameters are arguments
with the registry defaults.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing, text

PERMS = hashing.MINHASH_PERMS


def shingle_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct ``(id, t, h)`` shingle rows — the one corpus-wide pass every
    downstream dedup stage shares."""
    # tokens MUST be materialized as a column before word_shingles: the
    # tokens(text) EXPRESSION would be inlined into the per-element
    # shingle lambda (element_at twice per shingle -> O(len^2) tokenizer
    # work per doc; SCALING.md round-10 capture note)
    tk = df.select(
        F.col(id_col), text.tokens(F.col(text_col)).alias("__tok")
    )
    return (
        tk.select(
            F.col(id_col),
            F.explode(text.word_shingles(F.col("__tok"), n)).alias("t"),
        )
        .distinct()
        .withColumn("h", hashing.poly_hash(F.col("t")))
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", perms=PERMS
) -> DataFrame:
    """k min-hash values per id from a :func:`shingle_index` table."""
    return shingles.groupBy(id_col).agg(
        *[
            F.min(hashing.minhash_value(F.col("h"), perms[j])).alias(f"mh{j}")
            for j in range(len(perms))
        ]
    )


def band_keys(
    sig: DataFrame, id_col: str = "doc_id", rows_per_band: int = 2, n_perms: int = len(PERMS)
) -> DataFrame:
    """Explode a signature table into ``(id, band, key)`` LSH band rows."""
    n_bands = n_perms // rows_per_band
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh{rows_per_band * i + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", rows_per_band: int = 2
) -> DataFrame:
    """Distinct candidate pairs ``(id_a, id_b)``, ``id_a < id_b``: docs
    sharing at least one LSH band key."""
    bands = band_keys(sig, id_col, rows_per_band)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def verify_jaccard(
    candidates: DataFrame,
    shingles: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """True shingle-Jaccard for candidate pairs only; keeps pairs at or
    above ``threshold``. Returns ``(id_a, id_b, jaccard)``."""
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n"))
    ua = shingles.select(F.col(id_col).alias("id_a"), "t")
    ub = shingles.select(F.col(id_col).alias("id_b"), "t")
    common = (
        candidates.join(ua, "id_a")
        .join(ub, ["id_b", "t"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    rows_per_band: int = 2,
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end minhash-LSH near-duplicate pairs for any corpus
    DataFrame: shingle → sign → band → verify. The 100 TB-scale dedup
    composition (candidates from a groupBy-shaped band join; only
    candidates pay the verify)."""
    sh = shingle_index(df, id_col, text_col, shingle_n).cache()
    sig = minhash_signatures(sh, id_col)
    cand = lsh_candidate_pairs(sig, id_col, rows_per_band)
    return verify_jaccard(cand, sh, id_col, threshold)
