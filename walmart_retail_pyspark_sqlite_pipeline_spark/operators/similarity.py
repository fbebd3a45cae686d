"""Arrow-batched similarity kernels — the vectorized-Python alternative to
the pure-expression math in ``functions/vectors.py``.

When to use which:
- ``functions.vectors`` (zip_with/aggregate expressions): JVM-side, zero
  Python, ideal when the vector op is embedded in a larger relational plan
  and must stay oracle-portable.
- this module (pandas_udf / mapInPandas + NumPy): 10-100× faster than
  row-at-a-time Python and typically faster than expression folds for wide
  vectors, because the whole batch does one BLAS-backed matmul. Use for
  heavy ANN scoring stages. Data crosses the JVM↔Python boundary as Arrow
  batches (bounded by spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf


def cosine_to_query_udf(query_vec: list[float]):
    """Returns a pandas UDF computing cosine(embedding, query_vec) for a
    whole Arrow batch with one NumPy matmul. The query vector is closed
    over (serialized once per task, not per row)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def _cos(col: pd.Series) -> pd.Series:
        m = np.stack(col.to_numpy())  # (batch, dim) float32 -> float64 below
        m = m.astype(np.float64, copy=False)
        dots = m @ q
        norms = np.linalg.norm(m, axis=1)
        return pd.Series(dots / (norms * qn))

    return _cos


def topk_cosine(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine using the batched NumPy kernel.
    ``TakeOrderedAndProject`` keeps only k rows per partition, so the
    driver never sees more than k * n_partitions candidates."""
    cos = cosine_to_query_udf(query_vec)
    return (
        embeddings.select(id_col, cos(F.col(vec_col)).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def topk_merge(
    prior_topk: DataFrame,
    new_scored: DataFrame,
    k: int = 10,
    score_col: str = "cos",
    id_col: str = "vec_id",
) -> DataFrame:
    """Incremental top-k maintenance (the interactive-session pattern:
    keep a materialized top-k, fold in each new batch without rescanning
    the corpus).

    Correct because top-k is monotone under union:
    ``topk(A ∪ B) = topk(topk(A) ∪ topk(B))`` — so the update reads k
    prior rows plus the new batch's scores, never the old corpus. At
    scale the prior top-k is a k-row table (driver-cached or broadcast)
    and each nightly batch pays only its own scoring pass; equivalence to
    the full recompute is proven in ``tests/test_similarity.py``.
    """
    return (
        prior_topk.unionByName(new_scored)
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .limit(k)
    )
