"""The Arrow/NumPy batched cosine kernel must agree with the pure-expression
implementation (same ranking, values within float tolerance)."""

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.functions import vectors
from walmart_retail_pyspark_sqlite_pipeline_spark.operators.similarity import (
    topk_cosine,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_table


def test_pandas_udf_topk_matches_expression_topk(spark):
    emb = read_table(spark, SF_SMALL, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
        .embedding
    )

    got = topk_cosine(
        emb.filter(F.col("vec_id") != 0), [float(x) for x in qvec], k=10
    ).collect()

    e = emb.select(
        "vec_id", vectors.as_double(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    want = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", vectors.cosine(F.col("v"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(10)
        .collect()
    )

    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    for a, b in zip(got, want):
        assert abs(a.cos - b.cos) < 1e-9
