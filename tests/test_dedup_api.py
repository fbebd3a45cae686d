"""The reusable dedup API (operators/dedup.py): works on arbitrary
DataFrames/column names, and is pinned result-equal to the oracle-verified
registry query on the shared test corpus."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    shingle_index,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.sources import read_table


def test_near_dup_pairs_custom_dataframe(spark):
    """Planted near-dups on custom column names are found; unrelated docs
    are not paired."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the green forest tonight"
    )
    docs = spark.createDataFrame(
        [
            Row(id=1, body=base),
            Row(id=2, body=base.replace("green", "dark")),  # near-dup of 1
            Row(id=3, body="completely different text about spark engines "
                           "processing parquet tables at scale every day"),
        ]
    )
    pairs = near_dup_pairs(
        docs, id_col="id", text_col="body", threshold=0.5
    ).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert 0.5 <= pairs[0].jaccard < 1.0


def test_api_matches_registry_query_on_test_corpus(spark):
    """near_dup_pairs == the oracle-verified dedup_minhash_lsh_pairs on the
    documents table (same thresholds), pinning the library API to the
    driver-graded plan."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        MINHASH_VERIFY_THRESHOLD,
        dedup_minhash_lsh_pairs,
    )

    docs = read_table(spark, SF_SMALL, "documents")
    api = (
        near_dup_pairs(docs, threshold=MINHASH_VERIFY_THRESHOLD)
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            "jaccard",
        )
        .orderBy("doc_a", "doc_b")
        .collect()
    )
    # the registry query's contract is partition-LOCAL order only
    # (sortWithinPartitions; the driver/oracle compare is
    # order-insensitive), so compare in a pinned total order — the raw
    # collect() order is partition-layout-dependent and changed when the
    # round-14 adaptive scan repartition landed in _doc_shingles
    reg = sorted(
        dedup_minhash_lsh_pairs(spark, SF_SMALL).collect(),
        key=lambda r: (r.doc_a, r.doc_b),
    )
    assert api == reg
    assert len(reg) > 0


def test_stage_decomposition_shapes(spark):
    docs = read_table(spark, SF_SMALL, "documents")
    sh = shingle_index(docs)
    assert sh.columns == ["doc_id", "t", "h"]
    sig = minhash_signatures(sh)
    assert sig.columns[0] == "doc_id" and len(sig.columns) == 9
    cand = lsh_candidate_pairs(sig)
    assert cand.columns == ["id_a", "id_b"]
    # candidate generation is bounded: far fewer pairs than all-pairs
    n_docs = docs.count()
    assert cand.count() < n_docs * (n_docs - 1) / 20
