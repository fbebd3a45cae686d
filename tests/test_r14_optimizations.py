"""Round-14 optimization regression pins.

Each test locks a STRUCTURAL property the round-14 optimization pass
established (OPTIMIZATION_r14.md), so a later refactor cannot silently
reintroduce the pathology. All ceilings are tighten-only: if a further
optimization lowers a count, lower the constant here in the same commit.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_ngram_jaccard_no_shingle_self_join(spark):
    """The round-14 restructure replaced the keyed shingle SELF-JOIN with
    in-array pair combinations over the cap-bounded doc arrays: the cap
    window subtree now appears at most 3x statically (pairs + the two
    size-join branches, all over ONE reused shingle exchange) instead of
    4x, and no join keyed on the shingle column may come back."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        dedup_ngram_jaccard,
    )

    plan = _formatted(spark, dedup_ngram_jaccard(spark, SF_SMALL))
    n_windows = sum(
        1 for ln in plan.splitlines() if ln.strip().startswith("(")
        and ") Window" in ln
    )
    assert n_windows <= 3, f"cap window re-evaluated: {n_windows} Window nodes"
    # join-key detail lines: a resurrected self-join would key on sh#N
    for ln in plan.splitlines():
        if ln.strip().startswith(("Left keys", "Right keys")):
            assert "sh#" not in ln, f"shingle-keyed join reappeared: {ln.strip()}"
    assert "explode" in plan.lower(), "in-array pair generation disappeared"


def test_lsh_pairs_no_trailing_sizes_joins(spark):
    """Doc sizes ride the band explode (one extra agg in the signature
    groupBy); the exporter must not re-join a doc-grain sizes table after
    the verify. Exchange-ref ceiling from plans/r14/*_after.txt."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        dedup_minhash_lsh_pairs,
    )

    # count the FRESH plan: a session-warm shingle cache makes the printed
    # InMemoryRelation innerChildren show the materialized (finalized)
    # subtree, which re-prints its exchange — the ref count would then
    # depend on which tests ran first, not on the plan's structure
    spark.catalog.clearCache()
    plan = _formatted(spark, dedup_minhash_lsh_pairs(spark, SF_SMALL))
    assert plan.count("Exchange") <= 15, (
        f"lsh plan regrew to {plan.count('Exchange')} Exchange refs "
        "(after-state: 10; pre-round: 25)"
    )


def test_shingle_index_no_distinct_exchange(spark):
    """The index build dedups per doc (array_distinct pre-explode); the
    only allowed exchange is the ADAPTIVE under-split repartition guard,
    which is keyed on doc_id — a row-level distinct exchange on
    (doc_id, t) must never come back."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        _doc_shingles,
    )

    # fresh-plan count — see test_lsh_pairs_no_trailing_sizes_joins
    spark.catalog.clearCache()
    df = _doc_shingles(spark, SF_SMALL)
    try:
        plan = _formatted(spark, df)
        assert plan.count("Exchange") <= 2, (
            f"index build regrew to {plan.count('Exchange')} Exchange refs"
        )
        assert "array_distinct" in plan, "per-doc dedup disappeared"
    finally:
        df.unpersist()


def test_q46_recursion_does_not_rescan_orders(spark):
    """The recursive spine starts from driver-collected literal bounds;
    the recursion must not reference any table (the old single-text form
    re-ran the orders MIN/MAX aggregate on every UnionLoop step). The
    final plan may scan orders only for the `monthly` rollup."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.parity import (
        q46_recursive_spine,
    )

    import re

    plan = _formatted(spark, q46_recursive_spine(spark, SF_SMALL))
    # distinct node ids: formatted output mentions each node in the tree
    # AND in the details section
    n_scans = len(set(re.findall(r"\((\d+)\) Scan parquet", plan)))
    assert n_scans <= 1, (
        f"q46 plan scans parquet {n_scans}x — the recursion is "
        "re-reading a table again"
    )


def test_power_iteration_state_is_literal(spark):
    """Each power-iteration step is ONE corpus pass: the final export must
    be built from literal arrays (dim-bounded driver iterate), not from a
    chained 1-row-DataFrame lineage that re-embeds every prior multiply."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        embeddings_top_component,
    )

    plan = _formatted(spark, embeddings_top_component(spark, SF_SMALL))
    assert plan.count("Exchange") <= 2, (
        f"PCA export plan regrew to {plan.count('Exchange')} Exchange refs "
        "(after-state: 2; pre-round: 24)"
    )


def test_fanout_helpers_are_pinned(spark):
    """The two multi-consumer embedding helpers persist their fan-out
    frames (ADVICE-r13-style correctness/cost pins); losing the pin
    silently re-executes the learned-cell chain per consumer branch."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        _ivf_cells,
        _two_level_fine_cells,
    )

    cells = _ivf_cells(spark, SF_SMALL)
    ev = _two_level_fine_cells(spark, SF_SMALL)
    try:
        assert cells.storageLevel.useMemory or cells.storageLevel.useDisk
        assert ev.storageLevel.useMemory or ev.storageLevel.useDisk
    finally:
        cells.unpersist()
        ev.unpersist()
        spark.catalog.clearCache()
