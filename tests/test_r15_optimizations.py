"""Round-15 optimization regression pins.

Each test locks a STRUCTURAL property the round-15 optimization pass
established (OPTIMIZATION_r15.md), so a later refactor cannot silently
reintroduce the pathology. All ceilings are tighten-only: if a further
optimization lowers a count, lower the constant here in the same commit.
Plans are counted FRESH (clearCache first): a session-warm cache makes
InMemoryRelation innerChildren print the materialized subtree and the
counts would depend on test order, not structure.
"""

from __future__ import annotations

import re

from tests.conftest import SF_SMALL


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _exchange_nodes(plan: str) -> int:
    """Distinct physical Exchange operators (node-numbered lines), immune
    to InMemoryRelation innerChildren re-prints."""
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def test_substring_ngrams_incremental_hash(spark):
    """13-gram hashes compose incrementally from per-token (h, 31^len)
    pairs: the plan must not rebuild gram STRINGS (concat_ws) and must
    keep the per-doc hash dedup (array_distinct) — the corpus-wide
    post-shuffle distinct must not come back either (node ceiling: the
    under-split guard repartition, the h repartition, the doc rollup)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
        dedup_substring_ngrams,
    )

    spark.catalog.clearCache()
    plan = _formatted(spark, dedup_substring_ngrams(spark, SF_SMALL))
    assert "concat_ws" not in plan, "gram-string materialization came back"
    assert "array_distinct" in plan, "per-doc hash dedup disappeared"
    assert _exchange_nodes(plan) <= 3, (
        f"substring plan regrew to {_exchange_nodes(plan)} Exchange nodes"
    )


def test_approx_distinct_no_pair_grain_hll(spark):
    """The exact branch pre-deduplicates (event_type, user_id) pairs; the
    rsd=0.01 HLL partial (~1.6k packed register columns per row) must
    never again be evaluated at pair grain — only above the distinct,
    at event_type grain."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.sketches import (
        sketch_approx_distinct,
    )

    spark.catalog.clearCache()
    plan = _formatted(spark, sketch_approx_distinct(spark, SF_SMALL))
    # walk the node details: any aggregate keyed on BOTH grouping columns
    # must carry no aggregate functions (it is the dedup, not the sketch)
    blocks = plan.split("\n\n")
    for blk in blocks:
        if re.search(r"^Keys \[2\].*user_id", blk, re.M):
            m = re.search(r"^Functions \[(\d+)\]", blk, re.M)
            if m:
                assert m.group(1) == "0", (
                    "HLL/count partials re-attached to the pair-grain "
                    f"aggregate:\n{blk}"
                )


def test_sketch_rollup_pins(spark):
    """mg/cms/changers derive counters, vocabulary and the exact
    evaluation from ONE pinned per-token count rollup: the exact pass
    must aggregate the rollup's cnt column (partial_sum(cnt...)), never
    re-count the raw token stream, and the exchange-node counts must not
    regrow to the fan-out shapes (mg was 31 nodes pre-round)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.sketches import (
        sketch_cms_heavy_changers,
        sketch_cms_manual,
        sketch_mg_heavyhitters,
    )

    for fn, ceiling in (
        (sketch_mg_heavyhitters, 22),
        (sketch_cms_manual, 8),
        (sketch_cms_heavy_changers, 12),
    ):
        spark.catalog.clearCache()
        plan = _formatted(spark, fn(spark, SF_SMALL))
        assert "partial_sum(cnt" in plan, (
            f"{fn.__name__}: exact pass no longer rides the count rollup"
        )
        assert _exchange_nodes(plan) <= ceiling, (
            f"{fn.__name__} regrew to {_exchange_nodes(plan)} Exchange nodes"
        )


def test_pq_subspace_dists_rides_cached_base(spark):
    """_pq_subspace_dists reads the shared cached vector store: its plan
    must reference _emb_base's InMemoryRelation, not raw embeddings
    parquet scans (two raw scans per PQ query pre-round)."""
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.llm import (
        _pq_subspace_dists,
    )

    spark.catalog.clearCache()
    df = _pq_subspace_dists(spark, SF_SMALL)
    try:
        plan = _formatted(spark, df)
        assert "InMemoryRelation" in plan, (
            "subspace distances no longer read the cached vector store"
        )
        # the only parquet scans allowed are the cache's own innerChildren
        # re-prints; a scan OUTSIDE an InMemoryRelation block would put raw
        # embeddings reads back on the query path — detectable as more
        # scan prints than relation prints
        assert plan.count("Scan parquet") <= plan.count("InMemoryRelation"), (
            "raw embeddings scans reappeared beside the cached base"
        )
    finally:
        spark.catalog.clearCache()


def test_cc_labels_no_convergence_join(spark):
    """_cc_labels detects convergence with a filter-count over the
    checkpointed frame (the _prev column), not a per-round old⨝new
    shuffle join — pin the source shape (the loop body is driver-side,
    so the plan cannot show it)."""
    import inspect

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.corpus import (
        _cc_labels,
    )

    src = inspect.getsource(_cc_labels)
    assert "_prev" in src, "previous-label carry disappeared"
    assert src.count(".join(") == 2, (
        "per-round join count changed: the loop must hold exactly the "
        "neighbor join and the label update join (the old convergence "
        "join made three)"
    )
