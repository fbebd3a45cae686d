"""Query registry: every engine capability as a (Spark plan, oracle SQL) pair.

Each :class:`QuerySpec` carries
- ``fn(spark, sf_dir) -> DataFrame`` — the idiomatic-Spark implementation,
- ``oracle`` — equivalent ANSI SQL DuckDB runs on the same parquet tables
  (``None`` only for genuinely non-SQL-expressible ops → driver falls back
  to a rows-only check),
- ``tags`` — SURVEY.md §2 inventory ids this query exercises,
- ``bench`` — whether bench.py times it as a headline query.

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing). Float aggregates are rounded on both
sides so independent summation orders cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    bench: bool = False
    #: bench timing protocol: True = this query is a consumer of the shared
    #: corpus shingle index and is timed as MARGINAL cost with the index
    #: resident (the index build itself is the corpus_shingle_index bench
    #: line, timed cold) — the way a production dedup suite runs, where the
    #: index is materialized once and every dedup pass reads it.
    warm_index: bool = False
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Oracle-verified locally (tools/oracle_check.py --all + pytest) but not
# exported to the driver: the driver grades at most 50 queries, so strict
# sub-plans (ann_ivf_cells ⊂ ann_ivf_topk, dedup_minhash_signatures ⊂
# dedup_minhash_lsh_pairs) and alternate API surfaces of an already-graded
# capability (q09 DataFrame rollup vs q17 SQL grouping sets, q10 distinct
# set ops vs q28 multiset ops) live here instead.
LOCAL_REGISTRY: dict[str, QuerySpec] = {}

# ---------------------------------------------------------------------------
# Export rotation. The driver grades at most 50 queries per round, so the
# split between REGISTRY (driver-graded) and LOCAL_REGISTRY (locally
# oracle-checked) rotates each round: once a query has two green driver
# rounds it parks and a never-graded query takes the slot. This single set
# IS the rotation — ``register``/``register_local`` below route on
# membership, so the per-module call sites record only the *default* tier
# and never need editing.
#
# Round-5 window (see VERDICT.md r4 "Next round" #1):
# - 9 keepers: first graded green in r4, held for a second green round;
# - 12 bench headliners: every bench.py-timed query stays driver-graded
#   (r4 verdict "What's wrong" #3);
# - 29 first-time rotations: never-graded capabilities (iterative ML ops,
#   exact-k samplers, SQL-surface demos q30/q32–q40, sessionization
#   variants, layout clustering).
#
# Round-6 rotation candidates (never driver-graded, all locally green at
# sf0.01 in both session modes): the round-5 second wave — events_autocorr,
# events_seasonal_naive, events_dwell_time, events_ewma, events_ohlc,
# events_activity_streaks, events_bounce_rate, events_mutual_info,
# events_retention_bitmap, qc_drift_ks, qc_drift_psi, qc_key_skew,
# q42_abc_analysis, q43_elasticity_slope, q44_lateral_topn,
# q45_rank_surface, q46_recursive_spine, q47_ols_normal_eq,
# corpus_triangles, corpus_bloom_contamination, corpus_split_leakage,
# corpus_dup_rate_by_source, text_zipf_slope, text_lang_confusion,
# dedup_winnowing_pairs, ann_pq_topk, ann_pq_recall, sketch_hll_manual,
# stream_dedup_counts, cdc_apply_changes. Swap out the r5 keepers that go
# twice-green and as many q30/q32–q40 one-timers as the 50 budget allows.
EXPORTED_NAMES: frozenset[str] = frozenset(
    {
        # --- keepers: once-green in r4, need a second green ---
        "events_asof_two_stream",
        "events_range_join",
        "dedup_incremental_near_docs",
        "corpus_quality_weighted_sample",
        "ann_knn_join",
        "dedup_cc_clusters",
        "events_gapfill_locf",
        "qc_drift_chi2",
        "events_active_users_7d",
        # --- bench headliners (thrice-green but timed by bench.py) ---
        "q01_pricing_summary",
        "q02_top_customers",
        "q11_event_hourly",
        "q14_curated_wide",
        "events_sessionization",
        "corpus_prep_pipeline",
        "q03_sales_by_nation_year",
        "q22_revenue_by_region",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh_pairs",
        "ann_topk_cosine",
        "corpus_shingle_index",
        # --- first-time rotations (never driver-graded before r5) ---
        "embeddings_kmeans",
        "corpus_pagerank",
        "corpus_canonical_docs",
        "events_anomaly_zscore",
        "corpus_weighted_sample_topk",
        "corpus_balanced_sample_topk",
        "q41_rfm_segments",
        "events_session_native",
        "events_session_concurrency",
        "embeddings_top_component",
        "q30_unpivot_metrics",
        "q32_window_depth",
        "q33_variant_props",
        "q34_correlated_scalar",
        "q35_market_share",
        "q36_pipe_syntax",
        "q37_histogram",
        "q38_nullsafe_join",
        "q39_decimal_money",
        "q40_map_type",
        "ann_int8_topk",
        "events_range_rolling",
        "corpus_chunk_dedup",
        "entity_match_customers",
        "text_tfidf_topterms",
        "text_repetition",
        "corpus_source_mix",
        "text_sentiment",
        "layout_zorder_clustering",
    }
)


def _route(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY or spec.name in LOCAL_REGISTRY:
        raise ValueError(f"duplicate query name {spec.name!r}")
    if spec.name in EXPORTED_NAMES:
        REGISTRY[spec.name] = spec
    else:
        LOCAL_REGISTRY[spec.name] = spec
    return spec


def register(spec: QuerySpec) -> QuerySpec:
    return _route(spec)


def register_local(spec: QuerySpec) -> QuerySpec:
    return _route(spec)


def _load_all() -> None:
    # Import for side effects: each module registers its QuerySpecs.
    # streams registers before llm so the event-stream queries sit inside the
    # driver's checked window (round 1: the driver graded the first 50 names
    # and the 4 stream queries, registered last, got no CORRECTNESS row).
    from . import parity  # noqa: F401
    from . import streams  # noqa: F401
    from . import llm  # noqa: F401
    from . import corpus  # noqa: F401
    from . import timeseries  # noqa: F401
    from . import sketches  # noqa: F401
    from . import quality_suite  # noqa: F401
    from . import scd_history  # noqa: F401
    from . import cohorts  # noqa: F401
    from . import retail  # noqa: F401

    missing = EXPORTED_NAMES - REGISTRY.keys()
    if missing:  # a typo in the rotation list would silently shrink the window
        raise RuntimeError(f"EXPORTED_NAMES entries never registered: {sorted(missing)}")


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def bench_specs() -> list[QuerySpec]:
    # bench covers the local-only registry too: queries kept out of the
    # driver's 50-query correctness window are still part of the engine's
    # performance surface (e.g. the corpus_shingle_index build line).
    _load_all()
    out = [s for s in REGISTRY.values() if s.bench]
    out.extend(s for s in LOCAL_REGISTRY.values() if s.bench)
    return out


def all_specs(include_local: bool = True) -> dict[str, QuerySpec]:
    _load_all()
    out = dict(REGISTRY)
    if include_local:
        out.update(LOCAL_REGISTRY)
    return out
