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
# Export rotation + convergence tiers. The driver grades at most 50 queries
# per round, so the split between REGISTRY (driver-graded) and
# LOCAL_REGISTRY (locally oracle-checked) rotates each round. This single
# set IS the rotation — ``register``/``register_local`` below route on
# membership, so the per-module call sites record only the *default* tier
# and never need editing.
#
# Convergence policy (round 6, VERDICT r5 "Next round" #3): rotation alone
# stopped converging once the registry outgrew 3x the window, so every
# registry query now sits in exactly ONE of four tiers, and
# tests/test_rotation.py enforces the partition against the accumulated
# CORRECTNESS_r*.json evidence:
#   1. exported        — in EXPORTED_NAMES, graded by the driver this round;
#   2. parked-green    — >=1 green driver round in some CORRECTNESS_r*.json,
#                        currently local (driver evidence already exists);
#   3. covered-by      — permanently local: a strict sub-plan or alternate
#                        API surface of a query with driver evidence, listed
#                        in COVERED_BY below and never counted against the
#                        grading backlog;
#   4. queued          — never driver-graded, genuinely distinct capability,
#                        listed in GRADE_QUEUE with the round it rotates in.
#
# Round-7 window (VERDICT r6 "Next round" #1 + ADVICE r6 medium item):
# - 12 bench headliners: every bench.py-timed query stays driver-graded;
# - 22 queue drains: the entire round-6 GRADE_QUEUE rotates in — after this
#   round every registry query has >=1 driver CORRECTNESS row and the
#   rotation ledger is fully converged;
# - 1 re-grade: events_anomaly_zscore — rewritten in round 6 (BIGINT →
#   DECIMAL moments, new plan AND new oracle SQL) while parked on its r5
#   green row, which graded the OLD implementation. The GRADED_HASHES.json
#   ledger (tools/update_graded_hashes.py + tests/test_rotation.py) now
#   makes this re-grade-on-rewrite mandatory instead of ad hoc;
# - 15 evidence-deepeners: once-green parked queries rotate back in so the
#   long tail accumulates a second independent driver round.
# The 38 round-6 first-timers park (driver evidence exists).
EXPORTED_NAMES: frozenset[str] = frozenset(
    {
        # --- bench headliners (timed by bench.py every round) ---
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
        # --- re-grade: rewritten r6 while parked on an r5 green row ---
        "events_anomaly_zscore",
        # --- queue drains (the whole round-6 GRADE_QUEUE, never graded) ---
        "ann_hamming_topk",
        "ann_rrf_fusion",
        "basket_part_pairs",
        "corpus_encoding_audit",
        "corpus_importance_weights",
        "corpus_label_propagation",
        "dedup_substring_ngrams",
        "events_mad_anomaly",
        "events_new_vs_returning",
        "events_revenue_concentration",
        "events_top_paths",
        "events_wow_change",
        "multimodal_audio_meta",
        "multimodal_image_features",
        "multimodal_image_resize",
        "sketch_cms_manual",
        "sketch_quantile_manual",
        "text_bpe_merge_candidates",
        "text_bpe_train",
        "text_char_entropy",
        "text_lm_score",
        "text_readability",
        # --- evidence-deepeners (once-green parked, second driver round) ---
        "ann_int8_topk",
        "corpus_pagerank",
        "corpus_canonical_docs",
        "embeddings_kmeans",
        "entity_match_customers",
        "events_session_native",
        "layout_zorder_clustering",
        "q32_window_depth",
        "q33_variant_props",
        "q35_market_share",
        "q36_pipe_syntax",
        "q40_map_type",
        "q41_rfm_segments",
        "text_tfidf_topterms",
        "text_sentiment",
    }
)

# Tier 3 — permanently local: strict sub-plans or alternate API surfaces of
# a query that already has driver evidence. Key = the local query, value =
# the driver-graded query whose green row covers the capability. These are
# still oracle-checked locally every round (tools/oracle_check.py) but are
# no longer part of the grading backlog.
COVERED_BY: dict[str, str] = {
    # threshold sweep over the same shingle-Jaccard pair scores the graded
    # query verifies at one cutoff
    "dedup_threshold_curve": "dedup_ngram_jaccard",
    # same exact hash-groupBy dedup, after text canonicalization
    "dedup_normalized_exact": "dedup_exact_hist",
    # estimator-error diagnostic over the SAME signature matrix and LSH
    # candidate set the graded query produces
    "dedup_minhash_est_error": "dedup_minhash_lsh_pairs",
    # Python-UDTF surface of the same fixed-width chunker whose Arrow
    # mapInPandas surface is graded
    "text_chunks_udtf": "text_chunks",
    # strict sub-plans noted since round 4 (both sides of each pair now
    # have driver evidence, kept for documentation)
    "ann_ivf_cells": "ann_ivf_topk",
    "dedup_minhash_signatures": "dedup_minhash_lsh_pairs",
    # packed-BIGINT storage encoding of the SAME sign-quantized distances
    # the graded query computes unpacked — every exported row carries both
    # distances and an agree flag, so the coverage is self-evidencing
    "ann_hamming_packed": "ann_hamming_topk",
}

# Tier 4 — the must-grade queue: never driver-graded, genuinely distinct
# capabilities, with the round each rotates into EXPORTED_NAMES. The queue
# must shrink every round; tests/test_rotation.py fails if a registry query
# is in no tier. Round 7 drained the whole round-6 queue (all 22 entries
# rotated into EXPORTED_NAMES above) — the queue is empty; new queries
# registered this round must either take an export slot, a COVERED_BY
# annotation, or a GRADE_QUEUE entry targeting round 8.
GRADE_QUEUE: dict[str, int] = {
    # round-7 additions (registered this round, graded next)
    "sketch_kmv_intersection": 8,
    "dedup_semantic_clusters": 8,
    "events_cusum_changepoint": 8,
    "ann_mips_topk": 8,
    "corpus_gopher_rules": 8,
    "sketch_mg_heavyhitters": 8,
    "corpus_temperature_mix": 8,
    "corpus_novelty_curve": 8,
    "sketch_ams_f2": 8,
    "qc_drift_wasserstein": 8,
    "corpus_clustering_coeff": 8,
    "events_seasonal_decompose": 8,
}


def spec_hash(spec: QuerySpec) -> str:
    """Content hash of what a driver grade actually graded: the spec's own
    plan-builder source plus its oracle SQL.

    Used by the re-grade-on-rewrite policy (ADVICE r6): a parked-green query
    keeps its driver evidence only while this hash matches the one recorded
    in ``GRADED_HASHES.json`` at grading time; a rewrite flips the hash and
    ``tests/test_rotation.py`` forces the query back into the export window.
    Scope note: the hash covers the registered ``fn`` and ``oracle`` — a
    rewrite buried in a helper the fn calls is caught only if the fn body or
    the oracle SQL changes too, which held for every rewrite so far (the
    r6 zscore rewrite changed both).
    """
    import hashlib
    import inspect
    import textwrap

    try:
        src = textwrap.dedent(inspect.getsource(spec.fn))
    except (OSError, TypeError):  # builtins / C-level callables: oracle-only
        src = f"<unreadable:{getattr(spec.fn, '__qualname__', repr(spec.fn))}>"
    payload = src + "\x00" + (spec.oracle or "")
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


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
