"""Fleet-wide physical-plan audit: every registry query (exported AND
local) is statically planned and scanned for scale hazards.

This is the systematic form of the per-query plan checks in PLANS.md:
instead of trusting that each new query was hand-audited, the suite fails
if ANY registered plan picks up

- a ``CartesianProduct`` (unbounded cross join — the classic accidental
  O(N^2); broadcast 1-row cross joins plan as BroadcastNestedLoopJoin and
  are allowed only when the build side is a broadcast),
- row-at-a-time Python (``BatchEvalPython`` — the slow path this engine
  bans in relational queries; Arrow surfaces ``ArrowEvalPython`` /
  ``MapInPandas`` / ``PythonMapInArrow`` and UDTFs are whitelisted where
  deliberate),
- a sort-based fallback aggregate where a hash aggregate was expected is
  NOT checked: ``ObjectHashAggregate``/``SortAggregate`` appear legally
  for collect_list/sketches.

Static planning (``df._jdf.queryExecution().sparkPlan()``) never runs a
job, so auditing all ~86 queries costs seconds.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import all_specs

#: queries whose Python boundary is the point (UDTF chunker, Arrow
#: multimodal plumbing) — any OTHER query showing Python in its plan fails.
PYTHON_ALLOWED = {
    "text_chunks",  # Arrow-batched mapInPandas chunker (operators/chunking.py)
    "text_chunks_udtf",  # local-only Python UDTF surface (functions/udtfs.py)
    "multimodal_image_meta",  # Arrow mapInPandas decode stub
    "multimodal_frame_sample",  # Arrow mapInPandas 1->N expansion
    "multimodal_image_resize",  # Arrow mapInPandas resize planning
    "multimodal_image_features",  # Arrow mapInPandas feature vectors
    "multimodal_image_features_vec",  # array-shaped local surface of same
    "multimodal_image_ann",  # Arrow feature pass feeding the cosine top-k
    "multimodal_scene_cut",  # Arrow per-frame byte-energy pass (round 9)
    "multimodal_audio_meta",  # Arrow mapInPandas audio metadata
    "corpus_chunk_dedup",  # Arrow-batched chunker (operators/chunking.py)
}

#: queries that legitimately execute a Structured Streaming job inside the
#: query function; their batch plan is audited via their batch twins.
STREAMING = {
    "stream_event_counts",
    "stream_session_windows",
    "stream_static_enrich",
}


def _specs():
    return [
        (name, spec)
        for name, spec in sorted(all_specs(include_local=True).items())
        if name not in STREAMING
    ]


@pytest.mark.parametrize("name,spec", _specs(), ids=[n for n, _ in _specs()])
def test_plan_has_no_scale_hazards(spark, name, spec):
    df = spec.fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().sparkPlan().toString()

    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"

    if name not in PYTHON_ALLOWED:
        assert "BatchEvalPython" not in plan, f"{name}: row-Python\n{plan}"
        assert "MapInPandas" not in plan and "EvalPythonUDTF" not in plan, (
            f"{name}: unexpected Python boundary\n{plan}"
        )

    # BroadcastNestedLoopJoin is only tolerable when it IS a broadcast —
    # i.e. never as an inner/outer join without a broadcast side (Spark
    # plans non-equi joins this way; all of ours must be broadcast-sized)
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight" in line or "BuildLeft" in line, (
                f"{name}: non-broadcast nested loop\n{line}"
            )


def _exported_specs():
    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )

    _load_all()
    return [
        (name, spec)
        for name, spec in sorted(REGISTRY.items())
        if name not in STREAMING
    ]


@pytest.mark.parametrize(
    "name,spec", _exported_specs(), ids=[n for n, _ in _exported_specs()]
)
def test_exported_schema_is_driver_hashable(spark, name, spec):
    """Every DRIVER-graded query must export only scalar top-level columns.

    The driver's compare sorts a pandas frame by every column and hashes
    the values; an array/map/struct column is unhashable there and the
    grade errors out instead of passing (CORRECTNESS_r07:
    multimodal_image_features, TypeError: unhashable type 'list').
    Complex-shaped surfaces belong in LOCAL_REGISTRY with a COVERED_BY
    annotation pointing at a scalar-shaped twin (VERDICT r7 next-round #5).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = spec.fn(spark, SF_SMALL)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert complex_cols == [], (
        f"{name}: exported query has driver-unhashable top-level columns "
        f"{complex_cols}; explode/flatten them or park this surface under "
        "COVERED_BY with a scalar twin"
    )
