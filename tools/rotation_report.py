"""Write ROTATION.md: the grading-convergence ledger.

Every registry query lands in exactly one tier (the partition
tests/test_rotation.py enforces):

- exported      — in this round's 50-slot driver window
- parked-green  — >=1 fully-green driver row in CORRECTNESS_r*.json, local
- covered-by    — permanently local (strict sub-plan / alternate surface),
                  annotated with the driver-evidenced query covering it
- queued        — never driver-graded, scheduled for a target round

Usage: python tools/rotation_report.py
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from walmart_retail_pyspark_sqlite_pipeline_spark.plans.evidence import (  # noqa: E402
    green_rounds,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (  # noqa: E402
    COVERED_BY,
    EXPORTED_NAMES,
    GRADE_QUEUE,
    all_specs,
)


README_BEGIN = "<!-- rotation-counts:begin -->"
README_END = "<!-- rotation-counts:end -->"

#: Written plan for the NEXT round's window, rendered into ROTATION.md so
#: it survives regeneration (VERDICT r9 #4 asked for the schedule to live
#: here). Rewrite this constant when the plan changes.
NEXT_ROUND_PLAN = """\
## Round-15 window plan (written round 14)

Round 14 exported the full 8-entry queue (the round-12 overflow entry
plus all seven round-13 operator additions) — the never-graded set is
EMPTY for the first time — plus one re-grade (q41_rfm_segments, whose
closure drifted when operators/ranking.py gained its correctness
cache() pin) and 27 deepening slots (the complete r6/r7/r8 single-green
cohorts and 3 of 4 r9 entries). The round-15 window:

1. **14 bench headliners** (standing bench.py lines, unchanged).
2. **Queue drains**: any round-14 operator additions land in
   GRADE_QUEUE with target round 15 and export first.
3. **Re-grades**: any query whose spec hash drifts from its
   GRADED_HASHES entry during round-14 work re-enters the window
   (events_attribution_markov and q41_rfm_segments took this path in
   round 14).
4. **Deepening slots, oldest single-green parked first**, with the
   remainder of the window: stream_static_enrich (the r9 overflow),
   then the r10 cohort (ann_rerank_batch, multimodal_scene_cut,
   qc_l_diversity), the r11 cohort (corpus_curriculum_phases,
   corpus_token_budget_waterfill, dedup_minhash_b_bit,
   multimodal_keyframe_select, text_bm25_prf, text_lm_interpolated),
   the r12 cohort (corpus_quality_calibration,
   corpus_soft_dedup_weights, embeddings_dim_clip_bounds,
   multimodal_audio_vad_segments, sketch_cms_heavy_changers,
   text_lm_heldout_perplexity), then the r13 first-grade cohort —
   until the window fills. This continues the single-green drawdown
   VERDICT r12 #5 asked for.

Standing gates carry: fact/documents/payload scan floors, the
unpartitioned-window whitelist (exact counts, tighten-only), the
global-sort and BatchEvalPython bans. Round 14 demoted the two
measured n^2/k fixed-block embedding pair surfaces
(dedup_embedding_cosine 40.4x/decade, dedup_embedding_ivf_pairs
14.3x/decade) to COVERED_BY dedup_embedding_pairs_scaled (growing
learned cells, 3.51x/decade at 200k vectors), so no future rotation
can re-export a fixed-block pair plan as a production surface.
"""

def driver_greens() -> dict[str, int]:
    return {name: len(rounds) for name, rounds in green_rounds(REPO).items()}


def tier_partition(specs, greens) -> dict[str, list[str]]:
    """The live five-way tier partition, sorted name lists. The ONLY
    implementation of the split — both ROTATION.md (main) and the README
    counts block (tier_counts) render from it, so they cannot diverge
    (round-9 review finding: two hand-kept copies of the same predicate
    chain are a silent-disagreement machine)."""
    exported = sorted(n for n in specs if n in EXPORTED_NAMES)
    requeued = sorted(
        n
        for n in specs
        if n in GRADE_QUEUE and n not in EXPORTED_NAMES and greens.get(n, 0) >= 1
    )
    parked = sorted(
        n
        for n in specs
        if n not in EXPORTED_NAMES
        and greens.get(n, 0) >= 1
        and n not in COVERED_BY
        and n not in GRADE_QUEUE
    )
    covered = sorted(
        n for n in specs if n in COVERED_BY and n not in EXPORTED_NAMES
    )
    queued = sorted(
        n
        for n in specs
        if n in GRADE_QUEUE and n not in EXPORTED_NAMES and greens.get(n, 0) == 0
    )
    untiered = sorted(
        set(specs)
        - (set(exported) | set(parked) | set(covered) | set(queued) | set(requeued))
    )
    return {
        "exported": exported,
        "parked": parked,
        "covered": covered,
        "queued": queued,
        "requeued": requeued,
        "untiered": untiered,
    }


def tier_counts(specs, greens) -> dict[str, int]:
    """Partition sizes, derived from :func:`tier_partition`."""
    tiers = tier_partition(specs, greens)
    return {"registry": len(specs), **{k: len(v) for k, v in tiers.items()}}


def readme_counts_block(counts: dict[str, int]) -> str:
    """The README 'Grading convergence' bullet, rendered from the LIVE
    registry. VERDICT r8 #2: hand-written registry counts in README went
    stale three rounds running (r6, r7, r8) — this block is now generated
    between README markers by this tool and pinned to the registry by
    tests/test_rotation.py::test_readme_counts_match_live_registry."""
    return (
        f"{README_BEGIN}\n"
        "- **Grading convergence** (`ROTATION.md`, generated by\n"
        "  `tools/rotation_report.py`, which also regenerates this bullet;\n"
        "  invariants enforced by `tests/test_rotation.py`): the registry\n"
        f"  holds **{counts['registry']} queries** — {counts['exported']}\n"
        f"  exported to the driver this round, {counts['parked']} parked\n"
        f"  with >=1 green driver round, {counts['covered']} covered-by a\n"
        f"  driver-evidenced query, {counts['queued']} queued never-graded,\n"
        f"  {counts['requeued']} re-grade-queued (green but hash-drifted).\n"
        f"  Untiered: {counts['untiered']} (a nonzero value here fails\n"
        "  `test_rotation.py`).\n"
        f"{README_END}"
    )


def patch_readme(counts: dict[str, int]) -> bool:
    """Replace the marker-delimited counts block in README.md. Returns
    True if README changed. Raises if the markers are missing — the
    block must never silently fall back to hand-maintained text."""
    readme = REPO / "README.md"
    text = readme.read_text()
    begin = text.index(README_BEGIN)
    end = text.index(README_END) + len(README_END)
    new = text[:begin] + readme_counts_block(counts) + text[end:]
    if new != text:
        readme.write_text(new)
        return True
    return False


def main() -> None:
    specs = all_specs(include_local=True)
    greens = driver_greens()
    n_rounds = len(glob.glob(str(REPO / "CORRECTNESS_r*.json")))

    tiers = tier_partition(specs, greens)
    exported = tiers["exported"]
    parked = tiers["parked"]
    covered = tiers["covered"]
    queued = tiers["queued"]
    requeued = tiers["requeued"]
    untiered = tiers["untiered"]

    lines = [
        "# ROTATION — grading-convergence ledger",
        "",
        f"Generated by tools/rotation_report.py after round {n_rounds}.",
        f"Registry: {len(specs)} queries. Window: {len(exported)} exported.",
        f"Parked with driver evidence: {len(parked)}. Covered-by: {len(covered)}.",
        f"Queue (never graded, scheduled): {len(queued)}. "
        f"Re-grade queue (green but hash-drifted): {len(requeued)}. "
        f"Untiered: {len(untiered)}.",
        "",
        "## Exported this round (driver grades these)",
        "",
        "| query | prior green rounds |",
        "|---|---|",
    ]
    lines += [f"| {n} | {greens.get(n, 0)} |" for n in exported]
    lines += [
        "",
        "## Parked (>=1 green driver row; local, still oracle-checked every round)",
        "",
        "| query | green rounds |",
        "|---|---|",
    ]
    lines += [f"| {n} | {greens[n]} |" for n in parked]
    lines += [
        "",
        "## Covered-by (permanently local sub-plans / alternate surfaces)",
        "",
        "| query | covered by | coverer's green rounds |",
        "|---|---|---|",
    ]
    lines += [
        f"| {n} | {COVERED_BY[n]} | {greens.get(COVERED_BY[n], 0)} |" for n in covered
    ]
    lines += [
        "",
        "## Must-grade queue (rotates into the window at the target round)",
        "",
        "| query | target round |",
        "|---|---|",
    ]
    lines += [f"| {n} | {GRADE_QUEUE[n]} |" for n in queued]
    if requeued:
        lines += [
            "",
            "## Re-grade queue (driver-green, source rewritten since the "
            "grade; evidence stale until re-graded)",
            "",
            "| query | target round |",
            "|---|---|",
        ]
        lines += [f"| {n} | {GRADE_QUEUE[n]} |" for n in requeued]
    if untiered:
        lines += ["", "## UNTIERED (bug — test_rotation.py should have failed)", ""]
        lines += [f"- {n}" for n in untiered]
    lines += ["", NEXT_ROUND_PLAN.rstrip()]
    lines.append("")

    out = REPO / "ROTATION.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}: {len(exported)} exported / {len(parked)} parked / "
          f"{len(covered)} covered / {len(queued)} queued / {len(untiered)} untiered")
    if patch_readme(tier_counts(specs, greens)):
        print("patched README.md rotation-counts block")


if __name__ == "__main__":
    main()
