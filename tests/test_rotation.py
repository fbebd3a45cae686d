"""Rotation-convergence invariants (VERDICT r5 "Next round" #3).

Every registry query must sit in exactly one tier:

1. **exported** — in ``EXPORTED_NAMES``, graded by the driver this round;
2. **parked-green** — at least one green driver round recorded in an
   accumulated ``CORRECTNESS_r*.json``, currently local;
3. **covered-by** — permanently local strict sub-plan / alternate surface,
   annotated in ``COVERED_BY`` with the driver-evidenced query covering it;
4. **queued** — never driver-graded, listed in ``GRADE_QUEUE`` with a
   target round.

If a new query is registered without a tier (no export slot, no queue
entry, no covered-by annotation) this suite fails — that is the mechanism
that keeps the grading backlog shrinking instead of silently growing.
"""

from __future__ import annotations

import json
from pathlib import Path

from walmart_retail_pyspark_sqlite_pipeline_spark.plans.evidence import (
    green_rounds,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (
    COVERED_BY,
    EXPORTED_NAMES,
    GRADE_QUEUE,
    all_specs,
    spec_hash,
)

REPO = Path(__file__).resolve().parents[1]


def _driver_green_names() -> set[str]:
    """Names with >=1 fully-green driver row across all recorded rounds."""
    return set(green_rounds(REPO))


def test_every_registry_query_has_exactly_one_tier():
    specs = set(all_specs(include_local=True))
    green = _driver_green_names()
    untiered = sorted(
        n
        for n in specs
        if n not in EXPORTED_NAMES
        and n not in green
        and n not in COVERED_BY
        and n not in GRADE_QUEUE
    )
    assert untiered == [], (
        "registry queries in NO tier (not exported, never driver-green, "
        f"not covered-by, not queued): {untiered} — add a GRADE_QUEUE entry "
        "with a target round or a COVERED_BY annotation"
    )


def test_tiers_are_disjoint_from_the_export_window():
    overlap_q = sorted(set(GRADE_QUEUE) & EXPORTED_NAMES)
    assert overlap_q == [], f"queued AND exported: {overlap_q}"
    overlap_c = sorted(set(COVERED_BY) & EXPORTED_NAMES)
    assert overlap_c == [], f"covered-by AND exported: {overlap_c}"
    both = sorted(set(COVERED_BY) & set(GRADE_QUEUE))
    assert both == [], f"covered-by AND queued: {both}"


def test_covered_by_targets_have_driver_evidence():
    specs = set(all_specs(include_local=True))
    green = _driver_green_names()
    for local, target in COVERED_BY.items():
        assert local in specs, f"COVERED_BY key {local!r} not registered"
        assert target in specs, f"COVERED_BY target {target!r} not registered"
        assert target in green or target in EXPORTED_NAMES, (
            f"{local!r} claims coverage by {target!r}, which has no green "
            "driver round and is not in the current window"
        )


def test_queue_names_are_registered_and_targets_sane():
    specs = set(all_specs(include_local=True))
    for name, rnd in GRADE_QUEUE.items():
        assert name in specs, f"GRADE_QUEUE key {name!r} not registered"
        assert isinstance(rnd, int) and rnd >= 6, (name, rnd)


def test_queue_only_holds_never_graded_or_drifted_queries():
    """A queue entry represents real grading backlog. For a never-graded
    query that's automatic. A driver-GREEN query may hold a queue entry in
    exactly one state: its current spec_hash no longer matches the hash
    its evidence graded (a rewrite awaiting re-grade that did not fit the
    current 50-slot window — the round-8 edge-hardening case). A green
    query whose hash still matches would double-count the backlog."""
    green = _driver_green_names()
    overlap = sorted(set(GRADE_QUEUE) & green)
    if not overlap:
        return
    ledger = json.load(open(REPO / "GRADED_HASHES.json"))["entries"]
    specs = all_specs(include_local=True)
    unstamped = [n for n in overlap if n not in ledger]
    assert unstamped == [], (
        f"queued driver-green queries with NO ledger entry: {unstamped} — "
        "run tools/update_graded_hashes.py first; without a stamped hash "
        "the 'awaiting re-grade' state can't be distinguished from a "
        "double-counting stale entry"
    )
    stale = [n for n in overlap if spec_hash(specs[n]) == ledger[n]["hash"]]
    assert stale == [], (
        f"queued queries already driver-green with UNCHANGED source: {stale}"
        " — their evidence is current, the queue entry double-counts"
    )


def test_parked_queries_unchanged_since_their_driver_grade():
    """Re-grade-on-rewrite (ADVICE r6, medium): driver evidence is evidence
    about a SPECIFIC implementation. A parked-green query may stay parked
    only while its current spec_hash (fn source + oracle SQL) matches the
    hash recorded in GRADED_HASHES.json at grading time. Rewriting a parked
    query without re-exporting it (the r6 events_anomaly_zscore case) fails
    here — the fix is an export slot or a GRADE_QUEUE entry, never editing
    the ledger by hand (tools/update_graded_hashes.py restamps it only when
    a new green driver row lands)."""
    ledger_path = REPO / "GRADED_HASHES.json"
    assert ledger_path.exists(), (
        "GRADED_HASHES.json missing — run tools/update_graded_hashes.py "
        "after the latest CORRECTNESS_r*.json lands"
    )
    ledger = json.load(open(ledger_path))["entries"]
    specs = all_specs(include_local=True)
    green = _driver_green_names()
    problems = []
    for name, spec in specs.items():
        if name in EXPORTED_NAMES or name in COVERED_BY or name in GRADE_QUEUE:
            continue  # being (re)graded, or permanently-local by policy
        if name not in green:
            continue  # untiered — the partition test reports it
        if name not in ledger:
            problems.append(
                f"{name}: parked-green but not in GRADED_HASHES.json — run "
                "tools/update_graded_hashes.py at round start (BEFORE editing "
                "any query) so the new green rows are stamped with the source "
                "the driver graded"
            )
        elif spec_hash(spec) != ledger[name]["hash"]:
            problems.append(
                f"{name}: source/oracle rewritten since its round-"
                f"{ledger[name]['round']} driver grade — add it to "
                "EXPORTED_NAMES or GRADE_QUEUE for a re-grade"
            )
    assert problems == [], "\n".join(problems)


def test_ledger_stamping_rules():
    """Unit test of the GRADED_HASHES stamping logic (pure function):
    latest-round greens restamp, older known entries persist, older
    unknown parked queries seed with a flag, older unknown EXPORTED
    queries stay absent (the events_anomaly_zscore falsification case),
    and de-registered queries drop."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "update_graded_hashes", REPO / "tools" / "update_graded_hashes.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    greens = {
        "fresh": 7,          # green this round -> restamp
        "stable": 5,         # old green, already in ledger -> keep old hash
        "seedme": 4,         # old green, parked, never stamped -> seed
        "rewritten": 5,      # old green, EXPORTED for re-grade -> no entry
        "gone": 3,           # de-registered -> dropped
    }
    current = {
        "fresh": "H_fresh_now",
        "stable": "H_stable_now",
        "seedme": "H_seed_now",
        "rewritten": "H_rw_now",
        # "gone" absent: not registered
    }
    old = {"stable": {"hash": "H_stable_graded", "round": 5}}
    out = mod.build_entries(
        greens, 7, current, frozenset({"rewritten"}), old
    )
    assert out == {
        "fresh": {"hash": "H_fresh_now", "round": 7},
        "stable": {"hash": "H_stable_graded", "round": 5},
        "seedme": {"hash": "H_seed_now", "round": 4, "seeded_at_round": 8},
    }


# module-level constants for test_closure_payload_captures_container_constants
_CLOSURE_LIST = ["a", "b"]
_CLOSURE_DICT = {"k": 1, "j": 2}
_CLOSURE_SET = {3, 1, 2}


def _uses_container_constants():
    return _CLOSURE_LIST, _CLOSURE_DICT, _CLOSURE_SET


def test_closure_payload_captures_container_constants(monkeypatch):
    """Round-8 review finding: the original scalar-only constant capture
    skipped list/dict/set module constants (CURATED_COLUMNS, TRAIN_RENAME,
    ...), so editing one changed query behavior without flipping the
    spec_hash — the exact under-capture the closure policy exists to close.
    Container constants must appear in the payload with a canonical repr
    (dict key-sorted, set order-canonical), and editing one must change it.
    """
    import sys as _sys

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (
        _closure_payload,
    )

    p1 = _closure_payload(_uses_container_constants)
    assert "<const _CLOSURE_LIST=['a', 'b']>" in p1
    assert "<const _CLOSURE_DICT={'j': 2, 'k': 1}>" in p1  # key-sorted
    assert "<const _CLOSURE_SET={1, 2, 3}>" in p1  # iteration-order-free
    monkeypatch.setattr(
        _sys.modules[__name__], "_CLOSURE_LIST", ["a", "b", "c"]
    )
    assert _closure_payload(_uses_container_constants) != p1


def test_readme_counts_match_live_registry():
    """VERDICT r8 #2: hand-written registry counts in README went stale
    three rounds running. The 'Grading convergence' bullet is now
    generated between markers by tools/rotation_report.py; this test
    fails whenever the committed README block differs from what the live
    registry would render — i.e. whenever a registry edit lands without
    re-running the tool."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "rotation_report", REPO / "tools" / "rotation_report.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (
        all_specs as _all_specs,
    )

    counts = mod.tier_counts(_all_specs(include_local=True), mod.driver_greens())
    expected = mod.readme_counts_block(counts)
    text = (REPO / "README.md").read_text()
    assert mod.README_BEGIN in text and mod.README_END in text, (
        "README.md lost the rotation-counts markers — restore them; the "
        "convergence bullet must stay tool-generated"
    )
    begin = text.index(mod.README_BEGIN)
    end = text.index(mod.README_END) + len(mod.README_END)
    assert text[begin:end] == expected, (
        "README.md rotation-counts block is stale vs the live registry — "
        "run `python tools/rotation_report.py`"
    )


def test_closure_audit_reverse_index_finds_known_hubs():
    """tools/closure_audit.py (VERDICT r8 #4) must attribute closure
    membership from the SAME payload spec_hash uses: read_table is in
    (nearly) every query's closure; functions.text.tokens is in the
    BM25 family's closure; and a leaf query fn is nobody's helper."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "closure_audit", REPO / "tools" / "closure_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    consumers = mod.build_reverse_index()
    by_suffix = {m.rsplit(".", 1)[-1]: qs for m, qs in consumers.items()}
    assert len(by_suffix["read_table"]) > 100
    assert "text_bm25_batch" in by_suffix["tokens"]
    assert "text_bm25_topk" in by_suffix["tokens"]
    # constants are tracked too (the round-8 container-capture class)
    assert "<const TOKEN_SPLIT_RE>" in consumers
    # a query fn is not a hub: nothing consumes q01 besides itself
    assert by_suffix.get("q01_pricing_summary", {"q01_pricing_summary"}) == {
        "q01_pricing_summary"
    }
