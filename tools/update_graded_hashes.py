"""Maintain GRADED_HASHES.json: the re-grade-on-rewrite ledger (ADVICE r6).

For every query with at least one fully-green driver row in an accumulated
``CORRECTNESS_r*.json``, the ledger records the :func:`spec_hash` of the
implementation THAT EVIDENCE GRADED (fn source + oracle SQL) and the latest
green round. ``tests/test_rotation.py`` then refuses to let a query park on
stale evidence: if its current hash differs from the ledger's, it must
re-enter the export window (or the GRADE_QUEUE) to be re-graded.

Run this immediately after a new CORRECTNESS_r{N}.json lands (i.e. at the
START of round N+1, before touching any query source), so "current source"
still equals "source the driver graded":

    python tools/update_graded_hashes.py

Rules applied per query name:
- green in the LATEST correctness file  -> hash := current, round := latest
  (the driver just graded exactly this source);
- green only in EARLIER rounds          -> entry left untouched (its source
  may have changed since; the rotation test decides whether that demands a
  re-grade);
- no longer registered                  -> entry dropped.

First generated at the start of round 7 from CORRECTNESS_r06.json.
Initialization note: queries whose only green rounds predate r6 were seeded
with their round-7-start hashes, justified by the r6 judge's source audit
("source files for the §2 rows are unchanged this round"), EXCEPT
events_anomaly_zscore — rewritten in r6 while parked on an r5 green — which
is deliberately absent until its round-7 re-grade lands.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from walmart_retail_pyspark_sqlite_pipeline_spark.plans.evidence import (  # noqa: E402
    green_rounds,
    latest_round,
)
from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (  # noqa: E402
    EXPORTED_NAMES,
    all_specs,
    spec_hash,
)

LEDGER = REPO / "GRADED_HASHES.json"


def build_entries(
    greens: dict[str, int],
    latest_round: int,
    current_hashes: dict[str, str],
    exported: frozenset[str] | set[str],
    old: dict[str, dict],
) -> dict[str, dict]:
    """Pure stamping rules (unit-tested in tests/test_rotation.py):

    - green in the LATEST round  -> (re)stamp with the current hash;
    - green only EARLIER, known  -> keep the old entry untouched;
    - green only EARLIER, new, PARKED -> seed with the current hash,
      flagged with seeded_at_round;
    - green only EARLIER, new, EXPORTED -> no entry (about to be
      re-graded; seeding a possibly-rewritten source would lie);
    - not registered anymore     -> dropped (absent from current_hashes).
    """
    entries: dict[str, dict] = {}
    for name, last_green in sorted(greens.items()):
        if name not in current_hashes:
            continue  # de-registered query: drop
        if last_green == latest_round:
            entries[name] = {"hash": current_hashes[name], "round": last_green}
        elif name in old:
            entries[name] = old[name]
        elif name not in exported:
            entries[name] = {
                "hash": current_hashes[name],
                "round": last_green,
                "seeded_at_round": latest_round + 1,
            }
    return entries


def restamp_algo() -> None:
    """One-off migration after a spec_hash ALGORITHM change: recompute every
    existing entry's hash with the current algorithm, keeping its recorded
    round. HONEST ONLY when current source == graded source for every entry
    — i.e. run it in the same commit as the algorithm change, at round
    start, with tests/test_rotation.py green under the OLD algorithm
    immediately before (so no source drifted since grading)."""
    specs = all_specs(include_local=True)
    doc = json.load(open(LEDGER))
    kept, dropped = {}, []
    for name, entry in doc["entries"].items():
        if name in specs:
            kept[name] = {**entry, "hash": spec_hash(specs[name])}
        else:
            dropped.append(name)
    doc["entries"] = kept
    LEDGER.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(
        f"restamped {len(kept)} entries with the current spec_hash algorithm"
        + (f"; dropped de-registered {dropped}" if dropped else "")
    )


def main() -> None:
    if "--restamp-algo" in sys.argv:
        restamp_algo()
        return
    latest = latest_round(REPO)
    if latest is None:
        raise SystemExit("no CORRECTNESS_r*.json found")
    greens = {name: max(rounds) for name, rounds in green_rounds(REPO).items()}

    specs = all_specs(include_local=True)
    old = (
        json.load(open(LEDGER))["entries"] if LEDGER.exists() else {}
    )

    entries = build_entries(
        greens,
        latest,
        {name: spec_hash(s) for name, s in specs.items()},
        EXPORTED_NAMES,
        old,
    )

    LEDGER.write_text(
        json.dumps(
            {"latest_correctness_round": latest, "entries": entries},
            indent=1,
            sort_keys=True,
        )
        + "\n"
    )
    print(f"wrote {LEDGER}: {len(entries)} entries (latest round {latest})")


if __name__ == "__main__":
    main()
