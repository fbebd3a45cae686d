"""Closure blast-radius audit (VERDICT r8 #4).

The re-grade-on-rewrite spec hash covers the TRANSITIVE CLOSURE of
in-package helpers and constants a query references, so editing a shared
helper drifts every consumer's hash and forces re-grades. The 50-slot
grading window can absorb a family-sized drift (the 13-consumer
``read_embeddings`` contract) but not a hub-sized one (the round-8
``read_table`` branch would have drifted ~120 queries). This tool answers,
BEFORE an edit is made: *if I touch helper X, which queries drift, and how
many of them are parked on driver evidence?*

Usage:
  python tools/closure_audit.py                # hub table: helpers by consumer count
  python tools/closure_audit.py poly_hash dot  # consumers of helpers matching a suffix
  python tools/closure_audit.py --min 20       # hub table, only helpers with >=20 consumers

Policy (memory: closure-blast-radius, proven by the read_embeddings split):
a semantic hardening of a hub helper must NOT be made in place. Create a
NEW per-family entry point with the hardened behavior and migrate only
that family's call sites — the hub stays byte-identical, non-family
consumers keep their evidence, and exactly the true consumers drift.
"""

from __future__ import annotations

import inspect
import re
import sys
import textwrap
import types
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from walmart_retail_pyspark_sqlite_pipeline_spark.plans.registry import (  # noqa: E402
    COVERED_BY,
    EXPORTED_NAMES,
    GRADE_QUEUE,
    _PKG,
    _closure_payload,
    all_specs,
)

CONST_RE = re.compile(r"^<const ([A-Za-z_][A-Za-z0-9_]*)=")


def _import_all_package_modules() -> None:
    """Import every module under the package, not just those the registry
    import pulled in transitively (ADVICE r9: a helper defined in a module
    the plans never import would otherwise be invisibly absent from the
    reverse index rather than flagged)."""
    import importlib
    import pkgutil

    pkg = importlib.import_module(_PKG)
    for info in pkgutil.walk_packages(pkg.__path__, prefix=_PKG + "."):
        try:
            importlib.import_module(info.name)
        except Exception as e:  # noqa: BLE001 — surface, don't mask
            print(f"WARN: could not import {info.name}: {e}", file=sys.stderr)


def _source_index() -> dict[str, str]:
    """Map dedented source text -> 'module.qualname' for every module-level
    function/class defined in the package (the exact text
    ``_closure_payload`` emits per visited object)."""
    _import_all_package_modules()
    idx: dict[str, str] = {}
    for mod_name, mod in sorted(sys.modules.items()):
        if not mod_name.startswith(_PKG) or mod is None:
            continue
        for attr, obj in vars(mod).items():
            if not isinstance(obj, (types.FunctionType, type)):
                continue
            if (getattr(obj, "__module__", "") or "") != mod_name:
                continue  # re-exports index under their defining module
            try:
                src = textwrap.dedent(inspect.getsource(obj))
            except (OSError, TypeError):
                continue
            idx[src] = f"{mod_name}.{obj.__qualname__}"
    return idx


def build_reverse_index() -> dict[str, set[str]]:
    """helper-or-const -> set of consuming registry query names."""
    specs = all_specs(include_local=True)
    idx = _source_index()
    consumers: dict[str, set[str]] = {}
    n_unresolved = 0
    for name, spec in specs.items():
        own_src = None
        try:
            own_src = textwrap.dedent(inspect.getsource(spec.fn))
        except (OSError, TypeError):
            pass
        for part in _closure_payload(spec.fn).split("\x00"):
            m = CONST_RE.match(part)
            if m:
                member = f"<const {m.group(1)}>"
            else:
                member = idx.get(part)
                if member is None:
                    # the spec fn's own source resolves to itself; anything
                    # else unmatched is an attribution gap — count it so a
                    # hole in the reverse index is visible, not silent
                    # (ADVICE r9)
                    if part != own_src:
                        n_unresolved += 1
                    continue
            consumers.setdefault(member, set()).add(name)
    if n_unresolved:
        print(
            f"WARN: {n_unresolved} closure payload parts had no source "
            "match — the hub table under-counts those helpers",
            file=sys.stderr,
        )
    return consumers


def tier(name: str) -> str:
    if name in EXPORTED_NAMES:
        return "exported"
    if name in GRADE_QUEUE:
        return "queued"
    if name in COVERED_BY:
        return "covered"
    return "parked/local"


def main(argv: list[str]) -> None:
    min_consumers = 10
    if "--min" in argv:
        i = argv.index("--min")
        min_consumers = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    consumers = build_reverse_index()

    if argv:
        for pat in argv:
            hits = sorted(
                (m, qs) for m, qs in consumers.items() if pat in m
            )
            if not hits:
                print(f"{pat}: no closure member matches")
                continue
            for member, qs in hits:
                print(f"\n{member} — {len(qs)} consumers:")
                for q in sorted(qs):
                    print(f"  {q:40s} [{tier(q)}]")
        return

    print(f"{'closure member':64s} {'consumers':>9s}  drift-if-edited")
    print("-" * 100)
    rows = sorted(consumers.items(), key=lambda kv: -len(kv[1]))
    for member, qs in rows:
        if len(qs) < min_consumers:
            continue
        n_evidence = sum(1 for q in qs if tier(q) in ("parked/local", "covered"))
        print(
            f"{member:64s} {len(qs):9d}  {n_evidence} parked/covered would "
            "need re-grades"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
