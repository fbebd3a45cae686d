"""Shared reader for the driver's ``CORRECTNESS_r*.json`` evidence files.

Single source of truth for what "driver-green" means (rows + schema +
value-hash all matched) and for accumulating green rounds per query —
previously re-implemented in tools/rotation_report.py,
tools/update_graded_hashes.py, tests/test_rotation.py and
tests/test_registry.py, where a drifting copy would have silently broken
the re-grade-on-rewrite invariant (code-review r7).
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

_ROUND_RE = re.compile(r"_r(\d+)\.json$")


def row_is_green(row: dict) -> bool:
    """A driver correctness row counts as green only when all three
    comparisons matched."""
    return bool(
        row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
    )


def correctness_files(repo: Path) -> list[tuple[int, str]]:
    """(round, path) pairs for every CORRECTNESS_r*.json, ascending."""
    out = []
    for f in glob.glob(str(Path(repo) / "CORRECTNESS_r*.json")):
        m = _ROUND_RE.search(f)
        if m:
            out.append((int(m.group(1)), f))
    return sorted(out)


def green_rounds(repo: Path) -> dict[str, list[int]]:
    """Per query name, the ascending list of rounds with a green row."""
    greens: dict[str, list[int]] = {}
    for rnd, f in correctness_files(repo):
        with open(f) as fh:
            for name, row in json.load(fh).items():
                if row_is_green(row):
                    greens.setdefault(name, []).append(rnd)
    return greens


def latest_round(repo: Path) -> int | None:
    files = correctness_files(repo)
    return files[-1][0] if files else None
