"""Event-stream queries (sessionization, structured streaming variants) —
populated incrementally; see streaming/."""

from __future__ import annotations
