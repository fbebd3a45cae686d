"""LLM training-data pipeline queries (dedup / similarity / text analysis /
multimodal) — populated incrementally; see operators/ and functions/."""

from __future__ import annotations
