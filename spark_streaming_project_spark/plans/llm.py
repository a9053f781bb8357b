"""LLM-data-pipeline queries (dedup, similarity search, text analysis) over
documents/embeddings (BASELINE.json north star) — populated incrementally."""

from __future__ import annotations
