"""Generic relational coverage (joins, multi-agg, rollup, windows) the
reference leaves implicit (SURVEY.md §2.5 'gaps', §2.8) — populated
incrementally."""

from __future__ import annotations
