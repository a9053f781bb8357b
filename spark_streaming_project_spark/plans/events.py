"""Event-time queries over the events table (SURVEY.md §2.9 X4 extensions) —
populated incrementally."""

from __future__ import annotations
