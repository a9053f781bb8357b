"""Registry plumbing for named queries.

Each query is a builder ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle string over the driver's pre-registered
views (region nation customer supplier part orders lineitem events documents
embeddings). Column aliases MUST match between builder output and oracle —
the correctness gate hashes values under name-sorted columns.

Cache-lifetime contract: builders MAY ``persist()`` intermediate frames
that the returned LAZY plan still references (multi-consumer pair graphs,
signature tables), so they cannot unpersist before returning. The bench
harness and the driver call ``spark.catalog.clearCache()`` between
queries; direct callers composing many builders in one session should do
the same after materializing each result, or cached partitions accumulate
under memory pressure.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: add a plan builder to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tuple(tags))
        return fn

    return deco
