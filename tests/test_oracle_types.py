"""Oracle result-type gate (VERDICT r6 ask #2).

Three rounds in a row a cross-engine canonicalization class slipped
through review (NULLS FIRST in r4, float grids in r5, uncast integer
sums in r6); each got a convention, none got a gate. This is the gate
for the r6 class: DuckDB types a bare ``sum(<integer>)`` as HUGEINT
(and ``sum(BIGINT)`` too), which pandas materializes as float —
``500.0`` — while Spark emits BIGINT ``500``; the driver's value hash
then mismatches even though every value is numerically identical.

Rather than regex-parsing SQL for ``sum(`` outside a CAST (brittle:
misses sum-of-sum, CTE-laundered sums, HUGEINT-producing arithmetic),
this binds every registered oracle with ``DESCRIBE`` against the real
testdata views and fails on any 128-bit integer RESULT column — the
exact property the driver compare cares about. DESCRIBE only binds
(no execution), so the whole registry checks in seconds.

DECIMAL result columns are allowed: the driver canonicalizes Decimal
and float identically (``quantity_histogram`` DECIMAL(22,1) and
``value_quantile_sketch`` DECIMAL(3,2) were hash-green in r05).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from spark_streaming_project_spark.plans import REGISTRY
from spark_streaming_project_spark.schemas import TESTDATA_TABLES

_SF_DIR = os.path.join("/root/testdata", "sf0.001")

# 128-bit integer types: pandas has no int128, so DuckDB's .df()/fetch
# degrades them to float64/object and the driver hash sees 500.0 != 500.
_BANNED = {"HUGEINT", "UHUGEINT"}

_ORACLES = [(n, q.oracle) for n, q in REGISTRY.items() if q.oracle]


@pytest.fixture(scope="module")
def duck_views():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(_SF_DIR, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def test_every_registered_oracle_has_an_oracle_or_is_declared():
    # exactly the 4 declared rows-only tiers may omit an oracle (the
    # set itself is pinned by name in test_plans.py; r09 promoted
    # neardup_centrality and bpe_merge_table to full oracles, r12
    # promoted approx_stats to the invariant-verdict oracle) —
    # everything else must be gated here.
    assert len(_ORACLES) == len(REGISTRY) - 4


def test_no_oracle_emits_128bit_integer_columns(duck_views):
    """Every oracle's DESCRIBE'd result schema must be free of
    HUGEINT/UHUGEINT — wrap integer sums in CAST(... AS BIGINT) and
    ratio numerators in CAST(... AS DOUBLE) at the registration site."""
    offenders = []
    for name, sql in _ORACLES:
        rows = duck_views.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in rows:
            base = typ.split("(")[0].upper()
            if base in _BANNED:
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle result columns typed as 128-bit integers (DuckDB "
        "HUGEINT degrades to float in pandas; the driver hash will "
        f"mismatch Spark's BIGINT): {offenders}"
    )
