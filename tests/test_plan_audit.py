"""Blanket anti-pattern audit over EVERY registered query's physical plan.

Two things must never appear anywhere in the registry:
- ``CartesianProduct`` — an unconditioned big-big join (broadcast
  nested-loop against a one-row frame is fine and is what the similarity
  operators use);
- ``BatchEvalPython`` — a row-at-a-time Python UDF on the hot path (all
  Python in this engine is Arrow-vectorized: ArrowEvalPython / MapInPandas
  / FlatMapGroupsInPandas).

One test per query so a violation names its query directly.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from spark_streaming_project_spark.plans import REGISTRY

from .conftest import SF_CORRECT

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_forbidden_plan_nodes(spark, name):
    df = REGISTRY[name].builder(spark, SF_CORRECT)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for node in FORBIDDEN:
        assert node not in plan, f"{name}: {node} in physical plan"


def test_decile_plans_have_no_unpartitioned_window(spark):
    """VERDICT r4 perf-weak fix pinned: the decile family must not funnel
    rows through a single-task ``Window.orderBy`` (WindowExec with an empty
    partition spec). Other registry queries may keep global windows only
    over ``limit(n)``-bounded frames; these two rank UNBOUNDED key sets."""
    import re

    for name in ("revenue_concentration", "nation_spend_deciles"):
        df = REGISTRY[name].builder(spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        unpart = [
            m
            for m in re.findall(r"windowspecdefinition\([^)]*\)", plan)
            if m.count(",") <= 2  # (order-col, frame) only: no partition cols
        ]
        assert not unpart, f"{name}: unpartitioned window {unpart}"
