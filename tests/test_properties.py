"""Property-based invariants (hypothesis) for the operators whose edge cases
bit us in review: top-N residuals must conserve totals on ANY input,
connected components must equal a reference union-find on ANY graph, and
epoch conversion must agree across timestamp flavors on ANY instant.

Example counts are kept small — every example is a real Spark job — but the
generators hit the nasty regions deliberately (NULL keys, duplicate keys,
keys equal to the residual label, self-loops, disconnected nodes)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.graph import connected_components
from spark_streaming_project_spark.operators.topk import top_n_with_other

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d", "Autres"]))
rows = st.lists(st.tuples(keys, st.integers(0, 1000)), min_size=1, max_size=30)


@given(data=rows, n=st.integers(1, 5))
@SETTINGS
def test_top_n_with_other_conserves_totals(spark, data, n):
    df = spark.createDataFrame(data, "k string, cnt long")
    out = top_n_with_other(df, "k", "cnt", n).collect()
    # grand total conserved for any input (NULLs, dup keys, label collisions)
    assert sum(r["cnt"] for r in out) == sum(c for _, c in data)
    # at most n winners + one residual row, one row per output key
    assert len(out) <= n + 1
    out_keys = [r["k"] for r in out]
    assert len(out_keys) == len(set(out_keys))
    # winners are the true top-n of the per-key sums
    sums: dict = {}
    for k, c in data:
        sums[k] = sums.get(k, 0) + c
    ranked = sorted(sums.items(), key=lambda t: (-t[1], t[0] is None, t[0] or ""))
    winner_counts = {k: v for k, v in ranked[:n]}
    for k, v in winner_counts.items():
        got = {r["k"]: r["cnt"] for r in out}
        if k != "Autres":  # label collisions merge into the residual row
            assert got[k] == v


edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=0, max_size=25
)


def _union_find(pairs):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min of component
    return {x: find(x) for x in parent}


@given(pairs=edges)
@SETTINGS
def test_connected_components_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs or [(0, 0)], "id_a long, id_b long")
    if not pairs:
        df = df.limit(0)
    got = {
        r["u"]: r["component"] for r in connected_components(df).collect()
    }
    # roots are component minima by construction (max root reparented under
    # min root on every union), and the final find() fully resolves chains
    want = _union_find(pairs)
    assert got == want


instants = st.datetimes(
    min_value=datetime.datetime(1971, 1, 1),
    max_value=datetime.datetime(2100, 1, 1),
)


@given(ts=st.lists(instants, min_size=1, max_size=20))
@SETTINGS
def test_epoch_seconds_flavors_agree(spark, ts):
    from spark_streaming_project_spark.functions.timeutil import epoch_seconds

    df = spark.createDataFrame([(t.isoformat(sep=" "),) for t in ts], "s string").select(
        F.col("s").cast("timestamp").alias("ltz"),
        F.col("s").cast("timestamp_ntz").alias("ntz"),
    )
    rows_ = df.select(
        epoch_seconds(df, "ltz").alias("a"), epoch_seconds(df, "ntz").alias("b")
    ).collect()
    for r, t in zip(rows_, ts):
        want = int(t.replace(tzinfo=datetime.timezone.utc).timestamp())
        assert r["a"] == want and r["b"] == want
