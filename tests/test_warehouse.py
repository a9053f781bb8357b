"""Semantics tests for the warehouse operators: SCD2 merge on constructed
dimensions (change / no-change / new-member / history passthrough /
two-batch layering) and Spearman rank correlation (monotone, anti-monotone,
tie handling). Oracle parity on testdata lives in test_correctness.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.profiling import spearman_corr
from spark_streaming_project_spark.operators.scd import scd2_apply

D = dt.date


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, seg string, valid_from date, valid_to date, is_current boolean"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k bigint, seg string")


def test_scd2_change_new_and_untouched(spark):
    dim = _dim(
        spark,
        [
            (1, "A", D(2020, 1, 1), None, True),
            (2, "B", D(2020, 1, 1), None, True),
            # closed history for key 1 from an earlier merge
            (1, "Z", D(2019, 1, 1), D(2020, 1, 1), False),
        ],
    )
    upd = _upd(spark, [(1, "A2"), (2, "B"), (3, "C")])
    out = scd2_apply(dim, upd, "k", ["seg"], F.lit(D(2021, 6, 1)))
    rows = {(r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out.collect()}
    assert rows == {
        # history untouched
        (1, "Z", D(2019, 1, 1), D(2020, 1, 1), False),
        # key 1 changed: old closed, new opened
        (1, "A", D(2020, 1, 1), D(2021, 6, 1), False),
        (1, "A2", D(2021, 6, 1), None, True),
        # key 2 identical: untouched
        (2, "B", D(2020, 1, 1), None, True),
        # key 3 brand new
        (3, "C", D(2021, 6, 1), None, True),
    }


def test_scd2_null_attribute_is_null_safe(spark):
    dim = _dim(spark, [(1, None, D(2020, 1, 1), None, True)])
    # NULL -> NULL is NOT a change; NULL -> 'X' is
    out_same = scd2_apply(dim, _upd(spark, [(1, None)]), "k", ["seg"],
                          F.lit(D(2021, 1, 1)))
    assert out_same.count() == 1
    assert out_same.collect()[0]["is_current"] is True
    out_chg = scd2_apply(dim, _upd(spark, [(1, "X")]), "k", ["seg"],
                         F.lit(D(2021, 1, 1)))
    assert out_chg.count() == 2


def test_scd2_two_batches_layer(spark):
    dim = _dim(spark, [(1, "A", D(2020, 1, 1), None, True)])
    once = scd2_apply(dim, _upd(spark, [(1, "B")]), "k", ["seg"],
                      F.lit(D(2021, 1, 1)))
    twice = scd2_apply(once, _upd(spark, [(1, "C")]), "k", ["seg"],
                       F.lit(D(2022, 1, 1)))
    rows = {(r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in twice.collect()}
    assert rows == {
        ("A", D(2020, 1, 1), D(2021, 1, 1), False),
        ("B", D(2021, 1, 1), D(2022, 1, 1), False),
        ("C", D(2022, 1, 1), None, True),
    }
    # exactly one open row survives
    assert twice.filter(F.col("is_current")).count() == 1


def _pairs(spark, xy):
    return spark.createDataFrame(
        [("g", x, y) for x, y in xy], "grp string, x bigint, y bigint"
    )


def test_spearman_monotone_nonlinear_is_one(spark):
    # y = x^3 is monotone: Pearson < 1 but Spearman == 1
    df = _pairs(spark, [(x, x ** 3) for x in range(1, 9)])
    row = spearman_corr(df, "grp", "x", "y").collect()[0]
    assert row["spearman_rho"] == pytest.approx(1.0, abs=1e-9)


def test_spearman_reversed_is_minus_one(spark):
    df = _pairs(spark, [(x, 100 - x) for x in range(1, 9)])
    row = spearman_corr(df, "grp", "x", "y").collect()[0]
    assert row["spearman_rho"] == pytest.approx(-1.0, abs=1e-9)


def test_spearman_tie_handling_matches_scipy_formula(spark):
    # hand-checked with average ranks: x=[1,2,2,3], y=[10,20,20,40]
    # rank_x=[1,2.5,2.5,4], rank_y=[1,2.5,2.5,4] -> rho = 1
    df = _pairs(spark, [(1, 10), (2, 20), (2, 20), (3, 40)])
    row = spearman_corr(df, "grp", "x", "y").collect()[0]
    assert row["spearman_rho"] == pytest.approx(1.0, abs=1e-9)
    # and a partial-tie case: x=[1,1,2], y=[1,2,3]
    # rx=[1.5,1.5,3], ry=[1,2,3]; rho = cov/sd = 0.866025
    df2 = _pairs(spark, [(1, 1), (1, 2), (2, 3)])
    row2 = spearman_corr(df2, "grp", "x", "y").collect()[0]
    assert row2["spearman_rho"] == pytest.approx(0.866025, abs=1e-6)


def test_revenue_concentration_shape(spark):
    from spark_streaming_project_spark.plans import REGISTRY
    from .conftest import SF_CORRECT

    rows = (
        REGISTRY["revenue_concentration"].builder(spark, SF_CORRECT)
        .orderBy("decile")
        .collect()
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["revenue_share"] for r in rows]
    # decile 1 holds the biggest spenders
    assert shares[0] == max(shares)
    assert rows[-1]["cum_share"] == pytest.approx(1.0, abs=1e-6)
    # cumulative share is monotone
    cums = [r["cum_share"] for r in rows]
    assert cums == sorted(cums)


def test_scd1_upsert_replaces_appends_keeps(spark):
    from spark_streaming_project_spark.operators.scd import scd1_apply

    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    upd = spark.createDataFrame([(2, "B2"), (9, "new")], "k bigint, v string")
    got = {(r["k"], r["v"]) for r in scd1_apply(dim, upd, "k").collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (9, "new")}


# ---------------------------------------------------------------------------
# property-based SCD2 invariants: for ANY update batch, the merged dimension
# must keep exactly one open row per live key, no post-effective open date,
# and closed rows must chain (valid_to of one version = valid_from of next).
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _keys = st.integers(min_value=0, max_value=6)
    _vals = st.sampled_from(["a", "b", "c", None])
    _batches = st.lists(
        st.tuples(_keys, _vals), min_size=0, max_size=8,
        unique_by=lambda t: t[0],
    )

    # derandomize: reproducible run-to-run (same rationale as
    # tests/test_properties.py SETTINGS — VERDICT r5 next-round #3)
    @pytest.mark.slow  # r14: driver-window gate (see conftest)
    @settings(max_examples=12, deadline=None, derandomize=True)
    @given(batch1=_batches, batch2=_batches)
    def test_scd2_invariants_hold_for_any_batches(spark, batch1, batch2):
        from spark_streaming_project_spark.operators.scd import scd2_apply

        dim = _dim(
            spark,
            [(k, "init", D(2020, 1, 1), None, True) for k in range(4)],
        )
        for eff, batch in ((D(2021, 1, 1), batch1), (D(2022, 1, 1), batch2)):
            if not batch:
                continue
            upd = _upd(spark, batch)
            dim = scd2_apply(dim, upd, "k", ["seg"], F.lit(eff))
        rows = dim.collect()
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r["k"], []).append(r)
        for k, vs in by_key.items():
            opens = [r for r in vs if r["is_current"]]
            assert len(opens) == 1, f"key {k}: {len(opens)} open rows"
            assert opens[0]["valid_to"] is None
            closed = sorted(
                (r for r in vs if not r["is_current"]),
                key=lambda r: r["valid_from"],
            )
            # versions chain: each closed row's valid_to is the next row's
            # valid_from, ending at the open row
            chain = closed + opens
            for a, b in zip(chain, chain[1:]):
                assert a["valid_to"] == b["valid_from"], f"key {k} gap"


def test_snapshot_diff_classifies_and_is_null_safe(spark):
    """insert/update/delete classification on a crafted pair, including
    NULL transitions (NULL->value and value->NULL are updates; NULL->NULL
    is unchanged)."""
    from spark_streaming_project_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "A", 10.0),   # unchanged
            (2, "B", 20.0),   # value update
            (3, None, 30.0),  # NULL -> value update
            (4, "D", None),   # value -> NULL update
            (5, "E", 50.0),   # deleted
            (6, None, None),  # NULL == NULL -> unchanged
        ],
        "k long, status string, price double",
    )
    new = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (2, "B2", 20.0),
            (3, "C", 30.0),
            (4, "D", 40.0),
            (6, None, None),
            (7, "G", 70.0),   # inserted
        ],
        "k long, status string, price double",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["status", "price"]).collect()
    }
    assert got == {2: "update", 3: "update", 4: "update",
                   5: "delete", 7: "insert"}
