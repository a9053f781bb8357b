"""Time-series diagnostics (hourly_autocorrelation / hourly_ewma_trend),
CMS join-size estimation, and content-defined chunking — pure-python model
parity and the structural invariants each operator's contract promises
(edit locality for CDC, one-sided error for the sketch estimate)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_streaming_project_spark.plans import REGISTRY

from .conftest import SF_SMOKE


def _dense_series(spark):
    """The gap-filled hourly series at sf0.001 as {type: [x_1..x_n]}."""
    from spark_streaming_project_spark.plans.events import (
        events_hourly_gapfill,
    )

    rows = (
        events_hourly_gapfill(spark, SF_SMOKE)
        .orderBy("event_type", "hour_start")
        .collect()
    )
    out: dict[str, list[int]] = {}
    for r in rows:
        out.setdefault(r.event_type, []).append(r.event_count)
    return out


def test_autocorrelation_matches_python_model(spark):
    series = _dense_series(spark)
    got = {
        (r.event_type, r.lag): (r.n_pairs, r.acf)
        for r in REGISTRY["hourly_autocorrelation"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert got, "no acf rows"
    for ty, xs in series.items():
        n, s = len(xs), sum(xs)
        dev = [n * x - s for x in xs]
        den = sum(d * d for d in dev)
        if den == 0:
            assert all(k[0] != ty for k in got)
            continue
        for k in range(1, 25):
            num = sum(dev[t] * dev[t + k] for t in range(n - k))
            n_pairs, acf = got[(ty, k)]
            assert n_pairs == n - k
            assert acf == round(num / den, 6), (ty, k)


def test_autocorrelation_bounds_and_shape(spark):
    rows = REGISTRY["hourly_autocorrelation"].builder(spark, SF_SMOKE).collect()
    types = {r.event_type for r in rows}
    for ty in types:
        lags = sorted(r.lag for r in rows if r.event_type == ty)
        assert lags == list(range(1, 25))
    # Cauchy-Schwarz with shortened numerator windows can nudge past 1
    # only through the terminal rounding; bound loosely but meaningfully.
    assert all(abs(r.acf) <= 1.000001 for r in rows)


def test_ewma_matches_python_model(spark):
    from spark_streaming_project_spark.plans.events import _EWMA_K, _EWMA_W

    series = _dense_series(spark)
    wsum = sum(_EWMA_W)
    got = {
        (r.event_type, str(r.hour_start)): (r.event_count, r.ewma)
        for r in REGISTRY["hourly_ewma_trend"].builder(spark, SF_SMOKE).collect()
    }
    assert got, "no ewma rows"
    # recompute per type using ordered hours from the dense frame
    from spark_streaming_project_spark.plans.events import (
        events_hourly_gapfill,
    )

    dense = (
        events_hourly_gapfill(spark, SF_SMOKE)
        .orderBy("event_type", "hour_start")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in dense:
        by_type.setdefault(r.event_type, []).append(r)
    n_checked = 0
    for ty, rows in by_type.items():
        xs = [r.event_count for r in rows]
        for t in range(len(xs)):
            key = (ty, str(rows[t].hour_start))
            if t < _EWMA_K - 1:
                assert key not in got  # full window required
                continue
            q = sum(
                round(_EWMA_W[j] * xs[t - j] * 1e9) for j in range(_EWMA_K)
            )
            expect = round(q / 1e9 / wsum, 6)
            assert got[key] == (xs[t], expect), key
            n_checked += 1
    assert n_checked > 0


def test_ewma_is_smoother_than_raw(spark):
    """The smoothed series must have no larger step-to-step variation than
    the raw one (the defining property of an averaging filter)."""
    rows = (
        REGISTRY["hourly_ewma_trend"]
        .builder(spark, SF_SMOKE)
        .orderBy("event_type", "hour_start")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for ty, rs in by_type.items():
        raw = sum(
            abs(a.event_count - b.event_count) for a, b in zip(rs, rs[1:])
        )
        smooth = sum(abs(a.ewma - b.ewma) for a, b in zip(rs, rs[1:]))
        assert smooth <= raw + 1e-6, ty


def test_cms_join_estimate_is_one_sided(spark):
    r = REGISTRY["join_size_estimate_cms"].builder(spark, SF_SMOKE).collect()
    assert len(r) == 1
    row = r[0]
    # collisions only ADD mass: the estimate never undercounts
    assert row.est_rows >= row.exact_rows
    assert row.rel_overcount >= 0.0


def test_cms_join_estimate_exact_side_is_the_true_join_count(spark):
    from spark_streaming_project_spark.sources.batch import load_table

    ev = load_table(spark, SF_SMOKE, "events").filter(
        F.col("user_id").isNotNull()
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    true_n = ev.join(
        orders, ev["user_id"] == orders["o_custkey"]
    ).count()
    r = REGISTRY["join_size_estimate_cms"].builder(spark, SF_SMOKE).collect()[0]
    assert r.exact_rows == true_n


def _cdc(spark, texts):
    from spark_streaming_project_spark.operators.chunking import cdc_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]
    )
    return cdc_chunks(df, "text", "id").collect()


_BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green bottles hang on the wall and every byte of this sentence "
    "exists to push the rolling hash across several cut points so the "
    "chunker has something realistic to slice into variable pieces"
)


def test_cdc_chunks_reassemble_exactly(spark):
    rows = _cdc(spark, [_BASE])
    ordered = sorted(rows, key=lambda r: r.chunk_start)
    assert "".join(r.chunk_text for r in ordered) == _BASE
    # spans tile the text: each chunk starts where the previous ended
    pos = 1
    for r in ordered:
        assert r.chunk_start == pos
        assert r.chunk_len == len(r.chunk_text)
        pos += r.chunk_len
    assert pos == len(_BASE) + 1


def test_cdc_edit_locality(spark):
    """Insert a prefix: fixed-window chunking would reslice everything;
    CDC must keep every chunk after the first boundary identical."""
    edited = "INSERTED PREAMBLE >> " + _BASE
    rows = _cdc(spark, [_BASE, edited])
    h0 = {r.chunk_hash for r in rows if r.id == 0}
    h1 = {r.chunk_hash for r in rows if r.id == 1}
    shared = h0 & h1
    # all original chunks except the (rewritten) first one survive
    n0 = len(h0)
    assert n0 >= 3, "corpus too short to exercise boundaries"
    assert len(shared) >= n0 - 1


def test_cdc_identical_docs_share_every_chunk(spark):
    rows = _cdc(spark, [_BASE, _BASE])
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.id, []).append((r.chunk_start, r.chunk_hash))
    assert sorted(by_id[0]) == sorted(by_id[1])


def test_cdc_short_and_null_docs_are_skipped(spark):
    from spark_streaming_project_spark.operators.chunking import cdc_chunks

    df = spark.createDataFrame(
        [(0, "tiny"), (1, None), (2, _BASE)], ["id", "text"]
    )
    rows = cdc_chunks(df, "text", "id").collect()
    assert {r.id for r in rows} == {2}


def test_seasonal_baseline_matches_python_model(spark):
    from spark_streaming_project_spark.plans.events import (
        events_hourly_gapfill,
    )

    dense = events_hourly_gapfill(spark, SF_SMOKE).collect()
    stats: dict[tuple, list[int]] = {}
    for r in dense:
        stats.setdefault((r.event_type, r.hour_start.hour), []).append(
            r.event_count
        )
    rows = []
    for r in dense:
        xs = stats[(r.event_type, r.hour_start.hour)]
        n_h, s_h = len(xs), sum(xs)
        dev = n_h * r.event_count - s_h
        rows.append(
            (
                abs(dev) / n_h,
                r.event_type,
                r.hour_start,
                r.event_count,
                round(s_h / n_h, 6),
                round(dev / n_h, 6),
            )
        )
    rows.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [t[1:] for t in rows[:50]]
    got = [
        (r.event_type, r.hour_start, r.event_count, r.expected, r.residual)
        for r in REGISTRY["seasonal_hourly_baseline"]
        .builder(spark, SF_SMOKE)
        .collect()
    ]
    assert got == want


def test_cdc_clusters_match_python_union_find(spark):
    """Replicate pair generation + transitive closure in pure python over
    the (already reassembly-tested) chunk frame."""
    from spark_streaming_project_spark.operators.chunking import cdc_chunks
    from spark_streaming_project_spark.sources.batch import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    ch = cdc_chunks(docs, "text", "doc_id").collect()
    by_hash: dict[str, set[int]] = {}
    for r in ch:
        if r.chunk_len >= 16:
            by_hash.setdefault(r.chunk_hash, set()).add(r.id)
    shared: dict[tuple[int, int], int] = {}
    for h, ids in by_hash.items():
        if len(ids) > 64:  # hot-chunk cap
            continue
        ids_s = sorted(ids)
        for i, a in enumerate(ids_s):
            for b in ids_s[i + 1 :]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), n in shared.items():
        if n >= 3:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, int] = {}
    for x in list(parent):
        clusters[find(x)] = clusters.get(find(x), 0) + 1
    want = sorted(
        ((c, n) for c, n in clusters.items()), key=lambda t: (-t[1], t[0])
    )
    got = [
        (r.canonical_id, r.n_docs)
        for r in REGISTRY["cdc_chunk_doc_clusters"]
        .builder(spark, SF_SMOKE)
        .collect()
    ]
    assert got == want and got, "empty cluster set would prove nothing"


def test_markov_stationary_properties(spark):
    rows = (
        REGISTRY["event_markov_stationary"].builder(spark, SF_SMOKE).collect()
    )
    assert rows
    total = sum(r.prob_q for r in rows)
    # quantization slips at most ~1 unit per state per renormalization
    assert abs(total - 1_000_000_000) < 100 * len(rows)
    assert all(r.prob_q >= 0 for r in rows)


def test_markov_stationary_close_to_float_eigenvector(spark):
    """The quantized integer iteration must land within quantization
    distance of an independent float power iteration."""
    from spark_streaming_project_spark.sources.batch import load_table
    from pyspark.sql import Window

    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("a"),
            F.lead("event_type").over(w).alias("b"),
        )
        .filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .count()
        .collect()
    )
    counts = {(r.a, r.b): r["count"] for r in pairs}
    states = sorted({i for i, _ in counts} | {j for _, j in counts})
    rowtot: dict[str, float] = {}
    for (i, _), n in counts.items():
        rowtot[i] = rowtot.get(i, 0) + n
    d = {s: 1.0 / len(states) for s in states}
    for _ in range(200):
        nxt = {s: 0.0 for s in states}
        for (i, j), n in counts.items():
            nxt[j] += d[i] * n / rowtot[i]
        for s in states:
            if s not in rowtot:
                nxt[s] += d[s]
        d = nxt
    got = {
        r.event_type: r.stationary_prob
        for r in REGISTRY["event_markov_stationary"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - d[s]) < 1e-4, (s, got[s], d[s])


def test_markov_entropy_rate_bounds(spark):
    import math

    rows = (
        REGISTRY["event_markov_entropy_rate"]
        .builder(spark, SF_SMOKE)
        .collect()
    )
    assert rows
    S = len(rows)
    for r in rows:
        # conditional entropy of an S-state row is bounded by ln(S)
        # (+ tiny quantization slack)
        assert -1e-6 <= r.cond_entropy_nats <= math.log(S) + 1e-6, r
    rate = sum(r.rate_contrib_q for r in rows) / 1e9
    assert 0.0 <= rate <= math.log(S) + 1e-6
    # this corpus's event types are near-independent draws, so the chain
    # should be strongly mixing: rate well above 0
    assert rate > 0.5 * math.log(S) / 2
