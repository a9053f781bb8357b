"""Property tests for the corpus-selection operators (operators/sampling.py):
determinism, subset/stability under corpus growth, budget bounds, and
contamination-overlap ground truth on a crafted fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.sampling import (
    ngram_overlap,
    stratified_sample,
    token_budget_sample,
)
from spark_streaming_project_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark)
    rates = {"src0": 0.0, "src1": 1.0}
    kept = stratified_sample(docs, "doc_id", "source", rates, default_rate=0.5)
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "src0" not in by_src  # rate 0 -> nothing survives
    assert by_src["src1"] == totals["src1"]  # rate 1 -> everything survives
    # default rate 0.5 should keep roughly half of the remaining strata
    rest_kept = sum(v for k, v in by_src.items() if k not in ("src0", "src1"))
    rest_total = sum(v for k, v in totals.items() if k not in ("src0", "src1"))
    assert 0.3 * rest_total < rest_kept < 0.7 * rest_total
    # byte-for-byte deterministic across invocations
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "doc_id", "source", rates, 0.5)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2


def test_stratified_sample_stable_under_corpus_growth(spark):
    """Sampling a SUBSET of the corpus keeps exactly the ids that the full
    corpus run keeps within that subset — the no-churn property that makes
    incremental pipeline reruns reproducible."""
    docs = _docs(spark)
    rates = {"src2": 0.4}
    full = {
        r["doc_id"]
        for r in stratified_sample(docs, "doc_id", "source", rates, 0.3).collect()
    }
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = {
        r["doc_id"]
        for r in stratified_sample(half, "doc_id", "source", rates, 0.3).collect()
    }
    assert sub == {i for i in full if i % 2 == 0}


def test_token_budget_sample_respects_budget(spark):
    docs = _docs(spark)
    budget = 1500
    kept = token_budget_sample(docs, "text", "doc_id", "lang", budget).collect()
    assert kept, "budget sample empty"
    by_lang: dict[str, int] = {}
    for r in kept:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_tokens"]
    for lang, total in by_lang.items():
        # every kept doc STARTS inside the budget, so the overshoot is at
        # most one document; the previous docs sum to < budget
        max_doc = max(r["n_tokens"] for r in kept if r["lang"] == lang)
        assert total < budget + max_doc, f"{lang}: {total} >> {budget}"
    # determinism: same budget -> same exact id set
    again = token_budget_sample(docs, "text", "doc_id", "lang", budget).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(r["doc_id"] for r in again)


def test_token_budget_monotone_in_budget(spark):
    docs = _docs(spark)
    small = {
        r["doc_id"]
        for r in token_budget_sample(docs, "text", "doc_id", "lang", 800).collect()
    }
    large = {
        r["doc_id"]
        for r in token_budget_sample(docs, "text", "doc_id", "lang", 3000).collect()
    }
    assert small <= large and len(small) < len(large)


def test_ngram_overlap_ground_truth(spark):
    left = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with no shared grams at all"),
            (3, None),
        ],
        ["doc_id", "text"],
    )
    right = spark.createDataFrame(
        [
            (10, "prefix words then the quick brown fox jumps over the end"),
            (11, "the quick brown fox jumps elsewhere entirely now yes"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: (r["shared_grams"], r["right_docs"])
        for r in ngram_overlap(
            left.filter(F.col("text").isNotNull()), right, "text", "doc_id", n=5
        ).collect()
    }
    # doc 1 shares "the quick brown fox jumps" (both right docs) plus
    # "quick brown fox jumps over" and "brown fox jumps over the" (right
    # doc 10 only) -> 3 grams, 2 docs; doc 2 shares nothing
    assert rows == {1: (3, 2)}


def test_ngram_overlap_hot_gram_guard(spark):
    """max_right_df drops boilerplate grams shared by many right docs (not
    leakage evidence, and the SCALE.md-measured df^2 join blowup) while
    keeping rare-gram matches intact."""
    boiler = "this standard license header appears on every single page"
    left = spark.createDataFrame(
        [(1, boiler + " plus the unique secret fact about cats")],
        ["doc_id", "text"],
    )
    right = spark.createDataFrame(
        [(10 + i, boiler + f" filler {i} only here") for i in range(5)]
        + [(99, "nothing else has the unique secret fact about cats here")],
        ["doc_id", "text"],
    )
    from spark_streaming_project_spark.operators.sampling import ngram_overlap

    uncapped = {
        r["doc_id"]: (r["shared_grams"], r["right_docs"])
        for r in ngram_overlap(left, right, "text", "doc_id", n=5).collect()
    }
    capped = {
        r["doc_id"]: (r["shared_grams"], r["right_docs"])
        for r in ngram_overlap(
            left, right, "text", "doc_id", n=5, max_right_df=2
        ).collect()
    }
    # uncapped: boilerplate grams hit all 5 boiler docs + the real match
    assert uncapped[1][1] == 6
    # capped: the 5-doc boilerplate grams are gone; the unique 5-gram
    # "the unique secret fact about"/"unique secret fact about cats"
    # (df=1) still links doc 99
    assert capped[1] == (2, 1)


def test_weighted_sample_matches_direct_computation(spark):
    """E-S keys are pure functions of (id, weight); the operator's top-k
    must equal the same formula evaluated in Python."""
    import hashlib

    from spark_streaming_project_spark.operators.sampling import weighted_sample

    rows = [(i, float(10 + 90 * (i % 7))) for i in range(50)]
    df = spark.createDataFrame(rows, "id bigint, w double")

    def key(i, w):
        h = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / (2**32 + 1.0)
        return u ** (1.0 / w)

    want = sorted(rows, key=lambda r: (-key(*r), r[0]))[:10]
    got = weighted_sample(df, "id", "w", k=10).collect()
    assert [(r["id"], r["w"]) for r in got] == [(i, w) for i, w in want]
    for r in got:
        assert r["sample_key"] == round(key(r["id"], r["w"]), 6)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from spark_streaming_project_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "id bigint, w double"
    )
    got = weighted_sample(df, "id", "w", k=10).collect()
    assert [r["id"] for r in got] == [1]


def test_weighted_sample_weight_monotone_in_expectation(spark):
    """With weight >> others, the heavy row should (nearly) always make a
    small sample — checked deterministically: a row with astronomically
    larger weight has key u^(1/w) -> 1, beating any u^(1) draw."""
    from spark_streaming_project_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0) for i in range(100)] + [(999, 1e9)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    got = {r["id"] for r in weighted_sample(df, "id", "w", k=5).collect()}
    assert 999 in got


def test_dsir_weights_match_pure_python(spark):
    """dsir_log_weights on a crafted corpus == a direct NumPy-free Python
    reference: same hashed buckets, same smoothed log-ratio, same per-doc
    sums."""
    import hashlib
    import math

    rows = [
        (1, "alpha beta alpha", True),
        (2, "beta gamma", True),
        (3, "delta delta epsilon", False),
        (4, "alpha delta", False),
        (5, None, False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")

    from spark_streaming_project_spark.operators.sampling import dsir_log_weights

    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_log_weights(
            df, "text", "doc_id", F.col("tgt"), n_buckets=8
        ).collect()
    }

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % 8

    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for doc_id, text, tgt in rows:
        if text is None:
            continue
        for tok in text.split():
            b = bucket(tok)
            cr[b] = cr.get(b, 0) + 1
            if tgt:
                ct[b] = ct.get(b, 0) + 1
            per_doc.setdefault(doc_id, {})[b] = per_doc.get(doc_id, {}).get(b, 0) + 1
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    lr = {
        b: math.log((ct.get(b, 0) + 1.0) / (t_tot + 8.0))
        - math.log((cr[b] + 1.0) / (r_tot + 8.0))
        for b in cr
    }
    want = {
        d: sum(n * lr[b] for b, n in bs.items()) for d, bs in per_doc.items()
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_dsir_resample_prefers_target_like_docs(spark):
    """End-to-end selection property at sf0.001: the Gumbel top-k over DSIR
    weights is deterministic across reruns, and the mean selected weight
    exceeds the corpus mean (importance resampling pulls toward the
    target slice)."""
    from spark_streaming_project_spark.operators.sampling import (
        dsir_log_weights,
        dsir_resample,
    )

    docs = _docs(spark)
    w = dsir_log_weights(
        docs, "text", "doc_id", F.col("source").isin("src0", "src1", "src2")
    )
    pick1 = {r["doc_id"] for r in dsir_resample(w, "doc_id", k=20).collect()}
    pick2 = {r["doc_id"] for r in dsir_resample(w, "doc_id", k=20).collect()}
    assert pick1 == pick2 and len(pick1) == 20

    mean_all = w.agg(F.avg("dsir_logw")).first()[0]
    mean_sel = (
        w.join(dsir_resample(w, "doc_id", k=20).select("doc_id"), "doc_id")
        .agg(F.avg("dsir_logw"))
        .first()[0]
    )
    assert mean_sel > mean_all


# ---------------------------------------------------------------------------
# Temperature mixture apportionment
# ---------------------------------------------------------------------------


def test_temperature_targets_exact_total_and_flattening(spark):
    """Largest-remainder apportionment hands out EXACTLY k_total slots,
    and alpha=0.5 flattens the head: the small source's share exceeds its
    proportional share, the big source's falls below it."""
    from spark_streaming_project_spark.operators.sampling import (
        temperature_targets,
    )

    sizes = spark.createDataFrame(
        [("big", 90000), ("mid", 9000), ("small", 1000)],
        "source string, n long",
    )
    got = {
        r["source"]: r["target_k"]
        for r in temperature_targets(sizes, "source", "n", 100).collect()
    }
    assert sum(got.values()) == 100
    assert got["small"] > 100 * 1000 / 100000     # over proportional
    assert got["big"] < 100 * 90000 / 100000      # under proportional
    # sqrt weights 300.0M/94.87M/31.62M of 426.49M -> bases 70/22/7,
    # one leftover slot to the largest remainder (small)
    assert got == {"big": 70, "mid": 22, "small": 8}


def test_temperature_targets_ties_and_tiny_quotas(spark):
    """Equal sizes split a non-divisible k_total by the deterministic
    (remainder desc, key asc) rule — first keys in name order absorb the
    leftover; every run and partitioning agrees."""
    from spark_streaming_project_spark.operators.sampling import (
        temperature_targets,
    )

    sizes = spark.createDataFrame(
        [(f"s{i}", 100) for i in range(6)], "source string, n long"
    )
    got = {
        r["source"]: r["target_k"]
        for r in temperature_targets(sizes, "source", "n", 10).collect()
    }
    assert sum(got.values()) == 10
    # 10/6 -> base 1 each, 4 leftover to s0..s3 by key order
    assert got == {"s0": 2, "s1": 2, "s2": 2, "s3": 2, "s4": 1, "s5": 1}


def test_temperature_mixture_sample_respects_quotas_and_small_sources(spark):
    """The drawn sample holds every key at min(target_k, key size) and is
    repartition-invariant."""
    from spark_streaming_project_spark.operators.sampling import (
        temperature_mixture_sample,
        temperature_targets,
    )

    rows = [(i, "big") for i in range(50)] + [(100 + i, "tiny") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    sizes = df.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    targets = temperature_targets(sizes, "source", "n", 20)
    tk = {r["source"]: r["target_k"] for r in targets.collect()}
    sel = temperature_mixture_sample(df, "source", targets, "doc_id")
    got = {r["source"]: 0 for r in sel.collect()}
    for r in sel.collect():
        got[r["source"]] = got.get(r["source"], 0) + 1
    counts = (
        sel.groupBy("source").agg(F.count("*").alias("c")).collect()
    )
    by_src = {r["source"]: r["c"] for r in counts}
    assert by_src["big"] == tk["big"]
    assert by_src["tiny"] == min(tk["tiny"], 2)
    again = set(
        (r["doc_id"], r["source"])
        for r in temperature_mixture_sample(
            df.repartition(13), "source", targets, "doc_id"
        ).collect()
    )
    assert again == {(r["doc_id"], r["source"]) for r in sel.collect()}
