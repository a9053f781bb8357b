"""Multimodal plumbing tests (BASELINE.json north-star): decode, resize,
frame-sample, feature-extract — all Arrow-batched ``mapInPandas`` with
deterministic stub semantics that plain Python can recompute exactly, and
shuffle-free physical plans (scan -> mapInPandas, no Exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.multimodal import (
    decode_assets,
    documents_as_assets,
    extract_features,
    resize_assets,
    resize_stub,
    sample_frames,
)
from spark_streaming_project_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


def _assets(spark, n=20):
    docs = load_table(spark, SF, "documents").filter(F.col("text").isNotNull())
    return documents_as_assets(docs.limit(n))


def test_resize_matches_python_stub(spark):
    assets = _assets(spark)
    rows = resize_assets(assets, width=8, height=8).collect()
    src = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    assert rows
    for r in rows:
        assert r["width"] == 8 and r["height"] == 8
        expected = resize_stub(src[r["asset_id"]], 8, 8)
        assert bytes(r["resized"]) == expected
        assert len(bytes(r["resized"])) == 64


def test_sample_frames_fan_out_and_slices(spark):
    assets = _assets(spark, n=10)
    rows = sample_frames(assets, n_frames=4, frame_interval_ms=500).collect()
    src = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    assert len(rows) == 4 * len(src)  # 1 -> N fan-out inside mapInPandas
    for r in rows:
        payload = src[r["asset_id"]]
        step = max(1, len(payload) // 4)
        i = r["frame_idx"]
        assert r["ts_ms"] == i * 500
        assert bytes(r["frame"]) == payload[i * step : i * step + step]


def test_extract_features_feed_ann(spark):
    """Feature vectors must be unit-l2 array<float> usable by the
    similarity operators (same column contract as `embeddings`)."""
    from spark_streaming_project_spark.operators.similarity import (
        brute_force_topk,
    )

    assets = _assets(spark, n=30)
    feats = extract_features(assets, dim=16)
    schema = dict(feats.dtypes)
    assert schema["feature"] == "array<float>"
    sample = feats.limit(5).collect()
    for r in sample:
        sq = sum(x * x for x in r["feature"])
        assert abs(sq - 1.0) < 1e-5 or sq == 0.0
    qid = sample[0]["asset_id"]
    topk = brute_force_topk(
        feats.withColumnRenamed("asset_id", "vec_id").withColumnRenamed(
            "feature", "embedding"
        ),
        "vec_id",
        "embedding",
        qid,
        k=5,
    ).collect()
    assert len(topk) == 5
    sims = [r["cosine_sim"] for r in topk]
    assert sims == sorted(sims, reverse=True)


def test_multimodal_plans_have_no_exchange(spark):
    """Every multimodal pass must plan executor-local: no Exchange between
    the scan and the Python runner (the 100 TB contract). (No .limit here:
    GlobalLimit itself inserts a SinglePartition exchange.)"""
    docs = load_table(spark, SF, "documents").filter(F.col("text").isNotNull())
    assets = documents_as_assets(docs)
    for df in (
        decode_assets(assets),
        resize_assets(assets),
        sample_frames(assets),
        extract_features(assets),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
