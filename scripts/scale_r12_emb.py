#!/usr/bin/env python
"""TRUE-sf1 anchor for the EMBEDDINGS table (round 12).

_scale/sf1_true (the r10 script) re-runs the observed generative process
for documents and supplier only, so every embeddings-family SCALE row has
had to lean on the replication overlay. This script closes that gap the
same way: profile sf0.1's embeddings and RE-SAMPLE 10x fresh vectors —
not copies.

Profile (measured from sf0.1): 2,000 unit-norm 64-d vectors; label ~
near-uniform multinomial over 10 classes (182..218 per class); per-class
per-dim std ~0.125 = 1/sqrt(64) (isotropic Gaussian before
normalization) with per-class mean offsets of ~0.01/dim — the faint
cluster structure the ANN docstrings call "barely clusters". True sf1 =
per class, 10x the observed count of fresh draws mean_l + N(0, std_l)
per dim, renormalized to unit length, cast to float32 (seeded, so the
anchor is reproducible).

Output: _scale/sf1_true_emb/ with the resampled embeddings + sf0.1
passthrough for every other table. Protocol for the measured rows: noop
sink, clearCache between runs, one untimed warm-up per query; ANN recall
re-derives brute-force truth ON the 10x table. Run:

    python scripts/scale_r12_emb.py          # build + measure
    python scripts/scale_r12_emb.py build    # build only
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.1"
DERIVED = os.path.join(REPO, "_scale", "sf1_true_emb")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = [
    "label_pair_affinity",
    "label_silhouette",
    "embedding_outliers",
    "label_centroid_similarity",
]

ANN_TIERS = [
    "similarity_ivf_topk",
    "similarity_ivf_kmeans_topk",
    "similarity_ivfpq_topk",
    "similarity_lsh_multiprobe_topk",
]


def build() -> None:
    os.makedirs(DERIVED, exist_ok=True)
    dst = os.path.join(DERIVED, "embeddings.parquet")
    if not os.path.exists(dst):
        src = pq.read_table(os.path.join(SRC_SF, "embeddings.parquet"))
        emb = np.vstack(
            [np.array(x, dtype=np.float64) for x in src["embedding"].to_pylist()]
        )
        lab = np.array(src["label"].to_pylist())
        rng = np.random.default_rng(12)
        out_vecs, out_lab = [], []
        for l in np.unique(lab):
            m = emb[lab == l]
            mean, std = m.mean(axis=0), m.std(axis=0)
            n = len(m) * 10
            draws = mean + rng.standard_normal((n, emb.shape[1])) * std
            draws /= np.linalg.norm(draws, axis=1, keepdims=True)
            out_vecs.append(draws.astype(np.float32))
            out_lab.append(np.full(n, l, dtype=np.int32))
        vecs = np.vstack(out_vecs)
        labs = np.concatenate(out_lab)
        order = rng.permutation(len(labs))  # interleave classes like the source
        vecs, labs = vecs[order], labs[order]
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(len(labs), dtype=np.int64)),
                "embedding": pa.array(
                    [v for v in vecs.tolist()], pa.list_(pa.float32())
                ),
                "label": pa.array(labs, pa.int32()),
            }
        )
        pq.write_table(tbl, dst)
        print(f"built {dst}: {len(labs)} vectors", flush=True)
    for t in TABLES:
        if t == "embeddings":
            continue
        link = os.path.join(DERIVED, f"{t}.parquet")
        if not os.path.exists(link):
            shutil.copyfile(os.path.join(SRC_SF, f"{t}.parquet"), link)


def measure() -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_streaming_project_spark.plans import REGISTRY

    def run(name, sf):
        t0 = time.perf_counter()
        REGISTRY[name].builder(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    for name in QUERIES:
        run(name, SRC_SF)  # warm-up
        base = run(name, SRC_SF)
        run(name, DERIVED)
        true10 = run(name, DERIVED)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf0.1_sec": round(base, 2),
                    "true10x_sec": round(true10, 2),
                    "growth": round(true10 / base, 2),
                }
            ),
            flush=True,
        )

    # ANN recall on the 10x table: fresh brute-force truth, same builders
    truth = {
        r["vec_id"]
        for r in REGISTRY["similarity_bruteforce_topk"]
        .builder(spark, DERIVED)
        .collect()
    }
    for name in ANN_TIERS:
        got = {
            r["vec_id"] for r in REGISTRY[name].builder(spark, DERIVED).collect()
        }
        print(
            json.dumps(
                {"tier": name, "recall_at_10_true10x": len(got & truth) / 10.0}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    build()
    if "build" not in sys.argv[1:]:
        measure()
