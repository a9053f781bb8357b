#!/usr/bin/env python
"""100x growth measurements (sf0.1 -> sf10-equivalent): one decade past
the sf1 ladder, for aggregate-shaped tiers whose claimed exponents are
flat/linear — the rows where a second measured decade either confirms the
claim or exposes a hidden super-linear term.

Overlay semantics: fact tables (documents, events, embeddings, orders,
lineitem) replicate 100x with offset keys; dimensions stay fixed (parts
are a catalog, orders are a log — the honest 100 TB shape). Document text
gets a per-replica token tag so near-dup structure does NOT densify into
100-cliques (the supplier-tier lesson: verbatim replication measures a
pathological corpus, not scale). Pair-emitting tiers are deliberately NOT
in this list — their 10x rows with clique semantics live in scale_r09.

Protocol: noop sink, fresh cache per query, one untimed warm-up run per
query (at this scale the measurement should be the engine, not codegen
JIT). Run: python scripts/scale_r09c.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
DERIVED = os.path.join(REPO, "_scale", "sf10x")
OVERLAY = os.path.join(REPO, "_scale", "sf10x_overlay")
REPLICAS = 100

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# table -> (int64 key columns to offset per replica). BLOCK offsets
# (orig + r * 2^24) keep replica key spaces disjoint while preserving id
# ADJACENCY within each replica — a multiplicative stride (orig*128+r)
# silently destroyed the id-adjacent pair sample of
# jl_projection_distortion (empty pairs -> the divide-by-zero its guard
# now covers), and would distort any query whose semantics read id
# locality.
BLOCK = 1 << 24
FACTS = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
}

QUERIES = [
    "source_psi_drift",
    "interarrival_profile",
    "source_centroid_similarity",
    "jl_projection_distortion",
    "label_silhouette",
    "similarity_jl_rerank_topk",
    "monthly_revenue_seasonality",
    "pricing_summary",
    "dedup_exact_groups",
    "vocab_top_tokens",
]


def build_tier(table: str) -> None:
    dst = os.path.join(DERIVED, f"{table}.parquet")
    if os.path.exists(dst):
        return
    src = pq.read_table(os.path.join(SRC_SF, f"{table}.parquet"))
    keys = FACTS[table]
    writer = None
    try:
        for r in range(REPLICAS):
            cols = {}
            for name in src.column_names:
                col = src.column(name)
                if name in keys:
                    vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
                    cols[name] = pa.array(vals + r * BLOCK, pa.int64())
                elif table == "documents" and name == "text":
                    # per-replica token tag: replicas are NEW documents,
                    # not 100-cliques of the same one
                    cols[name] = pc.binary_join_element_wise(
                        col.cast(pa.string()),
                        pa.array([f"r{r}"] * len(col)),
                        " ",
                    )
                else:
                    cols[name] = col
            t = pa.table(cols)
            if writer is None:
                writer = pq.ParquetWriter(dst, t.schema)
            writer.write_table(t)
    finally:
        if writer is not None:
            writer.close()


def ensure_overlay() -> None:
    os.makedirs(DERIVED, exist_ok=True)
    os.makedirs(OVERLAY, exist_ok=True)
    for table in FACTS:
        build_tier(table)
    for table in ALL_TABLES:
        link = os.path.join(OVERLAY, f"{table}.parquet")
        target = (
            os.path.join(DERIVED, f"{table}.parquet")
            if table in FACTS
            else os.path.join(SRC_SF, f"{table}.parquet")
        )
        if os.path.islink(link) and os.readlink(link) != target:
            os.unlink(link)
        if not os.path.lexists(link):
            os.symlink(target, link)


def main() -> None:
    only = set(sys.argv[1:])
    ensure_overlay()
    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="scale-r09c", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in QUERIES:
        if only and name not in only:
            continue
        for label, sf in (("sf0.1", SRC_SF), ("100x", OVERLAY)):
            spark.catalog.clearCache()
            REGISTRY[name].builder(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()  # untimed warm-up: JIT + parquet footers
            spark.catalog.clearCache()
            t0 = time.monotonic()
            REGISTRY[name].builder(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            print(
                json.dumps({"tier": name, "scale": label, "sec": round(dt, 2)}),
                flush=True,
            )


if __name__ == "__main__":
    main()
