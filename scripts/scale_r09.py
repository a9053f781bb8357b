#!/usr/bin/env python
"""sf0.1 -> sf1 (10x overlay) measurements for the top-10 bench hotspots
(VERDICT r8 ask #5): the queries BENCH_FULL_r08.json ranks most expensive
that still lack a measured growth row in SCALE.md.

Reuses the r07/r08 derived overlay (documents/embeddings/events 10x with
near-dup cliques; customer/orders/lineitem 10x with offset keys) and adds
a 10x SUPPLIER tier for the entity-resolution hotspots: replicas share
names (s_suppkey*16+r), so every supplier name becomes a 10-clique —
the same hostile density axis the documents overlay uses, and exactly
what stresses blocked pair generation (within-block candidates grow
quadratically in clique size while blocking keeps them off n^2).

Protocol: noop sink (NEVER .count() — Catalyst join elimination skips
the pipeline under a count; see SCALE.md r08 measurement-integrity
note), fresh-cache per query, one warm-up action per session.
Run: python scripts/scale_r09.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
DERIVED = os.path.join(REPO, "_scale", "sf1x")
OVERLAY = os.path.join(REPO, "_scale", "sf1x_overlay")
REPLICAS = 10

# Ordered cheap-first; the two entity-resolution tiers run LAST (and can
# be selected alone via argv) because the 10x supplier catalog is the
# measured worst case for q-gram count-filter blocking: near-identical
# names share almost every bigram, so candidates grow ~quadratically in
# catalog size — the finding itself is the point of the row.
QUERIES = [
    "neardup_centrality",
    "curation_verdicts",
    "neardup_centrality_quantized",
    "neardup_triangle_census",
    "dedup_method_agreement",
    "split_leakage_check",
    "neardup_degree_assortativity",
    "cdc_cross_source_matrix",
    "dedup_component_sizes_bucketed",  # new r09 flagship rides along
    "snm_blocking_eval",
    "supplier_entity_clusters",
]


def build_supplier_tier() -> None:
    dst = os.path.join(DERIVED, "supplier.parquet")
    if os.path.exists(dst):
        return
    src = pq.read_table(os.path.join(SRC_SF, "supplier.parquet"))
    import pyarrow.compute as pc

    replicas = []
    for r in range(REPLICAS):
        cols = {}
        for name in src.column_names:
            col = src.column(name)
            if name == "s_suppkey":
                vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
                cols[name] = pa.array(vals * 16 + r, pa.int64())
            elif name == "s_name":
                # two-char replica tag: cross-replica name distance is 2,
                # above the Levenshtein<=1 verify, so suppliers grow 10x
                # LINEARLY (the honest "more suppliers" axis). Replicating
                # names verbatim makes every name a 10-clique and the
                # verified pair set grows ~100x — measured to thrash the
                # sf0.1-sized heap; that clique axis is the documents
                # overlay's job, not the entity-resolution tier's.
                cols[name] = pc.binary_join_element_wise(
                    pa.array([f"r{r}"] * len(col)), col.cast(pa.string()), ""
                )
            else:
                cols[name] = col
        replicas.append(pa.table(cols))
    pq.write_table(pa.concat_tables(replicas), dst)


def ensure_overlay() -> None:
    import scripts.scale_r08 as r08

    r08.ensure_overlay()
    build_supplier_tier()
    link = os.path.join(OVERLAY, "supplier.parquet")
    target = os.path.join(DERIVED, "supplier.parquet")
    if os.path.islink(link) and os.readlink(link) != target:
        os.unlink(link)
    if not os.path.lexists(link):
        os.symlink(target, link)


def main() -> None:
    import sys as _sys

    only = set(_sys.argv[1:])
    ensure_overlay()
    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="scale-r09", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in QUERIES:
        if only and name not in only:
            continue
        for label, sf in (("sf0.1", SRC_SF), ("10x", OVERLAY)):
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
