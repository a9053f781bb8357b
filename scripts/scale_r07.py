#!/usr/bin/env python
"""10x growth measurements for the round-7 tiers (SCALE.md evidence):
hourly_autocorrelation / hourly_ewma_trend (10x events), cdc_chunk_dedup
(10x documents), join_size_estimate_cms (10x events vs sf0.1 orders).

Reuses scripts/scale_stress.py's derived corpus (_scale/sf1x) and exposes
it to the unchanged registry builders through a symlink dir that overlays
the derived tables on sf0.1. Run: python scripts/scale_r07.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
DERIVED = os.path.join(REPO, "_scale", "sf1x")
OVERLAY = os.path.join(REPO, "_scale", "sf1x_overlay")

QUERIES = [
    "hourly_autocorrelation",
    "hourly_ewma_trend",
    "cdc_chunk_dedup",
    "join_size_estimate_cms",
    "seasonal_hourly_baseline",
    "cdc_chunk_doc_clusters",
    "event_markov_stationary",
    "purchase_attribution",
    "events_rollup_lattice",
    "attribution_markov_removal",
    "orders_point_in_time_segment",
    "rerank_crossencoder_topk",
    "purchase_attribution_time_decay",
    "embedding_top_pc",
    "embedding_pc1_label_profile",
    "embedding_pc1_variance_share",
    "neardup_hub_distances",
    "part_cf_neighbors",
    "preference_pairs",
    "media_phash_near_dups",
    "hourly_holt_winters",
    "error_burn_rate",
    "sampled_revenue_estimate",
]


def ensure_overlay() -> None:
    import scripts.scale_stress as ss

    if not os.path.exists(os.path.join(DERIVED, "embeddings.parquet")):
        ss.build_derived()
    if not os.path.exists(os.path.join(DERIVED, "events.parquet")):
        ss.build_derived_events()
    os.makedirs(OVERLAY, exist_ok=True)
    for f in os.listdir(SRC_SF):
        dst = os.path.join(OVERLAY, f)
        if os.path.lexists(dst):
            continue
        src = os.path.join(DERIVED, f)
        os.symlink(src if os.path.exists(src) else os.path.join(SRC_SF, f), dst)


def main() -> None:
    ensure_overlay()
    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="scale-r07", shuffle_partitions=32)
    for name in QUERIES:
        for label, sf in (("sf0.1", SRC_SF), ("10x", OVERLAY)):
            # noop sink, NOT .count(): Catalyst eliminates provably
            # non-expanding joins under count() on a downstream
            # aggregate, silently skipping the pipeline being measured
            # (found round 8 via dedup_token_savings; SCALE.md note)
            t0 = time.monotonic()
            REGISTRY[name].builder(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            print(json.dumps({"tier": name, "scale": label,
                              "sec": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
