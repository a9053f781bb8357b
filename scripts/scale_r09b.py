#!/usr/bin/env python
"""sf0.1 -> 10x overlay measurements for the six queries built after the
r09 recording window froze (the declared _R10_FIRSTS set): scale rows land
in SCALE.md next to every other registry family.

Same protocol as scale_r08/r09: noop sink (never .count() — Catalyst join
elimination can skip the measured pipeline under a count), fresh cache per
query, one warm-up action per session. Run: python scripts/scale_r09b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
OVERLAY = os.path.join(REPO, "_scale", "sf1x_overlay")

QUERIES = [
    "source_psi_drift",
    "interarrival_profile",
    "source_centroid_similarity",
    "jl_projection_distortion",
    "neardup_source_matrix",
    "simhash_hamming_histogram",
    "monthly_revenue_seasonality",
    "label_silhouette",
    "similarity_jl_rerank_topk",
    "dup_quality_correlation",
    "lang_length_kruskal",
    "minhash_band_sweep",
    "session_conversion_rate",
]


def main() -> None:
    only = set(sys.argv[1:])
    import scripts.scale_r08 as r08

    r08.ensure_overlay()
    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="scale-r09b", shuffle_partitions=32)
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
