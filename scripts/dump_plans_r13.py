#!/usr/bin/env python
"""Dump .explain("formatted") for a list of registered queries into
plans/r13/<query>_<suffix>.txt — the before/after plan evidence for the
r13 optimization round (guide §1.1: capture the plan shape before and
after every change).

Usage: python scripts/dump_plans_r13.py before|after [names ...]
Default name list = the r13 touch list below.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r13")

# Queries examined/touched in the r13 optimization round.
TOUCH_LIST = [
    # minhash near-dup pair-graph family (operators/dedup.py + graph.py)
    "dedup_minhash_pairs",
    "neardup_centrality",
    "neardup_centrality_quantized",
    "neardup_hub_distances",
    "neardup_kcore",
    "neardup_degree_histogram",
    "neardup_degree_assortativity",
    "neardup_local_clustering",
    "neardup_triangle_census",
    "nearest_duplicate_per_doc",
    "dedup_component_sizes",
    "dedup_component_sizes_bucketed",
    "dedup_canonical_map",
    "dedup_method_agreement",
    "leakage_safe_splits",
    "dedup_containment_pairs",
    # content-defined chunking family (operators/chunking.py)
    "cdc_chunk_dedup",
    "cdc_chunk_doc_clusters",
    "cdc_cross_source_matrix",
    "cdc_decontamination",
    # exact-substring family
    "dedup_exact_substring_pairs",
    "dedup_substring_trim_plan",
    # n-gram jaccard family
    "dedup_ngram_jaccard_pairs",
    "dedup_ngram_jaccard_pairs_prefix",
    # similarity / ANN (operators/similarity.py)
    "ann_probe_sweep",
    "coreset_kcenter_selection",
    "similarity_bruteforce_topk",
    "similarity_ivf_topk",
    "hard_negative_mining",
    "semdedup_audit",
    "text_embedding_topk",
    # text / quality heavies
    "curation_verdicts",
    "eval_containment_audit",
    "winnowing_matches",
    "winnowing_profile",
    "winnowing_hot_fingerprints",
    "repetition_signals",
    "nb_crossval_accuracy",
    "bpe_compression_curve",
    "dedup_keep_longest",
    "dup_quality_correlation",
    "snm_blocking_eval",
    "supplier_entity_clusters",
    "part_cf_neighbors",
    "corpus_duplicate_spans",
    "padding_waste_curve",
    "rfm_segments",
    "snm_candidate_pairs",
]


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:] or TOUCH_LIST
    os.makedirs(OUT, exist_ok=True)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_streaming_project_spark.plans import REGISTRY

    for name in names:
        try:
            df = REGISTRY[name].builder(spark, SF)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
