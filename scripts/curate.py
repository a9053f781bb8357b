#!/usr/bin/env python
"""Corpus curation CLI: run the composed curation pipeline
(`plans/quality.curation_verdicts` — exact dedup + Gopher rules + span
dedup + eval-set decontamination) over a documents table and publish the
kept corpus.

    python scripts/curate.py --sf-dir /root/testdata/sf0.1 --out /tmp/curated

Writes:
    <out>/kept/        parquet of surviving documents (all source columns)
    <out>/verdicts/    parquet of per-doc verdicts (audit trail)
    <out>/train_ready/ kept corpus, PII-redacted, partitioned by
                       leakage-safe split (split bucket = md5 of the
                       near-dup cluster representative, so no near-dup
                       pair straddles train/val/test)
    <out>/report.json  one-line attrition + redaction + split summary

The pipeline is one declarative plan end-to-end: the verdicts join prunes
to (doc_id + flags), the kept-corpus write joins verdicts back to the full
rows, and both writes share the scan (no per-stage materialization).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark
    from spark_streaming_project_spark.sources.batch import load_table

    spark = get_spark(app_name="curate")
    verdicts = REGISTRY["curation_verdicts"].builder(spark, args.sf_dir)
    docs = load_table(spark, args.sf_dir, "documents")

    vpath = os.path.join(args.out, "verdicts")
    kpath = os.path.join(args.out, "kept")
    tpath = os.path.join(args.out, "train_ready")
    verdicts.write.mode("overwrite").parquet(vpath)
    v = spark.read.parquet(vpath)  # reuse the materialized verdicts
    kept_docs = docs.join(v.filter(F.col("keep")).select("doc_id"), "doc_id")
    kept_docs.write.mode("overwrite").parquet(kpath)

    # Ship-ready tail: PII-redact the kept text, then assign every doc the
    # md5 split bucket of its near-dup CLUSTER representative (leakage-safe
    # — see plans/llm.leakage_safe_splits) and publish partitioned by split
    # so a trainer reads one split via partition pruning.
    from spark_streaming_project_spark.operators.pii import pii_redact, pii_scan
    from spark_streaming_project_spark.plans.llm import (
        _split_expr,
        dedup_canonical_map,
    )

    kept = spark.read.parquet(kpath)  # reuse the materialized kept corpus
    pii_hits = (
        pii_scan(kept, "text")
        .agg(F.sum("pii_total_n").alias("n"))
        .collect()[0]["n"]
    ) or 0
    cmap = dedup_canonical_map(spark, args.sf_dir)
    shipped = (
        pii_redact(kept, "text")
        .join(cmap, "doc_id")
        .withColumn("split", _split_expr(F.col("canonical_id")))
        .drop("canonical_id")
    )
    shipped.write.mode("overwrite").partitionBy("split").parquet(tpath)
    split_counts = {
        r["split"]: r["n"]
        for r in spark.read.parquet(tpath)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    stats = v.agg(
        F.count("*").alias("total"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum((~F.col("pass_exact_dedup")).cast("long")).alias("exact_dups"),
        F.sum((~F.col("pass_gopher")).cast("long")).alias("gopher_fails"),
        F.sum((~F.col("pass_span")).cast("long")).alias("span_dup_fails"),
        F.sum(F.col("contaminated").cast("long")).alias("contaminated"),
    ).collect()[0]
    report = {
        "sf_dir": args.sf_dir,
        "total_docs": stats["total"],
        "kept_docs": stats["kept"],
        "kept_frac": round(stats["kept"] / stats["total"], 4),
        "dropped_exact_dup": stats["exact_dups"],
        "dropped_gopher": stats["gopher_fails"],
        "dropped_span_dup": stats["span_dup_fails"],
        "dropped_contaminated": stats["contaminated"],
        "pii_matches_redacted": int(pii_hits),
        "split_doc_counts": split_counts,
        "kept_path": kpath,
        "verdicts_path": vpath,
        "train_ready_path": tpath,
    }
    with open(os.path.join(args.out, "report.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
