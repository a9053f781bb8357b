#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for one flagship query
per family, each with a short note on the scale-relevant shape to check
(broadcasts, TakeOrderedAndProject, partial aggregation, no cartesian).

    python scripts/explain_audit.py            # writes PLANS.md
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

# (query, what the plan should show)
SHOWCASE = [
    ("top_sugary_products_by_category",
     "The flagship W1 window argmax: partitioned window (no global sort), "
     "filter pushed to the parquet scan."),
    ("pricing_summary",
     "TPC-H Q1 shape: ONE exchange; everything else is partial_/merge_ "
     "hash aggregation around it (map-side combine), decimal-exact sums."),
    ("top_categories_with_other",
     "Top-N + residual: TakeOrderedAndProject for the winner cut (per-"
     "partition k, no global sort), broadcast of the bounded winner set."),
    ("dedup_minhash_pairs",
     "MinHash LSH banding: signatures computed per-row (no explode of "
     "shingles through the shuffle), band-keyed equi-join — candidates, "
     "never an all-pairs product."),
    ("similarity_ivfpq_det_topk",
     "IVFPQ ANN: centroid/codebook sidecars broadcast; probed lists only "
     "(partition-prunable at scale); ADC shortlist then exact re-rank."),
    ("hybrid_rrf_search",
     "Two-tower hybrid retrieval: each tower ends in a bounded top-20 "
     "(TakeOrderedAndProject); the RRF fuse is a broadcast-able 20x20 "
     "full outer join; dense query vector is a one-row broadcast."),
    ("leakage_safe_splits",
     "Cluster-keyed split assignment: the near-dup CC map (banded join + "
     "pointer jumping) feeds a pure md5 projection + one keyed aggregate."),
    ("sliding_distinct_sketch",
     "Sliding distinct via sketch merge: per-hour HLL registers (<= 64 "
     "rows/hour) explode 3x and merge — window widening touches sketch "
     "rows, never the raw events again; hours dim is broadcast."),
    ("bloom_dedup_verdicts",
     "Bloom history probe: the filter collapses to <= 261 bit_or words, "
     "densifies to ONE array row, and attaches by broadcast nested-loop "
     "join — the probed batch is a map-only scan, no probe-side "
     "shuffle."),
    ("snm_candidate_pairs",
     "Sorted-neighborhood blocking: global rank from repartitionByRange "
     "+ bounded slice sidecar (never a single-task window), neighbors "
     "from a dense-integer block equi-join with a shifted probe copy."),
    ("nb_lang_confusion",
     "One-pass NB train + score: (token,label) aggregate with map-side "
     "combine, vocab x labels dense grid broadcast back, integer score "
     "sums, per-doc argmax window bounded by the label count."),
    ("top_tokens_per_source_sharded",
     "Two-phase sharded top-k: phase-1 windows partition by (group, "
     "shard) so no partition holds a whole group's vocab; phase 2 "
     "re-ranks <= shards*k survivors per group."),
    ("reorder_survival_curve",
     "Kaplan-Meier with censoring: integer risk sets and the survival "
     "product both ride the range-partitioned prefix machinery (two "
     "bounded-sidecar passes) — no single-task window anywhere."),
    ("rfm_segments",
     "Three chained guarded ntiles (recency/frequency/monetary) over "
     "the customer frame: each is repartitionByRange + broadcast "
     "offsets; the roll-up is one tiny 5x5x5 aggregate."),
    ("hourly_autocorrelation",
     "Exact integer ACF: one map-side-combined hourly count aggregate, "
     "the bounded hours x types grid, a <=24x lag fan-out equi-join on "
     "the shifted hour — no unbounded per-type window, DECIMAL(38,0) "
     "product sums with one terminal division."),
    ("cdc_chunk_dedup",
     "Content-defined chunking: boundary detection, span recovery and "
     "chunk hashing are ONE narrow higher-order-function projection "
     "(no shuffle, no explode-regroup of positions); the only exchange "
     "is the final chunk-hash-keyed ledger aggregate."),
    ("purchase_attribution",
     "Multi-touch attribution: the touch x purchase pairing is the "
     "binned interval EQUI-join (bounded 4-bucket fan-out per purchase, "
     "never an inequality nested loop); per-purchase ranking is a keyed "
     "window capped by the lookback fan-in; 5-row channel aggregate."),
    ("events_rollup_lattice",
     "Continuous-aggregate reuse: raw events feed ONE hour-partial "
     "aggregate, collected as an hours-bounded sidecar; day/week "
     "re-aggregate the LOCAL frame (Scan ExistingRDD below — zero "
     "parquet scans at query time; before the sidecar fix each union "
     "branch replayed the raw scan)."),
    ("orders_point_in_time_segment",
     "Point-in-time SCD2 join: the as-of union+window form — ONE "
     "custkey exchange, latest valid_from <= order date carried by a "
     "keyed window; no validity-range inequality join."),
    ("rerank_crossencoder_topk",
     "Two-stage retrieval: BM25 recall ends in TakeOrderedAndProject "
     "(top-50); the expensive reranker is ArrowEvalPython over exactly "
     "those 50 rows — candidate pruning caps the model-cost stage "
     "regardless of corpus size."),
    ("embedding_pc1_label_profile",
     "Quantized PCA: the d^2-cell moment aggregate is the only "
     "data-proportional work (map-side combined); the eigensolve is "
     "driver-side on the bounded frame; the projection pass is map-only "
     "zip_with over broadcast literal arrays + one label aggregate."),
    ("coreset_kcenter_selection",
     "Greedy k-center coreset: each round is one narrow zip_with "
     "projection against a broadcast-literal center + TakeOrdered(1); "
     "the running dmin frame is persisted between rounds "
     "(InMemoryTableScan below) so round r never replays rounds "
     "0..r-1 — k bounded passes, no shuffle, no join."),
    ("hard_negative_mining",
     "Hard-negative mining: banded-LSH skinny (id, band, bucket) "
     "candidate keys, verify-once vector join, per-anchor ranking "
     "window bounded by collision fan-out — never an anchor x "
     "candidate product."),
    ("dedup_component_sizes_bucketed",
     "Bucketed co-located CC (r09): the final histogram plan reads the "
     "checkpointed label frame; the per-round join shape — bucketed "
     "edge scan with NO edge-side Exchange — is pinned separately in "
     "tests/test_plan_audit.py (2 vs 3 exchanges, Bucketed:true)."),
    ("minhash_estimate_error",
     "MinHash calibration (r09): signature columns ride the SAME banded "
     "candidate join dedup_minhash_pairs already pays; est-vs-exact "
     "comparison is a per-row expression, no extra shuffle."),
    ("ngram_novelty_by_source",
     "Novelty by source (r11 aggregate-only rework): gram-keyed "
     "min(struct(doc_id, source)) carries the first doc's source, so "
     "novel counts fold straight down — no |grams|-sized join-back; the "
     "only join is the bounded per-source merge."),
    ("padding_waste_curve",
     "Padding-waste planner (r11 rework): ONE range-partitioned exact "
     "rank (contiguous slices + bounded offset sidecar, no single-task "
     "global sort) feeds all five ntile assignments as pure remainder "
     "arithmetic; plan-audited against unpartitioned WindowExec."),
    ("vocab_coverage_curve",
     "Vocabulary coverage curve (r11): token explode collapses map-side "
     "to (term, freq); exact cumulative mass via the range-partitioned "
     "running sum; 5-row broadcast threshold join; everything after the "
     "first exchange is |V|-bounded."),
    ("similarity_lsh_multiprobe_topk",
     "Multi-probe LSH (r11; r12 n_flip 11): all 2^bits perturbation "
     "masks scored by squared flipped margins INSIDE the one-row "
     "broadcast query frame; probes explode to a hash equi-join on "
     "bucket — recall 1.0 at 12/16 buckets probed, no nested-loop, no "
     "driver math."),
    ("label_pair_affinity",
     "Exact pairwise cohesion at O(n d) (r12): ONE posexplode exchange "
     "folds to the |labels| x dim DECIMAL grid; intra/inter mean dots "
     "are grid-only arithmetic (pos-equi self-join over KBs) — the "
     "O(n^2) pair set never exists in any stage."),
    ("approx_stats",
     "Sketch invariant-verdict table (r12): two combinable passes over "
     "a 3-column pruned scan — the sketch pass, then the rank-count "
     "pass joined back through a null-safe BROADCAST of the |langs|-row "
     "sketch frame; the emitted booleans assert each sketch's declared "
     "error contract, so the hash gate checks the sketch tier without "
     "shipping engine-specific sketch values."),
    ("shard_balance_stats",
     "Shard-balance planner (r11): ONE scan computes tokens + all three "
     "md5 shard ids; inline-array explode stacks the k-levels (no "
     "re-scan) and both aggregates are map-side combinable over at most "
     "168 groups."),
    ("lang_entropy_by_source",
     "Language-mix entropy (r11): combinable (source, lang) count, then "
     "a window partitioned by source over that BOUNDED grid; -p ln p "
     "terms rounded before a DECIMAL sum — partition-order-free floats."),
    ("hourly_cusum_alarms",
     "CUSUM drift (r09): the ordered window runs on the HOURS frame "
     "(bounded), never the event log; events contribute one combinable "
     "hourly count aggregate."),
    ("similarity_jl_rerank_topk",
     "JL-rerank ANN (r09): per-row 16-d projection folds (arithmetic "
     "reduction, no index), size-300 TakeOrderedAndProject shortlist "
     "(per-partition heap, no fact shuffle), exact re-rank on 300 rows."),
    ("source_psi_drift",
     "PSI drift gate (r09): two map-combinable count aggregates; the "
     "sources x buckets grid is broadcast nested-loop over two BOUNDED "
     "dims (buckets <= 20) — BNLJ of bounded frames is the idiom, not "
     "an accident."),
]

HEADER = """# PLANS — flagship physical plans (auto-generated)

Regenerate with `python scripts/explain_audit.py`. One representative
query per family; the note above each plan says what the scale-relevant
shape is. Invariants enforced suite-wide by `tests/test_plan_audit.py`:
no `CartesianProduct`, no `BatchEvalPython` (row-at-a-time Python) in any
registered query's plan.
"""


def main() -> None:
    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="explain_audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = [HEADER]
    for name, note in SHOWCASE:
        df = REGISTRY[name].builder(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        out.append(f"\n## {name}\n\n{note}\n\n```\n{plan}\n```\n")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("".join(out))
    print(f"PLANS.md written ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
