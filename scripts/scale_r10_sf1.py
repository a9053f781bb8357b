#!/usr/bin/env python
"""TRUE-sf1 anchor for the top-5 bench hotspots (VERDICT r9 ask #5).

The r07-r09 scale ladders replicate sf0.1 with key offsets. Replication
preserves each replica's id adjacency and intra-replica duplicate
topology, so it can UNDERSTATE cross-corpus skew (near-dup groups never
span replicas) and OVERSTATE clique density (the deliberately hostile
variant tags). This script instead RE-RUNS the observed generative
process at 10x size — fresh sampling, not copies:

documents (5,000 -> 50,000): profiled from sf0.1 —
  - 31-token vocabulary, uniform token draw, length ~ U[10, 100] words
    (measured: min 10, max 100, mean 54.1);
  - lang ~ categorical at the measured frequencies (en .412, zh .151,
    es .149, fr .148, de .140); source ~ uniform over src0..src19;
  - ~4.6% of docs are NEAR-DUP variants of a random earlier doc
    (tail-perturbed + ' dup' marker token, matching the observed
    variant shape: 233 prefix-50 collision groups per 5,000 docs,
    scaling linearly 0.001 -> 0.1);
  - ~0.16% exact copies (8 pairs per 5,000 docs at sf0.1).

supplier (1,000 -> 10,000): the catalog IS sequential zero-padded keys
("Supplier#%09d"), so true sf1 is simply the longer key range — unlike
the overlay (s_suppkey*16+r name cliques), the Levenshtein<=1 structure
here densifies the way a real catalog's does (more digit positions in
play, no artificial 10-cliques).

Protocol: noop sink (never .count()), clearCache between runs, one
untimed warm-up per query. Prints one JSON line per query with the
sf0.1 baseline and true-sf1 wall plus the r09 overlay growth for
comparison. Run: python scripts/scale_r10_sf1.py [query ...]
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
DERIVED = os.path.join(REPO, "_scale", "sf1_true")
OVERLAY = os.path.join(REPO, "_scale", "sf1_true_overlay")
SCALE = 10
SEED = 4242

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# the five most expensive driver-bench queries (VERDICT r9 perf audit)
QUERIES = [
    "neardup_centrality",
    "dedup_component_sizes_bucketed",
    "cdc_chunk_doc_clusters",
    "supplier_entity_clusters",
    "curation_verdicts",
]

# r09 overlay 10x growth factors from SCALE.md, for the comparison column
OVERLAY_GROWTH = {
    "neardup_centrality": 2.4,
    "dedup_component_sizes_bucketed": 4.0,
    "cdc_chunk_doc_clusters": 7.0,
    "supplier_entity_clusters": 5.9,  # at 3x suppliers (exponent ~1.6)
    "curation_verdicts": 6.7,
}

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.151, 0.149, 0.148, 0.140]


def _sf01_vocab() -> list[str]:
    """The 31-token vocabulary observed at sf0.1, minus the 'dup' variant
    marker (re-derived from data, not hard-coded, so a testdata regen
    cannot silently desynchronize the generator)."""
    tbl = pq.read_table(os.path.join(SRC_SF, "documents.parquet"), columns=["text"])
    vocab: set[str] = set()
    for chunk in tbl.column("text").chunks:
        for t in chunk.to_pylist():
            vocab.update(t.split(" "))
    vocab.discard("dup")
    return sorted(vocab)


def build_documents() -> None:
    dst = os.path.join(DERIVED, "documents.parquet")
    if os.path.exists(dst):
        return
    rng = np.random.default_rng(SEED)
    vocab = np.array(_sf01_vocab())
    n = 5000 * SCALE
    texts: list[str] = []
    langs = rng.choice(len(LANGS), size=n, p=np.array(LANG_P) / sum(LANG_P))
    sources = rng.integers(0, 20, size=n)
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.0016:  # exact copy of a random earlier doc
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < 0.046 + 0.0016:  # near-dup variant
            base = texts[int(rng.integers(0, i))].split(" ")
            cut = max(5, len(base) - int(rng.integers(1, 4)))
            texts.append(" ".join(base[:cut]) + " dup")
        else:
            ln = int(rng.integers(10, 101))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=ln)]))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[k] for k in langs]),
            "source": pa.array([f"src{s}" for s in sources]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, dst)


def build_supplier() -> None:
    dst = os.path.join(DERIVED, "supplier.parquet")
    if os.path.exists(dst):
        return
    rng = np.random.default_rng(SEED + 1)
    n = 1000 * SCALE
    tbl = pa.table(
        {
            "s_suppkey": pa.array(range(n), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
            "s_nationkey": pa.array(
                rng.integers(0, 25, size=n).tolist(), pa.int64()
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, size=n), 2).tolist()
            ),
        }
    )
    pq.write_table(tbl, dst)


def build_overlay() -> None:
    """sf dir with the true-sf1 documents/supplier and sf0.1 passthrough
    for every other table (the five hotspots read only these two)."""
    os.makedirs(DERIVED, exist_ok=True)
    os.makedirs(OVERLAY, exist_ok=True)
    build_documents()
    build_supplier()
    for t in ALL_TABLES:
        link = os.path.join(OVERLAY, f"{t}.parquet")
        if os.path.lexists(link):
            os.remove(link)
        if t in ("documents", "supplier"):
            os.symlink(os.path.join(DERIVED, f"{t}.parquet"), link)
        else:
            os.symlink(os.path.join(SRC_SF, f"{t}.parquet"), link)


def main() -> None:
    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark

    names = sys.argv[1:] or QUERIES
    build_overlay()
    spark = get_spark(app_name="scale_r10_sf1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        row: dict[str, object] = {"query": name, "overlay_growth_r09": OVERLAY_GROWTH.get(name)}
        for label, sf_dir in (("sf0.1", SRC_SF), ("sf1_true", OVERLAY)):
            REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm-up
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            row[label] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
        base, big = float(row["sf0.1"]), float(row["sf1_true"])  # type: ignore[arg-type]
        row["true_growth"] = round(big / base, 2) if base > 0 else None
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
