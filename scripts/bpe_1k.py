#!/usr/bin/env python
"""ROADMAP #13: measure a 1000-merge BPE train at a REALISTIC vocabulary.

The trainer's cost driver is the word dictionary, not the corpus (Heaps'
law), and the derived 10x corpus has a toy 310-word vocabulary — useless
for a merge-budget measurement. So this script synthesizes a 200k-word
Zipf dictionary (deterministic: seeded letter-string words, Zipf counts —
the same regime as the r4 incremental-trainer comparison) and times the
shipped full-recompute trainer at a 1000-merge budget, reporting stride
times so per-merge cost growth is visible as the symbol alphabet and
merged-token lengths grow.

Run: python scripts/bpe_1k.py [n_merges] [n_words]. Results go to
SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STRIDES = (100, 300, 1000)


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_words = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    import numpy as np

    from spark_streaming_project_spark.operators.bpe import (
        bpe_train_merges_from_dict,
    )
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="bpe_1k")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    rng = np.random.default_rng(1234)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 12, size=n_words)
    words = set()
    rows = []
    for i in range(n_words):
        w = "".join(rng.choice(letters, size=int(lens[i])))
        if w in words:
            continue
        words.add(w)
        rows.append((w, max(1, int(n_words / (i + 1)))))  # Zipf count
    wdict = spark.createDataFrame(rows, "word string, cnt long").repartition(
        32
    ).localCheckpoint()
    print(json.dumps({"stage": "zipf_dict", "n_words": wdict.count()}),
          flush=True)

    prev_budget, prev_sec = 0, 0.0
    for budget in [s for s in STRIDES if s <= n_merges]:
        t1 = time.perf_counter()
        merges = bpe_train_merges_from_dict(wdict, n_merges=budget)
        sec = round(time.perf_counter() - t1, 2)
        print(json.dumps({
            "stage": "train", "budget": budget,
            "merges_learned": len(merges), "sec": sec,
            "sec_per_merge": round(sec / max(len(merges), 1), 3),
            # marginal cost of the merges beyond the previous budget:
            # flat marginal cost == per-round work independent of how many
            # merges are already stacked
            "marginal_sec_per_merge": round(
                (sec - prev_sec) / max(budget - prev_budget, 1), 3),
        }), flush=True)
        prev_budget, prev_sec = budget, sec


if __name__ == "__main__":
    main()
