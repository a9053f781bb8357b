#!/usr/bin/env python
"""10x growth measurements for the two SCALE.md caveat rows VERDICT r7
ask #5 names: part_cf_neighbors ("(bench row)" placeholder) and
orders_point_in_time_segment ("not a 10x reading" — the r07 overlay
scaled only documents/embeddings/events).

Extends the derived corpus with 10x RELATIONAL tables: each replica is a
fresh customer population (custkey*16+r) whose orders and lineitems
follow their owner (orderkey*16+r); partkeys are left unchanged so every
part sees 10x baskets — exactly the axis part_cf_neighbors' pair join
must absorb. Key columns are rewritten with numpy int64 arithmetic;
non-key columns are reused zero-copy, so the build is IO-bound.

Derived data lands in _scale/ (gitignored). Run: python scripts/scale_r08.py
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
DERIVED = os.path.join(REPO, "_scale", "sf1x")
OVERLAY = os.path.join(REPO, "_scale", "sf1x_overlay")
REPLICAS = 10

# (table, key columns to offset per replica); partkey/suppkey/nationkey
# stay fixed — dimensions don't grow 10x when the fact tables do, which
# is also the honest 100 TB shape (parts are a catalog, orders are a log)
RELATIONAL = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
}

QUERIES = ["part_cf_neighbors", "orders_point_in_time_segment"]


def build_derived_relational() -> None:
    os.makedirs(DERIVED, exist_ok=True)
    for table, keys in RELATIONAL.items():
        dst = os.path.join(DERIVED, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        src = pq.read_table(os.path.join(SRC_SF, f"{table}.parquet"))
        replicas = []
        for r in range(REPLICAS):
            cols = {}
            for name in src.column_names:
                col = src.column(name)
                if name in keys:
                    vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
                    cols[name] = pa.array(vals * 16 + r, pa.int64())
                else:
                    cols[name] = col
            replicas.append(pa.table(cols))
        pq.write_table(pa.concat_tables(replicas), dst)


def ensure_overlay() -> None:
    import scripts.scale_r07 as r07

    build_derived_relational()
    r07.ensure_overlay()  # builds docs/emb/events tiers + symlinks
    # re-point the relational symlinks (r07 linked them back to sf0.1)
    for table in RELATIONAL:
        link = os.path.join(OVERLAY, f"{table}.parquet")
        target = os.path.join(DERIVED, f"{table}.parquet")
        if os.path.islink(link) and os.readlink(link) != target:
            os.unlink(link)
        if not os.path.lexists(link):
            os.symlink(target, link)


def main() -> None:
    ensure_overlay()
    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="scale-r08", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in QUERIES:
        for label, sf in (("sf0.1", SRC_SF), ("10x", OVERLAY)):
            # noop sink, NOT .count() — see scale_r07.py note
            t0 = time.monotonic()
            REGISTRY[name].builder(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            print(json.dumps({"tier": name, "scale": label,
                              "sec": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
