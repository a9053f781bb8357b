"""Partition-pruned IVF storage: the physical realization of the ANN scale
claim — probing must read only n_probe/n_list of the partition directories,
and results must match the logical ivf_topk bit-for-bit."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.similarity import (
    ivf_partitioned_topk,
    ivf_topk,
    write_ivf_partitioned,
)
from spark_streaming_project_spark.sources.batch import load_table

from .conftest import SF_CORRECT

N_LIST = 8
N_PROBE = 2


def test_ivf_partitioned_matches_logical_and_prunes(spark, tmp_path):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    path = str(tmp_path / "ivf_index")
    write_ivf_partitioned(emb, "vec_id", "embedding", path, n_list=N_LIST)

    # one partition directory per list + the sidecar
    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("list_id="))
    assert 1 <= len(dirs) <= N_LIST
    assert os.path.isdir(os.path.join(path, "_ivf_centroids"))

    query_id = emb.select(F.min("vec_id")).collect()[0][0]
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_id)
        .select("embedding")
        .collect()[0][0]
    ]

    got_df = ivf_partitioned_topk(
        spark, path, "vec_id", "embedding", qvec,
        n_probe=N_PROBE, exclude_id=query_id,
    )

    # the scan must prune at the partition level, not post-filter rows
    buf = io.StringIO()
    with redirect_stdout(buf):
        got_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "list_id" in plan

    got = [(r["vec_id"], r["cosine_sim"]) for r in got_df.collect()]
    want = [
        (r["vec_id"], r["cosine_sim"])
        for r in ivf_topk(
            emb, "vec_id", "embedding", query_id, n_list=N_LIST, n_probe=N_PROBE
        ).collect()
    ]
    assert got == want
    assert len(got) == 10


def test_ivf_partitioned_excludes_nothing_by_default(spark, tmp_path):
    emb = load_table(spark, SF_CORRECT, "embeddings").limit(100)
    path = str(tmp_path / "ivf_small")
    write_ivf_partitioned(emb, "vec_id", "embedding", path, n_list=4)
    row = emb.orderBy("vec_id").first()
    qvec = [float(x) for x in row["embedding"]]
    got = ivf_partitioned_topk(
        spark, path, "vec_id", "embedding", qvec, k=5, n_probe=1
    ).collect()
    # without exclude_id the query's own vector may appear (self-match),
    # and scores are rounded/total-ordered
    assert len(got) == 5
    sims = [r["cosine_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)
