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


def test_append_grows_index_identically_to_single_pass(spark, tmp_path):
    """An index built from half the corpus then APPENDED with the other
    half must contain exactly the rows of a single-pass assignment of the
    full corpus against the same (first-half-derived) centroids."""
    from spark_streaming_project_spark.operators.similarity import (
        append_ivf_partitioned,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)

    grown = str(tmp_path / "ivf_grown")
    write_ivf_partitioned(first, "vec_id", "embedding", grown, n_list=N_LIST)
    append_ivf_partitioned(second, "vec_id", "embedding", grown)

    # single-pass twin: same sidecar centroids, full corpus in one append
    single = str(tmp_path / "ivf_single")
    write_ivf_partitioned(first, "vec_id", "embedding", single, n_list=N_LIST)
    import shutil

    shutil.rmtree(single)
    spark.read.parquet(f"{grown}/_ivf_centroids").write.parquet(
        f"{single}/_ivf_centroids"
    )
    append_ivf_partitioned(emb, "vec_id", "embedding", single)

    got = sorted(
        (r["vec_id"], r["list_id"])
        for r in spark.read.parquet(grown).select("vec_id", "list_id").collect()
    )
    want = sorted(
        (r["vec_id"], r["list_id"])
        for r in spark.read.parquet(single).select("vec_id", "list_id").collect()
    )
    assert got == want and len(got) == emb.count()


def test_streaming_ivf_append_matches_batch(spark, tmp_path):
    """foreach_batch_ivf_append: an index maintained by streaming
    micro-batches equals one maintained by a single batch append, and
    probes against it still prune partitions."""
    from spark_streaming_project_spark.streaming import (
        StreamRunner,
        stream_parquet_dir,
    )
    from spark_streaming_project_spark.streaming.sinks import (
        foreach_batch_ivf_append,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    base = emb.filter(F.col("vec_id") < 100)
    rest = emb.filter(F.col("vec_id") >= 100)

    path = str(tmp_path / "ivf_stream")
    write_ivf_partitioned(base, "vec_id", "embedding", path, n_list=N_LIST)

    src = str(tmp_path / "vec_src")
    rest.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    rest.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    stream = stream_parquet_dir(spark, src, schema, max_files_per_trigger=1)
    runner = StreamRunner(spark, str(tmp_path / "ckpt_ivf"))
    runner.add(
        "ivf_maint",
        stream,
        output_mode="append",
        sink_format=None,
        foreach_batch=foreach_batch_ivf_append(path, "vec_id", "embedding"),
    )
    runner.start_all(available_now=True)
    runner.await_all(timeout_sec=120)

    # batch twin from the same starting index
    twin = str(tmp_path / "ivf_twin")
    write_ivf_partitioned(base, "vec_id", "embedding", twin, n_list=N_LIST)
    from spark_streaming_project_spark.operators.similarity import (
        append_ivf_partitioned,
    )

    append_ivf_partitioned(rest, "vec_id", "embedding", twin)

    got = sorted(
        (r["vec_id"], r["list_id"])
        for r in spark.read.parquet(path).select("vec_id", "list_id").collect()
    )
    want = sorted(
        (r["vec_id"], r["list_id"])
        for r in spark.read.parquet(twin).select("vec_id", "list_id").collect()
    )
    assert got == want and len(got) == emb.count()

    # probing the streamed index still prunes partitions
    qvec = [float(x) for x in base.select("embedding").head()[0]]
    df = ivf_partitioned_topk(spark, path, "vec_id", "embedding", qvec, n_probe=N_PROBE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert len(df.collect()) > 0


def test_ivfpq_partitioned_matches_inmemory_and_prunes(spark, tmp_path):
    """IVFPQ storage: list_id day... directory layout + both sidecars, a
    probe plan that prunes at the partition level, and results
    bit-identical to the in-memory ivfpq_topk (shared fit/encode)."""
    import os

    from spark_streaming_project_spark.operators.similarity import (
        ivfpq_partitioned_topk,
        ivfpq_topk,
        write_ivfpq_partitioned,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_partitioned(emb, "vec_id", "embedding", path, n_list=N_LIST)

    dirs = sorted(d for d in os.listdir(path) if d.startswith("list_id="))
    assert 1 <= len(dirs) <= N_LIST
    assert os.path.isdir(os.path.join(path, "_ivfpq_centroids"))
    assert os.path.isdir(os.path.join(path, "_ivfpq_codebooks"))

    query_id = 0
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_id)
        .select("embedding")
        .collect()[0][0]
    ]
    probed = ivfpq_partitioned_topk(
        spark, path, emb, "vec_id", "embedding", qvec,
        k=10, n_probe=N_PROBE, exclude_id=query_id,
    )

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "list_id" in plan

    got = [(r["vec_id"], r["cosine_sim"]) for r in probed.collect()]
    want = [
        (r["vec_id"], r["cosine_sim"])
        for r in ivfpq_topk(
            emb, "vec_id", "embedding", query_id, k=10, n_probe=N_PROBE
        ).collect()
    ]
    assert got == want and len(got) == 10


def test_ivfpq_append_parity_with_single_pass(spark, tmp_path):
    """An IVFPQ index built from half the vectors then grown with the
    other half must answer queries identically to a single-pass build
    USING THE SAME MODEL (sidecars copied, codes appended) — the
    incremental-maintenance contract."""
    import shutil

    from spark_streaming_project_spark.operators.similarity import (
        append_ivfpq_partitioned,
        ivfpq_partitioned_topk,
        write_ivfpq_partitioned,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)

    grown = str(tmp_path / "ivfpq_grown")
    write_ivfpq_partitioned(first, "vec_id", "embedding", grown, n_list=N_LIST)
    append_ivfpq_partitioned(second, "vec_id", "embedding", grown)

    # single-pass twin with the SAME model: copy sidecars, append all rows
    single = str(tmp_path / "ivfpq_single")
    import os

    os.makedirs(single, exist_ok=True)
    shutil.copytree(f"{grown}/_ivfpq_centroids", f"{single}/_ivfpq_centroids")
    shutil.copytree(f"{grown}/_ivfpq_codebooks", f"{single}/_ivfpq_codebooks")
    append_ivfpq_partitioned(emb, "vec_id", "embedding", single)

    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    ]
    a = [
        (r["vec_id"], r["cosine_sim"])
        for r in ivfpq_partitioned_topk(
            spark, grown, emb, "vec_id", "embedding", qvec,
            k=10, n_probe=N_PROBE, exclude_id=0,
        ).collect()
    ]
    b = [
        (r["vec_id"], r["cosine_sim"])
        for r in ivfpq_partitioned_topk(
            spark, single, emb, "vec_id", "embedding", qvec,
            k=10, n_probe=N_PROBE, exclude_id=0,
        ).collect()
    ]
    assert a == b and len(a) == 10


def test_ivf_partitioned_multi_assign_matches_logical_and_prunes(spark, tmp_path):
    """r10 spilled multi-assignment at the STORAGE level: an n_assign=2
    index must (a) store each vector in exactly two list directories,
    (b) record n_assign in the centroid sidecar, (c) still prune at the
    partition level, (d) dedup probed candidates so top-k never repeats
    an id, and (e) match the logical ivf_topk(n_assign=2) bit-for-bit."""
    import os

    from spark_streaming_project_spark.operators.similarity import (
        append_ivf_partitioned,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    path = str(tmp_path / "ivf_ma")
    write_ivf_partitioned(
        emb, "vec_id", "embedding", path, n_list=N_LIST, n_assign=2
    )

    n = emb.count()
    stored = spark.read.parquet(path)
    assert stored.count() == 2 * n  # every vector in exactly two lists
    assert stored.select("vec_id").distinct().count() == n
    side = spark.read.parquet(os.path.join(path, "_ivf_centroids"))
    assert side.select(F.max("n_assign")).first()[0] == 2

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
    buf = io.StringIO()
    with redirect_stdout(buf):
        got_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "list_id" in plan

    got = [(r["vec_id"], r["cosine_sim"]) for r in got_df.collect()]
    want = [
        (r["vec_id"], r["cosine_sim"])
        for r in ivf_topk(
            emb, "vec_id", "embedding", query_id,
            n_list=N_LIST, n_probe=N_PROBE, n_assign=2,
        ).collect()
    ]
    assert got == want
    assert len(got) == 10
    assert len({i for i, _ in got}) == 10  # no duplicate ids past dedup

    # append path reads n_assign back from the sidecar: growing the index
    # keeps the two-directories-per-vector invariant
    extra = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).limit(7)
    append_ivf_partitioned(extra, "vec_id", "embedding", path)
    grown = spark.read.parquet(path)
    assert grown.count() == 2 * n + 14
