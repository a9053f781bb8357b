"""OPTIMIZE-style parquet compaction: rewrite a small-files directory into
few large, optionally sorted files, published via a directory swap (see
``compact_parquet`` for the exact — non-atomic — concurrency contract).

Why it matters at scale: streaming sinks and per-batch appends produce one
file per task per micro-batch — a 1000-executor job appending hourly makes
millions of KB-sized files, and every downstream scan then pays open/seek
per file (plus driver-side listing). The fix is the standard warehouse
OPTIMIZE: periodically rewrite each table/partition into ~target-sized
files, sorted on the primary filter key so min/max row-group pruning works.
(The reference's parquet story is per-batch appends only; this is the
missing maintenance half.)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 12
) -> "F.Column":
    """Z-order (Morton) key over numeric columns: each column is min/max
    rank-scaled to ``bits`` bits (one 2-scalar-per-column aggregate reaches
    the driver) and the bits are interleaved, so sorting by the single key
    clusters rows that are close in EVERY dimension.

    Why not sort_cols at scale: lexicographic sort gives tight min/max file
    stats only for the leading column — a filter on the second column still
    reads every file. The z-curve splits locality across all columns, so
    min/max pruning works for filters on any subset (the standard OPTIMIZE
    ZORDER BY semantics). Linear min/max scaling (not percent_rank) keeps
    the key a pure per-row expression — no global window, no extra shuffle;
    heavily skewed columns dilute their effective bits, which is the usual
    tradeoff (fix upstream with a transform, e.g. log).

    NULLs scale to the minimum (sort first, prune like the min value).
    """
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = row[f"_mn_{i}"], row[f"_mx_{i}"]
        mn = 0.0 if mn is None else mn
        span = (mx - mn) if (mx is not None and mx > mn) else 1.0
        s = (
            (F.coalesce(F.col(c).cast("double"), F.lit(mn)) - F.lit(mn))
            / F.lit(span)
            * F.lit(float(top))
        ).cast("long")
        scaled.append(F.least(F.greatest(s, F.lit(0)), F.lit(top)))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * len(cols) + i)
    return z


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet directory at ``path`` into ceil(bytes/target)
    files, optionally sort-clustered by ``sort_cols``, then swap the new
    directory into place via two renames.

    CONCURRENCY CONTRACT (honest version): the swap is NOT atomic for
    concurrent readers. Between ``rename(path, old)`` and
    ``rename(staging, path)`` the directory briefly does not exist (a
    reader listing at that instant errors), and the subsequent
    ``rmtree(old)`` breaks any reader mid-scan of the old files. The swap
    also assumes a POSIX local filesystem where directory rename is cheap
    (object stores have no rename — there you'd copy+delete). This helper
    is therefore for MAINTENANCE WINDOWS or single-writer/no-reader
    pipelines; true read-isolated compaction needs a metadata pointer the
    readers resolve (a table-format transaction log à la Delta/Iceberg),
    which is out of scope for a filesystem-only engine.

    Uses ``repartitionByRange`` on the sort key (each output file covers a
    disjoint key range -> tight min/max stats, cross-file pruning), or on
    the interleaved :func:`zorder_value` key when ``zorder_cols`` is given
    (tight-ish min/max for EVERY z-ordered column — multi-dimension
    pruning), or a plain round-robin ``repartition`` when unsorted.
    Returns a stats dict {files_before, files_after, bytes}.

    Scale note: the rewrite is one job whose parallelism equals the output
    file count; for a partitioned table run per partition (callers loop
    over partitions, keeping each swap small and retryable).
    """
    files_before = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    total_bytes = sum(os.path.getsize(os.path.join(path, f)) for f in files_before)
    n_out = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    if zorder_cols:
        z = zorder_value(df, zorder_cols)
        out = (
            df.withColumn("_z", z)
            .repartitionByRange(n_out, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    elif sort_cols:
        out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)

    parent = os.path.dirname(os.path.abspath(path))
    staging = os.path.join(parent, f"_compact_{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").parquet(staging)

    old = os.path.join(parent, f"_old_{uuid.uuid4().hex[:8]}")
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)

    files_after = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    return {
        "files_before": len(files_before),
        "files_after": len(files_after),
        "bytes": total_bytes,
    }


def write_training_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    n_shards: int = 16,
    seed: str = "epoch0",
) -> None:
    """Materialize the deterministic training order (see
    ``sampling.shuffle_shards``) as one sorted parquet file per shard:
    ``path/shard=NN/part-*.parquet`` with rows in ascending ``pos`` order
    inside each file — the layout a dataloader consumes sequentially.

    One exchange total: ``repartition(n_shards, shard)`` is the same hash
    partitioning the rank window needs, so the sort-within-partitions and
    the per-shard file write reuse it. Re-running with the same seed is
    byte-deterministic; a new epoch is a new seed — a full rewrite, which
    is the honest cost of a true reshuffle (epoch-local perturbations that
    avoid the rewrite belong in the dataloader).
    """
    from ..operators.sampling import shuffle_shards

    ordered = shuffle_shards(df, id_col, n_shards=n_shards, seed=seed)
    (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
