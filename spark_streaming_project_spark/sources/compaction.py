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


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
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
    disjoint key range -> tight min/max stats, cross-file pruning) or a
    plain round-robin ``repartition`` when unsorted. Returns a stats dict
    {files_before, files_after, bytes}.

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
    if sort_cols:
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
