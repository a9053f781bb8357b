"""Embedding similarity search (BASELINE.json north-star).

Two tiers:
  - ``brute_force_topk``: exact cosine top-k against a query vector. The
    scan is embarrassingly parallel (per-row arithmetic, no shuffle); the
    top-k is a TakeOrderedAndProject. This is the correctness baseline and
    is already the right plan for one-off queries at scale.
  - ``lsh_bucket_topk``: random-hyperplane LSH. Each vector gets a sign-bit
    bucket; the query searches only its bucket (and optionally Hamming-1
    neighbors). Planes are generated deterministically from md5, so bucket
    assignment is reproducible across engines and runs — at 100 TB the
    bucket column becomes a partition/bucketing key and a query touches
    1/2^bits of the data.

Cosine results are rounded to 6 decimals *before* ranking so that
(score, id) total orders are stable across engines' FP summation orders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.partitioning import spread
from ..functions.vectors import as_double, dot, norm

ROUND_DECIMALS = 6


def _spread_vecs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, _v float64) projection feeding the IVF/PQ assignment passes.

    Deliberately NOT spread (r13, measured): these tiers consume the
    projection from several separate jobs (the query-vector broadcast,
    the probe-list broadcast, the candidate scan, the driver-side fit
    sample), so a repartition here is paid once per consuming job while
    each individual pass is short — the in-suite sweep read
    ivf 1.89→1.33 s, ivf_kmeans 1.51→1.15, ivfpq 1.92→1.08, pq
    2.28→1.66 with the spread removed (scripts/probe_batch.py, sf0.1).
    Scan parallelism at production scale comes from the vector table's
    own file count; single-pipeline vector scans that DO benefit from a
    spread (brute force, MMR shortlist) spread at their own call sites."""
    return df.select(F.col(id_col), as_double(vec_col).alias("_v"))


def _query_vector(df: DataFrame, id_col: str, vec_col: str, query_id: int) -> DataFrame:
    """One-row frame holding the query vector + its norm (broadcast into
    the scan — the query self-dot must not be re-folded per data row)."""
    return df.filter(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("_query_vec")
    ).withColumn("_qn", norm(F.col("_query_vec")))


def _cosine_vs_query(vec: Column) -> Column:
    """cosine(vec, query) with the query norm taken from the broadcast
    ``_qn`` column. Identical arithmetic and operation order to
    ``cosine()`` (n = norm(a)*norm(b); NULL when n == 0), so scores stay
    bit-identical — only the redundant per-row query self-fold is gone."""
    d = dot(vec, F.col("_query_vec"))
    n = norm(vec) * F.col("_qn")
    return F.when(n > 0, d / n)


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors of ``query_id`` (excluded from results)."""
    q = _query_vector(df, id_col, vec_col, query_id)
    # r13: spread before the per-row dot fold (functions/partitioning)
    scored = (
        spread(df.select(F.col(id_col), F.col(vec_col)), id_col)
        .filter(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(as_double(vec_col)), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def brute_force_topk_pandas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
) -> DataFrame:
    """Arrow-batched numpy variant of ``brute_force_topk`` — same contract.

    The HOF version keeps arithmetic JVM-side but higher-order lambdas are
    interpreted per element; at high dims the winning plan ships Arrow
    batches to numpy, which does the dot products as vectorized C loops.
    The per-batch matmul is embarrassingly parallel (no shuffle) and the
    top-k remains a TakeOrderedAndProject, so the scan scales identically.
    Scores are rounded to 6 decimals before ranking (float64 accumulation
    differences vs the fold order live far below 1e-6).
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    qrow = df.filter(F.col(id_col) == query_id).select(vec_col).head()
    if qrow is None:
        raise ValueError(f"query id {query_id} not found")
    qv = np.asarray(qrow[0], dtype=np.float64)
    qn = float(np.sqrt(qv @ qv))

    @pandas_udf(T.DoubleType())
    def cos_batch(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        sims = (m @ qv) / (np.sqrt((m * m).sum(axis=1)) * qn)
        return pd.Series(sims)

    # r13: spread before the Arrow-batched matmul (functions/partitioning)
    return (
        spread(df.select(F.col(id_col), F.col(vec_col)), id_col)
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(cos_batch(F.col(vec_col)), ROUND_DECIMALS).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_bucket(
    vec_col: Column | str, dim: int, bits: int = 4, salt: str = "plane"
) -> Column:
    """Sign-bit LSH bucket id from ``bits`` deterministic hyperplanes.

    Plane coefficients are md5-derived pseudo-randoms in [-1, 1]:
    coef(b, i) = (md5("salt:b:i")[:6] as int mod 2001 - 1000) / 1000.

    When given a column NAME the whole bucket expression is emitted as one
    SQL string and parsed JVM-side in a single call — building the
    bits*dim-term tree Column-by-Column costs ~4 py4j round-trips per term
    (~15 s of driver time at 8 tables x 4 bits x 64 dims), the parsed
    string costs one. Arithmetic is textually left-to-right, identical to
    the Column form and the DuckDB oracle twin, so sign decisions match
    bit-for-bit.
    """
    if isinstance(vec_col, str):
        parts = []
        for b in range(bits):
            terms = " + ".join(
                f"(CAST(get(`{vec_col}`, {i}) AS DOUBLE) * "
                f"{_pseudo_coef(f'{salt}:{b}:{i}')!r})"
                for i in range(dim)
            )
            parts.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << b} ELSE 0 END)")
        return F.expr("0 + " + " + ".join(parts))
    bucket = F.lit(0)
    for b in range(bits):
        coefs = [
            _pseudo_coef(f"{salt}:{b}:{i}") for i in range(dim)
        ]
        d = None
        for i, c in enumerate(coefs):
            term = F.get(vec_col, i).cast("double") * F.lit(c)
            d = term if d is None else d + term
        bucket = bucket + F.when(d > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def _pseudo_coef(key: str) -> float:
    """Deterministic coefficient in [-1, 1] from md5 — computed driver-side
    once per plane/dim (constants in the plan, zero per-row hashing)."""
    import hashlib

    h = int(hashlib.md5(key.encode()).hexdigest()[:6], 16)
    return (h % 2001 - 1000) / 1000.0


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    n_list: int = 8,
    n_probe: int = 2,
    n_assign: int = 1,
) -> DataFrame:
    """IVF-style ANN: partition vectors into ``n_list`` inverted lists by
    nearest centroid; a query searches only its ``n_probe`` closest lists.

    Centroid selection is deterministic (the ``n_list`` vectors with the
    smallest md5(vec_id) — a hash-ordered pseudo-random sample, so the
    DuckDB oracle replays it exactly). At warehouse scale the centroids
    would come from a sampled k-means fit and the list id becomes the
    table's partition/bucketing key: one query then scans
    ~n_probe/n_list of the data. Assignment itself is a broadcast
    cross-join against n_list rows + a per-vector argmax — no shuffle of
    the embedding table.

    ``n_assign`` > 1 is SPILLED (multi-) assignment: each vector is
    stored in its ``n_assign`` nearest lists, the standard recall lever
    for a coarse quantizer whose Voronoi cells chop neighborhoods at
    cell borders (a true neighbor one cell over is still found because
    it ALSO lives in the query's cell). Storage grows n_assign-fold and
    probed candidates are de-duplicated before scoring, so the exact
    re-score stays candidate-set-sized. Measured at sf0.1 (r10 retune):
    (n_list=8, n_probe=3, assign=1) recall@10 0.47 mean over 7 query
    ids; (32, 8, assign=2) 0.81 mean / 0.8 on the canonical query at the
    same wall time — finer lists plus 2x assignment beats coarse lists
    at equal scan fraction.

    Ties are total-ordered everywhere: centroid rank by (cosine DESC,
    cid ASC), final top-k by (rounded cosine DESC, id ASC).
    """
    vecs, scored, assigned = ivf_assignment(
        df, id_col, vec_col, n_list=n_list, n_assign=n_assign
    )
    return ivf_probe_topk(
        vecs, scored, assigned, id_col, query_id,
        k=k, n_probe=n_probe, n_assign=n_assign,
    )


def ivf_assignment(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_list: int = 8,
    n_assign: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The probe-independent half of :func:`ivf_topk`: (vecs, scored,
    assigned) frames. Factored out (r13, guide §1.2 "don't compute things
    you throw away") so a multi-probe consumer (``ann_probe_sweep``) can
    build the O(|vecs| * n_list) centroid-scoring pass ONCE and persist
    it, instead of once per probe setting — the expressions are the exact
    ones :func:`ivf_topk` always used, so results are bit-identical."""
    vecs = _spread_vecs(df, id_col, vec_col)
    hashed = vecs.withColumn("_h", F.md5(F.col(id_col).cast("string")))
    cents = (
        hashed.orderBy("_h", id_col)
        .limit(n_list)
        .withColumn("cid", F.row_number().over(Window.orderBy("_h", id_col)))
        .select("cid", F.col("_v").alias("_cv"))
        .withColumn("_cn", norm(F.col("_cv")))
    )
    # norms folded once per vector/centroid, not per (vector, centroid)
    # pair; same expression and operation order as cosine() -> same bits
    _n = F.col("_vn") * F.col("_cn")
    scored = (
        vecs.withColumn("_vn", norm(F.col("_v")))
        .join(F.broadcast(cents))
        .select(
            F.col(id_col),
            "_v",
            "cid",
            F.when(_n > 0, dot(F.col("_v"), F.col("_cv")) / _n).alias("_sim"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cid"))
    )
    assigned = scored.withColumn("_rn", rn).filter(F.col("_rn") <= n_assign)
    return vecs, scored, assigned


def ivf_probe_topk(
    vecs: DataFrame,
    scored: DataFrame,
    assigned: DataFrame,
    id_col: str,
    query_id: int,
    k: int = 10,
    n_probe: int = 2,
    n_assign: int = 1,
) -> DataFrame:
    """The probe-dependent half of :func:`ivf_topk` over frames from
    :func:`ivf_assignment` (which the caller may have persisted)."""
    probes = (
        scored.filter(F.col(id_col) == query_id)
        .orderBy(F.desc("_sim"), F.asc("cid"))
        .limit(n_probe)
        .select("cid")
    )
    q = (
        vecs.filter(F.col(id_col) == query_id)
        .select(F.col("_v").alias("_query_vec"))
        .withColumn("_qn", norm(F.col("_query_vec")))
    )
    candidates = assigned.join(F.broadcast(probes), "cid").filter(
        F.col(id_col) != query_id
    )
    if n_assign > 1:
        # a vector stored in two probed lists is the same candidate once;
        # dedup BEFORE the exact re-score so scoring stays candidate-sized
        candidates = candidates.select(id_col, "_v").distinct()
    return (
        candidates.join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(F.col("_v")), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def write_ivf_partitioned(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_list: int = 8,
    n_assign: int = 1,
) -> None:
    """Materialize the IVF index as ``list_id``-PARTITIONED parquet plus a
    centroid sidecar — the storage layout that makes ANN probing a
    partition-pruned scan instead of a full-table filter.

    Same deterministic hash-centroid scheme as :func:`ivf_topk` (n_list
    vectors with the smallest md5(id)); each vector lands in the directory
    of its nearest centroid. The centroids (≤ n_list tiny rows) go to
    ``<path>/_ivf_centroids`` — the underscore prefix keeps Spark's reader
    from picking the sidecar up as data. At query time
    :func:`ivf_partitioned_topk` resolves probe lists driver-side from the
    sidecar and the scan's PartitionFilters prune to n_probe/n_list of the
    files — the physical realization of the pruning that ``ivf_topk`` can
    only do logically.

    ``n_assign`` > 1 stores each vector in its n nearest list
    DIRECTORIES (spilled multi-assignment — the r10 recall retune;
    storage grows n_assign-fold, probes stay directory-pruned). The
    sidecar carries ``n_assign`` so readers and appenders dedup and
    assign consistently without a separate metadata file.
    """
    vecs = _spread_vecs(df, id_col, vec_col)
    hashed = vecs.withColumn("_h", F.md5(F.col(id_col).cast("string")))
    cents = (
        hashed.orderBy("_h", id_col)
        .limit(n_list)
        .withColumn("cid", F.row_number().over(Window.orderBy("_h", id_col)))
        .select("cid", F.col("_v").alias("_cv"))
        .withColumn("_cn", norm(F.col("_cv")))
    )
    assigned = _assign_to_centroids(vecs, cents, id_col, vec_col, n_assign)
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(path)
    cents.select(
        "cid",
        F.col("_cv").alias("centroid"),
        F.lit(n_assign).alias("n_assign"),
    ).write.mode("overwrite").parquet(f"{path}/_ivf_centroids")


def _assign_to_centroids(
    vecs: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    n_assign: int = 1,
) -> DataFrame:
    """(id, vec, list_id) with list_id = the ``n_assign`` top-cosine
    centroids — broadcast cross-join against ≤ n_list rows + per-vector
    rank; ties broken by (cosine DESC, cid ASC) so assignment is
    total-ordered. ``vecs`` must carry (id_col, _v); ``cents``
    (cid, _cv, _cn)."""
    _n = F.col("_vn") * F.col("_cn")
    scored = (
        vecs.withColumn("_vn", norm(F.col("_v")))
        .join(F.broadcast(cents))
        .select(
            F.col(id_col),
            "_v",
            "cid",
            F.when(_n > 0, dot(F.col("_v"), F.col("_cv")) / _n).alias("_sim"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cid"))
    )
    return (
        scored.withColumn("_rn", rn)
        .filter(F.col("_rn") <= n_assign)
        .select(F.col(id_col), F.col("_v").alias(vec_col), F.col("cid").alias("list_id"))
    )


def append_ivf_partitioned(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
) -> None:
    """Index MAINTENANCE: assign new vectors to the EXISTING centroid
    sidecar of a :func:`write_ivf_partitioned` index and append them to
    their list partitions — the incremental path that keeps a live ANN
    index partition-pruned without rebuilding it.

    Centroids are read back from the sidecar (≤ n_list rows) and the
    assignment is the same broadcast-argmax expression as the initial
    build, so an index grown by appends is bit-identical to one built in a
    single pass with the same centroids. Periodic re-fit (new sidecar +
    rewrite) is a separate, caller-scheduled operation — exactly how
    warehouse ANN indexes amortize centroid drift. Duplicate ids are the
    caller's concern (appends are blind, like parquet appends anywhere).
    """
    spark = df.sparkSession
    sidecar = spark.read.parquet(f"{path}/_ivf_centroids")
    n_assign = _sidecar_n_assign(sidecar)
    cents = sidecar.select(
        "cid", as_double("centroid").alias("_cv")
    ).withColumn("_cn", norm(F.col("_cv")))
    vecs = _spread_vecs(df, id_col, vec_col)
    assigned = _assign_to_centroids(vecs, cents, id_col, vec_col, n_assign)
    assigned.write.partitionBy("list_id").mode("append").parquet(path)


def _sidecar_n_assign(sidecar: DataFrame) -> int:
    """The index's assignment multiplicity from its centroid sidecar;
    pre-r10 sidecars carry no n_assign column and mean 1."""
    if "n_assign" not in sidecar.columns:
        return 1
    return int(sidecar.select(F.max("n_assign")).first()[0] or 1)


def ivf_partitioned_topk(
    spark: SparkSession,
    path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    exclude_id: int | None = None,
) -> DataFrame:
    """Query a :func:`write_ivf_partitioned` index: probe lists are chosen
    DRIVER-SIDE against the ≤ n_list centroid sidecar (bounded collect),
    and the data scan filters ``list_id IN (probes)`` — a pure partition-
    directory prune, visible as PartitionFilters in the plan; non-probed
    files are never opened. Scoring matches :func:`ivf_topk` bit-for-bit:
    the same ``_cosine_vs_query`` expression (zero-norm guard included)
    against a broadcast one-row query frame whose ``_qn`` is the SAME Spark
    norm fold — not a driver-side Python summation, whose association order
    could differ at ROUND_DECIMALS boundaries. Probe CHOICE still happens
    driver-side against the ≤ n_list sidecar (a centroid rank, not a score
    the caller sees)."""
    import math

    sidecar = spark.read.parquet(f"{path}/_ivf_centroids")
    n_assign = _sidecar_n_assign(sidecar)
    cents = sidecar.collect()
    qn = math.sqrt(sum(x * x for x in query_vec))

    def _cos(c) -> float:
        cn = math.sqrt(sum(x * x for x in c["centroid"]))
        if qn * cn == 0:
            return float("-inf")
        return sum(a * b for a, b in zip(query_vec, c["centroid"])) / (qn * cn)

    probes = [
        c["cid"] for c in sorted(cents, key=lambda c: (-_cos(c), c["cid"]))[:n_probe]
    ]
    data = spark.read.parquet(path).filter(F.col("list_id").isin(probes))
    if exclude_id is not None:
        data = data.filter(F.col(id_col) != exclude_id)
    if n_assign > 1:
        # a vector stored in two probed list directories is one candidate;
        # dedup is candidate-set-sized (post-prune), never index-sized
        data = data.dropDuplicates([id_col])
    q_arr = F.array(*[F.lit(float(x)) for x in query_vec])
    q = (
        spark.range(1)
        .select(as_double(q_arr).alias("_query_vec"))
        .withColumn("_qn", norm(F.col("_query_vec")))
    )
    scored = data.join(F.broadcast(q)).select(
        F.col(id_col),
        F.round(_cosine_vs_query(as_double(vec_col)), ROUND_DECIMALS).alias(
            "cosine_sim"
        ),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def lsh_bucket_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    dim: int,
    k: int = 10,
    bits: int = 4,
) -> DataFrame:
    """ANN top-k: search only the query's hyperplane bucket.

    Recall < 1 by construction; the bench pairs it with brute_force_topk to
    report recall. At scale, ``bucket`` is the partition key.
    """
    # r13: spread before the bits*dim bucket expression + candidate dot
    # folds (functions/partitioning)
    bucketed = spread(df.select(F.col(id_col), F.col(vec_col)), id_col).select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(vec_col, dim, bits).alias("bucket"),
    )
    q = bucketed.filter(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("_query_vec"),
        F.col("bucket").alias("_query_bucket"),
    ).withColumn("_qn", norm(F.col("_query_vec")))
    scored = (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("_query_bucket"))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(as_double(vec_col)), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def lsh_multiprobe_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    dim: int,
    k: int = 10,
    bits: int = 4,
    n_flip: int = 3,
    salt: str = "plane",
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB 2007): search the query's
    bucket PLUS the ``n_flip`` best perturbed buckets, where EVERY subset
    of planes is a candidate perturbation ranked by its score — the sum
    of squared margins of the flipped planes (the paper's success-
    likelihood ordering). Single-bit flips of low-|margin| planes rank
    first, but a 2-bit flip of two near-zero margins beats a 1-bit flip
    of a confident plane — exactly the probes the r10 single-bit variant
    could never reach (its recall plateaued at 0.4 because the remaining
    true neighbors sat >= 2 plane flips away).

    Same storage as single-table LSH (ONE bucket id per vector — unlike
    multi-table OR-amplification, which stores L ids), recall between the
    single-table and multi-table tiers at (1+n_flip)/2^bits candidate
    fraction. The probe set is a deterministic expression of the query
    vector: per-plane squared margins are computed once inside the
    broadcast one-row query frame, all 2^bits (score, mask) structs are
    ranked with array_sort (score asc, mask asc — the home bucket's empty
    mask scores 0 and always leads), and the top (1+n_flip) masks XOR
    against the home bucket and EXPLODE into probe rows so the candidate
    join stays a hash EQUI-join on bucket — no nested-loop, no
    driver-side math.

    At scale: identical shape to ``lsh_bucket_topk`` — bucket is the
    partition key, probes multiply the scanned buckets by (1+n_flip).
    The mask enumeration is 2^bits expression terms, fine for the
    bucket-count regimes this tier targets (<= 256 buckets per table);
    a wide-bits index (bits > 8) should enumerate subsets of only its
    lowest-margin ~8 planes instead — guarded loudly below.
    """
    if bits > 8:
        raise ValueError(
            f"lsh_multiprobe_topk enumerates 2^bits perturbation masks "
            f"(bits={bits} -> {1 << bits}); for wide-bits indexes restrict "
            "the mask space to the lowest-|margin| <= 8 planes"
        )
    # NOT spread (r13, measured): ``bucketed`` feeds both the query-row
    # broadcast and the candidate scan as separate jobs; the repartition
    # cost repeats per job while each bucket pass is short (fresh-JVM
    # 1.34 s without vs 1.83 s with — scripts/probe_query.py, sf0.1)
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(vec_col, dim, bits, salt=salt).alias("bucket"),
    )
    # per-plane signed margins of the query vector, same coefficients and
    # left-to-right accumulation as hyperplane_bucket (sign(margin_b) is
    # exactly bucket bit b)
    margin_sql = [
        " + ".join(
            f"(CAST(get(_query_vec, {i}) AS DOUBLE) * "
            f"{_pseudo_coef(f'{salt}:{b}:{i}')!r})"
            for i in range(dim)
        )
        for b in range(bits)
    ]
    # squared margins once as columns; every mask's score is then a tiny
    # sum over them (terms in ascending plane order — the DuckDB oracle
    # must emit the identical term order for float parity)
    sq_cols = {f"_s{b}": F.expr(f"({m}) * ({m})") for b, m in enumerate(margin_sql)}
    mask_structs = [
        "struct("
        + (
            " + ".join(f"_s{b}" for b in range(bits) if (m >> b) & 1)
            or "CAST(0.0 AS DOUBLE)"
        )
        + f" AS sc, {m} AS m)"
        for m in range(1 << bits)
    ]
    probes = (
        f"transform(slice(array_sort(array({', '.join(mask_structs)})), 1, "
        f"{n_flip + 1}), s -> _query_bucket ^ s.m)"
    )
    q = bucketed.filter(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("_query_vec"),
        F.col("bucket").alias("_query_bucket"),
    )
    q = q.withColumn("_qn", norm(F.col("_query_vec")))
    for c, e in sq_cols.items():
        q = q.withColumn(c, e)
    q = q.select("_query_vec", "_qn", F.explode(F.expr(probes)).alias("_probe"))
    scored = (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("_probe"))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(as_double(vec_col)), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def _multitable_buckets_udf(dim: int, bits: int, tables: int, salt: str):
    """Arrow-batched bucket computation for all ``tables`` LSH tables at
    once: returns array<int> of per-table bucket ids.

    Accumulation is an explicit left-to-right loop over dims (each step a
    row-vectorized float64 op), NOT a BLAS matmul — pairwise/blocked
    summation could flip a sign on a near-zero dot and break bit-parity
    with the SQL-expression form and the DuckDB oracle.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    coef = np.array(
        [
            [
                [_pseudo_coef(f"{salt}:{t}:{b}:{i}") for i in range(dim)]
                for b in range(bits)
            ]
            for t in range(tables)
        ],
        dtype=np.float64,
    )

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        out = np.zeros((m.shape[0], tables), dtype=np.int32)
        for t in range(tables):
            for b in range(bits):
                acc = np.zeros(m.shape[0], dtype=np.float64)
                for i in range(dim):
                    acc = acc + m[:, i] * coef[t, b, i]
                out[:, t] += (acc > 0).astype(np.int32) << b
        return pd.Series(list(out))

    return buckets


def lsh_multitable_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    dim: int,
    k: int = 10,
    bits: int = 4,
    tables: int = 8,
    salt: str = "mplane",
) -> DataFrame:
    """OR-amplified multi-table LSH ANN: ``tables`` independent hyperplane
    hashes; a vector is a candidate if it collides with the query in ANY
    table. Single-table recall p per table becomes 1-(1-p)^tables while the
    candidate set stays a small union of buckets (~tables/2^bits of the
    data) — the standard recall dial that single-bucket LSH lacks.

    Scale shape: all tables*bits plane dots are computed in ONE
    Arrow-batched numpy UDF on the scan (no shuffle) — the equivalent
    built-in expression tree (tables*bits*dim terms) falls out of
    whole-stage codegen and evaluates interpreted, ~50x slower. The UDF
    accumulates left-to-right over dims (vectorized across rows), so every
    float64 sign decision is bit-identical to the expression form and the
    DuckDB oracle. The query row is a 1-row broadcast, so the
    OR-of-equalities match is a map-side filter (BroadcastNestedLoopJoin
    against one row). At warehouse scale the table_0 bucket doubles as the
    layout partition key and the remaining tables filter within the scan.
    """
    from functools import reduce as _reduce
    from operator import or_ as _or

    buckets_arr = _multitable_buckets_udf(dim, bits, tables, salt)
    # NOT spread (r13, measured): the bucketed frame feeds the query-row
    # broadcast plus the candidate scan as separate jobs (in-suite 0.94 s
    # without vs 1.23 s with — scripts/probe_batch.py, sf0.1)
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        buckets_arr(F.col(vec_col)).alias("_bs"),
    ).select(
        F.col(id_col),
        F.col(vec_col),
        *[F.get("_bs", t).alias(f"_b{t}") for t in range(tables)],
    )
    q = (
        bucketed.filter(F.col(id_col) == query_id)
        .select(
            as_double(vec_col).alias("_query_vec"),
            *[F.col(f"_b{t}").alias(f"_qb{t}") for t in range(tables)],
        )
        .withColumn("_qn", norm(F.col("_query_vec")))
    )
    match_any = _reduce(
        _or, [F.col(f"_b{t}") == F.col(f"_qb{t}") for t in range(tables)]
    )
    scored = (
        bucketed.join(F.broadcast(q), match_any)
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(as_double(vec_col)), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def quantized_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine over INT8-QUANTIZED vectors — the storage-
    compression tier: per-vector scalar quantization
    ``q_i = floor(x_i / max|x| * 127 + 0.5)`` shrinks float32/float64
    embeddings 4-8x on disk and in shuffle, and cosine is scale-invariant,
    so scoring runs on the quantized arrays directly (no dequantization,
    the per-vector scale never joins back in). At 100 TB the quantized
    column is what you'd persist; recall vs full-precision brute force is
    pinned in pytest and reported by bench.

    ``floor(.. + 0.5)`` instead of round(): floor is IEEE-exact and
    identical across engines, so the DuckDB oracle replays quantization
    bit-for-bit (round() ties differ by engine).
    """
    qz = (
        _spread_vecs(df, id_col, vec_col)
        .withColumn("_s", F.array_max(F.transform(F.col("_v"), F.abs)))
        .withColumn(
            "_q",
            F.when(
                F.col("_s") > 0,
                F.transform(
                    F.col("_v"),
                    lambda x: F.floor(x / F.col("_s") * 127 + F.lit(0.5)).cast(
                        "double"
                    ),
                ),
            ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0.0))),
        )
    )
    q = (
        qz.filter(F.col(id_col) == query_id)
        .select(F.col("_q").alias("_query_vec"))
        .withColumn("_qn", norm(F.col("_query_vec")))
    )
    scored = (
        qz.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(F.col("_q")), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def banded_ndup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float,
    bands: int = 6,
    bits: int = 10,
    salt: str = "ndupband",
    round_decimals: int = ROUND_DECIMALS,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via OR'd MULTI-BAND hyperplane LSH:
    ``bands`` independent ``bits``-bit tables; a pair is a candidate if it
    collides in ANY table, and candidates are verified exactly ONCE.

    Scale shape (vs a single wide table): random-pair collision probability
    is bands/2**bits — narrower per-table buckets kill the n^2/2**bits
    within-bucket blowup while OR-amplification restores recall for true
    near-dups (p_bit**bits per table becomes 1-(1-p**bits)**bands). At a
    realistic dedup threshold (cosine 0.9, p_bit ~0.9) the defaults give
    ~92% recall at a 6/1024 random-collision rate, vs 3%/(1/64) for the old
    single 6-bit table. Candidate generation is SKINNY: (id, band, bucket)
    rows only — vectors join in once per deduped candidate pair, never per
    band collision. All bands*bits plane dots are one Arrow-batched numpy
    pass on the scan (see ``_multitable_buckets_udf``; sign decisions are
    bit-identical to the SQL-expression form, so the DuckDB oracle replays
    bucketing exactly).

    The bucketed frame is persist()ed — it feeds candidate generation plus
    both verification sides. The returned frame is lazy, so release is the
    CALLER's job after its terminal action (``spark.catalog.clearCache()``
    or unpersist via the frame's plan); bench.py clears between queries.
    """
    buckets_arr = _multitable_buckets_udf(dim, bits, bands, salt)
    # NOT spread (r13, measured): the frame is persisted and every
    # consumer reads the cache, so a pre-persist repartition only adds an
    # exchange to the one materializing job (consumers regressed +0.3-0.5 s
    # each with it — scripts/probe_batch.py, sf0.1)
    bucketed = (
        df.select(
            F.col(id_col),
            as_double(vec_col).alias("_v"),
            buckets_arr(F.col(vec_col)).alias("_bs"),
        )
        .withColumn("_nrm", norm(F.col("_v")))
        .persist()
    )
    keys = bucketed.select(
        F.col(id_col), F.posexplode("_bs").alias("_band", "_bucket")
    )
    cand = (
        keys.select(F.col(id_col).alias("id_a"), "_band", "_bucket")
        .join(
            keys.select(F.col(id_col).alias("id_b"), "_band", "_bucket"),
            ["_band", "_bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = cand.join(
        bucketed.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_nrm").alias("_na"),
        ),
        "id_a",
    ).join(
        bucketed.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_nrm").alias("_nb"),
        ),
        "id_b",
    )
    n = F.col("_na") * F.col("_nb")
    sim = F.round(F.when(n > 0, dot(F.col("_va"), F.col("_vb")) / n), round_decimals)
    return (
        verified.select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def _kmeans_fit(
    sample: np.ndarray, n_list: int, iters: int = 5
) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample: seeds are
    the first ``n_list`` sample rows (the sample itself is hash-ordered, so
    seeding is pseudo-random but reproducible), then ``iters`` Lloyd steps
    with cosine assignment and mean re-centering. Pure numpy; the sample is
    bounded (default <=1024 rows) so the fit is O(sample * n_list * iters)
    on the driver regardless of table size."""
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    unit = sample / np.where(norms > 0, norms, 1.0)
    cents = unit[:n_list].copy()
    for _ in range(iters):
        cn = np.linalg.norm(cents, axis=1, keepdims=True)
        cu = cents / np.where(cn > 0, cn, 1.0)
        assign = np.argmax(unit @ cu.T, axis=1)
        for c in range(n_list):
            members = unit[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_kmeans_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    n_list: int = 8,
    n_probe: int = 2,
    sample_size: int = 1024,
    iters: int = 5,
    n_assign: int = 1,
) -> DataFrame:
    """IVF ANN with LEARNED centroids: a sampled spherical k-means fit
    replaces ``ivf_topk``'s hash-picked pseudo-centroids, so inverted
    lists follow the data's actual cluster structure and probing
    ``n_probe``/``n_list`` lists recovers most true neighbors instead of a
    random fraction (bench reports recall@10 for both tiers side by side).

    Scale shape: the fit collects a BOUNDED hash-ordered sample
    (<= ``sample_size`` rows) — the only driver-side data movement, same
    pattern as Spark MLlib's sampled inits. Assignment broadcasts the
    n_list x dim centroid matrix inside an Arrow-batched numpy UDF (one
    argmax matmul per batch, no shuffle of the embedding table); at
    warehouse scale the list id becomes the table's partition key, making
    each probe a partition-pruned scan. Fit and assignment are exactly
    reproducible (hash-ordered seeds, fixed iteration count, row-wise
    float64 matmul), but no SQL oracle can replay Lloyd iterations — the
    registry entry is declared rows-only and pytest pins recall + exact
    agreement of returned scores with brute force.

    ``n_assign`` > 1 applies the same spilled multi-assignment as
    ``ivf_topk`` (each vector stored in its n nearest learned lists;
    candidates deduped before the exact re-score) — the recall lever for
    border vectors the coarse quantizer would otherwise hide.

    Ties total-ordered by (rounded cosine DESC, id ASC) as everywhere.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    sample_rows = (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(sample_size)
        .select("_v")
        .collect()
    )
    sample = np.array([r["_v"] for r in sample_rows], dtype=np.float64)
    if sample.size == 0:
        return _empty_scored(df, id_col)
    cents = _kmeans_fit(sample, n_list, iters)
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    cu = cents / np.where(cn > 0, cn, 1.0)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def assign_cids(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        mu = m / np.where(nrm > 0, nrm, 1.0)
        sims = mu @ cu.T
        # top-n_assign list ids per vector, best first (argsort on -sims
        # is deterministic: ties broken by ascending cid)
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n_assign]
        return pd.Series(list(top.astype(np.int32)))

    vecs = _spread_vecs(df, id_col, vec_col)
    assigned = vecs.withColumn(
        "cid", F.explode(assign_cids(F.col("_v")))
    )

    qrow = assigned.filter(F.col(id_col) == query_id).select("_v").collect()
    if not qrow:
        return assigned.select(
            F.col(id_col).alias("vec_id"), F.lit(0.0).alias("cosine_sim")
        ).limit(0)
    qv = np.asarray(qrow[0]["_v"], dtype=np.float64)
    qn = np.linalg.norm(qv)
    qu = qv / (qn if qn > 0 else 1.0)
    probe_cids = [int(c) for c in np.argsort(-(cu @ qu))[:n_probe]]

    q = (
        vecs.filter(F.col(id_col) == query_id)
        .select(F.col("_v").alias("_query_vec"))
        .withColumn("_qn", norm(F.col("_query_vec")))
    )
    candidates = assigned.filter(F.col("cid").isin(probe_cids)).filter(
        F.col(id_col) != query_id
    )
    if n_assign > 1:
        # a vector stored in two probed lists is one candidate
        candidates = candidates.select(id_col, "_v").distinct()
    scored = candidates.join(F.broadcast(q)).select(
        F.col(id_col),
        F.round(_cosine_vs_query(F.col("_v")), ROUND_DECIMALS).alias(
            "cosine_sim"
        ),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def semdedup_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float,
    bits: int = 6,
    salt: str = "semdedup",
    round_decimals: int = ROUND_DECIMALS,
) -> DataFrame:
    """SemDeDup semantic pruning (Abbas et al. 2023, arXiv:2303.09540):
    cluster the embedding space, and inside each cluster drop one endpoint
    of every pair whose cosine exceeds ``threshold`` — keeping the member
    LEAST similar to the cluster centroid (the paper's policy: redundant
    prototypical copies go, the atypical representative stays).

    Clustering here is the deterministic hyperplane bucketer (k = 2**bits
    clusters) so a SQL oracle can replay the whole pipeline; a learned
    k-means tier plugs into the same within-cluster step (see
    ``ivf_kmeans_topk`` for the fit machinery).

    Scale shape: centroids are a (cluster, pos) partial-sum aggregate —
    skinny, map-side combinable, 2**bits * dim rows total. The only
    quadratic piece is the within-cluster pair join, which is the SemDeDup
    algorithm itself: cost ~ n^2 / k, so ``bits`` is chosen to bound the
    expected cluster size (the paper uses k ~ sqrt(n); at 100 TB you raise
    ``bits`` — or swap in k-means centroids — so clusters stay ~1e4 rows
    and every cluster's pair block fits one task). Elements are rounded to
    a 1e-3 grid before the centroid mean so Spark and DuckDB partial-sum
    orders agree at the 6-decimal output rounding.

    Returns one row per input vector: (id, cluster, cos_centroid, kept).
    """
    bucketed = (
        spread(df.select(F.col(id_col), F.col(vec_col)), id_col)
        .select(
            F.col(id_col),
            as_double(vec_col).alias("_v"),
            hyperplane_bucket(vec_col, dim, bits=bits, salt=salt).alias("cluster"),
        )
        .withColumn("_vr", F.transform("_v", lambda x: F.round(x, 3)))
        # Cache lifetime (this and the scored frame below): both back
        # the returned LAZY frame; caller releases after its terminal
        # action (bench.py/driver sim clearCache between queries)
        .persist()
    )
    # cluster centroid: elementwise mean over the 1e-3-rounded members
    cent = (
        bucketed.select("cluster", F.posexplode("_vr").alias("_pos", "_x"))
        .groupBy("cluster", "_pos")
        .agg(F.avg("_x").alias("_m"))
        .groupBy("cluster")
        .agg(
            F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pm")
        )
        .select(
            "cluster", F.transform("_pm", lambda s: s.getField("_m")).alias("_c")
        )
    )
    scored = (
        bucketed.join(F.broadcast(cent), "cluster")
        .withColumn("_n", norm(F.col("_v")) * norm(F.col("_c")))
        .withColumn(
            "cos_centroid",
            F.round(
                F.when(F.col("_n") > 0, dot(F.col("_v"), F.col("_c")) / F.col("_n")),
                round_decimals,
            ),
        )
        .select(id_col, "cluster", "_v", "cos_centroid")
        .persist()
    )
    a = scored.select(
        F.col("cluster"),
        F.col(id_col).alias("_ida"),
        F.col("_v").alias("_va"),
        F.col("cos_centroid").alias("_ca"),
    )
    b = scored.select(
        F.col("cluster"),
        F.col(id_col).alias("_idb"),
        F.col("_v").alias("_vb"),
        F.col("cos_centroid").alias("_cb"),
    )
    n_ab = norm(F.col("_va")) * norm(F.col("_vb"))
    pair_sim = F.round(
        F.when(n_ab > 0, dot(F.col("_va"), F.col("_vb")) / n_ab), round_decimals
    )
    # drop the pair member MORE similar to the centroid; ties -> higher id
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(pair_sim >= threshold)
        .select(
            F.when(F.col("_ca") > F.col("_cb"), F.col("_ida"))
            .when(F.col("_ca") < F.col("_cb"), F.col("_idb"))
            .otherwise(F.greatest("_ida", "_idb"))
            .alias("_drop_id")
        )
        .distinct()
    )
    return scored.join(
        dropped, scored[id_col] == dropped["_drop_id"], "left"
    ).select(
        id_col,
        "cluster",
        "cos_centroid",
        F.col("_drop_id").isNull().alias("kept"),
    )


def _empty_scored(df: DataFrame, id_col: str) -> DataFrame:
    """Zero-row (id, cosine_sim) frame matching every topk tier's schema —
    returned when the fit sample collects empty (empty input table), where
    ``sample.shape[1]`` would otherwise IndexError on a 1-d array."""
    return df.select(
        F.col(id_col), F.lit(0.0).cast("double").alias("cosine_sim")
    ).limit(0)


def _pq_fit(
    sample: np.ndarray, n_sub: int, n_codes: int, iters: int = 5
) -> np.ndarray:
    """Deterministic per-subspace Euclidean k-means (the PQ codebooks):
    seeds are the first ``n_codes`` hash-ordered sample rows of each
    subspace, then ``iters`` Lloyd steps. Returns (n_sub, n_codes,
    dim/n_sub). Bounded sample -> O(sample * n_codes * iters) driver
    work, independent of table size (same contract as _kmeans_fit)."""
    dim = sample.shape[1]
    sub = dim // n_sub
    books = []
    for s in range(n_sub):
        x = sample[:, s * sub : (s + 1) * sub]
        cents = x[:n_codes].copy()
        for _ in range(iters):
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
            assign = np.argmin(d, axis=1)
            for c in range(n_codes):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return np.stack(books)


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    n_sub: int = 16,
    n_codes: int = 16,
    rerank: int = 100,
    sample_size: int = 1024,
    iters: int = 5,
) -> DataFrame:
    """Product-quantization ANN top-k (Jegou et al., PAMI 2011), deployed
    the standard two-phase way: ADC (asymmetric distance computation) over
    the COMPRESSED codes builds a ``rerank``-sized shortlist, then only
    the shortlist's full vectors are read for exact cosine re-ranking.
    Vectors compress to ``n_sub`` 4-bit codes (defaults: 16 subspaces x
    16 codes = 8 bytes per 64-dim float32 vector, 32x) and ADC scoring a
    query needs only an (n_sub x n_codes) lookup table of query-subvector
    . codeword dots — 256 doubles broadcast as plan LITERALS, so the
    shortlist scan never touches the original vectors. THE memory-bound
    ANN tier at 10^11 vectors: the code table fits where the vectors
    can't, and full vectors are fetched for ~rerank rows per query.

    Plan shape: codebook fit on a bounded hash-ordered sample (driver,
    same contract as ivf_kmeans); encoding is one Arrow-batched numpy pass
    (argmin per subspace, no shuffle); ADC is n_sub element_at() lookups
    per row inside codegen ending in TakeOrderedAndProject(rerank); the
    re-rank joins ``rerank`` ids back to vectors and returns EXACT scores
    (same contract as the LSH/IVF tiers: approximate candidate set, true
    cosines). Pytest pins recall vs brute force and exact-score agreement;
    rows-only in the registry (Lloyd has no SQL twin).
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    sample_rows = (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(sample_size)
        .select("_v")
        .collect()
    )
    sample = np.array([r["_v"] for r in sample_rows], dtype=np.float64)
    if sample.size == 0:
        return _empty_scored(df, id_col)
    dim = sample.shape[1]
    sub = dim // n_sub
    books = _pq_fit(sample, n_sub, n_codes, iters)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        codes = np.empty((m.shape[0], n_sub), dtype=np.int32)
        for s in range(n_sub):
            x = m[:, s * sub : (s + 1) * sub]
            d = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=-1)
            codes[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    vecs = _spread_vecs(df, id_col, vec_col)
    coded = vecs.withColumn("_codes", encode(F.col("_v")))

    qrow = vecs.filter(F.col(id_col) == query_id).select("_v").collect()
    if not qrow:
        return coded.select(
            F.col(id_col).alias("vec_id"), F.lit(0.0).alias("cosine_sim")
        ).limit(0)
    qv = np.asarray(qrow[0]["_v"], dtype=np.float64)
    qn = float(np.linalg.norm(qv))

    # ADC lookup tables as plan literals: dot(q_s, codeword) and
    # ||codeword||^2 per (subspace, code) — n_sub*n_codes doubles each
    luts = [
        [float(qv[s * sub : (s + 1) * sub] @ books[s][c]) for c in range(n_codes)]
        for s in range(n_sub)
    ]
    n2s = [
        [float(books[s][c] @ books[s][c]) for c in range(n_codes)]
        for s in range(n_sub)
    ]
    dot_expr = None
    n2_expr = None
    for s in range(n_sub):
        lut = F.array(*[F.lit(v) for v in luts[s]])
        n2 = F.array(*[F.lit(v) for v in n2s[s]])
        code = F.col("_codes").getItem(s) + 1
        d = F.element_at(lut, code)
        n_ = F.element_at(n2, code)
        dot_expr = d if dot_expr is None else dot_expr + d
        n2_expr = n_ if n2_expr is None else n2_expr + n_
    approx_norm = F.sqrt(n2_expr)
    denom = F.lit(qn) * approx_norm
    sim = F.when(denom > 0, dot_expr / denom)
    shortlist = (
        coded.filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.round(sim, ROUND_DECIMALS).alias("_adc"),
        )
        .orderBy(F.desc("_adc"), F.asc(id_col))
        .limit(rerank)
        .select(id_col)
    )
    # exact re-rank: only `rerank` full vectors are read/scored
    q = (
        vecs.filter(F.col(id_col) == query_id)
        .select(F.col("_v").alias("_query_vec"))
        .withColumn("_qn", norm(F.col("_query_vec")))
    )
    return (
        shortlist.join(vecs, id_col)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(F.col("_v")), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    n_list: int = 8,
    n_probe: int = 2,
    n_sub: int = 16,
    n_codes: int = 16,
    rerank: int = 100,
    sample_size: int = 1024,
    iters: int = 5,
) -> DataFrame:
    """IVF+PQ composite ANN (the FAISS IVFPQ shape): a coarse spherical
    k-means quantizer prunes the search to ``n_probe``/``n_list`` inverted
    lists, and within the probed lists RESIDUAL vectors (v - centroid) are
    PQ-coded and scored by ADC — so the scan touches n_probe/n_list of the
    rows AND reads 8-byte codes instead of vectors. Residual coding is
    what makes PQ sharp here: residuals have much smaller spread than raw
    vectors, so the same codebook budget quantizes finer.

    Shape: coarse fit + PQ fit on a bounded hash-ordered sample (driver);
    assignment + encoding one Arrow-batched numpy pass; probe choice is
    driver-side vs the n_list centroids; ADC tables are PER-PROBED-LIST
    literals (the query residual differs per list) dispatched by a CASE on
    list_id; shortlist re-ranks exactly. Rows-only (two k-means fits);
    pytest pins recall and exact-score agreement.
    """
    cents, cu, books = _ivfpq_fit(
        df, id_col, vec_col, n_list, n_sub, n_codes, sample_size, iters
    )
    if cents is None:
        return _empty_scored(df, id_col)
    dim = cents.shape[1]
    sub = dim // n_sub
    assign_encode = _ivfpq_assign_encode_udf(cents, cu, books, n_sub, n_codes)

    vecs = _spread_vecs(df, id_col, vec_col)
    coded = vecs.withColumn("_lc", assign_encode(F.col("_v"))).select(
        id_col, "_v", F.col("_lc.list_id").alias("_list"), F.col("_lc.codes").alias("_codes")
    )

    qrow = vecs.filter(F.col(id_col) == query_id).select("_v").collect()
    if not qrow:
        return coded.select(
            F.col(id_col).alias("vec_id"), F.lit(0.0).alias("cosine_sim")
        ).limit(0)
    qv = np.asarray(qrow[0]["_v"], dtype=np.float64)
    qn = float(np.linalg.norm(qv))
    qu = qv / (qn if qn > 0 else 1.0)
    probes = [int(c) for c in np.argsort(-(cu @ qu))[:n_probe]]

    # per-probed-list ADC: approx dot(q, v) = dot(q, centroid_l) +
    # sum_s dot(q_s, codeword); approx |v|^2 = |centroid_l + reconstructed
    # residual|^2 expanded with cross terms folded into the tables:
    # |c|^2 + 2*dot(c_s, w_s) + |w_s|^2 per subspace.
    #
    # The tables are shipped as an Arrow-batched numpy kernel, not plan
    # literals: at n_probe>=3 the literal CASE tree (n_probe x n_sub x
    # n_codes x 3 doubles) exceeds Janino's 64 KB method limit, so the
    # whole stage silently fell back to interpreted per-row evaluation —
    # the numpy gather is both the faster and the honest 100 TB shape
    # (FAISS keeps the LUT in registers; Arrow batches are our registers).
    lut = np.zeros((n_list, n_sub, n_codes))  # dot(q_s, codeword)
    cross2 = np.zeros((n_list, n_sub, n_codes))  # 2*dot(c_s, w_s) + |w_s|^2
    qdc = np.zeros(n_list)
    c2 = np.zeros(n_list)
    for l in probes:
        c = cents[l]
        qdc[l] = float(qv @ c)
        c2[l] = float(c @ c)
        for s in range(n_sub):
            for j in range(n_codes):
                w = books[s][j]
                lut[l, s, j] = float(qv[s * sub : (s + 1) * sub] @ w)
                cross2[l, s, j] = 2.0 * float(
                    c[s * sub : (s + 1) * sub] @ w
                ) + float(w @ w)

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _adc_score(lists: pd.Series, codes: pd.Series) -> pd.Series:
        ls = lists.to_numpy()
        cd = np.stack(codes.to_numpy()).astype(np.int64)  # (rows, n_sub)
        srange = np.arange(n_sub)[None, :]  # broadcast vs (rows, 1) lists
        dots = qdc[ls] + lut[ls[:, None], srange, cd].sum(axis=1)
        norm2 = c2[ls] + cross2[ls[:, None], srange, cd].sum(axis=1)
        denom = qn * np.sqrt(np.maximum(norm2, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.where(denom > 0, dots / denom, np.nan)
        return pd.Series(sim)

    shortlist = (
        coded.filter(F.col("_list").isin(probes) & (F.col(id_col) != query_id))
        .select(
            F.col(id_col),
            F.round(
                _adc_score(F.col("_list"), F.col("_codes")), ROUND_DECIMALS
            ).alias("_adc"),
        )
        .orderBy(F.desc("_adc"), F.asc(id_col))
        .limit(rerank)
        .select(id_col)
    )
    q = (
        vecs.filter(F.col(id_col) == query_id)
        .select(F.col("_v").alias("_query_vec"))
        .withColumn("_qn", norm(F.col("_query_vec")))
    )
    return (
        shortlist.join(vecs, id_col)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(F.col("_v")), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def _ivfpq_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_list: int,
    n_sub: int,
    n_codes: int,
    sample_size: int,
    iters: int,
):
    """Shared IVFPQ model fit (coarse centroids + residual codebooks) from
    the bounded hash-ordered sample — one implementation so the in-memory
    operator and the storage layer produce IDENTICAL models."""
    sample_rows = (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(sample_size)
        .select("_v")
        .collect()
    )
    sample = np.array([r["_v"] for r in sample_rows], dtype=np.float64)
    if sample.size == 0:
        return None, None, None  # empty input: callers return/write nothing
    cents = _kmeans_fit(sample, n_list, iters)
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    cu = cents / np.where(cn > 0, cn, 1.0)
    s_norm = np.linalg.norm(sample, axis=1, keepdims=True)
    s_unit = sample / np.where(s_norm > 0, s_norm, 1.0)
    s_assign = np.argmax(s_unit @ cu.T, axis=1)
    books = _pq_fit(sample - cents[s_assign], n_sub, n_codes, iters)
    return cents, cu, books


def _ivfpq_assign_encode_udf(cents, cu, books, n_sub: int, n_codes: int):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    dim = cents.shape[1]
    sub = dim // n_sub

    @pandas_udf(
        T.StructType(
            [
                T.StructField("list_id", T.IntegerType()),
                T.StructField("codes", T.ArrayType(T.IntegerType())),
            ]
        )
    )
    def assign_encode(vecs: pd.Series) -> pd.DataFrame:
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        mu = m / np.where(nrm > 0, nrm, 1.0)
        lists = np.argmax(mu @ cu.T, axis=1)
        res = m - cents[lists]
        codes = np.empty((m.shape[0], n_sub), dtype=np.int32)
        for s in range(n_sub):
            x = res[:, s * sub : (s + 1) * sub]
            d = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=-1)
            codes[:, s] = np.argmin(d, axis=1)
        return pd.DataFrame(
            {"list_id": lists.astype(np.int32), "codes": list(codes)}
        )

    return assign_encode


def write_ivfpq_partitioned(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_list: int = 8,
    n_sub: int = 16,
    n_codes: int = 16,
    sample_size: int = 1024,
    iters: int = 5,
) -> None:
    """Materialize the IVFPQ index: (id, codes) rows PARTITIONED by
    ``list_id`` plus two underscore sidecars — ``_ivfpq_centroids``
    (≤ n_list rows) and ``_ivfpq_codebooks`` (n_sub*n_codes rows of
    subvector codewords). The stored index is 8 bytes of codes per vector;
    the original vectors are NOT stored (re-ranking reads them from the
    source table, the standard split between the ANN index and the vector
    store). Probes prune at the partition-directory level
    (:func:`ivfpq_partitioned_topk`)."""
    cents, cu, books = _ivfpq_fit(
        df, id_col, vec_col, n_list, n_sub, n_codes, sample_size, iters
    )
    if cents is None:
        raise ValueError("cannot build an IVFPQ index from an empty table")
    enc = _ivfpq_assign_encode_udf(cents, cu, books, n_sub, n_codes)
    vecs = _spread_vecs(df, id_col, vec_col)
    (
        vecs.withColumn("_lc", enc(F.col("_v")))
        .select(
            id_col,
            F.col("_lc.list_id").alias("list_id"),
            F.col("_lc.codes").alias("codes"),
        )
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    spark.createDataFrame(
        [(int(i), [float(x) for x in cents[i]]) for i in range(len(cents))],
        "cid int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/_ivfpq_centroids")
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in books[s][c]])
            for s in range(n_sub)
            for c in range(n_codes)
        ],
        "sub int, code int, word array<double>",
    ).write.mode("overwrite").parquet(f"{path}/_ivfpq_codebooks")


def ivfpq_partitioned_topk(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 100,
    exclude_id: int | None = None,
) -> DataFrame:
    """Query a :func:`write_ivfpq_partitioned` index: probe lists chosen
    driver-side against the ≤ n_list centroid sidecar; the code scan
    filters ``list_id IN (probes)`` — a pure partition-directory prune
    (PartitionFilters, asserted in tests) so non-probed directories are
    never opened; ADC tables are per-probed-list literals; the shortlist
    re-ranks EXACTLY against the caller's vector store (``vectors``).
    Scoring matches :func:`ivfpq_topk` bit-for-bit given the same fit
    parameters (shared `_ivfpq_fit`/encode implementation)."""
    cent_rows = spark.read.parquet(f"{path}/_ivfpq_centroids").collect()
    cents = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        cents[r["cid"]] = np.asarray(r["centroid"], dtype=np.float64)
    book_rows = spark.read.parquet(f"{path}/_ivfpq_codebooks").collect()
    n_sub = max(r["sub"] for r in book_rows) + 1
    n_codes = max(r["code"] for r in book_rows) + 1
    sub = len(book_rows[0]["word"])
    books = np.zeros((n_sub, n_codes, sub))
    for r in book_rows:
        books[r["sub"]][r["code"]] = np.asarray(r["word"], dtype=np.float64)

    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    cu = cents / np.where(cn > 0, cn, 1.0)
    qu = qv / (qn if qn > 0 else 1.0)
    probes = [int(c) for c in np.argsort(-(cu @ qu))[:n_probe]]

    coded = spark.read.parquet(path).filter(F.col("list_id").isin(probes))
    if exclude_id is not None:
        coded = coded.filter(F.col(id_col) != exclude_id)

    sim_expr = None
    for l in probes:
        c = cents[l]
        dot_e = F.lit(float(qv @ c))
        norm2_e = F.lit(float(c @ c))
        for s in range(n_sub):
            code = F.col("codes").getItem(s) + 1
            lut = [float(qv[s * sub : (s + 1) * sub] @ books[s][j]) for j in range(n_codes)]
            cross = [float(c[s * sub : (s + 1) * sub] @ books[s][j]) for j in range(n_codes)]
            n2 = [float(books[s][j] @ books[s][j]) for j in range(n_codes)]
            dot_e = dot_e + F.element_at(F.array(*[F.lit(v) for v in lut]), code)
            norm2_e = (
                norm2_e
                + 2.0 * F.element_at(F.array(*[F.lit(v) for v in cross]), code)
                + F.element_at(F.array(*[F.lit(v) for v in n2]), code)
            )
        denom = F.lit(qn) * F.sqrt(F.greatest(norm2_e, F.lit(0.0)))
        this = F.when(denom > 0, dot_e / denom)
        sim_expr = (
            F.when(F.col("list_id") == l, this)
            if sim_expr is None
            else sim_expr.when(F.col("list_id") == l, this)
        )

    shortlist = (
        coded.select(F.col(id_col), F.round(sim_expr, ROUND_DECIMALS).alias("_adc"))
        .orderBy(F.desc("_adc"), F.asc(id_col))
        .limit(rerank)
        .select(id_col)
    )
    vecs = vectors.select(F.col(id_col), as_double(vec_col).alias("_v"))
    q_arr = F.array(*[F.lit(float(x)) for x in query_vec])
    q = (
        spark.range(1)
        .select(as_double(q_arr).alias("_query_vec"))
        .withColumn("_qn", norm(F.col("_query_vec")))
    )
    return (
        shortlist.join(vecs, id_col)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(_cosine_vs_query(F.col("_v")), ROUND_DECIMALS).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def append_ivfpq_partitioned(
    df: DataFrame, id_col: str, vec_col: str, path: str
) -> None:
    """Incremental IVFPQ maintenance: assign + encode NEW vectors against
    the index's EXISTING sidecars (centroids + codebooks are never refit —
    the ANN-index contract that keeps old codes valid) and append into the
    ``list_id`` partition directories. An index grown batch-by-batch is
    bit-identical to a single-pass build with the same model (parity-
    tested); probes stay partition-pruned throughout."""
    spark = df.sparkSession
    cent_rows = spark.read.parquet(f"{path}/_ivfpq_centroids").collect()
    cents = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        cents[r["cid"]] = np.asarray(r["centroid"], dtype=np.float64)
    book_rows = spark.read.parquet(f"{path}/_ivfpq_codebooks").collect()
    n_sub = max(r["sub"] for r in book_rows) + 1
    n_codes = max(r["code"] for r in book_rows) + 1
    books = np.zeros((n_sub, n_codes, len(book_rows[0]["word"])))
    for r in book_rows:
        books[r["sub"]][r["code"]] = np.asarray(r["word"], dtype=np.float64)
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    cu = cents / np.where(cn > 0, cn, 1.0)
    enc = _ivfpq_assign_encode_udf(cents, cu, books, n_sub, n_codes)
    (
        df.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .withColumn("_lc", enc(F.col("_v")))
        .select(
            id_col,
            F.col("_lc.list_id").alias("list_id"),
            F.col("_lc.codes").alias("codes"),
        )
        .write.partitionBy("list_id")
        .mode("append")
        .parquet(path)
    )


def mmr_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int = 10,
    lam: float = 0.7,
    shortlist: int = 50,
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein,
    SIGIR 1998): greedily pick the item maximizing
    ``lam * relevance - (1 - lam) * max_sim_to_already_picked`` — the
    de-redundancy re-rank every retrieval/data-selection funnel applies
    after a plain cosine top-k (near-identical neighbors waste the slate).

    Scale shape: the DISTRIBUTED stage is the relevance scan + shortlist
    TakeOrderedAndProject(shortlist) — identical to brute_force_topk. The
    greedy re-rank is inherently sequential, so it runs driver-side over
    the bounded shortlist (<= ``shortlist`` rows x dim doubles — same class
    of bounded sidecar collect as the IVF centroid tables), NOT over the
    corpus. At 100 TB only the scan grows; the re-rank stays O(shortlist^2).

    Float parity: relevance and unit vectors are computed JVM-side with the
    left-fold ``dot`` (bit-identical to the DuckDB oracle's list_reduce
    fold), and the greedy's pairwise dots use the same left-to-right
    accumulation in pure Python — so selection, not just reported scores,
    replays exactly across engines.

    Returns (id_col, mmr_rank, relevance, mmr_score) — rank 1..k, scores
    rounded to 1e-6 for reporting.
    """
    q = _query_vector(df, id_col, vec_col, query_id)
    v = as_double(vec_col)
    nrm = norm(v)
    # r13: spread before the relevance + unit-vector folds
    cand = (
        spread(df.select(F.col(id_col), F.col(vec_col)), id_col)
        .filter(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            _cosine_vs_query(v).alias("_r"),
            F.transform(v, lambda x: x / nrm).alias("_u"),
        )
        .orderBy(F.desc("_r"), F.asc(id_col))
        .limit(shortlist)
    )
    rows = cand.collect()

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    remaining = {r[id_col]: (r["_r"], r["_u"]) for r in rows}
    picked: list[tuple] = []
    chosen_vecs: list[list] = []
    while remaining and len(picked) < k:
        best = None
        for vid in sorted(remaining):
            r, u = remaining[vid]
            msim = max((fold_dot(u, cu) for cu in chosen_vecs), default=0.0)
            score = lam * r - (1.0 - lam) * msim
            # strict > keeps the smallest id on ties (ids scanned ascending)
            if best is None or score > best[1]:
                best = (vid, score)
        vid, score = best
        r, u = remaining.pop(vid)
        picked.append((vid, len(picked) + 1, round(r, 6), round(score, 6)))
        chosen_vecs.append(u)

    spark = df.sparkSession
    # preserve the table's actual id type (int/long/string), like every
    # other similarity operator — a hardcoded `long` would fail or coerce
    # on non-bigint id columns (ADVICE r5).
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
        DoubleType,
    )

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("mmr_rank", IntegerType()),
            StructField("relevance", DoubleType()),
            StructField("mmr_score", DoubleType()),
        ]
    )
    return spark.createDataFrame(picked, out_schema)


def filtered_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    predicate,
    k: int = 10,
) -> DataFrame:
    """Filtered vector search: exact top-k cosine neighbors among rows
    satisfying ``predicate`` (a boolean Column over the table's metadata
    columns). The query vector is looked up in the UNFILTERED table, so a
    query row outside the filtered slice can still search it.

    Scale shape: metadata predicates are plain Catalyst filters, so they
    PUSH DOWN to the scan (parquet row-group pruning / partition pruning
    when the predicate hits a partition column) — the selective-filter
    regime where pre-filtering beats post-filtering an ANN shortlist
    (recall of post-filtered ANN collapses when the filter is selective).
    Composes with the IVF/IVFPQ partitioned indexes by conjoining
    ``predicate`` with the probe-list partition filter.
    """
    q = _query_vector(df, id_col, vec_col, query_id)
    # r13: spread AFTER the pushdown-eligible metadata predicate (so the
    # scan still prunes), before the per-row dot fold
    scored = (
        df.filter(predicate)
        .transform(lambda d: spread(d, id_col))
        .filter(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(
                _cosine_vs_query(as_double(vec_col)), ROUND_DECIMALS
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def kcenter_coreset(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    quant: int = 1_000_000,
) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection: pick ``k``
    vectors so every vector is close to some pick — the classic 2-approx
    cover used for diverse-subset curation (choose representative docs,
    seed labeling budgets, init k-means). Returns one row per pick:
    ``(sel_round, id, dist2_q, radius)`` where ``dist2_q`` is the pick's
    squared distance (quantized-integer space) to the previously-selected
    set — the non-increasing coverage-radius sequence.

    Determinism/portability: components quantize to ``round(x * quant)``
    BIGINTs (the PCA-family convention), so distances are EXACT integer
    sums — no FP summation-order drift — and a SQL oracle replays every
    round bit-for-bit. Seed = max squared norm, ties to the smallest id;
    each round's pick = max distance-to-selected, same tie-break.

    Scale shape: one narrow map pass per round (zip_with against the
    broadcast-literal new center) + one TakeOrdered(1) — k bounded passes,
    no shuffle, no join. The running ``dmin`` frame is persisted per round
    (the BFS/CC discipline) so round r never replays rounds 0..r-1;
    driver traffic is ONE row per round. At 100 TB this is k fact scans —
    the honest price of the 2-approximation guarantee; k is a knob, not a
    function of data size.
    """
    spark = df.sparkSession
    base = quantize_vectors(df, id_col, vec_col, quant).persist()
    dist2_to = dist2_to_center

    norm2 = F.aggregate(
        F.col("_qv"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    seed = (
        base.select("_id", "_qv", norm2.alias("_n2"))
        .orderBy(F.desc("_n2"), F.asc("_id"))
        .limit(1)
        .first()
    )
    if seed is None:  # empty/all-NULL input: empty result, like the oracle
        base.unpersist()
        return spark.createDataFrame(
            [],
            schema=(
                f"sel_round INT, {id_col} BIGINT, dist2_q BIGINT, "
                "radius DOUBLE"
            ),
        )
    picks = [(0, seed["_id"], 0)]
    cur = base.select("_id", "_qv", dist2_to(seed["_qv"]).alias("_dmin")).persist()
    # r13 (guide §1.2 — one action per round, not two): the TakeOrdered
    # argmax evaluates EVERY partition, so it both materializes the
    # persisted round frame and returns the pick in a single job; the old
    # separate .count() warm-up doubled the per-round job count for no
    # extra information. The previous round's cache is released only
    # AFTER the argmax has materialized the new round on top of it, so no
    # round ever recomputes its predecessors.
    prev = None
    for r in range(1, k):
        top = cur.orderBy(F.desc("_dmin"), F.asc("_id")).limit(1).collect()[0]
        if prev is not None:
            prev.unpersist()
            prev = None
        picks.append((r, top["_id"], top["_dmin"]))
        if r < k - 1:
            # the final round's pick needs no further dmin update — the
            # old code built and materialized one more frame it threw away
            nxt = cur.select(
                "_id",
                "_qv",
                F.least(F.col("_dmin"), dist2_to(top["_qv"])).alias("_dmin"),
            ).persist()
            prev, cur = cur, nxt
    if prev is not None:
        prev.unpersist()
    cur.unpersist()
    base.unpersist()
    out = spark.createDataFrame(
        picks, schema=f"sel_round INT, {id_col} BIGINT, dist2_q BIGINT"
    )
    return out.select(
        "sel_round",
        id_col,
        "dist2_q",
        F.round(F.sqrt(F.col("dist2_q").cast("double")) / quant, 6).alias(
            "radius"
        ),
    ).orderBy("sel_round")


def hard_negatives(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    dim: int,
    bands: int = 4,
    bits: int = 8,
    salt: str = "hardneg",
    k: int = 1,
    round_decimals: int = ROUND_DECIMALS,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, its ``k`` most-cosine-similar vectors with a DIFFERENT label —
    the negatives that actually move an embedding model, vs the uniform
    draws ``contrastive_negatives`` produces.

    Scale shape: identical to ``banded_ndup_pairs`` — ``bands`` narrow
    ``bits``-bit LSH tables generate candidates (collide in ANY band,
    label differs), candidates are deduped to skinny id pairs, vectors
    join in once per pair for exact verification, and the per-anchor
    ranking window is bounded by the anchor's collision fan-out (never
    n^2, never a global sort). Anchors whose buckets hold only same-label
    vectors drop out — the honest recall cost of blocking; at 100 TB you
    raise ``bands`` (OR-amplification) instead of widening buckets.
    """
    buckets_arr = _multitable_buckets_udf(dim, bits, bands, salt)
    # persist lifetime: see containment_pairs — harness-scoped, not
    # builder-scoped (an in-builder unpersist would disable the reuse).
    # NOT spread (r13, measured): persisted multi-consumer frame — same
    # reasoning as banded_ndup_pairs (hard_negative_mining read 1.61 s
    # without the spread vs 2.12 s with — scripts/probe_batch.py, sf0.1)
    bucketed = (
        df.select(
            F.col(id_col),
            F.col(label_col),
            as_double(vec_col).alias("_v"),
            buckets_arr(F.col(vec_col)).alias("_bs"),
        )
        .withColumn("_nrm", norm(F.col("_v")))
        .persist()
    )
    keys = bucketed.select(
        F.col(id_col),
        F.col(label_col),
        F.posexplode("_bs").alias("_band", "_bucket"),
    )
    cand = (
        keys.select(
            F.col(id_col).alias("anchor_id"),
            F.col(label_col).alias("_la"),
            "_band",
            "_bucket",
        )
        .join(
            keys.select(
                F.col(id_col).alias("negative_id"),
                F.col(label_col).alias("_lb"),
                "_band",
                "_bucket",
            ),
            ["_band", "_bucket"],
        )
        .filter(
            (F.col("_la") != F.col("_lb"))
            & (F.col("anchor_id") != F.col("negative_id"))
        )
        .select("anchor_id", "negative_id")
        .distinct()
    )
    a = bucketed.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col("_v").alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = bucketed.select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("negative_label"),
        F.col("_v").alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    n = F.col("_na") * F.col("_nb")
    scored = (
        cand.join(a, "anchor_id")
        .join(b, "negative_id")
        .select(
            "anchor_id",
            "negative_id",
            "anchor_label",
            "negative_label",
            F.round(
                F.when(n > 0, dot(F.col("_va"), F.col("_vb")) / n),
                round_decimals,
            ).alias("cosine_sim"),
        )
        # Zero-norm vectors have undefined cosine; drop the pair (the
        # DuckDB oracle's WHERE norm-product > 0 does the same) instead of
        # letting a NULL cosine win rank 1 (ADVICE r8).
        .filter(F.col("cosine_sim").isNotNull())
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("negative_id")
    )
    return (
        scored.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .orderBy("anchor_id", "neg_rank")
    )


def quantize_vectors(
    df: DataFrame, id_col: str, vec_col: str, quant: int = 1_000_000
) -> DataFrame:
    """(_id, _qv) frame with ``round(x * quant)`` BIGINT components — the
    exact-integer distance space shared by the batch k-center coreset and
    its streaming maintenance sink."""
    qv = F.transform(
        as_double(vec_col), lambda x: F.round(x * quant).cast("long")
    )
    # r13: spread before the quantize transform — the (persisted) frame
    # this builds backs k serialized zip_with/fold rounds in the k-center
    # loops, so its partitioning IS the loop parallelism
    # (functions/partitioning.spread)
    return spread(
        df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col), F.col(vec_col)
        ),
        id_col,
    ).select(F.col(id_col).alias("_id"), qv.alias("_qv"))


def dist2_to_center(center: list[int]) -> Column:
    """Exact integer squared distance from ``_qv`` to a literal center."""
    c = F.array(*[F.lit(int(v)).cast("long") for v in center])
    return F.aggregate(
        F.zip_with(F.col("_qv"), c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dist2_py(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def greedy_kcenter_centers(
    pts: DataFrame, k: int
) -> tuple[list[tuple[int, list[int]]], int]:
    """Driver-coordinated greedy k-center over a quantized (_id, _qv)
    frame: returns the k (id, qv) centers and the COVERAGE radius^2 (max
    over points of dist2 to the selected set — one extra argmax pass).
    Shared by the batch coreset bootstrap of the streaming sink."""
    norm2 = F.aggregate(
        F.col("_qv"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    seed = (
        pts.select("_id", "_qv", norm2.alias("_n2"))
        .orderBy(F.desc("_n2"), F.asc("_id"))
        .limit(1)
        .first()
    )
    if seed is None:  # empty/all-NULL input: no centers, zero radius
        return [], 0
    centers = [(seed["_id"], list(seed["_qv"]))]
    cur = pts.select(
        "_id", "_qv", dist2_to_center(centers[0][1]).alias("_dmin")
    ).persist()
    # r13: one action per round (see kcenter_coreset) — the argmax both
    # materializes the round frame and returns the pick; the previous
    # round's cache is released only after its successor is materialized.
    prev = None
    for _ in range(1, k):
        top = cur.orderBy(F.desc("_dmin"), F.asc("_id")).limit(1).collect()[0]
        if prev is not None:
            prev.unpersist()
            prev = None
        if top["_dmin"] == 0:
            break  # fewer than k distinct points
        centers.append((top["_id"], list(top["_qv"])))
        nxt = cur.select(
            "_id",
            "_qv",
            F.least(F.col("_dmin"), dist2_to_center(centers[-1][1])).alias(
                "_dmin"
            ),
        ).persist()
        prev, cur = cur, nxt
    # materializes the final round's frame (coverage radius needs it)
    r2 = cur.agg(F.max("_dmin")).collect()[0][0] or 0
    if prev is not None:
        prev.unpersist()
    cur.unpersist()
    return centers, int(r2)
