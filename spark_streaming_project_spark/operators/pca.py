"""Quantized PCA building blocks: additive raw moments + the integer
power-iteration eigensolve.

The distributed piece (``pca_raw_moments``) emits two PURELY ADDITIVE
frames — the d x d raw second-moment cells and the per-dimension
(sum, count) moments — so the same state can be maintained
incrementally by the streaming incremental-agg sink and solved read-side
(centering happens in the solve via the exact integer identity
``sum((q_j - m_j)(q_k - m_k)) = raw_jk - m_j c_k - m_k c_j + n m_j m_k``,
which holds term-for-term over BIGINTs). The solve
(``pca_solve_from_moments``) mirrors the unrolled DuckDB oracle of the
``embedding_top_pc`` plan bit-for-bit; every signed division is the
sign-safe half-up form because DuckDB's ``//`` truncates toward zero
while Python's floors.

Scale: the moment pass is the only data-proportional work — n x d^2
products map-side combined into exactly d^2 cells; the solve is
driver-side on that bounded frame. Integer-exactness envelope: cells
stay < 2^63 up to ~10^7 vectors at 1e-6 quantization; beyond that the
same plan runs at coarser quantization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_ITERS = 16
PCA_QUANT = 1_000_000  # 1e-6 component quantization


def ssdiv(w: int, d: int) -> int:
    """Sign-safe half-up integer division (identical to the oracle's
    CASE form; plain ``//`` would floor negatives where DuckDB
    truncates)."""
    return (w + d // 2) // d if w >= 0 else -((-w + d // 2) // d)


def pca_raw_moments(df: DataFrame, vec_col: str) -> dict[str, DataFrame]:
    """The additive moment frames for quantized PCA over ``df[vec_col]``:

    - ``cells``: (j, k, s) with s = sum over vectors of q_j * q_k
      (RAW, uncentered — a sum-monoid, streamable);
    - ``moments``: (j, c, n) with c = sum q_j and n = vector count
      (also sum-monoids).
    """
    vecs = df.filter(F.col(vec_col).isNotNull())
    qarr = F.transform(
        vec_col,
        lambda x: F.round(x.cast("double") * PCA_QUANT).cast("long"),
    )
    e1 = vecs.select(F.posexplode(qarr).alias("j", "qj"), qarr.alias("arr"))
    e2 = e1.select("j", "qj", F.posexplode("arr").alias("k", "qk"))
    cells = e2.groupBy("j", "k").agg(
        F.sum(F.col("qj") * F.col("qk")).alias("s")
    )
    moments = e1.groupBy("j").agg(
        F.sum("qj").alias("c"), F.count("*").cast("long").alias("n")
    )
    return {"cells": cells, "moments": moments}


def pca_solve_from_moments(
    raw_cells: dict[tuple[int, int], int],
    c: dict[int, int],
    n: int,
) -> list[tuple[int, int, float]]:
    """Center the raw moments (exact integer identity), then run the
    16-step quantized power iteration; returns (dim, loading_q, loading)
    rows matching the ``embedding_top_pc`` oracle bit-for-bit."""
    dims, _mat, _sdiv, v, sign, _s_cent = _pca_center_and_iterate(
        raw_cells, c, n
    )
    vs = {j: ssdiv(v[j] * sign, 64) for j in dims}
    norm = math.sqrt(float(sum(x * x for x in vs.values())))
    return [
        (int(j), v[j] * sign, vs[j] / norm if norm else 0.0) for j in dims
    ]


def _pca_center_and_iterate(
    raw_cells: dict[tuple[int, int], int],
    c: dict[int, int],
    n: int,
) -> tuple[list[int], dict[tuple[int, int], int], int, dict[int, int], int,
           dict[tuple[int, int], int]]:
    """Shared core: returns (dims, scaled matrix, its scale divisor,
    final iterate v, sign, centered cells)."""
    dims = sorted(c)
    m = {j: ssdiv(c[j], n) for j in dims}
    s_cent = {
        (j, k): raw - m[j] * c[k] - m[k] * c[j] + n * m[j] * m[k]
        for (j, k), raw in raw_cells.items()
    }
    maxabs = max(abs(s) for s in s_cent.values())
    sdiv = max(1, (maxabs + 99_999_999) // 100_000_000)
    mat = {jk: ssdiv(s, sdiv) for jk, s in s_cent.items()}
    v = {j: 1_000_000_000 for j in dims}
    for _ in range(PCA_ITERS):
        w = {j: 0 for j in dims}
        for (j, k), s in mat.items():
            w[j] += s * v.get(k, 0)
        maxw = max(abs(x) for x in w.values())
        d = max(1, (maxw + 999_999_999) // 1_000_000_000)
        v = {j: ssdiv(x, d) for j, x in w.items()}
    jmax = min(dims, key=lambda j: (-abs(v[j]), j))
    sign = -1 if v[jmax] < 0 else 1
    return dims, mat, sdiv, v, sign, s_cent


def pca_rayleigh_stats(
    raw_cells: dict[tuple[int, int], int],
    c: dict[int, int],
    n: int,
) -> tuple[int, int, int, int]:
    """(trace_q, rayleigh_num, rayleigh_den, sdiv) for the variance-share
    readout: trace of the centered second-moment matrix (exact BIGINT)
    and the Rayleigh quotient of the solved direction over the SCALED
    matrix, computed on 2^13-downscaled integer vectors so every product
    stays < 2^63 (ssdiv is odd-symmetric, so the quotient is invariant
    to the sign fix). lambda1 in original units ~= num/den * sdiv."""
    dims, mat, sdiv, v, sign, s_cent = _pca_center_and_iterate(
        raw_cells, c, n
    )
    vd = {j: ssdiv(v[j] * sign, 8192) for j in dims}
    wd = {}
    for j in dims:
        acc = 0
        for (i, k), s in mat.items():
            if i == j:
                acc += s * vd.get(k, 0)
        wd[j] = ssdiv(acc, 8192)
    num = sum(vd[j] * wd[j] for j in dims)
    den = sum(vd[j] * vd[j] for j in dims)
    trace = sum(s for (j, k), s in s_cent.items() if j == k)
    return trace, num, den, sdiv


_MOMENTS_MEMO: dict[str, tuple[dict, dict, int]] = {}


def pca_moments_cached(
    spark, sf_dir: str, table: str = "embeddings", vec_col: str = "embedding"
) -> tuple[dict[tuple[int, int], int], dict[int, int], int]:
    """Collected (cells, c, n) for the embeddings table, memoized per
    sf_dir for the process lifetime (the logreg fit-memo discipline —
    VERDICT r6 ask #4): the three PCA-family queries share one moment
    pass instead of re-running the d^2 aggregate each. Bit-identity is
    trivial: the memo stores the exact collected integers."""
    key = f"{sf_dir}::{table}::{vec_col}"
    if key not in _MOMENTS_MEMO:
        from ..sources.batch import load_table

        raw = pca_raw_moments(load_table(spark, sf_dir, table), vec_col)
        cm = raw["moments"].collect()
        cells = raw["cells"].collect()
        _MOMENTS_MEMO[key] = (
            {(r.j, r.k): r.s for r in cells},
            {r.j: r.c for r in cm},
            cm[0].n if cm else 0,
        )
    return _MOMENTS_MEMO[key]
