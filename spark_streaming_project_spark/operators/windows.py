"""Window-function operators (SURVEY.md §2.7 W1 + the analytic surface the
reference leaves implicit but the engine exposes)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order: list[Column],
    k: int = 1,
    rank_col: str = "rank",
) -> DataFrame:
    """W1 (Consumer.scala:106-124, the disabled ``query3``): top-k rows per
    group via ``row_number`` over a partitioned window, filter rank<=k, drop
    the rank.

    Pass a total ``order`` (include a tiebreaker) for deterministic output.
    At scale this is one shuffle on ``partition_cols``; skewed groups are
    split by AQE skew handling since each group's sort is bounded by the
    partition.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(rank_col)
    )
