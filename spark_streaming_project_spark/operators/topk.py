"""Top-k operators (SURVEY.md §2.6 T1-T3, A6).

``top_k`` relies on Spark planning ``orderBy(...).limit(k)`` as
``TakeOrderedAndProject`` — each partition keeps only its local top-k and the
driver merges k·num_partitions rows, so a global sort never materializes.
That is the correct 100 TB shape for small k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import clean_tag


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k: ``orderBy(order).limit(k)`` (plans TakeOrderedAndProject).

    Callers must pass a *total* order (include a unique tiebreaker) if the
    result needs to be deterministic.
    """
    return df.orderBy(*order).limit(k)


def additive_counts(df: DataFrame) -> DataFrame:
    """A6 prefix (Consumer.scala:71-84): explode_outer the additives array,
    keep named products with a non-empty additive, count per product.

    The reference uses ``first(additive)`` for ``most_common_additive`` —
    order-dependent and not a mode. We pin determinism with ``min(additive)``
    (documented deviation; FIXTURES.md §2 endorses the pin) and additionally
    expose ``F.mode`` upstream for a true mode.
    """
    from .parse import main_product_name

    flat = (
        main_product_name(df)
        .select("main_name", F.explode_outer("additives_tags").alias("additive_raw"))
        .filter(
            F.col("main_name").isNotNull()
            & F.col("additive_raw").isNotNull()
            & (F.col("additive_raw") != "")
        )
        .select(
            F.col("main_name").alias("product_name"),
            clean_tag(F.col("additive_raw")).alias("additive"),
        )
    )
    return flat.groupBy("product_name").agg(
        F.count("*").alias("additive_count"),
        F.min("additive").alias("most_common_additive"),
    )


def top_additive_products(df: DataFrame, k: int = 10) -> DataFrame:
    """A6+T1 (Consumer.scala:147-158): top-k products by additive count.

    Deterministic total order: count desc, then product_name asc.
    """
    return top_k(
        additive_counts(df),
        [F.desc("additive_count"), F.asc("product_name")],
        k,
    )


def top_n_with_other(
    df: DataFrame,
    key_col: str,
    count_col: str,
    n: int,
    other_label: str = "Autres",
) -> DataFrame:
    """T2 (streamlit/app.py:152-160): top-N keys by count plus a residual
    bucket summing everything else — the dashboard's donut-chart prep, done
    engine-side.

    Scale shape: the winners come from ``orderBy(...).limit(n)``, which Spark
    plans as ``TakeOrderedAndProject`` — each partition keeps only its local
    top-n and the driver merges n·num_partitions rows; no global sort, no
    single-partition window.  The residual is a broadcast anti-join against
    those n keys followed by a full aggregate to one row, so a
    high-cardinality key column never funnels through one task.  Ties break
    deterministically on (count desc, key asc NULLS LAST): on a count tie a
    real key always beats a NULL key, matching DuckDB's ASC default (Spark's
    bare ``asc`` is NULLS FIRST, which would invert that — VERDICT r5 #1).

    Totals are preserved for ANY input: rows are first combined to one row
    per key (map-side-combinable; a no-op pass-through when the input is
    already aggregated), the anti-join is NULL-safe (a NULL key can win a
    top-n slot without its count also leaking into the residual), and a
    final merge of the tiny (≤ n+1 row) union folds a winner key equal to
    ``other_label`` into one row.  Pre-aggregation also makes the plan
    deterministic, so the two evaluations of the top-n subtree (anti-join +
    union) cannot disagree.
    """
    agg = df.groupBy(key_col).agg(F.sum(count_col).alias(count_col))
    top = agg.orderBy(F.desc(count_col), F.asc_nulls_last(key_col)).limit(n)
    residual = (
        agg.alias("_rest")
        .join(
            F.broadcast(top.select(F.col(key_col).alias("_top_key"))),
            on=F.col(f"_rest.{key_col}").eqNullSafe(F.col("_top_key")),
            how="left_anti",
        )
        .agg(F.sum(count_col).alias(count_col))
        .select(F.lit(other_label).alias(key_col), F.col(count_col))
        # sum over an empty remainder is NULL -> emit no residual row at all,
        # matching the old conditional-bucket semantics.
        .where(F.col(count_col).isNotNull())
    )
    return (
        top.select(key_col, count_col)
        .unionByName(residual)
        .groupBy(key_col)
        .agg(F.sum(count_col).alias(count_col))
    )
