"""Reference-parity queries (SURVEY.md §2.5 A1-A7, §2.6 T1-T2, §2.7 W1)
expressed over the driver's synthetic tables.

The reference's operators are food-domain transforms (nutriscore grades,
category tags); the driver's testdata is a TPC-H-ish star schema, so each
query here maps the *operator shape* — normalization via when/isin,
prefix-strip regexes, first-element tag extraction, hash groupBy-count,
deterministic top-k, window argmax — onto the synthetic columns. The same
operator functions run over OpenFoodFacts-shaped fixtures in
tests/test_reference_ops.py to pin the food-domain semantics themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import nutriscore_counts as _nutriscore_counts
from ..operators.topk import top_k, top_n_with_other
from ..operators.windows import top_per_group
from ..sources.batch import load_table
from .registry import register

# ---------------------------------------------------------------------------
# A1 — grade-normalized distribution (Consumer.scala:187-199):
# lower() ∈ {a..e} -> upper(), else UNKNOWN; null-guard; groupBy count.
# l_returnflag ∈ {A,N,R} stands in for nutriscore_grade.
# ---------------------------------------------------------------------------


@register(
    "nutriscore_counts",
    oracle="""
    SELECT CASE WHEN lower(l_returnflag) IN ('a','b','c','d','e')
                THEN upper(l_returnflag) ELSE 'UNKNOWN' END AS nutriscore,
           count(*) AS product_count
    FROM lineitem
    WHERE l_returnflag IS NOT NULL
    GROUP BY 1
    """,
    tags=("reference", "A1"),
)
def nutriscore_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_returnflag", "nutriscore_grade"
    )
    return _nutriscore_counts(li)


# ---------------------------------------------------------------------------
# A2 — main-category counts (Consumer.scala:201-215): first tag, sentinel
# blacklist, prefix strip, groupBy count. First word of p_name is the "tag".
# ---------------------------------------------------------------------------


@register(
    "category_counts",
    oracle="""
    SELECT split_part(p_name, ' ', 1) AS main_category,
           count(*) AS category_count
    FROM part
    WHERE split_part(p_name, ' ', 1) IS NOT NULL
      AND split_part(p_name, ' ', 1) NOT IN
          ('en:undefined','en:null','undefined','null','')
    GROUP BY 1
    """,
    tags=("reference", "A2"),
)
def category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleaning import SENTINEL_TAGS

    part = load_table(spark, sf_dir, "part")
    tag = F.element_at(F.split("p_name", " "), 1)
    return (
        part.select(tag.alias("main_category"))
        .filter(
            F.col("main_category").isNotNull()
            & ~F.col("main_category").isin(*SENTINEL_TAGS)
        )
        .groupBy("main_category")
        .agg(F.count("*").alias("category_count"))
    )


# ---------------------------------------------------------------------------
# A3 — brand counts with prefix strip (Consumer.scala:239-250):
# regexp_replace('^Brand#') plays the role of the '^[a-z]{2,3}:' lang strip.
# ---------------------------------------------------------------------------


@register(
    "brand_counts",
    oracle="""
    SELECT regexp_replace(p_brand, '^Brand#', '') AS brand,
           count(*) AS product_count
    FROM part
    WHERE p_brand IS NOT NULL
    GROUP BY 1
    """,
    tags=("reference", "A3"),
)
def brand_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_brand").isNotNull())
        .select(F.regexp_replace("p_brand", r"^Brand#", "").alias("brand"))
        .groupBy("brand")
        .agg(F.count("*").alias("product_count"))
    )


# ---------------------------------------------------------------------------
# A4 — packaging distribution (Consumer.scala:252-262): numeric-prefix strip
# on o_orderpriority ('1-URGENT' -> 'URGENT'), groupBy count.
# ---------------------------------------------------------------------------


@register(
    "packaging_distribution",
    oracle="""
    SELECT regexp_replace(o_orderpriority, '^[0-9]-', '') AS packaging,
           count(*) AS packaging_count
    FROM orders
    WHERE o_orderpriority IS NOT NULL
    GROUP BY 1
    """,
    tags=("reference", "A4"),
)
def packaging_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").isNotNull())
        .select(
            F.regexp_replace("o_orderpriority", r"^[0-9]-", "").alias("packaging")
        )
        .groupBy("packaging")
        .agg(F.count("*").alias("packaging_count"))
    )


# ---------------------------------------------------------------------------
# A5 — NOVA-style digit extraction + labeling (Consumer.scala:264-280):
# regexp_extract('(\d)') -> cast int -> when/otherwise label -> two-key group.
# ---------------------------------------------------------------------------

PRIORITY_LABELS = {
    1: "Urgent",
    2: "High",
    3: "Medium",
    4: "Not specified",
    5: "Low",
}


@register(
    "nova_group_classification",
    oracle="""
    SELECT CAST(regexp_extract(o_orderpriority, '([0-9])', 1) AS INTEGER) AS nova_group,
           CASE CAST(regexp_extract(o_orderpriority, '([0-9])', 1) AS INTEGER)
                WHEN 1 THEN 'Urgent' WHEN 2 THEN 'High' WHEN 3 THEN 'Medium'
                WHEN 4 THEN 'Not specified' WHEN 5 THEN 'Low'
                ELSE 'Unknown' END AS nova_label,
           count(*) AS product_count
    FROM orders
    WHERE o_orderpriority IS NOT NULL
      AND length(o_orderpriority) > 0
      AND regexp_extract(o_orderpriority, '([0-9])', 1) <> ''
    GROUP BY 1, 2
    """,
    tags=("reference", "A5"),
)
def nova_group_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digit = F.regexp_extract("o_orderpriority", r"(\d)", 1)
    grp = F.col("nova_digit").cast("int")
    label = F.lit("Unknown")
    for g, text in sorted(PRIORITY_LABELS.items(), reverse=True):
        label = F.when(grp == g, F.lit(text)).otherwise(label)
    return (
        orders.filter(
            F.col("o_orderpriority").isNotNull()
            & (F.length("o_orderpriority") > 0)
        )
        .select(digit.alias("nova_digit"))
        .filter(F.col("nova_digit") != "")
        .select(grp.alias("nova_group"), label.alias("nova_label"))
        .groupBy("nova_group", "nova_label")
        .agg(F.count("*").alias("product_count"))
    )


# ---------------------------------------------------------------------------
# A6+T1 — explode + per-entity count + deterministic top-k
# (Consumer.scala:147-158): documents.text tokens play the additives array.
# ---------------------------------------------------------------------------


@register(
    "top_token_docs",
    oracle="""
    SELECT doc_id,
           count(*) AS token_count,
           min(token) AS first_token
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
        WHERE text IS NOT NULL
    )
    WHERE token <> ''
    GROUP BY doc_id
    ORDER BY token_count DESC, doc_id ASC
    LIMIT 10
    """,
    tags=("reference", "A6", "T1"),
)
def top_token_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flat = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    counted = flat.groupBy("doc_id").agg(
        F.count("*").alias("token_count"),
        F.min("token").alias("first_token"),
    )
    return top_k(counted, [F.desc("token_count"), F.asc("doc_id")], 10)


# ---------------------------------------------------------------------------
# W1 — top-1 per group window argmax (Consumer.scala:106-124, disabled
# query3): sugariest product per category -> priciest lineitem per p_type.
# ---------------------------------------------------------------------------


@register(
    "top_sugary_products_by_category",
    oracle="""
    SELECT main_category, product_name, sugar
    FROM (
        SELECT p.p_type AS main_category, p.p_name AS product_name,
               l.l_extendedprice AS sugar,
               row_number() OVER (
                   PARTITION BY p.p_type
                   ORDER BY l.l_extendedprice DESC, p.p_name ASC,
                            l.l_orderkey ASC, l.l_linenumber ASC
               ) AS rnk
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    WHERE rnk = 1
    """,
    tags=("reference", "W1"),
)
def top_sugary_products_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey, "inner"
    ).select(
        F.col("p_type").alias("main_category"),
        F.col("p_name").alias("product_name"),
        F.col("l_extendedprice").alias("sugar"),
        "l_orderkey",
        "l_linenumber",
    )
    return top_per_group(
        joined,
        ["main_category"],
        [
            F.desc("sugar"),
            F.asc("product_name"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        ],
        k=1,
        rank_col="rnk",
    ).select("main_category", "product_name", "sugar")


# ---------------------------------------------------------------------------
# T2 — top-N + residual 'Autres' bucket (streamlit/app.py:152-160).
# ---------------------------------------------------------------------------


@register(
    "top_categories_with_other",
    oracle="""
    WITH counts AS (
        SELECT split_part(p_name, ' ', 1) AS main_category,
               count(*) AS category_count
        FROM part GROUP BY 1
    ), ranked AS (
        SELECT *, row_number() OVER (
            ORDER BY category_count DESC, main_category ASC) AS rnk
        FROM counts
    )
    SELECT CASE WHEN rnk <= 3 THEN main_category ELSE 'Autres' END AS main_category,
           CAST(sum(category_count) AS BIGINT) AS category_count
    FROM ranked
    GROUP BY 1
    """,
    tags=("reference", "T2"),
)
def top_categories_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = category_counts(spark, sf_dir)
    return top_n_with_other(counts, "main_category", "category_count", 3)


@register(
    "top_categories_donut",
    oracle="""
    WITH counts AS (
        SELECT split_part(p_name, ' ', 1) AS main_category,
               count(*) AS category_count
        FROM part GROUP BY 1
    ), ranked AS (
        SELECT *, row_number() OVER (
            ORDER BY category_count DESC, main_category ASC) AS rnk
        FROM counts
    )
    SELECT CASE WHEN rnk <= 8 THEN main_category ELSE 'Autres' END AS main_category,
           CAST(sum(category_count) AS BIGINT) AS category_count
    FROM ranked
    GROUP BY 1
    """,
    tags=("reference", "T2"),
)
def top_categories_donut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard's actual donut prep (streamlit/app.py:153-160:
    ``top_n = 8``, 'Autres' row only when a remainder exists — which
    ``top_n_with_other`` reproduces by emitting no residual row when the
    remainder is empty). The n=3 twin above keeps the residual branch
    exercised on the small fixture corpus."""
    counts = category_counts(spark, sf_dir)
    return top_n_with_other(counts, "main_category", "category_count", 8)


# ---------------------------------------------------------------------------
# A7 — weighted average (streamlit/app.py:214-216): Σ(group·count)/Σ(count).
# ---------------------------------------------------------------------------


@register(
    "weighted_nova_average",
    oracle="""
    WITH nova AS (
        SELECT CAST(regexp_extract(o_orderpriority, '([0-9])', 1) AS INTEGER) AS nova_group,
               count(*) AS product_count
        FROM orders
        WHERE o_orderpriority IS NOT NULL
        GROUP BY 1
    )
    SELECT CAST(sum(nova_group * product_count) AS DOUBLE)
           / CAST(sum(product_count) AS DOUBLE) AS weighted_nova
    FROM nova
    """,
    tags=("reference", "A7"),
)
def weighted_nova_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import weighted_average

    orders = load_table(spark, sf_dir, "orders")
    nova = (
        orders.filter(F.col("o_orderpriority").isNotNull())
        .select(
            F.regexp_extract("o_orderpriority", r"(\d)", 1)
            .cast("int")
            .alias("nova_group")
        )
        .groupBy("nova_group")
        .agg(F.count("*").alias("product_count"))
    )
    return weighted_average(nova, "nova_group", "product_count", "weighted_nova")


# ---------------------------------------------------------------------------
# Dashboard read-side top-10 panels (streamlit/app.py:166-178: brand bar
# chart `head(10)`, packaging pie `head(10)`): registered engine-side so the
# dashboard's exact result sets are part of the gated surface, planned as
# TakeOrderedAndProject on top of the A3/A4 aggregates.
# ---------------------------------------------------------------------------


@register(
    "top_brands",
    oracle="""
    SELECT regexp_replace(p_brand, '^Brand#', '') AS brand,
           count(*) AS product_count
    FROM part
    WHERE p_brand IS NOT NULL
    GROUP BY 1
    ORDER BY product_count DESC, brand ASC
    LIMIT 10
    """,
    tags=("reference", "T1", "dashboard"),
)
def top_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streamlit/app.py:166-169: top-10 brands bar chart (ties pinned by
    brand asc for a total order)."""
    return brand_counts(spark, sf_dir).orderBy(
        F.desc("product_count"), F.asc("brand")
    ).limit(10)


@register(
    "top_packaging",
    oracle="""
    SELECT regexp_replace(o_orderpriority, '^[0-9]-', '') AS packaging,
           count(*) AS packaging_count
    FROM orders
    WHERE o_orderpriority IS NOT NULL
    GROUP BY 1
    ORDER BY packaging_count DESC, packaging ASC
    LIMIT 10
    """,
    tags=("reference", "T1", "dashboard"),
)
def top_packaging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streamlit/app.py:172-178: top-10 packaging pie (same total order)."""
    return packaging_distribution(spark, sf_dir).orderBy(
        F.desc("packaging_count"), F.asc("packaging")
    ).limit(10)
