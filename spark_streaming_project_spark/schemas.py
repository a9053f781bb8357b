"""Declared schemas — no inference anywhere (reference parity: the consumer
declares a fixed ``StructType`` for the OpenFoodFacts envelope,
Consumer.scala:12-35, and every absent field becomes NULL).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# OpenFoodFacts-shaped product envelope (reference input model, SURVEY.md §1.1)
# One envelope = one ingested message = up to 100 products:
#   {"rows": [{"row": {...product...}}, ...]}
# ---------------------------------------------------------------------------

NUTRIMENT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

PRODUCT_NAME_ENTRY = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

PRODUCT = T.StructType(
    [
        T.StructField("nutriscore_grade", T.StringType()),
        T.StructField("categories_tags", T.ArrayType(T.StringType())),
        T.StructField("nutriments", T.ArrayType(NUTRIMENT)),
        T.StructField("product_name", T.ArrayType(PRODUCT_NAME_ENTRY)),
        T.StructField("packaging_tags", T.ArrayType(T.StringType())),
        T.StructField("brands_tags", T.ArrayType(T.StringType())),
        T.StructField("additives_tags", T.ArrayType(T.StringType())),
        T.StructField("nova_groups_tags", T.ArrayType(T.StringType())),
    ]
)

API_RESPONSE = T.StructType(
    [
        T.StructField(
            "rows",
            T.ArrayType(T.StructType([T.StructField("row", PRODUCT)])),
        )
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md) — declared so streaming
# file sources (which require a schema) and JSON readers never infer.
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENT_PROPS = T.StructType([T.StructField("k", T.LongType())])

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal asset table (engine extension; no driver parquet — synthesized in
# tests). Media payloads are opaque binary + typed metadata, the idiomatic
# Spark representation for image/audio/video at 100 TB (decode happens in
# Arrow-batched UDFs, never driver-side).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
