"""Envelope parsing: raw JSON message -> flat product rows.

Reference semantics (Consumer.scala:58-61): binary value -> string ->
``from_json`` against the declared envelope schema -> ``explode(rows)`` ->
``select("row.row.*")``. Malformed JSON and absent fields become NULL
(permissive mode); rows with NULL/empty ``rows`` arrays are dropped by the
inner explode.

Works identically on batch and streaming DataFrames (Structured Streaming's
unified API) — the streaming runner reuses these verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import API_RESPONSE


def parse_envelopes(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-shaped input (``value`` binary/string) -> one row per product.

    Output columns are exactly the 8 declared product fields. The explode is
    *inner* (envelope with no rows vanishes), matching the reference.
    """
    parsed: Column = F.from_json(F.col(value_col).cast("string"), API_RESPONSE)
    return (
        df.select(parsed.alias("data"))
        .select(F.explode("data.rows").alias("row"))
        .select("row.row.*")
    )


def products_from_envelope_strings(spark, envelopes: list[str]) -> DataFrame:
    """Test helper: build a batch products frame from raw envelope JSON strings."""
    df = spark.createDataFrame([(e,) for e in envelopes], "value string")
    return parse_envelopes(df)


def main_product_name(df: DataFrame) -> DataFrame:
    """Add ``main_name``: the text of the ``lang == 'main'`` entry of the
    ``product_name`` array (Consumer.scala:75-77 uses explode + filter; we use
    ``F.filter`` on the array — same result, no row multiplication, and no
    shuffle at scale)."""
    entry = F.filter(F.col("product_name"), lambda e: e["lang"] == F.lit("main"))
    return df.withColumn("main_name", F.get(entry, 0)["text"])


def nutriment_value(df: DataFrame, name: str, out_col: str) -> DataFrame:
    """Add ``out_col``: the value of nutriment ``name`` from the name/value
    struct array (reference does explode+filter, Consumer.scala:225-229; array
    ``F.filter`` keeps it row-local)."""
    entry = F.filter(F.col("nutriments"), lambda n: n["name"] == F.lit(name))
    return df.withColumn(out_col, F.get(entry, 0)["value"].cast("double"))
