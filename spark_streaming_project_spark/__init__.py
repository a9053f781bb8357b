"""spark_streaming_project_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference food-analytics streaming pipeline (WassimTorjmen/Spark-Streaming-Project):
schema-declared JSON parsing, tag cleaning, streaming groupBy-count aggregations,
per-batch top-k, window argmax — re-expressed Spark-first (DataFrame / SQL /
Catalyst / Structured Streaming), plus the LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing) required for
100 TB-scale training-data work.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC)
    schemas.py    declared StructTypes (product envelope, testdata tables)
    sources/      batch + streaming readers (parquet, json, kafka-gated, rate)
    functions/    scalar column helpers (cleaning, text, vectors)
    operators/    DataFrame -> DataFrame transforms (parse, aggregate, topk,
                  windows, dedup, similarity, textstats, multimodal)
    plans/        the query registry: named queries + DuckDB oracle SQL twins
    streaming/    query runner, sinks, multi-query management
"""

__version__ = "0.1.0"
