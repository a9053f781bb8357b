"""Streaming sources (SURVEY.md §2.1 S1-S3).

Kafka is the reference's production source (Consumer.scala:50-56); file and
rate sources are the replayable test paths (batch/stream unification means
every operator in this engine runs identically on either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source with the reference's options (Consumer.scala:50-56:
    ``startingOffsets=earliest``, ``failOnDataLoss=false``) plus
    ``maxOffsetsPerTrigger`` for backpressure (the reference paces with
    producer-side sleeps instead — Producer.scala:51,57).

    Requires the spark-sql-kafka package on the classpath; raises a clear
    error otherwise (the test environment has no broker).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()
