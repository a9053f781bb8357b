"""Live Kafka round-trip smoke (SURVEY.md §2.1 S2/S3) — gated on a real
broker because the sandbox has neither a Kafka cluster nor the
spark-sql-kafka connector jar.

Enable with::

    SPARK_GRAFT_KAFKA=1 \
    SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \
    python -m pytest tests/test_kafka_integration.py

The session must have ``spark-sql-kafka-0-10`` on its classpath (e.g.
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``)
and ``kafka-python`` installed for the producer side.

Round trip mirrors the reference end-to-end: ``feed_to_kafka`` publishes raw
JSON envelope pages (key=None, value=page — Producer.scala:25-43), the
``kafka_stream`` source subscribes with the reference's options
(startingOffsets=earliest, failOnDataLoss=false — Consumer.scala:50-56),
and a complete-mode aggregate over the parsed stream must equal the batch
answer over the same envelopes.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.aggregates import nutriscore_counts
from spark_streaming_project_spark.operators.parse import parse_envelopes
from spark_streaming_project_spark.sources.feeder import feed_to_kafka
from spark_streaming_project_spark.sources.fixtures import (
    make_envelopes,
    make_products,
)
from spark_streaming_project_spark.streaming import StreamRunner
from spark_streaming_project_spark.streaming.sources import kafka_stream

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_KAFKA") != "1",
    reason="live Kafka smoke: set SPARK_GRAFT_KAFKA=1 with a reachable broker",
)

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "localhost:9092")


def test_kafka_round_trip_complete_mode(spark, tmp_path):
    pytest.importorskip("kafka", reason="kafka-python needed for the producer side")

    topic = f"spark-graft-smoke-{uuid.uuid4().hex[:8]}"
    products = make_products(300, seed=7)
    pages = {}
    for i, env in enumerate(make_envelopes(products, page_size=100)):
        pages[i * 100] = env

    def fake_fetch(url: str) -> str:
        # feeder appends &offset=N&length=M; replay our envelopes by offset
        offset = int(url.split("offset=")[1].split("&")[0])
        return pages.get(offset, "")

    n = feed_to_kafka(
        "stub://api?x=1",
        bootstrap_servers=BOOTSTRAP,
        topic=topic,
        fetch=fake_fetch,
        page_size=100,
        max_offset=299,
    )
    assert n == len(pages)

    raw = kafka_stream(spark, BOOTSTRAP, topic)
    # Kafka value is binary — cast to the envelope string the parser expects
    # (Consumer.scala:59)
    stream = parse_envelopes(raw.select(F.col("value").cast("string").alias("value")))

    runner = StreamRunner(spark, str(tmp_path / "ckpt"))
    runner.add("kafka_nutri", nutriscore_counts(stream), output_mode="complete")
    runner.start_all(available_now=True)
    runner.await_all(timeout_sec=180)

    got = {
        r["nutriscore"]: r["product_count"]
        for r in spark.table("kafka_nutri").collect()
    }
    batch_df = spark.createDataFrame(products, stream.schema)
    want = {
        r["nutriscore"]: r["product_count"]
        for r in nutriscore_counts(batch_df).collect()
    }
    assert got == want
