"""Feeder (S1/S2 parity) tests: paging, stop-on-empty, and the file-sink ->
streaming-source handoff."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from spark_streaming_project_spark.operators.parse import parse_envelopes
from spark_streaming_project_spark.sources.feeder import feed_pages
from spark_streaming_project_spark.sources.fixtures import make_envelopes, make_products
from spark_streaming_project_spark.streaming import StreamRunner, stream_json_dir

VALUE_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def _stub_fetch_factory(pages: list[str]):
    def fetch(url: str) -> str:
        offset = int(url.split("offset=")[1].split("&")[0])
        idx = offset // 100
        return pages[idx] if idx < len(pages) else ""

    return fetch


def test_feed_pages_stops_on_empty(tmp_path):
    envelopes = make_envelopes(make_products(250, seed=3), page_size=100)  # 3 pages
    n = feed_pages(
        "http://x?q=1",
        str(tmp_path / "pages"),
        fetch=_stub_fetch_factory(envelopes),
        max_offset=10_000,
    )
    assert n == 3  # stopped at first empty page, not max_offset


def test_feeder_files_drive_streaming_parse(spark, tmp_path):
    """Feeder output is directly consumable by the engine's streaming parse
    path — the file-mode equivalent of the reference's Kafka handoff."""
    products = make_products(250, seed=3)
    envelopes = make_envelopes(products, page_size=100)
    out = str(tmp_path / "pages")
    feed_pages("http://x?q=1", out, fetch=_stub_fetch_factory(envelopes))

    stream = parse_envelopes(stream_json_dir(spark, out, VALUE_SCHEMA))
    runner = StreamRunner(spark, str(tmp_path / "ckpt"))
    runner.add("fed_products", stream, output_mode="append")
    runner.start_all(available_now=True)
    runner.await_all(timeout_sec=120)

    assert spark.table("fed_products").count() == len(products)
