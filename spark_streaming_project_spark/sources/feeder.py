"""Ingestion feeder (reference S1/S2 parity: Producer.scala).

The reference's producer loops over a paginated HTTP API (offset 0..max step
page_size), publishing each raw JSON page as one Kafka message with fixed
sleeps for pacing (Producer.scala:19-21,37-58). The engine version is a
driver-side feeder script (ingestion is not a distributed concern at this
rate — the reference itself caps at ~25 products/s) with:

  - injectable ``fetch`` (tests pass a stub; production passes an HTTP GET)
  - file-sink mode (envelope-per-line JSON files a Structured Streaming file
    source tails) and optional Kafka mode via ``kafka-python`` when present
  - the reference's knobs: page_size, max_offset, sleep_sec, timeout
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

DEFAULT_PAGE_SIZE = 100  # Producer.scala:19 batchLength
DEFAULT_MAX_OFFSET = 3_808_300  # Producer.scala:20 maxOffset


def http_fetch(url: str, timeout_sec: float = 2.0) -> str:
    """Synchronous GET returning the raw body, '' on any error (the
    reference swallows fetch errors the same way, Producer.scala:68-82)."""
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout_sec) as resp:
            return resp.read().decode("utf-8")
    except Exception:
        return ""


def feed_pages(
    base_url: str,
    out_dir: str,
    fetch: Callable[[str], str] = http_fetch,
    page_size: int = DEFAULT_PAGE_SIZE,
    max_offset: int = DEFAULT_MAX_OFFSET,
    sleep_sec: float = 0.0,
    stop_on_empty: bool = True,
) -> int:
    """Page through ``base_url`` writing one JSON-lines file per page into
    ``out_dir`` (atomic rename so a tailing stream never sees partial
    files). Returns the number of pages written.

    The reference publishes each page verbatim (one Kafka message per page);
    here one file per page preserves micro-batch attribution for the file
    source (maxFilesPerTrigger=1 == one page per batch).
    """
    os.makedirs(out_dir, exist_ok=True)
    pages = 0
    for offset in range(0, max_offset + 1, page_size):
        body = fetch(f"{base_url}&offset={offset}&length={page_size}")
        if not body:
            if stop_on_empty:
                break
            continue
        tmp = os.path.join(out_dir, f".page-{offset}.json.tmp")
        final = os.path.join(out_dir, f"page-{offset}.json")
        with open(tmp, "w") as f:
            f.write(json.dumps({"value": body}) + "\n")
        os.rename(tmp, final)
        pages += 1
        if sleep_sec:
            time.sleep(sleep_sec)
    return pages


def feed_to_kafka(
    base_url: str,
    bootstrap_servers: str,
    topic: str,
    fetch: Callable[[str], str] = http_fetch,
    page_size: int = DEFAULT_PAGE_SIZE,
    max_offset: int = DEFAULT_MAX_OFFSET,
    sleep_sec: float = 0.0,
    max_request_size: int = 2_000_000,
) -> int:
    """Kafka publishing mode (reference S2: key=None, raw page as value,
    max.request.size=2000000 — Producer.scala:25-34,43). Requires
    ``kafka-python``; raises ImportError with guidance otherwise."""
    try:
        from kafka import KafkaProducer  # type: ignore
    except ImportError as e:  # pragma: no cover - kafka absent in test env
        raise ImportError(
            "kafka-python not installed; use feed_pages (file mode) or add "
            "the dependency in a Kafka-enabled deployment"
        ) from e

    producer = KafkaProducer(
        bootstrap_servers=bootstrap_servers,
        max_request_size=max_request_size,
        value_serializer=lambda v: v.encode("utf-8"),
    )
    pages = 0
    try:
        for offset in range(0, max_offset + 1, page_size):
            body = fetch(f"{base_url}&offset={offset}&length={page_size}")
            if not body:
                break
            producer.send(topic, body)
            pages += 1
            if sleep_sec:
                time.sleep(sleep_sec)
        producer.flush()
    finally:
        producer.close()
    return pages
