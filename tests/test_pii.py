"""PII scan/redact operator tests on planted fixtures (the registry
queries cover the oracle leg; these pin per-pattern behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.pii import (
    PII_PATTERNS,
    pii_redact,
    pii_scan,
)


def _docs(spark):
    rows = [
        (0, "reach me at jo.doe+x@mail.example.org thanks"),
        (1, "call 555-123-4567 or 555-000-1111 today"),
        (2, "server at 192.168.0.1 timed out"),
        (3, "a@b.io and 10.0.0.2 and 555-999-0000"),
        (4, "perfectly clean text with numbers 12345"),
        (5, None),
        (6, "pip 1.2.3.4 is a version string"),  # documented IPv4 trade
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_scan_counts(spark):
    out = {
        r["doc_id"]: r
        for r in pii_scan(_docs(spark), "text").collect()
    }
    assert (out[0]["pii_email_n"], out[0]["pii_total_n"]) == (1, 1)
    assert (out[1]["pii_phone_n"], out[1]["pii_total_n"]) == (2, 2)
    assert (out[2]["pii_ipv4_n"], out[2]["pii_total_n"]) == (1, 1)
    assert (
        out[3]["pii_email_n"],
        out[3]["pii_ipv4_n"],
        out[3]["pii_phone_n"],
        out[3]["pii_total_n"],
    ) == (1, 1, 1, 3)
    assert out[4]["pii_total_n"] == 0
    assert out[5]["pii_total_n"] == 0  # NULL text scans as zero, not NULL
    assert out[6]["pii_ipv4_n"] == 1  # version strings match: known trade


def test_pii_redact_replaces_and_is_idempotent(spark):
    once = pii_redact(_docs(spark), "text", out_col="r1")
    twice = pii_redact(once, "r1", out_col="r2")
    rows = {r["doc_id"]: r for r in twice.collect()}
    assert rows[0]["r1"] == "reach me at <EMAIL> thanks"
    assert rows[1]["r1"] == "call <PHONE> or <PHONE> today"
    assert rows[3]["r1"] == "<EMAIL> and <IPV4> and <PHONE>"
    assert rows[4]["r1"] == rows[4]["text"]  # clean text untouched
    assert rows[5]["r1"] is None  # NULL stays NULL
    for r in rows.values():  # second pass is a no-op
        assert r["r2"] == r["r1"]


def test_pii_redacted_text_has_zero_residual_matches(spark):
    red = pii_redact(_docs(spark), "text", out_col="red")
    residual = red.select(
        sum(
            [
                F.regexp_count(F.col("red"), F.lit(p))
                for p in PII_PATTERNS.values()
            ],
            F.lit(0),
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0]["total"]
    assert residual == 0


def test_pii_custom_pattern_dict(spark):
    pats = {"ssn": r"\b\d{3}-\d{2}-\d{4}\b"}
    df = spark.createDataFrame(
        [(0, "ssn 123-45-6789 here"), (1, "no ssn")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in pii_scan(df, "text", pats).collect()}
    assert out[0]["pii_ssn_n"] == 1 and out[0]["pii_total_n"] == 1
    assert out[1]["pii_total_n"] == 0
    red = {
        r["doc_id"]: r["text"]
        for r in pii_redact(df, "text", patterns=pats).collect()
    }
    assert red[0] == "ssn <SSN> here"
