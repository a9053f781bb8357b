"""Deterministic OpenFoodFacts-shaped fixture generator (FIXTURES.md §1).

Produces product dicts, envelope JSON strings (one envelope = one ingested
message of <=100 products, mirroring the reference's Kafka page format), and
Spark DataFrames in either shape. Seeded — same fixture every run — and built
to exercise every edge the reference's transforms care about: mixed-case and
sentinel grades, lang-prefixed tags, missing ``main``-language names, empty
vs NULL arrays, nutriments with absent entries.
"""

from __future__ import annotations

import json
import random

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PRODUCT

GRADES = ["a", "B", "c", "D", "e", "unknown", "not-applicable", "", None]
CATEGORIES = [
    "en:snacks",
    "en:beverages",
    "fr:boissons",
    "en:dairy",
    "en:snacks",  # skew
    "en:undefined",
    "null",
    "",
    None,
]
BRANDS = ["en:acme", "en:acme", "en:acme", "en:globex", "fr:duff", None]
PACKAGING = ["en:plastic", "en:glass-jar", "en:cardboard", None]
ADDITIVES = ["en:e330", "en:e322", "en:e471", "en:e102", "en:e950"]
NOVA = [
    "en:1-unprocessed-or-minimally-processed-foods",
    "en:2-processed-culinary-ingredients",
    "en:3-processed-foods",
    "en:4-ultra-processed-food-and-drink-products",
    "en:not-applicable",
    None,
]
LANGS = ["en", "fr", "de"]
WORDS = ["choco", "bar", "juice", "bio", "crunchy", "lite", "max", "zero"]


def make_products(n: int = 1000, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    out = []
    for i in range(n):
        name_entries = []
        if rng.random() > 0.1:  # 10% of products lack a 'main' name entry
            name_entries.append(
                {"lang": "main", "text": f"{rng.choice(WORDS)}-{i}"}
            )
        for lang in rng.sample(LANGS, rng.randint(0, 2)):
            name_entries.append({"lang": lang, "text": f"{rng.choice(WORDS)}-{lang}"})

        nutriments = []
        if rng.random() > 0.15:
            nutriments.append({"name": "sugars", "value": round(rng.uniform(0, 80), 2)})
        nutriments.append(
            {"name": "energy_100g", "value": round(rng.uniform(0, 2000), 1)}
        )
        if rng.random() > 0.5:
            nutriments.append({"name": "salt", "value": round(rng.uniform(0, 5), 3)})

        n_additives = rng.choice([0, 0, 1, 2, 3, 5])
        additives = rng.sample(ADDITIVES, min(n_additives, len(ADDITIVES)))

        out.append(
            {
                "nutriscore_grade": rng.choice(GRADES),
                "categories_tags": rng.choice(
                    [None, [], [rng.choice(CATEGORIES) or "", "en:extra"]]
                )
                if rng.random() < 0.2
                else [c for c in [rng.choice(CATEGORIES)] if c is not None],
                "nutriments": nutriments,
                "product_name": name_entries,
                "packaging_tags": [p for p in [rng.choice(PACKAGING)] if p],
                "brands_tags": [b for b in [rng.choice(BRANDS)] if b],
                "additives_tags": additives if rng.random() > 0.1 else None,
                "nova_groups_tags": [t for t in [rng.choice(NOVA)] if t],
            }
        )
    return out


def make_envelopes(products: list[dict], page_size: int = 100) -> list[str]:
    """Page products into reference-format envelope JSON strings."""
    return [
        json.dumps({"rows": [{"row": p} for p in products[i : i + page_size]]})
        for i in range(0, len(products), page_size)
    ]


def products_df(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    """Flat products DataFrame (post-parse shape) with the declared schema."""
    return spark.createDataFrame(make_products(n, seed), PRODUCT)


def envelopes_df(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    """Kafka-shaped frame: one row per envelope, column ``value`` (string)."""
    env = make_envelopes(make_products(n, seed))
    return spark.createDataFrame([(e,) for e in env], "value string")
