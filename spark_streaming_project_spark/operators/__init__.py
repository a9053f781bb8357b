from .parse import parse_envelopes, products_from_envelope_strings
from .aggregates import (
    brand_counts,
    category_counts,
    nova_group_classification,
    nutriscore_counts,
    packaging_distribution,
    weighted_average,
)
from .topk import top_additive_products, top_k, top_n_with_other
from .windows import top_per_group

__all__ = [
    "parse_envelopes",
    "products_from_envelope_strings",
    "nutriscore_counts",
    "category_counts",
    "brand_counts",
    "packaging_distribution",
    "nova_group_classification",
    "weighted_average",
    "top_k",
    "top_additive_products",
    "top_n_with_other",
    "top_per_group",
]
