from .cleaning import (
    SENTINEL_TAGS,
    clean_tag,
    first_tag,
    is_valid_tag,
    normalize_grade,
    strip_lang_prefix,
)

__all__ = [
    "SENTINEL_TAGS",
    "clean_tag",
    "first_tag",
    "is_valid_tag",
    "normalize_grade",
    "strip_lang_prefix",
]
