"""Tag/grade cleaning column functions (reference scalar surface, SURVEY.md §2.3/§2.4).

These are pure Column -> Column builders over Spark built-ins — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. Semantics mirror the
reference transforms:

  - strip_lang_prefix: regexp_replace '^[a-z]{2,3}:' (Consumer.scala:81,207,245,257,275)
  - sentinel blacklist {en:undefined, en:null, undefined, null, ""} (Consumer.scala:211)
  - nutriscore normalization: lower ∈ {a..e} -> upper, else UNKNOWN (Consumer.scala:191-193)
  - first_tag: tags.getItem(0), NULL-safe (Consumer.scala:207,245,257,269)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LANG_PREFIX_RE = r"^[a-z]{2,3}:"

#: Sentinel values the reference blacklists before counting categories.
SENTINEL_TAGS = ("en:undefined", "en:null", "undefined", "null", "")

#: Valid nutriscore letters.
GRADES = ("a", "b", "c", "d", "e")


def strip_lang_prefix(col: Column | str) -> Column:
    """Drop a leading ISO-639 language prefix (``en:``, ``fra:``) from a tag."""
    return F.regexp_replace(col, LANG_PREFIX_RE, "")


def is_valid_tag(col: Column | str) -> Column:
    """NULL-safe predicate: tag present and not a known sentinel."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~c.isin(*SENTINEL_TAGS)


def clean_tag(col: Column | str) -> Column:
    """strip prefix + trim; returns the cleaned tag column."""
    return F.trim(strip_lang_prefix(col))


def first_tag(col: Column | str) -> Column:
    """First element of a tag array; NULL for NULL/empty arrays.

    The reference (Spark 3.5) uses ``getItem(0)``, which is NULL-safe there;
    under Spark 4's ANSI mode that raises INVALID_ARRAY_INDEX, so we use
    ``F.get`` to keep the reference's NULL-propagating semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.get(c, 0)


def normalize_grade(col: Column | str) -> Column:
    """Nutriscore grade normalization: a..e (any case) -> uppercase, else UNKNOWN."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    return F.when(low.isin(*GRADES), F.upper(c)).otherwise(F.lit("UNKNOWN"))
