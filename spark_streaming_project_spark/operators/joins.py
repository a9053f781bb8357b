"""Join strategy helpers for scale (SURVEY.md §2.8: the reference has no
joins; the engine ships the strategies a 100 TB deployment needs).

AQE's skew-join splitting handles most skew automatically; explicit salting
remains necessary when the skewed side feeds a *keyed aggregation* after the
join (AQE can't split those) or when AQE is off. ``skew_salted_join``
implements the classic recipe: explode the small side into ``salt_factor``
replicas, scatter the big side's hot keys uniformly across the replicas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def skew_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salted keys.

    - big side: each row gets a uniform pseudo-random salt in [0, factor)
      derived from hashing the full row key set (deterministic per row via
      xxhash64 of the join key and a monotonically increasing id would be
      nondeterministic across retries — we hash the key plus all of the big
      side's columns, which is stable for a given input).
    - small side: replicated ``salt_factor`` times (explode), so every
      (key, salt) bucket finds its match.

    The result equals the unsalted join row-for-row; only the shuffle key
    distribution changes (hot keys spread over ``salt_factor`` reducers).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor))
    big_salted = big.withColumn(SALT_COL, salt.cast("int"))
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    joined = big_salted.join(small_salted, [on, SALT_COL], how)
    return joined.drop(SALT_COL)
