"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9 X3 extension — the reference's only state is Spark's own
aggregation state; these add arbitrary keyed state).

``streaming_exact_dedup`` is the flagship: emit only the first occurrence of
each content digest across the whole stream — the streaming form of the
batch exact-dedup operator, with per-key state bounded to one boolean.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_exact_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Keyed first-occurrence filter over an unbounded stream.

    Groups by md5 digest of ``text_col``; state per digest is a single
    "seen" flag. Output rows are (digest, first id) — append-mode safe.
    At scale, state is one boolean per distinct digest, hash-partitioned by
    Spark's state store (RocksDB provider recommended for 100 TB runs).
    """
    keyed = df.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(id_col).alias("doc_id"),
    )

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            return
        first_id = None
        for pdf in pdfs:
            m = pdf["doc_id"].min()
            first_id = m if first_id is None else min(first_id, m)
        state.update((True,))
        yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [int(first_id)]})

    return keyed.groupBy("content_hash").applyInPandasWithState(
        dedup,
        outputStructType="content_hash string, doc_id long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
