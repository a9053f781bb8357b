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


def streaming_minhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int | None = None,
    band_size: int | None = None,
    max_band_members: int = 64,
) -> DataFrame:
    """Incremental MinHash-LSH near-dup: new documents pair against the FULL
    stream history without batch recompute.

    The stateless prefix (shingle -> minhash signature -> band keys) is the
    same code path as the batch operator (``operators/dedup.py``), so a
    document hashes to identical bands in both modes. State per band key is
    the list of member doc ids seen so far; each arriving document emits one
    candidate row per existing member, then joins the membership list. The
    converged append-mode output therefore equals the batch band self-join's
    candidate pairs (``id_a < id_b``, one row per colliding band).

    Scale shape: bands are selective by construction, so per-key state is a
    handful of ids; ``max_band_members`` (default 64) hard-caps degenerate
    hot bands (e.g. boilerplate) — once a band's member list is full,
    later arrivals are DROPPED entirely (no pairs, nothing stored), the
    same replay-idempotent hot-key policy as
    ``streaming_winnow_candidates`` (ADVICE r5: pair-but-don't-store
    would re-emit those pairs when checkpoint recovery replays the
    batch). State is bounded at O(bands x cap) for any stream length;
    replayed ids are dropped by the membership check, keeping the output
    exactly-once per (band, pair). RocksDB state store recommended at
    100 TB keyspaces (see ``StreamRunner``).
    """
    from ..operators.dedup import (
        BAND_SIZE,
        NUM_PERM,
        lsh_band_keys,
        minhash_signatures,
    )

    num_perm = NUM_PERM if num_perm is None else num_perm
    band_size = BAND_SIZE if band_size is None else band_size
    sigs = minhash_signatures(df, text_col, id_col, num_perm)
    bands = sigs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(lsh_band_keys(num_perm, band_size)).alias("band"),
    )

    def emit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        members = list(state.get[0]) if state.exists else []
        known = set(members)
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for d in sorted(int(x) for x in pdf["doc_id"]):
                if d in known or len(members) >= max_band_members:
                    # seen, or band is hot: drop entirely (pair-but-
                    # don't-store would re-emit on replay — ADVICE r5)
                    continue
                for m in members:
                    out_a.append(min(m, d))
                    out_b.append(max(m, d))
                known.add(d)
                members.append(d)
        state.update((members,))
        if out_a:
            yield pd.DataFrame(
                {"band": [key[0]] * len(out_a), "id_a": out_a, "id_b": out_b}
            )

    return bands.groupBy("band").applyInPandasWithState(
        emit,
        outputStructType="band string, id_a long, id_b long",
        stateStructType="members array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_winnow_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    w: int = 4,
    max_fp_members: int = 64,
) -> DataFrame:
    """Incremental MOSS: new documents matched against the full stream
    history through winnowed-fingerprint postings — the positional-
    fingerprint sibling of ``streaming_minhash_candidates``.

    The stateless prefix (gram hash -> packed-key windowed min -> distinct
    32-bit fingerprints) is the SAME code path as the batch operator
    (``operators/textstats.winnow_fingerprints``), so a document winnows to
    identical fingerprints in both modes, and the drained append output's
    per-pair row counts equal the batch ``winnow_match_pairs`` shared-
    fingerprint counts (when the cap exceeds every fingerprint's df — see
    below). State per fingerprint is the posting list of doc ids seen so
    far; once it holds ``max_fp_members`` ids the fingerprint is HOT
    (boilerplate, not copying — the streaming analogue of the batch
    ``max_df`` stop-list) and later arrivals are DROPPED: no pairs
    emitted, nothing stored. Dropping rather than pairing keeps replays
    exactly-once — an un-stored doc that still emitted pairs would
    re-emit them when checkpoint recovery replays its batch (ADVICE r5)
    — and bounds state at O(fingerprints x cap) for any stream length;
    replayed ids already in the list are dropped by the membership check.

    Emits (fp, id_a, id_b) per shared fingerprint; callers aggregate to
    shared counts and threshold. The cap policies necessarily differ:
    batch stop-lists a hot fingerprint RETROACTIVELY (df > max_df emits
    zero pairs), while a stream cannot unemit, so the first
    ``max_fp_members`` arrivals still pair among themselves.
    """
    from ..operators.textstats import winnow_fingerprints

    fps = (
        winnow_fingerprints(df, text_col, id_col, k=k, w=w, hash_hex=8)
        .select(F.col(id_col).alias("doc_id"), "fp")
        .distinct()
    )

    def emit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        members = list(state.get[0]) if state.exists else []
        known = set(members)
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for d in sorted(int(x) for x in pdf["doc_id"]):
                if d in known or len(members) >= max_fp_members:
                    # already seen, or fingerprint is hot: drop entirely
                    # (pair-but-don't-store would re-emit on replay)
                    continue
                for m in members:
                    out_a.append(min(m, d))
                    out_b.append(max(m, d))
                known.add(d)
                members.append(d)
        state.update((members,))
        if out_a:
            yield pd.DataFrame(
                {"fp": [key[0]] * len(out_a), "id_a": out_a, "id_b": out_b}
            )

    return fps.groupBy("fp").applyInPandasWithState(
        emit,
        outputStructType="fp long, id_a long, id_b long",
        stateStructType="members array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_frequency_cap(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int = 15,
) -> DataFrame:
    """Streaming per-key frequency cap (anti-domination admission
    control): admit at most ``cap`` rows per key across the WHOLE stream,
    first-arrival order. The streaming counterpart of the batch
    ``source_capped_docs`` — same guarantee (no key exceeds ``cap``),
    different selection policy by nature: batch picks a deterministic
    md5-ordered subset of the full corpus; a stream must decide at
    arrival time, so it admits the first ``cap`` arrivals.

    State per key is the admitted id list — bounded at ``cap`` entries by
    construction, so state never grows past keys x cap whatever the
    stream length; the membership check also makes checkpoint-recovery
    re-deliveries exactly-once. Emits (key, id, admit_rank 1..cap).
    """

    def emit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        admitted = list(state.get[0]) if state.exists else []
        known = set(admitted)
        out_ids: list[int] = []
        out_rank: list[int] = []
        for pdf in pdfs:
            for d in (int(x) for x in pdf[id_col]):
                if d in known or len(admitted) >= cap:
                    continue
                admitted.append(d)
                known.add(d)
                out_ids.append(d)
                out_rank.append(len(admitted))
        state.update((admitted,))
        if out_ids:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out_ids),
                    id_col: out_ids,
                    "admit_rank": out_rank,
                }
            )

    return df.select(key_col, id_col).groupBy(key_col).applyInPandasWithState(
        emit,
        outputStructType=f"{key_col} string, {id_col} long, admit_rank int",
        stateStructType="admitted array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_span_keep(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_words: int = 10,
) -> DataFrame:
    """Incremental corpus-level span dedup (the streaming twin of
    ``operators/dedup.span_dedup_stats``): emit each distinct span's KEPT
    (first-arrival) occurrence exactly once; every later arrival of the
    same span is a duplicate and emits nothing.

    The stateless prefix (tokenize -> non-overlapping ``span_words``-word
    spans -> md5) is the SAME code path as the batch operator
    (``operators/dedup.doc_spans``), so a document yields identical
    (span_no, span_hash) rows in both modes. State per span hash is ONE
    (doc_id, span_no) struct — the batch op's argmin state, maintained
    incrementally; emission happens only on the transition from
    no-state to state, and the state store commits atomically with the
    batch, so checkpoint-recovery replays re-emit consistently
    (exactly-once drained output).

    Ordering semantics differ from batch BY NATURE: batch keeps the
    global-min (doc_id, span_no); a stream keeps the first ARRIVAL
    (within one batch, ties resolve to the smallest (doc_id, span_no),
    so ascending-ordered ingest reproduces the batch keep-set exactly).
    Emits (span_hash, doc_id, span_no).
    """
    from ..operators.dedup import doc_spans

    spans = doc_spans(df, text_col, id_col, span_words).select(
        F.col(id_col).alias("doc_id"), "span_no", "span_hash"
    )

    def emit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            for d, s in zip(pdf["doc_id"], pdf["span_no"]):
                cand = (int(d), int(s))
                if best is None or cand < best:
                    best = cand
        if best is None:
            return
        state.update(best)
        yield pd.DataFrame(
            {"span_hash": [key[0]], "doc_id": [best[0]], "span_no": [best[1]]}
        )

    return spans.groupBy("span_hash").applyInPandasWithState(
        emit,
        outputStructType="span_hash string, doc_id long, span_no int",
        stateStructType="doc_id long, span_no int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup_ttl(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ts_col: str,
    ttl_minutes: int,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Exact dedup with BOUNDED state: a digest's "seen" flag expires
    once the event-time watermark passes (last occurrence + ttl).

    The unbounded ``streaming_exact_dedup`` never forgets — correct, but
    its state grows with distinct history forever. This variant trades
    completeness for a hard state bound: state holds only digests seen
    within the TTL horizon, so a duplicate arriving AFTER its
    predecessor expired is re-emitted as a fresh first occurrence — the
    honest, documented miss (the same trade every watermarked streaming
    aggregation makes for late data). TTL slides: each duplicate
    arrival extends its digest's expiry to (its event time + ttl).

    Mechanics: ``applyInPandasWithState`` with
    ``GroupStateTimeout.EventTimeTimeout`` — expired keys are delivered
    one final time with ``hasTimedOut`` and their state removed; no
    emission happens on expiry. Spark fires timeouts only for keys with
    NO data in the micro-batch, so a duplicate arriving in the very
    batch that would have evicted its digest is still suppressed (and
    extends the TTL) — eviction becomes visible from the next
    key-silent batch onward; the pytest pins this choreography.
    Requires a watermark on ``ts_col`` (``watermark_delay`` defaults to
    0 for deterministic tests).
    """
    ttl_ms = ttl_minutes * 60 * 1000
    keyed = df.withWatermark(ts_col, watermark_delay).select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
    )

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first_id = None
        first_ts = None
        max_ts_ms = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            row = pdf.loc[pdf["doc_id"].idxmin()]
            if first_id is None or row["doc_id"] < first_id:
                first_id, first_ts = row["doc_id"], row["ts"]
            batch_max = pdf["ts"].max()
            ms = int(batch_max.value // 1_000_000)
            max_ts_ms = ms if max_ts_ms is None else max(max_ts_ms, ms)
        if max_ts_ms is None:
            return
        fresh = not state.exists
        state.update((True,))
        state.setTimeoutTimestamp(max_ts_ms + ttl_ms)
        if fresh:
            yield pd.DataFrame(
                {
                    "content_hash": [key[0]],
                    "doc_id": [int(first_id)],
                    "first_ts": [first_ts],
                }
            )

    return keyed.groupBy("content_hash").applyInPandasWithState(
        dedup,
        outputStructType="content_hash string, doc_id long, first_ts timestamp",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
