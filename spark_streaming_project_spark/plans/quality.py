"""Corpus-quality and training-data-ordering queries: Gopher-style
repetition profiling, CCNet-style unigram-LM scoring, cross-corpus
duplicated-gram share, deterministic shuffle-sharding, and SemDeDup
semantic pruning.

Same contract as every other plans module: md5-deterministic pipelines so
the DuckDB oracle replays each one bit-for-bit (FP aggregates are rounded
to 6 decimals at the comparison surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.quality import (
    cross_doc_gram_stats,
    repetition_stats,
    unigram_logprob,
)
from ..operators.sampling import shuffle_shards
from ..operators.similarity import semdedup_prune
from ..sources.batch import load_table
from .llm import _DIM, _TOKS_CTE, _duck_dot, _pseudo_coef
from .registry import register

# ---------------------------------------------------------------------------
# Gopher repetition profile: dup n-gram fraction + top token/gram fractions.
# ---------------------------------------------------------------------------


@register(
    "repetition_profile",
    oracle=f"""
    WITH {_TOKS_CTE},
    base AS (
        SELECT doc_id, words,
               [array_to_string(words[i:i+1], ' ') for i in range(1, len(words))]
                   AS grams
        FROM toks WHERE len(words) >= 2
    ),
    dup AS (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_tokens,
               CAST(len(grams) AS BIGINT) AS n_grams,
               round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
                   AS dup_gram_frac
        FROM base
    ),
    tt AS (
        SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_token_frac
        FROM (
            SELECT doc_id, term, count(*) AS c
            FROM (SELECT doc_id, unnest(words) AS term FROM base)
            GROUP BY 1, 2
        )
        GROUP BY doc_id
    ),
    tg AS (
        SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_gram_frac
        FROM (
            SELECT doc_id, gram, count(*) AS c
            FROM (SELECT doc_id, unnest(grams) AS gram FROM base)
            GROUP BY 1, 2
        )
        GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_grams, dup_gram_frac, top_token_frac, top_gram_frac
    FROM dup JOIN tt USING (doc_id) JOIN tg USING (doc_id)
    """,
    tags=("llm", "quality"),
)
def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (Gopher repetition rules): duplicate
    word-bigram fraction plus most-frequent token / bigram occupancy. The
    filter a pretraining pipeline applies before any model-based scoring."""
    docs = load_table(spark, sf_dir, "documents")
    out = repetition_stats(docs, "text", "doc_id", gram_n=2)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_grams").cast("bigint").alias("n_grams"),
        "dup_gram_frac",
        "top_token_frac",
        "top_gram_frac",
    )


# ---------------------------------------------------------------------------
# Unigram-LM quality: mean ln p(token) under the corpus's own distribution.
# ---------------------------------------------------------------------------


@register(
    "unigram_quality",
    oracle=f"""
    WITH {_TOKS_CTE},
    tok AS (SELECT doc_id, unnest(words) AS token FROM toks),
    dt AS (SELECT doc_id, token, count(*) AS k FROM tok GROUP BY 1, 2),
    v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
    t AS (SELECT sum(cnt) AS total FROM v)
    SELECT doc_id,
           CAST(sum(k) AS BIGINT) AS n_tokens,
           round(sum(k * ln(CAST(cnt AS DOUBLE) / total)) / sum(k), 6) AS avg_logprob
    FROM dt JOIN v USING (token), t
    GROUP BY doc_id
    """,
    tags=("llm", "quality"),
)
def unigram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality proxy: per-document mean unigram log-probability
    under the corpus's own token distribution (two aggregation passes over
    the skinny token explode; the vocabulary side is |V|-bounded and
    broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Cross-corpus duplicated-gram share (RefinedWeb-style duplication measure).
# ---------------------------------------------------------------------------


@register(
    "cross_doc_gram_share",
    oracle=f"""
    WITH {_TOKS_CTE},
    g5 AS (
        SELECT doc_id,
               CASE WHEN len(words) >= 5
                    THEN list_distinct([array_to_string(words[i:i+4], ' ')
                                        for i in range(1, len(words) - 3)])
                    ELSE [] END AS shingles
        FROM toks
    ),
    gr AS (SELECT doc_id, unnest(shingles) AS gram FROM g5),
    dfq AS (SELECT gram, count(DISTINCT doc_id) AS gram_df FROM gr GROUP BY 1)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN gram_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS shared_grams,
           round(CAST(sum(CASE WHEN gram_df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS shared_frac
    FROM gr JOIN dfq USING (gram)
    GROUP BY doc_id
    """,
    tags=("llm", "quality", "dedup"),
)
def cross_doc_gram_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every document, the fraction of its distinct word 5-grams that
    occur in at least one OTHER document — the corpus-internal duplication
    measure (inverted-index shape, linear; no pair expansion)."""
    docs = load_table(spark, sf_dir, "documents")
    return cross_doc_gram_stats(docs, "text", "doc_id", n=5, min_df=2)


# ---------------------------------------------------------------------------
# Deterministic shuffle-sharding: reproducible training order.
# ---------------------------------------------------------------------------

_SHUFFLE_SEED = "epoch0"
_N_SHARDS = 16


@register(
    "training_shuffle_order",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               CAST('0x' || substr(md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)),
                                   1, 15) AS BIGINT) AS hv
        FROM documents
    )
    SELECT doc_id,
           CAST(hv % {_N_SHARDS} AS INTEGER) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % {_N_SHARDS}
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    tags=("llm", "ordering"),
)
def training_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training: md5(seed, id) assigns each
    doc a shard and a dense in-shard position — a reproducible pseudo-random
    permutation with no global sort (n_shards independent in-partition
    sorts; see ``sampling.shuffle_shards``)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(docs, "doc_id", n_shards=_N_SHARDS, seed=_SHUFFLE_SEED)


# ---------------------------------------------------------------------------
# SemDeDup: semantic pruning over the embedding table.
# ---------------------------------------------------------------------------

_SEM_BITS = 6
_SEM_SALT = "semdedup"
_SEM_THRESHOLD = 0.2


def _duck_sem_bucket(vec: str) -> str:
    """DuckDB twin of hyperplane_bucket(bits=6, salt='semdedup'): same
    md5-derived coefficients, same left-to-right accumulation order."""
    bits = []
    for b in range(_SEM_BITS):
        terms = " + ".join(
            f"{vec}[{i + 1}] * ({_pseudo_coef(f'{_SEM_SALT}:{b}:{i}')})"
            for i in range(_DIM)
        )
        bits.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << b} ELSE 0 END)")
    return " + ".join(bits)


_SEM_COS_CENT = (
    f"round(CASE WHEN sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('c', 'c')}) > 0 "
    f"THEN {_duck_dot('v', 'c')} / "
    f"(sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('c', 'c')})) END, 6)"
)
_SEM_PAIR_COS = (
    f"round(CASE WHEN sqrt({_duck_dot('a.v', 'a.v')}) * sqrt({_duck_dot('bb.v', 'bb.v')}) > 0 "
    f"THEN {_duck_dot('a.v', 'bb.v')} / "
    f"(sqrt({_duck_dot('a.v', 'a.v')}) * sqrt({_duck_dot('bb.v', 'bb.v')})) END, 6)"
)


@register(
    "semdedup_audit",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    b AS (
        SELECT vec_id, v,
               CAST({_duck_sem_bucket('v')} AS INTEGER) AS cluster,
               list_transform(v, x -> round(x, 3)) AS vr
        FROM vecs
    ),
    elems AS (
        SELECT cluster, unnest(vr) AS x, generate_subscripts(vr, 1) AS pos
        FROM b
    ),
    cm AS (SELECT cluster, pos, avg(x) AS m FROM elems GROUP BY 1, 2),
    cent AS (SELECT cluster, list(m ORDER BY pos) AS c FROM cm GROUP BY 1),
    sc AS (
        SELECT vec_id, b.cluster, v, {_SEM_COS_CENT} AS cos_centroid
        FROM b JOIN cent USING (cluster)
    ),
    drops AS (
        SELECT DISTINCT
               CASE WHEN a.cos_centroid > bb.cos_centroid THEN a.vec_id
                    WHEN a.cos_centroid < bb.cos_centroid THEN bb.vec_id
                    ELSE greatest(a.vec_id, bb.vec_id) END AS drop_id
        FROM sc a JOIN sc bb ON a.cluster = bb.cluster AND a.vec_id < bb.vec_id
        WHERE {_SEM_PAIR_COS} >= {_SEM_THRESHOLD}
    )
    SELECT vec_id, cluster, cos_centroid,
           vec_id NOT IN (SELECT drop_id FROM drops) AS kept
    FROM sc
    """,
    tags=("llm", "dedup", "similarity"),
)
def semdedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic pruning verdict per vector: hyperplane cluster,
    similarity to the cluster centroid, and whether the vector survives the
    within-cluster near-duplicate prune (the paper keeps the member least
    similar to the centroid)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_prune(
        emb,
        "vec_id",
        "embedding",
        dim=_DIM,
        threshold=_SEM_THRESHOLD,
        bits=_SEM_BITS,
        salt=_SEM_SALT,
    )


# ---------------------------------------------------------------------------
# Incremental ingestion dedup: new batch vs existing corpus index.
# ---------------------------------------------------------------------------

from .llm import _BAND_EXPRS, _SHINGLES_CTE, _SIG_COLS  # noqa: E402

_INC_THRESHOLD = 0.3

_INCREMENTAL_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    sigs AS (
        SELECT doc_id, shingles,
           {_SIG_COLS}
        FROM sh WHERE len(shingles) > 0
    ),
    bands AS (
        SELECT doc_id, unnest([{_BAND_EXPRS}]) AS band FROM sigs
    ),
    split AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7' AS is_corpus
        FROM documents
    ),
    bdig AS (
        SELECT d.doc_id, md5(d.text) AS dg
        FROM documents d JOIN split USING (doc_id) WHERE NOT is_corpus
    ),
    cdig AS (
        SELECT DISTINCT md5(d.text) AS dg
        FROM documents d JOIN split USING (doc_id)
        WHERE is_corpus AND d.text IS NOT NULL
    ),
    exact AS (SELECT doc_id FROM bdig WHERE dg IN (SELECT dg FROM cdig)),
    bb AS (SELECT b.* FROM bands b JOIN split s USING (doc_id)
           WHERE NOT s.is_corpus),
    cb AS (SELECT b.* FROM bands b JOIN split s USING (doc_id)
           WHERE s.is_corpus),
    cand AS (
        SELECT DISTINCT bb.doc_id AS nid, cb.doc_id AS cid
        FROM bb JOIN cb USING (band)
    ),
    near AS (
        SELECT DISTINCT nid AS doc_id
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.nid
        JOIN sh sb ON sb.doc_id = cand.cid
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
              >= {_INC_THRESHOLD}
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id IN (SELECT doc_id FROM exact) THEN 'exact_dup'
                WHEN d.doc_id IN (SELECT doc_id FROM near) THEN 'near_dup'
                ELSE 'new' END AS verdict
    FROM documents d JOIN split USING (doc_id)
    WHERE NOT is_corpus
"""


@register(
    "incremental_dedup_verdicts",
    oracle=_INCREMENTAL_ORACLE,
    tags=("llm", "dedup", "incremental"),
)
def incremental_dedup_verdicts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state ingestion dedup: the md5-split 'new batch' (upper half)
    checked against the 'existing corpus' (lower half) — exact digest
    anti-probe plus MinHash-LSH band probe with Jaccard verification; one
    verdict per batch doc (exact_dup / near_dup / new)."""
    from ..operators.dedup import incremental_dedup_verdicts

    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    corpus = docs.filter(h <= "7")
    batch = docs.filter(h > "7")
    return incremental_dedup_verdicts(
        corpus, batch, "text", "doc_id", threshold=_INC_THRESHOLD
    )


# ---------------------------------------------------------------------------
# Tokenize-to-ids: the corpus -> token-id step of a pretraining pipeline,
# with a deterministic per-doc checksum instead of raw id arrays (arrays
# defeat rows-only artifact hashing; the checksum pins content + order).
# ---------------------------------------------------------------------------

_VOCAB_TOP = 100


@register(
    "tokenized_fingerprints",
    oracle=f"""
    WITH {_TOKS_CTE},
    tok AS (
        SELECT doc_id, unnest(words) AS token,
               generate_subscripts(words, 1) AS pos
        FROM toks
    ),
    vocab AS (
        SELECT token,
               row_number() OVER (ORDER BY count(*) DESC, token ASC) AS token_id
        FROM tok GROUP BY token
        QUALIFY token_id <= {_VOCAB_TOP}
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unk,
           CAST(sum(t.pos * coalesce(v.token_id, 0)) AS BIGINT) AS id_checksum
    FROM tok t LEFT JOIN vocab v USING (token)
    GROUP BY t.doc_id
    """,
    tags=("llm", "tokenize"),
)
def tokenized_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization to vocabulary ids (top-{100} by frequency, rest
    UNK) summarized as an order-sensitive integer checksum per document
    (sum of position x id — exact integer arithmetic, so the check pins the
    id sequence without shipping arrays). The vocab is |V|-bounded and
    broadcast; the token join + per-doc fold is the linear tokenize shape a
    pretraining run materializes."""
    from ..functions.text import tokens as _tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.posexplode(_tokens("text")).alias("pos0", "token"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    )
    # top-K first (TakeOrderedAndProject — distributed partial top-K per
    # partition), THEN rank the K survivors: the global row_number window
    # only ever sees _VOCAB_TOP rows, never the full vocabulary
    wv = Window.orderBy(F.desc("cnt"), F.asc("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(_VOCAB_TOP)
        .select("token", F.row_number().over(wv).alias("token_id"))
    )
    joined = tok.join(F.broadcast(vocab), "token", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("long")).cast("bigint").alias("n_unk"),
        F.sum(F.col("pos") * F.coalesce("token_id", F.lit(0)))
        .cast("bigint")
        .alias("id_checksum"),
    )
