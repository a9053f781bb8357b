"""Corpus-quality and training-data-ordering queries: Gopher-style
repetition profiling, CCNet-style unigram-LM scoring, cross-corpus
duplicated-gram share, deterministic shuffle-sharding, and SemDeDup
semantic pruning.

Same contract as every other plans module: md5-deterministic pipelines so
the DuckDB oracle replays each one bit-for-bit (FP aggregates are rounded
to 6 decimals at the comparison surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngrams
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


# ---------------------------------------------------------------------------
# PMI collocations: corpus-wide pointwise mutual information of adjacent
# token pairs — the classic collocation extractor (Church & Hanks 1990).
# ---------------------------------------------------------------------------


@register(
    "pmi_collocations",
    oracle=rf"""
    WITH {_TOKS_CTE},
    uni AS (
        SELECT t, count(*) AS c FROM (SELECT unnest(words) AS t FROM toks)
        GROUP BY 1
    ),
    n_uni AS (SELECT CAST(sum(c) AS DOUBLE) AS nu FROM uni),
    bi_all AS (
        SELECT g, count(*) AS c_xy
        FROM (
            SELECT unnest([array_to_string(words[i:i+1], ' ')
                           for i in range(1, len(words))]) AS g
            FROM toks WHERE len(words) >= 2
        )
        GROUP BY 1
    ),
    n_bi AS (SELECT CAST(sum(c_xy) AS DOUBLE) AS nb FROM bi_all),
    scored AS (
        SELECT g AS bigram, c_xy,
               ln((CAST(c_xy AS DOUBLE) * nu * nu)
                  / (nb * ux.c * uy.c)) AS _pmi
        FROM bi_all
        JOIN uni ux ON ux.t = split_part(g, ' ', 1)
        JOIN uni uy ON uy.t = split_part(g, ' ', 2)
        CROSS JOIN n_uni CROSS JOIN n_bi
        WHERE c_xy >= 5
    )
    SELECT bigram, c_xy, round(_pmi, 6) AS pmi
    FROM scored
    ORDER BY _pmi DESC, bigram ASC
    LIMIT 20
    """,
    tags=("llm", "quality", "topk"),
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token collocations by PMI (min pair count 5):
    ln(P(xy) / (P(x)P(y))) from exact corpus counts — the statistical
    phrase detector a tokenizer/quality pipeline runs over a corpus.

    Scale shape: two combinable counting aggregates (unigrams, bigrams),
    two vocab-keyed joins for the marginals, scalars as broadcast one-row
    frames, TakeOrderedAndProject(20). The ratio is assembled from
    integers in one fixed multiplication order, so the double is engine-
    identical and the ordering deterministic.
    """
    from ..functions.text import tokens as _tokens
    from ..functions.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    uni = (
        docs.select(F.explode(_tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("nu"))
    bi_all = (
        docs.select(F.explode(word_ngrams("text", 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("c_xy"))
    )
    n_bi = bi_all.agg(F.sum("c_xy").cast("double").alias("nb"))
    ux = uni.select(F.col("t").alias("_tx"), F.col("c").alias("_cx"))
    uy = uni.select(F.col("t").alias("_ty"), F.col("c").alias("_cy"))
    pmi = F.log(
        (F.col("c_xy").cast("double") * F.col("nu") * F.col("nu"))
        / (F.col("nb") * F.col("_cx") * F.col("_cy"))
    )
    scored = (
        bi_all.filter(F.col("c_xy") >= 5)
        .join(ux, F.split_part(F.col("g"), F.lit(" "), F.lit(1)) == F.col("_tx"))
        .join(uy, F.split_part(F.col("g"), F.lit(" "), F.lit(2)) == F.col("_ty"))
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
        .select(F.col("g").alias("bigram"), "c_xy", pmi.alias("_pmi"))
    )
    return (
        scored.orderBy(F.desc("_pmi"), F.asc("bigram"))
        .limit(20)
        .select("bigram", "c_xy", F.round("_pmi", 6).alias("pmi"))
    )


# ---------------------------------------------------------------------------
# Per-source distribution drift: smoothed KL divergence of each source's
# unigram distribution against the corpus, over the corpus top-1000 vocab.
# ---------------------------------------------------------------------------


@register(
    "source_drift_kl",
    oracle=r"""
    WITH st AS (
        SELECT source,
               unnest(list_filter(string_split_regex(text, '\s+'),
                                  t -> t <> '')) AS t
        FROM documents WHERE text IS NOT NULL
    ),
    uni AS (SELECT t, count(*) AS c FROM st GROUP BY 1),
    vocab AS (SELECT t, c FROM uni ORDER BY c DESC, t ASC LIMIT 1000),
    nv AS (SELECT CAST(sum(c) AS DOUBLE) AS n_v, count(*) AS v FROM vocab),
    sc AS (
        SELECT source, t, count(*) AS c_s FROM st
        WHERE t IN (SELECT t FROM vocab) GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.source, v.t, v.c, coalesce(sc.c_s, 0) AS c_s
        FROM (SELECT DISTINCT source FROM documents) s
        CROSS JOIN vocab v
        LEFT JOIN sc ON sc.source = s.source AND sc.t = v.t
    ),
    ns AS (SELECT source, CAST(sum(c_s) AS DOUBLE) AS n_s FROM grid GROUP BY 1)
    SELECT g.source,
           CAST(ns.n_s AS BIGINT) AS vocab_tokens,
           round(sum(
               ((g.c_s + 1.0) / (ns.n_s + nv.v))
               * ln(((g.c_s + 1.0) / (ns.n_s + nv.v))
                    / ((g.c + 1.0) / (nv.n_v + nv.v)))
           ), 6) AS kl_divergence
    FROM grid g JOIN ns ON ns.source = g.source CROSS JOIN nv
    GROUP BY 1, 2
    """,
    tags=("llm", "quality", "profiling"),
)
def source_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed KL(source || corpus) over the corpus top-1000 unigram
    vocabulary (add-1 smoothing on both sides) — the drift monitor a
    corpus pipeline runs per ingestion source: a source whose token
    distribution diverges from the corpus is mislabeled, templated, or
    broken upstream.

    Scale shape: one token-count aggregate, a bounded top-1000 vocab
    (TakeOrdered), a sources x vocab grid from broadcast nested-loop over
    two BOUNDED frames, and one combinable sum per source. The raw corpus
    is scanned twice (corpus counts; per-source counts), never joined
    against itself.
    """
    from ..functions.text import tokens as _tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    st = docs.select("source", F.explode(_tokens("text")).alias("t"))
    uni = st.groupBy("t").agg(F.count("*").alias("c"))
    vocab = uni.orderBy(F.desc("c"), F.asc("t")).limit(1000)
    nv = vocab.agg(
        F.sum("c").cast("double").alias("n_v"), F.count("*").alias("v")
    )
    sc = (
        st.join(F.broadcast(vocab.select("t")), "t")
        .groupBy("source", "t")
        .agg(F.count("*").alias("c_s"))
    )
    # Source dimension from the UNFILTERED table: the oracle's grid uses
    # SELECT DISTINCT source FROM documents, so a source whose documents
    # are all NULL-text must still appear (with c_s=0 smoothing rows).
    sources = load_table(spark, sf_dir, "documents").select("source").distinct()
    grid = (
        sources.join(F.broadcast(vocab))
        .join(sc, ["source", "t"], "left")
        .select(
            "source", "c", F.coalesce(F.col("c_s"), F.lit(0)).alias("c_s")
        )
    )
    ns = grid.groupBy("source").agg(F.sum("c_s").cast("double").alias("n_s"))
    p = (F.col("c_s") + 1.0) / (F.col("n_s") + F.col("v"))
    q = (F.col("c") + 1.0) / (F.col("n_v") + F.col("v"))
    return (
        grid.join(ns, "source")
        .join(F.broadcast(nv))
        .groupBy("source", F.col("n_s").cast("bigint").alias("vocab_tokens"))
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl_divergence"))
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training. Promoted from rows-only to a full oracle in r09
# (VERDICT r8 ask #4): the merge loop is deterministic (lexicographic
# tie-break), so 8 rounds unroll to chained MATERIALIZED CTEs. The greedy
# left-to-right merge application — Spark's array fold — becomes a single
# string replace() per round by wrapping every symbol in chr(30)/chr(31)
# sentinels: adjacent matches share no boundary characters, so one
# non-overlapping left-to-right replace pass IS the fold (verified
# exact-match vs both the Spark builder and the pure-Python reference in
# tests/test_bpe.py; sentinels proven absent from the corpus).
# ---------------------------------------------------------------------------


def _bpe_oracle(n_merges: int = 8) -> str:
    parts = [
        r"""
    wdict AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                      t -> t <> '')) AS word
            FROM documents WHERE text IS NOT NULL
        ) GROUP BY 1
    ),
    w0 AS MATERIALIZED (
        SELECT array_to_string(
                 [chr(30) || word[i] || chr(31)
                  for i in range(1, length(word) + 1)], '') AS s,
               cnt
        FROM wdict
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f""",
    pc{k} AS (
        SELECT p.l || ' ' || p.r AS pair,
               CAST(sum(cnt) AS BIGINT) AS pair_count
        FROM (
            SELECT string_split(s[2:length(s)-1],
                                chr(31) || chr(30)) AS syms, cnt
            FROM w{k - 1}
        ), unnest([{{'l': syms[i], 'r': syms[i+1]}}
                   for i in range(1, len(syms))]) AS u(p)
        WHERE len(syms) >= 2
        GROUP BY 1
    ),
    m{k} AS MATERIALIZED (
        SELECT {k} AS merge_rank,
               split_part(pair, ' ', 1) AS lft,
               split_part(pair, ' ', 2) AS rgt,
               pair_count
        FROM pc{k} ORDER BY pair_count DESC, pair ASC LIMIT 1
    ),
    w{k} AS MATERIALIZED (
        SELECT replace(s,
                 chr(30) || lft || chr(31) || chr(30) || rgt || chr(31),
                 chr(30) || lft || rgt || chr(31)) AS s,
               cnt
        FROM w{k - 1}, m{k}
    )"""
        )
    sel = " UNION ALL ".join(
        f'SELECT merge_rank, lft AS "left", rgt AS "right", '
        f"lft || rgt AS merged, pair_count FROM m{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + "".join(parts) + (
        f" SELECT * FROM ({sel}) ORDER BY merge_rank"
    )


def _bpe_curve_oracle(n_merges: int = 8) -> str:
    """Same chained-CTE replay, different read-out: corpus token count
    after each merge round (symbol count = chr(30) sentinel count)."""
    body = _bpe_oracle(n_merges)
    with_part = body[: body.rindex(" SELECT * FROM (")]
    nsym = "(length(s) - length(replace(s, chr(30), '')))"
    sel = " UNION ALL ".join(
        f"SELECT {k} AS merge_rank, "
        f"CAST(sum(cnt * {nsym}) AS BIGINT) AS corpus_tokens FROM w{k}"
        for k in range(0, n_merges + 1)
    )
    return with_part + f" SELECT * FROM ({sel}) ORDER BY merge_rank"


@register(
    "bpe_merge_table",
    oracle=_bpe_oracle(8),
    tags=("llm", "tokenizer"),
)
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 8 BPE merge rules learned from the corpus word-frequency
    dictionary (Sennrich et al. 2016): (merge_rank, left, right, merged,
    pair_count), deterministic under lexicographic tie-break. Training
    rounds aggregate the VOCAB-sized dict and ship one argmax row to the
    driver per round — the k-means/connected-components coordination
    pattern, corpus touched exactly once. Oracled via unrolled
    MATERIALIZED CTEs with a sentinel-wrapped replace() as the greedy
    merge fold (see ``_bpe_oracle``)."""
    from ..operators.bpe import bpe_train_merges
    from ..sources.batch import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, "text", n_merges=8)
    return spark.createDataFrame(
        [
            (i + 1, left, right, left + right, int(cnt))
            for i, (left, right, cnt) in enumerate(merges)
        ],
        "merge_rank int, left string, right string, merged string, pair_count bigint",
    )


@register(
    "bpe_compression_curve",
    oracle=_bpe_curve_oracle(8),
    tags=("llm", "tokenizer", "calibration"),
)
def bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-budget planning curve (r09): corpus token count after
    each of the first 8 BPE merges (rank 0 = raw characters). This is
    how a tokenizer team sizes n_merges with data — the curve's knee
    says where additional merges stop buying compression on THIS corpus.
    Costs one extra scalar aggregate per training round on the
    vocab-sized dict (``token_curve`` out-param of the trainer); the
    corpus itself is still touched exactly once for the word dictionary.
    Oracle replays the identical curve from the sentinel-wrapped CTE
    chain (symbol count = chr(30) count per encoded word)."""
    from ..operators.bpe import bpe_train_merges_from_dict, word_freq_dict
    from ..sources.batch import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    curve: list[tuple[int, int]] = []
    bpe_train_merges_from_dict(
        word_freq_dict(docs, "text"), n_merges=8, token_curve=curve
    )
    return spark.createDataFrame(
        [(rank, int(toks)) for rank, toks in curve],
        "merge_rank int, corpus_tokens bigint",
    )


@register(
    "tokenizer_compression",
    oracle=r"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
                                    x -> x <> ''))) AS BIGINT) AS ws_tokens,
           CAST(sum(len(regexp_extract_all(lower(text),
                                           '[a-z]+|[0-9]+|[^a-z0-9\s]')))
                AS BIGINT) AS bpe_tokens,
           round(CAST(sum(length(text)) AS DOUBLE)
                 / CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
                                            x -> x <> ''))) AS DOUBLE), 6)
               AS chars_per_ws_token,
           round(CAST(sum(length(text)) AS DOUBLE)
                 / CAST(sum(len(regexp_extract_all(lower(text),
                                '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS DOUBLE), 6)
               AS chars_per_bpe_token
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY lang
    """,
    tags=("llm", "tokenize", "profiling"),
)
def tokenizer_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer compression audit per language: characters per
    whitespace token and per BPE-ish regex token — the fertility /
    bytes-per-token number a tokenizer change is judged by, and the
    denominator for token-budget planning. Pure built-in expressions over
    one scan (two tokenizations fused into the same aggregate); exact
    integer sums with a single final division keep floats
    order-independent."""
    from ..functions.text import bpe_token_count, token_count

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    chars = F.sum(F.length("text")).cast("long")
    ws = F.sum(token_count("text")).cast("long")
    bpe = F.sum(bpe_token_count("text")).cast("long")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        chars.alias("n_chars"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(chars.cast("double") / ws.cast("double"), 6).alias(
            "chars_per_ws_token"
        ),
        F.round(chars.cast("double") / bpe.cast("double"), 6).alias(
            "chars_per_bpe_token"
        ),
    )


@register(
    "heavy_hitters_cms",
    oracle=f"""
    WITH {_TOKS_CTE},
    tok AS (SELECT unnest(words) AS token FROM toks),
    exact AS (
        SELECT token, count(*) AS exact_cnt FROM tok GROUP BY 1
        ORDER BY exact_cnt DESC, token ASC LIMIT 20
    ),
    cells AS (
        SELECT r AS row,
               CAST(concat('0x', substr(md5('cms' || CAST(r AS VARCHAR)
                    || ':' || token), 1, 4)) AS BIGINT) % 256 AS bucket,
               count(*) AS cnt
        FROM tok CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
        GROUP BY 1, 2
    ),
    probes AS (
        SELECT token, exact_cnt, r AS row,
               CAST(concat('0x', substr(md5('cms' || CAST(r AS VARCHAR)
                    || ':' || token), 1, 4)) AS BIGINT) % 256 AS bucket
        FROM exact CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r)
    )
    SELECT token, exact_cnt,
           CAST(min(coalesce(cnt, 0)) AS BIGINT) AS cms_est
    FROM probes LEFT JOIN cells USING (row, bucket)
    GROUP BY 1, 2
    """,
    tags=("llm", "sketch", "streaming-mergeable"),
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter audit through a count-min sketch (Cormode &
    Muthukrishnan 2005; depth 4 x width 256): the exact top-20 corpus
    tokens with their CMS point estimates side by side — cms_est >=
    exact_cnt always (one-sided error), and the gap measures collision
    pressure at this width. The sketch is the FREQUENCY member of the
    mergeable family (DDSketch quantiles / HLL distinct): a <=1024-row
    additive counter frame a 100 TB pipeline maintains incrementally
    instead of shuffling the full token domain. md5 cells make every
    counter engine-replayable. See operators/sketches.cms_build."""
    from ..functions.text import tokens as _tokens
    from ..operators.sketches import cms_build, cms_estimate

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.filter(F.col("text").isNotNull()).select(
        F.explode(_tokens("text")).alias("token")
    )
    sketch = cms_build(tok, "token")
    exact = (
        tok.groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(20)
    )
    return cms_estimate(sketch, exact, "token")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003).
# The packed-key trick (hash * 2^20 + inverted position) makes min-hash-
# with-rightmost-tie-break a plain windowed min in BOTH engines — see
# operators/textstats.winnow_fingerprints.
# ---------------------------------------------------------------------------

def _winnow_fp_cte(hash_hex: int = 4) -> str:
    """Shared winnowing CTE: 4-hex (16-bit) fingerprints for per-doc
    profiles, 8-hex (32-bit) for cross-document matching."""
    return (
        _TOKS_CTE
        + r""",
    gl AS (
        SELECT doc_id,
               CASE WHEN len(words) >= 3
                    THEN [array_to_string(words[i:i+2], ' ')
                          for i in range(1, len(words) - 1)]
                    ELSE [] END AS grams
        FROM toks
    ),
    g AS (
        SELECT doc_id, len(grams) AS n,
               unnest(range(1, len(grams) + 1)) AS pos, grams
        FROM gl WHERE len(grams) >= 1
    ),
    h AS (
        SELECT doc_id, n, pos,
               CAST(concat('0x', substr(md5(grams[pos]), 1, 4)) AS BIGINT)
                   AS hv
        FROM g
    ),
    sel AS (
        SELECT doc_id, n, pos,
               min(hv * 1048576 + (1048575 - pos)) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS selkey
        FROM h
    ),
    fps AS (
        SELECT DISTINCT doc_id,
               CAST(selkey // 1048576 AS BIGINT) AS fp,
               CAST(1048575 - (selkey % 1048576) AS BIGINT) AS sel_pos
        FROM sel WHERE pos <= n - 3
    )"""
    ).replace("md5(grams[pos]), 1, 4", f"md5(grams[pos]), 1, {hash_hex}")


_WINNOW_FP_CTE = _winnow_fp_cte(4)


@register(
    "winnowing_profile",
    oracle=f"""
    WITH {_WINNOW_FP_CTE}
    SELECT f.doc_id,
           CAST(any_value(len(gl.grams)) AS BIGINT) AS n_grams,
           count(*) AS n_selected,
           CAST(sum(f.fp) AS BIGINT) AS fp_sum,
           CAST(min(f.fp) AS BIGINT) AS fp_min,
           CAST(max(f.fp) AS BIGINT) AS fp_max,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(any_value(len(gl.grams)) AS DOUBLE), 6) AS density
    FROM fps f JOIN gl USING (doc_id)
    GROUP BY f.doc_id
    """,
    tags=("llm", "fingerprint", "dedup"),
)
def winnowing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint profile: selected-set size,
    exact-integer digest (sum/min/max of the 16-bit fingerprint values)
    and selection density. Winnowing theory pins expected density near
    2/(w+1) = 0.4 at w=4 — the storage-vs-guarantee trade every
    plagiarism/near-dup fingerprint index is sized by. All-integer
    outputs except the single final density division."""
    from ..operators.textstats import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, "text", "doc_id", k=3, w=4)
    grams = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(word_ngrams("text", n=3)).alias("n_grams")
    )
    return (
        fps.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("fp").cast("long").alias("fp_sum"),
            F.min("fp").cast("long").alias("fp_min"),
            F.max("fp").cast("long").alias("fp_max"),
        )
        .join(grams, "doc_id")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            "n_selected",
            "fp_sum",
            "fp_min",
            "fp_max",
            F.round(
                F.col("n_selected").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("density"),
        )
    )


@register(
    "winnowing_hot_fingerprints",
    oracle=f"""
    WITH {_WINNOW_FP_CTE}
    SELECT fp, count(DISTINCT doc_id) AS doc_freq
    FROM fps
    GROUP BY fp
    ORDER BY doc_freq DESC, fp ASC
    LIMIT 20
    """,
    tags=("llm", "fingerprint", "dedup"),
)
def winnowing_hot_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 winnowed fingerprints selected by the most documents — the
    hot keys a fingerprint inverted index must cap or stop-list before
    the candidate self-join (the same hot-gram pressure the n-gram dedup
    chooser measures). Bounded output; total order by (doc_freq desc,
    fp asc)."""
    from ..operators.textstats import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, "text", "doc_id", k=3, w=4)
    return (
        fps.select("doc_id", "fp")
        .distinct()
        .groupBy("fp")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("fp"))
        .limit(20)
    )


# Shared bigram-LM CTE chain: (doc_id, k, logp) under the corpus add-1
# bigram model — consumed by bigram_perplexity and quality_filter_kappa.
_BIGRAM_SCORED_CTE = """bg AS (
        SELECT doc_id,
               unnest(CASE WHEN len(words) >= 2
                      THEN [array_to_string(words[i:i+1], ' ')
                            for i in range(1, len(words))]
                      ELSE [] END) AS bg
        FROM toks
    ),
    doc_bg AS (SELECT doc_id, bg, count(*) AS k FROM bg GROUP BY 1, 2),
    model AS (SELECT bg, count(*) AS cnt FROM bg GROUP BY 1),
    ctx AS (
        SELECT string_split(bg, ' ')[1] AS w1, sum(cnt) AS c1
        FROM model GROUP BY 1
    ),
    voc AS (
        SELECT count(DISTINCT t) AS v
        FROM (SELECT unnest(words) AS t FROM toks)
    ),
    scored AS (
        SELECT d.doc_id, d.k,
               ln((m.cnt + 1) / CAST(c.c1 + voc.v AS DOUBLE)) AS logp
        FROM doc_bg d
        JOIN model m USING (bg)
        JOIN ctx c ON string_split(d.bg, ' ')[1] = c.w1, voc
    )"""


@register(
    "bigram_perplexity",
    oracle=f"""
    WITH {_TOKS_CTE},
    {_BIGRAM_SCORED_CTE}
    SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
           round(sum(logp * k) / sum(k), 6) AS avg_logprob,
           round(exp(-sum(logp * k) / sum(k)), 6) AS perplexity
    FROM scored GROUP BY doc_id
    """,
    tags=("llm", "quality", "lm"),
)
def bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus's own add-1 bigram LM —
    the fluency filter tier above unigram_quality: rewards locally
    plausible token ORDER, not just common tokens. See
    operators/quality.bigram_logprob for the pre-aggregated join shape."""
    from ..operators.quality import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Trained logistic-regression quality classifier — TRAINING replays exactly
# in SQL: integer-quantized residuals (order-free BIGINT gradients),
# rational sigmoid (no libm), ordered-fold dot products, and the gradient
# loop unrolled into per-iteration CTEs (the MMR/PQ unrolling pattern
# applied to gradient descent). See operators/classifier.py.
# ---------------------------------------------------------------------------

_LR_BUCKETS = 32
_LR_ITERS = 3
_LR_TARGETS = ("src0", "src1", "src2")


def _logreg_cte(iters: int = _LR_ITERS) -> str:
    b = _LR_BUCKETS
    d = b + 1
    targets = ", ".join(repr(s) for s in _LR_TARGETS)
    parts = [
        rf"""
    lrtok AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(t), 1, 4)) AS BIGINT) % {b} AS bkt
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS t
              FROM documents WHERE text IS NOT NULL)
    ),
    lrbc AS (SELECT doc_id, bkt, count(*) AS k FROM lrtok GROUP BY 1, 2),
    lrgrid AS (
        SELECT d.doc_id, g.j
        FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d,
             (SELECT unnest(range({b})) AS j) g
    ),
    lrdense AS (
        SELECT g.doc_id, g.j, CAST(coalesce(c.k, 0) AS BIGINT) AS k
        FROM lrgrid g LEFT JOIN lrbc c
          ON g.doc_id = c.doc_id AND g.j = c.bkt
    ),
    lrx AS (
        SELECT doc_id, [CAST(1 AS BIGINT)] || list(k ORDER BY j) AS x
        FROM lrdense GROUP BY doc_id
    ),
    feats AS (
        SELECT x.doc_id,
               CASE WHEN dd.source IN ({targets}) THEN 1 ELSE 0 END AS y,
               x.x
        FROM lrx x JOIN documents dd USING (doc_id)
    ),
    nn AS (SELECT count(*) AS n FROM feats),
    r1 AS (
        SELECT doc_id, y, x,
               CAST(round((y - 0.5) * 1000000.0) AS BIGINT) AS rq
        FROM feats
    ),
    g1 AS (
        SELECT j, sum(rq * x[j]) AS g
        FROM r1, (SELECT unnest(range(1, {d + 1})) AS j) GROUP BY j
    ),
    w1 AS (
        SELECT j, 0.0 + 0.5 * (CAST(g AS DOUBLE) / (n * 1000000.0)) AS w
        FROM g1, nn
    )"""
    ]
    for i in range(2, iters + 1):
        parts.append(
            f""",
    wl{i - 1} AS (SELECT list(w ORDER BY j) AS wl FROM w{i - 1}),
    s{i} AS (
        SELECT f.doc_id, f.y, f.x,
               list_reduce([l.wl[j] * f.x[j] for j in range(1, {d + 1})],
                           (a, bb) -> a + bb) AS z
        FROM feats f, wl{i - 1} l
    ),
    r{i} AS (
        SELECT doc_id, y, x,
               CAST(round((y - 0.5 * (1.0 + z / (1.0 + abs(z))))
                          * 1000000.0) AS BIGINT) AS rq
        FROM s{i}
    ),
    g{i} AS (
        SELECT j, sum(rq * x[j]) AS g
        FROM r{i}, (SELECT unnest(range(1, {d + 1})) AS j) GROUP BY j
    ),
    w{i} AS (
        SELECT w.j, w.w + 0.5 * (CAST(g.g AS DOUBLE) / (n * 1000000.0)) AS w
        FROM w{i - 1} w JOIN g{i} g USING (j), nn
    )"""
        )
    parts.append(
        f""",
    wlF AS (SELECT list(w ORDER BY j) AS wl FROM w{iters}),
    scored AS (
        SELECT f.doc_id, f.y,
               list_reduce([l.wl[j] * f.x[j] for j in range(1, {d + 1})],
                           (a, bb) -> a + bb) AS z
        FROM feats f, wlF l
    )"""
    )
    return "".join(parts)


def _lr_feats(spark: SparkSession, sf_dir: str):
    from ..operators.classifier import hashed_bucket_features

    docs = load_table(spark, sf_dir, "documents")
    return hashed_bucket_features(
        docs, "text", "doc_id",
        F.col("source").isin(*_LR_TARGETS), n_buckets=_LR_BUCKETS,
    )


# One trained weight vector per (sf_dir, hyperparams) per process
# (VERDICT r6 "What's wrong" #2): the five quality_logreg_* builders used
# to run five identical 3-iteration fits (~31 s of the r06 bench); the
# model is a plain 33-float list, so a module-level memo is exact — the
# training itself is deterministic (integer-quantized gradients, ordered
# driver-side updates), so cached vs fresh weights are bit-identical.
_LR_FIT_CACHE: dict[tuple[str, int, int, float], list[float]] = {}


def _lr_weights(spark: SparkSession, sf_dir: str) -> list[float]:
    from ..operators.classifier import logreg_train_quantized

    key = (sf_dir, _LR_BUCKETS, _LR_ITERS, 0.5)
    w = _LR_FIT_CACHE.get(key)
    if w is None:
        w = logreg_train_quantized(
            _lr_feats(spark, sf_dir),
            n_buckets=_LR_BUCKETS, iters=_LR_ITERS, lr=0.5,
        )
        _LR_FIT_CACHE[key] = w
    return list(w)


@register(
    "quality_logreg_weights",
    oracle=f"""
    WITH {_logreg_cte()}
    SELECT CAST(j AS INTEGER) AS pos, w
    FROM w{_LR_ITERS}
    """,
    tags=("llm", "quality", "classifier"),
)
def quality_logreg_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained classifier itself: 33 weights (bias + 32 hashed-unigram
    buckets) after 3 quantized-gradient iterations at lr=0.5 — emitted
    UNROUNDED because training is engine-exact by construction (integer
    gradients, rational sigmoid, ordered folds). The model sidecar a
    100 TB scoring pass would broadcast."""
    w = _lr_weights(spark, sf_dir)
    return spark.createDataFrame(
        [(j + 1, float(w[j])) for j in range(len(w))], "pos int, w double"
    )


@register(
    "quality_logreg_scores",
    oracle=f"""
    WITH {_logreg_cte()}
    SELECT doc_id, y,
           round(0.5 * (1.0 + z / (1.0 + abs(z))), 6) AS prob,
           CAST(CASE WHEN 0.5 * (1.0 + z / (1.0 + abs(z))) > 0.5
                     THEN 1 ELSE 0 END AS INTEGER) AS predicted
    FROM scored
    """,
    tags=("llm", "quality", "classifier"),
)
def quality_logreg_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document scored under the trained quality classifier:
    rational-sigmoid probability of belonging to the target slice plus
    the hard prediction — the corpus-wide filter pass (weights broadcast
    as literals; embarrassingly parallel scan)."""
    from ..operators.classifier import logreg_score

    feats = _lr_feats(spark, sf_dir)
    w = _lr_weights(spark, sf_dir)
    scored = logreg_score(feats, w, "doc_id")
    return scored.select(
        "doc_id",
        "y",
        F.round("prob", 6).alias("prob"),
        (F.col("prob") > 0.5).cast("int").alias("predicted"),
    )


@register(
    "winnowing_matches",
    oracle=f"""
    WITH {_winnow_fp_cte(8)},
    u AS (SELECT DISTINCT doc_id, fp FROM fps),
    dfreq AS (SELECT fp, count(*) AS dfc FROM u GROUP BY 1),
    live AS (
        SELECT u.doc_id, u.fp FROM u JOIN dfreq USING (fp) WHERE dfc <= 50
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
    FROM live a JOIN live b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    tags=("llm", "fingerprint", "dedup"),
)
def winnowing_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS matching: document pairs sharing >= 2 distinct 32-bit winnowed
    fingerprints, with fingerprints hotter than 50 documents stop-listed
    before pairing (boilerplate, not copying — and the df^2 pair guard at
    scale). See operators/textstats.winnow_match_pairs."""
    from ..operators.textstats import winnow_match_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_match_pairs(
        docs, "text", "doc_id", k=3, w=4, min_shared=2, max_df=50
    )


@register(
    "gram_novelty_by_doc",
    oracle=f"""
    WITH {_TOKS_CTE},
    sh AS (
        SELECT doc_id,
               CASE WHEN len(words) >= 5
                    THEN list_distinct([array_to_string(words[i:i+4], ' ')
                                        for i in range(1, len(words) - 3)])
                    ELSE [] END AS shingles
        FROM toks
    ),
    g AS (SELECT doc_id, unnest(shingles) AS gram FROM sh),
    first_owner AS (SELECT gram, min(doc_id) AS f FROM g GROUP BY 1)
    SELECT doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN f = doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS novel_grams,
           round(CAST(sum(CASE WHEN f = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS novelty_frac
    FROM g JOIN first_owner USING (gram)
    GROUP BY doc_id
    """,
    tags=("llm", "quality", "dedup"),
)
def gram_novelty_by_doc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional content novelty per document: the share of its distinct
    5-grams first contributed BY it in ingest (id) order — the marginal-
    value curve of a crawl. Inverted-index aggregate, no pair expansion."""
    from ..operators.quality import gram_novelty_by_doc

    docs = load_table(spark, sf_dir, "documents")
    return gram_novelty_by_doc(docs, "text", "doc_id", n=5)


# --- round 6: Gopher rule flags / filter funnel / distinct-n diversity -----

# The Gopher paper's stopword list extended with 'a': this synthetic
# corpus's vocabulary contains only 'the' and 'a' from English
# function-word space, so the paper's exact >=2-distinct rule would be
# vacuously false on every document. Extending the LIST (not the rule)
# keeps the semantics and makes the flag informative — the same
# corpus-adaptation stance as the span-dedup segmenter. The operator's
# default remains the unmodified paper list.
_GOPHER_SW = ("the", "be", "to", "of", "and", "that", "have", "with", "a")

_GOPHER_FLAGS_SQL = r"""
gtoks AS (
    SELECT doc_id, text,
           list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS words
    FROM documents WHERE text IS NOT NULL
),
gflags AS (
    SELECT doc_id,
           len(words) AS n_words,
           round(list_sum(list_transform(words, t -> length(t)))
                 / len(words), 6) AS avg_word_len,
           round(len(regexp_extract_all(text, '#|\.\.\.'))
                 / len(words), 6) AS symbol_ratio,
           len(list_intersect(list_distinct(words),
               ['the','be','to','of','and','that','have','with','a']))
               AS n_stopwords_present,
           (len(words) BETWEEN 50 AND 100000) AS pass_word_count,
           ((list_sum(list_transform(words, t -> length(t))) / len(words))
              >= 3.0
            AND (list_sum(list_transform(words, t -> length(t))) / len(words))
              <= 10.0) AS pass_avg_word_len,
           ((len(regexp_extract_all(text, '#|\.\.\.')) / len(words)) < 0.1)
               AS pass_symbol_ratio,
           (len(list_intersect(list_distinct(words),
               ['the','be','to','of','and','that','have','with','a'])) >= 2)
               AS pass_stopwords
    FROM gtoks WHERE len(words) > 0
)"""


@register(
    "gopher_quality_flags",
    oracle=f"""
    WITH {_GOPHER_FLAGS_SQL}
    SELECT doc_id, n_words, avg_word_len, symbol_ratio,
           n_stopwords_present, pass_word_count, pass_avg_word_len,
           pass_symbol_ratio, pass_stopwords,
           (pass_word_count AND pass_avg_word_len AND pass_symbol_ratio
            AND pass_stopwords) AS keep
    FROM gflags
    """,
    tags=("llm", "quality"),
)
def gopher_quality_flags_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher quality-rule flags (Rae et al. 2021 §A1.1:
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    distinct-stopword presence) + the conjunctive keep verdict. One
    narrow no-shuffle projection. See operators/quality.gopher_quality_flags."""
    from ..operators.quality import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs, "text", "doc_id", stopwords=_GOPHER_SW)


@register(
    "quality_filter_kappa",
    oracle=f"""
    WITH {_TOKS_CTE},
    {_BIGRAM_SCORED_CTE},
    ppl AS (
        SELECT doc_id, round(exp(-sum(logp * k) / sum(k)), 6) AS ppl
        FROM scored GROUP BY doc_id
    ),
    med AS (SELECT median(ppl) AS m FROM ppl),
    {{gopher}},
    joined AS (
        SELECT g.doc_id,
               (g.pass_word_count AND g.pass_avg_word_len
                AND g.pass_symbol_ratio AND g.pass_stopwords) AS a,
               (p.ppl <= med.m) AS b
        FROM gflags g JOIN ppl p USING (doc_id), med
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n11,
               CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00,
               CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
               CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS nb
        FROM joined
    )
    SELECT n AS n_docs,
           round(na / CAST(n AS DOUBLE), 6) AS gopher_keep_rate,
           round(nb / CAST(n AS DOUBLE), 6) AS ppl_keep_rate,
           round((n11 + n00) / CAST(n AS DOUBLE), 6) AS observed_agreement,
           round((na * nb + (n - na) * (n - nb))
                 / (CAST(n AS DOUBLE) * n), 6) AS expected_agreement,
           round(((n11 + n00) / CAST(n AS DOUBLE)
                  - (na * nb + (n - na) * (n - nb))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0 - (na * nb + (n - na) * (n - nb))
                    / (CAST(n AS DOUBLE) * n)), 6) AS cohen_kappa
    FROM c
    """.format(gopher=_GOPHER_FLAGS_SQL.strip()),
    tags=("llm", "quality", "calibration"),
)
def quality_filter_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-filter agreement audit (r09): Cohen's kappa between the two
    quality-filter FAMILIES the engine ships — the rule-based Gopher
    conjunctive keep and the model-based bigram-perplexity filter (keep =
    perplexity <= corpus median of the ROUNDED per-doc values, so the
    threshold is engine-exact). Kappa near 0 means the model filter adds
    an independent signal (ensembling is worth its cost); kappa near 1
    means it re-derives the rules and one of the two passes can be
    dropped at 100 TB. Contingency cells are exact integers from one
    combinable aggregate over the doc_id-keyed join of two map-only
    frames; every rate is a single division of exact counts."""
    from ..functions.partitioning import spread as _spread
    from ..operators.quality import bigram_logprob, gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents")
    # r14 (VERDICT r13 ask #5): ONE spread + persist of the (id, text)
    # projection feeds BOTH scorer families — previously each scorer ran
    # its own full-text exchange off the scan (one per spread() site
    # inside the operators). Null-text docs are dropped up front: gopher's
    # n_words > 0 filter and bigram's isNotNull filter both discard them,
    # so the shared filter changes no results. Cache released by the
    # harness clearCache after the terminal action.
    base = _spread(
        docs.filter(F.col("text").isNotNull()).select("doc_id", "text"),
        "doc_id",
    ).persist()
    gop = gopher_quality_flags(
        base, "text", "doc_id", stopwords=_GOPHER_SW, assume_spread=True
    )
    ppl = bigram_logprob(base, "text", "doc_id", assume_spread=True).select(
        "doc_id", "perplexity"
    )
    med = ppl.agg(F.median("perplexity").alias("m"))
    joined = (
        gop.select("doc_id", F.col("keep").alias("a"))
        .join(ppl, "doc_id")
        .crossJoin(F.broadcast(med))
        .select("doc_id", "a", (F.col("perplexity") <= F.col("m")).alias("b"))
    )
    c = joined.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
        F.sum(F.when(F.col("a"), 1).otherwise(0)).cast("bigint").alias("na"),
        F.sum(F.when(F.col("b"), 1).otherwise(0)).cast("bigint").alias("nb"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / nd
    pe = (
        F.col("na") * F.col("nb")
        + (F.col("n") - F.col("na")) * (F.col("n") - F.col("nb"))
    ) / (nd * F.col("n"))
    return c.select(
        F.col("n").alias("n_docs"),
        F.round(F.col("na") / nd, 6).alias("gopher_keep_rate"),
        F.round(F.col("nb") / nd, 6).alias("ppl_keep_rate"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("cohen_kappa"),
    )



@register(
    "filter_funnel_attrition",
    oracle=f"""
    WITH {_GOPHER_FLAGS_SQL},
    ffirsts AS (
        SELECT md5(text) AS dg, min(doc_id) AS keep_id
        FROM documents WHERE text IS NOT NULL GROUP BY 1
    ),
    staged AS (
        SELECT g.*, (d.doc_id = fi.keep_id) AS pass_exact_dedup
        FROM gflags g
        JOIN documents d USING (doc_id)
        JOIN ffirsts fi ON md5(d.text) = fi.dg
    )
    SELECT 0 AS stage_no, 'total' AS stage, count(*) AS survivors FROM staged
    UNION ALL
    SELECT 1, 'pass_exact_dedup',
           CAST(sum(CASE WHEN pass_exact_dedup THEN 1 ELSE 0 END) AS BIGINT)
    FROM staged
    UNION ALL
    SELECT 2, 'pass_word_count',
           CAST(sum(CASE WHEN pass_exact_dedup AND pass_word_count
               THEN 1 ELSE 0 END) AS BIGINT) FROM staged
    UNION ALL
    SELECT 3, 'pass_avg_word_len',
           CAST(sum(CASE WHEN pass_exact_dedup AND pass_word_count
                    AND pass_avg_word_len THEN 1 ELSE 0 END) AS BIGINT)
    FROM staged
    UNION ALL
    SELECT 4, 'pass_symbol_ratio',
           CAST(sum(CASE WHEN pass_exact_dedup AND pass_word_count
                    AND pass_avg_word_len AND pass_symbol_ratio
               THEN 1 ELSE 0 END) AS BIGINT) FROM staged
    UNION ALL
    SELECT 5, 'pass_stopwords',
           CAST(sum(CASE WHEN pass_exact_dedup AND pass_word_count
                    AND pass_avg_word_len AND pass_symbol_ratio
                    AND pass_stopwords THEN 1 ELSE 0 END) AS BIGINT)
    FROM staged
    """,
    tags=("llm", "quality", "dedup"),
)
def filter_funnel_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential curation-funnel attrition (the RefinedWeb-style
    accounting table): survivors after exact dedup, then each Gopher rule
    applied cumulatively. One scan computes every flag; one aggregate +
    stack unpivot emits (stage_no, stage, survivors). See
    operators/quality.filter_funnel."""
    from ..operators.quality import filter_funnel

    docs = load_table(spark, sf_dir, "documents")
    return filter_funnel(docs, "text", "doc_id", stopwords=_GOPHER_SW)


@register(
    "distinct_ngram_diversity",
    oracle=r"""
    WITH dtoks AS (
        SELECT source,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS words
        FROM documents WHERE text IS NOT NULL
    ),
    grams AS (
        SELECT source,
               unnest([array_to_string(words[i:i+1], ' ')
                       for i in range(1, len(words))]) AS gram
        FROM dtoks WHERE len(words) >= 2
    )
    SELECT source,
           count(*) AS total_ngrams,
           count(DISTINCT gram) AS distinct_ngrams,
           round(count(DISTINCT gram) / count(*), 6) AS distinct_ratio
    FROM grams GROUP BY source
    """,
    tags=("llm", "quality"),
)
def distinct_ngram_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-2 diversity (Li et al. 2016): distinct/total
    word-bigram ratio — the mode-collapse / templated-content signal. One
    explode + one source-keyed aggregate (map-side combined). See
    operators/quality.distinct_ngram_diversity."""
    from ..operators.quality import distinct_ngram_diversity

    docs = load_table(spark, sf_dir, "documents")
    return distinct_ngram_diversity(docs, "text", "source", n=2)


@register(
    "quality_logreg_auc",
    oracle=f"""
    WITH {_logreg_cte()},
    probs AS (
        SELECT y, round(0.5 * (1.0 + z / (1.0 + abs(z))), 6) AS prob
        FROM scored
    ),
    pagg AS (
        SELECT prob, count(*) AS g, sum(y) AS p FROM probs GROUP BY prob
    ),
    prun AS (
        SELECT g, p, sum(g) OVER (ORDER BY prob) AS cum FROM pagg
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(g) - sum(p) AS BIGINT) AS n_neg,
           round((sum(p * (2 * (cum - g) + g + 1)) - sum(p) * (sum(p) + 1))
                 / (2.0 * sum(p) * (sum(g) - sum(p))), 6) AS auc
    FROM prun
    """,
    tags=("llm", "quality", "classifier"),
)
def quality_logreg_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the trained quality classifier (rank-sum identity
    with integer midranks — bit-identical cross-engine; the model-quality
    row next to quality_logreg_weights/_scores). Distinct-score aggregate
    + range-partitioned rank prefix — no global window, no per-pair
    expansion. See operators/classifier.auc_exact."""
    from ..operators.classifier import auc_exact, logreg_score

    feats = _lr_feats(spark, sf_dir)
    w = _lr_weights(spark, sf_dir)
    scored = logreg_score(feats, w, "doc_id").select(
        "y", F.round("prob", 6).alias("prob")
    )
    return auc_exact(scored, "prob", "y")


@register(
    "vocab_growth_curve",
    oracle=r"""
    WITH vtoks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS words
        FROM documents WHERE text IS NOT NULL
    ),
    vt AS (SELECT doc_id, unnest(list_distinct(words)) AS tok FROM vtoks),
    own AS (SELECT tok, min(doc_id) AS fdoc FROM vt GROUP BY tok),
    intro AS (SELECT fdoc AS doc_id, count(*) AS introduced FROM own GROUP BY 1),
    alld AS (SELECT doc_id FROM vtoks WHERE len(words) > 0)
    SELECT a.doc_id,
           CAST(coalesce(i.introduced, 0) AS BIGINT) AS introduced,
           CAST(sum(coalesce(i.introduced, 0))
                OVER (ORDER BY a.doc_id) AS BIGINT) AS cum_vocab
    FROM alld a LEFT JOIN intro i USING (doc_id)
    """,
    tags=("llm", "quality", "profiling"),
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: per document (in ingest order), how
    many NEW distinct tokens it introduces and the cumulative vocabulary
    size after it — the is-my-crawl-saturating curve. First-owner
    inverted aggregate (token -> min doc) + range-partitioned running
    sum (no global window; at 100 TB emit every k-th doc instead of all).
    """
    from ..operators.windows import range_partitioned_running_sum

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    )
    intro = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("introduced"))
    )
    base = (
        docs.filter(F.size(tokens(F.col("text"))) > 0)
        .select("doc_id")
        .join(intro, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("introduced", F.lit(0)).cast("long").alias("introduced"),
        )
    )
    run = range_partitioned_running_sum(
        base, [F.asc("doc_id")], ["introduced"], prefix="_r_"
    )
    return run.select(
        "doc_id", "introduced", F.col("_r_introduced").alias("cum_vocab")
    )


@register(
    "eval_containment_audit",
    oracle=r"""
    WITH ctoks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS words
        FROM documents WHERE text IS NOT NULL
    ),
    cg AS (
        SELECT doc_id, source,
               CASE WHEN len(words) >= 5
                    THEN list_distinct([array_to_string(words[i:i+4], ' ')
                                        for i in range(1, len(words) - 3)])
                    ELSE [] END AS shingles
        FROM ctoks
    ),
    ev AS (
        SELECT doc_id, len(shingles) AS n_grams, unnest(shingles) AS gram
        FROM cg WHERE source = 'src0' AND len(shingles) > 0
    ),
    tr AS (
        SELECT DISTINCT gram FROM (
            SELECT unnest(shingles) AS gram FROM cg WHERE source <> 'src0'
        )
    )
    SELECT e.doc_id,
           any_value(e.n_grams) AS n_grams,
           count(t.gram) AS shared_grams,
           round(count(t.gram) / any_value(e.n_grams), 6) AS containment,
           (count(t.gram) / any_value(e.n_grams)) >= 0.8 AS contaminated
    FROM ev e LEFT JOIN tr t USING (gram)
    GROUP BY e.doc_id
    """,
    tags=("llm", "audit", "dedup"),
)
def eval_containment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-based decontamination (the GPT-3/PaLM-style audit,
    ASYMMETRIC by design): for every src0 (eval-set stand-in) document,
    the fraction of its distinct 5-grams that appear ANYWHERE in the rest
    of the corpus — containment |A∩train|/|A|, which catches an eval doc
    fully embedded in a larger train doc that Jaccard would miss. The
    train side collapses to a DISTINCT gram set before the join (no
    per-train-doc pair expansion); 5-grams are near-unique so the
    inverted join output stays ~overlap-sized."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # r13: the shingle pass feeds two consumers — spread + persist so the
    # interpreted 5-gram fold runs once, in parallel (same fix as
    # curation_verdicts; functions/partitioning.spread).
    # Cache lifetime: backs the returned lazy frame; harness clearCache.
    from ..functions.partitioning import spread as _spread

    sh = _spread(
        docs.select("doc_id", "source", "text"), "doc_id"
    ).select(
        "doc_id",
        "source",
        F.array_distinct(word_ngrams(F.col("text"), 5)).alias("sh"),
    ).persist()
    ev = (
        sh.filter((F.col("source") == "src0") & (F.size("sh") > 0))
        .select("doc_id", F.size("sh").alias("n_grams"),
                F.explode("sh").alias("gram"))
    )
    tr = (
        sh.filter(F.col("source") != "src0")
        .select(F.explode("sh").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        ev.join(tr, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("shared_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "shared_grams",
            F.round(
                F.col("shared_grams") / F.col("n_grams"), 6
            ).alias("containment"),
            (
                (F.col("shared_grams") / F.col("n_grams")) >= 0.8
            ).alias("contaminated"),
        )
    )


@register(
    "source_quality_scorecard",
    oracle=f"""
    WITH {_GOPHER_FLAGS_SQL}
    SELECT d.source,
           count(*) AS n_docs,
           round(sum(CASE WHEN g.pass_word_count AND g.pass_avg_word_len
                          AND g.pass_symbol_ratio AND g.pass_stopwords
                     THEN 1 ELSE 0 END) / count(*), 6) AS gopher_keep_rate,
           round(sum(g.n_words) / count(*), 6) AS avg_words,
           round(1.0 - count(DISTINCT md5(d.text)) / count(*), 6)
               AS exact_dup_rate
    FROM gflags g JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
    tags=("llm", "quality", "profiling"),
)
def source_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard: Gopher keep rate, mean length, and
    exact-duplicate rate — the one table a data-mixture owner reads
    before reweighting sources. Composes gopher_quality_flags with a
    digest-distinct count; one source-keyed aggregate, everything
    map-side combinable except the distinct (hash-partial)."""
    from ..operators.quality import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    flags = gopher_quality_flags(docs, "text", "doc_id", stopwords=_GOPHER_SW)
    joined = flags.join(
        docs.select("doc_id", "source", F.md5("text").alias("_dg")), "doc_id"
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("_k"),
            F.sum("n_words").alias("_w"),
            F.countDistinct("_dg").alias("_d"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.col("_k") / F.col("n_docs"), 6).alias("gopher_keep_rate"),
            F.round(F.col("_w") / F.col("n_docs"), 6).alias("avg_words"),
            F.round(1.0 - F.col("_d") / F.col("n_docs"), 6).alias(
                "exact_dup_rate"
            ),
        )
    )


@register(
    "entropy_profile",
    oracle=r"""
    WITH etoks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS words
        FROM documents WHERE text IS NOT NULL
    ),
    ecnt AS (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(words) AS tok FROM etoks)
        GROUP BY doc_id, tok
    ),
    eagg AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               sum(c * CAST(round(ln(c) * 1000000000) AS BIGINT)) AS sq
        FROM ecnt GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(ln(n_tokens) - sq / (n_tokens * 1000000000.0), 6)
               AS token_entropy,
           round(CASE WHEN n_distinct > 1
                      THEN (ln(n_tokens) - sq / (n_tokens * 1000000000.0))
                           / ln(n_distinct)
                      ELSE 0.0 END, 6) AS norm_entropy
    FROM eagg
    """,
    tags=("llm", "quality", "profiling"),
)
def entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token (Shannon) entropy + entropy normalized by
    ln(distinct tokens) — the low-entropy junk / gibberish signal
    complementing the repetition fractions. Per-ln values are quantized
    to 1e-9 INTEGERS before summation (the repo's order-free float-sum
    rule: a plain double sum is partition-order-dependent and breaks
    cross-engine hashing); entropy via H = ln(n) - (1/n)·Σ c·ln(c).
    One (doc, token) count + one doc aggregate, both map-side combinable.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    cnt = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    qln = F.round(F.log("c") * 1_000_000_000).cast("long")
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") * qln).alias("sq"),
    )
    h = F.log("n_tokens") - F.col("sq") / (F.col("n_tokens") * 1e9)
    return agg.select(
        "doc_id",
        "n_tokens",
        F.round(h, 6).alias("token_entropy"),
        F.round(
            F.when(F.col("n_distinct") > 1, h / F.log("n_distinct"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("norm_entropy"),
    )


@register(
    "quality_logreg_roc",
    oracle=f"""
    WITH {_logreg_cte()},
    probs AS (
        SELECT y, round(0.5 * (1.0 + z / (1.0 + abs(z))), 6) AS prob
        FROM scored
    ),
    pagg AS (
        SELECT prob, count(*) AS g, sum(y) AS p FROM probs GROUP BY prob
    ),
    tot AS (
        SELECT sum(p) AS pos, sum(g) - sum(p) AS neg FROM pagg
    ),
    prun AS (
        SELECT prob,
               sum(p) OVER (ORDER BY prob DESC) AS cpos,
               sum(g - p) OVER (ORDER BY prob DESC) AS cneg
        FROM pagg
    )
    SELECT prob AS threshold,
           CAST(cpos AS BIGINT) AS tp,
           CAST(cneg AS BIGINT) AS fp,
           round(cpos / pos, 6) AS tpr,
           round(cneg / neg, 6) AS fpr
    FROM prun, tot
    """,
    tags=("llm", "quality", "classifier"),
)
def quality_logreg_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ROC curve of the trained quality classifier: one point per
    distinct score (threshold = score, classified positive when
    prob >= threshold), with exact integer TP/FP via the same
    range-partitioned running sum the AUC uses (descending order) — at
    100 TB the row count is bounded by distinct rounded scores, not
    corpus size, and no global window is planned."""
    from ..operators.classifier import logreg_score
    from ..operators.windows import range_partitioned_running_sum

    feats = _lr_feats(spark, sf_dir)
    w = _lr_weights(spark, sf_dir)
    scored = logreg_score(feats, w, "doc_id").select(
        "y", F.round("prob", 6).alias("prob")
    )
    pagg = scored.groupBy("prob").agg(
        F.count("*").alias("_g"), F.sum("y").alias("_p")
    ).withColumn("_n", F.col("_g") - F.col("_p"))
    run = range_partitioned_running_sum(
        pagg, [F.desc("prob")], ["_p", "_n"], prefix="_c"
    )
    tot = pagg.agg(
        F.sum("_p").alias("_pos"), F.sum("_n").alias("_neg")
    )
    return run.crossJoin(F.broadcast(tot)).select(
        F.col("prob").alias("threshold"),
        F.col("_c_p").alias("tp"),
        F.col("_c_n").alias("fp"),
        F.round(F.col("_c_p") / F.col("_pos"), 6).alias("tpr"),
        F.round(F.col("_c_n") / F.col("_neg"), 6).alias("fpr"),
    )


@register(
    "quality_logreg_calibration",
    oracle=f"""
    WITH {_logreg_cte()},
    probs AS (
        SELECT y, round(0.5 * (1.0 + z / (1.0 + abs(z))), 6) AS prob
        FROM scored
    ),
    binned AS (
        SELECT least(CAST(floor(prob * 10) AS INTEGER), 9) AS bin, y, prob
        FROM probs
    )
    SELECT bin,
           count(*) AS n_docs,
           round(sum(prob) / count(*), 6) AS mean_prob,
           round(sum(y) / count(*), 6) AS pos_rate
    FROM binned GROUP BY bin
    """,
    tags=("llm", "quality", "classifier"),
)
def quality_logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the trained classifier: 10 equal-width
    probability bins, mean predicted probability vs empirical positive
    rate per bin — the is-the-score-a-probability check run before using
    scores as sampling weights. mean_prob sums 1e-6-rounded probs (exact
    rationals of quantized weights -> order-free); one tiny aggregate."""
    from ..operators.classifier import logreg_score

    feats = _lr_feats(spark, sf_dir)
    w = _lr_weights(spark, sf_dir)
    scored = logreg_score(feats, w, "doc_id").select(
        "y", F.round("prob", 6).alias("prob")
    )
    binned = scored.select(
        F.least(F.floor(F.col("prob") * 10).cast("int"), F.lit(9)).alias("bin"),
        "y",
        "prob",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("prob") / F.count("*"), 6).alias("mean_prob"),
        F.round(F.sum("y") / F.count("*"), 6).alias("pos_rate"),
    )


@register(
    "curation_verdicts",
    oracle=f"""
    WITH {_GOPHER_FLAGS_SQL},
    cstoks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '')
                   AS words
        FROM documents WHERE text IS NOT NULL
    ),
    cspans AS (
        SELECT doc_id,
               unnest([{{'span_no': i,
                        'span_text': array_to_string(
                            words[i*10+1 : i*10+10], ' ')}}
                       for i in range(0, ((len(words)-1)//10)+1)],
                      recursive := true)
        FROM cstoks WHERE len(words) > 0
    ),
    chash AS (SELECT doc_id, span_no, md5(span_text) AS h FROM cspans),
    cfirst AS (
        SELECT h, min({{'d': doc_id, 's': span_no}}) AS f
        FROM chash GROUP BY h
    ),
    spanstats AS (
        SELECT s.doc_id,
               count(*) AS n_spans,
               sum(CASE WHEN NOT (s.doc_id = fi.f.d AND s.span_no = fi.f.s)
                        THEN 1 ELSE 0 END) AS dup_spans
        FROM chash s JOIN cfirst fi ON s.h = fi.h
        GROUP BY 1
    ),
    cdg AS (
        SELECT doc_id, md5(text) AS dg
        FROM documents WHERE text IS NOT NULL
    ),
    cdgf AS (SELECT dg, min(doc_id) AS keep_id FROM cdg GROUP BY dg),
    cg5 AS (
        SELECT doc_id, source,
               CASE WHEN len(words) >= 5
                    THEN list_distinct([array_to_string(words[i:i+4], ' ')
                                        for i in range(1, len(words) - 3)])
                    ELSE [] END AS shingles
        FROM (SELECT c.doc_id, d.source, c.words
              FROM cstoks c JOIN documents d USING (doc_id))
    ),
    cev AS (
        SELECT doc_id, len(shingles) AS n_grams, unnest(shingles) AS gram
        FROM cg5 WHERE source = 'src0' AND len(shingles) > 0
    ),
    ctr AS (
        SELECT DISTINCT gram FROM (
            SELECT unnest(shingles) AS gram FROM cg5 WHERE source <> 'src0'
        )
    ),
    ccont AS (
        SELECT e.doc_id,
               (count(t.gram) >= 0.8 * any_value(e.n_grams)) AS contaminated
        FROM cev e LEFT JOIN ctr t USING (gram)
        GROUP BY e.doc_id
    )
    SELECT g.doc_id,
           (d.doc_id = f.keep_id) AS pass_exact_dedup,
           (g.pass_word_count AND g.pass_avg_word_len
            AND g.pass_symbol_ratio AND g.pass_stopwords) AS pass_gopher,
           round(sp.dup_spans / sp.n_spans, 6) AS span_dup_frac,
           (sp.dup_spans * 2 <= sp.n_spans) AS pass_span,
           coalesce(c.contaminated, FALSE) AS contaminated,
           ((d.doc_id = f.keep_id)
            AND (g.pass_word_count AND g.pass_avg_word_len
                 AND g.pass_symbol_ratio AND g.pass_stopwords)
            AND (sp.dup_spans * 2 <= sp.n_spans)
            AND NOT coalesce(c.contaminated, FALSE)) AS keep
    FROM gflags g
    JOIN cdg d USING (doc_id)
    JOIN cdgf f ON d.dg = f.dg
    JOIN spanstats sp USING (doc_id)
    LEFT JOIN ccont c USING (doc_id)
    """,
    tags=("llm", "quality", "dedup", "pipeline"),
)
def curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE composed curation pipeline as one declarative plan: per
    document, exact-dedup first-occurrence, the Gopher rule conjunction,
    the corpus span-duplication fraction (pass when <= 50%, compared in
    integers), eval-set contamination (src0 docs with >= 80% 5-gram
    containment in the rest of the corpus), and the final keep verdict.
    Every stage is an already-oracled round-6 operator; composing them
    costs three doc_id-keyed joins — Catalyst pipelines the whole thing
    without materializing any intermediate."""
    from ..operators.dedup import span_dedup_stats as _span_op
    from ..operators.quality import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    flags = gopher_quality_flags(docs, "text", "doc_id", stopwords=_GOPHER_SW)
    digest = docs.select("doc_id", F.md5("text").alias("_dg"))
    firsts = digest.groupBy("_dg").agg(F.min("doc_id").alias("_keep_id"))
    exact = digest.join(firsts, "_dg").select(
        "doc_id", (F.col("doc_id") == F.col("_keep_id")).alias("pass_exact_dedup")
    )
    spans = _span_op(docs, "text", "doc_id", span_words=10).select(
        "doc_id",
        F.round(F.col("dup_spans") / F.col("n_spans"), 6).alias("span_dup_frac"),
        (F.col("dup_spans") * 2 <= F.col("n_spans")).alias("pass_span"),
    )
    # r13: the 5-gram shingle pass feeds TWO consumers (eval side +
    # training side) — spread it off the single-partition scan and persist
    # so the interpreted n-gram fold runs once, in parallel (guide §1.2;
    # functions/partitioning.spread). Cache released by harness clearCache.
    from ..functions.partitioning import spread as _spread

    sh = _spread(
        docs.select("doc_id", "source", "text"), "doc_id"
    ).select(
        "doc_id", "source",
        F.array_distinct(word_ngrams(F.col("text"), 5)).alias("_sh"),
    ).persist()
    ev = sh.filter((F.col("source") == "src0") & (F.size("_sh") > 0)).select(
        "doc_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("gram")
    )
    tr = (
        sh.filter(F.col("source") != "src0")
        .select(F.explode("_sh").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    cont = (
        ev.join(tr, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.first("_n").alias("_n"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("_shared"),
        )
        .select(
            "doc_id",
            (F.col("_shared") >= 0.8 * F.col("_n")).alias("contaminated"),
        )
    )
    pass_gopher = F.col("keep").alias("pass_gopher")
    return (
        flags.select("doc_id", pass_gopher)
        .join(exact, "doc_id")
        .join(spans, "doc_id")
        .join(cont, "doc_id", "left")
        .select(
            "doc_id",
            "pass_exact_dedup",
            "pass_gopher",
            "span_dup_frac",
            "pass_span",
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
            (
                F.col("pass_exact_dedup")
                & F.col("pass_gopher")
                & F.col("pass_span")
                & ~F.coalesce("contaminated", F.lit(False))
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction audit (operators/pii.py). The synthetic corpus
# contains no organic PII, so both queries scan a DETERMINISTIC AUGMENTED
# view — doc_id-derived emails/phones/IPs appended to a fixed subset of
# documents — which the oracle rebuilds from the same arithmetic. The
# operator itself is generic (pattern dict in, counts/redaction out).
# ---------------------------------------------------------------------------

from ..operators.pii import PII_PATTERNS, pii_redact, pii_scan  # noqa: E402

_P_EMAIL = PII_PATTERNS["email"]
_P_PHONE = PII_PATTERNS["phone"]
_P_IPV4 = PII_PATTERNS["ipv4"]

# DuckDB twin of the injection below (same doc_id arithmetic, bit-equal).
_PII_AUG_SQL = """
aug AS (
    SELECT doc_id, source,
           concat(text,
               CASE WHEN doc_id % 7 = 0
                    THEN concat(' contact u', CAST(doc_id AS VARCHAR),
                                '@example.com')
                    ELSE '' END,
               CASE WHEN doc_id % 11 = 0
                    THEN concat(' call 555-',
                                lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
                                '-',
                                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                    ELSE '' END,
               CASE WHEN doc_id % 13 = 0
                    THEN concat(' from 10.0.',
                                CAST(doc_id % 256 AS VARCHAR), '.',
                                CAST((doc_id * 7) % 256 AS VARCHAR))
                    ELSE '' END
           ) AS text
    FROM documents WHERE text IS NOT NULL
)"""


def _pii_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic doc_id-derived PII appended to every
    7th/11th/13th document (emails/phones/IPs respectively)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    did = F.col("doc_id")
    txt = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact u"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", "source", txt.alias("text"))


@register(
    "pii_audit",
    oracle=f"""
    WITH {_PII_AUG_SQL},
    scan AS (
        SELECT source,
               len(regexp_extract_all(text, '{_P_EMAIL}')) AS e,
               len(regexp_extract_all(text, '{_P_PHONE}')) AS p,
               len(regexp_extract_all(text, '{_P_IPV4}')) AS i
        FROM aug
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_pii,
           CAST(sum(e) AS BIGINT) AS emails,
           CAST(sum(p) AS BIGINT) AS phones,
           CAST(sum(i) AS BIGINT) AS ipv4s,
           round(CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS pii_rate
    FROM scan GROUP BY source ORDER BY source
    """,
    tags=("llm", "quality", "pii"),
)
def pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure audit: match counts per category and the
    fraction of documents carrying any PII — the table a curation owner
    reads before deciding redact-vs-drop per source. Pure projection +
    one source-keyed aggregate; no shuffle before the group-by."""
    aug = _pii_augmented(spark, sf_dir)
    scan = pii_scan(aug, "text")
    return (
        scan.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("pii_total_n") > 0).cast("long")).alias(
                "docs_with_pii"
            ),
            F.sum("pii_email_n").alias("emails"),
            F.sum("pii_phone_n").alias("phones"),
            F.sum("pii_ipv4_n").alias("ipv4s"),
            F.round(
                F.sum((F.col("pii_total_n") > 0).cast("long"))
                / F.count("*"),
                6,
            ).alias("pii_rate"),
        )
        .orderBy("source")
    )


@register(
    "pii_redaction_audit",
    oracle=f"""
    WITH {_PII_AUG_SQL},
    red AS (
        SELECT source, text,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{_P_EMAIL}', '<EMAIL>', 'g'),
                       '{_P_PHONE}', '<PHONE>', 'g'),
                   '{_P_IPV4}', '<IPV4>', 'g') AS redacted
        FROM aug
    )
    SELECT source,
           CAST(sum(CASE WHEN text <> redacted THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_redacted,
           CAST(sum(len(text) - len(redacted)) AS BIGINT) AS chars_delta,
           CAST(sum(len(regexp_extract_all(redacted, '{_P_EMAIL}'))
               + len(regexp_extract_all(redacted, '{_P_PHONE}'))
               + len(regexp_extract_all(redacted, '{_P_IPV4}'))) AS BIGINT)
               AS residual_matches
    FROM red GROUP BY source ORDER BY source
    """,
    tags=("llm", "quality", "pii"),
)
def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction round-trip proof: per source, how many documents changed,
    the net character delta, and — the invariant that matters — ZERO
    residual matches after one redaction pass. Both legs are projections
    over the same scan; Catalyst collapses them into one stage."""
    aug = _pii_augmented(spark, sf_dir)
    red = pii_redact(aug, "text", out_col="redacted")
    rescan = red.select(
        "source",
        "text",
        "redacted",
        sum(
            [
                F.regexp_count(F.col("redacted"), F.lit(p))
                for p in PII_PATTERNS.values()
            ],
            F.lit(0),
        ).alias("_residual"),
    )
    return (
        rescan.groupBy("source")
        .agg(
            F.sum(
                (F.col("text") != F.col("redacted")).cast("long")
            ).alias("docs_redacted"),
            F.sum(
                F.length("text") - F.length("redacted")
            ).alias("chars_delta"),
            F.sum("_residual").alias("residual_matches"),
        )
        .orderBy("source")
    )


@register(
    "curriculum_order",
    oracle=r"""
    WITH nw AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(text, '\s+'),
                               t -> t <> '')) AS n_words
        FROM documents WHERE text IS NOT NULL
    ),
    si AS (
        SELECT source,
               row_number() OVER (ORDER BY source) - 1 AS sidx
        FROM (SELECT DISTINCT source FROM nw)
    ),
    ns AS (SELECT count(*) AS n_sources FROM si),
    rk AS (
        SELECT doc_id, source, n_words,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_words ASC, doc_id ASC
               ) AS r
        FROM nw
    )
    SELECT CAST(r - 1 AS BIGINT) * n_sources + sidx AS position,
           doc_id, source, n_words
    FROM rk JOIN si USING (source) CROSS JOIN ns
    ORDER BY position LIMIT 100
    """,
    tags=("llm", "sampling", "quality"),
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: within each source, documents ranked
    easy-to-hard (short-to-long, doc_id tie-break), then the per-source
    streams interleaved round-robin — position = (rank-1)*n_sources +
    source_index. The standard curriculum + source-mixing manifest, as
    pure rank arithmetic: the only window is per-source (partitioned);
    the source-index window runs over the DISTINCT source frame (dashboard
    cardinality, ~10 rows — not a corpus-sized global sort). First 100
    positions returned."""
    from pyspark.sql import Window

    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    nw = docs.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n_words")
    )
    si = (
        nw.select("source")
        .distinct()
        .withColumn(
            "sidx",
            F.row_number().over(Window.orderBy("source")) - 1,
        )
    )
    ns = si.agg(F.count("*").alias("n_sources"))
    w = Window.partitionBy("source").orderBy(
        F.asc("n_words"), F.asc("doc_id")
    )
    rk = nw.withColumn("r", F.row_number().over(w))
    return (
        rk.join(F.broadcast(si), "source")
        .join(F.broadcast(ns))
        .select(
            (
                (F.col("r") - 1).cast("bigint") * F.col("n_sources")
                + F.col("sidx")
            ).alias("position"),
            "doc_id",
            "source",
            "n_words",
        )
        .orderBy("position")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (operators/classifier.py
# nb_train_quantized / nb_predict): the ONE-PASS trained classifier next
# to the iterative logreg — closed-form from counts, no driver loop, and
# every log-probability quantized to BIGINT at model-build time so
# scoring sums integers (order-free, engine-exact).
# ---------------------------------------------------------------------------

_NB_SCALE = 1_000_000

_NB_CTE = rf"""
    nbdocs AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                   AS words
        FROM documents WHERE text IS NOT NULL
    ),
    nbtok AS (SELECT doc_id, lang, unnest(words) AS token FROM nbdocs),
    nbtl AS (SELECT token, lang, count(*) AS n_tl FROM nbtok GROUP BY 1, 2),
    nbcl AS (SELECT lang, count(*) AS n_l FROM nbtok GROUP BY 1),
    nbvoc AS (SELECT count(DISTINCT token) AS v FROM nbtok),
    nbmodel AS (
        SELECT g.token, g.lang,
               CAST(round(ln((coalesce(t.n_tl, 0) + 1)
                             / CAST(g.n_l + nbvoc.v AS DOUBLE))
                          * {_NB_SCALE}) AS BIGINT) AS w_q
        FROM (SELECT tok.token, c.lang, c.n_l
              FROM (SELECT DISTINCT token FROM nbtok) tok, nbcl c) g
        LEFT JOIN nbtl t ON t.token = g.token AND t.lang = g.lang, nbvoc
    ),
    nbpri AS (
        SELECT lang,
               CAST(round(ln(count(*) /
                             CAST((SELECT count(*) FROM nbdocs) AS DOUBLE))
                          * {_NB_SCALE}) AS BIGINT) AS prior_q
        FROM nbdocs GROUP BY 1
    )
"""


@register(
    "nb_lang_confusion",
    oracle=f"""
    WITH {_NB_CTE},
    nbdt AS (
        SELECT doc_id, token, count(*) AS k FROM nbtok GROUP BY 1, 2
    ),
    nbsc AS (
        SELECT d.doc_id, m.lang, sum(d.k * m.w_q) AS lik_q
        FROM nbdt d JOIN nbmodel m USING (token) GROUP BY 1, 2
    ),
    nbpred AS (
        SELECT doc_id, lang AS predicted, lik_q + prior_q AS score_q,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY lik_q + prior_q DESC, lang ASC) AS rn
        FROM nbsc JOIN nbpri USING (lang)
    )
    SELECT d.lang AS actual, p.predicted, count(*) AS n_docs
    FROM nbpred p JOIN nbdocs d USING (doc_id)
    WHERE p.rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("llm", "quality", "classifier"),
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the one-pass NB language model on the corpus's own (text,
    lang) pairs and cross its argmax predictions with the actual labels
    — the self-consistency confusion matrix (the trained twin of the
    heuristic language_id tier). Integer scores make the argmax exact
    and partition-invariant; ties break by label ascending."""
    from ..operators.classifier import nb_predict, nb_train_quantized

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    model, priors = nb_train_quantized(docs, "text", "doc_id", "lang")
    pred = nb_predict(docs, model, priors, "text", "doc_id")
    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(
            F.col("lang").alias("actual"),
            F.col("predicted"),
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


@register(
    "nb_lang_top_features",
    oracle=f"""
    WITH {_NB_CTE}
    SELECT lang, token, w_q, CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT lang, token, w_q,
               row_number() OVER (
                   PARTITION BY lang ORDER BY w_q DESC, token ASC) AS rn
        FROM nbmodel
    ) WHERE rn <= 3 ORDER BY lang, rn
    """,
    tags=("llm", "quality", "classifier"),
)
def nb_lang_top_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3 highest-likelihood tokens per language from the quantized NB
    model — model inspection as a query (what a reviewer reads before
    trusting the classifier). The per-label window is bounded by vocab
    size within each of a handful of label partitions; at extreme vocab
    sizes swap in a two-phase per-shard top-k."""
    from ..operators.classifier import nb_train_quantized

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    model, _ = nb_train_quantized(docs, "text", "doc_id", "lang")
    w = Window.partitionBy("label").orderBy(
        F.desc("w_q"), F.asc("token")
    )
    return (
        model.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select(F.col("label").alias("lang"), "token", "w_q", "rank")
        .orderBy("lang", "rank")
    )


# ---------------------------------------------------------------------------
# k-fold cross-validated NB accuracy: the evaluation the self-consistency
# confusion matrix cannot give (train and eval docs disjoint per fold).
# Folds are md5 buckets — engine-replayable; each fold's training CTE is
# the NB pipeline filtered to the other folds (the logreg/MMR unrolling
# pattern applied to cross-validation).
# ---------------------------------------------------------------------------

_NB_FOLDS = 3


def _nb_fold_cte(f: int) -> str:
    """Per-fold NB train/score/accuracy CTE chain (suffix _f{f})."""
    return rf"""
    docs_f{f} AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                   AS words,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS BIGINT) % {_NB_FOLDS} AS fold
        FROM documents WHERE text IS NOT NULL
    ),
    tok_f{f} AS (
        SELECT doc_id, lang, fold, unnest(words) AS token FROM docs_f{f}
    ),
    tl_f{f} AS (
        SELECT token, lang, count(*) AS n_tl FROM tok_f{f}
        WHERE fold <> {f} GROUP BY 1, 2
    ),
    cl_f{f} AS (
        SELECT lang, sum(n_tl) AS n_l FROM tl_f{f} GROUP BY 1
    ),
    voc_f{f} AS (
        SELECT count(DISTINCT token) AS v FROM tl_f{f}
    ),
    model_f{f} AS (
        SELECT g.token, g.lang,
               CAST(round(ln((coalesce(t.n_tl, 0) + 1)
                             / CAST(g.n_l + voc_f{f}.v AS DOUBLE))
                          * {_NB_SCALE}) AS BIGINT) AS w_q
        FROM (SELECT tok.token, c.lang, c.n_l
              FROM (SELECT DISTINCT token FROM tl_f{f}) tok, cl_f{f} c) g
        LEFT JOIN tl_f{f} t ON t.token = g.token AND t.lang = g.lang,
             voc_f{f}
    ),
    pri_f{f} AS (
        SELECT lang,
               CAST(round(ln(count(*) /
                             CAST((SELECT count(*) FROM docs_f{f}
                                   WHERE fold <> {f}) AS DOUBLE))
                          * {_NB_SCALE}) AS BIGINT) AS prior_q
        FROM docs_f{f} WHERE fold <> {f} GROUP BY 1
    ),
    dt_f{f} AS (
        SELECT doc_id, token, count(*) AS k FROM tok_f{f}
        WHERE fold = {f} GROUP BY 1, 2
    ),
    sc_f{f} AS (
        SELECT d.doc_id, m.lang, sum(d.k * m.w_q) AS lik_q
        FROM dt_f{f} d JOIN model_f{f} m USING (token) GROUP BY 1, 2
    ),
    pred_f{f} AS (
        SELECT doc_id, lang AS predicted,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY lik_q + prior_q DESC, lang ASC) AS rn
        FROM sc_f{f} JOIN pri_f{f} USING (lang)
    ),
    acc_f{f} AS (
        SELECT {f} AS fold, count(*) AS n_eval,
               CAST(sum(CASE WHEN p.predicted = d.lang THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct
        FROM pred_f{f} p JOIN docs_f{f} d USING (doc_id)
        WHERE p.rn = 1
    )
"""


@register(
    "nb_crossval_accuracy",
    oracle="WITH "
    + ",".join(_nb_fold_cte(f) for f in range(_NB_FOLDS))
    + """
    SELECT fold, n_eval, n_correct,
           round(n_correct / CAST(n_eval AS DOUBLE), 6) AS accuracy
    FROM (
        """
    + " UNION ALL ".join(
        f"SELECT * FROM acc_f{f}" for f in range(_NB_FOLDS)
    )
    + """
    ) ORDER BY fold
    """,
    tags=("llm", "quality", "classifier", "evaluation"),
)
def nb_crossval_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-fold cross-validated NB accuracy over md5 fold buckets — the
    held-out evaluation the self-consistency matrix cannot give (train
    and eval docs disjoint per fold). Holdout docs whose every token is
    OOV for the fold's training vocab score no class and drop from the
    fold's n_eval (inner-join semantics, identical in the oracle).
    Three trainings of a one-pass model: still no driver loop beyond
    the per-fold vocab-size scalar."""
    from ..operators.classifier import nb_predict, nb_train_quantized

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % _NB_FOLDS
    )
    folded = docs.withColumn("fold", fold)

    def _build_fold(f: int):
        train = folded.filter(F.col("fold") != f)
        holdout = folded.filter(F.col("fold") == f)
        model, priors = nb_train_quantized(train, "text", "doc_id", "lang")
        pred = nb_predict(holdout, model, priors, "text", "doc_id")
        return pred.join(holdout.select("doc_id", "lang"), "doc_id").agg(
            F.lit(f).cast("long").alias("fold"),
            F.count("*").alias("n_eval"),
            F.sum(
                (F.col("predicted") == F.col("lang")).cast("long")
            ).alias("n_correct"),
        )

    # r13 (guide §2.6 — overlap independent jobs): each fold's model
    # build blocks the driver on its scalar action, so the three
    # independent fold pipelines are submitted from a small thread pool
    # and their jobs back-fill each other's stage tails instead of
    # running strictly one after another. Per-fold plans and numbers are
    # unchanged; pool.map preserves fold order.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=_NB_FOLDS) as pool:
        per_fold = list(pool.map(_build_fold, range(_NB_FOLDS)))
    out = per_fold[0]
    for p in per_fold[1:]:
        out = out.unionByName(p)
    return out.select(
        "fold",
        "n_eval",
        "n_correct",
        F.round(F.col("n_correct") / F.col("n_eval"), 6).alias("accuracy"),
    ).orderBy("fold")


_WILSON_Z = 1.959963984540054  # 95% two-sided; identical literal both engines
_WILSON_Z2 = _WILSON_Z * _WILSON_Z


@register(
    "source_keep_rate_ci",
    oracle=f"""
    WITH {_GOPHER_FLAGS_SQL},
    per_src AS (
        SELECT d.source, count(*) AS n,
               CAST(sum(CASE WHEN g.pass_word_count AND g.pass_avg_word_len
                             AND g.pass_symbol_ratio AND g.pass_stopwords
                        THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM gflags g JOIN documents d USING (doc_id)
        GROUP BY d.source
    )
    SELECT source, n AS n_docs, k AS n_kept,
           round(CAST(k AS DOUBLE) / n, 6) AS keep_rate,
           round((CAST(k AS DOUBLE) / n + {_WILSON_Z2!r} / (2 * n)
                  - {_WILSON_Z!r} * sqrt((CAST(k AS DOUBLE) / n
                      * (1 - CAST(k AS DOUBLE) / n) + {_WILSON_Z2!r} / (4 * n)) / n))
                 / (1 + {_WILSON_Z2!r} / n), 6) AS ci_low,
           round((CAST(k AS DOUBLE) / n + {_WILSON_Z2!r} / (2 * n)
                  + {_WILSON_Z!r} * sqrt((CAST(k AS DOUBLE) / n
                      * (1 - CAST(k AS DOUBLE) / n) + {_WILSON_Z2!r} / (4 * n)) / n))
                 / (1 + {_WILSON_Z2!r} / n), 6) AS ci_high
    FROM per_src ORDER BY source
    """,
    tags=("llm", "quality", "hypothesis-test"),
)
def source_keep_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher keep rate with a 95% Wilson score interval —
    the uncertainty band the scorecard's point estimate lacks (a 60%
    keep rate over 20 docs and over 20,000 docs are different facts;
    Wilson stays sane at extreme rates where the normal interval
    doesn't). Exact integer (kept, total) counts; the z literal and
    every double op are identical expressions in both engines."""
    from ..operators.quality import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    g = gopher_quality_flags(docs, "text", "doc_id", stopwords=_GOPHER_SW)
    keep = F.col("keep").cast("long")
    per_src = (
        g.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum(keep).alias("k"))
    )
    p = F.col("k").cast("double") / F.col("n")
    z, z2 = F.lit(_WILSON_Z), F.lit(_WILSON_Z2)
    center = p + z2 / (2 * F.col("n"))
    half = z * F.sqrt((p * (1 - p) + z2 / (4 * F.col("n"))) / F.col("n"))
    denom = 1 + z2 / F.col("n")
    return per_src.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("k").alias("n_kept"),
        F.round(p, 6).alias("keep_rate"),
        F.round((center - half) / denom, 6).alias("ci_low"),
        F.round((center + half) / denom, 6).alias("ci_high"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Readability profile (Flesch reading ease, ratio-of-sums form): the
# classic prose-difficulty score as a per-source corpus statistic. Words,
# sentences, and the vowel-group syllable proxy are exact integer counts;
# ONE fixed double formula per source keeps the score order-free.
# ---------------------------------------------------------------------------


@register(
    "readability_profile",
    oracle=r"""
    WITH per_doc AS (
        SELECT source,
               len(regexp_extract_all(text, '\S+')) AS w,
               greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
        FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS words,
           CAST(sum(s) AS BIGINT) AS sentences,
           CAST(sum(y) AS BIGINT) AS syllables,
           round(206.835
                 - 1.015 * (CAST(sum(w) AS DOUBLE) / CAST(sum(s) AS DOUBLE))
                 - 84.6 * (CAST(sum(y) AS DOUBLE) / CAST(sum(w) AS DOUBLE)),
                 6) AS flesch
    FROM per_doc
    WHERE w > 0
    GROUP BY source
    ORDER BY source
    """,
    tags=("llm", "quality", "readability"),
)
def readability_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading ease (ratio-of-sums: corpus-level
    words/sentence and syllables/word, not mean-of-per-doc-scores — the
    stable estimator a handful of degenerate docs cannot drag) with the
    exact integer counts alongside. Syllables use the standard
    vowel-group proxy; sentence count is clamped to >= 1 per doc so
    fragments don't divide by zero.

    Scale: three regexp_count projections fused into one scan + one
    source-keyed aggregate of integer sums; the two divisions happen
    once per source row."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = F.regexp_count(F.col("text"), F.lit(r"\S+"))
    s = F.greatest(F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+")))
    y = F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+"))
    per_doc = docs.select(
        "source", w.alias("w"), s.alias("s"), y.alias("y")
    ).filter(F.col("w") > 0)
    sw = F.sum("w").cast("long")
    ss = F.sum("s").cast("long")
    sy = F.sum("y").cast("long")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            sw.alias("words"),
            ss.alias("sentences"),
            sy.alias("syllables"),
            F.round(
                F.lit(206.835)
                - F.lit(1.015)
                * (sw.cast("double") / ss.cast("double"))
                - F.lit(84.6) * (sy.cast("double") / sw.cast("double")),
                6,
            ).alias("flesch"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Preference-pair construction (DPO/RLHF data prep): within each source,
# pair the i-th most readable doc with the i-th least readable one —
# deterministic chosen/rejected pairs with a minimum quality gap, the
# rank-matched shape that avoids quadratic pair enumeration.
# ---------------------------------------------------------------------------


@register(
    "preference_pairs",
    oracle=r"""
    WITH per_doc AS (
        SELECT doc_id, source,
               round(206.835
                     - 1.015 * (CAST(len(regexp_extract_all(text, '\S+'))
                                     AS DOUBLE)
                                / CAST(greatest(1, len(regexp_extract_all(
                                      text, '[.!?]+'))) AS DOUBLE))
                     - 84.6 * (CAST(len(regexp_extract_all(lower(text),
                                        '[aeiouy]+')) AS DOUBLE)
                               / CAST(len(regexp_extract_all(text, '\S+'))
                                      AS DOUBLE)),
                     6) AS score
        FROM documents
        WHERE text IS NOT NULL
          AND len(regexp_extract_all(text, '\S+')) > 0
    ),
    ranked AS (
        SELECT doc_id, source, score,
               row_number() OVER (
                   PARTITION BY source ORDER BY score DESC, doc_id ASC
               ) AS r_top,
               row_number() OVER (
                   PARTITION BY source ORDER BY score ASC, doc_id DESC
               ) AS r_bot,
               count(*) OVER (PARTITION BY source) AS n
        FROM per_doc
    )
    SELECT t.source,
           t.doc_id AS chosen_doc,
           b.doc_id AS rejected_doc,
           t.score AS chosen_score,
           b.score AS rejected_score,
           round(t.score - b.score, 6) AS gap
    FROM ranked t
    JOIN ranked b
      ON b.source = t.source AND b.r_bot = t.r_top
    WHERE t.r_top <= 5
      AND t.r_top < (t.n + 1) / 2.0
      AND t.score - b.score >= 5.0
    ORDER BY t.source, t.r_top
    """,
    tags=("llm", "quality", "preference"),
)
def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chosen/rejected preference pairs per source for DPO-style
    training: the i-th most readable document paired with the i-th
    least readable (i <= 5, strictly disjoint halves, per-doc Flesch
    gap >= 5 points). Rank matching produces at most min(5, n/2) pairs
    per source with ZERO pair enumeration — two keyed ranking windows
    and one (source, rank) equi-join, never doc x doc.

    Determinism: the per-doc score is one fixed double expression over
    exact integer regexp counts; both rankings carry doc_id
    tie-breakers (descending ranks tie-break ascending ids and vice
    versa, so a tied score can never pair a doc with itself)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w_cnt = F.regexp_count(F.col("text"), F.lit(r"\S+"))
    s_cnt = F.greatest(
        F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
    )
    y_cnt = F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+"))
    per_doc = docs.select(
        "doc_id",
        "source",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (w_cnt.cast("double") / s_cnt.cast("double"))
            - F.lit(84.6) * (y_cnt.cast("double") / w_cnt.cast("double")),
            6,
        ).alias("score"),
    ).filter(w_cnt > 0)
    w_top = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    w_bot = Window.partitionBy("source").orderBy(
        F.asc("score"), F.desc("doc_id")
    )
    ranked = per_doc.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(w_top).alias("r_top"),
        F.row_number().over(w_bot).alias("r_bot"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    top = ranked.filter(
        (F.col("r_top") <= 5)
        & (F.col("r_top") < (F.col("n") + 1) / 2.0)
    ).select(
        "source",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
        "r_top",
    )
    bot = ranked.select(
        F.col("source").alias("_bs"),
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
        "r_bot",
    )
    return (
        top.join(
            bot,
            (F.col("_bs") == F.col("source"))
            & (F.col("r_bot") == F.col("r_top")),
        )
        .filter(F.col("chosen_score") - F.col("rejected_score") >= 5.0)
        .select(
            "source",
            "chosen_doc",
            "rejected_doc",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 6
            ).alias("gap"),
        )
        .orderBy("source", "r_top")
    )


# ---------------------------------------------------------------------------
# Distribution-free median confidence interval: the binomial order-
# statistic bounds (no normality assumption, no bootstrap RNG) — the
# robust-statistics companion to the mean-based CIs. Ranks come from
# one fixed double expression over (n, sqrt(n)); the values at those
# ranks are picked by a keyed ranking window, never a global sort.
# ---------------------------------------------------------------------------

_MEDCI_Z_Q = 1959963985  # 1.96, 1e-9-quantized (shared with the oracle)


@register(
    "doc_length_median_ci",
    oracle=f"""
    WITH base AS (
        SELECT source, CAST(n_chars AS BIGINT) AS len, doc_id
        FROM documents WHERE n_chars IS NOT NULL
    ),
    ranked AS (
        SELECT source, len, doc_id,
               row_number() OVER (
                   PARTITION BY source ORDER BY len, doc_id
               ) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM base
    ),
    marks AS (
        SELECT DISTINCT source, n,
               n // 2 + 1 AS med_rank,
               greatest(1, CAST(floor((n - {_MEDCI_Z_Q} / 1e9 * sqrt(n)) / 2)
                                AS BIGINT)) AS lo_rank,
               least(n, CAST(ceil((n + {_MEDCI_Z_Q} / 1e9 * sqrt(n)) / 2)
                             AS BIGINT) + 1) AS hi_rank
        FROM ranked
    )
    SELECT m.source, CAST(m.n AS BIGINT) AS n_docs,
           CAST(med.len AS BIGINT) AS median_len,
           CAST(lo.len AS BIGINT) AS ci_lo_len,
           CAST(hi.len AS BIGINT) AS ci_hi_len,
           CAST(m.lo_rank AS BIGINT) AS lo_rank,
           CAST(m.hi_rank AS BIGINT) AS hi_rank
    FROM marks m
    JOIN ranked med ON med.source = m.source AND med.rn = m.med_rank
    JOIN ranked lo ON lo.source = m.source AND lo.rn = m.lo_rank
    JOIN ranked hi ON hi.source = m.source AND hi.rn = m.hi_rank
    ORDER BY m.source
    """,
    tags=("llm", "quality", "stats"),
)
def doc_length_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source median document length with the ~95% distribution-free
    confidence interval from binomial order statistics (ranks
    (n -/+ 1.96 sqrt(n))/2, floor/ceil, clamped; median = the explicit
    upper-median rank n//2+1, so even counts are deterministic). No
    normality assumption, no bootstrap randomness — the CI is two exact
    order statistics. Scale: one keyed ranking window per source + three
    rank-equi-joins against a sources-bounded marks frame."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    base = docs.select(
        "source", F.col("n_chars").cast("long").alias("len"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy("len", "doc_id")
    ranked = base.select(
        "source",
        "len",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    z = F.lit(_MEDCI_Z_Q) / F.lit(1e9)
    marks = ranked.select("source", "n").distinct().select(
        "source",
        "n",
        (F.col("n") / 2 + 1).cast("long").alias("med_rank"),
        F.greatest(
            F.lit(1).cast("long"),
            F.floor((F.col("n") - z * F.sqrt("n")) / 2).cast("long"),
        ).alias("lo_rank"),
        F.least(
            F.col("n").cast("long"),
            (F.ceil((F.col("n") + z * F.sqrt("n")) / 2) + 1).cast("long"),
        ).alias("hi_rank"),
    )
    pick = lambda rank_col, out: (  # noqa: E731
        ranked.join(
            marks.select("source", F.col(rank_col).alias("_r")),
            "source",
        )
        .filter(F.col("rn") == F.col("_r"))
        .select("source", F.col("len").alias(out))
    )
    return (
        marks.join(pick("med_rank", "median_len"), "source")
        .join(pick("lo_rank", "ci_lo_len"), "source")
        .join(pick("hi_rank", "ci_hi_len"), "source")
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            "median_len",
            "ci_lo_len",
            "ci_hi_len",
            F.col("lo_rank").cast("long").alias("lo_rank"),
            F.col("hi_rank").cast("long").alias("hi_rank"),
        )
        .orderBy("source")
    )


@register(
    "quality_logreg_gains",
    oracle=f"""
    WITH {_logreg_cte()},
    p AS (
        SELECT doc_id, y,
               0.5 * (1.0 + z / (1.0 + abs(z))) AS prob
        FROM scored
    ),
    dec AS (
        SELECT y, ntile(10) OVER (ORDER BY prob DESC, doc_id ASC)
                   AS decile
        FROM p
    ),
    per AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(y) AS BIGINT) AS positives
        FROM dec GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
               CAST(sum(positives) AS BIGINT) AS tp
        FROM per
    ),
    cum AS (
        SELECT a.decile, CAST(sum(b.positives) AS BIGINT) AS cpos
        FROM per a JOIN per b ON b.decile <= a.decile
        GROUP BY 1
    )
    SELECT per.decile, per.n_docs, per.positives,
           round(CAST(per.positives AS DOUBLE) / per.n_docs, 6)
               AS response_rate,
           round(CAST(per.positives AS DOUBLE) / per.n_docs
                 / (CAST(tot.tp AS DOUBLE) / tot.tn), 6) AS lift,
           round(CAST(cum.cpos AS DOUBLE) / tot.tp, 6) AS cum_capture
    FROM per JOIN cum USING (decile) CROSS JOIN tot
    ORDER BY per.decile
    """,
    tags=("llm", "quality", "classifier"),
)
def quality_logreg_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table for the trained quality classifier: documents
    ranked by UNROUNDED sigmoid score (monotone in z, so both engines
    order identically; doc_id tiebreak), cut into score deciles, with
    per-decile response rate, lift over the base rate, and cumulative
    positive capture — the 'how deep must I score to catch X% of the
    good docs' readout that completes ROC/AUC/calibration. Decile
    assignment via range_partitioned_ntile (no single-task global
    sort); cumulative sums via the 10-row broadcast triangle join; the
    fit comes from the per-sf_dir memo, so the family still trains
    once."""
    from ..operators.classifier import logreg_score
    from ..operators.windows import range_partitioned_ntile

    feats = _lr_feats(spark, sf_dir)
    w = _lr_weights(spark, sf_dir)
    scored = logreg_score(feats, w, "doc_id")
    dec = range_partitioned_ntile(
        scored.select("doc_id", "y", "prob"),
        10,
        [F.desc("prob"), F.asc("doc_id")],
        out_col="decile",
    )
    per = dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("positives"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("tn"),
        F.sum("positives").cast("long").alias("tp"),
    )
    prior = per.select(
        F.col("decile").alias("_d"), F.col("positives").alias("_p")
    )
    cum = (
        per.select("decile")
        .join(F.broadcast(prior), F.col("_d") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("_p").cast("long").alias("cpos"))
    )
    rr = F.col("positives").cast("double") / F.col("n_docs")
    base = F.col("tp").cast("double") / F.col("tn")
    return (
        per.join(cum, "decile")
        .join(F.broadcast(tot))
        .select(
            "decile",
            "n_docs",
            "positives",
            F.round(rr, 6).alias("response_rate"),
            F.round(rr / base, 6).alias("lift"),
            F.round(F.col("cpos").cast("double") / F.col("tp"), 6).alias(
                "cum_capture"
            ),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Per-source quality-percentile calibration (round 8): the FineWeb-style
# question — does one GLOBAL quality cutoff keep the same documents as a
# per-source top-50%? Sources whose score distributions sit low lose
# disproportionately under a global threshold; the per-source percentile
# rule equalizes keep rates. This query measures the drift per source.
# ---------------------------------------------------------------------------

_QPS_CUTOFF = 0.526  # ~global median quality at sf0.01 (probed 2026-08-15)

_QPS_QUALITY = """
        round(0.4 * (CAST(len(list_distinct(words)) AS DOUBLE) / len(words))
              + 0.3 * least(CAST(len(words) AS DOUBLE) / 100.0, 1.0)
              + 0.3 * (1.0 - least(
                    (CAST(list_sum(list_transform(words, t -> strlen(t)))
                          AS DOUBLE) / len(words)) / 10.0, 1.0)), 6)
"""


@register(
    "quality_percentile_by_source",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '')
                   AS words
        FROM documents WHERE text IS NOT NULL
    ),
    q AS (
        SELECT doc_id, source, {_QPS_QUALITY} AS quality
        FROM toks WHERE len(words) > 0
    ),
    ranked AS (
        SELECT doc_id, source, quality,
               percent_rank() OVER (
                   PARTITION BY source
                   ORDER BY quality ASC, doc_id ASC) AS src_pr
        FROM q
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (quality >= {_QPS_CUTOFF}) AS BIGINT)
               AS kept_global,
           CAST(count(*) FILTER (src_pr >= 0.5) AS BIGINT) AS kept_local,
           CAST(count(*) FILTER (quality >= {_QPS_CUTOFF} AND src_pr >= 0.5)
                AS BIGINT) AS kept_both,
           round(CAST(count(*) FILTER (quality >= {_QPS_CUTOFF}) AS DOUBLE)
                 / count(*), 6) AS global_keep_rate
    FROM ranked GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "quality", "curation", "calibration"),
)
def quality_percentile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: documents kept by a fixed GLOBAL quality cutoff vs the
    per-source top-50% (percent_rank within source, quality/doc_id total
    order), and their intersection — the calibration-drift audit that
    decides whether thresholds need per-domain normalization.

    Scale: quality is the map-only doc_stats projection; the only window
    is keyed BY SOURCE (bounded partitions, never a global sort); the
    report is one (source) aggregate. percent_rank's (rank-1)/(n-1) is
    exact integer-derived arithmetic — no quantile interpolation — so the
    0.5 comparison is engine-portable."""
    from ..operators.textstats import doc_stats

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    q = doc_stats(docs, "text", "doc_id").select("doc_id", "quality").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy(F.asc("quality"), F.asc("doc_id"))
    ranked = q.withColumn("src_pr", F.percent_rank().over(w))
    kept_g = F.count_if(F.col("quality") >= _QPS_CUTOFF)
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            kept_g.cast("bigint").alias("kept_global"),
            F.count_if(F.col("src_pr") >= 0.5).cast("bigint").alias("kept_local"),
            F.count_if(
                (F.col("quality") >= _QPS_CUTOFF) & (F.col("src_pr") >= 0.5)
            )
            .cast("bigint")
            .alias("kept_both"),
            F.round(kept_g.cast("double") / F.count("*"), 6).alias(
                "global_keep_rate"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Population Stability Index per source: the production drift score risk
# teams run next to KL. Buckets are DIGIT COUNTS of n_chars (pure integer /
# string arithmetic — no log-boundary ulp hazard between engines), shares
# are Laplace-smoothed from exact counts, and only the final ln/sum is FP.
# ---------------------------------------------------------------------------


@register(
    "source_psi_drift",
    oracle="""
    WITH docs AS (
        SELECT source,
               length(CAST(n_chars AS VARCHAR)) * 10
               + CAST(substring(CAST(n_chars AS VARCHAR), 1, 1) AS INTEGER)
                   AS bucket
        FROM documents WHERE n_chars IS NOT NULL
    ),
    corpus AS (SELECT bucket, count(*) AS c_b FROM docs GROUP BY 1),
    tot AS (SELECT CAST(sum(c_b) AS DOUBLE) AS n_all,
                   CAST(count(*) AS DOUBLE) AS nb
            FROM corpus),
    per_src AS (
        SELECT source, bucket, count(*) AS c_sb FROM docs GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.source, c.bucket, c.c_b, coalesce(p.c_sb, 0) AS c_sb
        FROM (SELECT DISTINCT source FROM docs) s
        CROSS JOIN corpus c
        LEFT JOIN per_src p ON p.source = s.source AND p.bucket = c.bucket
    ),
    ns AS (SELECT source, CAST(sum(c_sb) AS DOUBLE) AS n_s
           FROM grid GROUP BY 1)
    SELECT g.source,
           CAST(ns.n_s AS BIGINT) AS n_docs,
           round(sum(
               (((g.c_sb + 0.5) / (ns.n_s + 0.5 * tot.nb))
                - ((g.c_b + 0.5) / (tot.n_all + 0.5 * tot.nb)))
               * ln(((g.c_sb + 0.5) / (ns.n_s + 0.5 * tot.nb))
                    / ((g.c_b + 0.5) / (tot.n_all + 0.5 * tot.nb)))
           ), 6) AS psi
    FROM grid g JOIN ns ON ns.source = g.source CROSS JOIN tot
    GROUP BY 1, 2
    ORDER BY 1
    """,
    tags=("llm", "quality", "drift"),
)
def source_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the whole corpus — the standard go/no-go drift
    gate (PSI < 0.1 stable, 0.1-0.25 watch, > 0.25 act) a training-data
    pipeline evaluates per ingestion source before admitting a batch.

    Buckets are (digit count, leading digit) of ``n_chars`` — a ~9-cell
    log-like grid per decade from pure integer/string arithmetic that both
    engines compute identically, unlike a float log-bucket whose boundary
    docs could land differently per ulp. Shares are Laplace-smoothed
    (+0.5) from exact counts so an absent bucket contributes a finite,
    engine-identical term.

    Scale shape: two combinable count aggregates over one scan each, a
    sources x buckets grid from two BOUNDED frames (buckets <= 20 ever,
    sources is the dimension), and one per-source sum. Nothing is
    data-sized except the two scans; at 100 TB the grid is still KBs.

    The report is a pure function of the (source, bucket) count-monoid
    state (``psi_from_counts``), so the STREAMING twin — counts maintained
    additively per micro-batch by ``foreach_batch_incremental_agg`` —
    reproduces this query exactly (tests/test_streaming_llm.py)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .select("source", length_digit_bucket(F.col("n_chars")).alias("bucket"))
    )
    counts = docs.groupBy("source", "bucket").agg(F.count("*").alias("c_sb"))
    return psi_from_counts(counts)


def length_digit_bucket(n_chars: Column) -> Column:
    """(digit count, leading digit) length bucket: pure integer/string
    arithmetic, identical in Spark and DuckDB (no float-log boundaries)."""
    s = n_chars.cast("string")
    return F.length(s) * 10 + F.substring(s, 1, 1).cast("int")


def psi_from_counts(counts: DataFrame) -> DataFrame:
    """PSI report from additive (source, bucket, c_sb) counts — the exact
    frame ``foreach_batch_incremental_agg`` maintains, which makes the
    streaming PSI monitor equal the batch query bit-for-bit."""
    corpus = counts.groupBy("bucket").agg(F.sum("c_sb").alias("c_b"))
    tot = corpus.agg(
        F.sum("c_b").cast("double").alias("n_all"),
        F.count("*").cast("double").alias("nb"),
    )
    grid = (
        counts.select("source")
        .distinct()
        .join(F.broadcast(corpus))
        .join(counts, ["source", "bucket"], "left")
        .select(
            "source", "bucket", "c_b",
            F.coalesce(F.col("c_sb"), F.lit(0)).alias("c_sb"),
        )
    )
    ns = grid.groupBy("source").agg(F.sum("c_sb").cast("double").alias("n_s"))
    p_s = (F.col("c_sb") + 0.5) / (F.col("n_s") + 0.5 * F.col("nb"))
    p_c = (F.col("c_b") + 0.5) / (F.col("n_all") + 0.5 * F.col("nb"))
    return (
        grid.join(ns, "source")
        .join(F.broadcast(tot))
        .groupBy("source", F.col("n_s").cast("bigint").alias("n_docs"))
        .agg(F.round(F.sum((p_s - p_c) * F.log(p_s / p_c)), 6).alias("psi"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Does duplication predict low quality? The curation cross-check: NEAR-dup
# cluster size (transitive canonical clusters, capped bucket) x quality-
# score profile. A corpus where the big clusters score high is boilerplate-
# heavy (templates, legal footers); one where they score low is scraping
# noise — the answer decides whether keep-one-per-cluster also needs a
# quality override. (Exact-digest clustering is degenerate on this corpus:
# its duplicates are token-resampled near-dups, never byte-identical.)
# ---------------------------------------------------------------------------


def _dup_quality_oracle() -> str:
    from .llm import _CANONICAL_CTE

    return f"""
    WITH RECURSIVE {_CANONICAL_CTE},
    q AS (
        SELECT doc_id, {_QPS_QUALITY} AS quality
        FROM toks WHERE len(words) > 0
    ),
    sizes AS (SELECT canonical_id, count(*) AS sz FROM cmap GROUP BY 1),
    j AS (
        SELECT q.quality,
               CAST(least(s.sz, 5) AS INTEGER) AS size_bucket,
               q.quality >= {_QPS_CUTOFF} AS keeps
        FROM q
        JOIN cmap ON cmap.doc_id = q.doc_id
        JOIN sizes s ON s.canonical_id = cmap.canonical_id
    )
    SELECT size_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(quality) / count(*), 6) AS mean_quality,
           round(CAST(count(*) FILTER (WHERE keeps) AS DOUBLE)
                 / count(*), 6) AS keep_rate
    FROM j GROUP BY 1 ORDER BY 1
    """


@register(
    "dup_quality_correlation",
    oracle=_dup_quality_oracle(),
    tags=("llm", "quality", "dedup", "curation"),
)
def dup_quality_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality profile by transitive near-dup cluster size (bucket capped
    at 5+): doc count, mean quality score, and the share clearing the
    global quality cutoff. Read next to dedup_token_savings: if keep_rate
    falls with size_bucket, dedup and quality filtering agree and
    compose; if not, the pipeline needs a boilerplate-specific rule.

    Scale shape: reuses the canonical-map pipeline (banded Jaccard pairs
    -> pointer-jumping CC — every stage keyed, never all-pairs) plus one
    combinable size aggregate and two doc_id/cluster-keyed joins; quality
    is one more combinable pass over the same token scan."""
    from ..operators.dedup import ngram_jaccard_pairs_adaptive
    from ..operators.graph import connected_components
    from ..operators.textstats import doc_stats

    docs = load_table(spark, sf_dir, "documents")
    nn = docs.filter(F.col("text").isNotNull())
    pairs = ngram_jaccard_pairs_adaptive(nn, "text", "doc_id", n=3, threshold=0.5)
    cc = connected_components(pairs, "id_a", "id_b")
    cmap = (
        docs.select("doc_id")
        .join(cc.select(F.col("u").alias("doc_id"), "component"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("canonical_id")
        )
    )
    sizes = cmap.groupBy("canonical_id").agg(F.count("*").alias("sz"))
    q = doc_stats(nn, "text", "doc_id").select("doc_id", "quality")
    j = (
        q.join(cmap, "doc_id")
        .join(sizes, "canonical_id")
        .select(
            "quality",
            F.least(F.col("sz"), F.lit(5)).cast("int").alias("size_bucket"),
            (F.col("quality") >= _QPS_CUTOFF).alias("keeps"),
        )
    )
    return (
        j.groupBy("size_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("quality") / F.count("*"), 6).alias("mean_quality"),
            F.round(
                F.count_if(F.col("keeps")).cast("double") / F.count("*"), 6
            ).alias("keep_rate"),
        )
        .orderBy("size_bucket")
    )


@register(
    "repetition_signals",
    oracle="""
    WITH rs_base AS (
        SELECT doc_id, length(text) AS chars,
               list_filter(string_split_regex(text, '\\s+'),
                           t -> t <> '') AS w
        FROM documents
        WHERE text IS NOT NULL
          AND len(list_filter(string_split_regex(text, '\\s+'),
                              t -> t <> '')) > 0
    ),
    rs_lv AS (
        SELECT doc_id, chars, ns.n,
               array_to_string(list_slice(w, u.p, u.p + ns.n - 1), ' ') AS gram
        FROM rs_base,
             (VALUES (2), (3), (4), (5), (10)) AS ns(n),
             LATERAL unnest(range(1, greatest(len(w) - ns.n + 1, 0) + 1)) AS u(p)
    ),
    rs_counts AS (
        SELECT doc_id, chars, n, gram, count(*) AS c
        FROM rs_lv GROUP BY 1, 2, 3, 4
    ),
    rs_per_n AS (
        SELECT doc_id, chars, n,
               max(CASE WHEN c > 1 THEN c * length(gram) END) AS top_chars,
               sum(CASE WHEN c > 1 THEN c * length(gram) END) AS dup_chars
        FROM rs_counts GROUP BY 1, 2, 3
    ),
    rs_wide AS (
        -- output universe driven by rs_base (every doc with >= 1 token),
        -- not rs_per_n: a 1-token doc has ZERO n-grams at every n and
        -- would otherwise vanish, while the engine's left join emits it
        -- with all-zero fractions and rep_keep = true (ADVICE r10)
        SELECT b.doc_id, b.chars,
               round(least(coalesce(max(CASE WHEN p.n = 2 THEN p.top_chars END), 0)
                           / CAST(b.chars AS DOUBLE), 1.0), 6) AS top2_frac,
               round(least(coalesce(max(CASE WHEN p.n = 3 THEN p.top_chars END), 0)
                           / CAST(b.chars AS DOUBLE), 1.0), 6) AS top3_frac,
               round(least(coalesce(max(CASE WHEN p.n = 4 THEN p.top_chars END), 0)
                           / CAST(b.chars AS DOUBLE), 1.0), 6) AS top4_frac,
               round(least(coalesce(max(CASE WHEN p.n = 5 THEN p.dup_chars END), 0)
                           / CAST(b.chars AS DOUBLE), 1.0), 6) AS dup5_frac,
               round(least(coalesce(max(CASE WHEN p.n = 10 THEN p.dup_chars END), 0)
                           / CAST(b.chars AS DOUBLE), 1.0), 6) AS dup10_frac
        FROM rs_base b LEFT JOIN rs_per_n p ON b.doc_id = p.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_id, top2_frac, top3_frac, top4_frac, dup5_frac, dup10_frac,
           (top2_frac < 0.20 AND top3_frac < 0.18 AND top4_frac < 0.16
            AND dup5_frac < 0.15 AND dup10_frac < 0.10) AS rep_keep
    FROM rs_wide
    """,
    tags=("llm", "quality", "gopher"),
)
def repetition_signals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher REPETITION signals (Rae et al. 2021 §A1.1):
    top-{2,3,4}-gram character fractions, duplicate-{5,10}-gram character
    fractions, and the conjunctive rep_keep verdict under the paper's
    thresholds — the within-document repetition half of the Gopher rules
    that cross-document dedup cannot see (a template farm passes exact
    and near dedup while every doc repeats ITSELF). All aggregation is
    doc_id-keyed and map-side combinable; see
    operators/quality.repetition_signals for the scale shape."""
    from ..operators.quality import repetition_signals

    docs = load_table(spark, sf_dir, "documents")
    return repetition_signals(docs, "text", "doc_id")
