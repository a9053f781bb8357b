"""Lexical-retrieval queries over the documents table: TF-IDF top terms,
BM25 ranking, conjunctive inverted-index search, and the Zipf
rank-frequency corpus-health profile.

Engine extension beyond the reference's aggregation dashboard (closest
reference shape: the token top-N at `streamlit/app.py:141-166`); a
training-data pipeline uses these for corpus exploration, quality triage,
and decontamination follow-up ("which documents actually contain these
benchmark terms?").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retrieval import (
    bm25_scores,
    conjunctive_search,
    tfidf_top_terms,
    zipf_profile,
)
from ..sources.batch import load_table
from .llm import _TOKS_CTE
from .registry import register

# Fixed query bag for the search-shaped queries: mid-frequency corpus terms
# (present in many but not all documents) so rankings are non-degenerate.
_QUERY_TERMS = ["spark", "window", "vector"]

_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH {_TOKS_CTE},
    tfc AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS term FROM toks)
        GROUP BY 1, 2
    ),
    dfc AS (SELECT term, count(*) AS doc_freq FROM tfc GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM toks),
    scored AS (
        SELECT doc_id, term,
               round(tf * (ln((n_docs + 1.0) / (doc_freq + 1.0)) + 1.0), 6)
                   AS tfidf
        FROM tfc JOIN dfc USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, term_rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
        ) AS INTEGER) AS term_rank
        FROM scored
    ) WHERE term_rank <= 3
    """,
    tags=("llm", "retrieval"),
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf, scikit-learn
    formulation) — 'what is this document about' at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "text", "doc_id", k=3)


@register(
    "bm25_search",
    oracle=f"""
    WITH {_TOKS_CTE},
    tfc AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS term FROM toks)
        WHERE term IN ({", ".join(repr(t) for t in _QUERY_TERMS)})
        GROUP BY 1, 2
    ),
    dfc AS (SELECT term, count(*) AS _df FROM tfc GROUP BY 1),
    dl AS (SELECT doc_id, len(words) AS _len FROM toks),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(len(words)) AS DOUBLE) / count(*) AS _avgdl
        FROM toks
    )
    SELECT doc_id, round(sum(
        ln(1.0 + (n_docs - _df + 0.5) / (_df + 0.5))
        * (tf * {_BM25_K1 + 1.0!r})
        / (tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r} + {_BM25_B!r} * _len / _avgdl))
    ), 6) AS bm25
    FROM tfc JOIN dfc USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 10
    """,
    tags=("llm", "retrieval", "topk"),
)
def bm25_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed query bag — the lexical-ranking
    baseline every retrieval/dedup-triage stack needs next to the
    embedding ANN tiers."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(
        docs, "text", "doc_id", _QUERY_TERMS, k1=_BM25_K1, b=_BM25_B, k=10
    )


@register(
    "conjunctive_search",
    oracle=f"""
    WITH {_TOKS_CTE},
    hits AS (
        SELECT doc_id
        FROM (SELECT DISTINCT doc_id, term
              FROM (SELECT doc_id, unnest(words) AS term FROM toks)
              WHERE term IN ({", ".join(repr(t) for t in _QUERY_TERMS)}))
        GROUP BY doc_id
        HAVING count(*) = {len(set(_QUERY_TERMS))}
    )
    SELECT doc_id, lang, source
    FROM hits JOIN documents USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("llm", "retrieval"),
)
def conjunctive_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index AND query: documents containing EVERY query term,
    with their language / source for triage."""
    docs = load_table(spark, sf_dir, "documents")
    hits = conjunctive_search(docs, "text", "doc_id", _QUERY_TERMS)
    return (
        hits.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .orderBy("doc_id")
    )


@register(
    "zipf_profile",
    oracle=f"""
    WITH {_TOKS_CTE},
    counts AS (
        SELECT term, count(*) AS freq
        FROM (SELECT unnest(words) AS term FROM toks)
        GROUP BY 1 ORDER BY freq DESC, term ASC LIMIT 100
    ),
    ranked AS (
        SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, term ASC)
                       AS DOUBLE)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y
        FROM counts
    )
    SELECT count(*) AS n_terms,
           round(covar_pop(x, y) / var_pop(x), 6) AS zipf_slope,
           round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 6)
               AS zipf_intercept,
           round(corr(x, y), 6) AS fit_r
    FROM ranked
    """,
    tags=("llm", "quality"),
)
def zipf_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope/intercept/r over the top-100 token frequencies — natural
    text sits near slope -1; templated or synthetic corpora flatten out.
    A one-row corpus-health probe."""
    docs = load_table(spark, sf_dir, "documents")
    return zipf_profile(docs, "text", "doc_id", top_n=100)


@register(
    "phrase_search",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), t -> t <> '')
                   AS words
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (
        SELECT doc_id,
               unnest(CASE WHEN len(words) >= 3
                      THEN [array_to_string(words[i:i+2], ' ')
                            for i in range(1, len(words) - 1)]
                      ELSE [] END) AS gram
        FROM toks
    )
    SELECT doc_id, CAST(count(*) AS INTEGER) AS n_matches
    FROM g WHERE gram = 'slow hash batch'
    GROUP BY doc_id
    """,
    tags=("retrieval", "search"),
)
def phrase_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query ('slow hash batch'): documents containing the
    three tokens consecutively, with occurrence counts — adjacency, not
    bag-of-words (contrast conjunctive_search). Array-level n-gram
    equality; no positional self-joins for a fixed phrase."""
    from ..operators.retrieval import phrase_search

    docs = load_table(spark, sf_dir, "documents")
    return phrase_search(docs, "text", "doc_id", ["slow", "hash", "batch"])


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + hashed-embedding cosine fused by Reciprocal Rank
# Fusion (Cormack et al. 2009: score = sum over lists of 1/(k + rank)).
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 20
_QUERY_TEXT = " ".join(_QUERY_TERMS)


def _two_towers(spark: SparkSession, sf_dir: str):
    """Shared two-tower builder: (lexical BM25 top-20 ranks, dense
    hashed-embedding cosine top-20 ranks) — used by the RRF fuse and the
    RBO rank-agreement metric."""
    from pyspark.sql import Window

    from ..functions.vectors import dot
    from ..operators.textstats import text_hash_embeddings

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    lex = bm25_scores(
        docs, "text", "doc_id", _QUERY_TERMS,
        k1=_BM25_K1, b=_BM25_B, k=_RRF_DEPTH,
    )
    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex_r = lex.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )

    emb = text_hash_embeddings(docs, "text", "doc_id", dim=64)
    qdf = spark.createDataFrame([(0, _QUERY_TEXT)], ["doc_id", "text"])
    qv = text_hash_embeddings(qdf, "text", "doc_id", dim=64).select(
        F.col("embedding").alias("_qv")
    )
    dense = (
        emb.join(F.broadcast(qv))
        .select(
            "doc_id",
            F.round(dot(F.col("embedding"), F.col("_qv")), 6).alias("_cos"),
        )
        .orderBy(F.desc("_cos"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
    )
    w_dense = Window.orderBy(F.desc("_cos"), F.asc("doc_id"))
    dense_r = dense.select(
        "doc_id", F.row_number().over(w_dense).alias("dense_rank")
    )
    return lex_r, dense_r



@register(
    "hybrid_rrf_search",
    oracle=None,  # assembled below (needs llm._TEMB_CTE); see _rrf_oracle()
    tags=("llm", "retrieval", "similarity", "topk"),
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: top-20 BM25 (lexical) and top-20 hashed-embedding
    cosine (dense, deterministic feature hashing — no external model)
    fused with RRF k=60; top-10 by fused score. The standard two-tower
    retrieval pattern, fully oracle-replayable because BOTH towers are
    md5-deterministic.

    Scale shape: each tower ends in TakeOrderedAndProject (bounded 20
    rows); ranks come from windows over those LIMIT-bounded frames (the
    documented global-window-over-limit exception); the fuse is a
    broadcast-able 20x20 full outer join. The dense tower's query vector
    is a one-row broadcast (nested-loop against one row)."""
    lex_r, dense_r = _two_towers(spark, sf_dir)

    from ..operators.retrieval import rrf_fuse

    return (
        rrf_fuse(lex_r, dense_r, "doc_id", "lex_rank", "dense_rank", k=_RRF_K)
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "retrieval_rank_overlap",
    oracle=None,  # assembled below alongside the RRF oracle
    tags=("llm", "retrieval", "evaluation"),
)
def retrieval_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap (Webber et al. 2010, truncated at depth 20,
    p=0.9) between the lexical and dense towers — the rank-agreement
    number that tells you whether hybrid fusion is worth running (RBO
    near 1: towers agree, fusion adds nothing; near 0: they see
    different corpora slices). Every p^d enters as the SAME python-repr
    double literal in both engines and each depth term is
    1e-9-quantized before summing — exact, order-free."""
    lex_r, dense_r = _two_towers(spark, sf_dir)
    # r13: ``common`` (<= 20 rows) feeds the depth grid AND the count —
    # persist it so the two full-corpus tower pipelines behind it run
    # once, not twice (guide §1.2). Released by harness clearCache.
    common = lex_r.join(dense_r, "doc_id").select(
        F.greatest("lex_rank", "dense_rank").alias("m")
    ).persist()
    depths = spark.createDataFrame(
        [(d, _RBO_P**d) for d in range(1, _RRF_DEPTH + 1)], ["d", "pd"]
    )
    ov = (
        depths.crossJoin(F.broadcast(common))
        .groupBy("d", "pd")
        .agg(F.sum((F.col("m") <= F.col("d")).cast("long")).alias("o"))
    )
    qterms = ov.select(
        F.round(F.col("pd") * F.col("o") / F.col("d") * 1e9)
        .cast("long")
        .alias("t_q")
    )
    n_common = common.agg(F.count("*").alias("n_common"))
    return (
        qterms.agg(F.sum("t_q").alias("_s"))
        .crossJoin(F.broadcast(n_common))
        .select(
            F.lit(_RRF_DEPTH).alias("depth"),
            "n_common",
            F.round(
                F.lit((1 - _RBO_P) / _RBO_P)
                * F.coalesce(F.col("_s"), F.lit(0)) / 1e9,
                6,
            ).alias("rbo"),
        )
    )


def _towers_cte() -> str:
    """Shared oracle CTE chain ending at lexr/denser (the two towers)."""
    from .llm import _TEMB_CTE, _TEMB_DIM, _duck_dot

    terms = ", ".join(repr(t) for t in _QUERY_TERMS)
    return f"""
    WITH {_TOKS_CTE},
    tfc AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS term FROM toks)
        WHERE term IN ({terms})
        GROUP BY 1, 2
    ),
    dfc AS (SELECT term, count(*) AS _df FROM tfc GROUP BY 1),
    dl AS (SELECT doc_id, len(words) AS _len FROM toks),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(len(words)) AS DOUBLE) / count(*) AS _avgdl
        FROM toks
    ),
    bm AS (
        SELECT doc_id, round(sum(
            ln(1.0 + (n_docs - _df + 0.5) / (_df + 0.5))
            * (tf * {_BM25_K1 + 1.0!r})
            / (tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r} + {_BM25_B!r} * _len / _avgdl))
        ), 6) AS bm25
        FROM tfc JOIN dfc USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {_RRF_DEPTH}
    ),
    lexr AS (
        SELECT doc_id, CAST(row_number() OVER (
            ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS lex_rank
        FROM bm
    ),
    {_TEMB_CTE.lstrip()},
    qtok AS (SELECT unnest([{terms}]) AS t),
    qb AS (
        SELECT CAST(concat('0x', substr(md5(concat('temb:', t)), 1, 4))
                    AS BIGINT) % {_TEMB_DIM} AS b,
               CASE WHEN CAST(concat('0x', substr(md5(concat('temb:', t)), 5, 4))
                         AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
        FROM qtok
    ),
    qsum AS (SELECT b, sum(s) AS v FROM qb GROUP BY 1),
    qdense AS (
        SELECT g.j, CAST(coalesce(q.v, 0) AS DOUBLE) AS v
        FROM (SELECT unnest(range({_TEMB_DIM})) AS j) g
        LEFT JOIN qsum q ON q.b = g.j
    ),
    qx AS (SELECT list(v ORDER BY j) AS x FROM qdense),
    qn AS (
        SELECT x, sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(x, e -> e * e)), (acc, e) -> acc + e)) AS n
        FROM qx
    ),
    qv AS (SELECT list_transform(x, e -> e / n) AS qvec FROM qn WHERE n > 0),
    cos AS (
        SELECT doc_id,
               round({_duck_dot('v', 'qvec', _TEMB_DIM)}, 6) AS _cos
        FROM temb, qv
        ORDER BY _cos DESC, doc_id ASC
        LIMIT {_RRF_DEPTH}
    ),
    denser AS (
        SELECT doc_id, CAST(row_number() OVER (
            ORDER BY _cos DESC, doc_id ASC) AS INTEGER) AS dense_rank
        FROM cos
    )
    """


def _rrf_oracle() -> str:
    return _towers_cte() + f"""
    SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
           l.lex_rank, d.dense_rank,
           round(coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
                 + coalesce(1.0 / ({_RRF_K} + d.dense_rank), 0.0), 6)
               AS rrf_score
    FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 10
    """


_RBO_P = 0.9


def _rbo_oracle() -> str:
    # p^d as PYTHON-repr literals so both engines parse identical
    # doubles (no cross-libm pow); each term 1e-9-quantized to a BIGINT
    # so the depth sum is order-free and exact.
    term_rows = " UNION ALL ".join(
        f"SELECT {d} AS d, {_RBO_P ** d!r} AS pd"
        for d in range(1, _RRF_DEPTH + 1)
    )
    return _towers_cte() + f""",
    common AS (
        SELECT greatest(l.lex_rank, d.dense_rank) AS m
        FROM lexr l JOIN denser d USING (doc_id)
    ),
    depths AS ({term_rows}),
    ov AS (
        SELECT dp.d, dp.pd,
               (SELECT count(*) FROM common c WHERE c.m <= dp.d) AS o
        FROM depths dp
    ),
    qterms AS (
        SELECT CAST(round(pd * o / d * 1000000000) AS BIGINT) AS t_q
        FROM ov
    )
    SELECT {_RRF_DEPTH} AS depth,
           (SELECT count(*) FROM common) AS n_common,
           round({(1 - _RBO_P) / _RBO_P!r} * sum(t_q) / 1000000000, 6)
               AS rbo
    FROM qterms
    """


import dataclasses  # noqa: E402

from .registry import REGISTRY as _REG  # noqa: E402

_REG["hybrid_rrf_search"] = dataclasses.replace(
    _REG["hybrid_rrf_search"], oracle=_rrf_oracle()
)
_REG["retrieval_rank_overlap"] = dataclasses.replace(
    _REG["retrieval_rank_overlap"], oracle=_rbo_oracle()
)


# ---------------------------------------------------------------------------
# Relevance-labeled retrieval evaluation: the corpus has no qrels, so the
# query scans an AUGMENTED view with PLANTED relevant docs (grade 2 =
# query terms stuffed 3x, grade 1 = partial stuffing) that the oracle
# rebuilds — the dedup_normalized_groups fixture pattern applied to IR
# metrics. log2 discounts enter both engines as identical python-repr
# literals; every DCG term is 1e-9-quantized before summing.
# ---------------------------------------------------------------------------

import math as _math

_EVAL_K = 10
_ILOG2 = {r: 1.0 / _math.log2(r + 1) for r in range(1, _EVAL_K + 1)}


def _dcg_case(rank_col: str) -> str:
    # CAST every branch: DuckDB folds numeric literals like 1.0 to
    # DECIMAL, and decimal chain arithmetic overflows at the 1e9 scale.
    whens = " ".join(
        f"WHEN {rank_col} = {r} THEN CAST({_ILOG2[r]!r} AS DOUBLE)"
        for r in _ILOG2
    )
    return f"CASE {whens} ELSE CAST(0.0 AS DOUBLE) END"


@register(
    "retrieval_eval_planted",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, text, 0 AS grade FROM documents
        WHERE text IS NOT NULL
        UNION ALL
        SELECT doc_id + 3000000,
               concat(repeat('{_QUERY_TEXT} ', 3), text), 2
        FROM documents WHERE text IS NOT NULL AND doc_id % 41 = 1
        UNION ALL
        SELECT doc_id + 4000000,
               concat('{_QUERY_TERMS[0]} {_QUERY_TERMS[1]} ', text), 1
        FROM documents WHERE text IS NOT NULL AND doc_id % 41 = 2
    ),
    toks AS (
        SELECT doc_id, grade,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
                   AS words
        FROM aug
    ),
    tfc AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS term FROM toks)
        WHERE term IN ({", ".join(repr(t) for t in _QUERY_TERMS)})
        GROUP BY 1, 2
    ),
    dfc AS (SELECT term, count(*) AS _df FROM tfc GROUP BY 1),
    dl AS (SELECT doc_id, len(words) AS _len FROM toks),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(len(words)) AS DOUBLE) / count(*) AS _avgdl
        FROM toks
    ),
    bm AS (
        SELECT doc_id, round(sum(
            ln(1.0 + (n_docs - _df + 0.5) / (_df + 0.5))
            * (tf * {_BM25_K1 + 1.0!r})
            / (tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r} + {_BM25_B!r} * _len / _avgdl))
        ), 6) AS bm25
        FROM tfc JOIN dfc USING (term) JOIN dl USING (doc_id)
             CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {_EVAL_K}
    ),
    ranked AS (
        SELECT doc_id, CAST(row_number() OVER (
            ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS rank
        FROM bm
    ),
    graded AS (
        SELECT r.rank, coalesce(t.grade, 0) AS grade
        FROM ranked r JOIN toks t USING (doc_id)
    ),
    ideal AS (
        SELECT CAST(row_number() OVER (ORDER BY grade DESC) AS INTEGER)
                   AS rank,
               grade
        FROM toks WHERE grade > 0
        ORDER BY grade DESC LIMIT {_EVAL_K}
    ),
    dcg AS (
        SELECT sum(CAST(round(grade * ({_dcg_case('rank')})
                              * 1000000000) AS BIGINT)) AS d_q
        FROM graded
    ),
    idcg AS (
        SELECT sum(CAST(round(grade * ({_dcg_case('rank')})
                              * 1000000000) AS BIGINT)) AS i_q
        FROM ideal
    )
    SELECT (SELECT count(*) FROM graded WHERE grade > 0) AS hits_at_10,
           round((SELECT count(*) FROM graded WHERE grade > 0)
                 / CAST({_EVAL_K} AS DOUBLE), 6) AS p_at_10,
           round(coalesce(1.0 / (SELECT min(rank) FROM graded
                                 WHERE grade = 2), 0.0), 6) AS mrr,
           round(CAST(d_q AS DOUBLE) / i_q, 6) AS ndcg_at_10
    FROM dcg, idcg
    """,
    tags=("llm", "retrieval", "evaluation"),
)
def retrieval_eval_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P@10, MRR, nDCG@10 of BM25 against PLANTED graded relevance (the
    corpus ships no qrels, so known-relevant docs are injected
    deterministically and the oracle rebuilds them): the relevance-based
    retrieval scorecard next to the towers' rank-agreement (RBO). A
    planted grade-2 doc failing to rank is a real BM25 regression — the
    metric catches scoring bugs no self-consistency check can."""
    from pyspark.sql import Window

    from ..operators.retrieval import bm25_scores

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    aug = (
        docs.select("doc_id", "text", F.lit(0).alias("grade"))
        .unionByName(
            docs.filter(F.col("doc_id") % 41 == 1).select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat(
                    F.repeat(F.lit(_QUERY_TEXT + " "), 3), F.col("text")
                ).alias("text"),
                F.lit(2).alias("grade"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 41 == 2).select(
                (F.col("doc_id") + 4000000).alias("doc_id"),
                F.concat(
                    F.lit(f"{_QUERY_TERMS[0]} {_QUERY_TERMS[1]} "),
                    F.col("text"),
                ).alias("text"),
                F.lit(1).alias("grade"),
            )
        )
    )
    top = bm25_scores(
        aug, "text", "doc_id", _QUERY_TERMS,
        k1=_BM25_K1, b=_BM25_B, k=_EVAL_K,
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    ranked = top.select(
        "doc_id", F.row_number().over(w).cast("int").alias("rank")
    )
    graded = ranked.join(
        aug.select("doc_id", "grade"), "doc_id"
    ).select("rank", "grade")

    disc = F.lit(0.0)
    for r, v in _ILOG2.items():
        disc = F.when(F.col("rank") == r, F.lit(v)).otherwise(disc)
    dcg = graded.agg(
        F.sum(
            F.round(F.col("grade") * disc * 1e9).cast("long")
        ).alias("d_q")
    )
    w_ideal = Window.orderBy(F.desc("grade"))
    ideal = (
        aug.filter(F.col("grade") > 0)
        .select("grade")
        .withColumn("rank", F.row_number().over(w_ideal).cast("int"))
        .filter(F.col("rank") <= _EVAL_K)
    )
    idcg = ideal.agg(
        F.sum(
            F.round(F.col("grade") * disc * 1e9).cast("long")
        ).alias("i_q")
    )
    hits = graded.agg(
        F.sum((F.col("grade") > 0).cast("long")).alias("hits_at_10"),
        F.coalesce(
            1.0 / F.min(F.when(F.col("grade") == 2, F.col("rank"))),
            F.lit(0.0),
        ).alias("_mrr"),
    )
    return (
        hits.crossJoin(F.broadcast(dcg))
        .crossJoin(F.broadcast(idcg))
        .select(
            "hits_at_10",
            F.round(F.col("hits_at_10") / float(_EVAL_K), 6).alias(
                "p_at_10"
            ),
            F.round("_mrr", 6).alias("mrr"),
            F.round(
                F.col("d_q").cast("double") / F.col("i_q"), 6
            ).alias("ndcg_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# Two-stage retrieval: cheap lexical recall (BM25 top-50) -> expensive
# per-pair reranker on the CANDIDATES ONLY (top-10 out). The reranker is
# where a cross-encoder model would run; this environment has no torch,
# so the model is a deterministic md5 stub — but the ARCHITECTURE is
# real: an Arrow-batched pandas_udf scoring (query, doc) pairs, applied
# after candidate pruning so the expensive stage touches 50 rows per
# query no matter how big the corpus is.
# ---------------------------------------------------------------------------

_CE_SEED = "ce0"
_CE_SCALE = float(16**12)  # 2^48 — exact in a double


@register(
    "rerank_crossencoder_topk",
    oracle=f"""
    WITH {{toks}},
    tfc AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS term FROM toks)
        WHERE term IN ({{terms}})
        GROUP BY 1, 2
    ),
    dfc AS (SELECT term, count(*) AS _df FROM tfc GROUP BY 1),
    dl AS (SELECT doc_id, len(words) AS _len FROM toks),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(len(words)) AS DOUBLE) / count(*) AS _avgdl
        FROM toks
    ),
    cands AS (
        SELECT doc_id, round(sum(
            ln(1.0 + (n_docs - _df + 0.5) / (_df + 0.5))
            * (tf * {{k1p1}})
            / (tf + {{k1}} * ({{omb}} + {{b}} * _len / _avgdl))
        ), 6) AS bm25
        FROM tfc JOIN dfc USING (term) JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT 50
    )
    SELECT doc_id, bm25,
           CAST(CAST(('0x' || substr(md5('{{seed}}:{{query}}:'
                                     || CAST(doc_id AS VARCHAR)), 1, 12))
                     AS BIGINT) AS DOUBLE) / {{scale}} AS ce_score
    FROM cands
    ORDER BY ce_score DESC, doc_id ASC
    LIMIT 10
    """.format(
        toks=_TOKS_CTE,
        terms=", ".join(repr(t) for t in _QUERY_TERMS),
        k1p1=repr(_BM25_K1 + 1.0),
        k1=repr(_BM25_K1),
        omb=repr(1.0 - _BM25_B),
        b=repr(_BM25_B),
        seed=_CE_SEED,
        query=" ".join(_QUERY_TERMS),
        scale=repr(_CE_SCALE),
    ),
    tags=("llm", "retrieval", "rerank", "topk"),
)
def rerank_crossencoder_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-50 candidates reranked to a top-10 by a per-(query, doc)
    cross-encoder STUB: an Arrow-batched pandas_udf whose score is the
    md5-derived uniform [0,1) double (hashlib in Python == md5() in the
    oracle, byte-for-byte) — swap the hash for a model forward pass and
    nothing else changes. The two-stage shape is the scale story:
    first-stage recall is the corpus-sized (but index-friendly) BM25
    scan; the reranker — the expensive stage — sees exactly 50 rows per
    query regardless of corpus size."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    cands = bm25_scores(
        docs, "text", "doc_id", _QUERY_TERMS, k1=_BM25_K1, b=_BM25_B, k=50
    )
    query = " ".join(_QUERY_TERMS)

    @F.pandas_udf("double")
    def ce_score(doc_id: pd.Series) -> pd.Series:
        def score(d) -> float:
            h = hashlib.md5(
                f"{_CE_SEED}:{query}:{d}".encode("utf-8")
            ).hexdigest()
            return int(h[:12], 16) / _CE_SCALE

        return doc_id.map(score)

    return (
        cands.withColumn("ce_score", ce_score(F.col("doc_id")))
        .orderBy(F.desc("ce_score"), F.asc("doc_id"))
        .limit(10)
    )
