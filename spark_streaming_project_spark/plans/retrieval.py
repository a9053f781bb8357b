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
