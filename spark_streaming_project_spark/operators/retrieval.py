"""Text-retrieval operators over the documents table: TF-IDF weighting,
BM25 ranking, conjunctive (AND) inverted-index search, and a Zipf
rank-frequency profile.

Engine extension beyond the reference's aggregation surface (the reference
has no search path at all — its closest shape is the token top-N at
`streamlit/app.py:141-166`); these give the corpus the standard lexical
retrieval stack a training-data pipeline uses for corpus exploration and
decontamination triage.

Scale notes (100 TB):
- Postings/TF frames shuffle on (doc, term) / term — classic map-side
  combinable aggregates, linear in corpus token count.
- Per-term statistics (document frequency) for a BOUNDED query-term set
  are broadcast; corpus-wide scalars (N, avgdl) travel as broadcast
  one-row frames, never `.collect()`.
- Top-k surfaces end in TakeOrderedAndProject (global sort-limit without
  a global sort).
- The only per-document window (top terms) partitions by doc_id —
  unbounded parallelism, no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = [
    "term_frequencies",
    "tfidf_scores",
    "tfidf_top_terms",
    "bm25_scores",
    "conjunctive_search",
    "zipf_profile",
]


def term_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, term, tf) raw term counts — the postings list with weights.

    One explode + one combinable groupBy; nothing else in the retrieval
    stack re-tokenizes.
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def _corpus_size(df: DataFrame, text_col: str) -> DataFrame:
    """One-row frame with the non-null-text document count (broadcast where
    consumed — a scalar that never leaves the cluster)."""
    return df.filter(F.col(text_col).isNotNull()).agg(
        F.count("*").alias("_n_docs")
    )


def tfidf_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """TF-IDF per (doc, term): ``tf * (ln((N+1)/(df+1)) + 1)`` — the
    smoothed-idf variant (scikit-learn's formulation) so unseen-term idf
    stays finite and every weight is > 0.

    df(term) is a term-keyed aggregate joined back on term (shuffle join —
    the vocabulary is corpus-sized, NOT broadcastable in general); N rides
    a broadcast one-row frame.
    """
    tf = term_frequencies(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n = _corpus_size(df, text_col)
    idf = F.log((F.col("_n_docs") + F.lit(1.0)) / (F.col("doc_freq") + F.lit(1.0))) + F.lit(1.0)
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "doc_freq",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document with dense rank position.

    Window partitions by document — parallel across the corpus; ties break
    on term text so the result is deterministic.
    """
    scored = tfidf_scores(df, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.select(
            F.col(id_col),
            "term",
            "tfidf",
            F.row_number().over(w).alias("term_rank"),
        )
        .filter(F.col("term_rank") <= k)
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 top-``k`` documents for a bag of query terms.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * len_d / avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (Robertson-Sparck
    Jones, the Lucene variant — always > 0).

    Physical shape: the (doc, term, tf) frame is filtered to the bounded
    query-term set FIRST (predicate on the shuffle input), per-term df and
    the corpus scalars (N, avgdl) join as broadcast frames, and the final
    surface is TakeOrderedAndProject. Document length joins on doc_id —
    the one corpus-sized shuffle join, unavoidable since len_d is per-doc.
    """
    terms = [t for t in query_terms]
    tf_all = term_frequencies(df, text_col, id_col)
    tf = tf_all.filter(F.col("term").isin(terms))
    # df(t) over the full corpus for just the query terms: bounded rows.
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    # ONE extra tokenization pass for lengths; corpus scalars (N, avgdl)
    # derive from the same frame instead of re-tokenizing a third time.
    doc_len = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.size(tokens(text_col)).alias("_len")
    )
    stats = doc_len.agg(
        F.count("*").alias("_n_docs"),
        (F.sum("_len").cast("double") / F.count("*")).alias("_avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doc_len, id_col)
        .join(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("_len") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
    )
    return (
        per_term.groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def conjunctive_search(
    df: DataFrame, text_col: str, id_col: str, query_terms: list[str]
) -> DataFrame:
    """Documents containing ALL query terms (inverted-index AND query).

    Distinct (doc, term) postings filtered to the query set, then a
    per-doc distinct-term count compared to |query|. The filter lands
    before the aggregate, so the shuffle carries only postings that
    mention a query term.
    """
    terms = [t for t in query_terms]
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    hits = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col)
        .agg(F.countDistinct("term").alias("_matched"))
        .filter(F.col("_matched") == len(set(terms)))
        .select(id_col)
    )
    return hits


def zipf_profile(
    df: DataFrame, text_col: str, id_col: str, top_n: int = 100
) -> DataFrame:
    """Zipf rank-frequency fit over the ``top_n`` most frequent tokens:
    least-squares slope/intercept of ln(freq) on ln(rank), plus r.

    Natural text follows freq ~ C / rank^s with s near 1; a corpus whose
    slope collapses toward 0 (flat frequencies) or the fit degrades is a
    synthetic/templated-text signal — a cheap corpus-health check.

    Scale shape: corpus-wide term counts (combinable aggregate), then
    TakeOrderedAndProject down to ``top_n`` rows; ONLY that bounded frame
    sees a window (rank) and the single-row regression aggregate. Ties in
    frequency break on term text, and the (rank, freq) pair multiset is
    tie-permutation-invariant, so the fit is deterministic.
    """
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    ranked = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("_x"),
        F.log(F.col("freq").cast("double")).alias("_y"),
    )
    slope = F.covar_pop("_x", "_y") / F.var_pop("_x")
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.avg("_y") - slope * F.avg("_x"), 6).alias("zipf_intercept"),
        F.round(F.corr("_x", "_y"), 6).alias("fit_r"),
    )


def phrase_search(
    df: DataFrame, text_col: str, id_col: str, phrase: list[str]
) -> DataFrame:
    """Exact phrase search: documents containing the tokens of ``phrase``
    CONSECUTIVELY, with per-document occurrence counts — the step beyond
    ``conjunctive_search``, which any positional index exists to answer
    (AND-of-terms matches bags of words; a phrase demands adjacency).

    For a fixed phrase the winning Spark plan is n-gram EQUALITY: build
    each doc's order-preserving word n-grams (array-level, no shuffle)
    and count matches against the joined phrase — one narrow scan, no
    positional self-joins. (The positional-index form — explode (doc,
    pos, term), filter to phrase terms, join pos+1 chains — generalizes
    to slop/wildcard queries but costs len(phrase)-1 keyed joins; for
    fixed phrases the n-gram count is strictly cheaper.) Returns
    (id_col, n_matches > 0) rows ordered nowhere — callers sort.
    """
    from ..functions.text import word_ngrams

    n = len(phrase)
    target = " ".join(phrase)
    grams = word_ngrams(text_col, n=n)
    counted = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(
            F.filter(grams, lambda g: g == F.lit(target))
        ).alias("n_matches"),
    )
    return counted.filter(F.col("n_matches") > 0)


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    rank_a: str,
    rank_b: str,
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) of two ranked lists:
    score(d) = sum over lists containing d of 1/(k + rank). Inputs are
    (id, rank) frames (rank 1-based); a document absent from one list
    keeps a NULL rank there and contributes 0 for that list.

    Scale shape: the inputs are top-N shortlists (bounded), so the full
    outer join broadcasts; the fuse is pure projection. k=60 is the
    paper's constant.
    """
    fused = a.join(b, id_col, "full_outer")
    score = F.round(
        F.coalesce(F.lit(1.0) / (k + F.col(rank_a)), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (k + F.col(rank_b)), F.lit(0.0)),
        6,
    )
    return fused.select(id_col, rank_a, rank_b, score.alias("rrf_score"))
