"""Repetition and language-model quality signals for corpus curation.

Gopher-style repetition profiling (Rae et al. 2021, table A1) and a
CCNet-style unigram log-probability score (Wenzek et al. 2019) — the two
standard "is this document junk?" families a pretraining pipeline runs
besides length/diversity heuristics (see ``textstats.doc_stats``).

Everything is built-in expressions: array HOFs for within-document
fractions, map-side-combinable groupBys for the frequency passes. No Python
on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import spread
from ..functions.text import tokens


def _word_grams(toks, n: int):
    """Non-distinct word n-grams as an array column (order preserved)."""
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, width)
    for k in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, k + 1, width), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return grams


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str, gram_n: int = 2
) -> DataFrame:
    """Per-document repetition profile (Gopher repetition rules):

    - ``dup_gram_frac``: 1 - distinct/total word n-grams — the fraction of
      n-gram slots occupied by a repeat.
    - ``top_token_frac``: occurrences of the most frequent token / total
      tokens (Gopher's "most common word" rule).
    - ``top_gram_frac``: occurrences of the most frequent n-gram / total
      n-grams.

    Shape: the dup fraction is a pure array pass (no shuffle); the two
    top-frequency signals need a per-(doc, term) count, which is a skinny
    explode + two map-side-combinable hash aggregates keyed by the document
    id — linear in corpus token count, no joins wider than the id. At
    100 TB the (doc_id, term) key is near-unique so partial aggregation
    collapses almost everything before the exchange.

    Only documents with at least ``gram_n`` tokens appear (shorter ones
    have no n-gram to profile).
    """
    toks = tokens(text_col)
    grams = _word_grams(toks, gram_n)
    # the tokenized frame feeds THREE consumers (dup fractions + two
    # frequency passes); persist so the split/zip passes run once.
    # Cache lifetime: backs the returned LAZY frame; caller releases
    # after its terminal action (bench.py/driver sim clearCache)
    # r13: spread before the tokenize + n-gram zip folds
    # (functions/partitioning.spread)
    base = (
        spread(df.filter(F.col(text_col).isNotNull())
               .select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), toks.alias("_toks"), grams.alias("_grams"))
        .filter(F.size("_grams") > 0)
        .persist()
    )
    dup = base.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        F.size("_grams").alias("n_grams"),
        F.round(
            1.0 - F.size(F.array_distinct("_grams")).cast("double") / F.size("_grams"),
            6,
        ).alias("dup_gram_frac"),
    )
    top_tok = (
        base.select(F.col(id_col), F.explode("_toks").alias("term"))
        .groupBy(id_col, "term")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top_tok"), F.sum("count").alias("_n_tok"))
        .select(
            F.col(id_col),
            F.round(F.col("_top_tok").cast("double") / F.col("_n_tok"), 6).alias(
                "top_token_frac"
            ),
        )
    )
    top_gram = (
        base.select(F.col(id_col), F.explode("_grams").alias("gram"))
        .groupBy(id_col, "gram")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top_g"), F.sum("count").alias("_n_g"))
        .select(
            F.col(id_col),
            F.round(F.col("_top_g").cast("double") / F.col("_n_g"), 6).alias(
                "top_gram_frac"
            ),
        )
    )
    return dup.join(top_tok, id_col).join(top_gram, id_col)


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution (the CCNet/KenLM-proxy quality score: boilerplate
    and keyword-stuffed docs score high, rare-garbage docs score low).

    Two passes over the skinny (doc_id, token) explode:

    1. vocabulary pass — token -> global count, plus the corpus total folded
       in via a broadcast single-row aggregate (never a driver collect);
    2. scoring pass — tokens join the vocabulary on the token key, then a
       per-document mean of ``ln(count/total)``.

    Scale note: the token-keyed join is the skew point (stopwords are hot).
    The vocabulary side is token-distinct (bounded by |V|, not corpus size)
    and usually broadcastable; when it isn't, AQE's skew-join split handles
    the hot keys — both sides of the join are already partially aggregated
    so the shuffled volume is ~|tokens| + |V|, not quadratic.
    """
    tok = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    )
    # fold per-doc duplicate tokens before the join: (doc, token) counts.
    # r13 (guide §1.2/§2.3): the corpus vocabulary is the SUM of the
    # per-doc counts, so the tokenize+explode pass runs ONCE into doc_tok
    # (persisted — feeds the vocab derivation and the scored join) and
    # the vocab frame aggregates the already-folded counts; identical
    # results. Cache lifetime: backs the returned lazy frame; harness
    # clearCache between queries.
    doc_tok = tok.groupBy(id_col, "token").agg(F.count("*").alias("k")).persist()
    vocab = doc_tok.groupBy("token").agg(F.sum("k").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = doc_tok.join(F.broadcast(vocab), "token").crossJoin(F.broadcast(total))
    logp = F.log(F.col("cnt").cast("double") / F.col("total"))
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            F.round(F.sum(logp * F.col("k")) / F.sum("k"), 6).alias("avg_logprob"),
        )
    )


def cross_doc_gram_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 5, min_df: int = 2
) -> DataFrame:
    """Per-document cross-corpus duplication: the fraction of a document's
    distinct word n-grams that also occur in at least ``min_df - 1`` OTHER
    documents (RefinedWeb-style duplicated-content measure, corpus-internal
    sibling of the train/test ``ngram_overlap`` audit).

    Inverted-index shape: distinct (doc, gram) rows, gram -> document
    frequency, join back, per-doc ratio. At n=5 grams are near-unique so
    df(g) is tiny; the join output equals the explode size — linear. No
    pairwise expansion anywhere (contrast dedup.ngram_jaccard_pairs, which
    needs the pair identities, not just the ratio).
    """
    from ..functions.text import word_shingles

    # the exploded gram frame feeds the df aggregate AND the join probe;
    # persist so the (expensive) shingle pass runs once.
    # Cache lifetime: backs the returned LAZY frame; caller releases
    # after its terminal action (bench.py/driver sim clearCache)
    g = spread(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.col(text_col)),
        id_col,
    ).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    ).persist()
    dfreq = g.groupBy("gram").agg(F.countDistinct(id_col).alias("gram_df"))
    return (
        g.join(dfreq, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum((F.col("gram_df") >= min_df).cast("long"))
            .cast("bigint")
            .alias("shared_grams"),
            F.round(
                F.sum((F.col("gram_df") >= min_df).cast("long")).cast("double")
                / F.count("*"),
                6,
            ).alias("shared_frac"),
        )
    )


def bigram_logprob(
    df: DataFrame, text_col: str, id_col: str, assume_spread: bool = False
) -> DataFrame:
    """Per-document mean bigram log-probability (and perplexity) under the
    corpus's own add-1-smoothed bigram LM — the next step up from
    :func:`unigram_logprob` toward the KenLM-style fluency filters used by
    CCNet/LLaMA data pipelines: unigram scoring rewards any stopword soup,
    while a bigram model demands locally-plausible ORDER.

    ``P(w2 | w1) = (c(w1 w2) + 1) / (c1(w1) + V)`` with c over corpus
    bigrams, c1 the context total derived FROM the bigram table (bounded by
    |bigram vocab|, not corpus size), and V the corpus unigram vocabulary.

    Scale shape: everything is pre-aggregated before any join — (doc,
    bigram) counts join the bigram model on the bigram key (skew at
    stopword pairs -> AQE split; both sides partially aggregated so
    shuffled volume is ~|doc grams| + |model|), the model's context join is
    model-sized, and V folds in as a broadcast single-row aggregate.
    """
    from ..functions.text import word_ngrams

    # r13: spread before the bigram zip pass (functions/partitioning.spread)
    # r14: ``assume_spread=True`` lets a composing caller (e.g.
    # quality_filter_kappa) share ONE spread+persisted (id, text) frame
    # across several scorers instead of paying one full-text exchange per
    # scorer (VERDICT r13 ask #5); results are layout-independent.
    live = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.col(text_col)
    )
    if not assume_spread:
        live = spread(live, id_col)
    bg = live.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n=2)).alias("bg")
    )
    # r13 (guide §1.2/§2.3): the corpus model is the SUM of the per-doc
    # counts, so fold the explode once into (doc, bigram) counts and
    # derive the model frame from that aggregate instead of running the
    # bigram zip+explode pass a second time for a parallel groupBy.
    # ``doc_bg`` is persisted because it feeds both the model derivation
    # (model -> ctx are both pre-broadcast, model-sized) and the final
    # scored join; identical results (sum of per-doc k == corpus count).
    # Cache lifetime: backs the returned lazy frame; harness clearCache.
    doc_bg = bg.groupBy(id_col, "bg").agg(F.count("*").alias("k")).persist()
    model = doc_bg.groupBy("bg").agg(F.sum("k").alias("cnt"))
    ctx = (
        model.select(F.split("bg", " ").getItem(0).alias("w1"), "cnt")
        .groupBy("w1")
        .agg(F.sum("cnt").alias("c1"))
    )
    vocab = live.select(F.explode(tokens(text_col)).alias("token")).agg(
        F.countDistinct("token").alias("v")
    )
    scored = (
        doc_bg.join(F.broadcast(model), "bg")
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .join(F.broadcast(ctx), "w1")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.col("cnt") + 1).cast("double") / (F.col("c1") + F.col("v"))
    )
    avg = F.sum(logp * F.col("k")) / F.sum("k")
    return scored.groupBy(id_col).agg(
        F.sum("k").cast("bigint").alias("n_bigrams"),
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 6).alias("perplexity"),
    )


def gram_novelty_by_doc(
    df: DataFrame, text_col: str, id_col: str, n: int = 5
) -> DataFrame:
    """Directional novelty: for each document, the fraction of its
    distinct word n-grams whose FIRST corpus occurrence (minimum id) is
    this document — i.e. content nobody earlier in the ingest order
    already contributed. The marginal-value curve of a crawl: dataset
    curation reads it to decide when another snapshot stops adding
    content (cross_doc_gram_stats's symmetric cousin, made directional).

    Aggregate-only shape (r11 rework): a gram's minimum id IS the doc it
    is novel for, so instead of joining the gram->min frame back onto the
    |grams|-sized explode (the r10 shape — a second full shingle pass
    plus a gram-keyed shuffle of both sides), fold it straight down:
    per-doc gram counts from one pass, gram -> min(id) from the same
    pass, then count the min-ids — and the only join left is doc-keyed
    over |docs| rows. Volume crossing exchanges drops from ~3|grams| to
    ~2|grams|, and nothing |grams|-sized is ever joined. Fresh-JVM
    measurement in BENCH_NOTES round 11. Returns
    (id, n_grams, novel_grams, novelty_frac).
    """
    from ..functions.text import word_shingles

    # Cache lifetime: the exploded gram frame feeds both aggregates and
    # backs the returned LAZY frame; caller releases after its terminal
    # action (bench.py/driver sim clearCache between queries)
    g = spread(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.col(text_col)),
        id_col,
    ).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    ).persist()
    per_doc = g.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    novel = (
        g.groupBy("gram")
        .agg(F.min(id_col).alias("_first"))
        .groupBy(F.col("_first").alias(id_col))
        .agg(F.count("*").cast("long").alias("novel_grams"))
    )
    return (
        per_doc.join(novel, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce(F.col("novel_grams"), F.lit(0))
            .cast("long")
            .alias("novel_grams"),
        )
        .withColumn(
            "novelty_frac",
            F.round(
                F.col("novel_grams").cast("double") / F.col("n_grams"), 6
            ),
        )
    )


# Gopher rule set (Rae et al. 2021 §A1.1): English stopwords whose
# presence signals natural language. The paper's list.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_len: float = 3.0,
    max_avg_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopwords: int = 2,
    stopwords: tuple = GOPHER_STOPWORDS,
    assume_spread: bool = False,
) -> DataFrame:
    """Per-document Gopher quality-rule flags (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (``#`` and ``...``), and the >= ``min_stopwords`` distinct-stopword
    presence rule; ``keep`` is their conjunction. (The paper's line-level
    bullet/ellipsis rules need a multi-line corpus; on this single-line
    testdata they are vacuous and are omitted rather than faked.
    ``stopwords`` defaults to the paper's list; corpus-facing plans may
    extend it when the corpus vocabulary doesn't contain the paper's
    function words — the same adaptation stance as the span segmenter.)

    All rules are single-pass array/regex expressions in one narrow
    projection — no shuffle, no UDF; a 100 TB scan is embarrassingly
    parallel and column-pruned to (id, text).
    """
    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    avg_len = total_len.cast("double") / n_words
    n_symbols = F.regexp_count(F.col(text_col), F.lit(r"#|\.\.\."))
    symbol_ratio = n_symbols.cast("double") / n_words
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in stopwords]),
        )
    )
    flag_words = (n_words >= min_words) & (n_words <= max_words)
    flag_avg = (avg_len >= min_avg_len) & (avg_len <= max_avg_len)
    flag_symbol = symbol_ratio < max_symbol_ratio
    flag_stop = n_stop >= min_stopwords
    # r13: spread before the 4 tokenize/fold/intersect rule passes
    # (functions/partitioning.spread). r14: ``assume_spread=True`` lets a
    # composing caller share one spread+persisted (id, text) frame across
    # scorers (VERDICT r13 ask #5); results are layout-independent.
    df = df.select(F.col(id_col), F.col(text_col))
    if not assume_spread:
        df = spread(df, id_col)
    return df.filter(n_words > 0).select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(avg_len, 6).alias("avg_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        n_stop.alias("n_stopwords_present"),
        flag_words.alias("pass_word_count"),
        flag_avg.alias("pass_avg_word_len"),
        flag_symbol.alias("pass_symbol_ratio"),
        flag_stop.alias("pass_stopwords"),
        (flag_words & flag_avg & flag_symbol & flag_stop).alias("keep"),
    )


def filter_funnel(
    df: DataFrame,
    text_col: str,
    id_col: str,
    stages: list | None = None,
    stopwords: tuple = GOPHER_STOPWORDS,
) -> DataFrame:
    """Sequential filter-funnel attrition report: how many documents
    survive each successive curation stage (the per-stage accounting
    every pipeline paper publishes — e.g. RefinedWeb fig. 2). Stages are
    (name, boolean Column) evaluated CUMULATIVELY (stage k's survivors
    must also pass 1..k-1), defaulting to exact-dedup then the Gopher
    rules in severity order.

    One narrow projection computes every stage flag, one aggregate sums
    the cumulative conjunctions, and a ``stack`` unpivots to
    (stage_no, stage, survivors) — a single scan regardless of stage
    count; the only shuffle is the exact-dedup first-occurrence check
    (digest-keyed, map-side-combined).
    """
    flags = gopher_quality_flags(df, text_col, id_col, stopwords=stopwords)
    # exact-dedup stage: keep = first doc (min id) with this text digest
    digest = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_digest")
    )
    firsts = digest.groupBy("_digest").agg(F.min(id_col).alias("_keep_id"))
    is_first = (
        digest.join(firsts, "_digest")
        .select(
            F.col(id_col),
            (F.col(id_col) == F.col("_keep_id")).alias("pass_exact_dedup"),
        )
    )
    staged = flags.join(is_first, id_col)
    names = [
        "pass_exact_dedup",
        "pass_word_count",
        "pass_avg_word_len",
        "pass_symbol_ratio",
        "pass_stopwords",
    ]
    cum = []
    acc = F.lit(True)
    for n in names:
        acc = acc & F.col(n)
        cum.append(F.sum(acc.cast("long")).alias(f"_c_{n}"))
    totals = staged.agg(F.count("*").alias("_c_total"), *cum)
    stack_args = ", ".join(
        ["0, 'total', _c_total"]
        + [f"{i + 1}, '{n}', _c_{n}" for i, n in enumerate(names)]
    )
    return totals.selectExpr(
        f"stack({len(names) + 1}, {stack_args}) "
        "as (stage_no, stage, survivors)"
    )


def distinct_ngram_diversity(
    df: DataFrame, text_col: str, group_col: str = "source", n: int = 2
) -> DataFrame:
    """Per-source distinct-n diversity (Li et al. 2016 'distinct-2'): the
    corpus-level ratio of DISTINCT word n-grams to total n-grams, the
    standard mode-collapse / templated-content signal (a source whose
    documents endlessly reuse phrasing scores low even when no two docs
    are exact dups).

    Shape: grams explode once, then one source-keyed aggregate
    (count + approx-free exact distinct via count(DISTINCT) — the
    shuffle carries (source, gram) pairs, partially aggregated map-side).
    """
    from ..functions.text import word_ngrams

    # r13: spread before the n-gram zip pass; keyed on a deterministic
    # text hash because the grouping key is low-cardinality (sources)
    # and would put whole sources on single tasks (guide §2.5)
    grams = spread(
        df.select(F.col(group_col), F.col(text_col)),
        F.xxhash64(F.col(text_col)),
    ).select(
        F.col(group_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    return (
        grams.groupBy(group_col)
        .agg(
            F.count("*").alias("total_ngrams"),
            F.countDistinct("gram").alias("distinct_ngrams"),
        )
        .withColumn(
            "distinct_ratio",
            F.round(F.col("distinct_ngrams") / F.col("total_ngrams"), 6),
        )
    )


def repetition_signals(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 10),
    top_thresholds: tuple = (0.20, 0.18, 0.16),
    dup_thresholds: tuple = (0.15, 0.10),
) -> DataFrame:
    """Per-document Gopher REPETITION signals (Rae et al. 2021 §A1.1,
    "repetition removal" — the half of the Gopher rules
    ``gopher_quality_flags`` does not cover):

    - ``top{n}_frac`` for n in ``top_ns``: fraction of the document's
      characters contained in occurrences of its single most frequent
      word n-gram (count * chars-of-gram / doc chars), PROVIDED it
      occurs more than once — a unique n-gram is not repetition, and
      without the count>1 gate every short document trips the rule
      (its top 4-gram alone is a large char share of a 10-word doc);
    - ``dup{n}_frac`` for n in ``dup_ns``: fraction contained in ALL
      occurrences of n-grams appearing more than once;
    - ``rep_keep``: True iff every fraction is under its paper threshold
      (0.20/0.18/0.16 for top 2/3/4-grams, 0.15/0.10 for dup 5/10-grams).

    The paper's duplicate line / paragraph fractions need a multi-line
    corpus; on this single-line testdata they are vacuous and omitted
    rather than faked (same stance as gopher_quality_flags' bullet
    rules). Character accounting follows the common open
    implementations: occurrences are counted independently (overlapping
    occurrences may double-count chars), so fractions are clamped at 1.

    Scale shape: one union of |top_ns|+|dup_ns| n-gram explodes, then
    two doc-keyed combinable aggregations ((doc, n, gram) counts ->
    (doc, n) max/sum -> doc pivot). Everything is keyed by doc_id —
    no cross-document shuffle, no hot keys, embarrassingly parallel at
    corpus scale; gram strings never leave their doc's partition chain.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    toks = tokens(F.col(text_col))
    # r13: spread before the tokenize pass; the 5 per-n gram levels each
    # re-read this subtree, and with an identical exchange below them the
    # tokenize runs once map-side and the levels read a ReusedExchange
    # instead of 5 serialized re-tokenizations (functions/partitioning)
    base = (
        spread(
            df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), F.col(text_col)),
            id_col,
        )
        .select(
            F.col(id_col),
            F.length(text_col).alias("_chars"),
            toks.alias("_toks"),
        )
        .filter(F.size("_toks") > 0)
    )
    levels = None
    for n in all_ns:
        lv = base.select(
            id_col,
            F.lit(n).alias("_n"),
            # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark (step
            # defaults to -1 when stop < start), which would feed slice a
            # start of 0 and crash on any doc shorter than n tokens —
            # emit an empty gram array for such docs instead
            F.explode(
                F.expr(
                    f"if(size(_toks) >= {n},"
                    f" transform(sequence(1, size(_toks) - {n - 1}),"
                    f" i -> array_join(slice(_toks, i, {n}), ' ')),"
                    f" array())"
                )
            ).alias("_gram"),
        )
        levels = lv if levels is None else levels.unionByName(lv)
    counts = levels.groupBy(id_col, "_n", "_gram").agg(
        F.count("*").alias("_cnt")
    )
    per_n = counts.groupBy(id_col, "_n").agg(
        F.max(
            F.when(F.col("_cnt") > 1, F.col("_cnt") * F.length("_gram"))
        ).alias("_top_chars"),
        F.sum(
            F.when(F.col("_cnt") > 1, F.col("_cnt") * F.length("_gram"))
        ).alias("_dup_chars"),
    )
    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(F.when(F.col("_n") == n, F.col("_top_chars"))).alias(
                f"_top{n}"
            )
        )
    for n in dup_ns:
        aggs.append(
            F.max(F.when(F.col("_n") == n, F.col("_dup_chars"))).alias(
                f"_dup{n}"
            )
        )
    wide = per_n.groupBy(id_col).agg(*aggs)
    out = base.select(id_col, "_chars").join(wide, id_col, "left")
    keep = F.lit(True)
    cols = [F.col(id_col)]
    for n, thr in zip(top_ns, top_thresholds):
        frac = F.round(
            F.least(
                F.coalesce(F.col(f"_top{n}"), F.lit(0)).cast("double")
                / F.col("_chars"),
                F.lit(1.0),
            ),
            6,
        )
        cols.append(frac.alias(f"top{n}_frac"))
        keep = keep & (frac < thr)
    for n, thr in zip(dup_ns, dup_thresholds):
        frac = F.round(
            F.least(
                F.coalesce(F.col(f"_dup{n}"), F.lit(0)).cast("double")
                / F.col("_chars"),
                F.lit(1.0),
            ),
            6,
        )
        cols.append(frac.alias(f"dup{n}_frac"))
        keep = keep & (frac < thr)
    cols.append(keep.alias("rep_keep"))
    return out.select(*cols)
