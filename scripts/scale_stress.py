#!/usr/bin/env python
"""Scale-stress the dedup / ANN tiers: sf0.1 vs a derived 10x corpus.

The driver ships sf0.1 as the largest testdata; the 100 TB claims rest on
HOW each tier's cost grows, so this harness derives a deterministic 10x
corpus (50k docs / 20k vectors) from sf0.1 by replication-with-perturbation
— every original document gains 9 near-duplicate variants (~10% of tokens
rewritten, so variant groups sit well above the 0.5 Jaccard cutoff), every
vector gains 9 small-noise neighbors — and times each tier at both scales.

Derived data lands in _scale/ (gitignored — derived artifact, regenerated
on demand). Run: python scripts/scale_stress.py; one JSON line per
(tier, scale) plus a summary with growth factors. Used to produce SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = "/root/testdata/sf0.1"
OUT_DIR = os.path.join(REPO, "_scale", "sf1x")
REPLICAS = 10
SEED = 42


def build_derived() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)

    docs = pq.read_table(os.path.join(SRC_SF, "documents.parquet"))
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()

    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for r in range(REPLICAS):
        for pos, (i, t) in enumerate(zip(ids, texts)):
            if r == 0 or t is None:
                nt = t
            else:
                toks = t.split(" ")
                # rewrite ~10% of tokens deterministically: variant groups
                # stay near-dups of each other (Jaccard ~0.8 vs original)
                for j in range(len(toks)):
                    if (i + j + r) % 10 == 0:
                        toks[j] = f"{toks[j]}v{r}"
                nt = " ".join(toks)
            out["doc_id"].append(i * 16 + r)
            out["text"].append(nt)
            out["lang"].append(langs[pos])
            out["source"].append(sources[pos])
            out["n_chars"].append(len(nt) if nt is not None else None)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
            }
        ),
        os.path.join(OUT_DIR, "documents.parquet"),
    )

    emb = pq.read_table(os.path.join(SRC_SF, "embeddings.parquet"))
    vids = emb.column("vec_id").to_pylist()
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = emb.column("label").to_pylist()
    all_ids, all_vecs, all_labels = [], [], []
    for r in range(REPLICAS):
        noise = (
            np.zeros_like(vecs)
            if r == 0
            else rng.normal(0, 0.02, vecs.shape).astype(np.float32)
        )
        all_ids.extend(v * 16 + r for v in vids)
        all_vecs.append(vecs + noise)
        all_labels.extend(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(all_ids, pa.int64()),
                "embedding": pa.array(
                    np.concatenate(all_vecs).tolist(),
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(all_labels, pa.int32()),
            }
        ),
        os.path.join(OUT_DIR, "embeddings.parquet"),
    )


def build_derived_events() -> None:
    """10x events: each replica is a fresh user population (user_id/event_id
    offset), timestamps unchanged — funnel/cohort cost scales with users."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT_DIR, exist_ok=True)
    ev = pq.read_table(os.path.join(SRC_SF, "events.parquet"))
    cols = {c: ev.column(c).to_pylist() for c in ev.column_names}
    out: dict[str, list] = {c: [] for c in ev.column_names}
    for r in range(REPLICAS):
        for i in range(ev.num_rows):
            out["event_id"].append(cols["event_id"][i] * 16 + r)
            out["user_id"].append(cols["user_id"][i] * 16 + r)
            for c in ("ts", "event_type", "value", "props"):
                out[c].append(cols[c][i])
    pq.write_table(
        pa.table(
            {c: pa.array(out[c], ev.schema.field(c).type) for c in ev.column_names}
        ),
        os.path.join(OUT_DIR, "events.parquet"),
    )


def main() -> None:
    if not os.path.exists(os.path.join(OUT_DIR, "embeddings.parquet")):
        build_derived()
    if not os.path.exists(os.path.join(OUT_DIR, "events.parquet")):
        build_derived_events()

    from pyspark.sql import functions as F

    from spark_streaming_project_spark.operators import dedup as D
    from spark_streaming_project_spark.operators import similarity as S
    from spark_streaming_project_spark.operators.graph import connected_components
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="scale_stress")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    only = set(sys.argv[1:])  # optional tier-name filter: run a subset
    results: list[dict] = []

    def run(tier: str, scale: str, fn, extra: dict | None = None) -> None:
        if only and tier not in only:
            return
        t0 = time.perf_counter()
        n = fn().count()
        sec = round(time.perf_counter() - t0, 2)
        row = {"tier": tier, "scale": scale, "rows_out": n, "sec": sec}
        if extra:
            row.update(extra)
        results.append(row)
        print(json.dumps(row), flush=True)
        # operators persist() shared intermediates and return lazy frames;
        # release between tiers so each measurement owns its working set
        spark.catalog.clearCache()

    def single_table_ndup(emb, dim: int, bits: int = 6, threshold: float = 0.2):
        """MEASUREMENT COMPARATOR ONLY: the pre-round-4 single-wide-table
        candidate scheme (one ``bits``-bit hyperplane table, vectors carried
        through the bucket self-join), kept here so SCALE.md can show the
        within-bucket n^2/2^bits blowup the banded scheme replaces."""
        from spark_streaming_project_spark.functions.vectors import as_double, dot, norm

        b = (
            emb.select(
                "vec_id",
                as_double("embedding").alias("v"),
                S.hyperplane_bucket("embedding", dim, bits).alias("bucket"),
            )
            .withColumn("nrm", norm(F.col("v")))
            .persist()
        )
        left = b.select(
            F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
            F.col("nrm").alias("na"), "bucket",
        )
        right = b.select(
            F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
            F.col("nrm").alias("nb"), "bucket",
        )
        n = F.col("na") * F.col("nb")
        sim = F.round(F.when(n > 0, dot(F.col("va"), F.col("vb")) / n), 6)
        return (
            left.join(right, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", sim.alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold)
        )

    for scale, ddir in (("sf0.1", SRC_SF), ("10x", OUT_DIR)):
        docs = spark.read.parquet(os.path.join(ddir, "documents.parquet"))
        emb = spark.read.parquet(os.path.join(ddir, "embeddings.parquet"))
        qid = int(emb.select(F.min("vec_id")).collect()[0][0])
        dim = 64

        run("dedup_exact", scale, lambda: D.exact_dedup_groups(docs, "text", "doc_id"))
        run("dedup_minhash_lsh", scale,
            lambda: D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5))
        run("dedup_simhash", scale,
            lambda: D.simhash_near_dup_pairs(docs, "text", "doc_id"))
        run("ngram_inverted", scale,
            lambda: D.ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.5))
        run("ngram_prefix", scale,
            lambda: D.ngram_jaccard_pairs_prefix(docs, "text", "doc_id", 3, 0.5))
        # driver_threshold=0: measure the DISTRIBUTED pointer-jumping loop
        # (the operator's default adaptively collapses graphs this small
        # into a driver union-find, which would measure nothing)
        run("canonical_cc", scale, lambda: connected_components(
            D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5),
            driver_threshold=0))
        run("ann_bruteforce", scale,
            lambda: S.brute_force_topk(emb, "vec_id", "embedding", qid))
        run("ann_lsh_multitable", scale, lambda: S.lsh_multitable_topk(
            emb, "vec_id", "embedding", qid, dim))
        run("ann_ivf", scale,
            lambda: S.ivf_topk(emb, "vec_id", "embedding", qid))
        run("emb_ndup_single6bit", scale,
            lambda: single_table_ndup(emb, dim))
        run("emb_ndup_banded", scale, lambda: S.banded_ndup_pairs(
            emb, "vec_id", "embedding", dim, threshold=0.2))

        # decontamination overlap: md5 train/test split as the registered
        # query; the derived 10x corpus multiplies every gram's df by ~10,
        # so the uncapped inverted join shows the df^2 growth and the
        # hot-gram cap is the guard (drops grams in > max_right_df eval docs)
        from pyspark.sql import functions as _F

        from spark_streaming_project_spark.operators.sampling import ngram_overlap

        _h = _F.substring(_F.md5(_F.col("doc_id").cast("string")), 1, 1)
        _nn = docs.filter(_F.col("text").isNotNull())
        run("decon_overlap", scale, lambda: ngram_overlap(
            _nn.filter(_h <= "b"), _nn.filter(_h > "d"), "text", "doc_id", n=5))
        run("decon_overlap_capped", scale, lambda: ngram_overlap(
            _nn.filter(_h <= "b"), _nn.filter(_h > "d"), "text", "doc_id",
            n=5, max_right_df=20))

        # -- quality / ordering / incremental tiers (round 4, session 2) --
        from spark_streaming_project_spark.operators.quality import (
            cross_doc_gram_stats,
            repetition_stats,
            unigram_logprob,
        )
        from spark_streaming_project_spark.operators.sampling import shuffle_shards

        run("repetition_stats", scale,
            lambda: repetition_stats(docs, "text", "doc_id"))
        run("unigram_logprob", scale,
            lambda: unigram_logprob(docs, "text", "doc_id"))
        run("cross_doc_gram", scale,
            lambda: cross_doc_gram_stats(docs, "text", "doc_id", n=5))
        run("shuffle_shards", scale,
            lambda: shuffle_shards(docs.select("doc_id"), "doc_id", n_shards=32))
        # incremental ingest probe: lower-half corpus indexes, upper-half batch
        run("incremental_dedup", scale, lambda: D.incremental_dedup_verdicts(
            docs.filter(_h <= "7"), docs.filter(_h > "7"), "text", "doc_id"))
        # SemDeDup: fixed k shows the n^2/k within-cluster growth; scaling
        # bits with n (k ~ n) is the documented 100 TB remedy — measure both
        run("semdedup_bits6", scale, lambda: S.semdedup_prune(
            emb, "vec_id", "embedding", dim, threshold=0.2, bits=6))
        run("semdedup_bits_scaled", scale, lambda: S.semdedup_prune(
            emb, "vec_id", "embedding", dim, threshold=0.2,
            bits=6 if scale == "sf0.1" else 9))

        # -- retrieval / analytics tiers (round 4, session 3) -------------
        # tfidf/bm25/zipf are token-linear (explode + combinable aggregates);
        # funnel/cohort reduce per-user before anything global; spearman's
        # cost is the per-source rank sorts.
        from spark_streaming_project_spark.functions.text import token_count
        from spark_streaming_project_spark.operators.funnel import (
            cohort_retention,
            funnel_conversion,
        )
        from spark_streaming_project_spark.operators.profiling import spearman_corr
        from spark_streaming_project_spark.operators.retrieval import (
            bm25_scores,
            tfidf_top_terms,
            zipf_profile,
        )

        ev = spark.read.parquet(os.path.join(ddir, "events.parquet"))
        run("tfidf_top_terms", scale,
            lambda: tfidf_top_terms(docs, "text", "doc_id", k=3))
        run("bm25_search", scale, lambda: bm25_scores(
            docs, "text", "doc_id", ["spark", "window", "vector"]))
        run("zipf_profile", scale,
            lambda: zipf_profile(docs, "text", "doc_id", top_n=100))
        run("funnel", scale,
            lambda: funnel_conversion(ev, ["view", "click", "purchase"]))
        run("cohort_retention", scale, lambda: cohort_retention(ev))
        run("spearman", scale, lambda: spearman_corr(
            docs.filter(F.col("text").isNotNull()
                        & F.col("n_chars").isNotNull()),
            "source", F.col("n_chars"), token_count("text")))

        # -- collocation / drift / tokenizer tiers (round 4, session 3) ---
        from spark_streaming_project_spark.plans.quality import (
            pmi_collocations as _pmi_q,
            source_drift_kl as _kl_q,
        )
        from spark_streaming_project_spark.operators.bpe import bpe_train_merges

        ddir_ = ddir
        run("pmi_collocations", scale, lambda: _pmi_q(spark, ddir_))
        run("source_drift_kl", scale, lambda: _kl_q(spark, ddir_))

        def _bpe():
            # merges list -> 1-row frame so run() can count() uniformly;
            # the measured work is the 6 training rounds
            m = bpe_train_merges(docs, "text", n_merges=6)
            return spark.createDataFrame([(len(m),)], "n int")

        run("bpe_train_6", scale, _bpe)
        from spark_streaming_project_spark.operators.similarity import ivfpq_topk

        qid_ = qid
        run("ivfpq_topk", scale, lambda: ivfpq_topk(
            emb, "vec_id", "embedding", qid_, k=10))

        # -- round-5 tiers: exact substring dedup + mergeable quantiles ---
        # The 10x corpus is replication-with-perturbation, so every ~10-
        # token unperturbed stretch (~60 chars) is shared across the 10
        # variants of a doc: exact-substring output grows ~C(10,2)x per
        # group — the output-bound regime (the honest cost shape), with
        # the hot_cap comparator showing the boilerplate guard's effect.
        run("exact_substring", scale, lambda: D.exact_substring_pairs(
            docs, "text", "doc_id", min_len=40))
        run("exact_substring_hotcap", scale, lambda: D.exact_substring_pairs(
            docs, "text", "doc_id", min_len=40, hot_cap=12))
        from spark_streaming_project_spark.operators.quantiles import (
            ddsketch_build, ddsketch_quantiles)
        ev_ = spark.read.parquet(os.path.join(ddir, "events.parquet"))
        run("ddsketch_quantiles", scale, lambda: ddsketch_quantiles(
            ddsketch_build(ev_, "value", ["event_type"]),
            [0.5, 0.95, 0.99], ["event_type"]))

        # -- round-5 session-3 tiers: DSIR, graph census, MMR --------------
        # DSIR: one explode scan + 64-row broadcast model + top-k — should
        # track corpus token count (~1x growth per 10x rows at fixed work
        # per token). Triangle census runs on the 0.5-Jaccard pair graph:
        # the derived corpus makes every variant group a 10-clique, so the
        # edge/triangle OUTPUT grows ~45x/~120x per group — output-bound,
        # like exact-substring; the harness records both runtime and rows.
        from spark_streaming_project_spark.operators.sampling import (
            dsir_log_weights, dsir_resample)
        from spark_streaming_project_spark.operators.graph import triangle_stats

        docs_ = docs
        run("dsir_select", scale, lambda: dsir_resample(
            dsir_log_weights(
                docs_, "text", "doc_id",
                _F.col("source").isin("src0", "src1", "src2")),
            "doc_id", k=100))
        run("neardup_triangles", scale, lambda: triangle_stats(
            D.ngram_jaccard_pairs_adaptive(
                docs_, "text", "doc_id", n=3, threshold=0.5),
            "id_a", "id_b"))
        run("mmr_topk", scale, lambda: S.mmr_topk(
            emb, "vec_id", "embedding", qid_, k=10, shortlist=50))

        # -- round-5 session-4 tiers: winnowing, bigram LM, logreg ---------
        # Winnowing: explode + one per-doc window sort — token-linear, no
        # cross-doc interaction. Bigram LM: model-keyed join; model size
        # grows sub-linearly (Heaps), scan linearly. Logreg: per iteration
        # one integer-gradient aggregate over |docs|*(B+1) skinny rows —
        # token-linear feature build + doc-linear iterations.
        from spark_streaming_project_spark.operators.classifier import (
            hashed_bucket_features, logreg_train_quantized)
        from spark_streaming_project_spark.operators.quality import (
            bigram_logprob)
        from spark_streaming_project_spark.operators.textstats import (
            winnow_fingerprints)

        # winnowing is per-doc array work with NO shuffle, so its
        # parallelism equals scan parallelism; the derived corpus is 1-2
        # parquet files, which would serialize the measurement in a way a
        # real many-file scan never does. repartition models the scan
        # fan-out (its shuffle cost is INCLUDED in the recorded time).
        run("winnowing", scale, lambda: winnow_fingerprints(
            docs_.repartition(32), "text", "doc_id", k=3, w=4))
        run("bigram_lm", scale, lambda: bigram_logprob(
            docs_, "text", "doc_id"))

        from spark_streaming_project_spark.operators.graph import (
            kcore_subgraph)

        run("neardup_kcore", scale, lambda: kcore_subgraph(
            D.ngram_jaccard_pairs_adaptive(
                docs_, "text", "doc_id", n=3, threshold=0.5),
            "id_a", "id_b", k=2, rounds=8))

        def _logreg():
            feats = hashed_bucket_features(
                docs_, "text", "doc_id",
                _F.col("source").isin("src0", "src1", "src2"), n_buckets=32)
            w = logreg_train_quantized(feats, n_buckets=32, iters=3)
            # count as the action; weights themselves are driver-side
            return feats.limit(1)

        run("logreg_train3", scale, _logreg)

        # -- round-6 tiers: span dedup, containment audit, exact AUC -------
        # Span dedup: one span_hash-keyed shuffle + co-partitioned join
        # back — token-linear. Containment: src0 grams join the DISTINCT
        # train gram set — output bounded by eval-side grams. AUC: scoring
        # scan + distinct-score aggregate + range-partitioned rank prefix;
        # weights held FIXED so the row isolates evaluation (training has
        # its own logreg_train3 row).
        from spark_streaming_project_spark.operators.classifier import (
            auc_exact, logreg_score)
        from spark_streaming_project_spark.operators.dedup import (
            span_dedup_stats)
        from spark_streaming_project_spark.functions.text import word_ngrams

        run("span_dedup", scale, lambda: span_dedup_stats(
            docs_.repartition(32), "text", "doc_id", span_words=10))

        def _containment():
            sh = docs_.select(
                "doc_id", "source",
                _F.array_distinct(word_ngrams(_F.col("text"), 5)).alias("sh"),
            )
            ev = sh.filter(
                (_F.col("source") == "src0") & (_F.size("sh") > 0)
            ).select("doc_id", _F.size("sh").alias("n"),
                     _F.explode("sh").alias("gram"))
            tr = sh.filter(_F.col("source") != "src0").select(
                _F.explode("sh").alias("gram")).distinct() \
                .withColumn("_hit", _F.lit(1))
            return ev.join(tr, "gram", "left").groupBy("doc_id").agg(
                _F.first("n").alias("n"),
                _F.sum(_F.coalesce("_hit", _F.lit(0))).alias("shared"))

        run("containment_audit", scale, _containment)

        def _auc():
            feats = hashed_bucket_features(
                docs_, "text", "doc_id",
                _F.col("source").isin("src0", "src1", "src2"), n_buckets=32)
            scored = logreg_score(feats, [0.01] * 33, "doc_id")
            return auc_exact(scored, "prob", "y")

        run("auc_exact", scale, _auc)

        # -- round-6 session-2 tiers: PII scrub, hybrid RRF, cluster splits.
        # PII: pure regexp projection — the aggregate forces evaluation of
        # every count/redaction column (a bare count() would let Catalyst
        # prune the regex work away). RRF / splits: the registered plan
        # builders run against the derived dir (documents.parquet is the
        # only table they read).
        from spark_streaming_project_spark.operators.pii import (
            pii_redact, pii_scan)
        from spark_streaming_project_spark.plans import REGISTRY as _REG

        ddir_ = ddir

        def _pii():
            scanned = pii_redact(
                pii_scan(docs_.repartition(32), "text"),
                "text", out_col="redacted")
            return scanned.agg(
                _F.sum("pii_total_n").alias("hits"),
                _F.sum(_F.length("redacted")).alias("chars"))

        run("pii_scrub", scale, _pii)
        run("hybrid_rrf", scale,
            lambda: _REG["hybrid_rrf_search"].builder(spark, ddir_))
        run("leakage_splits", scale,
            lambda: _REG["leakage_safe_splits"].builder(spark, ddir_))

        # -- round-6 session-3 tier: bloom build+probe. Build is one
        # digest scan collapsed to <=261 words; probe is a map-only scan
        # against the broadcast word array (corpus never shuffles), so
        # the tier should scale with scan cost alone.
        from spark_streaming_project_spark.operators.bloom import (
            bloom_build, bloom_probe)

        def _bloom():
            hist = docs_.select(_F.md5("text").alias("h"))
            blm = bloom_build(hist, "h", num_bits=1 << 17)
            probes = hist.unionByName(
                docs_.select(
                    _F.md5(_F.concat("text", _F.lit("#v2"))).alias("h")))
            return bloom_probe(probes, "h", blm, num_bits=1 << 17).filter(
                _F.col("probably_seen"))

        run("bloom_dedup", scale, _bloom)

        # -- round-6 session-3 tier: sorted-neighborhood blocking over
        # the doc corpus (sort by text prefix + reversed prefix). Cost
        # per pass: one range shuffle + block equi-join — rank comes
        # from the range-partitioned running count, never a global
        # single-task window.
        from spark_streaming_project_spark.operators.dedup import (
            sorted_neighborhood_pairs)

        def _snm():
            base = docs_.select(
                "doc_id", _F.substring("text", 1, 40).alias("pfx"))
            return sorted_neighborhood_pairs(
                base, "doc_id",
                {"fwd": _F.col("pfx"), "rev": _F.reverse(_F.col("pfx"))},
                window=5)

        run("snm_blocking", scale, _snm)

        # -- round-6 session-3 tier: one-pass NB train + score. Training
        # is one (token,label) aggregate + vocab-linear dense grid;
        # scoring joins the broadcast model and sums BIGINTs per
        # (doc,label).
        from spark_streaming_project_spark.operators.classifier import (
            nb_predict, nb_train_quantized)

        def _nb():
            model, priors = nb_train_quantized(
                docs_, "text", "doc_id", "source")
            return nb_predict(docs_, model, priors, "text", "doc_id")

        run("nb_train_score", scale, _nb)

        # -- round-6 session-3 tier: embedding outlier flags (quantized
        # dot products; centroid frames are labels x dim, broadcast).
        run("embedding_outliers", scale,
            lambda: _REG["embedding_outliers"].builder(spark, ddir_))

        # -- round-6 session-3 tier: per-node clustering over the
        # near-dup graph (shares the census's oriented joins + a corner
        # explode — OUTPUT-bound on the derived clique-heavy corpus).
        from spark_streaming_project_spark.operators.graph import (
            local_clustering)

        run("local_clustering", scale, lambda: local_clustering(
            D.ngram_jaccard_pairs_adaptive(
                docs_, "text", "doc_id", n=3, threshold=0.5),
            "id_a", "id_b"))

    # -- connected-components pathological topologies ----------------------
    # The easy regime (many near-clique clusters) converges in 2-4 rounds;
    # the O(log n) pointer-jumping claim is only interesting where diameter
    # is large (one long chain) or one component swallows the graph (ER
    # random graph above the giant-component threshold, avg degree 4).
    def chain_edges(n: int):
        return spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )

    def er_edges(n: int, m: int):
        # deterministic pseudo-random endpoints; self-loops dropped
        return (
            spark.range(m)
            .select(
                (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % n).alias("id_a"),
                (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % n).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )

    for scale, n_nodes in (("sf0.1", 100_000), ("10x", 1_000_000)):
        st: dict = {}
        run("cc_chain", scale, lambda: connected_components(
            chain_edges(n_nodes), driver_threshold=0, stats=st), extra=st)
        st2: dict = {}
        run("cc_giant_er", scale, lambda: connected_components(
            er_edges(n_nodes, 2 * n_nodes), driver_threshold=0, stats=st2),
            extra=st2)
        from spark_streaming_project_spark.operators.graph import pagerank

        run("pagerank_er_10it", scale, lambda: pagerank(
            er_edges(n_nodes, 2 * n_nodes), "id_a", "id_b", iters=10))

    by_tier: dict[str, dict[str, float]] = {}
    for r in results:
        by_tier.setdefault(r["tier"], {})[r["scale"]] = r["sec"]
    summary = {
        t: {
            **v,
            "growth": round(v["10x"] / v["sf0.1"], 1) if v.get("sf0.1") else None,
        }
        for t, v in by_tier.items()
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
