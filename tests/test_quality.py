"""Unit/property tests for the corpus-quality operators (operators/quality.py)
and the shuffle-shard / SemDeDup ordering-and-pruning pair: exact values on
crafted fixtures, then the invariants that must hold on real testdata
(permutation completeness, per-pair survivor, determinism)."""

from __future__ import annotations

import pytest

import math
import os

from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.quality import (
    cross_doc_gram_stats,
    repetition_stats,
    unigram_logprob,
)
from spark_streaming_project_spark.operators.sampling import shuffle_shards
from spark_streaming_project_spark.operators.similarity import semdedup_prune
from spark_streaming_project_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


def _toy_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_exact_values(spark):
    # "a a a b": tokens [a,a,a,b]; bigrams [a a, a a, a b]
    out = repetition_stats(
        _toy_docs(spark, [(1, "a a a b")]), "text", "doc_id", gram_n=2
    ).collect()[0]
    assert out["n_tokens"] == 4
    assert out["n_grams"] == 3
    # 2 distinct of 3 bigrams -> dup fraction 1/3
    assert abs(out["dup_gram_frac"] - round(1 - 2 / 3, 6)) < 1e-9
    assert abs(out["top_token_frac"] - 0.75) < 1e-9  # "a" 3 of 4
    assert abs(out["top_gram_frac"] - round(2 / 3, 6)) < 1e-9  # "a a" 2 of 3


def test_repetition_stats_skips_short_docs(spark):
    rows = [(1, "solo"), (2, None), (3, "two tokens")]
    out = repetition_stats(_toy_docs(spark, rows), "text", "doc_id")
    assert [r["doc_id"] for r in out.collect()] == [3]


def test_unigram_logprob_exact_values(spark):
    # corpus tokens: a a a b  => p(a)=3/4, p(b)=1/4
    rows = [(1, "a a"), (2, "a b")]
    out = {
        r["doc_id"]: r for r in unigram_logprob(
            _toy_docs(spark, rows), "text", "doc_id"
        ).collect()
    }
    la, lb = math.log(3 / 4), math.log(1 / 4)
    assert out[1]["n_tokens"] == 2
    assert abs(out[1]["avg_logprob"] - round(la, 6)) < 1e-6
    assert abs(out[2]["avg_logprob"] - round((la + lb) / 2, 6)) < 1e-6


def test_cross_doc_gram_stats_ground_truth(spark):
    # doc1/doc2 share exactly the 5-gram "a b c d e"; doc3 is disjoint
    rows = [
        (1, "a b c d e x"),
        (2, "z a b c d e"),
        (3, "p q r s t u"),
    ]
    out = {
        r["doc_id"]: r
        for r in cross_doc_gram_stats(
            _toy_docs(spark, rows), "text", "doc_id", n=5, min_df=2
        ).collect()
    }
    assert out[1]["n_grams"] == 2 and out[1]["shared_grams"] == 1
    assert abs(out[1]["shared_frac"] - 0.5) < 1e-9
    assert out[3]["shared_grams"] == 0


def test_shuffle_shards_is_complete_deterministic_permutation(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    n = docs.count()
    out = shuffle_shards(docs, "doc_id", n_shards=8, seed="s1")
    rows = out.collect()
    assert len(rows) == n  # every row placed exactly once
    assert {r["shard"] for r in rows} <= set(range(8))
    # dense in-shard positions 1..len(shard)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic across reruns
    again = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(docs, "doc_id", n_shards=8, seed="s1").collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_shuffle_shards_seed_changes_order(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(docs, "doc_id", seed="epoch0").collect()
    }
    b = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shards(docs, "doc_id", seed="epoch1").collect()
    }
    assert a != b  # a new seed is a new permutation


def test_semdedup_every_near_dup_pair_loses_exactly_one_side(spark):
    emb = load_table(spark, SF, "embeddings")
    out = semdedup_prune(emb, "vec_id", "embedding", dim=64, threshold=0.2)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == emb.count()  # verdict for every vector
    kept = {v for v, r in rows.items() if r["kept"]}
    assert kept and len(kept) < len(rows)  # prunes something, not everything
    # recompute ground-truth near-dup pairs within each cluster and check:
    # no pair above threshold survives with BOTH endpoints kept
    import numpy as np

    vecs = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), rows[r["vec_id"]])
        for r in emb.collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for vid, (_, r) in vecs.items():
        by_cluster.setdefault(r["cluster"], []).append(vid)
    checked_pairs = 0
    for members in by_cluster.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                va, vb = vecs[a][0], vecs[b][0]
                cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                if round(cos, 6) >= 0.2:
                    checked_pairs += 1
                    assert not (a in kept and b in kept), (a, b, cos)
    assert checked_pairs > 0  # the fixture actually exercises the prune


def test_semdedup_drops_the_centroid_prototypical_member(spark):
    """Toy cluster: two near-identical vectors + one offset vector. The pair
    member MORE similar to the centroid is the one dropped."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.01, 0.0, 0.0]),
        (3, [0.6, 0.8, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semdedup_prune(
            emb, "vec_id", "embedding", dim=4, threshold=0.999, bits=1
        ).collect()
    }
    # only the (1,2) pair clears cosine 0.999; exactly one of them survives
    assert out[3]["kept"]
    assert out[1]["kept"] != out[2]["kept"]
    dropped = 1 if not out[1]["kept"] else 2
    survivor = 2 if dropped == 1 else 1
    assert out[dropped]["cos_centroid"] >= out[survivor]["cos_centroid"]


def test_incremental_dedup_verdicts_ground_truth(spark):
    from spark_streaming_project_spark.operators.dedup import (
        incremental_dedup_verdicts,
    )

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    corpus = _toy_docs(spark, [(1, base), (2, "x1 x2 x3 x4 x5 x6")])
    batch = _toy_docs(
        spark,
        [
            (10, base),                               # byte-identical -> exact_dup
            (11, base + " extra trailing tokens"),    # high overlap   -> near_dup
            (12, "q1 q2 q3 q4 q5 q6 q7 q8"),          # disjoint       -> new
        ],
    )
    out = {
        r["doc_id"]: r["verdict"]
        for r in incremental_dedup_verdicts(
            corpus, batch, "text", "doc_id", threshold=0.3
        ).collect()
    }
    assert out == {10: "exact_dup", 11: "near_dup", 12: "new"}


def test_incremental_dedup_verdict_covers_every_batch_doc(spark):
    from spark_streaming_project_spark.operators.dedup import (
        incremental_dedup_verdicts,
    )

    docs = load_table(spark, SF, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    corpus, batch = docs.filter(h <= "7"), docs.filter(h > "7")
    out = incremental_dedup_verdicts(corpus, batch, "text", "doc_id")
    assert out.count() == batch.count()
    kinds = {r["verdict"] for r in out.select("verdict").distinct().collect()}
    assert kinds <= {"exact_dup", "near_dup", "new"} and "new" in kinds


def test_write_training_shards_sorted_files_and_determinism(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from spark_streaming_project_spark.sources.compaction import (
        write_training_shards,
    )

    docs = load_table(spark, SF, "documents").select("doc_id")
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, "doc_id", out1, n_shards=4, seed="e0")
    write_training_shards(docs, "doc_id", out2, n_shards=4, seed="e0")

    def read_shards(root):
        shards = {}
        for d in sorted(glob.glob(os.path.join(root, "shard=*"))):
            shard = int(d.rsplit("=", 1)[1])
            tables = [
                pq.read_table(f)
                for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
            ]
            rows = [
                (p, i)
                for t in tables
                for p, i in zip(
                    t.column("pos").to_pylist(), t.column("doc_id").to_pylist()
                )
            ]
            shards[shard] = rows
        return shards

    s1 = read_shards(out1)
    assert set(s1) == {0, 1, 2, 3}
    total = 0
    for shard, rows in s1.items():
        poss = [p for p, _ in rows]
        assert poss == sorted(poss), f"shard {shard} not in pos order"
        assert poss == list(range(1, len(poss) + 1))
        total += len(rows)
    assert total == docs.count()
    assert s1 == read_shards(out2)  # same seed -> byte-identical layout


def test_pmi_hand_computed(spark):
    """PMI of a constructed corpus: 'foo bar' always adjacent (perfect
    collocation) vs 'foo baz' never adjacent."""
    import math

    from spark_streaming_project_spark.plans.quality import pmi_collocations
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os, tempfile

    # 5 docs of "foo bar", 5 docs of "x y" filler to clear the c_xy >= 5 bar
    texts = ["foo bar"] * 5 + ["x y"] * 5
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 10, pa.string()),
            "source": pa.array(["s"] * 10, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        os.path.join(d, "documents.parquet"),
    )
    rows = {r["bigram"]: r["pmi"] for r in pmi_collocations(spark, d).collect()}
    # corpus: 20 unigrams (foo,bar,x,y each 5), 10 bigrams (foo bar x5, x y x5)
    # pmi(foo bar) = ln((5 * 20 * 20) / (10 * 5 * 5)) = ln(8)
    assert rows == {
        "foo bar": round(math.log(8.0), 6),
        "x y": round(math.log(8.0), 6),
    }


def test_source_drift_kl_flags_divergent_source(spark):
    """A source with a disjoint vocabulary must show strictly larger KL
    than sources drawn from the corpus-majority distribution; KL >= 0."""
    from spark_streaming_project_spark.plans.quality import source_drift_kl
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os, tempfile

    normal = "alpha beta gamma delta " * 10
    weird = "zzz qqq www eee " * 10
    texts = [normal] * 8 + [weird] * 2
    srcs = ["normal"] * 8 + ["weird"] * 2
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 10, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        os.path.join(d, "documents.parquet"),
    )
    got = {r["source"]: r["kl_divergence"] for r in source_drift_kl(spark, d).collect()}
    assert set(got) == {"normal", "weird"}
    assert got["weird"] > got["normal"] >= 0


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003)
# ---------------------------------------------------------------------------


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: two documents sharing a token run of
    length >= w + k - 1 (= 6 at k=3, w=4) MUST share at least one
    fingerprint value, whatever surrounds the run."""
    from spark_streaming_project_spark.operators.textstats import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    docs = _toy_docs(
        spark,
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven {shared} eight nine ten eleven twelve"),
        ],
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", k=3, w=4)
    by_doc = {
        r["doc_id"]: set()
        for r in fps.select("doc_id").distinct().collect()
    }
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2]


def test_winnowing_coverage_and_density(spark):
    """Every full w-window of gram positions contains a selected
    position (the window-coverage invariant selection correctness reduces
    to), selected hashes equal the gram hash at the selected position,
    and density lands in (0, 1]."""
    import hashlib

    from spark_streaming_project_spark.operators.textstats import (
        winnow_fingerprints,
    )

    docs = load_table(spark, SF, "documents").limit(40)
    k, w = 3, 4
    fps = {
        (r["doc_id"], r["pos"]): r["fp"]
        for r in winnow_fingerprints(docs, "text", "doc_id", k=k, w=w).collect()
    }
    assert fps
    for row in docs.filter(F.col("text").isNotNull()).collect():
        toks = [t for t in row["text"].split() if t]
        grams = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ]
        sel = {p for (d, p) in fps if d == row["doc_id"]}
        if len(grams) < w:
            assert not sel
            continue
        for start in range(1, len(grams) - w + 2):
            assert sel & set(range(start, start + w)), (row["doc_id"], start)
        for p in sel:
            want = int(hashlib.md5(grams[p - 1].encode()).hexdigest()[:4], 16)
            assert fps[(row["doc_id"], p)] == want


def test_winnowing_rightmost_min_tiebreak(spark):
    """A document whose grams all hash identically (same gram repeated)
    must select the RIGHTMOST position of each window — i.e. positions
    w, w+1, ..., P (every window's last slot), not position 1."""
    from spark_streaming_project_spark.operators.textstats import (
        winnow_fingerprints,
    )

    docs = _toy_docs(spark, [(1, "x x x x x x x x x x")])  # 8 identical grams
    got = sorted(
        r["pos"]
        for r in winnow_fingerprints(docs, "text", "doc_id", k=3, w=4).collect()
    )
    # windows start at 1..5; rightmost min of window j is j + 3
    assert got == [4, 5, 6, 7, 8]


# ---------------------------------------------------------------------------
# Trained logistic-regression quality classifier (operators/classifier.py)
# ---------------------------------------------------------------------------


def test_logreg_matches_independent_numpy_reference(spark):
    """Training parity against an independent numpy implementation (batch
    matrix ops, different accumulation order): same quantized-gradient
    algorithm must land within float tolerance — agreement is algorithmic,
    not copy-paste."""
    import numpy as np

    from spark_streaming_project_spark.operators.classifier import (
        hashed_bucket_features,
        logreg_train_quantized,
    )

    docs = load_table(spark, SF, "documents")
    feats = hashed_bucket_features(
        docs, "text", "doc_id",
        F.col("source").isin("src0", "src1", "src2"), n_buckets=16,
    )
    got = logreg_train_quantized(feats, n_buckets=16, iters=3, lr=0.5)

    rows = feats.collect()
    X = np.array([r["x"] for r in rows], dtype=np.float64)
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    w = np.zeros(17)
    for _ in range(3):
        z = X @ w
        s = 0.5 * (1.0 + z / (1.0 + np.abs(z)))
        rq = np.round((y - s) * 1e6)
        g = rq @ X
        w = w + 0.5 * (g / (len(rows) * 1e6))
    assert np.max(np.abs(np.array(got) - w)) < 1e-9


def test_logreg_learns_to_separate_target_slice(spark):
    """On a corpus where the target class uses disjoint vocabulary, 3
    iterations must already rank targets above non-targets (AUC-style
    check: min target prob > max background prob)."""
    from spark_streaming_project_spark.operators.classifier import (
        hashed_bucket_features,
        logreg_score,
        logreg_train_quantized,
    )

    rows = [(i, "alpha beta gamma delta " * 3, 1) for i in range(20)] + [
        (100 + i, "omega psi chi phi " * 3, 0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lab int")
    feats = hashed_bucket_features(
        df, "text", "doc_id", F.col("lab") == 1, n_buckets=16
    )
    w = logreg_train_quantized(feats, n_buckets=16, iters=3, lr=0.5)
    scored = logreg_score(feats, w, "doc_id").collect()
    tgt = [r["prob"] for r in scored if r["y"] == 1]
    bg = [r["prob"] for r in scored if r["y"] == 0]
    assert min(tgt) > max(bg)


def test_logreg_exact_partition_invariance_and_empty(spark):
    """Quantized integer gradients make training EXACTLY partitioning-
    independent (bit-equal weights under repartition); empty input yields
    the zero model."""
    from spark_streaming_project_spark.operators.classifier import (
        hashed_bucket_features,
        logreg_train_quantized,
    )

    docs = load_table(spark, SF, "documents")
    lab = F.col("source").isin("src0", "src1", "src2")
    f1 = hashed_bucket_features(docs, "text", "doc_id", lab, n_buckets=16)
    f2 = hashed_bucket_features(
        docs.repartition(17), "text", "doc_id", lab, n_buckets=16
    )
    w1 = logreg_train_quantized(f1, n_buckets=16, iters=2)
    w2 = logreg_train_quantized(f2, n_buckets=16, iters=2)
    assert w1 == w2

    empty = hashed_bucket_features(
        docs.filter(F.lit(False)), "text", "doc_id", lab, n_buckets=16
    )
    assert logreg_train_quantized(empty, n_buckets=16) == [0.0] * 17


def test_logreg_features_dense_bias_and_zero_token_docs(spark):
    """Feature vectors are dense length n_buckets+1 with bias slot 1;
    a doc whose text has no tokens keeps an all-zero count vector."""
    from spark_streaming_project_spark.operators.classifier import (
        hashed_bucket_features,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in hashed_bucket_features(
            df, "text", "doc_id", F.lit(True), n_buckets=8
        ).collect()
    }
    assert set(rows) == {1, 2}  # NULL text excluded
    assert rows[1]["x"][0] == 1 and sum(rows[1]["x"][1:]) == 3
    assert rows[2]["x"][0] == 1 and sum(rows[2]["x"][1:]) == 0
    assert len(rows[1]["x"]) == 9


def test_winnow_match_pairs_finds_copy_and_stoplists_boilerplate(spark):
    """A doc pair sharing a long run is matched; boilerplate shared by
    EVERY doc is stop-listed (max_df) and alone produces no pairs."""
    from spark_streaming_project_spark.operators.textstats import (
        winnow_match_pairs,
    )

    boiler = "terms of service apply to all users always"
    copied = "quick brown fox jumps over the lazy dog today"
    rows = [(i, f"{boiler} filler{i} pad{i} junk{i} noise{i}") for i in range(20)]
    rows += [(100, f"{copied} alpha beta"), (101, f"gamma delta {copied}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_match_pairs(
            df, "text", "doc_id", min_shared=2, max_df=5
        ).collect()
    }
    assert (100, 101) in pairs
    assert all(a >= 100 for a, b in pairs), pairs  # boilerplate suppressed


def test_gram_novelty_directional_hand_case(spark):
    """Doc 1 contributes everything it has; doc 2 repeats doc 1 verbatim
    (novelty 0); doc 3 is half-new."""
    from spark_streaming_project_spark.operators.quality import (
        gram_novelty_by_doc,
    )

    t1 = "a b c d e f"           # 2 distinct 5-grams
    t3 = "a b c d e k l m n o"   # 6 grams: 'a b c d e' seen? no -- 5-gram
    df = spark.createDataFrame(
        [(1, t1), (2, t1), (3, t3)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["novel_grams"])
        for r in gram_novelty_by_doc(df, "text", "doc_id", n=5).collect()
    }
    assert got[1] == (2, 2)
    assert got[2] == (2, 0)
    # doc 3 grams: 'a b c d e' (owned by doc 1) + 5 new ones
    assert got[3] == (6, 5)


def test_span_dedup_stats_counts_cross_doc_repeats(spark):
    """A span is dup iff an identical span occurs at a smaller
    (doc_id, span_no); first occurrences are never dups."""
    from spark_streaming_project_spark.operators.dedup import (
        duplicate_spans,
        span_dedup_stats,
    )

    rows = [
        (1, "a b c d e f g h i j k l m n o p q r s t"),
        (2, "a b c d e f g h i j x y z"),
        (3, "k l m n o p q r s t extra words here"),
        (4, "totally fresh content with no repeats at all ok fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"])
        for r in span_dedup_stats(df, "text", "doc_id", 10).collect()
    }
    assert got == {1: (2, 0), 2: (2, 1), 3: (2, 1), 4: (1, 0)}
    dups = {
        r["span_text"]: (r["n_occurrences"], r["n_docs"])
        for r in duplicate_spans(df, "text", "doc_id", 10, 2, 5).collect()
    }
    assert dups == {
        "a b c d e f g h i j": (2, 2),
        "k l m n o p q r s t": (2, 2),
    }


def test_gopher_flags_rules_fire_individually(spark):
    """Each Gopher rule flips on exactly the doc violating it."""
    from spark_streaming_project_spark.operators.quality import (
        gopher_quality_flags,
    )

    ok_words = " ".join(["the", "and", "have"] + ["word"] * 47)  # 50 words
    rows = [
        (1, ok_words),                                # passes everything
        (2, "the and short"),                         # < 50 words
        (3, " ".join(["the", "and"] + ["a"] * 48)),   # avg len < 3
        (4, " ".join(["the", "and"] + ["####...####"] * 48)),  # symbols
        (5, " ".join(["zz"] * 50)),                   # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["pass_word_count"],
            r["pass_avg_word_len"],
            r["pass_symbol_ratio"],
            r["pass_stopwords"],
            r["keep"],
        )
        for r in gopher_quality_flags(df, "text", "doc_id").collect()
    }
    assert got[1] == (True, True, True, True, True)
    assert got[2][0] is False and got[2][4] is False
    assert got[3][1] is False and got[3][4] is False
    assert got[4][2] is False and got[4][4] is False
    assert got[5][3] is False and got[5][4] is False


def test_filter_funnel_is_cumulative_and_monotone(spark):
    """Stage survivors never increase, stage 0 is the corpus size, and
    the exact-dedup stage drops exactly the non-first duplicates."""
    from spark_streaming_project_spark.operators.quality import (
        filter_funnel,
    )

    good = " ".join(["the", "and", "have"] + ["word"] * 47)
    rows = [
        (1, good),
        (2, good),              # exact dup of 1 -> dropped at stage 1
        (3, "the and tiny"),    # fails word count at stage 2
        (4, " ".join(["the", "and", "have"] + ["other"] * 47)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["stage"]: (r["stage_no"], r["survivors"])
        for r in filter_funnel(df, "text", "doc_id").collect()
    }
    assert out["total"] == (0, 4)
    assert out["pass_exact_dedup"] == (1, 3)
    assert out["pass_word_count"] == (2, 2)
    assert out["pass_stopwords"][1] == 2
    vals = [v for _, v in sorted(out.values())]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_distinct_ngram_diversity_separates_template_from_fresh(spark):
    """A source that endlessly repeats one phrase scores a much lower
    distinct-2 ratio than a source of unique bigrams."""
    from spark_streaming_project_spark.operators.quality import (
        distinct_ngram_diversity,
    )

    rows = [
        (1, "tpl", "buy now click here buy now click here buy now"),
        (2, "tpl", "buy now click here buy now click here"),
        (3, "fresh", "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: (r["total_ngrams"], r["distinct_ngrams"])
        for r in distinct_ngram_diversity(df, "text", "source", 2).collect()
    }
    assert got["fresh"][0] == got["fresh"][1] == 7
    assert got["tpl"][1] < got["tpl"][0]
    assert got["tpl"][1] == 4  # buy-now, now-click, click-here, here-buy


def test_auc_exact_matches_reference_with_ties(spark):
    """auc_exact == the probabilistic definition P(s_pos > s_neg) +
    0.5*P(tie), computed by brute force over all (pos, neg) pairs."""
    from spark_streaming_project_spark.operators.classifier import auc_exact

    rows = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 1), (0.5, 0),
        (0.5, 1), (0.5, 0), (0.3, 0), (0.2, 1), (0.1, 0),
    ]
    df = spark.createDataFrame(rows, "prob double, y int")
    got = auc_exact(df, "prob", "y").first()
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    want = round(num / (len(pos) * len(neg)), 6)
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc"] == want
    # perfect separation -> 1.0; random same-score -> 0.5
    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "prob double, y int"
    )
    assert auc_exact(perfect, "prob", "y").first()["auc"] == 1.0
    flat = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)], "prob double, y int"
    )
    assert auc_exact(flat, "prob", "y").first()["auc"] == 0.5


def test_vocab_growth_hand_case(spark):
    """First-owner counting: a token counts once, at its first doc."""
    from spark_streaming_project_spark.plans import REGISTRY  # noqa: F401
    from spark_streaming_project_spark.operators.windows import (
        range_partitioned_running_sum,
    )
    from pyspark.sql import functions as F
    from spark_streaming_project_spark.functions.text import tokens

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "a e")],
        "doc_id long, text string",
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
    )
    intro = (
        toks.groupBy("tok").agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id").agg(F.count("*").alias("introduced"))
    )
    base = docs.select("doc_id").join(intro, "doc_id", "left").select(
        "doc_id", F.coalesce("introduced", F.lit(0)).cast("long").alias("introduced")
    )
    got = {
        r["doc_id"]: (r["introduced"], r["_r_introduced"])
        for r in range_partitioned_running_sum(
            base, [F.asc("doc_id")], ["introduced"], prefix="_r_"
        ).collect()
    }
    assert got == {1: (3, 3), 2: (1, 4), 3: (1, 5)}


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    """An eval doc fully contained in a much larger train doc has
    containment 1.0 even though Jaccard is low — the audit's point."""
    from pyspark.sql import functions as F
    from spark_streaming_project_spark.functions.text import word_ngrams

    eval_text = "one two three four five six"           # 2 distinct 5-grams
    train_text = eval_text + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, "src0", eval_text), (2, "src9", train_text),
         (3, "src0", "totally different words here right now")],
        "doc_id long, source string, text string",
    )
    sh = docs.select(
        "doc_id", "source",
        F.array_distinct(word_ngrams(F.col("text"), 5)).alias("sh"),
    )
    ev = sh.filter((F.col("source") == "src0") & (F.size("sh") > 0)).select(
        "doc_id", F.size("sh").alias("n_grams"), F.explode("sh").alias("gram")
    )
    tr = sh.filter(F.col("source") != "src0").select(
        F.explode("sh").alias("gram")).distinct().withColumn("_hit", F.lit(1))
    got = {
        r["doc_id"]: (r["n_grams"], r["shared"])
        for r in ev.join(tr, "gram", "left").groupBy("doc_id").agg(
            F.first("n_grams").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("shared"),
        ).collect()
    }
    assert got[1] == (2, 2)   # fully contained -> containment 1.0
    assert got[3] == (2, 0)   # clean eval doc


def test_neardup_eval_pr_hand_truth(spark):
    """Precision/recall arithmetic on a crafted frame: 2 planted clusters
    of 2 + noise; pairs found = 1 true + 1 false -> P=0.5, R=0.5."""
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    lbl = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "vec_id long, label int"
    )
    ev = (
        pairs.join(lbl.select(F.col("vec_id").alias("id_a"),
                              F.col("label").alias("_la")), "id_a")
        .join(lbl.select(F.col("vec_id").alias("id_b"),
                         F.col("label").alias("_lb")), "id_b")
        .select((F.col("_la") == F.col("_lb")).cast("long").alias("t"))
    )
    truth = lbl.groupBy("label").count().agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long").alias("tt")
    )
    row = ev.agg(F.count("*").alias("n"), F.sum("t").alias("tp")) \
        .crossJoin(truth).first()
    assert (row["n"], row["tp"], row["tt"]) == (2, 1, 2)
    assert round(row["tp"] / row["n"], 6) == 0.5          # precision
    assert round(row["tp"] / row["tt"], 6) == 0.5          # recall
    assert round(2.0 * row["tp"] / (row["n"] + row["tt"]), 6) == 0.5  # f1


def test_entropy_profile_hand_values(spark):
    """Token entropy: uniform tokens -> ln(k); constant doc -> 0."""
    import math

    from spark_streaming_project_spark.plans import REGISTRY

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x x x x"), (3, "a a b b")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("_entropy_toy")
    from spark_streaming_project_spark.functions.text import tokens
    from pyspark.sql import functions as F

    cnt = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok")) \
        .groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    qln = F.round(F.log("c") * 1_000_000_000).cast("long")
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * qln).alias("sq"))
    got = {
        r["doc_id"]: round(
            math.log(r["n"]) - r["sq"] / (r["n"] * 1e9), 6
        )
        for r in agg.collect()
    }
    assert got[1] == round(math.log(4), 6)   # 4 uniform tokens
    assert got[2] == 0.0                     # constant doc
    assert got[3] == round(math.log(2), 6)   # two tokens, 2 each


def test_roc_is_monotone_and_trapezoid_matches_auc(spark):
    """ROC invariants on a crafted frame: tpr/fpr monotone along
    descending thresholds, terminal point (1,1), and the trapezoid
    integral over the exact points equals auc_exact."""
    from pyspark.sql import functions as F

    from spark_streaming_project_spark.operators.classifier import auc_exact
    from spark_streaming_project_spark.operators.windows import (
        range_partitioned_running_sum,
    )

    rows = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 1), (0.5, 0),
        (0.5, 1), (0.3, 0), (0.2, 1), (0.1, 0), (0.1, 0),
    ]
    df = spark.createDataFrame(rows, "prob double, y int")
    pagg = df.groupBy("prob").agg(
        F.count("*").alias("_g"), F.sum("y").alias("_p")
    ).withColumn("_n", F.col("_g") - F.col("_p"))
    run = range_partitioned_running_sum(
        pagg, [F.desc("prob")], ["_p", "_n"], prefix="_c"
    )
    P = sum(y for _, y in rows)
    N = len(rows) - P
    pts = sorted(
        ((r["prob"], r["_c_p"] / P, r["_c_n"] / N) for r in run.collect()),
        key=lambda t: -t[0],
    )
    tprs = [t for _, t, _ in pts]
    fprs = [f for _, _, f in pts]
    assert tprs == sorted(tprs) and fprs == sorted(fprs)  # monotone
    assert tprs[-1] == 1.0 and fprs[-1] == 1.0
    # trapezoid over (0,0) + points == exact AUC (midrank identity)
    xs = [0.0] + fprs
    ys = [0.0] + tprs
    trap = sum(
        (xs[i + 1] - xs[i]) * (ys[i + 1] + ys[i]) / 2 for i in range(len(xs) - 1)
    )
    want = auc_exact(df, "prob", "y").first()["auc"]
    assert round(trap, 6) == want


@pytest.mark.slow  # r14: driver-window gate (see conftest)
def test_curate_cli_end_to_end(spark, tmp_path):
    """scripts/curate.py: kept corpus on disk == verdicts' keep set, and
    the report's attrition numbers are internally consistent."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [sys.executable, "scripts/curate.py",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    kept = spark.read.parquet(f"{out}/kept")
    verdicts = spark.read.parquet(f"{out}/verdicts")
    assert kept.count() == report["kept_docs"]
    assert verdicts.count() == report["total_docs"]
    keep_ids = {r["doc_id"] for r in verdicts.filter("keep").collect()}
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == keep_ids
    assert report["kept_docs"] <= report["total_docs"]
    with open(f"{out}/report.json") as fh:
        assert json.load(fh) == report
    # ship-ready tail: same doc set, split-partitioned, PII-free text
    ready = spark.read.parquet(f"{out}/train_ready")
    assert {r["doc_id"] for r in ready.select("doc_id").collect()} == keep_ids
    assert sum(report["split_doc_counts"].values()) == report["kept_docs"]
    assert set(report["split_doc_counts"]) <= {"train", "val", "test"}
    from spark_streaming_project_spark.operators.pii import (
        PII_PATTERNS,
        pii_scan,
    )
    residual = (
        pii_scan(ready, "text", PII_PATTERNS)
        .agg(F.sum("pii_total_n").alias("n"))
        .collect()[0]["n"]
    )
    assert (residual or 0) == 0


def test_nb_quantized_matches_python_model(spark):
    """Hand corpus: the quantized NB model and argmax predictions equal a
    pure-python replay, integer for integer."""
    import math

    from spark_streaming_project_spark.operators.classifier import (
        nb_predict,
        nb_train_quantized,
    )

    rows = [
        (1, "a b a", "x"),
        (2, "a a", "x"),
        (3, "c d", "y"),
        (4, "c c d b", "y"),
        (5, "a c", "x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    model, priors = nb_train_quantized(df, "text", "doc_id", "lang")

    toks = [(i, t.split(), l) for i, t, l in rows]
    n_tl: dict = {}
    n_l: dict = {}
    for _, ts, l in toks:
        for t in ts:
            n_tl[(t, l)] = n_tl.get((t, l), 0) + 1
            n_l[l] = n_l.get(l, 0) + 1
    vocab = sorted({t for _, ts, _ in toks for t in ts})
    v = len(vocab)
    want_model = {
        (t, l): round(math.log((n_tl.get((t, l), 0) + 1) / (n_l[l] + v)) * 1e6)
        for t in vocab
        for l in n_l
    }
    got_model = {
        (r["token"], r["label"]): r["w_q"] for r in model.collect()
    }
    assert got_model == want_model

    n_docs_l: dict = {}
    for _, _, l in rows:
        n_docs_l[l] = n_docs_l.get(l, 0) + 1
    want_priors = {
        l: round(math.log(n / len(rows)) * 1e6) for l, n in n_docs_l.items()
    }
    assert {r["label"]: r["prior_q"] for r in priors.collect()} == want_priors

    def score(ts, l):
        return want_priors[l] + sum(want_model[(t, l)] for t in ts)

    want_pred = {
        i: min(n_l, key=lambda l: (-score(ts, l), l)) for i, ts, _ in toks
    }
    got_pred = {
        r["doc_id"]: r["predicted"]
        for r in nb_predict(df, model, priors, "text", "doc_id").collect()
    }
    assert got_pred == want_pred


def test_nb_self_accuracy_beats_majority_baseline(spark):
    """The synthetic corpus's lang labels are nearly independent of its
    (shared-vocabulary) text, so high self-accuracy is impossible BY
    DATA — the honest bar is that NB's argmax beats always-predicting
    the majority class (i.e. it extracts whatever signal exists instead
    of collapsing to the prior)."""
    from spark_streaming_project_spark.plans import REGISTRY

    from .conftest import SF_CORRECT

    rows = REGISTRY["nb_lang_confusion"].builder(spark, SF_CORRECT).collect()
    total = sum(r["n_docs"] for r in rows)
    diag = sum(r["n_docs"] for r in rows if r["actual"] == r["predicted"])
    per_actual: dict = {}
    for r in rows:
        per_actual[r["actual"]] = per_actual.get(r["actual"], 0) + r["n_docs"]
    majority = max(per_actual.values()) / total
    assert diag / total > majority


def test_lr_weights_memo_is_bit_identical_to_fresh_fit(spark):
    """The plans-level fit memo (one training shared across the five
    quality_logreg_* builders) must return exactly what a fresh
    ``logreg_train_quantized`` call returns — the memo is a pure cache,
    never a different model. Also pins that the cache key includes
    sf_dir: clearing the cache and refitting reproduces the same list,
    and the memo hands out copies (mutating a result cannot poison the
    cache)."""
    from spark_streaming_project_spark.plans.quality import (
        _LR_BUCKETS,
        _LR_FIT_CACHE,
        _LR_ITERS,
        _lr_feats,
        _lr_weights,
    )
    from spark_streaming_project_spark.operators.classifier import (
        logreg_train_quantized,
    )

    _LR_FIT_CACHE.clear()
    w_memo = _lr_weights(spark, SF)
    assert (SF, _LR_BUCKETS, _LR_ITERS, 0.5) in _LR_FIT_CACHE
    w_fresh = logreg_train_quantized(
        _lr_feats(spark, SF), n_buckets=_LR_BUCKETS, iters=_LR_ITERS, lr=0.5
    )
    assert w_memo == w_fresh  # bit-identical floats, not approx

    # cached second call returns an equal list but a DIFFERENT object
    w_again = _lr_weights(spark, SF)
    assert w_again == w_memo
    w_again[0] = 12345.0
    assert _lr_weights(spark, SF) == w_memo


def test_repetition_signals_hand_computed(spark):
    """Gopher repetition fractions against hand-computed values: a clean
    doc keeps, a doc dominated by one repeated bigram trips top2, a doc
    with a long repeated 5-gram trips dup5."""
    from spark_streaming_project_spark.operators.quality import (
        repetition_signals,
    )

    clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # "spam ham" repeated 5x: top 2-gram "spam ham" count 5, len 8
    spammy = " ".join(["spam", "ham"] * 5)
    # one 5-word phrase repeated 3x -> every 5-gram inside repeats
    loopy = " ".join(["one two three four five"] * 3)
    df = spark.createDataFrame(
        [(1, clean), (2, spammy), (3, loopy)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df, "text", "doc_id").collect()}

    assert got[1]["rep_keep"] is True
    assert got[1]["top2_frac"] < 0.20 and got[1]["dup5_frac"] == 0.0

    # spammy: chars = len("spam ham spam ham ...") = 5*8 + 4 = 44;
    # 2-grams: "spam ham" x5, "ham spam" x4 -> top2 = 5*8/44
    assert got[2]["top2_frac"] == round(min(5 * 8 / 44, 1.0), 6)
    assert got[2]["rep_keep"] is False

    # loopy: 15 words, every 5-gram occurs >= 2x? the phrase boundary
    # grams ("five one two three four" etc.) also repeat (period 5), so
    # dup5 clamps at 1.0
    assert got[3]["dup5_frac"] == 1.0
    assert got[3]["rep_keep"] is False


def test_repetition_signals_registry_oracle_match(spark):
    """The registered query must agree with its DuckDB oracle at sf0.01
    (pre-driver check for the r11 recording)."""
    import duckdb
    import math

    from spark_streaming_project_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.01"
    q = REGISTRY["repetition_signals"]
    sdf = q.builder(spark, sf)
    srows = sdf.collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)

    def canon(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return v

    so = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    a = sorted(tuple(canon(r[i]) for i in so) for r in srows)
    b = sorted(tuple(canon(r[i]) for i in do) for r in drows)
    assert len(a) == len(b) > 0
    assert a == b


def test_token_domain_oracles_agree_on_adversarial_docs(spark, tmp_path):
    """ADVICE r10 pins: (a) repetition_signals' oracle must emit the SAME
    doc universe as the engine — a 1-token doc (zero n-grams at every n)
    appears with all-zero fractions and rep_keep=true on both sides; (b)
    padding_waste_curve / source_temperature_weights oracles must count
    tokens with the filtered-split idiom so multi-space / leading-space /
    empty / whitespace-only texts agree with token_count. Runs the three
    registered queries against an adversarial documents table and the
    driver-gate compare."""
    import duckdb

    from spark_streaming_project_spark.plans import REGISTRY

    from .conftest import assert_matches_oracle

    rows = [
        (1, "alpha", "en", "web", 5),                    # 1 token, 0 grams
        (2, "a  b   c", "en", "web", 8),                 # multi-space runs
        (3, "  lead and trail  ", "en", "wiki", 18),     # edge spaces
        (4, "", "en", "wiki", 0),                        # empty -> excluded
        (5, "   ", "en", "books", 3),                    # spaces-only -> excluded
        (6, None, "en", "books", 0),                     # NULL -> excluded
        (7, "x y x y x y x y x y x y", "en", "books", 23),  # real repetition
        (8, "one two", "en", "code", 7),                 # 2 tokens, one 2-gram
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    table = pa.table(
        {c: [r[i] for r in rows] for i, c in enumerate(cols)},
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    path = str(tmp_path / "documents.parquet")  # single FILE, like testdata
    pq.write_table(table, path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    for name in (
        "repetition_signals",
        "padding_waste_curve",
        "source_temperature_weights",
    ):
        q = REGISTRY[name]
        assert_matches_oracle(
            q.builder(spark, str(tmp_path)), con, q.oracle, name
        )
    # the 1-token doc is PRESENT on both sides with the zero profile
    rep = {
        r["doc_id"]: r.asDict()
        for r in REGISTRY["repetition_signals"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert set(rep) == {1, 2, 3, 7, 8}
    assert rep[1]["rep_keep"] is True and rep[1]["dup10_frac"] == 0.0
    con.close()


def test_planner_queries_survive_degenerate_corpus(spark, tmp_path):
    """Regenerated-testdata guard: on a corpus where EVERY text is NULL or
    whitespace-only (zero tokens everywhere), the planner/profiling
    queries must return empty-but-valid results that still match their
    oracles — not crash in sequence/slice/division. (repetition_signals'
    r11 short-doc crash motivated pinning the whole family.)"""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_streaming_project_spark.plans import REGISTRY

    from .conftest import assert_matches_oracle

    rows = [
        (1, None, "en", "web", 0),
        (2, "", "en", "web", 0),
        (3, "   ", "en", "wiki", 3),
        (4, "\t\t", None, None, 2),
    ]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    table = pa.table(
        {c: [r[i] for r in rows] for i, c in enumerate(cols)},
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    path = str(tmp_path / "documents.parquet")
    pq.write_table(table, path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    for name in (
        "repetition_signals",
        "padding_waste_curve",
        "vocab_coverage_curve",
        "shard_balance_stats",
        "source_temperature_weights",
        "lang_entropy_by_source",
        "gram_novelty_by_doc",
    ):
        q = REGISTRY[name]
        assert_matches_oracle(
            q.builder(spark, str(tmp_path)), con, q.oracle, name
        )
    con.close()


def test_ngram_novelty_counts_null_source_group(spark, tmp_path):
    """r11 review fix pin: the aggregate-only ngram_novelty_by_source must
    keep the NULL-source group's novel count (source is nullable; a plain
    equi-join on source silently zeroed it while the oracle counted it).
    Fixture: two NULL-source docs own 5 of 6 first-occurrence grams."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_streaming_project_spark.plans import REGISTRY

    from .conftest import assert_matches_oracle

    rows = [
        (1, "alpha beta gamma delta", "en", None, 22),
        (2, "alpha beta gamma delta epsilon", "en", "web", 30),
        (3, "zeta eta theta iota", "en", None, 19),
    ]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    table = pa.table(
        {c: [r[i] for r in rows] for i, c in enumerate(cols)},
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    path = str(tmp_path / "documents.parquet")
    pq.write_table(table, path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    q = REGISTRY["ngram_novelty_by_source"]
    df = q.builder(spark, str(tmp_path))
    assert_matches_oracle(df, con, q.oracle, "ngram_novelty_by_source")
    got = {r["source"]: r for r in df.collect()}
    # doc 1 owns its 2 trigrams, doc 3 its 2; doc 2's only novel gram is
    # "gamma delta epsilon" -> NULL group 4/4 novel, web 1/3
    assert got[None]["novel_grams"] == 4 and got[None]["novelty_share"] == 1.0
    assert got["web"]["novel_grams"] == 1
    con.close()
