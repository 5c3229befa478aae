"""Behavioral invariants for exact repeated-span dedup
(operators/span_dedup.py); value parity vs DuckDB is covered by the
oracle gate (dup_span_stats / strip_dup_spans)."""

from __future__ import annotations

from pydatalake_spark.operators.span_dedup import (
    dup_span_stats,
    strip_dup_spans,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, SHARED + " unique one two three"),
            (2, SHARED + " other words appear here"),
            (3, "completely different text with no shared span at all ok"),
            (4, "tiny shared doc"),
            (5, "tiny shared doc"),
        ],
        "doc_id long, text string",
    )


def test_dup_span_stats_flags_shared_prefix(spark):
    stats = {
        r.doc_id: r
        for r in dup_span_stats(_corpus(spark), window=8).collect()
    }
    # docs 1/2: 12 tokens -> 5 windows; only the window starting at 0 is
    # fully inside the shared 8-token prefix
    assert stats[1].n_windows == 5 and stats[1].n_dup_windows == 1
    assert stats[2].n_dup_windows == 1
    assert stats[3].n_dup_windows == 0 and stats[3].dup_fraction == 0.0
    # short docs fall back to a whole-doc window; 4 and 5 are twins
    assert stats[4].n_windows == 1 and stats[4].n_dup_windows == 1


def test_strip_removes_shared_span_only(spark):
    out = {
        r.doc_id: r
        for r in strip_dup_spans(_corpus(spark), window=8).collect()
    }
    # the duplicated window covers tokens 0..7 -> suffix survives
    assert out[1].clean_text == "unique one two three"
    assert out[2].clean_text == "other words appear here"
    assert out[1].n_tokens == 12 and out[1].n_kept_tokens == 4
    # untouched doc: identical text back
    assert out[3].clean_text.startswith("completely different")
    assert out[3].n_kept_tokens == out[3].n_tokens
    # duplicated short doc strips to empty (its single window covers all)
    assert out[4].clean_text == "" and out[4].n_kept_tokens == 0


def test_strip_min_docs_threshold(spark):
    # min_docs=2: a span must appear in >2 docs to be stripped -> the
    # 2-doc shared prefix survives
    out = strip_dup_spans(_corpus(spark), window=8, min_docs=2)
    assert all(
        r.n_kept_tokens == r.n_tokens for r in out.collect()
    )


def test_fluent_strip_spans_and_semantic_dedup(spark):
    import math

    from pydatalake_spark.dataset.table import DataLakeTable

    t = DataLakeTable(spark, df=_corpus(spark))
    out = {
        r.doc_id: r.text
        for r in t.strip_spans("doc_id").to_df().collect()
    }
    assert out[1] == "unique one two three"
    assert out[3].startswith("completely different")

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.999, 0.01]),
        ],
        "vec_id long, embedding array<float>",
    )
    kept = (
        DataLakeTable(spark, df=emb)
        .dedup_semantic("vec_id", num_cells=1, threshold=0.95)
        .to_df()
        .collect()
    )
    assert {r.vec_id for r in kept} == {0, 1}


def test_dup_spans_against_corpus(spark):
    from pydatalake_spark.operators.span_dedup import dup_spans_against

    corpus = _corpus(spark)
    batch = spark.createDataFrame(
        [
            (100, SHARED + " brand new suffix here"),   # 8-token prefix known
            (101, "totally fresh content nothing shared with corpus docs x"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in dup_spans_against(corpus, batch).collect()
    }
    # 12 tokens -> 5 windows; only the window at position 0 is the known
    # shared prefix
    assert out[100].n_windows == 5 and out[100].n_known == 1
    assert out[101].n_known == 0 and out[101].known_fraction == 0.0


def test_dedup_by_clusters_best_keeps_high_priority(spark):
    from pydatalake_spark.operators.cluster import dedup_by_clusters_best

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (4, 0.7)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    kept = {
        r.doc_id
        for r in dedup_by_clusters_best(docs, pairs, "quality").collect()
    }
    # cluster {1,2,3}: keep 2 (highest quality), not min-id 1; 4 untouched
    assert kept == {2, 4}


def test_null_text_yields_zero_tokens_not_garbage(spark):
    """NULL documents: tokenize(NULL)=NULL made F.size()=-1 and fed
    sequence(0,-2) a descending range — strip emitted negative token
    counts and null clean_text (ADVICE r3). A null doc is zero tokens."""
    docs = spark.createDataFrame(
        [(1, SHARED + " unique tail"), (2, SHARED + " other tail"), (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_dup_spans(docs, window=8).collect()}
    assert out[3].n_tokens == 0
    assert out[3].n_kept_tokens == 0
    assert out[3].clean_text == ""
    # non-null docs unaffected by the guard
    assert out[1].n_tokens == 10 and out[1].clean_text == "unique tail"
    stats = {r.doc_id: r for r in dup_span_stats(docs, window=8).collect()}
    assert all(s.n_windows >= 0 and s.n_dup_windows >= 0 for s in stats.values())


def test_strip_spans_matching_censors_exact_overlap(spark):
    """Surgical decontamination: only tokens covered by a window whose
    hash is in the external bad set are removed; docs with no overlap
    pass through untouched; null hashes in the bad set are ignored."""
    from pyspark.sql import functions as F

    from pydatalake_spark.functions.text import shingles, tokenize
    from pydatalake_spark.operators.span_dedup import strip_spans_matching

    secret = " ".join(f"s{i}" for i in range(8))  # the eval passage
    clean = " ".join(f"c{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, clean + " " + secret + " tail0 tail1"),  # embedded overlap
            (2, clean),                                   # no overlap
            (3, secret),                                  # pure overlap
        ],
        "doc_id long, text string",
    )
    bad = spark.createDataFrame([(secret,), (None,)], "t string").select(
        F.explode_outer(
            F.transform(shingles(tokenize("t"), k=8), F.md5)
        ).alias("wh")
    )
    out = {
        r.doc_id: r
        for r in strip_spans_matching(docs, bad, window=8).collect()
    }
    # doc 1: exactly the 8 secret tokens are censored, the rest survives
    assert out[1].n_tokens == 22 and out[1].n_kept_tokens == 14
    assert "s0" not in out[1].clean_text and "c0" in out[1].clean_text
    assert out[1].clean_text.endswith("tail0 tail1")
    # doc 2: untouched
    assert out[2].n_kept_tokens == 12 and out[2].clean_text == clean
    # doc 3: fully censored
    assert out[3].n_kept_tokens == 0 and out[3].clean_text == ""


def test_strip_mask_matches_python_reference_on_random_corpora(spark):
    """Property check: strip_dup_spans' distributed mask == a direct
    Python reference of the published semantics (k-token windows, hop 1,
    short-doc whole-doc fallback, cross-doc count > min_docs, censor
    every covered token) on randomized small-vocab corpora where window
    collisions are dense."""
    import numpy as np

    k = 4
    rng = np.random.default_rng(11)
    for trial in range(3):
        vocab = [f"w{i}" for i in range(6)]
        docs = [
            (i, " ".join(rng.choice(vocab, size=int(rng.integers(1, 15)))))
            for i in range(12)
        ]

        def windows(text):
            toks = text.split()
            if len(toks) >= k:
                return [
                    " ".join(toks[i : i + k])
                    for i in range(len(toks) - k + 1)
                ], toks
            return [" ".join(toks)], toks

        counts = {}
        for _i, text in docs:
            for w in set(windows(text)[0]):
                counts[w] = counts.get(w, 0) + 1
        expected = {}
        for i, text in docs:
            ws, toks = windows(text)
            covered = set()
            for p, w in enumerate(ws):
                if counts[w] > 1:
                    if len(toks) < k:
                        covered |= set(range(len(toks)))
                    else:
                        covered |= set(range(p, p + k))
            kept = [t for j, t in enumerate(toks) if j not in covered]
            expected[i] = (len(toks), len(kept), " ".join(kept))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_kept_tokens, r.clean_text)
            for r in strip_dup_spans(df, window=k).collect()
        }
        assert got == expected, f"trial {trial}"
