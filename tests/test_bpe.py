"""Distributed BPE training (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich et al.'s algorithm."""

from __future__ import annotations

import collections

from pydatalake_spark.operators.bpe import (
    apply_bpe,
    pair_counts,
    train_bpe,
    word_freqs,
)

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest low newest"),
]


def _ref_bpe(texts, num_merges):
    """Reference BPE: dict-of-tuples word table, greedy merge."""
    wf = collections.Counter(w for t in texts for w in t.split() if w)
    words = {tuple(w): f for w, f in wf.items()}
    merges = []
    for _ in range(num_merges):
        pc = collections.Counter()
        for sym, f in words.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += f
        if not pc:
            break
        # argmax count desc, pair asc ('a b' string order)
        best = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[0]
        merges.append(best)
        a, b = best
        new = {}
        for sym, f in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        words = new
    return merges, words


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_word_and_pair_counts(spark):
    wf = {r.word: r.freq for r in word_freqs(_df(spark)).collect()}
    assert wf["low"] == 6 and wf["newest"] == 7
    pc = {r.pair: r.n for r in pair_counts(word_freqs(_df(spark))).collect()}
    # 'es' appears in newest(7) + widest(2)
    assert pc["e s"] == 9
    assert pc["l o"] == 6 + 2  # low + lower


def test_train_matches_reference(spark):
    got = train_bpe(_df(spark), num_merges=8)
    want, _ = _ref_bpe([t for _, t in CORPUS], 8)
    assert got == list(want)


def test_apply_bpe_subword_counts(spark):
    merges = train_bpe(_df(spark), num_merges=8)
    out = {r.doc_id: r for r in apply_bpe(_df(spark), merges).collect()}
    _, ref_words = _ref_bpe([t for _, t in CORPUS], 8)
    ref_len = {tuple(w): len(w) for w in ref_words}
    # doc 1: 'low' x5 -> 5 * len(segmented('low'))
    seg_low = next(len(w) for w in ref_words if "".join(w) == "low")
    assert out[1].n_tokens == 5
    assert out[1].n_subwords == 5 * seg_low


def test_bpe_merges_roundtrip(spark, tmpdir_path):
    import os

    from pydatalake_spark.operators.bpe import (
        apply_bpe,
        load_bpe_merges,
        save_bpe_merges,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(i, "low lower lowest low low newer new") for i in range(4)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, num_merges=5)
    path = os.path.join(str(tmpdir_path), "bpe_merges")
    save_bpe_merges(spark, merges, path)
    loaded = load_bpe_merges(spark, path)
    assert loaded == merges
    # the reloaded rules tokenize identically
    a = apply_bpe(docs, merges).orderBy("doc_id").collect()
    b = apply_bpe(docs, loaded).orderBy("doc_id").collect()
    assert a == b
