"""Bloom-filter membership screening (constant-size set digest).

The scale problem: `exact_ngram_decontamination` (queries/text.py) screens
eval documents against the train-side window-hash set with a distinct +
semi-join — correct, but the train hash set is data-sized, so every screen
of a new eval batch re-shuffles against it. The standard fix (used by the
GPT-3/PaLM decontamination tooling and most web-pipeline blocklists) is a
Bloom filter: fold the train set ONCE into a fixed-size bitmap
(``num_bits`` bits, here materialized as ``num_bits/32`` 32-bit words so
no engine hits BIGINT shift overflow), then test any stream against it
with a broadcast join — zero shuffles on the probe side, a bounded
false-positive rate (~(1-e^{-kn/m})^k), and NO false negatives, which is
the safe direction for decontamination (over-flagging, never missing).

Everything is deterministic md5 arithmetic, so a SQL oracle reproduces the
bitmap and the membership verdicts bit-for-bit: position j of key g is
``(h1 + j*h2) % num_bits`` with ``h1/h2 = conv(substr(md5(g), 1|9, 8),
16, 10)`` — Kirsch–Mitzenmacher double hashing, see ``_positions``.

Scale shape: the build is one groupBy over ≤ num_bits/32 word indices
(map-side bit_or partials collapse each task to ≤128 rows); the bitmap
broadcasts as a table of ≤128 rows; the probe is explode(k) → broadcast
join → two keyed aggregations. The reference engine has no probabilistic
membership structure (SURVEY.md §2 gap list) — beyond-reference
capability for the 100 TB pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 4096
BLOOM_HASHES = 17
_WORD = 32  # bits per bitmap word; 1 << 31 still fits a BIGINT unsigned

# bits per inserted key for the auto-sized bitmap. 24 bits/key with the
# near-optimal k = round(24·ln2) = 17 puts the PER-PROBE FP rate at
# (1 - e^{-17/24})^17 ≈ 1e-5 — sized for the decontamination use, where
# a document is flagged if ANY of its W window hashes false-positives:
# doc-level FP ≈ W·p, so p must be ≪ 1/W (a 1%-per-probe filter
# over-flags ~25% of clean 30-window docs; measured exactly that before
# this sizing). Pure integer arithmetic (no float rounding) so a SQL
# oracle reproduces the size bit-for-bit.
BLOOM_BITS_PER_KEY = 24


def bloom_num_bits(
    n_keys: int, bits_per_key: int = BLOOM_BITS_PER_KEY
) -> int:
    """Word-aligned bitmap size for ``n_keys`` distinct keys at the
    ~1e-5-per-probe FP design point (``BLOOM_BITS_PER_KEY`` bits/key,
    k = ``BLOOM_HASHES``).

    Integer-exact and monotone, so the same formula is stated inline in
    SQL oracles: ``32 * ((24 * greatest(n, 1) + 31) // 32)``. The
    fixed-size ``BLOOM_BITS`` default remains for callers that need a
    size-stable bitmap (e.g. a literal embedded in a streaming plan);
    auto-sizing is the right default whenever the key count is known at
    build time — a fixed bitmap SATURATES (FP → 1) once n >> m/k.
    """
    n = max(int(n_keys), 1)
    return _WORD * ((bits_per_key * n + _WORD - 1) // _WORD)


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """array<long> of ``num_hashes`` bit positions for ``key``.

    Kirsch–Mitzenmacher double hashing: pos_j = (h1 + j·h2) mod m with
    h1/h2 the first/second 32-bit windows of md5(key) — the standard
    construction (Kirsch & Mitzenmacher 2006) giving any number of
    probe positions from ONE hash evaluation with the asymptotically
    identical FP rate to k independent hashes. (Slicing md5 directly
    caps k at 4 eight-hex windows — too few: optimal k = (m/n)·ln2 is
    17 at 24 bits/key.) h1 + j·h2 < 2^32·(k+1) stays far inside BIGINT.
    """
    h = F.md5(key)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.array(
        *[(h1 + F.lit(j) * h2) % num_bits for j in range(num_hashes)]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(word_idx, word): the filter as ≤ num_bits/32 bitmap words.

    bit_or is idempotent, so duplicate keys need no pre-distinct — the
    map-side partial aggregate already collapses every task to at most
    num_bits/32 rows before the (tiny) exchange.
    """
    pos = (
        keys.select(
            F.explode(
                _positions(F.col(key_col), num_bits, num_hashes)
            ).alias("pos")
        )
    )
    return (
        pos.select(
            (F.col("pos") / _WORD).cast("long").alias("word_idx"),
            # F.shiftleft takes a literal shift; the per-row shift needs
            # the SQL form
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def bloom_contains(
    df: DataFrame,
    bitmap: DataFrame,
    key_col: str = "key",
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Input rows + ``bf_hit``: true iff ALL ``num_hashes`` bits of
    ``key_col`` are set in ``bitmap`` (possible member; false = definitely
    absent). The bitmap side broadcasts; the probe side never shuffles —
    the two aggregations are keyed by the probe's own row.
    """
    cols = df.columns
    probes = df.withColumn(
        "_pos",
        F.explode(_positions(F.col(key_col), num_bits, num_hashes)),
    ).select(
        *cols,
        (F.col("_pos") / _WORD).cast("long").alias("word_idx"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {_WORD} AS INT))"
        ).alias("mask"),
    )
    tested = probes.join(F.broadcast(bitmap), "word_idx", "left").withColumn(
        "_bit_set",
        F.coalesce(
            (F.col("word").bitwiseAND(F.col("mask")) != 0), F.lit(False)
        ),
    )
    return tested.groupBy(*cols).agg(
        F.min(F.col("_bit_set").cast("int")).cast("boolean").alias("bf_hit")
    )


# largest bitmap the vectorized probe tier will collect to the driver:
# 2^27 bits = 16 MB of words — instant to collect/broadcast. Beyond that
# (≈ 5.6M keys at 24 bits/key) the probe should stay on the
# broadcast-join tier, whose bitmap never leaves the cluster.
BLOOM_VECTOR_MAX_BITS = 1 << 27


def bloom_contains_numpy(
    df: DataFrame,
    bitmap: DataFrame,
    key_col: str = "key",
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Input rows + ``bf_hit`` — vectorized Arrow tier, bit-identical to
    ``bloom_contains`` (same ``_positions`` double-hash family; pytest-
    pinned equal).

    The bitmap is collected ONCE into a numpy word array (bounded by
    ``BLOOM_VECTOR_MAX_BITS``: ≤16 MB) and closure-broadcast; each Arrow
    batch then tests all ``num_hashes`` positions of every key as one
    |batch| × k gather — NO k-fold row explode, NO join, NO keyed
    re-aggregation, and the probe side keeps its partitioning. This is
    the fast tier whenever the filter fits driver memory; at
    billions-of-keys scale use ``bloom_contains`` (broadcast-join tier),
    whose bitmap never materializes on the driver.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if num_bits > BLOOM_VECTOR_MAX_BITS:
        raise ValueError(
            f"bitmap of {num_bits} bits exceeds BLOOM_VECTOR_MAX_BITS; "
            "use bloom_contains (broadcast-join tier)"
        )
    arr = np.zeros(num_bits // _WORD, dtype=np.int64)
    for r in bitmap.collect():
        arr[int(r["word_idx"])] = int(r["word"])

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("bf_hit", T.BooleanType())]
    )
    cols = df.columns
    k = num_hashes

    def probe(batches):
        import hashlib

        js = np.arange(k, dtype=np.int64)[None, :]
        for pdf in batches:
            if not len(pdf):
                continue
            digs = pdf[key_col].map(
                lambda s: hashlib.md5(str(s).encode()).hexdigest()
            )
            h1 = digs.map(lambda d: int(d[:8], 16)).to_numpy(np.int64)
            h2 = digs.map(lambda d: int(d[8:16], 16)).to_numpy(np.int64)
            pos = (h1[:, None] + js * h2[:, None]) % num_bits
            bits = (arr[pos // _WORD] >> (pos % _WORD)) & 1
            out = pdf[cols].copy()
            out["bf_hit"] = bits.all(axis=1)
            yield out

    return df.mapInPandas(probe, out_schema)


def bloom_words_literal(bitmap: DataFrame) -> dict[int, int]:
    """Collect a built filter into {word_idx: word} — bounded by contract
    (≤ num_bits/32 rows, ~128 longs ≈ 1 KB) for literal embedding."""
    return {int(r["word_idx"]): int(r["word"]) for r in bitmap.collect()}


def bloom_hit_expr(
    key: Column,
    words: dict[int, int],
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> Column:
    """Scalar ``possible-member`` test against a LITERAL bitmap — no join,
    no shuffle, no aggregation, so it composes into streaming append-mode
    plans and higher-order lambdas (``F.exists`` over a window-hash
    array). The bitmap is a constant-folded literal array; each of the
    ``num_hashes`` probes is one md5-window modulo + bit test, all
    whole-stage codegen.

    Semantics match ``bloom_contains`` bit-for-bit (same ``_positions``
    family): no false negatives; FP rate (1-e^{-kn/m})^k.
    """
    arr = F.array(
        *[
            F.lit(int(words.get(i, 0))).cast("long")
            for i in range(num_bits // _WORD)
        ]
    )
    h = F.md5(key)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    conds = []
    for j in range(num_hashes):
        pos = (h1 + F.lit(j) * h2) % num_bits
        word = F.element_at(arr, (pos / _WORD).cast("int") + 1)
        # SQL shiftleft accepts a column shift (the PySpark wrapper is
        # literal-only), exactly matching bloom_build's mask construction
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % _WORD).cast("int")
        )
        conds.append(word.bitwiseAND(mask) != 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
