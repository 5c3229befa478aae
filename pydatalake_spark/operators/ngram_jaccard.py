"""Exact n-gram Jaccard near-duplicate pairs via an inverted shingle index.

Complements the MinHash-LSH path (operators/minhash.py): LSH is the
probabilistic/recall-tunable variant; this is the EXACT one — every pair
with Jaccard >= threshold is found (within the optional ``max_df`` prune).
The standard scalable shape (set-similarity joins a la Vernica/Carey/Li,
SIGMOD'10) expressed as two Catalyst shuffles, no Python in the hot path:

1. shingle each document into token n-grams, distinct per doc;
2. build the inverted index ``(shingle, doc_id)`` with one explode;
3. OPTIONAL document-frequency prune: drop shingles occurring in more than
   ``max_df`` documents. A shingle shared by k docs contributes k(k-1)/2
   join rows, so one boilerplate trigram in 10^5 docs adds 5·10^9 pairs —
   DF-pruning is the standard production guard (it only loses pairs whose
   ENTIRE overlap is ultra-common boilerplate, which exact-hash dedup
   handles better anyway);
4. self-equi-join the index on shingle (ONE shuffle keyed by shingle) and
   count co-occurrences per (id_a, id_b) — the pair's intersection size —
   with map-side partial aggregation compressing the pair stream;
5. join back per-doc set sizes (narrow, ids+ints only) and keep pairs with
   ``inter / (|A| + |B| - inter) >= threshold``.

Scale: intersection counting moves only (shingle, id) pairs — never the
shingle arrays — and the pair aggregation is algebraic (partial agg
map-side). Skew lives in hot shingles, bounded by ``max_df``; AQE splits
whatever survives. Reference parity: the reference engine has no near-dup
operator at all (SURVEY.md §2 gap list) — this is beyond-reference
capability for the 100 TB training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydatalake_spark.functions.text import shingles, tokenize
from pydatalake_spark.operators.scaling import fan_out
from pydatalake_spark.session import cache_once


def shingle_sets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """(id, sset) — distinct token-n-gram set per document, as ONE Arrow
    `mapInPandas` pass.

    r13: the expression form (`transform(sequence)` + `concat_ws` per
    element + `array_distinct`) is a Catalyst higher-order-function
    chain interpreted PER ARRAY ELEMENT — same class as the minhash
    signature chain (guide §4.2). The Arrow tier measured flat at sf0.1
    (worker latency ≈ the saved interpretation) and **3.1× faster at
    the 10× replica dir** where the interpreted chain dominates. Values
    bit-identical — `_shingle_sets_expr` keeps the expression form as
    the equivalence-test reference. Only (id, text) crosses the
    boundary; iterator form amortizes setup per task (§4.1/§4.5)."""
    df = fan_out(df)
    id_type = dict(df.dtypes)[id_col]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                if text is None:
                    # mirror the expression form: split(trim(null)) is
                    # null -> the short-doc branch yields [null]
                    out.append([None])
                    continue
                toks = text.strip(" ").split(" ")
                if len(toks) >= shingle_size:
                    sh = [
                        " ".join(toks[i : i + shingle_size])
                        for i in range(len(toks) - shingle_size + 1)
                    ]
                else:
                    sh = [" ".join(toks)]
                out.append(list(dict.fromkeys(sh)))
            yield pd.DataFrame({id_col: pdf[id_col], "sset": out})

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} {id_type}, sset array<string>"
    )


def _shingle_sets_expr(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """The Catalyst-expression form of `shingle_sets` — the oracle-shaped
    reference the Arrow tier is equivalence-tested against."""
    df = fan_out(df)
    sh = shingles(tokenize(text_col), k=shingle_size)
    return df.select(F.col(id_col), F.array_distinct(sh).alias("sset"))


def _hot_shingles(dfc: DataFrame, max_df) -> DataFrame:
    """Shingles whose document frequency exceeds ``max_df``, from a
    ``(shingle, __df)`` count table. ``max_df`` is an int literal or a
    ONE-ROW DataFrame carrying ``__max_df`` — the r13 in-plan form: the
    cap rides the plan as a broadcast instead of a per-call driver
    ``count()`` job (guide §1.2/§5; r12 VERDICT item 7). The cap VALUE
    is identical either way; only where it is computed changes."""
    if isinstance(max_df, DataFrame):
        return (
            dfc.crossJoin(F.broadcast(max_df))
            .filter(F.col("__df") > F.col("__max_df"))
            .select("shingle")
        )
    return dfc.filter(F.col("__df") > max_df).select("shingle")


def _inv_self_join_inter(inv: DataFrame, id_col: str) -> DataFrame:
    """(id_a < id_b, inter): per-pair co-occurrence counts from the
    inverted index's self-equi-join on shingle.

    r12: identical projections on both self-join sides until after the
    exchange — canonically-equal children let ReuseExchange / the AQE
    stage cache materialize ONE shuffle of the inverted index instead of
    two (guide §2.4; same fix as the minhash/simhash/phash band joins).
    The per-side id renames happen above the join.
    """
    x, y = inv.alias("__ja"), inv.alias("__jb")
    return (
        x.join(y, F.col("__ja.shingle") == F.col("__jb.shingle"))
        .filter(F.col(f"__ja.{id_col}") < F.col(f"__jb.{id_col}"))
        .select(
            F.col(f"__ja.{id_col}").alias("id_a"),
            F.col(f"__jb.{id_col}").alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_df: int | DataFrame | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with exact n-gram Jaccard >= ``threshold``.

    ``max_df`` drops shingles present in more than that many documents
    before the self-join (see module docstring for why that is the 100 TB
    survival knob); it may be an int or a one-row ``__max_df`` DataFrame
    (cap computed in-plan — see ``_hot_shingles``). With ``max_df=None``
    recall is exactly 1. When pruning
    is on, set sizes are recomputed ON THE PRUNED SHINGLE SPACE, so the
    result is the exact Jaccard over informative (non-boilerplate)
    shingles — not a downward-biased estimate of the full-set Jaccard.
    The 10× scaling probe (bench.py) measured exponent 2.1 for the
    uncapped join on a corpus with hot shingles vs ~linear with the cap —
    this knob is the difference between an operator that survives 100 TB
    and one that doesn't.

    Cached intermediates (inverted index / shingle sets) rely on Spark's
    LRU block eviction for reclamation — MEMORY_AND_DISK degrades to
    recompute, never OOM; sweep-style services should
    spark.catalog.clearCache() between batches.
    """
    sets = shingle_sets(df, id_col, text_col, shingle_size)
    inv = sets.select(F.col(id_col), F.explode("sset").alias("shingle"))
    if max_df is not None:
        hot = _hot_shingles(
            inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df")),
            max_df,
        )
        inv = inv.join(F.broadcast(hot), on="shingle", how="left_anti")
        # r13: cache PRE-PARTITIONED on the join key — InMemoryTableScan
        # preserves the cached plan's output partitioning, so both
        # self-join sides read the index exchange-free in the shuffle
        # regime (the one inverted-index shuffle runs inside the cache
        # build; Spark 4's per-side TableCacheQueryStage otherwise blocks
        # exchange reuse over a cached relation). Hot-shingle skew in
        # that one shuffle is bounded by the max_df prune above.
        inv = cache_once(inv.repartition("shingle"))
        sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    else:
        sets = cache_once(sets)
        inv = sets.select(F.col(id_col), F.explode("sset").alias("shingle"))
        sizes = sets.select(F.col(id_col), F.size("sset").alias("n"))
    inter = _inv_self_join_inter(inv, id_col)
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a")), "id_a"
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b")), "id_b"
        )
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_against(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_df: int | DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup: pairs between a NEW ``batch`` and the EXISTING
    ``corpus`` only — the daily-ingest shape. Never compares corpus docs
    with each other, so the join cost is O(batch-index × matching corpus
    postings), not O(corpus²): at 100 TB the corpus side is the big one
    and this asymmetry is the whole point. Same DF prune (computed on the
    corpus+batch union so a boilerplate shingle is recognized no matter
    which side it dominates) and same pruned-space Jaccard semantics as
    `ngram_jaccard_pairs`. Output: (batch_id, corpus_id, jaccard).
    """
    inv_c = shingle_sets(corpus, id_col, text_col, shingle_size).select(
        F.col(id_col), F.explode("sset").alias("shingle")
    )
    inv_b = shingle_sets(batch, id_col, text_col, shingle_size).select(
        F.col(id_col), F.explode("sset").alias("shingle")
    )
    if max_df is not None:
        df_counts = (
            inv_c.select("shingle")
            .union(inv_b.select("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
        )
        hot = _hot_shingles(df_counts, max_df)
        inv_c = inv_c.join(F.broadcast(hot), on="shingle", how="left_anti")
        inv_b = inv_b.join(F.broadcast(hot), on="shingle", how="left_anti")
    # r13: pre-partitioned caches — the batch-vs-corpus join consumes
    # both indexes exchange-free (see ngram_jaccard_pairs)
    inv_c = cache_once(inv_c.repartition("shingle"))
    inv_b = cache_once(inv_b.repartition("shingle"))
    n_c = inv_c.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_c"))
    n_b = inv_b.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_b"))
    inter = (
        inv_b.select(F.col(id_col).alias("batch_id"), "shingle")
        .join(inv_c.select(F.col(id_col).alias("corpus_id"), "shingle"), "shingle")
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(n_b.select(F.col(id_col).alias("batch_id"), "n_b"), "batch_id")
        .join(n_c.select(F.col(id_col).alias("corpus_id"), "n_c"), "corpus_id")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_b") + F.col("n_c") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.8,
    max_df: int | DataFrame | None = None,
) -> DataFrame:
    """All ordered pairs where the SMALLER document's shingle set is
    ``threshold``-contained in the larger's: containment =
    inter / min(|A|, |B|). The partial-duplication class Jaccard
    under-scores — a full document embedded in one 10x longer has
    Jaccard ~0.1 but containment ~1.0 (quote-expansion, aggregation
    pages, prefix/suffix re-crawls beyond `prefix_containment_pairs`'s
    contiguous-prefix case).

    Output (inner_id, outer_id, containment): inner is the contained
    (smaller-set) side; set-size ties default to the smaller id as
    inner. Same inverted-index join + DF-prune scale shape as
    `ngram_jaccard_pairs` (one shuffle keyed by shingle, pair stream
    partially aggregated map-side; containment on the PRUNED space).
    """
    sets = shingle_sets(df, id_col, text_col, shingle_size)
    inv = sets.select(F.col(id_col), F.explode("sset").alias("shingle"))
    if max_df is not None:
        hot = _hot_shingles(
            inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df")),
            max_df,
        )
        inv = inv.join(F.broadcast(hot), on="shingle", how="left_anti")
    # r13: pre-partitioned cache — see ngram_jaccard_pairs
    inv = cache_once(inv.repartition("shingle"))
    sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    inter = _inv_self_join_inter(inv, id_col)
    scored = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b")),
            "id_b",
        )
        .withColumn(
            "containment",
            F.col("inter") / F.least(F.col("n_a"), F.col("n_b")),
        )
        .filter(F.col("containment") >= threshold)
    )
    inner_first = F.col("n_a") < F.col("n_b")
    tie = (F.col("n_a") == F.col("n_b"))
    return scored.select(
        F.when(inner_first | tie, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("inner_id"),
        F.when(inner_first | tie, F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("outer_id"),
        "containment",
    )
