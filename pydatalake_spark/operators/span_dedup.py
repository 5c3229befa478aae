"""Exact repeated-span detection & removal (substring-level dedup).

Document-level dedup (exact hash, MinHash-LSH, SimHash — operators/dedup.py,
minhash.py, simhash.py) misses the dominant duplication mode in web-scale
training corpora: long VERBATIM SPANS (boilerplate, licenses, quoted
passages) embedded in otherwise-distinct documents. The published fix is
exact substring dedup over the concatenated corpus via suffix arrays
(Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022). A suffix array is a single-machine data structure; the
distributed re-expression used here is the standard fixed-width variant:

1. slide a ``window``-token window (hop 1) over each document and hash each
   window to 16 bytes (md5) — only window HASHES ever shuffle, never the
   window text;
2. count, per window hash, the number of DISTINCT documents containing it
   (two-level: groupBy (doc, hash) with map-side partial agg, then a
   count window over the hash partition — both shuffles are keyed by the
   16-byte hash, so hot boilerplate spreads over the cluster);
3. a window is *duplicated* when it appears in more than ``min_docs``
   documents; per-doc stats aggregate back on doc_id;
4. ``strip_dup_spans`` re-joins the duplicated window start positions per
   document (a bounded int list — at most len(doc) ints) and drops every
   token covered by a duplicated window with one higher-order filter,
   rebuilding the cleaned text JVM-side.

Any span of >= window duplicated tokens is covered by at least one
duplicated window, so the token mask converges to the suffix-array answer
for spans >= window; shorter repeats are below the detection floor by
design (exactly like the min-match-length parameter in Lee et al.).

Scale: per-doc work is linear in tokens; global work is two hash-keyed
shuffles of (id, hash, count) triples. No Python, no arrays in any shuffle.
The reference engine has no substring dedup (SURVEY.md §2 gap list) — this
is beyond-reference capability for the 100 TB training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pydatalake_spark.functions.text import shingles, tokenize
from pydatalake_spark.operators.scaling import fan_out


def _window_hashes(toks):
    """md5 per sliding token window (shingles' short-doc fallback keeps
    sub-window docs as one whole-doc window, so no doc has zero windows)."""
    return lambda k: F.transform(shingles(toks, k=k), F.md5)


def _safe_toks(text_col) -> F.Column:
    """Tokenize with NULL-document safety (ADVICE r3): tokenize(NULL) is
    NULL, F.size(NULL) is -1, and a -1 token count fed F.sequence(0, -2) a
    DESCENDING range downstream — null docs emitted negative token counts
    and null clean_text. A null document is zero tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(
        tokenize(c)
    )


def _doc_window_counts(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """(id, wh, cnt, nd): per (doc, window-hash) occurrence count plus the
    number of distinct docs sharing the hash."""
    # bind tokens to a real column BEFORE the windowing lambdas — an inlined
    # split() would be re-evaluated per element_at inside the shingle HOF
    # (the CollapseProject re-inline hazard; ~20x slower)
    base = df.select(F.col(id_col), _safe_toks(text_col).alias("_toks"))
    wh = _window_hashes(F.col("_toks"))(window)
    # r12: ONE wh-keyed exchange serves BOTH the (doc, hash) grouping and
    # the distinct-doc count window (guide §2.4): hash(wh) satisfies the
    # clustering of groupBy(id, wh) AND of the wh-partitioned window, so
    # neither plans its own shuffle. The old shape exchanged at (id, wh)
    # grain first and re-exchanged by wh for the window — and since
    # intra-doc window repeats are rare (cnt≈1), the (id, wh) partial agg
    # it paid for collapsed almost nothing.
    ex = base.select(F.col(id_col), F.explode(wh).alias("wh")).repartition(
        "wh"
    )
    g = ex.groupBy(id_col, "wh").agg(F.count("*").alias("cnt"))
    # rows of g are unique per (doc, hash): a count over the hash partition
    # IS the distinct-doc count, without a countDistinct shuffle.
    # r8 A/B (VERDICT item 1, measured at 100x/1000x replicas with stage
    # counters): the window form's shuffle volume is exactly linear
    # (records x10.0 across the decade) and beats the pre-aggregate+join
    # alternative ~4x in absolute wall at BOTH scales (7.3s/93s vs
    # 33s/295s) because the join form re-executes the explode for the
    # doc-count branch (column pruning defeats exchange reuse). The r7
    # 1.36 decade exponent was environmental — 37 GB of crashed-probe
    # debris constraining the spill disk + the read-ahead SIGSEGV path —
    # not plan volume; under a clean disk with spill read-ahead off the
    # exponent is 1.10 with 29 GB of measured spill (SCALE.md §span-dedup).
    return g.withColumn("nd", F.count("*").over(Window.partitionBy("wh")))


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 1,
) -> DataFrame:
    """Per-doc duplicated-span statistics.

    Returns (id, n_windows, n_dup_windows, dup_fraction) where a window is
    duplicated iff > ``min_docs`` distinct documents contain it.
    ``dup_fraction`` is the corpus-health metric: the mass of each document
    that is verbatim boilerplate shared with other documents.
    """
    nd = _doc_window_counts(fan_out(df), id_col, text_col, window)
    dup = F.when(F.col("nd") > min_docs, F.col("cnt")).otherwise(F.lit(0))
    return (
        nd.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_windows"),
            F.sum(dup).alias("n_dup_windows"),
        )
        .select(
            id_col,
            F.col("n_windows").cast("long").alias("n_windows"),
            F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
            (F.col("n_dup_windows") / F.col("n_windows"))
            .cast("double")
            .alias("dup_fraction"),
        )
    )


def strip_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 1,
) -> DataFrame:
    """Remove every token covered by a cross-document duplicated window.

    Returns (id, n_tokens, n_kept_tokens, clean_text). The mask is a set
    predicate over duplicated window START positions, so it is insensitive
    to the (nondeterministic) aggregation order of the position list.
    """
    df = fan_out(df)
    base0 = df.select(
        F.col(id_col), _safe_toks(text_col).alias("_toks")
    )
    wh = _window_hashes(F.col("_toks"))(window)

    # r12: pos is consumed TWICE (the duplicated-hash aggregation and the
    # start-position semi-join). Pinning one wh-keyed repartition below
    # both lets ReuseExchange materialize the tokenize+posexplode pass
    # ONCE — the old plan re-tokenized the corpus per branch (the agg
    # exchanged by wh itself; the broadcast-joined branch had no
    # exchange to reuse at all) — and hash(wh) satisfies the clustering
    # of the distinct-doc aggregation AND of the semi-join's left side
    # when the dup set is too big to broadcast (guide §2.4/§7.2).
    pos = base0.select(
        F.col(id_col), F.posexplode(wh).alias("pos", "wh")
    ).repartition("wh")
    dups = (
        pos.groupBy("wh")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") > min_docs)
        .select("wh")
    )
    starts = (
        pos.join(dups, "wh", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("dup_starts"))
    )
    return _strip_by_starts(df, starts, id_col, text_col, window)


def _strip_by_starts(
    df: DataFrame,
    starts: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
) -> DataFrame:
    """(id, n_tokens, n_kept_tokens, clean_text): drop every token covered
    by a window starting at any position in ``starts.dup_starts`` — the
    shared mask of ``strip_dup_spans`` (starts = cross-doc duplicated
    windows) and ``strip_spans_matching`` (starts = windows matching an
    external bad-hash set)."""
    base = df.select(F.col(id_col), _safe_toks(text_col).alias("toks"))
    joined = base.join(starts, id_col, "left").withColumn(
        "dup_starts",
        F.coalesce("dup_starts", F.array().cast("array<int>")),
    )
    # short-doc fallback: its single window covers the whole doc regardless
    # of length, so a duplicated short doc strips to empty
    covers = lambda i: F.exists(
        F.col("dup_starts"),
        lambda p: (i >= p)
        & (
            (i < p + window)
            | (F.size(F.col("toks")) < F.lit(window))
        ),
    )
    # guard the position range for zero-token (null) docs: sequence(0, -1)
    # infers a DESCENDING step and yields [0, -1], not an empty range
    kept = F.when(
        F.size(F.col("toks")) <= 0, F.array().cast("array<int>")
    ).otherwise(
        F.filter(
            F.sequence(F.lit(0), F.size(F.col("toks")) - 1),
            lambda i: ~covers(i),
        )
    )
    return joined.select(
        id_col,
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_kept_tokens"),
        F.array_join(
            F.transform(kept, lambda i: F.element_at("toks", i + 1)), " "
        ).alias("clean_text"),
    )


def strip_spans_matching(
    df: DataFrame,
    bad_hashes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    hash_col: str = "wh",
) -> DataFrame:
    """Surgical span censoring against an EXTERNAL window-hash set:
    remove every token covered by a window whose hash appears in
    ``bad_hashes`` — the span-level decontamination protocol (censor the
    overlapping passage, keep the rest of the document), vs the
    doc-level drop of `exact_ngram_decontamination`. Same
    (id, n_tokens, n_kept_tokens, clean_text) contract as
    ``strip_dup_spans``.

    Scale: the bad-hash set distinct-reduces once; the probe is a
    left-semi join keyed by the 16-byte hash (positions ride with their
    doc id); per-doc start lists are bounded by doc length. At bloom-
    tier bad-set sizes, pre-screen with `operators/bloom.py:
    membership_screen` and semi-join only the flagged docs.
    """
    df = fan_out(df)
    base0 = df.select(F.col(id_col), _safe_toks(text_col).alias("_toks"))
    wh = _window_hashes(F.col("_toks"))(window)
    pos = base0.select(
        F.col(id_col), F.posexplode(wh).alias("pos", "wh")
    )
    bad = (
        bad_hashes.select(F.col(hash_col).alias("wh"))
        .where(F.col("wh").isNotNull())
        .distinct()
    )
    starts = (
        pos.join(bad, "wh", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("dup_starts"))
    )
    return _strip_by_starts(df, starts, id_col, text_col, window)


def dup_spans_against(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Incremental span screen: per BATCH document, the fraction of its
    windows already present in the CORPUS — the ingest-time twin of
    dup_span_stats (a batch doc full of corpus boilerplate gets flagged
    before it lands). The corpus side reduces to a distinct window-hash
    set once per micro-batch; the batch side is typically tiny, so the
    semi-join probes, not rebuilds, the corpus index. No batch x batch or
    corpus x corpus work.
    """
    corpus_w = (
        _doc_window_hashes(corpus, id_col, text_col, window)
        .select("wh")
        .distinct()
    )
    bw = _doc_window_hashes(batch, id_col, text_col, window)
    hits = bw.join(
        corpus_w.withColumn("_hit", F.lit(1)), "wh", "left"
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_known"),
        (
            F.sum(F.coalesce("_hit", F.lit(0)))
            / F.count(F.lit(1)).cast("double")
        ).alias("known_fraction"),
    )


def _doc_window_hashes(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    base = df.select(F.col(id_col), _safe_toks(text_col).alias("_toks"))
    wh = _window_hashes(F.col("_toks"))(window)
    return base.select(F.col(id_col), F.explode(wh).alias("wh"))
