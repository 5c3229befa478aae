"""SimHash document fingerprinting (beyond-reference north-star op).

Charikar-style simhash over whitespace tokens: each token hashes to a bit
vector; per bit position the +1/-1 contributions are summed over all tokens
(term frequency included); the sign of each sum is the fingerprint bit.
Near-duplicate docs differ in few bits (small Hamming distance).

**64-bit fingerprints** (the industry-standard width): token bits come from
md5's 32 hex digits, two bits per nibble — bit ``2d`` is the nibble's top
bit (digit ≥ '8'), bit ``2d+1`` its second bit (digit in 4-7/c-f). Every
step (md5 / substr / CASE / sum) exists identically in Spark SQL and any
ANSI oracle, so correctness is externally checkable.

Width is a SCALE decision, not cosmetics: banded candidate generation
collides with probability 2^-width_per_band per band, so 32-bit/8-bit-band
fingerprints blow up at ~10^5 docs (n²/256 candidate pairs) while
64-bit/16-bit bands hold to ~10^7 docs per band-bucket domain — and the
Hamming verify is one xor+popcount either way.

All Catalyst expressions — zero shuffles beyond the fingerprint groupBy,
zero Python; the per-token bit extraction converts each 8-hex-digit md5
chunk to a 32-bit int once and uses shift/mask (whole-stage codegen), not
per-bit string ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydatalake_spark.functions.text import tokenize
from pydatalake_spark.operators.scaling import fan_out

SIMHASH_BITS = 64

_SECOND_BIT_DIGITS = ("4", "5", "6", "7", "c", "d", "e", "f")


def simhash_col(text_col: str | Column, bits: int = SIMHASH_BITS) -> Column:
    """The simhash fingerprint as a '0'/'1' bit string column (array-
    expression form; `simhash_table` is the faster explode form)."""
    toks = tokenize(text_col)
    hashes = F.transform(toks, lambda t: F.md5(t))

    # closure factory (not default-arg lambdas): PySpark infers lambda arity
    # from the Python signature, and aggregate's merge fn must be 2-arg
    def bit_sum(j: int):
        d = j // 2
        if j % 2 == 0:
            cond = lambda h: F.substring(h, d + 1, 1) >= F.lit("8")  # noqa: E731
        else:
            cond = lambda h: F.substring(h, d + 1, 1).isin(*_SECOND_BIT_DIGITS)  # noqa: E731
        return lambda acc, h: acc + F.when(cond(h), 1).otherwise(-1)

    bit_cols = []
    for j in range(bits):
        s = F.aggregate(hashes, F.lit(0), bit_sum(j))
        bit_cols.append(F.when(s > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def simhash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Corpus-wide simhash via explode + hash aggregate.

    One row per token — scalar md5/conv/shift all codegen'd — reduced with
    ``bits`` partial-aggregated SUMs; the shuffle moves only the per-doc
    partial sums (map-side combine), never the tokens.

    Bit ``j`` reads nibble ``j//2`` of the md5: the nibble's top bit for
    even ``j``, its second bit for odd ``j`` — via shift/mask on 32-bit
    chunk ints. ``s_j = 2*sum(bit_j) - n_tokens`` relates the bit sums to
    the ±1 formulation (which remains the oracle's spelling); the sign
    tests are identical.
    """
    toks = fan_out(df).select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    n_chunks = (bits // 2 + 7) // 8
    hashed = toks.select(
        F.col(id_col),
        *[
            F.conv(F.substring(F.md5("tok"), 8 * c + 1, 8), 16, 10)
            .cast("long")
            .alias(f"c_{c}")
            for c in range(n_chunks)
        ],
    )

    def bit_shift(j: int) -> tuple[int, int]:
        d = j // 2  # nibble index 0..31
        chunk, pos = d // 8, d % 8
        nibble_shift = 28 - 4 * pos
        return chunk, nibble_shift + (3 if j % 2 == 0 else 2)

    sums = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.shiftrightunsigned(F.col(f"c_{bit_shift(j)[0]}"), bit_shift(j)[1])
                % F.lit(2)
            ).alias(f"s_{j}")
            for j in range(bits)
        ],
    )
    bit_cols = [
        F.when(2 * F.col(f"s_{j}") - F.col("__n") > 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for j in range(bits)
    ]
    return sums.select(F.col(id_col), F.concat(*bit_cols).alias("simhash"))


def simhash_near_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    num_bands: int = 4,
    max_hamming: int = 3,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by banded simhash + exact Hamming verify.

    ``fingerprints`` optionally supplies a precomputed ``(id, simhash)``
    table (e.g. cached from `simhash_table`) — fingerprinting is the
    expensive pass, and a dedup pipeline typically reuses one index for
    several operations.

    Pigeonhole: two fingerprints within ``max_hamming < num_bands`` bits
    must agree on at least one of ``num_bands`` equal-width bands, so the
    candidate set is an equi-join on (band_index, band_value) — ONE shuffle
    keyed by band value, never an all-pairs compare (the OR-of-bands form
    would plan as a nested-loop join). At 64 bits / 4 bands the band
    domain is 2^16 per band, which keeps candidate density ~n²·4/65536
    instead of the n²·4/256 a 32-bit fingerprint gives.

    The fingerprint packs into two BIGINTs (hi/lo 32 bits — one long would
    overflow signed range at 64 bits): band keys are shift/mask, Hamming is
    bit_count(xor)+bit_count(xor) — codegen'd integer intrinsics. The
    verify runs BEFORE the pair-distinct so popcount shrinks the dedup
    input.
    """
    width = bits // num_bands
    half = bits // 2
    if bits % num_bands:
        raise ValueError(f"num_bands must divide bits ({bits}); got {num_bands}")
    if max_hamming >= num_bands:
        # pigeonhole only guarantees a shared band when strictly fewer
        # differing bits than bands exist — beyond that, true pairs are
        # silently missed
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < num_bands ({num_bands}) "
            f"for the banding to be lossless"
        )
    for b in range(num_bands):
        if (b * width) // half != (b * width + width - 1) // half:
            # a band straddling the hi/lo word split would read zero-padded
            # bits and silently MISS true near-duplicate pairs — reject
            # rather than break the pigeonhole guarantee
            raise ValueError(
                f"band {b} (width {width}) straddles the {half}-bit hi/lo "
                f"split; choose num_bands so each band fits one word "
                f"(e.g. 2, 4, 8 for 64-bit fingerprints)"
            )
    fp = fingerprints if fingerprints is not None else simhash_table(
        df, id_col, text_col, bits
    )
    sh = fp.select(
        F.col(id_col),
        F.conv(F.substring("simhash", 1, half), 2, 10).cast("long").alias("sh_hi"),
        F.conv(F.substring("simhash", half + 1, half), 2, 10)
        .cast("long")
        .alias("sh_lo"),
    )

    def band_val(b: int):
        # bands laid out hi→lo; width ≤ 32 keeps every value in signed range
        start_bit = b * width  # from the string's left (MSB of hi)
        if start_bit + width <= half:
            src, off = F.col("sh_hi"), half - start_bit - width
        else:
            src, off = F.col("sh_lo"), bits - start_bit - width
        return F.shiftrightunsigned(src, off) % F.lit(2**width)

    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_val(b).alias("val"))
            for b in range(num_bands)
        ]
    )
    bb = sh.select(id_col, "sh_hi", "sh_lo", F.explode(bands).alias("bb")).select(
        id_col,
        "sh_hi",
        "sh_lo",
        F.col("bb.band").alias("band"),
        F.col("bb.val").alias("val"),
    )
    # r12 kept both self-join sides plan-identical below the exchange so
    # ReuseExchange can unify them — but that only fires in the
    # SHUFFLE-join regime over an uncached upstream (r13/ADVICE r12: in
    # the broadcast regime there is no exchange to reuse and the
    # fingerprint pass ran TWICE; over a cached upstream Spark 4's
    # per-side TableCacheQueryStage blocks the unification anyway).
    # r13: cache the narrow (id, sh_hi, sh_lo, band, val) band table —
    # its blocks are computed once and BOTH sides read them in every
    # join regime; the duplicated work is at most a cache scan + the
    # narrow band shuffle, never the fingerprint pass.
    # (Deliberately not cached pre-partitioned: AQE cannot skew-split a
    # cached scan, and hot band values are the skew hazard; measured
    # +0.13s warm at sf0.1 for zero broadcast-regime benefit.)
    from pydatalake_spark.session import cache_once

    bb = cache_once(bb)
    x, y = bb.alias("__sa"), bb.alias("__sb")
    hd = F.bit_count(
        F.col("__sa.sh_hi").bitwiseXOR(F.col("__sb.sh_hi"))
    ) + F.bit_count(F.col("__sa.sh_lo").bitwiseXOR(F.col("__sb.sh_lo")))
    return (
        x.join(
            y,
            (F.col("__sa.band") == F.col("__sb.band"))
            & (F.col("__sa.val") == F.col("__sb.val")),
        )
        .filter(F.col(f"__sa.{id_col}") < F.col(f"__sb.{id_col}"))
        .withColumn("hamming", hd.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"__sa.{id_col}").alias("id_a"),
            F.col(f"__sb.{id_col}").alias("id_b"),
            "hamming",
        )
        .distinct()
    )


def hamming_distance(a: Column, b: Column, bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two bit-string fingerprints."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(a.substr(i, F.lit(1)) != b.substr(i, F.lit(1)), 1).otherwise(0),
    )
