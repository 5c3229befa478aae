"""SimHash document fingerprinting (beyond-reference north-star op).

Charikar-style simhash over whitespace tokens: each token hashes to a bit
vector; per bit position the +1/-1 contributions are summed over all tokens
(term frequency included); the sign of each sum is the fingerprint bit.
Near-duplicate docs differ in few bits (small Hamming distance).

Portable construction: token bit j = "is hex digit j of md5(token) >= '8'"
(the top bit of each hex nibble), giving a 32-bit fingerprint from the 32
hex digits — every step (md5 / substr / CASE / sum) exists identically in
Spark SQL and any ANSI oracle, so correctness is externally checkable.
A production 64/128-bit variant only changes how bits are extracted.

All Catalyst expressions (one ``transform`` to hash each token once, then
32 ``aggregate`` sums) — zero shuffles, zero Python; the fingerprint is a
narrow per-row map over the corpus, embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydatalake_spark.functions.text import tokenize
from pydatalake_spark.operators.scaling import fan_out

SIMHASH_BITS = 32


def simhash_col(text_col: str | Column, bits: int = SIMHASH_BITS) -> Column:
    """The simhash fingerprint as a '0'/'1' bit string column."""
    toks = tokenize(text_col)
    hashes = F.transform(toks, lambda t: F.md5(t))
    # closure factory (not default-arg lambdas): PySpark infers lambda arity
    # from the Python signature, and aggregate's merge fn must be 2-arg
    def bit_sum(j: int):
        return lambda acc, h: acc + F.when(
            F.substring(h, j + 1, 1) >= F.lit("8"), 1
        ).otherwise(-1)

    bit_cols = []
    for j in range(bits):
        s = F.aggregate(hashes, F.lit(0), bit_sum(j))
        bit_cols.append(F.when(s > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def simhash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Corpus-wide simhash via explode + hash aggregate.

    Higher-order array functions run interpreted (outside whole-stage
    codegen), so the array-expression form of simhash pays ~2k interpreted
    ops per doc. This form explodes to one row per token — scalar ``md5``/
    ``substring``/``CASE`` all codegen'd and vectorized — and reduces with
    32 partial-aggregated SUMs, shuffling only 32 ints per doc. Measured
    ~2× faster at sf0.1; identical output (integer sums commute).
    """
    toks = fan_out(df).select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("tok")
    )
    # bit j of the fingerprint is the top bit of md5 hex digit j. Rather
    # than 32 substr+CASE string ops per token, convert each 8-hex-digit
    # chunk to a 32-bit int once and extract top bits with shift/mask —
    # integer intrinsics inside whole-stage codegen. sum(bit) relates to
    # the ±1 formulation by s_j = 2*sum(bit_j) - n_tokens, so the sign
    # test `s_j > 0` becomes `2*sum - n > 0`; results are identical to
    # the string form (which remains the oracle's formulation).
    hashed = toks.select(
        F.col(id_col),
        *[
            F.conv(F.substring(F.md5("tok"), 8 * c + 1, 8), 16, 10)
            .cast("long")
            .alias(f"c_{c}")
            for c in range(bits // 8)
        ],
    )
    sums = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.shiftrightunsigned(F.col(f"c_{j // 8}"), 35 - 4 * (j % 8 + 1))
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
) -> DataFrame:
    """Near-duplicate pairs by banded simhash + exact Hamming verify.

    Pigeonhole: two fingerprints within ``max_hamming < num_bands`` bits
    must agree on at least one of ``num_bands`` equal-width bands, so the
    candidate set is an equi-join on (band_index, band_value) — ONE shuffle
    keyed by band value, never an all-pairs compare (the OR-of-bands form
    would plan as a nested-loop join). Candidates then pay the exact
    32-bit Hamming check; output (id_a, id_b, hamming ≤ threshold).
    """
    width = bits // num_bands
    # pack the fingerprint into one BIGINT: band keys become shift/mask,
    # Hamming becomes bit_count(xor) — all codegen'd integer intrinsics.
    # The candidate join at band-collision density is the hot path; moving
    # (long, long) pairs instead of 32-char strings and replacing the
    # 32-step interpreted higher-order loop per pair with one xor+popcount
    # took this from 91 s to ~2 s at sf0.1 (5k docs, ~7M candidates).
    sh = simhash_table(df, id_col, text_col, bits).select(
        F.col(id_col), F.conv("simhash", 2, 10).cast("long").alias("sh_int")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.shiftrightunsigned("sh_int", (num_bands - 1 - b) * width)
                    % F.lit(2**width)
                ).alias("val"),
            )
            for b in range(num_bands)
        ]
    )
    bb = sh.select(id_col, "sh_int", F.explode(bands).alias("bb")).select(
        id_col, "sh_int", F.col("bb.band").alias("band"), F.col("bb.val").alias("val")
    )
    a = bb.select(
        F.col(id_col).alias("id_a"), F.col("sh_int").alias("sh_a"), "band", "val"
    )
    c = bb.select(
        F.col(id_col).alias("id_b"), F.col("sh_int").alias("sh_b"), "band", "val"
    )
    hd = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(c, on=["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        # verify BEFORE distinct: popcount is cheaper than deduplicating
        # the full candidate multiset, and it shrinks the distinct's input
        .withColumn("hamming", hd.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
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
