"""Embedding similarity search (beyond-reference north-star op).

Two tiers, per SURVEY §7.1.8 / the north-star brief:

- **Brute-force cosine top-k** (`cosine_topk`): the exactness baseline.
  Query set broadcast against the corpus; cosine via
  ``zip_with``/``aggregate`` (codegen'd, no Python); per-query top-k via a
  rank window partitioned by query id. Cost O(|Q|·|C|) — fine when |Q| is
  small or as the verify step after pruning.

- **Hyperplane LSH buckets** (`hyperplane_buckets`,
  `lsh_bucket_candidates`): the scale path. Sign of the projection onto
  ``num_planes`` fixed pseudo-random hyperplanes (components ±1 derived
  deterministically from md5, so any SQL oracle reproduces them) gives a
  bucket key; cosine-similar vectors land in the same bucket with
  probability ``1 - angle/π`` per bit. Candidate generation is then a
  bucket equi-join (one shuffle) instead of all-pairs. An IVF variant
  (k-means coarse quantizer) would slot in the same two-stage shape.

At 100 TB: the corpus side never broadcasts, never collects; only the
query set (or the bucket index) moves. Bucket skew → AQE; recall ↑ by
querying neighboring buckets (Hamming-1 probes) — multiprobe left as a
second-round extension.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pydatalake_spark.functions.vector import cosine, to_double_array
from pydatalake_spark.operators.scaling import fan_out


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. Returns
    (q_id, c_id, sim) with rank ≤ k, self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("q_id"), to_double_array(vec_col).alias("q_vec")
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("c_id"), to_double_array(vec_col).alias("c_vec")
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("c_id"))
    sim = pairs.select(
        "q_id", "c_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id").asc())
    return (
        sim.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "c_id", "sim")
    )


def hyperplane_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, bucket) — bucket is the `num_planes`-bit sign pattern of the
    vector's projections onto deterministic ±1 hyperplanes.

    Plane p component i is ``+1 if md5("p:i")[0] >= '8' else -1`` —
    reproducible anywhere md5 exists. The signs are row-independent
    constants, so they are computed ONCE on the driver (hashlib md5 — the
    same function the SQL oracle evaluates per-row) and shipped as literal
    arrays: the hot path is a pure multiply-accumulate per element instead
    of dim × num_planes md5 calls per row.
    """
    v = to_double_array(vec_col)

    bits = []
    for p in range(num_planes):
        signs = F.array(
            *[
                F.lit(
                    1.0
                    if hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0] >= "8"
                    else -1.0
                )
                for i in range(1, dim + 1)
            ]
        )
        proj = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return fan_out(df).select(F.col(id_col), F.concat(*bits).alias("bucket"))


def lsh_bucket_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing an LSH bucket — the cheap
    pre-filter before exact cosine verification."""
    b = hyperplane_buckets(df, id_col, vec_col, num_planes, dim)
    a = b.select(F.col(id_col).alias("id_a"), "bucket")
    c = b.select(F.col(id_col).alias("id_b"), "bucket")
    return (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "bucket")
    )
