"""Deterministic dataset splits for training pipelines.

`randomSplit` is seed- and partitioning-dependent — re-running it after a
repartition reassigns rows, which silently leaks test data into training
sets. The pipeline-correct primitive is a HASH split: bucket =
f(stable_key) so a document's split membership is a pure function of its
identity — stable across runs, engines, partitionings, and incremental
appends (new data lands in the same proportions without reshuffling old
assignments).

The bucket hash is the first 8 hex chars of md5 (32 bits) mod the bucket
count — portable to any SQL engine for verification, uniform enough for
split proportions (md5 avalanche).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: str | Column, num_buckets: int = 100) -> Column:
    """Stable bucket in [0, num_buckets) from a key column."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % num_buckets
    )


def split_by_hash(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float],
    num_buckets: int = 100,
) -> dict[str, DataFrame]:
    """Partition ``df`` into named splits by hashing ``key_col``.

    ``fractions`` maps split name → fraction; they must sum to ≤ 1 (any
    remainder is simply excluded — useful for subsampling). Contiguous
    bucket ranges are assigned in the mapping's iteration order, so the
    same fractions always produce the same membership.

    >>> splits = split_by_hash(docs, "doc_id",
    ...                        {"train": 0.8, "val": 0.1, "test": 0.1})
    >>> splits["train"].count()  # ~80%, identical on every run
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = hash_bucket(key_col, num_buckets)
    out: dict[str, DataFrame] = {}
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * num_buckets))
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
        lo = hi
    return out
