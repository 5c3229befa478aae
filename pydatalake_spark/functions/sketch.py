"""Mergeable sketches: approximate cardinality + quantiles at 100 TB.

Exact COUNT(DISTINCT) over a 100 TB key column shuffles every distinct
value; a DataSketches HLL sketch is a few KB per group, merges
associatively (partial aggregation → one small final merge), and answers
within ~2% — the standard trade at pipeline scale. Spark ships the
DataSketches implementations (`hll_sketch_agg`/`hll_union_agg`,
`percentile_approx` KLL-style); this module packages the two idioms the
reference's users would need:

- per-group summary (`sketch_summary`): distinct estimate + quantiles in
  ONE pass, partials combined map-side;
- sketch ROLLUP (`hll_rollup`): keep the binary sketch per fine-grained
  group, union to coarser grains WITHOUT rescanning the data — the
  pre-aggregation pattern for cardinality dashboards.

No SQL oracle: estimates are engine-specific; correctness is bounded-error
vs exact counts in tests/test_operators.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_summary(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """One-pass per-group approximate profile: n, distinct≈, quantiles≈."""
    qs = list(quantiles)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.hll_sketch_estimate(F.hll_sketch_agg(distinct_col))
        .cast("long")
        .alias("approx_distinct"),
        F.percentile_approx(value_col, qs, accuracy).alias("approx_quantiles"),
    )


def hll_rollup(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    distinct_col: str,
) -> tuple[DataFrame, DataFrame]:
    """(fine, coarse) distinct-estimates where the coarse level is computed
    by UNIONING the fine level's sketches — no second scan of the data.

    ``coarse_cols`` must be a subset of ``fine_cols``.
    """
    fine_sk = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(distinct_col).alias("__sk")
    )
    fine = fine_sk.select(
        *fine_cols,
        F.hll_sketch_estimate("__sk").cast("long").alias("approx_distinct"),
    )
    coarse = (
        fine_sk.groupBy(*coarse_cols)
        .agg(F.hll_union_agg("__sk").alias("__sk"))
        .select(
            *coarse_cols,
            F.hll_sketch_estimate("__sk").cast("long").alias("approx_distinct"),
        )
    )
    return fine, coarse
