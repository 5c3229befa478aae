"""As-of join — match each left row to the nearest right row at-or-before
(backward) / at-or-after (forward) its timestamp, per key group.

Spark has no native as-of join (the reference has none either — this is a
beyond-reference operator for time-series/event pipelines). Implemented as a
pure DataFrame composition, NOT a pandas merge_asof UDF:

    union(left, right) → window last(right_payload, ignorenulls)
        over (PARTITION BY keys ORDER BY ts, side) → filter left rows

which costs exactly ONE shuffle on the group keys (the window exchange) and
stays entirely inside whole-stage codegen. The per-key sort is the same work
a sort-merge as-of would do; no row ever visits Python.

Scale: partitions by the `by` keys, so key skew is the only hazard — at
1000-executor scale a hot key should be pre-split (salt on a time bucket and
run two passes) or handled by AQE skew splitting of the exchange.

Tie rule: a right row at exactly the left row's timestamp IS a match for
backward (ts_left >= ts_right), matching DuckDB's ``ASOF JOIN`` semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side__"
_RV = "__rv__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join. Right payload columns come back suffixed; the
    matched right timestamp is ``{on}{suffix}``. Unmatched → NULLs.

    ``direction='nearest'`` takes whichever of the backward/forward match
    is closer in time (ties → backward), still over ONE exchange (two
    sorts share the partitioning). ``tolerance`` (seconds) nulls out
    matches farther than the bound — ``pd.merge_asof`` semantics.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    keys = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in (right_cols or right.columns) if c not in keys and c != on]

    rv = F.struct(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    r_part = (
        right.filter(F.col(on).isNotNull())
        .select(*keys, on, rv.alias(_RV))
        .withColumn(_SIDE, F.lit(0))
    )
    l_part = left.withColumn(_SIDE, F.lit(1))
    combined = l_part.unionByName(r_part, allowMissingColumns=True)

    def filled_col(d: str):
        if d == "backward":
            # right rows sort BEFORE left rows at equal ts → equality matches
            order = [F.col(on).asc_nulls_first(), F.col(_SIDE).asc()]
        else:
            order = [F.col(on).desc_nulls_last(), F.col(_SIDE).asc()]
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(_RV, ignorenulls=True).over(w)

    def within_tol(match):
        if tolerance is None:
            return match
        gap = F.abs(
            F.col(on).cast("double") - match[f"{on}{suffix}"].cast("double")
        )
        return F.when(gap <= F.lit(float(tolerance)), match)

    def null_safe(match):
        # a left row with a NULL timestamp matches nothing (pd.merge_asof
        # semantics); without this mask the forward fill window places
        # null-ts rows after every right row and fabricates a match
        return F.when(F.col(on).isNotNull(), match)

    if direction == "nearest":
        back = null_safe(within_tol(filled_col("backward")))
        fwd = null_safe(within_tol(filled_col("forward")))
        gap_b = F.col(on).cast("double") - back[f"{on}{suffix}"].cast("double")
        gap_f = fwd[f"{on}{suffix}"].cast("double") - F.col(on).cast("double")
        pick = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(gap_f < gap_b, fwd)
            .otherwise(back)
        )
        filled = combined.withColumn(_RV, pick)
    else:
        filled = combined.withColumn(
            _RV, null_safe(within_tol(filled_col(direction)))
        )
    out_cols = list(left.columns) + [
        F.col(f"{_RV}.{f}").alias(f)
        for f in [f"{on}{suffix}"] + [f"{c}{suffix}" for c in payload]
    ]
    return filled.filter(F.col(_SIDE) == 1).select(*out_cols)
