"""Watermarked stream-stream join: event attribution in flight.

The batch engine answers "which click followed which view within W
minutes" with a time-bucketed range join (queries/relational.py:
range_join_events). The streaming twin is Structured Streaming's
stream-stream inner join with BOTH sides watermarked and a two-sided time
bound on the join condition — that pair of constraints is what lets Spark
garbage-collect join state: a buffered view can be dropped as soon as the
click watermark passes ``view_ts + window``.

Scale shape: state is partitioned by the equi-key (user_id) across
executors and bounded by (watermark horizon x per-user event rate); the
time bound makes eviction provable, so the join never accumulates
unbounded state no matter how long the streams run. Without the bound
Spark refuses the query outright (AnalysisException) — correctness by
construction.

The reference engine has no streaming at all (SURVEY §2.10); this extends
the beyond-reference streaming tier (ingest/dedup/windowed aggs/stateful
sessionization) with the remaining classic: joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_attribution(
    views: DataFrame,
    clicks: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Attribute each click to the views it followed within the window.

    ``views``/``clicks`` are STREAMING DataFrames sharing ``key_col`` and
    ``ts_col``. Returns (user_id, view_ts, click_ts, lag_seconds) for every
    (view, click) pair with ``view_ts <= click_ts < view_ts + window``.
    Both sides are watermarked so join state is evictable.
    """
    v = views.select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col).alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col(key_col).alias("click_user"),
        F.col(ts_col).alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    cond = (
        (v["user_id"] == c["click_user"])
        & (c["click_ts"] >= v["view_ts"])
        & (
            c["click_ts"]
            < v["view_ts"] + F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    return v.join(c, cond, "inner").select(
        "user_id",
        "view_ts",
        "click_ts",
        (
            (F.unix_micros("click_ts") - F.unix_micros("view_ts"))
            / F.lit(1e6)
        ).alias("lag_seconds"),
    )
