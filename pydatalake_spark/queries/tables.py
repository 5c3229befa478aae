"""Test-table loaders shared by the query corpus and bench harness."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# (applicationId, sf_dir, name) -> analyzed DataFrame. The testdata tables
# are immutable, so re-listing files and re-reading footers on every
# load_table call is pure per-query overhead (~50-100 ms each) — cache the
# ANALYZED PLAN (not the data; scans stay lazy and re-run per action).
# Single-app cache: entries from other applicationIds are evicted on first
# touch by a new session, so plans bound to stopped SparkSessions don't
# accumulate in long-lived driver processes (ADVICE r3).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _evict_other_apps(app_id: str) -> None:
    stale = [k for k in _TABLE_CACHE if k[0] != app_id]
    for k in stale:
        del _TABLE_CACHE[k]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.ts`` has shipped in two physical spellings across driver
    rounds: parquet TIMESTAMP(NANOS) (rounds 1-2; Spark's vectorized
    reader rejects it unless read as int64 via
    ``spark.sql.legacy.parquet.nanosAsLong``) and plain microsecond
    timestamp WITHOUT the UTC-adjusted flag (round 3+; Spark 4 infers
    TIMESTAMP_NTZ, which ``unix_micros``/window range frames reject).
    Normalize both to session-TZ TimestampType (UTC pinned below) so every
    downstream query sees one type and epoch math agrees with DuckDB's
    ``epoch_us`` on the same naive values. Runtime-settable confs only, so
    this works under any caller-provided session.
    """
    # pin UTC + ANSI-off per session so results are caller-session-agnostic
    # (the driver's harness builds its own SparkSession)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    app_id = spark.sparkContext.applicationId
    _evict_other_apps(app_id)
    key = (app_id, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # nanos-as-long: truncate to micros
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # NTZ wall time == UTC instant here
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        _TABLE_CACHE[key] = df
        return df
    df = spark.read.parquet(path)
    _TABLE_CACHE[key] = df
    return df
