"""Test-table loaders shared by the query corpus and bench harness."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright; read it as int64 nanoseconds
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
    TimestampType — the same truncation DuckDB applies, so oracle
    comparisons agree. Runtime-settable conf, so this works under any
    caller-provided session.
    """
    # pin UTC + ANSI-off per session so results are caller-session-agnostic
    # (the driver's harness builds its own SparkSession)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes)["ts"] == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)
