"""Delta Lake interop queries (driver-oracled).

These gate the NATIVE Delta transaction-log implementation
(``sources/delta.py`` — the public delta-io PROTOCOL.md, no delta-spark)
end-to-end through the driver's DuckDB-oracle correctness check: a Delta
table is materialized from the round's ``orders`` parquet as two commits
(v0 = pre-1998 orders, v1 = append the rest, partitioned by
``o_orderstatus``), then each query reads a different protocol surface —
latest snapshot, version time travel, log-level partition pruning — and
the oracle recomputes the same answer from the RAW parquet, so a log
corruption, a mis-replayed remove, or a pruning bug shows up as a value
mismatch, not just a test assertion.

Fixture staleness: the table is rebuilt whenever the source dir's
(count, mtime, size) stamp changes — same guard as the text-corpus
session caches (VERDICT r10 item 6)."""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_spark.queries.tables import load_table as _t
from pydatalake_spark.queries.text import _sf_stamp
from pydatalake_spark.sources.delta import (
    is_delta_table,
    merge_delta,
    read_delta,
    write_delta,
)

QUERIES: dict = {}
ORACLE: dict = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


_CUT = "1998-01-01 00:00:00"
# bump when the fixture layout/stats format changes so stale tables rebuild
_FIXTURE_GEN = "gen3-stats-allnull"


def _orders_delta(spark: SparkSession, sf: str) -> str:
    """Materialize (once per sf dir state) the two-commit orders Delta
    table the queries below read. Deterministic path keyed on the sf dir;
    stamp-guarded rebuild when the source changes."""
    key = hashlib.sha1(os.path.abspath(sf).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), "pydatalake_delta_fixture")
    table = os.path.join(root, f"orders_{key}")
    stamp_file = table + ".stamp"
    stamp = _sf_stamp(sf)
    if stamp is not None and os.path.isfile(stamp_file) and is_delta_table(table):
        try:
            with open(stamp_file) as f:
                if json.load(f) == list(stamp) + [_FIXTURE_GEN]:
                    return table
        except (OSError, json.JSONDecodeError):
            pass
    shutil.rmtree(table, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    orders = _t(spark, sf, "orders")
    cut = F.lit(_CUT).cast("timestamp")
    write_delta(
        orders.filter(F.col("o_orderdate") < cut),
        table,
        partition_by=["o_orderstatus"],
    )
    write_delta(
        orders.filter(~(F.col("o_orderdate") < cut)), table, mode="append"
    )
    if stamp is not None:
        with open(stamp_file, "w") as f:
            json.dump(list(stamp) + [_FIXTURE_GEN], f)
    return table


@q(
    "delta_roundtrip_orders",
    """
    SELECT o_orderstatus, count(*) AS n_orders,
           sum(o_totalprice) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def delta_roundtrip_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-snapshot read: two commits replayed, hive-layout scan with
    log-verified partition dirs; must equal the raw parquet aggregate."""
    df = read_delta(spark, _orders_delta(spark, sf))
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


@q(
    "delta_time_travel_v0",
    f"""
    SELECT o_orderstatus, count(*) AS n_orders,
           sum(o_totalprice) AS total_price
    FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT}'
    GROUP BY o_orderstatus
    """,
)
def delta_time_travel_v0(spark: SparkSession, sf: str) -> DataFrame:
    """Version time travel: v0 state (pre-1998 slice) after a later
    append — exercises replay stopping at the requested version."""
    df = read_delta(spark, _orders_delta(spark, sf), version=0)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


@q(
    "delta_merge_upsert_orders",
    """
    WITH merged AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 97 = 0 AND o_orderstatus = 'P'
                    THEN o_totalprice * 2 ELSE o_totalprice END AS px
        FROM orders
        UNION ALL
        SELECT 'N' AS o_orderstatus, o_totalprice * 2 AS px
        FROM orders WHERE o_orderkey % 97 = 0 AND o_orderstatus = 'P'
    )
    SELECT o_orderstatus, count(*) AS n_orders, sum(px) AS total_price
    FROM merged GROUP BY o_orderstatus
    """,
)
def delta_merge_upsert_orders(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO (upsert) against a dedicated orders Delta table: update
    every 97th 'P'-status order to doubled price, insert the same rows as
    new 'N'-status orders (negated keys — guaranteed fresh). Only files
    whose partitions contain matched keys are rewritten (the scale
    contract pinned in ``test_merge_updates_inserts_and_touches_only_
    hit_files``). The source derives from the RAW parquet each call, so
    the merge is IDEMPOTENT: re-running replaces rows with identical
    values and the aggregate stays fixed — which is exactly what the
    oracle recomputes relationally."""
    key = hashlib.sha1(os.path.abspath(sf).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), "pydatalake_delta_fixture")
    table = os.path.join(root, f"orders_merge_{key}")
    stamp_file = table + ".stamp"
    stamp = _sf_stamp(sf)
    fresh = False
    if stamp is not None and os.path.isfile(stamp_file) and is_delta_table(table):
        try:
            with open(stamp_file) as f:
                fresh = json.load(f) == list(stamp) + [_FIXTURE_GEN]
        except (OSError, json.JSONDecodeError):
            fresh = False
    orders = _t(spark, sf, "orders")
    if not fresh:
        shutil.rmtree(table, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        write_delta(orders, table, partition_by=["o_orderstatus"])
        if stamp is not None:
            with open(stamp_file, "w") as f:
                json.dump(list(stamp) + [_FIXTURE_GEN], f)
    matched = orders.filter(
        (F.col("o_orderkey") % 97 == 0) & (F.col("o_orderstatus") == "P")
    )
    updates = matched.withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    inserts = updates.withColumn(
        "o_orderkey", -F.col("o_orderkey")
    ).withColumn("o_orderstatus", F.lit("N"))
    source = updates.unionByName(inserts)
    merge_delta(spark, table, source, on=["o_orderkey"])
    df = read_delta(spark, table)
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


@q(
    "delta_stats_skip",
    f"""
    SELECT count(*) AS n_orders, sum(o_totalprice) AS total_price,
           count(DISTINCT o_custkey) AS n_custs
    FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT}'
    """,
)
def delta_stats_skip(spark: SparkSession, sf: str) -> DataFrame:
    """Stats-based file skipping on the LATEST snapshot: the fixture's
    v1 files hold only orders at/after the cut, so a ``data_filters``
    predicate below it is refuted by every v1 file's per-file
    minValues.o_orderdate and those files never reach the scan — the
    aggregate must still equal the raw-parquet WHERE (files are pruned
    by PROOF, rows re-filtered exactly)."""
    import datetime as _dt

    df = read_delta(
        spark,
        _orders_delta(spark, sf),
        data_filters=[("o_orderdate", "<", _dt.datetime(1998, 1, 1))],
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@q(
    "delta_partition_prune",
    """
    SELECT count(*) AS n_orders, sum(o_totalprice) AS total_price
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def delta_partition_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Log-level partition pruning: the file list is filtered on the
    log's partitionValues BEFORE any parquet footer is opened (the
    100-TB point of the format); value parity vs the raw-parquet WHERE
    proves pruning dropped exactly the right files."""
    df = read_delta(
        spark,
        _orders_delta(spark, sf),
        partition_filters=[("o_orderstatus", "=", "F")],
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )
