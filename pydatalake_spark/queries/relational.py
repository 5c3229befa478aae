"""Relational operator corpus (SURVEY §2.1, §2.3-2.9) with DuckDB oracles.

Each entry: Spark-first DataFrame implementation + ANSI-SQL oracle string.
Aliases match exactly between both sides (the driver hashes values after
sorting columns by name).

Plan-quality notes (verified with ``.explain("formatted")`` in
tests/test_plans.py): filters/projections in these queries reach the parquet
scan as PushedFilters/ReadSchema; small dimensions are broadcast; aggregates
are partial (map-side) before the exchange; dedup/windows shuffle once on
their keys.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pydatalake_spark.operators.asof import asof_join
from pydatalake_spark.operators.dedup import distinct_table
from pydatalake_spark.operators.diff import tables_diff
from pydatalake_spark.queries.tables import load_table as _t
from pydatalake_spark.session import cache_once

QUERIES: dict = {}
ORACLE: dict = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# aggregation pipelines (A1-A6, S1-S3: scan → filter → group → agg)
# ---------------------------------------------------------------------------


@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                        AS sum_qty,
           sum(l_extendedprice)                                   AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
           avg(l_quantity)                                        AS avg_qty,
           avg(l_extendedprice)                                   AS avg_price,
           avg(l_discount)                                        AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: the §7.1 minimum slice. Partial aggregation happens
    map-side; the only shuffle is the 6-group exchange."""
    l = _t(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS predicate adapted to the fixture schema,
    which has no commit/receipt dates): correlated EXISTS — planned as a
    LEFT SEMI join on l_orderkey, lineitem side filtered before the join
    so only matching lineitems move."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    late = (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@q(
    "null_semantics",
    """
    SELECT e.event_id,
           coalesce(e.value, 0.0)                    AS value_filled,
           nullif(e.event_type, 'error')             AS type_or_null,
           (e.value IS NOT DISTINCT FROM e.value)    AS self_eq_nullsafe,
           (e.value IS NULL)                         AS value_missing,
           CASE WHEN e.value IS NULL THEN 'missing'
                WHEN e.value < 10 THEN 'small' ELSE 'large' END AS bucket3
    FROM events e
    """,
)
def null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    """NULL semantics: coalesce / nullif / null-safe equality (<=>) /
    three-valued CASE — the traps every engine must agree on."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        F.col("value").eqNullSafe(F.col("value")).alias("self_eq_nullsafe"),
        F.col("value").isNull().alias("value_missing"),
        F.when(F.col("value").isNull(), "missing")
        .when(F.col("value") < 10, "small")
        .otherwise("large")
        .alias("bucket3"),
    )


@q(
    "q6_revenue_delta",
    """
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape — every predicate pushes to the parquet scan."""
    l = _t(spark, sf, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@q(
    "q3_shipping_priority",
    """
    SELECT o_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    """,
)
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape. NO static broadcast hints: customer scales linearly
    with SF and the date filter keeps nearly all orders, so hinting either
    side pins a plan that OOMs the driver at cluster scale (r11 VERDICT
    item 2 — the same anti-pattern removed from q18 in r10). AQE observes
    the post-filter sizes at runtime and picks broadcast exactly when the
    side actually fits."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(
            o.join(c, o.o_custkey == c.c_custkey),
            l.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        # exact decimal accumulation (double at the edge): without a
        # static join hint the partial-agg order is AQE's choice, and a
        # double sum is order-sensitive at the 9th digit — decimal is
        # order-independent, so the result is plan-invariant
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@q(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Only the FIXED-cardinality dims carry
    broadcast hints (nation=25, region=5 rows at every SF); supplier is
    10k rows × SF — linear — so its hint was dropped (r11 VERDICT item 3)
    and AQE picks the build side from observed sizes."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        # decimal accumulation: plan-invariant result under AQE-chosen
        # join/agg order (see q3)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@q(
    "agg_min_max",
    """
    SELECT min(ts) AS ts_min, max(ts) AS ts_max,
           min(value) AS value_min, max(value) AS value_max
    FROM events
    """,
)
def agg_min_max(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar min/max (A3, ≙ writer.py:196-200 delta-window bounds)."""
    e = _t(spark, sf, "events")
    return e.agg(
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


@q(
    "distinct_counts",
    """
    SELECT count(*) AS n_rows,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    """,
)
def distinct_counts(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("l_partkey")).alias("n_parts"),
        F.count_distinct(F.col("l_suppkey")).alias("n_supps"),
    )


@q(
    "uniqueness_probe",
    "SELECT count(*) AS n_rows, count(DISTINCT event_id) AS n_ids FROM events",
)
def uniqueness_probe(spark: SparkSession, sf: str) -> DataFrame:
    """A6 uniqueness test as a one-pass aggregate (utils/table.py:248)."""
    e = _t(spark, sf, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("event_id")).alias("n_ids"),
    )


@q(
    "partition_values",
    """
    SELECT DISTINCT o_orderstatus AS status,
           CAST(year(o_orderdate) AS INT) AS yr
    FROM orders
    """,
)
def partition_values_enum(spark: SparkSession, sf: str) -> DataFrame:
    """W3/A4/P7 partition-value enumeration (reference ``writer.py:149-162``
    ``_get_partition_filters``): hive-partition orders by (status, yr) via the
    engine's own writer, then enumerate the partition tuples from the on-disk
    layout. The enumeration scan is metadata-only (partition columns come
    from directory names; ReadSchema is empty)."""
    import hashlib
    import tempfile

    from pydatalake_spark.dataset.writer import write_dataset
    from pydatalake_spark.sources.read import partition_values

    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.year("o_orderdate").alias("yr"),
    )
    # deterministic per-sf scratch path so repeat runs overwrite in place
    tag = hashlib.sha1(sf.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"pydatalake_spark_pv_{tag}")
    write_dataset(o, path, mode="overwrite", partition_by=["status", "yr"])
    return partition_values(spark, path, ["status", "yr"]).select(
        F.col("status"), F.col("yr").cast("int").alias("yr")
    )


# ---------------------------------------------------------------------------
# projections / filters / predicates (P1-P7)
# ---------------------------------------------------------------------------


@q(
    "filter_project",
    """
    SELECT l_orderkey, l_partkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00' AND l_quantity > 45
    """,
)
def filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """P3+P5: projection prunes the scan to 4 columns, filter pushes down."""
    l = _t(spark, sf, "lineitem")
    return l.filter(
        (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_partkey", "l_extendedprice")


@q(
    "sql_predicate_filter",
    "SELECT * FROM events WHERE value > 100 AND event_type = 'click'",
)
def sql_predicate_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P5: free-form SQL predicate string passed verbatim
    (≙ rel.filter(str), writer.py:227-232)."""
    return _t(spark, sf, "events").filter("value > 100 AND event_type = 'click'")


@q(
    "time_range_filter",
    """
    SELECT * FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def time_range_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P6 time-range predicate (≙ writer.py:373-375)."""
    e = _t(spark, sf, "events")
    return e.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    )


@q(
    "drop_columns",
    "SELECT event_id, ts, user_id, event_type FROM events",
)
def drop_columns(spark: SparkSession, sf: str) -> DataFrame:
    """P1/P2 drop ≙ SELECT * exclude(...) (utils/table.py:291-333)."""
    return _t(spark, sf, "events").drop("value", "props")


@q(
    "cast_projection",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS orderkey_str,
           CAST(o_orderstatus AS VARCHAR) AS status_str,
           CAST(o_custkey AS INTEGER) AS custkey_int
    FROM orders
    """,
)
def cast_projection(spark: SparkSession, sf: str) -> DataFrame:
    """P4/F1 cast projection (utils/table.py:160-181)."""
    o = _t(spark, sf, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("orderkey_str"),
        F.col("o_orderstatus").cast("string").alias("status_str"),
        F.col("o_custkey").cast("int").alias("custkey_int"),
    )


# ---------------------------------------------------------------------------
# dedup / distinct (A1-A2) and diffs / set ops (J1-J2, E1-E2)
# ---------------------------------------------------------------------------


@q("distinct_full", "SELECT DISTINCT user_id, event_type FROM events")
def distinct_full(spark: SparkSession, sf: str) -> DataFrame:
    """A1 full-row DISTINCT (on a projection)."""
    return distinct_table(_t(spark, sf, "events").select("user_id", "event_type"))


@q(
    "dedup_keep_first",
    """
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf: str) -> DataFrame:
    """A2 keyed dedup keep-first with presort (utils/table.py:230-288),
    deterministic via row_number (SURVEY §7.3.2)."""
    return distinct_table(
        _t(spark, sf, "events"),
        subset=["user_id", "event_type"],
        keep="first",
        presort_by=["ts", "event_id"],
    )


@q(
    "dedup_keep_last",
    """
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def dedup_keep_last(spark: SparkSession, sf: str) -> DataFrame:
    return distinct_table(
        _t(spark, sf, "events"),
        subset=["user_id", "event_type"],
        keep="last",
        presort_by=["ts", "event_id"],
    )


@q(
    "tables_diff_full",
    """
    SELECT * FROM events WHERE user_id < 8
    EXCEPT
    SELECT * FROM events WHERE value > 100
    """,
)
def tables_diff_full(spark: SparkSession, sf: str) -> DataFrame:
    """J1 full-row anti-diff with EXCEPT *set* semantics
    (utils/table.py:135-210; SURVEY §7.3.1)."""
    e = _t(spark, sf, "events")
    return tables_diff(e.filter(F.col("user_id") < 8), e.filter(F.col("value") > 100))


@q(
    "tables_diff_subset",
    """
    SELECT o.* FROM orders o
    ANTI JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def tables_diff_subset(spark: SparkSession, sf: str) -> DataFrame:
    """J1 subset mode: full t1 rows whose key tuple is absent from t2 —
    one left_anti join instead of the reference's driver-side key list."""
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    return tables_diff(o, l, subset="o_orderkey")


@q(
    "tables_diff_cast",
    """
    SELECT o.* FROM orders o
    ANTI JOIN (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders
               WHERE o_orderstatus = 'O') t
    ON CAST(o.o_orderkey AS VARCHAR) = t.k
    """,
)
def tables_diff_cast(spark: SparkSession, sf: str) -> DataFrame:
    """J1 cast_as_str mode — type-insensitive key compare
    (utils/table.py:160-181)."""
    o = _t(spark, sf, "orders")
    return tables_diff(
        o, o.filter(F.col("o_orderstatus") == "O"), subset="o_orderkey",
        cast_as_str=True,
    )


@q(
    "delta_append_diff",
    """
    WITH incoming AS (
        SELECT * FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    ), existing AS (
        SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    )
    SELECT * FROM incoming EXCEPT SELECT * FROM existing
    """,
)
def delta_append_diff(spark: SparkSession, sf: str) -> DataFrame:
    """J2/W5: the rows a delta-mode write would append — anti-diff of the
    incoming batch vs existing data (writer.py:219-249). The engine's
    writer prunes the existing side to the batch's [min,max] window first;
    result-identical, scan-cheaper."""
    e = _t(spark, sf, "events")
    incoming = e.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    )
    existing = e.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    return tables_diff(incoming, existing)


_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _profile_oracle() -> str:
    aggs, rows = [], []
    for c, num in _PROFILE_COLS:
        aggs.append(f"count(*) - count({c}) AS nn_{c}")
        aggs.append(f"count(DISTINCT {c}) AS nd_{c}")
        if num:
            aggs.append(f"CAST(min({c}) AS DOUBLE) AS mn_{c}")
            aggs.append(f"CAST(max({c}) AS DOUBLE) AS mx_{c}")
        mn = f"mn_{c}" if num else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{c}" if num else "CAST(NULL AS DOUBLE)"
        rows.append(
            f"SELECT '{c}' AS col_name, nn_{c} AS n_nulls, nd_{c} AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num FROM w"
        )
    return (
        "WITH w AS (SELECT " + ", ".join(aggs) + " FROM orders) "
        + " UNION ALL ".join(rows)
    )


@q("table_profile", _profile_oracle())
def table_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact data-quality profile of `orders` in ONE aggregation pass
    (null count, exact distinct count, numeric min/max per column),
    reshaped to long form with `stack` — the wide row is computed once and
    never re-scanned, vs the naive per-column UNION of scans. The exact
    counterpart of `approx_profile`; at 100 TB you run the sketch version,
    on a pre-aggregation slice you can afford this one."""
    o = _t(spark, sf, "orders")
    aggs = []
    for c, num in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if num:
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
    wide = o.agg(*aggs)
    parts = []
    for c, num in _PROFILE_COLS:
        mn = f"mn_{c}" if num else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{c}" if num else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"'{c}', nn_{c}, nd_{c}, double({mn.replace('CAST(NULL AS DOUBLE)', 'NULL')}), "
            f"double({mx.replace('CAST(NULL AS DOUBLE)', 'NULL')})"
        )
    n = len(_PROFILE_COLS)
    return wide.selectExpr(
        f"stack({n}, " + ", ".join(parts)
        + ") as (col_name, n_nulls, n_distinct, min_num, max_num)"
    )


@q(
    "merge_upsert_orders",
    """
    WITH src AS (
        SELECT * REPLACE (o_totalprice * 1.1 AS o_totalprice)
        FROM orders WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT * REPLACE (o_orderkey + 1000000000000 AS o_orderkey)
        FROM orders WHERE o_orderkey % 101 = 0
    ), merged AS (
        SELECT * FROM orders t
        WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT * FROM src
    )
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM merged
    """,
)
def merge_upsert_orders(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE/upsert (operators/insert.py:merge_upsert): a corrections
    batch (repriced rows sharing keys + genuinely new keys) replaces
    matched orders and appends the rest — one anti-join on the merge key
    plus a union, the scalable MERGE shape. The source here is derived
    deterministically from orders itself so the oracle sees identical
    inputs."""
    from pydatalake_spark.operators.insert import merge_upsert

    o = _t(spark, sf, "orders")
    upd = o.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    new = o.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000_000)
    )
    merged = merge_upsert(o, upd.unionByName(new), "o_orderkey")
    return merged.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )


@q(
    "semi_join",
    """
    SELECT * FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
    """,
)
def semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """E2 membership semi-join (≙ pl.struct(...).is_in, table.py:183-185)."""
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").filter(F.col("l_quantity") > 49)
    return o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")


@q(
    "intersect_keys",
    """
    SELECT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT c_custkey AS custkey FROM customer
    """,
)
def intersect_keys(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.intersect(c)


@q(
    "except_keys",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def except_keys(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)


@q(
    "union_by_name",
    """
    SELECT event_id, user_id, value FROM events
    UNION ALL BY NAME
    SELECT event_id, event_type FROM events
    """,
)
def union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    """Implicit union-by-name over heterogeneous fragments (SURVEY §1.4/§2.8
    — mixed-schema dataset scan ≙ unionByName(allowMissingColumns))."""
    e = _t(spark, sf, "events")
    a = e.select("event_id", "user_id", "value")
    b = e.select("event_id", "event_type")
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# sorts / limits (O1-O5)
# ---------------------------------------------------------------------------


@q(
    "sort_multi",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    """,
)
def sort_multi(spark: SparkSession, sf: str) -> DataFrame:
    """O1 multi-column directional sort (utils/table.py:95-132)."""
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    return o.orderBy(
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


@q(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k with deterministic tiebreak — Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge, no global sort)."""
    return (
        _t(spark, sf, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# window functions (SURVEY §2.6 — latent in the reference, native here)
# ---------------------------------------------------------------------------


@q(
    "window_running_sum",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum("o_totalprice").over(w).alias("running_total"),
    )


@q(
    "window_rank",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
           lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS prev_price
    FROM orders
    """,
)
def window_rank(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.row_number().over(w).alias("rn"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


# ---------------------------------------------------------------------------
# grouping sets / pivot
# ---------------------------------------------------------------------------


@q(
    "grouping_sets_agg",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary grouping sets via the SQL surface (U2 passthrough — the
    reference exposes this only through raw SQL; Spark SQL plans it as one
    Expand + partial aggregation, no per-set rescans)."""
    _t(spark, sf, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@q(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@q(
    "cube_agg",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_extendedprice) AS sum_price, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_extendedprice").alias("sum_price"), F.count(F.lit(1)).alias("n")
    )


@q(
    "pivot_linestatus",
    """
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark: SparkSession, sf: str) -> DataFrame:
    l = _t(spark, sf, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


# ---------------------------------------------------------------------------
# scalar functions / intervals / series (F1-F8)
# ---------------------------------------------------------------------------


@q(
    "scalar_functions",
    """
    SELECT o_orderkey,
           upper(o_orderpriority)                    AS prio_upper,
           substr(o_orderpriority, 1, 1)             AS prio_code,
           length(o_orderpriority)                   AS prio_len,
           concat(o_orderstatus, '-', o_orderpriority) AS combo,
           year(o_orderdate)                         AS yr,
           month(o_orderdate)                        AS mon,
           CAST(floor(o_totalprice) AS BIGINT)       AS price_floor,
           CAST(ceil(o_totalprice) AS BIGINT)        AS price_ceil,
           abs(o_totalprice - 1000.0)                AS dev,
           o_orderkey % 7                            AS m7,
           sqrt(o_totalprice)                        AS price_sqrt,
           CASE WHEN o_totalprice > 5000 THEN 'big' ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2
    FROM orders
    """,
)
def scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """String/date/math scalar coverage (SURVEY §2.9 — free in Spark SQL,
    proven equivalent to the oracle here)."""
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("combo"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.floor("o_totalprice").alias("price_floor"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("dev"),
        (F.col("o_orderkey") % 7).alias("m7"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.when(F.col("o_totalprice") > 5000, "big").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status2"),
    )


@q(
    "interval_arith",
    """
    SELECT event_id, ts,
           ts + INTERVAL 3 DAY   AS ts_plus_3d,
           ts - INTERVAL 1 HOUR  AS ts_minus_1h,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start
    FROM events
    """,
)
def interval_arith(spark: SparkSession, sf: str) -> DataFrame:
    """F4/F5 interval constructors + timestamp arithmetic
    (writer.py:312-334)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        "ts",
        (F.col("ts") + F.expr("INTERVAL 3 DAY")).alias("ts_plus_3d"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("ts_minus_1h"),
        F.date_trunc("day", "ts").alias("day_start"),
    )


@q(
    "time_bucket",
    """
    SELECT date_trunc('hour', ts) AS bucket,
           event_type,
           count(*)   AS n_events,
           sum(value) AS total_value,
           avg(value) AS avg_value
    FROM events GROUP BY bucket, event_type
    """,
)
def time_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling-window aggregation in batch form (the Structured Streaming
    twin lives in streaming/ingest.py and is tested in tests/)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.avg("value").alias("avg_value"),
        )
    )


@q(
    "date_series",
    """
    SELECT unnest(generate_series(
        date_trunc('day', (SELECT min(ts) FROM events)),
        date_trunc('day', (SELECT max(ts) FROM events)),
        INTERVAL 1 DAY)) AS day_start
    """,
)
def date_series(spark: SparkSession, sf: str) -> DataFrame:
    """F3 generate_series (writer.py:342-350) ≙ sequence() + explode —
    the boundary generator behind time-interval batched writes (W7)."""
    e = _t(spark, sf, "events")
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    return bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day_start")
    )


@q(
    "json_extract",
    """
    SELECT event_id,
           json_extract_string(props, '$.k')           AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON scalar extraction from the events payload column (SURVEY §2.9 —
    scalar coverage is free in Spark SQL, proven equivalent here)."""
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id", k.alias("k_str"), k.cast("long").alias("k_num")
    )


@q(
    "array_functions",
    """
    WITH t AS (
        SELECT user_id, list(event_type ORDER BY event_id) AS types
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           len(types)                         AS n_events,
           len(list_distinct(types))          AS n_distinct_types,
           array_to_string(list_sort(list_distinct(types)), ',') AS type_csv,
           list_contains(types, 'purchase')   AS has_purchase
    FROM t
    """,
)
def array_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Array aggregation + manipulation: collect_list with deterministic
    intra-group order (sort_array of (event_id, type) structs — Spark's
    collect_list order is otherwise shuffle-dependent)."""
    e = _t(spark, sf, "events")
    types = F.transform(
        F.array_sort(F.collect_list(F.struct("event_id", "event_type"))),
        lambda s: s["event_type"],
    )
    return (
        e.groupBy("user_id")
        .agg(types.alias("types"))
        .select(
            "user_id",
            F.size("types").cast("long").alias("n_events"),
            F.size(F.array_distinct("types")).cast("long").alias("n_distinct_types"),
            F.array_join(F.array_sort(F.array_distinct("types")), ",").alias("type_csv"),
            F.array_contains("types", "purchase").alias("has_purchase"),
        )
    )


@q(
    "conditional_agg",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_clicks,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           sum(value) FILTER (WHERE event_type = 'purchase') AS purchase_value,
           max(ts) FILTER (WHERE event_type = 'error')     AS last_error_ts
    FROM events GROUP BY user_id
    """,
)
def conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    """FILTER'd aggregates (the funnel-metrics shape)."""
    e = _t(spark, sf, "events")
    is_click = F.col("event_type") == "click"
    is_purchase = F.col("event_type") == "purchase"
    is_error = F.col("event_type") == "error"
    return e.groupBy("user_id").agg(
        F.count(F.when(is_click, 1)).alias("n_clicks"),
        F.count(F.when(is_purchase, 1)).alias("n_purchases"),
        F.sum(F.when(is_purchase, F.col("value"))).alias("purchase_value"),
        F.max(F.when(is_error, F.col("ts"))).alias("last_error_ts"),
    )


@q(
    "window_time_range_avg",
    """
    SELECT event_id, user_id, ts, value,
           avg(value) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                                      AND CURRENT ROW) AS avg_10m
    FROM events
    """,
)
def window_time_range_avg(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-frame window: per-user trailing 10-minute moving average —
    the time-based frame spec (rows frames can't express it when event
    spacing is irregular). One shuffle on user_id."""
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))  # microsecond precision: a plain
        # cast-to-long truncates to seconds and shifts the frame boundary
        .rangeBetween(-600 * 1_000_000, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", "ts", "value", F.avg("value").over(w).alias("avg_10m")
    )


@q(
    "sessionize",
    """
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM g
    """,
)
def sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: lag-gap + running sum (the classic two-window
    composition; ~2 shuffles on user_id, reused exchange)."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: a plain cast-to-long floors to whole seconds,
    # which misclassifies gaps that cross the 30-minute boundary by less
    # than a second (events.ts carries sub-second precision)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(gap <= 30 * 60 * 1_000_000, 0).otherwise(1)
    return (
        e.select("event_id", "user_id", "ts", new_sess.alias("new_sess"))
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .drop("new_sess")
    )


@q(
    "session_stats",
    """
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        <= 1800000000
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
    ), s AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
        FROM g
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           CAST((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
                AS DOUBLE) AS duration_sec
    FROM s GROUP BY user_id, session_id
    """,
)
def session_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-session rollup on top of the sessionize windows (30-min gap):
    events per session and wall duration. The two windows and the final
    aggregation ALL key on user_id — one hash partitioning serves the
    whole plan (exchange reuse), the classic sessionize-then-aggregate
    shape."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(gap <= 30 * 60 * 1_000_000, 0).otherwise(1)
    s = e.select("user_id", "ts", new_sess.alias("new_sess"), "event_id").withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000.0
        ).alias("duration_sec"),
    )


@q(
    "zscore_outliers",
    """
    WITH s AS (
        SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        FROM events GROUP BY 1
    )
    SELECT event_id, e.event_type, value,
           (value - mu) / sd AS zscore
    FROM events e JOIN s USING (event_type)
    WHERE abs((value - mu) / sd) > 3
    """,
)
def zscore_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group z-score outliers (|z| > 3) on the events value stream:
    one grouped pass for the per-type moments (tiny — one row per type,
    broadcast back), then a narrow scoring filter. The standard cheap
    anomaly screen before heavier models."""
    e = _t(spark, sf, "events")
    s = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        e.join(F.broadcast(s), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", "value", z.alias("zscore"))
    )


@q(
    "cohort_retention",
    """
    WITH s AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ), a AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS activity_week
        FROM events
    )
    SELECT s.cohort_week,
           CAST(floor(date_diff('day', s.cohort_week, a.activity_week) / 7.0)
                AS BIGINT) AS weeks_since,
           count(DISTINCT s.user_id) AS n_users
    FROM a JOIN s ON a.user_id = s.user_id
    WHERE a.activity_week >= s.cohort_week
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by signup week, counted as
    retained in each subsequent activity week. Every shuffle (signup agg,
    activity distinct, cohort join) keys on user_id before the final tiny
    (cohort, week) aggregation — the matrix itself is weeks², never
    user-sized."""
    e = _t(spark, sf, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    a = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    return (
        a.join(s, "user_id")
        .filter(F.col("activity_week") >= F.col("cohort_week"))
        .withColumn(
            "weeks_since",
            F.floor(
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7.0
            ).cast("long"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@q(
    "funnel_view_click_purchase",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT v.user_id, t1, t2, t3,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS depth
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per user, the first view,
    the first click strictly after it, the first purchase strictly after
    that, and the depth reached. Three grouped passes + two left joins —
    every shuffle keys on user_id, so AQE/exchange-reuse co-locates the
    whole chain after the first hash partitioning; no window over the full
    event stream, no self-join fan-out on hot users (min-aggregates
    compress each stage to one row per user before the next join)."""
    e = _t(spark, sf, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    depth = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .otherwise(1)
        .cast("long")
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t1", "t2", "t3", depth.alias("depth"))
    )


# ---------------------------------------------------------------------------
# beyond-reference time-series joins
# ---------------------------------------------------------------------------


@q(
    "asof_join_events",
    """
    SELECT c.event_id, c.user_id, c.ts,
           p.ts       AS ts_right,
           p.event_id AS event_id_right,
           p.value    AS value_right
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent purchase
    at-or-before it. One shuffle, no UDF (operators/asof.py)."""
    e = _t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        clicks, purchases, on="ts", by="user_id",
        right_cols=["event_id", "value"],
    )


@q(
    "range_join_events",
    """
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           a.user_id, a.ts AS a_ts, b.ts AS b_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
)
def range_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """Range join: successor events within 5 minutes per user.

    Time-bucketed plan: both sides carry ``floor(ts / 5min)`` and the
    equi-join key is ``(user_id, bucket)`` — the probe side explodes into
    buckets ``b`` and ``b+1`` so every in-range pair lands in exactly one
    bucket match (b's single bucket ∈ {floor(a_ts), floor(a_ts)+1}).

    Why not join on user_id alone with the range as a post-join filter: a
    hot user with n events materializes n² join rows before the filter, and
    AQE skew-splitting only spreads that n² across reducers — it can't
    shrink it. Bucketing bounds fan-out per (user, bucket) pair to the
    events inside one 5-minute window, which is data-density-, not
    user-cardinality-, bounded. Cost: the probe side is duplicated 2×
    (ids + timestamp only), negligible against the avoided quadratic.
    """
    e = _t(spark, sf, "events")
    bucket_us = 5 * 60 * 1_000_000  # 5 min in microseconds
    bk = lambda c: F.floor(F.unix_micros(c) / bucket_us)  # noqa: E731
    a = e.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id"),
        F.col("ts").alias("a_ts"),
    ).withColumn(
        "bk", F.explode(F.array(bk(F.col("a_ts")), bk(F.col("a_ts")) + 1))
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        bk(F.col("ts")).alias("b_bk"),
    )
    return (
        a.join(b, (a.user_id == b.b_user) & (a.bk == b.b_bk))
        .filter(
            (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 5 MINUTE"))
        )
        .select("a_id", "b_id", "user_id", "a_ts", "b_ts")
    )

# ---------------------------------------------------------------------------
# extended TPC-H-shape corpus: correlated subqueries, outer-join
# distributions, disjunctive predicates, scalar-subquery anti-joins —
# the SQL-passthrough shapes (SURVEY §2.4, §2.9 U2) a reference user
# reaches via raw DuckDB SQL, re-expressed as Catalyst-friendly plans.
# ---------------------------------------------------------------------------


@q(
    "q2_min_price_part",
    """
    SELECT p.p_partkey, p.p_name, p.p_type, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                             WHERE p2.p_type = p.p_type)
    """,
)
def q2_min_price_part(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-min subquery. Decorrelated by hand
    into a grouped min (map-side partial agg → 6-row result) broadcast back
    onto the scan — at 100 TB the per-group mins stay tiny no matter how
    large `part` grows, so the join side never shuffles."""
    p = _t(spark, sf, "part")
    mins = p.groupBy(F.col("p_type").alias("mt")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (F.col("p_type") == F.col("mt"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
    )


@q(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution. Left outer join
    preserves order-less customers (count(o_orderkey) skips NULLs); first
    groupBy shuffles on c_custkey, the second is a near-free re-agg over
    small-cardinality counts."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@q(
    "q14_promo_revenue",
    """
    SELECT 100.00 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0.0 END)
           / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-ratio aggregate over a fact↔dim join.
    part is broadcast (only p_partkey/p_type survive pruning); the date
    filter pushes to the lineitem scan; one partial-agg shuffle."""
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc)
            ).alias("promo_revenue")
        )
    )


@q(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: CTE + scalar-max equality. The revenue aggregate is
    computed once and reused for both the join and the max (Spark reuses the
    shuffle output of `rev` across both consumers); the 1-row max cross-joins
    in as a broadcast."""
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@q(
    "q17_small_quantity_revenue",
    """
    SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average. Decorrelated: restrict
    lineitem to the brand's parts first (broadcast semi-reduction), THEN
    compute each part's avg over that already-reduced slice — equivalent
    because the correlation key is the join key, and at scale it means the
    avg shuffle sees only the brand's ~1/25th of the fact table."""
    p = _t(spark, sf, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    l = _t(spark, sf, "lineitem")
    lb = l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgs = lb.groupBy(F.col("l_partkey").alias("k")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        lb.join(F.broadcast(avgs), lb.l_partkey == F.col("k"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg((F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@q(
    "q18_large_volume_customer",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING → join against the
    grouped-filtered orderkeys.

    r10 rewrite: the final grouping keys include ``o_orderkey``, so the
    post-semi-join re-aggregation of lineitem detail is algebraically the
    per-order total the HAVING side already computed — an aggregate
    pushdown Catalyst doesn't perform. ONE groupBy(l_orderkey) produces
    both the >300 filter and ``total_qty``; its (rare) survivors join
    orders — AQE sees the filtered size at runtime and converts to a
    broadcast join at gate SF, or keeps a keyed shuffle when the
    survivor set outgrows the broadcast ceiling at large SF. NO static
    broadcast hint anywhere (r11, closing r10 ADVICE): both customer and
    the survivor set scale with SF, so pinning either side would be a
    100-TB lie — at runtime AQE broadcasts the survivor-joined orders
    side (tiny at every SF: ~1 row per 25k orders passes >300), which is
    also the correct side at 100 TB where customer alone exceeds the
    broadcast ceiling. No second lineitem scan, semi-join, or final
    exchange exists."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


@q(
    "q19_disjunctive_revenue",
    """
    SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size <= 35 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions spanning both join sides.
    Catalyst extracts the common single-side implications (l_quantity
    BETWEEN 1 AND 30, p_brand IN (...)) and pushes them below the join;
    the full disjunction runs post-join. part broadcasts."""
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    q_ = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15) & q_.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 25) & q_.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 35) & q_.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@q(
    "q22_dormant_customers",
    """
    SELECT c_nationkey, count(*) AS numcust, sum(c_acctbal) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey standing in for phone country codes;
    "dormant" = no orders since 2000 — every fixture customer has SOME
    order, so the date predicate keeps the anti-join non-degenerate):
    global scalar-avg subquery (1-row broadcast cross join, no driver
    collect) + NOT EXISTS (left-anti against the filtered orders key
    projection — only o_custkey moves through the anti-join shuffle)."""
    c = _t(spark, sf, "customer")
    o_keys = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    cutoff = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cutoff")
    )
    return (
        c.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), F.sum("c_acctbal").alias("totacctbal"))
    )


@q(
    "window_lag_lead",
    """
    SELECT event_id, user_id, ts,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta,
           ntile(4) OVER (PARTITION BY user_id ORDER BY value NULLS FIRST, event_id)
             AS value_quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    """Analytic offsets (lag/lead/delta) + ntile — per-user event sequences.
    One shuffle on user_id serves all four window expressions (same
    partitioning, two sort orders collapse into one exchange). The ORDER BY
    includes event_id so ties on ts/value are deterministic across engines."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_first(), F.col("event_id")
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.ntile(4).over(wv).alias("value_quartile"),
    )


@q(
    "exact_percentiles",
    """
    SELECT l_returnflag,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)      AS median_qty,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90_price,
           percentile_cont(0.99) WITHIN GROUP (ORDER BY l_discount)     AS p99_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def exact_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (`percentile_cont`
    semantics in both engines). The exact form sorts within each group —
    fine per-key; at 100 TB the streaming-sketch variant (`approx_profile`,
    functions/sketch.py) is the scale path and this is its accuracy
    reference."""
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5D)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.9D)").alias("p90_price"),
        F.expr("percentile(l_discount, 0.99D)").alias("p99_disc"),
    )


@q(
    "string_agg_per_group",
    """
    SELECT r_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey
    """,
)
def string_agg_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation: collect_list is unordered by contract in
    a distributed engine, so the deterministic form is sort_array then
    array_join — same result as DuckDB's ORDER BY'd string_agg regardless
    of task scheduling."""
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@q(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_21')
            OR (n1.n_name = 'NATION_21' AND n2.n_name = 'NATION_8'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dimension joins TWICE under different
    roles (supplier side / customer side) with a disjunction spanning both
    aliases. Both nation scans broadcast with their IN-list pushed down
    (each side can only be one of the two nations); the disjunction runs
    once both roles are bound. year() bucketing happens pre-aggregation so
    the group-by key is tiny."""
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    nations = ["NATION_8", "NATION_21"]
    n1 = (
        _t(spark, sf, "nation")
        .filter(F.col("n_name").isin(nations))
        .select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf, "nation")
        .filter(F.col("n_name").isin(nations))
        .select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_21"))
            | ((F.col("supp_nation") == "NATION_21") & (F.col("cust_nation") == "NATION_8"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").alias("revenue"))
    )


@q(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_7' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one part
    type, by order year. Seven-table join where every dimension (part,
    customer-nation, region, supplier-nation) broadcasts; lineitem-orders is
    the only shuffle pair. The share is a conditional-sum / sum over the
    same grouped pass — one aggregation, no second scan."""
    l = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    p = _t(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    n1 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    # decimal accumulation (exact + associative) so partial-sum order can't
    # wobble the last ulp; the share divides as double only after both sums
    # are exact — see q9
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


@q(
    "q9_product_type_revenue",
    """
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: testdata has no partsupp/supplycost, so
    profit = discounted revenue). The p_name LIKE filter prunes `part`
    before its broadcast; supplier+nation broadcast; the lineitem-orders
    join is the one shuffle. Group key (nation, year) is tiny."""
    l = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            # DECIMAL summand on both sides: decimal addition is exact and
            # associative, so Spark's partial-sum order and DuckDB's serial
            # sum agree to the last digit (doubles differ in the last ulp).
            # The OUTPUT column is cast to DOUBLE on both sides: pandas-based
            # canonicalizers see Spark Decimal as object dtype but DuckDB
            # DECIMAL as float64, so a decimal-typed result column hashes
            # unequal even when the values match (VERDICT r3 #1).
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@q(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM (
        SELECT c_custkey, c_name, c_acctbal, n_name,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                   AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
    ) g
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. The returnflag + date filters push to the scans; nation
    broadcasts; the grouped top-k plans as TakeOrderedAndProject (no global
    sort). c_custkey tiebreak keeps the limit deterministic."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        # decimal agg + ordering stay internal/exact; only the OUTPUT column
        # normalizes to DOUBLE (pandas canon: Decimal-object vs float64)
        .select(
            "c_custkey",
            "c_name",
            F.col("revenue").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@q(
    "q11_supplier_concentration",
    """
    SELECT s_suppkey, CAST(value AS DOUBLE) AS value
    FROM (
        SELECT s_suppkey,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                   AS value
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        GROUP BY s_suppkey
    ) per_supp
    WHERE value > (
        SELECT sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               * CAST(0.005 AS DECIMAL(4,3))
        FROM lineitem
    )
    """,
)
def q11_supplier_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp table — concentration over
    lineitem revenue): suppliers holding more than a fixed fraction of
    total revenue. The scalar total is a 1-row aggregate cross-joined
    (broadcast) onto the per-supplier rollup — the lineitem scan is shared
    work Catalyst can reuse, and no second shuffle is keyed."""
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    # decimal accumulation keeps both the reported value and the threshold
    # comparison exact across engines (see q9)
    rev = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("rev")
    )
    per_supp = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select(F.col("s_suppkey"), rev)
        .groupBy("s_suppkey")
        .agg(F.sum("rev").alias("value"))
    )
    total = l.select(rev).agg(
        (F.sum("rev") * F.lit("0.005").cast("decimal(4,3)")).alias("cutoff")
    )
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        # threshold compare is exact-decimal; output normalizes to DOUBLE
        # for the pandas canon (Decimal-object vs float64, VERDICT r3 #1)
        .select("s_suppkey", F.col("value").cast("double").alias("value"))
    )


@q(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode column — grouped by
    l_linestatus): urgent/non-urgent order counts per line status for one
    ship year. Conditional-sum pivot in a single grouped pass; the date
    range is the pushed scan filter."""
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            # explicit BIGINT on both sides: DuckDB's bare sum() yields
            # HUGEINT which pandas fetches as float64 (VERDICT r3 #1)
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


@q(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 28, 32)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier relationships come from lineitem,
    not partsupp): distinct suppliers per (brand, type, size) outside an
    excluded brand/type. All three predicates prune `part` before its
    broadcast; count_distinct expands to a two-phase aggregate."""
    p = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 32))
    )
    l = _t(spark, sf, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@q(
    "q20_excess_stock_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'old%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
    )
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: shipped volume from lineitem instead of
    partsupp availability): suppliers who shipped more than a threshold of
    'old%' parts in a year. The HAVING subquery reduces to grouped keys
    only (suppkey + the sum), then a left-semi broadcast back onto
    supplier — keys move, rows don't."""
    s = _t(spark, sf, "supplier")
    p = _t(spark, sf, "part").filter(F.col("p_name").like("old%"))
    l = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return s.join(
        F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@q(
    "q21_sole_returned_supplier",
    """
    SELECT s_suppkey, count(*) AS numwait
    FROM (
        SELECT l_suppkey, l_orderkey
        FROM lineitem
        GROUP BY l_suppkey, l_orderkey
        HAVING sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
    ) ret
    JOIN (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING count(DISTINCT l_suppkey) > 1
           AND count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) = 1
    ) solo ON ret.l_orderkey = solo.l_orderkey
    JOIN supplier ON ret.l_suppkey = s_suppkey
    GROUP BY s_suppkey
    """,
)
def q21_sole_returned_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no receipt/commit dates — 'late' becomes
    'returned'): for multi-supplier orders where exactly ONE supplier had
    returns, count such orders per offending supplier. The correlated
    EXISTS/NOT-EXISTS pair decorrelates into two grouped passes over
    lineitem; the per-order verdict (solo) reduces to orderkeys only before
    rejoining, so the verdict side broadcasts at any scale where orders with
    2+ suppliers-and-returns are rare relative to lineitem."""
    l = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    is_ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    # one reduction to per-(order, supplier) grain; BOTH downstream branches
    # consume this same subtree, so Catalyst's ReuseExchange rule scans and
    # shuffles lineitem once — the second grouping runs over the already
    # order-of-magnitude-smaller reduced grain. The explicit null filter
    # makes the two branches' pushed scan filters identical (the joins imply
    # different isnotnull sets otherwise, which defeats exchange reuse);
    # null keys can't reach the result anyway (inner + semi join).
    # r12: ONE lineitem exchange for BOTH groupings (guide §2.4 "two
    # operations keyed the same way can share one exchange"): hash-
    # partitioning by l_orderkey alone satisfies the clustering
    # requirement of groupBy(l_orderkey, l_suppkey) AND of the
    # per-order verdict groupBy(l_orderkey), so the (order, supplier)
    # reduction and the order-grain verdict both run shuffle-free on top
    # of it. The old shape exchanged lineitem twice: once at (orderkey,
    # suppkey) grain — which on TPC-H-shaped data is barely smaller than
    # the raw rows, so its map-side partial agg saved almost nothing —
    # and again at orderkey grain. At cluster scale that is 2 full-data
    # shuffles → 1.
    per_os = (
        l.filter(F.col("l_orderkey").isNotNull() & F.col("l_suppkey").isNotNull())
        .select("l_orderkey", "l_suppkey", is_ret.alias("__is_ret"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("__is_ret").alias("n_ret"))
    )
    # r10: single-pass verdict — the solo-returned supplier IS a per-order
    # aggregate (max over the returned suppliers, of which exactly one
    # exists on kept orders), so the old ret x solo self-join of the
    # reduced grain collapses into ONE groupBy(l_orderkey): lineitem is
    # scanned and shuffled once (the initial plan used to carry the
    # per-(order,supplier) exchange TWICE — ReuseExchange only recovered
    # it at AQE runtime), and the order-verdict side never rejoins data.
    per_o = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.when(F.col("n_ret") > 0, 1).otherwise(0)).alias("n_ret_supp"),
            F.max(F.when(F.col("n_ret") > 0, F.col("l_suppkey"))).alias("ret_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
    )
    # r12: no static broadcast hint on supplier — it scales linearly with
    # SF (the q3/q5/q18 rationale, r11 VERDICT items 2-3); AQE observes
    # the verdict side is tiny and picks the build side itself.
    return (
        per_o.join(s, per_o.ret_supp == s.s_suppkey, "left_semi")
        .groupBy(F.col("ret_supp").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@q(
    "session_sequences",
    """
    WITH g AS (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        <= 1800000000
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
    ), s AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
        FROM g
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
    FROM s GROUP BY user_id, session_id
    """,
)
def session_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Behavior-sequence corpus: each 30-min-gap session becomes an
    ordered event-type token sequence — the events->training-text bridge
    (next-event prediction / session LMs). Ordering inside the aggregate
    is made deterministic by sorting (ts, event_id, type) STRUCTS with
    array_sort — collect_list alone is shuffle-order-dependent, which
    would be silently nondeterministic at scale. Same single user_id
    partitioning serves the gap window, the running sum, and the final
    aggregation."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(gap <= 30 * 60 * 1_000_000, 0).otherwise(1)
    s = e.select(
        "user_id", "ts", "event_id", "event_type",
        new_sess.alias("new_sess"),
    ).withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(ordered, lambda x: x["event_type"]), " "
        ).alias("seq"),
    )


@q(
    "k_anonymity_screen",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           count(*) < 5 AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def k_anonymity_screen(spark: SparkSession, sf: str) -> DataFrame:
    """Privacy screen for training-data release: group sizes over the
    quasi-identifier combination (nation, market segment) — any group
    smaller than k=5 re-identifies individuals and must be suppressed or
    generalized before the table ships (Sweeney's k-anonymity). One
    partial-agg groupBy; at 100 TB the screen costs one shuffle of the
    quasi-identifier projection."""
    c = _t(spark, sf, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        (F.count(F.lit(1)) < 5).alias("at_risk"),
    )


@q(
    "key_skew_profile",
    """
    WITH per AS (
        SELECT user_id, count(*) AS c FROM events GROUP BY user_id
    ), summary AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(c) AS BIGINT) AS max_count,
               CAST(sum(c) AS DOUBLE) / count(*) AS avg_count,
               CAST(max(c) AS DOUBLE) / (CAST(sum(c) AS DOUBLE) / count(*))
                   AS skew_ratio
        FROM per
    ), top AS (
        SELECT user_id, CAST(c AS BIGINT) AS c,
               row_number() OVER (ORDER BY c DESC, user_id ASC) AS rn
        FROM per
    )
    SELECT s.n_keys, s.max_count, s.avg_count, s.skew_ratio,
           t.rn AS rank, t.user_id AS hot_key, t.c AS hot_count
    FROM summary s CROSS JOIN top t
    WHERE t.rn <= 5
    """,
)
def key_skew_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-key skew diagnostic: per-key cardinality summary plus the
    top-5 hottest keys — the operational pre-check before keying a 100 TB
    join/agg on a column (hot keys -> salting / AQE skew split;
    operators/scaling.py:salted_agg). One partial-agg groupBy; the
    summary and top-k both ride the tiny per-key table.

    The top-5 is ``orderBy().limit(5)`` — TakeOrderedAndProject, a
    per-partition heap + driver merge — NOT a global row_number window,
    which would funnel EVERY per-key count to a single partition
    (VERDICT r3 #6). Rank is then derived on the 5-row result by a
    triangular self-join (count of rows at-or-before self in the strict
    (count desc, key asc) order), so no unpartitioned WindowExec exists
    anywhere in the plan."""
    e = _t(spark, sf, "events")
    per = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    summary = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_count"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("avg_count"),
        (
            F.max("c").cast("double")
            / (F.sum("c").cast("double") / F.count(F.lit(1)))
        ).alias("skew_ratio"),
    )
    top5 = per.orderBy(F.col("c").desc(), F.col("user_id").asc()).limit(5)
    a = top5.select(F.col("user_id").alias("hot_key"), F.col("c").alias("hc"))
    b = top5.select(F.col("user_id").alias("u2"), F.col("c").alias("c2"))
    at_or_before = (F.col("c2") > F.col("hc")) | (
        (F.col("c2") == F.col("hc")) & (F.col("u2") <= F.col("hot_key"))
    )
    top = (
        a.join(b, at_or_before)
        .groupBy("hot_key", "hc")
        .agg(F.count(F.lit(1)).alias("rank"))
        .select(
            "rank",
            "hot_key",
            F.col("hc").cast("long").alias("hot_count"),
        )
    )
    return summary.crossJoin(top).select(
        "n_keys", "max_count", "avg_count", "skew_ratio",
        "rank", "hot_key", "hot_count",
    )


@q(
    "resample_ffill",
    """
    WITH d AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(*) AS n, avg(value) AS av
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT user_id, min(day) AS mn, max(day) AS mx FROM d GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        FROM span
    ), j AS (
        SELECT g.user_id, g.day, d.n, d.av
        FROM grid g LEFT JOIN d USING (user_id, day)
    )
    SELECT user_id, day,
           CAST(coalesce(n, 0) AS BIGINT) AS n_events,
           last_value(av IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS avg_value_ffill,
           n IS NULL AS is_gap
    FROM j
    """,
)
def resample_ffill(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style resample: regularize each user's event stream onto
    a daily grid (min..max of that user's own span), forward-filling the
    daily average through gaps — the gap-fill + locf operator of
    time-series stores, as one grid explode + left join + ignore-nulls
    window. Scale: grid rows ~ users x days (output-bound); the join and
    the fill window share the (user_id, day) partitioning; no driver-side
    date arithmetic."""
    e = _t(spark, sf, "events")
    d = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("av"))
    span = d.groupBy("user_id").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    j = grid.join(d, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.last("av", ignorenulls=True).over(w).alias("avg_value_ffill"),
        F.col("n").isNull().alias("is_gap"),
    )


@q(
    "hopping_window_agg",
    """
    WITH k AS (SELECT unnest([0, 1]) AS k), w AS (
        SELECT e.event_type, e.value,
               CAST(date_trunc('epoch',
                    to_timestamp(
                        (CAST(floor(epoch_us(e.ts) / 1800000000.0) AS BIGINT)
                         - k.k) * 1800)) AS TIMESTAMP) AS win_start
        FROM events e CROSS JOIN k
        WHERE (CAST(floor(epoch_us(e.ts) / 1800000000.0) AS BIGINT) - k.k)
                  * 1800000000 + 3600000000 > epoch_us(e.ts)
    )
    SELECT win_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS total_value
    FROM w GROUP BY win_start, event_type
    """,
)
def hopping_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 1-hour windows every 30
    minutes via the native ``F.window(ts, '1 hour', '30 minutes')`` —
    each event lands in exactly width/hop windows, expanded JVM-side by
    the operator itself (no manual union of shifted tumbles). The oracle
    reconstructs the same windows with the k-shift trick."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@q(
    "event_transition_matrix",
    """
    WITH s AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n,
           count(*) / CAST(sum(count(*)) OVER (PARTITION BY prev_type)
                           AS DOUBLE) AS p
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (the model behind next-event prediction baselines and funnel
    diagnostics): one lag window + one aggregation, both on the user_id
    partitioning; the row-normalized probabilities ride a window over the
    (tiny) grouped result."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    g = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return g.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n") / F.sum("n").over(wp).cast("double")).alias("p"),
    )


@q(
    "multires_rollup",
    """
    WITH hr AS (
        SELECT date_trunc('hour', ts) AS bucket,
               count(*) AS n, sum(value) AS tv
        FROM events GROUP BY 1
    ), dy AS (
        SELECT CAST(date_trunc('day', bucket) AS TIMESTAMP) AS bucket,
               CAST(sum(n) AS BIGINT) AS n, sum(tv) AS tv
        FROM hr GROUP BY 1
    )
    SELECT 'hour' AS level, bucket,
           CAST(n AS BIGINT) AS n_events, tv AS total_value
    FROM hr
    UNION ALL
    SELECT 'day' AS level, bucket, n AS n_events, tv AS total_value
    FROM dy
    """,
)
def multires_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-resolution continuous-aggregate cascade (the hypertable
    rollup-tree pattern): the day level aggregates FROM THE HOUR LEVEL,
    not from raw events — legal because count/sum are algebraic — so at
    100 TB each coarser tier reads a table ~3 orders of magnitude smaller
    than raw and the raw scan happens exactly once for the whole
    pyramid."""
    e = _t(spark, sf, "events")
    # cache the hour tier: it feeds BOTH union branches, and without
    # materialization Spark re-plans (and re-scans raw) per branch —
    # the whole point of the cascade is one raw scan for the pyramid.
    # Lifetime: the entry stays in the CacheManager after the result is
    # consumed (a returned lazy plan has no safe unpersist point);
    # storage-memory reclamation relies on Spark's LRU block eviction —
    # MEMORY_AND_DISK blocks are evictable, so a long session degrades
    # to recompute, never to OOM. Long-running services that sweep many
    # such plans should spark.catalog.clearCache() between batches.
    hr = (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
    )
    hr = cache_once(hr)
    dy = hr.groupBy(F.date_trunc("day", "bucket").alias("bucket")).agg(
        F.sum("n").alias("n"), F.sum("tv").alias("tv")
    )
    out_h = hr.select(
        F.lit("hour").alias("level"),
        "bucket",
        F.col("n").cast("long").alias("n_events"),
        F.col("tv").alias("total_value"),
    )
    out_d = dy.select(
        F.lit("day").alias("level"),
        "bucket",
        F.col("n").cast("long").alias("n_events"),
        F.col("tv").alias("total_value"),
    )
    return out_h.unionByName(out_d)


@q(
    "rolling_median_value",
    """
    SELECT event_id, user_id, ts, value,
           quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS med10
    FROM events
    """,
)
def rolling_median_value(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-10-row exact median per user stream — the robust
    (outlier-immune) smoother a spiky metric needs where a rolling mean
    lies. Exact `percentile` as a window aggregate over the user-keyed
    exchange (same single-shuffle shape as every §2.6 window); the frame
    is 10 rows so per-row work is constant."""
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.expr("percentile(value, 0.5D)").over(w).alias("med10"),
    )


@q(
    "value_histogram",
    """
    WITH b AS (
        SELECT min(value) AS lo, max(value) AS hi,
               (max(value) - min(value)) / 20 AS w
        FROM events
    ), binned AS (
        SELECT CASE WHEN w = 0 THEN CAST(0 AS BIGINT)
                    ELSE least(CAST(floor((value - lo) / w) AS BIGINT), 19)
               END AS bin
        FROM events CROSS JOIN b
    )
    SELECT bin,
           (SELECT lo FROM b) + bin * (SELECT w FROM b)       AS bin_lo,
           (SELECT lo FROM b) + (bin + 1) * (SELECT w FROM b) AS bin_hi,
           CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY bin
    """,
)
def value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed 20-bin fixed-width histogram of a metric column: the
    range is one scalar aggregate broadcast back, binning is pure
    codegen arithmetic, and the grouped count collapses map-side to at
    most 20 rows per task — the O(1)-output distribution profile that
    never sorts or samples. Top bin is closed (max lands in bin 19).
    Degenerate range (all values equal → w = 0) is guarded explicitly:
    every row lands in bin 0 with bin_lo = bin_hi = lo, instead of the
    NaN that Spark's non-ANSI cast would silently turn into 0 while an
    ANSI engine errors (engine-divergence hazard)."""
    e = _t(spark, sf, "events")
    b = e.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        ((F.max("value") - F.min("value")) / 20).alias("w"),
    )
    binned = e.crossJoin(F.broadcast(b)).select(
        F.when(F.col("w") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo")) / F.col("w")
                ).cast("long"),
                F.lit(19).cast("long"),
            )
        )
        .alias("bin"),
        "lo",
        "w",
    )
    return binned.groupBy("bin", "lo", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(
        "bin",
        (F.col("lo") + F.col("bin") * F.col("w")).alias("bin_lo"),
        (F.col("lo") + (F.col("bin") + 1) * F.col("w")).alias("bin_hi"),
        "n",
    )
