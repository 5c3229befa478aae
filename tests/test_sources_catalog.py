"""Source format dispatch, partition flavors, catalog, fluent chain."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.feather as feather
import pytest
from pyspark.sql import functions as F

from pydatalake_spark.dataset.table import DataLakeTable
from pydatalake_spark.dataset.writer import write_dataset
from pydatalake_spark.datalake.catalog import DataLake
from pydatalake_spark.sources.read import (
    read_any,
    read_directory_partitioned,
    read_dataset,
)

SF = "/root/testdata/sf0.001"


def test_read_any_dispatch_parquet(spark):
    df = read_any(spark, f"{SF}/nation.parquet")
    assert df.count() == 25


def test_csv_roundtrip(spark, tmpdir_path):
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    path = os.path.join(tmpdir_path, "nation_csv")
    write_dataset(nation, path, mode="append", fmt="csv")
    back = read_any(spark, path, fmt="csv")
    assert back.count() == 25
    assert set(back.columns) == set(nation.columns)


def test_feather_edge_reader(spark, tmpdir_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = os.path.join(tmpdir_path, "t.feather")
    feather.write_feather(t, p)
    df = read_any(spark, p)
    assert df.count() == 3
    assert set(df.columns) == {"a", "b"}


def test_directory_flavor_partitions(spark, events, tmpdir_path):
    """Bare value/ dirs (writer.py:136-137) read back with an explicit
    partition schema (SURVEY §1.5)."""
    base = os.path.join(tmpdir_path, "dirflavor")
    for r in events.select("event_type").distinct().collect():
        et = r["event_type"]
        events.filter(F.col("event_type") == et).drop("event_type").write.parquet(
            os.path.join(base, et)
        )
    df = read_directory_partitioned(spark, base, [("event_type", "string")])
    assert df.count() == events.count()
    assert set(r["event_type"] for r in df.select("event_type").distinct().collect()) == {
        "click", "error", "purchase", "signup", "view"
    }


def test_fluent_chain_order(spark, events):
    """drop -> distinct -> sort fixed order (dataset/base.py:118-142)."""
    t = DataLakeTable(spark, df=events, name="events")
    out = (
        t.drop(["props"])
        .distinct(["user_id"], keep="last", presort_by=["ts"])
        .sort("user_id")
        .to_df()
    )
    assert "props" not in out.columns
    assert out.count() == events.select("user_id").distinct().count()
    # keep=last with presort ts -> max ts per user survives
    want = events.groupBy("user_id").agg(F.max("ts").alias("ts"))
    got = out.select("user_id", "ts")
    assert got.exceptAll(want).count() == 0


def test_table_sql_passthrough(spark):
    t = DataLakeTable(spark, path=f"{SF}/orders.parquet", name="orders_t")
    df = t.query("SELECT count(*) AS n FROM orders_t")
    assert df.first()["n"] == 1500


def test_datalake_catalog(spark, events, tmpdir_path):
    lake = DataLake(spark, tmpdir_path)
    tf = lake.create("ev", description="events dataset")
    tf.write(events.limit(100), mode="append")
    assert "ev" in lake.tables()

    # rediscovery from disk by a fresh manager (manager.py:92-95)
    lake2 = DataLake(spark, tmpdir_path)
    assert "ev" in lake2.tables()
    assert lake2.table("ev").count() == 100

    # cross-dataset SQL
    n = lake2.sql("SELECT count(*) AS n FROM ev").first()["n"]
    assert n == 100

    lake2.remove("ev", delete_data=True)
    assert "ev" not in lake2.tables()


def test_adopt_reference_toml_lake(spark, events, tmpdir_path):
    """Read-side TOML compat: a lake written by the reference
    (``_pydala.toml`` registry + ``_dataset.toml`` per dataset + physical
    snapshot dirs, timefly.py:50 / manager.py:48) must be readable in place
    — including snapshot as-of resolution against the physical copies."""
    import datetime as dt
    import os

    from pydatalake_spark.dataset.timefly import TimeFly

    root = os.path.join(tmpdir_path, "reflake")
    ds = os.path.join(root, "ev")
    os.makedirs(os.path.join(ds, "current"))
    events.limit(30).write.mode("overwrite").parquet(os.path.join(ds, "current"))
    snap_dir = os.path.join(ds, "snapshot", "20300101_120000")
    os.makedirs(os.path.dirname(snap_dir), exist_ok=True)
    import shutil

    shutil.copytree(os.path.join(ds, "current"), snap_dir)
    with open(os.path.join(ds, "_dataset.toml"), "w") as f:
        f.write(
            '[dataset]\nname = "ev"\ninit = "20300101_110000"\n'
            'description = "ref-written"\n'
            '[current]\nformat = "parquet"\ncreated = "20300101_110000"\n'
            "[snapshot]\navailable = [\"20300101_120000\"]\ndeleted = []\n"
            '[snapshot.20300101_120000]\ncreated = "20300101_120000"\n'
        )
    with open(os.path.join(root, "_pydala.toml"), "w") as f:
        f.write(
            '[pydala]\nname = "reflake"\n'
            '[dataset.ev]\nname = "ev"\npath = "ev"\ndescription = "ref-written"\n'
        )

    tf = TimeFly(spark, ds)
    assert tf.config["name"] == "ev"
    assert tf.snapshots() == ["20300101_120000"]
    assert tf.read().count() == 30
    # physical snapshot resolves through the as-of rule
    assert tf.read(as_of=dt.datetime(2029, 1, 1)).count() == 30

    lake = DataLake(spark, root)
    assert "ev" in lake.tables()
    assert lake.table("ev").count() == 30


def test_read_any_json_dispatch(spark, tmpdir_path):
    import os

    from pydatalake_spark.sources.read import read_any

    d = os.path.join(tmpdir_path, "j")
    spark.range(6).selectExpr("id", "id * 3 AS v").write.json(d)
    back = read_any(spark, d, fmt="json")
    assert back.count() == 6
    assert set(back.columns) == {"id", "v"}


def test_fluent_sample_and_cap(spark, tmpdir_path):
    import os

    from pydatalake_spark.dataset.table import DataLakeTable

    rows = [(i, f"s{i % 4}", float(1 + i % 7)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    p = os.path.join(str(tmpdir_path), "fluent_docs")
    df.write.mode("overwrite").parquet(p)

    t = DataLakeTable(spark, p, name="fluent_docs")
    s1 = {r.doc_id for r in t.sample_weighted("doc_id", "w", 30).to_df().collect()}
    s2 = {r.doc_id for r in t.sample_weighted("doc_id", "w", 30).to_df().collect()}
    assert s1 == s2 and len(s1) == 30

    capped = t.cap_per("source", "doc_id", 5).to_df()
    from collections import Counter

    c = Counter(r.source for r in capped.collect())
    assert all(v == 5 for v in c.values()) and len(c) == 4


def test_feather_distributed_source(spark, events, tmpdir_path):
    """Directory feather datasets now read DISTRIBUTED: whole files ship
    to executors via binaryFile and decode there (MapInPandas in the
    plan, no driver-side parallelize), hive partition dirs become typed
    columns, and values equal the parquet twin."""
    import os

    from pydatalake_spark.dataset.writer import write_dataset
    from pydatalake_spark.sources.read import read_feather

    path = os.path.join(tmpdir_path, "fds")
    d = events.limit(300).withColumn(
        "half", (F.col("event_id") % 2).cast("int")
    )
    write_dataset(
        d, path, mode="append", partition_by=["event_type", "half"],
        fmt="feather",
    )
    back = read_feather(spark, path)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # executor-side decode
    assert "Scan binaryFile" in plan or "binaryFile" in plan
    assert back.count() == 300
    # typed partition columns, values intact
    assert dict(back.dtypes)["half"] == "bigint"
    want = {
        (r.event_id): (r.event_type, r.half)
        for r in d.select("event_id", "event_type", "half").collect()
    }
    got = {
        (r.event_id): (r.event_type, r.half)
        for r in back.select("event_id", "event_type", "half").collect()
    }
    assert got == want


def test_feather_mixed_schema_dir(spark, tmpdir_path):
    """Heterogeneous feather file schemas read green through the
    promotion-lattice unify (the parquet retry posture): a column missing
    from one file null-fills, an int-vs-string conflict promotes to
    string — previously a KeyError/cast failure inside the executor."""
    from pydatalake_spark.sources.read import read_feather

    base = os.path.join(tmpdir_path, "mixed")
    os.makedirs(base)
    feather.write_feather(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": ["x", "y"]}),
        os.path.join(base, "f1.feather"),
    )
    feather.write_feather(
        pa.table({"a": pa.array(["seven"], pa.string()),
                  "c": pa.array([1.5], pa.float64())}),
        os.path.join(base, "f2.feather"),
    )
    back = read_feather(spark, base)
    assert dict(back.dtypes) == {"a": "string", "b": "string", "c": "double"}
    rows = {tuple(r) for r in back.collect()}
    assert rows == {("1", "x", None), ("2", "y", None), ("seven", None, 1.5)}


def test_feather_hive_mixed_value_types_promote_to_string(spark, tmpdir_path):
    """A partition key observed as both '1' and 'x' types as STRING (the
    permissive promotion); first-value typing used to raise int('x') in
    the executor task."""
    from pydatalake_spark.sources.read import read_feather

    base = os.path.join(tmpdir_path, "mixedpart")
    t = pa.table({"v": pa.array([10], pa.int64())})
    for d in ("k=1", "k=x"):
        os.makedirs(os.path.join(base, d))
        feather.write_feather(t, os.path.join(base, d, "f.feather"))
    back = read_feather(spark, base)
    assert dict(back.dtypes)["k"] == "string"
    assert {r.k for r in back.collect()} == {"1", "x"}


def test_feather_hive_null_sentinel_and_escapes(spark, tmpdir_path):
    """__HIVE_DEFAULT_PARTITION__ reads as NULL (not the literal string),
    and %-escaped partition values unescape; the key stays typed from the
    non-null values."""
    from pydatalake_spark.sources.read import read_feather

    base = os.path.join(tmpdir_path, "nullpart")
    t = pa.table({"v": pa.array([10], pa.int64())})
    for d in ("k=__HIVE_DEFAULT_PARTITION__", "k=5"):
        os.makedirs(os.path.join(base, d))
        feather.write_feather(t, os.path.join(base, d, "f.feather"))
    back = read_feather(spark, base)
    assert dict(back.dtypes)["k"] == "bigint"
    assert {r.k for r in back.collect()} == {None, 5}

    base2 = os.path.join(tmpdir_path, "escpart")
    os.makedirs(os.path.join(base2, "k=a%20b"))
    feather.write_feather(t, os.path.join(base2, "k=a%20b", "f.feather"))
    back2 = read_feather(spark, base2)
    assert [r.k for r in back2.collect()] == ["a b"]


def test_feather_hive_adversarial_numeric_spellings_stay_string(
    spark, tmpdir_path
):
    """Values python's int()/float() would happily parse but hive never
    writes as numbers — underscore separators, padded whitespace (URL-
    escaped), nan — must type STRING, not silently corrupt into numerics
    (int('1_0') == 10). The strict-regex promotion pins this."""
    from pydatalake_spark.sources.read import read_feather

    t = pa.table({"v": pa.array([1], pa.int64())})
    cases = {
        "underscore": (["k=1_0", "k=2"], {"1_0", "2"}),
        "whitespace": (["k=%205", "k=7"], {" 5", "7"}),
        "nan": (["k=nan", "k=1.5"], {"nan", "1.5"}),
    }
    for name, (dirs, want) in cases.items():
        base = os.path.join(tmpdir_path, f"adv_{name}")
        for d in dirs:
            os.makedirs(os.path.join(base, d))
            feather.write_feather(t, os.path.join(base, d, "f.feather"))
        back = read_feather(spark, base)
        assert dict(back.dtypes)["k"] == "string", name
        assert {r.k for r in back.collect()} == want, name
