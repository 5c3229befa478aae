"""Schema unification with the promotion lattice (SURVEY §1.4, W9;
reference utils/dataset.py:8-130). FIXTURES.md B1 layout."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from pydatalake_spark.dataset.schema import (
    promote_types,
    read_unified,
    schema_from_dict,
    schema_to_dict,
    unify_schemas,
)
from pydatalake_spark.sources.read import read_parquet


@pytest.fixture()
def mixed_fragments(tmpdir_path):
    """Three parquet files with conflicting schemas (FIXTURES B1)."""
    f1 = pa.table(
        {"event_id": pa.array([1, 2], pa.int64()), "user_id": pa.array([10, 11], pa.int64())}
    )  # drops value
    f2 = pa.table(
        {
            "event_id": pa.array([3, 4], pa.int64()),
            "user_id": pa.array([12, 13], pa.int32()),
            "value": pa.array([1, 2], pa.int32()),
        }
    )
    f3 = pa.table(
        {
            "event_id": pa.array([5], pa.int64()),
            "user_id": pa.array([14], pa.int64()),
            "value": pa.array(["9.5"], pa.string()),
            "session_id": pa.array(["s1"], pa.string()),
        }
    )
    paths = []
    for i, t in enumerate([f1, f2, f3]):
        p = os.path.join(tmpdir_path, f"f{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return tmpdir_path, paths


def test_promote_types_lattice():
    assert promote_types(T.IntegerType(), T.LongType()) == T.LongType()
    assert promote_types(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert promote_types(T.IntegerType(), T.StringType()) == T.StringType()
    assert promote_types(T.ByteType(), T.ShortType()) == T.ShortType()
    # outside the lattice: left wins (rank-0 rule, utils/dataset.py:36-44)
    assert promote_types(T.TimestampType(), T.DateType()) == T.TimestampType()


def test_unify_schemas_union_and_promotion(mixed_fragments, spark):
    _, paths = mixed_fragments
    from pydatalake_spark.dataset.schema import list_fragment_schemas

    unified = unify_schemas(list_fragment_schemas(paths))
    d = {f.name: f.dataType for f in unified.fields}
    assert d["user_id"] == T.LongType()      # int32 vs int64 -> int64
    assert d["value"] == T.StringType()      # int32 vs string -> string
    assert d["session_id"] == T.StringType() # union of names
    assert [f.name for f in unified.fields] == sorted(d)  # alphabetized


def test_read_unified_values(mixed_fragments, spark):
    _, paths = mixed_fragments
    df, unified = read_unified(spark, paths)
    rows = {r["event_id"]: r.asDict() for r in df.collect()}
    assert len(rows) == 5
    assert rows[1]["value"] is None          # missing column -> NULL
    assert rows[3]["value"] == "1"           # int32 cast to promoted string
    assert rows[5]["value"] == "9.5"
    assert rows[5]["session_id"] == "s1"


def test_read_parquet_auto_retry(mixed_fragments, spark):
    """The scan-level retry path (reader.py:186-188): plain read fails on
    the type conflict, read_parquet falls back to unified read."""
    base, _ = mixed_fragments
    df = read_parquet(spark, base)
    assert df.count() == 5
    assert dict(df.dtypes)["value"] == "string"


def test_schema_dict_roundtrip():
    s = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.ArrayType(T.FloatType())),
            T.StructField("c", T.TimestampType()),
        ]
    )
    assert schema_from_dict(schema_to_dict(s)).fieldNames() == s.fieldNames()
