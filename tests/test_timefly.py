"""TimeFly snapshot time travel (T1-T8, reference timefly.py)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from pydatalake_spark.dataset.timefly import TimeFly


@pytest.fixture()
def tf(spark, tmpdir_path):
    return TimeFly(spark, os.path.join(tmpdir_path, "ds")).init(name="ds")


def test_init_layout(tf):
    assert os.path.isdir(tf.current_path)
    assert os.path.isdir(tf.snapshot_root)
    assert os.path.exists(tf.config_path)


def test_snapshot_restore_cycle(tf, events):
    v1 = events.filter(F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
    v2 = events.filter(
        (F.col("ts") >= F.lit("2024-01-04").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-07").cast("timestamp"))
    )
    tf.write(v1, mode="append")
    n1 = tf.read().count()
    snap1 = tf.add_snapshot(dt.datetime(2030, 1, 1, 12, 0, 0))

    tf.write(v2, mode="delta", datetime_column="ts")
    n2 = tf.read().count()
    assert n2 == n1 + v2.count()

    # restore back to v1
    tf.load_snapshot(snap1)
    assert tf.read().count() == n1
    # snapshot still listed
    assert snap1 in tf.snapshots()


def test_as_of_rule(tf, events):
    """Reference rule: FIRST snapshot strictly AFTER the timestamp
    (timefly.py:337-352) — NOT Delta's last-before (SURVEY §7.3.4)."""
    v1 = events.limit(10)
    tf.write(v1, mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    tf.write(events.limit(50), mode="overwrite")
    s2 = tf.add_snapshot(dt.datetime(2030, 6, 1))
    tf.write(events.limit(100), mode="overwrite")

    # as-of before s1: first snapshot after it = s1 (the 10-row state)
    assert tf.read(as_of=dt.datetime(2029, 12, 1)).count() == 10
    # between s1 and s2 -> s2 (50 rows)
    assert tf.read(as_of=dt.datetime(2030, 3, 1)).count() == 50
    # after the last snapshot -> current (100 rows)
    assert tf.read(as_of=dt.datetime(2031, 1, 1)).count() == 100


def test_delete_snapshot(tf, events):
    tf.write(events.limit(5), mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    tf.delete_snapshot(s1)
    assert s1 not in tf.snapshots()
    assert s1 in tf.config["history"]["deleted"]
    assert not os.path.exists(os.path.join(tf.snapshot_root, s1))
