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


def test_snapshot_is_metadata_only(tf, events):
    """T3 at scale: a snapshot must cost O(metadata), not O(dataset) — the
    snapshot dir holds one manifest, current's data files stay in place, and
    a destructive overwrite MOVES (renames) referenced files into _archive
    rather than copying."""
    tf.write(events.limit(20), mode="append")
    inodes_before = {
        f: os.stat(os.path.join(tf.current_path, f)).st_ino
        for f in os.listdir(tf.current_path)
        if not f.startswith(("_", "."))
    }
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    snap_dir = os.path.join(tf.snapshot_root, s1)
    assert os.listdir(snap_dir) == ["_manifest.json"]
    # snapshot creation did not touch current's files
    assert all(
        os.path.exists(os.path.join(tf.current_path, f)) for f in inodes_before
    )

    tf.write(events.limit(5), mode="overwrite")
    # COW moved the referenced files (same inode → rename, no data copy)
    for f, ino in inodes_before.items():
        archived = os.path.join(tf.archive_path, f)
        assert os.path.exists(archived)
        assert os.stat(archived).st_ino == ino
    assert tf.read(as_of=dt.datetime(2029, 1, 1)).count() == 20
    assert tf.read().count() == 5

    # dropping the snapshot garbage-collects the archive
    tf.delete_snapshot(s1)
    assert not os.path.isdir(tf.archive_path)


def test_snapshot_partitioned_roundtrip(tf, events):
    """Hive-partitioned current: the manifest keeps relative key=value paths
    and the snapshot read re-derives partition columns via basePath."""
    v1 = events.limit(40).withColumn("etype", F.col("event_type"))
    tf.write(v1, mode="append", partition_by="etype")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    v2 = events.limit(3).withColumn("etype", F.col("event_type"))
    tf.write(v2, mode="overwrite", partition_by="etype")

    back = tf.read(as_of=dt.datetime(2029, 1, 1))
    assert "etype" in back.columns
    assert back.count() == 40
    assert back.select("etype").distinct().count() == v1.select("etype").distinct().count()


def test_delete_snapshot(tf, events):
    tf.write(events.limit(5), mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    tf.delete_snapshot(s1)
    assert s1 not in tf.snapshots()
    assert s1 in tf.config["history"]["deleted"]
    assert not os.path.exists(os.path.join(tf.snapshot_root, s1))


# ---------------------------------------------------------------------------
# fault injection (VERDICT r5 #6): the copy-on-write crash window is
# move-then-repoint — kill in between and the lake must stay readable,
# GC-safe, and repairable
# ---------------------------------------------------------------------------


def _crash_mid_cow(tf, df):
    """Drive an overwrite whose COW is killed AFTER the archive rename
    but BEFORE the manifest repoint: files land in _archive/ while the
    manifest still says current."""
    orig = TimeFly._write_manifest

    def boom(self, snap_id, manifest):
        raise RuntimeError("injected crash before manifest repoint")

    TimeFly._write_manifest = boom
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            tf.write(df, mode="overwrite")
    finally:
        TimeFly._write_manifest = orig


def test_cow_crash_window_stays_readable_and_repairable(tf, events):
    tf.write(events.limit(10), mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    _crash_mid_cow(tf, events.limit(50))

    # crashed state: file physically archived, manifest still "current"
    manifest = tf._read_manifest(s1)
    assert all(e["location"] == "current" for e in manifest["files"])
    assert all(
        os.path.exists(os.path.join(tf.archive_path, e["path"]))
        for e in manifest["files"]
    )

    # 1) the snapshot is READABLE before any repair (per-entry fallback)
    assert tf.read(as_of=dt.datetime(2029, 1, 1)).count() == 10

    # 2) repair() repoints every stranded entry; reads still work
    assert tf.repair() == len(manifest["files"])
    assert all(
        e["location"] == "archive" for e in tf._read_manifest(s1)["files"]
    )
    assert tf.repair() == 0  # idempotent
    assert tf.read(as_of=dt.datetime(2029, 1, 1)).count() == 10


def test_gc_archive_never_drops_stranded_files(tf, events):
    """_gc_archive in the crashed state (manifest says current, file in
    _archive/) must keep the stranded file — the referenced set is
    location-blind."""
    tf.write(events.limit(10), mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    s2 = tf.add_snapshot(dt.datetime(2030, 6, 1))
    _crash_mid_cow(tf, events.limit(50))

    stranded = [
        os.path.join(tf.archive_path, e["path"])
        for e in tf._read_manifest(s1)["files"]
    ]
    assert all(os.path.exists(p) for p in stranded)
    # deleting the OTHER snapshot triggers GC while s1 is still stranded
    tf.delete_snapshot(s2)
    assert all(os.path.exists(p) for p in stranded)
    assert tf.read(as_of=dt.datetime(2029, 1, 1)).count() == 10


def test_interrupted_cow_self_heals_on_rerun(tf, events):
    """Re-running the overwrite after the crash completes the repoint
    (the move is skipped — already done) and the write succeeds."""
    tf.write(events.limit(10), mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    _crash_mid_cow(tf, events.limit(50))

    tf.write(events.limit(50), mode="overwrite")  # no injection: heals
    assert all(
        e["location"] == "archive" for e in tf._read_manifest(s1)["files"]
    )
    assert tf.read().count() == 50
    assert tf.read(as_of=dt.datetime(2029, 1, 1)).count() == 10


def test_crash_mid_restore_rerun_succeeds(tf, events):
    """A kill during load_snapshot's copy-back leaves current/ partial;
    manifests are safe (COW ran first), so re-running the restore
    completes it."""
    import shutil as _shutil

    tf.write(events.limit(10), mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    tf.write(events.limit(50), mode="overwrite")

    calls = {"n": 0}
    orig = _shutil.copy2

    def flaky(src, dst, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash mid-restore")
        return orig(src, dst, **kw)

    _shutil.copy2 = flaky
    try:
        with pytest.raises(RuntimeError, match="mid-restore"):
            tf.load_snapshot(s1)
    finally:
        _shutil.copy2 = orig

    tf.load_snapshot(s1)  # rerun completes
    assert tf.read().count() == 10


def test_cow_crash_after_partial_moves(tf, events):
    """Kill the COW after only SOME archive renames (not at the manifest
    boundary): a mixed state — some files moved, some still in current,
    manifest saying current for all. Reads and repair must handle every
    per-entry combination, not just the all-moved state."""
    import shutil as _shutil

    tf.write(events.limit(40), mode="append")
    # multiple data files so a partial move is possible
    tf.write(events.limit(40), mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    n_files = len(tf._read_manifest(s1)["files"])
    assert n_files >= 2
    n_before = tf.read(as_of=dt.datetime(2029, 1, 1)).count()

    calls = {"n": 0}
    orig = _shutil.move

    def flaky(src, dst, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # first move lands, second dies
            raise RuntimeError("injected crash mid-move")
        return orig(src, dst, **kw)

    _shutil.move = flaky
    try:
        with pytest.raises(RuntimeError, match="mid-move"):
            tf.write(events.limit(5), mode="overwrite")
    finally:
        _shutil.move = orig

    # mixed state: exactly one file archived, the rest still in current
    archived = [
        e["path"]
        for e in tf._read_manifest(s1)["files"]
        if os.path.exists(os.path.join(tf.archive_path, e["path"]))
    ]
    assert len(archived) == 1
    # snapshot readable across the split locations
    assert tf.read(as_of=dt.datetime(2029, 1, 1)).count() == n_before
    # repair fixes exactly the moved entry
    assert tf.repair() == 1
    locs = {e["path"]: e["location"] for e in tf._read_manifest(s1)["files"]}
    assert locs[archived[0]] == "archive"
    assert sum(1 for v in locs.values() if v == "current") == n_files - 1
    # and the next overwrite completes normally
    tf.write(events.limit(5), mode="overwrite")
    assert tf.read(as_of=dt.datetime(2029, 1, 1)).count() == n_before
    assert tf.read().count() == 5


def test_restore_with_missing_archive_file_leaves_current_intact(tf, events):
    """A snapshot whose archived file was deleted outside TimeFly must
    fail the restore BEFORE current/ is destroyed — the old order
    discovered the loss mid-copy, after the rmtree."""
    tf.write(events.limit(10), mode="append")
    s1 = tf.add_snapshot(dt.datetime(2030, 1, 1))
    tf.write(events.limit(50), mode="overwrite")  # COW archives s1's files

    # simulate external data loss: delete one archived file
    entry = tf._read_manifest(s1)["files"][0]
    os.remove(os.path.join(tf.archive_path, entry["path"]))

    with pytest.raises(FileNotFoundError, match="current/ left untouched"):
        tf.load_snapshot(s1)
    # current survives the failed restore
    assert tf.read().count() == 50
