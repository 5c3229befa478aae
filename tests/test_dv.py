"""Deletion vectors: the Roaring codec (sources/dv.py), the DV read
path, delete_rows_dv / rewrite_dv_files, and their protocol guards.

Format references are the PUBLIC delta-io PROTOCOL.md ("Deletion
Vectors") and the RoaringFormatSpec; byte-level vectors below pin the
wire format so codec refactors can't silently drift.
"""

from __future__ import annotations

import os
import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from pydatalake_spark.sources import delta as dl
from pydatalake_spark.sources import dv


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_z85_spec_vector():
    # the ZeroMQ Z85 reference test case
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(raw) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == raw


def test_roaring_known_bytes_array_container():
    """Hand-computed wire bytes for {1, 2, 65536}: two 32-bit-bucket
    entries under one 64-bit key, array containers."""
    blob = dv.serialize_dv([1, 2, 65536])
    off = 0
    (magic,) = struct.unpack_from("<i", blob, off); off += 4
    assert magic == 1681511377
    (n_buckets,) = struct.unpack_from("<q", blob, off); off += 8
    assert n_buckets == 1  # all values < 2^32 -> one high-32 bucket (key 0)
    (key,) = struct.unpack_from("<i", blob, off); off += 4
    assert key == 0
    cookie, n_containers = struct.unpack_from("<ii", blob, off); off += 8
    assert cookie == 12346 and n_containers == 2  # high-16 keys 0 and 1
    k0, c0, k1, c1 = struct.unpack_from("<HHHH", blob, off); off += 8
    assert (k0, c0 + 1) == (0, 2)  # values {1,2}
    assert (k1, c1 + 1) == (1, 1)  # value {65536 & 0xFFFF} = {0}
    off += 8  # two int32 container offsets
    assert struct.unpack_from("<HH", blob, off) == (1, 2); off += 4
    assert struct.unpack_from("<H", blob, off) == (0,)


def test_roaring_bitmap_container_kicks_in_past_4096():
    vals = list(range(5000))  # one container, cardinality > 4096 -> bitmap
    blob = dv.serialize_dv(vals)
    # bitmap container is exactly 8 KiB; array would be 10 KB
    assert len(blob) == 4 + 8 + 4 + 8 + 4 + 4 + 8192
    assert dv.deserialize_dv(blob) == vals


def test_roaring_run_container_reads():
    """The writer never emits runs, but foreign DVs may: build one by
    hand (cookie 12347) and decode it."""
    # one container: key 0, run [10, 14] (5 values)
    body = struct.pack("<i", (0 << 16) | 12347)  # n-1=0 in the high bits
    body += bytes([0x01])  # run bitset: container 0 is a run
    body += struct.pack("<HH", 0, 4)  # key 0, cardinality-1
    # fewer than NO_OFFSET_THRESHOLD containers with run cookie: no offsets
    body += struct.pack("<H", 1)  # one run
    body += struct.pack("<HH", 10, 4)  # start 10, length-1 = 4
    blob = struct.pack("<i", dv.MAGIC) + struct.pack("<q", 1)
    blob += struct.pack("<i", 0) + body
    assert dv.deserialize_dv(blob) == [10, 11, 12, 13, 14]


@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40)), max_size=300
    )
)
def test_roaring_roundtrip_property(rows):
    assert dv.deserialize_dv(dv.serialize_dv(rows)) == sorted(set(rows))


@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=4, max_size=64).filter(lambda b: len(b) % 4 == 0))
def test_z85_roundtrip_property(data):
    assert dv.z85_decode(dv.z85_encode(data)) == data


def test_dv_file_descriptor_roundtrip(tmpdir_path):
    rows = [3, 7, 11, 1 << 33]
    desc = dv.write_dv_file(tmpdir_path, rows)
    assert desc["storageType"] == "u"
    assert desc["cardinality"] == 4
    assert dv.read_dv_descriptor(tmpdir_path, desc) == rows
    # CRC tamper detection
    path = dv._dv_file_path(tmpdir_path, desc)
    with open(path, "r+b") as f:
        f.seek(desc["offset"] + 4 + 2)
        b = f.read(1)
        f.seek(desc["offset"] + 4 + 2)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum"):
        dv.read_dv_descriptor(tmpdir_path, desc)


def test_inline_descriptor_roundtrip(tmpdir_path):
    rows = list(range(100))
    desc = dv.inline_dv_descriptor(rows)
    assert desc["storageType"] == "i"
    assert dv.read_dv_descriptor(tmpdir_path, desc) == rows


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------


def _mk(spark, n=100):
    return (
        spark.range(n)
        .withColumn("part", (F.col("id") % 3).cast("string"))
        .withColumn("v", F.col("id").cast("double"))
    )


def test_delete_rows_dv_end_to_end(spark, table):
    dl.write_delta(_mk(spark), table, partition_by=["part"])
    v, n = dl.delete_rows_dv(spark, table, "id % 7 = 0")
    assert v == 1 and n == 15
    back = dl.read_delta(spark, table)
    assert back.count() == 85
    assert back.filter("id % 7 = 0").count() == 0
    # protocol auto-upgraded to reader v3 with the feature
    snap = dl.snapshot(table)
    assert snap.protocol["minReaderVersion"] == 3
    assert "deletionVectors" in snap.protocol["readerFeatures"]
    # logical row count excludes tombstoned rows
    assert dl.describe_delta(table)["numRecords"] == 85


def test_delete_rows_dv_merges_existing_bitmaps(spark, table):
    dl.write_delta(_mk(spark), table, partition_by=["part"])
    dl.delete_rows_dv(spark, table, "id % 7 = 0")
    dl.delete_rows_dv(spark, table, "id % 11 = 0")
    expected = len([i for i in range(100) if i % 7 and i % 11])
    assert dl.read_delta(spark, table).count() == expected
    # per spec each file carries at most ONE deletionVector
    for add in dl.snapshot(table).files.values():
        assert "deletionVector" not in add or add["deletionVector"]
    # idempotent: nothing visible matches anymore
    v, n = dl.delete_rows_dv(spark, table, "id % 7 = 0")
    assert v is None and n == 0


def test_dv_survives_checkpoint_and_log_clean(spark, table):
    dl.write_delta(_mk(spark), table, partition_by=["part"])
    dl.delete_rows_dv(spark, table, "id < 20")
    dl.write_checkpoint(table)
    assert dl.cleanup_delta_log(table, retention_hours=0.0)
    assert dl.read_delta(spark, table).count() == 80
    assert dl.read_delta(spark, table).filter("id < 20").count() == 0


def test_time_travel_before_delete_sees_all_rows(spark, table):
    dl.write_delta(_mk(spark), table)
    dl.delete_rows_dv(spark, table, "id >= 50")
    assert dl.read_delta(spark, table).count() == 50
    assert dl.read_delta(spark, table, version=0).count() == 100


def test_rewrite_dv_files_purges(spark, table):
    dl.write_delta(_mk(spark), table, partition_by=["part"])
    dl.delete_rows_dv(spark, table, "id % 2 = 0")
    v = dl.rewrite_dv_files(spark, table)
    assert v == 2
    snap = dl.snapshot(table)
    assert not dl._has_dvs(snap.files)
    assert dl.read_delta(spark, table).count() == 50
    # purge is dataChange: false — the change feed skips it
    changes = dl.read_delta_changes(spark, table, from_version=1)
    assert changes.count() == 0


def test_merge_and_compact_refuse_dv_tables(spark, table):
    dl.write_delta(_mk(spark), table)
    dl.delete_rows_dv(spark, table, "id = 0")
    src = _mk(spark, 5)
    with pytest.raises(dl.DeltaProtocolError, match="deletion-vector"):
        dl.merge_delta(spark, table, src, on=["id"])
    with pytest.raises(dl.DeltaProtocolError, match="deletion-vector"):
        dl.compact_delta(spark, table)
    # after the purge both work again
    dl.rewrite_dv_files(spark, table)
    dl.merge_delta(spark, table, src, on=["id"])
    assert dl.read_delta(spark, table).filter("id < 5").count() == 5


def test_change_feed_refuses_dv_add_commit(spark, table):
    dl.write_delta(_mk(spark), table)
    dl.delete_rows_dv(spark, table, "id = 3")
    with pytest.raises(dl.DeltaProtocolError):
        dl.read_delta_changes(spark, table, from_version=0)


def test_vacuum_keeps_live_dv_bins_and_reaps_orphans(spark, table):
    import time as _time

    dl.write_delta(_mk(spark), table)
    dl.delete_rows_dv(spark, table, "id = 1")
    live_bins = [
        n for n in os.listdir(table) if n.startswith("deletion_vector_")
    ]
    assert len(live_bins) >= 1
    # plant an orphan DV bin, aged past retention
    orphan = os.path.join(table, "deletion_vector_orphan.bin")
    open(orphan, "wb").close()
    os.utime(orphan, (_time.time() - 10 * 86400,) * 2)
    gone = dl.vacuum_delta(table, retention_hours=168)
    assert "deletion_vector_orphan.bin" in gone
    for n in live_bins:
        assert os.path.isfile(os.path.join(table, n))
    assert dl.read_delta(spark, table).count() == 99


def test_restore_refuses_when_dv_bin_vacuumed(spark, table):
    dl.write_delta(_mk(spark), table)
    dl.delete_rows_dv(spark, table, "id = 1")  # v1: DV add
    dl.write_delta(_mk(spark), table, mode="overwrite")  # v2: DV gone
    # the DV bin (unreferenced at HEAD) gets vacuumed; data files are
    # kept (simulating a DV-retention policy shorter than data retention)
    for n in os.listdir(table):
        if n.startswith("deletion_vector_"):
            os.unlink(os.path.join(table, n))
    with pytest.raises(dl.DeltaProtocolError, match="vacuumed"):
        dl.restore_delta(table, 1)
    # restoring to v0 (no DVs, data files intact) still works
    assert dl.restore_delta(table, 0) == 3


def test_foreign_inline_dv_reads(spark, table):
    """A foreign writer may inline small DVs (storageType 'i'): patch
    the latest add action by hand and read back."""
    import json

    dl.write_delta(_mk(spark, 10).coalesce(1), table)
    snap = dl.snapshot(table)
    assert len(snap.files) == 1  # one file, physical positions 0..9
    rel, add = next(iter(snap.files.items()))
    desc = dv.inline_dv_descriptor([0, 2])
    actions = [
        {"protocol": dict(dl.DV_PROTOCOL)},
        {
            "remove": {
                "path": add["path"],
                "deletionTimestamp": 1,
                "dataChange": True,
            }
        },
        {"add": {**add, "deletionVector": desc, "dataChange": True}},
    ]
    dl._write_commit(table, 1, actions)
    back = dl.read_delta(spark, table)
    # rows at physical positions 0 and 2 of that one file are gone
    assert back.count() == 8


@pytest.fixture()
def table(tmpdir_path):
    return os.path.join(tmpdir_path, "tbl")


def test_update_rows_dv_end_to_end(spark, table):
    """UPDATE at DV speed: matched rows tombstoned + updated versions
    added in ONE commit; unmatched files untouched."""
    dl.write_delta(_mk(spark), table, partition_by=["part"])
    before = set(dl.snapshot(table).files)
    v, n = dl.update_rows_dv(
        spark, table, "id % 10 = 0", {"v": "v + 1000"}
    )
    assert v == 1 and n == 10
    back = dl.read_delta(spark, table)
    assert back.count() == 100  # row count unchanged
    assert back.filter("v >= 1000").count() == 10
    assert (
        back.filter("id % 10 = 0").filter("v < 1000").count() == 0
    )
    # untouched rows identical
    assert back.filter("id % 10 != 0").filter("v >= 1000").count() == 0
    # every pre-existing file survives (tombstoned-in-place, not rewritten)
    after = dl.snapshot(table).files
    assert before <= set(after)
    # history records an UPDATE
    assert dl.delta_history(table)[-1]["operation"] == "UPDATE"


def test_update_rows_dv_moves_partitions(spark, table):
    """Updating a partition column re-stages the rows through
    partitionBy — they move to their new hive dir."""
    dl.write_delta(_mk(spark, 30), table, partition_by=["part"])
    v, n = dl.update_rows_dv(
        spark, table, "part = '2'", {"part": "'9'"}
    )
    assert n == 10
    back = dl.read_delta(spark, table)
    assert back.filter("part = '2'").count() == 0
    assert back.filter("part = '9'").count() == 10
    assert any("part=9" in rel for rel in dl.snapshot(table).files)


def test_update_rows_dv_respects_check_constraints(spark, table):
    df = _mk(spark, 10)
    dl.write_delta(
        df, table, configuration={"delta.constraints.pos": "v >= 0"}
    )
    with pytest.raises(dl.DeltaConstraintViolation):
        dl.update_rows_dv(spark, table, "id = 1", {"v": "-5.0"})
    # table unchanged after the refused update
    assert dl.read_delta(spark, table).filter("v < 0").count() == 0
    assert dl.snapshot(table).version == 0


def test_update_rows_dv_no_match_returns_none(spark, table):
    dl.write_delta(_mk(spark, 10), table)
    assert dl.update_rows_dv(spark, table, "id > 99", {"v": "0.0"}) == (
        None,
        0,
    )


def test_facade_delete_update_purge(spark, table):
    dl.write_delta(_mk(spark, 20), table)
    t = dl.DeltaTable.forPath(spark, table)
    assert t.delete("id >= 15")[1] == 5
    assert t.update("id = 0", {"v": "42.0"})[1] == 1
    df = t.toDF()
    assert df.count() == 15
    assert df.filter("v = 42.0").count() == 1
    assert t.purge() is not None
    assert not dl._has_dvs(dl.snapshot(table).files)
    assert t.toDF().count() == 15
