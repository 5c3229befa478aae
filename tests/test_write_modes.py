"""Write-mode semantics (W1-W8, reference writer.py:185-527)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pydatalake_spark.dataset.writer import write_dataset
from pydatalake_spark.sources.read import read_dataset


def test_raise_mode(spark, events, tmpdir_path):
    path = os.path.join(tmpdir_path, "ds")
    write_dataset(events, path, mode="raise")
    assert read_dataset(spark, path).count() == events.count()
    with pytest.raises(FileExistsError):
        write_dataset(events, path, mode="raise")


def test_overwrite_and_append(spark, events, tmpdir_path):
    path = os.path.join(tmpdir_path, "ds")
    write_dataset(events, path, mode="append")
    write_dataset(events, path, mode="append")
    assert read_dataset(spark, path).count() == 2 * events.count()
    write_dataset(events, path, mode="overwrite")
    assert read_dataset(spark, path).count() == events.count()


def test_delta_mode_idempotent(spark, events, tmpdir_path):
    """Delta mode appends only genuinely new rows; rewriting the same batch
    adds zero (writer.py:219-249; FIXTURES B3)."""
    path = os.path.join(tmpdir_path, "ds")
    days_1_5 = events.filter(F.col("ts") < F.lit("2024-01-06").cast("timestamp"))
    days_4_8 = events.filter(
        (F.col("ts") >= F.lit("2024-01-04").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-09").cast("timestamp"))
    )
    write_dataset(days_1_5, path, mode="delta", datetime_column="ts")
    n1 = read_dataset(spark, path).count()
    assert n1 == days_1_5.count()

    write_dataset(days_4_8, path, mode="delta", datetime_column="ts")
    n2 = read_dataset(spark, path).count()
    expected = days_1_5.unionByName(days_4_8).distinct().count()
    assert n2 == expected

    # idempotency: same batch again adds nothing
    write_dataset(days_4_8, path, mode="delta", datetime_column="ts")
    assert read_dataset(spark, path).count() == n2


def test_delta_subset(spark, events, tmpdir_path):
    """delta_subset: rows matching an existing KEY are not re-appended even
    if non-key columns differ (utils/table.py:158-185)."""
    path = os.path.join(tmpdir_path, "ds")
    base = events.limit(100)
    write_dataset(base, path, mode="delta", delta_subset=["event_id"])
    modified = base.withColumn("value", F.col("value") + 1)
    write_dataset(modified, path, mode="delta", delta_subset=["event_id"])
    assert read_dataset(spark, path).count() == 100


def test_partitioned_write_hive_layout(spark, events, tmpdir_path):
    path = os.path.join(tmpdir_path, "ds")
    write_dataset(events, path, mode="append", partition_by="event_type")
    subdirs = {d for d in os.listdir(path) if not d.startswith(("_", "."))}
    assert all(d.startswith("event_type=") for d in subdirs)
    back = read_dataset(spark, path)
    assert back.count() == events.count()
    # partition pruning: reading one partition touches only its dir
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == events.filter(F.col("event_type") == "click").count()


def test_time_interval_batched_write(spark, events, tmpdir_path):
    """W7: '1w' interval batching produces the same dataset as one write."""
    path = os.path.join(tmpdir_path, "ds")
    write_dataset(
        events, path, mode="append", batch_size="1w", datetime_column="ts"
    )
    assert read_dataset(spark, path).count() == events.count()


def test_transform_hook(spark, events, tmpdir_path):
    """U1/W8: per-write transform_func."""
    path = os.path.join(tmpdir_path, "ds")
    write_dataset(
        events,
        path,
        mode="append",
        transform_func=lambda df, factor: df.withColumn(
            "value", F.col("value") * factor
        ),
        transform_func_kwargs={"factor": 2.0},
    )
    got = read_dataset(spark, path).agg(F.sum("value")).first()[0]
    want = events.agg(F.sum("value") * 2).first()[0]
    assert abs(got - want) < 1e-6 * abs(want)


def test_max_records_per_file(spark, events, tmpdir_path):
    path = os.path.join(tmpdir_path, "ds")
    write_dataset(events.coalesce(1), path, mode="append", max_records_per_file=100)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= events.count() // 100


def test_table_chain_write_dataset(spark, tmpdir_path):
    import os

    from pydatalake_spark.dataset.table import DataLakeTable

    src = os.path.join("/root/testdata/sf0.001", "nation.parquet")
    dest = os.path.join(tmpdir_path, "nation_chain")
    t = DataLakeTable(spark, src, name="nation_chain")
    t.drop("n_comment").sort("n_name").write_dataset(
        dest, mode="overwrite", partition_by="n_regionkey"
    )
    back = spark.read.parquet(dest)
    assert back.count() == 25
    assert "n_comment" not in back.columns
    assert "n_regionkey" in back.columns


def test_feather_write_roundtrip(spark, tmpdir_path):
    import os

    from pydatalake_spark.dataset.writer import write_dataset
    from pydatalake_spark.sources.read import read_feather

    dest = os.path.join(tmpdir_path, "region.feather")
    src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    write_dataset(src, dest, mode="overwrite", fmt="feather")
    back = read_feather(spark, dest)
    assert back.count() == 5
    # append concatenates
    write_dataset(src, dest, mode="append", fmt="feather")
    assert read_feather(spark, dest).count() == 10


def test_feather_partitioned_write_roundtrip(spark, tmpdir_path):
    from pydatalake_spark.dataset.writer import write_dataset
    from pydatalake_spark.sources.read import read_feather

    dest = os.path.join(tmpdir_path, "nation_feather")
    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    write_dataset(
        src, dest, mode="overwrite", fmt="feather", partition_by="n_regionkey"
    )
    # hive layout on disk: one key=value dir per region
    dirs = sorted(d for d in os.listdir(dest) if d.startswith("n_regionkey="))
    assert len(dirs) == 5
    back = read_feather(spark, dest)
    assert back.count() == 25
    # partition column restored from directory names with inferred int type
    assert "n_regionkey" in back.columns
    orig = {tuple(r) for r in src.select("n_nationkey", "n_regionkey").collect()}
    got = {tuple(r) for r in back.select("n_nationkey", "n_regionkey").collect()}
    assert got == orig


def test_operators_on_empty_input(spark):
    """Core operators must not blow up on empty inputs (the first batch of
    a new pipeline is often empty)."""
    from pydatalake_spark.operators.dedup import distinct_table, is_unique
    from pydatalake_spark.operators.diff import tables_diff
    from pydatalake_spark.operators.minhash import near_dup_pairs
    from pydatalake_spark.operators.simhash import simhash_table

    empty_kv = spark.createDataFrame([], schema="k long, v string, ts timestamp")
    empty_doc = spark.createDataFrame([], schema="doc_id long, text string")

    assert distinct_table(empty_kv, subset=["k"], presort_by="ts").count() == 0
    assert tables_diff(empty_kv, empty_kv).count() == 0
    assert is_unique(empty_kv)
    assert simhash_table(empty_doc).count() == 0
    assert near_dup_pairs(empty_doc).count() == 0


def test_sort_global_cross_file_total_order(spark, tmpdir_path):
    """sort_global=True must reproduce the reference's global pre-write
    sort (writer.py:448): every file's key range is disjoint from and
    ordered against every other file's. The default sortWithinPartitions
    only guarantees per-file clustering."""
    import os

    from pyspark.sql import functions as F

    from pydatalake_spark.dataset.writer import write_dataset

    # shuffle keys across many partitions so per-partition sort alone
    # cannot produce a total order
    df = (
        spark.range(0, 2000)
        .withColumn("k", (F.col("id") * 7919) % 2000)
        .repartition(8)
        .select("k", F.col("id").alias("payload"))
    )
    dest = os.path.join(str(tmpdir_path), "sorted_global")
    # max_records_per_file splits each (globally sorted) task's output
    # sequentially, so multiple files exist to prove cross-file order
    write_dataset(
        df,
        dest,
        mode="overwrite",
        sort_by="k",
        sort_global=True,
        max_records_per_file=300,
    )

    files = sorted(
        os.path.join(dest, f)
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    )
    assert len(files) > 1, "need multiple files to prove cross-file order"
    ranges = []
    for path in files:
        rows = spark.read.parquet(path).select("k").collect()
        ks = [r.k for r in rows]
        assert ks == sorted(ks)  # within-file order
        if ks:
            ranges.append((min(ks), max(ks)))
    # disjoint, orderable file ranges == global total order
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b


def test_directory_flavor_partition_write(spark, events, tmpdir_path):
    """W2/W4 directory flavor (reference writer.py:126-147): bare value
    dirs instead of key=value, two partition levels, appendable, and
    readable back through the directory-partition reader."""
    from pydatalake_spark.sources.read import read_directory_partitioned

    path = os.path.join(tmpdir_path, "dirds")
    d = events.withColumn("half", (F.col("event_id") % 2).cast("int"))
    write_dataset(
        d, path, mode="append", partition_by=["event_type", "half"],
        partition_flavor="directory",
    )
    top = {n for n in os.listdir(path) if not n.startswith(("_", "."))}
    assert top and all("=" not in n for n in top)  # bare values
    sub = {
        n
        for t in top
        for n in os.listdir(os.path.join(path, t))
        if not n.startswith(("_", "."))
    }
    assert sub and all("=" not in n for n in sub)

    back = read_directory_partitioned(
        spark, path, [("event_type", "string"), ("half", "int")]
    )
    assert back.count() == d.count()
    want = {
        (r.event_type, r.half): r.n
        for r in d.groupBy("event_type", "half").agg(F.count("*").alias("n")).collect()
    }
    got = {
        (r.event_type, r.half): r.n
        for r in back.groupBy("event_type", "half").agg(F.count("*").alias("n")).collect()
    }
    assert got == want

    # append merges new hive dirs into the existing bare layout
    write_dataset(
        d.limit(50), path, mode="append",
        partition_by=["event_type", "half"], partition_flavor="directory",
    )
    top2 = {n for n in os.listdir(path) if not n.startswith(("_", "."))}
    assert all("=" not in n for n in top2)
    back2 = read_directory_partitioned(
        spark, path, [("event_type", "string"), ("half", "int")]
    )
    assert back2.count() == d.count() + 50

    # unsupported combinations refuse clearly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="directory"):
        write_dataset(
            d, path + "2", mode="delta", partition_by="event_type",
            partition_flavor="directory", datetime_column="ts",
        )
    with _pytest.raises(ValueError, match="partition_by"):
        write_dataset(d, path + "3", partition_flavor="directory")


def test_directory_flavor_overwrite_under_dynamic_conf(spark, events, tmpdir_path):
    """A session-level partitionOverwriteMode=dynamic must not break the
    strip pass's whole-path-replaced assumption: the write pins static
    per-writer, so overwrite fully replaces stale bare-value dirs instead
    of silently merging new files into them."""
    from pydatalake_spark.sources.read import read_directory_partitioned

    base = os.path.join(tmpdir_path, "dyn_ow")
    d = events.limit(100).withColumn("half", (F.col("event_id") % 2).cast("int"))
    write_dataset(
        d, base, mode="overwrite", partition_by="half",
        partition_flavor="directory",
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        only_zero = d.filter(F.col("half") == 0)
        write_dataset(
            only_zero, base, mode="overwrite", partition_by="half",
            partition_flavor="directory",
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # the half=1 bare dir must be GONE, not retained with stale rows
    assert sorted(
        n for n in os.listdir(base)
        if os.path.isdir(os.path.join(base, n)) and not n.startswith(("_", "."))
    ) == ["0"]
    back = read_directory_partitioned(spark, base, [("half", "int")])
    assert back.count() == only_zero.count()


def test_directory_flavor_null_partition_refused(spark, events, tmpdir_path):
    """Null partition values cannot be represented in the bare-value
    layout (the stripped dir would be '_'-prefixed and hidden): the write
    raises with guidance and leaves a readable HIVE layout."""
    base = os.path.join(tmpdir_path, "null_part")
    d = events.limit(20).withColumn(
        "half",
        F.when(F.col("event_id") % 2 == 0, F.lit(None)).otherwise(F.lit(1)).cast("int"),
    )
    with pytest.raises(ValueError, match="null"):
        write_dataset(
            d, base, mode="overwrite", partition_by="half",
            partition_flavor="directory",
        )
    # nothing half-stripped: the hive layout is intact and readable
    back = spark.read.parquet(base)
    assert back.count() == 20


def _hadoop_strip_fixture(spark, events, tmpdir_path, name):
    """Write a two-level hive layout and return (path, expected counts)."""
    path = os.path.join(tmpdir_path, name)
    d = events.limit(200).withColumn(
        "half", (F.col("event_id") % 2).cast("int")
    )
    d.write.partitionBy("event_type", "half").parquet(path)
    want = {
        (r.event_type, r.half): r.n
        for r in d.groupBy("event_type", "half")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return path, want


def _assert_bare_layout(spark, path, want):
    from pydatalake_spark.sources.read import read_directory_partitioned

    top = {n for n in os.listdir(path) if not n.startswith(("_", "."))}
    assert top and all("=" not in n for n in top), top
    sub = {
        n
        for t in top
        for n in os.listdir(os.path.join(path, t))
        if not n.startswith(("_", "."))
    }
    assert sub and all("=" not in n for n in sub), sub
    back = read_directory_partitioned(
        spark, path, [("event_type", "string"), ("half", "int")]
    )
    got = {
        (r.event_type, r.half): r.n
        for r in back.groupBy("event_type", "half")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_strip_hive_prefixes_hadoop_filesystem(spark, events, tmpdir_path):
    """r9 VERDICT item 7: the remote-scheme strip pass goes through the
    Hadoop FileSystem connector (exercised here on file:// — the same
    listStatus/rename/delete API s3a/gs/abfs connectors implement), not
    os calls, so a directory-flavor write to an object store strips
    instead of silently staying hive."""
    from pydatalake_spark.dataset.writer import _strip_hive_prefixes

    path, want = _hadoop_strip_fixture(spark, events, tmpdir_path, "hfs")
    # file:// URI routes into _strip_hive_prefixes_hadoop (non-"file:"
    # schemes share the branch; file:// is the one testable offline)
    import pydatalake_spark.dataset.writer as W

    W._strip_hive_prefixes_hadoop(
        spark, "file://" + path, ["event_type", "half"]
    )
    _assert_bare_layout(spark, path, want)


def test_strip_hadoop_copy_delete_fallback(spark, events, tmpdir_path, monkeypatch):
    """A store whose rename REFUSES (mocked non-renameable fs) must still
    strip via the FileUtil.copy + delete fallback — same final layout,
    no silent hive leftovers."""
    import pydatalake_spark.dataset.writer as W

    path, want = _hadoop_strip_fixture(spark, events, tmpdir_path, "norename")
    monkeypatch.setattr(W, "_fs_rename", lambda fs, src, dst: False)
    W._strip_hive_prefixes_hadoop(
        spark, "file://" + path, ["event_type", "half"]
    )
    _assert_bare_layout(spark, path, want)


def test_strip_hadoop_merge_append(spark, events, tmpdir_path):
    """Appending fresh hive dirs beside existing bare dirs merges them
    on the Hadoop path, mirroring the os-walk merge semantics."""
    import pydatalake_spark.dataset.writer as W

    path, want = _hadoop_strip_fixture(spark, events, tmpdir_path, "hmerge")
    W._strip_hive_prefixes_hadoop(
        spark, "file://" + path, ["event_type", "half"]
    )
    # second write lands hive dirs beside the bare ones
    d2 = events.limit(50).withColumn(
        "half", (F.col("event_id") % 2).cast("int")
    )
    d2.write.mode("append").partitionBy("event_type", "half").parquet(path)
    W._strip_hive_prefixes_hadoop(
        spark, "file://" + path, ["event_type", "half"]
    )
    add = {
        (r.event_type, r.half): r.n
        for r in d2.groupBy("event_type", "half")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    merged = {k: want.get(k, 0) + add.get(k, 0) for k in set(want) | set(add)}
    _assert_bare_layout(spark, path, merged)


def test_strip_hadoop_null_partition_refused(spark, events, tmpdir_path):
    """The Hadoop strip path refuses __HIVE_DEFAULT_PARTITION__ dirs
    before any mutation, like the local walk."""
    import pydatalake_spark.dataset.writer as W

    path = os.path.join(tmpdir_path, "hnull")
    d = events.limit(20).withColumn(
        "half",
        F.when(F.col("event_id") % 2 == 0, F.lit(None))
        .otherwise(F.lit(1))
        .cast("int"),
    )
    d.write.partitionBy("half").parquet(path)
    with pytest.raises(ValueError, match="null"):
        W._strip_hive_prefixes_hadoop(spark, "file://" + path, ["half"])
    # untouched: hive layout still readable
    assert spark.read.parquet(path).count() == 20


def test_strip_hadoop_merge_recurses_into_dirty_hive_child(
    spark, events, tmpdir_path
):
    """r10 ADVICE (writer.py merge branch): a hive child whose bare twin
    already contains the SAME hive child (a partially-stripped prior
    state) must merge RECURSIVELY — several connectors treat rename onto
    an existing directory as "move src UNDER dst", which would nest
    value/key=value/... with no error. Constructed here by stripping only
    the top level, appending, then running the full strip."""
    import pydatalake_spark.dataset.writer as W

    path = os.path.join(tmpdir_path, "hdirty")
    d1 = events.limit(40).withColumn("half", F.lit(0).cast("int"))
    d1.write.partitionBy("event_type", "half").parquet(path)
    # fake the dirty state: top level stripped, half= children still hive
    W._strip_hive_prefixes_hadoop(spark, "file://" + path, ["event_type"])
    d2 = events.limit(10).withColumn("half", F.lit(0).cast("int"))
    d2.write.mode("append").partitionBy("event_type", "half").parquet(path)
    W._strip_hive_prefixes_hadoop(
        spark, "file://" + path, ["event_type", "half"]
    )
    # no nested half=0/ anywhere below the second level
    for root, dirs, _files in os.walk(path):
        rel_depth = os.path.relpath(root, path).count(os.sep)
        for n in dirs:
            assert "=" not in n, (root, n)
            assert rel_depth <= 1, (root, n)
    want = {
        (r.event_type, r.half): r.n
        for r in d1.unionByName(d2)
        .groupBy("event_type", "half")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    _assert_bare_layout(spark, path, want)


def test_strip_hadoop_merge_file_collision_refuses(
    spark, events, tmpdir_path
):
    """A FILE already present in the bare twin under the same name is a
    real collision (file names are unique per write): the merge must
    refuse loudly instead of silently replacing data (r10 ADVICE —
    overwrite=false in the copy fallback, exists-check before rename)."""
    import pydatalake_spark.dataset.writer as W

    path = os.path.join(tmpdir_path, "hcollide")
    d = events.limit(20).withColumn("half", F.lit(0).cast("int"))
    d.write.partitionBy("half").parquet(path)
    os.makedirs(os.path.join(path, "0"), exist_ok=True)
    fname = next(
        n for n in os.listdir(os.path.join(path, "half=0"))
        if n.endswith(".parquet")
    )
    with open(os.path.join(path, "0", fname), "w") as f:
        f.write("existing")
    with pytest.raises(OSError, match="refusing"):
        W._strip_hive_prefixes_hadoop(spark, "file://" + path, ["half"])
    # the colliding file survives untouched
    with open(os.path.join(path, "0", fname)) as f:
        assert f.read() == "existing"


def test_strip_local_merge_recurses_and_refuses(spark, events, tmpdir_path):
    """The local os-walk twin gets the same semantics (_merge_local_dir):
    directory twins merge recursively (shutil.move would nest src UNDER
    an existing dst), file collisions refuse."""
    from pydatalake_spark.dataset.writer import (
        _merge_local_dir,
        _strip_hive_prefixes,
    )

    path = os.path.join(tmpdir_path, "ldirty")
    d1 = events.limit(40).withColumn("half", F.lit(0).cast("int"))
    d1.write.partitionBy("event_type", "half").parquet(path)
    _strip_hive_prefixes(path, ["event_type"])
    d2 = events.limit(10).withColumn("half", F.lit(0).cast("int"))
    d2.write.mode("append").partitionBy("event_type", "half").parquet(path)
    _strip_hive_prefixes(path, ["event_type", "half"])
    for root, dirs, _files in os.walk(path):
        rel_depth = os.path.relpath(root, path).count(os.sep)
        for n in dirs:
            assert "=" not in n, (root, n)
            assert rel_depth <= 1, (root, n)
    # file collision refuses
    a = os.path.join(tmpdir_path, "lc_a")
    b = os.path.join(tmpdir_path, "lc_b")
    os.makedirs(a)
    os.makedirs(b)
    for dd in (a, b):
        with open(os.path.join(dd, "same.parquet"), "w") as f:
            f.write(dd)
    with pytest.raises(OSError, match="refusing"):
        _merge_local_dir(a, b)


def test_strip_marker_guards_mid_transition_reads(spark, events, tmpdir_path):
    """r10 VERDICT item 7 (decision: loud window, not manifest swap): a
    crashed strip leaves _STRIP_IN_PROGRESS at the root and
    read_directory_partitioned refuses with a retryable error instead of
    returning a silently mixed both-layouts view; a successful strip
    removes the marker; the next write's strip clears a stale tombstone."""
    import pydatalake_spark.dataset.writer as W
    from pydatalake_spark.dataset.writer import _strip_hive_prefixes
    from pydatalake_spark.sources.read import read_directory_partitioned

    path = os.path.join(tmpdir_path, "marker")
    d = events.limit(20).withColumn("half", F.lit(0).cast("int"))
    d.write.partitionBy("half").parquet(path)

    # successful strip: marker gone, reads work
    _strip_hive_prefixes(path, ["half"])
    assert not os.path.exists(os.path.join(path, W.STRIP_MARKER))
    got = read_directory_partitioned(spark, path, [("half", "int")])
    assert got.count() == 20

    # simulate a crashed strip: tombstone present -> reader refuses
    with open(os.path.join(path, W.STRIP_MARKER), "w") as f:
        f.write("crashed")
    with pytest.raises(RuntimeError, match="_STRIP_IN_PROGRESS"):
        read_directory_partitioned(spark, path, [("half", "int")])

    # a repair write's strip pass clears the tombstone
    d.write.mode("append").partitionBy("half").parquet(path)
    _strip_hive_prefixes(path, ["half"])
    assert not os.path.exists(os.path.join(path, W.STRIP_MARKER))
    assert read_directory_partitioned(
        spark, path, [("half", "int")]
    ).count() == 40

    # the Hadoop twin manages the same marker (file:// routes through it)
    hpath = os.path.join(tmpdir_path, "marker_h")
    d.write.partitionBy("half").parquet(hpath)
    W._strip_hive_prefixes_hadoop(spark, "file://" + hpath, ["half"])
    assert not os.path.exists(os.path.join(hpath, W.STRIP_MARKER))
