"""Structured Streaming ingestion (SURVEY §2.10 idiomatic upgrade)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pydatalake_spark.streaming.ingest import stream_ingest, stream_time_bucket


@pytest.fixture()
def src(spark, events, tmpdir_path):
    d = os.path.join(tmpdir_path, "src")
    events.limit(200).write.parquet(d)
    schema = spark.read.parquet(d).schema
    return d, schema


def test_stream_ingest_exactly_once(spark, events, src, tmpdir_path):
    src_dir, schema = src
    dest = os.path.join(tmpdir_path, "dest")
    stream_ingest(spark, src_dir, dest, schema)
    n1 = spark.read.parquet(dest).count()
    assert n1 == 200

    # re-run with no new files: checkpoint prevents re-ingestion
    stream_ingest(spark, src_dir, dest, schema)
    assert spark.read.parquet(dest).count() == n1

    # land a new file -> only it is ingested
    events.limit(250).exceptAll(events.limit(200)).write.mode("append").parquet(src_dir)
    stream_ingest(spark, src_dir, dest, schema)
    assert spark.read.parquet(dest).count() == 250


def test_stream_dedup(spark, events, tmpdir_path):
    src_dir = os.path.join(tmpdir_path, "src2")
    dup = events.limit(50).unionByName(events.limit(50))
    dup.write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    dest = os.path.join(tmpdir_path, "dest2")
    stream_ingest(
        spark, src_dir, dest, schema,
        dedup_keys=["event_id"], watermark=("ts", "1 hour"),
    )
    assert spark.read.parquet(dest).count() == 50


def test_stream_time_bucket_matches_batch(spark, events, src):
    src_dir, schema = src
    out = stream_time_bucket(
        spark, src_dir, schema, window="1 hour", group_cols=["event_type"],
        query_name="tb_test",
    )
    batch = (
        spark.read.parquet(src_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    got = {(r["bucket"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
           for r in out.collect()}
    want = {(r["bucket"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
            for r in batch.collect()}
    assert got == want


def test_stateful_sessionize_stream(spark, events, tmpdir_path):
    """applyInPandasWithState session windows: every emitted session must
    match the batch-computed gap-sessionization, and every session that
    provably closed (successor gap or watermark timeout) must be emitted."""
    import pandas as pd

    from pydatalake_spark.streaming.stateful import sessionize_stream

    gap_s = 300
    src_dir = os.path.join(tmpdir_path, "sess_src")
    data = events.select("user_id", "ts", "value").limit(500)
    data.write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = spark.readStream.format("parquet").schema(schema).load(src_dir)
    out = sessionize_stream(stream, gap_s=gap_s, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }

    # batch expectation: same gap logic in pandas
    pdf = data.toPandas().sort_values(["user_id", "ts"])
    expected = {}
    for uid, g in pdf.groupby("user_id"):
        start = end = None
        n, total = 0, 0.0
        for ts, v in zip(g["ts"], g["value"]):
            v = 0.0 if pd.isna(v) else float(v)
            if start is None:
                start, end, n, total = ts, ts, 1, v
            elif (ts - end).total_seconds() <= gap_s:
                end, n, total = max(end, ts), n + 1, total + v
            else:
                expected[(uid, start, end)] = (n, round(total, 6))
                start, end, n, total = ts, ts, 1, v
        if start is not None:
            expected[(uid, start, end)] = (n, round(total, 6))

    # every emitted session is a true session
    for k, v in got.items():
        assert expected.get(k) == v, f"spurious/mismatched session {k}"
    # every session closed well before the watermark must have been emitted
    max_ts = pdf["ts"].max()
    wm = max_ts - pd.Timedelta(minutes=10)
    for (uid, start, end), v in expected.items():
        if pd.Timestamp(end) + pd.Timedelta(seconds=gap_s) < wm:
            assert (uid, start, end) in got, f"missing closed session {uid} {start}"


def test_stream_sliding_window(spark, events, tmpdir_path):
    """Sliding windows (10 min window, 5 min slide): each event lands in
    two buckets; stream result must match the batch window aggregation."""
    src_dir = os.path.join(tmpdir_path, "slide_src")
    events.limit(300).select("ts", "value").write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = spark.readStream.format("parquet").schema(schema).load(src_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.w.start, r.w.end): r.n
        for r in spark.sql("SELECT * FROM slide_test").collect()
    }
    want = {
        (r.w.start, r.w.end): r.n
        for r in spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) == 2 * 300  # every event in exactly 2 windows


def test_stream_ingest_rejects_corpus_near_dups(spark, tmpdir_path):
    """Micro-batches are near-dup-checked against the live corpus: a doc
    nearly identical to an existing corpus doc is rejected, novel docs
    land; a second batch is checked against the GROWN corpus."""
    import pandas as pd

    from pydatalake_spark.streaming.ingest import stream_ingest_dedup_corpus

    corpus_dir = os.path.join(tmpdir_path, "corpus")
    src_dir = os.path.join(tmpdir_path, "incoming")

    base = "the quick brown fox jumps over the lazy dog in the morning"
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [base]})
    ).write.parquet(corpus_dir)
    schema = spark.read.parquet(corpus_dir).schema

    batch1 = pd.DataFrame(
        {
            "doc_id": [10, 11],
            "text": [
                base.replace("morning", "evening"),  # near-dup of doc 1
                "completely novel content about catalyst plans and shuffles",
            ],
        }
    )
    spark.createDataFrame(batch1).write.mode("append").parquet(src_dir)
    stream_ingest_dedup_corpus(spark, src_dir, corpus_dir, schema)
    ids = {r.doc_id for r in spark.read.parquet(corpus_dir).collect()}
    assert ids == {1, 11}

    # batch 2: near-dup of the doc ingested in batch 1 -> rejected too
    batch2 = pd.DataFrame(
        {
            "doc_id": [20, 21],
            "text": [
                "completely novel content about catalyst plans and joins",
                "another fresh document mentioning parquet footers only",
            ],
        }
    )
    spark.createDataFrame(batch2).write.mode("append").parquet(src_dir)
    stream_ingest_dedup_corpus(spark, src_dir, corpus_dir, schema)
    ids = {r.doc_id for r in spark.read.parquet(corpus_dir).collect()}
    assert ids == {1, 11, 21}


def test_stream_stream_attribution_matches_batch(spark, events, tmpdir_path):
    """Watermarked stream-stream join (streaming/join.py): the in-flight
    view->click attribution must emit exactly the batch join's pairs."""
    from pydatalake_spark.streaming.join import stream_attribution

    ev = events.limit(2000).select("user_id", "ts", "event_type")
    vdir = os.path.join(tmpdir_path, "views_src")
    cdir = os.path.join(tmpdir_path, "clicks_src")
    ev.filter(F.col("event_type") == "view").write.parquet(vdir)
    ev.filter(F.col("event_type") == "click").write.parquet(cdir)
    schema = spark.read.parquet(vdir).schema

    vs = spark.readStream.schema(schema).parquet(vdir)
    cs = spark.readStream.schema(schema).parquet(cdir)
    q = (
        stream_attribution(vs, cs, window_minutes=5)
        .writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.view_ts, r.click_ts)
        for r in spark.sql("SELECT * FROM attr_test").collect()
    }

    # batch twin: same function over static frames (watermarks are no-ops)
    want_rows = stream_attribution(
        spark.read.parquet(vdir), spark.read.parquet(cdir), window_minutes=5
    ).collect()
    want = {(r.user_id, r.view_ts, r.click_ts) for r in want_rows}
    assert got == want and len(want) > 0
    # lag bounds respected
    assert all(0 <= r.lag_seconds < 300 for r in want_rows)


def test_stream_quality_screen_matches_batch(spark, tmpdir_path):
    """The streaming quality + bloom-decontamination gate keeps exactly
    the docs the equivalent batch expression keeps, and NEVER passes a
    doc sharing a 13-token window with the eval set (no false
    negatives by bloom construction)."""
    from pydatalake_spark.functions.text import STOPWORDS, shingles, tokenize
    from pydatalake_spark.operators.bloom import (
        bloom_hit_expr,
        build_literal_bloom,
    )
    from pydatalake_spark.streaming.ingest import stream_quality_screen

    eval_text = " ".join(f"e{i}" for i in range(20))
    good = "the of and to a " + " ".join(f"w{i}" for i in range(95))
    rows = [(i, good + f" tail{i}") for i in range(20)]
    rows.append((97, "x y"))                      # low quality: dropped
    rows.append((98, eval_text + " extra pad"))   # contaminated: dropped
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import os
    src_dir = os.path.join(str(tmpdir_path), "docs_src")
    docs.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    ev = spark.createDataFrame([(0, eval_text)], "eid long, text string")
    ev_hashes = ev.select(
        F.explode(
            F.transform(shingles(tokenize("text"), k=13), F.md5)
        ).alias("wh")
    )
    # auto-sized literal bloom (r5 ADVICE: the fixed default saturates)
    words, n_bits, n_hashes = build_literal_bloom(ev_hashes, key_col="wh")

    got = {
        r.doc_id
        for r in stream_quality_screen(
            spark, src_dir, schema, words, query_name="screen_t",
            bloom_bits=n_bits, bloom_hashes=n_hashes,
        ).collect()
    }

    # batch twin with the SAME literal bitmap
    b = spark.read.parquet(src_dir).select(
        "doc_id", "text", tokenize("text").alias("_toks")
    )
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tokens
    punct_ratio = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), "[.,!?;:]", ""))
    ) / F.nullif(F.length("text"), F.lit(0))
    quality = (
        stop_ratio * 0.3
        + (F.lit(1) - punct_ratio) * 0.2
        + F.least(n_tokens / F.lit(100), F.lit(1.0)) * 0.5
    )
    whs = F.transform(shingles(toks, k=13), F.md5)
    contaminated = F.exists(
        whs,
        lambda wh: bloom_hit_expr(
            wh, words, num_bits=n_bits, num_hashes=n_hashes
        ),
    )
    expected = {
        r.doc_id
        for r in b.filter((quality >= 0.45) & ~contaminated).collect()
    }
    assert got == expected
    assert 97 not in got and 98 not in got
    assert len(got) > 0


def test_stream_decontaminate_foreachbatch_matches_batch(spark, tmpdir_path):
    """The foreachBatch vector-tier decontamination gate keeps exactly
    the docs the batch membership screen keeps, never passes an
    eval-overlapping doc, and re-running after new files land ingests
    only the new files (checkpointed exactly-once)."""
    import os

    from pydatalake_spark.functions.text import shingles, tokenize
    from pydatalake_spark.operators.bloom import membership_screen
    from pydatalake_spark.streaming.ingest import (
        stream_decontaminate_foreachbatch,
    )

    eval_text = " ".join(f"ev{i}" for i in range(30))
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(15)]
    rows.append((90, eval_text + " trailing tokens here"))  # contaminated
    rows.append((91, "short doc"))                          # clean, short
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    src = os.path.join(str(tmpdir_path), "decon_src")
    dst = os.path.join(str(tmpdir_path), "decon_dst")
    ckpt = os.path.join(str(tmpdir_path), "decon_ckpt")
    docs.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    ev = spark.createDataFrame([(0, eval_text)], "eid long, text string")
    ev_hashes = ev.select(
        F.explode(
            F.transform(shingles(tokenize("text"), k=13), F.md5)
        ).alias("wh")
    )

    stream_decontaminate_foreachbatch(
        spark, src, dst, schema, ev_hashes, checkpoint_dir=ckpt
    )
    got = {r.doc_id for r in spark.read.parquet(dst).collect()}

    # batch twin: same screen via membership_screen over exploded windows
    whs = F.transform(shingles(tokenize("text"), k=13), F.md5)
    exploded = docs.select("doc_id", F.explode_outer(whs).alias("wh"))
    flagged = (
        membership_screen(exploded, ev_hashes, key_col="wh")
        .groupBy("doc_id")
        .agg(F.max(F.coalesce("bf_hit", F.lit(False))).alias("f"))
        .filter("f")
    )
    expected = {
        r.doc_id
        for r in docs.join(flagged, "doc_id", "left_anti").collect()
    }
    assert got == expected
    assert 90 not in got and len(got) >= 15

    # exactly-once: second drain with one new file ingests ONLY the new doc
    extra = spark.createDataFrame(
        [(200, "a brand new clean document " + " ".join(f"z{j}" for j in range(30)))],
        "doc_id long, text string",
    )
    extra.coalesce(1).write.mode("append").parquet(src)
    stream_decontaminate_foreachbatch(
        spark, src, dst, schema, ev_hashes, checkpoint_dir=ckpt
    )
    got2 = [r.doc_id for r in spark.read.parquet(dst).collect()]
    assert set(got2) == got | {200} and len(got2) == len(set(got2))

    # replay idempotency: a retried micro-batch re-runs the SAME write
    # with the SAME batch id — the dynamic partition overwrite must leave
    # zero duplicate rows (a blind append would double the batch)
    bids = {r._batch_id for r in spark.read.parquet(dst).select("_batch_id").collect()}
    last_bid = max(bids)
    (
        extra.withColumn("_batch_id", F.lit(int(last_bid)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(dst)
    )
    got3 = [r.doc_id for r in spark.read.parquet(dst).collect()]
    assert sorted(got3) == sorted(got2)


def test_stream_quality_screen_rejects_half_triple(spark, tmpdir_path):
    """ADVICE r6: bloom_bits without bloom_hashes (or vice versa) would
    probe positions the build never set — silent false negatives — so the
    gate refuses the half-specified sizing up front."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from pydatalake_spark.streaming.ingest import stream_quality_screen

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    with _pytest.raises(ValueError, match="together"):
        stream_quality_screen(
            spark, tmpdir_path, schema, {0: 1}, bloom_bits=1 << 18
        )
    with _pytest.raises(ValueError, match="together"):
        stream_quality_screen(
            spark, tmpdir_path, schema, {0: 1}, bloom_hashes=5
        )


def test_stream_delta_sink_exactly_once(spark, events, tmpdir_path):
    """Structured Streaming -> Delta table through delta_stream_sink
    (foreachBatch + txn watermark): the streamed table equals the batch
    write, and RE-RUNNING the stream from a FRESH checkpoint (Spark
    redelivers every batch with the same batchIds) appends nothing —
    the exactly-once watermark lives in the Delta log, not in the
    stream's checkpoint."""
    import shutil as _sh

    from pydatalake_spark.sources import delta as dl

    src_dir = os.path.join(tmpdir_path, "delta_src")
    data = events.select("user_id", "ts", "value").limit(400)
    data.write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    table = os.path.join(tmpdir_path, "delta_tbl")

    def run(ckpt):
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(src_dir)
        )
        q = (
            stream.writeStream.foreachBatch(
                dl.delta_stream_sink(table, app_id="evt_ingest")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(os.path.join(tmpdir_path, "ckpt1"))
    n_batch = data.count()
    assert dl.read_delta(spark, table).count() == n_batch
    v_after = dl.snapshot(table).version

    # fresh checkpoint -> full redelivery; txn watermark rejects it all
    run(os.path.join(tmpdir_path, "ckpt2"))
    assert dl.read_delta(spark, table).count() == n_batch
    assert dl.snapshot(table).version == v_after
    # values, not just counts
    a = sorted(
        (r.user_id, r.ts, r.value)
        for r in dl.read_delta(spark, table).collect()
    )
    b = sorted((r.user_id, r.ts, r.value) for r in data.collect())
    assert a == b


def test_pydelta_stream_source_exactly_once_across_restart(
    spark, tmpdir_path
):
    """spark.readStream.format('pydelta'): version-based offsets ride
    Spark's checkpoint, so a restarted stream serves ONLY commits after
    the last committed batch — end-to-end exactly-once with zero
    source-side state."""
    from pydatalake_spark.sources import delta as dl
    from pydatalake_spark.streaming.delta_source import register

    register(spark)
    table = os.path.join(tmpdir_path, "t")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    df = (
        spark.range(10)
        .withColumn("part", (F.col("id") % 2).cast("string"))
        .withColumn("v", F.col("id").cast("double"))
    )
    dl.write_delta(df, table, partition_by=["part"])
    dl.write_delta(df.withColumn("id", F.col("id") + 10), table, mode="append")

    got: list[tuple] = []

    def sink(b, i):
        got.append((i, sorted(r["id"] for r in b.select("id").collect())))

    q = (
        spark.readStream.format("pydelta")
        .option("path", table)
        .option("startingVersion", "0")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(x for _, ids in got for x in ids) == list(range(20))
    # partition column values came from the LOG, typed
    # (string cast of id % 2)
    dl.write_delta(df.withColumn("id", F.col("id") + 20), table, mode="append")
    got2: list[int] = []
    q2 = (
        spark.readStream.format("pydelta")
        .option("path", table)
        .load()
        .writeStream.foreachBatch(
            lambda b, i: got2.extend(r["id"] for r in b.select("id").collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(got2) == list(range(20, 30))


def test_pydelta_stream_source_refuses_rewrites(spark, tmpdir_path):
    """A commit that removes data with dataChange=true is not an append;
    the source raises rather than silently double-serving rows."""
    from pydatalake_spark.sources import delta as dl
    from pydatalake_spark.streaming.delta_source import register

    register(spark)
    table = os.path.join(tmpdir_path, "t")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    df = spark.range(5).withColumn("v", F.col("id").cast("double"))
    dl.write_delta(df, table)
    dl.write_delta(df, table, mode="overwrite")  # v1 rewrites
    q = (
        spark.readStream.format("pydelta")
        .option("path", table)
        .option("startingVersion", "1")
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="rewrites data|restart"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_pydelta_source_roundtrip_matches_batch_read(spark, tmpdir_path):
    """Full-stream content == read_delta snapshot (same rows, partition
    values typed from the log)."""
    from pydatalake_spark.sources import delta as dl
    from pydatalake_spark.streaming.delta_source import register

    register(spark)
    table = os.path.join(tmpdir_path, "t")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    sink_dir = os.path.join(tmpdir_path, "out")
    df = (
        spark.range(100)
        .withColumn("part", (F.col("id") % 3).cast("string"))
        .withColumn("v", F.col("id").cast("double"))
    )
    dl.write_delta(df, table, partition_by=["part"])
    q = (
        spark.readStream.format("pydelta")
        .option("path", table)
        .option("startingVersion", "0")
        .load()
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    a = sorted(
        (r["id"], r["part"], r["v"])
        for r in spark.read.parquet(sink_dir).collect()
    )
    b = sorted(
        (r["id"], r["part"], r["v"])
        for r in dl.read_delta(spark, table).collect()
    )
    assert a == b


def test_pydelta_stream_cdf_mode(spark, tmpdir_path):
    """readChangeFeed=true: the stream serves row-level changes — cdc
    files for mutation commits, add-derived inserts for appends — with
    _change_type/_commit_version columns, incrementally across
    restarts."""
    from pydatalake_spark.sources import delta as dl
    from pydatalake_spark.streaming.delta_source import register

    register(spark)
    table = os.path.join(tmpdir_path, "t")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    df = (
        spark.range(10)
        .withColumn("part", (F.col("id") % 2).cast("string"))
        .withColumn("v", F.col("id").cast("double"))
    )
    dl.write_delta(
        df,
        table,
        partition_by=["part"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    dl.update_rows_dv(spark, table, "id = 3", {"v": "33.0"})  # v1
    dl.delete_rows_dv(spark, table, "id = 4")  # v2

    got: list[tuple] = []

    def sink(b, i):
        got.extend(
            (r["_commit_version"], r["_change_type"], r["id"], r["v"])
            for r in b.collect()
        )

    q = (
        spark.readStream.format("pydelta")
        .option("path", table)
        .option("startingVersion", "1")
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [
        (1, "update_postimage", 3, 33.0),
        (1, "update_preimage", 3, 3.0),
        (2, "delete", 4, 4.0),
    ]
    # append lands as insert changes on restart
    dl.write_delta(
        df.withColumn("id", F.col("id") + 10), table, mode="append"
    )
    got2: list[tuple] = []
    q2 = (
        spark.readStream.format("pydelta")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(
            lambda b, i: got2.extend(
                (r["_change_type"], r["id"]) for r in b.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(got2) == [("insert", i) for i in range(10, 20)]
