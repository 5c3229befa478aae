"""Behavioral invariants for the PII / repetition / Gopher / packing
screens (value parity vs DuckDB is covered by the oracle gate; these pin
the semantic properties the oracle hash can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_pii_redact_counts_and_scrub(spark):
    from pydatalake_spark.queries import QUERIES

    out = QUERIES["pii_redact"](spark, SF_DIR)
    rows = out.collect()
    assert rows, "empty result"
    for r in rows:
        # injection is derived from doc_id, so counts are predictable
        assert r.n_emails == r.doc_id % 3
        assert r.n_phones == r.doc_id % 2
        # nothing matching the PII patterns survives redaction
        assert "@mail.com" not in r.redacted
        assert "555-" not in r.redacted
        if r.doc_id % 3:
            assert "<EMAIL>" in r.redacted
        if r.doc_id % 2:
            assert "<PHONE>" in r.redacted


def test_repetition_stats_bounds(spark):
    from pydatalake_spark.queries import QUERIES

    out = QUERIES["doc_repetition_stats"](spark, SF_DIR)
    bad = out.filter(
        (F.col("dup_token_frac") < 0)
        | (F.col("dup_token_frac") >= 1)
        | (F.col("top_token_frac") * F.col("n_tokens") < 1)
        | (F.col("n_unique") > F.col("n_tokens"))
    ).count()
    assert bad == 0


def test_sequence_pack_layout(spark):
    """Within each source shard, docs in (doc_id) order tile the packs:
    offsets stay inside the budget and pack ids never decrease."""
    from pydatalake_spark.queries import QUERIES
    from pydatalake_spark.queries.text import _PACK_BUDGET

    out = QUERIES["sequence_pack"](spark, SF_DIR)
    assert (
        out.filter(
            (F.col("pack_offset") < 0) | (F.col("pack_offset") >= _PACK_BUDGET)
        ).count()
        == 0
    )
    rows = out.orderBy("source", "doc_id").collect()
    by_source: dict = {}
    for r in rows:
        prev = by_source.get(r.source)
        if prev is not None:
            assert r.pack_id >= prev.pack_id
            if r.pack_id == prev.pack_id:
                assert r.pack_offset == prev.pack_offset + prev.n_tokens
        by_source[r.source] = r


def test_gopher_flags_consistent(spark):
    from pydatalake_spark.queries import QUERIES

    out = QUERIES["gopher_quality_flags"](spark, SF_DIR)
    inconsistent = out.filter(
        F.col("passes")
        != (
            F.col("n_tokens").between(10, 100000)
            & (F.col("alpha_ratio") >= 0.8)
            & (F.col("stop_ratio") >= 0.02)
        )
    ).count()
    assert inconsistent == 0


def test_session_cache_rebuilds_on_corpus_rewrite(spark, tmp_path):
    """r10 VERDICT item 6: _session_cached re-checks a (count, mtime,
    size) stamp of the corpus dir on every hit — rewriting the corpus
    mid-session rebuilds instead of serving stale derivations (the old
    contract silently kept pair tables / screen verdicts for the old
    bytes)."""
    import os
    import time

    from pydatalake_spark.queries.text import _session_cached

    sf = str(tmp_path / "corpus")
    os.makedirs(sf)
    with open(os.path.join(sf, "documents.parquet"), "wb") as f:
        f.write(b"v1-bytes")

    cache: dict = {}
    builds = []

    def build():
        builds.append(1)
        return f"built-{len(builds)}"

    assert _session_cached(spark, cache, sf, build) == "built-1"
    assert _session_cached(spark, cache, sf, build) == "built-1"  # hit

    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    with open(os.path.join(sf, "documents.parquet"), "wb") as f:
        f.write(b"v2-bytes-longer")

    assert _session_cached(spark, cache, sf, build) == "built-2"
    assert _session_cached(spark, cache, sf, build) == "built-2"

    # unpersistable cached values get released on rebuild (best effort)
    class FakeDF:
        unpersisted = False

        def unpersist(self):
            FakeDF.unpersisted = True

    cache2: dict = {}
    _session_cached(spark, cache2, sf, lambda: FakeDF())
    with open(os.path.join(sf, "extra.parquet"), "wb") as f:
        f.write(b"x")
    _session_cached(spark, cache2, sf, lambda: FakeDF())
    assert FakeDF.unpersisted


def test_corpus_datacard_avg_quality_null_semantics(spark, tmp_path):
    """r13 ADVICE fix: avg_quality must be avg(q) over NON-NULL q only.
    q is null for empty-text (nullif(length,0)) and null-text docs; the
    r12 fused form divided Σq by the FULL doc count, silently counting
    those docs in the denominator. Pins parity against the DuckDB oracle
    on a corpus that contains exactly those docs (the sf fixtures have
    none, so the gate can't see this edge)."""
    import duckdb

    from pydatalake_spark.queries import QUERIES
    from pydatalake_spark.queries.text import ORACLE

    sf = str(tmp_path / "corpus")
    docs = spark.createDataFrame(
        [
            (1, "the and a spark join. stream of data", "en", "web", 36),
            (2, "", "en", "web", 0),          # empty text -> q null
            (3, None, "en", "web", None),     # null text  -> q null
            (4, "sur le pont d avignon on y danse", "fr", "web", 32),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import os

    os.makedirs(sf, exist_ok=True)
    docs.toPandas().to_parquet(os.path.join(sf, "documents.parquet"))

    out = QUERIES["corpus_datacard"](spark, sf).collect()
    assert len(out) == 1
    row = out[0]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    orow = con.execute(ORACLE["corpus_datacard"]).fetchall()[0]
    ocols = [d[0] for d in con.execute(ORACLE["corpus_datacard"]).description]
    oracle = dict(zip(ocols, orow))

    assert row.n_docs == oracle["n_docs"] == 4
    assert row.n_langs == oracle["n_langs"]
    assert row.top_lang == oracle["top_lang"]
    # the load-bearing check: null-q docs excluded from the denominator
    assert abs(row.avg_quality - oracle["avg_quality"]) < 1e-12
