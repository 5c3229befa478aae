"""Behavioral invariants for DSIR importance weighting (operators/dsir.py);
value parity vs DuckDB is covered by the oracle gate (dsir_importance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pydatalake_spark.operators.dsir import dsir_weights


def _corpus(spark):
    # target docs use one vocabulary, raw-only docs another
    rows = [
        (1, "aa bb cc aa bb cc aa bb", True),
        (2, "aa bb cc cc bb aa bb aa", True),
        (3, "xx yy zz xx yy zz xx yy", False),
        (4, "aa bb cc aa bb cc aa cc", False),  # raw doc, target-like text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def test_targetlike_docs_score_higher(spark):
    out = {
        r.doc_id: r.dsir_logratio
        for r in dsir_weights(_corpus(spark), target=F.col("is_t")).collect()
    }
    # doc 4 shares the target vocabulary -> scores like docs 1/2, far
    # above the out-of-domain doc 3
    assert out[4] > out[3]
    assert min(out[1], out[2]) > out[3]


def test_scores_are_length_normalized_and_finite(spark):
    out = dsir_weights(_corpus(spark), target=F.col("is_t"))
    rows = out.collect()
    assert all(r.n_tokens == 8 for r in rows)
    assert all(abs(r.dsir_logratio) < 10 for r in rows)


def test_num_buckets_validation(spark):
    import pytest

    from pydatalake_spark.operators.dsir import dsir_weights
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b", True)], "doc_id long, text string, t boolean")
    with pytest.raises(ValueError, match="power of 16"):
        dsir_weights(df, F.col("t"), num_buckets=1000)
