"""DSIR — data selection via importance resampling (hashed n-gram LM ratio).

The published recipe (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): score every raw document by the
log-likelihood ratio of a TARGET-domain hashed-n-gram language model vs the
RAW-corpus model, then sample proportionally to the ratio. The two "models"
are just smoothed bucket-count distributions, so the whole scorer is three
aggregations and a broadcast join — no ML runtime.

Implementation notes:

- the feature hash is the first two hex chars of md5(token) → 256 buckets.
  md5 is identical in Spark and DuckDB, which keeps the scorer
  oracle-checkable; widening to token bigrams or more hex chars is a
  parameter change, not a design change;
- bucket log-ratios use add-one smoothing over ``num_buckets``, so buckets
  unseen in the target contribute a finite negative score;
- per-doc score = MEAN token log-ratio (length-normalized, as in the
  paper's implementation) — documents of different lengths stay comparable.

Scale shape: the token explode feeds a 256-group aggregation (map-side
partial agg collapses each task to <=256 rows before the exchange); the
bucket table is O(num_buckets) and broadcasts back onto the token stream;
the only data-sized shuffle is the final groupBy(doc). Raw and target
bucket counts come from ONE pass over the token stream (conditional agg),
not two scans. The reference engine has no corpus-selection operator
(SURVEY.md §2 gap list); beyond-reference capability for the 100 TB
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydatalake_spark.functions.text import tokenize
from pydatalake_spark.operators.scaling import fan_out


def dsir_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 256,
) -> DataFrame:
    """(id, n_tokens, dsir_logratio): importance score per document.

    ``target`` is a boolean Column marking rows of the target domain
    (e.g. ``F.col("lang") == "en"``). ``exp(dsir_logratio * n_tokens)`` is
    the paper's unnormalized importance weight; the log-mean form returned
    here is the numerically safe quantity to threshold or sample on.
    """
    # bucket space = 16^hex_chars md5-prefix buckets; any power of 16 works
    hex_chars = {16: 1, 256: 2, 4096: 3, 65536: 4}.get(num_buckets)
    if hex_chars is None:
        raise ValueError(
            f"num_buckets must be a power of 16 (16, 256, 4096, 65536); "
            f"got {num_buckets}"
        )
    tok = fan_out(df).select(
        F.col(id_col),
        target.alias("_tgt"),
        F.explode(tokenize(text_col)).alias("tok"),
    )
    # Collapse the token stream to (doc, bucket, count) FIRST: the
    # groupBy's map-side partial agg caps each task's exchange output at
    # |docs_in_task| * num_buckets rows, and everything downstream (the
    # broadcast log-ratio join, the per-doc aggregate) runs at that
    # granularity instead of once per token — the token stream itself
    # never shuffles and is scanned exactly once.
    docb = (
        tok.select(
            F.col(id_col),
            "_tgt",
            F.substring(F.md5("tok"), 1, hex_chars).alias("b"),
        )
        .groupBy(id_col, "_tgt", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counts = docb.groupBy("b").agg(
        F.sum("c").alias("cr"),
        F.sum(F.when(F.col("_tgt"), F.col("c")).otherwise(0)).alias("ct"),
    )
    tot = counts.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    lr = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + 1) / (F.col("tt") + num_buckets))
            - F.log((F.col("cr") + 1) / (F.col("tr") + num_buckets))
        ).alias("lr"),
    )
    # mean token log-ratio == count-weighted mean over the doc's buckets
    return (
        docb.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            (F.sum(F.col("c") * F.col("lr")) / F.sum("c")).alias(
                "dsir_logratio"
            ),
        )
    )
