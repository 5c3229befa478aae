"""Plan-quality regression tests: the properties that make these operators
scale are asserted on the PHYSICAL plan, not just the results.

- filters/projections reach the parquet scan (PushedFilters / ReadSchema);
- small dimensions broadcast (no sort-merge for filtered-dim joins);
- keyed dedup and as-of join cost exactly ONE shuffle;
- aggregations are partial (map-side combine) before their exchange.
"""

from __future__ import annotations

import re

import pytest

from pydatalake_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def physical_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    p = physical_plan(spark, "filter_project")
    # the filter list can be truncated/wrapped in toString — take the line
    pushed = re.search(r"PushedFilters: \[(.*)", p)
    assert pushed and "l_shipdate" in pushed.group(1) and "l_quantity" in pushed.group(1)
    schema = re.search(r"ReadSchema: struct<([^\n]*)", p)
    # scan reads only the 3 projected + 2 filter columns, not all 11
    assert schema and "l_returnflag" not in schema.group(1)
    assert "l_tax" not in schema.group(1)


def test_q3_broadcasts_dimensions(spark):
    p = physical_plan(spark, "q3_shipping_priority")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_dedup_single_shuffle(spark):
    p = physical_plan(spark, "dedup_keep_last")
    assert p.count("Exchange") == 1
    assert "Window" in p


def test_asof_single_shuffle(spark):
    p = physical_plan(spark, "asof_join_events")
    assert p.count("Exchange") == 1
    assert "Window" in p


def test_q1_partial_aggregation(spark):
    p = physical_plan(spark, "q1_pricing_summary")
    # two HashAggregates (partial + final) around exactly one exchange
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") == 1


def test_topk_no_global_sort(spark):
    p = physical_plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in p


def test_semi_join_is_join_not_aggregate(spark):
    p = physical_plan(spark, "semi_join")
    assert "LeftSemi" in p


def test_near_dup_joins_are_equi_joins(spark):
    """LSH/banded candidate generation must plan as hash equi-joins on the
    bucket key — a CartesianProduct or BroadcastNestedLoopJoin here would
    be the O(n^2) all-pairs scan the whole design exists to avoid."""
    from pydatalake_spark.operators.simhash import simhash_near_dup
    from pydatalake_spark.operators.similarity import embedding_near_dup
    from pydatalake_spark.operators.minhash import near_dup_pairs
    from pydatalake_spark.queries.tables import load_table

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    for df in (
        simhash_near_dup(docs),
        embedding_near_dup(emb),
        near_dup_pairs(docs),
    ):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_ivf_broadcasts_query_side(spark):
    """IVF probe join must broadcast the (small) query side, never shuffle
    the corpus by anything but its cell assignment."""
    from pydatalake_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )
    from pydatalake_spark.queries.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    cents = train_ivf_centroids(emb, num_cells=4)
    df = ivf_topk(emb, emb.filter(F.col("vec_id") < 3), cents, k=3, nprobe=2)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
