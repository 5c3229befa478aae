"""PageRank canonical selection (operators/cluster.py:pagerank) vs a
pure-Python power-iteration reference."""

from __future__ import annotations

from pydatalake_spark.operators.cluster import canonical_by_rank, pagerank

EDGES = [(1, 2), (2, 3), (2, 4), (5, 6)]  # star at 2; separate pair 5-6


def _ref_pagerank(edges, damping=0.85, iters=10):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    ranks = {v: 1.0 / n for v in adj}
    for _ in range(iters):
        new = {}
        for v in adj:
            s = sum(ranks[u] / len(adj[u]) for u in adj[v])
            new[v] = (1 - damping) / n + damping * s
        ranks = new
    return ranks


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "id_a long, id_b long")


def test_pagerank_matches_reference(spark):
    got = {r.node: r.rank for r in pagerank(_edges_df(spark)).collect()}
    want = _ref_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    # the hub out-ranks its spokes
    assert got[2] > got[1] and got[2] > got[3]


def test_canonical_by_rank_keeps_hub(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    kept = {
        r.doc_id
        for r in canonical_by_rank(docs, _edges_df(spark)).collect()
    }
    # cluster {1,2,3,4} keeps the hub 2, not min-id 1; {5,6} keeps one of
    # the tied pair by min id; 7 has no edges and survives
    assert 2 in kept and 1 not in kept and 3 not in kept and 4 not in kept
    assert 5 in kept and 6 not in kept
    assert 7 in kept


def test_label_propagation_matches_python_and_splits_bridges(spark):
    """3-round synchronous LPA == pure-Python reference; two 4-cliques
    joined by ONE bridge edge stay separate communities (where CC fuses
    them into a single cluster)."""
    from collections import Counter

    from pydatalake_spark.operators.cluster import (
        connected_components,
        label_propagation,
    )

    cl1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = cl1 + cl2 + [(3, 10)]  # bridge
    df = spark.createDataFrame(edges, "id_a long, id_b long")

    got = {
        r.node: r.community
        for r in label_propagation(df, num_iters=3).collect()
    }

    # pure-Python synchronous LPA, same tie rule
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for n in nbrs:
            c = Counter(lab[m] for m in nbrs[n])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    assert got == lab

    # bridge separation: the two cliques carry different communities
    comm1 = {got[n] for n in range(4)}
    comm2 = {got[n] for n in range(10, 14)}
    assert comm1.isdisjoint(comm2)
    # ...while CC sees one component
    cc = {
        r.cluster_id
        for r in connected_components(df).collect()
    }
    assert len(cc) == 1
