"""Connected components over near-dup pairs → dedup cluster resolution.

Pair generators (minhash/simhash/ngram_jaccard/embedding near-dup) emit
EDGES; an actual deduplication must turn those into clusters and keep one
representative per cluster — near-duplicates chain (A~B, B~C but A!~C), so
pair-local "drop id_b" under-dedups exactly where boilerplate is worst.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round every node takes the min label over itself and its
neighbors; fixpoint = each component labeled with its minimum member id.
Per round: one join (labels onto symmetrized edges) + one min-aggregation
— two keyed shuffles, both algebraic with map-side partial agg. Rounds =
graph diameter; near-dup graphs are dense little cliques with tiny
diameters (2-4 rounds in practice). `localCheckpoint` truncates the plan
each round so lineage doesn't grow O(iterations) — the standard Spark
iterative-algorithm discipline (GraphX/GraphFrames do the same); for
adversarially long path-graphs the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce", SoCC'14) converges
in O(log n) rounds at the cost of two joins per round — diameter is the
knob to watch, not data volume.

Not expressible as one Catalyst plan (a fixpoint loop), but every step is
a plain DataFrame op, so it distributes like any join — no driver
materialization; convergence is detected with a count() on changed labels
(a scalar per round, not data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``; cluster_id
    is the component's minimum node id (deterministic, engine-portable).

    Raises after ``max_iter`` rounds without convergence — near-dup graphs
    converge in a handful; hitting the cap means the edge set is not the
    clique-soup this is meant for (see module docstring for the
    O(log n)-round alternative).
    """
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "cluster_id", F.col("node")
    )
    for _ in range(max_iter):
        # min over (own label, neighbors' labels)
        neighbor = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "cluster_id")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph diameter exceeds the near-dup assumption; use a "
        "large-star/small-star implementation for long-path graphs"
    )


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Keep one representative (minimum id) per near-dup cluster.

    Rows never mentioned in ``pairs`` pass through untouched; clustered
    rows survive only if they ARE their cluster's minimum. One broadcast-
    friendly join: the drop-list is (clustered nodes minus representatives),
    typically a small fraction of the corpus.
    """
    cc = connected_components(pairs, src_col, dst_col)
    drop = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")
