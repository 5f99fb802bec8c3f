"""Connected components over similarity pairs → duplicate CLUSTERS.

Near-dup detection emits pairs; the training-data decision ("keep one
doc per duplicate group") needs the transitive closure: if A~B and
B~C, all three are one cluster even when A~C was never scored.
Cluster id = the minimum member id (deterministic, join-free to
interpret).

Algorithm: iterative min-label propagation — every node adopts the
smallest label among itself and its neighbors until fixpoint.
Converges in O(graph diameter) rounds; duplicate clusters are
near-cliques (diameter ≤ ~3), so 5 rounds is generous.  Each round is
one shuffle join + one groupBy on the edge relation — no driver-side
graph, no GraphX dependency.  For web-scale general graphs (long
chains), swap the loop body for the large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce"), which is the
same join/groupBy primitive with O(log² n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = min node id reachable through the pair graph.

    Terminates early when a round changes no label (one lightweight
    count action per round — the driver only sees a scalar)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    edges = edges.persist()
    labels = labels.persist()
    labels.count()

    for _ in range(max_iter):
        # neighbor minimum: for each node, the smallest label among its
        # neighbors (one join keyed on the neighbor side + one groupBy)
        neigh_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh_min, labels.node == neigh_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    out = labels.select("node", F.col("label").alias("cluster_id"))
    edges.unpersist()
    return out
