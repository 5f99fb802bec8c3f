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
    checkpoint_every: int = 8,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = min node id reachable through the pair graph.

    **Scale-adaptive execution** (the AQE-broadcast analogy): the edge
    relation is materialized (it is the near-dup pair list — tiny
    relative to the corpus by construction), counted, and

    * ≤ ``driver_threshold`` edges → **driver union-find**: one
      Arrow-batched ``toPandas`` of (id_a, id_b) + path-compressed
      union-find + one createDataFrame.  A label-propagation round is a
      full join+groupBy+agg job pipeline; on a thousand-edge graph that
      is pure scheduler overhead (measured 8 s for 245 pairs at sf0.1
      vs ~0.2 s here).  1M edges via Arrow ≈ 16 MB columnar on the
      driver (a ``collect()`` of Row objects would be ~20× that — don't
      regress it); the union-find dict adds O(|nodes|) small ints —
      same budget class as a broadcast table.
    * above it → the distributed min-label loop below, whose shuffles
      are what a billion-edge graph actually needs.

    Distributed path: terminates early at fixpoint.  Labels are
    monotonically non-increasing per node, so "no label changed" ⟺
    "sum(label) unchanged" — convergence is detected with one scalar
    aggregate over the already-persisted label relation, never a
    self-join.  Adding a self-loop per node folds the "keep my own
    label" leg into the same join+groupBy as the neighbor minimum, so
    each round is exactly ONE shuffle join + ONE min-groupBy + ONE
    scalar agg.

    Every ``checkpoint_every`` rounds the label relation is
    localCheckpoint-ed: the iterative plan otherwise grows one
    join+agg layer per round, and on long-diameter graphs (chains —
    where this loop runs tens of rounds) analysis cost and recovery
    lineage grow with it.  Checkpointing caps both at a constant."""
    spark = pairs.sparkSession
    edge_rel = pairs.select(id_a, id_b).persist()
    n_edges = edge_rel.count()
    if n_edges <= driver_threshold:
        node_type = edge_rel.schema[0].dataType.simpleString()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        pdf = edge_rel.toPandas()  # Arrow: columnar, no Row objects
        nodes = set()
        col_a, col_b = pdf.columns[0], pdf.columns[1]
        for a_, b_ in zip(pdf[col_a].tolist(), pdf[col_b].tolist()):
            nodes.add(a_)
            nodes.add(b_)
            ra, rb = find(a_), find(b_)
            if ra != rb:
                # union by min: smaller id becomes the root, so the
                # root IS the cluster id
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        edge_rel.unpersist()
        rows = [(n, find(n)) for n in sorted(nodes)]
        return spark.createDataFrame(
            rows, f"node {node_type}, cluster_id {node_type}"
        )
    # build from the already-persisted edge relation: the (potentially
    # very expensive) pairs plan — e.g. an n-gram Jaccard self-join —
    # was executed exactly once, into edge_rel
    undirected = (
        edge_rel.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(
            edge_rel.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .persist()
    )
    nodes = undirected.select(F.col("src").alias("node")).distinct()
    # self-loops: min over (self ∪ neighbors) becomes a single groupBy.
    # NO distinct on edges — min-label propagation is duplicate-edge
    # idempotent (min over a multiset), so deduping would only add a
    # shuffle to shrink a relation the groupBy collapses anyway.
    edges = undirected.union(
        nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    ).persist()
    labels = nodes.withColumn("label", F.col("node")).persist()
    # decimal(38,0) sum: overflow-proof at any node-id magnitude
    _lsum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = object()  # sentinel: round 1 always runs, no extra action

    for it in range(max_iter):
        new_labels = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("src", "node")
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.persist()
        new_sum = new_labels.agg(_lsum).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    out = labels.select("node", F.col("label").alias("cluster_id"))
    edges.unpersist()
    undirected.unpersist()
    edge_rel.unpersist()
    return out
