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
chains) the default distributed path is the large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce and
Beyond"), the same join/groupBy primitives with O(log² n) rounds —
a 10⁶-node chain converges in ~10 alternations instead of 10⁶
label-propagation rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: diagnostics — alternation rounds the last ``_star_contraction`` ran
#: (including the final no-change round that proves the fixpoint).
#: Read by tests to pin the O(log² n) convergence contract.
LAST_STAR_ROUNDS: int = 0


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
    checkpoint_every: int = 8,
    driver_threshold: int = 1_000_000,
    algorithm: str = "star",
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
    * above it → a distributed algorithm chosen by ``algorithm``:
      ``"star"`` (default) is the large-star/small-star contraction —
      O(log² n) rounds on ANY graph shape, the right choice when the
      pair graph may contain long chains (transitive near-dup drift);
      ``"label"`` is min-label propagation — O(diameter) rounds, one
      fewer shuffle per round, fine for the near-clique clusters
      near-dup detection actually emits.

    Min-label path: terminates early at fixpoint.  Labels are
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
    if algorithm == "star":
        out = _star_contraction(edge_rel, id_a, id_b, max_iter=max_iter)
        edge_rel.unpersist()
        return out
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


def _star_contraction(
    edge_rel: DataFrame,
    id_a: str,
    id_b: str,
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm, reimplemented as DataFrame joins).

    Each round alternates two contractions over a canonically oriented
    edge set (hi > lo):

    * **large-star**: every node ``u`` attaches its strictly-LARGER
      neighbors to ``m(u) = min(Γ(u) ∪ {u})`` — expressed as one
      min-groupBy per node plus one join back to the neighbor list
      (NO ``collect_list``: a web-scale hub's neighborhood never has
      to fit in one task's memory).
    * **small-star**: every node attaches its ≤ neighbors (the ``lo``
      side of its canonical edges) plus itself to the minimum — one
      groupBy + join on the already-canonical relation.

    Both phases preserve connectivity and strictly reduce the
    potential function of the paper, giving O(log² n) rounds on any
    graph; a chain of 10⁶ nodes converges in ~10 alternations where
    min-label propagation needs 10⁶.  Per round: 2 min-groupBys,
    2 joins, 2 distincts — all hash-shuffles on node ids, no global
    sort, no driver state.  Fixpoint ⟺ the edge multiset stops
    changing, detected with one (count, sum-of-edge-hash) aggregate —
    edge hashes summed as decimal(38,0) so the check is collision- and
    overflow-safe in practice.

    Every round ends in an eager ``localCheckpoint`` — not an
    optimization but a requirement: one round's plan references the
    previous edge relation FOUR times (both union legs of the
    neighbor view, then the min-relation join back onto it), so an
    unbroken lineage grows ~4× per round and Catalyst analysis OOMs
    around round 6 regardless of data size.  Checkpointing resets the
    plan to a leaf, making round cost flat.

    Returns (node, cluster_id = component minimum) for every node in
    ``edge_rel``, including isolated nodes that only appear in
    self-pairs."""
    hi, lo = F.col("hi"), F.col("lo")
    # canonical orientation + eager checkpoint: the caller's pairs plan
    # (often an expensive similarity self-join) executes exactly once,
    # and the iteration below never re-reads it
    base = (
        edge_rel.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("hi"),
            F.least(F.col(id_a), F.col(id_b)).alias("lo"),
        )
        .localCheckpoint()
    )
    nodes = (
        base.select(hi.alias("node"))
        .union(base.select(lo.alias("node")))
        .distinct()
        .persist()
    )
    edges = base.where(hi != lo).distinct().persist()
    _checksum = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")).alias("h"),
    ]
    prev = object()
    for it in range(max_iter):
        # ---- large-star ----------------------------------------------
        nbrs = edges.select(hi.alias("u"), lo.alias("v")).union(
            edges.select(lo.alias("u"), hi.alias("v"))
        )
        mins = nbrs.groupBy("u").agg(
            F.min("v").alias("_mn")
        ).select("u", F.least("_mn", F.col("u")).alias("m"))
        # NO distinct here: small-star's min-groupBy is duplicate-
        # idempotent and the round ends in one distinct — an
        # intermediate dedup would only add a shuffle
        large = (
            nbrs.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .where(hi != lo)
        )
        # ---- small-star ----------------------------------------------
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        joined = large.join(smins, "hi")
        new_edges = (
            joined.where(lo != F.col("m"))
            .select(lo.alias("hi"), F.col("m").alias("lo"))
            .union(joined.select("hi", F.col("m").alias("lo")))
            .distinct()
        )
        new_edges = new_edges.localCheckpoint()
        cur = new_edges.agg(*_checksum).first()
        cur = (cur["n"], cur["h"])
        edges.unpersist()
        edges = new_edges
        global LAST_STAR_ROUNDS
        LAST_STAR_ROUNDS = it + 1
        if cur == prev:
            break
        prev = cur
    # at fixpoint every component is a star rooted at its minimum:
    # edges are exactly (member, root).  Roots and isolated nodes carry
    # their own id.
    stars = edges.select(hi.alias("node"), lo.alias("cluster_id"))
    out = (
        nodes.join(stars, "node", "left")
        .select(
            "node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id")
        )
    )
    # one materialization so persisted inputs can be dropped eagerly
    out = out.localCheckpoint()
    nodes.unpersist()
    edges.unpersist()
    return out
