"""Connected components over near-duplicate candidate pairs.

Pairwise near-dup output (MinHash/LSH, SimHash, embedding-cosine) is not
yet a dedup decision: duplicates form CLUSTERS via transitivity (A~B,
B~C => {A,B,C} even when A,C never collide in a band).  This operator
turns the pair relation into per-node component labels with the classic
min-label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

iterated to fixpoint.  Each iteration is one shuffle keyed on node id
(edges join labels, then groupBy-min with map-side partial aggregation);
the iteration count is bounded by the cluster diameter, which for
dedup graphs is small (duplicate clusters are near-cliques — band
collisions connect most members directly).

Scale notes:
  * the edge relation is bounded by real duplication (it comes out of
    the banded equi-join, never all-pairs), so each iteration's join is
    |edges|-sized, not corpus-sized;
  * per-iteration results are cached and the previous iteration
    unpersisted — the driver loop would otherwise stack one join + agg
    per iteration into a single exponential lineage (use
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint=True`` on a
    real cluster for the same reason across executor failures);
  * convergence is detected with a 1-row aggregate per iteration
    (sum of labels, strictly decreasing until fixpoint — SURVEY S6
    scalar-read pattern), so the loop does at most ``diameter + 1``
    passes.

For graphs with adversarially long chains (path graphs), swap the plain
propagation for the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — same join
shape, provably O(log n) rounds; plain propagation is the right default
for dedup workloads and keeps the plan to one join per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component label is the minimum node id reachable from the node.

    ``edges`` is treated as undirected; self-loops and duplicate edges
    are tolerated (they do not change the fixpoint).
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = fwd.union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct().cache()

    # seed = min(self, neighbors): the first propagation step fused into
    # the init aggregate — star-shaped clusters (the common dedup case)
    # converge immediately, saving one full join round
    labels = (
        und.groupBy(F.col("u").alias("node"))
        .agg(F.min(F.least(F.col("u"), F.col("v"))).alias("component"))
        .cache()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]

    for _ in range(max_iter):
        # neighbor labels flow along edges; keep own label via union
        msgs = und.join(
            labels, und["v"] == labels["node"]
        ).select(F.col("u").alias("node"), "component")
        new_labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .cache()
        )
        new_sum = new_labels.agg(F.sum("component")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:  # min-propagation is monotone; fixpoint
            break
        prev_sum = new_sum
    und.unpersist()
    return labels


def duplicate_clusters(edges: DataFrame, src: str = "id_a",
                       dst: str = "id_b", max_iter: int = 25) -> DataFrame:
    """Cluster roll-up: (component, n_members, keeper_id, member_ids).

    ``keeper_id`` (the min member == the component label) is the row a
    keep-the-oldest dedup retains; everything else in ``member_ids`` is
    droppable.  ``member_ids`` is sorted for deterministic output.
    """
    comp = connected_components(edges, src=src, dst=dst, max_iter=max_iter)
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("node").alias("keeper_id"),
            F.array_sort(F.collect_list("node")).alias("member_ids"),
        )
    )
