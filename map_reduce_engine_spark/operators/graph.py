"""Iterative graph operators: connected components for dedup clustering.

Near-dup detection yields PAIRS (MinHash/SimHash candidates, exact-dup
pairs); deduplication needs CLUSTERS — the transitive closure of those
pairs, so each group keeps one canonical survivor. Transitive closure is
inherently iterative (no single-statement SQL form); this is the classic
small-label-propagation algorithm, the Pregel pattern expressed in
DataFrame joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each iteration is one join + one aggregate
(two shuffles); iteration count is bounded by the component diameter —
for dedup graphs (near-cliques) typically 2-3 passes. The driver-side
loop holds only a changed-row COUNT per iteration (no data collects),
and intermediate labels are cached/unpersisted per round — the standard
Spark shape for iterative algorithms at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) — component = smallest node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from it are
    (by definition) their own singleton components and simply don't appear.
    """
    # undirected: materialize both directions once
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = fwd.union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels.cache()
    labels.count()  # materialize

    for _ in range(max_iter):
        # each node proposes its current label to every neighbor
        proposals = (
            und.join(labels, und.a == labels.node)
            .select(F.col("b").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .union(proposals)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Cluster near-dup pairs into components: (component, size, members...).

    Output: one row per non-singleton component with its canonical id
    (the minimum member id) and size — the unit on which survivor
    selection / removal policies operate.
    """
    cc = connected_components(pairs, src=src, dst=dst)
    return cc.groupBy("component").agg(F.count("*").alias("size"))
