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
    # undirected: materialize both directions ONCE. Without this persist the
    # per-round join would recompute the edge list's ENTIRE upstream lineage
    # every iteration — for near-dup clustering that is the whole
    # MinHash-verify pipeline, turning an O(rounds) loop into
    # O(rounds * pipeline). Eager localCheckpoint also truncates the lineage
    # so round plans don't grow.
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = fwd.union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))).localCheckpoint(
        eager=True
    )

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
        # eager localCheckpoint: materializes AND truncates lineage, so the
        # per-round plan stays constant-size (nested iterative plans grow
        # exponentially in the optimizer otherwise)
        new_labels = new_labels.localCheckpoint(eager=True)
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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) — GraphX-convention PageRank on a directed edge list.

    rank(v) = (1 - d) + d * Σ_{u→v} rank(u) / out_degree(u), iterated a
    fixed number of rounds (the GraphX staticPageRank formulation — ranks
    are per-node scores ≥ (1-d), not a probability distribution; nodes with
    no in-links converge to exactly 1-d).

    Scale shape: out-degrees are computed once; each round is one equi-join
    of ranks to edges on the source + one hash aggregate on the
    destination — two shuffles per round, both on node keys. At 100 TB the
    edge list is pre-partitioned on ``src`` once (or bucketed at write
    time) so the per-round join reuses the partitioning and only the
    aggregate shuffles. Each round's ranks (|V| rows) are eagerly
    local-checkpointed: without lineage truncation the nested per-round
    plan grows exponentially in the optimizer and OOMs the driver long
    before the data does — the canonical iterative-algorithm trap (on a
    cluster with a checkpoint dir, ``checkpoint()`` adds executor-failure
    tolerance on top). The driver holds nothing but the loop counter.
    """
    # materialize the edge list and degree table once — the per-round join
    # would otherwise recompute their entire upstream lineage (e.g. the
    # fact-table join that produced the edges) every iteration
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # the edges⋈degrees join is loop-invariant: attach out_deg to each edge
    # ONCE, so every round is a single equi-join (ranks⋈weighted-edges) + one
    # aggregate instead of two joins + one aggregate. Division stays rank /
    # out_deg (not a precomputed reciprocal) so the arithmetic is bit-identical
    # to the unrolled-CTE oracle
    we = (
        e.join(out_deg, "src")
        .select("src", "dst", "out_deg")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    ranks = nodes.withColumn("rank", F.lit(1.0)).localCheckpoint(eager=True)

    for _ in range(iterations):
        contribs = (
            we.join(ranks, we.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
        )
        new_ranks = (
            nodes.join(
                contribs.groupBy("node").agg(F.sum("contrib").alias("in_sum")),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("rank"),
            )
        )
        ranks = new_ranks.localCheckpoint(eager=True)
    return ranks


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 4,
) -> DataFrame:
    """(node, dist) — undirected BFS hop distances from a seed set.

    The third iterative-graph primitive next to connected components and
    PageRank: frontier expansion, one equi-join + anti-join per round.
    Each round joins the current frontier to the (materialized-once)
    undirected edge list, drops already-visited nodes with an anti-join on
    the distance table, and eagerly ``localCheckpoint``s both — the same
    lineage-truncation discipline as the other loops (the driver holds
    only the round counter). Rounds are FIXED at ``max_depth`` so the
    DuckDB oracle unrolls the identical expansion; an empty frontier makes
    the remaining rounds no-ops rather than early-exiting (no per-round
    driver count job).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("node"), F.lit(0).cast("bigint").alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist.select("node")
    for r in range(1, max_depth + 1):
        nxt = (
            frontier.join(und, frontier.node == und.a)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        dist = dist.union(
            nxt.withColumn("dist", F.lit(r).cast("bigint")).select("node", "dist")
        ).localCheckpoint(eager=True)
        frontier = nxt
    return dist
