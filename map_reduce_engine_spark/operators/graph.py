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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.conf import loop_conf


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, component) — component = smallest node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from it are
    (by definition) their own singleton components and simply don't appear.

    Loop discipline (shared with ``pagerank``): the edge list materializes
    once, hash-partitioned on the join key so rounds re-shuffle only the
    label updates; partition count is sized to the graph (capped at the
    session setting); AQE is off for the loop scope — round shapes are
    static and co-partitioned, so runtime re-planning only adds per-stage
    latency — and each round's labels are eagerly local-checkpointed to
    keep the plan constant-size.
    """
    # undirected: materialize both directions ONCE. Without this the
    # per-round join would recompute the edge list's ENTIRE upstream lineage
    # every iteration — for near-dup clustering that is the whole
    # MinHash-verify pipeline, turning an O(rounds) loop into
    # O(rounds * pipeline).
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und0 = fwd.union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint(eager=True)

    spark = edges.sparkSession
    conf = spark.conf
    session_parts = int(conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is None:
        num_partitions = max(1, min(session_parts, und0.count() // 200_000 + 1))
    with loop_conf(spark, num_partitions):
        und = und0.repartition(num_partitions, "a").localCheckpoint(eager=True)

        labels = (
            und.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint(eager=True)
        )

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
            # eager localCheckpoint: materializes AND truncates lineage, so
            # the per-round plan stays constant-size (nested iterative plans
            # grow exponentially in the optimizer otherwise)
            new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
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
    num_partitions: int | None = None,
    checkpoint_interval: int = 2,
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

    spark = edges.sparkSession
    conf = spark.conf
    session_parts = int(conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is None:
        # Per-round wall time on a fixed-round loop is dominated by STAGE
        # SCHEDULING, not data: every surplus partition costs 10 rounds x
        # 2 shuffles of task-launch latency. Size partitions to the graph
        # (>= ~200k edges each, the same work-per-task target AQE's
        # coalescing aims for), capped at the session setting so a 100 TB
        # edge list still fans out to full cluster width.
        num_partitions = max(1, min(session_parts, e.count() // 200_000 + 1))
    # Loop-scoped AQE off: the round shapes are static and explicitly
    # co-partitioned, so runtime re-planning has nothing to improve —
    # it only adds a re-plan + extra job per stage per round (measured
    # ~2.5x wall time at sf0.1). loop_conf restores on exit and is
    # overlap-safe; cluster-wide queries outside the loop keep AQE.
    with loop_conf(spark, num_partitions):
        out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
        # the edges⋈degrees join is loop-invariant: attach out_deg to each
        # edge ONCE, so every round is a single equi-join
        # (ranks⋈weighted-edges) + one aggregate instead of two joins + one
        # aggregate. Division stays rank / out_deg (not a precomputed
        # reciprocal) so the arithmetic is bit-identical to the
        # unrolled-CTE oracle. Both loop inputs are hash-partitioned on
        # their join keys BEFORE the checkpoint — localCheckpoint preserves
        # outputPartitioning, so the per-round join re-shuffles neither the
        # edge list nor the node table, only the rank updates.
        we = (
            e.join(out_deg, "src")
            .select("src", "dst", "out_deg")
            .repartition(num_partitions, "src")
            .localCheckpoint(eager=True)
        )
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .repartition(num_partitions, "node")
            .localCheckpoint(eager=True)
        )

        # no separate checkpoint for the initial ranks: they derive narrowly
        # (one literal column) from the already-checkpointed node table, so
        # an eager materialization here would only spend one more job on a
        # copy of `nodes` — round 1 reads them straight off the checkpoint
        ranks = nodes.withColumn("rank", F.lit(1.0))

        for i in range(iterations):
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
            # Checkpoint every `checkpoint_interval` rounds, not every round:
            # each eager localCheckpoint is one Spark job, and on small/
            # vocabulary-sized graphs the job count IS the wall time (the
            # "~3 s scheduling floor"). Interval 2 halves the job count while
            # keeping the un-truncated plan at most 2 rounds deep — far from
            # the ~20-round nesting that chokes the optimizer; measured 2x
            # faster on the textrank word graph with bit-identical ranks
            # (lineage truncation never changes the arithmetic). The final
            # round always checkpoints so callers get a materialized result.
            if (i + 1) % checkpoint_interval == 0 or i == iterations - 1:
                ranks = new_ranks.localCheckpoint(eager=True)
            else:
                ranks = new_ranks
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, hub, auth) — HITS (Kleinberg) on a directed edge list.

    Fixed-round mutual reinforcement: auth(v) = Σ_{u→v} hub(u), then
    2-norm-normalize; hub(u) = Σ_{u→v} auth(v), normalize; repeat.
    Nodes with no in-links keep auth 0, no out-links keep hub 0.

    Scale shape mirrors ``pagerank``: the edge list is materialized once
    and pre-partitioned on EACH join key (the auth step joins hubs on
    ``src``, the hub step joins auths on ``dst`` — two partitioned copies
    so neither per-round join re-shuffles the edges), per-round scores are
    localCheckpoint-ed, AQE/partition count are loop-scoped via
    ``loop_conf``, and the only driver state is the loop counter. The
    2-norm is a 1-row aggregate broadcast back — never a driver collect.
    """
    if iterations < 1:
        raise ValueError(
            f"hits() needs iterations >= 1 (got {iterations}): auth scores "
            "only exist after the first half-step"
        )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    spark = edges.sparkSession
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is None:
        num_partitions = max(1, min(session_parts, e.count() // 200_000 + 1))
    with loop_conf(spark, num_partitions):
        e_src = e.repartition(num_partitions, "src").localCheckpoint(eager=True)
        e_dst = e.repartition(num_partitions, "dst").localCheckpoint(eager=True)
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .repartition(num_partitions, "node")
            .localCheckpoint(eager=True)
        )
        hub = nodes.withColumn("v", F.lit(1.0))
        auth = None
        for _ in range(iterations):
            # both half-steps checkpoint their raw scatter: the raw plan is
            # referenced TWICE (by the 2-norm aggregate and as the data
            # side), so skipping the checkpoint would recompute the
            # edge-sized join up to 4x per round at scale — here the extra
            # job per half-step is the cheaper side of the trade (unlike
            # pca_power_iteration's 1-row state, where it is not)
            auth = _normalized_scatter(nodes, e_src, hub, join_key="src", out_key="dst")
            hub = _normalized_scatter(nodes, e_dst, auth, join_key="dst", out_key="src")
    return (
        hub.select("node", F.col("v").alias("hub"))
        .join(auth.select("node", F.col("v").alias("auth")), "node")
    )


def _normalized_scatter(
    nodes: DataFrame, e: DataFrame, scores: DataFrame, join_key: str, out_key: str
) -> DataFrame:
    """One HITS half-step: scatter ``scores`` across edges from ``join_key``
    to ``out_key``, sum per target, left-join onto the node table (absent →
    0.0), then divide by the 2-norm (1-row broadcast). Checkpointed so the
    next half-step reads a truncated plan."""
    raw = (
        nodes.join(
            e.join(scores, e[join_key] == scores["node"])
            .select(F.col(out_key).alias("node"), "v")
            .groupBy("node")
            .agg(F.sum("v").alias("s")),
            "node",
            "left",
        )
        .select("node", F.coalesce("s", F.lit(0.0)).alias("v"))
        .localCheckpoint(eager=True)
    )
    nrm = raw.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    return raw.crossJoin(F.broadcast(nrm)).select(
        "node", (F.col("v") / F.col("nrm")).alias("v")
    )


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, dist) — bounded-round single-source(-set) shortest paths by
    min-plus relaxation (distributed Bellman-Ford).

    ``seeds`` is a 1-column (``node``) DataFrame of distance-0 sources;
    unreached nodes carry NULL (= infinity — ``least`` ignores NULLs in
    both Spark and DuckDB, so the relaxation needs no sentinel). Distances
    are whatever integer type ``weight`` has: with integer weights every
    round is EXACT, no float drift ever.

    Scale shape: the pagerank loop envelope — weighted edges checkpointed
    once and pre-partitioned on ``src``, per-round distances
    checkpointed, AQE/partitions loop-scoped. Each round is one equi-join
    (reached distances ⋈ edges) + one min-aggregate on ``dst`` + one left
    join back to the node table. ``iterations`` bounds the hop radius
    (Bellman-Ford needs |V|-1 rounds for full convergence; a fixed small
    radius is the usual production choice — distances beyond it read NULL).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is None:
        num_partitions = max(1, min(session_parts, e.count() // 200_000 + 1))
    with loop_conf(spark, num_partitions):
        we = e.repartition(num_partitions, "src").localCheckpoint(eager=True)
        # seeds union in: an isolated seed (no incident edges) must still
        # carry its distance-0 row — "seeds carry distance 0" holds even
        # when the node never appears in the edge list
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .union(seeds.select(F.col("node")))
            .distinct()
            .repartition(num_partitions, "node")
            .localCheckpoint(eager=True)
        )
        dist = nodes.join(
            seeds.select(F.col("node"), F.lit(0).cast("bigint").alias("seed0")),
            "node",
            "left",
        ).select("node", F.col("seed0").alias("dist"))
        for i in range(iterations):
            cand = (
                we.join(
                    dist.where(F.col("dist").isNotNull()),
                    we.src == F.col("node"),
                )
                .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("d"))
                .groupBy("node")
                .agg(F.min("d").alias("cand"))
            )
            dist = (
                dist.join(cand, "node", "left")
                .select("node", F.least("dist", "cand").alias("dist"))
            )
            if (i + 1) % 2 == 0 or i == iterations - 1:
                dist = dist.localCheckpoint(eager=True)
    return dist


def orient_by_degree(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(a, b) — each undirected edge directed from its (degree, id)-smaller
    endpoint to its larger one.

    After this orientation every node's OUT-degree is bounded by
    O(sqrt(m)): a node with out-degree d has d neighbors of degree >= its
    own, impossible past sqrt(2m). Degrees are one aggregate over the edge
    list; orientation is a join + comparison — the cheap preprocessing
    that turns wedge enumeration from hub-bound to O(m^1.5)-bound.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )


def triangle_count(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """1-row (n_triangles) — degree-oriented triangle counting.

    ``edges`` is a deduplicated undirected pair list (one row per edge, any
    orientation). Each edge is re-oriented from its (degree, id)-smaller
    endpoint to its larger one; two equi-joins over the oriented list then
    count every triangle exactly once (the orientation is a total order,
    so triangle {x<y<z} appears only as x→y, y→z, x→z).

    Why degree orientation instead of plain id order: after orienting
    toward the higher-degree endpoint, every node's OUT-degree is bounded
    by O(sqrt(m)) — a node with out-degree d has d neighbors of degree
    >= its own, which is impossible past sqrt(2m) — so the wedge join's
    fan-out is O(m^1.5) on ANY graph, including power-law graphs where
    id-ordering leaves a hub with millions of out-edges and one reducer
    doing all the work (the compact-forward bound; cf. Latapy 2008).
    Degrees are one aggregate; orientation is one join + a comparison.
    """
    # materialize once: the oriented list feeds all three legs of the
    # wedge join (localCheckpoint, reclaimed by the ContextCleaner)
    oriented = orient_by_degree(edges, src, dst).localCheckpoint(eager=True)
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    return (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .agg(F.count("*").alias("n_triangles"))
    )


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
    spark = edges.sparkSession
    und0 = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # same fixed-round loop discipline as pagerank/connected_components:
    # graph-sized partitions, AQE off for the static loop shapes, edge
    # list pre-partitioned on the join key once
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nparts = max(1, min(session_parts, und0.count() // 200_000 + 1))
    with loop_conf(spark, nparts):
        und = und0.repartition(nparts, "a").localCheckpoint(eager=True)
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


def label_propagation(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    rounds: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.):
    (node, community) after a FIXED number of rounds.

    Each round every node adopts the most frequent label among its
    neighbors, ties broken toward the smallest label — both choices
    deterministic, so the result is reproducible under any partitioning
    and replayable by an unrolled-SQL oracle (the async/randomized variant
    of the original paper trades that away for faster convergence).
    Synchronous LPA can oscillate on bipartite structure, which is why the
    contract is fixed-round, not run-to-convergence.

    Loop discipline shared with ``pagerank``/``connected_components``:
    edges materialize once (both directions), hash-partitioned on the join
    key; AQE off and graph-sized shuffle partitions scoped to the loop;
    per-round labels eagerly local-checkpointed.  Per round: one join +
    one (node, label) hash aggregate + one per-node top-1 window over the
    aggregate — all keyed shuffles bounded by the label-histogram size.
    """
    und0 = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    conf = spark.conf
    session_parts = int(conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is None:
        num_partitions = max(1, min(session_parts, und0.count() // 200_000 + 1))
    with loop_conf(spark, num_partitions):
        und = und0.repartition(num_partitions, "a").localCheckpoint(eager=True)
        labels = (
            und.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("label"))
        for _ in range(rounds):
            counts = (
                und.join(labels, und.a == labels.node)
                .select(F.col("b").alias("node"), "label")
                .groupBy("node", "label")
                .agg(F.count("*").alias("cnt"))
            )
            labels = (
                counts.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("node", "label")
                .localCheckpoint(eager=True)
            )
    return labels.select("node", F.col("label").alias("community"))


def k_core(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    k: int = 3,
    max_iter: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, core_degree) — the k-core of an undirected edge list.

    Iterative peeling: drop every node whose degree is below ``k``, remove
    its edges, repeat until fixpoint (or ``max_iter`` rounds — the loop
    breaks early the round nothing is removed, so a bounded-round DuckDB
    unrolling of the same peel computes the identical result). Output is
    one row per surviving node with its degree inside the core.

    Loop discipline matches ``connected_components``: the doubled edge
    list materializes once, AQE is scoped off (static round shapes), each
    round's survivor edge set is eagerly local-checkpointed so the plan
    stays constant-size, and every step is an equi-join/hash-agg — the
    peel scales as O(rounds) co-partitioned shuffles at any graph size.
    """
    und0 = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is None:
        num_partitions = max(1, min(session_parts, und0.count() // 200_000 + 1))
    with loop_conf(spark, num_partitions):
        und = und0.repartition(num_partitions, "a").localCheckpoint(eager=True)
        n_edges = und.count()
        for _ in range(max_iter):
            keep = (
                und.groupBy("a")
                .agg(F.count("*").alias("deg"))
                .where(F.col("deg") >= k)
                .select("a")
            )
            survivors = (
                und.join(keep, "a", "left_semi")
                .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
                .localCheckpoint(eager=True)
            )
            n_surv = survivors.count()
            und = survivors
            if n_surv == n_edges:
                break
            n_edges = n_surv
    return und.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("bigint").alias("core_degree")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    num_partitions: int | None = None,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """(node, rank) — PageRank with teleport restricted to a seed set.

    rank(v) = (1 - d) * seed(v) + d * Σ_{u→v} rank(u) / out_degree(u),
    seed(v) ∈ {0, 1}, iterated a fixed number of rounds from rank = seed —
    the random-walk-with-restart proximity score used for seeded
    recommendation ("items close to THESE customers"), graph-based
    expansion of a labeled set, and local community scoring. Nodes
    unreachable from the seed set stay at exactly 0 and are meaningful
    output (not dropped).

    Scale/loop shape is identical to :func:`pagerank` (same
    co-partitioned checkpointed loop inputs, loop-scoped AQE off,
    interval checkpoints); the only change is the seed indicator riding
    the node table. Seeds are a DataFrame (column ``node``), never a
    driver-side list.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    spark = edges.sparkSession
    conf = spark.conf
    session_parts = int(conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is None:
        num_partitions = max(1, min(session_parts, e.count() // 200_000 + 1))
    with loop_conf(spark, num_partitions):
        out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
        we = (
            e.join(out_deg, "src")
            .select("src", "dst", "out_deg")
            .repartition(num_partitions, "src")
            .localCheckpoint(eager=True)
        )
        seed_df = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .join(seed_df.withColumn("is_seed", F.lit(1.0)), "node", "left")
            .select("node", F.coalesce("is_seed", F.lit(0.0)).alias("seed"))
            .repartition(num_partitions, "node")
            .localCheckpoint(eager=True)
        )
        ranks = nodes.select("node", F.col("seed").alias("rank"))
        for i in range(iterations):
            contribs = we.join(ranks, we.src == ranks.node).select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
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
                        F.lit(1.0 - damping) * F.col("seed")
                        + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                    ).alias("rank"),
                )
            )
            if (i + 1) % checkpoint_interval == 0 or i == iterations - 1:
                ranks = new_ranks.localCheckpoint(eager=True)
            else:
                ranks = new_ranks
    return ranks


def k_truss(
    edges: DataFrame,
    k: int = 4,
    max_iter: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """(u, v, n_triangles) — the k-truss of an undirected edge list: the
    maximal subgraph where every edge closes at least k-2 triangles
    WITHIN the subgraph. Cohesion one level up from k-core (degree can
    be faked by hubs; triangle support cannot) — the standard community
    nucleus before clique-ish analysis.

    Edges must be canonical (u < v). Each peel round enumerates
    triangles once via the ordered 3-way equi-join (a<b<c, so each
    triangle appears exactly once), explodes them to their three edges,
    and drops edges below support k-2; peeling is monotone so a bounded
    unrolling equals the fixpoint (the k_core argument). Support of the
    SURVIVING subgraph is recomputed for the output. Loop discipline as
    k_core: checkpointed rounds, early break at fixpoint.
    """
    e = edges.select("u", "v").localCheckpoint(eager=True)
    prev_n = e.count()
    spark = edges.sparkSession
    conf = spark.conf
    session_parts = int(conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is None:
        num_partitions = max(1, min(session_parts, prev_n // 200_000 + 1))

    def support(ed: DataFrame) -> DataFrame:
        e1, e2, e3 = ed.alias("e1"), ed.alias("e2"), ed.alias("e3")
        tri = (
            e1.join(e2, F.col("e2.u") == F.col("e1.v"))
            .join(
                e3,
                (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
            )
            .select(
                F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
            )
        )
        sides = (
            tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
            .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
        )
        return sides.groupBy("u", "v").agg(F.count("*").cast("bigint").alias("n_triangles"))

    with loop_conf(spark, num_partitions):
        for _ in range(max_iter):
            s = support(e)
            e = (
                e.join(s, ["u", "v"])
                .where(F.col("n_triangles") >= k - 2)
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            n = e.count()
            if n == prev_n:
                break
            prev_n = n
        out = e.join(support(e), ["u", "v"], "left").select(
            "u", "v", F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles")
        )
    return out.localCheckpoint(eager=True)
