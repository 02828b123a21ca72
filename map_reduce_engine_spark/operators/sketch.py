"""Portable frequency sketches: count-min-sketch on the engine-portable
hash family.

The reference's only aggregation machinery is the AddInterface sum-merge
(``ReduceRunner.java:154-172``); sketches are the scale-path extension of
that idea — a CMS table is itself nothing but a fixed-size grid of
additive counters, so it merges across partitions/days/shards with plain
``sum`` (the same partial+final aggregation Catalyst already runs). Depth
``d`` rows x width ``w`` counters bound the table at d*w rows REGARDLESS
of corpus size: the 100 TB property. Point estimates are
``min_d counts[d][bucket_d(x)]`` — always >= the true count, with error
<= N/w at confidence 1-(1/2)^d.

Hashes derive from ``operators.dedup.portable_base31`` (md5-prefix) and
the ``minhash_family`` 31-bit affine re-hashes — all integer arithmetic,
so a DuckDB oracle recomputes the identical sketch bit-for-bit (unlike
engine-specific HLL/CMS binaries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_engine_spark.operators.dedup import _MASK31, minhash_family, portable_base31


def _bucket(h: Column, a: int, b: int, width: int) -> Column:
    # HIGH bits of the affine hash, not `% width`: multiplication pushes
    # entropy upward, and with odd `a` the low bits of a*h depend only on
    # the low bits of h — `% width` would make every depth row collide for
    # the same token pairs, defeating the min-over-depth. width must be a
    # power of two: a non-power-of-two would silently shift into
    # 2^floor(log2(width)) buckets, wasting the rest of the table and
    # skewing the documented error bound.
    if width <= 0 or width & (width - 1):
        raise ValueError(f"CMS width must be a power of two, got {width}")
    shift = 31 - (width.bit_length() - 1)
    return F.shiftright((F.lit(a) * h + F.lit(b)).bitwiseAND(F.lit(_MASK31)), shift)


def cms_table(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(d, bucket, c) — the CMS counter grid over one row per item OCCURRENCE.

    One explode (depth entries per occurrence) + one hash aggregate; the
    output is at most ``depth * width`` rows. Partial aggregation absorbs
    most of the explode before the shuffle (bucket keys repeat heavily).
    """
    av, bv = minhash_family(depth)
    h = portable_base31(F.col(item_col))
    entries = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(h, av[d], bv[d], width).alias("bucket"))
            for d in range(depth)
        ]
    )
    return (
        items.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cms_point_estimates(
    sketch: DataFrame, probes: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(item, cms_estimate) — min-over-depth counter lookup for each probe item.

    ``probes`` is expected to be small (heavy-hitter candidates); the join
    against the <= depth*width-row sketch is broadcast-sized from both sides.
    """
    av, bv = minhash_family(depth)
    h = portable_base31(F.col(item_col))
    entries = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(h, av[d], bv[d], width).alias("bucket"))
            for d in range(depth)
        ]
    )
    probe_buckets = probes.select(
        F.col(item_col).alias("item"), F.explode(entries).alias("e")
    ).select("item", F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket"))
    return (
        probe_buckets.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("item")
        .agg(F.min("c").alias("cms_estimate"))
    )


def kmv_tree_sketch(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 64,
    fanout: int = 8,
) -> DataFrame:
    """(group, kmin: array<bigint>, n_hashes) — KMV sketch per group via a
    TREE of bounded partial sketches, the production shape the
    ``kmv_distinct_sketch`` query docstring promises.

    Level 1 salts each group into ``fanout`` shards and keeps the k
    smallest distinct hashes per (group, shard) — each partial aggregate's
    state is one shard's hash set, 1/fanout of the group. Level 2 merges by
    keeping the k smallest of the union of partials (exactly the KMV merge
    law), touching ``fanout * k`` bigints per group, never raw rows again.
    The result is BIT-IDENTICAL to a single global k-smallest pass
    (min-k is associative/commutative over set union), so the tree is a
    pure execution-shape change — deepen it (salt again) for groups hot
    enough that one shard still overflows a task.

    ``n_hashes`` counts the group's distinct hashes (for the n < k exact
    branch of the estimator). Estimate: ``(k-1) * 2^31 / kmin[k-1]`` when
    ``n_hashes >= k`` else ``n_hashes`` — see the query for the DuckDB twin.
    """
    from map_reduce_engine_spark.operators.dedup import portable_base31

    hashed = df.select(
        F.col(group_col).alias("g"), portable_base31(F.col(item_col).cast("string")).alias("h")
    ).distinct()
    salted = hashed.withColumn("salt", (F.col("h") % fanout).cast("int"))
    level1 = salted.groupBy("g", "salt").agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("kmin"),
        F.count("*").alias("n"),
    )
    # Merge WITHOUT exploding: exploding kmin and summing n per exploded row
    # would add each shard's n once per kept hash (n_hashes = sum(len(kmin)*n)),
    # inflating the estimator's n < k exact branch. Shards partition disjoint
    # hash residues (h % fanout on already-distinct hashes), so flattening the
    # shard arrays never duplicates a hash and sort+slice is the exact union-k.
    return (
        level1.groupBy("g")
        .agg(
            F.slice(F.sort_array(F.flatten(F.collect_list("kmin"))), 1, k).alias("kmin"),
            F.sum("n").alias("n_hashes"),
        )
        .select(F.col("g").alias(group_col), "kmin", "n_hashes")
    )


def join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    rate_denom: int = 8,
) -> DataFrame:
    """1-row (est_pairs, sampled_pairs, n_sampled_keys) — join cardinality
    estimated by COORDINATED key sampling, without running the join.

    Filter BOTH sides to keys whose portable hash lands in the bottom
    1/rate_denom of the hash space — the SAME keys survive on both sides,
    which is the property independent row-sampling lacks (row-sampling at
    rate p keeps a matching pair with p² and the 1/p² correction has
    enormous variance). Key-sampling keeps each surviving key's FULL
    contribution c_a(k)·c_b(k), so the Horvitz-Thompson estimate
    ``rate_denom · Σ_sampled c_a·c_b`` is unbiased, with variance driven
    only by the key-size distribution. The pre-flight this enables at
    100 TB: estimate a join's output rows / shuffle volume / skew from two
    cheap filtered aggregates before paying for the real thing (the same
    role the reference's fixed reducer-count heuristic plays at submission,
    ``MasterNode.java`` — but data-driven). All arithmetic is on the
    md5-prefix portable hash family, so a SQL oracle replays it exactly.
    """
    cut = (_MASK31 + 1) // rate_denom
    ca = (
        a.select(portable_base31(F.col(key_a).cast("string")).alias("h"), F.col(key_a).alias("k"))
        .where(F.col("h") < cut)
        .groupBy("k")
        .agg(F.count("*").alias("ca"))
    )
    cb = (
        b.select(portable_base31(F.col(key_b).cast("string")).alias("h"), F.col(key_b).alias("k"))
        .where(F.col("h") < cut)
        .groupBy("k")
        .agg(F.count("*").alias("cb"))
    )
    return ca.join(cb, "k").agg(
        (F.lit(rate_denom) * F.sum(F.col("ca") * F.col("cb"))).cast("bigint").alias("est_pairs"),
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("sampled_pairs"),
        F.count("*").cast("bigint").alias("n_sampled_keys"),
    )


def ams_f2_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 128,
    group_size: int = 32,
    weight_col: str | None = None,
) -> DataFrame:
    """1-row (f2_group_means: array<double>) — AMS second-moment sketch,
    median-of-means form.

    Alon-Matias-Szegedy: each of ``depth`` estimators keeps ONE counter
    Z_d = Σ_items s_d(item), where s_d ∈ {−1, +1} is a portable affine
    sign hash; E[Z_d²] = F2 = Σ_k c_k² exactly (cross terms cancel in
    expectation), with relative error ~ sqrt(2/group_size) after averaging
    ``group_size`` estimators and a failure probability driven down by the
    median over ``depth/group_size`` groups. F2 IS the self-join size /
    repeat-rate second moment — the quantity ``join_size_estimate``
    samples for; the AMS form needs only ``depth`` integers of state,
    merges by plain addition across any partitioning (the AddInterface
    sum-merge shape), and never stores a key. The output array holds the
    SORTED group means so the median pick is engine-portable; with
    ``group_size`` a power of two the mean division is exact in binary.
    Signs derive from the md5-prefix base via the ``minhash_family``
    re-hashes: bit 30 of ``(a_d·h + b_d) & MASK31`` is an unbiased coin,
    so a SQL oracle recomputes the identical sketch.

    ``weight_col`` treats each input row as ``weight`` occurrences of the
    item (Z_d = Σ rows w · s_d(item) — the identical BIGINT sum as raw
    rows, since integer addition is associative): pass a pre-grouped
    (item, count) table to share ONE scan between the sketch and an exact
    companion aggregate instead of scanning the fact table twice.
    """
    if depth % group_size:
        raise ValueError(f"depth {depth} must be a multiple of group_size {group_size}")
    av, bv = minhash_family(depth)
    # hash ONCE per row in a projection below the aggregate — each aggregate
    # expression evaluates its own child, so inlining portable_base31 into
    # all `depth` signs would run the md5 `depth` times per row. The sign
    # family is ONE transform over a literal (a, b) constant array, not
    # `depth` separate aggregate columns: a 128-buffer HashAggregate costs
    # seconds of codegen compile alone, while posexplode + a 128-group sum
    # is two tiny expressions at ANY depth (partial aggregation absorbs the
    # explode before the 128-row shuffle).
    # Fold duplicate hashes FIRST: Z_d = Σ_k c_k · s_d(k) — the sign depends
    # only on the key, so aggregating (h, count) before the depth-explode
    # cuts the explode input from |rows| to |distinct keys| (and the md5 to
    # once per occurrence, absorbed by partial aggregation).
    w = (
        F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    )
    hashed = (
        df.select(portable_base31(F.col(item_col).cast("string")).alias("h"), w.alias("w"))
        .groupBy("h")
        .agg(F.sum("w").alias("c"))
    )
    pairs = F.expr(
        "array(" + ",".join(f"struct({av[d]}L as a, {bv[d]}L as b)" for d in range(depth)) + ")"
    )
    weighted = F.transform(
        pairs,
        lambda p: F.col("c")
        * (
            F.lit(1)
            - F.lit(2)
            * F.shiftright((p["a"] * F.col("h") + p["b"]).bitwiseAND(F.lit(_MASK31)), 30)
        ).cast("bigint"),
    )
    z = (
        hashed.select(F.posexplode(weighted).alias("d", "s"))
        .groupBy("d")
        .agg(F.sum("s").alias("z"))
    )
    means = (
        z.groupBy((F.col("d") / group_size).cast("int").alias("g"))
        .agg((F.sum(F.col("z") * F.col("z")) / F.lit(float(group_size))).alias("m"))
    )
    return means.agg(F.sort_array(F.collect_list("m")).alias("f2_group_means"))


def misra_gries_summary(df: DataFrame, item_col: str, k: int = 16) -> DataFrame:
    """Misra-Gries frequent-items summary: (item, mg_count) candidates with
    the deterministic guarantee true_count - n/(k+1) <= mg_count <=
    true_count, hence EVERY item with true frequency > n/(k+1) survives.

    Bounded memory at every step, the property exact ``groupBy`` counting
    lacks: each input partition folds its Arrow batches into k counters
    (per batch: exact value_counts merged via the Agarwal et al. MG merge —
    sum counters, subtract the (k+1)-th largest, drop non-positive), then
    the <= k-row partials merge once more in SQL with the same rule. Merge
    error is additive and totals <= n/(k+1) for any partition layout or
    batch order; the CANDIDATE SET may vary with layout, but the guarantee
    (superset of true heavy hitters) holds for every layout — which is what
    the registry query's oracle checks. At 100 TB: one narrow pass plus a
    (num_partitions x k)-row shuffle, state never exceeds k counters per
    task.
    """
    import pandas as pd

    def fold(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[item_col].value_counts()
            for item, cnt in vc.items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                # MG merge rule: subtract the (k+1)-th largest, keep positives
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - sub for i, c in counters.items() if c - sub > 0}
        yield pd.DataFrame(
            {"item": list(counters), "c": list(counters.values())}
        )

    partials = df.select(F.col(item_col).alias(item_col)).mapInPandas(
        fold, schema="item string, c bigint"
    )
    merged = partials.groupBy("item").agg(F.sum("c").cast("bigint").alias("c"))
    w = Window.orderBy(F.desc("c"), F.asc("item"))
    ranked = merged.withColumn("rk", F.row_number().over(w)).localCheckpoint(
        eager=True
    )  # bounded (num_partitions x k rows); feeds threshold + filter
    # 1-row aggregate, NOT a filtered row: when merged holds <= k items the
    # threshold row doesn't exist, and a crossJoin with an EMPTY frame would
    # wipe the candidates (no subtraction needed in that case -> sub = 0).
    sub = ranked.agg(
        F.max(F.when(F.col("rk") == k + 1, F.col("c"))).alias("sub")
    )
    return (
        ranked.where(F.col("rk") <= k)
        .crossJoin(F.broadcast(sub))  # 1-row threshold broadcast
        .where(F.col("c") - F.coalesce(F.col("sub"), F.lit(0)) > 0)
        .select(
            "item",
            (F.col("c") - F.coalesce(F.col("sub"), F.lit(0)))
            .cast("bigint")
            .alias("mg_count"),
        )
    )
