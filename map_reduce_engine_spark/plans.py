"""Plan-quality introspection: the pre-flight "would this survive 100 TB?"
check as an engine API.

The repo's plan-gating philosophy (tests/test_plans.py, PLANS.md) applied
programmatically: before submitting a pipeline against a 100 TB table, run
``plan_report(df)`` / ``assert_scalable(df)`` and catch the classic
scale-killers — cartesian products, nested-loop joins that should be hash
joins, row-at-a-time Python eval in the hot path — at plan time, not three
hours into the job. The reference has no optimizer and therefore nothing to
audit (SURVEY §4); this is the tooling its operators gain for free by being
expressed against Catalyst.

String-level plan inspection is the stable public surface (the same thing
``df.explain()`` shows a human); no Catalyst internals are touched.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Arrow-batched Python boundaries are sanctioned (the engine's own compat
# and multimodal surfaces use them); only row-at-a-time eval is flagged.
_ROW_PYTHON = ("BatchEvalPython",)
_SANCTIONED_PYTHON = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "MapInArrow",
    "FlatMapGroupsInArrow",
)


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    # The JVM explainString call, not redirect_stdout around df.explain():
    # identical text, but thread-safe — redirect_stdout swaps the GLOBAL
    # sys.stdout, so concurrent plan inspections (the parallel registry
    # plan gate, r12) would interleave captures.
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


# Operators that bound the data volume flowing up through them: after one of
# these, the frame is an aggregate grid / limited prefix / broadcast-sized
# side, so a single-partition sort above is a bounded-frame sort, not a
# scale-killer. (HashAggregate keys can still be high-cardinality — a groupBy
# on a user key feeding a global window stays a design smell — but that is
# not statically distinguishable from a value grid; the gate catches the
# unambiguous case: raw fact rows with no aggregation at all.)
_BOUNDING_OPS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
    "BroadcastExchange",
    "ReusedExchange",
    "LocalTableScan",
    "Range",
    "Subquery",
    "ReusedSubquery",
)

_RAW_LEAVES = ("Scan ", "FileScan", "BatchScan")

_TREE_LINE = re.compile(r"^([\s:+\-]*)(\*\s*)?([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$")
_DETAIL_HEADER = re.compile(r"^\((\d+)\) (.+?)(?:\s*\[codegen id : \d+\])?\s*$")


def _tree_children(formatted: str) -> tuple[dict[int, list[int]], dict[int, str]]:
    """Parse every operator tree in a formatted plan into a children map.

    Formatted mode prints one indented tree per (sub)plan with each node as
    ``OpName (id)``; indentation depth encodes parenthood (3 chars/level).
    Detail blocks (``(id) OpName`` at column 0) are skipped — they never
    match the tree shape because the id leads instead of trails.
    """
    children: dict[int, list[int]] = {}
    ops: dict[int, str] = {}
    stack: list[tuple[int, int]] = []  # (depth, id)
    for line in formatted.splitlines():
        m = _TREE_LINE.match(line)
        if not m or _DETAIL_HEADER.match(line):
            stack.clear()  # a non-tree line ends the current tree segment
            continue
        depth = len(m.group(1)) // 3
        node_id = int(m.group(4))
        ops[node_id] = m.group(3).strip()
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            children.setdefault(stack[-1][1], []).append(node_id)
        stack.append((depth, node_id))
    return children, ops


def _single_partition_exchanges(formatted: str) -> list[int]:
    """Node ids of Exchange operators whose partitioning is SinglePartition."""
    out: list[int] = []
    cur_id: int | None = None
    cur_op = ""
    for line in formatted.splitlines():
        m = _DETAIL_HEADER.match(line)
        if m:
            cur_id, cur_op = int(m.group(1)), m.group(2)
            continue
        if (
            cur_id is not None
            and cur_op.startswith("Exchange")
            and line.startswith("Arguments: SinglePartition")
        ):
            out.append(cur_id)
    return out


def _reaches_raw_leaf(
    node: int, children: dict[int, list[int]], ops: dict[int, str]
) -> bool:
    """True if any path below ``node`` hits a relation scan without first
    crossing a bounding operator (aggregate / limit / broadcast)."""
    for child in children.get(node, []):
        op = ops.get(child, "")
        if op.startswith(_BOUNDING_OPS):
            continue
        if op.startswith(_RAW_LEAVES):
            return True
        if _reaches_raw_leaf(child, children, ops):
            return True
    return False


_AGG_KEYS_LINE = re.compile(r"Keys(?: \[\d+\])?: \[(.*)\]\s*$")


def _agg_keys(formatted: str) -> dict[int, str]:
    """Node id -> grouping-keys string for aggregate detail blocks."""
    keys: dict[int, str] = {}
    cur_id: int | None = None
    cur_op = ""
    for line in formatted.splitlines():
        m = _DETAIL_HEADER.match(line)
        if m:
            cur_id, cur_op = int(m.group(1)), m.group(2)
            continue
        if cur_id is not None and "Aggregate" in cur_op:
            km = _AGG_KEYS_LINE.match(line.strip())
            if km:
                keys[cur_id] = km.group(1)
    return keys


def _bounding_frontier(
    node: int, children: dict[int, list[int]], ops: dict[int, str]
) -> list[tuple[int, str]]:
    """The bounding operators (or raw leaves) where the walk below an
    exchange stops — the operators whose output the exchange funnels."""
    out: list[tuple[int, str]] = []
    for child in children.get(node, []):
        op = ops.get(child, "")
        if op.startswith(_BOUNDING_OPS):
            out.append((child, op))
        elif op.startswith(_RAW_LEAVES):
            out.append((child, "RAW"))
        else:
            out.extend(_bounding_frontier(child, children, ops))
    return out


# grouping keys that mark the engine's own two-pass scan shapes: a window
# over SHARD TOTALS is n_shards-bounded by construction. Matched as the
# EXACT engine-internal attribute names (_shard#N / _vg_shard#N, as
# rankselect.py emits them) — bare substring containment would silently
# exempt any user column whose name merely contains "_shard" (e.g. a
# future day_shard grouping key) from the _GRID_WINDOW_PIN budget
# (ADVICE r06). The negative lookbehind rejects such suffix matches.
_SHARD_KEY_RE = re.compile(r"(?<![0-9A-Za-z_])_(?:vg_)?shard#\d+")


def single_partition_grid_nodes(formatted: str) -> int:
    """Count ``Exchange SinglePartition`` nodes excused ONLY by keyed,
    non-shard aggregates — windows/sorts over an aggregate GRID whose
    boundedness is an assumption about the grouping key's domain (a day
    grid, a decile grid, ...), not a structural guarantee.

    These are legitimate when the key domain is genuinely bounded, and a
    scale bug when it is not (the round-5 weak item: a cents-valued value
    grid reaches ~5e7 distinct keys at 100x). The raw detector cannot see
    the difference, so this count is informational — the registry test
    pins the set of queries allowed to carry such nodes, forcing every new
    one to state its bound. Excluded: exchanges excused by a limit /
    broadcast / local relation (structurally bounded), by a KEYLESS
    aggregate (1 row), or by a shard-total aggregate (n_shards rows — the
    ``operators/rankselect.py`` two-pass scan shape).
    """
    children, tree_ops = _tree_children(formatted)
    keys = _agg_keys(formatted)
    n = 0
    for eid in _single_partition_exchanges(formatted):
        frontier = _bounding_frontier(eid, children, tree_ops)
        if any(op == "RAW" for _, op in frontier):
            continue  # counted by single_partition_raw_nodes
        aggs = [(i, op) for i, op in frontier if "Aggregate" in op]
        if not aggs:
            continue  # limit / broadcast / local relation below
        if any(_SHARD_KEY_RE.search(keys.get(i, "")) for i, _ in aggs):
            continue  # shard-total grid: n_shards-bounded by construction
        if all(keys.get(i, "") == "" for i, _ in aggs):
            continue  # global aggregates: 1-row frames
        n += 1
    return n


def single_partition_raw_nodes(formatted: str) -> int:
    """Count ``Exchange SinglePartition`` nodes whose input is raw relation
    rows (no aggregation/limit anywhere below).

    This is the funnel-everything-through-one-task shape — typically a
    ``Window.orderBy`` with no ``partitionBy`` over a fact table, or a
    ``repartition(1)`` before a write. Correct and quick at test SF; at
    100x the single task sorts the whole table. Windows over aggregate
    GRIDS (value grids, day grids) are excused by the aggregate below them.
    """
    children, tree_ops = _tree_children(formatted)
    return sum(
        _reaches_raw_leaf(eid, children, tree_ops)
        for eid in _single_partition_exchanges(formatted)
    )


@dataclass
class PlanReport:
    cartesian_products: int = 0
    nested_loop_joins: int = 0
    row_python_evals: int = 0
    arrow_python_stages: int = 0
    single_partition_raw: int = 0
    single_partition_grid: int = 0
    shuffle_exchanges: int = 0
    broadcast_exchanges: int = 0
    wholestage_codegen_spans: int = 0
    scans: int = 0
    scans_with_pushed_filters: int = 0
    warnings: list[str] = field(default_factory=list)


def _plan_ops(formatted: str) -> list[str]:
    """One entry per physical operator node.

    Formatted mode prints every operator twice (tree + numbered details);
    raw substring counts therefore double every metric and let
    "ReusedExchange" match "Exchange". The numbered detail headers
    "(n) OpName" name each node exactly once — count on those.
    """
    return re.findall(r"^\(\d+\) (.+?)(?:\s*\[codegen id : \d+\])?$", formatted, re.M)


def plan_report(df: DataFrame) -> PlanReport:
    """Inspect the physical plan for the scale-relevant signals."""
    p = physical_plan(df, "formatted")
    ops = _plan_ops(p)
    r = PlanReport()
    r.cartesian_products = sum(o.startswith("CartesianProduct") for o in ops)
    r.nested_loop_joins = sum(o.startswith("BroadcastNestedLoopJoin") for o in ops)
    r.row_python_evals = sum(o.startswith(_ROW_PYTHON) for o in ops)
    r.arrow_python_stages = sum(o.startswith(_SANCTIONED_PYTHON) for o in ops)
    r.broadcast_exchanges = sum(o.startswith("BroadcastExchange") for o in ops)
    # startswith("Exchange") excludes both BroadcastExchange and
    # ReusedExchange (a reused result is free, not a second shuffle).
    r.shuffle_exchanges = sum(o.startswith("Exchange") for o in ops)
    # Codegen spans: formatted mode carries "codegen id : n" markers, but
    # under AQE they exist only once the final plan is materialized — for an
    # already-executed df the simple-mode "*(n)" stage markers appear too.
    simple = physical_plan(df, "simple")
    r.wholestage_codegen_spans = len(
        set(re.findall(r"codegen id : (\d+)", p)) | set(re.findall(r"\*\((\d+)\)", simple))
    )
    scans = re.findall(r"PushedFilters: (\[[^\]]*\])", p)
    r.scans = sum(o.startswith(("Scan parquet", "Scan orc", "Scan csv")) for o in ops)
    r.scans_with_pushed_filters = sum(1 for s in scans if s != "[]")

    if r.cartesian_products:
        r.warnings.append(
            f"{r.cartesian_products} CartesianProduct: O(n*m) pair space — add an "
            "equi-join key (blocking key / bucket / cell) or broadcast a bounded side"
        )
    if r.nested_loop_joins:
        r.warnings.append(
            f"{r.nested_loop_joins} BroadcastNestedLoopJoin: every row scores against "
            "the broadcast side — acceptable only when that side is provably tiny "
            "(e.g. a probe set); otherwise derive an equi-join key"
        )
    if r.row_python_evals:
        r.warnings.append(
            f"{r.row_python_evals} row-at-a-time Python eval (BatchEvalPython): "
            "10-100x slower than Arrow-batched pandas UDFs; use pandas_udf / "
            "mapInPandas or a built-in expression"
        )
    r.single_partition_raw = single_partition_raw_nodes(p)
    # Informational (never fatal in assert_scalable): grid windows are the
    # right shape for genuinely bounded key domains; the registry test pins
    # which queries may carry them so new ones must state their bound.
    r.single_partition_grid = single_partition_grid_nodes(p)
    if r.single_partition_grid:
        r.warnings.append(
            f"{r.single_partition_grid} Exchange SinglePartition over a keyed "
            "aggregate grid: bounded only if the grouping key's domain is — "
            "for high-cardinality value domains use value-grid rank-select "
            "with sharded prefix sums (operators/rankselect.py)"
        )
    if r.single_partition_raw:
        r.warnings.append(
            f"{r.single_partition_raw} Exchange SinglePartition over raw relation "
            "rows: every row funnels through ONE task (unpartitioned window/sort "
            "on a fact table) — aggregate to a bounded grid first (value-grid "
            "rank-select), shard the walk with per-shard offsets, or add a "
            "partitionBy"
        )
    return r


class PlanQualityError(AssertionError):
    """A DataFrame's physical plan contains a scale-killer."""


def assert_scalable(
    df: DataFrame,
    allow_nested_loop: bool = False,
    allow_row_python: bool = False,
    allow_single_partition_raw: bool = False,
) -> PlanReport:
    """Raise ``PlanQualityError`` if the plan would not survive a scale-up.

    ``allow_nested_loop`` sanctions broadcast-nested-loop joins for the
    deliberate small-broadcast patterns (exact kNN's probe set);
    ``allow_single_partition_raw`` sanctions a single-partition exchange over
    un-aggregated rows for frames that are provably bounded upstream of the
    plan (rare — prefer value-grid rank-select); row-Python eval has no
    sanctioned use in this engine's hot paths.
    """
    r = plan_report(df)
    fatal = []
    if r.cartesian_products:
        fatal.append(r.warnings[0])
    if r.nested_loop_joins and not allow_nested_loop:
        fatal.append(next(w for w in r.warnings if "NestedLoop" in w))
    if r.row_python_evals and not allow_row_python:
        fatal.append(next(w for w in r.warnings if "BatchEvalPython" in w))
    if r.single_partition_raw and not allow_single_partition_raw:
        fatal.append(
            next(w for w in r.warnings if "SinglePartition over raw" in w)
        )
    if fatal:
        raise PlanQualityError("; ".join(fatal))
    return r
