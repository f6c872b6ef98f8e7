"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY.md §4.1) — everything in this
module exists to *prove* our plans exploit the one Spark provides:
filters reach the parquet scan, projections prune columns, small
dimensions broadcast, aggregates are partial+final, and hot
expressions stay inside whole-stage codegen. Tests assert on these
(tests/test_plans.py) so a regression that silently de-optimizes a
plan fails CI, not a 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string ``df.explain(mode)`` would print."""
    jdf = df._jdf  # noqa: SLF001 - no public accessor for the string
    jvm = df.sparkSession._jvm  # noqa: SLF001
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(em)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out = []
    for line in explain_str(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip().strip("[]")
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — what each scan actually reads (column
    pruning evidence)."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in explain_str(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in the physical plan."""
    names = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    plan = explain_str(df)
    return [n for n in names if n in plan]


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the plan splits the aggregate into partial + final
    (map-side combine before the exchange)."""
    plan = explain_str(df)
    return "partial_" in plan or "Partial" in plan


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen stages in the *final* plan. AQE only
    reports codegen after execution, so this runs the plan."""
    df.collect()
    plan = explain_str(df, "formatted")
    ids = {
        line.strip()
        for line in plan.splitlines()
        if "codegen id :" in line
    }
    return len(ids)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the metric to
    minimize. Broadcast exchanges don't count (they're the point);
    after AQE finalizes, only the Final Plan section is scanned."""
    plan = explain_str(df, "simple")
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    )


def node_subtrees(plan: str, match) -> list[list[str]]:
    """For every node line of a 'simple'-mode plan tree satisfying
    ``match(stripped_line)``, return its INPUT SUBTREE as a list of
    stripped node lines — parsed from Spark's tree-drawing
    indentation (each level is a 3-char group of ``'   '`` or
    ``':  '`` followed by ``'+- '`` / ``':- '``). This is what lets
    checks reason about *which* operator feeds a node ("is this
    unpartitioned window's input post-aggregate?", "is this broadcast
    side filtered?") instead of grepping the whole plan. AQE's
    Initial Plan section is excluded like shuffle_count does."""
    import re

    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    mark = re.compile(r"^((?:   |:  )*)(?:[+:]- )(.*)$")
    nodes: list[tuple[int, str]] = []
    for line in plan.splitlines():
        m = mark.match(line)
        if m:
            nodes.append((len(m.group(1)) // 3 + 1, m.group(2).strip()))
        elif line.strip():
            nodes.append((0, line.strip()))
    out: list[list[str]] = []
    for i, (depth, text) in enumerate(nodes):
        if not match(text):
            continue
        sub = []
        for d2, t2 in nodes[i + 1 :]:
            if d2 <= depth:
                break
            sub.append(t2)
        out.append(sub)
    return out


def window_input_bounded(plan: str, node: str) -> bool:
    """Mechanical boundedness check for a whitelisted UNPARTITIONED
    window (r8, closing the r7 verdict's "prose adjudication alone"
    gap): the window's INPUT SUBTREE must contain an Aggregate or a
    TakeOrderedAndProject node — the two plan shapes that collapse a
    fact-scale input to a bounded row set (calendar/grid/post-agg
    cells are aggregate outputs; top-k rank attaches sit on
    TakeOrdered). A whitelist entry whose window feeds directly off a
    fact scan (the sequence_packing r6 shape) fails this even if its
    prose reason still reads plausibly — a renamed column or an
    upstream join can't silently grow a "bounded" input back to fact
    scale. Heuristic, not a proof: an aggregate BY A FACT-SCALE KEY
    also passes — the audit pairs this with the human-reviewed reason
    string. ``node`` is a stripped plan line as returned by
    ``unpartitioned_window_nodes``; all occurrences must be bounded."""
    import re

    subs = node_subtrees(plan, lambda s: s == node or s.endswith(node))
    marker = re.compile(
        r"^(\*\(\d+\) )?((Hash|Sort|ObjectHash)Aggregate"
        r"|TakeOrderedAndProject)"
    )
    return bool(subs) and all(
        any(marker.match(line) for line in sub) for sub in subs
    )


def unpartitioned_window_nodes(plan: str) -> list[str]:
    """Window operators with NO partition spec — each moves its whole
    input through ONE task ("No Partition Defined for Window"), the
    plan shape that serializes a fact table at 100 TB (the r6 verdict's
    sequence_packing finding survived the old audit precisely because
    only cartesian/BNLJ were swept).

    Physical ``Window`` nodes print 1-3 top-level bracket groups:
    ``Window [exprs], [partitionCols], [orderSpec]`` when fully
    specified, ``Window [exprs], [G2]`` when one of the two specs is
    empty, ``Window [exprs]`` when both are. At 2 groups the node is
    unpartitioned only when G2 is an ORDER spec (its entries carry
    ``ASC``/``DESC``); a bare column list is a partition-no-order
    window, which shuffles by key and is fine. Bracket depth is
    tracked (window exprs may nest lambdas); AQE's Initial Plan
    section is excluded like shuffle_count does.
    """
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    out = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ").strip()
        # WindowGroupLimit prints only (partition, order) groups and
        # always rides with a Window node, so only Window is checked.
        if not s.startswith("Window "):
            continue
        depth = 0
        groups: list[str] = []
        cur: list[str] = []
        for ch in s:
            if ch == "[":
                if depth == 0:
                    cur = []
                else:
                    cur.append(ch)
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                else:
                    cur.append(ch)
            elif depth > 0:
                cur.append(ch)
        if len(groups) >= 3:
            continue  # partition + order both present
        if len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            continue  # partitioned, no order spec
        out.append(s)
    return out
