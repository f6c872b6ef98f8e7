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
