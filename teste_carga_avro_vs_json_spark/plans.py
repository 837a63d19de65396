"""Plan-audit helpers: machine-checkable scale properties of a plan.

The 100 TB design rules (SURVEY.md §4, repo guidelines) are stated as
predicates over the *physical* plan so tests and tools can enforce
them: filters pushed to scans, no cartesian products, broadcast where a
side is small, no Python eval in hot paths, partial→final aggregation.
``tests/test_plan_shapes.py`` pins these per operator;
``tools/plan_audit.py`` prints the audit for every registry query.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def compact_plan(df: DataFrame) -> str:
    """The executed-plan string ('*(n)' marks whole-stage codegen)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') text (shows PushedFilters / ReadSchema)."""
    jvm = df._sc._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@dataclass
class PlanAudit:
    """Scale-relevant facts extracted from a physical plan."""

    exchanges: int = 0
    python_evals: int = 0
    codegen_spans: int = 0
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    cartesian: int = 0
    bnl_joins: int = 0
    hash_aggregates: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


def executed_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges the query itself executes, counted by walking
    the physical-plan TREE. A string count over ``toString`` double
    counts: an InMemoryRelation's build plan (including any repartition
    exchange paid once at cache materialization) is re-printed inline
    under every InMemoryTableScan that reads it. In the tree,
    InMemoryTableScanExec is a leaf — its build plan is a separate
    query execution — so cache-internal exchanges are correctly
    excluded, and ReusedExchange wrappers aren't counted as new
    shuffles. AdaptiveSparkPlan / QueryStage wrappers are descended
    through (both are leaves in ``children()`` terms)."""

    def walk(node) -> int:
        name = node.getClass().getSimpleName()
        n = 1 if name.startswith("ShuffleExchange") else 0
        kids = []
        try:
            if name.startswith("AdaptiveSparkPlan"):
                kids = [node.executedPlan()]
            elif name.endswith("QueryStageExec"):
                kids = [node.plan()]
        except Exception:
            kids = []
        if not kids:
            ch = node.children()
            kids = [ch.apply(i) for i in range(ch.length())]
        return n + sum(walk(k) for k in kids)

    return walk(df._jdf.queryExecution().executedPlan())


def audit(df: DataFrame) -> PlanAudit:
    plan = compact_plan(df)
    fmt = formatted_plan(df)
    a = PlanAudit(
        exchanges=executed_exchanges(df),
        python_evals=plan.count("EvalPython"),
        codegen_spans=len({tok for tok in plan.split() if tok.startswith("*(")}),
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        cartesian=plan.count("CartesianProduct"),
        bnl_joins=plan.count("BroadcastNestedLoopJoin"),
        hash_aggregates=plan.count("HashAggregate"),
        pushed_filters=[
            line.strip()
            for line in fmt.splitlines()
            if "PushedFilters" in line and "PushedFilters: []" not in line
        ],
    )
    if a.cartesian:
        a.warnings.append("CartesianProduct present — O(n^2) at scale")
    if a.python_evals:
        a.warnings.append(
            f"{a.python_evals} Python eval node(s) — confirm Arrow-batched and off the hot path"
        )
    return a
