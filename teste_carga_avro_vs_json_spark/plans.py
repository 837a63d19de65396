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
    expensive_filters: list[str] = field(default_factory=list)
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


# Expression markers that are per-row EXPENSIVE (interpreted HOF lambdas,
# regex engines, per-element array passes). Catalyst's predicate pushdown
# substitutes aliased expressions into a Filter it pushes through a
# Project with NO cost model — a gate referencing scored columns becomes
# a Filter re-running the full scoring tree per input row, on top of the
# Project above re-running it for survivors (corpus_clean measured ~16x
# the scoring cost before its r7 restructure). This marker scan makes
# that failure mode machine-visible per plan.
_EXPENSIVE_MARKERS = (
    "lambdafunction",  # any higher-order function (filter/transform/...)
    "split(",
    "regexp_",
    "rlike",
    "array_intersect",
    "sentences(",
)


def expensive_filter_nodes(df: DataFrame) -> list[str]:
    """Filter nodes whose CONDITION evaluates expensive expressions.

    Walks the physical tree (AQE/QueryStage-aware, cache builds
    excluded, same traversal as :func:`executed_exchanges`) and returns
    a one-line summary per offending FilterExec: the markers found and
    a clipped condition snippet. A hit is not automatically a bug —
    one-shot verification predicates (e.g. ``jaccard >= t``) legitimately
    compute their value in the filter — but a hit whose expression tree
    also feeds a Project above is the pushdown-duplication smell, and a
    hit with a WIDE expanded tree (the corpus_clean case: every score
    column substituted into one gate) is a restructure candidate.
    """

    hits: list[str] = []

    def walk(node, in_cache: bool) -> None:
        name = node.getClass().getSimpleName()
        if name in ("FilterExec", "Filter"):
            try:
                cond = node.condition().toString()
            except Exception:
                cond = node.toString().splitlines()[0]
            found = sorted({m for m in _EXPENSIVE_MARKERS if m in cond})
            if found:
                clip = cond if len(cond) <= 160 else cond[:157] + "..."
                where = "cache-build: " if in_cache else ""
                hits.append(f"[{','.join(found)}] {where}{clip}")
        kids = []
        try:
            if name.startswith("AdaptiveSparkPlan"):
                kids = [node.executedPlan()]
            elif name.endswith("QueryStageExec"):
                kids = [node.plan()]
            elif name.startswith("InMemoryTableScan"):
                # Unlike the exchange counter (which excludes cache
                # builds because their shuffles are paid once), an
                # expensive filter INSIDE a cache build still runs per
                # row at materialization — the r7 _shingled
                # double-shingling hid exactly here. Descend, tagged.
                kids = [node.relation().cachedPlan()]
                for k in kids:
                    walk(k, True)
                return
        except Exception:
            kids = []
        if not kids:
            ch = node.children()
            kids = [ch.apply(i) for i in range(ch.length())]
        for k in kids:
            walk(k, in_cache)

    walk(df._jdf.queryExecution().executedPlan(), False)
    return hits


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
        expensive_filters=expensive_filter_nodes(df),
    )
    if a.cartesian:
        a.warnings.append("CartesianProduct present — O(n^2) at scale")
    if a.python_evals:
        a.warnings.append(
            f"{a.python_evals} Python eval node(s) — confirm Arrow-batched and off the hot path"
        )
    return a
