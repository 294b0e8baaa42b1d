"""Plan diagnostics: turn ``df.explain()`` text into a structured report
so scale reviews (and tests) can assert on plan SHAPE — exchanges,
pushed filters, Python nodes, codegen coverage — instead of eyeballing
explain output.

This is the tooling form of the repo's standing rule: after an operator
works, audit its physical plan until it is the plan you would want at
100 TB. tests/ use it to pin plan contracts; users can call it on any
DataFrame the engine returns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    exchanges: int = 0
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    nested_loop_joins: int = 0
    python_evals: int = 0
    scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    codegen_spans: int = 0
    text: str = ""

    @property
    def python_free(self) -> bool:
        return self.python_evals == 0

    def summary(self) -> str:
        return (
            f"exchanges={self.exchanges} bhj={self.broadcast_joins} "
            f"smj={self.sortmerge_joins} bnlj={self.nested_loop_joins} "
            f"python={self.python_evals} scans={self.scans} "
            f"codegen_spans={self.codegen_spans} "
            f"pushed={len(self.pushed_filters)} "
            f"part_filters={len(self.partition_filters)}"
        )


def plan_report(df: DataFrame) -> PlanReport:
    """Parse the EXECUTED physical plan of ``df`` into a PlanReport.

    Reads the plan only — does not run the query. Under AQE the plan
    string is not final (and codegen spans are not marked) until an
    action has executed the query — run an action first when asserting
    on codegen_spans or AQE-chosen join strategies.
    """
    text = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints BOTH the final and the initial
    # plan — counting across both would double every node
    cut = text.find("== Initial Plan ==")
    if cut != -1:
        text = text[:cut]
    r = PlanReport(text=text)
    r.exchanges = len(re.findall(r"\bExchange\b", text))
    r.broadcast_joins = text.count("BroadcastHashJoin")
    r.sortmerge_joins = text.count("SortMergeJoin")
    r.nested_loop_joins = text.count("BroadcastNestedLoopJoin") + text.count(
        "CartesianProduct"
    )
    r.python_evals = (
        text.count("ArrowEvalPython")
        + text.count("BatchEvalPython")
        + text.count("FlatMapGroupsInPandas")
        + text.count("MapInPandas")
    )
    r.scans = len(re.findall(r"FileScan|Scan parquet", text))
    r.pushed_filters = [
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text)
        if m.group(1).strip()
    ]
    r.partition_filters = [
        m.group(1)
        for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text)
        if m.group(1).strip()
    ]
    stars = set(re.findall(r"\*\((\d+)\)", text))
    r.codegen_spans = len(stars) or text.count("WholeStageCodegen")
    return r
