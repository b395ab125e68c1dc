"""Query profiling (search_get.proto MetadataRequest.query_profile /
QueryProfile reply; usecases/traverser query-profile surface): the
reference returns a per-request phase timing breakdown; the Spark
analogue reads Catalyst's QueryPlanningTracker (analysis /
optimization / planning phase durations, hottest rules) plus an
executed-plan node census and measured execution wall time.

Timings are inherently non-deterministic, so this surface is test- and
debug-facing (no SQL oracle, like the reference's own profile output).
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame


def query_profile(df: DataFrame, execute: bool = True) -> dict[str, Any]:
    """Profile one query DataFrame: returns
    {took_ms, rows, phases: {analysis/optimization/planning: ms},
    top_rules: [(rule, total_ms)], plan_nodes: {node: count},
    is_adaptive_final}. With execute=False only planning-side data is
    collected (the plan is still compiled, nothing runs)."""
    took_ms = None
    rows = None
    if execute:
        # drive THIS DataFrame's own query execution (count() would
        # compile a separate aggregate plan and leave this one
        # analysis-only / isFinalPlan=false)
        t0 = time.time()
        rows = len(df.collect())
        took_ms = round((time.time() - t0) * 1000.0, 1)

    qe = df._jdf.queryExecution()
    phases: dict[str, int] = {}
    it = qe.tracker().phases().iterator()
    while it.hasNext():
        kv = it.next()
        phases[str(kv._1())] = int(kv._2().durationMs())

    top_rules: list[tuple[str, float]] = []
    rit = qe.tracker().topRulesByTime(5).iterator()
    while rit.hasNext():
        kv = rit.next()
        # RuleSummary(totalTimeNs, numInvocations, numEffectiveInvocations)
        top_rules.append(
            (str(kv._1()).rsplit(".", 1)[-1],
             round(int(kv._2().totalTimeNs()) / 1e6, 2))
        )

    plan = qe.executedPlan().toString()
    nodes: dict[str, int] = {}
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*(0123456789)")
        name = stripped.split(" ", 1)[0].split("(", 1)[0]
        if name and name[0].isupper():
            nodes[name] = nodes.get(name, 0) + 1

    return {
        "took_ms": took_ms,
        "rows": rows,
        "phases": phases,
        "top_rules": top_rules,
        "plan_nodes": nodes,
        "is_adaptive_final": "isFinalPlan=true" in plan,
    }
