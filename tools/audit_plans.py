"""Structural audit of EVERY declared query's physical plan.

Builds each queries()[name] DataFrame at the given sf_dir and scans the
(pre-execution) physical plan string for scale anti-patterns:

- Exchange SinglePartition          (global single-task stage)
- CartesianProduct / BroadcastNestedLoopJoin (accidental cross joins)
- BatchEvalPython                   (row-at-a-time Python UDF)
- PythonUDF nodes count             (ArrowEvalPython / MapInPandas etc.)
- FileScan count per base table     (repeated corpus scans)

The plan is df.queryExecution().executedPlan() BEFORE an action, i.e.
the initial AQE plan — structure (exchanges, joins, scans) is visible
even though AQE may later coalesce. Queries that WRITE as a side
effect still execute their build work, so the audit runs them all the
same way the sweep does (build-only: no .count()).

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Writes a TSV report to stdout, one row per query.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weaviate_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    import __spark_entry__ as E

    qs = E.queries()
    print("query\tbuild_s\tsingle_part_exch\texchanges\tcartesian\tbatch_eval_py\tarrow_py\tscans\tmax_scans_one_table\ttables_multi_scanned")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}\tERR:{type(ex).__name__}")
            continue
        el = time.time() - t0
        single = len(re.findall(r"Exchange SinglePartition", plan))
        exch = len(re.findall(r"\bExchange\b", plan))
        cart = len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan))
        bep = len(re.findall(r"BatchEvalPython", plan))
        arrow = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow", plan))
        # per-table scan counts from FileScan paths
        scans = re.findall(r"FileScan \w+ ", plan)
        per_table: dict[str, int] = {}
        for m in re.finditer(r"Location: InMemoryFileIndex[^\n]*\[([^\]]*)\]", plan):
            path = m.group(1)
            base = os.path.basename(path.rstrip("/").split(",")[0])
            per_table[base] = per_table.get(base, 0) + 1
        multi = {t: c for t, c in per_table.items() if c > 1}
        mx = max(per_table.values()) if per_table else 0
        print(f"{name}\t{el:.2f}\t{single}\t{exch}\t{cart}\t{bep}\t{arrow}\t{len(scans)}\t{mx}\t{';'.join(f'{t}:{c}' for t, c in sorted(multi.items()))}")
    spark.stop()


if __name__ == "__main__":
    main()
