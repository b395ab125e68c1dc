"""Per-query profiling for the headline bench (optimization guide §1).

For each headline query, after the same warmup as bench.py, measures:
  * build_sec   — driver-side DataFrame construction (fn(spark, sf_dir)),
                  i.e. plan construction + any stats collects at build time
  * cold_sec    — first count() (analysis + codegen + AQE replans)
  * steady_sec  — median of 5 subsequent count() runs
  * noop_sec    — median of 3 noop-sink writes (computes EVERY column;
                  count() can prune — guide §1.4). Reported separately,
                  never replaces the bench's count() methodology.
  * jobs/stages/tasks — Spark jobs launched by one steady count() run
  * py_nodes    — BatchEvalPython/ArrowEvalPython/MapInPandas/FlatMapGroupsInPandas
                  nodes in the executed plan

Usage: python tools/profile_bench.py [sf_dir] [query ...]
Writes JSON to stdout (one object), human table to stderr.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weaviate_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("weaviate-spark-profile")
    from weaviate_spark.entry_queries import QUERIES
    from bench import HEADLINE

    only = sys.argv[2:]
    names = only or HEADLINE

    # identical warmup to bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for warm_sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            fn = QUERIES.get(name)
            if fn is not None and os.path.isdir(warm_sf) and warm_sf != sf_dir:
                try:
                    fn(spark, warm_sf).count()
                except Exception:
                    pass
    try:
        from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, with_materialized_stats
        from weaviate_spark.operators.dedup import with_shingle_table
        from weaviate_spark.sources.tables import load_table
        for coll in ("documents", "docs_embedded"):
            spec = BM25Spec(collection=coll, query="", properties=[BM25Prop("text")],
                            id_col="doc_id")
            with_materialized_stats(spec, load_table(spark, sf_dir, coll), (sf_dir, coll))
        with_shingle_table(
            load_table(spark, sf_dir, "documents"), "doc_id", "text", 3,
            (sf_dir, "documents"),
        )
        from weaviate_spark.operators.quantization import build_bq_artifact
        build_bq_artifact(spark, sf_dir, "embeddings")
    except Exception as ex:
        print(f"warmup artifact build failed: {ex}", file=sys.stderr)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        sc.setJobDescription(f"profile:{name}")
        # build time (driver-side)
        t0 = time.time()
        df = fn(spark, sf_dir)
        build = time.time() - t0
        # cold run
        t0 = time.time()
        df.count()
        cold = time.time() - t0
        # steady runs, rebuilt each time like bench.py does
        runs = []
        for _ in range(5):
            t0 = time.time()
            d2 = fn(spark, sf_dir)
            d2.count()
            runs.append(time.time() - t0)
        steady = sorted(runs)[2]
        # job/stage/task count for ONE steady run
        sc.setJobGroup(f"prof_{name}", name)
        d3 = fn(spark, sf_dir)
        d3.count()
        job_ids = tracker.getJobIdsForGroup(f"prof_{name}")
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        sc.setJobGroup("default", "")
        # noop sink (guide §1.4) — computes every column
        noop_runs = []
        for _ in range(3):
            d4 = fn(spark, sf_dir)
            t0 = time.time()
            d4.write.format("noop").mode("overwrite").save()
            noop_runs.append(time.time() - t0)
        noop = sorted(noop_runs)[1]
        plan = d3._jdf.queryExecution().executedPlan().toString()
        py_nodes = len(re.findall(
            r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow",
            plan))
        out[name] = {
            "build_sec": round(build, 3),
            "cold_sec": round(cold, 3),
            "steady_sec": round(steady, 3),
            "noop_sec": round(noop, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
            "py_nodes": py_nodes,
        }
        print(f"{name:28s} build={build:6.3f} cold={cold:6.3f} "
              f"steady={steady:6.3f} noop={noop:6.3f} jobs={len(job_ids):2d} "
              f"stages={n_stages:3d} tasks={n_tasks:4d} py={py_nodes}",
              file=sys.stderr)
        sc.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "profile": out}))
    spark.stop()


if __name__ == "__main__":
    main()
