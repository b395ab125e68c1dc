"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each headline query is materialized via a count() of the result (the
driver collects separately for correctness; here we want pure engine
wall-clock without pandas conversion).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weaviate_spark.session import get_spark  # noqa: E402

# one representative per SURVEY §2 family (BASELINE.md bench plan)
HEADLINE = [
    "filter_sort_limit",        # filter+sort+limit
    "agg_pricing_summary",      # groupBy aggregate
    "agg_median_mode",          # exact median / mode
    "ref_fact_join_agg",        # ref-style join + aggregate
    "bm25_topk",                # BM25 top-k
    "knn_cosine_topk",          # exact nearVector top-k
    "hybrid_relative_score",    # hybrid fusion
    "dedup_minhash_lsh",        # minhash near-dup (LLM-pipeline extra)
    "text_quality_scores",      # text analysis (LLM-pipeline extra)
    "events_windowed_counts",   # windowed event aggregation (streaming-shaped)
    "knn_classification",       # kNN classification join
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("weaviate-spark-bench")
    from weaviate_spark.entry_queries import QUERIES

    # JVM/codegen warmup: run every headline query shape once at the
    # smallest sf so timed numbers measure steady-state engine time, not
    # first-execution whole-stage-codegen JIT (a long-lived cluster is
    # always warm; repeated runs confirm ~5x JIT-vs-warm gap locally)
    warm_sf = "/root/testdata/sf0.001"
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is not None and os.path.isdir(warm_sf):
            try:
                fn(spark, warm_sf).count()
            except Exception:
                pass

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)

    print(json.dumps({
        "metric": "headline query wall-clock (weaviate_spark, local)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
