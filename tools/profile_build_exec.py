"""Split each headline query's steady-state time into DRIVER BUILD
(fn(spark, sf_dir) — plan construction, py4j round trips, any driver-side
stats lookups) vs EXECUTE (count()). Medians of 5 after the bench warmup.

Usage: python tools/profile_build_exec.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weaviate_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("weaviate-spark-profile2")
    from weaviate_spark.entry_queries import QUERIES
    from bench import HEADLINE

    names = sys.argv[2:] or HEADLINE

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

    out = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        fn(spark, sf_dir).count()  # cold at this sf
        builds, execs = [], []
        for _ in range(5):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b, e = sorted(builds)[2], sorted(execs)[2]
        out[name] = {"build": round(b, 3), "exec": round(e, 3),
                     "total": round(b + e, 3)}
        print(f"{name:28s} build={b:6.3f} exec={e:6.3f} total={b+e:6.3f}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "split": out}))
    spark.stop()


if __name__ == "__main__":
    main()
