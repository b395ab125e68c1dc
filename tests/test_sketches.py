"""HLL / KMV sketch accuracy and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weaviate_spark.operators.sketches import (
    hll_distinct,
    kmv_distinct,
    kmv_set_overlap,
)


def test_hll_within_error_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    est = hll_distinct(li, "l_partkey", p=12).collect()[0]["hll_estimate"]
    # p=12 -> standard error 1.04/sqrt(4096) ~= 1.6%; allow 5 sigma
    assert abs(est - exact) / exact < 0.08


def test_kmv_within_error_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    est = kmv_distinct(li, "l_partkey", k=256).collect()[0]["kmv_estimate"]
    # k=256 -> standard error ~1/sqrt(256) ~= 6.25%; allow ~4 sigma
    assert abs(est - exact) / exact < 0.25


def test_kmv_small_set_is_exact(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "v long")
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["kmv_estimate"] == 7.0


def test_hll_partition_invariant(spark, sf_dir):
    """Same estimate at any parallelism — the DECIMAL harmonic sum makes
    the result independent of reduction order."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = hll_distinct(li.repartition(1), "l_partkey").collect()[0]["hll_estimate"]
    b = hll_distinct(li.repartition(17), "l_partkey").collect()[0]["hll_estimate"]
    assert a == b


def test_kmv_overlap_identical_sets(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "v long")
    row = kmv_set_overlap(df, df, "v", k=128).collect()[0]
    assert row["jaccard_est"] == 1.0
    assert row["union_est"] == pytest.approx(row["intersect_est"])


def test_kmv_overlap_disjoint_sets(spark):
    a = spark.createDataFrame([(i,) for i in range(500)], "v long")
    b = spark.createDataFrame([(i,) for i in range(10_000, 10_500)], "v long")
    row = kmv_set_overlap(a, b, "v", k=128).collect()[0]
    assert row["jaccard_est"] == 0.0
    assert row["intersect_est"] == 0.0
    assert abs(row["union_est"] - 1000) / 1000 < 0.35


def test_parameter_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match=r"p must be"):
        hll_distinct(df, "v", p=20)
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, "v", k=1)
    with pytest.raises(ValueError, match="k must be"):
        kmv_set_overlap(df, df, "v", k=1)


def test_nulls_ignored(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "v long")
    assert kmv_distinct(df, "v").collect()[0]["kmv_estimate"] == 2.0


def test_cms_estimate_is_one_sided_and_exact_when_sparse(spark):
    """CMS never underestimates; with few distinct items vs counters it
    is exact."""
    from weaviate_spark.operators.sketches import cms_heavy_hitters

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5
    df = spark.createDataFrame(rows, "v string")
    got = {r["item"]: r for r in
           cms_heavy_hitters(df, "v", width=512, depth=4, k=10).collect()}
    for item, true in (("a", 50), ("b", 30), ("c", 5)):
        assert got[item]["true_count"] == true
        assert got[item]["cms_estimate"] >= true
        assert got[item]["cms_estimate"] == true  # sparse -> no collisions
    order = sorted(got.values(), key=lambda r: (-r["cms_estimate"], r["item"]))
    assert [r["item"] for r in order] == ["a", "b", "c"]


def test_weighted_sample_is_weight_biased_and_deterministic(spark):
    from weaviate_spark.operators.sampling import weighted_sample

    # 200 light items (w=1) and 20 heavy items (w=100)
    rows = [(i, 1.0) for i in range(200)] + [(1000 + i, 100.0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", k=30).collect()
    assert len(got) == 30
    assert [r["rank"] for r in got] == list(range(1, 31))
    heavy = sum(1 for r in got if r["id"] >= 1000)
    # E[heavy] ~ 20 * P(heavy in top); with 10:1 total weight ratio the
    # heavies dominate — demand a clear majority, not an exact law
    assert heavy >= 15
    again = weighted_sample(df, "id", "w", k=30).collect()
    assert [r["id"] for r in got] == [r["id"] for r in again]
    # zero/negative weights excluded
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double")
    only = weighted_sample(df2, "id", "w", k=5).collect()
    assert [r["id"] for r in only] == [3]


def test_histogram_quantiles_brackets_exact(spark):
    from weaviate_spark.operators.sketches import histogram_quantiles

    import numpy as np
    vals = [float(x) for x in range(1, 1001)]  # uniform 1..1000
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r["quantile"]: r for r in
            histogram_quantiles(df, "x", bins=50, quantiles=(0.5, 0.9)).collect()}
    width = (1000.0 - 1.0) / 50
    for q in (0.5, 0.9):
        exact = float(np.quantile(vals, q))
        est = rows[q]["estimate"]
        assert abs(est - exact) <= width + 1e-9  # one-bucket error bound
        assert rows[q]["n"] == 1000


def test_bloom_membership_one_sided(spark):
    from weaviate_spark.operators.sketches import bloom_membership

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [
            (2, "the quick brown fox jumps over the lazy dog today"),  # contained
            (3, "completely different words making novel shingles here now"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            bloom_membership(bench, probe, "doc_id", "text").collect()}
    # exact duplicate: every shingle exact-hits, bloom must agree (no misses)
    assert rows[2]["n_exact"] == rows[2]["n_shingles"]
    assert rows[2]["n_bloom_pos"] == rows[2]["n_shingles"]
    # disjoint doc: zero exact; bloom may only OVERcount
    assert rows[3]["n_exact"] == 0
    assert rows[3]["n_false_pos"] == rows[3]["n_bloom_pos"] >= 0
    for r in rows.values():
        assert r["n_bloom_pos"] >= r["n_exact"]


def test_gap_fill_locf_fills_missing_days(spark):
    import datetime

    from weaviate_spark.operators.analytics import gap_fill_daily

    def ts(day, h=0):
        return datetime.datetime(2024, 1, day, h)

    ev = spark.createDataFrame(
        [("a", ts(1)), ("a", ts(1, 5)), ("a", ts(4)),  # gap on 2, 3
         ("b", ts(2))],
        "event_type string, ts timestamp",
    )
    rows = {(r["event_type"], r["day"].day): r
            for r in gap_fill_daily(ev).collect()}
    assert rows[("a", 1)]["n"] == 2 and rows[("a", 1)]["was_gap"] is False
    assert rows[("a", 2)]["n"] == 0 and rows[("a", 2)]["was_gap"] is True
    assert rows[("a", 2)]["locf"] == 2  # carried from day 1
    assert rows[("a", 3)]["locf"] == 2
    assert rows[("a", 4)]["n"] == 1 and rows[("a", 4)]["locf"] == 1
    assert ("b", 1) not in rows and rows[("b", 2)]["n"] == 1
    assert len(rows) == 5  # a: days 1-4, b: day 2


def test_hll_registers_merge_equals_direct(spark):
    from pyspark.sql import functions as F

    from weaviate_spark.operators.sketches import (
        hll_estimate_registers,
        hll_group_registers,
    )

    rows = [(i % 7, f"u{i % 400}") for i in range(3000)]
    df = spark.createDataFrame(rows, "part int, val string")
    # sketch each partition separately, merge to one global register set
    per_part = hll_group_registers(df, "val", F.col("part"), "part", p=10)
    merged = (
        per_part.withColumn("all", F.lit(1))
        .groupBy("all", "_reg")
        .agg(F.max("_rho").alias("_rho"))
    )
    m = hll_estimate_registers(merged, "all", p=10).collect()[0]
    direct = hll_estimate_registers(
        hll_group_registers(df, "val", F.lit(1), "all", p=10), "all", p=10
    ).collect()[0]
    assert m["hll_estimate"] == direct["hll_estimate"]
    # estimate is in a sane band around the true 400
    assert 300 <= m["hll_estimate"] <= 500
