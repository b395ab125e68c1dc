"""M2: aggregation edge semantics from the reference
(adapters/repos/db/aggregator/numerical.go, boolean.go, text.go)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_mode_smallest_tie(spark, tmp_path):
    # numerical.go:107-124 — tie -> smallest value wins
    df = spark.createDataFrame(
        [(1, 5.0), (1, 5.0), (1, 3.0), (1, 3.0), (1, 9.0)], ["g", "v"]
    )
    path = str(tmp_path / "modetie.parquet")
    df.write.parquet(path)
    from weaviate_spark.operators.aggregate import _mode_df

    out = _mode_df(spark.read.parquet(path), ["g"], "v").collect()
    assert out[0]["v_mode"] == 3.0


def test_median_even_count(spark):
    # numerical.go:208-231 — even N -> mean of middle pair (not a member)
    df = spark.createDataFrame([(1.0,), (2.0,), (4.0,), (10.0,)], ["v"])
    got = df.agg(F.percentile("v", F.lit(0.5)).alias("m")).collect()[0]["m"]
    assert got == 3.0


def test_top_occurrences_limit_and_ties(spark, sf_dir):
    from weaviate_spark.operators.aggregate import top_occurrences

    out = top_occurrences(spark, sf_dir, "customer", "c_mktsegment", limit=2).collect()
    assert len(out) == 2
    assert out[0]["occurs"] >= out[1]["occurs"]


def test_array_group_by_explode(spark):
    # grouped.go:63 — array property: object appears in each element's group
    from weaviate_spark.operators.aggregate import AggregateSpec

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b"]), (3, [])], "id int, tags array<string>"
    )
    exploded = df.withColumn("tags", F.explode("tags"))
    counts = {r["tags"]: r["cnt"] for r in exploded.groupBy("tags").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == {"a": 1, "b": 2}


def test_boolean_percentages(spark):
    df = spark.createDataFrame([(True,), (True,), (False,), (None,)], "b boolean")
    row = df.agg(
        F.sum(F.col("b").cast("int")).alias("t"),
        (F.sum(F.col("b").cast("int")) / F.count("b")).alias("pct"),
    ).collect()[0]
    # count excludes nulls (count(prop) semantics)
    assert row["t"] == 2 and abs(row["pct"] - 2 / 3) < 1e-12
