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


def test_type_and_pointing_to_aggregators(spark, sf_dir):
    """Schema-level aggregators report reference strings
    (traverser_aggregate.go:136-177, traverser_aggregate_test.go:198-243):
    type buckets numerical/boolean/text/date/cref, schemaType = the
    declared DataType ('cref' for refs), pointingTo = target classes."""
    from weaviate_spark.operators.aggregate import AggregateSpec, PropertyAgg, aggregate
    from weaviate_spark.schema import Collection, Property

    coll = Collection("customer", properties=[
        Property("c_name", "text"),
        Property("c_custkey", "int"),
        Property("c_acctbal", "number"),
        Property("c_tags", "text[]"),
        Property("c_orders", "Orders"),
    ])
    row = aggregate(spark, sf_dir, AggregateSpec(
        collection="customer",
        properties=[
            PropertyAgg("c_name", ["type"]),
            PropertyAgg("c_custkey", ["type"]),
            PropertyAgg("c_acctbal", ["type"]),
            PropertyAgg("c_tags", ["type"]),
            PropertyAgg("c_orders", ["type", "pointingTo"]),
        ],
        schema=coll,
    )).collect()[0]
    assert (row["c_name_type"], row["c_name_schema_type"]) == ("text", "text")
    assert (row["c_custkey_type"], row["c_custkey_schema_type"]) == ("numerical", "int")
    assert (row["c_acctbal_type"], row["c_acctbal_schema_type"]) == ("numerical", "number")
    assert (row["c_tags_type"], row["c_tags_schema_type"]) == ("text", "text[]")
    assert (row["c_orders_type"], row["c_orders_schema_type"]) == ("cref", "cref")
    assert row["c_orders_pointing_to"] == ["Orders"]


def test_type_aggregator_alongside_data_aggs(spark, sf_dir):
    from weaviate_spark.operators.aggregate import AggregateSpec, PropertyAgg, aggregate
    from weaviate_spark.schema import Collection, Property

    coll = Collection("customer", properties=[Property("c_acctbal", "number")])
    row = aggregate(spark, sf_dir, AggregateSpec(
        collection="customer",
        properties=[PropertyAgg("c_acctbal", ["count", "type"])],
        include_meta_count=True,
        schema=coll,
    )).collect()[0]
    assert row["c_acctbal_count"] == row["meta_count"] > 0
    assert row["c_acctbal_type"] == "numerical"


def test_type_aggregator_requires_schema(spark, sf_dir):
    import pytest
    from weaviate_spark.operators.aggregate import AggregateSpec, PropertyAgg, aggregate

    with pytest.raises(ValueError, match="schema"):
        aggregate(spark, sf_dir, AggregateSpec(
            collection="customer",
            properties=[PropertyAgg("c_acctbal", ["type"])],
        ))
