"""M3: cross-reference joins (SURVEY §2.3)."""

from __future__ import annotations


def test_nested_resolution_shape(spark, sf_dir):
    from weaviate_spark.operators.refs import resolve_reference_nested

    out = resolve_reference_nested(
        spark, sf_dir, "nation", "inRegion", ["r_name"]
    )
    row = out.where(out["n_nationkey"] == 0).collect()[0]
    # ref property is an array of resolved objects with _id + selected props
    assert len(row["inRegion"]) == 1
    assert set(row["inRegion"][0].asDict()) == {"_id", "r_name"}


def test_ref_filter_no_duplicates(spark, sf_dir):
    # semi-join must not duplicate parents with multiple matching children
    from weaviate_spark.operators.refs import ref_filter
    from weaviate_spark.filters import Clause

    out = ref_filter(
        spark, sf_dir, "customer", "inNation",
        target_where=Clause(operator="GreaterThanEqual", path=["n_nationkey"], value=0),
    )
    total = out.count()
    distinct = out.select("c_custkey").distinct().count()
    assert total == distinct


def test_ref_count_zero_children(spark, sf_dir):
    from weaviate_spark.operators.refs import ref_count
    from pyspark.sql import functions as F

    out = ref_count(spark, sf_dir, "customer", "orders", "byCustomer")
    # customers without orders must appear with count 0, not drop out
    n_cust = out.count()
    from weaviate_spark.sources.tables import load_table

    assert n_cust == load_table(spark, sf_dir, "customer").count()
    assert out.where(F.col("ref_count").isNull()).count() == 0
