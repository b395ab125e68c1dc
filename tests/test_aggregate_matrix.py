"""Aggregation matrix fixtures ported from the reference acceptance
suite (test/acceptance/graphql_resolvers/local_aggregate_matrix_setup_test.go
ArrayClass objects; expected values from
local_aggregate_matrix_no_groupby_test.go:26-41 — element-level counts
over 7 docs: texts 10 els [Alpha x4, Bravo x3, Charlie x2, Delta x1],
numbers count 10 max 4 min 1 mode 1 sum 20 median 2 mean 2, ints count
10 max 104 min 101 mode 101 sum 1020 median 102 mean 102, booleans
count 10 totalFalse 4 totalTrue 6)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def array_class(spark):
    rows = [
        (1, ["Alpha", "Bravo", "Charlie", "Delta"], [1.0, 2.0, 3.0, 4.0],
         [101, 102, 103, 104], [True, True, True, False]),
        (2, ["Alpha", "Bravo", "Charlie"], [1.0, 2.0, 3.0],
         [101, 102, 103], [True, True, False]),
        (3, ["Alpha", "Bravo"], [1.0, 2.0], [101, 102], [True, False]),
        (4, ["Alpha"], [1.0], [101], [False]),
        (5, [], [], [], []),
        (6, None, None, None, None),
        (7, [], [], [], []),
    ]
    return spark.createDataFrame(
        rows,
        "id long, texts array<string>, numbers array<double>, "
        "ints array<long>, booleans array<boolean>",
    )


def _agg(spark, df, props, **kw):
    """Run aggregate() against an in-memory frame via a temp view-free
    monkeypatch of load_table."""
    from unittest import mock
    import weaviate_spark.operators.aggregate as agg_mod
    from weaviate_spark.operators.aggregate import AggregateSpec, aggregate

    with mock.patch.object(agg_mod, "load_table", lambda s, sf, c: df):
        return aggregate(spark, "", AggregateSpec(
            collection="ArrayClass", properties=props, **kw))


def test_array_matrix_no_groupby(spark, array_class):
    from weaviate_spark.operators.aggregate import PropertyAgg

    row = _agg(spark, array_class, [
        PropertyAgg("numbers", ["count", "minimum", "maximum", "sum", "mean",
                                "median", "mode"]),
        PropertyAgg("ints", ["count", "minimum", "maximum", "sum", "mean",
                             "median", "mode"]),
        PropertyAgg("booleans", ["count", "totalTrue", "totalFalse",
                                 "percentageTrue", "percentageFalse"]),
    ], include_meta_count=True).collect()[0]

    assert row["meta_count"] == 7
    assert row["numbers_count"] == 10
    assert row["numbers_minimum"] == 1.0 and row["numbers_maximum"] == 4.0
    assert row["numbers_sum"] == 20.0 and row["numbers_mean"] == 2.0
    assert row["numbers_median"] == 2.0 and row["numbers_mode"] == 1.0
    assert row["ints_count"] == 10
    assert row["ints_minimum"] == 101 and row["ints_maximum"] == 104
    assert row["ints_sum"] == 1020 and row["ints_mean"] == 102.0
    assert row["ints_median"] == 102.0 and row["ints_mode"] == 101
    assert row["booleans_count"] == 10
    assert row["booleans_totalTrue"] == 6 and row["booleans_totalFalse"] == 4
    assert abs(row["booleans_percentageTrue"] - 0.6) < 1e-12
    assert abs(row["booleans_percentageFalse"] - 0.4) < 1e-12


def test_array_matrix_text_top_occurrences(spark, array_class):
    from unittest import mock
    import weaviate_spark.operators.aggregate as agg_mod
    from weaviate_spark.operators.aggregate import top_occurrences

    with mock.patch.object(agg_mod, "load_table", lambda s, sf, c: array_class):
        rows = top_occurrences(spark, "", "ArrayClass", "texts", limit=10).collect()
    got = [(r["value"], r["occurs"]) for r in rows]
    assert got == [("Alpha", 4), ("Bravo", 3), ("Charlie", 2), ("Delta", 1)]


def test_array_matrix_filtered(spark, array_class):
    """Where-filter narrowing to docs with data (matrix
    WithWhereFilter_ResultsWithData: ids 3,4 -> numbers count 3, sum 4,
    mean 1.3333..; reference asserts the same element semantics)."""
    from weaviate_spark.operators.aggregate import PropertyAgg

    filtered = array_class.where(F.col("id").isin(3, 4))
    row = _agg(spark, filtered, [
        PropertyAgg("numbers", ["count", "sum", "mean", "minimum", "maximum"]),
    ], include_meta_count=True).collect()[0]
    assert row["meta_count"] == 2
    assert row["numbers_count"] == 3
    assert row["numbers_sum"] == 4.0
    assert abs(row["numbers_mean"] - 4.0 / 3) < 1e-12


def test_array_matrix_grouped(spark, array_class):
    """Array aggs compose with groupBy: group by a derived bucket."""
    from weaviate_spark.operators.aggregate import PropertyAgg

    df = array_class.withColumn("bucket", (F.col("id") <= 3).cast("string"))
    rows = {r["bucket"]: r for r in _agg(spark, df, [
        PropertyAgg("numbers", ["count", "sum"]),
    ], group_by="bucket", include_meta_count=True).collect()}
    assert rows["true"]["numbers_count"] == 9 and rows["true"]["numbers_sum"] == 19.0
    assert rows["false"]["numbers_count"] == 1 and rows["false"]["numbers_sum"] == 1.0
    assert rows["false"]["meta_count"] == 4


def test_array_matrix_empty_and_null_only(spark, array_class):
    """Docs with only empty/null arrays: element count 0, aggregates null
    (matrix ResultsWithoutData assertions)."""
    from weaviate_spark.operators.aggregate import PropertyAgg

    filtered = array_class.where(F.col("id").isin(5, 6, 7))
    row = _agg(spark, filtered, [
        PropertyAgg("numbers", ["count", "sum", "mean"]),
    ], include_meta_count=True).collect()[0]
    assert row["meta_count"] == 3
    assert (row["numbers_count"] or 0) == 0
    assert row["numbers_sum"] is None


def test_array_matrix_dates(spark):
    """dateArray element aggregation (matrix fixture dates column):
    element-level count / min / max over timestamp arrays."""
    from datetime import datetime
    from weaviate_spark.operators.aggregate import PropertyAgg

    def d(y):
        return datetime(y, 6, 1, 22, 18, 59)

    rows = [
        (1, [d(2021), d(2022), d(2023), d(2024)]),
        (2, [d(2021), d(2022), d(2023)]),
        (3, [d(2021), d(2022)]),
        (4, [d(2021)]),
        (5, []),
        (6, None),
        (7, []),
    ]
    df = spark.createDataFrame(rows, "id long, dates array<timestamp>")
    row = _agg(spark, df, [
        PropertyAgg("dates", ["count", "minimum", "maximum"]),
    ], include_meta_count=True).collect()[0]
    assert row["meta_count"] == 7
    assert row["dates_count"] == 10
    assert row["dates_minimum"] == d(2021)
    assert row["dates_maximum"] == d(2024)
