"""Acceptance suite over the City/Country/Airport fixture
(FIXTURES.md §A1, mirroring test/helper/sample-schema/cities/cities.go and
the test/acceptance/graphql_resolvers/ suites): every primitive type, geo,
refs, nulls ("Missing Island"), arrays, sort, vector order."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from weaviate_spark.filters import Clause, GeoRange, apply_where


@pytest.fixture(scope="module")
def cities(spark):
    rows = [
        # name, country, population, (lat, lon), isCapital, cityArea,
        # cityRights, timezones, museums, history, _vector
        ("Amsterdam", "Netherlands", 1800000, (52.366667, 4.9),
         True, 891.95, datetime.datetime(1400, 1, 1), ["CET", "CEST"],
         ["Rijksmuseum", "Stedelijk Museum"], "canals and commerce", [1.0, 0.0, 0.0, 0.0]),
        ("Rotterdam", "Netherlands", 600000, (51.925, 4.477778),
         False, 319.35, datetime.datetime(1283, 1, 1), ["CET", "CEST"],
         ["Boijmans Van Beuningen"], "busiest port of europe", [0.9, 0.1, 0.0, 0.0]),
        ("Berlin", "Germany", 3470000, (52.52, 13.405),
         True, 891.68, datetime.datetime(1237, 1, 1), ["CET", "CEST"],
         ["German Historical Museum", "Rijksmuseum"], "divided and reunited city", [0.0, 1.0, 0.0, 0.0]),
        ("Dusseldorf", "Germany", 612000, (51.225, 6.782778),
         False, 217.22, datetime.datetime(1288, 1, 1), ["CET", "CEST"],
         [], "fashion and trade fairs", [0.0, 0.8, 0.2, 0.0]),
        # the "Missing Island" pattern: nulls in population/location/cityArea
        ("Missing Island", "Netherlands", None, None,
         False, None, None, None, None, None, [0.0, 0.0, 0.0, 1.0]),
    ]
    schema = (
        "name string, country string, population long, "
        "location struct<latitude:double,longitude:double>, isCapital boolean, "
        "cityArea double, cityRights timestamp, timezones array<string>, "
        "museums array<string>, history string, _vector array<float>"
    )
    return spark.createDataFrame(
        [tuple(r) for r in rows], schema
    ).cache()


def _names(df):
    return sorted(r["name"] for r in df.collect())


def test_int_filters(cities):
    # local_get_with_filter_test.go: population ranges; nulls never match
    out = apply_where(cities, Clause(operator="GreaterThan", path=["population"], value=1_000_000))
    assert _names(out) == ["Amsterdam", "Berlin"]
    out = apply_where(cities, Clause(operator="LessThanEqual", path=["population"], value=612_000))
    assert _names(out) == ["Dusseldorf", "Rotterdam"]


def test_null_filter(cities):
    out = apply_where(cities, Clause(operator="IsNull", path=["population"], value=True))
    assert _names(out) == ["Missing Island"]
    out = apply_where(cities, Clause(operator="IsNull", path=["population"], value=False))
    assert len(out.collect()) == 4


def test_boolean_and_two_valued_not(cities):
    caps = apply_where(cities, Clause(operator="Equal", path=["isCapital"], value=True))
    assert _names(caps) == ["Amsterdam", "Berlin"]
    # NotEqual over a non-null boolean column
    non_caps = apply_where(cities, Clause(operator="NotEqual", path=["isCapital"], value=True))
    assert _names(non_caps) == ["Dusseldorf", "Missing Island", "Rotterdam"]


def test_geo_within_range(cities):
    # 200 km around Amsterdam: Amsterdam, Rotterdam, Dusseldorf (null location drops)
    out = apply_where(cities, Clause(
        operator="WithinGeoRange", path=["location"],
        value=GeoRange(latitude=52.366667, longitude=4.9, distance_meters=200_000),
    ))
    assert _names(out) == ["Amsterdam", "Dusseldorf", "Rotterdam"]


def test_array_contains_and_group_explode(cities):
    out = apply_where(cities, Clause(
        operator="ContainsAny", path=["museums"], value=["Rijksmuseum"],
    ))
    assert _names(out) == ["Amsterdam", "Berlin"]
    # array groupBy: museum values group independently (grouped.go:63)
    counts = {
        r["museums"]: r["n"]
        for r in cities.where(F.col("museums").isNotNull())
        .withColumn("museums", F.explode("museums"))
        .groupBy("museums").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["Rijksmuseum"] == 2


def test_date_filter(cities):
    out = apply_where(cities, Clause(
        operator="LessThan", path=["cityRights"], value=datetime.datetime(1285, 1, 1),
    ))
    assert _names(out) == ["Berlin", "Rotterdam"]


def test_tokenized_equal_on_history(cities):
    out = apply_where(cities, Clause(
        operator="Equal", path=["history"], value="Europe", tokenization="word",
    ))
    assert _names(out) == ["Rotterdam"]


def test_sort_nulls_first_asc(cities):
    rows = cities.orderBy(F.col("population").asc_nulls_first()).select("name").collect()
    assert rows[0]["name"] == "Missing Island"
    rows = cities.orderBy(F.col("population").desc_nulls_last()).select("name").collect()
    assert rows[-1]["name"] == "Missing Island" and rows[0]["name"] == "Berlin"


def test_exact_knn_order_hand_checkable(cities):
    # _vector dim 4 hand-set: query [1,0,0,0] orders Amsterdam, Rotterdam first
    from weaviate_spark.functions.distance import cosine_distance

    q = F.array(*[F.lit(x) for x in [1.0, 0.0, 0.0, 0.0]])
    out = (
        cities.withColumn("_d", cosine_distance(F.col("_vector"), q))
        .orderBy(F.col("_d").asc(), F.col("name").asc())
        .select("name").collect()
    )
    assert [r["name"] for r in out][:2] == ["Amsterdam", "Rotterdam"]


def test_ref_two_hop_via_country(cities, spark):
    # country -> continent lookup joined 2-hop (ref resolution shape)
    countries = spark.createDataFrame(
        [("Netherlands", "Europe"), ("Germany", "Europe")], ["cname", "continent"]
    )
    out = (
        cities.join(F.broadcast(countries), cities["country"] == countries["cname"], "left")
        .where(F.col("continent") == "Europe")
    )
    assert len(out.collect()) == 5


def test_aggregate_matrix_over_cities(cities):
    """§A2-style matrix: per-country aggregations across types."""
    from pyspark.sql import Window

    agg = (
        cities.groupBy("country")
        .agg(
            F.count("population").alias("pop_count"),      # excludes null
            F.sum("population").alias("pop_sum"),
            F.percentile("cityArea", F.lit(0.5)).alias("area_median"),
            F.sum(F.col("isCapital").cast("int")).alias("capitals"),
            F.count(F.lit(1)).alias("meta_count"),
        )
    )
    by = {r["country"]: r for r in agg.collect()}
    assert by["Netherlands"]["pop_count"] == 2          # null excluded
    assert by["Netherlands"]["meta_count"] == 3          # null row counted
    assert by["Netherlands"]["pop_sum"] == 2_400_000
    assert by["Germany"]["area_median"] == pytest.approx((217.22 + 891.68) / 2)
    assert by["Netherlands"]["capitals"] == 1
