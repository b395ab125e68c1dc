"""M1: where-filter algebra + sort + pagination vs duckdb oracle, plus
unit tests of reference edge semantics (two-valued Not, Like translation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import assert_df_matches_sql
from weaviate_spark.filters import Clause, GeoRange, apply_where, like_to_regex
from weaviate_spark.plans import GetSpec, SortKey, compile_get


def test_like_translation():
    assert like_to_regex("a*b?c") == "^a.*b.c$"
    assert like_to_regex("10%*") == "^10%.*$"


def test_min_real_slice(spark, sf_dir, duck):
    spec = GetSpec(
        collection="customer",
        where=Clause(operator="GreaterThan", path=["c_acctbal"], value=1000.0),
        sort=[SortKey(path=["c_name"])],
        limit=10,
        select=["c_custkey", "c_name", "c_acctbal"],
    )
    df = compile_get(spark, sf_dir, spec)
    assert_df_matches_sql(
        df, duck,
        "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 1000 "
        "ORDER BY c_name LIMIT 10",
    )


def test_and_or_like(spark, sf_dir, duck):
    spec = GetSpec(
        collection="part",
        where=Clause(
            operator="And",
            operands=[
                Clause(operator="Like", path=["p_type"], value="PROMO*"),
                Clause(
                    operator="Or",
                    operands=[
                        Clause(operator="GreaterThanEqual", path=["p_size"], value=30),
                        Clause(operator="LessThan", path=["p_size"], value=5),
                    ],
                ),
            ],
        ),
        sort=[SortKey(path=["p_partkey"])],
        limit=1000,
        select=["p_partkey", "p_name", "p_type", "p_size"],
    )
    df = compile_get(spark, sf_dir, spec)
    assert_df_matches_sql(
        df, duck,
        "SELECT p_partkey, p_name, p_type, p_size FROM part "
        "WHERE p_type LIKE 'PROMO%' AND (p_size >= 30 OR p_size < 5) "
        "ORDER BY p_partkey LIMIT 1000",
    )


def test_contains_any_scalar(spark, sf_dir, duck):
    spec = GetSpec(
        collection="lineitem",
        where=Clause(operator="ContainsAny", path=["l_returnflag"], value=["A", "R"]),
        select=["l_orderkey", "l_linenumber", "l_returnflag"],
        limit=10000,
    )
    df = compile_get(spark, sf_dir, spec)
    assert_df_matches_sql(
        df, duck,
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem "
        "WHERE l_returnflag IN ('A','R') LIMIT 10000",
    )


def test_two_valued_not(spark):
    # reference: inverted/searcher.go:1609-1655 — null rows match NotEqual
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], ["id", "v"]
    )
    out = apply_where(df, Clause(operator="NotEqual", path=["v"], value="a"))
    ids = sorted(r.id for r in out.collect())
    assert ids == [2, 3], "null row must match NotEqual (two-valued bitmap)"

    out2 = apply_where(
        df,
        Clause(operator="Not", operands=[Clause(operator="Equal", path=["v"], value="a")]),
    )
    assert sorted(r.id for r in out2.collect()) == [2, 3]


def test_contains_on_arrays(spark):
    df = spark.createDataFrame(
        [(1, ["x", "y"]), (2, ["y", "z"]), (3, []), (4, None)],
        "id int, tags array<string>",
    )
    any_ = apply_where(df, Clause(operator="ContainsAny", path=["tags"], value=["x", "z"]))
    assert sorted(r.id for r in any_.collect()) == [1, 2]
    all_ = apply_where(df, Clause(operator="ContainsAll", path=["tags"], value=["y", "z"]))
    assert sorted(r.id for r in all_.collect()) == [2]
    none_ = apply_where(df, Clause(operator="ContainsNone", path=["tags"], value=["x"]))
    # two-valued: rows whose array misses "x" (incl. empty + null) match
    assert sorted(r.id for r in none_.collect()) == [2, 3, 4]


def test_geo_within_range(spark):
    df = spark.createDataFrame(
        [(1, (52.52, 13.405)), (2, (48.8566, 2.3522)), (3, (40.7128, -74.006))],
        "id int, location struct<latitude:double,longitude:double>",
    )
    # 1000 km around Berlin: Berlin yes, Paris (878 km) yes, NYC no
    out = apply_where(
        df,
        Clause(
            operator="WithinGeoRange",
            path=["location"],
            value=GeoRange(latitude=52.52, longitude=13.405, distance_meters=1_000_000),
        ),
    )
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_cursor_pagination(spark, sf_dir):
    first = compile_get(
        spark, sf_dir, GetSpec(collection="customer", limit=5, sort=[SortKey(path=["_id"])], extra={"with_id": True})
    )
    rows = first.select("_id").collect()
    last_id = rows[-1][0]
    nxt = compile_get(spark, sf_dir, GetSpec(collection="customer", limit=5, after=last_id))
    nxt_ids = [r._id for r in nxt.select("_id").collect()]
    assert len(nxt_ids) == 5
    assert all(i > last_id for i in nxt_ids)
    assert set(nxt_ids).isdisjoint({r[0] for r in rows})


def test_null_sort_order(spark):
    df = spark.createDataFrame([(1, 5.0), (2, None), (3, 1.0)], "id int, v double")
    asc = df.orderBy(F.col("v").asc_nulls_first()).select("id").collect()
    assert [r.id for r in asc] == [2, 3, 1]
    desc = df.orderBy(F.col("v").desc_nulls_last()).select("id").collect()
    assert [r.id for r in desc] == [1, 3, 2]


def test_geo_bbox_prefilter_pushdown(spark, tmp_path):
    """WithinGeoRange compiles a bounding-box SUPERSET of the circle as
    plain comparisons on the struct fields; on a stored geo column they
    reach the parquet scan (PushedFilters), so at scale the haversine
    runs only on rows inside the box. Results are identical to the
    bare-haversine predicate (box is a superset)."""
    from weaviate_spark.filters import Clause, GeoRange, apply_where

    path = str(tmp_path / "geo")
    rows = [(i, ((i % 120) - 60.0 + 0.5, (i % 300) - 150.0 + 0.5)) for i in range(2000)]
    spark.createDataFrame(
        rows, "id long, location struct<latitude: double, longitude: double>"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    clause = Clause(
        operator="WithinGeoRange", path=["location"],
        value=GeoRange(latitude=52.52, longitude=13.405, distance_meters=500_000),
    )
    out = apply_where(df, clause)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "location.latitude" in pushed and "GreaterThanOrEqual" in pushed, pushed

    # bbox must not change results vs the bare haversine predicate
    from weaviate_spark.filters import haversine_meters
    bare = df.where(
        haversine_meters(
            F.col("location.latitude"), F.col("location.longitude"),
            F.lit(52.52), F.lit(13.405),
        ) <= 500_000
    )
    assert sorted(r["id"] for r in out.collect()) == sorted(r["id"] for r in bare.collect())
