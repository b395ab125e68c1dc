"""GetSpec search dispatch (explorer.go routing) + phone parsing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weaviate_spark.plans import GetSpec, SortKey, compile_get
from weaviate_spark.plans.spec import BM25, Hybrid, NearVector


def test_get_with_bm25(spark, sf_dir):
    out = compile_get(spark, sf_dir, GetSpec(
        collection="documents",
        bm25=BM25(query="spark filter join", properties=["text"]),
        limit=5,
        extra={"id_col": "doc_id"},
    ))
    rows = out.collect()
    assert len(rows) == 5 and "_score" in out.columns


def test_get_with_near_vector(spark, sf_dir):
    from weaviate_spark.entry_queries import QVEC

    out = compile_get(spark, sf_dir, GetSpec(
        collection="embeddings",
        near_vector=NearVector(vector=QVEC),
        limit=3,
        extra={"id_col": "vec_id"},
    ))
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0]["_distance"] <= rows[1]["_distance"]


def test_get_with_hybrid_and_autocut(spark, sf_dir):
    from weaviate_spark.entry_queries import QVEC

    out = compile_get(spark, sf_dir, GetSpec(
        collection="docs_embedded",
        hybrid=Hybrid(query="spark filter join", vector=QVEC, alpha=0.5, fusion="ranked"),
        limit=20, autocut=1,
        extra={"id_col": "doc_id"},
    ))
    n = out.count()
    assert 0 < n <= 20


def test_search_with_sort_rejected(spark, sf_dir):
    with pytest.raises(ValueError):
        compile_get(spark, sf_dir, GetSpec(
            collection="documents",
            bm25=BM25(query="x"),
            sort=[SortKey(path=["doc_id"])],
            extra={"id_col": "doc_id"},
        ))


def test_phone_parse(spark):
    from weaviate_spark.functions.phone import parse_phone

    df = spark.createDataFrame(
        [(1, "+4930123456"), (2, "030 1234567"), (3, "0031 20 555 1234"), (4, "xx")],
        ["id", "phone"],
    )
    out = df.select("id", parse_phone(F.col("phone"), "DE").alias("p")).collect()
    by = {r["id"]: r["p"] for r in out}
    assert by[1]["countryCode"] == 49 and by[1]["valid"] is True
    assert by[1]["internationalFormatted"] == "+4930123456"
    assert by[2]["countryCode"] == 49 and by[2]["nationalFormatted"] == "0301234567"
    assert by[3]["countryCode"] == 31 and by[3]["valid"] is True
    assert by[4]["valid"] is False


def test_array_prop_sort_element_wise(spark):
    """Array-prop sort = element-wise compare, then length, with the
    reference null rules (basic_comparators.go:98-112 stringArray:
    pairwise compareStrings, tie -> compareInts(len); handleNils asc ->
    nulls first). Spark's native array ordering implements exactly this
    — pinned here."""
    from weaviate_spark.plans.compile import sort_cols
    from weaviate_spark.plans.spec import SortKey

    df = spark.createDataFrame(
        [
            (1, ["b", "a"]),
            (2, ["a", "z"]),
            (3, ["a"]),          # prefix of 2/4 -> shorter first
            (4, ["a", "z", "x"]),
            (5, None),           # asc -> first
        ],
        "id long, tags array<string>",
    )
    asc = [r["id"] for r in df.orderBy(sort_cols([SortKey(path=["tags"])])).collect()]
    assert asc == [5, 3, 2, 4, 1]
    desc = [r["id"] for r in
            df.orderBy(sort_cols([SortKey(path=["tags"], order="desc")])).collect()]
    assert desc == [1, 4, 2, 3, 5]


def test_string_sort_case_insensitive(spark):
    """Reference string sort folds case (basic_comparators.go:72-80:
    'Orange' vs 'orange' compare EQUAL; 'apple' < 'Orange'); fold-equal
    ties fall to the next key."""
    from weaviate_spark.plans.compile import sort_cols
    from weaviate_spark.plans.spec import SortKey

    df = spark.createDataFrame(
        [(1, "Orange"), (2, "apple"), (3, "orange"), (4, "Banana")],
        "id long, name string",
    )
    out = [r["id"] for r in df.orderBy(
        *sort_cols([SortKey(path=["name"])], df), F.col("id").asc()
    ).collect()]
    # apple < Banana < {Orange == orange -> id order}
    assert out == [2, 4, 1, 3]
    # byte-order comparison would put the capitals first — pin that we
    # do NOT do that
    assert [r["id"] for r in df.orderBy(F.col("name").asc()).collect()] != out


def test_query_profile_surface(spark, sf_dir):
    """query_profile (search_get.proto MetadataRequest.query_profile
    analogue): phase timings, hottest rules, plan node census, measured
    wall time — over a real compiled Get query."""
    from weaviate_spark.filters import Clause
    from weaviate_spark.plans.compile import compile_get
    from weaviate_spark.plans.profile import query_profile
    from weaviate_spark.plans.spec import GetSpec, SortKey

    df = compile_get(spark, sf_dir, GetSpec(
        collection="part",
        where=Clause(operator="Like", path=["p_type"], value="PROMO*"),
        sort=[SortKey(path=["p_partkey"])], limit=10,
        select=["p_partkey", "p_type"],
    ))
    prof = query_profile(df)
    assert prof["rows"] == 10 and prof["took_ms"] > 0
    assert {"analysis", "optimization", "planning"} <= set(prof["phases"])
    assert all(v >= 0 for v in prof["phases"].values())
    assert prof["top_rules"] and all(ms >= 0 for _, ms in prof["top_rules"])
    assert any("TakeOrderedAndProject" in n for n in prof["plan_nodes"])
    assert prof["is_adaptive_final"] in (True, False)

    planned_only = query_profile(df, execute=False)
    assert planned_only["rows"] is None and planned_only["took_ms"] is None
    assert planned_only["phases"]
