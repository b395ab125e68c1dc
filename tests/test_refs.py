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


def test_add_references_batch_with_report(spark, tmp_path):
    """batch_references_add.go validateReference + crossref parse
    texts (including the reference's literal quirks)."""
    from pyspark.sql import functions as F

    from weaviate_spark.sources import crud

    path = str(tmp_path / "articles")
    ref_t = "array<struct<beacon:string,className:string,id:string>>"
    u1 = "7c9f9699-6d14-4a57-8a3f-1b2f3c4d5e6f"
    u2 = "aaaa9699-6d14-4a57-8a3f-1b2f3c4d5e6f"
    spark.createDataFrame(
        [(u1, None), (u2, None)],
        f"_id string, ofCategory {ref_t}").write.parquet(path)

    UT = "11119699-6d14-4a57-8a3f-1b2f3c4d5e6f"
    refs = spark.createDataFrame([
        # valid long-form source + class-form target (uppercase id
        # must be lowercased before storage)
        (f"weaviate://localhost/Article/{u1}/ofCategory",
         f"weaviate://localhost/Category/{UT.upper()}"),
        # valid short-form target
        (f"weaviate://localhost/Article/{u2}/ofCategory",
         f"weaviate://localhost/{UT}"),
        # short-form SOURCE -> long-form required
        (f"weaviate://localhost/Article/{u1}",
         f"weaviate://localhost/{UT}"),
        # bad source uuid: error prints the PROPERTY segment
        # (crossref_source.go:67 quirk)
        ("weaviate://localhost/Article/not-a-uuid/ofCategory",
         f"weaviate://localhost/{UT}"),
        # lowercase source class
        (f"weaviate://localhost/article/{u1}/ofCategory",
         f"weaviate://localhost/{UT}"),
        # network source peer
        (f"weaviate://other-peer/Article/{u1}/ofCategory",
         f"weaviate://localhost/{UT}"),
        # network target peer
        (f"weaviate://localhost/Article/{u1}/ofCategory",
         f"weaviate://remote/{UT}"),
        # bad target uuid in short form -> '1nd' (crossref.go:63 quirk)
        (f"weaviate://localhost/Article/{u1}/ofCategory",
         "weaviate://localhost/xyz"),
        # missing source object
        (f"weaviate://localhost/Article/{UT}/ofCategory",
         f"weaviate://localhost/{UT}"),
    ], "from string, to string")

    report, n = crud.add_references_batch_with_report(
        spark, path, refs, "_id")
    rows = {(r["from"], r["to"]): r for r in report.collect()}
    assert n == 2
    errs = [r["error"] for r in rows.values() if r["error"]]
    assert len(errs) == 7
    assert any("must use long-form" in e for e in errs)
    assert any(e == "invalid cref URI: 2nd path segment must be uuid, "
                    "but got 'ofCategory'" for e in errs)  # the quirk
    assert any(e == "className must start with an uppercase letter, "
                    "but got article" for e in errs)
    assert any(e == "source class must always point to the local peer, "
                    "but got other-peer" for e in errs)
    assert any("got peer remote" in e for e in errs)
    assert any(e == "invalid cref URI: 1nd path segment must be uuid, "
                    "but got 'xyz'" for e in errs)  # the %dnd quirk
    assert any(e == f"source object not found: {UT}" for e in errs)

    table = {r["_id"]: r for r in spark.read.parquet(path).collect()}
    b1 = table[u1]["ofCategory"]
    assert len(b1) == 1 and b1[0]["className"] == "Category"
    assert b1[0]["id"] == UT  # lowercased
    assert b1[0]["beacon"] == f"weaviate://localhost/Category/{UT}"
    b2 = table[u2]["ofCategory"]
    assert len(b2) == 1 and b2[0]["className"] == ""
    assert b2[0]["beacon"] == f"weaviate://localhost/{UT}"
