"""JSON -> GetSpec parser tests (SURVEY §3.1 lifecycle; field names from
grpc/proto/v1/search_get.proto + base.proto Filters)."""
from __future__ import annotations

import pytest

from weaviate_spark.filters import Clause, GeoRange
from weaviate_spark.plans import parse_query
from weaviate_spark.plans.spec import BM25, GetSpec, Hybrid, NearVector, SortKey


def test_roundtrip_full_get():
    spec = parse_query(
        {
            "collection": "part",
            "filters": {
                "operator": "OPERATOR_AND",
                "filters": [
                    {"operator": "OPERATOR_LIKE",
                     "target": {"property": "p_type"}, "value_text": "PROMO*"},
                    {"operator": "OPERATOR_GREATER_THAN_EQUAL",
                     "path": ["p_size"], "value_int": 10},
                ],
            },
            "sort_by": [
                {"ascending": False, "path": ["p_retailprice"]},
                {"ascending": True, "path": ["p_partkey"]},
            ],
            "offset": 5,
            "limit": 15,
            "properties": {"non_ref_properties": ["p_partkey", "p_name"]},
        }
    )
    assert spec.collection == "part"
    assert spec.where.operator == "And"
    assert spec.where.operands[0].operator == "Like"
    assert spec.where.operands[0].path == ["p_type"]
    assert spec.where.operands[0].value == "PROMO*"
    assert spec.where.operands[1].operator == "GreaterThanEqual"
    assert spec.where.operands[1].value == 10
    assert spec.sort == [
        SortKey(path=["p_retailprice"], order="desc"),
        SortKey(path=["p_partkey"], order="asc"),
    ]
    assert (spec.offset, spec.limit) == (5, 15)
    assert spec.select == ["p_partkey", "p_name"]


def test_bare_operator_names_and_json_string():
    spec = parse_query(
        '{"collection": "customer", '
        '"filters": {"operator": "Equal", "path": ["c_mktsegment"], '
        '"value_text": "BUILDING"}}'
    )
    assert spec.where == Clause(
        operator="Equal", path=["c_mktsegment"], value="BUILDING", operands=[]
    )


def test_array_value_both_forms():
    wrapped = parse_query(
        {"collection": "c", "filters": {
            "operator": "OPERATOR_CONTAINS_ANY", "path": ["tags"],
            "value_text_array": {"values": ["a", "b"]}}}
    )
    plain = parse_query(
        {"collection": "c", "filters": {
            "operator": "ContainsAny", "path": ["tags"],
            "value_text_array": ["a", "b"]}}
    )
    assert wrapped.where.value == plain.where.value == ["a", "b"]


def test_geo_filter():
    spec = parse_query(
        {"collection": "c", "filters": {
            "operator": "OPERATOR_WITHIN_GEO_RANGE", "path": ["loc"],
            "value_geo": {"latitude": 52.3, "longitude": 4.9,
                          "distance": 2000.0}}}
    )
    assert spec.where.value == GeoRange(52.3, 4.9, 2000.0)


def test_bm25_and_search_operator():
    spec = parse_query(
        {"collection": "documents",
         "bm25_search": {"query": "fox", "properties": ["text^2", "title"],
                         "search_operator": {"operator": "OPERATOR_AND"}}}
    )
    assert spec.bm25 == BM25(query="fox", properties=["text^2", "title"],
                             search_operator="And", minimum_or_tokens_match=0)


def test_hybrid_alpha_param_and_fusion_enum():
    spec = parse_query(
        {"collection": "documents",
         "hybrid_search": {"query": "fox", "vector": [0.1, 0.2],
                           "alpha": 0.75, "alpha_param": 0.4,
                           "use_alpha_param": True,
                           "fusion_type": "FUSION_TYPE_RANKED",
                           "vector_distance": 0.6}}
    )
    assert spec.hybrid == Hybrid(
        query="fox", vector=[0.1, 0.2], alpha=0.4, fusion="ranked",
        properties=[], max_vector_distance=0.6,
    )


def test_near_vector_with_target():
    spec = parse_query(
        {"collection": "embeddings",
         "near_vector": {"vector": [1.0, 0.0], "certainty": 0.9,
                         "targets": {"target_vectors": ["title_vec"]}}}
    )
    assert spec.near_vector == NearVector(
        vector=[1.0, 0.0], distance=None, certainty=0.9,
        target_vector="title_vec", metric="cosine",
    )


def test_tenant_and_metadata_flow_to_extra():
    spec = parse_query(
        {"collection": "c", "tenant": "t42",
         "metadata": {"uuid": True, "distance": True}},
        id_col="doc_id",
    )
    assert spec.extra["tenant"] == "t42"
    assert spec.extra["metadata"] == {"uuid": True, "distance": True}
    assert spec.extra["id_col"] == "doc_id"


# --- validation-error parity ------------------------------------------------

def test_unknown_operator_message():
    with pytest.raises(ValueError, match="unknown where operator: 'Betwixt'"):
        parse_query({"collection": "c",
                     "filters": {"operator": "Betwixt", "path": ["x"]}})


def test_search_leg_conflict_message():
    # explorer.go:224
    with pytest.raises(ValueError, match=r"conflict: both near<Media> and "
                                         r"keyword-based \(bm25\) arguments"):
        parse_query({"collection": "c",
                     "bm25_search": {"query": "x"},
                     "near_vector": {"vector": [1.0]}})


def test_missing_collection():
    with pytest.raises(ValueError, match="collection is required"):
        parse_query({"limit": 5})


def test_unknown_top_level_field():
    with pytest.raises(ValueError, match="unknown SearchRequest fields: "
                                         r"\['nearVector'\]"):
        parse_query({"collection": "c", "nearVector": {}})


def test_value_oneof_violation():
    with pytest.raises(ValueError, match="at most one value_"):
        parse_query({"collection": "c", "filters": {
            "operator": "Equal", "path": ["x"],
            "value_text": "a", "value_int": 1}})


def test_multi_target_rejected():
    with pytest.raises(ValueError, match="multi-target"):
        parse_query({"collection": "c", "near_vector": {
            "vector": [1.0],
            "targets": {"target_vectors": ["a", "b"]}}})


def test_compiled_parse_matches_handbuilt(spark, sf_dir):
    """Parsed spec and hand-built spec produce identical results."""
    from weaviate_spark.plans import compile_get

    parsed = parse_query(
        {"collection": "customer",
         "filters": {"operator": "OPERATOR_GREATER_THAN",
                     "path": ["c_acctbal"], "value_number": 1000.0},
         "sort_by": [{"ascending": False, "path": ["c_acctbal"]},
                     {"ascending": True, "path": ["c_custkey"]}],
         "limit": 20}
    )
    built = GetSpec(
        collection="customer",
        where=Clause("GreaterThan", ["c_acctbal"], 1000.0),
        sort=[SortKey(["c_acctbal"], "desc"), SortKey(["c_custkey"], "asc")],
        limit=20,
    )
    a = compile_get(spark, sf_dir, parsed).collect()
    b = compile_get(spark, sf_dir, built).collect()
    assert a == b


def test_parsed_explain_score_metadata_flows_to_fusion(spark, sf_dir):
    """MetadataRequest.explain_score in the JSON front-end turns on the
    fusion explanation lines end-to-end."""
    from weaviate_spark.plans import compile_get, parse_query

    spec = parse_query("""
    {
      "collection": "docs_embedded",
      "hybrid_search": {"query": "spark join", "alpha": 0.5,
                        "fusion_type": "FUSION_TYPE_RANKED"},
      "metadata": {"explain_score": true},
      "limit": 5
    }
    """)
    spec.extra["id_col"] = "doc_id"
    rows = compile_get(spark, sf_dir, spec).collect()
    assert len(rows) == 5
    assert all("Hybrid (Result Set" in r["explain_score"] for r in rows)
