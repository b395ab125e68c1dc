"""GraphQL surface parser (plans/graphql.py): the reference's primary
query language (adapters/handlers/graphql/) parsed into the same
GetSpec / AggregateSpec every other entry point uses.

Checks: spec equivalence with hand-built specs, compile parity against
the JSON-parsed path, lexer details (comments, commas-as-whitespace,
escapes), and the reference's validation errors (search-leg conflict,
unknown operator/argument, unsupported GraphQL features).
"""

from __future__ import annotations

import pytest

from weaviate_spark.filters import Clause, GeoRange
from weaviate_spark.operators.aggregate import AggregateSpec, PropertyAgg
from weaviate_spark.plans import parse_graphql
from weaviate_spark.plans.spec import BM25, GetSpec, Hybrid, NearVector, SortKey


def test_get_full_roundtrip():
    spec = parse_graphql(
        """
        # leading comment
        query OpName {
          Get {
            part(
              where: {operator: And, operands: [
                {path: ["p_type"], operator: Like, valueText: "PROMO*"},
                {path: ["p_size"], operator: GreaterThanEqual, valueInt: 10},
              ]},
              sort: [{path: ["p_retailprice"], order: desc},
                     {path: "p_partkey", order: asc}],
              limit: 15, offset: 5, autocut: 2
            ) {
              p_partkey p_name
              _additional { id distance }
            }
          }
        }
        """
    )
    assert spec == GetSpec(
        collection="part",
        where=Clause(operator="And", path=[], value=None, operands=[
            Clause(operator="Like", path=["p_type"], value="PROMO*"),
            Clause(operator="GreaterThanEqual", path=["p_size"], value=10),
        ]),
        sort=[SortKey(path=["p_retailprice"], order="desc"),
              SortKey(path=["p_partkey"], order="asc")],
        limit=15, offset=5, autocut=2,
        select=["p_partkey", "p_name"],
        extra={"metadata": ["id", "distance"]},
    )


def test_search_legs_and_geo():
    spec = parse_graphql(
        '{ Get { documents(bm25: {query: "spark join", properties: ["text"],'
        ' searchOperator: {operator: And}}) { doc_id } } }'
    )
    assert spec.bm25 == BM25(query="spark join", properties=["text"],
                             search_operator="And")

    spec = parse_graphql(
        "{ Get { embeddings(nearVector: {vector: [0.5, -1, 2e-1],"
        " certainty: 0.9, targetVectors: [\"title\"]}) { vec_id } } }"
    )
    assert spec.near_vector == NearVector(
        vector=[0.5, -1.0, 0.2], certainty=0.9, target_vector="title")

    spec = parse_graphql(
        '{ Get { documents(hybrid: {query: "q", vector: [1, 0], alpha: 0.25,'
        " fusionType: rankedFusion}) { doc_id } } }"
    )
    assert spec.hybrid == Hybrid(query="q", vector=[1.0, 0.0], alpha=0.25,
                                 fusion="ranked", properties=[])

    spec = parse_graphql(
        """{ Get { customer(where: {path: ["c_geo"], operator: WithinGeoRange,
          valueGeoRange: {geoCoordinates: {latitude: 51.2, longitude: 6.7},
                          distance: {max: 2000}}}) { c_custkey } } }"""
    )
    assert spec.where.value == GeoRange(latitude=51.2, longitude=6.7,
                                        distance_meters=2000.0)


def test_string_escapes_and_tokenization():
    spec = parse_graphql(
        '{ Get { documents(where: {path: ["text"], operator: Equal,'
        ' valueText: "a\\"b\\nc\\u0041", tokenization: "word"}) { doc_id } } }'
    )
    assert spec.where.value == 'a"b\ncA'
    assert spec.where.tokenization == "word"


def test_after_cursor_and_tenant():
    spec = parse_graphql(
        '{ Get { customer(after: "0000-id", tenant: "t1", limit: 3) { c_name } } }'
    )
    assert spec.after == "0000-id"
    assert spec.extra["tenant"] == "t1"


def test_aggregate_spec():
    spec = parse_graphql(
        """
        { Aggregate {
            orders(groupBy: {path: ["o_orderpriority"]},
                   where: {path: ["o_totalprice"], operator: GreaterThan,
                           valueNumber: 1000.0}) {
              meta { count }
              groupedBy { value }
              o_totalprice { mean sum maximum }
            }
        } }
        """
    )
    assert spec == AggregateSpec(
        collection="orders",
        properties=[PropertyAgg("o_totalprice", ["mean", "sum", "maximum"])],
        where=Clause(operator="GreaterThan", path=["o_totalprice"], value=1000.0),
        group_by="o_orderpriority",
        include_meta_count=True,
    )
    # bare-path and enum-ish groupBy forms
    assert parse_graphql(
        "{ Aggregate { orders(groupBy: [\"o_clerk\"]) { meta { count } } } }"
    ).group_by == "o_clerk"


@pytest.mark.parametrize("doc,msg", [
    ("{ Get { c(where: {operator: Frobnicate, path: [\"x\"]}) { y } } }",
     "unknown where operator"),
    ('{ Get { c(bm25: {query: "a"}, nearVector: {vector: [1]}) { y } } }',
     "conflict"),
    ("{ Get { c(bogusArg: 1) { y } } }", "unknown Get arguments"),
    ("query ($v: Int) { Get { c(limit: $v) { y } } }", "variables"),
    ("{ Get { c { ...frag } } }", "fragments"),
    ("{ Get { c @skip(if: true) { y } } }", "directives"),
    ("mutation { x }", "mutation operations"),
    ("{ Get { c { y } } } trailing", "trailing content"),
    # Explore is a supported root since r06 — without its search arg it
    # fails that requirement instead of the root check
    ("{ Explore { c { y } } }", "requires a nearVector"),
    ("{ Get { c(where: {operator: Equal, path: [\"x\"], valueInt: 1,"
     " valueText: \"a\"}) { y } } }", "at most one value"),
    ("{ Aggregate { c { x { frobnicate } } } }", "unknown aggregators"),
])
def test_errors(doc, msg):
    with pytest.raises(ValueError, match=msg):
        parse_graphql(doc)


def test_compile_parity_with_json_path(spark, sf_dir):
    """The GraphQL and JSON SearchRequest forms of the same query must
    compile to identical results."""
    from weaviate_spark.plans import compile_get, parse_query

    gql = parse_graphql(
        """
        { Get { part(
            where: {operator: And, operands: [
              {path: ["p_type"], operator: Like, valueText: "PROMO*"},
              {path: ["p_size"], operator: GreaterThanEqual, valueInt: 10}]},
            sort: [{path: ["p_retailprice"], order: desc},
                   {path: ["p_partkey"], order: asc}],
            limit: 15, offset: 5
          ) { p_partkey p_name p_retailprice p_size } } }
        """
    )
    jsn = parse_query(
        """
        {"collection": "part",
         "filters": {"operator": "OPERATOR_AND", "filters": [
            {"operator": "OPERATOR_LIKE", "target": {"property": "p_type"},
             "value_text": "PROMO*"},
            {"operator": "OPERATOR_GREATER_THAN_EQUAL", "path": ["p_size"],
             "value_int": 10}]},
         "sort_by": [{"ascending": false, "path": ["p_retailprice"]},
                     {"ascending": true, "path": ["p_partkey"]}],
         "offset": 5, "limit": 15,
         "properties": {"non_ref_properties":
            ["p_partkey", "p_name", "p_retailprice", "p_size"]}}
        """
    )
    a = compile_get(spark, sf_dir, gql).collect()
    b = compile_get(spark, sf_dir, jsn).collect()
    assert a == b and len(a) > 0


def test_aggregate_executes(spark, sf_dir):
    from weaviate_spark.operators.aggregate import aggregate

    spec = parse_graphql(
        """{ Aggregate { orders(groupBy: {path: ["o_orderpriority"]}) {
             meta { count } o_totalprice { mean maximum } } } }"""
    )
    rows = aggregate(spark, sf_dir, spec).collect()
    assert len(rows) == 5
    cols = set(rows[0].asDict())
    assert {"o_orderpriority", "meta_count", "o_totalprice_mean",
            "o_totalprice_maximum"} <= cols


def test_explore_parse_spec():
    from weaviate_spark.plans import parse_graphql

    spec = parse_graphql(
        "{ Explore(nearVector: {vector: [0.1, 0.2]}, limit: 5) "
        "{ className beacon distance certainty } }"
    )
    assert spec["root"] == "Explore"
    assert spec["limit"] == 5
    assert spec["near_vector"].vector == [0.1, 0.2]
    assert spec["fields"] == ["className", "beacon", "distance", "certainty"]


def test_explore_parse_rejects_unknowns():
    import pytest

    from weaviate_spark.plans import parse_graphql

    with pytest.raises(ValueError, match="unsupported arguments"):
        parse_graphql(
            "{ Explore(nearVector: {vector: [0.1]}, where: {}) "
            "{ className } }")
    with pytest.raises(ValueError, match="selections must be from"):
        parse_graphql(
            "{ Explore(nearVector: {vector: [0.1]}) { s_name } }")
    with pytest.raises(ValueError, match="requires a nearVector"):
        parse_graphql("{ Explore(limit: 3) { className } }")


def test_feature_projection_args_parsed():
    """_additional { featureProjection(...) } arguments flow into the
    post-stage's params (projector_graphql_field.go argument set)."""
    from weaviate_spark.plans.graphql import parse_graphql

    spec = parse_graphql(
        '{ Get { Article(nearVector: {vector: [1.0, 0.0]}, limit: 5) {'
        ' title _additional { distance featureProjection('
        'dimensions: 2, perplexity: 4, learningRate: 30) { vector } }'
        ' } } }')
    assert spec.extra["feature_projection"] == {
        "dimensions": 2, "perplexity": 4, "learning_rate": 30}
    assert "featureProjection" in spec.extra["metadata"]
    # no args -> empty params dict (defaults apply at the post-stage)
    spec2 = parse_graphql(
        '{ Get { Article(limit: 5) { title _additional {'
        ' featureProjection { vector } } } } }')
    assert spec2.extra["feature_projection"] == {}
    # absent -> no key at all
    spec3 = parse_graphql(
        '{ Get { Article(limit: 5) { title _additional { id } } } }')
    assert "feature_projection" not in spec3.extra


def test_feature_projection_end_to_end(spark, sf_dir):
    """GraphQL -> compile -> projector post-stage round trip."""
    from weaviate_spark.plans.compile import compile_get
    from weaviate_spark.plans.graphql import parse_graphql

    qv = ", ".join(str(float((i * 7) % 13)) for i in range(64))
    spec = parse_graphql(
        '{ Get { embeddings(nearVector: {vector: [' + qv + ']}, '
        'limit: 10) { label _additional { distance featureProjection('
        'dimensions: 2, iterations: 40) { vector } } } } }',
        id_col="vec_id", vector_col="embedding")
    out = compile_get(spark, sf_dir, spec)
    rows = out.collect()
    assert len(rows) == 10
    assert all(len(r["featureProjection"]) == 2 for r in rows)
    assert "label" in out.columns and "vec_id" in out.columns
