"""Object validation parity (usecases/objects/validation/
model_validation.go + properties_validation.go error texts)."""

from __future__ import annotations

import pytest

from weaviate_spark.schema import Collection, Property
from weaviate_spark.sources.object_validation import (
    ObjectValidationError, validate_object, validate_objects_df)

COLL = Collection(name="Article", properties=[
    Property("title", "text"),
    Property("views", "int"),
    Property("rating", "number"),
    Property("live", "boolean"),
    Property("published", "date"),
    Property("extId", "uuid"),
    Property("tags", "text[]"),
    Property("scores", "int[]"),
    Property("loc", "geoCoordinates"),
    Property("phone", "phoneNumber"),
    Property("thumb", "blob"),
    Property("ofCategory", "Category"),
])


def _check(props, match):
    with pytest.raises(ObjectValidationError) as ei:
        validate_object({"class": "Article", "properties": props}, COLL)
    assert str(ei.value) == match, str(ei.value)


def test_valid_object_passes():
    validate_object({"class": "Article", "properties": {
        "title": "hi", "views": 3, "rating": 4.5, "live": True,
        "published": "2023-01-02T10:00:00Z",
        "extId": "7c9f9699-6d14-4a57-8a3f-1b2f3c4d5e6f",
        "tags": ["a", "b"], "scores": [1, 2],
        "loc": {"latitude": 1.5, "longitude": 2.5},
        "phone": {"input": "+1 212 555 0100"},
        "thumb": "aGVsbG8=",
        "ofCategory": [
            {"beacon": "weaviate://localhost/Category/"
                       "7c9f9699-6d14-4a57-8a3f-1b2f3c4d5e6f"}],
    }}, COLL)


def test_missing_class_and_bad_properties_shape():
    with pytest.raises(ObjectValidationError, match="the given class is empty"):
        validate_object({"properties": {}}, COLL)
    _check("nope", "could not recognize object's properties: 'nope'")


def test_unknown_property_vs_auto_schema():
    _check({"ghost": 1}, "unknown property 'ghost'")
    validate_object({"class": "Article", "properties": {"ghost": 1}},
                    COLL, auto_schema=True)


def test_scalar_type_errors():
    _check({"title": 5},
           "invalid text property 'title' on class 'Article': "
           "not a string, but int64")
    _check({"views": 3.5},
           "invalid integer property 'views' on class 'Article': "
           "requires an integer, the given value is '3.5'")
    _check({"rating": "high"},
           "invalid number property 'rating' on class 'Article': "
           "requires a float, the given value is 'high'")
    _check({"live": "yes"},
           "invalid boolean property 'live' on class 'Article': "
           "not a bool, but string")
    _check({"published": "2023-01-02"},
           "invalid date property 'published' on class 'Article': "
           "requires a string with a RFC3339 formatted date, but the "
           "given value is '2023-01-02'")
    _check({"extId": "not-a-uuid"},
           "invalid uuid property 'extId' on class 'Article': requires "
           "a string of UUID format, but the given value is 'not-a-uuid'")
    # int-valued float IS a valid int (intVal float64 branch)
    validate_object({"class": "Article",
                     "properties": {"views": 3.0}}, COLL)


def test_array_type_errors():
    _check({"tags": "solo"},
           "invalid text array property 'tags' on class 'Article': "
           "not a text array, but string")
    _check({"tags": ["ok", 7]},
           "invalid text array property 'tags' on class 'Article': "
           "invalid text array value: 7")
    _check({"scores": [1, "x"]},
           "invalid integer array property 'scores' on class 'Article': "
           "invalid integer array value: x")
    _check({"scores": {"a": 1}},
           "invalid integer array property 'scores' on class 'Article': "
           "not an integer array, but map[string]interface {}")


def test_geo_and_phone_and_blob():
    _check({"loc": [1, 2]},
           "invalid geoCoordinates property 'loc' on class 'Article': "
           "geoCoordinates must be a map, but got: []interface {}")
    _check({"loc": {"latitude": 1.0}},
           "invalid geoCoordinates property 'loc' on class 'Article': "
           "geoCoordinates is missing required field 'longitude'")
    _check({"loc": {"latitude": "x", "longitude": 1.0}},
           "invalid geoCoordinates property 'loc' on class 'Article': "
           "invalid latitude: must be json.Number or float, but got "
           "string")
    _check({"phone": {"defaultCountry": "US"}},
           "invalid phoneNumber property 'phone' on class 'Article': "
           "phoneNumber is missing required field 'input'")
    # national format without defaultCountry (phone_numbers.go:30)
    _check({"phone": {"input": "212 555 0100"}},
           "invalid phoneNumber property 'phone' on class 'Article': "
           "invalid phone number: invalid or missing defaultCountry - "
           "this field is optional if the specified number is in the "
           "international format, but required if the number is in "
           "national format, use ISO 3166-1 alpha-2")
    validate_object({"class": "Article", "properties": {
        "phone": {"input": "212 555 0100", "defaultCountry": "US"}}},
        COLL)
    _check({"thumb": 9},
           "invalid blob property 'thumb' on class 'Article': "
           "not a blob base64 string, but int64")
    _check({"thumb": "not base64!!"},
           "invalid blob property 'thumb' on class 'Article': "
           "not a valid blob base64 string")


def test_cref_errors_and_existence():
    _check({"ofCategory": {"beacon": "x"}},
           "invalid cref: reference must be an array, but got a map: "
           "{'beacon': 'x'}")
    _check({"ofCategory": "x"},
           "invalid cref: invalid ref type. Needs to be []map, "
           "got string")
    _check({"ofCategory": [{"beacon": "b", "extra": 1}]},
           "invalid cref: only direct references supported at the "
           "moment, concept references not supported yet: class "
           "'Article' with property 'ofCategory' requires exactly 1 "
           "arguments: 'beacon'. Check your input schema, got: "
           "{'beacon': 'b', 'extra': 1}")
    _check({"ofCategory": [{"id": "b"}]},
           "invalid cref: only direct references supported at the "
           "moment, concept references not supported yet:  class "
           "'Article' with property 'ofCategory' requires exactly 1 "
           "argument: 'beacon' is missing, check your input schema")
    # href is stripped before the shape check (delete(pvcr, "href"))
    validate_object({"class": "Article", "properties": {"ofCategory": [
        {"beacon": "weaviate://localhost/Category/"
                   "7c9f9699-6d14-4a57-8a3f-1b2f3c4d5e6f",
         "href": "/v1/objects/x"}]}}, COLL)
    # existence check fires only with exists_fn
    with pytest.raises(ObjectValidationError, match="no object with id"):
        validate_object({"class": "Article", "properties": {
            "ofCategory": [{"beacon": "weaviate://localhost/Category/"
                            "7C9F9699-6d14-4a57-8a3f-1b2f3c4d5e6f"}]}},
            COLL, exists_fn=lambda c, i, t: False)
    seen = []
    validate_object({"class": "Article", "properties": {
        "ofCategory": [{"beacon": "weaviate://localhost/Category/"
                        "7C9F9699-6d14-4a57-8a3f-1b2f3c4d5e6f"}]}},
        COLL, exists_fn=lambda c, i, t: seen.append((c, i)) or True)
    # target id lowercased before lookup (ValidateSingleRef)
    assert seen == [("Category", "7c9f9699-6d14-4a57-8a3f-1b2f3c4d5e6f")]


def test_validate_objects_df(spark):
    df = spark.createDataFrame([
        (1, '{"class": "Article", "properties": {"title": "ok"}}'),
        (2, '{"class": "Article", "properties": {"title": 5}}'),
        (3, 'not json'),
        (4, '{"properties": {}}'),
    ], "id long, body string")
    rows = {r["id"]: r for r in
            validate_objects_df(df, "body", COLL).collect()}
    assert rows[1]["ok"] and rows[1]["error"] is None
    assert not rows[2]["ok"] and "invalid text property" in rows[2]["error"]
    assert not rows[3]["ok"] and rows[3]["error"].startswith("invalid json")
    assert not rows[4]["ok"] and rows[4]["error"] == "the given class is empty"


def test_vector_validation():
    from weaviate_spark.sources.object_validation import _validate_vector

    legacy = Collection(name="Legacy", properties=[], vector_dim=4)
    named = Collection(name="Named", properties=[],
                       named_vectors={"title_vec": 4, "body_vec": 4})
    one_named = Collection(name="One", properties=[],
                           named_vectors={"only": 4})

    # default-named vector transports the legacy vector
    obj = {"class": "Legacy", "vectors": {"default": [1.0, 2.0]}}
    _validate_vector(obj, legacy)
    assert obj["vector"] == [1.0, 2.0] and obj["vectors"] == {}
    with pytest.raises(ObjectValidationError,
                       match="vector default has to be a float32 array"):
        _validate_vector(
            {"class": "Legacy", "vectors": {"default": "x"}}, legacy)

    # legacy vector on a single-named-vector class is rerouted
    obj = {"class": "One", "vector": [1.0]}
    _validate_vector(obj, one_named)
    assert obj["vectors"] == {"only": [1.0]} and "vector" not in obj
    with pytest.raises(
            ObjectValidationError,
            match="collection Named configuration does not have single "
                  "vector index"):
        _validate_vector({"class": "Named", "vector": [1.0]}, named)

    # unknown named vector / dropped index
    with pytest.raises(
            ObjectValidationError,
            match="collection Named does not have configuration for "
                  "vector ghost"):
        _validate_vector(
            {"class": "Named", "vectors": {"ghost": [1.0]}}, named)
    dropped = Collection(name="Named", properties=[],
                         named_vectors={"title_vec": 4},
                         named_vector_index_types={"title_vec": "none"})
    with pytest.raises(
            ObjectValidationError,
            match="vector index for title_vec was dropped; writes "
                  "targeting it are rejected"):
        _validate_vector(
            {"class": "Named", "vectors": {"title_vec": [1.0]}}, dropped)

    # full validate_object runs vector checks before properties
    with pytest.raises(ObjectValidationError, match="does not have "
                       "configuration for vector ghost"):
        validate_object(
            {"class": "Article", "vectors": {"ghost": [1.0]},
             "properties": {"title": 5}},
            Collection(name="Article",
                       properties=[Property("title", "text")],
                       named_vectors={"v": 4}))


def test_name_validation_texts():
    from weaviate_spark import schema as S

    assert S.validate_class_name("Article") == "Article"
    with pytest.raises(ValueError) as ei:
        S.validate_class_name("article")
    assert str(ei.value) == "'article' is not a valid class name"
    with pytest.raises(ValueError) as ei:
        S.validate_class_name("A" * 256)
    assert str(ei.value) == (
        f"'{'A' * 256}' is not a valid class name. Name should not be "
        "longer than 255 characters")
    with pytest.raises(ValueError) as ei:
        S.validate_alias_name("my-alias")
    assert str(ei.value) == "'my-alias' is not a valid alias name"

    assert S.validate_property_name("title_2") == "title_2"
    with pytest.raises(ValueError) as ei:
        S.validate_property_name("2bad")
    assert str(ei.value) == (
        "'2bad' is not a valid property name. Property names in "
        "Weaviate are restricted to valid GraphQL names, which must "
        "be “/[_A-Za-z][_0-9A-Za-z]{0,230}/”")
    with pytest.raises(ValueError) as ei:
        S.validate_reserved_property_name("_id")
    assert str(ei.value) == "'_id' is a reserved property name"
    with pytest.raises(ValueError) as ei:
        S.validate_reserved_property_name_suffix("body__meta_count")
    assert str(ei.value) == (
        "'body__meta_count' is not a valid property name: suffix "
        "'__meta_count' is reserved for internal indices")
    with pytest.raises(ValueError) as ei:
        S.validate_nested_property_name("bad name", "profile")
    assert "is not a valid nested property name of 'profile'" in str(ei.value)

    S.validate_tenant_name("tenant-1_A")
    with pytest.raises(ValueError, match="empty tenant name"):
        S.validate_tenant_name("")
    with pytest.raises(ValueError) as ei:
        S.validate_tenant_name("bad tenant")
    assert str(ei.value) == (
        " 'bad tenant' is not a valid tenant name. should only contain "
        "alphanumeric characters (a-z, A-Z, 0-9), underscore (_), and "
        "hyphen (-), with a length between 1 and 64 characters")


def test_collections_create_validates(spark, tmp_path):
    from weaviate_spark.client import connect
    from weaviate_spark.schema import Registry

    reg = Registry()
    client = connect(spark, str(tmp_path), registry=reg)
    handle = client.collections.create(
        Collection("Article", [Property("title", "text")]))
    assert handle is not None
    assert reg.resolve("Article").name == "Article"
    with pytest.raises(ValueError, match="not a valid class name"):
        client.collections.create(Collection("bad", []))
    with pytest.raises(ValueError, match="reserved property name"):
        client.collections.create(
            Collection("Ok", [Property("id", "text")]))
    # no registry bound -> explicit error
    bare = connect(spark, str(tmp_path))
    with pytest.raises(RuntimeError, match="schema registry"):
        bare.collections.create(Collection("X", []))
