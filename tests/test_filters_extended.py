"""Extended filter coverage: len(), tokenized Equal, nested object[]
paths, _id/timestamp filters; multivector maxsim; module registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weaviate_spark.filters import Clause, apply_where


def test_len_filter_text_and_array(spark):
    df = spark.createDataFrame(
        [(1, "abc", ["x"]), (2, "abcdef", ["x", "y", "z"])],
        "id int, t string, a array<string>",
    )
    out = apply_where(df, Clause(operator="GreaterThan", path=["len(t)"], value=4))
    assert [r.id for r in out.collect()] == [2]
    out = apply_where(df, Clause(operator="Equal", path=["len(a)"], value=3))
    assert [r.id for r in out.collect()] == [2]


def test_tokenized_equal(spark):
    # row_reader.go:76-91: Equal on word-tokenized text matches per-token
    df = spark.createDataFrame(
        [(1, "The Quick Fox"), (2, "slow turtle")], ["id", "t"]
    )
    out = apply_where(
        df, Clause(operator="Equal", path=["t"], value="quick", tokenization="word")
    )
    assert [r.id for r in out.collect()] == [1]
    # without tokenization: exact match only
    out = apply_where(df, Clause(operator="Equal", path=["t"], value="quick"))
    assert out.count() == 0


def test_tokenized_equal_array_cross_element(spark):
    # searcher.go ANDs per-token DOC-level bitmaps: tokens may come from
    # different array elements ('quick' from elem 0, 'dog' from elem 1)
    df = spark.createDataFrame(
        [(1, ["quick fox", "lazy dog"]), (2, ["quick fox"]), (3, ["lazy dog"])],
        "id int, t array<string>",
    )
    out = apply_where(
        df, Clause(operator="Equal", path=["t"], value="quick dog", tokenization="word")
    )
    assert [r.id for r in out.collect()] == [1]
    # single-token still matches any element
    out = apply_where(
        df, Clause(operator="Equal", path=["t"], value="DOG", tokenization="word")
    )
    assert sorted(r.id for r in out.collect()) == [1, 3]
    # NotEqual keeps two-valued semantics over the doc-level AND
    out = apply_where(
        df, Clause(operator="NotEqual", path=["t"], value="quick dog",
                   tokenization="word")
    )
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_nested_object_array_filter(spark):
    # object[] path: ANY element matching admits the row (searcher_nested)
    df = spark.createDataFrame(
        [
            (1, [{"name": "a", "n": 5}, {"name": "b", "n": 1}]),
            (2, [{"name": "c", "n": 2}]),
            (3, []),
        ],
        "id int, objs array<struct<name:string,n:int>>",
    )
    out = apply_where(df, Clause(operator="GreaterThan", path=["objs", "n"], value=4))
    assert [r.id for r in out.collect()] == [1]
    out = apply_where(df, Clause(operator="Like", path=["objs", "name"], value="c*"))
    assert [r.id for r in out.collect()] == [2]


def test_nested_struct_scalar_filter(spark):
    df = spark.createDataFrame(
        [(1, {"city": "berlin"}), (2, {"city": "paris"})],
        "id int, addr struct<city:string>",
    )
    out = apply_where(df, Clause(operator="Equal", path=["addr", "city"], value="paris"))
    assert [r.id for r in out.collect()] == [2]


def test_maxsim_multivector(spark):
    from weaviate_spark.operators.multivector import multivector_search

    df = spark.createDataFrame(
        [
            (1, [[1.0, 0.0], [0.0, 1.0]]),     # covers both query tokens
            (2, [[1.0, 0.0], [1.0, 0.0]]),     # only covers first
        ],
        "id long, toks array<array<float>>",
    )
    q = [[1.0, 0.0], [0.0, 1.0]]
    out = {r["id"]: r["_score"] for r in multivector_search(df, "id", "toks", q).collect()}
    assert out[1] == pytest.approx(2.0)  # 1 + 1
    assert out[2] == pytest.approx(1.0)  # 1 + 0
    assert out[1] > out[2]


def test_vectorizer_and_near_text(spark):
    from weaviate_spark.modules import hash_embed_py, near_text_vector, vectorize_column

    df = spark.createDataFrame([(1, "hello world"), (2, "hello world")], ["id", "t"])
    out = df.withColumn("_vector", vectorize_column(F.col("t"), dim=8)).collect()
    assert out[0]["_vector"] == out[1]["_vector"], "deterministic vectorizer"
    assert len(out[0]["_vector"]) == 8

    q = near_text_vector(["hello world"], dim=8)
    assert q == pytest.approx(hash_embed_py("hello world", 8))
    moved = near_text_vector(["hello world"], dim=8, move_to=["greetings"], force=0.5)
    assert moved != pytest.approx(q)


def test_reranker_and_generative(spark):
    from weaviate_spark.modules import GENERATIVES, RERANKERS

    df = spark.createDataFrame([(1, "spark joins fast"), (2, "other stuff")], ["id", "t"])
    scored = df.withColumn("_rr", RERANKERS["reranker-dummy"]("spark joins")(F.col("t")))
    by_id = {r["id"]: r["_rr"] for r in scored.collect()}
    assert by_id[1] == 1.0 and by_id[2] == 0.0

    gen = df.withColumn("_g", GENERATIVES["generative-dummy"]("Summary: {text}")(F.col("t")))
    assert gen.collect()[0]["_g"] == "Summary: spark joins fast"


def test_filter_validation_messages(spark):
    # filters_validator.go-style pre-compile validation
    from weaviate_spark.filters import validate_where

    df = spark.createDataFrame([(1, "a", 2.0)], ["id", "t", "n"])
    with pytest.raises(ValueError, match="Like is only supported on text"):
        validate_where(df, Clause(operator="Like", path=["n"], value="x*"))
    with pytest.raises(ValueError, match="WithinGeoRange requires"):
        validate_where(df, Clause(operator="WithinGeoRange", path=["n"],
                                  value={"latitude": 0, "longitude": 0, "distance_meters": 1}))
    with pytest.raises(ValueError, match="requires a list value"):
        validate_where(df, Clause(operator="ContainsAny", path=["t"], value="notalist"))
    with pytest.raises(ValueError, match="non-empty value list"):
        validate_where(df, Clause(operator="ContainsAll", path=["t"], value=[]))
    with pytest.raises(ValueError, match="exactly one operand"):
        validate_where(df, Clause(operator="Not", operands=[]))
    with pytest.raises(ValueError, match="requires a property path"):
        validate_where(df, Clause(operator="Equal", value=1))
    # valid clause passes silently
    validate_where(df, Clause(operator="Like", path=["t"], value="a*"))


def test_muvera_encoding_shapes_and_asymmetry():
    """muvera.go:114-205: query FDE = per-cluster SUM; doc FDE =
    per-cluster MEAN with empty clusters filled by the
    nearest-by-Hamming token. Encoded dim = reps * 2^ksim * dproj."""
    import numpy as np
    from weaviate_spark.operators.multivector import (
        MuveraSpec, _encode_one, _muvera_params, muvera_encode_query,
    )

    spec = MuveraSpec(dim=4, ksim=2, dprojections=3, repetitions=2)
    assert spec.encoded_dim == 2 * 4 * 3
    toks = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    g, S = _muvera_params(spec)
    qe = np.asarray(muvera_encode_query(toks, spec))
    de = _encode_one(toks, spec, g, S, is_doc=True)
    assert qe.shape == de.shape == (spec.encoded_dim,)
    # doc-side mean + empty-cluster fill make the encodings differ
    assert not np.allclose(qe, de)
    # determinism: same seed -> same encoding
    assert np.allclose(de, _encode_one(toks, spec, g, S, is_doc=True))
    # single-token doc: every empty cluster is filled with that token,
    # so each cluster block projects the token itself
    one = _encode_one([toks[0]], spec, g, S, is_doc=True)
    blocks = one.reshape(spec.repetitions, spec.num_clusters, spec.dprojections)
    for rep in range(spec.repetitions):
        assert np.allclose(blocks[rep], blocks[rep][0], atol=1e-6)


def test_muvera_overfetch_rescore_recall(spark):
    """FDE overfetch + exact rescore finds the exact top-k on clustered
    multi-vector data (hnsw/search.go:101-120 pattern)."""
    import math
    from weaviate_spark.operators.multivector import (
        MuveraSpec, multivector_search, muvera_search,
    )

    def unit(seed, dim=8):
        v = [math.sin(seed * 13.7 + d * 2.3) for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = []
    for i in range(60):
        base = unit(i % 6)  # 6 clusters of similar docs
        rows.append((i, [
            [b + 0.02 * n for b, n in zip(base, unit(100 + i * 3 + t))]
            for t in range(3)
        ]))
    df = spark.createDataFrame(rows, "id long, toks array<array<float>>")
    q = [unit(0), unit(1)]
    spec = MuveraSpec(dim=8, ksim=3, dprojections=8, repetitions=4)
    exact = [r["id"] for r in multivector_search(df, "id", "toks", q, limit=5).collect()]
    approx = [r["id"] for r in muvera_search(df, "id", "toks", q, spec, limit=5, overfetch=3).collect()]
    overlap = len(set(exact) & set(approx))
    assert overlap >= 4, f"recall@5 too low: {overlap}/5 ({exact} vs {approx})"


def test_validate_where_path_resolution(spark):
    """filters_validator.go path + len() + IsNull rules: unknown head
    property, unknown nested path, len() value/operator/sign, IsNull
    boolean value."""
    import pytest
    from weaviate_spark.filters import Clause, validate_where

    df = spark.createDataFrame(
        [(1, "x", ("a", 2))],
        "id long, t string, nested struct<s: string, n: long>",
    )
    with pytest.raises(ValueError, match="no such prop"):
        validate_where(df, Clause(operator="Equal", path=["missing"], value=1))
    with pytest.raises(ValueError, match="no such nested prop"):
        validate_where(df, Clause(operator="Equal", path=["nested", "zzz"], value=1))
    with pytest.raises(ValueError, match="IsNull requires a booleanValue"):
        validate_where(df, Clause(operator="IsNull", path=["t"], value="yes"))
    with pytest.raises(ValueError, match="requires IntValue"):
        validate_where(df, Clause(operator="Equal", path=["len(t)"], value="3"))
    with pytest.raises(ValueError, match="supports operators"):
        validate_where(df, Clause(operator="Like", path=["len(t)"], value=3))
    with pytest.raises(ValueError, match="positive property length"):
        validate_where(df, Clause(operator="Equal", path=["len(t)"], value=-1))
    with pytest.raises(ValueError, match="no such prop"):
        validate_where(df, Clause(operator="Equal", path=["len(zzz)"], value=1))
    # valid shapes pass
    validate_where(df, Clause(operator="Equal", path=["nested", "s"], value="a"))
    validate_where(df, Clause(operator="GreaterThan", path=["len(t)"], value=1))
    validate_where(df, Clause(operator="IsNull", path=["t"], value=True))


def test_array_prop_scalar_filters_exists_semantics(spark):
    """Scalar operators on array properties match per element (the
    inverted index holds one key per element): Equal/Like/range =
    EXISTS; NotEqual = two-valued NOT over the exists."""
    from weaviate_spark.filters import Clause, apply_where

    df = spark.createDataFrame(
        [
            (1, ["BUILDING", "other"], [5.0, 1.0]),
            (2, ["AUTOMOBILE"], [2.0]),
            (3, None, None),
        ],
        "id long, tags array<string>, nums array<double>",
    )

    def ids(clause):
        return sorted(r["id"] for r in apply_where(df, clause).collect())

    assert ids(Clause(operator="Equal", path=["tags"], value="other")) == [1]
    assert ids(Clause(operator="Like", path=["tags"], value="BUIL*")) == [1]
    assert ids(Clause(operator="GreaterThan", path=["nums"], value=4.0)) == [1]
    assert ids(Clause(operator="LessThanEqual", path=["nums"], value=2.0)) == [1, 2]
    # two-valued NotEqual (bitmap complement): docs with a null/missing
    # property are in the "everything" bitmap, so they MATCH NotEqual —
    # same rule the scalar filter_not_two_valued oracle pins
    assert ids(Clause(operator="NotEqual", path=["tags"], value="AUTOMOBILE")) == [1, 3]
