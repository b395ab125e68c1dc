"""featureProjection (projector.go Reduce + projector_params.go)."""

from __future__ import annotations

import numpy as np
import pytest

from weaviate_spark.operators.projector import (
    FeatureProjectionParams, feature_projection, tsne_embed)


def _clustered_rows(n_per=6, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for c, center in enumerate((0.0, 10.0, -10.0)):
        for i in range(n_per):
            v = rng.standard_normal(dim) * 0.05 + center
            rows.append({"id": f"c{c}-{i}", "cluster": c,
                         "vector": v.tolist()})
    return rows


def test_deterministic_and_shapes():
    rows = _clustered_rows()
    a = feature_projection(rows, "vector", seed=7)
    b = feature_projection(rows, "vector", seed=7)
    assert [r["featureProjection"] for r in a] == \
        [r["featureProjection"] for r in b]
    assert all(len(r["featureProjection"]) == 2 for r in a)
    # input rows untouched (Reduce copies)
    assert "featureProjection" not in rows[0]
    assert feature_projection([], "vector") == []


def test_clusters_stay_separated():
    # well-separated 8-d clusters must stay separated in 2-d: every
    # point's nearest neighbour shares its cluster
    rows = feature_projection(_clustered_rows(), "vector", seed=7)
    Y = np.array([r["featureProjection"] for r in rows])
    labels = [r["cluster"] for r in rows]
    D = np.sum((Y[:, None] - Y[None, :]) ** 2, axis=-1)
    np.fill_diagonal(D, np.inf)
    nn = D.argmin(axis=1)
    assert all(labels[i] == labels[j] for i, j in enumerate(nn))


def test_params_defaults_and_validation_texts():
    p = FeatureProjectionParams()
    p.set_defaults_and_validate(4, 8)
    # perplexity defaults to min(len-1, 5) (projector_params.go:21)
    assert (p.algorithm, p.dimensions, p.perplexity, p.iterations,
            p.learning_rate) == ("tsne", 2, 3, 100, 25)
    with pytest.raises(ValueError, match="algorithm umap is not "
                       "supported: must be one of: tsne"):
        FeatureProjectionParams(algorithm="umap") \
            .set_defaults_and_validate(10, 8)
    with pytest.raises(ValueError, match="perplexity must be smaller "
                       "than amount of items: 20 >= 10"):
        FeatureProjectionParams(perplexity=20) \
            .set_defaults_and_validate(10, 8)
    with pytest.raises(ValueError, match="dimensions must be smaller "
                       "than source dimensions: 8 >= 8"):
        FeatureProjectionParams(dimensions=8) \
            .set_defaults_and_validate(10, 8)
    with pytest.raises(ValueError, match="iterations must be at least"):
        FeatureProjectionParams(iterations=0) \
            .set_defaults_and_validate(10, 8)


def test_named_vectors_and_ragged_rejected():
    rows = [{"id": 1, "vector": {"a": [1.0, 2.0]}}]
    with pytest.raises(ValueError, match="feature projection doesn't "
                       "work for multiple vectors"):
        feature_projection(rows, "vector")
    ragged = [{"id": 1, "vector": [1.0, 2.0, 3.0]},
              {"id": 2, "vector": [1.0, 2.0]}]
    with pytest.raises(ValueError, match="inconsistent vector lengths "
                       "found: 3 and 2"):
        feature_projection(ragged, "vector")


def test_tsne_embed_dimensions():
    Y = tsne_embed(np.eye(5).tolist(), dimensions=3, perplexity=2,
                   iterations=20, seed=1)
    assert Y.shape == (5, 3)
    # centered output
    assert np.allclose(Y.mean(axis=0), 0, atol=1e-9)


def test_attach_feature_projection_post_stage(spark, sf_dir):
    from weaviate_spark.operators.search_post import (
        attach_feature_projection)
    from weaviate_spark.operators.vector import NearVectorSpec, near_vector
    from weaviate_spark.sources.tables import load_table

    qv = [float((i * 7) % 13) for i in range(64)]
    hits = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=qv, vector_col="embedding",
        id_col="vec_id", metric="cosine", limit=8, quantize="off"))
    out = attach_feature_projection(
        spark, hits, sf_dir, "embeddings", "vec_id", "embedding",
        seed=11)
    rows = out.collect()
    assert len(rows) == 8
    assert all(len(r["featureProjection"]) == 2 for r in rows)
    # original ordering + columns preserved
    assert [r["vec_id"] for r in rows] == \
        [r["vec_id"] for r in hits.collect()]
    assert set(hits.columns) < set(out.columns)
    # deterministic across calls
    out2 = attach_feature_projection(
        spark, hits, sf_dir, "embeddings", "vec_id", "embedding",
        seed=11)
    assert [r["featureProjection"] for r in out2.collect()] == \
        [r["featureProjection"] for r in rows]
