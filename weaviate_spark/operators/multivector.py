"""Multi-vector (ColBERT-style) late interaction (SURVEY §1.1, §2.5;
reference: entities/dto/dto.go:73-75, hnsw/search.go:96-134).

A multi-vector property is ``array<array<float>>`` (one vector per
token). The reference searches via MUVERA encoding + maxsim rescoring
of an overfetched candidate set; in batch Spark the exact maxsim is a
pure DataFrame aggregation, so we run it directly (the MUVERA
overfetch trick only matters on a serving path):

    maxsim(doc, query) = sum over query tokens qt of
                         max over doc tokens dt of sim(dt, qt)

Execution is narrow (per-row expression over the token arrays) +
TakeOrdered for top-k — the same scale shape as single-vector search.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame

from weaviate_spark.cache import lit_double_array
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def maxsim_score(token_vectors: Column, query_tokens: Sequence[Sequence[float]]) -> Column:
    """Late-interaction score: per query token, max dot-product over the
    document's token vectors; summed (hnsw/search.go maxsim rescoring,
    dot-product similarity)."""
    total = None
    for qt in query_tokens:
        q = lit_double_array(qt)
        best = F.array_max(F.transform(token_vectors, lambda dt: _dot(dt, q)))
        total = best if total is None else total + best
    return F.round(total, 6)


def multivector_search(
    df: DataFrame,
    id_col: str,
    token_vectors_col: str,
    query_tokens: Sequence[Sequence[float]],
    limit: int = 10,
) -> DataFrame:
    """Exact maxsim top-k; ties -> id asc (§4.3)."""
    return (
        df.withColumn("_score", maxsim_score(F.col(token_vectors_col), query_tokens))
        .orderBy(F.col("_score").desc(), F.col(id_col).asc())
        .limit(limit)
        .select(id_col, "_score")
    )


def multivector_search_pruned(
    df: DataFrame,
    id_col: str,
    token_vectors_col: str,
    query_tokens: Sequence[Sequence[float]],
    token_topk: int = 50,
    limit: int = 10,
) -> DataFrame:
    """Token-retrieval-pruned late interaction (the XTR/ColBERTv2-style
    two-stage plan): stage 1 retrieves, PER QUERY TOKEN, the
    ``token_topk`` docs whose best token dot-product for that query
    token is highest (6dp + id ties — deterministic candidate sets);
    stage 2 exact-maxsim rescores only the candidate union. At corpus
    scale the expensive all-token maxsim runs over
    <= len(query_tokens) * token_topk docs instead of the corpus —
    the standard production shape for late-interaction retrieval.
    Approximate by construction (a doc outside every token's top list
    is unreachable); the exact `multivector_search` stays the recall
    oracle."""
    toks = F.col(token_vectors_col)
    cand = None
    for qt in query_tokens:
        q = lit_double_array(qt)
        s = F.round(F.array_max(F.transform(toks, lambda dt: _dot(dt, q))), 6)
        top = (
            df.select(F.col(id_col), s.alias("_s"))
            .orderBy(F.col("_s").desc(), F.col(id_col).asc())
            .limit(int(token_topk))
            .select(id_col)
        )
        cand = top if cand is None else cand.unionByName(top)
    cand = cand.distinct()
    pruned = df.join(F.broadcast(cand), id_col, "left_semi")
    return multivector_search(
        pruned, id_col, token_vectors_col, query_tokens, limit=limit
    )


# ---------------------------------------------------------------------------
# MUVERA fixed-dimensional encoding + overfetch/rescore
# (adapters/repos/db/vector/multivector/muvera.go:28-211,
#  hnsw/search.go:96-120; construction from the public MUVERA paper —
#  "MUVERA: Multi-Vector Retrieval via Fixed Dimensional Encodings",
#  arXiv:2405.19504)

from dataclasses import dataclass


@dataclass
class MuveraSpec:
    """FDE parameters (muvera.go:28-35). num_clusters = 2^ksim."""

    dim: int                 # per-token vector dimension
    ksim: int = 3            # SimHash bits -> 2^ksim clusters
    dprojections: int = 8    # per-cluster projected dims
    repetitions: int = 4
    seed: int = 0x532CA5105169B1DF  # DefaultMuveraSeed (muvera.go:46)

    @property
    def num_clusters(self) -> int:
        return 1 << self.ksim

    @property
    def encoded_dim(self) -> int:
        return self.repetitions * self.num_clusters * self.dprojections


def _muvera_params(spec: MuveraSpec):
    """Deterministic (gaussians, S) per repetition from the seed —
    numpy PCG; the reference uses Go's PCG with a fixed seed the same
    way (muvera.go:64-80). Both sides of a query must share the spec."""
    import numpy as np

    rng = np.random.default_rng(spec.seed & 0xFFFFFFFFFFFFFFFF)
    gaussians = rng.standard_normal((spec.repetitions, spec.ksim, spec.dim))
    S = rng.integers(0, 2, (spec.repetitions, spec.dprojections, spec.dim)) * 2 - 1
    return gaussians, S.astype("float64")


def _encode_one(tokens, spec: MuveraSpec, gaussians, S, is_doc: bool):
    """FDE of one multi-vector (muvera.go:114-198): SimHash-cluster the
    tokens, per-cluster SUM (query) or MEAN + nearest-by-Hamming fill of
    empty clusters (doc), then +-1 projection scaled 1/sqrt(dproj)."""
    import numpy as np

    # Arrow batches deliver array<array<float>> as an object ndarray of
    # per-token arrays — stack, don't asarray
    T = np.stack([np.asarray(t, dtype="float64") for t in tokens])  # (n_tokens, dim)
    out = np.empty((spec.repetitions, spec.num_clusters, spec.dprojections))
    bits = 1 << np.arange(spec.ksim)
    for rep in range(spec.repetitions):
        signs = T @ gaussians[rep].T < 0             # (n_tokens, ksim)
        clusters = (signs * bits).sum(axis=1)        # (n_tokens,)
        agg = np.zeros((spec.num_clusters, spec.dim))
        np.add.at(agg, clusters, T)
        if is_doc:
            counts = np.bincount(clusters, minlength=spec.num_clusters)
            nonzero = counts > 0
            agg[nonzero] /= counts[nonzero, None]
            for c in np.flatnonzero(~nonzero):
                # nearest token by Hamming distance on the cluster bits
                ham = np.array([bin(int(c) ^ int(m)).count("1") for m in clusters])
                agg[c] = T[int(np.argmin(ham))]
        out[rep] = agg @ S[rep].T / np.sqrt(spec.dprojections)
    return out.ravel().astype("float32")


def muvera_encode_query(query_tokens, spec: MuveraSpec):
    g, S = _muvera_params(spec)
    return [float(x) for x in _encode_one(query_tokens, spec, g, S, is_doc=False)]


def muvera_encode_df(
    df: DataFrame, id_col: str, token_vectors_col: str, spec: MuveraSpec
) -> DataFrame:
    """(id, _muvera array<float>) — the doc-side FDE index table. A
    narrow Arrow-batched map (one numpy kernel per batch); writable once
    and reusable across queries, exactly like the LSH/IVF index tables."""
    import pandas as pd

    g, S = _muvera_params(spec)

    def _enc(it):
        for pdf in it:
            enc = [
                _encode_one(toks, spec, g, S, is_doc=True)
                for toks in pdf[token_vectors_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "_muvera": enc})

    return df.select(id_col, token_vectors_col).mapInPandas(
        _enc, f"{id_col} long, _muvera array<float>"
    )


def muvera_search(
    df: DataFrame,
    id_col: str,
    token_vectors_col: str,
    query_tokens: Sequence[Sequence[float]],
    spec: MuveraSpec,
    limit: int = 10,
    overfetch: int = 2,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """MUVERA overfetch + exact rescore (hnsw/search.go:101-120):
    top-(overfetch*k) candidates by dot product on the fixed-dim
    encodings (single-vector search shape — TakeOrdered, no shuffle),
    then exact maxsim ONLY on the candidate rows. Pass a pre-built
    ``encoded`` table to skip re-encoding the corpus per query — the
    scale path when token arrays are large (the FDE dot costs
    O(encoded_dim) vs maxsim's O(n_tokens^2 * dim))."""
    if encoded is None:
        encoded = muvera_encode_df(df, id_col, token_vectors_col, spec)
    q = muvera_encode_query(query_tokens, spec)
    cand = (
        encoded.withColumn(
            "_fde_sim",
            _dot(F.col("_muvera"), F.array(*[F.lit(x) for x in q])),
        )
        .orderBy(F.col("_fde_sim").desc(), F.col(id_col).asc())
        .limit(overfetch * limit)
        .select(id_col)
    )
    pruned = df.join(F.broadcast(cand), id_col)
    return multivector_search(pruned, id_col, token_vectors_col, query_tokens, limit)
