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
        q = F.array(*[F.lit(float(x)) for x in qt])
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
