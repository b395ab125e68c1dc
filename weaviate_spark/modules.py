"""Module registry: the UDF extension surface (SURVEY §2.10).

Weaviate's extension point is capability modules
(entities/modulecapabilities/, usecases/modules/): vectorizers
(text2vec-*), rerankers (reranker-*), generative (generative-*). The
Spark mapping is a registry of Arrow-batched pandas_udfs applied as
plan stages:

* vectorizer  — text -> array<float>; applied at ingest
  (withColumn("_vector", ...)) and to nearText query strings
  (driver-side, same function — the VectorFromInput analogue).
* reranker    — (query, doc text) -> score; applied to the top-k
  window after search (reranker-* modules re-order the fetched k).
* generative  — (prompt, doc) -> text; per-result map stage
  (generative-* single-prompt mode).

Shipped implementations are deterministic dummies (like the
reference's own `generative-dummy` module) so pipelines are testable
offline; a real model plugs in by registering a function with the same
signature — the plan shape does not change.

nearText's moveTo/moveAwayFrom concept arithmetic
(retrieval.go:149-160): q' = q + force*(avg(to) - q) - force*(avg(away) - q),
implemented on the driver-side query vector.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

VECTORIZERS: dict[str, Callable] = {}
RERANKERS: dict[str, Callable] = {}
GENERATIVES: dict[str, Callable] = {}


def register_vectorizer(name: str):
    def deco(fn):
        VECTORIZERS[name] = fn
        return fn
    return deco


def hash_embed_py(text: str, dim: int = 16) -> list[float]:
    """Deterministic text embedding: md5-seeded unit vector (the
    text2vec-dummy). Same function serves column batches and query
    strings, so nearText is self-consistent."""
    raw = []
    data = (text or "").encode()
    for d in range(dim):
        h = hashlib.md5(data + d.to_bytes(4, "little")).digest()
        raw.append(int.from_bytes(h[:4], "little") / 0xFFFFFFFF - 0.5)
    n = math.sqrt(sum(x * x for x in raw)) or 1.0
    return [x / n for x in raw]


@register_vectorizer("text2vec-dummy")
def text2vec_dummy(dim: int = 16):
    @pandas_udf("array<float>")
    def _embed(batch: pd.Series) -> pd.Series:
        return batch.map(lambda t: hash_embed_py(t, dim))

    return _embed


def cjk_dict_tokenize_udf():
    """Arrow-batched 'gse_dict' tokenizer (defined here: this module has
    no `from __future__ import annotations`, which pandas_udf's type-
    hint introspection requires)."""
    from weaviate_spark.functions.text import tokenize_cjk_dict_py

    @pandas_udf("array<string>")
    def _seg(batch: pd.Series) -> pd.Series:
        return batch.map(lambda t: tokenize_cjk_dict_py(t or ""))

    return _seg


def hash_embed_udf(dim: int = 16):
    """Double-precision variant of the dummy vectorizer: bit-exact with
    the oracle's md5 SQL mirror (array<float> truncation would round
    differently at the 6dp hash boundary)."""

    @pandas_udf("array<double>")
    def _embed(batch: pd.Series) -> pd.Series:
        return batch.map(lambda t: hash_embed_py(t, dim))

    return _embed


def vectorize_column(text_col: Column, module: str = "text2vec-dummy", dim: int = 16) -> Column:
    """Ingest-time vectorizer stage: withColumn('_vector', ...)."""
    return VECTORIZERS[module](dim)(text_col)


def near_text_vector(
    concepts: list[str],
    module: str = "text2vec-dummy",
    dim: int = 16,
    move_to: list[str] | None = None,
    move_away: list[str] | None = None,
    force: float = 0.5,
) -> list[float]:
    """Query-side nearText: embed concepts (averaged), then apply
    moveTo/moveAwayFrom concept arithmetic (retrieval.go:149-160)."""
    def avg(texts: list[str]) -> list[float]:
        vs = [hash_embed_py(t, dim) for t in texts]
        return [sum(col) / len(vs) for col in zip(*vs)]

    q = avg(concepts)
    if move_to:
        to = avg(move_to)
        q = [qi + force * (ti - qi) for qi, ti in zip(q, to)]
    if move_away:
        aw = avg(move_away)
        q = [qi - force * (ai - qi) for qi, ai in zip(q, aw)]
    return q


def reranker_dummy(query: str):
    """Deterministic rerank score: token-overlap ratio with the query
    (the reranker-dummy). Returns a pandas_udf over doc text."""
    qtok = set((query or "").lower().split())

    @pandas_udf("double")
    def _score(batch: pd.Series) -> pd.Series:
        def s(t):
            dtok = set((t or "").lower().split())
            return len(qtok & dtok) / (len(qtok) or 1)
        return batch.map(s)

    return _score


RERANKERS["reranker-dummy"] = reranker_dummy


def generative_dummy(prompt_template: str):
    """Per-result generative stage (generative-dummy): fills {text}
    into the template — the plan-stage shape of generative-* modules."""
    @pandas_udf("string")
    def _gen(batch: pd.Series) -> pd.Series:
        return batch.map(lambda t: prompt_template.replace("{text}", t or ""))

    return _gen


GENERATIVES["generative-dummy"] = generative_dummy


def ref2vec_centroid(
    parents: DataFrame,
    parent_id: str,
    refs_col: str,
    targets: DataFrame,
    target_id: str,
    vector_col: str,
) -> DataFrame:
    """ref2vec-centroid (modules/ref2vec-centroid, calculation method
    "mean"): a parent object's vector = element-wise MEAN of its
    referenced objects' vectors. Returns (parent_id, _vector).

    Plan: explode the ref set -> equi-join target vectors -> posexplode
    -> per-(parent, position) avg -> reassemble ordered by position.
    Two shuffles (ref join + the (parent, pos) agg), both map-side
    combined; no vector ever moves whole through the agg — positions
    distribute, so even high-fan-in parents (one parent referencing
    millions of objects) never funnel raw vectors through one reducer.
    """
    ex = parents.select(F.col(parent_id), F.explode(refs_col).alias("_ref"))
    joined = ex.join(
        targets.select(
            F.col(target_id).alias("_ref"), F.col(vector_col).alias("_v")
        ),
        "_ref",
    )
    long = joined.select(parent_id, F.posexplode("_v").alias("_pos", "_x"))
    agg = long.groupBy(parent_id, "_pos").agg(
        F.avg(F.col("_x").cast("double")).alias("_c")
    )
    return (
        agg.groupBy(parent_id)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_c"))).alias("_a"))
        .select(parent_id, F.transform("_a", lambda s: s["_c"]).alias("_vector"))
    )


def generate_grouped(
    hits: DataFrame,
    order_col: str,
    text_col: str,
    prompt_template: str,
    sep: str = " | ",
) -> DataFrame:
    """Grouped generative task (search_get.proto GenerativeSearch grouped
    result; generative.go groupedResult): ONE prompt filled with ALL
    results' text joined in rank order — versus the per-result
    singleResult path (generative_dummy). Returns one row (task_result).

    `hits` is an already-capped result set (<= limit rows), so the
    collect_list aggregate is driver-scale by construction; the template
    fill is a pure JVM concat (no UDF)."""
    one = hits.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(order_col).alias("_r"), F.col(text_col).alias("_t"))
            )
        ).alias("_a")
    )
    joined = F.array_join(F.transform(F.col("_a"), lambda s: s["_t"]), sep)
    before, _, after = prompt_template.partition("{text}")
    return one.select(
        F.concat(F.lit(before), joined, F.lit(after)).alias("task_result")
    )
