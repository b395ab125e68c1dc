"""BM25 / BM25F keyword search (SURVEY §2.5).

Semantics from the reference (adapters/repos/db/inverted/bm25_searcher.go,
terms/terms.go):

* idf(term)  = ln(1 + (N - n + 0.5)/(n + 0.5)), N clamped to >= n
  (terms/terms.go:64-72 Idf). n = docs containing the term in the
  property, N = total docs.
* tf(doc,prop) = freq / (freq + k1*(1 - b + b*propLen/avgPropLen))
  (terms/terms.go:242-249 Score), defaults k1=1.2 b=0.75
  (usecases/config/config_handler.go:57-58).
* per-term-per-property contribution = tf * idf * propertyBoost;
  a document's score is the sum over query terms and searched
  properties (BM25F additive form).
* avgPropLen is the mean of the per-property mean lengths across all
  searched properties (bm25_searcher.go:408-446) — NOT per-property.
* searchOperator Or (default) / And, And = doc must match every query
  term in at least one property; minimumOrTokensMatch = Or with a
  floor on distinct matched terms (base_search.proto:48-58).
* duplicate query terms boost frequency (terms.go:59 freq*boost) — we
  multiply the per-(doc,term) contribution count the same way.
* top-k ties: score desc, then `_id` asc (sortby_scores.go / §4.3).

Execution strategy (batch, WAND-free): the reference's WAND/BlockMax
pruning exists to avoid scoring every doc on a serving path; a batch
engine scores the full candidate set — same results by construction
(SURVEY §4.1). The plan:

    tokens   = explode(tokenize(prop))          -- narrow
    doclen   = groupBy(id).count()              -- shuffle on id
    tf       = tokens.filter(term IN query)     -- filter BEFORE agg:
               .groupBy(id, term).count()          only query terms shuffle
    stats    = N, avgdl (tiny agg, broadcast)
    df_t     = tf.groupBy(term).count()         -- |query| rows, broadcast
    score    = sum over matched terms           -- shuffle on id
    topk     = orderBy(score desc, id asc).limit(k)  -- TakeOrdered

Scale notes: the only wide ops shuffle on doc id (high cardinality, no
skew) and everything upstream of them is filtered to query terms first.
For a standing corpus, `corpus_stats` (N, avgdl, per-term df) can be
materialized once as small tables and broadcast-joined — the Spark
analogue of the reference's prop_length_tracker + inverted index
statistics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weaviate_spark.filters import Clause, apply_where
from weaviate_spark.functions.text import tokenize, tokenize_py
from weaviate_spark.sources.tables import load_table

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


@dataclass
class BM25Prop:
    name: str
    boost: float = 1.0          # "prop^2" syntax in the API
    tokenization: str = "word"


@dataclass
class BM25Spec:
    collection: str
    query: str
    properties: Sequence[BM25Prop]
    id_col: str                  # unique doc id column
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    limit: int = 100
    search_operator: str = "Or"  # Or | And
    minimum_or_tokens_match: int = 0
    where: Optional[Clause] = None
    round_digits: Optional[int] = 6  # deterministic cross-engine hashing


def bm25_search(spark: SparkSession, sf_dir: str, spec: BM25Spec) -> DataFrame:
    """Top-k BM25F search; returns (id_col, _score) plus match count."""
    df = apply_where(load_table(spark, sf_dir, spec.collection), spec.where)
    return bm25_score_df(df, spec).orderBy(
        F.col("_score").desc(), F.col(spec.id_col).asc()
    ).limit(spec.limit)


def bm25_score_df(df: DataFrame, spec: BM25Spec) -> DataFrame:
    """Score every matching document (no limit); building block for
    hybrid fusion and aggregation-with-objectLimit.

    Plan shape (per property): ONE tokenize+explode scan -> ONE shuffle:
    ``groupBy(doc).agg(count(*) AS len, sum(term = t_i) AS f_i ...)`` —
    doc length and all per-term frequencies come out of the same
    aggregation (wide form), so the corpus is scanned once and only doc
    rows (not token rows x terms) move. Corpus stats (N, avgdl, df_t)
    are one tiny agg over the wide table, collected as literals — the
    Spark analogue of the reference's prop_length_tracker + term
    statistics, which a standing deployment materializes once.
    """
    id_col = spec.id_col

    per_prop: list[tuple[BM25Prop, DataFrame, dict, dict, float, float]] = []
    for prop in spec.properties:
        qtokens = tokenize_py(spec.query, prop.tokenization)
        if not qtokens:
            continue
        # duplicate query terms boost frequency (terms.go:59)
        qboost = {t: float(qtokens.count(t)) for t in set(qtokens)}
        terms = sorted(qboost)
        # single-file inputs arrive as 1 partition — tokenization is the
        # CPU-heavy stage, spread it (no-op when input is already split)
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < parallelism:
            df = df.repartition(parallelism)
        toks = df.select(
            F.col(id_col).alias("_doc"),
            F.explode(tokenize(F.col(prop.name), prop.tokenization)).alias("_term"),
        )
        # cached: the stats agg below and the scoring projection both read
        # this — one corpus scan total, not two
        wide = toks.groupBy("_doc").agg(
            F.count(F.lit(1)).alias("_len"),
            *[
                F.sum(F.when(F.col("_term") == t, 1).otherwise(0)).alias(f"_f{i}")
                for i, t in enumerate(terms)
            ],
        ).cache()
        srow = wide.agg(
            F.count(F.lit(1)).alias("_ndocs"),
            F.avg("_len").alias("_avglen"),
            *[
                F.sum(F.when(F.col(f"_f{i}") > 0, 1).otherwise(0)).alias(f"_n{i}")
                for i in range(len(terms))
            ],
        ).collect()[0]
        n_t = {t: float(srow[f"_n{i}"] or 0) for i, t in enumerate(terms)}
        per_prop.append((
            prop, wide, qboost, n_t,
            float(srow["_ndocs"] or 0), float(srow["_avglen"] or 0.0),
        ))

    if not per_prop:
        return df.select(F.col(id_col)).where(F.lit(False)).withColumn(
            "_score", F.lit(0.0)
        ).withColumn("_terms_matched", F.lit(0))

    # avgPropLen = mean of per-property means (bm25_searcher.go:408-446);
    # NaN/0 fallback is 40.0 (:452-453)
    means = [avg for *_, avg in per_prop if avg > 0]
    avgdl = sum(means) / len(means) if means else 40.0

    contrib_frames = []
    for prop, wide, qboost, n_t, N_docs, _avg in per_prop:
        terms = sorted(qboost)
        score = None
        matched = None
        for i, t in enumerate(terms):
            n = n_t[t]
            if n <= 0:
                continue
            # idf with N clamped to >= n (terms.go:67-71)
            N = max(N_docs, n)
            idf = math.log(1.0 + (N - n + 0.5) / (n + 0.5))
            freq = F.col(f"_f{i}").cast("double") * F.lit(qboost[t])
            tf_norm = freq / (
                freq + F.lit(spec.k1) * (1 - spec.b + spec.b * F.col("_len") / F.lit(avgdl))
            )
            term_score = F.when(F.col(f"_f{i}") > 0, tf_norm * F.lit(idf * prop.boost)).otherwise(0.0)
            term_hit = F.when(F.col(f"_f{i}") > 0, F.lit(t)).otherwise(F.lit(None))
            score = term_score if score is None else score + term_score
            matched = F.array(term_hit) if matched is None else F.concat(matched, F.array(term_hit))
        if score is None:
            continue
        matched_terms = F.filter(matched, lambda x: x.isNotNull())
        contrib_frames.append(
            wide.where(F.size(matched_terms) > 0).select(
                "_doc",
                score.alias("_pscore"),
                matched_terms.alias("_pterms"),
            )
        )

    if not contrib_frames:
        return df.select(F.col(id_col)).where(F.lit(False)).withColumn(
            "_score", F.lit(0.0)
        ).withColumn("_terms_matched", F.lit(0))

    allc = contrib_frames[0]
    for c in contrib_frames[1:]:
        allc = allc.unionByName(c)

    if len(contrib_frames) == 1:
        out = allc.select(
            "_doc",
            F.col("_pscore").alias("_score"),
            F.size("_pterms").alias("_terms_matched"),
        )
    else:
        out = allc.groupBy("_doc").agg(
            F.sum("_pscore").alias("_score"),
            F.size(F.array_distinct(F.flatten(F.collect_list("_pterms")))).alias(
                "_terms_matched"
            ),
        )

    n_query_terms = len(
        set().union(*[set(tokenize_py(spec.query, p.tokenization)) for p in spec.properties])
    )
    if spec.search_operator == "And":
        out = out.where(F.col("_terms_matched") == n_query_terms)
    elif spec.minimum_or_tokens_match > 0:
        out = out.where(
            F.col("_terms_matched") >= min(spec.minimum_or_tokens_match, n_query_terms)
        )

    if spec.round_digits is not None:
        out = out.withColumn("_score", F.round("_score", spec.round_digits))
    return out.withColumnRenamed("_doc", spec.id_col)


def bm25_oracle_sql(
    table: str,
    text_col: str,
    id_col: str,
    query: str,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    limit: int = 100,
    search_operator: str = "Or",
    minimum_or_tokens_match: int = 0,
) -> str:
    """DuckDB SQL computing the identical single-property BM25 result —
    the generated-oracle counterpart of bm25_search."""
    qtokens = tokenize_py(query, "word")
    qboost = {t: qtokens.count(t) for t in set(qtokens)}
    terms_sql = ", ".join(f"('{t}', {c})" for t, c in sorted(qboost.items()))
    n_terms = len(qboost)
    if search_operator == "And":
        having = f"HAVING count(DISTINCT _term) = {n_terms}"
    elif minimum_or_tokens_match > 0:
        having = f"HAVING count(DISTINCT _term) >= {min(minimum_or_tokens_match, n_terms)}"
    else:
        having = ""
    return f"""
WITH toks AS (
  SELECT {id_col} AS _doc, unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS _term
  FROM {table}
),
doclen AS (SELECT _doc, count(*) AS _len FROM toks GROUP BY _doc),
stats AS (SELECT count(*) AS _ndocs, avg(_len) AS _avgdl FROM doclen),
qterms(_term, _boost) AS (VALUES {terms_sql}),
tf AS (
  SELECT _doc, toks._term, count(*) * _boost AS _freq
  FROM toks JOIN qterms ON toks._term = qterms._term
  GROUP BY _doc, toks._term, _boost
),
n_t AS (SELECT _term, count(*) AS _n FROM tf GROUP BY _term),
contrib AS (
  SELECT tf._doc, tf._term,
    (tf._freq / (tf._freq + {k1} * (1 - {b} + {b} * doclen._len / stats._avgdl)))
    * ln(1 + (greatest(CAST(stats._ndocs AS DOUBLE), _n) - _n + 0.5) / (_n + 0.5)) AS _c
  FROM tf
  JOIN doclen ON tf._doc = doclen._doc
  JOIN n_t ON tf._term = n_t._term
  CROSS JOIN stats
)
SELECT _doc AS {id_col}, round(sum(_c), 6) AS _score,
       CAST(count(DISTINCT _term) AS BIGINT) AS _terms_matched
FROM contrib GROUP BY _doc {having}
ORDER BY _score DESC, {id_col} ASC LIMIT {limit}
"""
