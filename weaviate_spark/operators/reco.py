"""Collaborative-filtering primitives: item-item cosine similarity and
user top-N recommendation over an implicit-feedback interaction table.

Beyond the reference's operator surface (its similarity layer is
vector-space only) but a first-class workload for the analytics/
training-data engine this repo targets: co-interaction statistics are
the classic "users who bought X also bought Y" signal, and the same
sparse-cosine shape powers retrieval-bias audits over training corpora.

Scale design (the part that must survive 100 TB):

* The interaction matrix is held sparse — one row per (user, item,
  rating) — and the item-item numerator comes from a self-join on the
  USER key: candidates are Σ_u (items-per-user)², bounded by activity
  per user, never |items|² (a dense item-item product is exactly what
  dies at catalog scale). One shuffle on user builds every pair.
* Item norms are a per-item aggregate (integer/decimal-exact sums) and
  broadcast back — the item dimension is always the small side.
* Top-k neighbors per item via a bounded window (rank over round(cos))
  so ties resolve identically in any engine.
* User recommendations reuse the pruned top-k neighbor table (k·|items|
  rows, broadcastable) joined once against each user's history: one
  shuffle on user, no user×catalog blowup; already-interacted items
  are removed with a left-anti join on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weaviate_spark.cache import register_cache


def item_item_cosine(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    k: int = 5,
    min_co_users: int = 2,
) -> DataFrame:
    """Top-``k`` most-similar items per item by cosine over the sparse
    user-interaction vectors: (item_a, item_b, n_co_users, cosine),
    one row per ordered (a, every-b-in-top-k) pair.

    ``rating_col`` values are cast to DECIMAL(18,2): sums and
    sums-of-squares are then partition-order-independent, so the final
    cosine divides bit-identical inputs in every engine (the
    profile_columns determinism argument applied to co-moments).
    Pairs with fewer than ``min_co_users`` shared users are pruned
    before ranking — both a noise filter and the candidate bound.
    """
    r = interactions.select(
        F.col(user_col).alias("_u"),
        F.col(item_col).alias("_i"),
        F.col(rating_col).cast("decimal(18,2)").alias("_r"),
    )
    r = register_cache(r.cache())
    norms = r.groupBy("_i").agg(
        F.sum(F.col("_r") * F.col("_r")).alias("_sq")
    )
    # posting-list pair emission (the _band_candidates /
    # link-prediction shape): ONE groupBy shuffle of the interaction
    # stream + a double explode of each user's (item, rating) list,
    # instead of shuffling the cached stream once per self-join side.
    # collect_list preserves multiplicity, so the pair multiset — and
    # the DECIMAL dot sums — are bit-identical to the join (verified
    # exceptAll-empty both directions at sf1).
    plist = r.groupBy("_u").agg(
        F.collect_list(F.struct("_i", "_r")).alias("_ps")
    ).where(F.size("_ps") >= 2)
    num = (
        plist.select(F.explode("_ps").alias("_pa"), "_ps")
        .select(
            F.col("_pa._i").alias("item_a"),
            F.col("_pa._r").alias("_ra"),
            F.explode("_ps").alias("_pb"),
        )
        .where(F.col("item_a") != F.col("_pb._i"))
        .groupBy("item_a", F.col("_pb._i").alias("item_b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_co_users"),
            F.sum(F.col("_ra") * F.col("_pb._r")).alias("_dot"),
        )
        .where(F.col("n_co_users") >= int(min_co_users))
    )
    na = norms.select(F.col("_i").alias("item_a"), F.col("_sq").alias("_sqa"))
    nb = norms.select(F.col("_i").alias("item_b"), F.col("_sq").alias("_sqb"))
    cos = (
        num.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .withColumn(
            "cosine",
            F.round(
                F.col("_dot").cast("double")
                / F.sqrt(F.col("_sqa").cast("double") * F.col("_sqb").cast("double")),
                6,
            )
            + F.lit(0.0),
        )
    )
    w = Window.partitionBy("item_a").orderBy(
        F.col("cosine").desc(), F.col("item_b").asc()
    )
    return (
        cos.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            "item_a",
            "item_b",
            "n_co_users",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def recommend_items(
    interactions: DataFrame,
    neighbors: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    n: int = 3,
) -> DataFrame:
    """Top-``n`` new-item recommendations per user from a pruned
    item-item ``neighbors`` table (the output of item_item_cosine):
    score(u, j) = Σ_{i ∈ history(u)} cosine(i, j) · rating(u, i),
    restricted to items j the user has NOT interacted with.

    The neighbor table is k·|items| rows — broadcast it; the history
    join and the anti-join both key on the user/item pair, so the
    whole plan is one shuffle on the user key plus two broadcasts.
    """
    r = interactions.select(
        F.col(user_col).alias("_u"),
        F.col(item_col).alias("_i"),
        F.col(rating_col).cast("decimal(18,2)").alias("_r"),
    )
    nb = neighbors.select(
        F.col("item_a").alias("_i"),
        F.col("item_b").alias("_j"),
        F.col("cosine").alias("_c"),
    )
    scored = (
        r.join(F.broadcast(nb), "_i")
        .groupBy(F.col("_u"), F.col("_j"))
        .agg(
            F.round(
                F.sum(F.col("_c") * F.col("_r").cast("double")), 6
            ).alias("_score")
        )
    )
    seen = r.select("_u", F.col("_i").alias("_j"))
    fresh = scored.join(seen, ["_u", "_j"], "left_anti")
    w = Window.partitionBy("_u").orderBy(F.col("_score").desc(), F.col("_j").asc())
    return (
        fresh.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(n))
        .select(
            F.col("_u").alias(user_col),
            F.col("_j").alias("recommended_item"),
            (F.col("_score") + F.lit(0.0)).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
