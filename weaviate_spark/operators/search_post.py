"""Search post-processing stages: result groupBy and autocut
(SURVEY §2.5; reference: adapters/repos/db/shard_group_by.go:29-180,
entities/autocut/autocut.go:14-51).

Stage order in the reference pipeline (explorer.go / hybrid/searcher.go):
fusion -> autocut -> groupBy -> projection. Both stages operate on the
already-capped top-k result (<= QueryMaximumResults rows), so window
functions / a driver-side pure function are exact and cheap — the
corpus never flows through here.
"""

from __future__ import annotations

from typing import Sequence

from weaviate_spark.cache import local_df
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_search_results(
    hits: DataFrame,
    group_col: str,
    order_keys: Sequence,
    groups: int,
    objects_per_group: int,
) -> DataFrame:
    """weaviate search-groupBy (shard_group_by.go):

    * hits ordered by `order_keys` — (Column, ascending) pairs, e.g.
      ``[(F.col("_distance"), True), (F.col(id), True)]``; descending
      keys must be numeric (they are negated to build an ascending
      composite sort key);
    * group admission order = first occurrence of the group value in
      hit order (the group's best hit), first `groups` values kept;
    * each group keeps its best `objects_per_group` hits;
    * array-valued group props: explode first (an object may appear in
      several groups) — caller explodes before passing in.

    Adds `_group_rank` (admission order) and `_in_group_rank`.

    No single-partition window: in-group ranks use a window PARTITIONED
    by the group value; the global admission order is computed on the
    one-row-per-group "best hit" frame (<= #groups rows, itself bounded
    by the capped hit count) via collect_list -> array_sort ->
    posexplode, then broadcast-joined back.
    """
    sort_cols = [c.asc() if asc else c.desc() for c, asc in order_keys]
    w_grp = Window.partitionBy(group_col).orderBy(*sort_cols)
    ranked = hits.withColumn("_in_group_rank", F.row_number().over(w_grp))

    key_fields = [
        (c if asc else (-c.cast("double"))).alias(f"_k{i}")
        for i, (c, asc) in enumerate(order_keys)
    ]
    best = ranked.where(F.col("_in_group_rank") == 1).select(
        F.struct(*key_fields, F.col(group_col).alias("_g")).alias("_key")
    )
    admitted = (
        best.agg(F.array_sort(F.collect_list("_key")).alias("_a"))
        .select(F.posexplode("_a").alias("_r0", "_row"))
        .select(
            F.col("_row._g").alias("_g"),
            (F.col("_r0") + 1).alias("_group_rank"),
        )
        .where(F.col("_group_rank") <= groups)
    )
    return (
        ranked.join(
            F.broadcast(admitted), ranked[group_col] == admitted["_g"]
        )
        .where(F.col("_in_group_rank") <= objects_per_group)
        .drop("_g")
    )


def group_result_structs(
    grouped: DataFrame,
    group_col: str,
    dist_col: str,
    id_col: str,
    path: Sequence[str] | None = None,
    hybrid: bool = False,
) -> DataFrame:
    """Collapse a `group_search_results` frame to one row per group in
    the reference's Group shape (entities/additional/group.go:20-38):

        _group_id  — 0-based admission order (Group.ID)
        group      — struct(groupedBy{value, path}, minDistance,
                     maxDistance, count, hits[{id, distance}])

    minDistance/maxDistance are the first / last kept hit's distance
    (adapters/repos/db/shard_group_by.go:193-194); the hybrid pipeline
    sets BOTH to the first hit's score
    (usecases/traverser/hybrid_group_by.go:108-115) — pass
    ``hybrid=True`` for that. `hits` preserve in-group rank order.

    One shuffle on the group value; group count is bounded by the capped
    hit set, so every aggregate here is tiny regardless of corpus size.
    """
    hit = F.struct(
        F.col("_in_group_rank").alias("_r"),
        F.col(id_col).cast("string").alias("id"),
        F.col(dist_col).cast("double").alias("distance"),
    )
    first = F.min_by(F.col(dist_col).cast("double"), F.col("_in_group_rank"))
    last = F.max_by(F.col(dist_col).cast("double"), F.col("_in_group_rank"))
    agg = grouped.groupBy(F.col("_group_rank"), F.col(group_col).alias("_value")).agg(
        first.alias("_mind"),
        (first if hybrid else last).alias("_maxd"),
        F.count(F.lit(1)).alias("_count"),
        F.array_sort(F.collect_list(hit)).alias("_hits_r"),
    )
    path_lits = [F.lit(p) for p in (list(path) if path else [group_col])]
    return agg.select(
        (F.col("_group_rank") - 1).cast("int").alias("_group_id"),
        F.struct(
            F.struct(
                F.col("_value").cast("string").alias("value"),
                F.array(*path_lits).alias("path"),
            ).alias("groupedBy"),
            F.col("_mind").alias("minDistance"),
            F.col("_maxd").alias("maxDistance"),
            F.col("_count").cast("int").alias("count"),
            F.transform(
                "_hits_r",
                lambda h: F.struct(h["id"].alias("id"), h["distance"].alias("distance")),
            ).alias("hits"),
        ).alias("group"),
    )


def autocut_index(scores: Sequence[float], cut_off: int) -> int:
    """Pure-function port of the reference's extremum cut
    (autocut.go:14-51): normalize score-vs-rank to the unit square,
    diff[i] = normalized_score[i] - x[i]; return the index before the
    `cut_off`-th local maximum of diff, else len(scores)."""
    n = len(scores)
    if n <= 1:
        return n
    step = 1.0 / (n - 1)
    denom = scores[-1] - scores[0]
    diff = []
    for i, y in enumerate(scores):
        y_norm = (y - scores[0]) / denom if denom != 0 else 0.0
        diff.append(y_norm - i * step)
    extrema = 0
    for i in range(1, n):
        if i == n - 1:
            if n > 1 and diff[i] > diff[i - 1] and (n < 3 or diff[i] > diff[i - 2]):
                extrema += 1
                if extrema >= cut_off:
                    return i
        else:
            if diff[i] > diff[i - 1] and diff[i] > diff[i + 1]:
                extrema += 1
                if extrema >= cut_off:
                    return i
    return n


def apply_autocut(hits: DataFrame, score_col: str, cut_off: int) -> DataFrame:
    """Autocut over an already-ordered top-k result: collect the (small,
    <= limit) score column, compute the cut index driver-side, keep the
    first `cut` rows. Deterministic pure function of the scores; the
    unit-square extremum cut is direction-invariant, so no sort-direction
    parameter is needed."""
    if cut_off <= 0:
        return hits
    rows = hits.select(score_col).collect()
    scores = [float(r[0]) for r in rows]
    cut = autocut_index(scores, cut_off)
    return hits.limit(cut)


def attach_feature_projection(
    spark,
    hits: DataFrame,
    sf_dir: str,
    collection: str,
    id_col: str,
    vector_col: str,
    params=None,
    seed: int = 0,
) -> DataFrame:
    """_additional { featureProjection } as a search post-stage
    (modulecomponents/additional/projector — the reference runs it
    over the ≤limit result window in-process; same envelope here):
    join the hits back to their vectors, t-SNE the WINDOW driver-side
    (operators/projector.py, seeded), and return the hits with a
    ``featureProjection`` array column. Row order and every other
    column are preserved."""
    from weaviate_spark.operators.projector import feature_projection
    from weaviate_spark.sources.tables import load_table

    # materialize the window ONCE, then fetch exactly its vectors with
    # an IN-pushed point lookup (page-pruned parquet scan)
    rows = [r.asDict() for r in hits.collect()]
    ids = [r[id_col] for r in rows]
    vec_of = {r[0]: r[1] for r in load_table(spark, sf_dir, collection)
              .select(id_col, vector_col)
              .where(F.col(id_col).isin(ids)).collect()}
    for r in rows:
        r["_fp_vec"] = vec_of.get(r[id_col])
    projected = feature_projection(rows, "_fp_vec", params, seed=seed)
    for r in projected:
        r.pop("_fp_vec", None)
    out_fields = [f for f in hits.schema.fields]
    from pyspark.sql import types as T

    schema = T.StructType(out_fields + [
        T.StructField("featureProjection", T.ArrayType(T.DoubleType()))])
    return local_df(
        spark,
        [tuple(r.get(f.name) for f in schema.fields) for r in projected],
        schema)
