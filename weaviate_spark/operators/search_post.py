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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_search_results(
    hits: DataFrame,
    group_col: str,
    order_cols: Sequence,
    groups: int,
    objects_per_group: int,
) -> DataFrame:
    """weaviate search-groupBy (shard_group_by.go):

    * hits ordered by `order_cols` (distance asc / score desc + id);
    * group admission order = first occurrence of the group value in
      hit order (min hit rank), first `groups` values kept;
    * each group keeps its best `objects_per_group` hits;
    * array-valued group props: explode first (an object may appear in
      several groups) — caller explodes before passing in.

    Adds `_group_rank` (admission order) and `_in_group_rank`.
    """
    w_all = Window.orderBy(*order_cols)
    ranked = hits.withColumn("_rnk", F.row_number().over(w_all))
    w_grp = Window.partitionBy(group_col).orderBy(F.col("_rnk"))
    ranked = ranked.withColumn("_in_group_rank", F.row_number().over(w_grp))
    best = Window.partitionBy(group_col)
    ranked = ranked.withColumn("_best", F.min("_rnk").over(best))
    admission = Window.orderBy(F.col("_best"))
    ranked = ranked.withColumn("_group_rank", F.dense_rank().over(admission))
    return (
        ranked.where(
            (F.col("_group_rank") <= groups)
            & (F.col("_in_group_rank") <= objects_per_group)
        )
        .drop("_rnk", "_best")
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


def apply_autocut(
    hits: DataFrame, score_col: str, cut_off: int, ascending: bool = True
) -> DataFrame:
    """Autocut over an already-ordered top-k result: collect the (small,
    <= limit) score column, compute the cut index driver-side, keep the
    first `cut` rows. Deterministic pure function of the scores."""
    if cut_off <= 0:
        return hits
    rows = hits.select(score_col).collect()
    scores = [float(r[0]) for r in rows]
    cut = autocut_index(scores, cut_off)
    return hits.limit(cut)
