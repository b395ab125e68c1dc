"""Incrementally-maintained aggregate materialized views.

The reference keeps per-shard property aggregations current by applying
each write batch to tracker state rather than rescanning the store
(adapters/repos/db/inverted/prop_length_tracker.go is the same idea for
BM25 stats). The Spark-first analogue for ANY distributive aggregate
view (count / sum / min / max, with avg derived at read time) is
classic delta maintenance (self-maintainable views over insertions —
Gupta & Mumick, "Maintenance of Materialized Views", IEEE DE Bull.
1995): keep the view as PARTIAL STATE rows (group keys + mergeable
accumulators), fold each arriving batch as

    state' = merge(state, partial(batch))

where ``partial`` is a map-side-combined groupBy of the batch alone
(O(batch) work, never O(corpus)) and ``merge`` is a groupBy over the
union of two state frames (O(|state|) — bounded by the group-key
cardinality, not the fact count). ``localCheckpoint`` after every merge
keeps the plan O(1) in the number of batches — the same
iterative-lineage idiom as the Pregel loops and the LSM segment store.

At 100 TB the point is the read path never rescans history: a daily
ingest folds its partial in, and the finalized view (avg = sum/count
etc.) is a projection of state that is bit-identical to a full
recompute — which is exactly what the oracle checks.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# accumulator kinds and their merge function over state rows
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def partial_state(
    batch: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Mergeable partial state for one batch.

    ``measures`` maps output column -> (kind, input expression) with
    kind in {sum, count, min, max}. Sums should be handed DECIMAL
    expressions so merge order can never split results from a
    one-pass recompute.
    """
    aggs = []
    for name, (kind, expr) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.expr(expr)).alias(name))
        elif kind == "sum":
            aggs.append(F.sum(F.expr(expr)).alias(name))
        elif kind == "min":
            aggs.append(F.min(F.expr(expr)).alias(name))
        elif kind == "max":
            aggs.append(F.max(F.expr(expr)).alias(name))
        else:
            raise ValueError(f"unknown measure kind {kind!r}")
    return batch.groupBy(*keys).agg(*aggs)


def merge_state(
    state: DataFrame | None,
    delta: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Fold one batch's partial state into the view state; O(|state| +
    |delta|), lineage truncated so a year of daily folds plans the
    same as one."""
    if state is None:
        merged = delta
    else:
        both = state.unionByName(delta)
        merged = both.groupBy(*keys).agg(
            *[
                _MERGES[kind](F.col(name)).alias(name)
                for name, (kind, _) in measures.items()
            ]
        )
    return merged.localCheckpoint(eager=True)


def apply_cdf(
    state: DataFrame | None,
    changes: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Advance the view through a CHANGE feed (crud.table_changes_feed
    rows carrying ``_change_type``) — the Gupta & Mumick counting
    algorithm for views with deletions: postimages and inserts
    contribute positively, preimages and deletes negatively, so

        state' = state ⊎ partial(Δ+) ⊖ partial(Δ-)

    holds for the SELF-MAINTAINABLE kinds only: ``sum`` and ``count``
    (signed merge). ``min``/``max`` are not maintainable under
    deletion without auxiliary per-key heaps — requesting one raises,
    steering callers to the insert-only ``merge_state`` path or a
    recompute.

    O(|changes|) work per advance; the read path stays a projection of
    state. Groups whose count reaches 0 are dropped (the counting
    algorithm's tombstone rule), so a fully-deleted group disappears
    exactly as a recompute would have it.
    """
    bad = [n for n, (k, _) in measures.items() if k not in ("sum", "count")]
    if bad:
        raise ValueError(
            f"apply_cdf only maintains sum/count measures under "
            f"deletion; {bad} need merge_state (insert-only) or a "
            "recompute")
    pos = changes.where(F.col("_change_type")
                        .isin("insert", "update_postimage"))
    neg = changes.where(F.col("_change_type")
                        .isin("delete", "update_preimage"))

    def signed(batch: DataFrame, sign: int) -> DataFrame:
        p = partial_state(batch, keys, measures)
        if sign < 0:
            p = p.select(*keys, *[(-F.col(n)).alias(n)
                                  for n in measures])
        return p

    delta = signed(pos, +1).unionByName(signed(neg, -1))
    merged = merge_state(state, delta, keys, measures)
    # counting-algorithm tombstones: drop groups whose every count hit 0
    count_cols = [n for n, (k, _) in measures.items() if k == "count"]
    if count_cols:
        alive = count_cols[0]
        merged = merged.where(F.col(alive) > 0)
    return merged
