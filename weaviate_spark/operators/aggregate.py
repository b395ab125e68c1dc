"""Aggregate{} operator family (SURVEY §2.4).

Mirrors weaviate's aggregation semantics (reference:
entities/aggregation/params.go:25-42, adapters/repos/db/aggregator/
{unfiltered,filtered,grouped}.go, numerical.go, boolean.go, text.go,
date.go) as plain ``groupBy().agg()`` plans:

* ``count``     — non-null count per property (meta count = count(*)).
* ``min/max/sum/mean`` — numeric/date; money-like sums go through
  DECIMAL so the result is order-of-summation independent (a double
  sum's low bits vary with partitioning; decimal is exact, making the
  result cluster-size invariant — required for oracle hash-matching AND
  for run-to-run determinism at 100 TB).
* ``median``    — TRUE median (numerical.go:208-231): sorted values,
  even N -> mean of the two middle values. Spark ``percentile`` (exact)
  reproduces this. At 100 TB scale the exact percentile is a heavy
  sort-based agg; callers can opt into ``approx_percentile`` via
  ``exact=False`` when oracle parity is not required.
* ``mode``      — most frequent value, ties -> SMALLEST value
  (numerical.go:107-124 ``count == maxCount && value < mode``).
  Implemented as value-frequency groupBy + per-group rank — two
  shuffles, both map-side-combined; no driver-side state.
* ``totalTrue/totalFalse/percentageTrue/percentageFalse`` (boolean.go).
* ``topOccurrences`` (text.go) — top-N values by frequency, default
  limit 5; ties -> smallest value for determinism.
* ``groupBy``   — one result row per distinct value of the group path;
  array-valued group paths explode first (grouped.go:63 — an object
  appears in every group its array elements name).

Scale notes: everything here is a standard shuffle-agg with map-side
partial aggregation; AQE coalesces post-shuffle partitions. Mode and
topOccurrences shuffle on (group, value) first — the high-cardinality
key — then on group, so no single reducer sees a whole group's raw rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weaviate_spark.filters import Clause, apply_where
from weaviate_spark.sources.tables import load_table

# aggregators whose Spark expression is a single Column over the group
_SIMPLE = {"count", "minimum", "maximum", "sum", "mean", "median",
           "totalTrue", "totalFalse", "percentageTrue", "percentageFalse"}

# percentile aggregators: "p25", "p95", "p99.9" — exact interpolated
# percentile (same definition as median: position 1+q*(n-1), linear
# interpolation; DuckDB quantile_cont matches bit-for-bit on doubles).
# Beyond the reference (which stops at median, numerical.go:208) but a
# natural extension of the same sorted-values machinery.
import re as _re

_PCT_RE = _re.compile(r"^p(\d{1,2}(?:\.\d+)?)$")


def _is_simple(a: str) -> bool:
    return a in _SIMPLE or bool(_PCT_RE.match(a))


@dataclass
class PropertyAgg:
    """Aggregators requested for one property (params.go:117-150)."""

    prop: str
    aggregators: Sequence[str]
    # exact decimal sums for money-like doubles (order-independent)
    decimal: bool = False


@dataclass
class AggregateSpec:
    collection: str
    properties: Sequence[PropertyAgg] = field(default_factory=list)
    where: Optional[Clause] = None
    group_by: Optional[str] = None
    include_meta_count: bool = False
    limit: Optional[int] = None  # max number of groups
    exact: bool = True
    # derived columns (name -> SQL expr) computed before aggregation; used
    # e.g. to aggregate a boolean predicate the way weaviate aggregates a
    # boolean property.
    derived: dict[str, str] = field(default_factory=dict)
    # collection schema — required only for the schema-level aggregators
    # `type` (params.go:118) and `pointingTo` (params.go:148-150), which
    # report declared types, not data
    schema: Optional[object] = None  # weaviate_spark.schema.Collection


def _simple_agg_col(pa: PropertyAgg, agg: str, exact: bool) -> Column:
    c = F.col(pa.prop)
    alias = f"{pa.prop}_{agg}"
    if agg == "count":
        return F.count(c).alias(alias)
    if agg == "minimum":
        return F.min(c).alias(alias)
    if agg == "maximum":
        return F.max(c).alias(alias)
    if agg == "sum":
        if pa.decimal:
            return F.sum(c.cast("decimal(18,2)")).cast("double").alias(alias)
        return F.sum(c).alias(alias)
    if agg == "mean":
        if pa.decimal:
            return (
                F.sum(c.cast("decimal(18,2)")).cast("double") / F.count(c)
            ).alias(alias)
        return F.avg(c).alias(alias)
    if agg == "median":
        if exact:
            return F.percentile(c, F.lit(0.5)).alias(alias)
        return F.expr(f"approx_percentile({pa.prop}, 0.5)").alias(alias)
    m = _PCT_RE.match(agg)
    if m:
        q = float(m.group(1)) / 100.0
        if exact:
            return F.percentile(c, F.lit(q)).alias(alias)
        return F.expr(f"approx_percentile({pa.prop}, {q})").alias(alias)
    if agg == "totalTrue":
        return F.sum(c.cast("int")).alias(alias)
    if agg == "totalFalse":
        return F.sum((~c).cast("int")).alias(alias)
    if agg == "percentageTrue":
        return (F.sum(c.cast("int")) / F.count(c)).alias(alias)
    if agg == "percentageFalse":
        return (F.sum((~c).cast("int")) / F.count(c)).alias(alias)
    raise ValueError(f"unknown aggregator {agg}")


def _group_cols(df: DataFrame, spec: AggregateSpec) -> tuple[DataFrame, list[str]]:
    if spec.group_by is None:
        return df, []
    from pyspark.sql import types as T

    dtype = df.schema[spec.group_by].dataType if spec.group_by in df.columns else None
    if isinstance(dtype, T.ArrayType):
        # array group path: each element groups separately (grouped.go:63)
        df = df.withColumn(spec.group_by, F.explode(spec.group_by))
    return df, [spec.group_by]


def aggregate(spark: SparkSession, sf_dir: str, spec: AggregateSpec) -> DataFrame:
    df = load_table(spark, sf_dir, spec.collection)
    df = apply_where(df, spec.where)
    for name, expr in spec.derived.items():
        df = df.withColumn(name, F.expr(expr))
    df, gcols = _group_cols(df, spec)

    from pyspark.sql import types as T

    def _is_array(prop: str) -> bool:
        return prop in df.columns and isinstance(
            df.schema[prop].dataType, T.ArrayType
        )

    aggs: list[Column] = []
    if spec.include_meta_count:
        aggs.append(F.count(F.lit(1)).alias("meta_count"))
    mode_props: list[PropertyAgg] = []
    array_props: list[PropertyAgg] = []  # element-level aggregation
    schema_cols: list[tuple[str, Column]] = []  # literal, schema-derived outputs
    for pa in spec.properties:
        arr = _is_array(pa.prop)
        if arr and any(_is_simple(a) or a == "mode" for a in pa.aggregators):
            # array property: data aggregators run over the ELEMENTS
            # (unfiltered_type_specific.go array branches; acceptance
            # matrix counts e.g. 10 elements across 7 docs) — handled as
            # a per-prop exploded aggregation joined back below
            array_props.append(pa)
        for a in pa.aggregators:
            if arr and (_is_simple(a) or a == "mode"):
                continue  # handled element-level above
            if a == "mode" or (a == "median" and spec.exact and gcols):
                # grouped exact median and mode both derive from the same
                # (group, value, count) frequency frame — see
                # _freq_stats_df; routing median there avoids percentile's
                # per-group value collection
                if pa not in mode_props:
                    mode_props.append(pa)
            elif _is_simple(a):
                aggs.append(_simple_agg_col(pa, a, spec.exact))
            elif a in ("type", "pointingTo"):
                # schema-level aggregators: the reference answers these
                # from the class schema, not the data
                # (traverser_aggregate.go:136-177, references.go:21-35)
                if spec.schema is None:
                    raise ValueError(
                        f"aggregator {a!r} needs AggregateSpec.schema "
                        "(it reports declared types, not data)"
                    )
                p = spec.schema.property(pa.prop)
                if a == "type":
                    ptype, stype = p.aggregation_type()
                    schema_cols.append((f"{pa.prop}_type", F.lit(ptype)))
                    schema_cols.append((f"{pa.prop}_schema_type", F.lit(stype)))
                else:
                    targets = p.pointing_to()
                    if not targets:
                        raise ValueError(
                            f"pointingTo on non-reference property {pa.prop!r}"
                        )
                    schema_cols.append((
                        f"{pa.prop}_pointing_to",
                        F.array(*[F.lit(t) for t in targets]),
                    ))
            else:
                raise ValueError(f"unknown aggregator {a}")

    if not aggs and not mode_props and not schema_cols and not array_props:
        raise ValueError("no aggregators requested")
    if not aggs and not mode_props and not array_props:
        # pure schema query — one row of literals, no scan
        return df.sparkSession.range(1).select(
            *[c.alias(n) for n, c in schema_cols]
        )

    freq_frames = [
        _freq_stats_df(
            df, gcols, pa.prop,
            want_median="median" in pa.aggregators and spec.exact,
            want_mode="mode" in pa.aggregators,
        )
        for pa in mode_props
    ] if gcols else []

    if not aggs and not mode_props and array_props and not gcols:
        # ungrouped, array-only: one seed row to hang the joins off
        out = df.sparkSession.range(1).drop("id")
    elif aggs:
        out = df.groupBy(*gcols).agg(*aggs)
    elif freq_frames:
        # no plain aggregators: the first frequency frame already carries
        # one row per group — no separate distinct() scan needed. NOTE
        # groups whose stat property is all-null are absent then (the
        # reference likewise emits no numerical payload for them).
        out = freq_frames.pop(0)
    else:
        out = df.select(*gcols).distinct()
    for n, c in schema_cols:
        out = out.withColumn(n, c)

    for frame in freq_frames:
        out = out.join(frame, on=gcols, how="left")
    if not gcols:
        for pa in mode_props:
            out = out.crossJoin(_mode_df(df, gcols, pa.prop))

    for pa in array_props:
        ex = df.select(*gcols, F.explode(pa.prop).alias(pa.prop))
        parts: list[DataFrame] = []
        freq_median = gcols and spec.exact and "median" in pa.aggregators
        data_aggs = [
            _simple_agg_col(pa, a, spec.exact)
            for a in pa.aggregators
            if _is_simple(a) and not (a == "median" and freq_median)
        ]
        if data_aggs:
            parts.append(ex.groupBy(*gcols).agg(*data_aggs))
        if gcols and (freq_median or "mode" in pa.aggregators):
            parts.append(_freq_stats_df(
                ex, gcols, pa.prop,
                want_median=bool(freq_median),
                want_mode="mode" in pa.aggregators,
            ))
        elif "mode" in pa.aggregators:
            parts.append(_mode_df(ex, gcols, pa.prop))
        for p in parts:
            out = out.join(p, on=gcols, how="left") if gcols else out.crossJoin(p)

    if spec.limit is not None and gcols:
        # deterministic group admission: largest groups first, value asc
        order = [F.col("meta_count").desc()] if spec.include_meta_count else []
        out = out.orderBy(*order, *[F.col(g).asc() for g in gcols]).limit(spec.limit)
    return out


def _freq_stats_df(
    df: DataFrame,
    gcols: list[str],
    prop: str,
    want_median: bool,
    want_mode: bool,
) -> DataFrame:
    """Grouped exact median and/or mode from ONE (group, value, count)
    frequency frame.

    The frequency groupBy partial-aggregates map-side, so the shuffle
    carries distinct (group, value) pairs — for discrete-ish columns that
    is orders of magnitude below row count; for continuous columns it is
    never above it. The exact median then reads off the running count:
    value v covers sorted positions [_lo, _hi); the median is the mean of
    the values covering positions floor((n-1)/2) and floor(n/2)
    (numerical.go:208-231 pair-mean rule — odd n makes both the same
    position). This replaces ``percentile``'s per-group value collection
    (one reducer buffers a whole group's raw values) with windows over
    distinct values, partitioned by group — no single task ever holds a
    group's raw rows. Mode rides the same frame (numerical.go:107-124
    smallest-value tie-break).
    """
    freq = (
        df.where(F.col(prop).isNotNull())
        .groupBy(*gcols, prop)
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    wv = Window.partitionBy(*gcols).orderBy(F.col(prop))
    c = (
        freq.withColumn("_hi", F.sum("_f").over(wv))
        .withColumn("_lo", F.col("_hi") - F.col("_f"))
        .withColumn("_n", F.sum("_f").over(Window.partitionBy(*gcols)))
    )
    aggs: list[Column] = []
    if want_mode:
        wm = Window.partitionBy(*gcols).orderBy(
            F.col("_f").desc(), F.col(prop).asc()
        )
        c = c.withColumn("_rn", F.row_number().over(wm))
        aggs.append(F.min_by(F.col(prop), F.col("_rn")).alias(f"{prop}_mode"))
    if want_median:
        lo = F.floor((F.col("_n") - 1) / 2)
        hi = F.floor(F.col("_n") / 2)

        def covers(i: Column) -> Column:
            return ((F.col("_lo") <= i) & (F.col("_hi") > i)).cast("int")

        weight = covers(lo) + covers(hi)
        aggs.insert(0, (
            F.sum(F.col(prop).cast("double") * weight) / F.lit(2.0)
        ).alias(f"{prop}_median"))
    return c.groupBy(*gcols).agg(*aggs)


def _mode_df(df: DataFrame, gcols: list[str], prop: str) -> DataFrame:
    """Most frequent value per group, ties -> smallest (numerical.go:107-124)."""
    freq = (
        df.where(F.col(prop).isNotNull())
        .groupBy(*gcols, prop)
        .agg(F.count(F.lit(1)).alias("_freq"))
    )
    if not gcols:
        # ungrouped top-1 is a TakeOrderedAndProject, not a global window —
        # a single-partition WindowExec would funnel every distinct value
        # through one task at scale
        return (
            freq.orderBy(F.col("_freq").desc(), F.col(prop).asc())
            .limit(1)
            .select(F.col(prop).alias(f"{prop}_mode"))
        )
    w = Window.partitionBy(*gcols).orderBy(F.col("_freq").desc(), F.col(prop).asc())
    return (
        freq.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*gcols, F.col(prop).alias(f"{prop}_mode"))
    )


def top_occurrences(
    spark: SparkSession,
    sf_dir: str,
    collection: str,
    prop: str,
    limit: int = 5,
    where: Clause | None = None,
    group_by: str | None = None,
) -> DataFrame:
    """topOccurrences{value, occurs} (text.go; params.go:139-145).

    Flat result: (group?, value, occurs) rows, top-`limit` per group by
    frequency, ties -> smallest value (deterministic; the reference's map
    iteration order is unspecified, we pin value-asc).
    """
    df = load_table(spark, sf_dir, collection)
    df = apply_where(df, where)
    from pyspark.sql import types as T

    gcols = []
    if group_by is not None:
        if isinstance(df.schema[group_by].dataType, T.ArrayType):
            df = df.withColumn(group_by, F.explode(group_by))
        gcols = [group_by]
    col = F.col(prop)
    if isinstance(df.schema[prop].dataType, T.ArrayType):
        df = df.withColumn(prop, F.explode(prop))
        col = F.col(prop)
    freq = (
        df.where(col.isNotNull())
        .groupBy(*gcols, prop)
        .agg(F.count(F.lit(1)).alias("occurs"))
    )
    if not gcols:
        # ungrouped top-N: orderBy().limit() compiles to TakeOrderedAndProject
        # (per-partition heaps + driver merge of N rows) — no global window
        return (
            freq.orderBy(F.col("occurs").desc(), F.col(prop).asc())
            .limit(limit)
            .select(F.col(prop).alias("value"), "occurs")
        )
    w = Window.partitionBy(*gcols).orderBy(F.col("occurs").desc(), F.col(prop).asc())
    return (
        freq.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= limit)
        .select(*gcols, F.col(prop).alias("value"), "occurs")
    )
