"""Multi-dimensional data layout: Z-order (Morton) clustering for
row-group skipping.

The bucketed write path (sources/bucketed.py) co-locates JOIN keys;
this module handles the other big layout lever at 100 TB — FILTER
locality across multiple columns. Sorting a fact table by one column
gives parquet row-group min/max stats that prune scans on that column
only; interleaving the bits of several rank-normalized columns into one
Morton key (Morton 1966; the OPTIMIZE ZORDER BY of lakehouse table
formats) bounds EVERY participating column's value range within each
row group, so the parquet reader's predicate pushdown skips row groups
for range predicates on ANY of them. Pure open-source Spark mechanics:
a narrow key expression + repartitionByRange + sortWithinPartitions,
then plain parquet; the skipping itself is the stock
spark.sql.parquet.filterPushdown row-group pruning.

``tests/test_layout.py`` asserts the claim directly against the
written parquet footers: the fraction of row groups whose [min, max]
intersects a second-column range predicate — exactly the set the
reader must touch — drops several-fold vs a single-column sort of the
same data into the same file count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> Column:
    """Morton key interleaving ``bits`` bits of each column,
    range-normalized against the frame's own min/max (collected once —
    two scalars per column, the same tiny-driver-artifact pattern as
    the IVF centroids). Works for any numeric/date-castable columns;
    ties inside one normalization bucket are harmless (they just share
    a key). String (and other non-range) columns interleave a
    ``bits``-wide hash instead — that clusters EQUALITY lookups, not
    ranges (documented divergence from lakehouse range-id binning)."""
    from pyspark.sql import types as T

    rangeable = {
        c: isinstance(
            df.schema[c].dataType,
            (T.NumericType, T.DateType, T.TimestampType, T.BooleanType),
        )
        for c in cols
    }
    # the interleaved key must fit the 63 value bits of a signed LONG:
    # bit b*n+ci at bits=16 with 4 columns would land the top plane in
    # bit 63 (the sign bit — range partitioning then anti-clusters the
    # high half), and ≥5 columns would wrap Spark's shiftleft amount
    # mod 64, silently colliding bit planes. Cap per-column bits so
    # bits*len(cols) <= 63; the coarser planes still cluster.
    if len(cols) > 63:
        raise ValueError(
            f"zorder supports at most 63 columns (got {len(cols)}): one "
            "bit plane per column must fit the 63 value bits of a signed "
            "LONG — clamping further would wrap into the sign bit"
        )
    if cols:
        bits = max(1, min(bits, 63 // len(cols)))
    num_cols = [c for c in cols if rangeable[c]]
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in num_cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in num_cols],
    ).collect()[0] if num_cols else {}
    n = len(cols)
    scale = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        if not rangeable[c]:
            norm = F.pmod(F.xxhash64(F.col(c)), F.lit(scale + 1)).cast("long")
        else:
            lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
            if lo is None or hi is None or hi <= lo:
                continue  # constant/empty column: no bit plane to add
            lo, hi = float(lo), float(hi)
            norm = F.floor(
                (F.col(c).cast("double") - F.lit(lo)) * F.lit(scale / (hi - lo))
            ).cast("long")
            # clamp fp edge of the max value
            norm = F.least(norm, F.lit(scale).cast("long"))
        for b in range(bits):
            bit = F.shiftright(norm, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + ci)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Morton key of ``cols``:
    range-partition on the key (contiguous z-ranges per file = bounded
    hyper-rectangles per row group), sort within partitions so row
    groups inside each file stay tight too. One extra shuffle at write
    time buys row-group skipping on every clustered column for the
    life of the table."""
    (
        df.withColumn("_z", zorder_key(df, cols, bits))
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
