"""Z-order layout: row-group skippability measured against the actual
parquet footers, plus content fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rowgroups_intersecting(path, col, lo, hi):
    """(#row groups whose [min,max] intersects [lo,hi], total) — the
    set the parquet reader must touch for BETWEEN lo AND hi."""
    import glob
    import pyarrow.parquet as pq

    touched = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                touched += 1
    return touched, total


def test_zorder_prunes_second_column(spark, sf_dir, tmp_path):
    from weaviate_spark.sources.layout import write_zordered
    from weaviate_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], num_files=16)
    # baseline: same file count, sorted by the FIRST column only
    (
        li.repartitionByRange(16, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(lpath)
    )

    hi = li.agg(F.max("l_partkey")).collect()[0][0]
    lo_b, hi_b = int(hi * 0.4), int(hi * 0.5)  # ~10% partkey band

    z_touch, z_total = _rowgroups_intersecting(zpath, "l_partkey", lo_b, hi_b)
    l_touch, l_total = _rowgroups_intersecting(lpath, "l_partkey", lo_b, hi_b)
    assert z_total >= 8 and l_total >= 8
    # the linear layout spreads partkey everywhere -> nearly all row
    # groups intersect; z-order bounds partkey per row group
    assert l_touch >= 0.9 * l_total
    assert z_touch <= 0.6 * l_touch

    # content fidelity: same multiset of rows, and the range query
    # returns identical results from both layouts
    q = lambda p: (
        spark.read.parquet(p)
        .where(F.col("l_partkey").between(lo_b, hi_b))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
        )
        .collect()[0]
    )
    zr, lr = q(zpath), q(lpath)
    assert zr["n"] == lr["n"] and zr["s"] == lr["s"]
    assert spark.read.parquet(zpath).count() == li.count()


def test_optimize_zorder_tightens_file_ranges(spark, tmp_path):
    """Z-order rewrite: same rows, and every clustering column's
    per-file min/max spans shrink vs the unsorted layout — the parquet
    row-group pruning property OPTIMIZE exists for."""
    import random

    from pyspark.sql import functions as F

    from weaviate_spark.sources.crud import optimize_zorder

    rng = random.Random(31)
    rows = [(i, rng.randrange(10_000), rng.randrange(10_000),
             f"tag{i % 7}") for i in range(40_000)]
    path = str(tmp_path / "zt")
    df = spark.createDataFrame(rows, "id long, a long, b long, s string")
    df.repartition(8).write.parquet(path)

    def file_spans(col):
        per = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("_f"))
            .agg((F.max(col) - F.min(col)).alias("_span"))
            .collect()
        )
        return sum(r["_span"] for r in per) / len(per)

    before = {c: file_spans(c) for c in ("a", "b")}
    orig = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    nfiles = optimize_zorder(spark, path, ["a", "b"], target_rows_per_file=5000)
    assert nfiles == 8

    after = {c: file_spans(c) for c in ("a", "b")}
    # 8 files = 3 leading Morton bits: one axis splits 4x, the other
    # 2x — demand each tightens and the covered AREA shrinks >= 4x
    for c in ("a", "b"):
        assert after[c] < 0.75 * before[c], (c, before[c], after[c])
    assert (after["a"] * after["b"]) < (before["a"] * before["b"]) / 4
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == orig


def test_optimize_zorder_string_and_constant_cols(spark, tmp_path):
    """String columns hash-bucket (equality clustering) and a constant
    column is a no-op bit plane rather than a divide-by-zero."""
    from pyspark.sql import functions as F

    from weaviate_spark.sources.crud import optimize_zorder

    path = str(tmp_path / "zs")
    df = spark.range(2000).select(
        F.col("id"),
        F.concat(F.lit("k"), (F.col("id") % 5).cast("string")).alias("s"),
        F.lit(7).alias("c"),
    )
    df.repartition(4).write.parquet(path)
    optimize_zorder(spark, path, ["s", "c"], target_rows_per_file=500)
    got = spark.read.parquet(path)
    assert got.count() == 2000
    # each output file holds few distinct s values (equality clustering)
    per = got.groupBy(F.input_file_name().alias("_f")).agg(
        F.countDistinct("s").alias("_d")).collect()
    assert max(r["_d"] for r in per) <= 3


def test_zorder_rejects_more_than_63_columns(spark):
    """More than 63 columns cannot each get a bit plane inside a signed
    LONG's 63 value bits — zorder_key must refuse loudly instead of
    clamping bits to 1 and wrapping the top planes into the sign bit."""
    import pytest

    from weaviate_spark.sources.layout import zorder_key

    df = spark.range(10).select(
        *[(F.col("id") + i).alias(f"c{i}") for i in range(64)]
    )
    with pytest.raises(ValueError, match="63 columns"):
        zorder_key(df, [f"c{i}" for i in range(64)])
    # 63 columns is still legal (bits clamps to 1, no sign-bit wrap)
    assert zorder_key(df, [f"c{i}" for i in range(63)]) is not None
