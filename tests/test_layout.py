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
