"""Delta-maintained aggregate views: incremental fold == full recompute,
independent of how the stream was batched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _fold(li, keys, measures, n_batches):
    from weaviate_spark.operators.matview import merge_state, partial_state

    state = None
    for i in range(n_batches):
        batch = li.where(F.pmod(F.col("l_orderkey"), F.lit(n_batches)) == i)
        state = merge_state(
            state, partial_state(batch, keys, measures), keys, measures
        )
    return state


def test_incremental_equals_full_and_batching_invariant(spark, sf_dir):
    from weaviate_spark.sources.tables import load_table

    keys = ["l_returnflag", "l_linestatus"]
    measures = {
        "sum_qty": ("sum", "CAST(l_quantity AS DECIMAL(18,2))"),
        "n_rows": ("count", "1"),
        "min_ship": ("min", "l_shipdate"),
        "max_ship": ("max", "l_shipdate"),
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_shipdate",
        "l_orderkey",
    )
    from weaviate_spark.operators.matview import partial_state

    one_shot = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["sum_qty"], r["n_rows"], r["min_ship"], r["max_ship"]
        )
        for r in partial_state(li, keys, measures).collect()
    }
    for n in (2, 5):
        folded = {
            (r["l_returnflag"], r["l_linestatus"]): (
                r["sum_qty"], r["n_rows"], r["min_ship"], r["max_ship"]
            )
            for r in _fold(li, keys, measures, n).collect()
        }
        assert folded == one_shot


def test_merge_state_handles_new_groups(spark):
    from weaviate_spark.operators.matview import merge_state, partial_state

    keys = ["g"]
    measures = {"s": ("sum", "CAST(v AS DECIMAL(10,2))"), "n": ("count", "1")}
    b1 = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    b2 = spark.createDataFrame([("b", 5.0)], "g string, v double")
    st = merge_state(None, partial_state(b1, keys, measures), keys, measures)
    st = merge_state(st, partial_state(b2, keys, measures), keys, measures)
    got = {r["g"]: (float(r["s"]), r["n"]) for r in st.collect()}
    assert got == {"a": (3.0, 2), "b": (5.0, 1)}


def test_apply_cdf_matches_recompute(spark, tmp_path):
    """CDF-driven view maintenance (Gupta & Mumick counting algorithm)
    == full recompute after updates AND deletes."""
    from weaviate_spark.filters import Clause
    from weaviate_spark.operators.matview import (
        apply_cdf, merge_state, partial_state)
    from weaviate_spark.sources import crud

    path = str(tmp_path / "facts")
    spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(12)],
        "k long, grp string, v double").write.parquet(path)
    keys, measures = ["grp"], {
        "n": ("count", "v"), "total": ("sum", "CAST(v AS DECIMAL(20,4))")}
    state = merge_state(
        None, partial_state(spark.read.parquet(path), keys, measures),
        keys, measures)

    # mutate: bump g1 values, delete g2 entirely, insert new g0 rows
    upd = spark.read.parquet(path).where("grp = 'g1'") \
        .withColumn("v", F.col("v") + 100.0)
    crud.upsert(spark, path, upd, "k")
    crud.upsert(spark, path, spark.createDataFrame(
        [(100, "g0", 7.0), (101, "g0", 8.0)],
        "k long, grp string, v double"), "k")
    crud.delete_where(spark, path, Clause(
        operator="Equal", path=["grp"], value="g2"))

    changes = crud.table_changes_feed(spark, path, "k", 0)
    advanced = {r["grp"]: (r["n"], float(r["total"]))
                for r in apply_cdf(state, changes, keys,
                                   measures).collect()}
    recomputed = {r["grp"]: (r["n"], float(r["total"]))
                  for r in partial_state(
                      spark.read.parquet(path), keys,
                      measures).collect()}
    assert advanced == recomputed
    assert "g2" not in advanced  # tombstoned, like the recompute

    with pytest.raises(ValueError, match="only maintains sum/count"):
        apply_cdf(state, changes, keys, {"m": ("min", "v")})
