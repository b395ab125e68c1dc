"""AQE skew-join evidence (SCALING.md claim -> executed-plan proof).

The reference shards by object UUID, so one hot tenant / boilerplate
dedup bucket lands on one shard and serializes that shard's scan
(adapters/repos/db/index.go shard fan-out has no runtime re-balance).
Our posture: Spark AQE splits the oversized shuffle partition at
runtime (`spark.sql.adaptive.skewJoin.enabled`, session.py). This test
manufactures a 99%-hot join key at test scale, lowers the AQE skew
thresholds to match the small data volume, and asserts the *executed*
adaptive plan actually took the skew-split path (`skew=true` on the
sort-merge join) — evidence, not configuration hope.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _executed_plan(df):
    # materialize THIS DataFrame's own query execution (df.count() would
    # build a separate plan and leave this one isFinalPlan=false)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return rows, plan


@pytest.fixture()
def low_skew_thresholds(spark):
    """Scale AQE's skew cutoffs down to sandbox data volume (defaults are
    sized for 256 MB cluster partitions)."""
    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    # force sort-merge: skew split only applies to SMJ/shuffle-hash joins
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    for k, v in saved.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)


def test_skewed_tenant_join_triggers_aqe_split(spark, low_skew_thresholds):
    # sf0.01 (60k facts), not the sf0.001 test default: the hot shuffle
    # partition must clear the (already lowered) byte threshold
    sf_dir = "/root/testdata/sf0.01"
    # one hot tenant holds ~99% of facts; the rest spread over 50 tenants.
    # repartition(16) mirrors a cluster scan with many map tasks: AQE splits
    # a skewed reduce partition by MAP-OUTPUT ranges, so a single-task local
    # scan (one ~1 MB parquet file) is structurally unsplittable.
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(16)
    facts = lineitem.withColumn(
        "_tenant",
        F.when(F.col("l_orderkey") % 100 < 99, F.lit("hot-tenant")).otherwise(
            F.concat(F.lit("t"), (F.col("l_orderkey") % 100).cast("string"))
        ),
    )
    # plain per-tenant dim table (one row per tenant). NOTE: it must reach
    # the join as sort-over-shuffle — an aggregate keyed on _tenant would
    # already satisfy the join's distribution and leave a HashAggregate
    # between Sort and the shuffle stage, a shape OptimizeSkewedJoin's
    # pattern match rejects.
    dim = spark.createDataFrame(
        [("hot-tenant", 1.0)] + [(f"t{i}", float(i)) for i in range(99, 100)],
        ["_tenant", "tenant_weight"],
    )
    # downstream agg keys on l_returnflag (NOT _tenant) so splitting the
    # skewed join partitions introduces no extra shuffle — the case AQE's
    # OptimizeSkewedJoin accepts without force flags
    joined = facts.join(dim, "_tenant").groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.sum("tenant_weight").alias("weight")
    )

    rows, plan = _executed_plan(joined)
    assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan[:4000]}"

    # and the result is still correct: row total preserved through the split
    total = sum(r["n"] for r in rows)
    assert total == lineitem.count()


def test_uniform_join_does_not_split(spark, sf_dir, low_skew_thresholds):
    """Control: a uniformly keyed join under identical thresholds must NOT
    report skew handling — proves the assertion above is discriminating."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).groupBy(
        "l_returnflag"
    ).agg(F.count("*").alias("n"))
    _, plan = _executed_plan(joined)
    assert "skew=true" not in plan
