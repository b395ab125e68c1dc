"""Physical bucketed layout -> exchange-free fact joins (SCALING.md's
central 100-TB claim, now executed-plan-proven).

The reference pre-organises data by key at write time (key-ordered LSM
segments, adapters/repos/db/lsmkv/strategies.go:24-29) so reads never
re-partition. Our analogue: fact tables written
``bucketBy(n, key).sortBy(key)`` (sources/bucketed.py). These tests
assert the EXECUTED plan of a fact-fact join over that layout is a
SortMergeJoin with bucketed scans and zero shuffle exchanges — and that
the results are identical to the plain (shuffling) plan and the duckdb
oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_df_matches_sql
from weaviate_spark.sources.bucketed import bucketed_join, bucketed_table
from weaviate_spark.sources.tables import load_table

SHUFFLE_RE = r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)"


def _executed(df):
    rows = df.collect()
    return rows, df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark):
    orders = bucketed_table(spark, SF_DIR, "orders")  # bucketed on o_custkey
    cust = bucketed_table(spark, SF_DIR, "customer")  # bucketed on c_custkey
    joined = bucketed_join(orders, cust, orders["o_custkey"] == cust["c_custkey"])
    rows, plan = _executed(joined.select("o_orderkey", "o_custkey", "c_name"))
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") >= 2, plan
    assert not re.search(SHUFFLE_RE, plan), plan
    # same result as the plain (exchange-inserting) plan
    plain = load_table(spark, SF_DIR, "orders").join(
        load_table(spark, SF_DIR, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert len(rows) == plain.count()


def test_fact_fact_lineitem_orders_exchange_free(spark):
    """The biggest join in the schema (lineitem x orders) runs with zero
    shuffle on either side when both are bucketed on orderkey."""
    li = bucketed_table(spark, SF_DIR, "lineitem")  # l_orderkey
    orders = bucketed_table(spark, SF_DIR, "orders", key="o_orderkey")
    joined = bucketed_join(
        li.select("l_orderkey", "l_extendedprice"),
        orders.select("o_orderkey", "o_orderpriority"),
        li["l_orderkey"] == orders["o_orderkey"],
    )
    rows, plan = _executed(joined)
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") >= 2, plan
    assert not re.search(SHUFFLE_RE, plan), plan
    assert len(rows) == load_table(spark, SF_DIR, "lineitem").count()


def test_bucketed_scan_filter_pushdown(spark):
    """Bucketed parquet scans keep predicate pushdown: the layout change
    must not cost the scan its filters."""
    orders = bucketed_table(spark, SF_DIR, "orders")
    df = orders.where(F.col("o_totalprice") > 300000.0).select("o_orderkey")
    _, plan = _executed(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_bucketed_agg_reuses_bucket_distribution(spark):
    """groupBy on the bucket key needs no shuffle either: partial+final
    aggregate collapse onto the bucketed distribution."""
    orders = bucketed_table(spark, SF_DIR, "orders")  # o_custkey buckets
    agg = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    rows, plan = _executed(agg)
    assert not re.search(SHUFFLE_RE, plan), plan
    assert len(rows) > 0


def test_bucketed_queries_match_oracle(spark, duck):
    from weaviate_spark.entry_queries import ORACLES, QUERIES

    for name in ("ref_fact_join_agg_bucketed", "fact_fact_join_bucketed"):
        assert_df_matches_sql(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])
