"""Registry of driver-checkable queries: name -> (spark, sf_dir) -> DataFrame,
plus the duckdb oracle SQL for each.

Every query here is one operator family from SURVEY.md §2, expressed through
the engine's public API (filters.Clause / plans.GetSpec / operators.*). The
oracle SQL mirrors the semantics in ANSI SQL for the duckdb side-by-side
check. Result sets are deterministic: ties are always broken by a unique key
before any LIMIT.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from weaviate_spark.filters import Clause
from weaviate_spark.operators.aggregate import (
    AggregateSpec,
    PropertyAgg,
    aggregate,
    top_occurrences,
)
from weaviate_spark.plans import GetSpec, SortKey, compile_get

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# M1 — filters / sort / pagination (SURVEY §2.2, §2.6)

@register(
    "filter_sort_limit",
    oracle=(
        "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer "
        "WHERE c_acctbal > 1000 ORDER BY c_acctbal DESC, c_custkey LIMIT 20"
    ),
)
def q_filter_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """where GreaterThan + sort desc + tie-break + limit.

    Reference: filter row_reader.go range semantics + sort.go ordering.
    Plan: pushed-down Parquet filter -> TakeOrderedAndProject (no global
    sort shuffle).
    """
    spec = GetSpec(
        collection="customer",
        where=Clause(operator="GreaterThan", path=["c_acctbal"], value=1000.0),
        sort=[SortKey(path=["c_acctbal"], order="desc"), SortKey(path=["c_custkey"])],
        limit=20,
        select=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "filter_like_prefix",
    oracle=(
        "SELECT p_partkey, p_name, p_type, p_size FROM part "
        "WHERE p_type LIKE 'PROMO%' AND (p_size >= 30 OR p_size < 5) "
        "ORDER BY p_partkey"
    ),
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like prefix pattern (rewritten to pushdown-able startswith) + And/Or."""
    spec = GetSpec(
        collection="part",
        where=Clause(
            operator="And",
            operands=[
                Clause(operator="Like", path=["p_type"], value="PROMO*"),
                Clause(
                    operator="Or",
                    operands=[
                        Clause(operator="GreaterThanEqual", path=["p_size"], value=30),
                        Clause(operator="LessThan", path=["p_size"], value=5),
                    ],
                ),
            ],
        ),
        sort=[SortKey(path=["p_partkey"])],
        limit=10_000,
        select=["p_partkey", "p_name", "p_type", "p_size"],
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "filter_like_wildcard",
    oracle=(
        "SELECT p_partkey, p_name FROM part "
        "WHERE p_name LIKE '%wid%et%' ORDER BY p_partkey"
    ),
)
def q_filter_like_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like with interior wildcards -> anchored rlike (like_regexp.go:40-46)."""
    spec = GetSpec(
        collection="part",
        where=Clause(operator="Like", path=["p_name"], value="*wid*et*"),
        sort=[SortKey(path=["p_partkey"])],
        limit=10_000,
        select=["p_partkey", "p_name"],
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "filter_contains_any",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem "
        "WHERE l_returnflag IN ('A','R') AND l_quantity < 5 "
        "ORDER BY l_orderkey, l_linenumber"
    ),
)
def q_contains_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = GetSpec(
        collection="lineitem",
        where=Clause(
            operator="And",
            operands=[
                Clause(operator="ContainsAny", path=["l_returnflag"], value=["A", "R"]),
                Clause(operator="LessThan", path=["l_quantity"], value=5.0),
            ],
        ),
        sort=[SortKey(path=["l_orderkey"]), SortKey(path=["l_linenumber"])],
        limit=10_000,
        select=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "filter_not_two_valued",
    oracle=(
        # two-valued NOT: null/missing rows match the negation. events.props
        # has no nulls in testdata, but the COALESCE encodes the semantics.
        "SELECT event_id, event_type, value FROM events "
        "WHERE NOT COALESCE(event_type = 'purchase', FALSE) AND value > 150 "
        "ORDER BY event_id"
    ),
)
def q_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = GetSpec(
        collection="events",
        where=Clause(
            operator="And",
            operands=[
                Clause(operator="Not", operands=[
                    Clause(operator="Equal", path=["event_type"], value="purchase"),
                ]),
                Clause(operator="GreaterThan", path=["value"], value=150.0),
            ],
        ),
        sort=[SortKey(path=["event_id"])],
        limit=10_000,
        select=["event_id", "event_type", "value"],
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "filter_date_range",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-03-01' "
        "ORDER BY l_orderkey, l_linenumber"
    ),
)
def q_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range filter on date/timestamp (roaringsetrange analogue -> parquet
    min/max row-group pruning)."""
    import datetime

    spec = GetSpec(
        collection="lineitem",
        where=Clause(
            operator="And",
            operands=[
                Clause(operator="GreaterThanEqual", path=["l_shipdate"],
                       value=datetime.datetime(1995, 1, 1)),
                Clause(operator="LessThan", path=["l_shipdate"],
                       value=datetime.datetime(1995, 3, 1)),
            ],
        ),
        sort=[SortKey(path=["l_orderkey"]), SortKey(path=["l_linenumber"])],
        limit=10_000,
        select=["l_orderkey", "l_linenumber", "l_shipdate"],
    )
    return compile_get(spark, sf_dir, spec)


# ---------------------------------------------------------------------------
# M2 — aggregations (SURVEY §2.4)

@register(
    "agg_pricing_summary",
    oracle=(
        "SELECT l_returnflag, "
        "count(l_quantity) AS l_quantity_count, "
        "sum(l_quantity) AS l_quantity_sum, "
        "avg(l_quantity) AS l_quantity_mean, "
        "min(l_quantity) AS l_quantity_minimum, "
        "max(l_quantity) AS l_quantity_maximum, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS l_extendedprice_sum, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS l_extendedprice_mean "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + count/sum/mean/min/max; money sums via DECIMAL so the
    result is partition-order independent (aggregator/numerical.go)."""
    return aggregate(spark, sf_dir, AggregateSpec(
        collection="lineitem",
        group_by="l_returnflag",
        properties=[
            PropertyAgg("l_quantity", ["count", "sum", "mean", "minimum", "maximum"]),
            PropertyAgg("l_extendedprice", ["sum", "mean"], decimal=True),
        ],
    ))


@register(
    "agg_median_mode",
    oracle=(
        "WITH med AS (SELECT l_returnflag, median(l_quantity) AS l_quantity_median "
        "  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY l_returnflag), "
        "mode_ AS (SELECT l_returnflag, l_quantity AS l_quantity_mode FROM ("
        "  SELECT l_returnflag, l_quantity, "
        "         row_number() OVER (PARTITION BY l_returnflag ORDER BY count(*) DESC, l_quantity ASC) AS rn "
        "  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY l_returnflag, l_quantity) t WHERE rn = 1) "
        "SELECT med.l_returnflag, l_quantity_median, l_quantity_mode "
        "FROM med JOIN mode_ USING (l_returnflag)"
    ),
)
def q_agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (even-N -> mean of middle pair, numerical.go:208-231) and
    mode with smallest-value tie-break (numerical.go:107-124)."""
    return aggregate(spark, sf_dir, AggregateSpec(
        collection="lineitem",
        group_by="l_returnflag",
        properties=[PropertyAgg("l_quantity", ["median", "mode"])],
    ))


@register(
    "agg_meta_count",
    oracle=(
        "SELECT count(*) AS meta_count FROM orders WHERE o_orderstatus = 'F'"
    ),
)
def q_agg_meta_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered meta{count} (params.go:83-99 IsCountStar path)."""
    return aggregate(spark, sf_dir, AggregateSpec(
        collection="orders",
        where=Clause(operator="Equal", path=["o_orderstatus"], value="F"),
        include_meta_count=True,
    ))


@register(
    "agg_boolean",
    oracle=(
        "SELECT o_orderpriority, "
        "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS is_filled_totalTrue, "
        "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS BIGINT) AS is_filled_totalFalse, "
        "sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) AS is_filled_percentageTrue, "
        "sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) / CAST(count(*) AS DOUBLE) AS is_filled_percentageFalse "
        "FROM orders GROUP BY o_orderpriority"
    ),
)
def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregators (aggregator/boolean.go) over a derived flag."""
    return aggregate(spark, sf_dir, AggregateSpec(
        collection="orders",
        group_by="o_orderpriority",
        derived={"is_filled": "o_orderstatus = 'F'"},
        properties=[PropertyAgg("is_filled", [
            "totalTrue", "totalFalse", "percentageTrue", "percentageFalse",
        ])],
    ))


@register(
    "agg_date_minmax",
    oracle=(
        "SELECT o_orderpriority, "
        "count(o_orderdate) AS o_orderdate_count, "
        "min(o_orderdate) AS o_orderdate_minimum, "
        "max(o_orderdate) AS o_orderdate_maximum "
        "FROM orders GROUP BY o_orderpriority"
    ),
)
def q_agg_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date aggregations (aggregator/date.go): count/min/max."""
    return aggregate(spark, sf_dir, AggregateSpec(
        collection="orders",
        group_by="o_orderpriority",
        properties=[PropertyAgg("o_orderdate", ["count", "minimum", "maximum"])],
    ))


@register(
    "agg_top_occurrences",
    oracle=(
        "SELECT c_mktsegment AS value, count(*) AS occurs FROM customer "
        "GROUP BY c_mktsegment ORDER BY occurs DESC, value ASC LIMIT 3"
    ),
)
def q_agg_topoccurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topOccurrences{value, occurs} (aggregator/text.go), limit 3."""
    return top_occurrences(spark, sf_dir, "customer", "c_mktsegment", limit=3)


@register(
    "agg_group_limit",
    oracle=(
        "SELECT n_regionkey, count(*) AS meta_count FROM nation "
        "GROUP BY n_regionkey ORDER BY meta_count DESC, n_regionkey ASC LIMIT 3"
    ),
)
def q_agg_group_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy with group-count limit (params.go limit): deterministic
    admission order = count desc, value asc."""
    return aggregate(spark, sf_dir, AggregateSpec(
        collection="nation",
        group_by="n_regionkey",
        include_meta_count=True,
        limit=3,
    ))
