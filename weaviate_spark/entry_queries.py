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
