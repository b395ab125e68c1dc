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

from weaviate_spark.cache import lit_double_array, local_df

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
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # drop the previous query's scratch caches (see cache.py)
            from weaviate_spark.cache import release_caches

            release_caches()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
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
        "ORDER BY p_partkey LIMIT 10000"
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
        "WHERE p_name LIKE '%wid%et%' ORDER BY p_partkey LIMIT 10000"
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
        "ORDER BY l_orderkey, l_linenumber LIMIT 10000"
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
        "ORDER BY event_id LIMIT 10000"
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
        "ORDER BY l_orderkey, l_linenumber LIMIT 10000"
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
    "agg_type_pointing_to",
    oracle=(
        "SELECT CAST(count(*) AS BIGINT) AS meta_count, "
        "CAST(count(c_acctbal) AS BIGINT) AS c_acctbal_count, "
        "'numerical' AS c_acctbal_type, 'number' AS c_acctbal_schema_type, "
        "'text' AS c_name_type, 'text' AS c_name_schema_type, "
        "'cref' AS c_orders_type, 'cref' AS c_orders_schema_type, "
        "'Orders' AS c_orders_pointing_to "
        "FROM customer"
    ),
)
def q_agg_type_pointing_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`type` + `pointingTo` schema aggregators alongside data aggs
    (params.go:118,148-150; traverser_aggregate.go:136-177): the type
    bucket + declared schemaType per property, ref targets for cref
    props — answered from the class schema, combined with a real count."""
    from pyspark.sql import functions as F
    from weaviate_spark.schema import Collection, Property

    coll = Collection("customer", properties=[
        Property("c_name", "text"),
        Property("c_acctbal", "number"),
        Property("c_orders", "Orders"),
    ])
    out = aggregate(spark, sf_dir, AggregateSpec(
        collection="customer",
        properties=[
            PropertyAgg("c_acctbal", ["count", "type"]),
            PropertyAgg("c_name", ["type"]),
            PropertyAgg("c_orders", ["type", "pointingTo"]),
        ],
        include_meta_count=True,
        schema=coll,
    ))
    # flatten the pointingTo list for the hash compare
    return out.withColumn(
        "c_orders_pointing_to", F.concat_ws(",", "c_orders_pointing_to")
    )


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


# ---------------------------------------------------------------------------
# M3 — cross-references / joins (SURVEY §2.3)

@register(
    "ref_resolve_2hop",
    oracle=(
        "SELECT c_custkey, c_name, c_acctbal, n_name, r_name "
        "FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE c_acctbal > 5000 ORDER BY c_custkey"
    ),
)
def q_ref_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop reference resolution (customer -> nation -> region) as
    broadcast lookup joins (search.go:425 ResolveReferences)."""
    from weaviate_spark.operators.refs import REFS, resolve_reference
    from weaviate_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    c = resolve_reference(
        spark, sf_dir, "customer", "inNation", ["n_name", "n_regionkey"],
        where=Clause(operator="GreaterThan", path=["c_acctbal"], value=5000.0),
    )
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(region, c["n_regionkey"] == region["r_regionkey"], "left")
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "r_name")
        .orderBy("c_custkey")
    )


@register(
    "ref_filter_semijoin",
    oracle=(
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000) "
        "ORDER BY c_custkey"
    ),
)
def q_ref_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref-path filter: parents with >=1 matching referenced object
    (searcher_ref_filter.go). Inverse-FK direction: customer <- orders."""
    from weaviate_spark.operators.refs import ref_filter
    from weaviate_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return (
        cust.join(big.select("o_custkey"), cust["c_custkey"] == big["o_custkey"], "leftsemi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "ref_count",
    oracle=(
        "SELECT c.c_custkey, c.c_name, CAST(count(o.o_orderkey) AS BIGINT) AS order_count "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_custkey, c.c_name "
        "HAVING count(o.o_orderkey) >= 15 ORDER BY c.c_custkey"
    ),
)
def q_ref_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-count filter (searcher.go:694): customers with >= 15 orders."""
    from weaviate_spark.operators.refs import ref_count
    from pyspark.sql import functions as F

    out = ref_count(spark, sf_dir, "customer", "orders", "byCustomer", alias="order_count")
    return (
        out.where(F.col("order_count") >= 15)
        .select("c_custkey", "c_name", "order_count")
        .orderBy("c_custkey")
    )


@register(
    "ref_fact_join_agg",
    oracle=(
        "SELECT n_name, "
        "CAST(count(*) AS BIGINT) AS num_orders, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1995-01-01' "
        "GROUP BY n_name ORDER BY n_name"
    ),
)
def q_ref_fact_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim reference resolution + aggregate (TPC-H Q5 shape):
    shuffle join on o_custkey (bucketable at scale), broadcast nation."""
    import datetime
    from weaviate_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= datetime.datetime(1995, 1, 1)
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
        .orderBy("n_name")
    )


@register(
    "ref_fact_join_agg_bucketed",
    oracle=(
        "SELECT n_name, "
        "CAST(count(*) AS BIGINT) AS num_orders, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1995-01-01' "
        "GROUP BY n_name ORDER BY n_name"
    ),
)
def q_ref_fact_join_agg_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as ref_fact_join_agg, executed over the PHYSICAL
    bucketed layout (sources/bucketed.py): orders and customer are both
    written bucketed+sorted on custkey, so the fact join runs as a
    SortMergeJoin with ZERO ShuffleExchange on either side — the 100-TB
    plan, where neither fact table fits a broadcast. Plan proof:
    tests/test_bucketed.py + PLANS.md. Reference analogue: key-ordered
    LSM segments (adapters/repos/db/lsmkv/strategies.go:24-29)."""
    import datetime
    from weaviate_spark.sources.bucketed import bucketed_join, bucketed_table
    from weaviate_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    orders = bucketed_table(spark, sf_dir, "orders").where(  # o_custkey buckets
        F.col("o_orderdate") >= datetime.datetime(1995, 1, 1)
    )
    cust = bucketed_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        bucketed_join(orders, cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
        .orderBy("n_name")
    )


@register(
    "fact_fact_join_bucketed",
    oracle=(
        "SELECT o_orderpriority, "
        "CAST(count(*) AS BIGINT) AS line_count, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_shipdate > TIMESTAMP '1995-03-01' "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
)
def q_fact_fact_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact reference resolution (lineitem -> orders) over the
    bucketed layout: BOTH sides bucketed+sorted on orderkey, so the
    biggest join in the schema is exchange-free. At 100 TB this is the
    join that otherwise shuffles the whole lineitem table."""
    import datetime
    from weaviate_spark.sources.bucketed import bucketed_join, bucketed_table
    from pyspark.sql import functions as F

    li = bucketed_table(spark, sf_dir, "lineitem").where(  # l_orderkey buckets
        F.col("l_shipdate") > datetime.datetime(1995, 3, 1)
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    orders = bucketed_table(spark, sf_dir, "orders", key="o_orderkey").select(
        "o_orderkey", "o_orderpriority"
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        bucketed_join(li, orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# M4 — BM25 keyword search (SURVEY §2.5)

from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, bm25_oracle_sql, bm25_search


@register(
    "bm25_topk",
    oracle=bm25_oracle_sql("documents", "text", "doc_id", "spark filter join", limit=20),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 Or-search over documents.text, top-20 (bm25_searcher.go:163)."""
    return bm25_search(spark, sf_dir, BM25Spec(
        collection="documents", query="spark filter join",
        properties=[BM25Prop("text")], id_col="doc_id", limit=20,
    ))


@register(
    "bm25_and_operator",
    oracle=bm25_oracle_sql(
        "documents", "text", "doc_id", "vector query batch",
        limit=50, search_operator="And",
    ),
)
def q_bm25_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """searchOperator=And: docs must contain every query term."""
    return bm25_search(spark, sf_dir, BM25Spec(
        collection="documents", query="vector query batch",
        properties=[BM25Prop("text")], id_col="doc_id", limit=50,
        search_operator="And",
    ))


@register(
    "bm25_min_or",
    oracle=bm25_oracle_sql(
        "documents", "text", "doc_id", "stream window watermark merge",
        limit=50, minimum_or_tokens_match=2,
    ),
)
def q_bm25_min_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimumOrTokensMatch=2: Or with a floor on matched distinct terms."""
    return bm25_search(spark, sf_dir, BM25Spec(
        collection="documents", query="stream window watermark merge",
        properties=[BM25Prop("text")], id_col="doc_id", limit=50,
        minimum_or_tokens_match=2,
    ))


# ---------------------------------------------------------------------------
# M5 — vector search (SURVEY §2.5)

from weaviate_spark.operators.vector import NearVectorSpec, near_object, near_vector

# deterministic synthetic query vector (dim 64), same literal both sides
QVEC = [round(((i * 37 + 11) % 97) / 97.0 - 0.5, 6) for i in range(64)]
_QVEC_SQL = "[" + ", ".join(str(x) for x in QVEC) + "]::DOUBLE[]"
_COS_SQL = (
    "round(1 - list_dot_product(ev, qv) / "
    "(sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6)"
)


@register(
    "knn_cosine_topk",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings) "
        f"SELECT vec_id, label, {_COS_SQL} AS _distance "
        "FROM e CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 10"
    ),
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearVector top-k, cosine (hnsw/distancer/cosine_dist.go);
    plan = narrow distance eval + TakeOrderedAndProject."""
    out = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=10, quantize="off",
    ))
    return out.select("vec_id", "label", "_distance")


@register(
    "knn_l2_within_distance",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings) "
        "SELECT * FROM (SELECT vec_id, round(list_sum(list_transform(list_zip(ev, qv), "
        "s -> (s[1] - s[2]) * (s[1] - s[2]))), 6) AS _distance "
        "FROM e CROSS JOIN q) t "
        "WHERE _distance <= 25.0 ORDER BY _distance ASC, vec_id ASC"
    ),
)
def q_knn_l2_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative limit = all within distance (hnsw/search_with_max_dist.go),
    l2-squared metric."""
    out = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, metric="l2-squared",
        limit=-1, distance=25.0,
    ))
    return out.select("vec_id", "_distance")


@register(
    "knn_filtered",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE label IN (1, 2, 3)) "
        f"SELECT vec_id, label, {_COS_SQL} AS _distance "
        "FROM e CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 15"
    ),
)
def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: where-allowlist first, then exact distance
    (shard_read.go:639-651 brute-force branch)."""
    out = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=15,
        where=Clause(operator="ContainsAny", path=["label"], value=[1, 2, 3]),
    ))
    return out.select("vec_id", "label", "_distance")


@register(
    "knn_near_object",
    oracle=(
        "WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv "
        "FROM embeddings WHERE vec_id = 7), "
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        "FROM e CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 10"
    ),
)
def q_knn_near_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nearObject: query vector looked up by id (retrieval.go:128-135)."""
    out = near_object(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=[], limit=10, quantize="off",
    ), object_id=7)
    return out.select("vec_id", "_distance")


# ---------------------------------------------------------------------------
# M6 — hybrid fusion (SURVEY §2.5)

from weaviate_spark.operators.hybrid import HybridSpec, hybrid_oracle_sql, hybrid_search


@register(
    "hybrid_rrf",
    oracle=hybrid_oracle_sql("spark filter join", QVEC, alpha=0.5, fusion="ranked", limit=25),
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rankedFusion (RRF, constant 60): weight/(rank+60) summed across
    keyword + vector legs (hybrid_fusion.go:22-33)."""
    return hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join", vector=QVEC,
        properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.5, fusion="ranked", limit=25,
    ))


@register(
    "hybrid_relative_score",
    oracle=hybrid_oracle_sql("spark filter join", QVEC, alpha=0.75, fusion="relativeScore", limit=25),
)
def q_hybrid_relative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relativeScoreFusion (default): per-leg min-max normalization,
    weighted sum (hybrid_fusion.go:93-160)."""
    return hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join", vector=QVEC,
        properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.75, fusion="relativeScore", limit=25,
    ))


# ---------------------------------------------------------------------------
# M7 — LLM-pipeline extras: dedup + text analysis (BASELINE.json north star)

from weaviate_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    embedding_neardup_pairs,
    simhash_neardup_pairs,
)
from weaviate_spark.operators.textstats import text_profile
from weaviate_spark.sources.tables import load_table as _load

_MINHASH_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}]+') AS tt FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id AS _doc, array_to_string(list_slice(tt, i, i + 2), ' ') AS _shingle
  FROM toks, LATERAL unnest(range(1, greatest(len(tt) - 2, 0) + 1)) AS u(i)
  WHERE len(tt) >= 3
),
km AS (
  SELECT _doc,
    ('0x' || substr(md5(_shingle), 1, 14))::BIGINT AS _h1,
    ('0x' || substr(md5(_shingle), 15, 14))::BIGINT AS _h2
  FROM sh
),
mh AS (
  SELECT _doc, i AS _i, min(_h1 + i * _h2) AS _minhash
  FROM km, LATERAL unnest(range(0, 16)) AS t(i)
  GROUP BY _doc, i
),
bands AS (
  SELECT _doc, CAST(_i // 4 AS INT) AS _band,
    md5(string_agg(CAST(_i AS VARCHAR) || ':' || CAST(_minhash AS VARCHAR), ',' ORDER BY _i)) AS _bucket
  FROM mh GROUP BY _doc, CAST(_i // 4 AS INT)
),
cand AS (
  SELECT a._doc AS _a, b._doc AS _b
  FROM bands a JOIN bands b ON a._band = b._band AND a._bucket = b._bucket AND a._doc < b._doc
  GROUP BY 1, 2
),
sizes AS (SELECT _doc, count(*) AS _sz FROM sh GROUP BY _doc),
inter AS (
  SELECT c._a, c._b, count(*) AS _inter
  FROM cand c
  JOIN sh sa ON sa._doc = c._a
  JOIN sh sb ON sb._doc = c._b AND sb._shingle = sa._shingle
  GROUP BY c._a, c._b
)
SELECT i._a AS id_a, i._b AS id_b,
  round(CAST(i._inter AS DOUBLE) / (sa._sz + sb._sz - i._inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa._doc = i._a
JOIN sizes sb ON sb._doc = i._b
WHERE CAST(i._inter AS DOUBLE) / (sa._sz + sb._sz - i._inter) >= {thr}
"""


@register(
    "dedup_exact",
    oracle=(
        "WITH norm AS (SELECT doc_id, md5(array_to_string("
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+'), ' ')) AS content_hash "
        "FROM documents) "
        "SELECT content_hash, CAST(count(*) AS BIGINT) AS dup_count, min(doc_id) AS keep_id "
        "FROM norm GROUP BY content_hash HAVING count(*) > 1"
    ),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized content; one shuffle on a
    uniform md5 key."""
    df = _load(spark, sf_dir, "documents")
    return exact_dedup_groups(df, "doc_id", "text").select(
        "content_hash", "dup_count", "keep_id"
    )


@register("dedup_minhash_lsh", oracle=_MINHASH_SQL.format(thr=0.35))
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) near-dup pairs, exact-Jaccard verified
    at >= 0.35. md5-based hashing -> bit-identical in the SQL oracle."""
    df = _load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        df, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
        jaccard_threshold=0.35, max_bucket_size=1_000_000,
        table_key=(sf_dir, "documents"),
    )


# exact all-pairs >= 0.35 via AllPairs/PPJoin prefix filtering -- shared by
# dedup_ngram_jaccard and the LSH recall audit
_NGRAM_EXACT_SQL = _MINHASH_SQL.format(thr=0.35).replace(
        """cand AS (
  SELECT a._doc AS _a, b._doc AS _b
  FROM bands a JOIN bands b ON a._band = b._band AND a._bucket = b._bucket AND a._doc < b._doc
  GROUP BY 1, 2
),""",
        # AllPairs prefix filtering, mirroring ngram_jaccard_pairs
        # (dedup.py): exact — identical result set to the naive
        # any-shared-shingle join, but candidates are bounded by the
        # rarest-first prefix, so the oracle also survives sf1.
        """freq AS MATERIALIZED (
  SELECT _shingle, count(*) AS _df FROM sh GROUP BY _shingle
),
pref AS MATERIALIZED (
  SELECT _doc, _shingle, _rank, _sz FROM (
    SELECT s._doc, s._shingle,
      row_number() OVER (PARTITION BY s._doc ORDER BY f._df, s._shingle) AS _rank,
      count(*) OVER (PARTITION BY s._doc) AS _sz
    FROM sh s JOIN freq f USING (_shingle)
  ) WHERE _rank <= _sz - ceil(0.35 * _sz - 1e-9) + 1
),
cand AS MATERIALIZED (
  SELECT a._doc AS _a, b._doc AS _b
  FROM pref a JOIN pref b ON a._shingle = b._shingle AND a._doc < b._doc
    AND b._sz >= ceil(0.35 * a._sz - 1e-9) AND a._sz >= ceil(0.35 * b._sz - 1e-9)
  GROUP BY 1, 2, a._sz, b._sz
  HAVING 1 + least(a._sz - min(a._rank), b._sz - min(b._rank))
         >= ceil(0.35::DOUBLE / 1.35::DOUBLE * (a._sz + b._sz) - 1e-9)
),""",
    )


@register(
    "dedup_ngram_jaccard",
    oracle=_NGRAM_EXACT_SQL,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs n-gram Jaccard >= 0.35 (candidates = any shared
    shingle). The ground truth the LSH variant approximates."""
    df = _load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        df, "doc_id", "text", shingle_n=3, threshold=0.35,
        table_key=(sf_dir, "documents"),
    )


def _embedding_lsh_oracle_sql(num_planes: int = 6, dim: int = 64,
                              seed: int = 42,
                              max_distance: float = 0.55) -> str:
    """DuckDB mirror of q_dedup_embedding: identical plane constants,
    signature arithmetic, Hamming-1 probe set, rescore and threshold."""
    from weaviate_spark.operators.similarity import hyperplanes

    planes = hyperplanes(num_planes, dim, seed)

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"

    sig_expr = " || ".join(
        f"(CASE WHEN list_dot_product(ev, {arr(p)}) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    flips = ", ".join(
        f"substr(_sig,1,{i}) || (CASE WHEN substr(_sig,{i + 1},1)='1' "
        f"THEN '0' ELSE '1' END) || substr(_sig,{i + 2})"
        for i in range(num_planes)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
s AS (SELECT *, {sig_expr} AS _sig FROM e),
ap AS (SELECT vec_id AS id_a, ev AS va, unnest([_sig, {flips}]) AS _bucket FROM s),
cand AS (
  SELECT DISTINCT ap.id_a, ap.va, b.vec_id AS id_b, b.ev AS vb
  FROM ap JOIN s b ON ap._bucket = b._sig
  WHERE ap.id_a < b.vec_id
)
SELECT id_a, id_b,
  round(1 - list_dot_product(va, vb) / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 6) AS _distance
FROM cand
WHERE round(1 - list_dot_product(va, vb) / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 6) <= {max_distance}
"""


@register("dedup_embedding_cosine", oracle=_embedding_lsh_oracle_sql())
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via the LSH-bucketed scale path
    (no cross join in the plan); the oracle mirrors the identical
    deterministic hyperplane buckets, so the comparison is exact. The
    brute-force `embedding_neardup_pairs` stays as the pytest
    recall/exactness oracle."""
    from weaviate_spark.operators.dedup import embedding_neardup_pairs_lsh

    df = _load(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs_lsh(
        df, "vec_id", "embedding", dim=64, max_distance=0.55,
        num_planes=6, probe=2,
    )


@register("dedup_simhash")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(60-bit) near-dup pairs within Hamming distance 3 — the
    production-realistic budget (15-bit single-chunk keys, candidate
    stream ~4n^2/2^15). The oracle reproduces the per-bit majority
    votes, chunk buckets, and bit_count(xor) rescore exactly."""
    df = _load(spark, sf_dir, "documents")
    return simhash_neardup_pairs(df, "doc_id", "text", max_hamming=3)


@register("dedup_simhash_stress")
def q_dedup_simhash_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-budget stress variant (Hamming <= 12): exercises the
    chunk-combination blocking step-up (_blocking_plan auto-selects
    chunk-triple keys, 12 key bits, instead of degenerate 4-bit single
    chunks — VERDICT r05 finding #1). Same oracle shape; the result set
    is inherently quadratic in clone-cluster size at this radius."""
    df = _load(spark, sf_dir, "documents")
    return simhash_neardup_pairs(df, "doc_id", "text", max_hamming=12)


def _simhash_oracle_sql(max_hamming: int = 12) -> str:
    num_chunks = min(max_hamming + 1, 15)
    width = (60 + num_chunks - 1) // num_chunks
    bit_sums = ", ".join(
        f"sum((_h >> {b}) & 1) AS _b{b}" for b in range(60)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN _b{b} * 2 >= _n THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(60)
    )
    # integer chunk keys + hamming filter BEFORE the pair-distinct,
    # mirroring simhash_neardup_pairs (dedup.py): the chunk join's output
    # is ~n^2/2^width rows, so deduping only post-filter pairs is the
    # difference between seconds and tens of minutes at 10x scale
    chunk_list = ", ".join(
        f"((simhash >> {c * width}) & {(1 << width) - 1}) + {c << width}"
        for c in range(num_chunks)
    )
    return (
        "WITH toks AS (SELECT doc_id AS _doc, "
        "unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS _t FROM documents), "
        "h AS (SELECT _doc, ('0x' || substr(md5(_t), 1, 15))::BIGINT AS _h FROM toks), "
        f"votes AS (SELECT _doc, count(*) AS _n, {bit_sums} FROM h GROUP BY _doc), "
        f"sim AS (SELECT _doc, {sim_expr} AS simhash FROM votes), "
        f"chunks AS (SELECT _doc, simhash, unnest([{chunk_list}]) AS _chunk FROM sim) "
        "SELECT DISTINCT a._doc AS id_a, b._doc AS id_b, "
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming "
        "FROM chunks a JOIN chunks b USING (_chunk) "
        f"WHERE a._doc < b._doc AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"
    )


ORACLES["dedup_simhash"] = _simhash_oracle_sql(3)
ORACLES["dedup_simhash_stress"] = _simhash_oracle_sql(12)


def _lang_vote_sql() -> tuple[str, str]:
    """(hits-CTE columns, argmax CASE expression) mirroring
    textstats.lang_id's fold with alphabetical tie-break."""
    from weaviate_spark.operators.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    hit_cols = ", ".join(
        "len(list_filter(tt, t -> t IN ({vals}))) AS h_{lang}".format(
            vals=", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang=lang
        )
        for lang in langs
    )
    best, bs = f"'{langs[0]}'", f"h_{langs[0]}"
    for lang in langs[1:]:
        best = f"CASE WHEN h_{lang} > {bs} THEN '{lang}' ELSE {best} END"
        bs = f"greatest({bs}, h_{lang})"
    return hit_cols, best


_HITS, _BEST = _lang_vote_sql()

_TEXT_PROFILE_SQL = f"""
WITH toks AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}]+') AS tt FROM documents
),
feat AS (
  SELECT doc_id, text, tt, len(tt) AS n_tokens,
    CASE WHEN length(text) > 0 THEN
      round(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 6)
    ELSE 0.0 END AS punct_ratio,
    CASE WHEN len(tt) > 0 THEN
      round(CAST(list_sum(list_transform(tt, t -> length(t))) AS DOUBLE) / len(tt), 6)
    ELSE 0.0 END AS mean_token_len,
    {_HITS}
  FROM toks
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, punct_ratio, mean_token_len,
  round(0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
      + 0.3 * (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 8.0 THEN 1.0 ELSE 0.5 END)
      + 0.3 * (1.0 - least(punct_ratio * 5, 1.0)), 6) AS quality,
  {_BEST} AS lang_guess,
  md5(array_to_string(tt, ' ')) AS fingerprint
FROM feat
"""


@register("text_quality_scores", oracle=_TEXT_PROFILE_SQL)
def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis profile: token count, punctuation ratio, mean token
    length, composite quality score, language guess, fingerprint — all
    narrow Catalyst expressions (zero shuffles)."""
    df = _load(spark, sf_dir, "documents")
    return text_profile(df, "doc_id", "text").select(
        "doc_id", "n_tokens", "punct_ratio", "mean_token_len",
        "quality", "lang_guess", "fingerprint",
    )


@register(
    "text_tokens_by_lang",
    oracle=(
        "SELECT lang, CAST(sum(len(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+'))) AS BIGINT) AS total_tokens, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "round(avg(n_chars), 6) AS avg_chars "
        "FROM documents GROUP BY lang"
    ),
)
def q_tokens_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting rolled up by language (corpus budgeting query)."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.textstats import token_count

    df = _load(spark, sf_dir, "documents")
    return (
        df.groupBy("lang")
        .agg(
            F.sum(token_count(F.col("text"))).alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# M7 — search post-stages: groupBy-in-search, autocut; ANN

from weaviate_spark.operators.search_post import (
    apply_autocut,
    group_result_structs,
    group_search_results,
)


@register(
    "search_group_by",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings), "
        f"hits AS (SELECT vec_id, label, {_COS_SQL} AS _distance "
        "FROM e CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 50), "
        "ranked AS (SELECT *, row_number() OVER (ORDER BY _distance ASC, vec_id ASC) AS _rnk FROM hits), "
        "grp AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY _rnk) AS _in_group_rank FROM ranked), "
        "best AS (SELECT label, min(_rnk) AS _best FROM ranked GROUP BY label), "
        "adm AS (SELECT label, dense_rank() OVER (ORDER BY _best) AS _group_rank FROM best) "
        "SELECT g.label, g.vec_id, g._distance, CAST(g._in_group_rank AS BIGINT) AS _in_group_rank, "
        "CAST(a._group_rank AS BIGINT) AS _group_rank "
        "FROM grp g JOIN adm a USING (label) "
        "WHERE a._group_rank <= 3 AND g._in_group_rank <= 2"
    ),
)
def q_search_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-result groupBy (shard_group_by.go): top-50 knn hits, first
    3 groups by label in result order, best 2 hits per group."""
    from pyspark.sql import functions as F

    hits = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=50, quantize="off",
    )).select("vec_id", "label", "_distance")
    out = group_search_results(
        hits, "label",
        [(F.col("_distance"), True), (F.col("vec_id"), True)],
        groups=3, objects_per_group=2,
    )
    return out.select(
        "label", "vec_id", "_distance",
        F.col("_in_group_rank").cast("long").alias("_in_group_rank"),
        F.col("_group_rank").cast("long").alias("_group_rank"),
    )


_GROUP_STRUCT_FLAT_SQL = """
SELECT CAST(gr - 1 AS BIGINT) AS group_id,
  CAST({label} AS VARCHAR) AS group_value,
  '{label}' AS group_path,
  min_by(_gdist, igr) AS min_distance,
  {maxd} AS max_distance,
  CAST(count(*) AS BIGINT) AS n_hits,
  string_agg(
    CAST({id} AS VARCHAR) || ':' || CAST(CAST(round(_gdist * 1e6) AS BIGINT) AS VARCHAR),
    ',' ORDER BY igr) AS hits
FROM kept GROUP BY gr, {label}
"""


def _flatten_group_structs(g: DataFrame) -> DataFrame:
    """Project the nested Group struct into hash-stable flat columns for
    the driver compare (nested structs don't round-trip identically
    through pandas on both engines; the struct itself is pinned by
    tests/test_search_post.py)."""
    from pyspark.sql import functions as F

    return g.select(
        F.col("_group_id").cast("long").alias("group_id"),
        F.col("group.groupedBy.value").alias("group_value"),
        F.concat_ws("/", "group.groupedBy.path").alias("group_path"),
        F.col("group.minDistance").alias("min_distance"),
        F.col("group.maxDistance").alias("max_distance"),
        F.col("group.count").cast("long").alias("n_hits"),
        F.concat_ws(",", F.transform(
            "group.hits",
            lambda h: F.concat(
                h["id"], F.lit(":"),
                F.round(h["distance"] * 1e6).cast("long").cast("string"),
            ),
        )).alias("hits"),
    )


@register(
    "search_group_by_struct",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings), "
        f"hits AS (SELECT vec_id, label, {_COS_SQL} AS _gdist "
        "FROM e CROSS JOIN q ORDER BY _gdist ASC, vec_id ASC LIMIT 50), "
        "ranked AS (SELECT *, row_number() OVER (ORDER BY _gdist ASC, vec_id ASC) AS _rnk FROM hits), "
        "grp AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY _rnk) AS igr FROM ranked), "
        "best AS (SELECT label, min(_rnk) AS _best FROM ranked GROUP BY label), "
        "adm AS (SELECT label, dense_rank() OVER (ORDER BY _best) AS gr FROM best), "
        "kept AS (SELECT g.*, a.gr FROM grp g JOIN adm a USING (label) "
        "WHERE a.gr <= 3 AND g.igr <= 2) "
        + _GROUP_STRUCT_FLAT_SQL.format(
            label="label", id="vec_id", maxd="max_by(_gdist, igr)")
    ),
)
def q_search_group_by_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search groupBy emitting the reference's Group result struct
    (entities/additional/group.go:20-38): groupedBy{value,path},
    minDistance/maxDistance = first/last kept hit
    (shard_group_by.go:193-194), count, ordered hits. The driver row
    compares a flattened projection; the nested shape itself is pinned
    by tests/test_search_post.py."""
    from pyspark.sql import functions as F

    hits = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=50, quantize="off",
    )).select("vec_id", "label", "_distance")
    grouped = group_search_results(
        hits, "label",
        [(F.col("_distance"), True), (F.col("vec_id"), True)],
        groups=3, objects_per_group=2,
    )
    return _flatten_group_structs(group_result_structs(
        grouped, "label", "_distance", "vec_id", path=["label"],
    ))


@register(
    "hybrid_group_by",
    oracle=(
        "WITH h0 AS (SELECT f.doc_id, f._score, d.lang "
        f"FROM ({hybrid_oracle_sql('spark filter join', QVEC, alpha=0.5, fusion='ranked', limit=25)}) f "
        "JOIN documents d USING (doc_id)), "
        "ranked AS (SELECT doc_id, _score AS _gdist, lang, "
        "row_number() OVER (ORDER BY _score DESC, doc_id ASC) AS _rnk FROM h0), "
        "grp AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY _rnk) AS igr FROM ranked), "
        "best AS (SELECT lang, min(_rnk) AS _best FROM ranked GROUP BY lang), "
        "adm AS (SELECT lang, dense_rank() OVER (ORDER BY _best) AS gr FROM best), "
        "kept AS (SELECT g.*, a.gr FROM grp g JOIN adm a USING (lang) "
        "WHERE a.gr <= 4 AND g.igr <= 3) "
        + _GROUP_STRUCT_FLAT_SQL.format(
            label="lang", id="doc_id", maxd="min_by(_gdist, igr)")
    ),
)
def q_hybrid_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search x groupBy (usecases/traverser/hybrid_group_by.go):
    fused top-k grouped by a document property; group admission = first
    occurrence in fusion order, minDistance == maxDistance == the
    group's best fused score (hybrid_group_by.go:108-115)."""
    from pyspark.sql import functions as F

    fused = hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join", vector=QVEC,
        properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.5, fusion="ranked", limit=25,
    ))
    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang")
    hits = docs.join(F.broadcast(fused), "doc_id")
    grouped = group_search_results(
        hits, "lang",
        [(F.col("_score"), False), (F.col("doc_id"), True)],
        groups=4, objects_per_group=3,
    )
    return _flatten_group_structs(group_result_structs(
        grouped, "lang", "_score", "doc_id", path=["lang"], hybrid=True,
    ))


@register(
    "search_group_by_array",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings), "
        f"hits AS (SELECT vec_id, label, {_COS_SQL} AS _gdist "
        "FROM e CROSS JOIN q ORDER BY _gdist ASC, vec_id ASC LIMIT 30), "
        "ranked AS (SELECT *, row_number() OVER (ORDER BY _gdist ASC, vec_id ASC) AS _rnk FROM hits), "
        "ex AS (SELECT vec_id, _gdist, _rnk, "
        "unnest([CAST(label AS VARCHAR), 'all']) AS g, unnest([0, 1]) AS _pos FROM ranked), "
        "grp AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY _rnk, _pos) AS igr FROM ex), "
        # one hit can admit several groups: values-array order breaks the
        # tie (hybrid_group_by.go walks the extracted values in order)
        "best AS (SELECT g, min(_rnk * 10 + _pos) AS _best FROM ex GROUP BY g), "
        "adm AS (SELECT g, row_number() OVER (ORDER BY _best) AS gr FROM best) "
        "SELECT x.g AS group_value, CAST(a.gr AS BIGINT) AS group_rank, x.vec_id, "
        "x._gdist AS _distance, CAST(x.igr AS BIGINT) AS in_group_rank "
        "FROM grp x JOIN adm a USING (g) WHERE a.gr <= 4 AND x.igr <= 2"
    ),
)
def q_search_group_by_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search groupBy on an ARRAY-valued property: an object joins every
    group its elements name (hybrid_group_by.go extractGroupByValues for
    []string — here each hit carries [label, 'all'], so it lands in its
    label group AND the catch-all group). Caller explodes, then the
    standard admission rules apply."""
    from pyspark.sql import functions as F

    hits = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=30, quantize="off",
    )).select("vec_id", "label", "_distance")
    exploded = hits.select(
        "vec_id", "label", "_distance",
        F.posexplode(F.array(F.col("label").cast("string"), F.lit("all"))).alias("_pos", "g"),
    )
    # the array position joins the sort keys as the final tie-break:
    # when one hit admits several groups, they enter in values-array
    # order (hybrid_group_by.go walks the extracted values in order)
    grouped = group_search_results(
        exploded, "g",
        [(F.col("_distance"), True), (F.col("vec_id"), True), (F.col("_pos"), True)],
        groups=4, objects_per_group=2,
    )
    return grouped.select(
        F.col("g").alias("group_value"),
        F.col("_group_rank").cast("long").alias("group_rank"),
        "vec_id", "_distance",
        F.col("_in_group_rank").cast("long").alias("in_group_rank"),
    )


@register("bm25_autocut")
def q_bm25_autocut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k then autocut at the 1st score-curve extremum
    (autocut.go applied as in index.go:2309-2313); the oracle reproduces
    the unit-square extremum scan with window functions."""
    hits = bm25_search(spark, sf_dir, BM25Spec(
        collection="documents", query="spark filter join",
        properties=[BM25Prop("text")], id_col="doc_id", limit=30,
    ))
    return apply_autocut(hits.select("doc_id", "_score"), "_score", cut_off=1)


def _autocut_oracle_sql() -> str:
    """Wrap the bm25 top-30 oracle with the autocut.go:14-51 extremum
    cut: normalize score-vs-rank to the unit square, diff = y_norm - x,
    cut before the first local maximum of diff (keep all when none)."""
    base = bm25_oracle_sql(
        "documents", "text", "doc_id", "spark filter join", limit=30
    )
    return f"""
WITH hits AS (SELECT doc_id, _score,
  row_number() OVER (ORDER BY _score DESC, doc_id ASC) AS rn FROM ({base})),
p AS (SELECT count(*) AS n,
  max(CASE WHEN rn = 1 THEN _score END) AS s0,
  max(_score ORDER BY rn DESC) FILTER (rn = (SELECT count(*) FROM hits)) AS s_last
  FROM hits),
d AS (SELECT rn, _score, doc_id,
  CASE WHEN p.s_last = p.s0 THEN 0.0
       ELSE (_score - p.s0) / (p.s_last - p.s0) END
  - (rn - 1) * (1.0 / (p.n - 1)) AS diff, p.n AS n
  FROM hits CROSS JOIN p),
x AS (SELECT rn, n, diff,
  lag(diff) OVER (ORDER BY rn) AS prev1,
  lag(diff, 2) OVER (ORDER BY rn) AS prev2,
  lead(diff) OVER (ORDER BY rn) AS nxt FROM d),
ext AS (SELECT rn - 1 AS cut FROM x
  WHERE rn > 1 AND diff > prev1
    AND ((rn < n AND diff > nxt)
         OR (rn = n AND (n < 3 OR diff > prev2)))
  ORDER BY rn LIMIT 1),
c AS (SELECT coalesce((SELECT cut FROM ext), (SELECT n FROM p)) AS cut)
SELECT doc_id, _score FROM hits CROSS JOIN c WHERE rn <= c.cut
"""


ORACLES["bm25_autocut"] = _autocut_oracle_sql()


@register("ann_lsh_topk")
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets + exact
    rescore. Approximate w.r.t. exact search, but fully DETERMINISTIC —
    the oracle reproduces the identical plane constants, signatures,
    probe set, and rescore, so even the approximation is hash-checked
    (recall vs exact is pinned separately in unit tests)."""
    from weaviate_spark.operators.similarity import ann_top_k, build_lsh_index

    emb = _load(spark, sf_dir, "embeddings")
    idx = build_lsh_index(emb, "vec_id", "embedding", num_planes=8, dim=64)
    return ann_top_k(idx, QVEC, "vec_id", "embedding", k=10, num_planes=8, probe=2)


def _ann_lsh_oracle_sql(k: int = 10, num_planes: int = 8, probe: int = 2,
                        dim: int = 64, seed: int = 42) -> str:
    from weaviate_spark.operators.similarity import _sig_py, hyperplanes

    planes = hyperplanes(num_planes, dim, seed)
    qsig = _sig_py(QVEC, planes)
    buckets = {qsig}
    if probe > 1:
        for i in range(num_planes):
            buckets.add(qsig[:i] + ("0" if qsig[i] == "1" else "1") + qsig[i + 1:])
    bucket_list = ", ".join(f"'{b}'" for b in sorted(buckets))

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"

    sig_expr = " || ".join(
        f"(CASE WHEN list_dot_product(ev, {arr(p)}) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    return (
        "WITH e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings), "
        f"s AS (SELECT vec_id, ev, {sig_expr} AS _sig FROM e), "
        f"cand AS (SELECT * FROM s WHERE _sig IN ({bucket_list})), "
        f"q AS (SELECT {_QVEC_SQL} AS qv) "
        f"SELECT vec_id, {_COS_SQL.replace('qv', 'qv')} AS _distance "
        "FROM cand CROSS JOIN q "
        f"ORDER BY _distance ASC, vec_id ASC LIMIT {k}"
    )


ORACLES["ann_lsh_topk"] = _ann_lsh_oracle_sql()


# ---------------------------------------------------------------------------
# M7 — streaming-shaped ops (batch-equivalent windowed agg; §2.9)

@register(
    "events_windowed_counts",
    oracle=(
        "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type, "
        "CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS total_value "
        "FROM events GROUP BY 1, 2"
    ),
)
def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window counts over the events stream table — same
    code path Structured Streaming uses (unified batch/stream model);
    the streaming variant (watermark + availableNow replay) is
    exercised in tests/test_streaming.py."""
    from weaviate_spark.streaming.ingest import windowed_event_counts

    return windowed_event_counts(_load(spark, sf_dir, "events"))


@register(
    "events_session_agg",
    oracle=(
        "WITH o AS (SELECT user_id, ts, value, event_id, "
        "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "> INTERVAL 4 HOUR THEN 1 ELSE 0 END AS brk FROM events), "
        "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
        "SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events, "
        "round(sum(value), 2) AS total_value "
        "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"
    ),
)
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregation per user (4h inactivity gap) — Spark's
    native F.session_window, the same code path Structured Streaming
    state-merges incrementally; the oracle derives identical sessions
    via gaps-and-islands (lag + running sum). Streaming equivalence is
    pinned by tests/test_surfaces.py."""
    from weaviate_spark.streaming.ingest import sessionized_event_counts

    return sessionized_event_counts(_load(spark, sf_dir, "events"))


@register(
    "stateful_user_totals",
    oracle=(
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        "round(sum(value), 2) AS total_value FROM events GROUP BY user_id"
    ),
)
def q_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative ledger — the batch-degenerate form of the
    applyInPandasWithState running-totals operator (cumulative == total
    when everything is one batch). The streaming path (incremental
    state, event-time timeout eviction, per-batch updates) is pinned by
    tests/test_surfaces.py::test_stateful_running_totals."""
    from weaviate_spark.streaming.ingest import stateful_running_totals

    return stateful_running_totals(_load(spark, sf_dir, "events"))


_CJK_SENTS = [
    (1, "今天天气很好 we study 机器学习 in 北京大学"),
    (2, "私たちは東京で勉強します"),
    (3, "向量数据库支持搜索引擎和数据分析"),
    (4, "データベースでベクトル検索を勉強します"),
    (5, "plain english only"),
]


def _cjk_lattice_oracle_sql(sents) -> str:
    """DuckDB replay of the r11 LATTICE segmentation (gse's
    frequency-weighted DAG shortest path / ICU CjkBreakEngine Viterbi,
    functions/text.py:segment_cjk_py): enumerate EVERY path through
    each CJK run's word DAG — a recursive CTE walking a precomputed
    edge table of (position, dictionary word, snlp cost), with the
    UNKNOWN_CJK_COST single-codepoint fallback where no 1-char entry
    exists — then keep the min-total-cost path, ties broken by the
    zero-padded token-length trace DESC (leftmost-longest, i.e. FMM
    order). Exhaustive search over the identical cost table is an
    independent witness of the engine's DP: same optimum, different
    algorithm. The dict is pruned to words that are substrings of the
    fixture sentences (pure optimization — other words can never lie
    on a path; path counts stay in the hundreds per run)."""
    from weaviate_spark.functions.text import (
        UNKNOWN_CJK_COST, active_cjk_costs,
    )

    # merged embedded+default+runtime table: if a deployment loads a
    # frequency lexicon at runtime, the oracle regenerates from the
    # same merged snapshot the engine's UDF closure broadcasts
    costs = active_cjk_costs()
    lowered = [t.lower() for _, t in sents]
    live = sorted((w, c) for w, c in costs.items()
                  if any(w in s for s in lowered))
    dictvals = ", ".join(f"('{w}', {c})" for w, c in live) or "('一一', 27)"
    inputs = ", ".join(f"({i}, '{t.lower()}')" for i, t in sents)
    cjk_re = (
        "[\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}"
        "\\x{4E00}-\\x{9FFF}\\x{F900}-\\x{FAFF}\\x{AC00}-\\x{D7AF}]"
    )  # keep in sync with text._SEG_RANGES (Hangul included for dict seg)
    return f"""
WITH RECURSIVE dict(w, c) AS (VALUES {dictvals}),
inputs(sid, s) AS (VALUES {inputs}),
runs AS (SELECT sid, unnest(regexp_extract_all(s, '[\\p{{L}}\\p{{N}}]+')) AS run,
         generate_subscripts(regexp_extract_all(s, '[\\p{{L}}\\p{{N}}]+'), 1) AS ridx FROM inputs),
cjk AS (SELECT *, regexp_matches(run, '{cjk_re}') AS has_cjk FROM runs),
pos AS (SELECT sid, ridx, run, unnest(range(1, length(run) + 1)) AS p
        FROM cjk WHERE has_cjk),
edges AS (
  SELECT pos.sid, pos.ridx, pos.p, d.w, d.c
  FROM pos JOIN dict d ON d.w = substr(pos.run, pos.p, length(d.w))
  UNION ALL
  SELECT sid, ridx, p, substr(run, p, 1) AS w, {UNKNOWN_CJK_COST} AS c
  FROM pos
  WHERE NOT EXISTS (SELECT 1 FROM dict d WHERE d.w = substr(pos.run, pos.p, 1))
),
paths(sid, ridx, run, p, toks, cost, trace) AS (
  SELECT sid, ridx, run, 1, []::VARCHAR[], 0::BIGINT, '' FROM cjk WHERE has_cjk
  UNION ALL
  SELECT pp.sid, pp.ridx, pp.run, pp.p + length(e.w),
         list_append(pp.toks, e.w), pp.cost + e.c,
         pp.trace || lpad(CAST(length(e.w) AS VARCHAR), 2, '0')
  FROM paths pp
  JOIN edges e ON e.sid = pp.sid AND e.ridx = pp.ridx AND e.p = pp.p
  WHERE pp.p <= length(pp.run)
),
winner AS (
  SELECT sid, ridx, toks,
         row_number() OVER (PARTITION BY sid, ridx
                            ORDER BY cost ASC, trace DESC) AS rk
  FROM paths WHERE p = length(run) + 1
),
allt AS (
  SELECT sid, ridx, toks FROM winner WHERE rk = 1
  UNION ALL
  SELECT sid, ridx, [run] FROM cjk WHERE NOT has_cjk
),
flat AS (SELECT sid, unnest(toks) AS token,
         generate_subscripts(toks, 1) + ridx * 1000 AS ord FROM allt)
SELECT sid, CAST(row_number() OVER (PARTITION BY sid ORDER BY ord) - 1 AS BIGINT) AS pos, token
FROM flat ORDER BY sid, pos
"""


def _cjk_dict_oracle_sql() -> str:
    return _cjk_lattice_oracle_sql(_CJK_SENTS)


@register("text_cjk_dict_segmentation", oracle=_cjk_dict_oracle_sql())
def q_text_cjk_dict_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary CJK segmentation ('gse_dict': r11 frequency-weighted
    DAG shortest path over the shipped ICU snlp costs — the algorithm
    family of the reference's gse/kagome segmenters,
    entities/tokenizer/tokenizer.go:414-424/472-485; divergence =
    dictionary content, not algorithm). The oracle exhaustively
    enumerates every DAG path in SQL and picks the same min-cost /
    FMM-tiebreak winner, so the segmentation is value-hash-checked
    token by token against an independent search."""
    from pyspark.sql import functions as F

    from weaviate_spark.functions.text import tokenize

    df = local_df(spark, _CJK_SENTS, "sid int, s string")
    return (
        df.select("sid", F.posexplode(tokenize(F.col("s"), "gse_dict"))
                  .alias("pos", "token"))
        .select("sid", F.col("pos").cast("long").alias("pos"), "token")
        .orderBy("sid", "pos")
    )


# Lattice stress sentences: each pins a COST decision the r10 greedy
# FMM got wrong (needing its now-deleted denylist) or a boundary only
# frequencies resolve — しま/けた/たい crossings, the 春の cjdict
# lexeme, embedded-word priors inside classical Chinese, and a
# modern-vocabulary ja sentence far outside the embedded lexicon.
_CJK_LATTICE_SENTS = [
    (1, "私たちは東京で勉強します"),
    (2, "春の夜の夢はうつつよりもかなしき"),
    (3, "すばやいちゃいろのきつねがなまけたいぬをとびこえた"),
    (4, "氏时时适市视狮十时适十狮适市"),
    (5, "大学院の研究所で自然言語処理を研究する"),
]


@register("text_cjk_lattice_segmentation",
          oracle=_cjk_lattice_oracle_sql(_CJK_LATTICE_SENTS))
def q_text_cjk_lattice_segmentation(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """r11 lattice segmentation on cost-sensitive sentences (VERDICT
    r10 ask #1): real dictionary words that greedy FMM would grab
    (しま in 勉強します, たい in なまけたいぬ, the r10 denylist cases)
    must lose to cheaper split paths, while genuinely frequent
    compounds (春の, 大学院, 研究所) win theirs. Engine = Viterbi DP
    (segment_cjk_py); oracle = exhaustive path enumeration over the
    identical cost table with the identical tiebreak — independent
    algorithms, hash-identical output."""
    from pyspark.sql import functions as F

    from weaviate_spark.functions.text import tokenize

    df = local_df(spark, _CJK_LATTICE_SENTS, "sid int, s string")
    return (
        df.select("sid", F.posexplode(tokenize(F.col("s"), "gse_dict"))
                  .alias("pos", "token"))
        .select("sid", F.col("pos").cast("long").alias("pos"), "token")
        .orderBy("sid", "pos")
    )


# ---------------------------------------------------------------------------
# M7 — kNN classification, Explore, boost

@register(
    "knn_classification",
    oracle=None,  # set below — generated from the same LSH planes
)
def q_knn_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification, scale path (classifier_run_knn.go semantics
    with LSH candidate pruning): every 10th object is 'unlabeled', k=5
    neighbors among the LSH-bucket candidates of the rest vote; tie ->
    smallest label. No cross join, nothing collected to the driver —
    the oracle mirrors the identical deterministic hyperplane buckets,
    so the comparison is exact. The exact (unpruned) path is pinned by
    pytest (tests/test_vector.py recall + hand-computed tests)."""
    from weaviate_spark.operators.rerank import knn_classify_lsh
    from pyspark.sql import functions as F

    emb = _load(spark, sf_dir, "embeddings")
    unl = emb.where(F.col("vec_id") % 10 == 0)
    lab = emb.where(F.col("vec_id") % 10 != 0)
    return knn_classify_lsh(
        lab, unl, "vec_id", "embedding", "label", dim=64, k=5,
        num_planes=6, probe=2,
        # labeled/unlabeled partition one collection: single-scan form
        # reads embeddings ONCE (was: union of two filtered scans)
        corpus=emb, labeled_pred=F.col("vec_id") % 10 != 0,
    )


def _knn_lsh_oracle_sql(num_planes: int = 6, dim: int = 64, seed: int = 42,
                        k: int = 5) -> str:
    """DuckDB mirror of q_knn_classification: identical plane constants
    (same generator), identical signature arithmetic (sequential dot
    product over doubles), identical probe set and vote rules."""
    from weaviate_spark.operators.similarity import hyperplanes

    planes = hyperplanes(num_planes, dim, seed)

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"

    sig_expr = " || ".join(
        f"(CASE WHEN list_dot_product(ev, {arr(p)}) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    flips = ", ".join(
        f"substr(_sig,1,{i}) || (CASE WHEN substr(_sig,{i + 1},1)='1' "
        f"THEN '0' ELSE '1' END) || substr(_sig,{i + 2})"
        for i in range(num_planes)
    )
    return f"""
WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
s AS (SELECT *, {sig_expr} AS _sig FROM e),
unl AS (SELECT * FROM s WHERE vec_id % 10 = 0),
lab AS (SELECT * FROM s WHERE vec_id % 10 <> 0),
qp AS (SELECT vec_id AS _qid, ev AS qv, unnest([_sig, {flips}]) AS _bucket FROM unl),
cand AS (
  SELECT DISTINCT qp._qid, qp.qv, l.vec_id AS _tid, l.label AS _label, l.ev AS tv
  FROM qp JOIN lab l ON qp._bucket = l._sig
),
d AS (SELECT _qid, _label, _tid,
  round(1 - list_dot_product(qv, tv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(tv, tv))), 6) AS _d
  FROM cand),
topk AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY _qid ORDER BY _d ASC, _tid ASC) AS _rn FROM d) WHERE _rn <= {k}),
votes AS (SELECT _qid, _label, count(*) AS _votes FROM topk GROUP BY _qid, _label)
SELECT _qid AS vec_id, _label AS predicted_label, CAST(_votes AS BIGINT) AS votes FROM (
SELECT *, row_number() OVER (PARTITION BY _qid ORDER BY _votes DESC, _label ASC) AS _r FROM votes) WHERE _r = 1
"""


ORACLES["knn_classification"] = _knn_lsh_oracle_sql()


from weaviate_spark.ids import uuid_sql as _uuid_sql


def _hash_embed_sql(expr: str, dim: int = 16) -> str:
    """DuckDB mirror of modules.hash_embed_py: per-dim
    md5(text_bytes + d.to_bytes(4, 'little')), first 4 digest bytes as a
    little-endian uint32 -> [-0.5, 0.5), L2-normalized."""
    raws = []
    for d in range(dim):
        suffix = " || ".join(f"chr({b})" for b in d.to_bytes(4, "little"))
        h = f"md5(({expr}) || {suffix})"
        le = (f"('0x' || substr({h},7,2) || substr({h},5,2) || "
              f"substr({h},3,2) || substr({h},1,2))::BIGINT")
        raws.append(f"({le} / 4294967295.0 - 0.5)")
    arr = "[" + ", ".join(raws) + "]::DOUBLE[]"
    return (f"(SELECT list_transform(r, x -> x / sqrt(list_dot_product(r, r))) "
            f"FROM (SELECT {arr} AS r))")




@register(
    "zeroshot_classification",
    oracle=(
        "WITH e AS (SELECT vec_id, label, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings), "
        "pm AS (SELECT label, min(vec_id) AS mv FROM e GROUP BY label), "
        "proto AS (SELECT e.label AS t_label, e.ev AS tv FROM e JOIN pm ON e.vec_id = pm.mv), "
        "items AS (SELECT vec_id, ev FROM e WHERE vec_id % 10 = 0), "
        "d AS (SELECT vec_id, t_label, "
        # + 0.0 folds IEEE -0.0 (self-match, fp error) to 0.0 for the hash
        "round(1 - list_dot_product(ev, tv) / "
        "(sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(tv, tv))), 6) + 0.0 AS _d "
        "FROM items CROSS JOIN proto), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY _d, t_label) AS _rn FROM d) "
        "SELECT vec_id, t_label AS predicted_label, _d AS _distance, "
        f"'weaviate://localhost/Label/' || {_uuid_sql('Label', 't_label')} AS _beacon "
        "FROM r WHERE _rn = 1"
    ),
)
def q_zeroshot_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shot classification (classifier_run_zeroshot.go:24-76): no
    training set — every 10th object is assigned the nearest object of
    a synthetic 'Label' target class (one prototype per label: the
    embedding of the smallest vec_id), emitted as a ref beacon. The
    target class broadcasts; the corpus never shuffles."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.rerank import zeroshot_classify

    emb = _load(spark, sf_dir, "embeddings")
    pm = emb.groupBy("label").agg(F.min("vec_id").alias("_mv")).drop("label")
    proto = (
        emb.join(F.broadcast(pm), emb["vec_id"] == pm["_mv"])
        .select(emb["label"], emb["embedding"])
    )
    items = emb.where(F.col("vec_id") % 10 == 0)
    return zeroshot_classify(
        items, proto, "vec_id", "embedding", "label", "Label",
    )


_CTX_TOPICS = ["analytics", "streaming", "storage", "graphics", "networking",
               "security"]


def _contextual_oracle_sql() -> str:
    from weaviate_spark.modules import hash_embed_py

    tvals = ", ".join(
        f"({i}, '{name}', ["
        + ", ".join(repr(float(x)) for x in hash_embed_py(name, 16))
        + "]::DOUBLE[])"
        for i, name in enumerate(_CTX_TOPICS)
    )
    avg_dims = ", ".join(f"round(avg(wv[{d + 1}]), 6)" for d in range(16))
    return (
        "WITH w AS (SELECT doc_id, unnest(list_distinct("
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+'))) AS w FROM documents), "
        "wv AS (SELECT doc_id, " + _hash_embed_sql("w") + " AS wv FROM w), "
        f"corpus AS (SELECT doc_id, [{avg_dims}] AS cv FROM wv GROUP BY doc_id), "
        f"t(tid, name, tv) AS (VALUES {tvals}), "
        "d AS (SELECT doc_id, tid, name, "
        "round(1 - list_dot_product(cv, tv) / "
        "(sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(tv, tv))), 6) + 0.0 AS _d "
        "FROM corpus CROSS JOIN t), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY _d, tid) AS _rn FROM d) "
        "SELECT doc_id, name AS predicted_class, _d AS winning_distance, "
        f"'weaviate://localhost/Topic/' || {_uuid_sql('Topic', 'tid')} AS _beacon "
        "FROM r WHERE _rn = 1 ORDER BY doc_id"
    )


@register("contextual_classification", oracle=_contextual_oracle_sql())
def q_contextual_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contextual classification (classifier.go TypeContextual ->
    classifier_run_contextual.go): no training set — each document's
    words vectorize individually (deterministic text2vec-dummy), the
    corpus centroid is matched to the nearest of six 'Topic' target
    objects, written back as a ref beacon with the winning distance.
    The oracle replays the md5 word embedding, per-dim centroid, and
    argmin in SQL — the whole path is hash-checked."""
    from pyspark.sql import functions as F

    from weaviate_spark.modules import hash_embed_py
    from weaviate_spark.operators.rerank import contextual_classify

    docs = _load(spark, sf_dir, "documents")
    targets = local_df(
        spark,
        [(i, name, hash_embed_py(name, 16)) for i, name in enumerate(_CTX_TOPICS)],
        "tid int, name string, vector array<double>",
    )
    return contextual_classify(
        docs, targets, "doc_id", "text", "tid", "Topic",
        target_name_col="name", target_vector_col="vector", dim=16,
    ).orderBy("doc_id")


@register(
    "explore_cross_class",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "ce AS (SELECT 'embeddings' AS class_name, CAST(vec_id AS VARCHAR) AS id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings "
        "UNION ALL "
        "SELECT 'docs_embedded' AS class_name, CAST(d.doc_id AS VARCHAR) AS id, "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id WHERE d.lang = 'en') "
        "SELECT class_name, id, "
        "round(1 - list_dot_product(ev, qv) / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS _distance "
        "FROM ce CROSS JOIN q ORDER BY _distance ASC, id ASC LIMIT 12"
    ),
)
def q_explore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explore{}: one vector search across two collections, global
    merge by distance (explorer.go:798-846). (The 'en'-filtered
    docs_embedded leg makes the two classes distinguishable.)"""
    from weaviate_spark.operators.rerank import explore

    leg1 = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=12, quantize="off",
    )).select("vec_id", "_distance")
    leg2 = near_vector(spark, sf_dir, NearVectorSpec(
        collection="docs_embedded", vector=QVEC, id_col="doc_id", limit=12,
        where=Clause(operator="Equal", path=["lang"], value="en"),
    )).select("doc_id", "_distance")
    return explore([("embeddings", leg1), ("docs_embedded", leg2)], limit=12)


@register(
    "boost_rerank",
    oracle=(
        "WITH hits AS (SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer "
        "ORDER BY c_acctbal DESC, c_custkey LIMIT 100), "
        "norm AS (SELECT *, CASE WHEN max(c_acctbal) OVER () = min(c_acctbal) OVER () THEN 1.0 "
        "ELSE (c_acctbal - min(c_acctbal) OVER ()) / (max(c_acctbal) OVER () - min(c_acctbal) OVER ()) END AS _p "
        "FROM hits) "
        "SELECT c_custkey, c_name, c_acctbal, c_mktsegment, "
        "round(0.5 * _p + 0.5 * (CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END), 6) AS _boosted_score "
        "FROM norm"
    ),
)
def q_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boost re-rank (boost_scorer.go): top-100 by acctbal, blended 0.5
    with a filter-condition boost for the BUILDING segment."""
    from weaviate_spark.operators.rerank import BoostCondition, boost_rerank
    from pyspark.sql import functions as F

    hits = (
        _load(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(100)
    )
    out = boost_rerank(
        hits, "c_acctbal",
        [BoostCondition(filter=Clause(operator="Equal", path=["c_mktsegment"], value="BUILDING"))],
        weight=0.5, id_col="c_custkey",
    )
    return out.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "_boosted_score")


@register(
    "filter_len_property",
    oracle=(
        "SELECT p_partkey, p_name FROM part WHERE length(p_name) > 10 "
        "ORDER BY p_partkey LIMIT 10000"
    ),
)
def q_filter_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """len(prop) filter (schema/data_types.go:136-143): char count on text."""
    spec = GetSpec(
        collection="part",
        where=Clause(operator="GreaterThan", path=["len(p_name)"], value=10),
        sort=[SortKey(path=["p_partkey"])],
        limit=10_000,
        select=["p_partkey", "p_name"],
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "filter_tokenized_equal",
    oracle=(
        "SELECT p_partkey, p_name FROM part "
        "WHERE list_contains(regexp_extract_all(lower(p_name), '[\\p{L}\\p{N}]+'), 'widget') "
        "ORDER BY p_partkey LIMIT 10000"
    ),
)
def q_filter_tokenized_equal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenized Equal (row_reader.go:76-91): Equal('Widget') on a
    word-tokenized property matches any row whose tokens contain it."""
    spec = GetSpec(
        collection="part",
        where=Clause(operator="Equal", path=["p_name"], value="Widget", tokenization="word"),
        sort=[SortKey(path=["p_partkey"])],
        limit=10_000,
        select=["p_partkey", "p_name"],
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "filter_tokenized_equal_array",
    oracle=(
        "SELECT p_partkey, p_name, p_type FROM part "
        "WHERE len(list_filter([p_name, p_type], e -> "
        "list_contains(regexp_extract_all(lower(e), '[\\p{L}\\p{N}]+'), 'red'))) > 0 "
        "AND len(list_filter([p_name, p_type], e -> "
        "list_contains(regexp_extract_all(lower(e), '[\\p{L}\\p{N}]+'), 'economy'))) > 0 "
        "ORDER BY p_partkey"
    ),
)
def q_filter_tokenized_equal_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenized Equal on text[] with CROSS-ELEMENT tokens: the inverted
    index posts tokens doc-level, so searcher.go's per-token bitmap AND
    matches 'red economy' against ['red widget', 'ECONOMY'] even though
    no single element holds both tokens (inverted/searcher.go
    OperatorAnd over propValuePairs)."""
    from pyspark.sql import functions as F

    from weaviate_spark.filters import apply_where

    df = _load(spark, sf_dir, "part").withColumn(
        "tags", F.array(F.col("p_name"), F.col("p_type"))
    )
    out = apply_where(
        df,
        Clause(operator="Equal", path=["tags"], value="red ECONOMY",
               tokenization="word"),
    )
    return out.select("p_partkey", "p_name", "p_type").orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Remaining reference semantics: geo, multi-target, offset, objectLimit,
# hybrid distance cutoff, blobHash

@register(
    "filter_geo_within_range",
    oracle=(
        # deterministic synthetic geo: lat/lon derived from c_custkey
        "WITH geo AS (SELECT c_custkey, c_name, "
        "  35 + (c_custkey % 30) + 0.5 AS lat, (c_custkey % 60) - 15 + 0.5 AS lon "
        "FROM customer) "
        "SELECT c_custkey, c_name FROM geo "
        "WHERE 2 * 6371000.0 * asin(sqrt("
        "  pow(sin(radians(52.52 - lat) / 2), 2) + "
        "  cos(radians(lat)) * cos(radians(52.52)) * pow(sin(radians(13.405 - lon) / 2), 2)"
        ")) <= 2000000 ORDER BY c_custkey"
    ),
)
def q_geo_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WithinGeoRange (geo.go:77-110, haversine distancer): customers
    with synthetic deterministic coordinates within 2000 km of Berlin."""
    from pyspark.sql import functions as F
    from weaviate_spark.filters import GeoRange

    df = _load(spark, sf_dir, "customer").withColumn(
        "location",
        F.struct(
            (35 + (F.col("c_custkey") % 30) + 0.5).cast("double").alias("latitude"),
            ((F.col("c_custkey") % 60) - 15 + 0.5).cast("double").alias("longitude"),
        ),
    )
    from weaviate_spark.filters import compile_where

    out = df.where(compile_where(df, Clause(
        operator="WithinGeoRange", path=["location"],
        value=GeoRange(latitude=52.52, longitude=13.405, distance_meters=2_000_000),
    )))
    return out.select("c_custkey", "c_name").orderBy("c_custkey")


@register(
    "knn_multi_target",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev, "
        "list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS rv FROM embeddings), "
        "d AS (SELECT vec_id, "
        "round(1 - list_dot_product(ev, qv) / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS d0, "
        "round(1 - list_dot_product(rv, qv) / (sqrt(list_dot_product(rv, rv)) * sqrt(list_dot_product(qv, qv))), 6) AS d1 "
        "FROM e CROSS JOIN q) "
        "SELECT vec_id, least(d0, d1) AS _distance FROM d "
        "ORDER BY _distance ASC, vec_id ASC LIMIT 10"
    ),
)
def q_knn_multi_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-target vector search (shard_combine_multi_target.go):
    two named vectors (embedding + its reverse as a second target),
    Minimum combination (the default), inner-join drop semantics."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.vector import multi_target_combine, with_distance, NearVectorSpec

    emb = _load(spark, sf_dir, "embeddings")
    rev = emb.withColumn("embedding", F.reverse(F.col("embedding")))
    leg0 = with_distance(emb, NearVectorSpec(collection="embeddings", vector=QVEC)).select("vec_id", "_distance")
    leg1 = with_distance(rev, NearVectorSpec(collection="embeddings", vector=QVEC)).select("vec_id", "_distance")
    out = multi_target_combine([leg0, leg1], "vec_id", "min")
    return out.orderBy(F.col("_distance").asc(), F.col("vec_id").asc()).limit(10)


@register(
    "knn_multi_target_relative",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev, "
        "list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS rv FROM embeddings), "
        "d AS (SELECT vec_id, "
        "round(1 - list_dot_product(ev, qv) / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS _d0, "
        "round(1 - list_dot_product(rv, qv) / (sqrt(list_dot_product(rv, rv)) * sqrt(list_dot_product(qv, qv))), 6) AS _d1 "
        "FROM e CROSS JOIN q), "
        "t0 AS (SELECT vec_id FROM d ORDER BY _d0 ASC, vec_id ASC LIMIT 50), "
        "t1 AS (SELECT vec_id FROM d ORDER BY _d1 ASC, vec_id ASC LIMIT 50), "
        "u AS (SELECT vec_id FROM t0 UNION SELECT vec_id FROM t1), "
        "c AS (SELECT d.* FROM d JOIN u USING (vec_id)), "
        "s AS (SELECT min(_d0) AS mn0, max(_d0) AS mx0, min(_d1) AS mn1, max(_d1) AS mx1 FROM c) "
        "SELECT vec_id, round("
        "CASE WHEN mx0 <> mn0 THEN 0.4 * (_d0 - mn0) / (mx0 - mn0) ELSE 0.4 END + "
        "CASE WHEN mx1 <> mn1 THEN 0.6 * (_d1 - mn1) / (mx1 - mn1) ELSE 0.6 END"
        ", 6) AS _score, _d0, _d1 "
        "FROM c CROSS JOIN s ORDER BY _score ASC, vec_id ASC LIMIT 10"
    ),
)
def q_knn_multi_target_relative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-target RelativeScore combination (dto.go:37,
    shard_combine_multi_target.go:122-186, FusionRelativeScore in
    hybrid_fusion.go:95-183): two targets (embedding + its reverse),
    per-target min-max normalization over the union of each leg's
    top-50 ids, weighted 0.4/0.6 sum, ascending."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.vector import (
        NearVectorSpec, multi_target_relative_score, with_distance,
    )

    emb = _load(spark, sf_dir, "embeddings")
    rev = emb.withColumn("embedding", F.reverse(F.col("embedding")))
    leg0 = with_distance(emb, NearVectorSpec(collection="embeddings", vector=QVEC)).select("vec_id", "_distance")
    leg1 = with_distance(rev, NearVectorSpec(collection="embeddings", vector=QVEC)).select("vec_id", "_distance")
    return multi_target_relative_score(
        [leg0, leg1], "vec_id", weights=[0.4, 0.6], leg_limit=50, limit=10,
    )


_QVEC32_SQL = "[" + ", ".join(str(x) for x in QVEC[:32]) + "]::DOUBLE[]"

_NAMED_VECTORS_ORACLE = (
    f"WITH q AS (SELECT {_QVEC_SQL} AS qf, {_QVEC32_SQL} AS qh), "
    "e AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vf, "
    "list_transform(embedding[1:32], x -> CAST(x AS DOUBLE)) AS vh FROM embeddings), "
    "d AS (SELECT vec_id, "
    "round(1 - list_dot_product(vf, qf) / (sqrt(list_dot_product(vf, vf)) * sqrt(list_dot_product(qf, qf))), 6) AS d_full, "
    "round(1 - list_dot_product(vh, qh) / (sqrt(list_dot_product(vh, vh)) * sqrt(list_dot_product(qh, qh))), 6) AS d_head "
    "FROM e CROSS JOIN q) "
    "SELECT vec_id, {combined} AS _distance, d_full, d_head FROM d "
    "ORDER BY _distance ASC, vec_id ASC LIMIT 12"
)


def _q_named_vectors(spark: SparkSession, sf_dir: str, combination: str,
                     weights: tuple[float, float] = (1.0, 1.0)) -> DataFrame:
    from pyspark.sql import functions as F
    from weaviate_spark.operators.vector import NamedTarget, named_multi_target_search

    emb = _load(spark, sf_dir, "embeddings")
    df = emb.select(
        "vec_id",
        F.struct(
            F.col("embedding").alias("full"),
            F.slice("embedding", 1, 32).alias("head"),
        ).alias("_vectors"),
    )
    out = named_multi_target_search(
        df,
        [NamedTarget("full", QVEC, weights[0]), NamedTarget("head", QVEC[:32], weights[1])],
        "vec_id", combination=combination, limit=12,
    )
    return out.select(
        "vec_id", "_distance",
        F.col("_distances.full").alias("d_full"),
        F.col("_distances.head").alias("d_head"),
    )


@register(
    "knn_named_vectors_min",
    oracle=_NAMED_VECTORS_ORACLE.format(combined="least(d_full, d_head)"),
)
def q_knn_named_vectors_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-vector multi-target search, Minimum combine (the default,
    dto.go:41): two named spaces ('full' = the 64-d embedding, 'head' =
    its first 32 dims) stored as a `_vectors` struct — per-target
    distances fuse into one narrow scan, no leg join
    (shard_read.go:612-662 re-expressed column-wise)."""
    return _q_named_vectors(spark, sf_dir, "min")


@register(
    "knn_named_vectors_weighted",
    # decimal-exact weighted sum, mirroring named_multi_target_search's
    # manualWeights branch (vector.py): double arithmetic would sit one
    # ulp below the exact 7th-decimal half for ~10% of rows and round
    # the other way
    oracle=_NAMED_VECTORS_ORACLE.format(
        combined="CAST(round(0.3 * CAST(d_full AS DECIMAL(20,6)) "
                 "+ 0.7 * CAST(d_head AS DECIMAL(20,6)), 6) AS DOUBLE)"),
)
def q_knn_named_vectors_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-vector multi-target search, ManualWeights combine
    (dto.go:30-47): weights keyed by vector name (full: 0.3, head: 0.7)."""
    return _q_named_vectors(spark, sf_dir, "manualWeights", weights=(0.3, 0.7))


# Shared window CTE for the post-search rerank oracles (MMR, legacy group):
# exact cosine top-20 over embeddings, the same collected window the Spark
# path fetches.
_RERANK_WINDOW_SQL = (
    f"q AS (SELECT {_QVEC_SQL} AS qv), "
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings), "
    "d AS (SELECT vec_id, ev, round(1 - list_dot_product(ev, qv) / "
    "(sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS dist FROM e CROSS JOIN q), "
    "cand AS (SELECT vec_id, ev, dist, row_number() OVER (ORDER BY dist ASC, vec_id ASC) AS rn "
    "FROM d ORDER BY dist ASC, vec_id ASC LIMIT 20)"
)

_COS_DIST_SQL = (
    "1 - list_dot_product(x.ev, c.ev) / "
    "(sqrt(list_dot_product(x.ev, x.ev)) * sqrt(list_dot_product(c.ev, c.ev)))"
)


def _collect_rerank_window(spark: SparkSession, sf_dir: str) -> list[dict]:
    from weaviate_spark.operators.vector import NearVectorSpec, near_vector

    top = near_vector(
        spark, sf_dir,
        NearVectorSpec(collection="embeddings", vector=QVEC, limit=20, quantize="off"),
    ).select("vec_id", "_distance", "embedding")
    return [
        {"vec_id": r["vec_id"], "rel": 1.0 - r["_distance"],
         "embedding": [float(x) for x in r["embedding"]]}
        for r in top.collect()
    ]


@register(
    "mmr_rerank_topk",
    oracle=(
        "WITH RECURSIVE " + _RERANK_WINDOW_SQL + ", "
        "rc AS (SELECT vec_id, ev, 1 - dist AS rel FROM cand), "
        "pairs AS (SELECT a.vec_id AS i, b.vec_id AS j, "
        "list_dot_product(a.ev, b.ev) / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))) AS s "
        "FROM rc a CROSS JOIN rc b), "
        "steps AS ("
        "SELECT 1 AS step, vec_id AS picked, rel, [vec_id] AS sel "
        "FROM (SELECT vec_id, rel FROM rc ORDER BY rel DESC, vec_id ASC LIMIT 1) "
        "UNION ALL "
        "SELECT s.step + 1, nx.vec_id, nx.rel, list_append(s.sel, nx.vec_id) "
        "FROM steps s, LATERAL ("
        "  SELECT c.vec_id, c.rel FROM rc c WHERE NOT list_contains(s.sel, c.vec_id) "
        "  ORDER BY 0.5 * c.rel - 0.5 * (SELECT max(p.s) FROM pairs p "
        "    WHERE p.i = c.vec_id AND list_contains(s.sel, p.j)) DESC, "
        "    c.rel DESC, c.vec_id ASC LIMIT 1"
        ") nx WHERE s.step < 8) "
        "SELECT step AS mmr_rank, picked AS vec_id, round(rel, 6) AS rel "
        "FROM steps ORDER BY mmr_rank"
    ),
)
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification over the fetched window
    (selection_hybrid.go:28-90): greedy argmax of
    balance*relevance - (1-balance)*max_sim_to_selected, balance 0.5,
    8 picks from the exact cosine top-20. Driver-side over <= limit
    rows exactly like the reference; the oracle replays the greedy
    loop as a recursive CTE."""
    from weaviate_spark.operators.rerank import mmr_select

    rows = _collect_rerank_window(spark, sf_dir)
    picked = mmr_select(rows, "embedding", "rel", k=8, balance=0.5)
    return local_df(
        spark,
        [(i + 1, r["vec_id"], round(r["rel"], 6)) for i, r in enumerate(picked)],
        "mmr_rank int, vec_id long, rel double",
    )


@register(
    "group_merge_closest",
    oracle=(
        "WITH RECURSIVE " + _RERANK_WINDOW_SQL + ", "
        "steps AS ("
        "SELECT 1 AS rn, [{'grp': 1, 'vid': vec_id, 'rn': 1, 'ev': ev}] AS state FROM cand WHERE rn = 1 "
        "UNION ALL "
        "SELECT s.rn + 1, list_append(s.state, "
        "{'grp': CASE WHEN len(list_filter(s.state, x -> " + _COS_DIST_SQL + " < 0.73)) > 0 "
        "THEN list_min(list_transform(list_filter(s.state, x -> " + _COS_DIST_SQL + " < 0.73), x -> x.grp)) "
        "ELSE list_max(list_transform(s.state, x -> x.grp)) + 1 END, "
        "'vid': c.vec_id, 'rn': s.rn + 1, 'ev': c.ev}) "
        "FROM steps s JOIN cand c ON c.rn = s.rn + 1 WHERE s.rn < 20), "
        "final AS (SELECT x.* FROM (SELECT state FROM steps WHERE rn = 20) f, unnest(f.state) AS t(x)) "
        "SELECT grp AS group_idx, arg_min(vid, rn) AS vec_id, count(*) AS group_size "
        "FROM final GROUP BY grp ORDER BY grp"
    ),
)
def q_group_merge_closest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy `group` with the 'closest' strategy
    (grouper/grouper.go:33-143): single-linkage merge of the fetched
    top-20 at force=0.73 cosine distance; each group keeps its
    best-ranked member. The oracle replays the row-order greedy
    placement as a recursive CTE carrying the assignment state."""
    from weaviate_spark.operators.rerank import legacy_group

    rows = _collect_rerank_window(spark, sf_dir)
    reps = legacy_group(rows, "embedding", force=0.73, strategy="closest")
    return local_df(
        spark,
        [(i + 1, r["vec_id"], r["_group_size"]) for i, r in enumerate(reps)],
        "group_idx int, vec_id long, group_size long",
    )


def _slice_sql(lo: int, hi: int) -> str:
    return f"list_transform(embedding[{lo}:{hi}], x -> CAST(x AS DOUBLE))"


_Q_TOK1_SQL = "[" + ", ".join(str(x) for x in QVEC[:21]) + "]::DOUBLE[]"
_Q_TOK2_SQL = "[" + ", ".join(str(x) for x in QVEC[21:42]) + "]::DOUBLE[]"


@register(
    "multivector_maxsim_topk",
    oracle=(
        f"WITH q AS (SELECT {_Q_TOK1_SQL} AS q1, {_Q_TOK2_SQL} AS q2), "
        f"e AS (SELECT vec_id, {_slice_sql(1, 21)} AS t1, {_slice_sql(22, 42)} AS t2, "
        f"{_slice_sql(43, 63)} AS t3 FROM embeddings) "
        "SELECT vec_id, round("
        "greatest(list_dot_product(t1, q1), list_dot_product(t2, q1), list_dot_product(t3, q1)) + "
        "greatest(list_dot_product(t1, q2), list_dot_product(t2, q2), list_dot_product(t3, q2))"
        ", 6) AS _score "
        "FROM e CROSS JOIN q ORDER BY _score DESC, vec_id ASC LIMIT 10"
    ),
)
def q_multivector_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-vector late interaction (ColBERT maxsim,
    hnsw/search.go:96-134 rescore semantics): each doc carries 3 token
    vectors (deterministic slices of its embedding), the 2-token query
    scores sum-of-max dot products; narrow expression + TakeOrdered."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.multivector import multivector_search

    emb = _load(spark, sf_dir, "embeddings")
    docs = emb.select(
        "vec_id",
        F.array(
            F.slice("embedding", 1, 21),
            F.slice("embedding", 22, 21),
            F.slice("embedding", 43, 21),
        ).alias("_toks"),
    )
    return multivector_search(docs, "vec_id", "_toks", [QVEC[:21], QVEC[21:42]], limit=10)


from weaviate_spark.media_oracles import (
    image_features_oracle_sql,
    muvera_oracle_sql,
    near_image_oracle_sql,
)


@register("multivector_muvera_topk", oracle=muvera_oracle_sql(QVEC, _slice_sql))
def q_multivector_muvera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUVERA fixed-dim encoding + overfetch-2x + exact maxsim rescore
    (muvera.go:114-205, hnsw/search.go:101-120). Hash-checked: the FDE
    parameters are pure functions of the fixed public seed, so the
    oracle (media_oracles.muvera_oracle_sql) re-runs the ENTIRE
    pipeline — SimHash clustering, mean+Hamming-fill aggregation, +-1
    projection, float32 storage, FDE top-20, exact maxsim rescore — in
    DuckDB with the parameter matrices inlined as literals."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.multivector import MuveraSpec, muvera_search

    emb = _load(spark, sf_dir, "embeddings")
    docs = emb.select(
        "vec_id",
        F.array(
            F.slice("embedding", 1, 21),
            F.slice("embedding", 22, 21),
            F.slice("embedding", 43, 21),
        ).alias("_toks"),
    )
    return muvera_search(
        docs, "vec_id", "_toks", [QVEC[:21], QVEC[21:42]],
        MuveraSpec(dim=21), limit=10, overfetch=2,
    )


from weaviate_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    temperature_sample,
    train_val_split,
    unit_hash_sql,
)


@register(
    "sample_temperature_mixture",
    oracle=(
        # same arithmetic as operators/sampling.py temperature_sample:
        # w_d = (n_d/N)^(1/T), f_d = round(min(1, target*N*(w_d/Z)/n_d), 9)
        "WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n "
        "           FROM documents GROUP BY lang), "
        "t AS (SELECT lang, n, "
        "             pow(n / (SELECT sum(n) FROM c), 0.5) AS w FROM c), "
        "f AS (SELECT lang, round(least(1.0, "
        "             0.5 * (SELECT sum(n) FROM c) "
        "             * (w / (SELECT sum(w) FROM t)) / n), 9) AS frac FROM t) "
        "SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled "
        "FROM documents d JOIN f USING (lang) "
        f"WHERE {unit_hash_sql('d.doc_id', 'temp')} < f.frac "
        "GROUP BY d.lang"
    ),
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed domain mixture (p_d ∝ (n_d/N)^(1/T), here
    T=2 over languages at a 0.5 target): flattens head languages toward
    the tail — the standard multilingual-corpus rebalancing pass. One
    tiny per-domain count, then a narrow no-shuffle filter."""
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    out = temperature_sample(docs, "doc_id", "lang", temperature=2.0,
                             target_fraction=0.5)
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


@register(
    "sample_hash_fraction",
    oracle=(
        "SELECT doc_id, lang FROM documents "
        f"WHERE {unit_hash_sql('doc_id', 'sample')} < 0.1"
    ),
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sampling keyed on md5(id) — reproducible
    across runs/cluster sizes (rand() is not), narrow, no shuffle."""
    docs = _load(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.1).select("doc_id", "lang")


@register(
    "sample_stratified",
    oracle=(
        "SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents "
        f"WHERE {unit_hash_sql('doc_id', 'strata')} < "
        "(CASE lang WHEN 'en' THEN 0.05 WHEN 'es' THEN 0.5 ELSE 1.0 END) "
        "GROUP BY lang"
    ),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling (downsample dominant languages, keep rare
    ones) — the literal CASE fraction map compiles into the scan filter."""
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.05, "es": 0.5}, default_fraction=1.0,
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "split_train_val",
    oracle=(
        "SELECT CASE WHEN "
        f"{unit_hash_sql('doc_id', 'split')} < 0.2 THEN 'val' ELSE 'train' END AS _split, "
        "CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS chars "
        "FROM documents GROUP BY 1"
    ),
)
def q_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-keyed train/val split: a row's assignment never changes as
    the corpus grows (no leakage across incremental runs)."""
    from pyspark.sql import functions as F

    docs = _load(spark, sf_dir, "documents")
    return (
        train_val_split(docs, "doc_id", 0.2)
        .groupBy("_split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
    )


@register(
    "agg_hybrid_object_limit",
    oracle=(
        "WITH fused AS (SELECT doc_id FROM ("
        + hybrid_oracle_sql("spark filter join", QVEC, alpha=0.5, fusion="ranked", limit=20)
        + ") f) "
        "SELECT d.lang, CAST(count(*) AS BIGINT) AS n, "
        "round(avg(d.n_chars), 6) AS avg_chars "
        "FROM documents d JOIN fused USING (doc_id) GROUP BY d.lang"
    ),
)
def q_agg_hybrid_object_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a hybrid-search objectLimit subset
    (aggregator/hybrid.go: aggregation runs on the fused top-k object
    set): hybrid top-20 ids broadcast into the aggregation scan."""
    from pyspark.sql import functions as F

    fused = hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join", vector=QVEC,
        properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.5, fusion="ranked", limit=20,
    )).select("doc_id")
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(fused), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


def _neartext_move_qvec() -> list[float]:
    from weaviate_spark.modules import near_text_vector

    return near_text_vector(
        ["spark", "join"], move_to=["filter"], move_away=["audio"], force=0.3,
    )


@register(
    "neartext_move_topk",
    oracle=(
        "WITH e AS (SELECT doc_id, "
        + _hash_embed_sql("text") + " AS ev FROM documents), "
        "q AS (SELECT ["
        + ", ".join(repr(float(x)) for x in _neartext_move_qvec())
        + "]::DOUBLE[] AS qv) "
        "SELECT doc_id, round(1 - list_dot_product(ev, qv) / "
        "(sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS _distance "
        "FROM e CROSS JOIN q ORDER BY _distance ASC, doc_id ASC LIMIT 15"
    ),
)
def q_neartext_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nearText with moveTo/moveAwayFrom concept arithmetic
    (retrieval.go:149-160): documents vectorized by the deterministic
    text2vec-dummy (r11: a pure Catalyst md5 expression — no Python
    evaluation stage), query vector = averaged concepts nudged toward
    'filter' and away from 'audio'; cosine top-15. The oracle
    reproduces the md5-seeded embedding bit-for-bit in SQL — the full
    nearText path is hash-checked, not just row counts."""
    from pyspark.sql import functions as F
    from weaviate_spark.functions.distance import distance
    from weaviate_spark.modules import vectorize_column

    docs = _load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    emb = docs.withColumn("_vector", vectorize_column(F.col("text")))
    qv = lit_double_array(_neartext_move_qvec())
    return (
        emb.withColumn("_distance", F.round(distance(F.col("_vector"), qv, "cosine"), 6))
        .select("doc_id", "_distance")
        .orderBy(F.col("_distance").asc(), F.col("doc_id").asc())
        .limit(15)
    )


@register(
    "pack_sequences_budget",
    oracle=(
        "WITH b AS (SELECT doc_id, n_chars, "
        "(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16) AS _bucket "
        "FROM documents), "
        "c AS (SELECT _bucket, doc_id, "
        "sum(least(n_chars, 4096)) OVER (PARTITION BY _bucket ORDER BY doc_id) AS _cum FROM b) "
        "SELECT _bucket, CAST((_cum - 1) // 4096 AS BIGINT) AS _pack, "
        "CAST(count(*) AS BIGINT) AS n_docs "
        "FROM c GROUP BY 1, 2"
    ),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (training-batch construction):
    hash-bucketed then packed per bucket by a running sum — packing
    parallelizes across buckets, no global window."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.sampling import pack_sequences

    docs = _load(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "n_chars", budget=4096, num_buckets=16)
    return packed.groupBy("_bucket", "_pack").agg(
        F.count(F.lit(1)).alias("n_docs"),
    )


_PII_EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE_RX = "\\+?\\d[\\d ().-]{7,}\\d"
_PII_INJECT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "pii_scrub_profile",
    oracle=(
        f"WITH t AS (SELECT doc_id, {_PII_INJECT_SQL} AS txt FROM documents), "
        "s AS (SELECT doc_id, "
        f"len(regexp_extract_all(txt, '{_PII_EMAIL_RX}')) AS n_email, "
        f"len(regexp_extract_all(txt, '{_PII_PHONE_RX}')) AS n_phone, "
        "regexp_replace(regexp_replace(txt, "
        f"'{_PII_EMAIL_RX}', '[EMAIL]', 'g'), "
        f"'{_PII_PHONE_RX}', '[PHONE]', 'g') AS scrubbed FROM t) "
        "SELECT doc_id, CAST(n_email AS INT) AS n_email, "
        "CAST(n_phone AS INT) AS n_phone, "
        "substr(scrubbed, greatest(len(scrubbed) - 39, 1)) AS scrubbed_tail "
        "FROM s"
    ),
)
def q_pii_scrub_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + scrubbing: deterministic synthetic PII (an email
    and a phone number derived from the doc id) is injected, profiled,
    and masked with typed placeholders — pure regex column expressions,
    dialect-compatible across both engines."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.curation import pii_profile, pii_scrub

    docs = _load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("txt"),
    )
    prof = pii_profile(docs, "doc_id", "txt").select(
        "doc_id", F.col("n_email").cast("int").alias("n_email"),
        F.col("n_phone").cast("int").alias("n_phone"),
    )
    scrubbed = pii_scrub(docs, "txt", "scrubbed").select(
        "doc_id",
        F.substring(
            F.col("scrubbed"),
            F.greatest(F.length("scrubbed") - 39, F.lit(1)),
            F.lit(1_000_000),
        ).alias("scrubbed_tail"),
    )
    return prof.join(scrubbed, "doc_id")


@register(
    "decontaminate_overlap",
    oracle=(
        "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt "
        "FROM documents), "
        "sh AS (SELECT doc_id AS _doc, "
        "list_distinct([array_to_string(tt[i:i+4], ' ') "
        "FOR i IN range(1, greatest(len(tt) - 4, 0) + 1)]) AS shs "
        "FROM toks WHERE len(tt) >= 5), "
        "ex AS (SELECT _doc, unnest(shs) AS _shingle FROM sh), "
        "bench AS (SELECT DISTINCT _shingle FROM ex WHERE _doc % 97 = 0), "
        "docs AS (SELECT * FROM ex WHERE _doc % 97 <> 0), "
        "tot AS (SELECT _doc, count(*) AS n_shingles FROM docs GROUP BY _doc), "
        "hit AS (SELECT _doc, count(*) AS n_contaminated FROM docs SEMI JOIN bench USING (_shingle) GROUP BY _doc) "
        "SELECT t._doc AS doc_id, CAST(t.n_shingles AS BIGINT) AS n_shingles, "
        "CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated, "
        "round(coalesce(h.n_contaminated, 0) / CAST(t.n_shingles AS DOUBLE), 6) AS score "
        "FROM tot t LEFT JOIN hit h USING (_doc) "
        "WHERE coalesce(h.n_contaminated, 0) > 0"
    ),
)
def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 97th doc forms the synthetic
    held-out benchmark; the rest are scored by the fraction of their
    word 5-gram shingles appearing in the benchmark's shingle set (the
    standard n-gram-overlap contamination check). One semi-join on the
    md5-uniform shingle key — no n^2."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.curation import contamination_scores

    docs = _load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    rest = docs.where(F.col("doc_id") % 97 != 0)
    out = contamination_scores(rest, bench, "doc_id", "text", n=5)
    return out.where(F.col("n_contaminated") > 0).select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        "score",
    )


@register("near_image_topk", oracle=near_image_oracle_sql())
def q_near_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nearImage search (near-media query surface): a MIXED-CODEC corpus
    — 4x4 PPM images synthesized per doc plus real JPEGs (pure-numpy
    decoder) every 7th doc, one of the three variants PROGRESSIVE
    (SOF2, multi-scan successive approximation) — query = a literal PPM
    blob, cosine top-10 in the shared feature space. Hash-checked: the
    PPM pixels are md5-derivable and the solid-JPEG decoded colors are
    bit-level-pinned constants (tests/test_jpeg.py), so the oracle
    (media_oracles.near_image_oracle_sql) recomputes the full feature +
    cosine pipeline analytically in DuckDB."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.multimodal import (
        near_media_search, solid_jpeg, solid_jpeg_progressive,
    )

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    # deterministic JPEG variants (DC categories 2/4/5 only; the
    # progressive one uses even DCs so the halves stay in-category)
    jpegs = [solid_jpeg(20, -12, 8), solid_jpeg_progressive(-6, 16, -4),
             solid_jpeg(3, 2, 26)]
    jpeg_col = (
        F.when(F.col("doc_id") % 21 == 0, F.lit(jpegs[0]))
        .when(F.col("doc_id") % 21 == 7, F.lit(jpegs[1]))
        .otherwise(F.lit(jpegs[2]))
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 7 == 0, jpeg_col).otherwise(
            F.concat(
                F.lit(b"P6\n4 4\n255\n"),
                F.unhex(F.md5(F.col("text"))),
                F.unhex(F.md5(F.concat(F.col("text"), F.lit("2")))),
                F.unhex(F.md5(F.concat(F.col("text"), F.lit("3")))),
            )
        ).alias("media"),
    )
    query_blob = b"P6\n4 4\n255\n" + bytes(range(48))
    return near_media_search(media, "media_id", "media", query_blob, limit=10)


@register("multimodal_image_features", oracle=image_features_oracle_sql())
def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode pipeline over binary media columns: 4x4 PPM
    images synthesized column-side (P6 header + md5-derived pixels, pure
    Catalyst), then decoded with the pure-numpy PPM codec and
    feature-extracted via Arrow-batched mapInPandas
    (operators/multimodal.py). Hash-checked: the pixel buffer is
    md5(text)-derived, so the oracle recomputes mean-R from the same
    md5 hex in DuckDB, mirrored through float32 storage width."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.multimodal import decode_image_features

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.lit(b"P6\n4 4\n255\n"),
            F.unhex(F.md5(F.col("text"))),
            F.unhex(F.md5(F.concat(F.col("text"), F.lit("2")))),
            F.unhex(F.md5(F.concat(F.col("text"), F.lit("3")))),
        ).alias("media"),
    )
    out = decode_image_features(media, "media_id", "media", dim=7)
    return out.where(F.col("decode_ok")).select(
        "media_id",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("mean_r"),
    ).orderBy("media_id")


@register(
    "video_frame_luma",
    oracle=(
        "WITH docs AS (SELECT doc_id, 3 + doc_id % 4 AS nf FROM documents "
        "WHERE doc_id % 17 = 0), "
        "s AS (SELECT doc_id, nf, u.s AS frame_idx FROM docs, "
        "(SELECT unnest(generate_series(0, 5)) AS s) u "
        "WHERE u.s * 200 < nf * 100) "
        "SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx, "
        "CAST(frame_idx * 200 AS BIGINT) AS frame_ts_ms, "
        "CAST((doc_id * 7 + least(nf - 1, frame_idx * 2) * 31) % 256 AS BIGINT) "
        "AS luma FROM s ORDER BY media_id, frame_idx"
    ),
)
def q_video_frame_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode: per doc a Y4M clip (3-6 solid frames at 10
    fps, luma = (doc_id*7 + frame*31) % 256, neutral chroma) is encoded
    executor-side, frame-sampled every 200 ms with the fps-aware Y4M
    path of sample_frames (operators/multimodal.py), and each sampled
    PPM frame is decoded back with the real image codec to recover its
    luma. Neutral chroma makes YCbCr->RGB exact (RGB == Y), so the
    DuckDB oracle mirrors the sampling+luma arithmetic analytically —
    the whole encode -> container parse -> frame seek -> decode chain is
    hash-checked, not just rows-only. Reference scope: multi2vec video
    modules treat video as an ingest-time-vectorized blob; frame
    sampling is the Spark-pipeline analogue. Scale: one narrow
    Arrow-batched map per stage, no shuffle until the final sort."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.multimodal import (
        decode_image_array,
        sample_frames,
        solid_y4m,
    )

    docs = (
        _load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 17 == 0)
        .select("doc_id")
    )

    def _make(it):
        import pandas as pd

        for pdf in it:
            clips = [
                solid_y4m(
                    [((int(d) * 7 + f * 31) % 256, 128, 128)
                     for f in range(3 + int(d) % 4)],
                    width=4, height=4, fps=(10, 1),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "media": clips})

    media = docs.mapInPandas(_make, "media_id long, media binary")
    frames = sample_frames(media, "media_id", "media", every_ms=200)

    def _luma(it):
        import pandas as pd

        for pdf in it:
            lumas = [
                int(decode_image_array(bytes(b))[0, 0, 0]) for b in pdf["frame"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_idx": pdf["frame_idx"],
                "frame_ts_ms": pdf["frame_ts_ms"],
                "luma": lumas,
            })

    return (
        frames.mapInPandas(
            _luma, "media_id long, frame_idx long, frame_ts_ms long, luma long"
        )
        .orderBy("media_id", "frame_idx")
    )


@register(
    "pagination_offset",
    oracle=(
        "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey "
        "LIMIT 10 OFFSET 25"
    ),
)
def q_pagination_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """offset+limit pagination (pagination.go:14-29) under the server cap."""
    spec = GetSpec(
        collection="customer",
        sort=[SortKey(path=["c_custkey"])],
        offset=25, limit=10,
        select=["c_custkey", "c_name"],
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "agg_object_limit",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings), "
        f"topk AS (SELECT vec_id, label, {_COS_SQL} AS _distance "
        "FROM e CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 100) "
        "SELECT label, CAST(count(*) AS BIGINT) AS meta_count, "
        "round(avg(_distance), 6) AS _distance_mean "
        "FROM topk GROUP BY label"
    ),
)
def q_agg_object_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation with objectLimit (aggregator/hybrid.go,
    vector_search.go): aggregate over only the top-100 of a vector
    search."""
    from pyspark.sql import functions as F

    topk = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=100, quantize="off",
    )).select("vec_id", "label", "_distance")
    return topk.groupBy("label").agg(
        F.count(F.lit(1)).alias("meta_count"),
        F.round(F.avg("_distance"), 6).alias("_distance_mean"),
    )


@register(
    "hybrid_distance_cutoff",
    oracle=None,  # set below — needs the ranked-fusion SQL with a cutoff
)
def q_hybrid_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid with maxVectorDistance: cutoff prunes the vector leg AND
    removes keyword hits beyond it (hybrid/searcher.go:114-133)."""
    return hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join", vector=QVEC,
        properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.5, fusion="ranked", limit=25, max_vector_distance=0.9,
    ))


ORACLES["hybrid_distance_cutoff"] = hybrid_oracle_sql(
    "spark filter join", QVEC, alpha=0.5, fusion="ranked", limit=25
).replace(
    "bm AS (SELECT id, sec FROM bm_all ORDER BY sec DESC, id ASC LIMIT 100),",
    "bm_cut AS (SELECT id, sec FROM bm_all ORDER BY sec DESC, id ASC LIMIT 100),\n"
    "bm AS (SELECT b.id, b.sec FROM bm_cut b JOIN vd_all v ON v.id = b.id WHERE v._distance <= 0.9),",
).replace(
    "vd AS (",
    "vd_all AS (SELECT doc_id AS id, round(1 - list_dot_product(ev, v) /\n"
    "    (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(v, v))), 6) AS _distance\n"
    "  FROM (SELECT doc_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM corpus)\n"
    "  CROSS JOIN qv),\n"
    "vd AS (",
).replace(
    "ORDER BY _distance ASC, id ASC LIMIT 100\n),\nve AS",
    "WHERE _distance <= 0.9 ORDER BY _distance ASC, id ASC LIMIT 100\n),\nve AS",
)


@register(
    "blob_hash",
    oracle=(
        "SELECT doc_id, sha256(text) AS content_sha256 FROM documents "
        "ORDER BY doc_id LIMIT 100"
    ),
)
def q_blob_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """blobHash type (data_types.go:45-46): sha256 stored instead of
    the payload."""
    from pyspark.sql import functions as F

    return (
        _load(spark, sf_dir, "documents")
        .select("doc_id", F.sha2(F.col("text"), 256).alias("content_sha256"))
        .orderBy("doc_id").limit(100)
    )


@register(
    "events_json_props",
    oracle=(
        "SELECT event_type, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min, "
        "CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max "
        "FROM events GROUP BY event_type"
    ),
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props (object-typed property analogue, §1.2):
    JSON extraction + aggregation over events.props."""
    from pyspark.sql import functions as F

    df = _load(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("long")
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


@register(
    "agg_date_median_mode",
    oracle=(
        "WITH t AS (SELECT o_orderpriority, epoch_us(o_orderdate) AS e FROM orders), "
        "med AS (SELECT o_orderpriority, round(median(CAST(e AS DOUBLE)), 1) AS orderdate_median_us "
        "  FROM t GROUP BY 1), "
        "mode_ AS (SELECT o_orderpriority, e AS orderdate_mode_us FROM ("
        "  SELECT o_orderpriority, e, row_number() OVER (PARTITION BY o_orderpriority "
        "    ORDER BY count(*) DESC, e ASC) AS rn FROM t GROUP BY 1, 2) WHERE rn = 1) "
        "SELECT med.o_orderpriority, orderdate_median_us, orderdate_mode_us "
        "FROM med JOIN mode_ USING (o_orderpriority)"
    ),
)
def q_agg_date_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date median/mode (aggregator/date.go — median over epoch values,
    mode smallest-tie). Exposed as epoch-µs values so even-N interpolated
    medians compare exactly across engines."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    df = _load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("e"),
    )
    med = df.groupBy("o_orderpriority").agg(
        F.round(F.percentile(F.col("e").cast("double"), F.lit(0.5)), 1).alias("orderdate_median_us")
    )
    freq = df.groupBy("o_orderpriority", "e").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("_c").desc(), F.col("e").asc())
    mode = (
        freq.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
        .select("o_orderpriority", F.col("e").alias("orderdate_mode_us"))
    )
    return med.join(mode, "o_orderpriority")


@register(
    "sort_multikey_supplier",
    oracle=(
        "SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name "
        "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "ORDER BY n.n_name ASC, s.s_acctbal DESC, s.s_suppkey ASC"
    ),
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort across a resolved reference (sort.go multi-key +
    ResolveReferences), deterministic tie-break."""
    from pyspark.sql import functions as F

    s = _load(spark, sf_dir, "supplier")
    n = F.broadcast(_load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        .orderBy(F.col("n_name").asc(), F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    )


@register(
    "agg_region_nation_rollup",
    oracle=(
        "SELECT r.r_name, CAST(count(DISTINCT n.n_nationkey) AS BIGINT) AS n_nations, "
        "CAST(count(c.c_custkey) AS BIGINT) AS n_customers, "
        "CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal "
        "FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey "
        "LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey "
        "GROUP BY r.r_name ORDER BY r.r_name"
    ),
)
def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-level reference rollup (region <- nation <- customer) with
    distinct counts and decimal-exact sums; both dims broadcast."""
    from pyspark.sql import functions as F

    r = F.broadcast(_load(spark, sf_dir, "region"))
    n = F.broadcast(_load(spark, sf_dir, "nation"))
    c = _load(spark, sf_dir, "customer")
    return (
        r.join(n, n["n_regionkey"] == r["r_regionkey"])
        .join(c, c["c_nationkey"] == n["n_nationkey"], "left")
        .groupBy("r_name")
        .agg(
            F.countDistinct("n_nationkey").alias("n_nations"),
            F.count("c_custkey").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# End-to-end training-data curation pipeline (composition showcase):
# quality gate -> language filter -> near-dup removal (keep smallest id
# of each dup pair) -> per-source token budget report.

_CURATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, text, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}]+') AS tt FROM documents
),
feat AS (
  SELECT doc_id, source, tt, len(tt) AS n_tokens,
    CASE WHEN length(text) > 0 THEN
      round(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 6)
    ELSE 0.0 END AS punct_ratio,
    CASE WHEN len(tt) > 0 THEN
      round(CAST(list_sum(list_transform(tt, t -> length(t))) AS DOUBLE) / len(tt), 6)
    ELSE 0.0 END AS mean_token_len
  FROM toks
),
quality AS (
  SELECT doc_id, source, n_tokens,
    round(0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        + 0.3 * (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 8.0 THEN 1.0 ELSE 0.5 END)
        + 0.3 * (1.0 - least(punct_ratio * 5, 1.0)), 6) AS q
  FROM feat
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id AS _doc, array_to_string(list_slice(tt, i, i + 2), ' ') AS _shingle
  FROM toks, LATERAL unnest(range(1, greatest(len(tt) - 2, 0) + 1)) AS u(i)
  WHERE len(tt) >= 3
),
km AS (
  SELECT _doc,
    ('0x' || substr(md5(_shingle), 1, 14))::BIGINT AS _h1,
    ('0x' || substr(md5(_shingle), 15, 14))::BIGINT AS _h2
  FROM sh
),
mh AS (
  SELECT _doc, i AS _i, min(_h1 + i * _h2) AS _minhash
  FROM km, LATERAL unnest(range(0, 16)) AS t(i) GROUP BY _doc, i
),
bands AS (
  SELECT _doc, CAST(_i // 4 AS INT) AS _band,
    md5(string_agg(CAST(_i AS VARCHAR) || ':' || CAST(_minhash AS VARCHAR), ',' ORDER BY _i)) AS _bucket
  FROM mh GROUP BY _doc, CAST(_i // 4 AS INT)
),
cand AS (
  SELECT a._doc AS _a, b._doc AS _b FROM bands a
  JOIN bands b ON a._band = b._band AND a._bucket = b._bucket AND a._doc < b._doc
  GROUP BY 1, 2
),
sizes AS (SELECT _doc, count(*) AS _sz FROM sh GROUP BY _doc),
dup_pairs AS (
  SELECT c._a, c._b FROM (
    SELECT c._a, c._b, count(*) AS _inter FROM cand c
    JOIN sh sa ON sa._doc = c._a JOIN sh sb ON sb._doc = c._b AND sb._shingle = sa._shingle
    GROUP BY c._a, c._b) c
  JOIN sizes sa ON sa._doc = c._a JOIN sizes sb ON sb._doc = c._b
  WHERE CAST(c._inter AS DOUBLE) / (sa._sz + sb._sz - c._inter) >= 0.35
),
drops AS (SELECT DISTINCT _b AS doc_id FROM dup_pairs),
kept AS (
  SELECT q.doc_id, q.source, q.n_tokens FROM quality q
  LEFT JOIN drops d ON d.doc_id = q.doc_id
  WHERE q.q >= 0.5 AND d.doc_id IS NULL
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM kept GROUP BY source
"""


@register("pipeline_corpus_curation", oracle=_CURATION_SQL)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation pipeline composed from engine operators: quality
    gate (>= 0.5) -> minhash near-dup removal (drop the larger id of
    each >= 0.35-Jaccard pair) -> per-source doc/token budget. Every
    stage is the same operator used standalone elsewhere; the oracle
    reproduces the whole pipeline in SQL."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.dedup import minhash_lsh_pairs
    from weaviate_spark.operators.textstats import quality_score, token_count

    docs = _load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("q"),
    )
    dups = minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
        jaccard_threshold=0.35, max_bucket_size=1_000_000,
        table_key=(sf_dir, "documents"),
    ).select(F.col("id_b").alias("doc_id")).distinct()
    kept = (
        scored.where(F.col("q") >= 0.5)
        .join(dups, "doc_id", "left_anti")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


from weaviate_spark.ids import uuid_sql as _uuid_sql


@register(
    "id_synthesis_cursor",
    oracle=(
        f"WITH ids AS (SELECT {_uuid_sql('customer', 'c_custkey')} AS _id, c_custkey, c_name "
        "FROM customer) "
        "SELECT _id, c_custkey, c_name FROM ids "
        "WHERE _id > '80000000' ORDER BY _id LIMIT 15"
    ),
)
def q_id_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reserved `_id` uuid synthesis parity (ids.py): the md5-derived
    uuid is byte-identical across engines, so keyset cursors and beacon
    ids are oracle-checkable."""
    from pyspark.sql import functions as F
    from weaviate_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "customer", with_id=True)
    return (
        df.where(F.col("_id") > "80000000")
        .orderBy("_id").limit(15)
        .select("_id", "c_custkey", "c_name")
    )


def _neartext_pipeline_oracle() -> str:
    from weaviate_spark.modules import near_text_vector

    qv = near_text_vector(["spark filter join"], dim=16)
    qv_sql = "[" + ", ".join(repr(float(x)) for x in qv) + "]::DOUBLE[]"
    return (
        "WITH e AS (SELECT doc_id, text, "
        + _hash_embed_sql("text") + " AS ev FROM documents), "
        f"q AS (SELECT {qv_sql} AS qv), "
        "topk AS (SELECT doc_id, text, round(1 - list_dot_product(ev, qv) / "
        "(sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS _distance "
        "FROM e CROSS JOIN q ORDER BY _distance ASC, doc_id ASC LIMIT 10) "
        "SELECT doc_id, _distance, "
        "len(list_intersect(list_distinct(regexp_split_to_array(lower(text), '\\s+')), "
        "['spark', 'filter', 'join'])) / 3.0 AS _rerank_score, "
        "substr('Summarize: ' || text, 1, 40) AS _generated_head "
        "FROM topk"
    )


@register("neartext_rerank_generate", oracle=None)  # set below (needs helpers)
def q_neartext_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Module pipeline (SURVEY §2.10): vectorize at ingest
    (text2vec-dummy) -> nearText top-10 -> reranker-dummy re-order ->
    generative-dummy per-result prompt. Every stage is deterministic and
    reproduced in the DuckDB oracle (md5 embedding, token-overlap
    rerank, template fill) — the full module pipeline is hash-checked."""
    from pyspark.sql import functions as F
    from weaviate_spark.functions.distance import distance
    from weaviate_spark.modules import GENERATIVES, RERANKERS, near_text_vector, vectorize_column

    docs = _load(spark, sf_dir, "documents").withColumn(
        "_vector", vectorize_column(F.col("text"), dim=16)
    )
    qv = near_text_vector(["spark filter join"], dim=16)
    q = lit_double_array(qv)
    topk = (
        docs.withColumn("_distance", F.round(distance(F.col("_vector"), q), 6))
        .orderBy(F.col("_distance").asc(), F.col("doc_id").asc())
        .limit(10)
    )
    # exchange barrier between the fetch and the module UDF stages: the
    # optimizer otherwise pushes the reranker/generative ArrowEvalPython
    # BELOW the limit's single-partition exchange, paying a Python
    # worker round per upstream partition for <=10 surviving rows
    # (measured 3.4 -> 1.3 s at sf0.1); after repartition(1) the tail is
    # one tiny task over the 10 fetched rows — the reference shape
    # (rerank the fetched window). Deterministic: the (distance, doc_id)
    # sort is a total order, so the top-10 set and all outputs are
    # unchanged.
    topk = topk.repartition(1)
    reranked = topk.withColumn(
        "_rerank_score", RERANKERS["reranker-dummy"]("spark filter join")(F.col("text"))
    )
    generated = reranked.withColumn(
        "_generated", GENERATIVES["generative-dummy"]("Summarize: {text}")(F.col("text"))
    )
    return (
        generated.orderBy(F.col("_rerank_score").desc(), F.col("doc_id").asc())
        .select("doc_id", "_distance", "_rerank_score",
                F.substring("_generated", 1, 40).alias("_generated_head"))
    )


ORACLES["neartext_rerank_generate"] = _neartext_pipeline_oracle()


@register(
    "filter_array_contains_all",
    oracle=(
        "WITH o AS (SELECT l_orderkey, list_sort(list_distinct(list(l_returnflag))) AS flags, "
        "CAST(count(*) AS BIGINT) AS n_lines "
        "FROM lineitem GROUP BY l_orderkey) "
        "SELECT l_orderkey, array_to_string(flags, ',') AS flags_csv, n_lines FROM o "
        "WHERE list_has_all(flags, ['A', 'N']) ORDER BY l_orderkey"
    ),
)
def q_array_contains_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ContainsAll on a derived array property (FIXTURES §B: per-order
    array_agg of distinct return flags) — orders whose lineitems carry
    BOTH 'A' and 'N' flags. Array emitted as csv for cross-engine
    hashing."""
    from pyspark.sql import functions as F
    from weaviate_spark.filters import Clause, apply_where

    orders = (
        _load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sort_array(F.collect_set("l_returnflag")).alias("flags"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    out = apply_where(orders, Clause(operator="ContainsAll", path=["flags"], value=["A", "N"]))
    return out.select(
        "l_orderkey", F.concat_ws(",", "flags").alias("flags_csv"), "n_lines"
    ).orderBy("l_orderkey")


@register(
    "agg_top_occurrences_grouped",
    oracle=(
        "WITH freq AS (SELECT n_regionkey, c_mktsegment, count(*) AS occurs "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_regionkey, c_mktsegment), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY n_regionkey "
        "ORDER BY occurs DESC, c_mktsegment ASC) AS rn FROM freq) "
        "SELECT n_regionkey, c_mktsegment AS value, CAST(occurs AS BIGINT) AS occurs "
        "FROM ranked WHERE rn <= 2"
    ),
)
def q_top_occurrences_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped topOccurrences (aggregator/text.go under groupBy): top-2
    market segments per region, ties -> smallest value."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cust = _load(spark, sf_dir, "customer")
    nation = F.broadcast(_load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey"))
    joined = cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"])
    freq = joined.groupBy("n_regionkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("occurs")
    )
    w = Window.partitionBy("n_regionkey").orderBy(
        F.col("occurs").desc(), F.col("c_mktsegment").asc()
    )
    return (
        freq.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 2)
        .select("n_regionkey", F.col("c_mktsegment").alias("value"), "occurs")
    )


@register(
    "agg_array_elements",
    oracle=(
        # array-element aggregation semantics (AggArray fixture §A2):
        # element count = total elements across arrays; numeric aggs over
        # the exploded elements
        "WITH o AS (SELECT o_orderkey, o_orderpriority, list(l_quantity) AS qtys "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        "GROUP BY o_orderkey, o_orderpriority) "
        "SELECT o_orderpriority, "
        "CAST(sum(len(qtys)) AS BIGINT) AS qtys_count, "
        "sum(list_sum(qtys)) AS qtys_sum, "
        "min(list_min(qtys)) AS qtys_minimum, "
        "max(list_max(qtys)) AS qtys_maximum "
        "FROM o GROUP BY o_orderpriority"
    ),
)
def q_agg_array_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregations over array-typed properties (number[] semantics:
    count = total elements, numeric aggs over elements). Arrays derived
    per order from lineitem quantities."""
    from pyspark.sql import functions as F

    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    arrays = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.collect_list("l_quantity").alias("qtys"))
    )
    return arrays.groupBy("o_orderpriority").agg(
        F.sum(F.size("qtys")).alias("qtys_count"),
        F.sum(F.aggregate("qtys", F.lit(0.0), lambda a, x: a + x)).alias("qtys_sum"),
        F.min(F.array_min("qtys")).alias("qtys_minimum"),
        F.max(F.array_max("qtys")).alias("qtys_maximum"),
    )


# ---------------------------------------------------------------------------
# M13 — Unicode tokenization + ASCII folding + stopwords (round 2;
# tokenizer.go:279-430, ascii_fold.go, stopwords/presets.go)

_UNICODE_TEXT2_SQL = (
    "SELECT doc_id, '数据 处理 日本語 ' || "
    "replace(replace(text, 'data', 'dätä'), 'model', 'modèle') AS text2 "
    "FROM documents"
)


def _unicode_text2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a derived accented+CJK text column (the testdata is
    all-ASCII, so the fixture derives non-ASCII deterministically on both
    engines: same replaces, same prefix)."""
    from pyspark.sql import functions as F

    return _load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("数据 处理 日本語 "),
            F.replace(
                F.replace(F.col("text"), F.lit("data"), F.lit("dätä")),
                F.lit("model"), F.lit("modèle"),
            ),
        ).alias("text2"),
    )


from weaviate_spark.functions.text import sql_tokens as _sql_tokens


@register(
    "text_unicode_tokens",
    oracle=(
        f"WITH d AS ({_UNICODE_TEXT2_SQL}), "
        "t AS (SELECT doc_id, "
        + _sql_tokens("text2", "word", fold=True)
        + " AS tt FROM d) "
        "SELECT doc_id, CAST(len(tt) AS BIGINT) AS n_tokens, "
        "CAST(len(list_distinct(tt)) AS BIGINT) AS n_unique, "
        "tt[1] AS first_token, tt[4] AS fourth_token "
        "FROM t ORDER BY doc_id"
    ),
)
def q_text_unicode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode `word` tokenization + ASCII folding over accented+CJK text
    (tokenizer.go:385-392 unicode letter/digit runs; ascii_fold.go
    FoldASCII): CJK runs survive as tokens, accents fold to ASCII —
    hash-compared against the duckdb mirror of the same pipeline."""
    from pyspark.sql import functions as F

    from weaviate_spark.functions.text import tokenize

    d = _unicode_text2(spark, sf_dir)
    toks = tokenize(F.col("text2"), "word", fold=True)
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
            F.element_at(toks, 1).alias("first_token"),
            F.element_at(toks, 4).alias("fourth_token"),
        )
        .orderBy("doc_id")
    )


def _bm25_unicode_oracle() -> str:
    from weaviate_spark.operators.bm25 import bm25_oracle_sql

    return bm25_oracle_sql(
        f"({_UNICODE_TEXT2_SQL})", "text2", "doc_id", "the dätä modèle",
        limit=25, fold=True,
    )


@register("bm25_unicode_fold", oracle=_bm25_unicode_oracle())
def q_bm25_unicode_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with query analysis = fold → tokenize → drop stopwords
    (analyze.go:216-242): query 'the dätä modèle' folds to [data, modele]
    ('the' is an en-preset stopword), matching the folded corpus tokens
    of the accented fixture column. Collection-wide N (bm25_searcher.go:
    235-239)."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, bm25_score_df

    d = _unicode_text2(spark, sf_dir)
    spec = BM25Spec(
        collection="documents", query="the dätä modèle",
        properties=[BM25Prop("text2")], id_col="doc_id", limit=25, fold=True,
    )
    return (
        bm25_score_df(d, spec)
        .orderBy(F.col("_score").desc(), F.col("doc_id").asc())
        .limit(25)
    )


@register(
    "filter_tokenized_like",
    oracle=(
        "SELECT doc_id FROM documents "
        "WHERE len(list_filter(regexp_extract_all(lower(text), "
        "'[\\p{L}\\p{N}]+'), t -> starts_with(t, 'filt'))) > 0 "
        "ORDER BY doc_id"
    ),
)
def q_filter_tokenized_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization-aware Like (row_reader.go:152-190): the pattern runs
    against inverted-index keys, so Like 'filt*' matches any doc with a
    token starting 'filt' — not just fields that start with it."""
    from weaviate_spark.filters import Clause, apply_where

    return (
        apply_where(
            _load(spark, sf_dir, "documents"),
            Clause(operator="Like", path=["text"], value="filt*", tokenization="word"),
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "tenant_scoped_read",
    oracle=(
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey"
    ),
)
def q_tenant_scoped_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-tenancy (usecases/multitenancy/, search.go:103-108): tenant =
    partition column. The collection is written partitionBy(_tenant); a
    tenant-scoped query reads exactly one partition directory (the Spark
    analogue of single-shard tenant routing — PartitionFilters in the
    scan, asserted by test_tenant_partition_pruning). Scale: adding a
    tenant appends one directory; per-tenant reads/overwrites never touch
    other tenants' files, so cost tracks the tenant, not the collection."""
    import hashlib
    import os
    import tempfile

    from pyspark.sql import functions as F

    from weaviate_spark.sources.crud import read_tenant, write_tenant_partitioned

    cust = _load(spark, sf_dir, "customer").withColumn(
        "_tenant", F.col("c_mktsegment")
    )
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    tdir = os.path.join(tempfile.gettempdir(), f"weaviate_spark_tenant_{key}")
    if not os.path.exists(os.path.join(tdir, "_SUCCESS")):
        write_tenant_partitioned(cust, tdir, "_tenant")
    return (
        read_tenant(spark, tdir, "_tenant", "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# BQ (binary quantization) flat-index search with exact rescore

from weaviate_spark.operators.quantization import bq_encode_py as _bq_encode_py

_BQ_QW = _bq_encode_py(QVEC)
_BQ_WORD_SQL = (
    "CAST(list_sum(list_transform(generate_series(0,31), j -> "
    "CASE WHEN embedding[j+{lo}+1] > 0 THEN CAST(CAST(1 AS BIGINT) << j AS BIGINT) "
    "ELSE 0 END)) AS BIGINT)"
)


def _pq_oracle_sql(k: int = 10, overfetch: int = 4) -> str:
    """DuckDB mirror of q_knn_pq_rescore: identical 6dp codebook
    literals, identical assignment arithmetic (-2*dot(sub, c) + |c|^2,
    first-occurrence argmin), identical rounded ADC lookup literals."""
    import numpy as np

    from weaviate_spark.operators.pq_codebook import CODEBOOK, SEG_DIM
    from weaviate_spark.operators.quantization import pq_lut_py

    def dlist(vals):
        return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"

    seg_codes = []
    for s, C in enumerate(CODEBOOK):
        lo, hi = s * SEG_DIM + 1, (s + 1) * SEG_DIM
        scores = ", ".join(
            f"-2 * list_dot_product(nv[{lo}:{hi}], {dlist(c)}) + "
            f"{float(np.dot(c, c))!r}"
            for c in C
        )
        seg_codes.append(
            f"list_position(d{s}, list_min(d{s})) - 1"
        )
        seg_codes[-1] = (s, f"[{scores}]", seg_codes[-1])
    lut = pq_lut_py(QVEC, CODEBOOK)
    darr_cols = ", ".join(f"{arr} AS d{s}" for s, arr, _ in seg_codes)
    code_list = ", ".join(expr for _, _, expr in seg_codes)
    adc = " + ".join(
        f"({dlist(lut[s])})[pq[{s + 1}] + 1]" for s in range(len(lut))
    )
    return (
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        # cosine collections store normalized vectors (hnsw ingest);
        # codes come from the unit-sphere projection, rescore from ev
        "en AS (SELECT vec_id, ev, "
        "list_transform(ev, x -> x / sqrt(list_dot_product(ev, ev))) AS nv FROM e), "
        f"dists AS (SELECT vec_id, ev, {darr_cols} FROM en), "
        f"codes AS (SELECT vec_id, ev, [{code_list}] AS pq FROM dists), "
        f"cand AS (SELECT vec_id, ev, {adc} AS _adc FROM codes "
        f"ORDER BY _adc ASC, vec_id ASC LIMIT {overfetch * k}) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        f"FROM cand CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT {k}"
    )


@register("knn_pq_rescore", oracle=_pq_oracle_sql())
def q_knn_pq_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search (compressionhelpers/product_quantization.go): 8
    segments x 16 k-means centroids (codebook trained offline and
    persisted, the pq_data.go restore path — tools/train_pq.py), ADC
    overfetch of 4*k candidates via the precomputed lookup table
    (DistanceLookUpTable semantics: 8 array lookups per row, no float
    math on the scan), exact cosine rescore of only the candidates.
    Deterministic: shared 6dp codebook/LUT literals, ties by id."""
    from weaviate_spark.operators.quantization import pq_topk

    return pq_topk(
        spark, sf_dir, "embeddings", QVEC, id_col="vec_id",
        k=10, overfetch=4, table_key=(sf_dir, "embeddings"),
    )


def _rq_oracle_sql(k: int = 10, overfetch: int = 4) -> str:
    """DuckDB mirror of q_knn_rq_rescore: identical 6dp rotation-matrix
    literals, identical per-vector 8-bit code arithmetic (floor(x+0.5),
    clamp), identical estimated-dot candidate selection."""
    import numpy as np

    from weaviate_spark.operators.quantization import (
        rq_rotate_py, rq_rotation_matrix,
    )

    M = rq_rotation_matrix(64)
    qr = rq_rotate_py(QVEC, M, normalize=True)

    def dlist(vals):
        return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"

    rot_rows = ", ".join(
        f"list_dot_product({dlist(r)}, nv)" for r in M
    )
    return (
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        "en AS (SELECT vec_id, ev, "
        "list_transform(ev, x -> x / sqrt(list_dot_product(ev, ev))) AS nv FROM e), "
        f"rot AS (SELECT vec_id, ev, [{rot_rows}] AS rx FROM en), "
        "b AS (SELECT vec_id, ev, rx, list_min(rx) AS lo, "
        "(list_max(rx) - list_min(rx)) / 255.0 AS st FROM rot), "
        "codes AS (SELECT vec_id, ev, lo, st, "
        "list_transform(rx, v -> CAST(least(greatest(floor((v - lo) / st + 0.5), 0), 255) AS DOUBLE)) AS c "
        "FROM b WHERE st > 0), "
        "cand AS (SELECT vec_id, ev, "
        f"round(1 - (lo * {float(qr.sum())!r} + st * list_dot_product({dlist(qr)}, c)), 6) AS _est "
        f"FROM codes ORDER BY _est ASC, vec_id ASC LIMIT {overfetch * k}) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        f"FROM cand CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT {k}"
    )


def _ivf_oracle_sql(k: int = 10, nprobe: int = 3) -> str:
    """DuckDB mirror of q_ann_ivf_topk: identical 6dp centroid literals
    and assignment arithmetic (the 1-segment PQ argmin), probed cells
    precomputed from the same query LUT."""
    import numpy as np

    from weaviate_spark.operators.pq_codebook import IVF_CENTROIDS
    from weaviate_spark.operators.quantization import pq_lut_py

    def dlist(vals):
        return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"

    scores = ", ".join(
        f"-2 * list_dot_product(nv, {dlist(c)}) + {float(np.dot(c, c))!r}"
        for c in IVF_CENTROIDS
    )
    lut = pq_lut_py(QVEC, [IVF_CENTROIDS])[0]
    cells = sorted(range(len(lut)), key=lambda c: (lut[c], c))[:nprobe]
    in_list = ", ".join(str(c) for c in cells)
    return (
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        "en AS (SELECT vec_id, ev, "
        "list_transform(ev, x -> x / sqrt(list_dot_product(ev, ev))) AS nv FROM e), "
        f"assign AS (SELECT vec_id, ev, [{scores}] AS d FROM en), "
        "cells AS (SELECT vec_id, ev, list_position(d, list_min(d)) - 1 AS _cell FROM assign) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        f"FROM cells CROSS JOIN q WHERE _cell IN ({in_list}) "
        f"ORDER BY _distance ASC, vec_id ASC LIMIT {k}"
    )


@register("ann_ivf_topk", oracle=_ivf_oracle_sql())
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search with persisted coarse centroids (the MLlib-free,
    oracle-checkable variant: centroids are an offline-trained artifact
    like the PQ codebook): probe the 3 nearest of 16 cells, exact cosine
    rescore of only their members. The approximation itself is
    hash-checked — assignment, probe set, and rescore all mirror in
    SQL."""
    from weaviate_spark.operators.similarity import ivf_literal_topk

    return ivf_literal_topk(
        spark, sf_dir, "embeddings", QVEC, id_col="vec_id",
        k=10, nprobe=3, table_key=(sf_dir, "embeddings", "ivf"),
    )


@register("knn_rq_rescore", oracle=_rq_oracle_sql())
def q_knn_rq_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RQ search (rotational_quantization.go, fast_rotation.go): seeded
    signed-permutation + Walsh-Hadamard rotation folded into one
    persisted 6dp matrix (the RestoreFastRotation artifact), per-VECTOR
    8-bit codes with own lower/step bounds, estimated-dot candidate
    selection (RQDistancer closed form), exact cosine rescore of 4*k
    candidates. Deterministic: shared rotation/query literals, ties by
    id."""
    from weaviate_spark.operators.quantization import rq_topk

    return rq_topk(
        spark, sf_dir, "embeddings", QVEC, id_col="vec_id",
        k=10, overfetch=4, table_key=(sf_dir, "embeddings"),
    )


@register(
    "knn_bq_rescore",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "enc AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev, "
        f"{_BQ_WORD_SQL.format(lo=0)} AS bq0, {_BQ_WORD_SQL.format(lo=32)} AS bq1 "
        "FROM embeddings), "
        "cand AS (SELECT vec_id, ev, "
        f"bit_count(xor(bq0, CAST({_BQ_QW[0]} AS BIGINT))) + "
        f"bit_count(xor(bq1, CAST({_BQ_QW[1]} AS BIGINT))) AS _hamming "
        "FROM enc ORDER BY _hamming ASC, vec_id ASC LIMIT 40) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        "FROM cand CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 10"
    ),
)
def q_knn_bq_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-index BQ search (flat/index.go:60-131): sign-bit signatures
    packed 32 dims/word, hamming-distance overfetch of 4*k candidates
    (codegen'd integer xor/popcount per row — no float math on the scan),
    exact cosine rescore of only the candidates. Deterministic: both
    stages break ties by id, so the candidate SET is value-checkable."""
    from weaviate_spark.operators.quantization import bq_topk

    return bq_topk(
        spark, sf_dir, "embeddings", QVEC, id_col="vec_id",
        k=10, overfetch=4, table_key=(sf_dir, "embeddings"),
    )


from weaviate_spark.operators.quantization import sq_encode_py as _sq_encode_py

_SQ_QC = _sq_encode_py(QVEC, -1.0, 1.0)
_SQ_QC_SQL = "[" + ", ".join(str(c) for c in _SQ_QC) + "]::BIGINT[]"


@register(
    "knn_sq_rescore",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv, {_SQ_QC_SQL} AS qc), "
        "enc AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings), "
        "codes AS (SELECT vec_id, ev, list_transform(ev, x -> "
        "LEAST(GREATEST(CAST(floor((x - (-1.0)) / 2.0 * 255 + 0.5) AS BIGINT), 0), 255)"
        ") AS cd FROM enc), "
        "cand AS (SELECT vec_id, ev, list_sum(list_transform(list_zip(cd, qc), "
        "s -> (s[1] - s[2]) * (s[1] - s[2]))) AS _cdist "
        "FROM codes CROSS JOIN q ORDER BY _cdist ASC, vec_id ASC LIMIT 40) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        "FROM cand CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 10"
    ),
)
def q_knn_sq_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-index SQ search (compressionhelpers/scalar_quantizer.go):
    int8 codes against fixed [-1, 1] bounds packed 4/word in the written
    ingest artifact, squared-L2 code-distance overfetch of 4*k
    candidates (integer shift/mask codegen on a 4x-compressed scan),
    exact cosine rescore of only the candidates. Unlike BQ's sign bits
    the code distance preserves magnitude — the recall-safe compressed
    route. Oracle mirrors the unpacked code semantics (pack/unpack is
    identity on the distance). Deterministic: ties by id both stages."""
    from weaviate_spark.operators.quantization import sq_topk

    return sq_topk(
        spark, sf_dir, "embeddings", QVEC, id_col="vec_id",
        k=10, overfetch=4, table_key=(sf_dir, "embeddings"),
    )


@register(
    "knn_cosine_topk_quantized",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "enc AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev, "
        f"{_BQ_WORD_SQL.format(lo=0)} AS bq0, {_BQ_WORD_SQL.format(lo=32)} AS bq1 "
        "FROM embeddings), "
        "cand AS (SELECT vec_id, ev, "
        f"bit_count(xor(bq0, CAST({_BQ_QW[0]} AS BIGINT))) + "
        f"bit_count(xor(bq1, CAST({_BQ_QW[1]} AS BIGINT))) AS _hamming "
        "FROM enc ORDER BY _hamming ASC, vec_id ASC LIMIT 40) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        "FROM cand CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 10"
    ),
)
def q_knn_cosine_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB default nearVector plan, reached through the public
    near_vector API: above NearVectorSpec.quantize_threshold rows an
    unfiltered cosine top-k automatically routes through the BQ
    compressed scan + exact rescore (vector.py routing; forced here
    with quantize=\"bq\" so the driver-scale corpus takes the same
    plan). Oracle mirrors the deterministic hamming-overfetch candidate
    set, like knn_bq_rescore; plan proof in tests/test_vector.py.
    quantize_overfetch=4 is explicit: BQ's measured recall trade at
    this overfetch is accepted here, which keeps the run warning-clean."""
    out = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=10, quantize="bq",
        quantize_overfetch=4,
    ))
    return out.select("vec_id", "_distance")


# ---------------------------------------------------------------------------
# M13 — serialized query front-end (SURVEY §3.1 lifecycle)

@register(
    "graphql_get_parsed",
    oracle=(
        "SELECT s_suppkey, s_name, s_acctbal FROM supplier "
        "WHERE s_acctbal > 1000 AND s_name LIKE '%9' "
        "ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 12 OFFSET 3"
    ),
)
def q_graphql_get_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PRIMARY query surface: a GraphQL Get document
    (adapters/handlers/graphql/local/get/get.go resolver shape) ->
    parse_graphql -> the same GetSpec the JSON/gRPC front-end produces
    -> compile_get. Exercises the where-object form (operator enums as
    bare GraphQL names, value* keys, nested operands), sort objects
    with order enums, offset pagination, and the selection-set
    projection."""
    from weaviate_spark.plans import compile_get, parse_graphql

    spec = parse_graphql(
        """
        {
          Get {
            supplier(
              where: {operator: And, operands: [
                {path: ["s_acctbal"], operator: GreaterThan, valueNumber: 1000}
                {path: ["s_name"], operator: Like, valueText: "*9"}
              ]}
              sort: [{path: ["s_acctbal"], order: desc},
                     {path: ["s_suppkey"], order: asc}]
              limit: 12, offset: 3
            ) {
              s_suppkey s_name s_acctbal
            }
          }
        }
        """
    )
    return compile_get(spark, sf_dir, spec)


@register(
    "graphql_aggregate_parsed",
    oracle=(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS meta_count, "
        "round(avg(o_totalprice), 6) AS o_totalprice_mean, "
        "min(o_totalprice) AS o_totalprice_minimum, "
        "max(o_totalprice) AS o_totalprice_maximum "
        "FROM orders WHERE o_orderdate >= DATE '1996-01-01' "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
)
def q_graphql_aggregate_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphQL Aggregate document (graphql/local/aggregate resolver
    shape: groupBy arg, meta{count}, per-property aggregator
    selections) -> parse_graphql -> AggregateSpec -> the shared
    aggregate() operator."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.aggregate import aggregate
    from weaviate_spark.plans import parse_graphql

    spec = parse_graphql(
        """
        {
          Aggregate {
            orders(
              groupBy: {path: ["o_orderpriority"]}
              where: {path: ["o_orderdate"], operator: GreaterThanEqual,
                      valueDate: "1996-01-01T00:00:00Z"}
            ) {
              meta { count }
              groupedBy { value }
              o_totalprice { mean minimum maximum }
            }
          }
        }
        """
    )
    out = aggregate(spark, sf_dir, spec)
    return out.select(
        "o_orderpriority",
        F.col("meta_count").cast("long").alias("meta_count"),
        F.round("o_totalprice_mean", 6).alias("o_totalprice_mean"),
        "o_totalprice_minimum",
        "o_totalprice_maximum",
    ).orderBy("o_orderpriority")


@register(
    "json_query_parsed",
    oracle=(
        "SELECT p_partkey, p_name, p_retailprice, p_size FROM part "
        "WHERE p_type LIKE 'PROMO%' AND p_size >= 10 "
        "ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 15 OFFSET 5"
    ),
)
def q_json_query_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full serialized-query lifecycle: a SearchRequest-shaped JSON
    document (gRPC field names, grpc/proto/v1/search_get.proto:14-52)
    -> parse_query -> GetSpec -> compile_get. Exercises the Filters
    message oneof (value_text / value_int), the target.property path
    form, the proto operator enum, SortBy{ascending, path}, offset
    pagination, and the properties projection — proving parsed and
    hand-built specs compile to the same Catalyst plan (Like-prefix
    still pushes down as StartsWith)."""
    from weaviate_spark.plans import compile_get, parse_query

    spec = parse_query(
        """
        {
          "collection": "part",
          "filters": {
            "operator": "OPERATOR_AND",
            "filters": [
              {"operator": "OPERATOR_LIKE",
               "target": {"property": "p_type"}, "value_text": "PROMO*"},
              {"operator": "OPERATOR_GREATER_THAN_EQUAL",
               "path": ["p_size"], "value_int": 10}
            ]
          },
          "sort_by": [
            {"ascending": false, "path": ["p_retailprice"]},
            {"ascending": true, "path": ["p_partkey"]}
          ],
          "offset": 5,
          "limit": 15,
          "properties": {"non_ref_properties":
            ["p_partkey", "p_name", "p_retailprice", "p_size"]}
        }
        """
    )
    return compile_get(spark, sf_dir, spec)


# ---------------------------------------------------------------------------
# Result annotator module families (modules.py QNAS/SUMMARIZERS/NERS/
# SPELLCHECKERS — reference modules/ listing: qna-*, sum-*,
# ner-transformers, text-spellcheck). Shared deterministic base window:
# the 50 lowest-id English documents.

_ANNOTATE_BASE_SQL = (
    "base AS (SELECT doc_id, text FROM documents WHERE lang = 'en' "
    "ORDER BY doc_id LIMIT 50), "
    "tk AS (SELECT doc_id, regexp_extract_all(lower(text), "
    "'[\\p{L}\\p{N}]+') AS tt FROM base)"
)


def _annotate_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        _load(spark, sf_dir, "documents")
        .where(F.col("lang") == "en")
        .orderBy("doc_id")
        .limit(50)
    )


@register(
    "qna_extractive_answer",
    oracle=(
        "WITH " + _ANNOTATE_BASE_SQL + ", "
        "ch AS (SELECT doc_id, len(tt) AS n, "
        "list_sort(list_transform(range(0, greatest(ceil(len(tt)/10.0)::INT, 1)), "
        "i -> {'_neg': -len(list_intersect(tt[i*10+1:i*10+10], "
        "['join','performance','query','spark'])), "
        "'_idx': i::INT, "
        "'_ans': coalesce(array_to_string(tt[i*10+1:i*10+10], ' '), '')}))[1] AS b "
        "FROM tk) "
        "SELECT doc_id, b._ans AS answer, (-b._neg) > 0 AS has_answer, "
        "round((-b._neg)::DOUBLE / 4.0, 6) AS certainty, "
        "b._idx * 10 AS start_token, least(b._idx * 10 + 10, n) AS end_token "
        "FROM ch"
    ),
)
def q_qna_extractive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qna-dummy module (modules/qna-transformers additional-prop shape):
    extractive answer = the 10-token window with the highest distinct
    question-token overlap, earliest window on ties."""
    from pyspark.sql import functions as F
    from weaviate_spark.modules import QNAS

    base = _annotate_base(spark, sf_dir)
    ans = QNAS["qna-dummy"](F.col("text"), "spark join query performance")
    return base.withColumn("_a", ans).select(
        "doc_id",
        F.col("_a.answer").alias("answer"),
        F.col("_a.has_answer").alias("has_answer"),
        F.col("_a.certainty").alias("certainty"),
        F.col("_a.start_token").alias("start_token"),
        F.col("_a.end_token").alias("end_token"),
    )


@register(
    "sum_top_tokens",
    oracle=(
        "WITH " + _ANNOTATE_BASE_SQL + " "
        "SELECT doc_id, array_to_string(list_transform("
        "list_sort(list_transform("
        "list_filter(list_distinct(tt), t -> t NOT IN ('a','the')), "
        "t -> {'_neg': -len(list_filter(tt, x -> x = t)), '_tok': t}))[1:5], "
        "s -> s._tok), ' ') AS summary, 'text' AS property FROM tk"
    ),
)
def q_sum_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum-dummy module (modules/sum-transformers summary{property,
    result} shape): extractive summary = top-5 most frequent
    non-stopword tokens, count-desc / token-asc."""
    from pyspark.sql import functions as F
    from weaviate_spark.modules import SUMMARIZERS

    base = _annotate_base(spark, sf_dir)
    return base.select(
        "doc_id",
        SUMMARIZERS["sum-dummy"](F.col("text")).alias("summary"),
        F.lit("text").alias("property"),
    )


@register(
    "ner_token_entities",
    oracle=(
        "WITH " + _ANNOTATE_BASE_SQL + ", "
        "h AS (SELECT doc_id, tt, unnest(list_filter(list_distinct(tt), "
        "t -> t IN ('spark','vector','stream','table','query','join'))) AS word "
        "FROM tk) "
        "SELECT doc_id, word, "
        "CASE word WHEN 'spark' THEN 'TECH' WHEN 'vector' THEN 'ML' "
        "WHEN 'stream' THEN 'INFRA' ELSE 'DB' END AS entity, "
        "0.9 AS certainty, list_position(tt, word) - 1 AS start_token FROM h"
    ),
)
def q_ner_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ner-dummy module (modules/ner-transformers tokens{entity, word,
    certainty, position} shape): gazetteer tagging, one row per distinct
    recognized token with its first-occurrence token index."""
    from weaviate_spark.modules import ner_dummy

    return ner_dummy(_annotate_base(spark, sf_dir), "doc_id", "text")


@register(
    "spellcheck_corrected_search",
    oracle=(
        "SELECT q.*, 'tabel qurey scann' AS original_text, "
        "'table query scan' AS did_you_mean, 3 AS changes FROM ("
        + bm25_oracle_sql("documents", "text", "doc_id",
                          "table query scan", limit=15)
        + ") q"
    ),
)
def q_spellcheck_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text-spellcheck module lifecycle (modules/text-spellcheck): the
    QUERY string is corrected against the dictionary before searching,
    and the spellCheck additional-properties ride along with the hits —
    the reference applies spellcheck to query input, then searches with
    the corrected text."""
    from pyspark.sql import functions as F
    from weaviate_spark.modules import SPELLCHECKERS

    sc = SPELLCHECKERS["text-spellcheck-dummy"]("tabel qurey scann")
    hits = bm25_search(spark, sf_dir, BM25Spec(
        collection="documents", query=sc["corrected_text"],
        properties=[BM25Prop("text")], id_col="doc_id", limit=15,
    ))
    return (
        hits.withColumn("original_text", F.lit(sc["original_text"]))
        .withColumn("did_you_mean", F.lit(sc["did_you_mean"]))
        .withColumn("changes", F.lit(sc["changes"]))
    )


@register(
    "video_avi_mjpeg_frames",
    oracle=(
        "WITH docs AS (SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents "
        "WHERE doc_id % 23 = 0), "
        "s AS (SELECT doc_id, nf, u.s AS frame_idx FROM docs, "
        "(SELECT unnest(generate_series(0, 3)) AS s) u "
        "WHERE u.s * 300 < nf * 200) "
        "SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx, "
        "CAST(frame_idx * 300 AS BIGINT) AS frame_ts_ms, "
        "CAST(2 * (8 + (doc_id + least(nf - 1, frame_idx * 300 // 200)) % 24) "
        "+ 128 AS BIGINT) AS gray FROM s ORDER BY media_id, frame_idx"
    ),
)
def q_video_avi_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MJPEG-AVI decode, end-to-end hash-checked like
    video_frame_luma: per doc an AVI wrapping 2-4 solid-gray JPEG frames
    (y_dc = 8 + (doc+frame) % 24, neutral chroma -> RGB == 2*y_dc+128
    exactly) is encoded executor-side with avi_from_jpegs, the RIFF walk
    + fps math of sample_frames picks each 300 ms sample's source frame,
    the '00dc' JPEG payload decodes through the in-repo JPEG codec, and
    the sampled PPM's pixel recovers the gray level the oracle computes
    analytically. Exercises container parse -> frame seek -> Huffman/IDCT
    decode -> resample in one hash. Scale: narrow Arrow-batched maps,
    no shuffle until the final sort."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.multimodal import (
        avi_from_jpegs,
        decode_image_array,
        sample_frames,
        solid_jpeg,
    )

    docs = (
        _load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 23 == 0)
        .select("doc_id")
    )

    def _make(it):
        import pandas as pd

        for pdf in it:
            clips = [
                avi_from_jpegs(
                    [solid_jpeg(8 + (int(d) + f) % 24, 0, 0)
                     for f in range(2 + int(d) % 3)],
                    16, 16, fps=(5, 1),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "media": clips})

    media = docs.mapInPandas(_make, "media_id long, media binary")
    frames = sample_frames(media, "media_id", "media", every_ms=300)

    def _gray(it):
        import pandas as pd

        for pdf in it:
            grays = [
                int(decode_image_array(bytes(b))[0, 0, 0]) for b in pdf["frame"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_idx": pdf["frame_idx"],
                "frame_ts_ms": pdf["frame_ts_ms"],
                "gray": grays,
            })

    return (
        frames.mapInPandas(
            _gray, "media_id long, frame_idx long, frame_ts_ms long, gray long"
        )
        .orderBy("media_id", "frame_idx")
    )


@register(
    "events_purchase_attribution",
    oracle=(
        "SELECT a.event_id AS purchase_id, b.event_id AS click_id, "
        "a.user_id, a.ts AS purchase_ts, "
        "CAST(date_diff('second', b.ts, a.ts) AS BIGINT) AS lag_sec "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND a.event_type = 'purchase' AND b.event_type = 'click' "
        "AND b.ts >= a.ts - INTERVAL 240 MINUTE AND b.ts <= a.ts"
    ),
)
def q_events_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (batch side of the unified model):
    purchases attributed to same-user clicks within the preceding 4 h.
    The streaming variant — both sides watermarked, state bounded by
    the time-range predicate — is equivalence-tested in
    tests/test_streaming_join.py."""
    from pyspark.sql import functions as F
    from weaviate_spark.streaming.ingest import purchase_attribution_join

    ev = _load(spark, sf_dir, "events")
    return purchase_attribution_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        window_minutes=240,
    )


@register(
    "text_bpe_token_counts",
    oracle=(
        "SELECT doc_id, "
        "CAST(len(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS INT) "
        "AS n_tokens_word, "
        "CAST(len(regexp_extract_all(text, "
        "$$'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+"
        "| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+$$, 0)) "
        "AS INT) AS n_tokens_bpe FROM documents"
    ),
)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways (BASELINE north star: 'whitespace + a
    BPE-ish regex'): word-run counts next to GPT-2-pretokenizer-shaped
    segment counts — the packing/budgeting unit of a training pipeline.
    Narrow projection, zero shuffles; the identical regex runs in both
    engines so the count is hash-exact."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.textstats import bpe_token_count, token_count

    df = _load(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens_word"),
        bpe_token_count(F.col("text")).alias("n_tokens_bpe"),
    )


_REPETITION_ORACLE = """
WITH lines AS (
  SELECT doc_id, trim(l) AS line FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
  WHERE trim(l) <> ''),
per_line AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line),
line_stats AS (
  SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct,
    sum(c * length(line)) AS chars,
    sum(CASE WHEN c > 1 THEN (c - 1) * length(line) ELSE 0 END) AS dup_chars
  FROM per_line GROUP BY doc_id),
words AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS w
          FROM documents),
idx AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM words WHERE len(w) >= 2),
grams AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g,
          length(w[i]) + length(w[i+1]) AS glen FROM idx),
per_gram AS (SELECT doc_id, g, count(*) AS c, first(glen) AS glen
             FROM grams GROUP BY doc_id, g),
top AS (SELECT doc_id, c * glen AS cover,
        row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
        FROM per_gram WHERE c >= 2),
wchars AS (SELECT doc_id,
           coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS wc
           FROM words),
prof AS (
  SELECT d.doc_id,
    round(CASE WHEN n_lines > 0
      THEN CAST(n_lines - n_distinct AS DOUBLE) / n_lines ELSE 0.0 END, 6)
      AS dup_line_frac,
    round(CASE WHEN chars > 0
      THEN CAST(dup_chars AS DOUBLE) / chars ELSE 0.0 END, 6)
      AS dup_line_char_frac,
    round(CASE WHEN wc > 0
      THEN CAST(coalesce(t.cover, 0) AS DOUBLE) / wc ELSE 0.0 END, 6)
      AS top_2gram_char_frac
  FROM documents d
  LEFT JOIN line_stats USING (doc_id)
  LEFT JOIN (SELECT doc_id, cover FROM top WHERE rn = 1) t USING (doc_id)
  LEFT JOIN wchars USING (doc_id))
SELECT doc_id, dup_line_frac, dup_line_char_frac, top_2gram_char_frac,
  (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
   AND top_2gram_char_frac <= 0.20) AS keep
FROM prof ORDER BY doc_id
"""


@register(
    "dedup_substring_pairs",
    oracle=(
        "WITH fps0 AS ("
        " SELECT DISTINCT doc_id, md5(substr(text, CAST(i AS INT), 40)) AS h"
        " FROM (SELECT doc_id, text,"
        "   unnest(range(1, greatest(length(text) - 40 + 2, 1))) AS i"
        "   FROM documents)"
        " WHERE substr(md5(substr(text, CAST(i AS INT), 40)), 1, 1) = '0'), "
        # mirror max_docs_per_fingerprint=100: window count over the
        # DISTINCT (doc, h) rows, fingerprints above the cap dropped
        "fps AS (SELECT doc_id, h FROM fps0 "
        "QUALIFY count(*) OVER (PARTITION BY h) <= 100) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(count(*) AS BIGINT) AS shared_fingerprints "
        "FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2"
    ),
)
def q_dedup_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-doc substring duplication (Lee et al. 2022, arXiv
    2107.06499): doc pairs sharing >= 2 sampled 40-char windows
    (Broder-style mod-p fingerprint selection, md5 hex prefix rule,
    identical in both engines). One equi-join shuffle on the
    fingerprint, guarded by max_docs_per_fingerprint=100 (a window
    held by more docs is corpus boilerplate — F^2 join rows, ~zero
    pairwise signal — and is dropped from pairing, oracle-mirrored);
    the fingerprint table persists as an ingest artifact at scale."""
    from weaviate_spark.operators.dedup import duplicated_substring_pairs

    df = _load(spark, sf_dir, "documents")
    return duplicated_substring_pairs(
        df, "doc_id", "text", k=40, select_hex=1, min_shared=2,
        max_docs_per_fingerprint=100,
    ).orderBy("id_a", "id_b")


@register(
    "curation_line_dedup",
    oracle=(
        "WITH d AS (SELECT doc_id, substr(text, 1, 80) || chr(10) || "
        "(CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter for updates' "
        "ELSE 'unique middle ' || doc_id END) || chr(10) || "
        "substr(text, 81, 120) AS t FROM documents), "
        "lines AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS line, "
        "generate_subscripts(string_split(t, chr(10)), 1) AS pos FROM d), "
        "counts AS (SELECT trim(line) AS k, count(*) AS n FROM lines "
        "WHERE trim(line) <> '' GROUP BY 1 HAVING count(*) >= 3), "
        "marked AS (SELECT l.doc_id, l.pos, l.line, "
        "(c.k IS NOT NULL AND trim(l.line) <> '') AS dropped "
        "FROM lines l LEFT JOIN counts c ON trim(l.line) = c.k) "
        "SELECT doc_id, "
        "coalesce(string_agg(CASE WHEN NOT dropped THEN line END, chr(10) "
        "ORDER BY pos), '') AS clean_text, "
        "CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_dropped "
        "FROM marked GROUP BY doc_id ORDER BY doc_id"
    ),
)
def q_curation_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level line dedup (arXiv 1910.10683 §2.2: drop any
    line occurring >= 3 times corpus-wide). The corpus synthesizes
    3-line docs column-side (every even doc carries the same boilerplate
    middle line -> dropped; odd docs carry unique middles -> kept), so
    the operator's cross-doc counting, per-doc ordered reassembly, and
    drop bookkeeping are all hash-checked."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import global_line_dedup

    docs = _load(spark, sf_dir, "documents")
    synth = F.concat(
        F.substring("text", 1, 80), F.lit("\n"),
        F.when(F.col("doc_id") % 2 == 0,
               F.lit("subscribe to our newsletter for updates"))
        .otherwise(F.concat(F.lit("unique middle "), F.col("doc_id").cast("string"))),
        F.lit("\n"),
        F.substring("text", 81, 120),
    )
    return global_line_dedup(
        docs.select("doc_id", synth.alias("t")), "doc_id", "t"
    ).orderBy("doc_id")
@register("text_repetition_filter", oracle=_REPETITION_ORACLE)
def q_text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-removal quality filters (Rae et al. 2021, arXiv
    2112.11446 §A1.1): duplicate-line fraction, duplicate-line char
    fraction, and top-2-gram char coverage per doc, with the published
    keep thresholds. Plan: two explode->groupBy pyramids (lines and word
    2-grams) joined per doc; every stage partial-aggregates map-side."""
    from weaviate_spark.operators.textstats import repetition_filter

    df = _load(spark, sf_dir, "documents")
    return repetition_filter(df, "doc_id", "text").orderBy("doc_id")


def _semantic_dedup_oracle_sql(eps: float = 0.55) -> str:
    """DuckDB mirror of q_semantic_dedup: identical centroid literals
    and assignment argmin (the ann_ivf_topk arithmetic), within-cluster
    pairs only, keep-lowest-id with min_by distance."""
    import numpy as np

    from weaviate_spark.operators.pq_codebook import IVF_CENTROIDS

    def dlist(vals):
        return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"

    scores = ", ".join(
        f"-2 * list_dot_product(nv, {dlist(c)}) + {float(np.dot(c, c))!r}"
        for c in IVF_CENTROIDS
    )
    return (
        "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        "en AS (SELECT vec_id, ev, "
        "list_transform(ev, x -> x / sqrt(list_dot_product(ev, ev))) AS nv FROM e), "
        f"assign AS (SELECT vec_id, ev, [{scores}] AS d FROM en), "
        "cells AS (SELECT vec_id, ev, list_position(d, list_min(d)) - 1 AS _cell FROM assign), "
        "pairs AS (SELECT a.vec_id AS i, b.vec_id AS j, "
        "round(1 - list_dot_product(a.ev, b.ev) / "
        "(sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 6) AS d "
        "FROM cells a JOIN cells b ON a._cell = b._cell AND a.vec_id < b.vec_id) "
        f"SELECT j AS vec_id, min(i) AS kept_by, min_by(d, i) AS _distance "
        f"FROM pairs WHERE d <= {eps!r} GROUP BY j"
    )


@register("semantic_dedup", oracle=_semantic_dedup_oracle_sql())
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (arXiv 2303.09540): persisted
    k-means cells partition the corpus, near-dup pruning runs per cell
    as a numpy GEMM, keep-lowest-id representative. The approximation
    (within-cell pairs only) is itself hash-checked — assignment,
    pairing, and keep rule all mirror in SQL."""
    from weaviate_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        spark, sf_dir, "embeddings", eps=0.55,
        table_key=(sf_dir, "embeddings", "ivf"),
    )


@register(
    "hybrid_explain_score",
    oracle=hybrid_oracle_sql(
        "spark filter join", QVEC, alpha=0.75, fusion="relativeScore",
        limit=15, explain=True,
    ),
)
def q_hybrid_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explainScore additional property (hybrid_fusion.go:40-47,
    139-146; search_get.proto MetadataRequest.explain_score): each fused
    hit carries the reference-format per-leg contribution lines —
    relativeScore chains the newest leg onto the previous accumulation
    with " - ". Byte-assembled in BOTH engines (%.6f numbers both
    sides), so the explanation string itself is hash-checked."""
    return hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join", vector=QVEC,
        properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.75, fusion="relativeScore", limit=15, explain=True,
    ))


@register(
    "hybrid_explain_score_rrf",
    oracle=hybrid_oracle_sql(
        "spark filter join", QVEC, alpha=0.5, fusion="ranked",
        limit=15, explain=True,
    ),
)
def q_hybrid_explain_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explainScore for rankedFusion: "contributed w/(rank+60)" lines
    accumulated newline-joined in leg order (hybrid_fusion.go:40-47)."""
    return hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join", vector=QVEC,
        properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.5, fusion="ranked", limit=15, explain=True,
    ))


@register(
    "text_unigram_xent",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS t "
        "FROM documents), "
        "c AS (SELECT t, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY t), "
        "tot AS (SELECT sum(c) AS T FROM c) "
        "SELECT toks.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "round(-avg(ln(c.c / (SELECT T FROM tot))), 6) + 0.0 AS cross_entropy "
        "FROM toks JOIN c USING (t) GROUP BY toks.doc_id"
    ),
)
def q_text_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy against the corpus's own distribution —
    the model-free CCNet-style perplexity-bucket quality signal
    (common-token boilerplate scores low, rare-token gibberish high)."""
    from weaviate_spark.operators.curation import unigram_logprob_scores

    docs = _load(spark, sf_dir, "documents")
    return unigram_logprob_scores(docs, "doc_id", "text")


@register(
    "curation_dsir_weights",
    oracle=(
        "WITH toks AS (SELECT doc_id, lang = 'en' AS is_t, "
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt FROM documents), "
        "bg AS (SELECT doc_id, is_t, tt[i] || ' ' || tt[i + 1] AS g "
        "FROM toks, LATERAL unnest(range(1, greatest(len(tt) - 1, 0) + 1)) AS u(i)), "
        "f AS (SELECT doc_id, is_t, "
        "(('0x' || substr(md5('dsir:' || g), 1, 8))::BIGINT % 8192) AS b FROM bg), "
        "bc AS (SELECT b, CAST(count(*) AS DOUBLE) AS cr, "
        "CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS DOUBLE) AS ct FROM f GROUP BY b), "
        "tots AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM bc), "
        "r AS (SELECT b, ln((ct + 1) / ((SELECT tt FROM tots) + 8192)) "
        "- ln((cr + 1) / ((SELECT tr FROM tots) + 8192)) AS lr FROM bc) "
        "SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_features, "
        "round(avg(lr), 6) + 0.0 AS weight FROM f JOIN r USING (b) GROUP BY f.doc_id"
    ),
)
def q_curation_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (hashed-bigram log-ratio vs the
    'en' target domain, Xie et al. NeurIPS'23): rank documents by how
    target-like their feature distribution is — the classifier-free
    domain-upsampling signal for training-data curation."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import dsir_importance_weights

    docs = _load(spark, sf_dir, "documents")
    return dsir_importance_weights(
        docs, "doc_id", "text", F.col("lang") == "en", buckets=8192
    )


@register(
    "curation_doc_chunks",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt FROM documents), "
        "c AS (SELECT doc_id, i AS s, "
        "list_slice(tt, i, least(i + 63, len(tt))) AS chunk "
        "FROM toks, LATERAL unnest(range(1, len(tt) + 1, 48)) AS u(i) "
        "WHERE len(tt) > 0) "
        "SELECT doc_id, CAST((s - 1) / 48 AS BIGINT) AS chunk_idx, "
        "CAST(len(chunk) AS BIGINT) AS n_tokens, "
        "array_to_string(chunk, ' ') AS chunk_text FROM c"
    ),
)
def q_curation_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, 16-token overlap):
    deterministic chunk ids, pure narrow explode — the long-document
    split that precedes embedding/packing in a training pipeline."""
    from weaviate_spark.operators.curation import chunk_documents

    docs = _load(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", max_tokens=64, overlap=16)


@register(
    "dedup_minhash_clusters",
    oracle=(
        # connected components via recursive reachability: cluster_id =
        # min id reachable from each node (genuinely independent of the
        # engine's iterative min-label propagation)
        "WITH RECURSIVE pairs AS MATERIALIZED (" + _MINHASH_SQL.format(thr=0.35) + "), "
        "edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach(src, dst) AS ("
        "SELECT a, a FROM edges "
        "UNION "
        "SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a) "
        "SELECT src AS doc_id, min(dst) AS cluster_id, "
        "(src = min(dst)) AS keep FROM reach GROUP BY src"
    ),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS -> connected-component CLUSTERS + keep/drop: the
    decision step of a dedup pipeline (one canonical survivor per
    component, min id). Spark side: iterative min-label propagation
    with checkpointed rounds; the oracle computes components by
    recursive reachability — two entirely different algorithms must
    agree on every component."""
    from weaviate_spark.operators.dedup import dedup_clusters

    df = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
        jaccard_threshold=0.35, max_bucket_size=1_000_000,
        table_key=(sf_dir, "documents"),
    )
    return dedup_clusters(pairs)


def _sine_wav(freq: int, sr: int = 8000, ms: int = 200, amp: int = 20000) -> bytes:
    """Mono 16-bit PCM sine fixture — sample i = int(amp*sin(2πf·i/sr)),
    the exact arithmetic the oracle regenerates in SQL."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        n = sr * ms // 1000
        wf.writeframes(b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * freq * i / sr)))
            for i in range(n)
        ))
    return buf.getvalue()


@register(
    "audio_frame_features",
    oracle=(
        # first-principles oracle: REGENERATE the sine fixtures in SQL
        # (same sample arithmetic: trunc(20000*sin(2π·f·i/8000))/32768)
        # and compute per-frame RMS/ZCR with window functions — the
        # Spark side decodes actual WAV bytes; no codec in sight here
        "WITH p(media_id, freq) AS (VALUES (1, 300), (2, 443), (3, 700)), "
        "s AS (SELECT media_id, i, "
        "trunc(20000 * sin(2 * pi() * freq * i / 8000)) / 32768 AS x "
        "FROM p, LATERAL unnest(range(0, 1600)) AS u(i)), "
        "f AS (SELECT media_id, CAST(i // 400 AS BIGINT) AS frame_idx, x, "
        "lag(x) OVER (PARTITION BY media_id, i // 400 ORDER BY i) AS px "
        "FROM s) "
        "SELECT media_id, frame_idx, CAST(count(*) AS BIGINT) AS n_samples, "
        "round(sqrt(avg(x * x)), 6) AS rms, "
        "round(avg(CASE WHEN px IS NULL THEN NULL "
        "WHEN (x < 0) != (px < 0) THEN 1.0 ELSE 0.0 END), 6) AS zcr "
        "FROM f GROUP BY media_id, frame_idx"
    ),
)
def q_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio RMS/ZCR over real PCM WAV decode (25ms frames
    at 8kHz) — the silence-detection primitive; the oracle rebuilds the
    identical sine signals from first principles in SQL and must agree
    on every frame."""
    from weaviate_spark.operators.multimodal import audio_frame_features

    rows = [(k, bytearray(_sine_wav(f))) for k, f in ((1, 300), (2, 443), (3, 700))]
    df = local_df(spark, rows, "media_id long, blob binary")
    return audio_frame_features(df, "media_id", "blob", frame_samples=400)


@register(
    "ref_filter_chain_3hop",
    oracle=(
        # lineitems whose order's customer's nation is GERMANY, spring
        # 1995 shipments — three cascaded semi-joins
        "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS quantity FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1995-03-01' "
        "AND l_shipdate < TIMESTAMP '1995-06-01' "
        "AND l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_custkey IN ("
        "SELECT c_custkey FROM customer WHERE c_nationkey IN ("
        "SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7')))"
    ),
)
def q_ref_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop reference-path filter (lineitem -> order -> customer ->
    nation): the reference's arbitrary-depth where-path as a cascade of
    allowlist semi-joins, innermost-first."""
    import datetime

    from pyspark.sql import functions as F

    from weaviate_spark.operators.refs import ref_filter_chain

    out = ref_filter_chain(
        spark, sf_dir, "lineitem", ("ofOrder", "byCustomer", "inNation"),
        target_where=Clause(operator="Equal", path=["n_name"], value="NATION_7"),
        parent_where=Clause(operator="And", operands=[
            Clause(operator="GreaterThanEqual", path=["l_shipdate"],
                   value=datetime.datetime(1995, 3, 1)),
            Clause(operator="LessThan", path=["l_shipdate"],
                   value=datetime.datetime(1995, 6, 1)),
        ]),
    )
    return out.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
    )


# ---------------------------------------------------------------------------
# Round 6 (cont.) — percentile aggregators / cohort retention / as-of join /
# sketches / tokenizer training / HTML extraction


@register(
    "agg_percentiles",
    oracle=(
        "SELECT l_returnflag, "
        "quantile_cont(l_extendedprice, 0.25) AS l_extendedprice_p25, "
        "quantile_cont(l_extendedprice, 0.75) AS l_extendedprice_p75, "
        "quantile_cont(l_extendedprice, 0.95) AS l_extendedprice_p95, "
        "quantile_cont(l_extendedprice, 0.99) AS l_extendedprice_p99 "
        "FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY l_returnflag"
    ),
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/p75/p95/p99) per group — the
    reference stops at median (aggregator/numerical.go:208); this extends
    the identical sorted-position machinery (position 1+q*(n-1), linear
    interpolation — the same formula DuckDB's quantile_cont uses, so the
    oracle matches bit-for-bit before the 6dp fold)."""
    return aggregate(spark, sf_dir, AggregateSpec(
        collection="lineitem",
        group_by="l_returnflag",
        properties=[PropertyAgg("l_extendedprice", ["p25", "p75", "p95", "p99"])],
    ))


@register(
    "events_retention_cohorts",
    oracle=(
        "WITH p AS (SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS period FROM events), "
        "c AS (SELECT user_id, period, min(period) OVER (PARTITION BY user_id) AS cohort FROM p), "
        "cells AS (SELECT cohort AS cohort_start, "
        "CAST(date_diff('day', cohort, period) // 7 AS BIGINT) AS periods_since, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_active FROM c GROUP BY 1, 2), "
        "s AS (SELECT cohort_start, n_active AS sz FROM cells WHERE periods_since = 0) "
        "SELECT cohort_start, periods_since, n_active, "
        "n_active / CAST(sz AS DOUBLE) AS retention "
        "FROM cells JOIN s USING (cohort_start)"
    ),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-event week,
    distinct-active counts per (cohort, weeks-since) cell, ratio vs the
    week-0 cohort size. Two shuffles (user window + cell agg); the
    cohort-size join is broadcast — one row per calendar week at any
    scale."""
    from weaviate_spark.operators.analytics import retention_cohorts

    return retention_cohorts(_load(spark, sf_dir, "events"))


@register(
    "events_asof_click_attribution",
    oracle=(
        # DuckDB's NATIVE ASOF JOIN — a genuinely different algorithm
        # from the engine's union + last-carried-forward window plan
        "WITH cl AS (SELECT user_id, ts, event_id, value, "
        "row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn "
        "FROM events WHERE event_type = 'click'), "
        "c AS (SELECT user_id, ts, event_id, value FROM cl WHERE rn = 1), "
        "p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') "
        "SELECT p.event_id, p.user_id, p.ts, p.value, "
        "c.ts AS asof_ts, c.event_id AS asof_event_id, c.value AS asof_value "
        "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the newest click at-or-before
    it by the same user. Engine plan = ONE shuffle on user_id + ordered
    window carry-forward (no range join, no per-key quadratic blowup);
    oracle = DuckDB's native ASOF LEFT JOIN. Timestamp ties inside the
    right side resolve to the largest event_id on both sides."""
    from weaviate_spark.operators.analytics import asof_join

    ev = _load(spark, sf_dir, "events")
    purchases = ev.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts", "value")
    clicks = ev.where("event_type = 'click'")
    return asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["event_id", "value"], right_tiebreak="event_id",
    )


@register(
    "sketch_distinct_hll_kmv",
    oracle=(
        # replay BOTH sketches' md5 arithmetic exactly: HLL p=12 with the
        # integer harmonic sum (sum 2^(49-rho) in DECIMAL — exact, order
        # independent), KMV k=256 on the same 60-bit hash space
        "WITH h AS (SELECT DISTINCT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h "
        "FROM lineitem WHERE l_partkey IS NOT NULL), "
        "hh AS (SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h "
        "FROM lineitem WHERE l_partkey IS NOT NULL), "
        "r AS (SELECT h >> 48 AS reg, "
        "CASE WHEN (h & ((1::BIGINT << 48) - 1)) = 0 THEN 49 "
        "ELSE 48 - length(bin(h & ((1::BIGINT << 48) - 1))) + 1 END AS rho FROM hh), "
        "regs AS (SELECT reg, max(rho) AS rho FROM r GROUP BY reg), "
        "a AS (SELECT sum(CAST(power(2.0, 49 - rho) AS DECIMAL(38,0))) AS osum, "
        "count(*) AS nocc FROM regs), "
        "hll AS (SELECT CASE WHEN raw <= 2.5 * 4096 AND zeros > 0 "
        "THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END AS est FROM ("
        "SELECT 0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 * power(2.0, 49) "
        "/ CAST(osum + CAST(4096 - nocc AS DECIMAL(38,0)) * (1::BIGINT << 49) AS DOUBLE) AS raw, "
        "CAST(4096 - nocc AS DOUBLE) AS zeros FROM a)), "
        "kmv AS (SELECT CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE) "
        "ELSE 255.0 * power(2.0, 60) / max(h) END AS est "
        "FROM (SELECT h FROM h ORDER BY h LIMIT 256)) "
        "SELECT round(hll.est, 4) AS hll_estimate, 4096::BIGINT AS n_registers, "
        "kmv.est AS kmv_estimate, 256::BIGINT AS k, "
        "(SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS exact_distinct "
        "FROM hll, kmv"
    ),
)
def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL (p=12) + KMV (k=256) distinct-count sketches over
    lineitem.l_partkey, alongside the exact count. Both estimates are
    themselves hash-checked: the oracle replays the identical md5/bit
    arithmetic, and the HLL harmonic sum is an exact DECIMAL integer sum
    so no floating-point reduction order can split the engines."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.sketches import hll_distinct, kmv_distinct

    li = _load(spark, sf_dir, "lineitem")
    hll = hll_distinct(li, "l_partkey", p=12)
    kmv = kmv_distinct(li, "l_partkey", k=256)
    exact = li.agg(
        F.countDistinct("l_partkey").alias("exact_distinct"))
    return hll.crossJoin(kmv).crossJoin(exact)


@register(
    "sketch_kmv_set_overlap",
    oracle=(
        # merged-KMV set algebra: k smallest hashes of A union B, overlap
        # fraction -> jaccard, (k-1)/v_k -> union, product -> intersection
        "WITH a AS (SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h "
        "FROM orders WHERE year(o_orderdate) = 1994), "
        "b AS (SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h "
        "FROM orders WHERE year(o_orderdate) = 1995), "
        "sa AS (SELECT h FROM a ORDER BY h LIMIT 256), "
        "sb AS (SELECT h FROM b ORDER BY h LIMIT 256), "
        "m AS (SELECT h, max(ia) AS ia, max(ib) AS ib FROM ("
        "SELECT h, 1 AS ia, 0 AS ib FROM sa UNION ALL SELECT h, 0, 1 FROM sb) "
        "GROUP BY h ORDER BY h LIMIT 256), "
        "s AS (SELECT sum(ia * ib) / CAST(count(*) AS DOUBLE) AS jaccard_est, "
        "CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE) "
        "ELSE 255.0 * power(2.0, 60) / max(h) END AS union_est FROM m) "
        "SELECT jaccard_est, union_est, jaccard_est * union_est AS intersect_est FROM s"
    ),
)
def q_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-KMV set algebra (Beyer et al. SIGMOD'07): Jaccard, union
    and intersection cardinality estimates for 'customers ordering in
    1994' vs 'in 1995' from two 256-hash sketches — the cross-corpus
    overlap primitive (e.g. contamination screening between crawl
    snapshots) at constant state per side."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.sketches import kmv_set_overlap

    o = _load(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1994).select("o_custkey")
    b = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    return kmv_set_overlap(a, b, "o_custkey", k=256)


def _bpe_oracle_sql(num_merges: int) -> str:
    """Unrolled BPE training in pure DuckDB SQL: per iteration, a pair-count
    CTE, an argmax CTE, and a word-update CTE whose list_reduce fold applies
    the merge greedily left-to-right (symbols ride in a chr(31)-joined string
    because DuckDB's fold accumulator must be scalar)."""
    sp = "chr(31)"
    acc_l = f"string_split(acc, {sp})"
    parts = [
        "WITH w1 AS (SELECT word, count(*) AS cnt, string_split(word, '') AS syms "
        "FROM (SELECT unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS word "
        "FROM documents) GROUP BY word)"
    ]
    for i in range(1, num_merges + 1):
        parts.append(
            f"p{i} AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c "
            f"FROM w{i}, LATERAL unnest(range(1, len(syms))) AS u(i) "
            f"WHERE len(syms) > 1 GROUP BY 1, 2)"
        )
        parts.append(
            f"b{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1)"
        )
        if i < num_merges:
            parts.append(
                f"w{i+1} AS (SELECT word, cnt, "
                f"CASE WHEN len(syms) <= 1 THEN syms "
                f"ELSE string_split(list_reduce(syms, (acc, x) -> CASE "
                f"WHEN list_extract({acc_l}, len({acc_l})) = b.l AND x = b.r "
                f"THEN CASE WHEN len({acc_l}) = 1 THEN b.l || b.r "
                f"ELSE array_to_string(list_slice({acc_l}, 1, len({acc_l}) - 1), {sp}) "
                f"|| {sp} || b.l || b.r END "
                f"ELSE acc || {sp} || x END), {sp}) END AS syms "
                f"FROM w{i}, b{i} b)"
            )
    selects = [
        f"SELECT {i}::BIGINT AS merge_rank, l AS \"left\", r AS \"right\", "
        f"l || r AS merged, c::BIGINT AS pair_count FROM b{i}"
        for i in range(1, num_merges + 1)
    ]
    return ", ".join(parts) + " " + " UNION ALL ".join(selects)


@register("tokenizer_bpe_train", oracle=_bpe_oracle_sql(6))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich ACL'16): 6 merges
    learned from the documents corpus. Spark folds symbol arrays with a
    Catalyst `aggregate` over the distinct-word frame; the oracle unrolls
    the same training loop as chained CTEs with a string-accumulator
    list_reduce — every learned (pair, count) must agree at every rank."""
    from weaviate_spark.operators.tokenizer_train import train_bpe

    return train_bpe(_load(spark, sf_dir, "documents"), num_merges=6)


_HTML_SYNTH_SQL = (
    "'<html><!-- generated --><head><script>var x=1;</script>"
    "<style>p{color:red}</style></head><body><h1>' || source || "
    "'</h1><p>' || replace(text, ' value ', ' &amp; ') || "
    "'</p><div>nav menu</div></body></html>'"
)


@register(
    "curation_html_extract",
    oracle=(
        "WITH h AS (SELECT doc_id, " + _HTML_SYNTH_SQL + " AS html FROM documents), "
        "c AS (SELECT doc_id, "
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "html, '(?s)<!--.*?-->', '', 'g'), "
        "'(?is)<script[^>]*>.*?</script>', '', 'g'), "
        "'(?is)<style[^>]*>.*?</style>', '', 'g'), "
        "'(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|footer)[^>]*>', chr(10), 'g'), "
        "'<[^>]+>', ' ', 'g') AS t FROM h), "
        "e AS (SELECT doc_id, replace(replace(replace(replace(replace(replace("
        "t, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), "
        "'&#39;', chr(39)), '&amp;', '&') AS t FROM c), "
        "w AS (SELECT doc_id, regexp_replace(t, '[ \\t\\r]+', ' ', 'g') AS t FROM e), "
        "k AS (SELECT doc_id, list_filter(list_transform(string_split(t, chr(10)), "
        "x -> trim(x)), x -> len(regexp_extract_all(x, '[\\p{L}\\p{N}]+')) >= 3) AS kept FROM w) "
        "SELECT doc_id, array_to_string(kept, chr(10)) AS extracted, "
        "CAST(len(kept) AS BIGINT) AS extracted_lines, "
        "CAST(length(array_to_string(kept, chr(10))) AS BIGINT) AS extracted_chars FROM k"
    ),
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction with line-level boilerplate removal (the
    crawl-to-corpus front door): deterministic HTML synthesized around
    each document (script/style/comment blocks, entities, nav cruft),
    then the full strip + decode + C4-style short-line filter. Both
    engines run the identical chained-regex pipeline — single codegen'd
    map pass, no UDF."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import extract_html_text

    docs = _load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><!-- generated --><head><script>var x=1;</script>'
              '<style>p{color:red}</style></head><body><h1>'),
        F.col("source"),
        F.lit('</h1><p>'),
        F.replace(F.col("text"), F.lit(' value '), F.lit(' &amp; ')),
        F.lit('</p><div>nav menu</div></body></html>'),
    )
    out = extract_html_text(docs.withColumn("_html", html), "_html")
    return out.select("doc_id", "extracted", "extracted_lines", "extracted_chars")


@register(
    "text_bigram_perplexity",
    oracle=(
        "WITH tt AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt "
        "FROM documents WHERE len(regexp_extract_all(lower(text), "
        "'[\\p{L}\\p{N}]+')) >= 2), "
        "bg AS (SELECT doc_id, tt[i] AS v, tt[i + 1] AS w FROM tt, "
        "LATERAL unnest(range(1, len(tt))) AS u(i)), "
        "bi AS (SELECT v, w, CAST(count(*) AS DOUBLE) AS cb FROM bg GROUP BY v, w), "
        "ctx AS (SELECT v, sum(cb) AS cv FROM bi GROUP BY v), "
        "uni AS (SELECT t AS w, CAST(count(*) AS DOUBLE) AS cu FROM (SELECT "
        "unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS t "
        "FROM documents) GROUP BY t), "
        "tot AS (SELECT sum(cu) AS T FROM uni), "
        "h AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "-avg(ln(0.7 * (cb / cv) + (1.0 - 0.7) * (cu / (SELECT T FROM tot)))) AS h "
        "FROM bg JOIN bi USING (v, w) JOIN ctx USING (v) "
        "JOIN uni ON uni.w = bg.w GROUP BY bg.doc_id) "
        "SELECT doc_id, n_bigrams, round(h, 6) + 0.0 AS cross_entropy, "
        "round(exp(h), 6) + 0.0 AS perplexity FROM h"
    ),
)
def q_text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM perplexity against the corpus's own
    counts (Jelinek-Mercer lam=0.7) — the deterministic stand-in for
    CCNet's trained-KenLM perplexity filter, one signal up from
    text_unigram_xent: predictable word ORDER scores low, shuffled-word
    spam scores high even with normal unigrams. Bigrams explode via
    zip_with on slices (no self-join); stats are reusable ingest
    artifacts at scale."""
    from weaviate_spark.operators.curation import bigram_interp_xent

    docs = _load(spark, sf_dir, "documents")
    return bigram_interp_xent(docs, "doc_id", "text", lam=0.7)


@register(
    "text_tfidf_keywords",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS t "
        "FROM documents), "
        "tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY doc_id, t), "
        "dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t), "
        "n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM toks), "
        "s AS (SELECT doc_id, t, tf, df, "
        "round(tf * (ln((1.0 + (SELECT n FROM n)) / (1.0 + df)) + 1.0), 6) + 0.0 "
        "AS score FROM tf JOIN dfq USING (t)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score DESC, t ASC) AS rk FROM s) "
        "SELECT doc_id, CAST(rk AS BIGINT) AS rank, t AS term, "
        "CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score "
        "FROM r WHERE rk <= 3"
    ),
)
def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (smoothed sklearn idf) — the
    model-free document-tagging signal; the term-df side is the
    statistic the BM25 artifact already persists, so at scale this is
    one explode + one artifact join + a per-doc top-k window."""
    from weaviate_spark.operators.textstats import tfidf_keywords

    docs = _load(spark, sf_dir, "documents")
    return tfidf_keywords(docs, "doc_id", "text", k=3)


@register(
    "events_funnel_conversion",
    oracle=(
        "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "JOIN v USING (user_id) WHERE e.event_type = 'click' AND e.ts > v.t1 "
        "GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "JOIN c USING (user_id) WHERE e.event_type = 'purchase' AND e.ts > c.t2 "
        "GROUP BY e.user_id), "
        "s AS (SELECT 0 AS stage_idx, 'all' AS stage, "
        "count(DISTINCT user_id) AS n_users FROM events "
        "UNION ALL SELECT 1, 'view', count(*) FROM v "
        "UNION ALL SELECT 2, 'click', count(*) FROM c "
        "UNION ALL SELECT 3, 'purchase', count(*) FROM p) "
        "SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage, "
        "CAST(n_users AS BIGINT) AS n_users, "
        "round(CAST(n_users AS DOUBLE) / coalesce(lag(n_users) "
        "OVER (ORDER BY stage_idx), n_users), 6) + 0.0 AS conversion FROM s"
    ),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase, each stage strictly
    after the user's previous-stage completion): per-stage user counts
    and step conversion rates. Cascaded min-ts groupBys all keyed on
    user — co-partitioned after the first shuffle, no full-stream
    window, stages shrink monotonically."""
    from weaviate_spark.operators.analytics import funnel_conversion

    ev = _load(spark, sf_dir, "events")
    return funnel_conversion(ev, ["view", "click", "purchase"])


@register(
    "events_anomaly_zscore",
    oracle=(
        "WITH d AS (SELECT event_type, "
        "CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n "
        "FROM events GROUP BY event_type, day), "
        "s AS (SELECT event_type, day, n, "
        "avg(n) OVER w AS m, "
        "stddev_samp(CAST(n AS DOUBLE)) OVER w AS sd, "
        "count(*) OVER w AS hist FROM d "
        "WINDOW w AS (PARTITION BY event_type ORDER BY day "
        "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) "
        "SELECT event_type, day, CAST(n AS BIGINT) AS n, "
        "round(CASE WHEN hist >= 3 AND sd > 0 THEN (n - m) / sd END, 6) + 0.0 "
        "AS z FROM s"
    ),
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume anomaly detection per event type: z-score of each
    day's count against its trailing-7-day window (NULL until 3 days
    of history). One groupBy reduction then a tiny per-type window —
    the window partitions hold one row per day regardless of corpus
    size."""
    from weaviate_spark.operators.analytics import daily_count_zscores

    ev = _load(spark, sf_dir, "events")
    return daily_count_zscores(ev)


def _pagerank_oracle_sql(iterations: int = 10) -> str:
    """Unrolled-CTE mirror of operators/graph.pagerank over the
    nation-level trade graph: the same damped recurrence evaluated as
    `iterations` chained CTEs (no recursive-CTE aggregation quirks —
    genuinely the same fixed-step computation, independently run)."""
    # every CTE is MATERIALIZED: DuckDB otherwise inlines each CTE
    # reference, re-opening the parquet views once per mention — the
    # unrolled recurrence references them O(iterations) times and
    # blows the open-file limit
    head = (
        "WITH e AS MATERIALIZED (SELECT c_nationkey AS s, s_nationkey AS d, "
        "CAST(count(*) AS DOUBLE) AS w FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2), "
        "ow AS MATERIALIZED (SELECT s, sum(w) AS ow FROM e GROUP BY s), "
        "p AS MATERIALIZED (SELECT e.s, e.d, e.w / ow.ow AS p "
        "FROM e JOIN ow USING (s)), "
        "nodes AS MATERIALIZED (SELECT s AS n FROM e UNION SELECT d FROM e), "
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes), "
        "dang AS MATERIALIZED (SELECT n FROM nodes "
        "WHERE n NOT IN (SELECT s FROM ow)), "
        "r0 AS MATERIALIZED (SELECT n, 1.0 / (SELECT nn FROM nn) AS r "
        "FROM nodes)"
    )
    steps = []
    for k in range(1, iterations + 1):
        prev = f"r{k - 1}"
        steps.append(
            f", r{k} AS MATERIALIZED (SELECT nodes.n, "
            f"(1.0 - 0.85) / (SELECT nn FROM nn) "
            f"+ 0.85 * (coalesce(c.c, 0.0) + (SELECT coalesce(sum(r), 0.0) "
            f"FROM {prev} JOIN dang USING (n)) / (SELECT nn FROM nn)) AS r "
            f"FROM nodes LEFT JOIN (SELECT p.d AS n, sum(p.p * q.r) AS c "
            f"FROM p JOIN {prev} q ON p.s = q.n GROUP BY p.d) c USING (n))"
        )
    tail = (
        f" SELECT nation.n_name AS nation, round(r, 6) + 0.0 AS pagerank "
        f"FROM r{iterations} JOIN nation ON r{iterations}.n = nation.n_nationkey"
    )
    return head + "".join(steps) + tail


@register("graph_pagerank_trade", oracle=_pagerank_oracle_sql(10))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (10 damped power steps, d=0.85, dangling mass
    redistributed) over the nation-level trade graph — customer nation
    -> supplier nation, edge weight = lineitem count. The Pregel-join
    superstep pattern: edge normalization once, per step one co-keyed
    join + groupBy and two broadcast scalars, localCheckpoint lineage
    truncation. The heavy part at 100 TB is the one-time edge
    aggregation (fact-fact join co-keyed on orderkey); iterations run
    on the aggregated graph."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.graph import pagerank

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
    )
    ranks = pagerank(edges, "src", "dst", iterations=10, damping=0.85)
    return ranks.join(
        F.broadcast(nation), ranks["node"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        (F.round("pagerank", 6) + F.lit(0.0)).alias("pagerank"),
    )


@register(
    "image_dhash_neardup",
    oracle=__import__(
        "weaviate_spark.media_oracles", fromlist=["image_dhash_oracle_sql"]
    ).image_dhash_oracle_sql(2000, 2),
)
def q_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup: per doc TWO 4x6 PPM variants
    (raw md5 pixels + a +8 brightness edit with 255 clipping — the
    classic edited-copy near-dup), REAL decode -> integer-gray dHash
    (operators/multimodal.image_dhash), then pigeonhole-banded LSH
    pairing at Hamming <= 2 (recall-exact: 3 disjoint bands, 2 flips
    can't touch all 3). The oracle rebuilds every pixel analytically
    from the md5 hex and runs the quadratic ground-truth join — band
    join and all-pairs must agree exactly."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.multimodal import (
        dhash_neardup_pairs,
        image_dhash,
    )

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 2000)
    hexs = F.concat(
        F.md5(F.col("text")),
        *[
            F.md5(F.concat(F.col("text"), F.lit(str(i))))
            for i in range(2, 6)
        ],
    )
    d = docs.select(F.col("doc_id"), hexs.alias("_hex"))

    def pix(bright: int):
        return F.unhex(
            F.expr(
                "concat_ws('', transform(sequence(0, 71), i -> "
                "lpad(hex(least(cast(conv(substring(_hex, i * 2 + 1, 2), "
                f"16, 10) as bigint) + {bright}, 255)), 2, '0')))"
            )
        )

    header = F.lit(b"P6\n6 4\n255\n")
    # both brightness variants from ONE corpus scan: explode a 2-struct
    # array instead of a self-union (explode_outer: non-empty by
    # construction, and InferFiltersFromGenerate can't clone the pixel
    # expressions into a pushed filter)
    media = d.select(
        F.explode_outer(F.array(
            F.struct(
                (F.col("doc_id") * 2).alias("media_id"),
                F.concat(header, pix(0)).alias("media"),
            ),
            F.struct(
                (F.col("doc_id") * 2 + 1).alias("media_id"),
                F.concat(header, pix(8)).alias("media"),
            ),
        )).alias("_m")
    ).select("_m.media_id", "_m.media")
    hashes = image_dhash(media, "media_id", "media")
    return dhash_neardup_pairs(
        hashes, "media_id", "dhash", n_bits=20, max_hamming=2
    )


@register(
    "text_tfidf_cosine_topk",
    oracle=(
        "WITH toks AS (SELECT doc_id AS d, "
        "unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS t "
        "FROM documents), "
        "tf AS (SELECT d, t, count(*) AS tf FROM toks GROUP BY d, t), "
        "dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t), "
        "n AS (SELECT CAST(count(DISTINCT d) AS DOUBLE) AS n FROM toks), "
        "w AS (SELECT d, t, "
        "round(tf * (ln((1.0 + (SELECT n FROM n)) / (1.0 + df)) + 1.0), 6) AS w "
        "FROM tf JOIN dfq USING (t) "
        "WHERE df <= (SELECT n FROM n) * 0.2), "
        "kept AS (SELECT d, t, w FROM (SELECT d, t, w, row_number() OVER "
        "(PARTITION BY d ORDER BY w DESC, t ASC) AS rk FROM w) WHERE rk <= 10), "
        "keptc AS (SELECT d, t, w FROM (SELECT d, t, w, row_number() OVER "
        "(PARTITION BY t ORDER BY w DESC, d ASC) AS pr FROM kept) "
        "WHERE pr <= 500), "
        "nm AS (SELECT d, sqrt(sum(w * w)) AS nm FROM keptc GROUP BY d), "
        "p AS (SELECT d, t, w / nm AS wn FROM keptc JOIN nm USING (d)), "
        "pc AS (SELECT a.d AS da, b.d AS db, sum(a.wn * b.wn) AS c "
        "FROM p a JOIN p b ON a.t = b.t AND a.d < b.d GROUP BY a.d, b.d), "
        "bo AS (SELECT da AS src, db AS nbr, round(c, 6) + 0.0 AS c6 FROM pc "
        "UNION ALL SELECT db, da, round(c, 6) + 0.0 FROM pc), "
        "r AS (SELECT src, nbr, c6, row_number() OVER (PARTITION BY src "
        "ORDER BY c6 DESC, nbr ASC) AS rk FROM bo) "
        "SELECT src AS doc_id, CAST(rk AS BIGINT) AS rank, "
        "nbr AS neighbor_id, c6 AS cosine FROM r WHERE rk <= 5"
    ),
)
def q_text_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical similarity search: top-5 nearest docs per doc by
    cosine over pruned TF-IDF vectors (10 heaviest terms per doc,
    stopword-like terms with df > 20% of corpus dropped from pairing,
    per-term posting lists capped at the 500 heaviest postings — the
    absolute bound that keeps the pair join sub-quadratic at ANY corpus
    size, r06 verdict ask #2), via an inverted-index self-join — the
    no-model doc-to-doc similarity path."""
    from weaviate_spark.operators.similarity import tfidf_cosine_topk

    docs = _load(spark, sf_dir, "documents")
    return tfidf_cosine_topk(docs, "doc_id", "text", m_terms=10, k=5,
                             max_postings_per_term=500)


@register(
    "audio_band_energy",
    oracle=(
        # regenerate the sine fixtures and evaluate the SAME DFT-bin
        # sums in SQL — frame-local index, header sample rate
        "WITH p(media_id, freq) AS (VALUES (1, 300), (2, 443), (3, 700)), "
        "pr(pf) AS (VALUES (300.0), (443.0), (700.0)), "
        "s AS (SELECT media_id, i, "
        "trunc(20000 * sin(2 * pi() * freq * i / 8000)) / 32768 AS x "
        "FROM p, LATERAL unnest(range(0, 1600)) AS u(i)), "
        "g AS (SELECT media_id, CAST(i // 400 AS BIGINT) AS frame_idx, pf, "
        "sum(x * cos(2 * pi() * pf * (i % 400) / 8000)) AS c, "
        "sum(x * sin(2 * pi() * pf * (i % 400) / 8000)) AS sn, "
        "count(*) AS n FROM s, pr GROUP BY media_id, i // 400, pf) "
        "SELECT media_id, frame_idx, pf AS freq_hz, "
        "CAST(n AS BIGINT) AS n_samples, "
        "round((c * c + sn * sn) / (n * n), 6) + 0.0 AS energy FROM g"
    ),
)
def q_audio_band_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral band energy over real WAV decode: per 25ms frame the
    normalized DFT-bin power at probe frequencies 300/443/700 Hz —
    each sine fixture lights up exactly its own bin (~(20000/32768/2)^2
    ~ 0.093) and stays near zero elsewhere. The oracle rebuilds the
    signal from first principles and evaluates the identical weighted
    sums in SQL."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.multimodal import audio_band_energy

    rows = [(k, bytearray(_sine_wav(f))) for k, f in ((1, 300), (2, 443), (3, 700))]
    df = local_df(spark, rows, "media_id long, blob binary")
    out = audio_band_energy(
        df, "media_id", "blob", freqs_hz=[300.0, 443.0, 700.0],
        frame_samples=400,
    )
    return out.select(
        "media_id", "frame_idx", "freq_hz", "n_samples",
        (F.col("energy") + F.lit(0.0)).alias("energy"),
    )


def _bpe_encode_oracle_sql(num_merges: int) -> str:
    """Unrolled BPE train + ENCODE in pure DuckDB SQL: the training
    chain of _bpe_oracle_sql extended one step (w{n+1} = vocabulary
    after the last merge), then every document's word sequence joins to
    its fully-merged symbol list and reassembles in word order."""
    sp = "chr(31)"
    acc_l = f"string_split(acc, {sp})"
    parts = [
        "WITH w1 AS (SELECT word, count(*) AS cnt, string_split(word, '') AS syms "
        "FROM (SELECT unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS word "
        "FROM documents) GROUP BY word)"
    ]
    for i in range(1, num_merges + 1):
        parts.append(
            f"p{i} AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS c "
            f"FROM w{i}, LATERAL unnest(range(1, len(syms))) AS u(i) "
            f"WHERE len(syms) > 1 GROUP BY 1, 2)"
        )
        parts.append(
            f"b{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1)"
        )
        parts.append(
            f"w{i+1} AS (SELECT word, cnt, "
            f"CASE WHEN len(syms) <= 1 THEN syms "
            f"ELSE string_split(list_reduce(syms, (acc, x) -> CASE "
            f"WHEN list_extract({acc_l}, len({acc_l})) = b.l AND x = b.r "
            f"THEN CASE WHEN len({acc_l}) = 1 THEN b.l || b.r "
            f"ELSE array_to_string(list_slice({acc_l}, 1, len({acc_l}) - 1), {sp}) "
            f"|| {sp} || b.l || b.r END "
            f"ELSE acc || {sp} || x END), {sp}) END AS syms "
            f"FROM w{i}, b{i} b)"
        )
    final = f"w{num_merges + 1}"
    parts.append(
        "dw AS (SELECT doc_id, tt[i] AS word, i FROM "
        "(SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt "
        "FROM documents), LATERAL unnest(range(1, len(tt) + 1)) AS u(i))"
    )
    parts.append(
        f"enc AS (SELECT dw.doc_id, dw.i, v.syms FROM dw JOIN {final} v USING (word))"
    )
    return (
        ", ".join(parts)
        + " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(len(syms)) AS BIGINT) AS n_bpe_tokens, "
        "string_agg(array_to_string(syms, ' '), ' ' ORDER BY i) AS bpe_text "
        "FROM enc GROUP BY doc_id"
    )


@register("tokenizer_bpe_encode", oracle=_bpe_encode_oracle_sql(6))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE with corpus-trained merges: train 6 merges
    (tokenizer_bpe_train's algorithm), then tokenize every document —
    per doc the word count, fully-merged token count, and the merged
    token string. Spark side: the 6-row merge table is the ONLY thing
    collected; the Catalyst fold encodes the DISTINCT-WORD vocabulary
    (checkpointed per merge so the expression stays linear in merge
    count) and docs reassemble via one word-key join — no Python on
    the data path. Oracle: the identical train+apply recurrence
    unrolled in SQL."""
    from weaviate_spark.operators.tokenizer_train import (
        bpe_encode_docs,
        train_bpe,
    )

    docs = _load(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in train_bpe(docs, num_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    return bpe_encode_docs(docs, merges, "doc_id", "text")


def _hard_negative_oracle_sql(m: int = 3) -> str:
    """Mirror of q_hard_negatives: semantic_dedup's cell-assignment
    arithmetic (identical centroid literals), within-cell pairs with
    differing labels, per-anchor top-m by (rounded distance, id)."""
    import numpy as np

    from weaviate_spark.operators.pq_codebook import IVF_CENTROIDS

    def dlist(vals):
        return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"

    scores = ", ".join(
        f"-2 * list_dot_product(nv, {dlist(c)}) + {float(np.dot(c, c))!r}"
        for c in IVF_CENTROIDS
    )
    return (
        "WITH e AS (SELECT vec_id, label, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL), "
        "en AS (SELECT vec_id, label, ev, "
        "list_transform(ev, x -> x / sqrt(list_dot_product(ev, ev))) AS nv FROM e), "
        f"assign AS (SELECT vec_id, label, ev, [{scores}] AS d FROM en), "
        "cells AS (SELECT vec_id, label, ev, "
        "list_position(d, list_min(d)) - 1 AS _cell FROM assign), "
        "pairs AS (SELECT a.vec_id AS i, b.vec_id AS j, "
        "round(1 - list_dot_product(a.ev, b.ev) / "
        "(sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 6) AS d "
        "FROM cells a JOIN cells b ON a._cell = b._cell "
        "AND a.vec_id != b.vec_id AND a.label != b.label), "
        "r AS (SELECT i, j, d, row_number() OVER (PARTITION BY i "
        "ORDER BY d, j) AS rk FROM pairs) "
        f"SELECT i AS vec_id, CAST(rk AS BIGINT) AS rank, j AS negative_id, "
        f"d + 0.0 AS distance FROM r WHERE rk <= {m}"
    )


@register("embedding_hard_negatives", oracle=_hard_negative_oracle_sql(3))
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per anchor the 3 nearest
    different-label embeddings within its IVF cell (persisted-centroid
    assignment, per-cell numpy GEMM — SemDeDup's scale shape applied to
    training-pair generation). Assignment, pairing, label filter, and
    ranking all mirror in SQL."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.similarity import hard_negative_mining

    out = hard_negative_mining(
        spark, sf_dir, "embeddings", m=3,
        table_key=(sf_dir, "embeddings", "ivf"),
    )
    return out.select(
        "vec_id", "rank", "negative_id",
        (F.col("distance") + F.lit(0.0)).alias("distance"),
    )


def _profile_oracle_sql(cols: list[str], table: str = "lineitem") -> str:
    legs = []
    for c in cols:
        legs.append(
            f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            f"round(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) / "
            f"CAST(count(*) AS DOUBLE), 6) + 0.0 AS null_frac, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"round(min(CAST({c} AS DOUBLE)), 6) + 0.0 AS min, "
            f"round(max(CAST({c} AS DOUBLE)), 6) + 0.0 AS max, "
            f"round(CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) / count({c}), 6) + 0.0 AS mean, "
            f"round(sqrt((CAST(sum(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2))) AS DOUBLE) "
            f"- CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) * "
            f"CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) / count({c})) "
            f"/ (count({c}) - 1)), 6) + 0.0 AS std "
            f"FROM {table}"
        )
    return " UNION ALL ".join(legs)


@register(
    "profile_lineitem_columns",
    oracle=_profile_oracle_sql(
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric data profiling (pre-ingest triage): per column the row /
    null / exact-distinct counts and min/max/mean/std in ONE
    full-table aggregate pass, means and stds from order-independent
    DECIMAL sums (2dp-exact money columns), rows unpivoted via
    stack()."""
    from weaviate_spark.operators.analytics import profile_columns

    li = _load(spark, sf_dir, "lineitem")
    return profile_columns(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


@register(
    "text_readability_flesch",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt, "
        "greatest(len(list_filter(list_transform("
        "regexp_split_to_array(text, '[.!?]+'), x -> trim(x)), "
        "x -> x != '')), 1) AS nsent FROM documents), "
        "s AS (SELECT doc_id, len(tt) AS nw, nsent, "
        "list_sum(list_transform(tt, w -> "
        "greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))) AS nsyl "
        "FROM t WHERE len(tt) > 0) "
        "SELECT doc_id, CAST(nw AS BIGINT) AS n_words, "
        "CAST(nsent AS BIGINT) AS n_sentences, "
        "CAST(nsyl AS BIGINT) AS n_syllables, "
        "round(206.835 - 1.015 * (CAST(nw AS DOUBLE) / nsent) "
        "- 84.6 * (CAST(nsyl AS DOUBLE) / nw), 6) + 0.0 AS flesch FROM s"
    ),
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease (vowel-group syllable heuristic, sentence
    split on [.!?]+): the classic readability quality axis — one
    codegen'd narrow map, identical arithmetic mirrored in SQL."""
    from weaviate_spark.operators.textstats import readability_scores

    docs = _load(spark, sf_dir, "documents")
    return readability_scores(docs, "doc_id", "text")


@register(
    "embedding_label_outliers",
    oracle=(
        "WITH e AS (SELECT vec_id, label, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL), "
        "it AS (SELECT vec_id, label, i - 1 AS dim, ev[i] AS val "
        "FROM e, LATERAL unnest(range(1, len(ev) + 1)) AS u(i)), "
        "c AS (SELECT label AS lbl, dim, avg(val) AS mu "
        "FROM it GROUP BY label, dim), "
        "down AS (SELECT vec_id, label, "
        "sqrt(sum((val - mu) * (val - mu))) AS d FROM it "
        "JOIN c ON it.label = c.lbl AND it.dim = c.dim "
        "GROUP BY vec_id, label), "
        "doth AS (SELECT vec_id, c.lbl AS olbl, "
        "round(sqrt(sum((val - mu) * (val - mu))), 6) + 0.0 AS d6 FROM it "
        "JOIN c ON it.dim = c.dim AND it.label != c.lbl "
        "GROUP BY vec_id, c.lbl), "
        "best AS (SELECT vec_id, olbl, d6 FROM (SELECT *, row_number() "
        "OVER (PARTITION BY vec_id ORDER BY d6, olbl) AS rk FROM doth) "
        "WHERE rk = 1) "
        "SELECT down.vec_id, down.label, round(down.d, 6) + 0.0 AS d_own, "
        "best.olbl AS nearest_other_label, best.d6 AS d_other, "
        "round(best.d6 - round(down.d, 6), 6) + 0.0 AS margin, "
        "best.d6 < round(down.d, 6) + 0.0 AS likely_mislabeled "
        "FROM down JOIN best USING (vec_id)"
    ),
)
def q_embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection (confident-learning triage): per item the
    euclidean distance to its own label centroid vs the nearest other
    label's centroid; negative margin flags likely mislabels. Two
    joins against a broadcast-sized centroid statistic — no item-item
    pairs at any scale."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import label_outlier_scores

    emb = _load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    return label_outlier_scores(emb, "vec_id", "embedding", "label")


@register(
    "video_scene_cuts",
    oracle=(
        # regenerate the luma series analytically: solid neutral-chroma
        # frames make RGB == Y exactly, so MAD(frame f, f-1) =
        # |luma_f - luma_{f-1}| with luma = (doc*7 + f*31) % 256
        "WITH docs AS (SELECT doc_id, 3 + doc_id % 4 AS nf FROM documents "
        "WHERE doc_id % 17 = 0), "
        "f AS (SELECT doc_id, nf, u.f AS fi, "
        "CAST((doc_id * 7 + u.f * 31) % 256 AS DOUBLE) AS luma "
        "FROM docs, LATERAL unnest(range(0, 6)) AS u(f) WHERE u.f < nf), "
        "d AS (SELECT doc_id, fi, abs(luma - lag(luma) OVER "
        "(PARTITION BY doc_id ORDER BY fi)) AS mad FROM f) "
        "SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx, "
        "round(mad, 6) + 0.0 AS mad, mad > 48.0 AS scene_cut "
        "FROM d WHERE fi >= 1"
    ),
)
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over REAL Y4M decode: per consecutive
    frame pair the mean absolute pixel difference, cut when > 48. The
    fixture lumas step by 31 (no cut) except at the mod-256 wraparound
    (a 225-step cut) — container parse, frame decode, and the MAD
    arithmetic are all hash-checked against the analytic series."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.multimodal import (
        solid_y4m,
        video_scene_cuts,
    )

    docs = (
        _load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 17 == 0)
        .select("doc_id")
    )

    def _make(it):
        import pandas as pd

        for pdf in it:
            clips = [
                solid_y4m(
                    [((int(d) * 7 + f * 31) % 256, 128, 128)
                     for f in range(3 + int(d) % 4)],
                    width=4, height=4, fps=(10, 1),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "media": clips})

    media = docs.mapInPandas(_make, "media_id long, media binary")
    return video_scene_cuts(media, "media_id", "media", threshold=48.0)



_QUALITY_PCT_SQL = (
    "WITH qx AS (" + _TEXT_PROFILE_SQL + "), "
    "j AS (SELECT d.lang, qx.doc_id, qx.quality FROM qx "
    "JOIN documents d USING (doc_id)), "
    "r AS (SELECT lang, doc_id, quality, "
    "row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rn, "
    "count(*) OVER (PARTITION BY lang) AS n, "
    "ntile(10) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS dec "
    "FROM j) "
    "SELECT lang, doc_id, quality, CAST(rn AS BIGINT) AS rank_in_group, "
    "round(CASE WHEN n > 1 THEN (rn - 1) / CAST(n - 1 AS DOUBLE) "
    "ELSE 0.0 END, 6) + 0.0 AS pct, CAST(dec AS BIGINT) AS decile FROM r"
)


@register("text_quality_percentiles", oracle=_QUALITY_PCT_SQL)
def q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-normalized quality per language: per-group rank, [0,1]
    percentile, and decile bucket — balanced corpus filtering keeps
    the top X percent PER LANGUAGE rather than a global threshold that
    a punctuation-convention shift would bias. One scoring map + one
    window on the group key."""
    from weaviate_spark.operators.textstats import quality_percentiles_by_group

    docs = _load(spark, sf_dir, "documents")
    return quality_percentiles_by_group(docs, "doc_id", "text", "lang")


def _hash_embed_oracle_sql(query: str, dim: int = 16, k: int = 10) -> str:
    from weaviate_spark.operators.similarity import hash_embed_query

    qv = hash_embed_query(query, dim)
    qnorm = sum(x * x for x in qv) ** 0.5
    qlist = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    return (
        "WITH toks AS (SELECT doc_id AS d, "
        "unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS t "
        "FROM documents), "
        "hh AS (SELECT d, md5('emb:' || t) AS h FROM toks), "
        f"sp AS (SELECT d, ('0x' || substr(h, 1, 8))::BIGINT % {dim} AS b, "
        "sum(CASE WHEN ('0x' || substr(h, 9, 1))::BIGINT % 2 = 0 "
        "THEN 1.0 ELSE -1.0 END) AS v FROM hh GROUP BY d, b), "
        f"q AS (SELECT {qlist}::DOUBLE[] AS qa), "
        "sc AS (SELECT d, sum(v * qa[b + 1]) AS dot, "
        "sqrt(sum(v * v)) AS nm FROM sp, q GROUP BY d) "
        f"SELECT d AS doc_id, round(dot / (nm * {qnorm!r}), 6) + 0.0 AS cosine "
        f"FROM sc WHERE nm > 0 ORDER BY cosine DESC, doc_id LIMIT {k}"
    )


@register(
    "text_hash_embed_knn",
    oracle=_hash_embed_oracle_sql("distributed filter join engine"),
)
def q_hash_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free text-to-vector retrieval in one plan: docs embed by
    signed feature hashing (md5 bucket + parity sign, Weinberger ICML
    2009), the query embeds identically driver-side, cosine top-10.
    Token explode -> bounded (doc, bucket) groupBy -> broadcast query
    dot -> TakeOrdered; the text-to-vector bridge when no trained
    embedder exists."""
    from weaviate_spark.operators.similarity import hash_embed_knn

    docs = _load(spark, sf_dir, "documents")
    return hash_embed_knn(
        docs, "doc_id", "text", "distributed filter join engine", dim=16, k=10
    )


@register(
    "sample_weighted_topk",
    oracle=(
        "WITH s AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight, "
        "((('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))"
        "::BIGINT + 1) / 4294967297.0) AS u FROM documents WHERE n_chars > 0), "
        "kk AS (SELECT doc_id, weight, -ln(u) / weight AS key FROM s), "
        "r AS (SELECT doc_id, weight, key, row_number() OVER "
        "(ORDER BY key, doc_id) AS rk FROM kk) "
        "SELECT CAST(rk AS BIGINT) AS rank, doc_id, weight, "
        "round(key, 6) + 0.0 AS sample_key FROM r WHERE rk <= 25"
    ),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis exponential clocks, md5-uniform u): 25 docs with inclusion
    probability proportional to length — the quality/length-weighted
    corpus subsample. One narrow key map + TakeOrdered."""
    from weaviate_spark.operators.sampling import weighted_sample

    docs = _load(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", k=25)


@register(
    "sketch_cms_heavy_hitters",
    oracle=(
        "WITH v AS (SELECT CAST(l_suppkey AS VARCHAR) AS s FROM lineitem), "
        "rows_ AS (SELECT d, ('0x' || substr(md5('cms' || d || ':' || s), 1, 8))"
        "::BIGINT % 512 AS b, count(*) AS c FROM v, "
        "(SELECT unnest(range(0, 4)) AS d) GROUP BY d, b), "
        "items AS (SELECT s, count(*) AS t FROM v GROUP BY s), "
        "probes AS (SELECT s, t, d, "
        "('0x' || substr(md5('cms' || d || ':' || s), 1, 8))::BIGINT % 512 AS b "
        "FROM items, (SELECT unnest(range(0, 4)) AS d)), "
        "est AS (SELECT s, t, min(c) AS e FROM probes "
        "JOIN rows_ USING (d, b) GROUP BY s, t) "
        "SELECT s AS item, CAST(e AS BIGINT) AS cms_estimate, "
        "CAST(t AS BIGINT) AS true_count FROM est "
        "ORDER BY cms_estimate DESC, item ASC LIMIT 20"
    ),
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters over lineitem supplier keys
    (4 md5 hash rows x 512 counters): top-20 by one-sided CMS estimate
    with the true count alongside. The sketch table is the mergeable
    streaming trending-counter artifact; the whole build + readout is
    deterministic and re-derived in SQL."""
    from weaviate_spark.operators.sketches import cms_heavy_hitters

    li = _load(spark, sf_dir, "lineitem")
    return cms_heavy_hitters(li, "l_suppkey", width=512, depth=4, k=20)


@register(
    "dedup_fuzzy_names",
    oracle=(
        "WITH names AS (SELECT p_name AS n, count(*) AS c FROM part "
        "WHERE p_name IS NOT NULL GROUP BY p_name), "
        "k0 AS (SELECT n, c, split_part(n, ' ', 1) AS blk, length(n) AS l "
        "FROM names), "
        "ok AS (SELECT blk FROM k0 GROUP BY blk "
        "HAVING count(*) <= 10000), "
        "k AS (SELECT k0.* FROM k0 JOIN ok USING (blk)) "
        "SELECT a.n AS name_a, b.n AS name_b, "
        "CAST(levenshtein(a.n, b.n) AS BIGINT) AS distance, "
        "CAST(a.c AS BIGINT) AS n_a, CAST(b.c AS BIGINT) AS n_b "
        "FROM k a JOIN k b ON a.blk = b.blk AND a.n < b.n "
        "AND abs(a.l - b.l) <= 3 "
        "WHERE levenshtein(a.n, b.n) <= 3"
    ),
)
def q_dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity resolution over part names: distinct-name
    frame, first-token blocking, lossless length-band prefilter, then
    Levenshtein <= 3 — the short-string variant-spelling dedup the
    hash/shingle families can't see. Vocabulary-sized join, never
    corpus-sized."""
    from weaviate_spark.operators.dedup import fuzzy_name_pairs

    part = _load(spark, sf_dir, "part")
    return fuzzy_name_pairs(part, "p_partkey", "p_name", max_edit=3)


@register(
    "agg_rollup_region_nation",
    oracle=(
        "SELECT r_name AS region, n_name AS nation, "
        "CAST(grouping(r_name) AS BIGINT) AS g_region, "
        "CAST(grouping(n_name) AS BIGINT) AS g_nation, "
        "CAST(count(*) AS BIGINT) AS n_customers, "
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY ROLLUP(r_name, n_name)"
    ),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation (GROUPING SETS / ROLLUP): per-nation,
    per-region subtotal, and grand-total rows in ONE pass with
    GROUPING indicator columns — the drill-down rollup a reporting
    layer runs; money sums DECIMAL-exact so subtotals are partition-
    order independent. Spark expands grouping sets map-side; dims
    broadcast."""
    from pyspark.sql import functions as F

    cust = _load(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nation = _load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    region = _load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    j = j.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        "c_acctbal",
    )
    return (
        j.rollup("region", "nation")
        .agg(
            F.grouping("region").cast("long").alias("g_region"),
            F.grouping("nation").cast("long").alias("g_nation"),
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("acctbal_sum"),
        )
    )


@register(
    "events_gap_fill_locf",
    oracle=(
        "WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) "
        "AS day, count(*) AS n FROM events GROUP BY 1, 2), "
        "sp AS (SELECT event_type, min(day) AS lo, max(day) AS hi "
        "FROM d GROUP BY 1), "
        "cal AS (SELECT event_type, CAST(u.d AS DATE) AS day FROM sp, "
        "LATERAL unnest(generate_series(CAST(lo AS TIMESTAMP), "
        "CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS u(d)), "
        "f AS (SELECT cal.event_type, cal.day, coalesce(d.n, 0) AS n "
        "FROM cal LEFT JOIN d USING (event_type, day)) "
        "SELECT event_type, day, CAST(n AS BIGINT) AS n, n = 0 AS was_gap, "
        "CAST(last_value(CASE WHEN n > 0 THEN n END IGNORE NULLS) OVER "
        "(PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS locf FROM f"
    ),
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: per event type every calendar day in its
    observed span materializes (zero-count days flagged) with
    last-observation-carried-forward — the resample step before any
    rolling statistic; calendar frame is span-days x types regardless
    of corpus size."""
    from weaviate_spark.operators.analytics import gap_fill_daily

    ev = _load(spark, sf_dir, "events")
    return gap_fill_daily(ev)


def _hist_quantile_oracle_sql(
    col: str = "l_extendedprice", bins: int = 64,
    quantiles=(0.5, 0.9, 0.99), table: str = "lineitem",
) -> str:
    base = (
        f"WITH st AS (SELECT min(CAST({col} AS DOUBLE)) AS lo, "
        f"max(CAST({col} AS DOUBLE)) AS hi, count({col}) AS n FROM {table}), "
        f"bx AS (SELECT least(CAST(floor((CAST({col} AS DOUBLE) - lo) / "
        f"((hi - lo) / {float(bins)!r})) AS BIGINT), {bins - 1}) AS b "
        f"FROM {table}, st WHERE {col} IS NOT NULL), "
        "h AS (SELECT b, count(*) AS c FROM bx GROUP BY b), "
        "cm AS (SELECT b, c, sum(c) OVER (ORDER BY b ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h)"
    )
    legs = []
    for q in quantiles:
        legs.append(
            f"SELECT {float(q)!r} AS quantile, "
            f"round(lo + b * ((hi - lo) / {float(bins)!r}), 6) + 0.0 AS estimate, "
            "CAST(b AS BIGINT) AS bucket_idx, CAST(c AS BIGINT) AS bucket_count, "
            f"CAST(n AS BIGINT) AS n FROM cm, st WHERE cum >= {float(q)!r} * n "
            "ORDER BY b LIMIT 1"
        )
    return base + " " + " UNION ALL ".join(f"({leg})" for leg in legs)


@register("sketch_histogram_quantiles", oracle=_hist_quantile_oracle_sql())
def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass approximate quantiles (p50/p90/p99 of l_extendedprice)
    from a 64-bucket equi-width histogram — the mergeable single-pass
    alternative to the exact percentile sort at 100 TB; error bounded
    by one bucket width, every arithmetic step identical in SQL."""
    from weaviate_spark.operators.sketches import histogram_quantiles

    li = _load(spark, sf_dir, "lineitem")
    return histogram_quantiles(
        li, "l_extendedprice", bins=64, quantiles=(0.5, 0.9, 0.99)
    )


@register(
    "sketch_bloom_decontaminate",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt "
        "FROM documents), "
        "sh AS (SELECT doc_id AS _doc, "
        "list_distinct([array_to_string(tt[i:i+4], ' ') "
        "FOR i IN range(1, greatest(len(tt) - 4, 0) + 1)]) AS shs "
        "FROM toks WHERE len(tt) >= 5), "
        "ex AS (SELECT _doc, unnest(shs) AS _shingle FROM sh), "
        "bench AS (SELECT DISTINCT _shingle FROM ex WHERE _doc % 97 = 0), "
        "docs AS (SELECT * FROM ex WHERE _doc % 97 <> 0), "
        "bits AS (SELECT DISTINCT ('0x' || substr(md5('bloom' || j || ':' "
        "|| _shingle), 1, 8))::BIGINT % 8192 AS _bit FROM bench, "
        "(SELECT unnest(range(0, 3)) AS j)), "
        "pb AS (SELECT _doc, _shingle, j, ('0x' || substr(md5('bloom' || j "
        "|| ':' || _shingle), 1, 8))::BIGINT % 8192 AS _bit FROM docs, "
        "(SELECT unnest(range(0, 3)) AS j)), "
        "hits AS (SELECT _doc, count(*) AS n_bloom_pos FROM "
        "(SELECT _doc, _shingle, count(*) AS st FROM pb "
        "SEMI JOIN bits USING (_bit) GROUP BY _doc, _shingle) "
        "WHERE st = 3 GROUP BY _doc), "
        "exact AS (SELECT _doc, count(*) AS n_exact FROM docs "
        "SEMI JOIN bench USING (_shingle) GROUP BY _doc), "
        "tot AS (SELECT _doc, count(*) AS n_shingles FROM docs GROUP BY _doc) "
        "SELECT t._doc AS doc_id, CAST(t.n_shingles AS BIGINT) AS n_shingles, "
        "CAST(coalesce(h.n_bloom_pos, 0) AS BIGINT) AS n_bloom_pos, "
        "CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact, "
        "CAST(coalesce(h.n_bloom_pos, 0) - coalesce(e.n_exact, 0) AS BIGINT) "
        "AS n_false_pos FROM tot t LEFT JOIN hits h USING (_doc) "
        "LEFT JOIN exact e USING (_doc)"
    ),
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (8192 bits, 3 md5 hashes) over word
    5-gram shingles, with the exact semi-join count alongside so the
    one-sided error is visible per doc (n_false_pos >= 0, never a
    miss). The bits table broadcasts at any holdout size — the bloom-
    pushdown replacement for the billion-shingle shuffle semi-join."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.sketches import bloom_membership

    docs = _load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    rest = docs.where(F.col("doc_id") % 97 != 0)
    return bloom_membership(
        bench, rest, "doc_id", "text", n=5, m_bits=8192, k_hashes=3
    )


@register(
    "dedup_keep_best_quality",
    oracle=(
        "WITH RECURSIVE pairs AS MATERIALIZED (" + _MINHASH_SQL.format(thr=0.35) + "), "
        "edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach(src, dst) AS ("
        "SELECT a, a FROM edges "
        "UNION "
        "SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a), "
        "comp AS (SELECT src AS doc_id, min(dst) AS cluster_id "
        "FROM reach GROUP BY src), "
        "qual AS (SELECT doc_id, quality FROM (" + _TEXT_PROFILE_SQL + ")), "
        "j AS (SELECT comp.doc_id, comp.cluster_id, qual.quality "
        "FROM comp JOIN qual USING (doc_id)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id "
        "ORDER BY quality DESC, doc_id) AS rk FROM j) "
        "SELECT doc_id, cluster_id, quality, rk = 1 AS keep FROM r"
    ),
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup policy end to end: minhash-LSH pairs ->
    connected components (pointer-jumping label propagation) -> keep
    the HIGHEST-QUALITY member per cluster (composite quality score,
    id tie-break) instead of the arbitrary min-id survivor. The oracle
    recomputes components by recursive reachability and the same
    quality formula — three independent subsystems must agree row for
    row."""
    from weaviate_spark.operators.dedup import dedup_clusters, keep_best_quality
    from weaviate_spark.operators.textstats import text_profile

    df = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
        jaccard_threshold=0.35, max_bucket_size=1_000_000,
        table_key=(sf_dir, "documents"),
    )
    clusters = dedup_clusters(pairs)
    quality = text_profile(df, "doc_id", "text").select("doc_id", "quality")
    return keep_best_quality(clusters, quality, "doc_id", "quality")


@register(
    "dedup_lsh_recall_audit",
    oracle=(
        "WITH lsh AS MATERIALIZED (" + _MINHASH_SQL.format(thr=0.35) + "), "
        "ex AS MATERIALIZED (" + _NGRAM_EXACT_SQL + "), "
        "hit AS MATERIALIZED (SELECT count(*) AS n FROM lsh SEMI JOIN ex "
        "USING (id_a, id_b)) "
        "SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact, "
        "CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh, "
        "CAST((SELECT n FROM hit) AS BIGINT) AS n_hits, "
        "round((SELECT n FROM hit) / CAST((SELECT count(*) FROM ex) "
        "AS DOUBLE), 6) + 0.0 AS recall, "
        "round((SELECT n FROM hit) / CAST((SELECT count(*) FROM lsh) "
        "AS DOUBLE), 6) + 0.0 AS precision_"
    ),
)
def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine audits its own approximation: MinHash-LSH pairs vs
    the exact PPJoin all-pairs ground truth at the same threshold —
    pair counts, hits, recall, precision in one row (precision is 1 by
    construction because LSH candidates are exact-Jaccard rescored;
    recall < 1 only from banding misses). Both sides are themselves
    independently hash-checked queries; this composes them."""
    from pyspark.sql import functions as F

    df = _load(spark, sf_dir, "documents")
    lsh = minhash_lsh_pairs(
        df, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
        jaccard_threshold=0.35, max_bucket_size=1_000_000,
        table_key=(sf_dir, "documents"),
    ).select("id_a", "id_b")
    ex = ngram_jaccard_pairs(
        df, "doc_id", "text", shingle_n=3, threshold=0.35,
        table_key=(sf_dir, "documents"),
    ).select("id_a", "id_b")
    hits = lsh.join(ex, ["id_a", "id_b"], "left_semi")
    n_ex = ex.agg(F.count(F.lit(1)).alias("n_exact"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_hit = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_ex.crossJoin(n_lsh)
        .crossJoin(n_hit)
        .select(
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_lsh").cast("long").alias("n_lsh"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.round(F.col("n_hits") / F.col("n_exact"), 6) + F.lit(0.0)).alias(
                "recall"
            ),
            (F.round(F.col("n_hits") / F.col("n_lsh"), 6) + F.lit(0.0)).alias(
                "precision_"
            ),
        )
    )


def _matryoshka_oracle_sql(prefix: int = 16, overfetch: int = 50, k: int = 10) -> str:
    import math

    def qnorm(vals):
        acc = 0.0
        for x in vals:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    qp = QVEC[:prefix]
    qp_sql = "[" + ", ".join(str(x) for x in qp) + "]::DOUBLE[]"
    np_, nf = qnorm(qp), qnorm(QVEC)
    return (
        "WITH e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        f"p AS (SELECT vec_id, ev, round(1 - "
        f"list_dot_product(ev[1:{prefix}], {qp_sql}) / "
        f"(sqrt(list_dot_product(ev[1:{prefix}], ev[1:{prefix}])) * {np_!r}), 6) "
        "+ 0.0 AS pd FROM e), "
        f"c AS (SELECT * FROM p ORDER BY pd, vec_id LIMIT {overfetch}), "
        f"f AS (SELECT vec_id, pd, round(1 - "
        f"list_dot_product(ev, {_QVEC_SQL}) / "
        f"(sqrt(list_dot_product(ev, ev)) * {nf!r}), 6) + 0.0 AS d FROM c) "
        f"SELECT vec_id, pd AS prefix_distance, d AS _distance FROM f "
        f"ORDER BY d, vec_id LIMIT {k}"
    )


@register("knn_matryoshka_topk", oracle=_matryoshka_oracle_sql())
def q_knn_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-phase retrieval (MRL, NeurIPS'22): coarse scan on
    the first 16 of 64 dimensions (4x fewer multiply-adds per row),
    top-50 candidates, exact full-dim cosine rescore to top-10 — the
    index-free pruning family next to LSH/IVF and PQ/BQ; the entire
    cascade incl. candidate selection is deterministic and mirrored in
    SQL."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.similarity import matryoshka_topk

    emb = _load(spark, sf_dir, "embeddings")
    out = matryoshka_topk(
        emb, "vec_id", "embedding", QVEC, prefix_dim=16, overfetch=50, k=10
    )
    return out.select(
        "vec_id",
        (F.col("prefix_distance") + F.lit(0.0)).alias("prefix_distance"),
        (F.col("_distance") + F.lit(0.0)).alias("_distance"),
    )


# ---------------------------------------------------------------------------
# Round-6 continuation (third session): graph/skyline/SCD2/geo-pair/CUBE
# analytics depth

@register(
    "graph_triangle_count",
    oracle=(
        # independent evaluation: sorted-triple enumeration (x<y<z),
        # not the engine's degree-ordered orientation
        # MATERIALIZED: e is referenced three times — inlined, DuckDB
        # re-runs (and mis-plans) the 4-way fact join per mention and
        # spills at sf1
        "WITH raw AS MATERIALIZED (SELECT c.c_nationkey AS cn, "
        "s.s_nationkey AS sn "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey), "
        "e AS MATERIALIZED (SELECT DISTINCT least(cn, sn) AS a, "
        "greatest(cn, sn) AS b "
        "FROM raw WHERE cn <> sn), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        "FROM e e1 JOIN e e2 ON e2.a = e1.b "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
        "v AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
        "UNION ALL SELECT z FROM tri) "
        "SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS triangles "
        "FROM v JOIN nation ON n_nationkey = node GROUP BY n_name"
    ),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected nation trade graph
    (same edge derivation as graph_pagerank_trade). Degree-ordered
    orientation generates each triangle exactly once with O(m^1.5)
    wedge work — the hub-safe shape at 100 TB; the oracle re-counts by
    sorted-triple enumeration, a genuinely different algorithm."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.graph import triangle_counts

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
    )
    tri = triangle_counts(edges, "src", "dst")
    return tri.join(
        F.broadcast(nation), tri["node"] == nation["n_nationkey"]
    ).select(F.col("n_name").alias("nation"), "triangles")


@register(
    "part_skyline_pareto",
    oracle=(
        # independent evaluation: quadratic NOT-EXISTS dominance test,
        # not the engine's sort-sweep
        "SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size "
        "FROM part p WHERE NOT EXISTS ("
        "SELECT 1 FROM part q "
        "WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size "
        "AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))"
    ),
)
def q_part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator (Börzsönyi et al. ICDE'01):
    parts where no other part is cheaper-or-equal AND larger-or-equal
    with one strict. The engine sweeps a running max over the collapsed
    distinct-price frame (never an all-pairs dominance join); the
    oracle IS the quadratic dominance definition."""
    from weaviate_spark.operators.analytics import pareto_frontier

    part = _load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    return pareto_frontier(part, minimize="p_retailprice", maximize="p_size")


@register(
    "scd2_event_type_history",
    oracle=(
        "WITH c AS (SELECT user_id, event_type, ts, event_id, "
        "lag(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS pe, "
        "row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), "
        "ch AS (SELECT user_id, event_type, ts, event_id FROM c "
        "WHERE rn = 1 OR pe IS DISTINCT FROM event_type) "
        "SELECT user_id, event_type, ts AS valid_from, "
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS valid_to, "
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "IS NULL AS is_current FROM ch"
    ),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the event stream: per user,
    consecutive same-type events collapse and each change point opens a
    half-open validity interval; the open row is flagged current. One
    exchange (both windows share key+sort); the warehouse pattern for
    maintaining dimension history out of a CDC/event feed."""
    from weaviate_spark.operators.analytics import scd2_intervals

    ev = _load(spark, sf_dir, "events")
    return scd2_intervals(
        ev, key="user_id", ts="ts", attr="event_type", tiebreak="event_id"
    )


@register(
    "geo_neighbor_pairs",
    oracle=(
        # independent evaluation: brute-force all-pairs haversine
        "WITH geo AS (SELECT c_custkey, "
        "  35 + (c_custkey % 30) + 0.5 AS lat, (c_custkey % 60) - 15 + 0.5 AS lon "
        "FROM customer WHERE c_custkey % 37 = 0) "
        "SELECT a.c_custkey AS key_1, b.c_custkey AS key_2, "
        "round(2 * 6371000.0 * asin(sqrt("
        "  pow(sin(radians(b.lat - a.lat) / 2), 2) + "
        "  cos(radians(a.lat)) * cos(radians(b.lat)) * "
        "  pow(sin(radians(b.lon - a.lon) / 2), 2))), 3) AS distance_m "
        "FROM geo a JOIN geo b ON a.c_custkey < b.c_custkey "
        "WHERE 2 * 6371000.0 * asin(sqrt("
        "  pow(sin(radians(b.lat - a.lat) / 2), 2) + "
        "  cos(radians(a.lat)) * cos(radians(b.lat)) * "
        "  pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 400000"
    ),
)
def q_geo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-radius geo self-join over the deterministic
    synthetic coordinates of a 1-in-37 customer sample (400 km): grid-cell
    blocking sized from the corpus's max |lat| guarantees every
    within-radius partner is in the 3x3 cell neighborhood, so
    candidates are O(n·density) — the oracle runs the O(n²) brute
    force the engine must never plan."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import radius_pairs

    cust = (
        _load(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 37 == 0)
        .select(
            "c_custkey",
            (35 + (F.col("c_custkey") % 30) + 0.5).cast("double").alias("lat"),
            ((F.col("c_custkey") % 60) - 15 + 0.5).cast("double").alias("lon"),
        )
    )
    out = radius_pairs(cust, key="c_custkey", lat="lat", lon="lon", radius_m=400_000.0)
    return out.select(
        "key_1", "key_2",
        (F.round("distance_m", 3) + F.lit(0.0)).alias("distance_m"),
    )


@register(
    "agg_cube_orders",
    oracle=(
        "SELECT o_orderstatus AS status, o_orderpriority AS priority, "
        "CAST(grouping(o_orderstatus) AS BIGINT) AS g_status, "
        "CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority, "
        "CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
        "AS total_sum "
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"
    ),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders (status × priority): all four
    grouping combinations in one pass with GROUPING indicators —
    completes the grouping-sets family next to agg_rollup_region_nation;
    money sums DECIMAL-exact so every subtotal is partition-order
    independent."""
    from pyspark.sql import functions as F

    orders = _load(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
    )
    return orders.cube("status", "priority").agg(
        F.grouping("status").cast("long").alias("g_status"),
        F.grouping("priority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_sum"),
    )


@register(
    "sketch_hll_daily_merge",
    oracle=(
        # weekly registers computed once; merged-from-daily and direct
        # estimates coincide BY ALGEBRA (max-merge of daily maxima ==
        # weekly maxima), which is the mergeability property under test
        "WITH hh AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week, "
        "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h "
        "FROM events WHERE user_id IS NOT NULL), "
        "r AS (SELECT week, h >> 48 AS reg, "
        "CASE WHEN (h & ((1::BIGINT << 48) - 1)) = 0 THEN 49 "
        "ELSE 48 - length(bin(h & ((1::BIGINT << 48) - 1))) + 1 END AS rho "
        "FROM hh), "
        "regs AS (SELECT week, reg, max(rho) AS rho FROM r GROUP BY 1, 2), "
        "a AS (SELECT week, "
        "sum(CAST(power(2.0, 49 - rho) AS DECIMAL(38,0))) AS osum, "
        "count(*) AS nocc FROM regs GROUP BY week), "
        "e AS (SELECT week, CASE WHEN raw <= 2.5 * 4096 AND zeros > 0 "
        "THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END AS est FROM ("
        "SELECT week, 0.7213 / (1.0 + 1.079 / 4096) * 4096 * 4096 "
        "* power(2.0, 49) / CAST(osum + CAST(4096 - nocc AS DECIMAL(38,0)) "
        "* (1::BIGINT << 49) AS DOUBLE) AS raw, "
        "CAST(4096 - nocc AS DOUBLE) AS zeros FROM a)), "
        "x AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS week, "
        "count(DISTINCT user_id) AS exact_users FROM events GROUP BY 1) "
        "SELECT e.week AS week, round(e.est, 4) AS merged_estimate, "
        "round(e.est, 4) AS direct_estimate, "
        "CAST(x.exact_users AS BIGINT) AS exact_users "
        "FROM e JOIN x ON e.week = x.week"
    ),
)
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL: per-DAY register sketches of distinct users are
    max-merged into weekly estimates and must equal the direct weekly
    sketch — the sketch-at-ingest / merge-at-query shape that answers
    any-period distinct counts at 100 TB from tiny register tables
    instead of event rescans. Exact weekly distincts ride along for
    error visibility."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.sketches import (
        hll_estimate_registers,
        hll_group_registers,
    )

    ev = _load(spark, sf_dir, "events")
    daily = hll_group_registers(
        ev, "user_id", F.to_date(F.col("ts")), "day", p=12
    )
    merged_regs = (
        daily.withColumn(
            "week", F.date_trunc("week", F.col("day")).cast("date")
        )
        .groupBy("week", "_reg")
        .agg(F.max("_rho").alias("_rho"))
    )
    merged = hll_estimate_registers(
        merged_regs, "week", p=12, out="merged_estimate"
    )
    direct = hll_estimate_registers(
        hll_group_registers(
            ev, "user_id", F.date_trunc("week", F.col("ts")).cast("date"),
            "week", p=12,
        ),
        "week", p=12, out="direct_estimate",
    )
    exact = ev.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).agg(F.count_distinct("user_id").alias("exact_users"))
    return merged.join(direct, "week").join(exact, "week").select(
        "week", "merged_estimate", "direct_estimate", "exact_users"
    )


@register(
    "mv_incremental_pricing",
    oracle=(
        # full one-pass recompute — the incremental fold must match it
        # bit-for-bit (DECIMAL accumulators make merge order immaterial)
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) "
        "AS sum_base_price, "
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) "
        "/ count(*), 6) + 0.0 AS avg_qty, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
)
def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintained aggregate view (Gupta & Mumick '95): lineitem
    arrives as four insert batches; each folds O(batch) partial state
    into the view (merge = groupBy over two STATE frames, O(groups)),
    lineage checkpoint-truncated per fold. The finalized view — avg
    derived from DECIMAL sum/count — must equal the oracle's full
    recompute exactly; no history rescan ever happens on the read
    path."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.matview import merge_state, partial_state

    keys = ["l_returnflag", "l_linestatus"]
    measures = {
        "sum_qty": ("sum", "CAST(l_quantity AS DECIMAL(18,2))"),
        "sum_base_price": ("sum", "CAST(l_extendedprice AS DECIMAL(18,2))"),
        "n_rows": ("count", "1"),
        "min_ship": ("min", "l_shipdate"),
        "max_ship": ("max", "l_shipdate"),
    }
    li = _load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_shipdate", "l_orderkey",
    )
    state = None
    for i in range(4):
        batch = li.where(F.pmod(F.col("l_orderkey"), F.lit(4)) == i)
        state = merge_state(
            state, partial_state(batch, keys, measures), keys, measures
        )
    return state.select(
        "l_returnflag", "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        (
            F.round(F.col("sum_qty").cast("double") / F.col("n_rows"), 6)
            + F.lit(0.0)
        ).alias("avg_qty"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "min_ship", "max_ship",
    )


def _ivfpq_oracle_sql(k: int = 10, nprobe: int = 3, overfetch: int = 4) -> str:
    """DuckDB mirror of q_ann_ivfpq_topk: the _ivf_oracle_sql cell
    assignment/probe composed with the _pq_oracle_sql ADC — identical
    6dp centroid/LUT literals at every stage."""
    import numpy as np

    from weaviate_spark.operators.pq_codebook import (
        CODEBOOK, IVF_CENTROIDS, SEG_DIM,
    )
    from weaviate_spark.operators.quantization import pq_lut_py

    def dlist(vals):
        return "[" + ", ".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"

    cell_scores = ", ".join(
        f"-2 * list_dot_product(nv, {dlist(c)}) + {float(np.dot(c, c))!r}"
        for c in IVF_CENTROIDS
    )
    cell_lut = pq_lut_py(QVEC, [IVF_CENTROIDS])[0]
    cells = sorted(range(len(cell_lut)), key=lambda c: (cell_lut[c], c))[:nprobe]
    in_list = ", ".join(str(c) for c in cells)

    seg_parts = []
    for s, C in enumerate(CODEBOOK):
        lo, hi = s * SEG_DIM + 1, (s + 1) * SEG_DIM
        scores = ", ".join(
            f"-2 * list_dot_product(nv[{lo}:{hi}], {dlist(c)}) + "
            f"{float(np.dot(c, c))!r}"
            for c in C
        )
        seg_parts.append((s, f"[{scores}]"))
    lut = pq_lut_py(QVEC, CODEBOOK)
    darr_cols = ", ".join(f"{arr} AS d{s}" for s, arr in seg_parts)
    code_list = ", ".join(
        f"list_position(d{s}, list_min(d{s})) - 1" for s, _ in seg_parts
    )
    adc = " + ".join(
        f"({dlist(lut[s])})[pq[{s + 1}] + 1]" for s in range(len(lut))
    )
    return (
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        "en AS (SELECT vec_id, ev, "
        "list_transform(ev, x -> x / sqrt(list_dot_product(ev, ev))) AS nv FROM e), "
        f"assign AS (SELECT vec_id, ev, nv, [{cell_scores}] AS cd FROM en), "
        "probed AS (SELECT vec_id, ev, nv FROM assign "
        f"WHERE list_position(cd, list_min(cd)) - 1 IN ({in_list})), "
        f"dists AS (SELECT vec_id, ev, {darr_cols} FROM probed), "
        f"codes AS (SELECT vec_id, ev, [{code_list}] AS pq FROM dists), "
        f"cand AS (SELECT vec_id, ev, {adc} AS _adc FROM codes "
        f"ORDER BY _adc ASC, vec_id ASC LIMIT {overfetch * k}) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        f"FROM cand CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT {k}"
    )


@register("ann_ivfpq_topk", oracle=_ivfpq_oracle_sql())
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN (the IVFADC shape, Jégou et al. TPAMI'11;
    the reference pairs its coarse index with PQ compression the same
    way): one persisted table carries coarse cell + PQ codes, search
    probes 3 of 16 cells, ADC-ranks only their members (8 lookups/row),
    exact cosine rescore of 40 candidates. Both pruning dimensions
    compound — cells cut what is scanned, codes cut what a scan costs —
    and the entire cascade is hash-checked against the composed
    oracle."""
    from weaviate_spark.operators.quantization import ivfpq_topk

    return ivfpq_topk(
        spark, sf_dir, "embeddings", QVEC, id_col="vec_id",
        k=10, nprobe=3, overfetch=4, table_key=(sf_dir, "embeddings"),
    )


def _wordpiece_oracle_sql(steps: int = 12, max_len: int = 4) -> str:
    """Unrolled greedy WordPiece in pure DuckDB SQL: the same
    frequency-threshold vocab, then ``steps`` max-munch steps over the
    distinct-word frame (each step = longest vocab match via length-
    ordered LEFT JOINs, single-char fallback), then doc reassembly.
    ``steps`` bounds word length; the corpus tokenizer regex yields
    words <= 8 chars at every SF."""
    vjoin = " ".join(
        f"LEFT JOIN vocab v{l} ON v{l}.tl = {l} AND "
        f"v{l}.form = CASE WHEN e.pos = 1 THEN 'i' ELSE 'c' END AND "
        f"v{l}.tok = substr(e.word, e.pos, {l})"
        for l in range(max_len, 1, -1)
    )
    adv = "CASE " + " ".join(
        f"WHEN v{l}.tok IS NOT NULL THEN {l}" for l in range(max_len, 1, -1)
    ) + " ELSE 1 END"
    piece = "coalesce(" + ", ".join(
        f"v{l}.tok" for l in range(max_len, 1, -1)
    ) + ", substr(e.word, e.pos, 1))"
    parts = [
        "WITH wc AS (SELECT word, count(*) AS cnt FROM "
        "(SELECT unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS word "
        "FROM documents) GROUP BY word)",
        "tot AS (SELECT sum(cnt) AS t FROM wc)",
        "subs AS (SELECT CASE WHEN i = 1 THEN 'i' ELSE 'c' END AS form, "
        "substr(word, i, l) AS tok, sum(cnt) AS c "
        "FROM wc, LATERAL unnest(range(1, len(word) + 1)) AS u(i), "
        f"LATERAL unnest(range(2, {max_len + 1})) AS v(l) "
        "WHERE i + l - 1 <= len(word) GROUP BY 1, 2)",
        "vocab AS (SELECT form, tok, len(tok) AS tl FROM subs, tot "
        "WHERE c >= 0.01 * t)",
        "s0 AS (SELECT word, 1 AS pos, ''::VARCHAR AS toks FROM wc)",
    ]
    for k in range(1, steps + 1):
        parts.append(
            f"s{k} AS (SELECT e.word, "
            f"CASE WHEN e.pos > len(e.word) THEN e.pos "
            f"ELSE e.pos + {adv} END AS pos, "
            f"CASE WHEN e.pos > len(e.word) THEN e.toks "
            f"ELSE e.toks || CASE WHEN e.pos = 1 THEN '' ELSE ' ##' END || "
            f"CASE WHEN e.pos = 1 THEN {piece} ELSE "
            f"CASE WHEN {adv} = 1 THEN substr(e.word, e.pos, 1) ELSE {piece} END END "
            f"END AS toks "
            f"FROM s{k-1} e {vjoin})"
        )
    parts.append(
        f"wpv AS (SELECT word, toks, len(string_split(toks, ' ')) AS ntoks "
        f"FROM s{steps})"
    )
    parts.append(
        "dw AS (SELECT doc_id, tt[i] AS word, i FROM "
        "(SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt "
        "FROM documents), LATERAL unnest(range(1, len(tt) + 1)) AS u(i))"
    )
    parts.append(
        "enc AS (SELECT dw.doc_id, dw.i, v.toks, v.ntoks FROM dw "
        "JOIN wpv v USING (word))"
    )
    return (
        ", ".join(parts)
        + " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(ntoks) AS BIGINT) AS n_wp_tokens, "
        "string_agg(toks, ' ' ORDER BY i) AS wp_text "
        "FROM enc GROUP BY doc_id"
    )


@register("tokenizer_wordpiece_encode", oracle=_wordpiece_oracle_sql())
def q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match encode (Wu et al. 2016; the
    max-munch family next to the BPE merge-fold): vocabulary =
    frequency-thresholded word substrings in initial / '##'-
    continuation forms, derived from the corpus itself; every document
    re-tokenizes via the distinct-word domain (Arrow-batched greedy
    over thousands of words, never per-token-occurrence Python) and one
    word-key join. Oracle unrolls the identical max-munch recurrence in
    SQL."""
    from weaviate_spark.operators.tokenizer_train import (
        wordpiece_encode_docs,
        wordpiece_vocab,
    )

    docs = _load(spark, sf_dir, "documents")
    vocab = {
        (r["form"], r["tok"])
        for r in wordpiece_vocab(docs, max_len=4, min_frac=0.01).collect()
    }
    return wordpiece_encode_docs(docs, vocab, "doc_id", "text", max_len=4)


_BBIT_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}]+') AS tt FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id AS _doc, array_to_string(list_slice(tt, i, i + 2), ' ') AS _shingle
  FROM toks, LATERAL unnest(range(1, greatest(len(tt) - 2, 0) + 1)) AS u(i)
  WHERE len(tt) >= 3
),
km AS (
  SELECT _doc,
    ('0x' || substr(md5(_shingle), 1, 14))::BIGINT AS _h1,
    ('0x' || substr(md5(_shingle), 15, 14))::BIGINT AS _h2
  FROM sh
),
mh AS (
  SELECT _doc, i AS _i, min(_h1 + i * _h2) % 256 AS _v
  FROM km, LATERAL unnest(range(0, 16)) AS t(i)
  GROUP BY _doc, i
),
bands AS (
  SELECT _doc, CAST(_i // 4 AS INT) AS _band,
    md5(string_agg(CAST(_i AS VARCHAR) || ':' || CAST(_v AS VARCHAR), ',' ORDER BY _i)) AS _bucket
  FROM mh GROUP BY _doc, CAST(_i // 4 AS INT)
),
cand AS (
  SELECT a._doc AS _a, b._doc AS _b
  FROM bands a JOIN bands b ON a._band = b._band AND a._bucket = b._bucket AND a._doc < b._doc
  GROUP BY 1, 2
),
sizes AS (SELECT _doc, count(*) AS _sz FROM sh GROUP BY _doc),
inter AS (
  SELECT c._a, c._b, count(*) AS _inter
  FROM cand c
  JOIN sh sa ON sa._doc = c._a
  JOIN sh sb ON sb._doc = c._b AND sb._shingle = sa._shingle
  GROUP BY c._a, c._b
),
jac AS (
  SELECT i._a, i._b,
    round(CAST(i._inter AS DOUBLE) / (sa._sz + sb._sz - i._inter), 6) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa._doc = i._a
  JOIN sizes sb ON sb._doc = i._b
  WHERE CAST(i._inter AS DOUBLE) / (sa._sz + sb._sz - i._inter) >= {thr}
),
m AS (
  SELECT j._a, j._b, count(*) FILTER (va._v = vb._v) AS _m
  FROM jac j
  JOIN mh va ON va._doc = j._a
  JOIN mh vb ON vb._doc = j._b AND vb._i = va._i
  GROUP BY j._a, j._b
)
SELECT j._a AS id_a, j._b AS id_b, j.jaccard,
  CAST(m._m AS INT) AS bbit_match,
  round((m._m / 16.0 - 1.0/256) / (1.0 - 1.0/256), 6) + 0.0 AS jaccard_bbit_est
FROM jac j JOIN m ON m._a = j._a AND m._b = j._b
"""


@register("dedup_minhash_bbit", oracle=_BBIT_SQL.format(thr=0.35))
def q_dedup_minhash_bbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit minwise hashing (Li & König WWW'10): banding and matching
    run entirely on the low 8 bits of each of 16 minhashes — an 8x
    smaller signature table through every shuffle, recall >= the
    full-width LSH by construction (collisions only merge buckets) —
    with the paper's collision-corrected similarity estimator emitted
    next to the exact verify. md5 arithmetic bit-identical in SQL."""
    from weaviate_spark.operators.dedup import minhash_bbit_pairs

    df = _load(spark, sf_dir, "documents")
    return minhash_bbit_pairs(
        df, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
        b_bits=8, jaccard_threshold=0.35, max_bucket_size=1_000_000,
        table_key=(sf_dir, "documents"),
    )


@register(
    "events_markov_transitions",
    oracle=(
        "WITH seq AS (SELECT user_id, event_type, "
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS next_type FROM events), "
        "c AS (SELECT event_type, next_type, count(*) AS n FROM seq "
        "WHERE next_type IS NOT NULL GROUP BY 1, 2), "
        "t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1) "
        "SELECT c.event_type AS from_type, c.next_type AS to_type, "
        "CAST(c.n AS BIGINT) AS n_transitions, "
        "round(c.n / CAST(t.tot AS DOUBLE), 6) AS p_transition "
        "FROM c JOIN t ON t.event_type = c.event_type"
    ),
)
def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | current) — the behavioral model behind
    next-action prediction and funnel anomaly scoring. One exchange on
    user for the lag, one tiny groupBy on the (from, to) pairs; row
    normalization joins against the 5x5 margin, broadcast at any
    scale."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    c = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "event_type").select(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("n") / F.col("tot").cast("double"), 6).alias(
            "p_transition"
        ),
    )


@register(
    "events_ewma_daily",
    oracle=(
        "WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) "
        "AS day, sum(value) AS v FROM events GROUP BY 1, 2), "
        "anch AS (SELECT event_type, max(day) AS mx FROM d GROUP BY 1), "
        "wd AS (SELECT d.event_type, d.day, d.v, "
        "power(0.8, date_diff('day', d.day, a.mx)) AS wt "
        "FROM d JOIN anch a USING (event_type)), "
        "a AS (SELECT event_type, day, v, "
        "sum(v * wt) OVER (PARTITION BY event_type ORDER BY day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS num, "
        "sum(wt) OVER (PARTITION BY event_type ORDER BY day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS den "
        "FROM wd) "
        "SELECT event_type, day, round(v, 6) + 0.0 AS day_value, "
        "round(num / den, 6) + 0.0 AS ewma "
        "FROM a"
    ),
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event value per
    type (decay 0.8/day): the time-decay smoother behind trend lines
    and alerting baselines. The recurrence is re-anchored as
    weight = decay^(anchor - day), so EWMA = running weighted sum /
    running weight sum — two cumulative windows over the same
    partition+sort (one exchange), no iterative fold, numerically
    identical across partitionings at 6dp."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum("value").alias("v"))
    anchor = F.max("day").over(Window.partitionBy("event_type"))
    wgt = F.pow(F.lit(0.8), F.datediff(anchor, F.col("day")))
    cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    a = (
        d.withColumn("_w", wgt)
        .withColumn("_num", F.sum(F.col("v") * F.col("_w")).over(cum))
        .withColumn("_den", F.sum("_w").over(cum))
    )
    return a.select(
        "event_type", "day",
        (F.round("v", 6) + F.lit(0.0)).alias("day_value"),
        (F.round(F.col("_num") / F.col("_den"), 6) + F.lit(0.0)).alias("ewma"),
    )


def _sssp_oracle_sql(iterations: int = 4) -> str:
    """Unrolled Bellman-Ford over the nation trade graph (MATERIALIZED
    per step — DuckDB inlines CTE references otherwise and the edge
    derivation would re-run per mention)."""
    parts = [
        "WITH raw AS MATERIALIZED (SELECT c.c_nationkey AS cn, "
        "s.s_nationkey AS sn, count(*) AS cnt "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "GROUP BY 1, 2)",
        "e AS MATERIALIZED (SELECT cn AS s, sn AS d, 1.0 / cnt AS w FROM raw)",
        "d0 AS MATERIALIZED (SELECT 0 AS n, 0.0 AS dist)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT n, min(dist) AS dist FROM ("
            f"SELECT n, dist FROM d{i-1} "
            f"UNION ALL "
            f"SELECT e.d AS n, p.dist + e.w AS dist "
            f"FROM d{i-1} p JOIN e ON e.s = p.n) GROUP BY n)"
        )
    return (
        ", ".join(parts)
        + f" SELECT n_name AS nation, round(dist, 6) + 0.0 AS distance "
        f"FROM d{iterations} JOIN nation ON n_nationkey = n"
    )


@register("graph_sssp_trade", oracle=_sssp_oracle_sql(4))
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths from nation 0 over the
    trade graph (edge weight = 1/trade-count, so heavy trade = short
    hop): 4 Bellman-Ford rounds — the min-plus Pregel loop next to
    pagerank's sum-times loop; the heavy work at 100 TB is the one-time
    edge aggregation, each round then touches only the 25-node frame.
    Oracle unrolls the identical relaxation as MATERIALIZED CTEs."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.graph import sssp

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg((F.lit(1.0) / F.count(F.lit(1))).alias("w"))
    )
    d = sssp(e, "src", "dst", "w", source=0, iterations=4)
    return d.join(
        F.broadcast(nation), d["node"] == nation["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        (F.round("distance", 6) + F.lit(0.0)).alias("distance"),
    )


def _ann_multiprobe_oracle_sql(k: int = 10, num_planes: int = 8,
                               n_probes: int = 8, dim: int = 64,
                               seed: int = 42) -> str:
    """Mirror of q_ann_lsh_multiprobe: identical plane constants and
    signature arithmetic; the query-directed probe sequence is a
    deterministic function of the query and inlines as literals."""
    from weaviate_spark.operators.similarity import (
        hyperplanes, multiprobe_sequence,
    )

    planes = hyperplanes(num_planes, dim, seed)
    seq = multiprobe_sequence(QVEC, planes, n_probes)
    bucket_list = ", ".join(f"'{b}'" for b in seq)

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"

    sig_expr = " || ".join(
        f"(CASE WHEN list_dot_product(ev, {arr(p)}) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    return (
        "WITH e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings), "
        f"s AS (SELECT vec_id, ev, {sig_expr} AS _sig FROM e), "
        f"cand AS (SELECT * FROM s WHERE _sig IN ({bucket_list})), "
        f"q AS (SELECT {_QVEC_SQL} AS qv) "
        f"SELECT vec_id, {_COS_SQL} AS _distance "
        "FROM cand CROSS JOIN q "
        f"ORDER BY _distance ASC, vec_id ASC LIMIT {k}"
    )


@register("ann_lsh_multiprobe", oracle=_ann_multiprobe_oracle_sql())
def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-directed multi-probe LSH (Lv et al. VLDB'07): probe the
    8 buckets ranked by summed |margin| of their flipped planes instead
    of the whole Hamming-1 ball — the planes the query barely cleared
    are where true neighbors hide, so recall holds at a fraction of the
    probed buckets. Probe sequence, signatures, and rescore all
    hash-checked."""
    from weaviate_spark.operators.similarity import (
        build_lsh_index, multiprobe_topk,
    )

    emb = _load(spark, sf_dir, "embeddings")
    idx = build_lsh_index(emb, "vec_id", "embedding", num_planes=8, dim=64)
    return multiprobe_topk(
        idx, QVEC, "vec_id", "embedding", k=10, num_planes=8, n_probes=8
    )


@register(
    "market_basket_brand_lift",
    oracle=(
        "WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b "
        "FROM lineitem JOIN part ON l_partkey = p_partkey), "
        "n AS (SELECT count(DISTINCT o) AS total FROM ob), "
        "sup AS (SELECT b, count(*) AS nb FROM ob GROUP BY b), "
        "pairs AS (SELECT a.b AS brand_a, c.b AS brand_b, count(*) AS n_ab "
        "FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b GROUP BY 1, 2), "
        "f AS (SELECT brand_a, brand_b, n_ab FROM pairs WHERE n_ab >= 50) "
        "SELECT f.brand_a, f.brand_b, CAST(f.n_ab AS BIGINT) AS n_ab, "
        "round(CAST(f.n_ab AS DOUBLE) / n.total, 6) AS support, "
        "round(CAST(f.n_ab AS DOUBLE) * n.total / (sa.nb * sb.nb), 6) AS lift "
        "FROM f JOIN sup sa ON sa.b = f.brand_a "
        "JOIN sup sb ON sb.b = f.brand_b CROSS JOIN n"
    ),
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift (the A-Priori support/
    confidence family): brand pairs sharing an order, min-support
    pruned. Scale shape: the distinct (order, brand) frame bounds the
    pair explosion to C(brands-per-order, 2) per order — never a
    catalog-level cross join — and the brand dimension (margin counts)
    broadcasts; one shuffle on the order key builds every pair."""
    from pyspark.sql import functions as F

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    from weaviate_spark.cache import register_cache

    ob = register_cache(ob.cache())
    total = ob.agg(F.count_distinct("o").alias("total"))
    sup = ob.groupBy("b").agg(F.count(F.lit(1)).alias("nb"))
    # posting-list pair emission (the link-prediction / item-item
    # shape): one groupBy of the cached (order, brand) frame + a double
    # explode, instead of shuffling it once per self-join side — ob is
    # distinct, so collect_set equals the join's row set and the pair
    # multiset is identical
    plist = ob.groupBy("o").agg(F.collect_set("b").alias("_bs")).where(
        F.size("_bs") >= 2
    )
    pairs = (
        plist.select(F.explode("_bs").alias("brand_a"), "_bs")
        .select("brand_a", F.explode("_bs").alias("brand_b"))
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 50)
    )
    sa = sup.select(F.col("b").alias("brand_a"), F.col("nb").alias("_na"))
    sb = sup.select(F.col("b").alias("brand_b"), F.col("nb").alias("_nb"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a", "brand_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(F.col("n_ab").cast("double") / F.col("total"), 6).alias("support"),
            F.round(
                F.col("n_ab").cast("double") * F.col("total")
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "events_sessionize_gap",
    oracle=(
        "WITH r AS (SELECT user_id, ts, event_id, "
        "CAST(value AS DECIMAL(18,2)) AS v, epoch_us(ts) AS t, "
        "lag(epoch_us(ts)) OVER "
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev "
        "FROM events), "
        "f AS (SELECT *, CASE WHEN prev IS NULL OR t - prev > 1800000000 "
        "THEN 1 ELSE 0 END AS nw FROM r), "
        "s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id "
        "ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM f) "
        "SELECT user_id, CAST(sess AS BIGINT) AS session_idx, "
        "min(ts) AS session_start, max(ts) AS session_end, "
        "round((max(t) - min(t)) / 1000000.0, 6) + 0.0 AS duration_s, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(v) AS DOUBLE) AS total_value "
        "FROM s GROUP BY user_id, sess"
    ),
)
def q_events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap sessionization (30-min idle boundary): the batch twin
    of the streaming session window, lag+running-sum over one user-key
    shuffle. Session boundaries, durations, and DECIMAL-exact value
    totals all hash-checked; time arithmetic is integer microseconds
    end-to-end."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.analytics import sessionize

    out = sessionize(_load(spark, sf_dir, "events"), gap_minutes=30)
    return out.withColumn("session_idx", F.col("session_idx").cast("long"))


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle_sql() -> str:
    cols = _CORR_COLS
    aggs = ["count(*) AS n"]
    for c in cols:
        aggs.append(
            f"CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c}"
        )
        aggs.append(
            f"CAST(sum(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2))) "
            f"AS DOUBLE) AS q_{c}"
        )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(
            f"CAST(sum(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) "
            f"AS DOUBLE) AS p_{a}__{b}"
        )
    sel = []
    for a, b in pairs:
        num = f"(CAST(n AS DOUBLE) * p_{a}__{b} - s_{a} * s_{b})"
        den = (
            f"sqrt((CAST(n AS DOUBLE) * q_{a} - s_{a} * s_{a}) * "
            f"(CAST(n AS DOUBLE) * q_{b} - s_{b} * s_{b}))"
        )
        sel.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"CAST(n AS BIGINT) AS n, "
            f"round({num} / {den}, 6) + 0.0 AS pearson_r FROM agg"
        )
    return (
        "WITH agg AS (SELECT " + ", ".join(aggs) + " FROM lineitem) "
        + " UNION ALL ".join(sel)
    )


@register("profile_numeric_correlations", oracle=_corr_oracle_sql())
def q_profile_numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem money/
    quantity columns: every co-moment from ONE single-pass aggregate
    (map-side combined), unpivoted to pair rows. DECIMAL-exact sums
    make the closed-form r bit-identical across engines."""
    from weaviate_spark.operators.analytics import numeric_correlations

    return numeric_correlations(_load(spark, sf_dir, "lineitem"), _CORR_COLS)


@register(
    "forecast_ols_trend",
    oracle=(
        "WITH daily AS (SELECT c_nationkey AS g, CAST(o_orderdate AS DATE) AS d, "
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS y "
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2), "
        "series AS (SELECT g, d, y, min(d) OVER (PARTITION BY g) AS d0 FROM daily), "
        "xs AS (SELECT g, y, CAST(d - d0 AS BIGINT) AS x, d FROM series), "
        "fit AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days, "
        "CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy, "
        "CAST(sum(x * y) AS DOUBLE) AS sxy, CAST(sum(x * x) AS DOUBLE) AS sxx, "
        "max(x) AS xmax, max(d) AS dmax FROM xs GROUP BY g), "
        "sl AS (SELECT *, (CAST(n_days AS DOUBLE) * sxy - sx * sy) / "
        "(CAST(n_days AS DOUBLE) * sxx - sx * sx) AS slope FROM fit), "
        "ic AS (SELECT *, (sy - slope * sx) / CAST(n_days AS DOUBLE) AS icept FROM sl) "
        "SELECT g AS c_nationkey, n_days, round(slope, 6) + 0.0 AS slope, "
        "round(icept, 6) + 0.0 AS intercept, "
        "dmax + 7 AS forecast_date, "
        "round(icept + slope * CAST(xmax + 7 AS DOUBLE), 6) + 0.0 AS forecast_value "
        "FROM ic"
    ),
)
def q_forecast_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend over daily order revenue with a 7-day-out
    point forecast: two shuffles total (daily series, then the five
    OLS sufficient statistics per group) — closed-form regression, no
    iteration, exact decimal/integer sums feeding identical double
    math in both engines."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.analytics import ols_trend_forecast

    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    out = ols_trend_forecast(
        joined, "c_nationkey", "o_orderdate", "o_totalprice", horizon_days=7
    )
    return out


@register(
    "validate_expectations",
    oracle=(
        "WITH agg AS (SELECT count(*) AS n, "
        "sum(CASE WHEN o_orderkey > 0 THEN 0 ELSE 1 END) AS v_orderkey_positive, "
        "sum(CASE WHEN o_totalprice > 0 AND o_totalprice < 1000000 "
        "THEN 0 ELSE 1 END) AS v_totalprice_range, "
        "sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) "
        "AS v_status_domain, "
        "sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') "
        "THEN 0 ELSE 1 END) AS v_priority_format, "
        "sum(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END) "
        "AS v_orderdate_not_null FROM orders) "
        "SELECT rule, CAST(n AS BIGINT) AS n_rows, "
        "CAST(v AS BIGINT) AS n_violations, "
        "round(CAST(v AS DOUBLE) / n, 6) + 0.0 AS violation_frac, "
        "v = 0 AS passed FROM (SELECT 'orderkey_positive' AS rule, "
        "v_orderkey_positive AS v, n FROM agg "
        "UNION ALL SELECT 'totalprice_range', v_totalprice_range, n FROM agg "
        "UNION ALL SELECT 'status_domain', v_status_domain, n FROM agg "
        "UNION ALL SELECT 'priority_format', v_priority_format, n FROM agg "
        "UNION ALL SELECT 'orderdate_not_null', v_orderdate_not_null, n FROM agg)"
    ),
)
def q_validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation over orders: five expectations (key
    positivity, price range, status domain, priority format, date
    non-null) folded into ONE full-table aggregate — adding a rule
    adds a column, never a rescan."""
    from weaviate_spark.operators.analytics import validate_expectations

    rules = [
        ("orderkey_positive", "o_orderkey > 0"),
        ("totalprice_range", "o_totalprice > 0 AND o_totalprice < 1000000"),
        ("status_domain", "o_orderstatus IN ('O', 'F', 'P')"),
        ("priority_format", "o_orderpriority RLIKE '^[1-5]-'"),
        ("orderdate_not_null", "o_orderdate IS NOT NULL"),
    ]
    return validate_expectations(_load(spark, sf_dir, "orders"), rules)


_RECO_INTERACTIONS_SQL = (
    "SELECT o_custkey AS u, p_brand AS i, "
    "CAST(count(*) AS DECIMAL(18,2)) AS r "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "JOIN part ON l_partkey = p_partkey GROUP BY 1, 2"
)

_RECO_NEIGHBORS_SQL = (
    f"r AS MATERIALIZED ({_RECO_INTERACTIONS_SQL}), "
    "norms AS (SELECT i, sum(r * r) AS sq FROM r GROUP BY i), "
    "num AS (SELECT a.i AS item_a, b.i AS item_b, "
    "CAST(count(*) AS BIGINT) AS n_co_users, sum(a.r * b.r) AS dot "
    "FROM r a JOIN r b ON a.u = b.u AND a.i <> b.i "
    "GROUP BY 1, 2 HAVING count(*) >= 2), "
    "cos AS (SELECT item_a, item_b, n_co_users, "
    "round(CAST(dot AS DOUBLE) / sqrt(CAST(na.sq AS DOUBLE) "
    "* CAST(nb.sq AS DOUBLE)), 6) + 0.0 AS cosine "
    "FROM num JOIN norms na ON na.i = item_a "
    "JOIN norms nb ON nb.i = item_b), "
    "rk AS (SELECT *, row_number() OVER (PARTITION BY item_a "
    "ORDER BY cosine DESC, item_b ASC) AS nrank FROM cos), "
    "nb5 AS (SELECT item_a, item_b, n_co_users, cosine, nrank "
    "FROM rk WHERE nrank <= 5)"
)


@register(
    "reco_item_item_cosine",
    oracle=(
        f"WITH {_RECO_NEIGHBORS_SQL} "
        'SELECT item_a, item_b, n_co_users, cosine, '
        'CAST(nrank AS BIGINT) AS "rank" FROM nb5'
    ),
)
def q_reco_item_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-5 most-similar brands per
    brand by cosine over sparse per-customer interaction counts. The
    pair numerator self-joins on the USER key (bounded by items-per-
    user, never |catalog|²); norms broadcast; DECIMAL-exact co-moments
    make the cosine bit-identical cross-engine."""
    from weaviate_spark.operators.reco import item_item_cosine

    inter = _reco_interactions(spark, sf_dir)
    return item_item_cosine(inter, "u", "i", "r", k=5, min_co_users=2)


def _reco_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    part = _load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("o_custkey").alias("u"), F.col("p_brand").alias("i"))
        .agg(F.count(F.lit(1)).cast("decimal(18,2)").alias("r"))
    )


@register(
    "reco_user_topn",
    oracle=(
        f"WITH {_RECO_NEIGHBORS_SQL}, "
        "hist AS (SELECT * FROM r WHERE u % 50 = 0), "
        "scored AS (SELECT hist.u, nb5.item_b AS j, "
        "round(sum(nb5.cosine * CAST(hist.r AS DOUBLE)), 6) AS score "
        "FROM hist JOIN nb5 ON hist.i = nb5.item_a GROUP BY 1, 2), "
        "fresh AS (SELECT scored.* FROM scored LEFT JOIN hist "
        "ON scored.u = hist.u AND scored.j = hist.i WHERE hist.u IS NULL), "
        "urk AS (SELECT *, row_number() OVER (PARTITION BY u "
        "ORDER BY score DESC, j ASC) AS nrank FROM fresh) "
        "SELECT u, j AS recommended_item, score + 0.0 AS score, "
        'CAST(nrank AS BIGINT) AS "rank" FROM urk WHERE nrank <= 3'
    ),
)
def q_reco_user_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User top-3 recommendations from the pruned item-item neighbor
    table: score(u, j) = Σ_{i∈history} cos(i, j)·r_ui over unseen
    items only (left-anti on the history). Neighbor table broadcasts
    (k·|items| rows); one shuffle on the user key. Scored users
    subsampled u%50=0 to bound output."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.reco import item_item_cosine, recommend_items

    inter = _reco_interactions(spark, sf_dir)
    from weaviate_spark.cache import register_cache

    inter = register_cache(inter.cache())
    nb = item_item_cosine(inter, "u", "i", "r", k=5, min_co_users=2)
    hist = inter.where(F.col("u") % 50 == 0)
    return recommend_items(hist, nb, "u", "i", "r", n=3)


def _mi_oracle_sql() -> str:
    """Per-pair MI blocks generated from the same closed formulas as
    categorical_mutual_information; each pair gets its own contingency
    CTE chain (no synthetic row ids — cells come straight from a
    GROUP BY on the joint key)."""
    pairs = [
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderpriority", "o_month"),
        ("o_orderstatus", "o_month"),
    ]
    blocks = []
    sels = []
    for idx, (x, y) in enumerate(pairs):
        blocks.append(
            f"c{idx} AS (SELECT {x} AS x, {y} AS y, "
            f"CAST(count(*) AS DOUBLE) AS c FROM src GROUP BY 1, 2), "
            f"t{idx} AS (SELECT sum(c) AS n FROM c{idx}), "
            f"mx{idx} AS (SELECT x, sum(c) AS cx FROM c{idx} GROUP BY x), "
            f"my{idx} AS (SELECT y, sum(c) AS cy FROM c{idx} GROUP BY y), "
            f"mi{idx} AS (SELECT sum((c / n) * ln((c * n) / (cx * cy))) "
            f"AS misum FROM c{idx} CROSS JOIN t{idx} "
            f"JOIN mx{idx} USING (x) JOIN my{idx} USING (y)), "
            f"hx{idx} AS (SELECT sum(-(cx / n) * ln(cx / n)) AS h "
            f"FROM mx{idx} CROSS JOIN t{idx}), "
            f"hy{idx} AS (SELECT sum(-(cy / n) * ln(cy / n)) AS h "
            f"FROM my{idx} CROSS JOIN t{idx})"
        )
        sels.append(
            f"SELECT '{x}' AS col_x, '{y}' AS col_y, "
            f"round(misum, 6) + 0.0 AS mi_nats, "
            f"round(hx{idx}.h, 6) + 0.0 AS h_x, "
            f"round(hy{idx}.h, 6) + 0.0 AS h_y, "
            f"round(misum / sqrt(hx{idx}.h * hy{idx}.h), 6) + 0.0 AS nmi "
            f"FROM mi{idx} CROSS JOIN hx{idx} CROSS JOIN hy{idx}"
        )
    return (
        "WITH src AS MATERIALIZED (SELECT o_orderpriority, o_orderstatus, "
        "CAST(month(o_orderdate) AS VARCHAR) AS o_month FROM orders), "
        + ", ".join(blocks)
        + " "
        + " UNION ALL ".join(sels)
    )


@register("profile_mutual_information", oracle=_mi_oracle_sql())
def q_profile_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information + normalized MI between categorical column
    pairs of orders (priority/status/order-month): one counting
    shuffle per pair builds the contingency cells; marginals and
    entropies derive from those cells. The feature-redundancy screen
    of a training pipeline."""
    from pyspark.sql import functions as F
    from weaviate_spark.operators.analytics import categorical_mutual_information

    src = _load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        F.month("o_orderdate").cast("string").alias("o_month"),
    )
    return categorical_mutual_information(
        src,
        [
            ("o_orderpriority", "o_orderstatus"),
            ("o_orderpriority", "o_month"),
            ("o_orderstatus", "o_month"),
        ],
    )


@register(
    "corpus_js_divergence",
    oracle=(
        "WITH toks AS (SELECT lang AS g, "
        "unnest(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) AS t "
        "FROM documents), "
        "counts AS MATERIALIZED (SELECT g, t, count(*) AS c "
        "FROM toks GROUP BY 1, 2), "
        "totals AS (SELECT g, sum(c) AS tot FROM counts GROUP BY g), "
        "base AS (SELECT t, c AS cb FROM counts WHERE g = 'en'), "
        "btot AS (SELECT tot AS totb FROM totals WHERE g = 'en'), "
        "others AS (SELECT * FROM counts WHERE g != 'en'), "
        "in_g AS (SELECT others.g, others.t, others.c AS cg, "
        "coalesce(base.cb, 0) AS cb FROM others LEFT JOIN base "
        "ON others.t = base.t), "
        "base_only AS (SELECT gs.g, base.t, 0 AS cg, base.cb "
        "FROM (SELECT DISTINCT g FROM others) gs CROSS JOIN base "
        "LEFT JOIN others ON others.g = gs.g AND others.t = base.t "
        "WHERE others.t IS NULL), "
        "rows_ AS (SELECT * FROM in_g UNION ALL SELECT * FROM base_only), "
        "terms AS (SELECT rows_.g, "
        "CAST(cg AS DOUBLE) / tot AS p, CAST(cb AS DOUBLE) / totb AS q, "
        "cg, cb FROM rows_ JOIN totals ON rows_.g = totals.g CROSS JOIN btot) "
        "SELECT g AS lang, round(sum("
        "CASE WHEN cg > 0 THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END "
        "+ CASE WHEN cb > 0 THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END"
        "), 6) + 0.0 AS js_nats, "
        "CAST(sum(CASE WHEN cg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_group, "
        "CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms_base, "
        "CAST(sum(CASE WHEN cg > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_terms_shared FROM terms GROUP BY g"
    ),
)
def q_corpus_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each language's unigram
    distribution vs the English slice — the corpus-drift monitor for
    new data drops. One (group, term) counting shuffle; union
    vocabulary via left + anti joins on the term key; JS bounded in
    [0, ln 2]."""
    from weaviate_spark.operators.textstats import js_divergence_by_group

    docs = _load(spark, sf_dir, "documents")
    return js_divergence_by_group(docs, "doc_id", "text", "lang", "en")


def _kcore_oracle_sql(k: int = 25, rounds: int = 8) -> str:
    """Unrolled peel mirror of graph.kcore_peel over the
    customer-supplier co-trade bipartite graph (suppliers offset by
    10_000_000 into the shared node space). MATERIALIZED per round —
    DuckDB otherwise re-inlines the shrinking edge CTE per mention."""
    head = (
        "WITH raw AS MATERIALIZED (SELECT DISTINCT o_custkey AS a, "
        "l_suppkey + 10000000 AS b FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey), "
        "e0 AS MATERIALIZED (SELECT a, b FROM raw "
        "UNION SELECT b, a FROM raw)"
    )
    steps = []
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        steps.append(
            f", k{r} AS MATERIALIZED (SELECT a FROM {prev} "
            f"GROUP BY a HAVING count(*) >= {k})"
            f", e{r} AS MATERIALIZED (SELECT {prev}.a, {prev}.b FROM {prev} "
            f"JOIN k{r} USING (a) "
            f"JOIN (SELECT a AS b FROM k{r}) kb USING (b))"
        )
    tail = (
        f" SELECT a AS node, CAST(count(*) AS BIGINT) AS degree "
        f"FROM e{rounds} GROUP BY a HAVING count(*) >= {k}"
    )
    return head + "".join(steps) + tail


@register("graph_kcore_trade", oracle=_kcore_oracle_sql(25, 8))
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=25, 8 peel rounds — fixpoint for this
    corpus, pinned by test) of the customer-supplier co-trade graph:
    the dense-engagement subgraph a marketplace-analytics pass
    extracts. Per round one degree groupBy + two semi-joins on the
    shrinking edge list; localCheckpoint keeps the plan O(1) in
    rounds."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.graph import kcore_peel

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 10_000_000).alias("dst"),
        )
        .distinct()
    )
    return kcore_peel(edges, k=25, rounds=8)


@register(
    "embedding_group_centroids",
    oracle=(
        "WITH e AS (SELECT vec_id, label, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL), "
        "it AS (SELECT vec_id, label, i - 1 AS dim, ev[i] AS val "
        "FROM e, LATERAL unnest(range(1, len(ev) + 1)) AS u(i)), "
        "c AS (SELECT label AS lbl, dim, avg(val) AS mu "
        "FROM it GROUP BY label, dim), "
        "norms AS (SELECT lbl, round(sqrt(sum(mu * mu)), 6) + 0.0 AS cn "
        "FROM c GROUP BY lbl), "
        "d AS (SELECT vec_id, label, "
        "round(sqrt(sum((val - mu) * (val - mu))), 6) + 0.0 AS dd FROM it "
        "JOIN c ON it.label = c.lbl AND it.dim = c.dim "
        "GROUP BY vec_id, label), "
        "rk AS (SELECT *, row_number() OVER (PARTITION BY label "
        "ORDER BY dd ASC, vec_id ASC) AS r, "
        "count(*) OVER (PARTITION BY label) AS n FROM d) "
        "SELECT rk.label, CAST(rk.n AS BIGINT) AS n_vecs, "
        "norms.cn AS centroid_norm, rk.vec_id AS medoid_id, "
        "rk.dd AS medoid_distance "
        "FROM rk JOIN norms ON rk.label = norms.lbl WHERE rk.r = 1"
    ),
)
def q_embedding_group_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm + medoid exemplar (nearest member to
    centroid, 6dp + id tie-break): the representative-selection /
    class-geometry probe. Centroid table is labels×dims (broadcast);
    no item-item pairs."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import label_centroid_medoids

    emb = _load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    return label_centroid_medoids(emb, "vec_id", "embedding", "label")


QVEC_BATCH = [
    [round(((j * 37 + 11 + 13 * i) % 97) / 97.0 - 0.5, 6) for j in range(64)]
    for i in range(5)
]


def _knn_batch_oracle_sql(k: int = 10) -> str:
    vals = ", ".join(
        "(" + str(i) + ", ["
        + ", ".join(str(x) for x in q)
        + "]::DOUBLE[])"
        for i, q in enumerate(QVEC_BATCH)
    )
    return (
        f"WITH q(query_id, qv) AS (VALUES {vals}), "
        "e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings), "
        "d AS (SELECT query_id, vec_id, "
        f"{_COS_SQL} + 0.0 AS _distance FROM e CROSS JOIN q), "
        "rk AS (SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY _distance ASC, vec_id ASC) AS r FROM d) "
        f"SELECT CAST(query_id AS BIGINT) AS query_id, vec_id, _distance "
        f"FROM rk WHERE r <= {k}"
    )


@register("knn_query_batch", oracle=_knn_batch_oracle_sql())
def q_knn_query_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact kNN: 5 query vectors share ONE corpus scan (the
    batch broadcasts, per-query top-10 via bounded window) — the
    query-throughput serving shape; at 100 TB the batch costs one scan
    of I/O instead of five."""
    from weaviate_spark.operators.vector import near_vector_batch

    emb = _load(spark, sf_dir, "embeddings")
    return near_vector_batch(
        emb, "vec_id", "embedding",
        list(enumerate(QVEC_BATCH)), k=10,
    )


@register(
    "events_ohlc_daily",
    oracle=(
        "WITH r AS (SELECT event_type AS g, CAST(ts AS DATE) AS day, "
        "epoch_us(ts) AS t, event_id AS i, value AS v FROM events), "
        "w AS (SELECT *, row_number() OVER (PARTITION BY g, day "
        "ORDER BY t, i) AS ra, row_number() OVER (PARTITION BY g, day "
        "ORDER BY t DESC, i DESC) AS rd FROM r) "
        "SELECT g AS event_type, day, "
        "max(CASE WHEN ra = 1 THEN v END) AS open, max(v) AS high, "
        "min(v) AS low, max(CASE WHEN rd = 1 THEN v END) AS close, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total_value "
        "FROM w GROUP BY 1, 2"
    ),
)
def q_events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type: first/last by (ts, id) within
    the day (deterministic under timestamp ties), min/max/count/
    DECIMAL-exact totals — one shuffle on the (type, day) key serves
    both ordering windows and the aggregate."""
    from weaviate_spark.operators.analytics import ohlc_daily

    return ohlc_daily(_load(spark, sf_dir, "events"))


from weaviate_spark.operators.sampling import unit_hash_sql as _unit_hash_sql  # noqa: E402


@register(
    "split_leakage_safe",
    oracle=(
        "WITH RECURSIVE pairs AS MATERIALIZED (" + _MINHASH_SQL.format(thr=0.35) + "), "
        "edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach(src, dst) AS ("
        "SELECT a, a FROM edges "
        "UNION "
        "SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a), "
        "cl AS (SELECT src AS doc_id, min(dst) AS cluster_id "
        "FROM reach GROUP BY src), "
        "lab AS (SELECT d.doc_id, "
        "coalesce(cl.cluster_id, d.doc_id) AS cluster_id "
        "FROM documents d LEFT JOIN cl USING (doc_id)) "
        "SELECT doc_id, cluster_id, "
        "CASE WHEN " + _unit_hash_sql("cluster_id", "split") + " < 0.2 "
        "THEN 'val' ELSE 'train' END AS split FROM lab"
    ),
)
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val split: whole MinHash-LSH connected
    components assigned by the hash of their canonical member, so a
    near-copy of a training document can never leak into validation.
    Oracle re-derives components by recursive reachability — a
    different algorithm than the engine's pointer jumping."""
    df = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
        jaccard_threshold=0.35, max_bucket_size=1_000_000,
        table_key=(sf_dir, "documents"),
    )
    from weaviate_spark.operators.sampling import leakage_safe_split

    return leakage_safe_split(df, "doc_id", pairs, val_fraction=0.2, salt="split")


@register(
    "profile_mad_outliers",
    oracle=(
        "WITH r AS (SELECT l_returnflag AS g, "
        "CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL), "
        "med AS (SELECT g, median(v) AS m FROM r GROUP BY g), "
        "dev AS (SELECT r.g, r.v, med.m, abs(r.v - med.m) AS d "
        "FROM r JOIN med USING (g)), "
        "mad AS (SELECT g, median(d) AS md FROM dev GROUP BY g) "
        "SELECT dev.g AS l_returnflag, "
        "round(max(dev.m) + 0.0, 6) AS median_value, "
        "round(max(mad.md) + 0.0, 6) AS mad, "
        "CAST(sum(CASE WHEN mad.md > 0 AND 0.6745 * dev.d / mad.md > 3.5 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, "
        "round(CAST(sum(CASE WHEN mad.md > 0 AND "
        "0.6745 * dev.d / mad.md > 3.5 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*) + 0.0, 6) AS outlier_share "
        "FROM dev JOIN mad USING (g) GROUP BY 1"
    ),
)
def q_profile_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier profile (modified z-score: 0.6745 *
    |x - median| / MAD > 3.5) over lineitem prices by return flag —
    the heavy-tail-safe fence mean/stddev rules get wrong on price
    columns. Two group-key shuffles (one per exact percentile pass),
    stat frames broadcast back; no full-table window."""
    from weaviate_spark.operators.analytics import mad_outlier_profile

    return mad_outlier_profile(
        _load(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice"
    )


_POISSON_CASE = (
    "CASE WHEN u < 0.36787944117144233 THEN 0 "
    "WHEN u < 0.7357588823428847 THEN 1 "
    "WHEN u < 0.9196986029286058 THEN 2 "
    "WHEN u < 0.9810118431238462 THEN 3 "
    "WHEN u < 0.9963401531726563 THEN 4 "
    "WHEN u < 0.9994058151824183 THEN 5 "
    "WHEN u < 0.9999167588507119 THEN 6 ELSE 7 END"
)


@register(
    "stats_bootstrap_ci",
    oracle=(
        "WITH r AS (SELECT event_type AS g, event_id AS i, value AS v "
        "FROM events WHERE value IS NOT NULL), "
        "x AS (SELECT g, v, t.rr, "
        "(('0x' || substr(md5('boot:' || CAST(i AS VARCHAR) || ':' || "
        "CAST(t.rr AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) AS u "
        "FROM r, LATERAL unnest(range(0, 40)) AS t(rr)), "
        "wt AS (SELECT g, rr, CAST(v AS DECIMAL(18,6)) AS dv, "
        + _POISSON_CASE + " AS w FROM x), "
        "reps AS (SELECT g, rr, "
        "CAST(sum(dv * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m "
        "FROM wt GROUP BY g, rr) "
        "SELECT g AS event_type, "
        "round(quantile_cont(m, 0.5) + 0.0, 6) AS boot_median, "
        "round(quantile_cont(m, 0.025) + 0.0, 6) AS ci_lo, "
        "round(quantile_cont(m, 0.975) + 0.0, 6) AS ci_hi, "
        "CAST(count(*) AS BIGINT) AS n_replicates "
        "FROM reps GROUP BY 1"
    ),
)
def q_stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI of the mean event value per type: 40
    deterministic replicates (weight = Poisson(1) inverse CDF of the
    md5 uniform on (event_id, replicate)), replicate means from
    DECIMAL-exact weighted sums, interpolated quantiles over the 40
    means. The streaming-friendly resampling scheme large-scale A/B
    systems use — no global N, rows independent, one shuffle to
    (group, replicate) partials."""
    from weaviate_spark.operators.analytics import poisson_bootstrap_ci

    return poisson_bootstrap_ci(
        _load(spark, sf_dir, "events"), "event_type", "value", "event_id",
        replicates=40, alpha=0.05, salt="boot",
    )


@register(
    "graph_assortativity",
    oracle=(
        "WITH e AS (SELECT DISTINCT o_custkey AS s, l_suppkey AS d "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), "
        "od AS (SELECT s, count(*) AS odeg FROM e GROUP BY s), "
        "idg AS (SELECT d, count(*) AS ideg FROM e GROUP BY d), "
        "nn AS (SELECT count(*) AS n_nodes FROM "
        "(SELECT s AS x FROM e UNION SELECT d FROM e)), "
        "mom AS (SELECT count(*) AS n, "
        "sum(CAST(odeg AS HUGEINT)) AS sx, sum(CAST(ideg AS HUGEINT)) AS sy, "
        "sum(CAST(odeg AS HUGEINT) * odeg) AS sxx, "
        "sum(CAST(ideg AS HUGEINT) * ideg) AS syy, "
        "sum(CAST(odeg AS HUGEINT) * ideg) AS sxy "
        "FROM e JOIN od USING (s) JOIN idg USING (d)) "
        "SELECT CAST(nn.n_nodes AS BIGINT) AS n_nodes, "
        "CAST(mom.n AS BIGINT) AS n_edges, "
        "round(CAST(mom.n * mom.sxy - mom.sx * mom.sy AS DOUBLE) / "
        "(sqrt(CAST(mom.n * mom.sxx - mom.sx * mom.sx AS DOUBLE)) * "
        "sqrt(CAST(mom.n * mom.syy - mom.sy * mom.sy AS DOUBLE))) + 0.0, 6) "
        "AS assortativity FROM mom, nn"
    ),
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed degree assortativity (Newman's r, out/in flavour) of
    the customer -> supplier trade graph: do high-fan-out buyers trade
    with high-fan-in suppliers? Exact integer moment sums (DECIMAL /
    HUGEINT — no float accumulation-order drift), one distinct-edge
    shuffle + two broadcast degree joins."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.graph import degree_assortativity_exact

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    return degree_assortativity_exact(edges, "src", "dst")


_CONTAINMENT_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}]+') AS tt FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id AS _doc, array_to_string(list_slice(tt, i, i + 2), ' ') AS _shingle
  FROM toks, LATERAL unnest(range(1, greatest(len(tt) - 2, 0) + 1)) AS u(i)
  WHERE len(tt) >= 3
),
km AS (
  SELECT _doc,
    ('0x' || substr(md5(_shingle), 1, 14))::BIGINT AS _h1,
    ('0x' || substr(md5(_shingle), 15, 14))::BIGINT AS _h2
  FROM sh
),
mh AS (
  SELECT _doc, i AS _i, min(_h1 + i * _h2) AS _minhash
  FROM km, LATERAL unnest(range(0, 16)) AS t(i)
  GROUP BY _doc, i
),
bands AS (
  SELECT _doc, CAST(_i // 4 AS INT) AS _band,
    md5(string_agg(CAST(_i AS VARCHAR) || ':' || CAST(_minhash AS VARCHAR), ',' ORDER BY _i)) AS _bucket
  FROM mh GROUP BY _doc, CAST(_i // 4 AS INT)
),
cand AS (
  SELECT a._doc AS _a, b._doc AS _b
  FROM bands a JOIN bands b ON a._band = b._band AND a._bucket = b._bucket AND a._doc < b._doc
  GROUP BY 1, 2
),
sizes AS (SELECT _doc, count(*) AS _sz FROM sh GROUP BY _doc),
inter AS (
  SELECT c._a, c._b, count(*) AS _inter
  FROM cand c
  JOIN sh sa ON sa._doc = c._a
  JOIN sh sb ON sb._doc = c._b AND sb._shingle = sa._shingle
  GROUP BY c._a, c._b
),
dir AS (
  SELECT i._a AS src_id, i._b AS dst_id,
    CAST(i._inter AS DOUBLE) / sa._sz AS c
  FROM inter i JOIN sizes sa ON sa._doc = i._a
  UNION ALL
  SELECT i._b, i._a, CAST(i._inter AS DOUBLE) / sb._sz
  FROM inter i JOIN sizes sb ON sb._doc = i._b
)
SELECT src_id, dst_id, round(c + 0.0, 6) AS containment
FROM dir WHERE c >= {thr}
"""


@register("dedup_containment", oracle=_CONTAINMENT_SQL.format(thr=0.6))
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (Broder's coefficient |A∩B|/|A|):
    directed pairs where >= 60% of the source's shingles appear in the
    target — catches subset duplication (a doc pasted inside a longer
    one) that symmetric Jaccard misses. Candidates from the shared
    persisted MinHash band index; verify = one array_intersect per
    pair over shingle-set arrays."""
    from weaviate_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _load(spark, sf_dir, "documents"), "doc_id", "text",
        shingle_n=3, num_hashes=16, bands=4, threshold=0.6,
        max_bucket_size=1_000_000, table_key=(sf_dir, "documents"),
    )


@register(
    "events_cusum_changepoints",
    oracle=(
        "WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS day, "
        "CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) "
        "AS DECIMAL(18,6)) AS dm6 "
        "FROM events WHERE value IS NOT NULL GROUP BY 1, 2), "
        "mu AS (SELECT g, CAST(sum(dm6) AS DOUBLE) / count(*) AS mu "
        "FROM daily GROUP BY g), "
        "s AS (SELECT daily.g, day, mu.mu, "
        "CAST(dm6 AS DOUBLE) - mu.mu AS d FROM daily JOIN mu USING (g)), "
        "c AS (SELECT g, day, mu, "
        "sum(d) OVER (PARTITION BY g ORDER BY day "
        "ROWS UNBOUNDED PRECEDING) AS cum FROM s), "
        "sc AS (SELECT g, day, mu, "
        "cum - least(0.0, min(cum) OVER (PARTITION BY g ORDER BY day "
        "ROWS UNBOUNDED PRECEDING)) AS spos, "
        "greatest(0.0, max(cum) OVER (PARTITION BY g ORDER BY day "
        "ROWS UNBOUNDED PRECEDING)) - cum AS sneg FROM c), "
        "rk AS (SELECT *, row_number() OVER (PARTITION BY g "
        "ORDER BY round(spos, 6) DESC, day ASC) AS r FROM sc) "
        "SELECT g AS event_type, "
        "max(CASE WHEN r = 1 THEN day END) AS changepoint_day, "
        "round(max(spos) + 0.0, 6) AS max_s_pos, "
        "round(max(sneg) + 0.0, 6) AS max_s_neg, "
        "round(max(mu) + 0.0, 6) AS mu, "
        "CAST(count(*) AS BIGINT) AS n_days "
        "FROM rk GROUP BY 1"
    ),
)
def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan per event type over the daily-mean value
    series: S+/S- computed closed-form as cumsum-minus-running-min (two
    ordered windows, no recursion); reports the argmax day (the CUSUM
    location estimate) and drift magnitudes. DECIMAL-exact daily means
    keep it partition-invariant."""
    from weaviate_spark.operators.analytics import cusum_changepoints

    return cusum_changepoints(
        _load(spark, sf_dir, "events"), "event_type", "ts", "value"
    )


@register(
    "events_roc_auc",
    oracle=(
        "WITH r AS (SELECT CAST(value AS DOUBLE) AS s, "
        "(event_type = 'purchase') AS y FROM events "
        "WHERE value IS NOT NULL AND event_type IS NOT NULL), "
        "rk AS (SELECT y, 2 * rank() OVER (ORDER BY s) "
        "+ count(*) OVER (PARTITION BY s) - 1 AS r2 FROM r), "
        "a AS (SELECT CAST(sum(CASE WHEN y THEN r2 END) AS BIGINT) AS sr2, "
        "CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np, "
        "CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS nn "
        "FROM rk) "
        "SELECT np AS n_pos, nn AS n_neg, "
        "round((CAST(sr2 AS DOUBLE) / 2.0 "
        "- CAST(np AS DOUBLE) * CAST(np + 1 AS DOUBLE) / 2.0) "
        "/ (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) + 0.0, 6) AS auc "
        "FROM a"
    ),
)
def q_events_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney rank identity, ties as average
    ranks) of event value as a predictor of the purchase type — the
    model-eval primitive. All rank arithmetic in exact BIGINTs; one
    global rank window + scalar aggregate."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import roc_auc

    ev = _load(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
    )
    return roc_auc(ev, "value", F.col("event_type") == "purchase")


@register(
    "pareto_revenue_share",
    oracle=(
        "WITH rev AS (SELECT n_name AS nation, "
        "sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1), "
        "tot AS (SELECT sum(r) AS t FROM rev), "
        "w AS (SELECT nation, r, t, "
        "row_number() OVER (ORDER BY r DESC, nation ASC) AS rnk, "
        "sum(r) OVER (ORDER BY r DESC, nation ASC "
        "ROWS UNBOUNDED PRECEDING) AS cum FROM rev, tot) "
        "SELECT nation, CAST(rnk AS BIGINT) AS rnk, "
        "CAST(r AS DOUBLE) AS revenue, "
        "round(CAST(r AS DOUBLE) / CAST(t AS DOUBLE) + 0.0, 6) AS share, "
        "round(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) + 0.0, 6) AS cum_share, "
        "(cum * 10 <= t * 8) AS in_top80 FROM w"
    ),
)
def q_pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue concentration by customer nation:
    DECIMAL-exact revenue, rank + cumulative share via one ordered
    window over the 25-row nation aggregate (all the heavy lifting is
    the fact join + groupBy; the window runs on dimension-sized data).
    in_top80 is decided on exact decimals (cum*10 <= total*8), not
    rounded floats."""
    from pyspark.sql import Window, functions as F

    li = _load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("_p"),
        F.col("l_discount").cast("decimal(18,2)").alias("_d"),
    )
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("_p") * (F.lit(1) - F.col("_d"))).alias("_r"))
    )
    tot = rev.agg(F.sum("_r").alias("_t"))
    w = Window.orderBy(F.col("_r").desc(), F.col("nation").asc())
    cumw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        rev.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .withColumn("_cum", F.sum("_r").over(cumw))
        .select(
            "nation",
            "rnk",
            F.col("_r").cast("double").alias("revenue"),
            F.round(
                F.col("_r").cast("double") / F.col("_t").cast("double")
                + F.lit(0.0),
                6,
            ).alias("share"),
            F.round(
                F.col("_cum").cast("double") / F.col("_t").cast("double")
                + F.lit(0.0),
                6,
            ).alias("cum_share"),
            (F.col("_cum") * 10 <= F.col("_t") * 8).alias("in_top80"),
        )
    )


def _kmeans_oracle_sql(k: int = 4, iterations: int = 5) -> str:
    seed_hash = "('0x' || substr(md5('km:' || CAST(_id AS VARCHAR)), 1, 8))::BIGINT"
    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id AS _id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), ",
        "it AS MATERIALIZED (SELECT _id, i - 1 AS _dim, ev[i] AS _val "
        "FROM e, LATERAL unnest(range(1, len(ev) + 1)) AS u(i)), ",
        "sd AS MATERIALIZED (SELECT _id, row_number() OVER "
        f"(ORDER BY {seed_hash}, _id) - 1 AS _c FROM e), ",
        "c0 AS MATERIALIZED (SELECT sd._c, it._dim, round(it._val, 6) AS _mu "
        f"FROM it JOIN sd USING (_id) WHERE sd._c < {k}), ",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT it._id, c._c, "
            "round(sum((it._val - c._mu) * (it._val - c._mu)), 6) AS _dd "
            f"FROM it JOIN c{i - 1} c ON it._dim = c._dim "
            "GROUP BY it._id, c._c), "
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT _id, _c, _dd FROM "
            "(SELECT *, row_number() OVER (PARTITION BY _id "
            f"ORDER BY _dd ASC, _c ASC) AS _r FROM d{i}) WHERE _r = 1), "
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT a._c, it._dim, "
            "round(avg(it._val), 6) AS _mu "
            f"FROM it JOIN a{i} a USING (_id) GROUP BY a._c, it._dim), "
        )
    parts.append(
        f"norms AS (SELECT _c, round(sqrt(sum(_mu * _mu)) + 0.0, 6) "
        f"AS centroid_norm FROM c{iterations} GROUP BY _c) "
        f"SELECT CAST(a._c AS INT) AS cluster_id, "
        "CAST(count(*) AS BIGINT) AS n_members, norms.centroid_norm, "
        "round(CAST(sum(CAST(a._dd AS DECIMAL(18,6))) AS DOUBLE) + 0.0, 6) "
        f"AS inertia FROM a{iterations} a JOIN norms USING (_c) "
        "GROUP BY a._c, norms.centroid_norm"
    )
    return "".join(parts)


@register("embedding_kmeans", oracle=_kmeans_oracle_sql(4, 5))
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means (k=4, 5 rounds) over the embedding
    corpus: hash-seeded init, 6dp-fixed iteration state so a DuckDB
    oracle replays every round, broadcast k x d centroid joins (no
    all-pairs, no driver collect). The clustering primitive under
    IVF index build and semantic dedup, surfaced as its own operator."""
    from weaviate_spark.operators.curation import kmeans_clusters

    emb = _load(spark, sf_dir, "embeddings")
    return kmeans_clusters(emb, "vec_id", "embedding", k=4, iterations=5)


@register(
    "gini_revenue_concentration",
    oracle=(
        "WITH rev AS (SELECT o_custkey AS ck, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS x "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1), "
        "rk AS (SELECT x, row_number() OVER (ORDER BY x ASC, ck ASC) AS i "
        "FROM rev), "
        "a AS (SELECT count(*) AS n, sum(x) AS s0, sum(x * i) AS s1 FROM rk) "
        "SELECT CAST(n AS BIGINT) AS n_entities, "
        "CAST(s0 AS DOUBLE) AS total_value, "
        "round((2.0 * CAST(s1 AS DOUBLE) "
        "- CAST(n + 1 AS DOUBLE) * CAST(s0 AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(s0 AS DOUBLE)) + 0.0, 6) AS gini "
        "FROM a"
    ),
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of revenue across customers — the
    inequality/concentration primitive (pairs with pareto_revenue_share).
    Per-customer revenue is a DECIMAL-exact fact aggregate; the index
    itself is exact integer/decimal moments with one dimension-sized
    rank window."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import gini_coefficient

    li = _load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("_p"),
        F.col("l_discount").cast("decimal(18,2)").alias("_d"),
    )
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(F.col("_p") * (F.lit(1) - F.col("_d")))
            .cast("decimal(28,4)")
            .alias("x")
        )
    )
    return gini_coefficient(rev, "x", "ck")


@register(
    "text_collocations_pmi",
    oracle=(
        "WITH toks AS (SELECT regexp_extract_all(lower(text), "
        "'[\\p{L}\\p{N}]+') AS tt FROM documents), "
        "bg AS (SELECT tt[i] AS w1, tt[i + 1] AS w2 FROM toks, "
        "LATERAL unnest(range(1, len(tt))) AS u(i) WHERE len(tt) >= 2), "
        "p12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2), "
        "p1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1), "
        "p2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY 1), "
        "nn AS (SELECT count(*) AS n FROM bg), "
        "s AS (SELECT p12.w1, p12.w2, p12.c12, "
        "round(ln(CAST(p12.c12 AS DOUBLE) * CAST(nn.n AS DOUBLE) "
        "/ (CAST(p1.c1 AS DOUBLE) * CAST(p2.c2 AS DOUBLE))) + 0.0, 6) AS pmi "
        "FROM p12 JOIN p1 USING (w1) JOIN p2 USING (w2) CROSS JOIN nn "
        "WHERE p12.c12 >= 5) "
        "SELECT w1, w2, CAST(c12 AS BIGINT) AS n_pair, pmi FROM s "
        "ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20"
    ),
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI over adjacent word bigrams
    (Church & Hanks): positional marginals, min-count 5 guard against
    the low-frequency PMI explosion, 6dp + lexicographic tie-break.
    One explode, three keyed counts, marginals join back (AQE
    broadcasts when they fit)."""
    from weaviate_spark.operators.textstats import collocations_pmi

    return collocations_pmi(
        _load(spark, sf_dir, "documents"), "text", min_count=5, top_k=20
    )


@register(
    "feature_quantile_binning",
    oracle=(
        "WITH r AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v, "
        "l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL), "
        "b AS (SELECT v, ntile(10) OVER (ORDER BY v ASC, l_orderkey ASC, "
        "l_linenumber ASC) AS bin FROM r) "
        "SELECT CAST(bin AS INT) AS bin, round(min(v) + 0.0, 6) AS lo, "
        "round(max(v) + 0.0, 6) AS hi, CAST(count(*) AS BIGINT) AS n_rows "
        "FROM b GROUP BY 1"
    ),
)
def q_feature_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of the price column (ntile with a
    deterministic tie-break) — the feature-engineering / quantile-sketch
    primitive; bin edges + populations out."""
    from weaviate_spark.operators.analytics import quantile_bins

    return quantile_bins(
        _load(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        n_bins=10,
    )


@register(
    "events_temporal_neighbors",
    oracle=(
        "WITH l AS (SELECT event_id, epoch_us(ts) AS lt FROM events "
        "WHERE event_type = 'error'), "
        "r AS (SELECT epoch_us(ts) AS rt FROM events "
        "WHERE event_type = 'purchase'), "
        "cnt AS (SELECT l.event_id, count(r.rt) AS neighbor_count "
        "FROM l LEFT JOIN r ON abs(l.lt - r.rt) <= 300000000 GROUP BY 1) "
        "SELECT CAST(neighbor_count AS BIGINT) AS neighbor_count, "
        "CAST(count(*) AS BIGINT) AS n_left_events FROM cnt GROUP BY 1"
    ),
)
def q_events_temporal_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded temporal neighborhood join: for every error event, count
    purchases within +/- 5 minutes, returned as a histogram. Engine uses
    window-sized time-bucket equi-joins (each right event lands in 3
    buckets, each left probes 1 — never a range join); the oracle is the
    naive interval join, a genuinely different algorithm."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import temporal_neighbor_counts

    ev = _load(spark, sf_dir, "events")
    return temporal_neighbor_counts(
        ev.where(F.col("event_type") == "error"),
        ev.where(F.col("event_type") == "purchase"),
        "ts",
        window_seconds=300,
    )


@register(
    "events_kaplan_meier",
    oracle=(
        "WITH base AS (SELECT user_id AS u, ts, event_type FROM events "
        "WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
        "entry AS (SELECT u, min(ts) AS t0 FROM base GROUP BY u), "
        "h AS (SELECT max(ts) AS hz FROM base), "
        "ev AS (SELECT b.u, min(b.ts) AS te FROM base b "
        "JOIN entry e ON b.u = e.u "
        "WHERE b.event_type = 'purchase' AND b.ts > e.t0 GROUP BY b.u), "
        "subj AS (SELECT e.u, "
        "CASE WHEN ev.te IS NOT NULL THEN 1 ELSE 0 END AS obs, "
        "datediff('day', CAST(e.t0 AS DATE), "
        "CAST(coalesce(ev.te, h.hz) AS DATE)) AS dur "
        "FROM entry e LEFT JOIN ev ON e.u = ev.u CROSS JOIN h), "
        "pd AS (SELECT dur, sum(obs) AS d, count(*) AS lv "
        "FROM subj GROUP BY dur), "
        "km AS (SELECT dur, d, sum(lv) OVER (ORDER BY dur "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n FROM pd), "
        "km2 AS (SELECT dur, d, n, "
        "sum(CASE WHEN d > 0 AND n > d "
        "THEN ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)) "
        "ELSE 0.0 END) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS lnsum, "
        "max(CASE WHEN d > 0 AND d >= n THEN 1 ELSE 0 END) "
        "OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS hit0 FROM km) "
        "SELECT CAST(dur AS BIGINT) AS t_days, CAST(n AS BIGINT) AS n_at_risk, "
        "CAST(d AS BIGINT) AS n_events, "
        "CASE WHEN hit0 = 1 THEN 0.0 "
        "ELSE round(exp(lnsum) + 0.0, 6) END AS survival "
        "FROM km2 WHERE d > 0"
    ),
)
def q_events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit curve for time-to-first-purchase:
    subjects enter at their first event, right-censored at the corpus
    horizon; survival from an ordered running sum of exact-ratio ln
    terms (deterministic; ln(0) terminal days handled by a flag, not
    -inf). Two subject-key shuffles + dimension-sized day windows."""
    from weaviate_spark.operators.analytics import kaplan_meier_survival

    return kaplan_meier_survival(
        _load(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        "purchase",
    )


@register(
    "score_calibration_bins",
    oracle=(
        "WITH r AS (SELECT CAST(value / 100 AS DECIMAL(18,6)) AS p, "
        "(event_type = 'purchase') AS y FROM events "
        "WHERE value IS NOT NULL AND event_type IS NOT NULL), "
        "f AS (SELECT p, y FROM r WHERE p >= 0 AND p < 1), "
        "b AS (SELECT CAST(floor(CAST(p AS DOUBLE) * 10) AS INT) AS bin, "
        "p, y FROM f) "
        "SELECT bin, CAST(count(*) AS BIGINT) AS n_rows, "
        "round(CAST(sum(p) AS DOUBLE) / count(*) + 0.0, 6) AS mean_score, "
        "round(CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*) + 0.0, 6) AS pos_rate FROM b GROUP BY 1"
    ),
)
def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins (calibration curve): event value / 100
    as a pseudo-probability of the purchase label, 10 fixed-width bins,
    DECIMAL-exact mean score vs exact empirical positive rate per bin.
    One shuffle."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import calibration_bins

    ev = _load(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
    )
    scored = ev.select(
        (F.col("value") / 100).alias("p"),
        (F.col("event_type") == "purchase").alias("y"),
    )
    return calibration_bins(scored, "p", "y", n_bins=10)


@register(
    "drift_psi_value",
    oracle=(
        "WITH a AS (SELECT CAST(value AS DOUBLE) AS v FROM events "
        "WHERE value IS NOT NULL AND CAST(ts AS DATE) <= DATE '2024-01-15'), "
        "b AS (SELECT CAST(value AS DOUBLE) AS v FROM events "
        "WHERE value IS NOT NULL AND CAST(ts AS DATE) > DATE '2024-01-15'), "
        "e AS (SELECT ["
        + ", ".join(
            f"round(quantile_cont(v, {i / 10}), 6)" for i in range(1, 10)
        )
        + "] AS edges FROM a), "
        "na AS (SELECT count(*) AS n FROM a), "
        "nb AS (SELECT count(*) AS n FROM b), "
        "ca AS (SELECT len(list_filter(e.edges, x -> v > x)) AS bin, "
        "count(*) AS n_a FROM a, e GROUP BY 1), "
        "cb AS (SELECT len(list_filter(e.edges, x -> v > x)) AS bin, "
        "count(*) AS n_b FROM b, e GROUP BY 1), "
        "j AS (SELECT coalesce(ca.bin, cb.bin) AS bin, "
        "coalesce(ca.n_a, 0) AS n_a, coalesce(cb.n_b, 0) AS n_b "
        "FROM ca FULL JOIN cb ON ca.bin = cb.bin) "
        "SELECT CAST(bin AS INT) AS bin, CAST(n_a AS BIGINT) AS n_a, "
        "CAST(n_b AS BIGINT) AS n_b, "
        "round(CAST(n_a AS DOUBLE) / na.n + 0.0, 6) AS p_a, "
        "round(CAST(n_b AS DOUBLE) / nb.n + 0.0, 6) AS p_b, "
        "round((CAST(n_b AS DOUBLE) / nb.n - CAST(n_a AS DOUBLE) / na.n) "
        "* ln((CAST(n_b AS DOUBLE) / nb.n) / (CAST(n_a AS DOUBLE) / na.n)) "
        "+ 0.0, 6) AS psi_term "
        "FROM j, na, nb"
    ),
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value column between the first
    and second half of the event window — the production drift monitor.
    Bin edges = reference-period exact deciles (6dp-pinned); per-bin
    exact counts; psi_term sums to the headline index. Edges broadcast;
    binning is a map-side array scan."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import psi_drift

    ev = _load(spark, sf_dir, "events")
    day = F.col("ts").cast("timestamp").cast("date")
    a = ev.where(day <= F.lit("2024-01-15").cast("date"))
    b = ev.where(day > F.lit("2024-01-15").cast("date"))
    return psi_drift(a, b, "value", n_bins=10)


@register(
    "agg_trimmed_mean",
    oracle=(
        "WITH r AS (SELECT l_returnflag AS g, "
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS v, "
        "l_orderkey * 10 + l_linenumber AS tb FROM lineitem "
        "WHERE l_extendedprice IS NOT NULL), "
        "rk AS (SELECT g, v, "
        "row_number() OVER (PARTITION BY g ORDER BY v ASC, tb ASC) AS ra, "
        "row_number() OVER (PARTITION BY g ORDER BY v DESC, tb DESC) AS rd, "
        "count(*) OVER (PARTITION BY g) AS n FROM r), "
        "kept AS (SELECT g, v, CAST(floor(n * 0.05) AS BIGINT) AS k FROM rk "
        "WHERE ra > floor(n * 0.05) AND rd > floor(n * 0.05)) "
        "SELECT g AS l_returnflag, CAST(count(*) AS BIGINT) AS n_kept, "
        "max(k) AS n_trimmed_each_side, "
        "round(CAST(sum(v) AS DOUBLE) / count(*) + 0.0, 6) AS trimmed_mean "
        "FROM kept GROUP BY 1"
    ),
)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided trimmed mean of price per return flag: rank-based
    trimming (exact integer cut counts, deterministic tie-break) +
    DECIMAL-exact survivor sums — the robust location estimate."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import trimmed_mean

    li = _load(spark, sf_dir, "lineitem").withColumn(
        "_rowkey", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    return trimmed_mean(
        li, "l_returnflag", "l_extendedprice", "_rowkey", trim_frac=0.05
    )


@register(
    "profile_chisq_independence",
    oracle=(
        "WITH r AS (SELECT CAST(source AS VARCHAR) AS a, "
        "CAST(lang AS VARCHAR) AS b FROM documents "
        "WHERE source IS NOT NULL AND lang IS NOT NULL), "
        "c AS (SELECT a, b, count(*) AS o FROM r GROUP BY 1, 2), "
        "ma AS (SELECT a, sum(o) AS ra FROM c GROUP BY 1), "
        "mb AS (SELECT b, sum(o) AS cb FROM c GROUP BY 1), "
        "nn AS (SELECT sum(o) AS n FROM c), "
        "s AS (SELECT sum(CAST(c.o AS DOUBLE) * c.o * nn.n "
        "/ (CAST(ma.ra AS DOUBLE) * mb.cb)) AS s, max(nn.n) AS n, "
        "count(DISTINCT c.a) AS ka, count(DISTINCT c.b) AS kb "
        "FROM c JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn) "
        "SELECT CAST(n AS BIGINT) AS n_rows, "
        "CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof, "
        "round(s - n + 0.0, 6) AS chi2, "
        "round(sqrt((s - n) / CAST(n * (least(ka, kb) - 1) AS DOUBLE)) "
        "+ 0.0, 6) AS cramers_v FROM s"
    ),
)
def q_profile_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test + Cramer's V for the
    (source, lang) contingency of the document corpus — the categorical
    association profiler (complements mutual information). Exact counts,
    one float op per cell via the sum(o^2 n / (ra cb)) - n identity."""
    from weaviate_spark.operators.analytics import chisq_independence

    return chisq_independence(
        _load(spark, sf_dir, "documents"), "source", "lang"
    )


@register(
    "events_rolling_features",
    oracle=(
        "WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS day, "
        "CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) "
        "AS DECIMAL(18,6)) AS dm FROM events WHERE value IS NOT NULL "
        "GROUP BY 1, 2), "
        "r AS (SELECT g, day, dm, count(*) OVER w AS cnt, "
        "sum(dm) OVER w AS s1, sum(dm * dm) OVER w AS s2 FROM daily "
        "WINDOW w AS (PARTITION BY g ORDER BY day "
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) "
        "SELECT g AS event_type, day, CAST(dm AS DOUBLE) AS daily_mean, "
        "CAST(cnt AS BIGINT) AS window_support, "
        "round(CAST(s1 AS DOUBLE) / cnt + 0.0, 6) AS rolling_mean, "
        "round(sqrt(greatest(CAST(s2 AS DOUBLE) / cnt "
        "- (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt), 0.0)) "
        "+ 0.0, 6) AS rolling_std FROM r"
    ),
)
def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling mean/std per event type over the
    daily-mean series — the feature-engineering window pass. Daily
    means fixed to 6dp DECIMAL so the sliding sums are exact and
    order-independent; one (group, day) shuffle + one window."""
    from weaviate_spark.operators.analytics import rolling_daily_features

    return rolling_daily_features(
        _load(spark, sf_dir, "events"), "event_type", "ts", "value",
        window_days=7,
    )


@register(
    "profile_benford_digits",
    oracle=(
        "WITH r AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v "
        "FROM lineitem WHERE l_extendedprice IS NOT NULL "
        "AND l_extendedprice > 0), "
        "d AS (SELECT CAST(regexp_extract(CAST(v AS VARCHAR), '[1-9]', 0) "
        "AS INT) AS digit FROM r), "
        "c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1), "
        "t AS (SELECT sum(n) AS t FROM c) "
        "SELECT digit, CAST(n AS BIGINT) AS n, "
        "round(CAST(n AS DOUBLE) / t + 0.0, 6) AS observed_share, "
        "round(log10(1.0 + 1.0 / digit) + 0.0, 6) AS benford_share, "
        "round((CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / digit)) "
        "* (CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / digit)) "
        "/ log10(1.0 + 1.0 / digit) * CAST(t AS DOUBLE) + 0.0, 6) "
        "AS chi2_term FROM c, t"
    ),
)
def q_profile_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of the price column:
    observed vs log10(1+1/d) shares with per-digit chi-square terms —
    the fraud / synthetic-data smell test. Digit from the fixed-scale
    DECIMAL string (no log10 ulp hazard); map-side extract + 9-key
    aggregate."""
    from weaviate_spark.operators.analytics import benford_first_digit

    return benford_first_digit(_load(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "events_dow_seasonality",
    oracle=(
        "WITH r AS (SELECT event_type AS g, isodow(CAST(ts AS DATE)) AS dow, "
        "CAST(value AS DECIMAL(18,6)) AS v FROM events "
        "WHERE value IS NOT NULL), "
        "pd AS (SELECT g, dow, count(*) AS n, sum(v) AS s "
        "FROM r GROUP BY 1, 2), "
        "pg AS (SELECT g, CAST(sum(v) AS DOUBLE) / count(*) AS gm "
        "FROM r GROUP BY 1) "
        "SELECT pd.g AS event_type, CAST(pd.dow AS INT) AS iso_dow, "
        "CAST(pd.n AS BIGINT) AS n_events, "
        "round(CAST(pd.s AS DOUBLE) / pd.n + 0.0, 6) AS dow_mean, "
        "round(CAST(pd.s AS DOUBLE) / pd.n / pg.gm + 0.0, 6) "
        "AS seasonal_index "
        "FROM pd JOIN pg ON pd.g = pg.g"
    ),
)
def q_events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-weekday seasonality per event type: exact per-cell means and
    the weekday/overall seasonal index — the calendar-effect profiler."""
    from weaviate_spark.operators.analytics import dow_seasonality

    return dow_seasonality(
        _load(spark, sf_dir, "events"), "event_type", "ts", "value"
    )


@register(
    "validate_referential_integrity",
    oracle=(
        "SELECT 'lineitem.l_orderkey->orders' AS relation, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_orphans "
        "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "UNION ALL "
        "SELECT 'orders.o_custkey->customer', CAST(count(*) AS BIGINT), "
        "CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey "
        "UNION ALL "
        "SELECT 'lineitem.l_partkey->part', CAST(count(*) AS BIGINT), "
        "CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey "
        "UNION ALL "
        "SELECT 'lineitem.l_suppkey->supplier', CAST(count(*) AS BIGINT), "
        "CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey"
    ),
)
def q_validate_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit across the star schema: per relation the row
    count and orphan count (child keys with no parent) — the first
    post-ingest data-quality gate. Key-only deduplicated parent sides,
    aggregate-only output."""
    from weaviate_spark.operators.analytics import referential_integrity

    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    return referential_integrity([
        ("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        ("orders.o_custkey->customer", orders, "o_custkey",
         _load(spark, sf_dir, "customer"), "c_custkey"),
        ("lineitem.l_partkey->part", li, "l_partkey",
         _load(spark, sf_dir, "part"), "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey",
         _load(spark, sf_dir, "supplier"), "s_suppkey"),
    ])


@register(
    "events_top_paths",
    oracle=(
        "WITH r AS (SELECT user_id AS u, ts, event_id AS i, event_type AS e0 "
        "FROM events), "
        "w AS (SELECT u, e0, "
        "lead(e0, 1) OVER (PARTITION BY u ORDER BY ts, i) AS e1, "
        "lead(e0, 2) OVER (PARTITION BY u ORDER BY ts, i) AS e2 FROM r), "
        "p AS (SELECT e0 || '>' || e1 || '>' || e2 AS path FROM w "
        "WHERE e2 IS NOT NULL) "
        "SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1 "
        "ORDER BY n DESC, path ASC LIMIT 10"
    ),
)
def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step user journeys (event-type trigram paths over
    per-user timelines, deterministic (ts, id) ordering) — the
    journey-mining primitive behind funnels and next-step prediction."""
    from weaviate_spark.operators.analytics import top_event_paths

    return top_event_paths(
        _load(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        "event_id", path_len=3, top_k=10,
    )


@register(
    "abtest_two_proportion_z",
    oracle=(
        "WITH a AS (SELECT (event_type = 'purchase') AS s FROM events "
        "WHERE event_type IS NOT NULL "
        "AND CAST(ts AS DATE) <= DATE '2024-01-15'), "
        "b AS (SELECT (event_type = 'purchase') AS s FROM events "
        "WHERE event_type IS NOT NULL "
        "AND CAST(ts AS DATE) > DATE '2024-01-15'), "
        "ca AS (SELECT count(*) AS n_a, "
        "sum(CASE WHEN s THEN 1 ELSE 0 END) AS x_a FROM a), "
        "cb AS (SELECT count(*) AS n_b, "
        "sum(CASE WHEN s THEN 1 ELSE 0 END) AS x_b FROM b) "
        "SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a, "
        "CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b, "
        "round(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) + 0.0, 6) AS p_a, "
        "round(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) + 0.0, 6) AS p_b, "
        "round((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) "
        "- CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)) "
        "/ sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) "
        "* (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) "
        "* (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) "
        "+ 0.0, 6) AS z_score "
        "FROM ca, cb"
    ),
)
def q_abtest_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of purchase rate, first half vs second
    half of the event window — the A/B significance primitive. Exact
    counts, pooled variance, one double expression."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import two_proportion_ztest

    ev = _load(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    day = F.col("ts").cast("timestamp").cast("date")
    return two_proportion_ztest(
        ev.where(day <= F.lit("2024-01-15").cast("date")),
        ev.where(day > F.lit("2024-01-15").cast("date")),
        F.col("event_type") == "purchase",
    )


@register(
    "orders_value_percentiles_by_priority",
    oracle=(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders, "
        "round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) + 0.0, 6) "
        "AS p50, "
        "round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) + 0.0, 6) "
        "AS p90, "
        "round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99) + 0.0, 6) "
        "AS p99 "
        "FROM orders GROUP BY 1"
    ),
)
def q_orders_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value p50/p90/p99 per priority class — exact interpolated
    percentiles per group (one shuffle, sort only within groups)."""
    from pyspark.sql import functions as F

    o = _load(spark, sf_dir, "orders")
    v = F.col("o_totalprice").cast("double")
    return o.where(v.isNotNull()).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.percentile(v, F.lit(0.5)) + F.lit(0.0), 6).alias("p50"),
        F.round(F.percentile(v, F.lit(0.9)) + F.lit(0.0), 6).alias("p90"),
        F.round(F.percentile(v, F.lit(0.99)) + F.lit(0.0), 6).alias("p99"),
    )


def _pca_oracle_sql(iterations: int = 5) -> str:
    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id AS _id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), ",
        "it AS MATERIALIZED (SELECT _id, i - 1 AS _dim, ev[i] AS _val "
        "FROM e, LATERAL unnest(range(1, len(ev) + 1)) AS u(i)), ",
        "g AS MATERIALIZED (SELECT a._dim AS _i, b._dim AS _j, "
        "sum(a._val * b._val) AS _g FROM it a JOIN it b ON a._id = b._id "
        "GROUP BY 1, 2), ",
        "dd AS (SELECT max(_dim) + 1 AS d FROM it), ",
        "v0 AS MATERIALIZED (SELECT _dim AS _j, "
        "round(1.0 / sqrt((SELECT d FROM dd)), 6) AS _v "
        "FROM (SELECT DISTINCT _dim FROM it)), ",
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT g._i, sum(g._g * v._v) AS _w "
            f"FROM g JOIN v{k - 1} v ON g._j = v._j GROUP BY 1), "
        )
        parts.append(
            f"n{k} AS MATERIALIZED (SELECT sqrt(sum(_w * _w)) AS _nm FROM w{k}), "
        )
        parts.append(
            f"v{k} AS MATERIALIZED (SELECT _i AS _j, "
            f"round(_w / (SELECT _nm FROM n{k}), 6) AS _v FROM w{k}), "
        )
    parts.append(
        f"fin AS (SELECT _j, _v FROM v{iterations}) "
        f"SELECT CAST(_j AS INT) AS dim, _v AS loading, "
        f"round((SELECT _nm FROM n{iterations}) + 0.0, 6) AS eigenvalue "
        "FROM fin"
    )
    return "".join(parts)


@register("embedding_pca_top_component", oracle=_pca_oracle_sql(5))
def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus (power
    iteration on the Gram matrix, 5 rounds, 6dp-fixed state) — the
    anisotropy / common-direction diagnostic behind All-but-the-Top
    style embedding post-processing. Corpus-sized work = one Gram
    aggregate; iterations run on the d x d table with broadcast
    vectors."""
    from weaviate_spark.operators.curation import pca_top_component

    return pca_top_component(
        _load(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        iterations=5,
    )


@register(
    "events_lag_correlation",
    oracle=(
        "WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS day, "
        "CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) "
        "AS DECIMAL(18,6)) AS dm FROM events WHERE value IS NOT NULL "
        "GROUP BY 1, 2), "
        "a AS (SELECT day AS da, dm AS x FROM daily WHERE g = 'error'), "
        "b AS (SELECT day AS db, dm AS y FROM daily WHERE g = 'purchase'), "
        "l AS (SELECT a.da, a.x, t.lag, a.da + CAST(t.lag AS INT) AS db "
        "FROM a, LATERAL unnest(range(-7, 8)) AS t(lag)), "
        "j AS (SELECT l.lag, l.x, b.y FROM l JOIN b USING (db)), "
        "m AS (SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
        "sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy "
        "FROM j GROUP BY 1) "
        "SELECT CAST(lag AS INT) AS lag_days, CAST(n AS BIGINT) AS n_days, "
        "round(CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) "
        "* sqrt(CAST(n * syy - sy * sy AS DOUBLE))) + 0.0, 6) AS corr "
        "FROM m"
    ),
)
def q_events_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation (error vs purchase daily means, lags
    -7..+7): exact decimal moment sums, no float accumulation — the
    'does an error spike precede a purchase dip' diagnostic."""
    from weaviate_spark.operators.analytics import lag_correlation

    return lag_correlation(
        _load(spark, sf_dir, "events"), "event_type", "ts", "value",
        "error", "purchase", max_lag=7,
    )


@register(
    "validate_order_totals",
    oracle=(
        "WITH li AS (SELECT l_orderkey, "
        "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,4)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,6)) AS line "
        "FROM lineitem), "
        "c AS (SELECT l_orderkey, CAST(sum(line) AS DECIMAL(28,6)) AS calc "
        "FROM li GROUP BY 1), "
        "j AS (SELECT o.o_orderstatus, "
        "CAST(o.o_totalprice AS DECIMAL(28,6)) AS hdr, c.calc FROM orders o "
        "LEFT JOIN c ON o.o_orderkey = c.l_orderkey), "
        "d AS (SELECT o_orderstatus, "
        "abs(hdr - coalesce(calc, CAST(0 AS DECIMAL(28,6)))) AS diff FROM j) "
        "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CASE WHEN diff > CAST(0.01 AS DECIMAL(28,6)) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched, "
        "CAST(max(diff) AS DOUBLE) AS max_abs_diff FROM d GROUP BY 1"
    ),
)
def q_validate_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial reconciliation: per order status, how many header
    totals disagree (beyond 1 cent) with the DECIMAL-exact recomputed
    line-item total, and the worst discrepancy — the billing audit."""
    from weaviate_spark.operators.analytics import order_total_reconciliation

    return order_total_reconciliation(
        _load(spark, sf_dir, "orders"), _load(spark, sf_dir, "lineitem"),
        tolerance=0.01,
    )


@register(
    "events_rolling_active_users",
    oracle=(
        "WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day "
        "FROM events WHERE user_id IS NOT NULL), "
        "dau AS (SELECT day, count(DISTINCT u) AS dau FROM ud GROUP BY 1), "
        "sp AS (SELECT u, day + CAST(t.i AS INT) AS e FROM ud, "
        "LATERAL unnest(range(0, 7)) AS t(i)), "
        "wau AS (SELECT e AS day, count(DISTINCT u) AS wau FROM sp "
        "GROUP BY 1) "
        "SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau, "
        "CAST(wau.wau AS BIGINT) AS wau FROM dau JOIN wau ON dau.day = wau.day"
    ),
)
def q_events_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU + trailing 7-day WAU per day via the bounded
    forward-explode plan (distinct (user, day) first, then x7 spread +
    distinct count) — no sketch, no 7-way self-join."""
    from weaviate_spark.operators.analytics import rolling_active_users

    return rolling_active_users(
        _load(spark, sf_dir, "events"), "user_id", "ts", window_days=7
    )


@register(
    "events_interarrival_stats",
    oracle=(
        "WITH r AS (SELECT event_type AS g, epoch_us(ts) AS t, event_id AS i "
        "FROM events), "
        "lg AS (SELECT g, t - lag(t) OVER (PARTITION BY g ORDER BY t, i) AS d "
        "FROM r), "
        "gaps AS (SELECT g, CAST(d AS HUGEINT) AS d FROM lg "
        "WHERE d IS NOT NULL), "
        "m AS (SELECT g, count(*) AS n, sum(d) AS s1, sum(d * d) AS s2 "
        "FROM gaps GROUP BY 1) "
        "SELECT g AS event_type, CAST(n AS BIGINT) AS n_gaps, "
        "round(CAST(s1 AS DOUBLE) / n / 1000000.0 + 0.0, 6) AS mean_gap_s, "
        "round(sqrt(greatest(CAST(s2 AS DOUBLE) / n "
        "- (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 0.0)) "
        "/ (CAST(s1 AS DOUBLE) / n) + 0.0, 6) AS cv, "
        "round((sqrt(greatest(CAST(s2 AS DOUBLE) / n "
        "- (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 0.0)) "
        "/ (CAST(s1 AS DOUBLE) / n) - 1) "
        "/ (sqrt(greatest(CAST(s2 AS DOUBLE) / n "
        "- (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 0.0)) "
        "/ (CAST(s1 AS DOUBLE) / n) + 1) + 0.0, 6) AS burstiness "
        "FROM m"
    ),
)
def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics + Goh-Barabasi burstiness per event
    type: exact integer-microsecond gaps over (ts, id) order,
    DECIMAL(38,0)/HUGEINT moment sums — partition-invariant."""
    from weaviate_spark.operators.analytics import interarrival_stats

    return interarrival_stats(
        _load(spark, sf_dir, "events"), "event_type", "ts", "event_id"
    )


@register(
    "events_activity_streaks",
    oracle=(
        "WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day "
        "FROM events WHERE user_id IS NOT NULL), "
        "isl AS (SELECT u, datediff('day', DATE '1970-01-01', day) "
        "- row_number() OVER (PARTITION BY u ORDER BY day) AS grp FROM ud), "
        "st AS (SELECT u, grp, count(*) AS streak_days FROM isl "
        "GROUP BY 1, 2) "
        "SELECT CAST(streak_days AS BIGINT) AS streak_days, "
        "CAST(count(*) AS BIGINT) AS n_streaks, "
        "CAST(count(DISTINCT u) AS BIGINT) AS n_users "
        "FROM st GROUP BY 1"
    ),
)
def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streak distribution (gaps-and-islands:
    epoch-day minus row_number island keys) — exact integer plan, one
    user-key window."""
    from weaviate_spark.operators.analytics import activity_streaks

    return activity_streaks(_load(spark, sf_dir, "events"), "user_id", "ts")


@register(
    "text_langid_confusion",
    oracle=(
        "WITH toks AS (SELECT lang, "
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt "
        "FROM documents WHERE lang IS NOT NULL), "
        f"feat AS (SELECT lang, {_HITS} FROM toks), "
        f"pred AS (SELECT lang AS actual, {_BEST} AS predicted FROM feat), "
        "cells AS (SELECT actual, predicted, count(*) AS n FROM pred "
        "GROUP BY 1, 2), "
        "tot AS (SELECT actual, sum(n) AS t FROM cells GROUP BY 1) "
        "SELECT cells.actual, cells.predicted, CAST(cells.n AS BIGINT) AS n, "
        "round(CAST(cells.n AS DOUBLE) / CAST(tot.t AS DOUBLE) + 0.0, 6) "
        "AS share_of_actual "
        "FROM cells JOIN tot ON cells.actual = tot.actual"
    ),
)
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language identifier vs the
    labeled lang column (per-cell count + within-actual recall share) —
    the language-router eval harness."""
    from weaviate_spark.operators.textstats import langid_confusion

    return langid_confusion(_load(spark, sf_dir, "documents"), "text", "lang")


@register(
    "stats_welch_ttest",
    oracle=(
        "WITH s AS (SELECT event_type AS g, "
        "CAST(value AS DECIMAL(18,6)) AS v FROM events "
        "WHERE value IS NOT NULL "
        "AND event_type IN ('purchase', 'click')), "
        "a AS (SELECT count(*) AS n_a, sum(v) AS s1, sum(v * v) AS s2 "
        "FROM s WHERE g = 'purchase'), "
        "b AS (SELECT count(*) AS n_b, sum(v) AS s1, sum(v * v) AS s2 "
        "FROM s WHERE g = 'click'), "
        "m AS (SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, "
        "CAST(a.s1 AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma, "
        "CAST(b.s1 AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb, "
        "((CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE) "
        "/ CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) "
        "/ CAST(n_a AS DOUBLE) AS vna, "
        "((CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) "
        "/ CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) "
        "/ CAST(n_b AS DOUBLE) AS vnb "
        "FROM a, b) "
        "SELECT n_a, n_b, round(ma + 0.0, 6) AS mean_a, "
        "round(mb + 0.0, 6) AS mean_b, "
        "round((ma - mb) / sqrt(vna + vnb) + 0.0, 6) AS t_stat, "
        "round(((vna + vnb) * (vna + vnb)) "
        "/ (vna * vna / (CAST(n_a AS DOUBLE) - 1.0) "
        "+ vnb * vnb / (CAST(n_b AS DOUBLE) - 1.0)) + 0.0, 6) AS welch_df "
        "FROM m"
    ),
)
def q_stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on the event value metric,
    purchase vs click cohorts: per-side exact DECIMAL moment sums, then
    fixed-order double expressions for t and the Welch-Satterthwaite
    df — the continuous-metric A/B primitive."""
    from weaviate_spark.operators.analytics import welch_ttest

    return welch_ttest(
        _load(spark, sf_dir, "events"), "event_type", "value",
        "purchase", "click",
    )


@register(
    "stats_ks_two_sample",
    oracle=(
        "WITH s AS (SELECT CAST(value AS DECIMAL(18,6)) AS v, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia, "
        "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ib "
        "FROM events WHERE value IS NOT NULL "
        "AND event_type IN ('purchase', 'click')), "
        "pv AS (SELECT v, sum(ia) AS ca, sum(ib) AS cb FROM s GROUP BY v), "
        "cum AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma, "
        "sum(cb) OVER (ORDER BY v) AS cumb FROM pv), "
        "tot AS (SELECT CAST(sum(ia) AS BIGINT) AS na, "
        "CAST(sum(ib) AS BIGINT) AS nb FROM s), "
        "d AS (SELECT v, abs(cuma * nb - cumb * na) AS dnum, na, nb "
        "FROM cum, tot) "
        "SELECT na AS n_a, nb AS n_b, "
        "round(CAST(dnum AS DOUBLE) "
        "/ (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) + 0.0, 6) AS ks_stat, "
        "CAST(v AS DOUBLE) AS at_value "
        "FROM d ORDER BY dnum DESC, v ASC LIMIT 1"
    ),
)
def q_stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between purchase and
    click value distributions — integer-exact numerator max over the
    distinct-value table, so statistic AND argmax location are
    partition-invariant."""
    from weaviate_spark.operators.analytics import ks_two_sample

    return ks_two_sample(
        _load(spark, sf_dir, "events"), "event_type", "value",
        "purchase", "click",
    )


@register(
    "customer_rfm_segments",
    oracle=(
        "WITH pc AS (SELECT o_custkey AS c, "
        "max(CAST(o_orderdate AS DATE)) AS last_d, count(*) AS freq, "
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon "
        "FROM orders GROUP BY 1), "
        "r AS (SELECT max(CAST(o_orderdate AS DATE)) AS refd FROM orders), "
        "sc AS (SELECT c, datediff('day', last_d, refd) AS rec, freq, mon "
        "FROM pc, r), "
        "b AS (SELECT CAST(ntile(5) OVER (ORDER BY rec DESC, c ASC) AS INT) "
        "AS r_bin, "
        "CAST(ntile(5) OVER (ORDER BY freq ASC, c ASC) AS INT) AS f_bin, "
        "CAST(ntile(5) OVER (ORDER BY mon ASC, c ASC) AS INT) AS m_bin, "
        "mon FROM sc) "
        "SELECT r_bin, f_bin, m_bin, "
        "CAST(count(*) AS BIGINT) AS n_customers, "
        "round(CAST(sum(mon) AS DOUBLE) / count(*) + 0.0, 6) AS avg_monetary "
        "FROM b GROUP BY 1, 2, 3"
    ),
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders: recency / frequency /
    DECIMAL-exact monetary, each ntile(5)-scored with deterministic
    (metric, custkey) tie-breaks; output is the bounded segment cube
    with population and average spend per cell."""
    from weaviate_spark.operators.analytics import rfm_segments

    return rfm_segments(
        _load(spark, sf_dir, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice", bins=5,
    )


@register(
    "graph_link_prediction",
    oracle=(
        "WITH cs0 AS (SELECT DISTINCT o_custkey AS h, l_partkey AS n "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey), "
        "cs AS (SELECT * FROM cs0 WHERE h IN "
        "(SELECT h FROM cs0 GROUP BY h HAVING count(*) <= 10000)), "
        "deg AS (SELECT n, count(*) AS d FROM cs GROUP BY 1), "
        "cm AS (SELECT a.n AS na, b.n AS nb, count(*) AS c FROM cs a "
        "JOIN cs b ON a.h = b.h AND a.n < b.n GROUP BY 1, 2), "
        "osup AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS n "
        "FROM lineitem), "
        "te AS (SELECT DISTINCT a.n AS na, b.n AS nb FROM osup a "
        "JOIN osup b ON a.o = b.o AND a.n < b.n), "
        "cand AS (SELECT cm.na, cm.nb, cm.c FROM cm "
        "ANTI JOIN te ON cm.na = te.na AND cm.nb = te.nb), "
        "sc AS (SELECT cand.na, cand.nb, cand.c, "
        "da.d + db.d - cand.c AS u FROM cand "
        "JOIN deg da ON cand.na = da.n JOIN deg db ON cand.nb = db.n) "
        "SELECT na AS node_a, nb AS node_b, CAST(c AS BIGINT) "
        "AS common_hubs, CAST(u AS BIGINT) AS union_hubs, "
        "round(CAST(c AS DOUBLE) / CAST(u AS DOUBLE) + 0.0, 6) AS jaccard "
        "FROM sc ORDER BY jaccard DESC, node_a ASC, node_b ASC LIMIT 20"
    ),
)
def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link prediction over the part co-purchase graph:
    candidates = part pairs bought by a shared CUSTOMER (co-customer
    wedges, cost bounded by per-customer degree AND the
    max_hub_degree=10k skew guard, oracle-mirrored), existing links =
    pairs already co-occurring in an ORDER; survivors ranked by
    customer-set Jaccard — the 'next-basket' affinity prediction."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.graph import jaccard_link_prediction

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    wedge = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select("o_custkey", "l_partkey")
    # true edges via the posting-list shape (the jaccard_link_prediction
    # candidate-generation pattern): ONE groupBy shuffle of the raw
    # lineitem stream (collect_set supplies the per-order distinct) and a
    # double explode, instead of scanning lineitem twice and
    # sort-merge-joining the distinct (order, part) stream against
    # itself — identical pair set (A/B: 11,960,000 rows both forms at
    # sf1; 4.9 -> 1.8 s noop), one scan and one wide shuffle fewer.
    plist = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("_ps")
    ).where(F.size("_ps") >= 2)
    true_edges = (
        plist.select(F.explode("_ps").alias("_pa"), "_ps")
        .select("_pa", F.explode("_ps").alias("_pb"))
        .where(F.col("_pa") < F.col("_pb"))
        .select("_pa", "_pb")
        .distinct()
    )
    return jaccard_link_prediction(wedge, true_edges, top_k=20,
                                   max_hub_degree=10_000)


@register(
    "embedding_silhouette_labels",
    oracle=(
        "WITH e AS (SELECT vec_id, label, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL), "
        "it AS (SELECT vec_id, label, i - 1 AS dim, ev[i] AS val "
        "FROM e, LATERAL unnest(range(1, len(ev) + 1)) AS u(i)), "
        "c AS (SELECT label AS clbl, dim, avg(val) AS mu "
        "FROM it GROUP BY 1, 2), "
        "d AS (SELECT it.vec_id, it.label, c.clbl, "
        "round(sqrt(sum((val - mu) * (val - mu))), 6) + 0.0 AS dd "
        "FROM it JOIN c ON it.dim = c.dim GROUP BY 1, 2, 3), "
        "ab AS (SELECT vec_id, label, "
        "max(CASE WHEN clbl = label THEN dd END) AS a, "
        "min(CASE WHEN clbl <> label THEN dd END) AS b "
        "FROM d GROUP BY 1, 2), "
        "s AS (SELECT label, CASE WHEN greatest(a, b) = 0 THEN 0.0 "
        "ELSE round((b - a) / greatest(a, b), 6) + 0.0 END AS sv FROM ab) "
        "SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, "
        "round(CAST(sum(CAST(sv AS DECIMAL(10,6))) AS DOUBLE) / count(*) "
        "+ 0.0, 6) AS mean_silhouette, "
        "CAST(sum(CASE WHEN sv < 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_negative FROM s GROUP BY 1"
    ),
)
def q_embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-form) silhouette per label over the
    embedding corpus: label-coherence score + count of points sitting
    closer to a foreign centroid — the annotation-quality audit."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import silhouette_by_label

    emb = _load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    return silhouette_by_label(emb, "vec_id", "embedding", "label")


@register(
    "embedding_dim_stats",
    oracle=(
        "WITH e AS (SELECT list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS ev FROM embeddings "
        "WHERE embedding IS NOT NULL), "
        "it AS (SELECT i - 1 AS dim, "
        "CAST(round(ev[i], 6) AS DECIMAL(18,6)) AS v "
        "FROM e, LATERAL unnest(range(1, len(ev) + 1)) AS u(i)), "
        "m AS (SELECT dim, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2, "
        "min(v) AS mn, max(v) AS mx FROM it GROUP BY 1) "
        "SELECT CAST(dim AS INT) AS dim, CAST(n AS BIGINT) AS n, "
        "round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) + 0.0, 6) AS mean, "
        "round(sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) "
        "* CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) - 1.0), 0.0)) + 0.0, 6) AS std, "
        "CAST(mn AS DOUBLE) AS min_val, CAST(mx AS DOUBLE) AS max_val "
        "FROM m"
    ),
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding profile (mean/std/min/max from exact
    6dp-DECIMAL moment sums) — the dead-dimension / feature-drift
    audit; output is dims rows at any corpus size."""
    from weaviate_spark.operators.curation import embedding_dim_profile

    return embedding_dim_profile(
        _load(spark, sf_dir, "embeddings"), "embedding"
    )


@register(
    "text_zipf_fit",
    oracle=(
        "WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), "
        "'[\\p{L}\\p{N}]+')) AS t FROM documents), "
        "tf AS (SELECT t, count(*) AS c FROM toks GROUP BY 1), "
        "rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS r "
        "FROM tf), "
        "xy AS (SELECT CAST(round(ln(CAST(r AS DOUBLE)), 6) "
        "AS DECIMAL(18,6)) AS x, "
        "CAST(round(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y "
        "FROM rk WHERE r <= 1000), "
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_terms, "
        "CAST(count(*) AS DOUBLE) AS n, CAST(sum(x) AS DOUBLE) AS sx, "
        "CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(x * x) AS DOUBLE) AS sxx, "
        "CAST(sum(y * y) AS DOUBLE) AS syy, "
        "CAST(sum(x * y) AS DOUBLE) AS sxy FROM xy), "
        "m2 AS (SELECT n_terms, n, sx, sy, sxx, syy, sxy, "
        "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS sl FROM m) "
        "SELECT n_terms, round(sl + 0.0, 6) AS slope, "
        "round((sy - sl * sx) / n + 0.0, 6) AS intercept, "
        "round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) "
        "/ ((n * sxx - sx * sx) * (n * syy - sy * sy)) + 0.0, 6) AS r2 "
        "FROM m2"
    ),
)
def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law OLS fit (ln freq vs ln rank, top-1000 terms) over the
    corpus term distribution — slope near -1 is the natural-language
    health check; exact DECIMAL moment sums."""
    from weaviate_spark.operators.textstats import zipf_fit

    return zipf_fit(_load(spark, sf_dir, "documents"), "text", top_n=1000)


@register(
    "text_heaps_growth",
    oracle=(
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all("
        "lower(text), '[\\p{L}\\p{N}]+')) AS t FROM documents), "
        "pd AS (SELECT doc_id, count(*) AS m FROM toks GROUP BY 1), "
        "fo AS (SELECT t, min(doc_id) AS fd FROM toks GROUP BY 1), "
        "nt AS (SELECT fd AS doc_id, count(*) AS nv FROM fo GROUP BY 1), "
        "j AS (SELECT pd.doc_id, pd.m, coalesce(nt.nv, 0) AS nv "
        "FROM pd LEFT JOIN nt USING (doc_id)), "
        "c AS (SELECT row_number() OVER (ORDER BY doc_id) AS rn, "
        "sum(m) OVER (ORDER BY doc_id) AS ct, "
        "sum(nv) OVER (ORDER BY doc_id) AS cv, "
        "count(*) OVER () AS tot FROM j) "
        "SELECT CAST(rn AS BIGINT) AS docs_seen, "
        "CAST(ct AS BIGINT) AS cum_tokens, CAST(cv AS BIGINT) AS cum_vocab "
        "FROM c WHERE rn % 100 = 0 OR rn = tot"
    ),
)
def q_text_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve (cumulative tokens vs
    cumulative distinct terms at every 100th doc in id order) — the
    corpus-diversity trajectory, all-integer exact."""
    from weaviate_spark.operators.textstats import heaps_vocab_growth

    return heaps_vocab_growth(
        _load(spark, sf_dir, "documents"), "doc_id", "text", every=100
    )


@register(
    "text_ngram_novelty",
    oracle=(
        "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[\\p{L}\\p{N}]+') AS tt FROM documents), "
        "sh AS (SELECT DISTINCT doc_id AS _doc, "
        "array_to_string(tt[i:i+4], ' ') AS _shingle "
        "FROM toks, LATERAL unnest(range(1, greatest(len(tt) - 4, 0) + 1)) "
        "AS u(i) WHERE len(tt) >= 5), "
        "own AS (SELECT _shingle, min(_doc) AS _own FROM sh GROUP BY 1), "
        "pd AS (SELECT sh._doc, count(*) AS tot, "
        "sum(CASE WHEN own._own = sh._doc THEN 1 ELSE 0 END) AS nw "
        "FROM sh JOIN own ON sh._shingle = own._shingle GROUP BY 1), "
        "nov AS (SELECT _doc, CAST(round(CAST(nw AS DOUBLE) "
        "/ CAST(tot AS DOUBLE), 6) AS DECIMAL(10,6)) AS nv FROM pd), "
        "lab AS (SELECT nov.nv, d.source FROM nov "
        "JOIN documents d ON nov._doc = d.doc_id) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "round(CAST(sum(nv) AS DOUBLE) / count(*) + 0.0, 6) "
        "AS mean_novelty, "
        "CAST(sum(CASE WHEN nv = 1.0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_all_novel FROM lab GROUP BY 1"
    ),
)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 5-gram novelty (share of each doc's shingles first
    seen in that doc, scanning in id order) — the RefinedWeb-style
    freshness signal; exact-substring-dedup plan shape."""
    from weaviate_spark.operators.textstats import ngram_novelty

    return ngram_novelty(
        _load(spark, sf_dir, "documents"), "doc_id", "text", "source", n=5
    )


@register(
    "image_quality_stats",
    oracle=__import__(
        "weaviate_spark.media_oracles", fromlist=["image_quality_oracle_sql"]
    ).image_quality_oracle_sql(1000),
)
def q_image_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image quality statistics (mean/std gray, 8-bin histogram
    entropy, dominant bin) over REAL decode of the 6x4 PPM corpus —
    the flat-image / low-information filter of an image curation
    pipeline. The oracle rebuilds every gray sum analytically from the
    md5 hex and replays the integer-exact moment + entropy arithmetic."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.multimodal import image_quality_stats

    docs = _load(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    hexs = F.concat(
        F.md5(F.col("text")),
        *[
            F.md5(F.concat(F.col("text"), F.lit(str(i))))
            for i in range(2, 6)
        ],
    )
    pix = F.unhex(
        F.expr(
            "concat_ws('', transform(sequence(0, 71), i -> "
            "lpad(hex(cast(conv(substring(_hex, i * 2 + 1, 2), "
            "16, 10) as bigint)), 2, '0')))"
        )
    )
    media = docs.select(F.col("doc_id"), hexs.alias("_hex")).select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(b"P6\n6 4\n255\n"), pix).alias("media"),
    )
    return image_quality_stats(media, "media_id", "media")


@register(
    "graph_clustering_coeff",
    oracle=(
        "WITH raw AS MATERIALIZED (SELECT c.c_nationkey AS cn, "
        "s.s_nationkey AS sn "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey), "
        "ew AS MATERIALIZED (SELECT least(cn, sn) AS a, "
        "greatest(cn, sn) AS b, "
        "count(*) AS w FROM raw WHERE cn <> sn GROUP BY 1, 2), "
        "t AS (SELECT sum(w) AS tot, count(*) AS ne FROM ew), "
        "e AS MATERIALIZED (SELECT a, b FROM ew, t "
        "WHERE 10 * w * ne > 11 * tot), "
        "deg AS (SELECT n, count(*) AS d FROM "
        "(SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1), "
        "tri3 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        "FROM e e1 JOIN e e2 ON e2.a = e1.b "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
        "v AS (SELECT x AS node FROM tri3 UNION ALL SELECT y FROM tri3 "
        "UNION ALL SELECT z FROM tri3), "
        "tc AS (SELECT node, count(*) AS tri FROM v GROUP BY 1), "
        "j AS (SELECT deg.n, deg.d, coalesce(tc.tri, 0) AS tri "
        "FROM deg LEFT JOIN tc ON deg.n = tc.node) "
        "SELECT n_name AS nation, CAST(d AS BIGINT) AS degree, "
        "CAST(tri AS BIGINT) AS triangles, "
        "CASE WHEN d < 2 THEN 0.0 ELSE round(2.0 * tri "
        "/ (CAST(d AS DOUBLE) * (CAST(d AS DOUBLE) - 1.0)) + 0.0, 6) END "
        "AS coefficient FROM j JOIN nation ON n_nationkey = j.n"
    ),
)
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per nation over the SPARSIFIED
    trade graph (edges with weight > 1.1x the mean weight — an exact
    integer predicate, so the sparsification is scale-portable):
    degree-ordered triangle counting + one degree aggregate; oracle
    re-counts by sorted-triple enumeration."""
    from pyspark.sql import functions as F

    from weaviate_spark.cache import register_checkpoint
    from weaviate_spark.operators.graph import clustering_coefficient

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    raw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(F.col("c_nationkey").alias("cn"),
                F.col("s_nationkey").alias("sn"))
    )
    # checkpoint the weighted-edge aggregate: the threshold scalar t AND
    # the sparsified edge filter both consume it — uncached, each
    # reference replays the 4-table corpus join (and a .cache() here
    # nests under every downstream cache, exploding plan analysis)
    ew = register_checkpoint(
        raw.where(F.col("cn") != F.col("sn"))
        .groupBy(
            F.least("cn", "sn").alias("_a"),
            F.greatest("cn", "sn").alias("_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_w"))
    )
    t = ew.agg(
        F.sum("_w").cast("long").alias("_tot"),
        F.count(F.lit(1)).cast("long").alias("_ne"),
    )
    sparse = (
        ew.crossJoin(F.broadcast(t))
        .where(F.lit(10) * F.col("_w") * F.col("_ne")
               > F.lit(11) * F.col("_tot"))
        .select(F.col("_a").alias("src"), F.col("_b").alias("dst"))
    )
    cc = clustering_coefficient(sparse)
    return cc.join(
        F.broadcast(nation), cc.node == F.col("n_nationkey")
    ).select(
        F.col("n_name").alias("nation"), "degree", "triangles", "coefficient"
    )


@register(
    "stats_randomization_test",
    oracle=(
        "WITH base AS (SELECT event_id AS i, "
        "CAST(value AS DECIMAL(18,6)) AS v, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia "
        "FROM events WHERE value IS NOT NULL "
        "AND event_type IN ('purchase', 'click')), "
        "obs AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a, "
        "CAST(sum(1 - ia) AS BIGINT) AS n_b, "
        "CAST(sum(CASE WHEN ia = 1 THEN v END) AS DOUBLE) "
        "/ CAST(sum(ia) AS DOUBLE) "
        "- CAST(sum(CASE WHEN ia = 0 THEN v END) AS DOUBLE) "
        "/ CAST(sum(1 - ia) AS DOUBLE) AS od FROM base), "
        "rep AS (SELECT u.r, v, ('0x' || substr(md5('perm:' || u.r || ':' "
        "|| i), 1, 8))::BIGINT % 2 AS side "
        "FROM base, LATERAL unnest(range(0, 50)) AS u(r)), "
        "pr AS (SELECT r, CAST(sum(CASE WHEN side = 0 THEN v END) "
        "AS DOUBLE) / CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) "
        "AS DOUBLE) - CAST(sum(CASE WHEN side = 1 THEN v END) AS DOUBLE) "
        "/ CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS d "
        "FROM rep GROUP BY 1), "
        "ex AS (SELECT count(*) AS reps, sum(CASE WHEN abs(d) >= "
        "abs((SELECT od FROM obs)) THEN 1 ELSE 0 END) AS ne FROM pr) "
        "SELECT obs.n_a, obs.n_b, round(obs.od + 0.0, 6) AS obs_diff, "
        "CAST(ex.reps AS BIGINT) AS reps, CAST(ex.ne AS BIGINT) "
        "AS n_extreme, round((ex.ne + 1.0) / (ex.reps + 1.0) + 0.0, 6) "
        "AS p_value FROM obs, ex"
    ),
)
def q_stats_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic randomization test on the purchase-vs-click value
    means: 50 md5-seeded re-labelings, add-one p-value — the
    distribution-free companion to the Welch t statistic."""
    from weaviate_spark.operators.analytics import randomization_test

    return randomization_test(
        _load(spark, sf_dir, "events"), "event_id", "event_type", "value",
        "purchase", "click", reps=50,
    )


@register(
    "text_char_entropy",
    oracle=(
        "WITH ch AS (SELECT doc_id, substr(lower(text), CAST(i AS INT), 1) "
        "AS c FROM documents, "
        "LATERAL unnest(range(1, len(text) + 1)) AS u(i)), "
        "cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2), "
        "tot AS (SELECT doc_id, sum(n) AS t FROM cc GROUP BY 1), "
        "terms AS (SELECT cc.doc_id, CAST(round((CAST(n AS DOUBLE) "
        "/ CAST(t AS DOUBLE)) * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)), "
        "6) AS DECIMAL(18,6)) AS term FROM cc JOIN tot USING (doc_id)), "
        "pd AS (SELECT doc_id, CAST(-sum(term) AS DECIMAL(18,6)) AS h "
        "FROM terms GROUP BY 1), "
        "lab AS (SELECT pd.h, d.source FROM pd "
        "JOIN documents d USING (doc_id)) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "round(CAST(sum(h) AS DOUBLE) / count(*) + 0.0, 6) "
        "AS mean_entropy, CAST(min(h) AS DOUBLE) AS min_entropy, "
        "CAST(max(h) AS DOUBLE) AS max_entropy FROM lab GROUP BY 1"
    ),
)
def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-entropy profile (per-doc Shannon entropy
    over the lowercased char distribution, 6dp-DECIMAL-exact) — the
    gibberish / binary-paste text-quality gate."""
    from weaviate_spark.operators.textstats import char_entropy_by_group

    return char_entropy_by_group(
        _load(spark, sf_dir, "documents"), "doc_id", "text", "source"
    )


QVEC2 = [round(((i * 41 + 7) % 89) / 89.0 - 0.5, 6) for i in range(64)]
_QVEC2_SQL = "[" + ", ".join(str(x) for x in QVEC2) + "]::DOUBLE[]"
_QVEC2_GQL = "[" + ", ".join(str(x) for x in QVEC2) + "]"


@register(
    "graphql_explore_parsed",
    oracle=(
        f"WITH q AS (SELECT {_QVEC2_SQL} AS qv), "
        "ce AS (SELECT 'embeddings' AS class_name, "
        "CAST(vec_id AS VARCHAR) AS id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings UNION ALL "
        "SELECT 'docs_embedded' AS class_name, CAST(d.doc_id AS VARCHAR), "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE)) "
        "FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id "
        "WHERE d.lang = 'en'), "
        "sel AS (SELECT class_name, id, "
        "round(1 - list_dot_product(ev, qv) / (sqrt(list_dot_product(ev, "
        "ev)) * sqrt(list_dot_product(qv, qv))), 6) AS _distance "
        "FROM ce CROSS JOIN q ORDER BY _distance ASC, id ASC LIMIT 8) "
        "SELECT class_name, 'weaviate://localhost/' || class_name || '/' "
        "|| id AS beacon, _distance FROM sel"
    ),
)
def q_graphql_explore_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's THIRD GraphQL root: an Explore document (search
    args on the root field, no class selection —
    adapters/handlers/graphql/local/explore/) -> parse_graphql ->
    cross-class nearVector fan-out over the vector-capable classes,
    global (distance, id) merge, beacon projection."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.rerank import explore
    from weaviate_spark.plans import parse_graphql

    spec = parse_graphql(
        "{ Explore(nearVector: {vector: " + _QVEC2_GQL + "}, limit: 8) "
        "{ className beacon distance } }"
    )
    assert spec["root"] == "Explore" and spec["fields"] == [
        "className", "beacon", "distance"]
    vec, limit = spec["near_vector"].vector, spec["limit"]
    leg1 = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=vec, limit=limit, quantize="off",
    )).select("vec_id", "_distance")
    leg2 = near_vector(spark, sf_dir, NearVectorSpec(
        collection="docs_embedded", vector=vec, id_col="doc_id", limit=limit,
        where=Clause(operator="Equal", path=["lang"], value="en"),
    )).select("doc_id", "_distance")
    merged = explore(
        [("embeddings", leg1), ("docs_embedded", leg2)], limit=limit
    )
    return merged.select(
        "class_name",
        F.concat(
            F.lit("weaviate://localhost/"), F.col("class_name"),
            F.lit("/"), F.col("id"),
        ).alias("beacon"),
        "_distance",
    )


@register(
    "orders_cohort_ltv",
    oracle=(
        "WITH base AS (SELECT o_custkey AS c, "
        "date_trunc('month', CAST(o_orderdate AS DATE)) AS m, "
        "CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders), "
        "first AS (SELECT c, min(m) AS cohort FROM base GROUP BY 1), "
        "sizes AS (SELECT cohort, CAST(count(DISTINCT c) AS BIGINT) "
        "AS n_customers FROM first GROUP BY 1), "
        "cells AS (SELECT first.cohort, CAST(datediff('month', "
        "first.cohort, base.m) AS INT) AS months_since, sum(base.v) AS rev "
        "FROM base JOIN first ON base.c = first.c GROUP BY 1, 2), "
        "cum AS (SELECT cohort, months_since, sum(rev) OVER "
        "(PARTITION BY cohort ORDER BY months_since) AS cumr FROM cells) "
        "SELECT CAST(cum.cohort AS DATE) AS cohort_month, months_since, "
        "n_customers, CAST(cumr AS DOUBLE) AS cum_revenue, "
        "round(CAST(cumr AS DOUBLE) / CAST(n_customers AS DOUBLE) "
        "+ 0.0, 6) AS ltv "
        "FROM cum JOIN sizes ON cum.cohort = sizes.cohort"
    ),
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve over orders: first-order-month cohorts x
    months-since, cumulative DECIMAL-exact revenue per cohort
    customer — the retention family's revenue twin."""
    from weaviate_spark.operators.analytics import cohort_ltv

    return cohort_ltv(
        _load(spark, sf_dir, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice",
    )


@register(
    "events_funnel_latency",
    oracle=(
        "WITH a AS (SELECT user_id AS u, min(ts) AS ta FROM events "
        "WHERE event_type = 'signup' AND user_id IS NOT NULL GROUP BY 1), "
        "b AS (SELECT user_id AS u, ts AS tb FROM events "
        "WHERE event_type = 'purchase' AND user_id IS NOT NULL), "
        "conv AS (SELECT a.u, epoch_us(min(b.tb)) - epoch_us(a.ta) AS dus "
        "FROM a JOIN b ON a.u = b.u AND b.tb >= a.ta GROUP BY a.u, a.ta), "
        "na AS (SELECT CAST(count(*) AS BIGINT) AS n_step_a_users FROM a), "
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n_converted, "
        "round(quantile_cont(CAST(dus AS DOUBLE), 0.5) / 1000000.0 "
        "+ 0.0, 6) AS p50_delay_s, "
        "round(quantile_cont(CAST(dus AS DOUBLE), 0.9) / 1000000.0 "
        "+ 0.0, 6) AS p90_delay_s, "
        "round(CAST(max(dus) AS DOUBLE) / 1000000.0 + 0.0, 6) "
        "AS max_delay_s FROM conv) "
        "SELECT n_step_a_users, n_converted, "
        "round(CAST(n_converted AS DOUBLE) "
        "/ CAST(n_step_a_users AS DOUBLE) + 0.0, 6) AS conversion_rate, "
        "p50_delay_s, p90_delay_s, max_delay_s FROM na, st"
    ),
)
def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> purchase time-to-convert: first-step anchors, first
    qualifying second step, exact integer-microsecond delays with
    interpolated p50/p90 — the funnel's latency companion."""
    from weaviate_spark.operators.analytics import funnel_step_latency

    return funnel_step_latency(
        _load(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        "signup", "purchase",
    )


@register(
    "events_concurrent_sessions",
    oracle=(
        "WITH base AS (SELECT user_id AS u, ts, event_id AS i FROM events "
        "WHERE user_id IS NOT NULL), "
        "lg AS (SELECT u, ts, i, CASE WHEN lag(ts) OVER "
        "(PARTITION BY u ORDER BY ts, i) IS NULL OR epoch_us(ts) "
        "- epoch_us(lag(ts) OVER (PARTITION BY u ORDER BY ts, i)) "
        "> 1800000000 THEN 1 ELSE 0 END AS nw FROM base), "
        "sid AS (SELECT u, ts, sum(nw) OVER (PARTITION BY u "
        "ORDER BY ts, i ROWS UNBOUNDED PRECEDING) AS sid FROM lg), "
        "sess AS (SELECT u, sid, min(ts) AS s, max(ts) AS e "
        "FROM sid GROUP BY 1, 2), "
        "pts AS (SELECT s AS t, 1 AS d, u FROM sess UNION ALL "
        "SELECT make_timestamp(epoch_us(e) + 1), -1, u FROM sess "
        "UNION ALL "
        "SELECT CAST(gs.dd AS TIMESTAMP), 0, u FROM sess, "
        "unnest(generate_series(CAST(s AS DATE) + 1, CAST(e AS DATE), "
        "INTERVAL 1 DAY)) AS gs(dd) "
        "WHERE CAST(e AS DATE) > CAST(s AS DATE)), "
        "sw AS (SELECT t, sum(d) OVER (ORDER BY t ASC, "
        "CASE WHEN d = 1 THEN 0 WHEN d = -1 THEN 1 ELSE 2 END ASC, u ASC "
        "ROWS UNBOUNDED PRECEDING) AS run FROM pts), "
        "dm AS (SELECT CAST(t AS DATE) AS day, "
        "CAST(max(run) AS BIGINT) AS max_concurrent FROM sw GROUP BY 1), "
        "st AS (SELECT CAST(s AS DATE) AS day, "
        "CAST(count(*) AS BIGINT) AS n_sessions_started "
        "FROM sess GROUP BY 1) "
        "SELECT dm.day, coalesce(st.n_sessions_started, 0) "
        "AS n_sessions_started, dm.max_concurrent "
        "FROM dm LEFT JOIN st USING (day)"
    ),
)
def q_events_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day (30-min-gap sessionization,
    inclusive-bound sweep line with a deterministic tie order) — the
    capacity-planning readout; all-integer prefix sum over the
    session-endpoint table."""
    from weaviate_spark.operators.analytics import concurrent_sessions_daily

    return concurrent_sessions_daily(
        _load(spark, sf_dir, "events"), "user_id", "ts", "event_id",
        gap_minutes=30,
    )


def _markov_stationary_oracle_sql(iterations: int = 8) -> str:
    """Unrolled-CTE replay of operators/analytics.markov_stationary:
    6dp-DECIMAL transition matrix and iteration states, exact decimal
    products/sums — the pagerank-oracle discipline."""
    head = (
        "WITH seq AS MATERIALIZED (SELECT event_type AS f, "
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS t FROM events WHERE user_id IS NOT NULL), "
        "c AS MATERIALIZED (SELECT f, t, count(*) AS n FROM seq "
        "WHERE t IS NOT NULL GROUP BY 1, 2), "
        "tt AS MATERIALIZED (SELECT f, sum(n) AS tot FROM c GROUP BY 1), "
        "p AS MATERIALIZED (SELECT c.f, c.t, CAST(round(CAST(n AS DOUBLE) "
        "/ CAST(tot AS DOUBLE), 6) AS DECIMAL(10,6)) AS p "
        "FROM c JOIN tt USING (f)), "
        "s AS MATERIALIZED (SELECT f AS s FROM c UNION SELECT t FROM c), "
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM s), "
        "x0 AS MATERIALIZED (SELECT s, CAST(round(1.0 "
        "/ (SELECT n FROM nn), 6) AS DECIMAL(10,6)) AS x FROM s)"
    )
    steps = []
    for k in range(1, iterations + 1):
        steps.append(
            f", x{k} AS MATERIALIZED (SELECT p.t AS s, "
            f"CAST(round(sum(p.p * q.x), 6) AS DECIMAL(10,6)) AS x "
            f"FROM p JOIN x{k - 1} q ON p.f = q.s GROUP BY 1)"
        )
    tail = (
        f" SELECT s AS event_type, CAST(x AS DOUBLE) AS stationary_prob "
        f"FROM x{iterations}"
    )
    return head + "".join(steps) + tail


@register("events_markov_stationary", oracle=_markov_stationary_oracle_sql(8))
def q_events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain (8 exact
    -decimal power steps from uniform) — where traffic settles in the
    long run; oracle replays the trajectory via unrolled CTEs."""
    from weaviate_spark.operators.analytics import markov_stationary

    return markov_stationary(
        _load(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        "event_id", iterations=8,
    )


@register(
    "orders_revenue_trend",
    oracle=(
        "WITH cells AS (SELECT o_orderpriority AS g, "
        "date_trunc('month', CAST(o_orderdate AS DATE)) AS m, "
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev "
        "FROM orders GROUP BY 1, 2), "
        "xy AS (SELECT g, CAST(datediff('month', DATE '1970-01-01', m) "
        "AS DECIMAL(28,2)) AS x, CAST(rev AS DECIMAL(28,2)) AS y "
        "FROM cells), "
        "mo AS (SELECT g, CAST(count(*) AS BIGINT) AS n_points, "
        "CAST(count(*) AS DOUBLE) AS n, CAST(sum(x) AS DOUBLE) AS sx, "
        "CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(x * x) AS DOUBLE) AS sxx, "
        "CAST(sum(y * y) AS DOUBLE) AS syy, "
        "CAST(sum(x * y) AS DOUBLE) AS sxy FROM xy GROUP BY 1), "
        "m2 AS (SELECT *, n * sxx - sx * sx AS vx, "
        "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS sl FROM mo) "
        "SELECT g AS o_orderpriority, n_points, "
        "round(sl + 0.0, 6) AS slope, "
        "round((sy - sl * sx) / n + 0.0, 6) AS intercept, "
        "round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) "
        "/ (vx * (n * syy - sy * sy)) + 0.0, 6) AS r2 "
        "FROM m2 WHERE n_points >= 2 AND vx <> 0.0"
    ),
)
def q_orders_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority monthly-revenue OLS trend (slope/intercept/r2 from
    exact DECIMAL moments in ONE aggregate pass — grouped regression,
    no per-group iteration)."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import grouped_ols_trend

    cells = (
        _load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority"),
            F.trunc(F.col("o_orderdate").cast("timestamp").cast("date"),
                    "month").alias("_m"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev"))
    )
    return grouped_ols_trend(
        cells,
        "o_orderpriority",
        F.months_between(
            F.col("_m"), F.lit("1970-01-01").cast("date")
        ).cast("int"),
        F.col("_rev"),
        scale=2,
    )


@register(
    "orders_shipping_delay",
    oracle=(
        "WITH j AS (SELECT o_orderpriority AS g, datediff('day', "
        "CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS d "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey) "
        "SELECT g AS o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines, "
        "round(CAST(sum(CAST(d AS DECIMAL(18,0))) AS DOUBLE) / count(*) "
        "+ 0.0, 6) AS mean_delay_days, "
        "round(quantile_cont(CAST(d AS DOUBLE), 0.5) + 0.0, 6) "
        "AS p50_delay_days, "
        "round(quantile_cont(CAST(d AS DOUBLE), 0.9) + 0.0, 6) "
        "AS p90_delay_days, "
        "CAST(max(d) AS BIGINT) AS max_delay_days FROM j GROUP BY 1"
    ),
)
def q_orders_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per priority (exact integer day deltas,
    interpolated p50/p90, straggler max) — the fulfilment-SLA readout
    over the order-key fact-fact join."""
    from weaviate_spark.operators.analytics import shipping_delay_stats

    return shipping_delay_stats(
        _load(spark, sf_dir, "orders"), _load(spark, sf_dir, "lineitem")
    )


@register(
    "text_length_histogram",
    oracle=(
        "WITH n AS (SELECT lang AS g, "
        "len(regexp_extract_all(text, '[\\p{L}\\p{N}]+')) AS n "
        "FROM documents), "
        "b AS (SELECT g, CAST(CASE WHEN n <= 0 THEN -1 "
        "ELSE length(printf('%b', n)) - 1 END AS INT) AS bucket, n FROM n) "
        "SELECT g AS lang, bucket AS length_bucket, "
        "CAST(CASE WHEN bucket < 0 THEN 0 "
        "ELSE CAST(1 AS BIGINT) << bucket END AS BIGINT) "
        "AS bucket_min_tokens, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n) AS BIGINT) AS total_tokens FROM b GROUP BY 1, 2, 3"
    ),
)
def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed token-length histogram per language — the
    sequence-length profile packing/truncation policies tune against;
    bucket decision is integer-exact (the oracle derives it from the
    binary bit length, a genuinely different computation)."""
    from weaviate_spark.operators.textstats import length_histogram_by_group

    return length_histogram_by_group(
        _load(spark, sf_dir, "documents"), "text", "lang"
    )


def _gated_sine_wav(
    freq: int, mod: int, rems: tuple, sr: int = 8000, ms: int = 400,
    amp: int = 20000,
) -> bytes:
    """Sine fixture with frame-aligned silence gates: sample i is 0
    when (i // 400) % mod is in ``rems`` — the exact arithmetic the
    silence-run oracle regenerates in SQL."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        n = sr * ms // 1000
        wf.writeframes(b"".join(
            struct.pack(
                "<h",
                0 if (i // 400) % mod in rems
                else int(amp * math.sin(2 * math.pi * freq * i / sr)),
            )
            for i in range(n)
        ))
    return buf.getvalue()


@register(
    "audio_silence_runs",
    oracle=(
        "WITH p(media_id, freq, m, r1, r2) AS (VALUES "
        "(1, 300, 2, 1, 1), (2, 443, 4, 2, 3), (3, 700, 1, 9, 9)), "
        "s AS (SELECT media_id, i, "
        "CASE WHEN ((i // 400) % m) IN (r1, r2) THEN 0.0 "
        "ELSE trunc(20000 * sin(2 * pi() * freq * i / 8000)) / 32768 END "
        "AS x FROM p, LATERAL unnest(range(0, 3200)) AS u(i)), "
        "f AS (SELECT media_id, CAST(i // 400 AS BIGINT) AS frame_idx, "
        "round(sqrt(avg(x * x)), 6) AS rms FROM s GROUP BY 1, 2), "
        "sil AS (SELECT media_id, frame_idx FROM f WHERE rms < 0.01), "
        "isl AS (SELECT media_id, frame_idx, frame_idx - row_number() "
        "OVER (PARTITION BY media_id ORDER BY frame_idx) AS grp FROM sil) "
        "SELECT media_id, CAST(min(frame_idx) AS BIGINT) AS run_start, "
        "CAST(count(*) AS BIGINT) AS run_frames "
        "FROM isl GROUP BY media_id, grp"
    ),
)
def q_audio_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-run detection over real WAV decode (frame RMS threshold
    + gaps-and-islands): gated-sine fixtures with known silent frames;
    the oracle regenerates the gated signals from first principles."""
    from weaviate_spark.operators.multimodal import audio_silence_runs

    rows = [
        (1, bytearray(_gated_sine_wav(300, 2, (1,)))),
        (2, bytearray(_gated_sine_wav(443, 4, (2, 3)))),
        (3, bytearray(_gated_sine_wav(700, 1, (9,)))),
    ]
    df = local_df(spark, rows, "media_id long, blob binary")
    return audio_silence_runs(df, "media_id", "blob", frame_samples=400)


@register(
    "supplier_scorecard",
    oracle=(
        "WITH agg AS (SELECT l_suppkey AS s, "
        "CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) "
        "AS DECIMAL(28,8)) AS rev, "
        "sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret "
        "FROM lineitem GROUP BY 1) "
        "SELECT s AS s_suppkey, s_name, n_lines, "
        "CAST(rev AS DOUBLE) AS revenue, "
        "round(CAST(ret AS DOUBLE) / CAST(n_lines AS DOUBLE) + 0.0, 6) "
        "AS return_rate "
        "FROM agg JOIN supplier ON s = s_suppkey "
        "ORDER BY revenue DESC, s_suppkey ASC LIMIT 20"
    ),
)
def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 supplier scorecard (DECIMAL-exact discounted revenue,
    return rate, line volume) — the composite entity report; one fact
    aggregate + broadcast dim join + top-k."""
    from weaviate_spark.operators.analytics import supplier_scorecard

    return supplier_scorecard(
        _load(spark, sf_dir, "lineitem"), _load(spark, sf_dir, "supplier"),
        top_k=20,
    )


@register(
    "events_dormancy_reactivation",
    oracle=(
        "WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day "
        "FROM events WHERE user_id IS NOT NULL), "
        "lg AS (SELECT u, day, datediff('day', "
        "lag(day) OVER (PARTITION BY u ORDER BY day), day) AS gap FROM ud) "
        "SELECT day, CAST(count(*) AS BIGINT) AS n_active_users, "
        "CAST(sum(CASE WHEN gap > 14 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_reactivated FROM lg GROUP BY 1"
    ),
)
def q_events_dormancy_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win-back curve: per day, active users and how many returned
    from a >14-day silence — all-integer lag-window plan."""
    from weaviate_spark.operators.analytics import dormancy_reactivations

    return dormancy_reactivations(
        _load(spark, sf_dir, "events"), "user_id", "ts", dormant_days=14
    )


@register(
    "knn_filtered_quantized",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv), "
        "enc AS (SELECT vec_id, label, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev, "
        f"{_BQ_WORD_SQL.format(lo=0)} AS bq0, "
        f"{_BQ_WORD_SQL.format(lo=32)} AS bq1 "
        "FROM embeddings WHERE label >= 5), "
        "cand AS (SELECT vec_id, label, ev, "
        f"bit_count(xor(bq0, CAST({_BQ_QW[0]} AS BIGINT))) + "
        f"bit_count(xor(bq1, CAST({_BQ_QW[1]} AS BIGINT))) AS _hamming "
        "FROM enc ORDER BY _hamming ASC, vec_id ASC LIMIT 40) "
        f"SELECT vec_id, label, {_COS_SQL} AS _distance "
        "FROM cand CROSS JOIN q ORDER BY _distance ASC, vec_id ASC LIMIT 10"
    ),
)
def q_knn_filtered_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED search on the compressed scan: the label predicate
    becomes an allowlist semi-join on the BQ index BEFORE the hamming
    overfetch (flat-index filtered search at 100 TB — the rescore
    budget is spent only on rows that satisfy the filter); exact cosine
    rescore after. Reached through the public near_vector API with an
    explicit quantize="bq" (and an explicit quantize_overfetch=4 —
    the documented BQ recall trade is accepted, keeping runs
    warning-clean)."""
    out = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=10, quantize="bq",
        quantize_overfetch=4,
        where=Clause(operator="GreaterThanEqual", path=["label"], value=5),
    ))
    return out.select("vec_id", "label", "_distance")


def _rake_oracle_sql(top_k: int = 15) -> str:
    from weaviate_spark.functions.text import EN_STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return (
        "WITH tt AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[\\p{L}\\p{N}]+') AS tk FROM documents), "
        "toks AS (SELECT doc_id, i - 1 AS pos, tk[i] AS w FROM tt, "
        "LATERAL unnest(range(1, len(tk) + 1)) AS u(i)), "
        f"ns AS (SELECT * FROM toks WHERE w NOT IN ({stoplist})), "
        "isl AS (SELECT doc_id, pos, w, pos - row_number() OVER "
        "(PARTITION BY doc_id ORDER BY pos) AS grp FROM ns), "
        "ph AS (SELECT doc_id, grp, string_agg(w, ' ' ORDER BY pos) "
        "AS phrase, count(*) AS len FROM isl GROUP BY 1, 2), "
        "occ AS (SELECT phrase, len, unnest(string_split(phrase, ' ')) "
        "AS w FROM ph), "
        "ws AS (SELECT w, CAST(round(CAST(sum(len) AS DOUBLE) "
        "/ CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS ws "
        "FROM occ GROUP BY 1), "
        "pp AS (SELECT DISTINCT phrase, len FROM ph), "
        "ppw AS (SELECT phrase, len, unnest(string_split(phrase, ' ')) "
        "AS w FROM pp), "
        "sc AS (SELECT phrase, CAST(min(len) AS BIGINT) AS n_words, "
        "CAST(CAST(sum(ws) AS DECIMAL(18,6)) AS DOUBLE) AS rake_score "
        "FROM ppw JOIN ws USING (w) GROUP BY 1) "
        "SELECT phrase, n_words, rake_score FROM sc "
        f"ORDER BY rake_score DESC, phrase ASC LIMIT {top_k}"
    )


@register("text_rake_keyphrases", oracle=_rake_oracle_sql(15))
def q_text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction over the corpus (stopword-delimited
    candidate runs, degree/freq word scores at 6dp DECIMAL, exact
    phrase-score sums) — the co-occurrence-based extractor next to
    TF-IDF keywords."""
    from weaviate_spark.operators.textstats import rake_keyphrases

    return rake_keyphrases(
        _load(spark, sf_dir, "documents"), "doc_id", "text", top_k=15
    )


@register(
    "agg_grouping_sets",
    oracle=(
        "SELECT o_orderpriority, o_orderstatus, "
        "CAST(grouping(o_orderpriority) AS INT) AS g_priority, "
        "CAST(grouping(o_orderstatus) AS INT) AS g_status, "
        "CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
        "AS revenue "
        "FROM orders GROUP BY GROUPING SETS ((o_orderpriority, "
        "o_orderstatus), (o_orderpriority), (o_orderstatus))"
    ),
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the third grouping-set surface next to
    CUBE and ROLLUP): (priority x status), priority-only, and
    status-only margins in ONE pass, with GROUPING flags
    disambiguating real NULLs from margin rows."""
    from pyspark.sql import functions as F

    orders = _load(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"],
         ["o_orderstatus"]],
        "o_orderpriority", "o_orderstatus",
    ).agg(
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "events_bot_profile",
    oracle=(
        "WITH pm AS (SELECT user_id AS u, date_trunc('minute', ts) AS m, "
        "count(*) AS n FROM events WHERE user_id IS NOT NULL "
        "GROUP BY 1, 2), "
        "pu AS (SELECT u, sum(n) AS ev, max(n) AS mx FROM pm GROUP BY 1), "
        "ty AS (SELECT user_id AS u, count(DISTINCT event_type) AS nt "
        "FROM events WHERE user_id IS NOT NULL GROUP BY 1), "
        "fl AS (SELECT pu.u, ev, mx, (mx >= 2 OR nt <= 1) AS suspect "
        "FROM pu JOIN ty ON pu.u = ty.u) "
        "SELECT suspect, CAST(count(*) AS BIGINT) AS n_users, "
        "round(CAST(sum(ev) AS DOUBLE) / count(*) + 0.0, 6) AS avg_events, "
        "round(CAST(sum(mx) AS DOUBLE) / count(*) + 0.0, 6) "
        "AS avg_max_per_min FROM fl GROUP BY 1"
    ),
)
def q_events_bot_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-quality gate: users flagged by burst rate (>= 2 events
    in one minute) or single-type monotony; summary per flag — the
    measurable 'drop bot sessions' curation step."""
    from weaviate_spark.operators.analytics import bot_traffic_profile

    return bot_traffic_profile(
        _load(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        burst_threshold=2,
    )


@register(
    "events_asof_next_purchase",
    oracle=(
        "WITH e AS (SELECT event_id, user_id AS u, ts FROM events "
        "WHERE event_type = 'error' AND user_id IS NOT NULL), "
        "p0 AS (SELECT user_id AS u, ts AS pts, value, event_id AS pe "
        "FROM events WHERE event_type = 'purchase' "
        "AND user_id IS NOT NULL), "
        "p AS (SELECT u, pts, value FROM (SELECT u, pts, value, "
        "row_number() OVER (PARTITION BY u, pts ORDER BY pe DESC) AS rk "
        "FROM p0) WHERE rk = 1), "
        "j AS (SELECT e.event_id, p.pts, p.value, row_number() OVER "
        "(PARTITION BY e.event_id ORDER BY p.pts ASC NULLS LAST) AS rk "
        "FROM e LEFT JOIN p ON e.u = p.u AND p.pts >= e.ts "
        "AND epoch_us(p.pts) - epoch_us(e.ts) <= 1800000000) "
        "SELECT event_id, pts AS asof_ts, value AS asof_value "
        "FROM j WHERE rk = 1"
    ),
)
def q_events_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every error event, the user's next
    purchase within 30 minutes (earliest right row at-or-after the
    left timestamp) — the time-to-response join; same single-exchange
    union-window plan as the backward direction, scan reversed. The
    oracle is the naive interval join + per-left argmin — two
    different algorithms must agree."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import asof_join

    ev = _load(spark, sf_dir, "events")
    left = ev.where(
        (F.col("event_type") == "error") & F.col("user_id").isNotNull()
    ).select("event_id", "user_id", "ts")
    right = ev.where(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select("user_id", "ts", "value", F.col("event_id").alias("pe"))
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["value"], right_tiebreak="pe", direction="forward",
        tolerance_seconds=1800.0,
    )
    return out.select("event_id", "asof_ts", F.col("asof_value"))


@register(
    "events_duplicate_purchases",
    oracle=(
        "WITH b AS (SELECT user_id AS c, "
        "CAST(floor(value) AS DECIMAL(18,2)) AS amt, event_id AS o, "
        "CAST(ts AS DATE) AS d FROM events "
        "WHERE event_type = 'purchase' AND user_id IS NOT NULL "
        "AND value IS NOT NULL) "
        "SELECT a.c AS user_id, a.o AS order_a, bb.o AS order_b, "
        "CAST(a.amt AS DOUBLE) AS amount, "
        "CAST(abs(datediff('day', a.d, bb.d)) AS BIGINT) AS day_gap "
        "FROM b a JOIN b bb ON a.c = bb.c AND a.amt = bb.amt "
        "AND a.o < bb.o "
        "WHERE abs(datediff('day', a.d, bb.d)) <= 1"
    ),
)
def q_events_duplicate_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-charge audit: same user, same dollar amount (floored),
    purchases within a day of each other — (user, amount) equi-join
    blocking, never a cross join; the retry/double-click screen."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.analytics import duplicate_charge_audit

    ev = _load(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).withColumn("_amt_bucket", F.floor(F.col("value")))
    return duplicate_charge_audit(
        ev, cust_col="user_id", key_col="event_id", ts_col="ts",
        amount_col="_amt_bucket", window_days=1,
    )


@register(
    "part_price_outliers",
    oracle=(
        "WITH b AS (SELECT p_brand AS g, p_partkey AS id, "
        "CAST(p_retailprice AS DECIMAL(18,6)) AS v FROM part "
        "WHERE p_retailprice IS NOT NULL), "
        "m AS (SELECT g, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2 "
        "FROM b GROUP BY 1), "
        "st AS (SELECT g, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, "
        "sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) "
        "* CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) - 1.0), 0.0)) AS std FROM m) "
        "SELECT b.g AS p_brand, b.id AS p_partkey, "
        "CAST(b.v AS DOUBLE) AS p_retailprice, "
        "round((CAST(b.v AS DOUBLE) - st.mean) / st.std + 0.0, 6) "
        "AS zscore "
        "FROM b JOIN st ON b.g = st.g WHERE st.std > 0 "
        "AND abs(round((CAST(b.v AS DOUBLE) - st.mean) / st.std + 0.0, 6)) "
        "> 1.6"
    ),
)
def q_part_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog price outliers: parts priced > 1.6 sigma off their brand's
    exact-moment distribution — broadcast stat join, no full-table
    window."""
    from weaviate_spark.operators.analytics import price_outliers_by_group

    return price_outliers_by_group(
        _load(spark, sf_dir, "part"), "p_brand", "p_partkey",
        "p_retailprice", z_threshold=1.6,
    )


def _hybrid_multi_target_oracle_sql() -> str:
    """hybrid_oracle_sql with the dense leg swapped for the
    MULTI-TARGET minimum combine over (full, head) named vectors —
    everything else (BM25 leg, RRF fusion, caps, tie order) is the
    generated single-target oracle verbatim."""
    from weaviate_spark.operators.hybrid import hybrid_oracle_sql

    base = hybrid_oracle_sql(
        "spark filter join", QVEC, alpha=0.5, fusion="ranked", limit=10
    )
    old_vd = (
        """vd AS (
  SELECT doc_id AS id, round(1 - list_dot_product(ev, v) /
    (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(v, v))), 6) AS _distance
  FROM (SELECT doc_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM corpus)
  CROSS JOIN qv
  ORDER BY _distance ASC, id ASC LIMIT 100
),"""
    )
    new_vd = (
        "vd AS (\n"
        "  SELECT doc_id AS id, least(\n"
        "    round(1 - list_dot_product(vf, qf) / (sqrt(list_dot_product(vf, vf)) * sqrt(list_dot_product(qf, qf))), 6),\n"
        "    round(1 - list_dot_product(vh, qh) / (sqrt(list_dot_product(vh, vh)) * sqrt(list_dot_product(qh, qh))), 6)\n"
        "  ) AS _distance\n"
        "  FROM (SELECT doc_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vf,\n"
        "        list_transform(embedding[1:32], x -> CAST(x AS DOUBLE)) AS vh FROM corpus)\n"
        f"  CROSS JOIN (SELECT {_QVEC_SQL} AS qf, {_QVEC32_SQL} AS qh)\n"
        "  ORDER BY _distance ASC, id ASC LIMIT 100\n"
        "),"
    )
    assert old_vd in base, "hybrid oracle template changed"
    return base.replace(old_vd, new_vd)


@register("hybrid_multi_target", oracle=_hybrid_multi_target_oracle_sql())
def q_hybrid_multi_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search whose DENSE leg is a multi-target (named-vector)
    search — BM25 keyword leg + Minimum-combined (full, head) vector
    leg, RRF fusion (the reference's hybrid + targetVectors
    composition, searcher.go + shard_combine_multi_target.go). Built
    from the SAME fuse() all single-target hybrids use."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.bm25 import (
        BM25Prop, BM25Spec, bm25_score_df, with_materialized_stats,
    )
    from weaviate_spark.operators.hybrid import fuse
    from weaviate_spark.operators.vector import (
        NamedTarget, named_multi_target_search,
    )
    from weaviate_spark.cache import release_caches
    from weaviate_spark.sources.tables import load_table

    release_caches()
    cap, limit, alpha = 100, 10, 0.5
    corpus = load_table(spark, sf_dir, "docs_embedded")

    bspec = BM25Spec(
        collection="docs_embedded", query="spark filter join",
        properties=[BM25Prop("text")], id_col="doc_id",
    )
    bspec = with_materialized_stats(bspec, corpus, (sf_dir, "docs_embedded"))
    sparse = (
        bm25_score_df(corpus, bspec)
        .orderBy(F.col("_score").desc(), F.col("doc_id").asc())
        .limit(cap)
        .select("doc_id", F.col("_score").alias("_secondary"))
    )
    named = corpus.select(
        "doc_id",
        F.struct(
            F.col("embedding").alias("full"),
            F.slice("embedding", 1, 32).alias("head"),
        ).alias("_vectors"),
    )
    dense = named_multi_target_search(
        named,
        [NamedTarget("full", QVEC, 1.0), NamedTarget("head", QVEC[:32], 1.0)],
        "doc_id", combination="min", limit=cap,
    ).select(
        "doc_id", (F.lit(1.0) - F.col("_distance")).alias("_secondary")
    )
    fused = fuse([(sparse, 1.0 - alpha), (dense, alpha)], "doc_id", "ranked")
    return fused.orderBy(
        F.col("_score").desc(), F.col("doc_id").asc()
    ).limit(limit)


@register(
    "dedup_cross_source_matrix",
    oracle=(
        "SELECT least(da.source, db.source) AS source_a, "
        "greatest(da.source, db.source) AS source_b, "
        "CAST(count(*) AS BIGINT) AS n_pairs, "
        "round(CAST(sum(CAST(p.jaccard AS DECIMAL(10,6))) AS DOUBLE) "
        "/ count(*) + 0.0, 6) AS mean_jaccard "
        "FROM (" + _MINHASH_SQL.format(thr=0.35) + ") p "
        "JOIN documents da ON p.id_a = da.doc_id "
        "JOIN documents db ON p.id_b = db.doc_id "
        "GROUP BY 1, 2"
    ),
)
def q_dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication leakage matrix: MinHash-LSH near-dup
    pairs joined back to each side's provenance — per (source, source)
    cell, pair count and mean verified Jaccard. The 'is source X
    scraping source Y' / benchmark-leakage provenance audit; costs one
    broadcast-dim join over the existing pair pipeline."""
    from pyspark.sql import functions as F

    df = _load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
        jaccard_threshold=0.35, max_bucket_size=1_000_000,
        table_key=(sf_dir, "documents"),
    )
    src = df.select("doc_id", "source")
    lab = (
        pairs.join(
            F.broadcast(src.withColumnRenamed("doc_id", "id_a")
                        .withColumnRenamed("source", "_sa")), "id_a")
        .join(
            F.broadcast(src.withColumnRenamed("doc_id", "id_b")
                        .withColumnRenamed("source", "_sb")), "id_b")
    )
    return lab.groupBy(
        F.least("_sa", "_sb").alias("source_a"),
        F.greatest("_sa", "_sb").alias("source_b"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.col("jaccard").cast("decimal(10,6)")).cast("double")
            / F.count(F.lit(1))
            + F.lit(0.0),
            6,
        ).alias("mean_jaccard"),
    )


@register(
    "embedding_centroid_drift",
    oracle=(
        "WITH e AS (SELECT vec_id, label, vec_id % 2 = 0 AS a, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL), "
        "it AS (SELECT label, a, i - 1 AS dim, ev[i] AS val "
        "FROM e, LATERAL unnest(range(1, len(ev) + 1)) AS u(i)), "
        "c AS (SELECT label, a, dim, avg(val) AS mu, count(*) AS n "
        "FROM it GROUP BY 1, 2, 3), "
        "j AS (SELECT ca.label, ca.dim, ca.mu AS ma, cb.mu AS mb, "
        "ca.n AS na, cb.n AS nb FROM c ca JOIN c cb "
        "ON ca.label = cb.label AND ca.dim = cb.dim "
        "AND ca.a AND NOT cb.a) "
        "SELECT label, CAST(max(na) AS BIGINT) AS n_even, "
        "CAST(max(nb) AS BIGINT) AS n_odd, "
        "round(sqrt(sum((ma - mb) * (ma - mb))), 6) + 0.0 "
        "AS centroid_shift FROM j GROUP BY 1"
    ),
)
def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid shift between the even-id and odd-id ingest
    cohorts — the embedding-space drift monitor next to PSI."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import embedding_centroid_drift

    emb = _load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    return embedding_centroid_drift(emb, "vec_id", "embedding", "label")


@register(
    "curation_training_mix",
    oracle=(
        "WITH base AS (SELECT doc_id AS id, lang AS g, "
        "CAST(len(regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')) "
        "AS BIGINT) AS tok FROM documents WHERE lang IS NOT NULL), "
        "c AS (SELECT g, sum(tok) AS n FROM base GROUP BY 1), "
        "t AS (SELECT sum(n) AS nn FROM c), "
        "w AS (SELECT g, n, CAST(round(sqrt(CAST(n AS DOUBLE) "
        "/ (SELECT CAST(nn AS DOUBLE) FROM t)), 6) AS DECIMAL(10,6)) "
        "AS w FROM c), "
        "z AS (SELECT sum(w) AS z FROM w), "
        "bud AS (SELECT g, CAST(n AS BIGINT) AS group_tokens, "
        "CAST(floor(50000.0 * CAST(w AS DOUBLE) "
        "/ (SELECT CAST(z AS DOUBLE) FROM z)) AS BIGINT) "
        "AS budget_tokens FROM w), "
        "ord AS (SELECT g, id, tok, coalesce(sum(tok) OVER "
        "(PARTITION BY g ORDER BY "
        + __import__(
            "weaviate_spark.operators.sampling",
            fromlist=["unit_hash_sql"],
        ).unit_hash_sql("id", "mix")
        + " ASC, id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
        "PRECEDING), 0) AS before FROM base), "
        "adm AS (SELECT ord.g, count(*) AS n_docs, sum(tok) AS toks "
        "FROM ord JOIN bud ON ord.g = bud.g "
        "WHERE before < budget_tokens GROUP BY 1) "
        "SELECT bud.g AS lang, group_tokens, budget_tokens, "
        "CAST(coalesce(adm.n_docs, 0) AS BIGINT) AS n_docs_selected, "
        "CAST(coalesce(adm.toks, 0) AS BIGINT) AS tokens_selected "
        "FROM bud LEFT JOIN adm ON bud.g = adm.g"
    ),
)
def q_curation_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted training-mix construction: temperature-2 smoothed
    per-language budgets (sqrt token share, 6dp-DECIMAL weights, exact
    Z), deterministic md5-order admission under an exclusive prefix
    sum — the mixture step between curation and packing."""
    from weaviate_spark.operators.sampling import training_mix_allocation

    return training_mix_allocation(
        _load(spark, sf_dir, "documents"), "doc_id", "text", "lang",
        total_budget=50_000, salt="mix",
    )


def _kcenter_oracle_sql(k: int = 8) -> str:
    """Unrolled-CTE replay of curation.kcenter_coreset: identical seed
    hash, identical dot-identity distance at 6dp, identical
    (maximin desc, id asc) argmax per round."""
    head = (
        "WITH e AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        "sel1 AS MATERIALIZED (SELECT CAST(1 AS INT) AS rank, vec_id, "
        "0.0 AS radius FROM e ORDER BY ('0x' || substr(md5('kc:' || "
        "CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT ASC, vec_id ASC LIMIT 1)"
    )
    fixed = []
    for r in range(2, k + 1):
        prev = f"sel{r - 1}"
        fixed.append(
            f", d{r} AS MATERIALIZED (SELECT e.vec_id, "
            "min(round(sqrt(greatest(list_dot_product(e.ev, e.ev) "
            "- 2 * list_dot_product(e.ev, s.ev) "
            "+ list_dot_product(s.ev, s.ev), 0.0)), 6)) AS mind "
            f"FROM e JOIN (SELECT e2.ev FROM {prev} q "
            "JOIN e e2 ON q.vec_id = e2.vec_id) s ON true "
            f"WHERE e.vec_id NOT IN (SELECT vec_id FROM {prev}) "
            "GROUP BY e.vec_id)"
            f", p{r} AS MATERIALIZED (SELECT CAST({r} AS INT) AS rank, "
            f"vec_id, mind AS radius FROM d{r} "
            "ORDER BY mind DESC, vec_id ASC LIMIT 1)"
            f", sel{r} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL "
            f"SELECT * FROM p{r})"
        )
    tail = (
        f" SELECT rank, vec_id, radius + 0.0 AS radius FROM sel{k}"
    )
    return head + "".join(fixed) + tail


@register("embedding_kcenter_coreset", oracle=_kcenter_oracle_sql(8))
def q_embedding_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (k=8 farthest-point traversal) over the
    embedding corpus: the diversity-maximizing data-selection trace
    with its coverage radii; unrolled-CTE oracle replays every round."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import kcenter_coreset

    emb = _load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    return kcenter_coreset(emb, "vec_id", "embedding", k=8, salt="kc")


@register(
    "reco_user_user_similar",
    oracle=(
        "WITH inter AS (SELECT o_custkey AS u, p_brand AS i, "
        "CAST(count(*) AS DECIMAL(18,2)) AS r FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN part ON l_partkey = p_partkey GROUP BY 1, 2), "
        "act AS (SELECT u FROM (SELECT u, sum(r) AS t FROM inter "
        "GROUP BY 1) ORDER BY t DESC, u ASC LIMIT 50), "
        "ri AS (SELECT inter.* FROM inter SEMI JOIN act USING (u)), "
        "norms AS (SELECT u, sum(r * r) AS sq FROM ri GROUP BY 1), "
        "num AS (SELECT a.u AS ca, b.u AS cb, count(*) AS n_co, "
        "sum(a.r * b.r) AS dot FROM ri a JOIN ri b "
        "ON a.i = b.i AND a.u <> b.u GROUP BY 1, 2 "
        "HAVING count(*) >= 2), "
        "cos AS (SELECT ca, cb, n_co, round(CAST(dot AS DOUBLE) "
        "/ sqrt(CAST(na.sq AS DOUBLE) * CAST(nb.sq AS DOUBLE)), 6) + 0.0 "
        "AS cosine FROM num JOIN norms na ON ca = na.u "
        "JOIN norms nb ON cb = nb.u), "
        "rk AS (SELECT *, row_number() OVER (PARTITION BY ca "
        "ORDER BY cosine DESC, cb ASC) AS r FROM cos) "
        'SELECT ca AS cust_a, cb AS cust_b, '
        'CAST(n_co AS BIGINT) AS n_co_brands, cosine, '
        'CAST(r AS BIGINT) AS "rank" FROM rk WHERE r <= 5'
    ),
)
def q_reco_user_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-user collaborative filtering over the 50 most active
    customers ('segment twins for the key accounts'): the SAME sparse
    -cosine operator with the roles swapped — the active-set semi-join
    is what keeps the brand-keyed wedge bounded (brands are hub keys;
    unrestricted user-user via 25 brands is Σ deg² and dies at scale,
    so the public surface bakes the cap in)."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.reco import item_item_cosine

    inter = _reco_interactions(spark, sf_dir)
    act = (
        inter.groupBy("u").agg(F.sum("r").alias("_t"))
        .orderBy(F.col("_t").desc(), F.col("u").asc())
        .limit(50)
        .select("u")
    )
    ri = inter.join(F.broadcast(act), "u", "left_semi")
    out = item_item_cosine(ri, user_col="i", item_col="u",
                           rating_col="r", k=5, min_co_users=2)
    return out.select(
        F.col("item_a").alias("cust_a"),
        F.col("item_b").alias("cust_b"),
        F.col("n_co_users").alias("n_co_brands"),
        "cosine",
        "rank",
    )


@register(
    "multivector_maxsim_pruned",
    oracle=(
        f"WITH q AS (SELECT {_Q_TOK1_SQL} AS q1, {_Q_TOK2_SQL} AS q2), "
        f"e AS (SELECT vec_id, {_slice_sql(1, 21)} AS t1, "
        f"{_slice_sql(22, 42)} AS t2, {_slice_sql(43, 63)} AS t3 "
        "FROM embeddings), "
        "ta AS (SELECT vec_id FROM e CROSS JOIN q ORDER BY "
        "round(greatest(list_dot_product(t1, q1), "
        "list_dot_product(t2, q1), list_dot_product(t3, q1)), 6) DESC, "
        "vec_id ASC LIMIT 50), "
        "tb AS (SELECT vec_id FROM e CROSS JOIN q ORDER BY "
        "round(greatest(list_dot_product(t1, q2), "
        "list_dot_product(t2, q2), list_dot_product(t3, q2)), 6) DESC, "
        "vec_id ASC LIMIT 50), "
        "cand AS (SELECT vec_id FROM ta UNION SELECT vec_id FROM tb) "
        "SELECT e.vec_id, round("
        "greatest(list_dot_product(t1, q1), list_dot_product(t2, q1), "
        "list_dot_product(t3, q1)) + "
        "greatest(list_dot_product(t1, q2), list_dot_product(t2, q2), "
        "list_dot_product(t3, q2)), 6) AS _score "
        "FROM e SEMI JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q "
        "ORDER BY _score DESC, vec_id ASC LIMIT 10"
    ),
)
def q_multivector_maxsim_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XTR-style pruned late interaction: per-query-token top-50
    retrieval (deterministic 6dp + id ties) unions into the candidate
    set; exact maxsim rescores only candidates — the production
    two-stage ColBERT plan, with `multivector_maxsim_topk` as its
    recall oracle."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.multivector import multivector_search_pruned

    emb = _load(spark, sf_dir, "embeddings")
    docs = emb.select(
        "vec_id",
        F.array(
            F.slice("embedding", 1, 21),
            F.slice("embedding", 22, 21),
            F.slice("embedding", 43, 21),
        ).alias("_toks"),
    )
    return multivector_search_pruned(
        docs, "vec_id", "_toks", [QVEC[:21], QVEC[21:42]],
        token_topk=50, limit=10,
    )


# ---------------------------------------------------------------------------
# Round 7 — graph-structured ANN (the HNSW-family gap, VERDICT r06
# "missing #2"): NN-descent k-NN graph + graph-expanded search.
# Registered at the END so the driver window keeps converging on the
# pre-r07 never-checked tail first (ask #8).

def _nn_graph_oracle_cte(k: int = 5, num_planes: int = 8,
                         dim: int = 64, seed: int = 42,
                         seed_cap: int = 128) -> str:
    """Shared CTE prefix replaying nn_descent_graph (LSH-bucket seed
    with the candidate-side per-bucket cap, one NN-descent round) with
    the identical plane constants and tie-breaks; multi-referenced CTEs
    MATERIALIZED (DuckDB re-executes them otherwise)."""
    from weaviate_spark.operators.similarity import hyperplanes

    planes = hyperplanes(num_planes, dim, seed)

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"

    sig_expr = " || ".join(
        f"(CASE WHEN list_dot_product(ev, {arr(p)}) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    cos = ("round(1 - list_dot_product(av.ev, bv.ev) / "
           "(sqrt(list_dot_product(av.ev, av.ev)) * "
           "sqrt(list_dot_product(bv.ev, bv.ev))), 6)")
    return (
        "WITH e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM embeddings WHERE embedding IS NOT NULL), "
        f"s AS MATERIALIZED (SELECT vec_id, ev, {sig_expr} AS _sig FROM e), "
        # candidate-side bucket cap (smallest-id members), mirroring the
        # engine's seed skew guard — sources stay uncapped
        "sb AS (SELECT vec_id, _sig FROM (SELECT vec_id, _sig, "
        "row_number() OVER (PARTITION BY _sig ORDER BY vec_id ASC) AS bi "
        f"FROM s) WHERE bi <= {seed_cap}), "
        "sp AS (SELECT a.vec_id AS ps, b.vec_id AS pn FROM s a JOIN sb b "
        "ON a._sig = b._sig AND a.vec_id <> b.vec_id), "
        f"sd AS (SELECT sp.ps, sp.pn, {cos} AS pd FROM sp "
        "JOIN s av ON sp.ps = av.vec_id JOIN s bv ON sp.pn = bv.vec_id), "
        "g0 AS MATERIALIZED (SELECT ps, pn, pd FROM "
        "(SELECT ps, pn, pd, row_number() OVER "
        "(PARTITION BY ps ORDER BY pd ASC, pn ASC) AS rk FROM sd) "
        f"WHERE rk <= {k}), "
        "nn2 AS (SELECT g1.ps AS ps, g2.pn AS pn FROM g0 g1 "
        "JOIN g0 g2 ON g1.pn = g2.ps WHERE g2.pn <> g1.ps), "
        "rv AS (SELECT pn AS ps, ps AS pn FROM g0), "
        "cp AS (SELECT DISTINCT ps, pn FROM (SELECT ps, pn FROM g0 "
        "UNION ALL SELECT ps, pn FROM nn2 "
        "UNION ALL SELECT ps, pn FROM rv)), "
        f"cd AS (SELECT cp.ps, cp.pn, {cos} AS pd FROM cp "
        "JOIN s av ON cp.ps = av.vec_id JOIN s bv ON cp.pn = bv.vec_id), "
        "gr AS MATERIALIZED (SELECT ps, pn, pd, rk FROM "
        "(SELECT ps, pn, pd, row_number() OVER "
        "(PARTITION BY ps ORDER BY pd ASC, pn ASC) AS rk FROM cd) "
        f"WHERE rk <= {k})"
    )


@register(
    "ann_nndescent_graph",
    oracle=(
        _nn_graph_oracle_cte()
        + " SELECT ps AS vec_id, CAST(rk AS BIGINT) AS rank, "
        "pn AS neighbor_id, pd AS distance FROM gr"
    ),
)
def q_ann_nndescent_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-built approximate k-NN GRAPH (NN-descent, Dong et al. WWW
    2011) — the materialized analogue of the reference's HNSW proximity
    graph (adapters/repos/db/vector/hnsw/): LSH-bucket seed, one
    neighbors-of-neighbors + reverse-edge refinement, exact rescore of
    candidates only. Fully deterministic (6dp distances, id
    tie-breaks), so the approximate construction itself is
    hash-checked."""
    from weaviate_spark.operators.similarity import nn_descent_graph

    return nn_descent_graph(
        spark, sf_dir, "embeddings", k=5, rounds=1, num_planes=8,
        table_key=(sf_dir, "embeddings", "nng"),
    )


@register(
    "ann_graph_expand_topk",
    oracle=None,  # assigned below (needs the query-signature literal)
)
def q_ann_graph_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-expanded search: probe ONLY the query's own LSH bucket,
    take the 10 best members as entries, expand one hop through the
    NN-descent graph (recovering neighbors that hashed across the
    bucket boundary), exact-rescore entries+expansions for top-10 —
    the one-hop DiskANN/HNSW traversal gesture expressible as a batch
    plan; recall vs exact pinned in tests/test_similarity_graph.py."""
    from weaviate_spark.operators.similarity import graph_expand_topk

    return graph_expand_topk(
        spark, sf_dir, "embeddings", QVEC, k=10, seed_m=10, graph_k=5,
        rounds=1, num_planes=8, table_key=(sf_dir, "embeddings", "nng"),
        # explicit off-corpus accept: this query pins the DETERMINISM of
        # the one-hop plan against the oracle, not a recall claim — the
        # recall-safe arbitrary-vector route is near_vector quantize='sq'
        on_corpus=False,
    )


def _graph_expand_oracle_sql(k: int = 10, seed_m: int = 10,
                             num_planes: int = 8, seed: int = 42,
                             bucket_cap: int = 4096) -> str:
    from weaviate_spark.operators.similarity import _sig_py, hyperplanes

    planes = hyperplanes(num_planes, len(QVEC), seed)
    qsig = _sig_py(QVEC, planes)
    qcos = ("round(1 - list_dot_product(t.ev, q.qv) / "
            "(sqrt(list_dot_product(t.ev, t.ev)) * "
            "sqrt(list_dot_product(q.qv, q.qv))), 6)")
    return (
        _nn_graph_oracle_cte()
        + f", q AS (SELECT {_QVEC_SQL} AS qv), "
        # mirror the engine's bucket_cap: members are id-truncated to
        # the bucket_cap smallest ids BEFORE distance ranking, so an
        # over-full bucket stays hash-consistent with the engine
        "entm AS (SELECT t.vec_id, t.ev FROM s t "
        f"WHERE t._sig = '{qsig}' "
        f"ORDER BY t.vec_id ASC LIMIT {bucket_cap}), "
        "ent AS MATERIALIZED (SELECT t.vec_id FROM entm t CROSS JOIN q "
        f"ORDER BY {qcos} ASC, t.vec_id ASC LIMIT {seed_m}), "
        "exp AS (SELECT gr.pn AS vec_id FROM gr "
        "JOIN ent ON gr.ps = ent.vec_id), "
        "cands AS (SELECT DISTINCT vec_id FROM "
        "(SELECT vec_id FROM ent UNION ALL SELECT vec_id FROM exp)) "
        f"SELECT t.vec_id, {qcos} AS _distance "
        "FROM s t JOIN cands USING (vec_id) CROSS JOIN q "
        f"ORDER BY _distance ASC, t.vec_id ASC LIMIT {k}"
    )


ORACLES["ann_graph_expand_topk"] = _graph_expand_oracle_sql()


@register(
    "ann_graph_hubness",
    oracle=(
        _nn_graph_oracle_cte()
        + ", ind AS (SELECT pn AS vid, CAST(count(*) AS BIGINT) AS ind "
        "FROM gr GROUP BY pn), "
        "nodes AS (SELECT vec_id FROM e) "
        "SELECT coalesce(ind.ind, 0) AS in_degree, "
        "CAST(count(*) AS BIGINT) AS n_nodes "
        "FROM nodes LEFT JOIN ind ON nodes.vec_id = ind.vid "
        "GROUP BY 1"
    ),
)
def q_ann_graph_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic over the NN-descent graph: the in-degree
    histogram (orphans at 0) that flags embedding spaces whose
    retrieval concentrates on a few hub points (Radovanovic et al.,
    JMLR 2010) — the index-health readout a 100-TB embedding pipeline
    checks before trusting its k-NN labels."""
    from weaviate_spark.operators.similarity import knn_graph_hubness

    return knn_graph_hubness(
        spark, sf_dir, "embeddings", k=5, rounds=1, num_planes=8,
        table_key=(sf_dir, "embeddings", "nng"),
    )


@register(
    "curation_nb_classifier",
    oracle=(
        "WITH base AS MATERIALIZED (SELECT doc_id AS d, lang = 'en' AS pos, "
        "(doc_id % 5) = 0 AS hold, "
        "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+') AS tt FROM documents), "
        "toks AS MATERIALIZED (SELECT d, pos, hold, unnest(tt) AS t FROM base), "
        "vocab AS MATERIALIZED (SELECT t, "
        "sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp, "
        "sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn "
        "FROM toks WHERE NOT hold GROUP BY t), "
        "tots AS (SELECT sum(cp) AS tp, sum(cn) AS tn, count(*) AS v FROM vocab), "
        "priors AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS dp, "
        "sum(CASE WHEN pos THEN 0 ELSE 1 END) AS dn FROM base WHERE NOT hold), "
        "llr AS (SELECT t, CAST(round(ln((cp + 1) / (tp + v)) "
        "- ln((cn + 1) / (tn + v)), 8) AS DECIMAL(20,8)) AS w "
        "FROM vocab CROSS JOIN tots), "
        "unseen AS (SELECT CAST(round(ln(1.0 / (tp + v)) - ln(1.0 / (tn + v)), 8) "
        "AS DECIMAL(20,8)) AS w0 FROM tots), "
        "prior AS (SELECT CAST(round(ln(dp / dn), 8) AS DECIMAL(20,8)) AS lp FROM priors) "
        "SELECT toks.d AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "round(CAST(sum(COALESCE(llr.w, (SELECT w0 FROM unseen))) "
        "+ (SELECT lp FROM prior) AS DOUBLE), 6) + 0.0 AS log_odds, "
        "(sum(COALESCE(llr.w, (SELECT w0 FROM unseen))) "
        "+ (SELECT lp FROM prior)) > 0 AS predicted, "
        "toks.pos AS actual "
        "FROM toks LEFT JOIN llr USING (t) WHERE hold GROUP BY toks.d, toks.pos"
    ),
)
def q_curation_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable multinomial Naive Bayes text classifier (the
    fasttext-shaped GPT-3/CCNet 'does this look like the target
    corpus?' quality/domain filter): train on 80% of documents
    (doc_id % 5 != 0) with lang='en' as the positive class, score the
    holdout as smoothed log-likelihood-ratio sums. Token LLRs are
    8dp-DECIMAL so the per-doc sum is exact (partition/engine
    invariant); reference analogue: the text2vec module quality
    filters live outside the DB — this is the pipeline extra."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.curation import nb_classifier_scores

    docs = _load(spark, sf_dir, "documents")
    return nb_classifier_scores(
        docs, "doc_id", "text", F.col("lang") == "en", holdout_mod=5,
    )


@register(
    "ann_recall_audit",
    oracle=(
        f"WITH q AS (SELECT {_QVEC_SQL} AS qv, {_SQ_QC_SQL} AS qc), "
        "enc AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev, "
        f"{_BQ_WORD_SQL.format(lo=0)} AS bq0, {_BQ_WORD_SQL.format(lo=32)} AS bq1, "
        "list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> "
        "LEAST(GREATEST(CAST(floor((x - (-1.0)) / 2.0 * 255 + 0.5) AS BIGINT), 0), 255)"
        ") AS cd FROM embeddings), "
        f"ex AS (SELECT vec_id FROM (SELECT vec_id, {_COS_SQL} AS d "
        "FROM enc CROSS JOIN q ORDER BY d ASC, vec_id ASC LIMIT 10)), "
        "bqc AS (SELECT vec_id, ev, "
        f"bit_count(xor(bq0, CAST({_BQ_QW[0]} AS BIGINT))) + "
        f"bit_count(xor(bq1, CAST({_BQ_QW[1]} AS BIGINT))) AS h "
        "FROM enc ORDER BY h ASC, vec_id ASC LIMIT 40), "
        f"bq10 AS (SELECT vec_id FROM (SELECT vec_id, {_COS_SQL} AS d "
        "FROM bqc CROSS JOIN q ORDER BY d ASC, vec_id ASC LIMIT 10)), "
        "sqc AS (SELECT vec_id, ev, list_sum(list_transform(list_zip(cd, qc), "
        "s -> (s[1] - s[2]) * (s[1] - s[2]))) AS cdist "
        "FROM enc CROSS JOIN q ORDER BY cdist ASC, vec_id ASC LIMIT 40), "
        f"sq10 AS (SELECT vec_id FROM (SELECT vec_id, {_COS_SQL} AS d "
        "FROM sqc CROSS JOIN q ORDER BY d ASC, vec_id ASC LIMIT 10)) "
        "SELECT 'bq' AS route, round(count(*) / 10.0, 6) + 0.0 AS recall_at_10 "
        "FROM bq10 JOIN ex USING (vec_id) "
        "UNION ALL "
        "SELECT 'sq' AS route, round(count(*) / 10.0, 6) + 0.0 AS recall_at_10 "
        "FROM sq10 JOIN ex USING (vec_id)"
    ),
)
def q_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of each compressed candidate route (BQ sign-bit,
    packed-int8 SQ) against the exact cosine top-10 — the oracle-backed
    version of the tools/bench_ann.py recall measurement, so the
    quality claim behind the quantized routing (vector.py) is itself
    hash-checked per round. Both routes use the production default
    overfetch=4; the exact leg pins quantize=\"off\"."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.quantization import bq_topk, sq_topk
    from weaviate_spark.operators.vector import NearVectorSpec, near_vector

    exact = near_vector(spark, sf_dir, NearVectorSpec(
        collection="embeddings", vector=QVEC, limit=10, quantize="off",
    )).select("vec_id")
    legs = []
    for route, topk in (
        ("bq", bq_topk(spark, sf_dir, "embeddings", QVEC, k=10, overfetch=4,
                       table_key=(sf_dir, "embeddings"))),
        ("sq", sq_topk(spark, sf_dir, "embeddings", QVEC, k=10, overfetch=4,
                       table_key=(sf_dir, "embeddings"))),
    ):
        legs.append(
            topk.select("vec_id").join(exact, "vec_id", "left_semi").agg(
                F.lit(route).alias("route"),
                (F.round(F.count(F.lit(1)) / 10.0, 6) + F.lit(0.0))
                .alias("recall_at_10"),
            )
        )
    return legs[0].unionByName(legs[1])


from weaviate_spark.media_oracles import gif_frame_stats_oracle_sql


@register("image_gif_frame_stats", oracle=gif_frame_stats_oracle_sql())
def q_image_gif_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode pipeline: 2-frame 4x4 GIF89a blobs synthesized
    from md5-derived palette indices (odd ids stored interlaced), then
    container-parsed and LZW-decoded by the pure-numpy GIF codec
    (operators/multimodal.py) via Arrow-batched mapInPandas; per-frame
    channel means are hash-checked against DuckDB recomputing the same
    md5 arithmetic — the encode AND decode directions must both be
    bit-exact for the hashes to agree."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.multimodal import (
        decode_gif_frame_stats, synth_gif_corpus,
    )

    docs = (
        _load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 7 == 0)
        .select(F.col("doc_id").alias("media_id"), "text")
    )
    media = synth_gif_corpus(docs, "media_id", "text")
    out = decode_gif_frame_stats(media, "media_id", "media")
    return out.select(
        "media_id", "frame_idx", "delay_ms",
        *[(F.round(F.col(c), 6) + F.lit(0.0)).alias(c)
          for c in ("mean_r", "mean_g", "mean_b")],
    ).orderBy("media_id", "frame_idx")


# ---------------------------------------------------------------------------
# r09 — substring-dedup skew-guard stress (VERDICT r08 finding #1)

_BOILER_327 = (
    " LEGAL NOTICE 4711. THIS DOCUMENT IS PROVIDED AS IS WITHOUT WARRANTY "
    "OF ANY KIND. REDISTRIBUTION AND USE IN SOURCE AND BINARY FORMS ARE "
    "PERMITTED PROVIDED THAT THE ABOVE NOTICE AND THIS PARAGRAPH ARE "
    "DUPLICATED IN ALL SUCH FORMS. THE NAV BAR FOLLOWS. HOME NEWS SPORT "
    "WEATHER SHOP ARCHIVE CONTACT PRIVACY TERMS SITEMAP HELP END."
)


@register(
    "dedup_substring_boilerplate",
    oracle=(
        "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 "
        f"THEN text || '{_BOILER_327}' ELSE text END AS text "
        "FROM documents), "
        "fps0 AS ("
        " SELECT DISTINCT doc_id, md5(substr(text, CAST(i AS INT), 40)) AS h"
        " FROM (SELECT doc_id, text,"
        "   unnest(range(1, greatest(length(text) - 40 + 2, 1))) AS i"
        "   FROM d)"
        " WHERE substr(md5(substr(text, CAST(i AS INT), 40)), 1, 1) = '0'), "
        "fps AS (SELECT doc_id, h FROM fps0 "
        "QUALIFY count(*) OVER (PARTITION BY h) <= 100), "
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2 HAVING count(*) >= 2), "
        "caps AS (SELECT "
        "CAST(sum(CASE WHEN n > 100 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS over_cap_fingerprints, CAST(max(n) AS BIGINT) AS max_posting "
        "FROM (SELECT h, count(*) AS n FROM fps0 GROUP BY h)) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_pairs, "
        "over_cap_fingerprints, max_posting FROM caps"
    ),
)
def q_dedup_substring_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-heavy STRESS for the substring-dedup skew guard
    (VERDICT r08 #1): every even doc gets the same 327-char license/nav
    block appended column-side, so its 14 selected 40-char fingerprints
    are each shared by half the corpus — posting lists of n/2 docs,
    far above max_docs_per_fingerprint=100 at every test sf. Without
    the cap the pair join would emit 14*(n/2)^2 rows (10^10 at 10^5
    docs); with it, those fingerprints are dropped from pairing
    entirely and the join stays bounded by natural duplication. The
    result row proves the cap was ACTIVE (over_cap_fingerprints >= 14,
    max_posting = ceil(n/2)) and that the capped pair set matches the
    oracle's identically-capped ground truth."""
    from pyspark.sql import functions as F

    from weaviate_spark.cache import register_cache
    from weaviate_spark.operators.dedup import (
        duplicated_substring_pairs, substring_fingerprints,
    )

    d = _load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit(_BOILER_327)))
        .otherwise(F.col("text")).alias("text"),
    )
    # the md5 window explode is the expensive stage and has TWO
    # consumers here (the capped pairing and the cap-audit aggregate) —
    # compute it once (the persisted-signature-artifact pattern at
    # ingest scale; a session cache stands in for it here)
    fps = register_cache(
        substring_fingerprints(d, "doc_id", "text", 40, 1).cache())
    pairs = duplicated_substring_pairs(
        d, "doc_id", "text", k=40, select_hex=1, min_shared=2,
        max_docs_per_fingerprint=100, fingerprints=fps,
    )
    caps = (
        fps.groupBy("_h").agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.when(F.col("n") > 100, 1).otherwise(0))
            .cast("long").alias("over_cap_fingerprints"),
            F.max("n").cast("long").alias("max_posting"),
        )
    )
    n_pairs = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    return n_pairs.crossJoin(caps)


@register(
    "text_userdict_tokens",
    oracle=(
        "WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 11 = 0), "
        "tk AS (SELECT doc_id, unnest(['We', 'Aviate', 'release', "
        "CAST(doc_id AS VARCHAR), 'notes', 'by', 'SemiTechnologies', "
        "'team']) AS token, unnest(range(8)) AS pos FROM d) "
        "SELECT doc_id, CAST(pos AS BIGINT) AS pos, token FROM tk "
        "ORDER BY doc_id, pos"
    ),
)
def q_text_userdict_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class user dictionary through the tokenizer
    (tokenizerUserDict, entities/tokenizer/tokenizer_userdict.go;
    fixtures tokenizer_userdict_test.go:70-76): 'Weaviate' -> the two
    tokens 'We'/'Aviate', the SPACE-SPANNING source 'Semi Technologies'
    -> one token 'SemiTechnologies', both emitted VERBATIM (user surface
    forms, not lowercased), while the spans between matches take the
    normal kagome_kr pipeline (word runs, lowercased — 'NOTES' ->
    'notes'). The oracle hand-builds the expected token stream, so the
    replacement order, span tokenization, and position bookkeeping are
    all value-hash-checked."""
    from pyspark.sql import functions as F

    from weaviate_spark.functions.text import (
        add_custom_dict, tokenize_for_class,
    )

    add_custom_dict("UserDocs", [{
        "tokenizer": "kagome_kr",
        "replacements": [
            {"source": "Weaviate", "target": "We Aviate"},
            {"source": "Semi Technologies", "target": "SemiTechnologies"},
        ],
    }])
    try:
        d = (
            _load(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 11 == 0)
            .select(
                "doc_id",
                F.concat(
                    F.lit("Weaviate release "),
                    F.col("doc_id").cast("string"),
                    F.lit(" NOTES by Semi Technologies team"),
                ).alias("t"),
            )
        )
        return (
            d.select("doc_id", F.posexplode(
                tokenize_for_class(F.col("t"), "kagome_kr", "UserDocs")
            ).alias("pos", "token"))
            .select("doc_id", F.col("pos").cast("long").alias("pos"),
                    "token")
            .orderBy("doc_id", "pos")
        )
    finally:
        # the UDF closure snapshotted the replacement table at plan
        # build; drop the registry entry so the driver session's global
        # state is untouched — a later query against a real class named
        # 'UserDocs' must not silently inherit this fixture dictionary
        # (nor have its BM25 artifact keys perturbed by its digest).
        add_custom_dict("UserDocs", None)


@register(
    "export_roundtrip",
    oracle=(
        "SELECT 'nation' AS class_name, CAST(count(*) AS BIGINT) AS "
        "objects_exported, CAST(count(*) AS BIGINT) AS readback_rows, "
        "'SUCCESS' AS status FROM nation "
        "UNION ALL SELECT 'region', CAST(count(*) AS BIGINT), "
        "CAST(count(*) AS BIGINT), 'SUCCESS' FROM region "
        "ORDER BY class_name"
    ),
)
def q_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk export API (usecases/export/ — scheduler + participant +
    metadata lifecycle): export two classes to a scratch backend as a
    point-in-time parquet snapshot, then prove the round trip — the
    metadata's per-class objectsExported, an independent READBACK count
    of the landed parquet, and the SUCCESS status must all agree with
    the oracle counting the source tables. The scratch export is
    removed and re-created each run (ids are one-shot in the reference;
    a re-run is a new export)."""
    import os
    import re
    import shutil
    import tempfile

    from weaviate_spark.sources.export import export_create

    backend = os.path.join(tempfile.gettempdir(),
                           "wsx_export_" + re.sub(r"\W", "_", sf_dir))
    shutil.rmtree(backend, ignore_errors=True)
    meta = export_create(spark, "rt", sf_dir, backend,
                         include=["nation", "region"])
    rows = []
    for name in sorted(meta["shardStatus"]):
        st = meta["shardStatus"][name]
        readback = spark.read.parquet(f"{backend}/rt/{name}").count()
        rows.append((name, st["objectsExported"], readback, st["status"]))
    return local_df(
        spark,
        rows,
        "class_name string, objects_exported long, readback_rows long, "
        "status string",
    ).orderBy("class_name")


# ---------------------------------------------------------------------------
# M-r10 — driver-checked oracles for the previously pytest-only §2 rows
# (r09 verdict ask #4): IsNull, nested object/object[] path filters,
# the CRUD lifecycle, and batch-delete dryRun.

@register(
    "filter_isnull",
    oracle=(
        "WITH d AS (SELECT o_orderkey, o_orderpriority, "
        "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END "
        "AS clerk "
        "FROM orders) "
        "SELECT 'isnull_true' AS branch, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(o_orderkey) AS BIGINT) AS key_sum FROM d "
        "WHERE clerk IS NULL "
        "UNION ALL "
        "SELECT 'isnull_false', CAST(count(*) AS BIGINT), "
        "CAST(sum(o_orderkey) AS BIGINT) FROM d WHERE clerk IS NOT NULL "
        "ORDER BY branch"
    ),
)
def q_filter_isnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IsNull filter through the real filter compiler
    (entities/filters IsNull; requires indexNullState in the reference,
    inverted_index_config.go:40). The testdata is null-free, so a
    nullable column is derived deterministically on both engines; both
    polarities run as Clause(operator='IsNull', value=True/False) and
    the counts + key checksums are value-hash-checked."""
    from pyspark.sql import functions as F

    from weaviate_spark.filters import Clause, apply_where

    d = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus")).alias("clerk"),
    )

    def branch(tag: str, val: bool) -> DataFrame:
        hit = apply_where(
            d, Clause(operator="IsNull", path=["clerk"], value=val))
        return hit.agg(
            F.lit(tag).alias("branch"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )

    return (
        branch("isnull_true", True)
        .unionByName(branch("isnull_false", False))
        .orderBy("branch")
    )


@register(
    "filter_nested_paths",
    oracle=(
        "WITH d AS (SELECT c_custkey, c_name, "
        "struct_pack(seg := c_mktsegment, "
        "geo := struct_pack(nat := c_nationkey)) AS profile, "
        "[struct_pack(tag := CASE WHEN c_acctbal < 0 THEN 'neg' "
        "ELSE 'pos' END, val := c_acctbal), "
        "struct_pack(tag := 'seg', val := CAST(c_nationkey AS "
        "DECIMAL(15,2)))] AS contacts FROM customer) "
        "SELECT c_custkey, c_name FROM d "
        "WHERE profile.geo.nat = 5 AND "
        "len(list_filter(contacts, x -> x.tag = 'neg')) > 0 "
        "ORDER BY c_custkey"
    ),
)
def q_filter_nested_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested object + object[] path filters through the real compiler
    (searcher_nested.go / nested plan executor; object[] Equal = EXISTS
    over the array elements): a two-level struct path
    (profile.geo.nat) ANDed with an array-of-structs path
    (contacts.tag), both derived deterministically from customer so
    the duckdb oracle mirrors the same nested values."""
    from pyspark.sql import functions as F

    from weaviate_spark.filters import Clause, apply_where

    d = _load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name",
        F.struct(
            F.col("c_mktsegment").alias("seg"),
            F.struct(F.col("c_nationkey").alias("nat")).alias("geo"),
        ).alias("profile"),
        F.array(
            F.struct(
                F.when(F.col("c_acctbal") < 0, F.lit("neg"))
                .otherwise(F.lit("pos")).alias("tag"),
                F.col("c_acctbal").alias("val"),
            ),
            F.struct(
                F.lit("seg").alias("tag"),
                F.col("c_nationkey").cast("decimal(15,2)").alias("val"),
            ),
        ).alias("contacts"),
    )
    where = Clause(operator="And", operands=[
        Clause(operator="Equal", path=["profile", "geo", "nat"], value=5),
        Clause(operator="Equal", path=["contacts", "tag"], value="neg"),
    ])
    return (
        apply_where(d, where)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "crud_lifecycle",
    oracle=(
        "SELECT 'insert' AS phase, "
        "CAST((SELECT count(*) FROM nation) + 3 AS BIGINT) AS n_rows, "
        "CAST((SELECT sum(n_nationkey) FROM nation) + 303 AS BIGINT) "
        "AS key_sum "
        "UNION ALL SELECT 'patch', 1, 100 "
        "UNION ALL SELECT 'delete', "
        "CAST((SELECT count(*) FROM nation WHERE n_regionkey <> 1) + 2 "
        "AS BIGINT), "
        "CAST((SELECT sum(n_nationkey) FROM nation "
        "WHERE n_regionkey <> 1) + 203 AS BIGINT) "
        "UNION ALL SELECT 'versions', 3, 0 "
        "ORDER BY phase"
    ),
)
def q_crud_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-object + batch CRUD lifecycle on the versioned COW store
    (usecases/objects: add/merge/delete; adapters/repos/db batch
    semantics): seed a scratch table from nation, batch-insert 3 rows
    (keys 100/101/102, one in region 1), PATCH one object's comment,
    batch-delete region 1 by filter, and report per-phase row count +
    key checksum plus the final transaction version (3 writes = 3
    commits). The oracle derives every expected number from the source
    nation table, so insert/patch/delete semantics, two-valued delete
    keep-set, and OCC version accounting are all value-hash-checked."""
    import os
    import re
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from weaviate_spark.sources import crud

    scratch = os.path.join(tempfile.gettempdir(),
                           "wsx_crud_" + re.sub(r"\W", "_", sf_dir))
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(crud._txn_dir(scratch), ignore_errors=True)
    src = _load(spark, sf_dir, "nation")
    src.write.parquet(scratch)

    rows = []

    def snap(phase: str) -> None:
        cur = spark.read.parquet(scratch)
        agg = cur.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_nationkey").cast("long").alias("s"),
        ).collect()[0]
        rows.append((phase, agg["n"], agg["s"]))

    new = local_df(
        spark,
        [(100, "AAA", 1), (101, "BBB", 2), (102, "CCC", 3)],
        "n_nationkey long, n_name string, n_regionkey long",
    ).select(*[F.col(c).cast(dict(src.dtypes)[c]) for c in src.columns])
    crud.upsert(spark, scratch, new, "n_nationkey")
    snap("insert")

    crud.patch(spark, scratch, "n_nationkey", 100,
               {"n_name": "patched"})
    patched = spark.read.parquet(scratch).where(
        F.col("n_name") == "patched")
    agg = patched.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_nationkey").cast("long").alias("s"),
    ).collect()[0]
    rows.append(("patch", agg["n"], agg["s"]))

    from weaviate_spark.filters import Clause

    crud.delete_where(spark, scratch,
                      Clause(operator="Equal", path=["n_regionkey"],
                             value=1))
    snap("delete")

    rows.append(("versions", crud.table_version(scratch), 0))
    return local_df(
        spark,
        rows, "phase string, n_rows long, key_sum long"
    ).orderBy("phase")


@register(
    "crud_delete_dryrun",
    oracle=(
        "SELECT 'dryrun' AS step, "
        "CAST((SELECT count(*) FROM region WHERE r_regionkey % 2 = 0) "
        "AS BIGINT) AS matched, "
        "CAST((SELECT count(*) FROM region) AS BIGINT) AS remaining "
        "UNION ALL SELECT 'delete', "
        "CAST((SELECT count(*) FROM region WHERE r_regionkey % 2 = 0) "
        "AS BIGINT), "
        "CAST((SELECT count(*) FROM region WHERE r_regionkey % 2 <> 0) "
        "AS BIGINT) "
        "ORDER BY step DESC"
    ),
)
def q_crud_delete_dryrun(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch delete dryRun semantics (batch_delete.go:33-112): the dry
    run reports the matched count WITHOUT rewriting (the table is
    unchanged afterwards — its full count is the proof), then the real
    delete removes exactly those rows. Both steps run the same Clause
    through delete_where on a scratch copy of region; the oracle
    derives both counts from the source table."""
    import os
    import re
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from weaviate_spark.filters import Clause
    from weaviate_spark.sources import crud

    scratch = os.path.join(tempfile.gettempdir(),
                           "wsx_dryrun_" + re.sub(r"\W", "_", sf_dir))
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(crud._txn_dir(scratch), ignore_errors=True)
    _load(spark, sf_dir, "region").write.parquet(scratch)

    # the even region keys (0/2/4, present at every sf) via scalar
    # ContainsAny — the IN-list path of the filter compiler
    where = Clause(operator="ContainsAny", path=["r_regionkey"],
                   value=[0, 2, 4])
    dry = crud.delete_where(spark, scratch, where, dry_run=True)
    after_dry = spark.read.parquet(scratch).count()
    real = crud.delete_where(spark, scratch, where, dry_run=False)
    after_real = spark.read.parquet(scratch).count()
    return local_df(
        spark,
        [("dryrun", dry, after_dry), ("delete", real, after_real)],
        "step string, matched long, remaining long",
    ).orderBy(F.col("step").desc())


@register(
    "tenant_lifecycle_offload",
    oracle=(
        "WITH b AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "round(sum(c_acctbal), 2) AS s FROM customer "
        "WHERE c_mktsegment = 'BUILDING'), "
        "o AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "round(sum(c_acctbal), 2) AS s FROM customer "
        "WHERE c_mktsegment <> 'BUILDING') "
        "SELECT 'active' AS phase, b.n AS n_rows, b.s AS sum_acctbal, "
        "false AS read_rejected FROM b "
        "UNION ALL SELECT 'offloaded', o.n, o.s, true FROM o "
        "UNION ALL SELECT 'reactivated', b.n, b.s, false FROM b "
        "ORDER BY phase"
    ),
)
def q_tenant_lifecycle_offload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenant lifecycle states (VERDICT r10 ask #2;
    usecases/multitenancy/, entities/models/tenant.go:34): customer is
    written tenant-partitioned by market segment, the BUILDING tenant
    is OFFLOADED (its partition directory physically leaves the hot
    table root for the cold prefix), a read while offloaded is
    rejected with the reference's exact error ('tenant not active',
    errors_multitenancy.go:19) — recorded as read_rejected while the
    hot-root scan proves the cold tenant is invisible — and after
    reactivation (ONLOADING -> ACTIVE) the tenant reads back
    HASH-IDENTICAL to its pre-offload content: the oracle computes the
    same aggregates straight from the source table, so any row lost or
    mutated in the offload round-trip breaks the value hash."""
    import os
    import re
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from weaviate_spark.sources.crud import (
        TenantRegistry, write_tenant_partitioned,
    )

    scratch = os.path.join(tempfile.gettempdir(),
                           "wsx_tenant_" + re.sub(r"\W", "_", sf_dir))
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(scratch + "_offload", ignore_errors=True)
    cust = _load(spark, sf_dir, "customer").withColumn(
        "_tenant", F.col("c_mktsegment"))
    write_tenant_partitioned(cust, scratch, "_tenant")

    reg = TenantRegistry(scratch, "_tenant")
    reg.create_tenants(["AUTOMOBILE", "BUILDING", "FURNITURE",
                        "HOUSEHOLD", "MACHINERY"])

    def agg(df):
        row = df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("s"),
        ).collect()[0]
        return int(row["n"]), float(row["s"])

    n0, s0 = agg(reg.read(spark, "BUILDING"))

    reg.update("BUILDING", "OFFLOADED")
    try:
        reg.read(spark, "BUILDING")
        rejected = False
    except PermissionError as ex:
        rejected = str(ex) == "tenant not active"
    # the hot root no longer lists the offloaded tenant at all
    n1, s1 = agg(spark.read.parquet(scratch))

    reg.update("BUILDING", "ACTIVE")
    n2, s2 = agg(reg.read(spark, "BUILDING"))

    return local_df(
        spark,
        [("active", n0, s0, False),
         ("offloaded", n1, s1, rejected),
         ("reactivated", n2, s2, False)],
        "phase string, n_rows long, sum_acctbal double, read_rejected boolean",
    ).orderBy("phase")


def _cjk_all_oracle_sql() -> str:
    """DuckDB replay of 'gse_all' search-mode tokenization (all
    overlapping dictionary matches + uncovered singles): no recursion —
    matches enumerate as a position x length grid, coverage is a
    distinct-unnest, and the emit order (position, then length, singles
    only at uncovered positions) reproduces segment_cjk_all_py
    verbatim. Dict pruned to words that are substrings of the fixture
    sentences, same optimization as _cjk_dict_oracle_sql."""
    from weaviate_spark.functions.text import active_cjk_lexicon

    lex = active_cjk_lexicon()
    sents = [t.lower() for _, t in _CJK_SENTS]
    live = sorted(w for w in lex if any(w in s for s in sents))
    maxw = max((len(w) for w in live), default=2)
    dictvals = ", ".join(f"('{w}')" for w in live) or "('一一')"
    lenvals = ", ".join(f"({ln})" for ln in range(2, maxw + 1))
    inputs = ", ".join(f"({i}, '{t.lower()}')" for i, t in _CJK_SENTS)
    cjk_re = (
        "[\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}"
        "\\x{4E00}-\\x{9FFF}\\x{F900}-\\x{FAFF}\\x{AC00}-\\x{D7AF}]"
    )
    return f"""
WITH dict(w) AS (VALUES {dictvals}),
lens(L) AS (VALUES {lenvals}),
inputs(sid, s) AS (VALUES {inputs}),
runs AS (SELECT sid, unnest(regexp_extract_all(s, '[\\p{{L}}\\p{{N}}]+')) AS run,
         generate_subscripts(regexp_extract_all(s, '[\\p{{L}}\\p{{N}}]+'), 1) AS ridx FROM inputs),
cjk AS (SELECT *, regexp_matches(run, '{cjk_re}') AS has_cjk FROM runs),
pos AS (SELECT sid, ridx, run, unnest(range(1, length(run) + 1)) AS p
        FROM cjk WHERE has_cjk),
matches AS (
  SELECT sid, ridx, run, p, L, substr(run, p, L) AS tok
  FROM pos, lens
  WHERE p + L - 1 <= length(run)
    AND substr(run, p, L) IN (SELECT w FROM dict)),
covered AS (
  SELECT DISTINCT sid, ridx, p + u AS cp
  FROM (SELECT sid, ridx, p, unnest(range(0, L)) AS u FROM matches)),
singles AS (
  SELECT pos.sid, pos.ridx, pos.p, 0 AS lord, substr(run, p, 1) AS tok
  FROM pos
  WHERE NOT EXISTS (SELECT 1 FROM covered c
                    WHERE c.sid = pos.sid AND c.ridx = pos.ridx
                      AND c.cp = pos.p)),
cjk_toks AS (
  SELECT sid, ridx, p, lord, tok FROM singles
  UNION ALL
  SELECT sid, ridx, p, L AS lord, tok FROM matches),
cjk_seq AS (
  SELECT sid, ridx,
         row_number() OVER (PARTITION BY sid, ridx ORDER BY p, lord)
           AS seq, tok
  FROM cjk_toks),
allt AS (
  SELECT sid, ridx, seq, tok FROM cjk_seq
  UNION ALL
  SELECT sid, ridx, 1 AS seq, run AS tok FROM cjk WHERE NOT has_cjk)
SELECT sid,
       CAST(row_number() OVER (PARTITION BY sid ORDER BY ridx, seq) - 1
            AS BIGINT) AS pos,
       tok AS token
FROM allt ORDER BY sid, pos
"""


@register("text_gse_all_tokens", oracle=_cjk_all_oracle_sql())
def q_text_gse_all_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEARCH-mode CJK tokenization ('gse_all' — the reference's plain
    gse output shape, entities/tokenizer/tokenizer_test.go:95-110:
    overlapping segments 素早/素早い/早い/… so a BM25 query for any
    dictionary granularity hits the document; contrast gse_dict's
    single FMM segmentation). All overlapping matches of the ~300k-word
    shipped lexicon plus uncovered-position singles, value-hash-checked
    token by token against the grid-replay oracle."""
    from pyspark.sql import functions as F

    from weaviate_spark.functions.text import tokenize

    df = local_df(spark, _CJK_SENTS, "sid int, s string")
    return (
        df.select("sid", F.posexplode(tokenize(F.col("s"), "gse_all"))
                  .alias("pos", "token"))
        .select("sid", F.col("pos").cast("long").alias("pos"), "token")
        .orderBy("sid", "pos")
    )


def _retokenize_oracle_sql() -> str:
    from weaviate_spark.operators.bm25 import bm25_oracle_sql

    word = bm25_oracle_sql(
        "documents", "text", "doc_id", "scan table",
        tokenization="word", limit=10)
    tri = bm25_oracle_sql(
        "documents", "text", "doc_id", "scan table",
        tokenization="trigram", limit=10)
    return (
        f"WITH w AS ({word}), t AS ({tri}) "
        "SELECT 'before' AS phase, doc_id, _score AS score FROM w "
        "UNION ALL SELECT 'window', doc_id, _score FROM t "
        "UNION ALL SELECT 'after', doc_id, _score FROM t "
        "ORDER BY phase, score DESC, doc_id"
    )


@register("retokenize_migration", oracle=_retokenize_oracle_sql())
def q_retokenize_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-tokenization migration (retokenize reindex —
    inverted_reindexer_searchable_retokenize.go + the
    TokenizationResolver overlay, inverted/tokenization.go): BM25 top-10
    under the ORIGINAL word tokenization ('before'), then a query
    landing inside the FINALIZING window — new trigram artifact built,
    schema object still word, overlay active — must already produce the
    trigram analysis ('window'), and after the schema flip commits the
    plain schema-driven query produces the same ('after'). The oracle
    computes both analyses independently, so artifact generation
    coexistence, overlay resolution, and the post-flip state are all
    value-hash-checked."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, bm25_search
    from weaviate_spark.schema import Collection, Property
    from weaviate_spark.sources.retokenize import change_tokenization

    coll = Collection("documents", [Property("text", "text")])

    def top10() -> list:
        spec = BM25Spec(
            collection="documents", query="scan table",
            properties=[BM25Prop(
                "text",
                tokenization=coll.property("text").tokenization)],
            id_col="doc_id", limit=10)
        return [(r["doc_id"], float(r["_score"])) for r in
                bm25_search(spark, sf_dir, spec).collect()]

    phases: list[tuple[str, int, float]] = []
    for doc, sc in top10():
        phases.append(("before", doc, sc))

    def probe(phase_name: str) -> None:
        if phase_name == "FINALIZING":
            for doc, sc in top10():
                phases.append(("window", doc, sc))

    change_tokenization(spark, sf_dir, coll, "text", "trigram",
                        id_col="doc_id", on_phase=probe)
    for doc, sc in top10():
        phases.append(("after", doc, sc))

    return (
        local_df(
        spark,
            phases, "phase string, doc_id long, score double")
        .orderBy("phase", F.col("score").desc(), "doc_id")
    )


def _hybrid_mmr_oracle_sql() -> str:
    from weaviate_spark.operators.hybrid import hybrid_oracle_sql

    hy = hybrid_oracle_sql("spark filter join", QVEC, alpha=0.75,
                           fusion="relativeScore", limit=20)
    return (
        "WITH RECURSIVE hy AS (" + hy + "), "
        "rc AS (SELECT h.doc_id, h._score AS rel, "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev "
        "FROM hy h JOIN embeddings e ON e.vec_id = h.doc_id), "
        "pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, "
        "list_dot_product(a.ev, b.ev) / "
        "(sqrt(list_dot_product(a.ev, a.ev)) * "
        "sqrt(list_dot_product(b.ev, b.ev))) AS s "
        "FROM rc a CROSS JOIN rc b), "
        "steps AS ("
        "SELECT 1 AS step, doc_id AS picked, rel, [doc_id] AS sel "
        "FROM (SELECT doc_id, rel FROM rc "
        "      ORDER BY rel DESC, doc_id ASC LIMIT 1) "
        "UNION ALL "
        "SELECT s.step + 1, nx.doc_id, nx.rel, "
        "list_append(s.sel, nx.doc_id) "
        "FROM steps s, LATERAL ("
        "  SELECT c.doc_id, c.rel FROM rc c "
        "  WHERE NOT list_contains(s.sel, c.doc_id) "
        "  ORDER BY 0.5 * c.rel - 0.5 * (SELECT max(p.s) FROM pairs p "
        "    WHERE p.i = c.doc_id AND list_contains(s.sel, p.j)) DESC, "
        "    c.rel DESC, c.doc_id ASC LIMIT 1"
        ") nx WHERE s.step < 8) "
        "SELECT step AS mmr_rank, picked AS doc_id, "
        "round(rel, 6) AS score FROM steps ORDER BY mmr_rank"
    )


@register("hybrid_mmr_diversity", oracle=_hybrid_mmr_oracle_sql())
def q_hybrid_mmr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid fusion + MMR diversity selection (the hybrid_diversity
    acceptance suite, test/acceptance/hybrid_diversity/
    hybrid_diversity_test.go: MMR runs as a post-fusion pass over the
    fused window — balance=1 must reproduce the plain hybrid order,
    balance=0 reorders for diversity; the balance invariants are pinned
    by pytest, this oracle hash-checks the balance=0.5 greedy sequence
    over the relativeScore-fused top-20)."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.hybrid import HybridSpec, hybrid_search
    from weaviate_spark.operators.rerank import mmr_select

    fused = hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join", vector=QVEC,
        properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.75, fusion="relativeScore", limit=20,
    )).select("doc_id", "_score")
    emb = _load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding")
    rows = [
        {"doc_id": r["doc_id"], "rel": float(r["_score"]),
         "embedding": [float(x) for x in r["embedding"]]}
        for r in fused.join(emb, "doc_id")
        .orderBy(F.col("_score").desc(), F.col("doc_id").asc()).collect()
    ]
    picked = mmr_select(rows, "embedding", "rel", k=8, balance=0.5)
    return local_df(
        spark,
        [(i + 1, r["doc_id"], round(r["rel"], 6))
         for i, r in enumerate(picked)],
        "mmr_rank int, doc_id long, score double",
    )


# ---------------------------------------------------------------------------
# Nodes status API (GET /v1/nodes?output=verbose — usecases/nodes/
# handler.go, adapters/repos/db/nodes.go LocalNodeStatus)

def _nodes_status_oracle_sql() -> str:
    from weaviate_spark.sources.tables import TABLES

    tables = sorted(TABLES)
    shards = " UNION ALL ".join(
        f"SELECT '{t}' AS class, '{t}' AS shard, "
        f"CAST(count(*) AS BIGINT) AS object_count FROM {t}"
        for t in tables
    )
    return (
        f"WITH shards AS ({shards}) "
        "SELECT 'weaviate-0' AS node, class, shard, object_count, "
        "'READY' AS vector_indexing_status, "
        "CAST(0 AS BIGINT) AS vector_queue_length, "
        "FALSE AS compressed, TRUE AS loaded, "
        "CAST(count(*) OVER () AS BIGINT) AS shard_count, "
        "CAST(sum(object_count) OVER () AS BIGINT) AS total_object_count "
        "FROM shards"
    )


@register("nodes_status_verbose", oracle=_nodes_status_oracle_sql())
def q_nodes_status_verbose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /v1/nodes?output=verbose flattened: one row per shard with
    the NodeShardStatus fields plus the NodeStats totals
    (nodes.go:119-153,277-344). Each class contributes a count-only
    aggregate (footer-metadata count, no data pages read); the node
    totals are a window over the 10-row union. detect_compression is
    off so the oracle stays deterministic regardless of which vector
    artifacts earlier queries have built (the flag's detection path is
    pinned by pytest instead)."""
    from weaviate_spark.sources.nodes import node_status_df

    return node_status_df(spark, sf_dir, detect_compression=False)


# ---------------------------------------------------------------------------
# Gopher quality rules + C4 page cleaning (public papers: Rae et al.
# 2021 §A1.1; Raffel et al. 2019 §2.2) — training-pipeline filters

# The sf documents are single-line word bags (no newlines, terminal
# punctuation, bullets, or most Gopher stop words), which would leave
# the line-shape and stop-word rules constant across the corpus. Both
# sides first apply the SAME deterministic structuring transform —
# a sequential replace chain that manufactures sentence breaks,
# ellipsis lines, bullet lines and stop words out of frequent corpus
# words — so every rule fires with real spread while staying
# hash-exact between Spark and the oracle.
_STRUCTURE_STEPS = [
    (" line ", ".\n"),
    (" sort ", "...\n"),
    (" big ", "\n- "),
    (" row ", " of "),
    (" part ", " and "),
]


def _structured_docs_sql() -> str:
    expr = "text"
    for a, b in _STRUCTURE_STEPS:
        lit = b.replace("\n", "' || chr(10) || '")
        lit = "'" + lit + "'"
        lit = lit.replace("'' || ", "").replace(" || ''", "")
        expr = f"replace({expr}, ' {a.strip()} ', {lit})"
    return f"SELECT doc_id, {expr} AS text FROM documents"


def _structured_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    df = _load(spark, sf_dir, "documents")
    c = F.col("text")
    for a, b in _STRUCTURE_STEPS:
        c = F.replace(c, F.lit(a), F.lit(b))
    return df.select("doc_id", c.alias("text"))


def _gopher_rules_oracle_sql() -> str:
    src = _structured_docs_sql()
    stop_hits = " + ".join(
        f"(CASE WHEN list_contains(lw, '{w}') THEN 1 ELSE 0 END)"
        for w in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    return f"""
WITH w AS (
  SELECT doc_id, text,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> length(x) > 0) AS words,
    regexp_split_to_array(text, '\\n') AS lines
  FROM ({src})
), w2 AS (
  SELECT *, list_transform(words, x -> lower(x)) AS lw FROM w
), m AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS word_count,
    round(CASE WHEN len(words) > 0 THEN
      CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words)
      ELSE 0.0 END, 6) AS mean_word_len,
    round(CASE WHEN len(words) > 0 THEN
      (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
       + (length(text) - length(replace(text, '...', ''))) / 3.0) / len(words)
      ELSE 0.0 END, 6) AS symbol_ratio,
    round(CAST(len(list_filter(lines, l -> ltrim(l) LIKE '•%' OR ltrim(l) LIKE '‣%'
      OR ltrim(l) LIKE '▶%' OR ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) AS DOUBLE)
      / len(lines), 6) AS bullet_line_ratio,
    round(CAST(len(list_filter(lines, l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…'))
      AS DOUBLE) / len(lines), 6) AS ellipsis_line_ratio,
    round(CASE WHEN len(words) > 0 THEN
      CAST(len(list_filter(words, x -> regexp_matches(x, '\\p{{L}}'))) AS DOUBLE) / len(words)
      ELSE 0.0 END, 6) AS alpha_word_ratio,
    CAST({stop_hits} AS INT) AS stopword_hits
  FROM w2
)
SELECT *,
  word_count >= 50 AND word_count <= 100000 AS r_word_count,
  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS r_mean_word_len,
  symbol_ratio <= 0.1 AS r_symbol_ratio,
  bullet_line_ratio <= 0.9 AS r_bullet_lines,
  ellipsis_line_ratio <= 0.3 AS r_ellipsis_lines,
  alpha_word_ratio >= 0.8 AS r_alpha_words,
  stopword_hits >= 2 AS r_stopwords,
  (word_count >= 50 AND word_count <= 100000)
    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
    AND symbol_ratio <= 0.1 AND bullet_line_ratio <= 0.9
    AND ellipsis_line_ratio <= 0.3 AND alpha_word_ratio >= 0.8
    AND stopword_hits >= 2 AS keep
FROM m
"""


@register("text_gopher_rules", oracle=_gopher_rules_oracle_sql())
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher §A1.1 quality-filter breakdown over the documents table
    (published thresholds): per-doc metrics, one boolean per rule, and
    the AND-of-all keep decision. Pure narrow Catalyst expressions —
    map-only over the corpus scan (the repetition half of §A1.1 is
    repetition_filter, oracle text_repetition_profile)."""
    from weaviate_spark.operators.textstats import gopher_quality_rules

    return gopher_quality_rules(
        _structured_docs(spark, sf_dir), "doc_id", "text")


def _c4_page_oracle_sql() -> str:
    src = _structured_docs_sql()
    return f"""
WITH l AS (
  SELECT doc_id,
    list_transform(regexp_split_to_array(text, '\\n'), x -> trim(x)) AS lines
  FROM ({src})
), k AS (
  SELECT doc_id, lines,
    list_filter(lines, x ->
      (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?' OR x LIKE '%"' OR x LIKE '%''')
      AND len(list_filter(regexp_split_to_array(x, '\\s+'), w -> length(w) > 0)) >= 5
    ) AS kept
  FROM l
), m AS (
  SELECT doc_id,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(kept) AS BIGINT) AS n_kept_lines,
    coalesce(array_to_string(kept, chr(10)), '') AS retained_text
  FROM k
), s AS (
  SELECT *, CAST(len(list_filter(regexp_split_to_array(retained_text, '[.!?]+'),
    x -> length(trim(x)) > 0)) AS BIGINT) AS n_sentences
  FROM m
)
SELECT doc_id, n_lines, n_kept_lines, retained_text, n_sentences,
  n_sentences >= 3 AS r_min_sentences,
  NOT contains(lower(retained_text), 'lorem ipsum') AS r_no_lorem_ipsum,
  NOT (contains(retained_text, '{{') OR contains(retained_text, '}}')) AS r_no_braces,
  (n_sentences >= 3)
    AND NOT contains(lower(retained_text), 'lorem ipsum')
    AND NOT (contains(retained_text, '{{') OR contains(retained_text, '}}')) AS keep
FROM s
"""


@register("text_c4_page_filter", oracle=_c4_page_oracle_sql())
def q_text_c4_page_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 page cleaning over the documents table: line-level
    terminal-punctuation + ≥5-word retention, then page-level
    3-sentence / lorem-ipsum / curly-brace drops. Map-only narrow
    expressions; the cross-page 3-sentence span dedup is the separate
    global_line_dedup operator."""
    from weaviate_spark.operators.curation import c4_page_filter

    return c4_page_filter(_structured_docs(spark, sf_dir), "doc_id", "text")


# ---------------------------------------------------------------------------
# Classification job lifecycle (POST/GET /v1/classifications —
# usecases/classification/classifier.go Schedule, classifier_run.go)

def _classification_job_oracle_sql() -> str:
    return """
WITH e AS (
  SELECT lpad(CAST(vec_id AS VARCHAR), 12, '0') AS _id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev,
    vec_id % 10 = 0 AS unl
  FROM embeddings
), lab AS (
  SELECT _id, 'weaviate://localhost/Category/cat-' || CAST(label AS VARCHAR)
    AS beacon, ev FROM e WHERE NOT unl
), unl AS (SELECT _id, ev FROM e WHERE unl),
d AS (
  SELECT u._id AS _qid, l.beacon AS _label, l._id AS _tid,
    round(1 - list_dot_product(u.ev, l.ev)
      / (sqrt(list_dot_product(u.ev, u.ev)) * sqrt(list_dot_product(l.ev, l.ev))), 6) AS _d
  FROM unl u CROSS JOIN lab l
), topk AS (
  SELECT * FROM (SELECT *, row_number() OVER
    (PARTITION BY _qid ORDER BY _d ASC, _tid ASC) AS _rn FROM d)
  WHERE _rn <= 5
), votes AS (
  SELECT _qid, _label, count(*) AS _votes FROM topk GROUP BY _qid, _label
), win AS (
  SELECT _qid, _label FROM (SELECT *, row_number() OVER
    (PARTITION BY _qid ORDER BY _votes DESC, _label ASC) AS _r FROM votes)
  WHERE _r = 1
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_unl FROM unl)
SELECT _qid AS id, _label AS ref_beacon,
  'Category' AS ref_class,
  'cat-' || split_part(_label, '/cat-', 2) AS ref_id,
  'ofCategory' AS cls_scope,
  CAST(1700000000 AS BIGINT) AS completed,
  'completed' AS status,
  n.n_unl AS meta_count, n.n_unl AS count_succeeded,
  CAST(0 AS BIGINT) AS count_failed
FROM win, n
"""


@register("classification_job_lifecycle",
          oracle=_classification_job_oracle_sql())
def q_classification_job_lifecycle(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Scheduled kNN classification end-to-end (classifier.go
    Schedule → run → succeedRun): embeddings become a collection whose
    cref property ofCategory is set for 9/10 of the rows (beacons to
    Category/cat-<label>); the job classifies the unclassified tenth
    by k=5 exact cosine vote on the beacon labels and writes back a
    single-beacon ref + the _classification meta struct. Result = the
    classified rows' ref triple + meta + the job record's final
    status/counts; validator texts, failure path and filter semantics
    are pinned by pytest."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.classification_job import (
        ClassificationJob, clear_jobs, schedule_classification)
    from weaviate_spark.schema import Collection, Property

    emb = _load(spark, sf_dir, "embeddings")
    base = emb.select(
        F.lpad(F.col("vec_id").cast("string"), 12, "0").alias("_id"),
        F.col("embedding").alias("_vector"),
        F.lit("").alias("body"),
        F.when(
            F.col("vec_id") % 10 != 0,
            F.array(F.struct(
                F.concat(F.lit("weaviate://localhost/Category/cat-"),
                         F.col("label").cast("string")).alias("beacon"),
                F.lit("Category").alias("className"),
                F.concat(F.lit("cat-"),
                         F.col("label").cast("string")).alias("id"),
            )),
        ).alias("ofCategory"),
    )
    coll = Collection(name="EmbeddingDoc", properties=[
        Property("body", "text"),
        Property("ofCategory", "Category"),
    ])
    job, updated = schedule_classification(
        base, coll, class_name="EmbeddingDoc",
        classify_property="ofCategory", based_on_property="body",
        k=5, now_unix=1_700_000_000,
        job_id="entry-classification-job",
    )
    assert job.status == "completed", job.error
    out = (updated
           .where(F.col("_classification").isNotNull())
           .select(
               F.col("_id").alias("id"),
               F.col("ofCategory")[0]["beacon"].alias("ref_beacon"),
               F.col("ofCategory")[0]["className"].alias("ref_class"),
               F.col("ofCategory")[0]["id"].alias("ref_id"),
               F.col("_classification")["scope"][0].alias("cls_scope"),
               F.col("_classification")["completed"].alias("completed"),
               F.lit(job.status).alias("status"),
               F.lit(job.meta["count"]).cast("long").alias("meta_count"),
               F.lit(job.meta["countSucceeded"]).cast("long")
               .alias("count_succeeded"),
               F.lit(job.meta["countFailed"]).cast("long")
               .alias("count_failed"),
           ))
    clear_jobs()
    return out


def _classification_ref_meta_oracle_sql(k: int = 5) -> str:
    return f"""
WITH e AS (
  SELECT lpad(CAST(vec_id AS VARCHAR), 12, '0') AS _id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev,
    vec_id % 10 = 0 AS unl
  FROM embeddings
), lab AS (
  SELECT _id, 'weaviate://localhost/Category/cat-' || CAST(label AS VARCHAR)
    AS beacon, ev FROM e WHERE NOT unl
), unl AS (SELECT _id, ev FROM e WHERE unl),
d AS (
  SELECT u._id AS _qid, l.beacon AS _label, l._id AS _tid,
    round(1 - list_dot_product(u.ev, l.ev)
      / (sqrt(list_dot_product(u.ev, u.ev)) * sqrt(list_dot_product(l.ev, l.ev))), 6) AS _d,
    (1 - list_dot_product(u.ev, l.ev)
      / (sqrt(list_dot_product(u.ev, u.ev)) * sqrt(list_dot_product(l.ev, l.ev)))) / 2 AS _nd
  FROM unl u CROSS JOIN lab l
), topk AS (
  SELECT * FROM (SELECT *, row_number() OVER
    (PARTITION BY _qid ORDER BY _d ASC, _tid ASC) AS _rn FROM d)
  WHERE _rn <= {k}
), votes AS (
  SELECT _qid, _label, count(*) AS _votes FROM topk GROUP BY _qid, _label
), win AS (
  SELECT _qid, _label AS _win, _votes FROM (SELECT *, row_number() OVER
    (PARTITION BY _qid ORDER BY _votes DESC, _label ASC) AS _r FROM votes)
  WHERE _r = 1
)
SELECT t._qid AS id, w._win AS predicted_label,
  CAST(w._votes AS BIGINT) AS votes,
  CAST(count(*) AS BIGINT) AS overall_count,
  CAST(count(*) FILTER (t._label = w._win) AS BIGINT) AS winning_count,
  CAST(count(*) FILTER (t._label <> w._win) AS BIGINT) AS losing_count,
  round(min(t._nd), 6) AS closest_overall_distance,
  round(min(t._nd) FILTER (t._label = w._win), 6) AS closest_winning_distance,
  round(avg(t._nd) FILTER (t._label = w._win), 6) AS mean_winning_distance,
  round(avg(t._nd) FILTER (t._label <> w._win), 6) AS mean_losing_distance,
  round(min(t._nd) FILTER (t._label <> w._win), 6) AS closest_losing_distance
FROM topk t JOIN win w USING (_qid)
GROUP BY t._qid, w._win, w._votes
"""


@register("classification_ref_meta",
          oracle=_classification_ref_meta_oracle_sql())
def q_classification_ref_meta(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-ref classification metadata (KnnAggregator,
    adapters/repos/db/classification.go:128-236 + ref_meta.go Meta()):
    winning/losing counts over the k=5 neighbours plus closest/mean
    NORMALIZED distances ((1-cos)/2, vectorizer/distance.go:21) — the
    stats the reference attaches to every classified SingleRef. Same
    embeddings fixture as classification_job_lifecycle; losing fields
    are NULL when the vote was unanimous (ref_meta.go's optional
    pointers)."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.classification_job import (
        knn_classify_with_meta)

    emb = _load(spark, sf_dir, "embeddings")
    labeled = emb.where(F.col("vec_id") % 10 != 0).select(
        F.lpad(F.col("vec_id").cast("string"), 12, "0").alias("_kid"),
        F.col("embedding").alias("_kvec"),
        F.concat(F.lit("weaviate://localhost/Category/cat-"),
                 F.col("label").cast("string")).alias("_klabel"),
    )
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.lpad(F.col("vec_id").cast("string"), 12, "0").alias("_kid"),
        F.col("embedding").alias("_kvec"),
    )
    return knn_classify_with_meta(
        labeled, queries, k=5).withColumnRenamed("_kid", "id")


# ---------------------------------------------------------------------------
# Object validation gate (POST /v1/objects/validate —
# usecases/objects/validation/) — differential oracle: the corruption
# class of each synthesized object DETERMINES the reference error
# string, so the oracle predicts (ok, error) without re-implementing
# the validator

def _object_validation_oracle_sql() -> str:
    e = {
        1: "invalid text property 'title' on class 'Article': "
           "not a string, but int64",
        2: "invalid integer property 'views' on class 'Article': "
           "requires an integer, the given value is '3.5'",
        3: "the given class is empty",
        4: "unknown property 'ghost'",
        5: "invalid date property 'published' on class 'Article': "
           "requires a string with a RFC3339 formatted date, but the "
           "given value is 'yesterday'",
    }
    cases = " ".join(
        "WHEN {} THEN '{}'".format(k, v.replace("'", "''"))
        for k, v in e.items())
    return (
        "SELECT doc_id, doc_id % 6 = 0 AS ok, "
        f"CASE doc_id % 6 {cases} ELSE NULL END AS error "
        "FROM documents"
    )


@register("object_validation_batch",
          oracle=_object_validation_oracle_sql())
def q_object_validation_batch(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Batch object validation at ingest scale: one JSON object per
    document row, corrupted by doc_id % 6 (valid / numeric text /
    fractional int / missing class / unknown property / bad date), run
    through the REAL validator (validate_objects_df, one Arrow pass).
    The oracle predicts each corruption's exact reference error string
    (properties_validation.go texts) — a differential check that the
    validator maps every corruption to byte-identical errors."""
    from pyspark.sql import functions as F

    from weaviate_spark.schema import Collection, Property
    from weaviate_spark.sources.object_validation import (
        validate_objects_df)

    coll = Collection(name="Article", properties=[
        Property("title", "text"),
        Property("views", "int"),
        Property("published", "date"),
    ])
    df = _load(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    body = (
        F.when(m == 3, F.concat(
            F.lit('{"properties": {"title": "doc-'),
            F.col("doc_id").cast("string"), F.lit('"}}')))
        .otherwise(F.concat(
            F.lit('{"class": "Article", "properties": {'),
            F.when(m == 1, F.lit('"title": 7'))
            .when(m == 2, F.lit('"views": 3.5'))
            .when(m == 4, F.lit('"ghost": 1'))
            .when(m == 5, F.lit('"published": "yesterday"'))
            .otherwise(F.concat(F.lit('"title": "doc-'),
                                F.col("doc_id").cast("string"),
                                F.lit('"'))),
            F.lit("}}")))
    )
    out = validate_objects_df(
        df.select("doc_id", body.alias("body")), "body", coll)
    return out.select("doc_id", "ok", "error")


# ---------------------------------------------------------------------------
# Change-data-feed between COW versions (crud.table_changes_feed — the
# Delta CDF analogue; LSM flush-delta consumer parity)

@register(
    "crud_table_changes",
    oracle=(
        "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, "
        "CAST(n_regionkey AS BIGINT) AS n_regionkey, "
        "'delete' AS _change_type FROM nation WHERE n_regionkey = 3 "
        "UNION ALL SELECT CAST(n_nationkey AS BIGINT), n_name, "
        "CAST(n_regionkey AS BIGINT), 'update_preimage' FROM nation "
        "WHERE n_nationkey % 5 = 2 AND n_regionkey <> 3 "
        "UNION ALL SELECT CAST(n_nationkey AS BIGINT), "
        "'upd-' || CAST(n_nationkey AS VARCHAR), "
        "CAST(n_regionkey AS BIGINT), 'update_postimage' FROM nation "
        "WHERE n_nationkey % 5 = 2 AND n_regionkey <> 3 "
        "UNION ALL SELECT CAST(100 AS BIGINT), 'AAA', "
        "CAST(1 AS BIGINT), 'insert' "
        "UNION ALL SELECT CAST(101 AS BIGINT), 'BBB', "
        "CAST(1 AS BIGINT), 'insert'"
    ),
)
def q_crud_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF diff between two COW versions (crud.table_changes_feed): seed a
    scratch table from nation, apply three transactional commits
    (update names of keys %5==2, insert keys 100/101, delete region
    3), then diff version 0 against the live state. Inserts, deletes
    (preimage values), and update pre/postimage pairs must match the
    oracle's endpoint-computed change set — including the
    updated-then-deleted rows, which surface as plain deletes with
    ORIGINAL values (endpoint semantics)."""
    import os
    import re
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from weaviate_spark.filters import Clause
    from weaviate_spark.sources import crud

    scratch = os.path.join(tempfile.gettempdir(),
                           "wsx_cdc_" + re.sub(r"\W", "_", sf_dir))
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(crud._txn_dir(scratch), ignore_errors=True)
    src = _load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long"),
        "n_name",
        F.col("n_regionkey").cast("long"),
    )
    src.write.parquet(scratch)

    upd = src.where(F.col("n_nationkey") % 5 == 2).withColumn(
        "n_name", F.concat(F.lit("upd-"),
                           F.col("n_nationkey").cast("string")))
    crud.upsert(spark, scratch, upd, "n_nationkey")
    ins = local_df(
        spark,
        [(100, "AAA", 1), (101, "BBB", 1)],
        "n_nationkey long, n_name string, n_regionkey long")
    crud.upsert(spark, scratch, ins, "n_nationkey")
    crud.delete_where(spark, scratch, Clause(
        operator="Equal", path=["n_regionkey"], value=3))

    return crud.table_changes_feed(spark, scratch, "n_nationkey",
                                   from_version=0)


@register(
    "hybrid_bm25_operator_and",
    oracle=hybrid_oracle_sql("spark filter join", QVEC, alpha=0.5,
                             fusion="relativeScore", limit=25,
                             search_operator="And"),
)
def q_hybrid_bm25_operator_and(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Hybrid fusion with bm25SearchOperator=And on the keyword leg
    (explorer_hybrid.go:53-55 flows HybridSearch.SearchOperator into
    KeywordRanking): only documents matching EVERY query term enter
    the keyword leg; the vector leg is unaffected and fusion proceeds
    over the narrowed keyword set."""
    from weaviate_spark.operators.bm25 import BM25Prop
    from weaviate_spark.operators.hybrid import HybridSpec, hybrid_search

    return hybrid_search(spark, sf_dir, HybridSpec(
        collection="docs_embedded", query="spark filter join",
        vector=QVEC, properties=[BM25Prop("text")], id_col="doc_id",
        alpha=0.5, fusion="relativeScore", limit=25,
        search_operator="And",
    )).select("doc_id", "_score")


# ---------------------------------------------------------------------------
# Batch reference add — differential report oracle
# (usecases/objects/batch_references_add.go + entities/schema/crossref)

def _batch_refs_oracle_sql() -> str:
    src = _uuid_sql("region", "r_regionkey")
    tgt = _uuid_sql("nation", "r_regionkey")
    missing = _uuid_sql("missing", "r_regionkey")
    return f"""
WITH r AS (
  SELECT r_regionkey, r_regionkey % 5 AS c, {src} AS sid, {tgt} AS tid,
    {missing} AS mid
  FROM region
)
SELECT
  CASE c
    WHEN 1 THEN 'weaviate://localhost/Region/' || sid
    WHEN 2 THEN 'weaviate://localhost/Region/not-a-uuid/ofNation'
    WHEN 4 THEN 'weaviate://localhost/Region/' || mid || '/ofNation'
    ELSE 'weaviate://localhost/Region/' || sid || '/ofNation'
  END AS "from",
  CASE c
    WHEN 3 THEN 'weaviate://remote-peer/' || tid
    ELSE 'weaviate://localhost/Nation/' || tid
  END AS "to",
  CASE WHEN c IN (0) THEN 'SUCCESS' ELSE 'FAILED' END AS status,
  CASE c
    WHEN 1 THEN 'invalid cref URI: must use long-form: path must be '
      || 'of format ''/<className>/<uuid>/<propertyName>'', but got '
      || '''/Region/' || sid || ''''
    WHEN 2 THEN 'invalid cref URI: 2nd path segment must be uuid, '
      || 'but got ''ofNation'''
    WHEN 3 THEN 'importing network references in batch is not '
      || 'possible. Please perform a regular non-batch import for '
      || 'network references, got peer remote-peer'
    WHEN 4 THEN 'source object not found: ' || mid
    ELSE NULL
  END AS error
FROM r
"""


@register("batch_references_report", oracle=_batch_refs_oracle_sql())
def q_batch_references_report(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Batch reference add, differential report check: one reference
    per region row with a corruption class by r_regionkey % 5 (valid /
    short-form source / bad uuid / network target / missing source),
    run through the REAL validator+writeback
    (crud.add_references_batch_with_report on a scratch COW copy of
    region keyed by the canonical _id uuid). The oracle predicts each
    corruption's exact reference error text — including the
    short-form and bad-uuid parser quirks — and which rows land as
    SUCCESS."""
    import os
    import re as _re2
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from weaviate_spark.ids import uuid_col
    from weaviate_spark.sources import crud

    scratch = os.path.join(tempfile.gettempdir(),
                           "wsx_brefs_" + _re2.sub(r"\W", "_", sf_dir))
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(crud._txn_dir(scratch), ignore_errors=True)
    region = _load(spark, sf_dir, "region")
    ref_t = "array<struct<beacon:string,className:string,id:string>>"
    region.select(
        uuid_col("region", F.col("r_regionkey")).alias("_id"),
        "r_regionkey",
        F.lit(None).cast(ref_t).alias("ofNation"),
    ).write.parquet(scratch)

    sid = uuid_col("region", F.col("r_regionkey"))
    tid = uuid_col("nation", F.col("r_regionkey"))
    mid = uuid_col("missing", F.col("r_regionkey"))
    c = F.col("r_regionkey") % 5
    refs = region.select(
        F.when(c == 1, F.concat(F.lit("weaviate://localhost/Region/"),
                                sid))
        .when(c == 2,
              F.lit("weaviate://localhost/Region/not-a-uuid/ofNation"))
        .when(c == 4, F.concat(F.lit("weaviate://localhost/Region/"),
                               mid, F.lit("/ofNation")))
        .otherwise(F.concat(F.lit("weaviate://localhost/Region/"), sid,
                            F.lit("/ofNation"))).alias("from"),
        F.when(c == 3, F.concat(F.lit("weaviate://remote-peer/"), tid))
        .otherwise(F.concat(F.lit("weaviate://localhost/Nation/"), tid))
        .alias("to"),
    )
    report, n = crud.add_references_batch_with_report(
        spark, scratch, refs, "_id")
    return report


def _nodes_storage_oracle_sql() -> str:
    from weaviate_spark.sources.tables import TABLES

    tables = sorted(TABLES)
    shards = " UNION ALL ".join(
        f"SELECT '{t}' AS class, '{t}' AS shard, "
        f"CAST(count(*) AS BIGINT) AS n FROM {t}"
        for t in tables
    )
    return (
        f"WITH shards AS ({shards}) "
        "SELECT class, shard, "
        "CASE class WHEN 'region' THEN 'READONLY' "
        "WHEN 'part' THEN 'SHUTDOWN' ELSE 'READY' END "
        "AS vector_indexing_status, "
        "class <> 'part' AS loaded, "
        "CASE WHEN class = 'part' THEN 0 ELSE n END AS object_count "
        "FROM shards"
    )


@register("nodes_status_storage_states",
          oracle=_nodes_storage_oracle_sql())
def q_nodes_status_storage_states(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Nodes status under storage-state flips (nodes.go:294-303,331 —
    vectorIndexingStatus carries shard.GetStatus(), unloaded shards
    report no count): region flipped READONLY (stays loaded and
    counted — read-only shards serve reads), part flipped SHUTDOWN
    (unloaded, count 0), everything else READY. The registry flip is
    reverted before returning so no other query observes it."""
    from pyspark.sql import functions as F

    from weaviate_spark.sources import storagestate as ss
    from weaviate_spark.sources.nodes import node_status_df

    region_dir = f"{sf_dir}/region.parquet"
    part_dir = f"{sf_dir}/part.parquet"
    ss.update_shard_status(region_dir, "READONLY", reason="ops")
    ss.update_shard_status(part_dir, "SHUTDOWN")
    try:
        out = node_status_df(
            spark, sf_dir, detect_compression=False,
        ).select("class", "shard", "vector_indexing_status", "loaded",
                 "object_count")
        out = local_df(spark, out.collect(), out.schema)
    finally:
        ss.update_shard_status(region_dir, "READY")
        ss.update_shard_status(part_dir, "READY")
    return out


@register(
    "nodes_status_tenant_shards",
    oracle=(
        "SELECT 'mtdocs' AS class, 't' || CAST(n % 4 AS VARCHAR) AS "
        "shard, CAST(count(*) AS BIGINT) AS object_count, "
        "CASE WHEN n % 4 = 2 THEN 'READONLY' ELSE 'READY' END "
        "AS vector_indexing_status, TRUE AS loaded, "
        "CAST(4 AS BIGINT) AS shard_count "
        "FROM (SELECT r_regionkey + 5 * g AS k, (r_regionkey + 5 * g) "
        "% 4 AS n FROM region CROSS JOIN (SELECT unnest([0,1,2,3]) "
        "AS g)) GROUP BY n"
    ),
)
def q_nodes_status_tenant_shards(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Tenant partitions surface as shards in the node status
    (adapters/repos/db/get_shards_status_with_tenant_test.go): a
    scratch multi-tenant collection (20 rows, tenant = key % 4) is
    partition-written, tenant t2 flipped READONLY, and the per-shard
    rows must carry per-tenant counts and statuses with shardCount 4.
    The registry flip is reverted after materializing."""
    import os
    import re as _re3
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from weaviate_spark.sources import storagestate as ss
    from weaviate_spark.sources.crud import write_tenant_partitioned
    from weaviate_spark.sources.nodes import node_status_df

    root = os.path.join(tempfile.gettempdir(),
                        "wsx_mtnodes_" + _re3.sub(r"\W", "_", sf_dir))
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    table = os.path.join(root, "mtdocs.parquet")
    region = _load(spark, sf_dir, "region")
    rows = (region.crossJoin(
        local_df(spark, [(g,) for g in range(4)], "g int"))
        .select((F.col("r_regionkey") + 5 * F.col("g")).alias("k"))
        .select("k", F.concat(F.lit("t"), (F.col("k") % 4)
                              .cast("string")).alias("_tenant")))
    write_tenant_partitioned(rows, table, "_tenant")
    ss.update_shard_status(table, "READONLY", shard="t2", reason="ops")
    try:
        out = node_status_df(spark, root, detect_compression=False) \
            .select("class", "shard", "object_count",
                    "vector_indexing_status", "loaded", "shard_count")
        out = local_df(spark, out.collect(), out.schema)
    finally:
        ss.clear(table)
    return out
