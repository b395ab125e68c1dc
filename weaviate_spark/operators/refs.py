"""Cross-reference model (SURVEY §1.1 cref, §2.3 joins).

Weaviate stores refs as beacon arrays
(entities/schema/crossref/, `weaviate://localhost/Class/uuid`) and offers
three join-shaped operations, which map onto standard Spark joins:

* **ResolveReferences** (adapters/repos/db/search.go:425, refcache/) —
  after a search, selected ref properties are expanded into nested
  target objects. Spark: explode the beacon array, join the target
  table on `_id`, re-nest with ``collect_list(struct(...))``. For
  FK-shaped data (the driver testdata) the beacon array is the single
  FK value, so resolution is a plain equi-join.
* **Ref-path filter** (inverted/searcher_ref_filter.go) — filter parents
  by a predicate over referenced objects: a LEFT SEMI join against the
  filtered target (sub-search is unlimited,
  entities/additional/classification.go:51-67).
* **Reference count** (inverted/searcher.go:694) — compare the number of
  refs: aggregate child count per parent, compare.

Scale notes: target dimension tables (region, nation, customer at most
scales) broadcast — Spark auto-broadcasts under the configured 64 MB
threshold, and `hint_broadcast=True` forces it. Fact-to-fact reference
resolution (orders->lineitem) is a shuffle join on the key both sides;
at 100 TB both tables would be bucketed on the join key so the shuffle
disappears (Exchange reuse). Semi-joins keep only the parent's columns
— Catalyst prunes the child projection to the join key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from weaviate_spark.filters import Clause, apply_where
from weaviate_spark.sources.tables import load_table


@dataclass(frozen=True)
class Ref:
    """One cref property: parent FK column -> target collection key."""

    parent: str
    prop: str            # ref property name (weaviate-style)
    fk: str              # FK column in parent realizing the beacon
    target: str          # target collection
    target_key: str      # key column in target


# The driver testdata's FK graph as weaviate-style refs (FIXTURES.md §B)
REFS: dict[tuple[str, str], Ref] = {
    (r.parent, r.prop): r
    for r in [
        Ref("customer", "inNation", "c_nationkey", "nation", "n_nationkey"),
        Ref("supplier", "inNation", "s_nationkey", "nation", "n_nationkey"),
        Ref("nation", "inRegion", "n_regionkey", "region", "r_regionkey"),
        Ref("orders", "byCustomer", "o_custkey", "customer", "c_custkey"),
        Ref("lineitem", "ofOrder", "l_orderkey", "orders", "o_orderkey"),
        Ref("lineitem", "ofPart", "l_partkey", "part", "p_partkey"),
        Ref("lineitem", "bySupplier", "l_suppkey", "supplier", "s_suppkey"),
    ]
}


def resolve_reference(
    spark: SparkSession,
    sf_dir: str,
    parent: str,
    prop: str,
    target_select: list[str],
    where: Clause | None = None,
    hint_broadcast: bool = True,
) -> DataFrame:
    """Flat reference resolution: parent row joined with selected columns
    of the referenced object (left join — refs may dangle)."""
    ref = REFS[(parent, prop)]
    pdf = apply_where(load_table(spark, sf_dir, parent), where)
    tdf = load_table(spark, sf_dir, ref.target).select(ref.target_key, *target_select)
    if hint_broadcast:
        tdf = F.broadcast(tdf)
    return pdf.join(tdf, pdf[ref.fk] == tdf[ref.target_key], "left").drop(ref.target_key)


def resolve_reference_nested(
    spark: SparkSession,
    sf_dir: str,
    parent: str,
    prop: str,
    target_select: list[str],
) -> DataFrame:
    """True weaviate result shape: the ref property becomes an array of
    resolved target objects (search.go:425 ResolveReferences re-nest).

    Children are collected sorted by their `_id` for determinism
    (refcache resolver returns beacon order; FK data has no beacon
    order, so we pin id-asc)."""
    ref = REFS[(parent, prop)]
    pdf = load_table(spark, sf_dir, parent)
    tdf = load_table(spark, sf_dir, ref.target, with_id=True)
    nested = (
        tdf.groupBy(ref.target_key)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_id"), *[F.col(c) for c in target_select]))
            ).alias(prop)
        )
    )
    return pdf.join(nested, pdf[ref.fk] == nested[ref.target_key], "left").drop(
        ref.target_key
    )


def ref_filter(
    spark: SparkSession,
    sf_dir: str,
    parent: str,
    prop: str,
    target_where: Clause,
    parent_where: Clause | None = None,
) -> DataFrame:
    """Parents having >=1 referenced object matching target_where
    (searcher_ref_filter.go — sub-search then allowlist intersection).
    LEFT SEMI join: only parent columns survive."""
    ref = REFS[(parent, prop)]
    pdf = apply_where(load_table(spark, sf_dir, parent), parent_where)
    tdf = apply_where(load_table(spark, sf_dir, ref.target), target_where)
    return pdf.join(
        tdf.select(ref.target_key),
        pdf[ref.fk] == tdf[ref.target_key],
        "leftsemi",
    )


def ref_filter_chain(
    spark: SparkSession,
    sf_dir: str,
    parent: str,
    props: Sequence[str],
    target_where: Clause,
    parent_where: Clause | None = None,
) -> DataFrame:
    """MULTI-HOP reference-path filter: parents with at least one chain
    of references whose FINAL target matches ``target_where`` — e.g.
    lineitems whose order's customer's nation is GERMANY, path
    ("ofOrder", "byCustomer", "inNation"). The reference's where-path
    grammar allows arbitrary reference depth (filters/resolver
    recursive sub-search: each hop runs a sub-filter and intersects the
    allowlist); the Spark shape is the same cascade of LEFT SEMI joins,
    built innermost-first so every hop prunes before the next join —
    the filtered allowlist rides up the chain, never whole tables.

    At scale each semi-join keys on the hop's FK; dimension-sized
    allowlists broadcast (AQE), fact-sized hops shuffle on the
    (bucketable) key — identical join shape to single-hop ref_filter,
    repeated."""
    chain = []
    cur = parent
    for prop in props:
        ref = REFS[(cur, prop)]
        chain.append(ref)
        cur = ref.target
    allow = apply_where(load_table(spark, sf_dir, cur), target_where)
    for hop_idx in range(len(chain) - 1, 0, -1):
        ref = chain[hop_idx]
        src = load_table(spark, sf_dir, chain[hop_idx - 1].target)
        allow = src.join(
            allow.select(ref.target_key),
            src[ref.fk] == allow[ref.target_key],
            "leftsemi",
        )
    first = chain[0]
    pdf = apply_where(load_table(spark, sf_dir, parent), parent_where)
    return pdf.join(
        allow.select(first.target_key),
        pdf[first.fk] == allow[first.target_key],
        "leftsemi",
    )


def ref_count(
    spark: SparkSession,
    sf_dir: str,
    parent: str,
    child: str,
    child_prop: str,
    alias: str = "ref_count",
) -> DataFrame:
    """Number of child objects referencing each parent (searcher.go:694
    extractReferenceCount -> `size(refCol) <op> n`; here the inverse FK
    direction: count children per parent key, 0 for none)."""
    ref = REFS[(child, child_prop)]
    pdf = load_table(spark, sf_dir, parent)
    counts = (
        load_table(spark, sf_dir, child)
        .groupBy(ref.fk)
        .agg(F.count(F.lit(1)).alias(alias))
    )
    out = pdf.join(counts, pdf[ref.target_key] == counts[ref.fk], "left").drop(ref.fk)
    return out.withColumn(alias, F.coalesce(F.col(alias), F.lit(0)))
