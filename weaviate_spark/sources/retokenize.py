"""Change-tokenization migration (the retokenize reindex family).

Reference: adapters/repos/db/inverted_reindexer_searchable_retokenize.go
(NewRuntimeSearchableRetokenizeTask — rebuild the searchable/BM25
bucket under the target tokenization, swap, tidy) and
adapters/repos/db/inverted/tokenization.go (TokenizationResolver: a
per-shard overlay consulted by the query paths so that queries landing
in the FINALIZING window — bucket already NEW-tokenized, cluster-wide
schema flip not yet committed — analyze their input against the NEW
tokenization, matching the bucket content).

Batch shape: our "searchable bucket" is the materialized BM25 stats
artifact, which is content-addressed by (prop, tokenization) (bm25.py
props_key) — so generations coexist by construction, exactly like the
reference's generation-suffixed buckets. The migration is therefore:

1. STARTED   — validate (searchable text property, known tokenization).
2. REBUILDING— build the NEW-tokenization artifact (with_materialized_
   stats); the OLD artifact keeps serving every in-flight query.
3. FINALIZING— install the overlay entry: resolve_tokenization() now
   answers NEW for this (collection, prop), so query analysis matches
   the new artifact even before the schema object flips (the reference
   window between bucket swap and RAFT schema commit).
4. DONE      — flip Property.tokenization on the schema object (the
   "RAFT commit"), drop the overlay (schema now answers by itself).
   The old artifact is retained on disk for rollback until artifact
   vacuuming — the reference's tidyBuckets analogue is content-address
   garbage collection, not an in-migration delete.

Queries never mix states: analysis resolves through
``resolve_tokenization`` at query-build time (bm25.py consults it),
and the stats-table cache key embeds the resolved tokenization, so an
old-analysis query can never read the new artifact or vice versa.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from pyspark.sql import SparkSession

from weaviate_spark.functions.text import TOKENIZATIONS
from weaviate_spark.schema import Collection

# (collection, prop) -> tokenization active during a FINALIZING window.
# The batch analogue of the per-shard TokenizationResolver overlay.
_TOK_OVERLAY: dict[tuple[str, str], str] = {}


def resolve_tokenization(collection: str, prop: str,
                         schema_tokenization: str) -> str:
    """ResolveTokenization (inverted/tokenization.go:52-57): overlay
    first, schema value otherwise. Query paths call this instead of
    reading Property.tokenization directly."""
    return _TOK_OVERLAY.get((collection, prop), schema_tokenization)


class RetokenizeError(RuntimeError):
    pass


def change_tokenization(
    spark: SparkSession,
    sf_dir: str,
    coll: Collection,
    prop_name: str,
    new_tokenization: str,
    id_col: str,
    on_phase: Optional[Callable[[str], None]] = None,
) -> dict:
    """Run the full migration; returns the status record (phases with
    timestamps, old/new tokenization, artifact generation note).
    ``on_phase`` is called with each phase name as it becomes current —
    tests use it to probe the FINALIZING window semantics."""
    from weaviate_spark.operators.bm25 import (
        BM25Prop, BM25Spec, with_materialized_stats,
    )
    from weaviate_spark.sources.tables import load_table

    prop = coll.property(prop_name)
    if new_tokenization not in TOKENIZATIONS:
        raise RetokenizeError(f"unknown tokenization {new_tokenization!r}")
    if not prop.searchable():
        raise RetokenizeError(
            f"property {prop_name!r} is not searchable (text) — nothing "
            "to retokenize")
    old = prop.tokenization
    if old == new_tokenization:
        raise RetokenizeError(
            f"property {prop_name!r} already uses {old!r}")

    status: dict = {
        "collection": coll.name, "property": prop_name,
        "from": old, "to": new_tokenization, "phases": [],
    }

    def phase(name: str) -> None:
        status["phases"].append((name, time.time()))
        status["status"] = name
        if on_phase is not None:
            on_phase(name)

    phase("STARTED")
    corpus = load_table(spark, sf_dir, coll.name)

    phase("REBUILDING")
    new_spec = BM25Spec(
        collection=coll.name, query="",
        properties=[BM25Prop(prop_name, tokenization=new_tokenization)],
        id_col=id_col,
    )
    # builds (or reuses) the content-addressed new-generation artifact;
    # the old (prop, old_tokenization) artifact is untouched and keeps
    # serving queries that analyze under the old tokenization
    with_materialized_stats(new_spec, corpus, (sf_dir, coll.name))

    # FINALIZING window: overlay active (queries analyze NEW), schema
    # object still OLD — the on_phase probe observes exactly the state
    # the reference's resolver exists for
    _TOK_OVERLAY[(coll.name, prop_name)] = new_tokenization
    try:
        phase("FINALIZING")
        # the "RAFT schema commit": flip the schema object
        prop.tokenization = new_tokenization
    finally:
        # schema now answers NEW by itself; window closed
        _TOK_OVERLAY.pop((coll.name, prop_name), None)

    phase("DONE")
    return status
