"""Client facade: the weaviate python-client-v4 API shape over the
Spark engine, so the public usage pattern carries over verbatim:

    client = connect(spark, "/data/root")
    coll = client.collections.get("Article")
    df = coll.query.near_vector([...], limit=10)
    df = coll.query.bm25("spark joins", query_properties=["text"])
    df = coll.query.fetch_objects(
        filters=Filter.by_property("p_size").greater_than(30)
                & Filter.by_property("p_type").like("PROMO*"),
        limit=20)
    coll.aggregate.over_all(group_by="lang", metrics=[("n_chars", ["mean"])])
    coll.data.insert_many(rows_df, key="doc_id")
    coll.tenants.create("acme"); coll.tenants.update("acme", "OFFLOADED")

Shape reference (PUBLIC client API): weaviate-python-client v4
`client.collections.get(...)` / `.query.{fetch_objects, near_vector,
near_object, near_text, bm25, hybrid}` / `.aggregate.over_all` /
`.data.{insert_many, update, delete_many}` / `.tenants`; the `Filter`
builder mirrors `weaviate.classes.query.Filter.by_property(...)`.
Documented divergence: methods return Spark DataFrames (lazy plans),
not materialized object lists — this is a Spark engine, and the caller
chooses `.collect()`/`.write`/further composition.

Names resolve through the schema Registry when one is attached
(aliases, `ns:Class` qualification); otherwise the name maps straight
to `<root>/<name>.parquet` like every contract query.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weaviate_spark import auth
from weaviate_spark.filters import Clause
from weaviate_spark.plans.spec import BM25, GetSpec, Hybrid, NearVector, SortKey


# ---------------------------------------------------------------------------
# Filter builder (weaviate.classes.query.Filter shape)

class _PropFilter:
    def __init__(self, path: Sequence[str]):
        self._path = list(path)

    def _c(self, operator: str, value: Any = None, **kw) -> Clause:
        return Clause(operator=operator, path=self._path, value=value, **kw)

    def equal(self, value, tokenization: str | None = None) -> Clause:
        if tokenization:
            return Clause(operator="Equal", path=self._path, value=value,
                          tokenization=tokenization)
        return self._c("Equal", value)

    def not_equal(self, value) -> Clause:
        return self._c("NotEqual", value)

    def greater_than(self, value) -> Clause:
        return self._c("GreaterThan", value)

    def greater_or_equal(self, value) -> Clause:
        return self._c("GreaterThanEqual", value)

    def less_than(self, value) -> Clause:
        return self._c("LessThan", value)

    def less_or_equal(self, value) -> Clause:
        return self._c("LessThanEqual", value)

    def like(self, pattern: str) -> Clause:
        return self._c("Like", pattern)

    def is_none(self, value: bool = True) -> Clause:
        return self._c("IsNull", value)

    def contains_any(self, values: Sequence) -> Clause:
        return self._c("ContainsAny", list(values))

    def contains_all(self, values: Sequence) -> Clause:
        return self._c("ContainsAll", list(values))

    def within_geo_range(self, latitude: float, longitude: float,
                         distance_meters: float) -> Clause:
        return self._c("WithinGeoRange", {
            "geoCoordinates": {"latitude": latitude, "longitude": longitude},
            "distance": {"max": distance_meters},
        })


class Filter:
    """`weaviate.classes.query.Filter` analogue. Combine built clauses
    with `Filter.all_of` / `Filter.any_of` (And/Or) and negate with
    `Filter.not_`."""

    @staticmethod
    def by_property(name: str, *nested: str) -> _PropFilter:
        return _PropFilter([name, *nested])

    @staticmethod
    def by_id() -> _PropFilter:
        return _PropFilter(["_id"])

    @staticmethod
    def all_of(clauses: Sequence[Clause]) -> Clause:
        return Clause(operator="And", operands=list(clauses))

    @staticmethod
    def any_of(clauses: Sequence[Clause]) -> Clause:
        return Clause(operator="Or", operands=list(clauses))

    @staticmethod
    def not_(clause: Clause) -> Clause:
        return Clause(operator="Not", operands=[clause])


# ---------------------------------------------------------------------------
# query namespace

class _Query:
    def __init__(self, handle: "CollectionHandle"):
        self._h = handle

    def _run(self, spec: GetSpec) -> DataFrame:
        from weaviate_spark.plans.compile import compile_get

        self._h._check(auth.READ)  # traverser_get.go:29 authz hook
        # schema-level index enforcement (alter_schema family): active
        # only when the client carries a Registry holding this
        # collection's schema — exactly when the reference would have
        # flags to consult
        coll = self._h._schema()
        if coll is not None:
            from weaviate_spark.schema import (
                validate_search_properties, validate_vector_search,
                validate_where_indexed,
            )

            validate_where_indexed(coll, spec.where)
            if spec.near_vector is not None:
                validate_vector_search(coll, spec.near_vector.target_vector)
            if spec.bm25 is not None:
                self._validate_keyword_props(coll, spec.bm25.properties)
            if spec.hybrid is not None:
                # both legs of a hybrid enforce their index flags: the
                # vector leg (alpha > 0 = a vector leg exists) like
                # near_vector — checked first, it is the structural
                # gate — then the keyword leg like bm25 (skipped for an
                # empty query, which has no keyword leg at all)
                if spec.hybrid.alpha > 0:
                    validate_vector_search(coll)
                if spec.hybrid.query:
                    self._validate_keyword_props(coll,
                                                 spec.hybrid.properties)
        return compile_get(self._h._spark, self._h._root, spec)

    @staticmethod
    def _validate_keyword_props(coll, properties) -> None:
        """Keyword-leg property validation, reference semantics
        (index.go:2239-2258): EXPLICIT properties are validated
        strictly (a deleted searchable index errors); with NO
        properties the default set is every property that still HAS a
        searchable index — unsearchable ones are excluded, not errors —
        and an empty default set reproduces the reference's
        WEAVIATE-471 error."""
        from weaviate_spark.schema import validate_search_properties

        if properties:
            # properties may carry the documented 'prop^boost' suffix
            # (parsed later in plans/compile.py); validate the bare
            # property name so 'text^2' hits the same searchable-index
            # gate as 'text' instead of KeyError-skipping it.
            validate_search_properties(
                coll, [p.partition("^")[0] for p in properties])
            return
        if not any(p.searchable() for p in coll.properties):
            raise ValueError(
                "No properties provided, and no indexed properties "
                "found in class")

    def _base(self, filters, limit, offset, after, sort, select) -> GetSpec:
        sort_keys = [
            SortKey(path=[p], order=o) for p, o in (sort or [])
        ]
        return GetSpec(
            collection=self._h._table, where=filters, sort=sort_keys,
            limit=limit, offset=offset or 0, after=after,
            select=tuple(select or ()), extra=dict(self._h._extra),
        )

    def fetch_objects(self, filters: Clause | None = None, limit: int | None = None,
                      offset: int = 0, after: str | None = None,
                      sort: Sequence[tuple] | None = None,
                      select: Sequence[str] | None = None) -> DataFrame:
        return self._run(self._base(filters, limit, offset, after, sort, select))

    def fetch_object_by_id(self, object_id) -> DataFrame:
        id_col = self._h._extra.get("id_col", "_id")
        return self.fetch_objects(
            filters=Filter.by_property(id_col).equal(object_id), limit=1)

    def near_vector(self, near_vector: Sequence[float], limit: int = 10,
                    distance: float | None = None, certainty: float | None = None,
                    filters: Clause | None = None, metric: str = "cosine",
                    target_vector: str | None = None) -> DataFrame:
        spec = self._base(filters, limit, 0, None, None, None)
        spec = replace(spec, near_vector=NearVector(
            vector=list(near_vector), distance=distance, certainty=certainty,
            metric=metric, target_vector=target_vector,
        ))
        return self._run(spec)

    def near_object(self, near_object, limit: int = 10,
                    filters: Clause | None = None) -> DataFrame:
        from weaviate_spark.operators.vector import NearVectorSpec
        from weaviate_spark.operators.vector import near_object as _near_object

        # same id/vector column defaults as every compile_get-routed
        # sibling method (extra overrides, else _id / embedding)
        self._h._check(auth.READ)
        self._validate_vector_route()
        return _near_object(self._h._spark, self._h._root, NearVectorSpec(
            collection=self._h._table, vector=[], limit=limit,
            where=filters,
            id_col=self._h._extra.get("id_col", "_id"),
            vector_col=self._h._extra.get("vector_col", "embedding"),
        ), near_object)

    def _validate_vector_route(self) -> None:
        """Vector-index gate for the non-compile_get vector routes
        (near_object / neighbors). When the handle's vector_col names a
        NAMED vector space, the gate checks that space's index type;
        otherwise the default space — so dropping one named index
        neither blocks the others nor goes unenforced."""
        coll = self._h._schema()
        if coll is None:
            return
        from weaviate_spark.schema import validate_vector_search

        vcol = self._h._extra.get("vector_col")
        name = vcol if vcol in coll.named_vectors else None
        validate_vector_search(coll, name)

    def neighbors(self, object_id, limit: int = 10,
                  graph_k: int = 5, rounds: int = 1) -> DataFrame:
        """Approximate nearest neighbors of an EXISTING object, served
        from the NN-descent k-NN graph ingest artifact — the measured
        on-corpus route (BENCH_ANN_1M_r08.json: recall@10 = 1.0 at 1M
        rows, constant per-query work; arbitrary-vector queries should
        use near_vector, whose compressed SQ scan is the recall-safe
        route there). The one-hop expansion around the object's own
        graph entry plays the role of HNSW's neighborhood walk
        (adapters/repos/db/vector/hnsw/search.go) for the nearObject
        workload."""
        from weaviate_spark.operators.similarity import graph_expand_topk
        from weaviate_spark.sources.tables import load_table

        self._h._check(auth.READ)
        self._validate_vector_route()
        id_col = self._h._extra.get("id_col", "_id")
        vector_col = self._h._extra.get("vector_col", "embedding")
        row = (
            load_table(self._h._spark, self._h._root, self._h._table)
            .where(F.col(id_col) == object_id)
            .select(vector_col).limit(1).collect()
        )
        if not row or row[0][0] is None:
            raise KeyError(
                f"{self._h._table}: no vector for object {object_id!r}")
        out = graph_expand_topk(
            self._h._spark, self._h._root, self._h._table,
            [float(x) for x in row[0][0]],
            k=limit + 1, seed_m=limit + 1, graph_k=graph_k, rounds=rounds,
            id_col=id_col, vector_col=vector_col,
            table_key=(self._h._root, self._h._table, "nng"),
            probe=2,  # Hamming-1 multiprobe: one extra IN value per
                      # plane keeps small buckets from starving the
                      # entry set; still a pruned index read
            on_corpus=True,  # the vector IS a corpus row (looked up
                             # above) — the measured recall-1.0 route
        )
        # the object itself is always its own nearest neighbor — drop it
        return out.where(F.col(id_col) != object_id).limit(limit)

    def near_text(self, query: str | Sequence[str], limit: int = 10,
                  move_to: Sequence[str] | None = None,
                  move_away: Sequence[str] | None = None,
                  force: float = 0.5, filters: Clause | None = None,
                  dim: int = 16) -> DataFrame:
        from weaviate_spark.modules import near_text_vector

        concepts = [query] if isinstance(query, str) else list(query)
        qv = near_text_vector(concepts, move_to=move_to, move_away=move_away,
                              force=force, dim=dim)
        return self.near_vector(qv, limit=limit, filters=filters)

    def bm25(self, query: str, query_properties: Sequence[str] | None = None,
             limit: int = 10, search_operator: str = "Or",
             minimum_or_tokens_match: int = 0,
             filters: Clause | None = None) -> DataFrame:
        spec = self._base(filters, limit, 0, None, None, None)
        spec = replace(spec, bm25=BM25(
            query=query, properties=tuple(query_properties or ()),
            search_operator=search_operator,
            minimum_or_tokens_match=minimum_or_tokens_match,
        ))
        return self._run(spec)

    def hybrid(self, query: str, vector: Sequence[float] | None = None,
               alpha: float = 0.75, fusion_type: str = "relativeScore",
               query_properties: Sequence[str] | None = None,
               max_vector_distance: float | None = None,
               limit: int = 10, filters: Clause | None = None) -> DataFrame:
        spec = self._base(filters, limit, 0, None, None, None)
        spec = replace(spec, hybrid=Hybrid(
            query=query, vector=list(vector) if vector is not None else None,
            alpha=alpha, fusion=fusion_type,
            properties=tuple(query_properties or ()),
            max_vector_distance=max_vector_distance,
        ))
        return self._run(spec)


# ---------------------------------------------------------------------------
# aggregate namespace

class _Aggregate:
    def __init__(self, handle: "CollectionHandle"):
        self._h = handle

    def over_all(self, metrics: Sequence[tuple] | None = None,
                 group_by: str | None = None, filters: Clause | None = None,
                 total_count: bool = False, limit: int | None = None) -> DataFrame:
        """`collection.aggregate.over_all` analogue: metrics is a list of
        (property, [aggregator, ...]) pairs."""
        from weaviate_spark.operators.aggregate import (
            AggregateSpec, PropertyAgg, aggregate,
        )

        spec = AggregateSpec(
            collection=self._h._table,
            properties=[PropertyAgg(p, list(aggs)) for p, aggs in (metrics or [])],
            where=filters, group_by=group_by,
            include_meta_count=total_count, limit=limit,
        )
        self._h._check(auth.READ)  # traverser aggregate authz hook
        return aggregate(self._h._spark, self._h._root, spec)


# ---------------------------------------------------------------------------
# data namespace (writable roots only)

class _Data:
    def __init__(self, handle: "CollectionHandle"):
        self._h = handle

    def _dir(self) -> str:
        return f"{self._h._root}/{self._h._table}.parquet"

    def insert_many(self, rows: DataFrame, key: str) -> None:
        from weaviate_spark.sources.crud import upsert

        self._h._check(auth.CREATE)  # batch_add.go authz
        upsert(self._h._spark, self._dir(), rows, key=key)

    def insert_many_with_report(
        self, rows: DataFrame, key: str,
        required_cols: list[str] | None = None,
        validators=None, order_col: str | None = None,
    ):
        """Batch insert returning the reference's per-object result
        array (batch_manager.go): (report_df, n_written) — failures
        are reported, not raised, and never abort the batch."""
        from weaviate_spark.sources.crud import insert_batch_with_report

        self._h._check(auth.CREATE)  # batch_add.go authz
        return insert_batch_with_report(
            self._h._spark, self._dir(), rows, key,
            required_cols=required_cols, validators=validators,
            order_col=order_col,
        )

    def update(self, key: str, key_value, changes: dict) -> None:
        from weaviate_spark.sources.crud import patch

        self._h._check(auth.UPDATE, key_value)  # merge.go authz
        patch(self._h._spark, self._dir(), key, key_value, changes)

    def delete_many(self, filters: Clause, dry_run: bool = False) -> int:
        self._h._check(auth.DELETE)  # batch_delete.go authz
        from weaviate_spark.sources.crud import delete_where

        return delete_where(self._h._spark, self._dir(), filters, dry_run=dry_run)

    def delete_many_with_output(self, filters: Clause, id_col: str,
                                dry_run: bool = False,
                                output: str = "minimal",
                                limit: int | None = None):
        """Batch delete returning the reference's BatchDeleteResponse
        shape: (result dict, per-object status frame) —
        crud.delete_where_with_output (batch_delete.go verbose/minimal
        output + the QueryMaximumResults deletion cap)."""
        self._h._check(auth.DELETE)  # batch_delete.go authz
        from weaviate_spark.sources.crud import (
            DEFAULT_QUERY_MAXIMUM_RESULTS, delete_where_with_output)

        return delete_where_with_output(
            self._h._spark, self._dir(), filters, id_col,
            dry_run=dry_run, output=output,
            limit=limit or DEFAULT_QUERY_MAXIMUM_RESULTS)

    def validate(self, obj: dict, *, auto_schema: bool = False,
                 exists_fn=None) -> None:
        """POST /v1/objects/validate: run the full object validator
        (schema + vector + property rules, reference error texts)
        WITHOUT writing. Raises ObjectValidationError on the first
        violation; returns None when valid. Uses the collection's
        registered schema when the client has a registry."""
        self._h._check(auth.READ)
        from weaviate_spark.sources.object_validation import (
            validate_object)

        reg = self._h._registry
        coll = None
        if reg is not None:
            try:
                coll = reg.resolve(obj.get("class", self._h._table))
            except KeyError:
                coll = None
        validate_object(obj, coll, auto_schema=auto_schema,
                        exists_fn=exists_fn)

    def read_version(self, version: int | None = None) -> DataFrame:
        """Time-travel read: the collection as of a committed version
        (None = current)."""
        from weaviate_spark.sources.crud import read_table_version

        self._h._check(auth.READ)
        return read_table_version(self._h._spark, self._dir(), version)

    def history(self) -> dict:
        """Commit log: current / committed / archived version numbers."""
        from weaviate_spark.sources.crud import table_history

        self._h._check(auth.READ)
        return table_history(self._dir())

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop archived snapshots beyond the newest ``keep_last``."""
        from weaviate_spark.sources.crud import vacuum_table

        self._h._check(auth.DELETE)
        return vacuum_table(self._dir(), keep_last=keep_last)

    def optimize(self, zorder: Sequence[str] | None = None,
                 target_rows_per_file: int = 1_000_000) -> int:
        """Maintenance rewrite (Delta's OPTIMIZE): small-file compaction,
        or — with ``zorder`` columns — a Morton-clustered rewrite so
        filtered scans prune row groups on every listed column. Returns
        the file count written."""
        from weaviate_spark.sources.crud import compact_table, optimize_zorder

        self._h._check(auth.UPDATE)
        if zorder:
            return optimize_zorder(
                self._h._spark, self._dir(), list(zorder),
                target_rows_per_file=target_rows_per_file,
            )
        return compact_table(
            self._h._spark, self._dir(),
            target_rows_per_file=target_rows_per_file,
        )


# ---------------------------------------------------------------------------
# collection handle + top-level client

class CollectionHandle:
    def __init__(self, client: "WeaviateSparkClient", table: str,
                 extra: dict | None = None):
        self._spark = client._spark
        self._root = client._root
        self._table = table
        self._extra = extra or {}
        self._registry = client._registry
        self._authorizer = client._authorizer
        self._principal = client._principal
        self.query = _Query(self)
        self.aggregate = _Aggregate(self)
        self.data = _Data(self)
        self._tenants = None

    def _check(self, verb: str, object_id="*") -> None:
        """Per-resource authorization (authorizer.go Authorize): the
        data-domain resource path of this collection, reference grammar
        (types.go:541)."""
        self._authorizer.authorize(
            self._principal, verb,
            auth.objects_path(self._table, "*", object_id),
        )

    def _schema(self):
        """The Collection schema object for this handle, when the
        client was connected with a Registry that knows it; None
        otherwise (schema-less contract tables)."""
        reg = getattr(self, "_registry", None)
        if reg is None:
            return None
        try:
            return reg.resolve(self._table)
        except KeyError:
            return None

    def _vector_kw(self) -> dict:
        kw = {}
        if "id_col" in self._extra:
            kw["id_col"] = self._extra["id_col"]
        if "vector_col" in self._extra:
            kw["vector_col"] = self._extra["vector_col"]
        return kw

    def with_config(self, id_col: str | None = None,
                    vector_col: str | None = None) -> "CollectionHandle":
        """Bind non-default id/vector column names (the contract tables
        use natural keys like doc_id rather than a `_id` uuid)."""
        extra = dict(self._extra)
        if id_col:
            extra["id_col"] = id_col
        if vector_col:
            extra["vector_col"] = vector_col
        h = CollectionHandle.__new__(CollectionHandle)
        h.__dict__.update(self.__dict__)
        h._extra = extra
        h.query = _Query(h)
        h.aggregate = _Aggregate(h)
        h.data = _Data(h)
        return h

    @property
    def tenants(self):
        from weaviate_spark.sources.crud import TenantRegistry

        if self._tenants is None:
            # same physical path every other namespace uses (the
            # partitioned table IS the <table>.parquet directory)
            self._tenants = _AuthorizedTenants(self, TenantRegistry(
                f"{self._root}/{self._table}.parquet",
                self._extra.get("tenant_col", "_tenant"),
            ))
        return self._tenants


class _AuthorizedTenants:
    """Per-verb authorization in front of TenantRegistry — tenant
    lifecycle mutations are resources of the tenants domain
    (auth.tenants_path, types.go grammar), so a read-only principal can
    list/read but never create/update tenant state."""

    def __init__(self, handle: "CollectionHandle", registry):
        self._h = handle
        self._reg = registry

    def _check(self, verb: str, tenant: str = "*") -> None:
        self._h._authorizer.authorize(
            self._h._principal, verb, auth.tenants_path(self._h._table, tenant)
        )

    def create(self, tenant: str, status: str = "ACTIVE") -> None:
        self._check(auth.CREATE, tenant)
        return self._reg.create(tenant, status)

    def status(self, tenant: str) -> str:
        self._check(auth.READ, tenant)
        return self._reg.status(tenant)

    def list(self) -> dict:
        self._check(auth.READ)
        return self._reg.list()

    def update(self, tenant: str, status: str) -> None:
        self._check(auth.UPDATE, tenant)
        return self._reg.update(tenant, status)

    def read(self, spark, tenant: str):
        self._check(auth.READ, tenant)
        return self._reg.read(spark, tenant)


class _Collections:
    def __init__(self, client: "WeaviateSparkClient"):
        self._client = client

    def get(self, name: str) -> CollectionHandle:
        reg = self._client._registry
        if reg is not None:
            # alias / ns:Class indirection — keep the QUALIFIED storage
            # key, not Collection.name: distinct namespaces must map to
            # distinct physical tables ("ns:Class.parquet")
            name = reg.resolve_key(name)
        return CollectionHandle(self._client, name)

    def create(self, coll, namespace: str = ""):
        """collections.create (v4 client) — the creation-path name
        sweep (entities/schema/validation.go: class name, property
        names, reserved names/suffixes, nested names) runs BEFORE the
        registry add; internal lowercase driver tables never pass
        through here, matching the reference's creation-only
        validation. Requires a bound registry."""
        from weaviate_spark.schema import validate_collection_definition

        reg = self._client._registry
        if reg is None:
            raise RuntimeError(
                "collections.create needs a client bound to a schema "
                "registry (connect(..., registry=...))")
        validate_collection_definition(coll)
        reg.add(coll, namespace=namespace)
        return self.get(coll.name if not namespace
                        else f"{namespace}:{coll.name}")

    def list_all(self) -> list[str]:
        import glob
        import os

        return sorted(
            os.path.basename(p)[: -len(".parquet")]
            for p in glob.glob(f"{self._client._root}/*.parquet")
        )

    def exists(self, name: str) -> bool:
        return name in self.list_all()


class _Backup:
    """`client.backup` namespace (v4 client shape: backup.create /
    backup.restore / backup.get_create_status), delegating to
    sources/backup.py; authorized on the backups resource
    (authorization types.go Backups())."""

    def __init__(self, client: "WeaviateSparkClient"):
        self._c = client

    def _check(self, verb: str) -> None:
        self._c._authorizer.authorize(
            self._c._principal, verb, auth.backups_path()
        )

    def create(self, backup_id: str, backend: str,
               include_collections=None, exclude_collections=None) -> dict:
        from weaviate_spark.sources.backup import backup_create

        self._check(auth.CREATE)
        return backup_create(
            self._c._spark, backup_id, self._c._root, backend,
            include=include_collections, exclude=exclude_collections,
        )

    def restore(self, backup_id: str, backend: str,
                include_collections=None, exclude_collections=None,
                overwrite: bool = False) -> dict:
        from weaviate_spark.sources.backup import backup_restore

        self._check(auth.CREATE)
        return backup_restore(
            self._c._spark, backup_id, backend, self._c._root,
            include=include_collections, exclude=exclude_collections,
            overwrite=overwrite,
        )

    def get_create_status(self, backup_id: str, backend: str) -> str:
        from weaviate_spark.sources.backup import backup_status

        self._check(auth.READ)
        return backup_status(backend, backup_id)


class _Export:
    """`client.export` namespace (POST /v1/export/{backend} +
    status/cancel, client/export/export_client.go), delegating to
    sources/export.py. Shares the backups authorization resource —
    both are bulk data egress of whole collections."""

    def __init__(self, client: "WeaviateSparkClient"):
        self._c = client

    def _check(self, verb: str) -> None:
        self._c._authorizer.authorize(
            self._c._principal, verb, auth.backups_path()
        )

    def create(self, export_id: str, backend: str,
               include_collections=None, exclude_collections=None) -> dict:
        from weaviate_spark.sources.export import export_create

        self._check(auth.CREATE)
        return export_create(
            self._c._spark, export_id, self._c._root, backend,
            include=include_collections, exclude=exclude_collections,
        )

    def status(self, export_id: str, backend: str) -> dict:
        from weaviate_spark.sources.export import export_status

        self._check(auth.READ)
        return export_status(backend, export_id)

    def cancel(self, export_id: str, backend: str) -> dict:
        from weaviate_spark.sources.export import export_cancel

        self._check(auth.DELETE)
        return export_cancel(backend, export_id)


class _Classifications:
    """`client.classifications` namespace (POST/GET
    /v1/classifications — usecases/classification/classifier.go
    Schedule :151 authorizes UPDATE on the class's metadata, Get :278
    authorizes READ)."""

    def __init__(self, client: "WeaviateSparkClient"):
        self._c = client

    def schedule(self, df, coll, **kwargs):
        self._c._authorizer.authorize(
            self._c._principal, auth.UPDATE,
            auth.collections_metadata_path(coll.name))
        from weaviate_spark.operators.classification_job import (
            schedule_classification)

        return schedule_classification(df, coll, **kwargs)

    def get(self, job_id: str):
        from weaviate_spark.operators.classification_job import (
            get_classification)

        job = get_classification(job_id)
        if job is not None:
            self._c._authorizer.authorize(
                self._c._principal, auth.READ,
                auth.collections_metadata_path(job.class_name))
        return job


class WeaviateSparkClient:
    def __init__(self, spark: SparkSession, root: str,
                 registry: Optional[object] = None,
                 authorizer: Optional["auth.Authorizer"] = None,
                 principal: str = "anonymous"):
        self._spark = spark
        self._root = root.rstrip("/")
        self._registry = registry
        self._authorizer = authorizer or auth.DummyAuthorizer()
        self._principal = principal
        self.collections = _Collections(self)
        self.backup = _Backup(self)
        self.export = _Export(self)
        self.classifications = _Classifications(self)

    def get_meta(self) -> dict:
        """GET /v1/meta (models.Meta + modules Provider.GetMeta,
        usecases/modules/modules.go:1087): hostname, engine version,
        and per-module meta keyed by module name — every registered
        vectorizer / reranker / generative / qna / summarizer / ner /
        spellchecker surfaces here, like the reference's enabled-
        modules map."""
        from weaviate_spark import __version__ as _v
        from weaviate_spark import modules as M

        mods: dict = {}
        for family, reg in (
            ("text2vec", M.VECTORIZERS), ("reranker", M.RERANKERS),
            ("generative", M.GENERATIVES), ("qna", M.QNAS),
            ("sum", M.SUMMARIZERS), ("ner", M.NERS),
            ("text-spellcheck", M.SPELLCHECKERS),
        ):
            for name in sorted(reg):
                mods[name] = {"family": family}
        return {
            "hostname": f"file://{self._root}",
            "version": _v,
            "modules": mods,
        }


def connect(spark: SparkSession, root: str, registry=None,
            authorizer=None, principal: str = "anonymous") -> WeaviateSparkClient:
    """`weaviate.connect_to_*` analogue: bind a SparkSession and a data
    root (directory of `<collection>.parquet` tables). Pass an
    `auth.Authorizer` (Rbac/AdminList) + principal to enforce
    per-collection CRUD authorization on every facade call; default is
    the reference's DummyAuthorizer (allow everything)."""
    return WeaviateSparkClient(spark, root, registry=registry,
                               authorizer=authorizer, principal=principal)
