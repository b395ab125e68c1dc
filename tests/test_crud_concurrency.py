"""Optimistic concurrency for the COW table writes (VERDICT r05 ask #5:
concurrent-writer safety without Delta's jars).

Protocol = Delta's log on a filesystem with atomic O_EXCL create: every
mutation snapshots the table version before reading, and the commit
claims version+1 by exclusive marker creation. Of two racing writers
exactly one claims the version; the loser gets ConcurrentWriteError and
retries against the fresh snapshot (``transact``), so no update is
ever lost."""

from __future__ import annotations

import threading

import pytest

from weaviate_spark.sources import crud


def _write_table(spark, path, rows):
    spark.createDataFrame(rows, ["k", "v"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_stale_snapshot_write_is_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_table(spark, path, [(1, "a"), (2, "b")])
    assert crud.table_version(path) == 0

    # writer A snapshots (and fully computes its output from the
    # snapshot — the lost-update scenario)...
    stale_version = crud.table_version(path)
    stale_rows = spark.read.parquet(path).collect()
    stale_out = spark.createDataFrame(stale_rows, ["k", "v"])

    # ...writer B commits in between...
    crud.upsert(spark, path, spark.createDataFrame([(3, "c")], ["k", "v"]), "k")
    assert crud.table_version(path) == 1

    # ...so A's commit against the stale snapshot must fail, not win
    with pytest.raises(crud.ConcurrentWriteError):
        crud._rewrite(stale_out, path, expected_version=stale_version)
    # and B's write survived
    assert spark.read.parquet(path).count() == 3


def test_transact_retries_and_converges(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_table(spark, path, [(1, "a")])

    calls = {"n": 0}

    def attempt():
        calls["n"] += 1
        v = crud.table_version(path)
        if calls["n"] == 1:
            # interleave: someone else commits after our snapshot
            crud.upsert(
                spark, path, spark.createDataFrame([(2, "b")], ["k", "v"]), "k"
            )
        out = spark.read.parquet(path)
        crud._rewrite(out, path, expected_version=v)

    crud.transact(attempt)
    assert calls["n"] == 2  # first attempt lost, retry won
    assert crud.table_version(path) == 2  # interleaved write = 1, retry = 2


def test_concurrent_upserts_lose_no_update(spark, tmp_path):
    """Two threads upserting different keys with retries: both rows are
    present afterwards (the lost-update anomaly the COW path had)."""
    path = str(tmp_path / "t")
    _write_table(spark, path, [(0, "seed")])
    errors = []

    def worker(k):
        def attempt():
            crud.upsert(
                spark, path,
                spark.createDataFrame([(k, f"w{k}")], ["k", "v"]), "k",
            )
        try:
            crud.transact(attempt, retries=10)
        except Exception as exc:  # pragma: no cover - surfaced via assert
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(k,)) for k in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got[1] == "w1" and got[2] == "w2" and got[0] == "seed"
    assert crud.table_version(path) >= 2


def test_version_log_monotonic(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_table(spark, path, [(1, "a")])
    for i in range(3):
        crud.upsert(
            spark, path,
            spark.createDataFrame([(10 + i, "x")], ["k", "v"]), "k",
        )
    assert crud.table_version(path) == 3


def test_time_travel_reads_and_history(spark, tmp_path):
    """Every transactional write archives the replaced state; versioned
    reads return exactly the pre-write contents; vacuum bounds it."""
    from weaviate_spark.filters import Clause

    path = str(tmp_path / "tt")
    _write_table(spark, path, [(1, "a"), (2, "b")])

    def rows_at(v=None):
        return sorted(
            (r["k"], r["v"])
            for r in crud.read_table_version(spark, path, v).collect()
        )

    # v0 -> v1: change v of k 2
    crud.upsert(spark, path, spark.createDataFrame([(2, "B")], "k long, v string"), "k")
    # v1 -> v2: delete k 1
    crud.delete_where(spark, path, Clause(operator="Equal", path=["k"], value=1))
    h = crud.table_history(path)
    assert h["current_version"] == 2
    assert h["archived_versions"] == [0, 1]
    assert rows_at() == [(2, "B")]
    assert rows_at(2) == [(2, "B")]        # current by number
    assert rows_at(1) == [(1, "a"), (2, "B")]
    assert rows_at(0) == [(1, "a"), (2, "b")]

    # one more write, then vacuum to the last snapshot only
    crud.upsert(spark, path, spark.createDataFrame([(3, "c")], "k long, v string"), "k")
    dropped = crud.vacuum_table(path, keep_last=1)
    assert dropped == [0, 1]
    assert crud.table_history(path)["archived_versions"] == [2]
    assert rows_at(2) == [(2, "B")]
    with pytest.raises(FileNotFoundError):
        crud.read_table_version(spark, path, 0)


def test_restore_version_is_a_new_commit(spark, tmp_path):
    path = str(tmp_path / "rb")
    _write_table(spark, path, [(1, "a")])
    crud.upsert(spark, path, spark.createDataFrame([(2, "b")], "k long, v string"), "k")
    crud.upsert(spark, path, spark.createDataFrame([(3, "c")], "k long, v string"), "k")
    assert crud.table_version(path) == 2

    new_v = crud.restore_version(spark, path, 1)
    assert new_v == 3
    rows = sorted((r["k"], r["v"]) for r in
                  crud.read_table_version(spark, path).collect())
    assert rows == [(1, "a"), (2, "b")]  # state as of version 1
    # the pre-restore state is itself archived and still readable
    pre = sorted((r["k"], r["v"]) for r in
                 crud.read_table_version(spark, path, 2).collect())
    assert pre == [(1, "a"), (2, "b"), (3, "c")]


def test_upsert_schema_evolution_fills_nulls(spark, tmp_path):
    path = str(tmp_path / "ev")
    _write_table(spark, path, [(1, "a")])
    crud.upsert(
        spark, path,
        spark.createDataFrame([(2, "b", 7.5)], "k long, v string, score double"),
        "k",
    )
    rows = {r["k"]: r for r in spark.read.parquet(path).collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 7.5
    assert rows[1]["v"] == "a"


def test_insert_batch_with_report_per_object(spark, tmp_path):
    """Reference batch semantics (batch_manager.go in-order PUTs):
    per-object validation, failures don't abort the batch, a duplicate
    id is NOT an error — the last occurrence in batch order overwrites
    and every occurrence reports SUCCESS — and only valid objects reach
    the table."""
    from pyspark.sql import functions as F

    from weaviate_spark.sources.crud import insert_batch_with_report

    tgt = str(tmp_path / "t.parquet")
    rows = [
        (1, "ok-a", 5.0, 10),
        (None, "no-id", 1.0, 11),          # missing id
        (2, None, 1.0, 12),                # missing required prop
        (3, "neg", -4.0, 13),              # custom validator fails
        (4, "first", 1.0, 14),
        (4, "second", 2.0, 15),            # duplicate id, later order
    ]
    df = spark.createDataFrame(rows, "oid long, name string, score double, seq long")
    report, n = insert_batch_with_report(
        spark, tgt, df, "oid",
        required_cols=["name"],
        validators=[("score must be non-negative", F.col("score") >= 0)],
        order_col="seq",
    )
    collected = report.collect()
    got = {(r["id"], r["status"]): r["error"] for r in collected}
    assert n == 2
    assert got[(1, "SUCCESS")] is None
    assert got[(None, "FAILED")] == "missing id"
    assert got[(2, "FAILED")] == "missing required property 'name'"
    assert got[(3, "FAILED")] == "invalid: score must be non-negative"
    # both duplicate occurrences succeed (two independent in-order PUTs)
    assert len([r for r in collected if r["id"] == 4
                and r["status"] == "SUCCESS"]) == 2
    assert (4, "FAILED") not in got
    table = {(r["oid"], r["name"]) for r in spark.read.parquet(tgt).collect()}
    assert table == {(1, "ok-a"), (4, "second")}


def test_insert_batch_report_upserts_existing(spark, tmp_path):
    """A second batch with an existing id REPLACES the row (batch PUT),
    still reporting SUCCESS per object."""
    from weaviate_spark.sources.crud import insert_batch_with_report

    tgt = str(tmp_path / "t.parquet")
    df1 = spark.createDataFrame([(1, "v1")], "oid long, name string")
    df2 = spark.createDataFrame([(1, "v2"), (2, "w")], "oid long, name string")
    insert_batch_with_report(spark, tgt, df1, "oid")
    report, n = insert_batch_with_report(spark, tgt, df2, "oid")
    assert n == 2
    assert {r["status"] for r in report.collect()} == {"SUCCESS"}
    table = {(r["oid"], r["name"]) for r in spark.read.parquet(tgt).collect()}
    assert table == {(1, "v2"), (2, "w")}


def test_insert_batch_concurrent_first_create(spark, tmp_path):
    """Two racing FIRST-batch writers on a not-yet-existing table: the
    create is routed through the version-claim transaction, so neither
    write is lost — the loser's retry sees the table and upserts."""
    from weaviate_spark.sources.crud import insert_batch_with_report

    tgt = str(tmp_path / "t.parquet")
    d1 = spark.createDataFrame([(1, "a")], "oid long, name string")
    d2 = spark.createDataFrame([(2, "b")], "oid long, name string")
    errs = []

    def run(df):
        try:
            insert_batch_with_report(spark, tgt, df, "oid")
        except Exception as exc:  # pragma: no cover - failure detail
            errs.append(exc)

    ts = [threading.Thread(target=run, args=(d,)) for d in (d1, d2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    table = {(r["oid"], r["name"]) for r in spark.read.parquet(tgt).collect()}
    assert table == {(1, "a"), (2, "b")}


def test_table_changes_cdc(spark, tmp_path):
    """Version diff classifies inserts, deletes, and updates (null-safe
    struct comparison); unchanged rows are excluded by default."""
    path = str(tmp_path / "t")
    _write_table(spark, path, [(1, "a"), (2, "b"), (3, None)])
    crud.upsert(spark, path,
                spark.createDataFrame([(2, "B"), (4, "d")], ["k", "v"]), "k")
    from weaviate_spark.filters import Clause
    crud.delete_where(spark, path,
                      Clause(operator="Equal", path=["k"], value=1))
    v = crud.table_version(path)
    changes = {r["k"]: r["change_type"] for r in
               crud.table_changes(spark, path, 0, v, "k").collect()}
    assert changes == {1: "delete", 2: "update", 4: "insert"}
    # null-safe: row 3 (v = NULL both sides) is unchanged
    allrows = {r["k"]: r["change_type"] for r in
               crud.table_changes(spark, path, 0, v, "k",
                                  include_unchanged=True).collect()}
    assert allrows[3] == "unchanged"
    assert not crud.table_changes(spark, path, v, v, "k").collect()


def test_read_snapshot_survives_concurrent_swap(spark, tmp_path):
    """A reader whose lazy plan holds the pre-swap file paths is served
    the PINNED version from the archive when a transactional writer
    swaps mid-read -- not an error, and not the newer state."""
    path = str(tmp_path / "t")
    _write_table(spark, path, [(1, "a"), (2, "a")])
    # enter the transactional history so the next swap archives v0
    crud.upsert(spark, path,
                spark.createDataFrame([(3, "a")], ["k", "v"]), "k")
    assert crud.table_version(path) == 1

    def action(df):
        df = df.where(df.v == "a")
        # swap happens AFTER the plan binds its file listing...
        crud.upsert(spark, path,
                    spark.createDataFrame([(1, "b"), (4, "b")], ["k", "v"]),
                    "k")
        # ...so this collect hits moved files and must fall back to the
        # archived snapshot of version 1 (three 'a' rows)
        return df.collect()

    rows = crud.read_snapshot(spark, path, action)
    assert sorted(r["k"] for r in rows) == [1, 2, 3]
    assert {r["v"] for r in rows} == {"a"}
    # the writer's state is the live one for NEW readers
    live = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert live == {(1, "b"), (2, "a"), (3, "a"), (4, "b")}


def test_read_snapshot_plain_read_passthrough(spark, tmp_path):
    """No concurrent writer: read_snapshot is just a read."""
    path = str(tmp_path / "t")
    _write_table(spark, path, [(1, "a")])
    assert crud.read_snapshot(spark, path, lambda df: df.count()) == 1


def test_table_changes_feed_row_payloads(spark, tmp_path):
    from weaviate_spark.sources import crud

    path = str(tmp_path / "cdf")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, name string, v long").write.parquet(path)
    crud.upsert(spark, path, spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40)], "k long, name string, v long"),
        "k")
    from weaviate_spark.filters import Clause
    crud.delete_where(spark, path, Clause(
        operator="Equal", path=["k"], value=3))

    rows = crud.table_changes_feed(spark, path, "k", 0).collect()
    by = {}
    for r in rows:
        by.setdefault(r["k"], {})[r["_change_type"]] = r
    assert set(by[2]) == {"update_preimage", "update_postimage"}
    assert by[2]["update_preimage"]["name"] == "b"
    assert by[2]["update_preimage"]["v"] == 20
    assert by[2]["update_postimage"]["name"] == "b2"
    assert by[2]["update_postimage"]["v"] == 21
    assert set(by[3]) == {"delete"} and by[3]["delete"]["name"] == "c"
    assert set(by[4]) == {"insert"} and by[4]["insert"]["v"] == 40
    assert 1 not in by  # unchanged rows emit nothing
    # compare_cols narrows the difference test
    only_v = crud.table_changes_feed(spark, path, "k", 0,
                                     compare_cols=["v"]).collect()
    assert {r["k"] for r in only_v} == {2, 3, 4}


def test_tenant_name_validated_on_create(spark, tmp_path):
    import pytest as _pytest

    from weaviate_spark.sources.crud import TenantRegistry

    reg = TenantRegistry(str(tmp_path / "mt"), "_tenant")
    reg.create("ok-tenant_1")
    with _pytest.raises(ValueError, match="empty tenant name"):
        reg.create("")
    with _pytest.raises(ValueError, match="not a valid tenant name"):
        reg.create("bad tenant")


def test_delete_where_verbose_output(spark, tmp_path):
    from weaviate_spark.filters import Clause
    from weaviate_spark.sources import crud

    path = str(tmp_path / "bd")
    spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "k long, par long"
    ).write.parquet(path)
    where = Clause(operator="Equal", path=["par"], value=0)

    # dry run verbose: DRYRUN status per object, nothing deleted
    res, objs = crud.delete_where_with_output(
        spark, path, where, "k", dry_run=True, output="verbose")
    assert res == {"matches": 5, "limit": 10000, "successful": 0,
                   "failed": 0, "dryRun": True, "output": "verbose"}
    got = {(r["id"], r["status"]) for r in objs.collect()}
    assert got == {(str(k), "DRYRUN") for k in (0, 2, 4, 6, 8)}
    assert spark.read.parquet(path).count() == 10

    # minimal: successful objects omitted (batch_delete_response:283)
    res, objs = crud.delete_where_with_output(
        spark, path, where, "k", output="minimal")
    assert res["successful"] == 5 and objs.count() == 0
    assert spark.read.parquet(path).count() == 5

    # limit caps the deletion; smallest ids win; matches reports all
    spark.createDataFrame(
        [(100 + i, 7) for i in range(6)], "k long, par long"
    ).write.mode("append").parquet(path)
    res, objs = crud.delete_where_with_output(
        spark, path, Clause(operator="Equal", path=["par"], value=7),
        "k", output="verbose", limit=4)
    assert res["matches"] == 6 and res["successful"] == 4
    assert {r["id"] for r in objs.collect()} == {"100", "101", "102", "103"}
    left = {r["k"] for r in spark.read.parquet(path)
            .where("par = 7").collect()}
    assert left == {104, 105}

    with pytest.raises(ValueError, match="invalid output"):
        crud.delete_where_with_output(
            spark, path, where, "k", output="wide")
