"""Streaming ingest, CRUD/TTL/tenants, multimodal plumbing, schema
registry, rerank stages (SURVEY §2.1, §2.9, §3.3)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F


def test_stream_ingest_replay(spark, sf_dir, tmp_path):
    """Replay the events table through Structured Streaming foreachBatch
    (the BatchStream analogue) and check the sink matches the source."""
    from weaviate_spark.sources.tables import load_table
    from weaviate_spark.streaming.ingest import stream_ingest

    src_dir = str(tmp_path / "events_src")
    tgt_dir = str(tmp_path / "events_tgt")
    chk_dir = str(tmp_path / "chk")
    events = load_table(spark, sf_dir, "events")
    events.write.parquet(src_dir)
    n_src = events.count()

    q = stream_ingest(
        spark, src_dir, events.schema, tgt_dir,
        transform=lambda df: df.withColumn("_ingested", F.lit(True)),
        checkpoint_dir=chk_dir,
    )
    assert q.awaitTermination(120)  # False = still running: timed out
    out = spark.read.parquet(tgt_dir)
    assert out.count() == n_src
    assert out.where(~F.col("_ingested")).count() == 0


def test_windowed_counts_streaming_matches_batch(spark, sf_dir, tmp_path):
    """Unified model: the windowed agg gives identical results on the
    streaming replay and the batch table."""
    from weaviate_spark.sources.tables import load_table
    from weaviate_spark.streaming.ingest import windowed_event_counts

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(events).collect()
    }

    src_dir = str(tmp_path / "ev2")
    events.write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("win_counts")
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)  # False = still running: timed out
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert streamed == batch


def test_crud_upsert_patch_delete(spark, tmp_path):
    from weaviate_spark.filters import Clause
    from weaviate_spark.sources.crud import delete_where, patch, upsert

    tdir = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "val"]
    ).write.parquet(tdir)

    upsert(spark, tdir, spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], ["id", "name", "val"]
    ), key="id")
    rows = {r["id"]: r for r in spark.read.parquet(tdir).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["name"] == "b2"

    patch(spark, tdir, "id", 1, {"val": 99.0})
    rows = {r["id"]: r for r in spark.read.parquet(tdir).collect()}
    assert rows[1]["val"] == 99.0 and rows[1]["name"] == "a"

    n = delete_where(spark, tdir, Clause(operator="GreaterThan", path=["val"], value=25.0), dry_run=True)
    assert n == 3  # 99, 30, 40 — dry run does not delete
    assert spark.read.parquet(tdir).count() == 4
    n = delete_where(spark, tdir, Clause(operator="GreaterThan", path=["val"], value=25.0))
    assert n == 3
    assert {r["id"] for r in spark.read.parquet(tdir).collect()} == {2}


def test_ttl(spark, tmp_path):
    from weaviate_spark.sources.crud import purge_expired, with_ttl_filter

    tdir = str(tmp_path / "ttl_tbl")
    now = 1_000_000
    spark.createDataFrame(
        [(1, now - 5000), (2, now - 100), (3, now - 10)], ["id", "_creationTimeUnix"]
    ).write.parquet(tdir)
    live = with_ttl_filter(spark.read.parquet(tdir), 1000, now, "_creationTimeUnix")
    assert {r["id"] for r in live.collect()} == {2, 3}
    n = purge_expired(spark, tdir, 1000, now, "_creationTimeUnix")
    assert n == 1
    assert {r["id"] for r in spark.read.parquet(tdir).collect()} == {2, 3}


def test_tenant_partition_pruning(spark, tmp_path):
    from weaviate_spark.sources.crud import read_tenant, write_tenant_partitioned

    tdir = str(tmp_path / "tenants")
    df = spark.createDataFrame(
        [(i, f"t{i % 3}", float(i)) for i in range(30)], ["id", "_tenant", "v"]
    )
    write_tenant_partitioned(df, tdir, "_tenant")
    one = read_tenant(spark, tdir, "_tenant", "t1")
    assert one.count() == 10
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(_tenant" in plan, "tenant filter must prune partitions"


def test_multimodal_plumbing(spark):
    from weaviate_spark.operators.multimodal import (
        attach_media_meta, decode_image_features, sample_frames,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"imagebytes-1")), (2, bytearray(b"imagebytes-2")), (3, None)],
        "media_id long, media binary",
    )
    df = attach_media_meta(df, mime="image/png")
    assert df.schema["media_meta"].dataType.fieldNames() == [
        "mime", "width", "height", "duration_ms", "sample_rate"]

    feats = decode_image_features(df, "media_id", "media", dim=4, fake=True).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[3]["decode_ok"] is False and by_id[3]["feature"] is None
    assert len(by_id[1]["feature"]) == 4
    # deterministic stub: same bytes -> same features
    feats2 = decode_image_features(df, "media_id", "media", dim=4, fake=True).collect()
    assert {r["media_id"]: r["feature"] for r in feats2} == {
        r["media_id"]: r["feature"] for r in feats}

    # real decoder path is stubbed: must raise, not silently fake
    with pytest.raises(Exception):
        decode_image_features(df, "media_id", "media", dim=4, fake=False).collect()

    frames = sample_frames(df, "media_id", "media", every_ms=1000, fake=True).collect()
    assert len(frames) == 10  # 2 clips x 5 fake frames
    assert all(len(r["frame"]) == 16 for r in frames)


def test_schema_determine_type():
    from weaviate_spark.schema import determine_type, infer_collection

    assert determine_type("2023-01-02T10:00:00Z") == "date"
    assert determine_type("2023-01-02 10:00:00") == "text"  # not RFC3339 shape
    assert determine_type("7c9f9699-6d14-4a57-8a3f-1b2f3c4d5e6f") == "uuid"
    assert determine_type("not-a-uuid-but-len-36-chars-exactly!") == "text"
    assert determine_type(True) == "boolean"
    assert determine_type(3) == "int"
    assert determine_type(3.5) == "number"
    assert determine_type({"latitude": 1.0, "longitude": 2.0}) == "geoCoordinates"
    assert determine_type({"a": 1}) == "object"
    assert determine_type(["x"]) == "text[]"
    assert determine_type([1, 2]) == "int[]"
    assert determine_type(b"raw") == "blob"

    coll = infer_collection("Doc", {"title": "hi", "views": 4, "_internal": 1})
    assert [p.name for p in coll.properties] == ["title", "views"]
    schema = coll.spark_schema()
    assert schema.fieldNames()[0] == "_id"


def test_mmr_and_legacy_group():
    from weaviate_spark.operators.rerank import legacy_group, mmr_select

    rows = [
        {"id": 1, "v": [1.0, 0.0], "s": 1.0},
        {"id": 2, "v": [0.99, 0.01], "s": 0.95},  # near-dup of 1
        {"id": 3, "v": [0.0, 1.0], "s": 0.9},
    ]
    picked = mmr_select(rows, "v", "s", k=2, balance=0.5)
    assert [r["id"] for r in picked] == [1, 3], "MMR must diversify away from near-dup"

    groups = legacy_group(rows, "v", force=0.1, strategy="closest")
    assert [g["id"] for g in groups] == [1, 3]
    assert groups[0]["_group_size"] == 2
    merged = legacy_group(rows, "v", force=0.1, strategy="merge")
    assert merged[0]["_group_size"] == 2 and len(merged[0]["v"]) == 2


def test_reference_add_delete(spark, tmp_path):
    from weaviate_spark.sources.crud import add_reference, delete_reference, make_beacon

    tdir = str(tmp_path / "reftbl")
    spark.createDataFrame(
        [(1, []), (2, None)],
        "id int, inCountry array<struct<beacon:string,className:string,id:string>>",
    ).write.parquet(tdir)

    add_reference(spark, tdir, "id", 1, "inCountry", "Country", "uuid-nl")
    add_reference(spark, tdir, "id", 1, "inCountry", "Country", "uuid-nl")  # idempotent
    add_reference(spark, tdir, "id", 2, "inCountry", "Country", "uuid-de")
    rows = {r["id"]: r["inCountry"] for r in spark.read.parquet(tdir).collect()}
    assert len(rows[1]) == 1 and rows[1][0]["id"] == "uuid-nl"
    assert rows[1][0]["beacon"] == "weaviate://localhost/Country/uuid-nl"
    assert len(rows[2]) == 1

    delete_reference(spark, tdir, "id", 1, "inCountry", "uuid-nl")
    rows = {r["id"]: r["inCountry"] for r in spark.read.parquet(tdir).collect()}
    assert rows[1] == [] and len(rows[2]) == 1


def test_registry_aliases():
    from weaviate_spark.schema import Collection, Property, Registry

    reg = Registry()
    reg.add(Collection("Article", [Property("title", "text")]))
    reg.add_alias("Post", "Article")
    assert reg.resolve("Post").name == "Article"
    with pytest.raises(KeyError):
        reg.add_alias("X", "Nope")
    with pytest.raises(KeyError):
        reg.resolve("Unknown")


def test_registry_alias_crud():
    """Alias API parity (usecases/schema/alias.go): list/filter,
    re-create rejection, retarget, delete, class-drop cascade."""
    from weaviate_spark.schema import Collection, Property, Registry

    reg = Registry()
    reg.add(Collection("Article", [Property("title", "text")]))
    reg.add(Collection("News", [Property("title", "text")]))
    reg.add_alias("Post", "Article")
    reg.add_alias("Story", "Article")
    reg.add_alias("Brief", "News")
    # GetAliases: all / by class / by alias name
    assert reg.get_aliases() == {
        "Post": "Article", "Story": "Article", "Brief": "News"}
    assert reg.get_aliases(class_name="Article") == {
        "Post": "Article", "Story": "Article"}
    assert reg.get_aliases(alias="Brief") == {"Brief": "News"}
    # ErrAliasExists on re-create
    with pytest.raises(ValueError, match="already exists"):
        reg.add_alias("Post", "News")
    # UpdateAlias retargets; unknown alias / unknown target error
    assert reg.update_alias("Post", "News") == "News"
    assert reg.resolve("Post").name == "News"
    with pytest.raises(KeyError, match="no alias found"):
        reg.update_alias("Nope", "News")
    with pytest.raises(KeyError, match="does not exist"):
        reg.update_alias("Post", "Ghost")
    # DeleteAlias; unknown -> not found
    reg.delete_alias("Post")
    with pytest.raises(KeyError, match="not found"):
        reg.delete_alias("Post")
    # dropping a class cascades to its aliases only
    reg.drop("Article")
    assert reg.get_aliases() == {"Brief": "News"}
    with pytest.raises(KeyError):
        reg.resolve("Article")
    with pytest.raises(KeyError):
        reg.drop("Article")
    # a class may not take a live alias's name
    with pytest.raises(ValueError, match="exists as an alias"):
        reg.add(Collection("Brief", [Property("t", "text")]))


def test_registry_namespaces():
    """Namespace level (cluster/namespaces/, usecases/schema/namespacing/):
    '<ns>:<Class>' qualified resolution, lifecycle, validation parity."""
    from weaviate_spark.schema import Collection, Property, Registry

    reg = Registry()
    reg.create_namespace("team-search")
    reg.add(Collection("Article", [Property("title", "text")]),
            namespace="team-search")
    reg.add(Collection("Article", [Property("body", "text")]))  # root ns
    # same class name resolves independently per namespace
    assert reg.resolve("team-search:Article").properties[0].name == "title"
    assert reg.resolve("Article").properties[0].name == "body"
    # aliases are themselves namespace-qualified entities
    reg.add_alias("team-search:News", "team-search:Article")
    assert reg.resolve("team-search:News").properties[0].name == "title"
    # unknown namespace is distinguished from unknown collection
    with pytest.raises(KeyError, match="unknown namespace"):
        reg.resolve("nope:Article")
    # lifecycle: drop refuses while collections remain, then succeeds
    with pytest.raises(ValueError, match="still holds"):
        reg.drop_namespace("team-search")
    assert reg.list_namespaces() == ["team-search"]
    # validation parity with the reference
    for bad in ("ab", "Upper", "-lead", "trail-", "a" * 37, "admin",
                "default", "with:colon"):
        with pytest.raises((ValueError,)):
            reg.create_namespace(bad)
    with pytest.raises(ValueError, match="already exists"):
        reg.create_namespace("team-search")
    with pytest.raises(KeyError, match="unknown namespace"):
        reg.add(Collection("X", []), namespace="missing")


def test_upsert_anti_join_no_key_collect(spark, tmp_path):
    """upsert's keep-set must be a LEFT ANTI join (no driver key
    materialization): probe the optimized plan of the exact frame upsert
    builds."""
    from weaviate_spark.sources.crud import upsert

    tdir = str(tmp_path / "tbl_anti")
    spark.createDataFrame([(i, i * 1.0) for i in range(100)], ["id", "v"]).write.parquet(tdir)
    new_rows = spark.createDataFrame([(5, -5.0), (200, -200.0)], ["id", "v"])

    current = spark.read.parquet(tdir)
    kept = current.join(new_rows.select("id").distinct(), "id", "left_anti")
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan

    upsert(spark, tdir, new_rows, key="id")
    rows = {r["id"]: r["v"] for r in spark.read.parquet(tdir).collect()}
    assert len(rows) == 101 and rows[5] == -5.0 and rows[200] == -200.0


def test_upsert_partitioned_rewrites_only_affected(spark, tmp_path):
    """Partition-pruned MERGE: untouched partition directories keep their
    data files byte-identical (same file names, same mtimes)."""
    import os

    from weaviate_spark.sources.crud import upsert_partitioned, write_tenant_partitioned

    tdir = str(tmp_path / "tbl_part")
    df = spark.createDataFrame(
        [(1, "t1", 1.0), (2, "t1", 2.0), (3, "t2", 3.0), (4, "t3", 4.0)],
        ["id", "tenant", "v"],
    )
    write_tenant_partitioned(df, tdir, "tenant")

    def files(p):
        d = os.path.join(tdir, p)
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    before_t2, before_t3 = files("tenant=t2"), files("tenant=t3")
    upsert_partitioned(
        spark, tdir,
        spark.createDataFrame([(2, "t1", 20.0), (5, "t1", 5.0)], ["id", "tenant", "v"]),
        key="id", partition_col="tenant",
    )
    assert files("tenant=t2") == before_t2
    assert files("tenant=t3") == before_t3
    rows = {r["id"]: (r["tenant"], r["v"]) for r in spark.read.parquet(tdir).collect()}
    assert rows == {1: ("t1", 1.0), 2: ("t1", 20.0), 3: ("t2", 3.0),
                    4: ("t3", 4.0), 5: ("t1", 5.0)}


def _make_bmp(w, h, rgb):
    """Minimal uncompressed 24-bit bottom-up BMP."""
    import struct

    stride = (w * 3 + 3) & ~3
    pixel_bytes = b""
    for _y in range(h):
        row = bytes([rgb[2], rgb[1], rgb[0]] * w)
        pixel_bytes += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 0, 0, 0, 0)
    return header + info + pixel_bytes


def _make_wav(sr=8000, freq=440, ms=250):
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
        frames = b"".join(
            struct.pack("<h", int(20000 * math.sin(2 * math.pi * freq * i / sr)))
            for i in range(n)
        )
        wf.writeframes(frames)
    return buf.getvalue()


def test_real_bmp_ppm_decode_and_resize(spark):
    """BMP/PPM decode is REAL (struct/numpy) — known solid-color images
    produce exact channel means; resize re-encodes to PPM."""
    import numpy as np
    from weaviate_spark.operators.multimodal import (
        decode_image_array, decode_image_features, resize_images,
    )

    red_bmp = _make_bmp(6, 4, (255, 0, 0))
    img = decode_image_array(red_bmp)
    assert img.shape == (4, 6, 3)
    assert (img[:, :, 0] == 255).all() and (img[:, :, 1:] == 0).all()

    blue_ppm = b"P6\n2 2\n255\n" + bytes([0, 0, 255] * 4)
    img2 = decode_image_array(blue_ppm)
    assert img2.shape == (2, 2, 3) and (img2[:, :, 2] == 255).all()

    df = spark.createDataFrame(
        [(1, bytearray(red_bmp)), (2, bytearray(blue_ppm)), (3, None)],
        "media_id long, media binary",
    )
    feats = {r["media_id"]: r for r in
             decode_image_features(df, "media_id", "media", dim=7).collect()}
    assert feats[1]["decode_ok"] and abs(feats[1]["feature"][0] - 1.0) < 1e-6
    assert feats[2]["decode_ok"] and abs(feats[2]["feature"][2] - 1.0) < 1e-6
    assert not feats[3]["decode_ok"]

    rs = {r["media_id"]: r["resized"] for r in
          resize_images(df, "media_id", "media", 2, 3).collect()}
    out = decode_image_array(bytes(rs[1]))
    assert out.shape == (2, 3, 3) and (out[:, :, 0] == 255).all()
    assert rs[3] is None


def test_real_wav_decode(spark):
    """WAV decode is REAL (stdlib wave): header fields + RMS +
    zero-crossing rate of a 440 Hz sine check out."""
    from weaviate_spark.operators.multimodal import decode_audio_features

    wav = _make_wav(sr=8000, freq=440, ms=250)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not audio"))],
        "media_id long, media binary",
    )
    rows = {r["media_id"]: r for r in
            decode_audio_features(df, "media_id", "media").collect()}
    ok = rows[1]
    assert ok["decode_ok"] and ok["sample_rate"] == 8000 and ok["channels"] == 1
    assert abs(ok["duration_ms"] - 250) <= 1
    # sine RMS = amplitude/sqrt(2); zero crossings ~ 2*freq/sr
    assert abs(ok["rms"] - 20000 / 2 ** 0.5) / (20000 / 2 ** 0.5) < 0.01
    assert abs(ok["zero_crossing_rate"] - 2 * 440 / 8000) < 0.01
    assert not rows[2]["decode_ok"]


def test_pack_sequences_budget_invariant(spark):
    """Chunked variant: pack sums bounded by budget + max_doc - 1;
    greedy variant: strict sum <= budget (single-doc overflow packs
    excepted); both deterministic on rerun."""
    from weaviate_spark.operators.sampling import pack_sequences, pack_sequences_greedy

    df = spark.range(500).withColumnRenamed("id", "doc_id").withColumn(
        "tokens", (F.col("doc_id") * 37 % 900 + 100).cast("long")
    )
    packed = pack_sequences(df, "doc_id", "tokens", budget=1000, num_buckets=8)
    sums = packed.groupBy("_bucket", "_pack").agg(
        F.sum(F.least(F.col("tokens"), F.lit(1000))).alias("s"),
        F.count("*").alias("n"),
    ).collect()
    for r in sums:
        assert r["s"] <= 1000 + 999, r  # budget + max_doc - 1
    greedy = pack_sequences_greedy(df, "doc_id", "tokens", budget=1000, num_buckets=8)
    gsums = greedy.groupBy("_bucket", "_pack").agg(
        F.sum(F.least(F.col("tokens"), F.lit(1000))).alias("s"),
        F.count("*").alias("n"),
    ).collect()
    for r in gsums:
        assert r["s"] <= 1000 or r["n"] == 1, r
    # packs are contiguous in id order within each bucket
    rows = greedy.select("_bucket", "doc_id", "_pack").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["_bucket"], []).append((r["doc_id"], r["_pack"]))
    for seq in by_bucket.values():
        packs = [p for _, p in sorted(seq)]
        assert packs == sorted(packs)
    # deterministic on rerun
    a = packed.select("doc_id", "_bucket", "_pack").collect()
    b = pack_sequences(df, "doc_id", "tokens", budget=1000, num_buckets=8) \
        .select("doc_id", "_bucket", "_pack").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_compact_table(spark, tmp_path):
    """Small-file compaction rewrites to ceil(rows/target) files and
    preserves the data."""
    import glob
    from weaviate_spark.sources.crud import compact_table

    path = str(tmp_path / "tbl")
    spark.range(1000).repartition(50).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 50
    files = compact_table(spark, path, target_rows_per_file=500)
    assert files == 2
    assert len(glob.glob(path + "/*.parquet")) == 2
    assert spark.read.parquet(path).count() == 1000


def test_near_media_search(spark):
    """nearImage: a red query image retrieves red images before blue
    ones; corrupt rows are skipped, not fatal."""
    from weaviate_spark.operators.multimodal import near_media_search

    def ppm(rgb, w=4, h=4):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes(list(rgb) * (w * h))

    rows = [
        (1, bytearray(ppm((250, 10, 10)))),
        (2, bytearray(ppm((10, 10, 250)))),
        (3, bytearray(ppm((240, 20, 20)))),
        (4, bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = [r["media_id"] for r in
           near_media_search(df, "media_id", "media", ppm((255, 0, 0)), limit=3).collect()]
    assert out[:2] == [1, 3] and 4 not in out


def test_stream_dedup_replay(spark, tmp_path):
    """Streaming exact-dedup: duplicated keys in the source collapse to
    one row per key after an availableNow replay through the dedup
    stage; batch call gives the identical result set."""
    import glob
    from pyspark.sql import types as T
    from weaviate_spark.streaming.ingest import stream_dedup, stream_ingest

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ])
    rows = [(i % 5, "2026-01-01 10:%02d:00" % (i % 30), f"v{i}") for i in range(20)]
    spark.createDataFrame(rows, "k long, ts string, v string") \
        .withColumn("ts", F.to_timestamp("ts")).write.parquet(src)

    q = stream_ingest(
        spark, src, schema, out,
        transform=lambda df: stream_dedup(df, ("k",), "ts", "1 hour"),
        checkpoint_dir=ckpt, available_now=True,
    )
    assert q.awaitTermination(120)  # False = still running: timed out
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert sorted(r["k"] for r in got.select("k").collect()) == [0, 1, 2, 3, 4]


def test_near_audio_corpus_routing(spark):
    """nearAudio: WAV corpus rows must reach the AUDIO feature path —
    routing them through the image decoder silently dropped them."""
    from weaviate_spark.operators.multimodal import near_media_search

    rows = [
        (1, bytearray(_make_wav(sr=8000, freq=440))),
        (2, bytearray(_make_wav(sr=44100, freq=2000))),
        (3, bytearray(_make_wav(sr=8000, freq=450))),
        (4, bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = [r["media_id"] for r in
           near_media_search(df, "media_id", "media",
                             _make_wav(sr=8000, freq=440), limit=3).collect()]
    # every decodable WAV row competes; the identical clip ranks first
    assert len(out) == 3 and out[0] == 1 and 4 not in out


def test_upsert_partitioned_detects_key_moves(spark, tmp_path):
    """A key whose partition value changes must not leave a stale
    duplicate in its old partition."""
    from weaviate_spark.sources.crud import upsert_partitioned, write_tenant_partitioned

    tdir = str(tmp_path / "tbl_move")
    df = spark.createDataFrame(
        [(1, "t1", 1.0), (2, "t1", 2.0), (3, "t2", 3.0)],
        ["id", "tenant", "v"],
    )
    write_tenant_partitioned(df, tdir, "tenant")

    # id=3 moves from t2 to t1
    upsert_partitioned(
        spark, tdir,
        spark.createDataFrame([(3, "t1", 30.0)], ["id", "tenant", "v"]),
        key="id", partition_col="tenant",
    )
    rows = {r["id"]: (r["tenant"], r["v"]) for r in spark.read.parquet(tdir).collect()}
    assert rows == {1: ("t1", 1.0), 2: ("t1", 2.0), 3: ("t1", 30.0)}


def test_session_windows_streaming_matches_batch(spark, sf_dir, tmp_path):
    """Unified model: the session-window agg gives identical sessions on
    the streaming replay and the batch table."""
    from weaviate_spark.sources.tables import load_table
    from weaviate_spark.streaming.ingest import sessionized_event_counts

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in sessionized_event_counts(events).collect()
    }
    assert batch  # sf0.001 still produces sessions

    src_dir = str(tmp_path / "ev3")
    events.write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    agg = sessionized_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("sess_counts")
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)  # False = still running: timed out
    streamed = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    assert streamed == batch


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState: per-key cumulative totals carried across
    micro-batches converge to the batch groupBy totals, and intermediate
    updates stream out (one per key per batch seen)."""
    from weaviate_spark.sources.tables import load_table
    from weaviate_spark.streaming.ingest import stateful_running_totals

    events = load_table(spark, sf_dir, "events")
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in stateful_running_totals(events).collect()
    }

    # two files -> two micro-batches (maxFilesPerTrigger=1)
    src_dir = str(tmp_path / "ev4")
    half = events.where(F.col("event_id") % 2 == 0)
    rest = events.where(F.col("event_id") % 2 == 1)
    half.coalesce(1).write.parquet(src_dir)
    rest.coalesce(1).write.mode("append").parquet(src_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src_dir)
    )
    q = (
        stateful_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("run_totals")
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)  # False = still running: timed out
    rows = spark.sql("SELECT * FROM run_totals").collect()
    assert len(rows) > len(batch)  # intermediate updates emitted too
    # the LAST update per key must equal the batch totals
    final = {}
    for r in rows:  # memory sink appends updates in batch order
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final == batch


def test_grouper_reference_fixtures():
    """Ported from the reference's grouper tests
    (usecases/traverser/grouper/grouper_test.go TestGrouper_ModeClosest
    + TestGrouper_ModeMerge): same vectors, force 0.2, same expected
    winners / merged property values."""
    from weaviate_spark.operators.rerank import legacy_group

    closest_in = [
        {"name": "A1", "v": [0.1, 0.1, 0.98]},
        {"name": "A2", "v": [0.1, 0.1, 0.96]},
        {"name": "A3", "v": [0.1, 0.1, 0.93]},
        {"name": "B1", "v": [0.1, 0.98, 0.1]},
        {"name": "B2", "v": [0.1, 0.93, 0.1]},
        {"name": "B3", "v": [0.1, 0.92, 0.1]},
    ]
    got = legacy_group(closest_in, "v", force=0.2, strategy="closest")
    assert [g["name"] for g in got] == ["A1", "B1"]
    assert [g["_group_size"] for g in got] == [3, 3]

    merge_in = [
        {"name": "A1", "count": 10.0, "illegal": True,
         "location": {"latitude": 20.0, "longitude": 20.0},
         "relatedTo": [{"id": "1", "foo": "bar1"}, {"id": "2", "foo": "bar2"}],
         "v": [0.1, 0.1, 0.98]},
        {"name": "A2", "count": 11.0, "illegal": True, "v": [0.1, 0.1, 0.96]},
        {"name": "A2", "count": 11.0, "illegal": True,
         "relatedTo": [{"id": "3", "foo": "bar3"}], "v": [0.1, 0.1, 0.96]},
        {"name": "A3", "count": 12.0, "illegal": False,
         "location": {"latitude": 22.0, "longitude": 18.0},
         "relatedTo": [{"id": "2", "foo": "bar2"}], "v": [0.1, 0.1, 0.93]},
        {"name": "B1", "v": [0.1, 0.98, 0.1]},
        {"name": "B2", "v": [0.1, 0.93, 0.1]},
        {"name": "B3", "v": [0.1, 0.92, 0.1]},
    ]
    merged = legacy_group(merge_in, "v", force=0.2, strategy="merge")
    a, b = merged[0], merged[1]
    # grouper_test.go expectations for the A group:
    assert a["name"] == "A1 (A2, A3)"      # text dedup'd in order
    assert a["count"] == pytest.approx(11.0)   # mean of 10,11,11,12
    assert a["illegal"] is True            # majority (3 true, 1 false)
    assert a["location"] == {"latitude": 21.0, "longitude": 19.0}  # centroid
    assert [r["id"] for r in a["relatedTo"]] == ["1", "2", "3"]    # union by id
    assert a["v"] == pytest.approx([0.1, 0.1, 0.9575], abs=1e-6)
    assert b["name"] == "B1 (B2, B3)"
    assert b["v"][1] == pytest.approx((0.98 + 0.93 + 0.92) / 3, abs=1e-6)


def test_diversify_results_reference_fixtures():
    """Ported from the reference's TestDiversifyResults
    (adapters/repos/db/selection_hybrid_test.go:65-160): same cluster
    vectors, scores = n-i, same expected slot orders."""
    from weaviate_spark.operators.rerank import diversify_results

    A1, A2, A3 = [1.0, 0.0, 0.0], [0.99, 0.01, 0.0], [0.98, 0.02, 0.0]
    B = [0.0, 0.0, 1.0]

    def rows(vecs):
        return [{"id": i, "v": v, "s": float(len(vecs) - i)}
                for i, v in enumerate(vecs)]

    def ids(out):
        return [r["id"] for r in out]

    # balance=0 pulls the diverse far candidate into the top results
    out = diversify_results(rows([A1, A2, A3, B]), "v", "s", limit=2, balance=0)
    assert len(out) == 4 and out[0]["id"] == 0 and out[1]["id"] == 3

    # balance=1 preserves fused relevance order
    out = diversify_results(rows([A1, A2, A3, B]), "v", "s", limit=3, balance=1)
    assert ids(out) == [0, 1, 2, 3]

    # vectorless candidate keeps its fused rank
    out = diversify_results(rows([A1, None, A2, B]), "v", "s", limit=4, balance=0)
    assert len(out) == 4 and out[1]["id"] == 1

    # all candidates vectorless keeps fused order
    out = diversify_results(rows([None, None, None]), "v", "s", limit=2, balance=0)
    assert ids(out) == [0, 1, 2]

    # empty input
    assert diversify_results([], "v", "s", limit=5, balance=0) == []

    # slots past the page keep relevance order
    out = diversify_results(rows([A1, A2, A3, B]), "v", "s", limit=2, balance=0)
    assert ids(out) == [0, 3, 1, 2]

    # vectorless slots inside the page still get enough MMR candidates
    out = diversify_results(rows([A1, None, A2, None, A3, B]), "v", "s",
                            limit=3, balance=0)
    assert ids(out[:4]) == [0, 1, 5, 3]


def test_autocut_runs_before_selection_reference_semantics(spark):
    """Ported semantics from TestHybridCombinerAutocutRunsBeforeSelection
    (usecases/traverser/hybrid/searcher_test.go:376-441): autocut (n=1)
    trims the fused set at the score gap BEFORE any selection pass
    (MMR/diversify) sees it."""
    from weaviate_spark.operators.rerank import diversify_results
    from weaviate_spark.operators.search_post import apply_autocut

    hits = spark.createDataFrame(
        [(1, 1.0, [1.0, 0.0]), (2, 0.95, [0.9, 0.1]),
         (3, 0.10, [0.0, 1.0]), (4, 0.05, [0.1, 0.9])],
        "id long, _score double, v array<float>",
    )
    cut = apply_autocut(hits.orderBy(F.col("_score").desc()), "_score", 1)
    rows = [r.asDict() for r in
            cut.orderBy(F.col("_score").desc()).collect()]
    # the gap after the top 2 trims the set to exactly those two
    assert [r["id"] for r in rows] == [1, 2]
    # selection only sees the trimmed window
    out = diversify_results(rows, "v", "_score", limit=2, balance=0)
    assert sorted(r["id"] for r in out) == [1, 2]


def test_tenant_lifecycle_states(spark, tmp_path):
    """Tenant activity states (usecases/multitenancy/, tenant.go:34):
    ACTIVE reads prune to the partition; INACTIVE/OFFLOADED refuse with
    the reference's sentinel messages; OFFLOADED physically moves the
    partition directory out of the hot table root and reactivation
    restores it byte-identically."""
    import os

    from weaviate_spark.sources.crud import (
        TenantRegistry, write_tenant_partitioned,
    )

    tdir = str(tmp_path / "mt")
    df = spark.createDataFrame(
        [(1, "t1", 1.0), (2, "t1", 2.0), (3, "t2", 3.0)],
        ["id", "_tenant", "v"],
    )
    write_tenant_partitioned(df, tdir, "_tenant")
    reg = TenantRegistry(tdir, "_tenant")
    reg.create("t1")
    reg.create("t2", status="COLD")  # deprecated name -> INACTIVE
    assert reg.status("t2") == "INACTIVE"

    assert {r["id"] for r in reg.read(spark, "t1").collect()} == {1, 2}
    with pytest.raises(PermissionError, match="tenant not active"):
        reg.read(spark, "t2")
    with pytest.raises(KeyError, match="tenant not found"):
        reg.read(spark, "nope")

    # offload: partition directory leaves the hot root
    reg.update("t1", "OFFLOADED")
    assert not os.path.isdir(os.path.join(tdir, "_tenant=t1"))
    assert os.path.isdir(tdir + "_offload/_tenant=t1")
    with pytest.raises(PermissionError, match="tenant not active"):
        reg.read(spark, "t1")
    # hot scans no longer see the cold tenant at all
    assert {r["id"] for r in spark.read.parquet(tdir).collect()} == {3}

    # reactivate: data returns byte-identical
    reg.update("t1", "ACTIVE")
    rows = {r["id"]: r["v"] for r in reg.read(spark, "t1").collect()}
    assert rows == {1: 1.0, 2: 2.0}

    # rule parity: create only ACTIVE/INACTIVE; update rejects
    # transitional states
    with pytest.raises(ValueError, match="only allows ACTIVE or INACTIVE"):
        reg.create("t9", status="OFFLOADED")
    with pytest.raises(ValueError):
        reg.update("t2", "OFFLOADING")
    with pytest.raises(ValueError, match="invalid tenant"):
        reg.create("t9", status="LUKEWARM")


def test_audio_frame_features_closed_form(spark):
    """Per-frame RMS/ZCR agree with the closed-form sine expectations:
    RMS ≈ amp/√2 (normalized), ZCR ≈ 2f/sr, constant across full
    frames; silence (zero batch) gives rms 0."""
    import math

    from weaviate_spark.operators.multimodal import audio_frame_features

    sr, freq, amp = 8000, 400, 20000
    wav = _make_wav(sr=sr, freq=freq, ms=200)  # amp 20000 builder above
    silence = _make_wav(sr=sr, freq=0, ms=100)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(silence)), (3, bytearray(b"junk"))],
        "media_id long, blob binary",
    )
    rows = audio_frame_features(df, "media_id", "blob", frame_samples=400).collect()
    by = {}
    for r in rows:
        by.setdefault(r["media_id"], []).append(r)
    # undecodable row 3 yields no frames; sine has 4 full frames
    assert 3 not in by and len(by[1]) == 4 and len(by[2]) == 2
    for r in by[1]:
        assert abs(r["rms"] - (amp / math.sqrt(2)) / 32768) < 0.01
        assert abs(r["zcr"] - 2 * freq / sr) < 0.01
        assert r["n_samples"] == 400
    for r in by[2]:
        assert r["rms"] == 0.0 and r["zcr"] == 0.0


def test_namespace_state_machine_and_cleanup():
    """usecases/namespaces/controller.go states + namespace_cleanup
    coordinator: transition table, deleting-is-terminal, create-into-
    deleting rejection, async teardown order."""
    from weaviate_spark.schema import Collection, Property, Registry

    reg = Registry()
    reg.create_namespace("team-a")
    assert reg.namespace_state("team-a") == "active"
    # legal round trip active -> suspended -> resuming -> active
    reg.change_namespace_state("team-a", "suspended")
    reg.change_namespace_state("team-a", "resuming")
    reg.change_namespace_state("team-a", "active")
    # illegal: active -> resuming
    with pytest.raises(ValueError, match="invalid namespace state "
                       "transition"):
        reg.change_namespace_state("team-a", "resuming")
    with pytest.raises(ValueError, match="unknown namespace state"):
        reg.change_namespace_state("team-a", "turbo")
    with pytest.raises(KeyError, match="namespace not found"):
        reg.namespace_state("ghost")

    reg.add(Collection("Article", [Property("t", "text")]),
            namespace="team-a")
    reg.add_alias("team-a:Post", "team-a:Article")
    reg.delete_namespace("team-a")
    # deleting is terminal; creates into it name the teardown
    with pytest.raises(ValueError, match="cannot transition"):
        reg.change_namespace_state("team-a", "active")
    with pytest.raises(ValueError, match='namespace is being deleted'):
        reg.add(Collection("X", []), namespace="team-a")
    with pytest.raises(ValueError, match='namespace is being deleted'):
        reg.create_namespace("team-a")
    # same-state change is a no-op
    reg.change_namespace_state("team-a", "deleting")

    assert reg.list_deleting() == ["team-a"]
    done = reg.cleanup_namespaces()
    assert done == {"team-a": {"aliases": ["team-a:Post"],
                               "classes": ["team-a:Article"]}}
    assert reg.list_namespaces() == [] and reg.list_deleting() == []
    # entity removed: the name is creatable again (fresh Create)
    reg.create_namespace("team-a")
    assert reg.namespace_state("team-a") == "active"


def test_collection_to_class_dict():
    """models.Class JSON shape (GET /v1/schema/{class},
    collection.config.get())."""
    from weaviate_spark.schema import Collection, Property

    coll = Collection("Article", [
        Property("title", "text", tokenization="field"),
        Property("views", "int", index_range_filters=True),
        Property("ofCategory", "Category,Topic"),
        Property("profile", "object", nested=[
            Property("bio", "text")]),
    ], vector_dim=8, multi_tenancy=True,
       named_vectors={"title_vec": 4},
       named_vector_index_types={"title_vec": "flat"})
    d = coll.to_class_dict()
    assert d["class"] == "Article"
    by = {p["name"]: p for p in d["properties"]}
    assert by["title"]["dataType"] == ["text"]
    assert by["title"]["tokenization"] == "field"
    assert by["views"]["dataType"] == ["int"]
    assert by["views"]["indexRangeFilters"] is True
    assert "tokenization" not in by["views"]
    # refs carry target classes as dataType ENTRIES (class.go shape)
    assert by["ofCategory"]["dataType"] == ["Category", "Topic"]
    assert by["ofCategory"]["indexSearchable"] is False
    assert by["profile"]["nestedProperties"][0]["name"] == "bio"
    assert d["multiTenancyConfig"] == {"enabled": True}
    assert d["invertedIndexConfig"] == {"indexNullState": True}
    assert d["vectorIndexConfig"] == {"dimensions": 8}
    assert d["vectorConfig"]["title_vec"] == {
        "vectorIndexType": "flat", "dimensions": 4}


def test_class_dict_round_trip():
    from weaviate_spark.schema import (
        Collection, Property, collection_from_class_dict)

    coll = Collection("Article", [
        Property("title", "text", tokenization="field"),
        Property("tags", "text[]"),
        Property("views", "int", index_range_filters=True,
                 index_searchable=False),
        Property("ofCategory", "Category,Topic"),
        Property("profile", "object", nested=[
            Property("bio", "text", tokenization="whitespace")]),
        Property("thumb", "blob"),
    ], vector_dim=8, multi_tenancy=True,
       named_vectors={"title_vec": 4},
       named_vector_index_types={"title_vec": "flat"},
       vector_index_type="flat", index_null_state=False)
    back = collection_from_class_dict(coll.to_class_dict())
    assert back.name == coll.name
    assert back.vector_dim == 8 and back.multi_tenancy
    assert back.named_vectors == {"title_vec": 4}
    assert back.named_vector_index_types == {"title_vec": "flat"}
    assert back.vector_index_type == "flat"
    assert back.index_null_state is False
    for orig in coll.properties:
        got = back.property(orig.name)
        assert got.data_type == orig.data_type, orig.name
        assert got.tokenization == orig.tokenization or not (
            orig.data_type.startswith("text")
            or orig.data_type.startswith("string"))
        assert got.index_range_filters == orig.index_range_filters
        assert got.searchable() == orig.searchable()
    assert back.property("profile").nested[0].tokenization == "whitespace"
    # a single-entry ref dataType still parses as a cref
    one_ref = collection_from_class_dict({
        "class": "A", "properties": [
            {"name": "of", "dataType": ["Category"]}]})
    assert one_ref.property("of").is_reference()
    assert one_ref.property("of").pointing_to() == ["Category"]


def test_add_class_property_validation():
    """AddClassProperty chain (usecases/schema/class.go
    validateProperty + validatePropertyTokenization texts)."""
    from weaviate_spark.schema import (
        Collection, Property, add_class_property)

    coll = Collection("Article", [Property("title", "text")])
    add_class_property(coll, Property("views", "int"))
    assert coll.property("views").index_searchable is False  # coerced
    # case-insensitive duplicate
    with pytest.raises(ValueError) as ei:
        add_class_property(coll, Property("TITLE", "text"))
    assert str(ei.value) == ('class "Article": conflict for property '
                             '"TITLE": already in use or provided '
                             'multiple times')
    with pytest.raises(ValueError, match="is a reserved property name"):
        add_class_property(coll, Property("_id", "text"))
    with pytest.raises(ValueError) as ei:
        add_class_property(coll, Property(
            "n", "int", nested=[Property("x", "text")]))
    assert str(ei.value) == ("property 'n': nestedProperties not "
                             "allowed for data types other than "
                             "object/object[]")
    # tokenization legality
    with pytest.raises(ValueError) as ei:
        add_class_property(coll, Property("t2", "text",
                                          tokenization="bogus"))
    assert str(ei.value) == ("tokenization 'bogus' is not allowed for "
                             "data type 'text'")
    with pytest.raises(ValueError) as ei:
        add_class_property(coll, Property("num2", "number",
                                          tokenization="field"))
    assert str(ei.value) == ("tokenization is not allowed for data "
                             "type 'number'")
    with pytest.raises(ValueError, match="not allowed for reference"):
        add_class_property(coll, Property("ofX", "Category",
                                          tokenization="field"))
    add_class_property(coll, Property("ofX", "Category",
                                      tokenization=""))
    # env-gated CJK tokenizers: closed set reproduces the reference's
    # error; default (None) is open since the dictionaries ship
    with pytest.raises(ValueError) as ei:
        add_class_property(coll, Property("zh", "text",
                                          tokenization="gse"),
                           enabled_gates=set())
    assert str(ei.value) == ("the GSE tokenizer is not enabled; set "
                             "'ENABLE_TOKENIZER_GSE' to 'true' to "
                             "enable")
    add_class_property(coll, Property("zh", "text", tokenization="gse"))
    assert coll.property("zh").tokenization == "gse"


def test_add_class_property_default_tokenization_cleared():
    from weaviate_spark.schema import (
        Collection, Property, add_class_property)

    coll = Collection("A", [])
    add_class_property(coll, Property("ofY", "Category"))  # default tok
    assert coll.property("ofY").tokenization == ""
    add_class_property(coll, Property("obj", "object",
                                      nested=[Property("x", "text")]))
    assert coll.property("obj").tokenization == ""
