"""Stream-stream interval join (purchase_attribution_join): streaming
replay must equal the batch run (unified model), and the streaming plan
must carry watermarks on BOTH sides so join state is bounded."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    from weaviate_spark.sources.tables import load_table
    from weaviate_spark.streaming.ingest import purchase_attribution_join

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r["purchase_id"], r["click_id"], r["lag_sec"])
        for r in purchase_attribution_join(
            events.where(F.col("event_type") == "purchase"),
            events.where(F.col("event_type") == "click"),
            window_minutes=240,
        ).collect()
    }
    assert batch  # non-trivial at sf0.001 too

    src = str(tmp_path / "ev_src")
    events.write.parquet(src)
    p_stream = (
        spark.readStream.schema(events.schema).parquet(src)
        .where(F.col("event_type") == "purchase")
    )
    c_stream = (
        spark.readStream.schema(events.schema).parquet(src)
        .where(F.col("event_type") == "click")
    )
    joined = purchase_attribution_join(p_stream, c_stream, window_minutes=240)
    assert joined.isStreaming
    q = (
        joined.writeStream.outputMode("append")
        .format("memory").queryName("attrib")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["purchase_id"], r["click_id"], r["lag_sec"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert streamed == batch


def test_stream_stream_join_state_is_bounded(spark, sf_dir, tmp_path):
    """The analyzed streaming plan must show event-time watermarks on
    both inputs — the precondition for Spark to expire join state via
    the range predicate instead of buffering both streams forever."""
    from weaviate_spark.sources.tables import load_table
    from weaviate_spark.streaming.ingest import purchase_attribution_join

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src2")
    events.write.parquet(src)
    mk = lambda t: (  # noqa: E731
        spark.readStream.schema(events.schema).parquet(src)
        .where(F.col("event_type") == t)
    )
    joined = purchase_attribution_join(mk("purchase"), mk("click"))
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2, plan
