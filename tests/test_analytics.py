"""Cohort retention, as-of join, and percentile aggregator semantics."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from weaviate_spark.operators.analytics import asof_join, retention_cohorts


def _ts(day, hour=0, minute=0):
    return datetime.datetime(2024, 1, day, hour, minute)


def test_asof_backward_match_and_ties(spark):
    """<= semantics: a right row at exactly the left timestamp matches;
    among equal-ts right rows the greatest tiebreak wins."""
    left = spark.createDataFrame(
        [(1, "u", _ts(2)), (2, "u", _ts(5)), (3, "u", _ts(1))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "u", _ts(2)), (11, "u", _ts(2)), (12, "u", _ts(4))],
        "rid long, k string, ts timestamp",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    right_cols=["rid"], right_tiebreak="rid")
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: 11, 2: 12, 3: None}  # equal-ts tie -> rid 11


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(7, "u", _ts(1))], "rid long, k string, ts timestamp")
    wide = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                     right_cols=["rid"])
    assert wide.collect()[0]["asof_rid"] == 7
    tight = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                      right_cols=["rid"], tolerance_seconds=3600.0)
    row = tight.collect()[0]
    assert row["asof_rid"] is None and row["asof_ts"] is None


def test_asof_keys_do_not_leak(spark):
    """A right row on another key never matches."""
    left = spark.createDataFrame(
        [(1, "a", _ts(5))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(9, "b", _ts(1))], "rid long, k string, ts timestamp")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    right_cols=["rid"])
    assert out.collect()[0]["asof_rid"] is None


def test_retention_cohort_shape(spark):
    # two cohorts: users 1,2 first seen week of Jan 1; user 3 week of Jan 8
    rows = [
        (1, _ts(2)), (2, _ts(3)), (3, _ts(9)),
        (1, _ts(10)),            # user 1 active in week 1
        (2, _ts(16)), (3, _ts(16)),  # week 2 for cohort A, week 1 for B
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort_start"].day, r["periods_since"]): (r["n_active"], r["retention"])
           for r in retention_cohorts(ev).collect()}
    assert out[(1, 0)] == (2, 1.0)
    assert out[(1, 1)] == (1, 0.5)
    assert out[(1, 2)] == (1, 0.5)
    assert out[(8, 0)] == (1, 1.0)
    assert out[(8, 1)] == (1, 1.0)


def test_retention_unit_validation(spark):
    ev = spark.createDataFrame([(1, _ts(1))], "user_id long, ts timestamp")
    with pytest.raises(ValueError, match="cohort unit"):
        retention_cohorts(ev, unit="fortnight")


def test_percentile_aggregator_vs_numpy(spark, sf_dir):
    from weaviate_spark.operators.aggregate import (
        AggregateSpec, PropertyAgg, aggregate)

    out = aggregate(spark, sf_dir, AggregateSpec(
        collection="lineitem",
        properties=[PropertyAgg("l_quantity", ["p25", "p95"])],
    )).collect()[0]
    vals = np.array([
        r["l_quantity"] for r in
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity").collect()
    ])
    assert out["l_quantity_p25"] == pytest.approx(
        np.percentile(vals, 25, method="linear"), abs=1e-9)
    assert out["l_quantity_p95"] == pytest.approx(
        np.percentile(vals, 95, method="linear"), abs=1e-9)


def test_percentile_rejects_bad_name(spark, sf_dir):
    from weaviate_spark.operators.aggregate import (
        AggregateSpec, PropertyAgg, aggregate)

    with pytest.raises(ValueError, match="unknown aggregator"):
        aggregate(spark, sf_dir, AggregateSpec(
            collection="lineitem",
            properties=[PropertyAgg("l_quantity", ["p200"])],
        )).collect()


# ---------------------------------------------------------------------------
# HTML extraction


def _extract(spark, html, **kw):
    from weaviate_spark.operators.curation import extract_html_text

    df = spark.createDataFrame([(1, html)], "id long, html string")
    return extract_html_text(df, "html", **kw).collect()[0]


def test_html_blocks_do_not_leak(spark):
    row = _extract(spark, (
        '<SCRIPT type="text/javascript">secret()</SCRIPT>'
        "<Style>body{}</Style><!-- note --><p>kept line with words</p>"
    ))
    assert row["extracted"] == "kept line with words"
    assert row["extracted_lines"] == 1


def test_html_entity_decode_order(spark):
    # double-encoded &amp;lt; decodes exactly one level -> &lt;
    row = _extract(spark, "<p>a &amp;lt; b stays literal here</p>")
    assert "&lt;" in row["extracted"]
    row2 = _extract(spark, "<p>x &lt; y &amp; z &quot;q&quot; ok</p>")
    assert row2["extracted"] == 'x < y & z "q" ok'


def test_html_short_line_boilerplate_drops(spark):
    row = _extract(spark, (
        "<div>Home</div><div>About us</div>"
        "<p>this line has enough words to keep</p>"
    ))
    assert row["extracted"] == "this line has enough words to keep"
    keep_all = _extract(spark, "<div>Home</div><p>one two three</p>",
                        min_line_words=1)
    assert keep_all["extracted_lines"] == 2


def test_html_inline_tags_do_not_split_lines(spark):
    row = _extract(spark, "<p>a <b>bold</b> and <i>italic</i> run</p>")
    assert row["extracted"] == "a bold and italic run"
    assert row["extracted_lines"] == 1
