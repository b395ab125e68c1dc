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


# ---------------------------------------------------------------------------
# PageRank (operators/graph.py)


def test_pagerank_matches_numpy_power_iteration(spark):
    """Weighted graph with a dangling node and parallel edges, pinned
    against an independent dense numpy power iteration."""
    from weaviate_spark.operators.graph import pagerank

    # nodes 0..3; node 3 is dangling; (0,1) appears twice -> weight 2
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 1.0), (0, 2, 2.0), (1, 2, 1.0),
         (2, 0, 1.0), (2, 3, 3.0)],
        "src long, dst long, w double",
    )
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(edges, "src", "dst", "w", iterations=10).collect()
    }

    n, d = 4, 0.85
    p = np.zeros((n, n))
    p[0, 1] = 2 / 4
    p[0, 2] = 2 / 4
    p[1, 2] = 1.0
    p[2, 0] = 1 / 4
    p[2, 3] = 3 / 4
    r = np.full(n, 1 / n)
    for _ in range(10):
        dangling = r[3]  # node 3 has no out-edges
        r = (1 - d) / n + d * (r @ p + dangling / n)
    for i in range(n):
        assert got[i] == pytest.approx(r[i], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle is rank-uniform at every iteration count."""
    from weaviate_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = [r["pagerank"] for r in pagerank(edges, iterations=3).collect()]
    assert got == pytest.approx([1 / 3] * 3, rel=1e-12)


def test_funnel_ordering_is_strict(spark):
    """A click BEFORE the user's first view must not count toward the
    click stage."""
    from weaviate_spark.operators.analytics import funnel_conversion

    ev = spark.createDataFrame(
        [
            ("u1", "view", _ts(1)), ("u1", "click", _ts(2)),
            ("u1", "purchase", _ts(3)),
            # u2 clicked before viewing: stops at the view stage
            ("u2", "click", _ts(1)), ("u2", "view", _ts(2)),
            # u3 never viewed
            ("u3", "click", _ts(1)), ("u3", "purchase", _ts(2)),
        ],
        "user_id string, event_type string, ts timestamp",
    )
    out = {
        r["stage"]: (r["n_users"], r["conversion"])
        for r in funnel_conversion(ev, ["view", "click", "purchase"]).collect()
    }
    assert out["all"] == (3, 1.0)
    assert out["view"] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert out["click"] == (1, 0.5)
    assert out["purchase"] == (1, 1.0)


def test_daily_zscores_null_until_history(spark):
    """z is NULL until 3 days of trailing history and when variance is 0."""
    from weaviate_spark.operators.analytics import daily_count_zscores

    rows = []
    # 5 days of stable counts then a spike: 2,2,2,2,10
    counts = [2, 2, 2, 2, 10]
    for day, c in enumerate(counts, start=1):
        for i in range(c):
            rows.append(("e1", "x", _ts(day, hour=i)))
    ev = spark.createDataFrame(
        rows, "event_type string, user string, ts timestamp")
    out = {r["day"].day: r["z"] for r in daily_count_zscores(ev).collect()}
    assert out[1] is None and out[2] is None and out[3] is None
    assert out[4] is None  # 3 days history but stddev == 0
    assert out[5] is None or out[5] > 0  # spike day: 4 identical -> sd 0?
    # trailing window for day 5 is [2,2,2,2] -> sd 0 -> NULL
    assert out[5] is None
