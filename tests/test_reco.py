"""Collaborative filtering (operators/reco.py) + the information-theory
profilers: hand-computed fixtures."""

import math

import pytest


def test_item_item_cosine_hand_case(spark):
    from weaviate_spark.operators.reco import item_item_cosine

    # users 1,2 both rate A and B; user 3 rates only C with A
    rows = [
        (1, "A", 2.0), (1, "B", 1.0),
        (2, "A", 1.0), (2, "B", 2.0),
        (3, "A", 1.0), (3, "C", 1.0),
    ]
    df = spark.createDataFrame(rows, "u long, i string, r double")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in item_item_cosine(df, "u", "i", "r", k=5, min_co_users=2).collect()
    }
    # cos(A,B) = (2*1 + 1*2) / (sqrt(4+1+1)*sqrt(1+4)) = 4/sqrt(30)
    expect = round(4.0 / math.sqrt(30.0), 6)
    assert got[("A", "B")]["cosine"] == expect
    assert got[("A", "B")]["n_co_users"] == 2
    assert got[("B", "A")]["cosine"] == expect
    # A-C share only one user -> pruned by min_co_users=2
    assert ("A", "C") not in got and ("C", "A") not in got


def test_recommend_items_excludes_history(spark):
    from weaviate_spark.operators.reco import item_item_cosine, recommend_items

    rows = [
        (1, "A", 1.0), (1, "B", 1.0),
        (2, "A", 1.0), (2, "B", 1.0),
        (3, "B", 1.0), (3, "C", 1.0),
        (4, "B", 1.0), (4, "C", 1.0),
        # user 5 has only A -> should be recommended B (A's neighbor),
        # never A itself
        (5, "A", 1.0),
        (6, "A", 1.0), (6, "B", 1.0),
    ]
    df = spark.createDataFrame(rows, "u long, i string, r double")
    nb = item_item_cosine(df, "u", "i", "r", k=5, min_co_users=2)
    recs = recommend_items(df, nb, "u", "i", "r", n=3).collect()
    for r in recs:
        assert r["score"] > 0
    u5 = [r for r in recs if r["u"] == 5]
    assert [r["recommended_item"] for r in u5] == ["B"]


def test_mutual_information_independent_and_dependent(spark):
    from weaviate_spark.operators.analytics import categorical_mutual_information

    # x == y exactly -> MI = H(x) = H(y), NMI = 1; z independent of x
    rows = []
    for i in range(8):
        x = "a" if i % 2 == 0 else "b"
        z = "p" if i % 4 < 2 else "q"
        rows.append((x, x, z))
    df = spark.createDataFrame(rows, "x string, y string, z string")
    got = {
        (r["col_x"], r["col_y"]): r
        for r in categorical_mutual_information(df, [("x", "y"), ("x", "z")]).collect()
    }
    ln2 = round(math.log(2.0), 6)
    assert got[("x", "y")]["mi_nats"] == ln2
    assert got[("x", "y")]["h_x"] == ln2
    assert got[("x", "y")]["nmi"] == 1.0
    assert got[("x", "z")]["mi_nats"] == 0.0
    assert got[("x", "z")]["nmi"] == 0.0


def test_js_divergence_identical_and_disjoint(spark):
    from weaviate_spark.operators.textstats import js_divergence_by_group

    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "alpha beta gamma", "same"),   # identical distribution -> 0
        (3, "delta epsilon zeta", "disj"),  # disjoint -> ln 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: r for r in js_divergence_by_group(df, "doc_id", "text", "lang", "en").collect()}
    assert got["same"]["js_nats"] == 0.0
    assert got["same"]["n_terms_shared"] == 3
    assert got["disj"]["js_nats"] == round(math.log(2.0), 6)
    assert got["disj"]["n_terms_shared"] == 0
    assert got["disj"]["n_terms_group"] == 3
    assert got["disj"]["n_terms_base"] == 3
