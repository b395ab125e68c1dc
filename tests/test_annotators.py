"""Result annotator module dummies (modules.py QNAS / SUMMARIZERS /
NERS / SPELLCHECKERS) — semantic pins on crafted rows, complementing the
oracle-checked contract queries (qna_extractive_answer, sum_top_tokens,
ner_token_entities, spellcheck_corrected_search)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _one(spark, text):
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_qna_picks_best_window_and_positions(spark):
    from weaviate_spark.modules import QNAS

    # 25 tokens -> 3 windows of 10/10/5; the middle window holds both
    # question tokens
    text = " ".join(
        ["pad"] * 10 + ["alpha"] + ["pad"] * 3 + ["beta"] + ["pad"] * 10
    )
    row = (
        _one(spark, text)
        .withColumn("_a", QNAS["qna-dummy"](F.col("text"), "alpha beta"))
        .select("_a.*")
        .collect()[0]
    )
    assert row["has_answer"] is True
    assert row["start_token"] == 10 and row["end_token"] == 20
    assert "alpha" in row["answer"] and "beta" in row["answer"]
    assert row["certainty"] == 1.0


def test_qna_no_overlap_first_window_tie(spark):
    from weaviate_spark.modules import QNAS

    row = (
        _one(spark, "x y z " * 8)
        .withColumn("_a", QNAS["qna-dummy"](F.col("text"), "missing words"))
        .select("_a.*")
        .collect()[0]
    )
    # all windows score 0 -> earliest wins
    assert row["has_answer"] is False and row["start_token"] == 0
    assert row["certainty"] == 0.0


def test_sum_frequency_then_token_order(spark):
    from weaviate_spark.modules import SUMMARIZERS

    # freq: zz x3, mm x2, aa/bb/cc/dd x1; stopword 'the' excluded
    text = "zz zz zz mm mm the the the aa bb cc dd"
    out = (
        _one(spark, text)
        .select(SUMMARIZERS["sum-dummy"](F.col("text")).alias("s"))
        .collect()[0]["s"]
    )
    assert out == "zz mm aa bb cc"


def test_ner_gazetteer_rows(spark):
    from weaviate_spark.modules import ner_dummy

    df = _one(spark, "fast spark query on spark table")
    rows = {
        r["word"]: r
        for r in ner_dummy(df, "doc_id", "text").collect()
    }
    assert set(rows) == {"spark", "query", "table"}
    assert rows["spark"]["entity"] == "TECH"
    assert rows["spark"]["start_token"] == 1  # first occurrence only
    assert rows["table"]["entity"] == "DB"
    assert rows["query"]["certainty"] == 0.9


def test_spellcheck_corrects_and_counts(spark):
    from weaviate_spark.modules import SPELLCHECKERS

    sc = SPELLCHECKERS["text-spellcheck-dummy"]("tabel qurey fine scann")
    assert sc["corrected_text"] == "table query fine scan"
    assert sc["changes"] == 3
    assert sc["did_you_mean"] == "table query fine scan"
    clean = SPELLCHECKERS["text-spellcheck-dummy"]("all good here")
    assert clean["changes"] == 0 and clean["did_you_mean"] is None
