"""Gopher §A1.1 quality rules (Rae et al. 2021) and C4 §2.2 page
cleaning (Raffel et al. 2019) — per-rule pins on handcrafted docs."""

from __future__ import annotations

import pytest

from weaviate_spark.operators.curation import c4_page_filter
from weaviate_spark.operators.textstats import gopher_quality_rules

GOOD = ("The quick brown fox jumps over the lazy dog and runs to be "
        "free of that fence with great joy today. ") * 5  # 105 words


def _gopher(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, text string")
    out = gopher_quality_rules(df, "id", "text", **kw)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_gopher_good_doc_keeps(spark):
    r = _gopher(spark, [(1, GOOD)])[1]
    assert r["keep"] and all(
        r[k] for k in r if k.startswith("r_"))
    assert r["word_count"] == 105
    assert r["stopword_hits"] >= 2


def test_gopher_word_count_bounds(spark):
    rows = [(1, "short doc only"), (2, GOOD)]
    r = _gopher(spark, rows)
    assert not r[1]["r_word_count"] and r[2]["r_word_count"]
    # the bound is a knob
    r = _gopher(spark, rows, min_words=2)
    assert r[1]["r_word_count"]


def test_gopher_mean_word_len(spark):
    r = _gopher(spark, [(1, "a b c d " * 20), (2, GOOD)])
    assert not r[1]["r_mean_word_len"]  # mean length 1 < 3
    assert r[1]["mean_word_len"] == 1.0
    assert r[2]["r_mean_word_len"]


def test_gopher_symbol_ratio(spark):
    text = "word " * 10 + "# # # "  # 3 hashes / 13 words > 0.1
    r = _gopher(spark, [(1, text)], min_words=1)
    assert not r[1]["r_symbol_ratio"]
    # '...' counts via non-overlapping triple match
    r2 = _gopher(spark, [(1, "ok doc ... fine " * 10)], min_words=1)
    assert r2[1]["symbol_ratio"] == pytest.approx(10 / 40)


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join("- item %d" % i for i in range(10))
    r = _gopher(spark, [(1, bullets)], min_words=1)
    assert r[1]["bullet_line_ratio"] == 1.0 and not r[1]["r_bullet_lines"]
    ell = "\n".join(["to be continued..."] * 4 + ["a closing line"])
    r2 = _gopher(spark, [(1, ell)], min_words=1)
    assert r2[1]["ellipsis_line_ratio"] == pytest.approx(0.8)
    assert not r2[1]["r_ellipsis_lines"]


def test_gopher_alpha_and_stopwords(spark):
    nums = " ".join(str(i) for i in range(60))
    r = _gopher(spark, [(1, nums)])
    assert r[1]["alpha_word_ratio"] == 0.0 and not r[1]["r_alpha_words"]
    assert r[1]["stopword_hits"] == 0 and not r[1]["r_stopwords"]
    # distinct PRESENCE, not token frequency: 'the the the' = 1 hit
    r2 = _gopher(spark, [(1, "the the the")], min_words=1)
    assert r2[1]["stopword_hits"] == 1


def test_gopher_empty_doc(spark):
    r = _gopher(spark, [(1, "")])
    assert r[1]["word_count"] == 0 and not r[1]["keep"]
    # no lines to offend → line-shape rules pass
    assert r[1]["r_bullet_lines"] and r[1]["r_ellipsis_lines"]


def _c4(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, text string")
    out = c4_page_filter(df, "id", "text", **kw)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_c4_line_retention(spark):
    text = ("This is a proper first sentence.\n"
            "too short.\n"                      # < 5 words
            "this line has no terminal punctuation at all\n"
            "Another good sentence follows right here!\n"
            "And a third one ends with a question mark?")
    r = _c4(spark, [(1, text)])[1]
    assert r["n_lines"] == 5 and r["n_kept_lines"] == 3
    assert r["n_sentences"] == 3
    assert r["keep"]
    assert "too short." not in r["retained_text"]


def test_c4_page_level_drops(spark):
    base = ("One full sentence right here today.\n"
            "Two full sentences right here today.\n"
            "Three full sentences right here today.\n")
    r = _c4(spark, [
        (1, base),
        (2, base + "Some lorem ipsum filler text sits here.\n"),
        (3, base + "A line with code = {brace} in it today.\n"),
        (4, "Only two sentences here now.\nAnd the second one is this.\n"),
    ])
    assert r[1]["keep"]
    assert not r[2]["keep"] and not r[2]["r_no_lorem_ipsum"]
    assert not r[3]["keep"] and not r[3]["r_no_braces"]
    assert not r[4]["keep"] and not r[4]["r_min_sentences"]
    assert r[4]["n_sentences"] == 2


def test_c4_empty_and_thresholds(spark):
    r = _c4(spark, [(1, "")])
    assert r[1]["n_kept_lines"] == 0 and r[1]["retained_text"] == ""
    assert not r[1]["keep"]
    r2 = _c4(spark, [(1, "Short ok line is here.")],
             min_line_words=5, min_sentences=1)
    assert r2[1]["keep"] and r2[1]["n_kept_lines"] == 1
