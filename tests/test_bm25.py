"""M4: tokenizers + BM25F semantics (FIXTURES.md §A3 micro-corpus)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from weaviate_spark.functions.text import EN_STOPWORDS, remove_stopwords, tokenize, tokenize_py


@pytest.mark.parametrize(
    "mode,text,want",
    [
        ("word", "Hello, World-42!", ["hello", "world", "42"]),
        ("lowercase", "Hello  World-42!", ["hello", "world-42!"]),
        ("whitespace", "Hello  World", ["Hello", "World"]),
        ("field", "  Hello World ", ["Hello World"]),
        ("trigram", "Spark", ["spa", "par", "ark"]),
    ],
)
def test_tokenize_modes(spark, mode, text, want):
    df = spark.createDataFrame([(text,)], ["t"])
    got = df.select(tokenize(F.col("t"), mode).alias("toks")).collect()[0]["toks"]
    assert got == want
    assert tokenize_py(text, mode) == want  # driver-side mirrors JVM-side


def test_stopword_removal(spark):
    df = spark.createDataFrame([("the quick fox",)], ["t"])
    got = df.select(
        remove_stopwords(tokenize(F.col("t"))).alias("toks")
    ).collect()[0]["toks"]
    assert "the" not in got and "quick" in got


def test_bm25f_hand_computed(spark, tmp_path):
    """3-doc corpus, hand-computed BM25 score for a 1-term query."""
    from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, bm25_score_df

    rows = [
        (1, "apple banana apple"),   # len 3, freq(apple)=2
        (2, "apple cherry"),         # len 2, freq(apple)=1
        (3, "banana cherry date"),   # len 3, freq=0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spec = BM25Spec(
        collection="x", query="apple", properties=[BM25Prop("text")],
        id_col="doc_id", round_digits=None,
    )
    out = {r["doc_id"]: r["_score"] for r in bm25_score_df(df, spec).collect()}
    N, n = 3, 2
    idf = math.log(1 + (N - n + 0.5) / (n + 0.5))
    avgdl = (3 + 2 + 3) / 3
    k1, b = 1.2, 0.75

    def tf(freq, dl):
        return freq / (freq + k1 * (1 - b + b * dl / avgdl))

    assert out[1] == pytest.approx(tf(2, 3) * idf)
    assert out[2] == pytest.approx(tf(1, 2) * idf)
    assert 3 not in out


def test_bm25f_multi_prop_boost(spark):
    """title^2 + body: contribution = tf*idf*boost summed over props;
    avgdl = mean of per-prop means (bm25_searcher.go:408-446)."""
    from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, bm25_score_df

    rows = [
        (1, "apple", "banana fruit"),
        (2, "banana", "apple apple pie"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "title", "body"])
    spec = BM25Spec(
        collection="x", query="apple",
        properties=[BM25Prop("title", boost=2.0), BM25Prop("body")],
        id_col="doc_id", round_digits=None,
    )
    out = {r["doc_id"]: r["_score"] for r in bm25_score_df(df, spec).collect()}
    k1, b = 1.2, 0.75
    avgdl = (1.0 + 2.5) / 2  # mean of per-prop mean lengths
    idf_title = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))  # n=1 in title
    idf_body = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))   # n=1 in body

    def tf(freq, dl):
        return freq / (freq + k1 * (1 - b + b * dl / avgdl))

    assert out[1] == pytest.approx(tf(1, 1) * idf_title * 2.0)
    assert out[2] == pytest.approx(tf(2, 3) * idf_body * 1.0)


def test_bm25_duplicate_term_boost(spark):
    """Duplicate query terms multiply frequency (terms.go:59)."""
    from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, bm25_score_df

    df = spark.createDataFrame([(1, "apple pie"), (2, "cherry pie")], ["doc_id", "text"])
    single = bm25_score_df(df, BM25Spec(
        collection="x", query="apple", properties=[BM25Prop("text")],
        id_col="doc_id", round_digits=None,
    )).collect()
    double = bm25_score_df(df, BM25Spec(
        collection="x", query="apple apple", properties=[BM25Prop("text")],
        id_col="doc_id", round_digits=None,
    )).collect()
    s1 = {r["doc_id"]: r["_score"] for r in single}[1]
    s2 = {r["doc_id"]: r["_score"] for r in double}[1]
    assert s2 > s1  # boosted frequency saturates higher


def test_stats_tables_match_recompute(spark, tmp_path):
    """The materialized-stats path (build_bm25_stats + load_stats) must
    score identically to the per-query recompute path — including with a
    where-filter, where stats stay collection-wide but only candidates
    are scored (bm25_searcher.go:235-239, :885-893)."""
    from weaviate_spark.operators.bm25 import (
        BM25Prop,
        BM25Spec,
        bm25_score_df,
        build_bm25_stats,
        load_stats,
    )

    rows = [
        (1, "apple banana apple", "a"),
        (2, "apple cherry", "b"),
        (3, "banana cherry date apple", "a"),
        (4, "cherry date elder", "b"),
        (5, "apple apple apple banana", "a"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "grp"])
    props = [BM25Prop("text")]
    spec = BM25Spec(
        collection="x", query="apple banana", properties=props,
        id_col="doc_id", round_digits=None,
    )
    cs, tdf = build_bm25_stats(df, props, "doc_id")
    stats = load_stats(cs, tdf, {"text": ["apple", "banana"]})

    for cand in (df, df.where(F.col("grp") == "a")):
        recompute = {
            r["doc_id"]: r["_score"]
            for r in bm25_score_df(cand, spec, corpus_df=df).collect()
        }
        fed = {
            r["doc_id"]: r["_score"]
            for r in bm25_score_df(
                cand, BM25Spec(**{**spec.__dict__, "stats": stats}), corpus_df=df
            ).collect()
        }
        assert set(fed) == set(recompute)
        for k in fed:
            assert fed[k] == pytest.approx(recompute[k], abs=1e-12)


def test_postings_path_scores_identical(spark, sf_dir):
    """The inverted-index (postings/doclen) scoring path must produce
    byte-identical scores to the tokenize-the-corpus path."""
    from dataclasses import replace
    from pyspark.sql import functions as F
    from weaviate_spark.operators.bm25 import (
        BM25Prop, BM25Spec, bm25_score_df, with_materialized_stats,
    )
    from weaviate_spark.sources.tables import load_table

    spec = BM25Spec(
        collection="documents", query="spark filter join data",
        properties=[BM25Prop("text")], id_col="doc_id",
    )
    full = load_table(spark, sf_dir, "documents")
    sp = with_materialized_stats(spec, full, (sf_dir, "documents"))
    assert sp.stats.postings is not None

    def rows(s):
        return sorted(
            (r["doc_id"], r["_score"], r["_terms_matched"])
            for r in bm25_score_df(full, s, corpus_df=full).collect()
        )

    with_postings = rows(sp)
    without = rows(replace(sp, stats=replace(sp.stats, postings=None, doclen=None)))
    assert with_postings == without and len(with_postings) > 0


def test_hybrid_degenerate_alphas(spark, sf_dir):
    """alpha=0 reduces to pure keyword ranking, alpha=1 to pure vector
    ranking (hybrid weights (1-alpha, alpha)); zero-weight legs may
    introduce zero-scored rows but never displace positive scores."""
    from weaviate_spark.operators.bm25 import BM25Prop, BM25Spec, bm25_search
    from weaviate_spark.operators.hybrid import HybridSpec, hybrid_search
    from weaviate_spark.operators.vector import NearVectorSpec, near_vector
    from weaviate_spark.entry_queries import QVEC

    def hybrid_ids(alpha):
        return [r["doc_id"] for r in hybrid_search(spark, sf_dir, HybridSpec(
            collection="docs_embedded", query="spark filter join", vector=QVEC,
            properties=[BM25Prop("text")], id_col="doc_id",
            alpha=alpha, fusion="relativeScore", limit=10,
        )).collect()]

    kw = [r["doc_id"] for r in bm25_search(spark, sf_dir, BM25Spec(
        collection="docs_embedded", query="spark filter join",
        properties=[BM25Prop("text")], id_col="doc_id", limit=10,
    )).collect()]
    vec = [r["doc_id"] for r in near_vector(spark, sf_dir, NearVectorSpec(
        collection="docs_embedded", vector=QVEC, vector_col="embedding",
        id_col="doc_id", limit=10,
    )).collect()]
    assert hybrid_ids(0.0) == kw
    assert hybrid_ids(1.0) == vec


def test_written_stats_tables_prune_and_skip_tokenize(spark, sf_dir):
    """The written inverted-index artifact: postings live on disk
    partitioned by term hash-bucket, a query's lookup partition-prunes
    to its terms' buckets, and the scoring plan tokenizes NO document
    (VERDICT r05 ask #6)."""
    import os

    from weaviate_spark.operators import bm25 as bm25_mod
    from weaviate_spark.operators.bm25 import (
        BM25_ARTIFACT_ROOT, BM25Prop, BM25Spec, bm25_search, invalidate_stats,
    )

    import shutil

    invalidate_stats()
    shutil.rmtree(BM25_ARTIFACT_ROOT, ignore_errors=True)
    # disable the local memory cache so the executed plan shows the
    # 100-TB shape: file-backed scans with term-bucket partition pruning
    bm25_mod.CACHE_INDEX_TABLES = False
    try:
        assert not os.path.exists(BM25_ARTIFACT_ROOT)
        spec = BM25Spec(
            collection="documents", query="spark filter join",
            properties=[BM25Prop("text")], id_col="doc_id", limit=20,
        )
        out = bm25_search(spark, sf_dir, spec)
        rows = out.collect()
        assert rows
        # artifact written: postings partitioned by _tb, doclen by prop
        roots = []
        for dirpath, dirnames, _ in os.walk(BM25_ARTIFACT_ROOT):
            if "postings" in dirnames:
                roots.append(dirpath)
        assert roots, "postings artifact not written"
        tb_dirs = [d for d in os.listdir(os.path.join(roots[0], "postings")) if d.startswith("_tb=")]
        assert tb_dirs, "postings not partitioned by term bucket"

        plan = out._jdf.queryExecution().executedPlan().toString()
        # partition pruning on the term bucket reaches the postings scan
        assert "PartitionFilters: [" in plan and "_tb" in plan, plan
        # and no document tokenization appears anywhere in the query plan
        # (the corpus-recompute path would show the regexp split + explode)
        assert "explode" not in plan.lower(), plan

        # the same query in a way that skips the session memo still reads
        # the written tables (no rebuild: artifact commit marker unchanged)
        marker = None
        for dirpath, _, filenames in os.walk(BM25_ARTIFACT_ROOT):
            for f in filenames:
                if f == "_ALL_TABLES_COMMITTED":
                    marker = os.path.join(dirpath, f)
        assert marker is not None
        mtime = os.path.getmtime(marker)
        bm25_search(spark, sf_dir, spec).collect()
        assert os.path.getmtime(marker) == mtime
    finally:
        bm25_mod.CACHE_INDEX_TABLES = True
        invalidate_stats()


def test_incremental_bm25_artifact_advance(spark, tmp_path):
    """advance_bm25_artifacts: appending a batch advances the WRITTEN
    inverted-index artifact in place (segment appends + delta stat rows
    + O(1) fingerprint re-root) — scores over the grown corpus equal
    the from-scratch recompute path, and the original build is never
    re-run (commit marker survives the rename untouched)."""
    import os

    from weaviate_spark.operators import bm25 as bm25_mod
    from weaviate_spark.operators.bm25 import (
        BM25Prop, BM25Spec, advance_bm25_artifacts, bm25_search,
        invalidate_stats,
    )

    invalidate_stats()
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [(1, "spark filter join engine"), (2, "filter pushdown scan"),
         (3, "entirely different topic words")],
        "doc_id long, text string",
    ).write.parquet(f"{sf}/docs.parquet")

    spec = BM25Spec(
        collection="docs", query="spark filter join",
        properties=[BM25Prop("text")], id_col="doc_id", limit=20,
    )
    bm25_search(spark, sf, spec).collect()  # builds + writes the artifact

    import re

    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf.strip("/"))
    marker = None
    for dirpath, _, filenames in os.walk(bm25_mod.BM25_ARTIFACT_ROOT):
        for f in filenames:
            if f == "_ALL_TABLES_COMMITTED" and tag in dirpath:
                marker = os.path.join(dirpath, f)
    assert marker is not None
    # sentinel: survives the advance's rename+append; a full rebuild
    # would recreate the artifact dir without it
    sentinel_name = "_SENTINEL_NOT_REBUILT"
    open(os.path.join(os.path.dirname(marker), sentinel_name), "w").close()

    # append a batch: one doc extends the "spark filter" cluster, one is
    # background — df/avgdl/N all shift
    batch = spark.createDataFrame(
        [(4, "spark join strategies and filter order"),
         (5, "unrelated background noise")],
        "doc_id long, text string",
    )
    fp_before = bm25_mod._source_fingerprint(sf, "docs")
    batch.write.mode("append").parquet(f"{sf}/docs.parquet")
    advance_bm25_artifacts(batch, sf, "docs", fp_before)

    got = [(r["doc_id"], r["_score"])
           for r in bm25_search(spark, sf, spec).collect()]
    want = [(r["doc_id"], r["_score"])
            for r in bm25_search(spark, sf, spec,
                                 use_stats_tables=False).collect()]
    assert got == want and {d for d, _ in got} >= {1, 4}

    # the artifact advanced by rename + append — the sentinel written
    # after the original build survived (a rebuild would have recreated
    # the dir without it), and exactly one committed artifact exists
    found = []
    for dirpath, _, filenames in os.walk(bm25_mod.BM25_ARTIFACT_ROOT):
        if tag in dirpath and "_ALL_TABLES_COMMITTED" in filenames:
            found.append((dirpath, sentinel_name in filenames))
    assert found == [(found[0][0], True)]
    invalidate_stats()


def test_bm25_artifact_compaction(spark, tmp_path):
    """compact_bm25_artifacts merges append deltas into single-segment
    form: one stat row per key afterwards, identical scores before and
    after (LSM-compaction value-identity)."""
    import os

    from weaviate_spark.operators import bm25 as bm25_mod
    from weaviate_spark.operators.bm25 import (
        BM25Prop, BM25Spec, advance_bm25_artifacts, bm25_search,
        compact_bm25_artifacts, invalidate_stats,
    )

    invalidate_stats()
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [(1, "spark filter join engine"), (2, "filter pushdown scan")],
        "doc_id long, text string",
    ).write.parquet(f"{sf}/docs.parquet")
    spec = BM25Spec(
        collection="docs", query="spark filter", limit=20,
        properties=[BM25Prop("text")], id_col="doc_id",
    )
    bm25_search(spark, sf, spec).collect()

    # two appended batches -> three delta generations in the stat tables
    for off, txt in ((3, "spark join order"), (4, "filter scan plans today")):
        batch = spark.createDataFrame([(off, txt)], "doc_id long, text string")
        fp = bm25_mod._source_fingerprint(sf, "docs")
        batch.write.mode("append").parquet(f"{sf}/docs.parquet")
        advance_bm25_artifacts(batch, sf, "docs", fp)

    before = [(r["doc_id"], r["_score"])
              for r in bm25_search(spark, sf, spec).collect()]
    assert compact_bm25_artifacts(spark, sf, "docs") == 1
    after = [(r["doc_id"], r["_score"])
             for r in bm25_search(spark, sf, spec).collect()]
    assert before == after

    # stat tables are single-generation again: one row per key
    import glob
    import re

    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf.strip("/"))
    ours = [r for r in glob.glob(
        f"{bm25_mod.BM25_ARTIFACT_ROOT}/**/term_df", recursive=True
    ) if tag in r]
    assert len(ours) == 1
    tdf = spark.read.parquet(ours[0]).toPandas()
    assert not tdf.duplicated(subset=["prop", "term"]).any()
    invalidate_stats()
