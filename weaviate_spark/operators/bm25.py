"""BM25 / BM25F keyword search (SURVEY §2.5).

Semantics from the reference (adapters/repos/db/inverted/bm25_searcher.go,
terms/terms.go):

* idf(term)  = ln(1 + (N - n + 0.5)/(n + 0.5)), N clamped to >= n
  (terms/terms.go:64-72 Idf). N is the COLLECTION-WIDE object count
  (bm25_searcher.go:235-239 objectsBucket.CountApproximate — NOT the
  count of docs holding the property, and NOT post-filter), and n is the
  term's document frequency over the UNFILTERED corpus (:885-893 — the
  inverted index row length, which includes filter-excluded docs).
  A where-filter restricts only the candidate set being scored.
* tf(doc,prop) = freq / (freq + k1*(1 - b + b*propLen/avgPropLen))
  (terms/terms.go:242-249 Score), defaults k1=1.2 b=0.75
  (usecases/config/config_handler.go:57-58).
* per-term-per-property contribution = tf * idf * propertyBoost;
  a document's score is the sum over query terms and searched
  properties (BM25F additive form).
* avgPropLen is the mean of the per-property mean lengths across all
  searched properties (bm25_searcher.go:408-446) — NOT per-property.
* query analysis = fold -> tokenize -> drop stopwords
  (analyze.go:216-242 AnalyzeAndCountDuplicates); duplicate query terms
  boost frequency (terms.go:59 freq*boost). INDEXED tokens keep
  stopwords (analyzer.go:178-180), so doc lengths and term frequencies
  include them — only the query side drops them.
* searchOperator Or (default) / And, And = doc must match every query
  term in at least one property; minimumOrTokensMatch = Or with a
  floor on distinct matched terms (base_search.proto:48-58).
* top-k ties: score desc, then `_id` asc (sortby_scores.go / §4.3).

Execution strategy (batch, WAND-free): the reference's WAND/BlockMax
pruning exists to avoid scoring every doc on a serving path; a batch
engine scores the full candidate set — same results by construction
(SURVEY §4.1). The plan:

    tokens   = explode(tokenize(prop))          -- narrow
    wide     = groupBy(id).agg(len, f_t ...)    -- ONE shuffle on id
    stats    = N, avgdl, df_t — from the PRECOMPUTED stats tables when
               given (the prop_length_tracker/inverted-statistics
               analogue; build_bm25_stats), else one tiny agg over wide
    score    = per-row expression over wide     -- narrow
    topk     = orderBy(score desc, id asc).limit(k)  -- TakeOrdered

Scale notes: with the materialized index tables (build_bm25_index,
refreshed on ingest like the reference's prop length tracker + LSM
inverted segments), a keyword query tokenizes NOTHING — term
frequencies come from a term-filtered postings lookup (partition/
bucket by term at scale => the scan reads only the query terms' rows)
and lengths from the doclen table; a where-filter semi-joins the
candidate ids. Locally the postings frame is a cached DataFrame.
Without the tables, the one wide aggregation over the corpus serves
both stats and scoring (cached, released on the next query via
release_caches).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weaviate_spark.filters import Clause, apply_where
from weaviate_spark.functions.text import (
    StopwordConfig,
    sql_tokens,
    tokenize,
    tokenize_for_class,
    tokenize_py,
)
from weaviate_spark.sources.tables import load_table

K1_DEFAULT = 1.2
B_DEFAULT = 0.75
AVGDL_FALLBACK = 40.0  # bm25_searcher.go:452-453

# per-query scratch caches live in weaviate_spark.cache (released at every
# top-level query entry); re-exported here for backward compatibility
from weaviate_spark.cache import local_df, ensure_min_partitions, register_cache, release_caches, session_key  # noqa: E402,F401


@dataclass
class BM25Prop:
    name: str
    boost: float = 1.0          # "prop^2" syntax in the API
    tokenization: str = "word"


@dataclass(frozen=True)
class CorpusStats:
    """Materialized corpus statistics — the Spark analogue of the
    reference's propLengthTracker + inverted-index term statistics.

    When `postings`/`doclen` are attached (the full inverted-index
    analogue), query-time scoring never tokenizes ANY document: term
    frequencies come from a term-filtered postings lookup and document
    lengths from the doclen table — the same work the reference's
    keyword search does against its LSM inverted segments. At scale
    these are written tables partitioned/bucketed by term, so a query
    reads only its own terms' row groups."""

    n_docs: float                               # collection-wide object count
    avg_len: dict[str, float]                   # prop -> mean token count
    term_n: dict[tuple[str, str], float]        # (prop, term) -> doc freq
    postings: Optional[DataFrame] = None        # (prop, _doc, _term, _f)
    doclen: Optional[DataFrame] = None          # (prop, _doc, _len)


@dataclass
class BM25Spec:
    collection: str
    query: str
    properties: Sequence[BM25Prop]
    id_col: str                  # unique doc id column
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    limit: int = 100
    search_operator: str = "Or"  # Or | And
    minimum_or_tokens_match: int = 0
    where: Optional[Clause] = None
    # fold -> tokenize -> drop stopwords on the QUERY (analyze.go:216-242);
    # preset "en" is the reference's class-config default
    stopwords: Optional[StopwordConfig] = StopwordConfig()
    fold: bool = False
    stats: Optional[CorpusStats] = None
    round_digits: Optional[int] = 6  # deterministic cross-engine hashing


def query_terms(
    query: str,
    tokenization: str = "word",
    stopwords: StopwordConfig | None = StopwordConfig(),
    fold: bool = False,
    class_name: str = "",
) -> dict[str, float]:
    """term -> boost (duplicate count) after fold + stopword removal —
    shared by the Spark path and every oracle-SQL generator so both
    engines see the identical query analysis. ``class_name`` consults
    the class's user dictionary (TokenizeForClass, analyze.go:88) —
    with none registered this is exactly tokenize_py."""
    from weaviate_spark.functions.text import tokenize_for_class_py

    toks = tokenize_for_class_py(query, tokenization, class_name, fold=fold)
    if stopwords is not None:
        sw = stopwords.words()
        toks = [t for t in toks if t not in sw]
    return {t: float(toks.count(t)) for t in set(toks)}


def build_bm25_index(
    corpus: DataFrame,
    properties: Sequence[BM25Prop],
    id_col: str,
    fold: bool = False,
    class_name: str = "",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Full inverted-index analogue, ONE tokenize pass per property over
    the UNFILTERED corpus:

    corpus_stats: (prop, n_docs, n_docs_with_prop, sum_len) — mergeable
                  sums, so incremental appends are delta rows
    term_df:      (prop, term, df) — one row per distinct term
    postings:     (prop, _doc, _term, _f) — per-doc term frequencies
    doclen:       (prop, _doc, _len) — per-doc token counts

    Persist all four as tables (postings partitioned/bucketed by term at
    scale) and refresh on ingest, exactly like the reference's prop
    length tracker + LSM inverted segments; query-time BM25 then never
    tokenizes a document.
    """
    n_docs = corpus.count()
    stat_rows = []
    term_frames, post_frames, len_frames = [], [], []
    corpus = ensure_min_partitions(corpus)
    for prop in properties:
        toks = corpus.select(
            F.col(id_col).alias("_doc"),
            F.explode(tokenize_for_class(
                F.col(prop.name), prop.tokenization, class_name,
                fold=fold)).alias("_term"),
        )
        per_doc = toks.groupBy("_doc", "_term").agg(F.count(F.lit(1)).alias("_f"))
        post_frames.append(per_doc.select(
            F.lit(prop.name).alias("prop"), "_doc", "_term", "_f"
        ))
        lens = per_doc.groupBy("_doc").agg(F.sum("_f").alias("_len"))
        len_frames.append(lens.select(F.lit(prop.name).alias("prop"), "_doc", "_len"))
        srow = lens.agg(
            F.count(F.lit(1)).alias("nd"), F.sum("_len").alias("sl")
        ).collect()[0]
        stat_rows.append((prop.name, n_docs, srow["nd"], int(srow["sl"] or 0)))
        term_frames.append(
            per_doc.groupBy("_term").agg(F.count(F.lit(1)).alias("df")).select(
                F.lit(prop.name).alias("prop"), F.col("_term").alias("term"), "df"
            )
        )
    spark = corpus.sparkSession
    corpus_stats = local_df(
        spark,
        stat_rows, "prop string, n_docs long, n_docs_with_prop long, sum_len long"
    )

    def _union(frames):
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    return corpus_stats, _union(term_frames), _union(post_frames), _union(len_frames)


def build_bm25_stats(
    corpus: DataFrame,
    properties: Sequence[BM25Prop],
    id_col: str,
    fold: bool = False,
    class_name: str = "",
) -> tuple[DataFrame, DataFrame]:
    """(corpus_stats, term_df) — the scalar-statistics subset of
    `build_bm25_index`, kept for callers that only need N/avgdl/df."""
    cs, tdf, _post, _dl = build_bm25_index(
        corpus, properties, id_col, fold, class_name=class_name)
    return cs, tdf


def load_stats(
    corpus_stats: DataFrame,
    term_df: DataFrame,
    needed: dict[str, Sequence[str]] | None = None,
) -> CorpusStats:
    """Collect the (tiny) stats needed for a query from the materialized
    tables. `needed`: prop -> query terms; when given, only those term_df
    rows move to the driver (a few rows, not the vocabulary).

    Both tables may carry MULTIPLE rows per key — the base build plus
    one delta row per incremental append (advance_bm25_artifacts); the
    stored stats are mergeable sums (sum_len, not avg_len), so loading
    is a per-key sum followed by one division for the mean."""
    per: dict[str, list[int]] = {}
    for r in corpus_stats.collect():
        a = per.setdefault(r["prop"], [0, 0, 0])
        a[0] += r["n_docs"]
        a[1] += r["n_docs_with_prop"]
        a[2] += r["sum_len"]
    n_docs = float(next(iter(per.values()))[0]) if per else 0.0
    avg_len = {p: (a[2] / a[1] if a[1] else 0.0) for p, a in per.items()}
    tdf = term_df
    if needed is not None:
        cond = None
        for prop, terms in needed.items():
            c = (F.col("prop") == prop) & F.col("term").isin(list(terms))
            cond = c if cond is None else (cond | c)
        tdf = tdf.where(cond if cond is not None else F.lit(False))
    term_n: dict[tuple[str, str], float] = {}
    for r in tdf.collect():
        k = (r["prop"], r["term"])
        term_n[k] = term_n.get(k, 0.0) + float(r["df"])
    return CorpusStats(n_docs=n_docs, avg_len=avg_len, term_n=term_n)


# Materialized stats tables — the Spark analogue of the reference's
# long-lived propLengthTracker + inverted-index statistics. The four
# frames are WRITTEN parquet tables under .artifacts/bm25 (postings
# partitioned by a 64-way term hash bucket so a query's term lookup
# partition-prunes; doclen partitioned by prop), built once at first use
# per (source fingerprint, property set) and SURVIVING the session —
# exactly like the reference's LSM inverted segments. The in-memory dict
# only memoizes the per-session DataFrame handles. A write path must
# call invalidate_stats() (the reference refreshes its tracker on
# ingest), which drops both the handles and the written artifact.
BM25_ARTIFACT_ROOT = "/root/repo/.artifacts/bm25"
TERM_BUCKETS = 64
# bump on any stored-table schema change: the version feeds the artifact
# path hash, so readers never load a layout written by older code
# (v2: corpus_stats stores mergeable sum_len instead of avg_len, and the
# props.json manifest enables incremental advance)
ARTIFACT_FORMAT = 2
# memory-cache the written postings/doclen tables for repeat queries;
# disable to exercise the pure file-backed partition-pruned scans
CACHE_INDEX_TABLES = True

_stats_tables: dict[tuple, tuple[DataFrame, DataFrame, DataFrame, DataFrame]] = {}
_stats_memo: dict[tuple, "CorpusStats"] = {}
# serializes artifact-DIRECTORY mutations (build / advance / compact)
# within the session: the advance's rename must not race a concurrent
# build's mkdir for the same collection, and vice versa. Cross-process
# writers are out of scope (single-writer deployment assumption, same
# as the reference's per-shard write path).
import threading  # noqa: E402

_artifact_lock = threading.RLock()


def invalidate_stats() -> None:
    """Drop the session handles/memos. The WRITTEN artifacts stay:
    their path embeds a source mtime+size fingerprint, so a rewritten
    table naturally resolves to a NEW artifact dir and stale ones are
    never served (deleting the whole root here would also destroy the
    committed artifacts of every UNCHANGED collection — a single write
    to one tmp table must not force a corpus-wide re-tokenize).
    Superseded hash dirs are garbage-collected at build time."""
    for frames in _stats_tables.values():
        for frame in frames:
            try:
                frame.unpersist()
            except Exception:
                pass
    _stats_tables.clear()
    _stats_memo.clear()


def _source_fingerprint(sf_dir: str, collection: str) -> str | None:
    """mtime+size fingerprint of the source parquet — stale written
    stats are rebuilt when the source changes out-of-band."""
    import os

    path = f"{sf_dir}/{collection}.parquet"
    if not os.path.exists(path):
        return None
    if os.path.isdir(path):
        stats = [os.stat(os.path.join(path, f)) for f in sorted(os.listdir(path))]
    else:
        stats = [os.stat(path)]
    return str(sum(s.st_mtime_ns + s.st_size for s in stats))


def _load_or_build_index_tables(
    corpus: DataFrame, spec: "BM25Spec", table_key: tuple
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """File-backed index tables: read the written artifact if present,
    else build + write + read back. Reading back (instead of caching the
    build lineage) makes every later query a parquet scan with term /
    prop pushdown — the plan never re-tokenizes the corpus."""
    import hashlib
    import os
    import re

    sf_dir, collection = table_key
    props_key = tuple(sorted((p.name, p.tokenization) for p in spec.properties))
    fp = _source_fingerprint(sf_dir, collection)
    spark = corpus.sparkSession
    if fp is None:
        # synthetic / in-memory corpus: session-scoped build, no artifact
        return build_bm25_index(corpus, spec.properties, spec.id_col,
                                spec.fold, class_name=spec.collection)
    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
    fp_h = hashlib.md5(fp.encode()).hexdigest()[:12]
    from weaviate_spark.functions.text import user_dict_digest

    props_h = hashlib.md5(
        repr((props_key, spec.fold, ARTIFACT_FORMAT,
              user_dict_digest(spec.collection))).encode()
    ).hexdigest()[:12]
    coll_root = f"{BM25_ARTIFACT_ROOT}/{tag}/{collection}"
    root = f"{coll_root}/{fp_h}/{props_h}"
    done = f"{root}/_ALL_TABLES_COMMITTED"
    if not os.path.exists(done):
        # the artifact-dir lock serializes this build against an
        # in-flight advance/compact for the same collection (the rename
        # in advance_bm25_artifacts must not race the mkdir here)
        with _artifact_lock:
            return _build_index_artifact(corpus, spec, root, coll_root, fp_h, done)
    cs = spark.read.parquet(f"{root}/corpus_stats")
    tdf = spark.read.parquet(f"{root}/term_df")
    post = spark.read.parquet(f"{root}/postings")
    dl = spark.read.parquet(f"{root}/doclen")
    return cs, tdf, post, dl


def _build_index_artifact(
    corpus: DataFrame, spec: "BM25Spec", root: str, coll_root: str,
    fp_h: str, done: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    import os

    spark = corpus.sparkSession
    if not os.path.exists(done):
        # GC artifacts of SUPERSEDED source fingerprints of this
        # collection (other property sets on the live source survive)
        import shutil

        if os.path.isdir(coll_root):
            for old in os.listdir(coll_root):
                if old != fp_h:
                    shutil.rmtree(os.path.join(coll_root, old), ignore_errors=True)
        cs, tdf, post, dl = build_bm25_index(
            corpus, spec.properties, spec.id_col, spec.fold,
            class_name=spec.collection,
        )
        post = post.withColumn("_tb", F.crc32(F.col("_term")) % TERM_BUCKETS)
        cs.write.mode("overwrite").parquet(f"{root}/corpus_stats")
        tdf.write.mode("overwrite").parquet(f"{root}/term_df")
        (
            post.repartition(F.col("_tb"))
            .write.partitionBy("_tb").mode("overwrite")
            .parquet(f"{root}/postings")
        )
        dl.write.partitionBy("prop").mode("overwrite").parquet(f"{root}/doclen")
        # manifest: lets advance_bm25_artifacts rebuild THIS property
        # set's delta frames for an appended batch (props_h is a hash —
        # not invertible without it)
        import json

        with open(f"{root}/props.json", "w") as mf:
            json.dump({
                "properties": [[p.name, p.tokenization] for p in spec.properties],
                "id_col": spec.id_col,
                "fold": spec.fold,
            }, mf)
        open(done, "w").close()
    cs = spark.read.parquet(f"{root}/corpus_stats")
    tdf = spark.read.parquet(f"{root}/term_df")
    post = spark.read.parquet(f"{root}/postings")
    dl = spark.read.parquet(f"{root}/doclen")
    return cs, tdf, post, dl


def compact_bm25_artifacts(
    spark: SparkSession, sf_dir: str, collection: str
) -> int:
    """Rewrite a collection's advanced artifacts into single-segment
    form: term_df/corpus_stats delta rows merge into one row per key,
    postings/doclen small segment files rewrite into per-partition
    files. The LSM-compaction step for the incremental path — run it
    periodically on a heavily-appended collection so per-query reads
    stay a few files per term bucket. Returns the number of property
    sets compacted. Contents are value-identical before and after
    (load_stats sums per key either way; tests pin score equality)."""
    import hashlib
    import os
    import re
    import shutil

    fp = _source_fingerprint(sf_dir, collection)
    if fp is None:
        return 0
    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
    fp_root = (
        f"{BM25_ARTIFACT_ROOT}/{tag}/{collection}/"
        f"{hashlib.md5(fp.encode()).hexdigest()[:12]}"
    )
    if not os.path.isdir(fp_root):
        return 0
    n = 0
    with _artifact_lock:
        n = _compact_under(spark, sf_dir, collection, fp_root)
    return n


def _compact_under(spark, sf_dir: str, collection: str, fp_root: str) -> int:
    import os
    import shutil

    n = 0
    for props_h in os.listdir(fp_root):
        if "." in props_h:
            # '<h>.compacting' / '<h>.old' leftovers from a crashed
            # compaction are NOT property sets — clean them up (the
            # committed '<h>' dir, when it survived, is authoritative;
            # when it did not, the next query rebuilds from the table)
            shutil.rmtree(f"{fp_root}/{props_h}", ignore_errors=True)
            continue
        root = f"{fp_root}/{props_h}"
        if not os.path.exists(f"{root}/_ALL_TABLES_COMMITTED"):
            continue
        cs = (
            spark.read.parquet(f"{root}/corpus_stats")
            .groupBy("prop")
            .agg(F.sum("n_docs").alias("n_docs"),
                 F.sum("n_docs_with_prop").alias("n_docs_with_prop"),
                 F.sum("sum_len").alias("sum_len"))
        )
        tdf = (
            spark.read.parquet(f"{root}/term_df")
            .groupBy("prop", "term").agg(F.sum("df").alias("df"))
        )
        post = spark.read.parquet(f"{root}/postings")
        dl = spark.read.parquet(f"{root}/doclen")
        staging = f"{root}.compacting"
        shutil.rmtree(staging, ignore_errors=True)
        cs.write.parquet(f"{staging}/corpus_stats")
        tdf.write.parquet(f"{staging}/term_df")
        (
            post.repartition(F.col("_tb"))
            .write.partitionBy("_tb").parquet(f"{staging}/postings")
        )
        dl.repartition("prop").write.partitionBy("prop").parquet(f"{staging}/doclen")
        shutil.copy(f"{root}/props.json", f"{staging}/props.json")
        open(f"{staging}/_ALL_TABLES_COMMITTED", "w").close()
        # drop cached handles BEFORE the swap so no query resolves a
        # frame rooted in the dir being replaced; a crash between the
        # two renames leaves only dotted dirs (cleaned above) and the
        # next query rebuilds from the table — never a half-swapped
        # committed-looking artifact
        invalidate_stats_for(sf_dir, collection)
        backup = f"{root}.old"
        os.rename(root, backup)
        os.rename(staging, root)
        shutil.rmtree(backup)
        n += 1
    if n:
        invalidate_stats_for(sf_dir, collection)
    return n


def invalidate_stats_for(sf_dir: str, collection: str) -> None:
    """Drop the session handles/memos of ONE collection (after its
    artifact advanced in place, the cached frames point at re-rooted
    paths); other collections' warm handles survive."""
    def _hit(key: tuple) -> bool:
        return len(key) >= 3 and key[1] == sf_dir and key[2] == collection

    for k in [k for k in _stats_tables if _hit(k)]:
        for frame in _stats_tables.pop(k):
            try:
                frame.unpersist()
            except Exception:
                pass
    for mk in [mk for mk in _stats_memo if _hit(mk[0])]:
        _stats_memo.pop(mk)


def advance_bm25_artifacts(
    batch_df: DataFrame,
    sf_dir: str,
    collection: str,
    fp_before: str | None,
) -> None:
    """INCREMENTAL inverted-index maintenance for an APPEND of
    `batch_df` to `<sf_dir>/<collection>.parquet` — the reference
    refreshes its prop-length tracker and writes new LSM inverted
    segments per batch (adapters/repos/db/inverted/shard_write_
    inverted.go) instead of re-tokenizing the shard; this is the same
    move on the written artifact tables:

    * postings/doclen: append the batch's rows (same term-bucket / prop
      partitioning — new parquet segment files, O(batch))
    * term_df / corpus_stats: append DELTA rows; the stored stats are
      mergeable sums, load_stats sums per key at read (O(batch) write,
      the per-query read stays a few rows)
    * the artifact dir is renamed from the pre-write source fingerprint
      to the post-write one (O(1)), so the next query resolves the
      ADVANCED artifact instead of rebuilding the corpus from scratch.

    ``fp_before`` is the source fingerprint captured BEFORE the batch
    was appended to the table (the sink captures it; by call time the
    live fingerprint already reflects the append). No-op when the
    collection has no committed artifacts. Append-only contract: a
    re-arrived id would double-count df/doclen — update streams must
    invalidate instead (the upsert sink path does, via crud)."""
    import hashlib
    import json
    import os
    import re

    if fp_before is None:
        return
    fp_after = _source_fingerprint(sf_dir, collection)
    if fp_after is None or fp_after == fp_before:
        return
    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
    coll_root = f"{BM25_ARTIFACT_ROOT}/{tag}/{collection}"
    old_root = f"{coll_root}/{hashlib.md5(fp_before.encode()).hexdigest()[:12]}"
    new_root = f"{coll_root}/{hashlib.md5(fp_after.encode()).hexdigest()[:12]}"
    with _artifact_lock:
        if not os.path.isdir(old_root):
            return
        if os.path.isdir(new_root):
            # a build for the post-append fingerprint already happened
            # (or is committed): it was built FROM the appended table,
            # so it already covers the batch — just re-point the session
            invalidate_stats_for(sf_dir, collection)
            return
        try:
            os.rename(old_root, new_root)
        except OSError:
            # old_root vanished (GC by a concurrent build) — the next
            # query rebuilds from the full table; nothing to advance
            invalidate_stats_for(sf_dir, collection)
            return
        for props_h in os.listdir(new_root):
            if "." in props_h:
                continue  # crashed-compaction leftovers, not prop sets
            root = f"{new_root}/{props_h}"
            manifest = f"{root}/props.json"
            done = f"{root}/_ALL_TABLES_COMMITTED"
            if not (os.path.exists(done) and os.path.exists(manifest)):
                continue
            with open(manifest) as mf:
                m = json.load(mf)
            props = [BM25Prop(name=p[0], tokenization=p[1]) for p in m["properties"]]
            cs, tdf, post, dl = build_bm25_index(
                batch_df, props, m["id_col"], m["fold"],
                class_name=collection,
            )
            post = post.withColumn("_tb", F.crc32(F.col("_term")) % TERM_BUCKETS)
            # marker discipline: the commit marker is ABSENT while the
            # four appends land, so a crash mid-append leaves an
            # uncommitted artifact that the next query rebuilds instead
            # of silently serving half-advanced stats
            os.remove(done)
            cs.write.mode("append").parquet(f"{root}/corpus_stats")
            tdf.write.mode("append").parquet(f"{root}/term_df")
            (
                post.repartition(F.col("_tb"))
                .write.partitionBy("_tb").mode("append")
                .parquet(f"{root}/postings")
            )
            dl.write.partitionBy("prop").mode("append").parquet(f"{root}/doclen")
            open(done, "w").close()
        invalidate_stats_for(sf_dir, collection)


def with_materialized_stats(
    spec: BM25Spec, corpus: DataFrame, table_key: tuple
) -> BM25Spec:
    """Return a spec whose ``stats`` (including the postings/doclen
    inverted-index tables) come from the session-level materialized
    tables (built on first use). Query-time cost after the build: two
    tiny collects plus a term-filtered postings lookup — no document is
    tokenized, no corpus scan."""
    if spec.stats is not None:
        return spec
    from weaviate_spark.functions.text import user_dict_digest

    spec = _resolve_spec(spec)
    props_key = tuple(sorted((p.name, p.tokenization) for p in spec.properties))
    # the session handles key on the user-dict digest too: registering /
    # removing a class dict re-tokenizes the corpus, so cached handles
    # from the other dict state must not be served (AddCustomDict
    # rebuilds the reference's tokenizers the same way)
    key = (session_key(corpus.sparkSession), *table_key, props_key,
           spec.fold, user_dict_digest(spec.collection))
    if key not in _stats_tables:
        cs, tdf, post, dl = _load_or_build_index_tables(corpus, spec, table_key)
        cs, tdf = cs.cache(), tdf.cache()
        cs.count(), tdf.count()
        if CACHE_INDEX_TABLES:
            # memory-cache the written tables for repeat queries (the
            # local analogue of OS page cache + executor block cache);
            # at 100 TB you leave this off and rely on the term-bucket
            # partition pruning of the file-backed scan, which
            # tests/test_bm25.py pins with the flag disabled
            post, dl = post.cache(), dl.cache()
        _stats_tables[key] = (cs, tdf, post, dl)
    cs, tdf, post, dl = _stats_tables[key]
    needed = {p: sorted(t) for p, t in _query_analysis(spec).items() if t}
    memo_key = (key, tuple(sorted((p, tuple(t)) for p, t in needed.items())))
    if memo_key not in _stats_memo:
        # two tiny collects (one stats row per prop + one df row per query
        # term); memoized per term set so repeated queries skip the jobs
        _stats_memo[memo_key] = load_stats(cs, tdf, needed)
    stats = _stats_memo[memo_key]
    return replace(spec, stats=replace(stats, postings=post, doclen=dl))


def _resolve_spec(spec: BM25Spec) -> BM25Spec:
    """Normalize every property's tokenization through the
    retokenize-migration overlay, so the stats-table cache key, the
    artifact fingerprint, the document-side tokenization, and the query
    analysis all agree on ONE generation — a FINALIZING-window query
    can never analyze NEW but read the OLD artifact (the exact
    misalignment inverted/tokenization.go's pinning resolver exists to
    prevent)."""
    from weaviate_spark.sources.retokenize import resolve_tokenization

    resolved = [
        replace(p, tokenization=resolve_tokenization(
            spec.collection, p.name, p.tokenization))
        for p in spec.properties
    ]
    if all(a.tokenization == b.tokenization
           for a, b in zip(resolved, spec.properties)):
        return spec
    return replace(spec, properties=resolved)


def bm25_search(
    spark: SparkSession, sf_dir: str, spec: BM25Spec, use_stats_tables: bool = True
) -> DataFrame:
    """Top-k BM25F search; returns (id_col, _score) plus match count.

    Default path feeds scoring from the materialized stats tables, so
    only candidate documents are tokenized per query; pass
    ``use_stats_tables=False`` to recompute statistics from the corpus
    inside this query (the two paths produce identical scores —
    tests/test_bm25.py pins it, and the driver oracle is always the
    recompute formulation)."""
    release_caches()
    spec = _resolve_spec(spec)
    full = load_table(spark, sf_dir, spec.collection)
    cand = apply_where(full, spec.where)
    if use_stats_tables:
        spec = with_materialized_stats(spec, full, (sf_dir, spec.collection))
    return bm25_score_df(cand, spec, corpus_df=full).orderBy(
        F.col("_score").desc(), F.col(spec.id_col).asc()
    ).limit(spec.limit)


def _query_analysis(spec: BM25Spec) -> dict[str, dict[str, float]]:
    """prop name -> (term -> boost). Tokenization resolves through the
    retokenize-migration overlay (inverted/tokenization.go's
    TokenizationResolver): a query landing in a FINALIZING window
    analyzes against the NEW tokenization, matching the already-built
    new-generation artifact."""
    from weaviate_spark.sources.retokenize import resolve_tokenization

    return {
        p.name: query_terms(
            spec.query,
            resolve_tokenization(spec.collection, p.name, p.tokenization),
            spec.stopwords, spec.fold, class_name=spec.collection)
        for p in spec.properties
    }


def bm25_score_df(
    df: DataFrame, spec: BM25Spec, corpus_df: DataFrame | None = None
) -> DataFrame:
    """Score every candidate document (no limit); building block for
    hybrid fusion and aggregation-with-objectLimit.

    `df` is the candidate set (post-where); `corpus_df` the unfiltered
    collection that corpus statistics are computed over (defaults to
    `df`; pass it whenever a where-filter is active — reference
    semantics score candidates against COLLECTION statistics).

    Plan shape (per property): ONE tokenize+explode scan of the corpus ->
    ONE shuffle: ``groupBy(doc).agg(count(*) AS len, sum(term = t_i) AS
    f_i ...)`` — doc length and all per-term frequencies come out of the
    same aggregation (wide form), so only doc rows (not token rows x
    terms) move. With spec.stats set, the corpus pass disappears
    entirely and only candidate docs are tokenized.
    """
    id_col = spec.id_col
    if corpus_df is None:
        corpus_df = df
    stats_from_tables = spec.stats is not None

    analysis = _query_analysis(spec)
    n_docs_collection: float | None = (
        spec.stats.n_docs if spec.stats is not None else None
    )

    per_prop: list[tuple[BM25Prop, DataFrame, dict, dict, float]] = []
    for prop in spec.properties:
        qboost = analysis[prop.name]
        if not qboost:
            continue
        terms = sorted(qboost)
        if stats_from_tables and spec.stats.postings is not None:
            # inverted-index path: NO document is tokenized at query
            # time — term frequencies come from the term-filtered
            # postings lookup (pushdown on term), lengths from doclen;
            # only docs holding >= 1 query term ever materialize (docs
            # without matches can't score, same result set)
            post = spec.stats.postings
            if "_tb" in post.columns:
                # written-table layout: the term hash-bucket is a
                # partition column, so this predicate prunes the scan to
                # the query terms' directories (PartitionFilters)
                import zlib

                buckets = sorted({
                    zlib.crc32(t.encode("utf-8")) % TERM_BUCKETS for t in terms
                })
                post = post.where(F.col("_tb").isin(buckets))
            post = post.where(
                (F.col("prop") == prop.name) & F.col("_term").isin(terms)
            )
            # F.expr strings: each per-term aggregate is ONE py4j call
            # (the composed F.sum(F.when(...)) form cost ~8 round trips
            # per term of pure driver latency — guide §1 measured ~1 ms
            # per py4j command here). Terms are word-tokenized
            # [\p{L}\p{N}]+ runs, so the quoted literal needs no escaping.
            wide = post.groupBy("_doc").agg(*[
                F.expr(f"sum(CASE WHEN _term = '{t}' THEN _f ELSE 0 END) AS _f{i}")
                for i, t in enumerate(terms)
            ]).join(
                spec.stats.doclen.where(F.col("prop") == prop.name)
                .select("_doc", "_len"),
                "_doc",
            )
            if spec.where is not None:
                wide = wide.join(
                    df.select(F.col(id_col).alias("_doc")), "_doc", "semi"
                )
            per_prop.append((prop, wide, qboost,
                             {t: spec.stats.term_n.get((prop.name, t), 0.0) for t in terms},
                             spec.stats.avg_len.get(prop.name, 0.0)))
            continue
        # with precomputed stats only candidates are tokenized; otherwise
        # the corpus is (its wide agg also yields the stats)
        base = df if stats_from_tables else corpus_df
        # single-file inputs arrive as 1 partition — tokenization is the
        # CPU-heavy stage, spread it (no-op when input is already split)
        base = ensure_min_partitions(base)
        toks = base.select(
            F.col(id_col).alias("_doc"),
            F.explode(tokenize_for_class(
                F.col(prop.name), prop.tokenization, spec.collection,
                fold=spec.fold)).alias("_term"),
        )
        wide = toks.groupBy("_doc").agg(
            F.count(F.lit(1)).alias("_len"),
            *[
                F.expr(f"sum(CASE WHEN _term = '{t}' THEN 1 ELSE 0 END) AS _f{i}")
                for i, t in enumerate(terms)
            ],
        )

        if stats_from_tables:
            avg = spec.stats.avg_len.get(prop.name, 0.0)
            n_t = {t: spec.stats.term_n.get((prop.name, t), 0.0) for t in terms}
        else:
            # per-query stats over the unfiltered corpus: cache the wide
            # frame — the stats agg and the scoring projection both read it
            wide = wide.cache()
            register_cache(wide)
            srow = wide.agg(
                F.avg("_len").alias("_avglen"),
                *[
                    F.sum(F.when(F.col(f"_f{i}") > 0, 1).otherwise(0)).alias(f"_n{i}")
                    for i in range(len(terms))
                ],
            ).collect()[0]
            n_t = {t: float(srow[f"_n{i}"] or 0) for i, t in enumerate(terms)}
            avg = float(srow["_avglen"] or 0.0)
            if corpus_df is not df:
                # scoring reads only candidate docs out of the cached corpus
                # aggregation (ids semi-join; no second tokenize pass)
                wide = wide.join(
                    df.select(F.col(id_col).alias("_doc")), "_doc", "semi"
                )
        per_prop.append((prop, wide, qboost, n_t, avg))

    if not per_prop:
        return df.select(F.col(id_col)).where(F.lit(False)).withColumn(
            "_score", F.lit(0.0)
        ).withColumn("_terms_matched", F.lit(0))

    if n_docs_collection is None:
        # collection-wide object count (bm25_searcher.go:235-239)
        n_docs_collection = float(corpus_df.count())

    # avgPropLen = mean of per-property means (bm25_searcher.go:408-446);
    # NaN/0 fallback is 40.0 (:452-453)
    means = [avg for *_, avg in per_prop if avg > 0]
    avgdl = sum(means) / len(means) if means else AVGDL_FALLBACK

    contrib_frames = []
    for prop, wide, qboost, n_t, _avg in per_prop:
        terms = sorted(qboost)
        # The per-term score/match expressions are assembled as ONE SQL
        # string each and parsed JVM-side (F.expr): the composed-F.*
        # form cost ~20 py4j round trips per term of driver build time.
        # Every float literal carries the D suffix (bare decimals parse
        # as DECIMAL in Spark SQL); repr() keeps the exact double.
        # Values are identical: same left-assoc additions, same CASE
        # arms, same literals (oracle hash-pinned).
        score_terms: list[str] = []
        hit_terms: list[str] = []
        for i, t in enumerate(terms):
            n = n_t[t]
            if n <= 0:
                continue
            # idf with N clamped to >= n (terms.go:67-71)
            N = max(n_docs_collection, n)
            idf = math.log(1.0 + (N - n + 0.5) / (n + 0.5))
            tq = t.replace("'", "''")
            freq = f"(CAST(_f{i} AS DOUBLE) * {qboost[t]!r}D)"
            tf_norm = (
                f"({freq} / ({freq} + {spec.k1!r}D * "
                f"({1 - spec.b!r}D + ({spec.b!r}D * _len) / {avgdl!r}D)))"
            )
            score_terms.append(
                f"CASE WHEN _f{i} > 0 THEN {tf_norm} * "
                f"{idf * prop.boost!r}D ELSE 0.0D END"
            )
            hit_terms.append(f"CASE WHEN _f{i} > 0 THEN '{tq}' END")
        if not score_terms:
            continue
        score_sql = " + ".join(score_terms)
        matched_sql = (
            "filter(array(" + ", ".join(hit_terms) + "), x -> x IS NOT NULL)"
        )
        contrib_frames.append(
            wide.where(F.expr(f"size({matched_sql}) > 0")).select(
                "_doc",
                F.expr(score_sql).alias("_pscore"),
                F.expr(matched_sql).alias("_pterms"),
            )
        )

    if not contrib_frames:
        return df.select(F.col(id_col)).where(F.lit(False)).withColumn(
            "_score", F.lit(0.0)
        ).withColumn("_terms_matched", F.lit(0))

    allc = contrib_frames[0]
    for c in contrib_frames[1:]:
        allc = allc.unionByName(c)

    if len(contrib_frames) == 1:
        out = allc.select(
            "_doc",
            F.col("_pscore").alias("_score"),
            F.size("_pterms").alias("_terms_matched"),
        )
    else:
        out = allc.groupBy("_doc").agg(
            F.sum("_pscore").alias("_score"),
            F.size(F.array_distinct(F.flatten(F.collect_list("_pterms")))).alias(
                "_terms_matched"
            ),
        )

    n_query_terms = len(set().union(*[set(analysis[p.name]) for p in spec.properties]))
    if spec.search_operator == "And":
        out = out.where(F.col("_terms_matched") == n_query_terms)
    elif spec.minimum_or_tokens_match > 0:
        out = out.where(
            F.col("_terms_matched") >= min(spec.minimum_or_tokens_match, n_query_terms)
        )

    if spec.round_digits is not None:
        out = out.withColumn("_score", F.round("_score", spec.round_digits))
    return out.withColumnRenamed("_doc", spec.id_col)


def bm25_oracle_sql(
    table: str,
    text_col: str,
    id_col: str,
    query: str,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    limit: int = 100,
    search_operator: str = "Or",
    minimum_or_tokens_match: int = 0,
    tokenization: str = "word",
    stopwords: StopwordConfig | None = StopwordConfig(),
    fold: bool = False,
    where_sql: str | None = None,
) -> str:
    """DuckDB SQL computing the identical single-property BM25 result —
    the generated-oracle counterpart of bm25_search. Statistics (N,
    avgdl, df) come from the full table; `where_sql` restricts only the
    scored candidate set (reference semantics)."""
    qboost = query_terms(query, tokenization, stopwords, fold)
    if not qboost:
        return (
            f"SELECT {id_col}, 0.0 AS _score, 0 AS _terms_matched "
            f"FROM {table} WHERE false"
        )
    terms_sql = ", ".join(f"('{t}', {c})" for t, c in sorted(qboost.items()))
    n_terms = len(qboost)
    if search_operator == "And":
        having = f"HAVING count(DISTINCT _term) = {n_terms}"
    elif minimum_or_tokens_match > 0:
        having = f"HAVING count(DISTINCT _term) >= {min(minimum_or_tokens_match, n_terms)}"
    else:
        having = ""
    toks_expr = sql_tokens(text_col, tokenization, fold=fold)
    cand = f"SELECT {id_col} AS _doc FROM {table}"
    if where_sql:
        cand += f" WHERE {where_sql}"
    return f"""
WITH toks AS (
  SELECT {id_col} AS _doc, unnest({toks_expr}) AS _term
  FROM {table}
),
doclen AS (SELECT _doc, count(*) AS _len FROM toks GROUP BY _doc),
stats AS (
  SELECT (SELECT count(*) FROM {table}) AS _ndocs,
         (SELECT avg(_len) FROM doclen) AS _avgdl
),
cand AS ({cand}),
qterms(_term, _boost) AS (VALUES {terms_sql}),
tf_all AS (
  SELECT _doc, toks._term, count(*) * _boost AS _freq
  FROM toks JOIN qterms ON toks._term = qterms._term
  GROUP BY _doc, toks._term, _boost
),
n_t AS (SELECT _term, count(*) AS _n FROM tf_all GROUP BY _term),
tf AS (SELECT tf_all.* FROM tf_all JOIN cand USING (_doc)),
contrib AS (
  SELECT tf._doc, tf._term,
    (tf._freq / (tf._freq + {k1} * (1 - {b} + {b} * doclen._len / stats._avgdl)))
    * ln(1 + (greatest(CAST(stats._ndocs AS DOUBLE), _n) - _n + 0.5) / (_n + 0.5)) AS _c
  FROM tf
  JOIN doclen ON tf._doc = doclen._doc
  JOIN n_t ON tf._term = n_t._term
  CROSS JOIN stats
)
SELECT _doc AS {id_col}, round(sum(_c), 6) AS _score,
       CAST(count(DISTINCT _term) AS BIGINT) AS _terms_matched
FROM contrib GROUP BY _doc {having}
ORDER BY _score DESC, {id_col} ASC LIMIT {limit}
"""
