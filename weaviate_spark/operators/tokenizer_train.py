"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016).

Learns byte-pair-encoding merges from a corpus the way a training-data
pipeline does before tokenizing at scale:

1. The corpus collapses to the DISTINCT-WORD frame (word, count) — one
   shuffle; at 100 TB the distinct vocabulary is millions of rows, not
   trillions, so every later iteration works on a frame ~6 orders of
   magnitude smaller than the corpus.
2. Each merge iteration: count adjacent symbol pairs weighted by word
   frequency (overlapping occurrences included, as in the reference
   algorithm), pick the argmax with a deterministic (count desc, left
   asc, right asc) tie-break, and apply the merge greedily
   left-to-right via a Catalyst ``aggregate`` fold — a higher-order
   expression, no Python UDF on the data path.
3. Only the single best (pair, count) row ever reaches the driver per
   iteration; the words frame is localCheckpoint'ed each round so plan
   depth stays O(1) instead of O(iterations).

``train_bpe`` returns the learned merge table; ``apply_bpe`` re-tokenizes
text with a learned merge list (fold per merge rank, again JVM-side).
"""

from __future__ import annotations

from weaviate_spark.cache import ensure_min_partitions, local_df
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_RE = "[\\p{L}\\p{N}]+"
# inside a Spark SQL string literal the backslash needs its own escape
_TOKEN_RE_SQL = TOKEN_RE.replace("\\", "\\\\")


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    # CPU-heavy narrow stage over a possibly single-split local scan:
    # spread first (no-op at real scale where the scan is already wide)
    docs = ensure_min_partitions(docs)
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE_SQL}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_expr(left: str, right: str) -> str:
    """Greedy left-to-right non-overlapping merge of (left,right) over the
    symbol array, as a pure Catalyst fold."""
    l = left.replace("'", "''")
    r = right.replace("'", "''")
    return f"""
    CASE WHEN size(syms) <= 1 THEN syms ELSE
      aggregate(
        slice(syms, 2, size(syms) - 1),
        array(element_at(syms, 1)),
        (acc, x) -> CASE
          WHEN element_at(acc, -1) = '{l}' AND x = '{r}'
            THEN concat(slice(acc, 1, size(acc) - 1),
                        array(concat('{l}', '{r}')))
          ELSE concat(acc, array(x)) END)
    END"""


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_pair_count: int = 2,
    batch_size: int = 1,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns (merge_rank, left, right,
    merged, pair_count), rank 1 = first merge learned.

    ``batch_size`` (r06 verdict ask #3) bounds how many merges one
    driver round may learn from a single pair-count job: candidates are
    taken in the deterministic (count desc, left, right) order and
    accepted as the longest PREFIX whose merges are pairwise
    symbol-DISJOINT (the first overlapping candidate ends the round:
    after the recount it may still outrank everything below it) — a
    disjoint merge's pair count is provably unchanged by applying the
    others
    (merging only removes adjacencies between symbols it consumes, and
    never creates adjacency between surviving symbols), so applying the
    batch sequentially equals the one-at-a-time algorithm over those
    picks. With batch_size=1 (the default, and the contract-query
    setting) the algorithm is EXACTLY sequential BPE. With B > 1 a
    production 32k-merge vocabulary costs ~32k/B pair-count jobs
    instead of 32k; the documented divergence window is a merge that
    creates a brand-new pair (e.g. 'th'+'e') out-counting the round's
    remaining pre-count candidates — sequential training would pick the
    new pair, the batch keeps its pre-counted list. Where every
    high-count pair is symbol-disjoint the two orders are identical
    (tests pin a 64-merge batch==sequential corpus)."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    spark: SparkSession = docs.sparkSession
    words = (
        _word_counts(docs, text_col)
        .withColumn("syms", F.expr("split(word, '')"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    done = False
    while not done and len(merges) < num_merges:
        room = min(batch_size, num_merges - len(merges))
        pairs = (
            words.where(F.size("syms") > 1)
            .select(
                F.col("cnt"),
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
        )
        top = (
            pairs.orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(room + 1)  # +1 detects a round-ending overlap early
            .collect()
        )
        if not top or top[0]["c"] < min_pair_count:
            break
        touched: set[str] = set()
        accepted: list[tuple[str, str, int]] = []
        for row in top:
            if row["c"] < min_pair_count:
                done = True
                break
            l, r = row["l"], row["r"]
            if l in touched or r in touched:
                # the deferred candidate's count may shift once earlier
                # merges apply, and after the recount it may STILL
                # outrank everything below it — so nothing ranked lower
                # may be accepted this round either (prefix-only batch)
                break
            accepted.append((l, r, int(row["c"])))
            touched.update((l, r, l + r))
            if len(accepted) == room:
                break
        for l, r, c in accepted:
            merges.append((len(merges) + 1, l, r, l + r, c))
            # per-merge checkpoint: the fold expression references its
            # input ~6x, so nesting a batch in one projection would
            # blow up exponentially — the vocab-sized apply is cheap
            words = (
                words.withColumn("syms", F.expr(_merge_expr(l, r)))
                .localCheckpoint()
            )
    return local_df(
        spark,
        merges,
        "merge_rank bigint, left string, right string, merged string, pair_count bigint",
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list (in rank order) —
    every word becomes its fully-merged symbol sequence. Pure fold chain,
    JVM-side end to end."""
    expr = (
        f"transform(regexp_extract_all(lower({text_col}), '{_TOKEN_RE_SQL}', 0), "
        "word -> split(word, ''))"
    )
    tokens = F.expr(expr)
    df = docs.withColumn("_words", tokens)
    # fold each merge over every word's symbol array
    body = "w"
    for l, r in merges:
        le, re_ = l.replace("'", "''"), r.replace("'", "''")
        body = f"""
        CASE WHEN size({body}) <= 1 THEN {body} ELSE
          aggregate(
            slice({body}, 2, size({body}) - 1),
            array(element_at({body}, 1)),
            (acc, x) -> CASE
              WHEN element_at(acc, -1) = '{le}' AND x = '{re_}'
                THEN concat(slice(acc, 1, size(acc) - 1),
                            array(concat('{le}', '{re_}')))
              ELSE concat(acc, array(x)) END)
        END"""
    return df.withColumn(
        out_col, F.expr(f"flatten(transform(_words, w -> {body}))")
    ).drop("_words")


def bpe_encode_docs(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with a learned merge list, the scalable
    way: the fold runs over the DISTINCT-WORD vocabulary (millions of
    rows at 100 TB, not trillions of token occurrences), one merge per
    step with a localCheckpoint between steps — the chained Catalyst
    fold otherwise inlines ~3x per merge and the expression tree (and
    task binary, and codegen time) grows exponentially with merge
    count. Documents then re-assemble by joining their word sequence
    to the encoded vocabulary (md5-uniform-ish word key, Zipf head
    handled by AQE skew split).

    Returns (id, n_words, n_bpe_tokens, bpe_text); wordless docs drop.
    """
    words = (
        _word_counts(docs, text_col)
        .select("word")
        .withColumn("syms", F.expr("split(word, '')"))
        .localCheckpoint()
    )
    for l, r in merges:
        words = words.withColumn("syms", F.expr(_merge_expr(l, r))).localCheckpoint()

    dw = docs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE_SQL}', 0)")
        ).alias("_pos", "word"),
    )
    enc = dw.join(words, "word")
    per_word = F.array_sort(F.collect_list(F.struct("_pos", "syms")))
    return enc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.size("syms")).cast("long").alias("n_bpe_tokens"),
        F.array_join(
            F.flatten(F.transform(per_word, lambda x: x["syms"])), " "
        ).alias("bpe_text"),
    )


def wordpiece_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    min_frac: float = 0.01,
) -> DataFrame:
    """Corpus-derived WordPiece vocabulary: (form, tok) where form 'i'
    = word-initial, 'c' = continuation. A substring of length
    2..max_len enters the vocab when its occurrence-weighted count (per
    position, per word occurrence) reaches ``min_frac`` of total word
    occurrences — a deterministic, scale-invariant rule (no iterative
    likelihood training) that both engines derive from the same counts.
    Single characters are implicitly always in the vocab (the encoder's
    fallback), so encoding never needs [UNK] on text the tokenizer
    regex produced."""
    wc = _word_counts(docs, text_col)
    total = wc.agg(F.sum("cnt").alias("_t"))
    subs = (
        wc.select(
            "word", "cnt",
            F.explode(
                F.expr("sequence(1, length(word))")
            ).alias("_i"),
        )
        .select(
            "word", "cnt", "_i",
            F.explode(F.expr(f"sequence(2, {max_len})")).alias("_l"),
        )
        .where(F.col("_i") + F.col("_l") - 1 <= F.length("word"))
        .select(
            F.when(F.col("_i") == 1, F.lit("i")).otherwise(F.lit("c")).alias("form"),
            F.expr("substring(word, _i, _l)").alias("tok"),
            "cnt",
        )
        .groupBy("form", "tok")
        .agg(F.sum("cnt").alias("c"))
    )
    return (
        subs.crossJoin(F.broadcast(total))
        .where(F.col("c") >= F.lit(min_frac) * F.col("_t"))
        .select("form", "tok", "c")
    )


def wordpiece_encode_docs(
    docs: DataFrame,
    vocab: set,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 4,
) -> DataFrame:
    """Greedy longest-match-first (max-munch) WordPiece encode — the
    standard WordPiece inference algorithm (Wu et al. 2016 §4.1;
    continuation pieces carry the '##' prefix). Same scale shape as
    bpe_encode_docs: the Arrow-batched greedy loop runs over the
    DISTINCT-WORD vocabulary only (the bounded domain), documents
    reassemble via one word-key join; ``vocab`` is the tiny collected
    (form, tok) artifact, broadcast with the closure.

    Returns (id, n_words, n_wp_tokens, wp_text); wordless docs drop.
    """
    vocab_fs = frozenset(vocab)

    def _wp_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for w in pdf["word"]:
                pos, parts = 0, []
                while pos < len(w):
                    form = "i" if pos == 0 else "c"
                    ln = min(max_len, len(w) - pos)
                    while ln > 1 and (form, w[pos:pos + ln]) not in vocab_fs:
                        ln -= 1
                    piece = w[pos:pos + ln]
                    parts.append(piece if pos == 0 else "##" + piece)
                    pos += ln
                out.append(" ".join(parts))
            pdf = pdf.copy()
            pdf["_toks"] = out
            yield pdf

    words = (
        _word_counts(docs, text_col)
        .select("word")
        .mapInPandas(_wp_batches, "word string, _toks string")
        .withColumn("_n", F.size(F.split(F.col("_toks"), " ")))
        .localCheckpoint()
    )
    dw = docs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE_SQL}', 0)")
        ).alias("_pos", "word"),
    )
    enc = dw.join(words, "word")
    per_word = F.array_sort(F.collect_list(F.struct("_pos", "_toks")))
    return enc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("_n").cast("long").alias("n_wp_tokens"),
        F.array_join(
            F.transform(per_word, lambda x: x["_toks"]), " "
        ).alias("wp_text"),
    )
