"""Text analysis operators for training-data pipelines (BASELINE.json
north star): language-ID heuristic, quality scoring, token counting,
document fingerprinting.

All pure Catalyst expressions (whole-stage codegen; narrow — zero
shuffles), and all reproducible in ANSI SQL so each op is
duckdb-oracle-checkable. At 100 TB these run as map-only stages over
the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weaviate_spark.cache import (
    ensure_min_partitions, memo_column, register_cache, register_checkpoint,
)
from weaviate_spark.functions.text import EN_STOPWORDS, tokenize

# tiny per-language function-word lists for the n-gram/stopword-vote
# language heuristic (deterministic; not a quality claim). Ties break
# alphabetically by language code.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"],
}


def token_count(text: Column) -> Column:
    """Whitespace/punctuation token count (word tokenization)."""
    return F.size(tokenize(text, "word"))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, "[a-zA-Z0-9\\s]", "")
    return F.round(
        F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(0.0), 6
    )


def _in_list(t: Column, values: list[str]) -> Column:
    """OR-chain membership test usable on higher-order-function lambda
    variables (Column.isin is not supported there)."""
    out = t == F.lit(values[0])
    for v in values[1:]:
        out = out | (t == F.lit(v))
    return out


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokenize(text, "word")
    words = stopwords or EN_STOPWORDS
    hits = F.size(F.filter(toks, lambda t: _in_list(t, words)))
    return F.round(
        F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(0.0), 6
    )


def mean_token_length(text: Column) -> Column:
    toks = tokenize(text, "word")
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(
        F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(0.0), 6
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards reasonable length
    (saturating at 100 tokens), moderate mean word length, low
    punctuation noise; components weighted 0.4/0.3/0.3. Deterministic
    and SQL-reproducible; thresholds are pipeline knobs, not truths."""
    ntok = token_count(text).cast("double")
    len_component = F.least(ntok / F.lit(100.0), F.lit(1.0))
    mwl = mean_token_length(text)
    wl_component = F.when((mwl >= 3.0) & (mwl <= 8.0), 1.0).otherwise(0.5)
    punct_component = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.round(
        0.4 * len_component + 0.3 * wl_component + 0.3 * punct_component, 6
    )


def lang_id(text: Column) -> Column:
    """Function-word-vote language guess; tie -> alphabetically first
    language code (deterministic)."""
    toks = tokenize(text, "word")
    scores = []
    def _hits_fn(markers: list[str]):
        # NB: no default-arg lambdas — pyspark treats a 2-param lambda
        # as (element, index) and binds the index to the second param
        return lambda t: _in_list(t, markers)

    for lang in sorted(LANG_MARKERS):
        hits = F.size(F.filter(toks, _hits_fn(LANG_MARKERS[lang])))
        scores.append((lang, hits))
    # argmax with alphabetical tie-break: fold over langs in order, strict >
    best_lang, best_score = F.lit(sorted(LANG_MARKERS)[0]), scores[0][1]
    for lang, s in scores[1:]:
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: md5 of the normalized
    (word-tokenized, space-joined) text — the exact-dedup key."""
    return F.md5(F.concat_ws(" ", tokenize(text, "word")))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """All text stats in one narrow projection.

    Repartitions narrow inputs first (the shingle_df pattern, dedup.py):
    the regex-heavy expressions are pure CPU, and a single-file local
    table (one ~59 MB parquet at 10x bench scale = 2 input splits)
    would otherwise serialize the scoring on 2 of 32 cores. On a real
    cluster the scan already has >= parallelism splits and this no-ops."""
    df = ensure_min_partitions(df)

    def _build() -> list[Column]:
        t = F.col(text_col)
        return [
            F.col(id_col),
            token_count(t).alias("n_tokens"),
            char_count(t).alias("n_chars_computed"),
            punct_ratio(t).alias("punct_ratio"),
            stopword_ratio(t).alias("stopword_ratio"),
            mean_token_length(t).alias("mean_token_len"),
            quality_score(t).alias("quality"),
            lang_id(t).alias("lang_guess"),
            fingerprint(t).alias("fingerprint"),
        ]

    # the projection is ~400 py4j expression-construction calls (the
    # language-vote OR-chains dominate); built once per process and
    # reused — Columns are immutable and resolve by name (memo_column)
    cols = memo_column(("text_profile", id_col, text_col), _build)
    return df.select(*cols)


# GPT-2-style pretokenizer regex, minus the `\s+(?!\S)` trailing-space
# lookahead (RE2 — the DuckDB oracle engine — has no lookarounds) and
# with whitespace spelled as an EXPLICIT class: Java's \s includes
# vertical tab \x0B, RE2's does not, so a literal \s would diverge on
# corpora containing VT. With the explicit class the pattern is
# byte-identical in both engines. Splits contractions ('t/'s/...),
# keeps the leading space attached to word/number/punct runs — the
# shape BPE vocabularies are trained on, so len(matches) tracks real
# BPE token counts far better than whitespace words on
# punctuation-heavy text.
BPE_ISH_REGEX = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+"
    r"| ?[^ \t\n\f\r\p{L}\p{N}]+|[ \t\n\f\r]+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: pretokenizer segments, the budgeting unit a
    training pipeline actually packs against (token_count's word runs
    undercount punctuation/contraction tokens)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_REGEX), 0))


# ---------------------------------------------------------------------------
# repetition removal (Gopher quality filters: Rae et al. 2021,
# "Scaling Language Models: ... Gopher", arXiv 2112.11446 §A1.1 — the
# duplicate-line / duplicate-n-gram filters every web-scale training
# pipeline applies before packing)

def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc repetition metrics, 6dp:

    * ``dup_line_frac``       — (lines - distinct lines) / lines
    * ``dup_line_char_frac``  — chars in repeated line occurrences
                                (count-1 per distinct repeated line) /
                                total line chars
    * ``top_2gram_char_frac`` — chars covered by the most frequent word
                                2-gram (count * gram chars) / total word
                                chars; ties -> lexicographically
                                smallest gram

    Plan shape: two explode -> groupBy(doc, unit) -> groupBy(doc)
    pyramids (lines, 2-grams) joined on the id — every stage partial-
    aggregates map-side; nothing leaves the executor but per-doc rows.
    Empty docs (no lines / fewer than 2 words) score 0.0 everywhere.
    """
    from weaviate_spark.functions.text import tokenize

    # tokenization + the gram explode are the CPU-heavy narrow stages;
    # a single-file local table arrives as 1-2 splits which would
    # serialize them (no-op at real scale where the scan is already
    # wide) — same treatment as text_profile/bm25 (guide §2.2)
    df = ensure_min_partitions(df)

    t = F.col(text_col)
    doc = F.col(id_col).alias("_doc")

    lines = df.select(
        doc,
        F.explode(
            F.filter(
                F.transform(F.split(t, "\n"), lambda s: F.trim(s)),
                lambda s: s != "",
            )
        ).alias("_line"),
    )
    per_line = lines.groupBy("_doc", "_line").agg(F.count(F.lit(1)).alias("_c"))
    line_stats = per_line.groupBy("_doc").agg(
        F.sum("_c").alias("_n_lines"),
        F.count(F.lit(1)).alias("_n_distinct"),
        F.sum(F.col("_c") * F.length("_line")).alias("_chars"),
        F.sum(
            F.when(F.col("_c") > 1, (F.col("_c") - 1) * F.length("_line"))
            .otherwise(F.lit(0))
        ).alias("_dup_chars"),
    )

    # the token-char total rides the gram pyramid (a per-doc constant
    # carried through the explode) instead of a second tokenize pass
    # over the corpus: docs with < 2 words produce no gram rows and so
    # no _wchars row, but their 2-gram fraction is 0.0 either way
    # (NULL fails the `_wchars > 0` gate exactly like the old 0/len)
    words = df.select(doc, tokenize(t, "word").alias("_w"))
    grams = words.select(
        "_doc",
        F.aggregate(
            F.transform(F.col("_w"), lambda w: F.length(w)),
            F.lit(0), lambda a, x: a + x,
        ).alias("_wc"),
        F.explode(
            F.when(
                F.size("_w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_w") - 1),
                    lambda i: F.struct(
                        F.concat_ws(" ", F.element_at("_w", i),
                                    F.element_at("_w", i + 1)).alias("g"),
                        (F.length(F.element_at("_w", i))
                         + F.length(F.element_at("_w", i + 1))).alias("glen"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<g:string,glen:int>>"))
        ).alias("_gr"),
    )
    per_gram = grams.groupBy("_doc", "_gr.g").agg(
        F.count(F.lit(1)).alias("_c"), F.first("_gr.glen").alias("_glen"),
        F.first("_wc").alias("_wc"),
    )
    from weaviate_spark.cache import register_checkpoint
    per_gram = register_checkpoint(per_gram)

    word_chars = per_gram.groupBy("_doc").agg(
        F.first("_wc").alias("_wchars"))

    return (
        df.select(doc)
        .join(line_stats, "_doc", "left")
        .join(_top_gram_cover(per_gram), "_doc", "left")
        .join(word_chars, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.round(
                F.when(F.col("_n_lines") > 0,
                       (F.col("_n_lines") - F.col("_n_distinct"))
                       / F.col("_n_lines")).otherwise(F.lit(0.0)), 6
            ).alias("dup_line_frac"),
            F.round(
                F.when(F.col("_chars") > 0,
                       F.col("_dup_chars") / F.col("_chars"))
                .otherwise(F.lit(0.0)), 6
            ).alias("dup_line_char_frac"),
            F.round(
                F.when(F.col("_wchars") > 0,
                       F.coalesce(F.col("_top_cover"), F.lit(0))
                       / F.col("_wchars")).otherwise(F.lit(0.0)), 6
            ).alias("top_2gram_char_frac"),
        )
    )


def _top_gram_cover(per_gram: DataFrame) -> DataFrame:
    """(doc, _top_cover): chars covered by the most frequent 2-gram,
    ties broken toward the lexicographically smallest gram. A gram must
    occur at least twice to count — a unique top gram is not repetition
    (otherwise every short doc trips the threshold)."""
    from pyspark.sql import Window

    w = Window.partitionBy("_doc").orderBy(F.col("_c").desc(), F.col("g").asc())
    return (
        per_gram.where(F.col("_c") >= 2)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_doc", (F.col("_c") * F.col("_glen")).alias("_top_cover"))
    )


# Gopher §A1.1 quality-filter constants (Rae et al. 2021, public).
# Stop-word PRESENCE list (≥2 distinct must appear), not EN_STOPWORDS.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLETS = ("•", "‣", "▶", "-", "*")


def gopher_quality_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher quality-filter rule breakdown (Rae et al. 2021 §A1.1,
    the published thresholds as defaults) — the companion to
    repetition_filter, which carries the §A1.1 repetition rules.

    Definitions (deterministic, SQL-reproducible): words = non-empty
    whitespace-split tokens; symbol ratio = (count('#') +
    count('...'))/words; bullet lines start (after space-trim) with
    •/‣/▶/-/*; ellipsis lines end with '...' or '…'; alpha words
    contain ≥1 Unicode letter; stop-word hits = DISTINCT presence
    count over the/be/to/of/and/that/have/with (lowercased match).
    An empty document fails word-count/mean-length/alpha/stop rules
    and passes the line-shape rules (no lines to offend).

    Returns per-doc metrics, one boolean per rule, and
    ``keep`` = AND of all seven. Pure narrow Catalyst expressions —
    zero shuffles, map-only over the corpus scan at any scale.
    """
    text = F.col(text_col)
    words = F.filter(F.split(text, "\\s+"), lambda w: F.length(w) > 0)
    wc = F.size(words).cast("long")
    mwl = F.when(
        wc > 0,
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
        .cast("double") / wc,
    ).otherwise(0.0)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.when(wc > 0, (n_hash + n_ellipsis) / wc).otherwise(0.0)
    lines = F.split(text, "\n")
    nl = F.size(lines)

    def _starts_bullet(line: Column) -> Column:
        t = F.ltrim(line)
        out = F.lit(False)
        for b in GOPHER_BULLETS:
            out = out | t.startswith(b)
        return out

    bullet_ratio = F.size(F.filter(lines, _starts_bullet)) / nl
    ellipsis_ratio = F.size(F.filter(
        lines, lambda l: F.rtrim(l).endswith("...")
        | F.rtrim(l).endswith("…"))) / nl
    alpha_ratio = F.when(
        wc > 0,
        F.size(F.filter(words, lambda w: w.rlike("\\p{L}"))) / wc,
    ).otherwise(0.0)
    lowered = F.transform(words, F.lower)
    stop_hits = sum(
        (F.array_contains(lowered, w).cast("int") for w in GOPHER_STOPWORDS),
        F.lit(0),
    )
    out = df.select(
        F.col(id_col),
        wc.alias("word_count"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_line_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_line_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.alias("stopword_hits"),
    )
    rules = {
        "r_word_count": (F.col("word_count") >= min_words)
        & (F.col("word_count") <= max_words),
        "r_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "r_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "r_bullet_lines": F.col("bullet_line_ratio")
        <= max_bullet_line_ratio,
        "r_ellipsis_lines": F.col("ellipsis_line_ratio")
        <= max_ellipsis_line_ratio,
        "r_alpha_words": F.col("alpha_word_ratio") >= min_alpha_word_ratio,
        "r_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def repetition_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_2gram_char_frac: float = 0.20,
) -> DataFrame:
    """Gopher §A1.1 keep/drop decision over repetition_profile (the
    published thresholds are the defaults)."""
    prof = repetition_profile(df, id_col, text_col)
    return prof.withColumn(
        "keep",
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("top_2gram_char_frac") <= max_top_2gram_char_frac),
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF keywords per document: the classic extractive
    keyword / document-tagging primitive for corpus triage (what is
    this doc about, without a model). Smoothed sklearn-style idf
    (ln((1+N)/(1+df)) + 1, N = docs with at least one token), score =
    tf * idf ROUNDED to 6dp before ranking so the cross-engine order
    is decided on the exact values both engines hash; ties break on
    the term string.

    Scale: ONE pass over the corpus — token explode straight into the
    (doc, term) tf aggregate (map-side combined, checkpointed) — then
    df (docs per term) and N (docs with >= 1 token) both derive from
    the tf table by integer-exact aggregation instead of re-exploding
    the corpus per statistic. The df table is the same statistic BM25
    already persists at ingest — at 100 TB the join reuses that
    artifact instead of recounting the corpus."""
    from pyspark.sql import Window

    from weaviate_spark.functions.text import tokenize
    # CPU-heavy narrow stage over a possibly single-split local scan:
    # spread first (no-op at real scale where the scan is already wide)
    df = ensure_min_partitions(df)

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokenize(F.col(text_col), "word")).alias("_t"),
    )
    tf = register_checkpoint(
        toks.groupBy("_doc", "_t").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("df"))
    ndocs = tf.select("_doc").distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    scored = (
        tf.join(dfreq, "_t")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((1.0 + F.col("_n")) / (1.0 + F.col("df")))
                    + F.lit(1.0)
                ),
                6,
            )
            + F.lit(0.0),
        )
    )
    w = Window.partitionBy("_doc").orderBy(
        F.col("score").desc(), F.col("_t").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(
            F.col("_doc").alias(id_col),
            F.col("_rk").cast("long").alias("rank"),
            F.col("_t").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )


def readability_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading-ease per document with the classic vowel-group
    syllable heuristic (every word counts at least one syllable;
    sentences split on [.!?]+ runs, at least one per doc):

        206.835 - 1.015 * words/sentences - 84.6 * syllables/words

    The third deterministic quality axis next to quality_score
    (length/punct shape) and the LM scores (token predictability):
    flags run-on boilerplate (low score via sentence length) and
    jargon-dense text (low score via syllable density). Pure codegen
    column expressions — one narrow map, no shuffle, and the identical
    arithmetic evaluates in any SQL engine."""
    words = tokenize(F.col(text_col), "word")
    n_syll = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sentences = F.filter(
        F.transform(F.split(F.col(text_col), r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = df.select(
        F.col(id_col),
        F.size(words).alias("_nw"),
        n_syll.alias("_nsyl"),
        F.greatest(F.size(sentences), F.lit(1)).alias("_nsent"),
    ).where(F.col("_nw") > 0)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("_nw").cast("double") / F.col("_nsent"))
        - F.lit(84.6) * (F.col("_nsyl").cast("double") / F.col("_nw"))
    )
    return base.select(
        id_col,
        F.col("_nw").cast("long").alias("n_words"),
        F.col("_nsent").cast("long").alias("n_sentences"),
        F.col("_nsyl").cast("long").alias("n_syllables"),
        (F.round(flesch, 6) + F.lit(0.0)).alias("flesch"),
    )


def quality_percentiles_by_group(
    df: DataFrame, id_col: str, text_col: str, group_col: str
) -> DataFrame:
    """Rank-normalized quality within a grouping (language, source,
    domain): raw quality scores are not comparable across languages —
    different punctuation conventions and token lengths shift the
    scale — so balanced filtering keeps the top X PERCENT per group,
    not a global threshold. Emits the per-group rank (quality desc,
    id tie-break), the [0,1] percentile position, and the decile
    bucket. One narrow scoring map + one window over the group key;
    group partitions are corpus-sized but the window needs only rank
    state (no buffering of the frame)."""
    from pyspark.sql import Window

    scored = df.select(
        F.col(group_col),
        F.col(id_col),
        quality_score(F.col(text_col)).alias("quality"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    pct = F.when(n > 1, (rn - F.lit(1)) / (n - F.lit(1)).cast("double")).otherwise(
        F.lit(0.0)
    )
    return scored.select(
        group_col,
        id_col,
        "quality",
        rn.cast("long").alias("rank_in_group"),
        (F.round(pct, 6) + F.lit(0.0)).alias("pct"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


def js_divergence_by_group(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    base_group: str,
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between each group's unigram
    distribution and ``base_group``'s — the corpus-drift monitor a
    pipeline runs when a new language/source/time slice lands: how far
    is this slice's vocabulary usage from the reference distribution?

    Per group g: JS(P_g ‖ Q_base) = ½·KL(P‖M) + ½·KL(Q‖M), M = ½(P+Q),
    over the UNION of both vocabularies (0·ln 0 terms are simply absent
    rows). Scale shape: one token-count shuffle on the (group, term)
    key builds every distribution in one pass; the per-group union
    vocabulary comes from a left join against the base distribution
    plus an anti-join for base-only terms — both keyed on the term,
    both linear in vocabulary size, never |vocab|² and never a
    collect. Bounded JS ∈ [0, ln 2] makes the scores comparable
    across slices.
    """
    from weaviate_spark.functions.text import tokenize

    # CPU-heavy narrow stage over a possibly single-split local scan:
    # spread first (no-op at real scale where the scan is already wide)
    df = ensure_min_partitions(df)
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(tokenize(F.col(text_col), "word")).alias("_t"),
    )
    counts = register_cache(
        toks.groupBy("_g", "_t").agg(F.count(F.lit(1)).alias("_c")).cache()
    )
    totals = counts.groupBy("_g").agg(F.sum("_c").alias("_tot"))

    base = counts.where(F.col("_g") == base_group).select(
        F.col("_t"), F.col("_c").alias("_cb")
    )
    base_tot = totals.where(F.col("_g") == base_group).select(
        F.col("_tot").alias("_totb")
    )
    others = counts.where(F.col("_g") != base_group)

    # terms present in g (base count 0 when absent)
    in_g = others.join(base, "_t", "left").select(
        "_g", "_t", F.col("_c").alias("_cg"), F.coalesce("_cb", F.lit(0)).alias("_cb")
    )
    # terms only in the base vocabulary, replicated per group
    groups = others.select("_g").distinct()
    base_only = (
        groups.crossJoin(base)
        .join(others.select("_g", "_t"), ["_g", "_t"], "left_anti")
        .select("_g", "_t", F.lit(0).alias("_cg"), F.col("_cb"))
    )
    rows = in_g.unionByName(base_only)

    joined = (
        rows.join(F.broadcast(totals.where(F.col("_g") != base_group)), "_g")
        .crossJoin(F.broadcast(base_tot))
    )
    p = F.col("_cg").cast("double") / F.col("_tot")
    q = F.col("_cb").cast("double") / F.col("_totb")
    m = (p + q) / F.lit(2.0)
    contrib = (
        F.when(F.col("_cg") > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("_cb") > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return (
        joined.select(
            "_g",
            contrib.alias("_j"),
            (F.col("_cg") > 0).cast("int").alias("_ing"),
            (F.col("_cb") > 0).cast("int").alias("_inb"),
            ((F.col("_cg") > 0) & (F.col("_cb") > 0)).cast("int").alias("_shared"),
        )
        .groupBy(F.col("_g").alias(group_col))
        .agg(
            (F.round(F.sum("_j"), 6) + F.lit(0.0)).alias("js_nats"),
            F.sum("_ing").cast("long").alias("n_terms_group"),
            F.sum("_inb").cast("long").alias("n_terms_base"),
            F.sum("_shared").cast("long").alias("n_terms_shared"),
        )
    )


def collocations_pmi(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top collocations (adjacent word bigrams) ranked by pointwise
    mutual information: PMI = ln(c12 * N / (c1 * c2)) with c1/c2 the
    positional marginals (count as-first-word / as-second-word) and N
    the corpus bigram total — the classic collocation-extraction
    statistic (Church & Hanks 1990). ``min_count`` suppresses the
    low-frequency PMI explosion; ties on the 6dp score break
    lexicographically so the top-k set is deterministic.

    Scale shape: ONE pass over the corpus — explode to bigram rows
    straight into the (pair -> count) aggregate (map-side combined) —
    then the positional marginals and the scalar N all derive from the
    checkpointed pair-count table: c1(w) = Σ_w2 c12(w, w2),
    c2(w) = Σ_w1 c12(w1, w), N = Σ c12 — identical integers to
    re-counting the raw rows, but the corpus-sized bigram stream is
    shuffled once instead of held in cache and re-aggregated three
    more times. Marginal tables are vocabulary-sized (AQE broadcasts
    them when they fit); the top-k sort sees >= min_count survivors
    only.
    """
    # single-file local tables serialize the tokenize+explode on 2 of
    # 32 cores (text_profile pattern); no-op on multi-split scans
    df = ensure_min_partitions(df)
    toks = tokenize(F.col(text_col), "word")
    bg = F.when(
        F.size(toks) < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        )
    )
    pairs = (
        df.select(F.explode(bg).alias("_b"))
        .select(F.col("_b.w1").alias("_w1"), F.col("_b.w2").alias("_w2"))
    )
    c12 = register_checkpoint(
        pairs.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c12"))
    )
    c1 = c12.groupBy("_w1").agg(F.sum("_c12").alias("_c1"))
    c2 = c12.groupBy("_w2").agg(F.sum("_c12").alias("_c2"))
    n = c12.agg(F.sum("_c12").alias("_n"))
    scored = (
        c12.where(F.col("_c12") >= min_count)
        .join(c1, "_w1")
        .join(c2, "_w2")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_pmi",
            F.round(
                F.log(
                    F.col("_c12").cast("double") * F.col("_n").cast("double")
                    / (F.col("_c1").cast("double") * F.col("_c2").cast("double"))
                )
                + F.lit(0.0),
                6,
            ),
        )
    )
    return (
        scored.orderBy(
            F.col("_pmi").desc(), F.col("_w1").asc(), F.col("_w2").asc()
        )
        .limit(top_k)
        .select(
            F.col("_w1").alias("w1"),
            F.col("_w2").alias("w2"),
            F.col("_c12").cast("long").alias("n_pair"),
            F.col("_pmi").alias("pmi"),
        )
    )


def langid_confusion(
    df: DataFrame,
    text_col: str,
    label_col: str,
) -> DataFrame:
    """Confusion matrix of the built-in heuristic language identifier
    against a labeled column: per (actual, predicted) cell the exact
    count and the within-actual recall share — the eval harness for the
    curation pipeline's language router. One classify map (pure column
    expressions) + one cell shuffle; actual-class totals broadcast.

    Repartitions narrow single-file inputs first (the text_profile /
    char-entropy pattern): the per-language marker votes are pure CPU
    and a one-file local table would serialize them on 2 of 32 cores;
    on a real cluster the scan already has enough splits — no-op."""
    df = ensure_min_partitions(df)
    pred = df.select(
        F.col(label_col).alias("actual"),
        lang_id(F.col(text_col)).alias("predicted"),
    ).where(F.col("actual").isNotNull())
    cells = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = cells.groupBy("actual").agg(F.sum("n").alias("_tot"))
    return cells.join(F.broadcast(totals), "actual").select(
        "actual",
        "predicted",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("_tot").cast("double")
            + F.lit(0.0),
            6,
        ).alias("share_of_actual"),
    )


def zipf_fit(df: DataFrame, text_col: str, top_n: int = 1000) -> DataFrame:
    """Zipf's-law fit over the corpus term-frequency distribution:
    OLS of ln(freq) on ln(rank) for the ``top_n`` most frequent terms
    (rank ties broken alphabetically). One row out: (n_terms, slope,
    intercept, r2) — a healthy natural-language corpus has slope near
    -1; a template/spam-heavy one flattens or cliffs, so the slope is
    a cheap corpus-level quality gate.

    Exactness: term counts are integers; ln values are fixed to 6dp
    DECIMAL per term, the OLS moments are exact DECIMAL sums, and the
    slope/intercept/r2 are fixed-order double expressions — fully
    partition-invariant. The ranking window runs over the distinct-term
    table (vocabulary-sized, not corpus-sized)."""
    from pyspark.sql import Window

    # CPU-heavy narrow stage over a possibly single-split local scan:
    # spread first (no-op at real scale where the scan is already wide)
    df = ensure_min_partitions(df)
    toks = df.select(
        F.explode(tokenize(F.col(text_col), "word")).alias("_t")
    )
    tf = toks.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    w = Window.orderBy(F.col("_c").desc(), F.col("_t").asc())
    ranked = (
        tf.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= top_n)
        .select(
            F.round(F.log(F.col("_r").cast("double")), 6)
            .cast("decimal(18,6)")
            .alias("_x"),
            F.round(F.log(F.col("_c").cast("double")), 6)
            .cast("decimal(18,6)")
            .alias("_y"),
        )
    )
    mom = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return mom.select(
        "n_terms",
        F.round(slope + F.lit(0.0), 6).alias("slope"),
        F.round(intercept + F.lit(0.0), 6).alias("intercept"),
        F.round(r2 + F.lit(0.0), 6).alias("r2"),
    )


def heaps_vocab_growth(
    df: DataFrame, id_col: str, text_col: str, every: int = 100
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: scanning documents in
    ``id_col`` order, emit (docs_seen, cum_tokens, cum_vocab) at every
    ``every``-th document (plus the final point). All-integer exact.
    The V(n) ~ K*n^beta curve is the dedup/diversity health check —
    a corpus whose vocabulary stops growing is repeating itself.

    Plan: one (term -> min doc) aggregate charges each term to the doc
    that introduced it, one per-doc token count, then cumulative sums
    over the doc-count-sized frame (a prefix sum, not corpus-sized
    state). No per-doc vocabulary sets are ever materialized."""
    from pyspark.sql import Window

    # CPU-heavy narrow stage over a possibly single-split local scan:
    # spread first (no-op at real scale where the scan is already wide)
    df = ensure_min_partitions(df)
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokenize(F.col(text_col), "word")).alias("_t"),
    )
    toks = register_cache(toks.cache())
    per_doc = toks.groupBy("_doc").agg(
        F.count(F.lit(1)).cast("long").alias("_m")
    )
    first = toks.groupBy("_t").agg(F.min("_doc").alias("_fd"))
    new_terms = first.groupBy(F.col("_fd").alias("_doc")).agg(
        F.count(F.lit(1)).cast("long").alias("_nv")
    )
    j = register_cache(
        per_doc.join(new_terms, "_doc", "left").select(
            "_doc", "_m", F.coalesce("_nv", F.lit(0)).alias("_nv")
        ).cache()
    )
    # global prefix sums WITHOUT the single-partition window the plain
    # Window.orderBy would plan — bucketed by percentile boundaries of
    # _doc, exact and bit-identical at any bucket count (guide §2.5;
    # the frame is one row per DOC, corpus-sized at scale)
    from weaviate_spark.operators.running import RunningAgg, bucketed_running

    c = bucketed_running(
        j,
        F.col("_doc"),
        [F.col("_doc").asc()],
        [
            RunningAgg("cum_tokens", F.col("_m")),
            RunningAgg("cum_vocab", F.col("_nv")),
        ],
        rank_col="_rn",
        total_col="_tot",
    )
    return c.where(
        (F.col("_rn") % every == 0) | (F.col("_rn") == F.col("_tot"))
    ).select(
        F.col("_rn").cast("long").alias("docs_seen"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-group n-gram novelty: scanning docs in id order, a doc's
    novelty is the fraction of its distinct word n-grams whose FIRST
    corpus occurrence is this doc (RefinedWeb-style freshness signal —
    boilerplate and near-dupe tails score near 0). Output one row per
    ``group_col`` value: (group, n_docs, mean_novelty, n_all_novel).

    Plan: one (shingle -> min doc) aggregate + one join back on the
    shingle — the exact-substring-dedup shape; no doc pairs. Novelty
    is fixed to 6dp DECIMAL before the per-group mean."""
    from weaviate_spark.operators.dedup import shingle_df

    sh = shingle_df(df, id_col, text_col, n=n)
    sh = register_cache(sh.cache())
    owner = sh.groupBy("_shingle").agg(F.min("_doc").alias("_own"))
    per_doc = (
        sh.join(owner, "_shingle")
        .groupBy("_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_tot"),
            F.sum(F.when(F.col("_own") == F.col("_doc"), 1).otherwise(0))
            .cast("long")
            .alias("_new"),
        )
        .select(
            "_doc",
            F.round(
                F.col("_new").cast("double") / F.col("_tot").cast("double"),
                6,
            )
            .cast("decimal(10,6)")
            .alias("_nov"),
        )
    )
    labeled = per_doc.join(
        df.select(
            F.col(id_col).alias("_doc"), F.col(group_col).alias("_g")
        ),
        "_doc",
    )
    return labeled.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum("_nov").cast("double") / F.count(F.lit(1)) + F.lit(0.0), 6
        ).alias("mean_novelty"),
        F.sum(F.when(F.col("_nov") == F.lit(1.0).cast("decimal(10,6)"), 1)
              .otherwise(0)).cast("long").alias("n_all_novel"),
    )


def char_entropy_by_group(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group character-entropy profile: each doc's Shannon entropy
    over its lowercased character distribution (the gibberish / binary
    -paste / low-information text gate — natural language sits near
    4.1 bits, base-e here; 'aaaa...' spam near 0), then per group:
    (group, n_docs, mean_entropy, min_entropy, max_entropy).

    Exactness: per-(doc, char) counts are integers; each p*ln(p) term
    is rounded to 6dp and summed as exact DECIMAL (the image-histogram
    entropy recipe), so per-doc entropies — and their per-group means
    via a second exact DECIMAL sum — are partition-invariant. Plan:
    one character explode (narrow), two keyed aggregates. The explode
    splits the text into single-char array elements FIRST: exploding a
    position sequence next to the intact text column materialized the
    whole document string into every per-character row (doc_len copies
    of the doc through the explode — measured 29.6 s -> 12.6 s at sf1);
    the single-file repartition guard applies as everywhere else."""
    df = ensure_min_partitions(df)
    chars = df.select(
        F.col(id_col).alias("_doc"),
        F.lower(F.col(text_col)).alias("_t"),
    ).filter(
        # Empty docs are excluded (matching the oracle's range(1, len+1)
        # semantics).
        F.length("_t") > 0
    ).select(
        "_doc",
        # split('', limit=-1) yields exactly the single chars (no
        # trailing '' — parity with substring(_t, i, 1) over 1..len)
        F.explode(F.split(F.col("_t"), "", -1)).alias("_c"),
    ).where(F.col("_c") != "")
    cc = chars.groupBy("_doc", "_c").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    tot = cc.groupBy("_doc").agg(F.sum("_n").cast("long").alias("_tot"))
    terms = cc.join(tot, "_doc").select(
        "_doc",
        F.round(
            (F.col("_n").cast("double") / F.col("_tot").cast("double"))
            * F.log(
                F.col("_n").cast("double") / F.col("_tot").cast("double")
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("_term"),
    )
    per_doc = terms.groupBy("_doc").agg(
        (-F.sum("_term")).cast("decimal(18,6)").alias("_h")
    )
    labeled = per_doc.join(
        df.select(F.col(id_col).alias("_doc"), F.col(group_col).alias("_g")),
        "_doc",
    )
    return labeled.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum("_h").cast("double") / F.count(F.lit(1)) + F.lit(0.0), 6
        ).alias("mean_entropy"),
        F.min("_h").cast("double").alias("min_entropy"),
        F.max("_h").cast("double").alias("max_entropy"),
    )


def length_histogram_by_group(
    df: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Log2-bucketed token-length histogram per group: bucket =
    floor(log2(n_tokens)) (0-token docs in bucket -1) — the
    sequence-length profile a packing/truncation policy is tuned
    against. All-integer: the bucket comes from integer bit length,
    not float log. Output: (group, length_bucket, bucket_min_tokens,
    n_docs, total_tokens)."""
    toks = F.size(tokenize(F.col(text_col), "word"))
    base = df.select(
        F.col(group_col).alias("_g"), toks.alias("_n")
    )
    # floor(log2(n)) for n >= 1 == bit_length(n) - 1, via hex of BIGINT:
    # use repeated comparison-free arithmetic: shiftright until zero is
    # not expressible; log2 on the INTEGER is safe — exact for the
    # bucket DECISION because we re-floor against the integer bound.
    withb = base.withColumn(
        "_b0",
        F.when(F.col("_n") <= 0, F.lit(-1)).otherwise(
            F.floor(F.log2(F.col("_n").cast("double"))).cast("int")
        ),
    )
    # guard against float log landing a power of two in the wrong
    # bucket: recompute the bound and correct by integer comparison
    bucket = F.when(F.col("_n") <= 0, F.lit(-1)).otherwise(
        F.when(
            F.expr("shiftleft(CAST(1 AS BIGINT), _b0 + 1)") <= F.col("_n"),
            F.col("_b0") + 1,
        )
        .when(
            F.expr("shiftleft(CAST(1 AS BIGINT), _b0)") > F.col("_n"),
            F.col("_b0") - 1,
        )
        .otherwise(F.col("_b0"))
    )
    binned = withb.withColumn("_b", bucket.cast("int"))
    return binned.groupBy(
        F.col("_g").alias(group_col), F.col("_b").alias("length_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_n").cast("long").alias("total_tokens"),
    ).withColumn(
        "bucket_min_tokens",
        F.when(F.col("length_bucket") < 0, F.lit(0)).otherwise(
            F.expr("shiftleft(CAST(1 AS BIGINT), length_bucket)")
        ).cast("long"),
    ).select(
        group_col, "length_bucket", "bucket_min_tokens", "n_docs",
        "total_tokens",
    )


def rake_keyphrases(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 15,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; word score = degree/freq
    where degree sums the lengths of every phrase containing the word;
    a phrase scores the sum of its words' scores. Corpus-level top-k
    by (score desc, phrase asc) over DISTINCT phrase texts — the
    no-model keyphrase extractor next to TF-IDF keywords.

    Exactness: freq/degree are integers; word scores are fixed to 6dp
    DECIMAL; phrase scores are exact decimal sums of those — fully
    engine-portable. Plan: one posexplode + islands window per doc,
    one word-stats aggregate (vocabulary-sized), one phrase join."""
    from pyspark.sql import Window

    words = stopwords or EN_STOPWORDS
    # CPU-heavy narrow stage over a possibly single-split local scan:
    # spread first (no-op at real scale where the scan is already wide)
    df = ensure_min_partitions(df)
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(tokenize(F.col(text_col), "word")).alias("_pos", "_w"),
    )
    nonstop = toks.where(~F.col("_w").isin(words))
    w = Window.partitionBy("_doc").orderBy("_pos")
    isl = nonstop.withColumn("_grp", F.col("_pos") - F.row_number().over(w))
    phrases = isl.groupBy("_doc", "_grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_w"))),
                lambda s: s["_w"],
            ),
        ).alias("_phrase"),
        F.count(F.lit(1)).cast("long").alias("_len"),
    )
    occurrences = phrases.select(
        "_phrase", "_len", F.explode(F.split("_phrase", " ")).alias("_w")
    )
    wstats = occurrences.groupBy("_w").agg(
        F.count(F.lit(1)).cast("long").alias("_freq"),
        F.sum("_len").cast("long").alias("_deg"),
    ).select(
        "_w",
        F.round(
            F.col("_deg").cast("double") / F.col("_freq").cast("double"), 6
        )
        .cast("decimal(18,6)")
        .alias("_ws"),
    )
    per_phrase = (
        # one row per DISTINCT phrase text (its word multiset — and so
        # its score — is the same wherever it occurs)
        phrases.select("_phrase", "_len").distinct()
        .select(
            "_phrase", "_len",
            F.explode(F.split("_phrase", " ")).alias("_w"),
        )
        .join(wstats, "_w")
        .groupBy("_phrase")
        .agg(
            F.first("_len").alias("n_words"),
            F.sum("_ws").cast("decimal(18,6)").alias("_score"),
        )
    )
    return (
        per_phrase.select(
            F.col("_phrase").alias("phrase"),
            F.col("n_words").cast("long").alias("n_words"),
            F.col("_score").cast("double").alias("rake_score"),
        )
        .orderBy(F.col("rake_score").desc(), F.col("phrase").asc())
        .limit(top_k)
    )
