"""Tokenization / text analysis expressions (SURVEY §2.5, §2.8).

Mirrors weaviate's tokenizer modes (entities/tokenizer/tokenizer.go:279-430)
as pure Catalyst expressions — no UDFs, so tokenization stays inside
whole-stage codegen and vectorizes on the JVM side:

* ``word``       — maximal alphanumeric runs, lowercased. (The reference
  uses unicode classes; we pin ASCII ``[a-z0-9]+`` so the duckdb oracle
  can reproduce tokenization bit-for-bit. Documented divergence for
  non-ASCII text; the regex is swappable.)
* ``lowercase``  — whitespace-split, lowercased.
* ``whitespace`` — whitespace-split, case-preserving.
* ``field``      — the whole trimmed value as a single token.
* ``trigram``    — all 3-char substrings of the lowercased string
  (tokenizer.go trigram mode; used for fuzzy/gram matching).

Stopword handling (adapters/repos/db/inverted/stopwords/, preset "en"):
``remove_stopwords`` filters a token array against a standard English
stopword list (public-domain snowball subset).

The same token stream feeds BM25 (operators/bm25.py), tokenized-Equal
filters, and the text-analysis ops (operators/textstats.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_REGEX = "[a-z0-9]+"

# public-domain snowball English stopword subset (same list must be used by
# any oracle SQL that exercises stopword removal)
EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with",
]


def tokenize(col: Column, mode: str = "word") -> Column:
    """Token array for a text column under the given tokenization mode."""
    if mode == "word":
        return F.regexp_extract_all(F.lower(col), F.lit(WORD_REGEX), 0)
    if mode == "lowercase":
        return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")
    if mode == "whitespace":
        return F.filter(F.split(col, r"\s+"), lambda t: t != "")
    if mode == "field":
        return F.array(F.trim(col))
    if mode == "trigram":
        # guard: sequence(1,0) is DESCENDING [1,0] in Spark, not empty
        low = F.lower(col)
        return F.when(F.length(low) < 3, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(low) - 2),
                lambda i: low.substr(i, F.lit(3)),
            )
        )
    raise ValueError(f"unknown tokenization mode {mode!r}")


def remove_stopwords(tokens: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    return F.array_except(tokens, sw)


def tokenize_py(text: str, mode: str = "word") -> list[str]:
    """Driver-side tokenizer for query strings — must agree with
    `tokenize` exactly (same regex / splitting)."""
    import re

    if mode == "word":
        return re.findall(WORD_REGEX, text.lower())
    if mode == "lowercase":
        return [t for t in re.split(r"\s+", text.lower()) if t]
    if mode == "whitespace":
        return [t for t in re.split(r"\s+", text) if t]
    if mode == "field":
        return [text.strip()]
    if mode == "trigram":
        low = text.lower()
        return [low[i : i + 3] for i in range(max(len(low) - 2, 0))]
    raise ValueError(f"unknown tokenization mode {mode!r}")
