"""Vector quantization: binary (BQ) and scalar (SQ) with exact rescore.

Reference semantics (adapters/repos/db/vector/flat/index.go:60-131 — the
flat index's BQ path; entities/vectorindex/compression/): vectors are
compressed at ingest; search scans the compressed column, overfetches
candidates by the cheap compressed distance, then rescores the candidate
set with the exact distance over the original vectors.

Spark shape:

* ``bq_encode``  — sign bit per dimension (x > 0), packed 32 dims per
  BIGINT word (32, not 64, so the same packing is expressible in the
  duckdb oracle without unsigned/sign-bit edge cases). Pure column
  expression — encoding is a narrow map, no shuffle.
* ``with_bq_index`` — session-persisted encoded table (ingest artifact,
  like the BM25 postings and dedup shingle/signature tables). At real
  scale this is a written table column, maintained on ingest.
* ``bq_topk`` — hamming-distance overfetch (bit_count of xor per word —
  whole-stage-codegen integer ops, ~dim/32 instructions per row instead
  of dim float multiplies) -> TakeOrderedAndProject of the candidate
  ids -> exact-metric rescore of only those candidates -> final top-k.
  Both stages are deterministic: ties break by id, so the candidate SET
  is a pure function of the data and the oracle can mirror it.
* ``sq_encode`` / ``sq_distance`` — scalar quantization to int8 against
  fixed per-collection [min, max] bounds (the reference trains bounds on
  a sample at ingest; here callers pass them), distance over the int8
  codes; same overfetch/rescore pattern.

Scale: encode/hamming are narrow per-row expressions over the (possibly
bucketed) collection scan; the only shuffle is the top-k merge, and the
exact rescore touches overfetch*k rows, not the corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from weaviate_spark.functions.distance import distance
from weaviate_spark.sources.tables import load_table

BITS_PER_WORD = 32


def _n_words(dim: int) -> int:
    return (dim + BITS_PER_WORD - 1) // BITS_PER_WORD


def bq_word(vector_col: Column, word: int, dim: int) -> Column:
    """One packed word: bit j set iff vector[word*32 + j] > 0."""
    lo = word * BITS_PER_WORD
    width = min(BITS_PER_WORD, dim - lo)
    acc = F.lit(0).cast("long")
    for j in range(width):
        bit = F.when(
            F.element_at(vector_col, lo + j + 1) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        acc = acc + bit
    return acc


def bq_encode(vector_col: Column, dim: int) -> list[Column]:
    """All packed words for a `dim`-dimensional vector column."""
    return [bq_word(vector_col, w, dim) for w in range(_n_words(dim))]


def bq_encode_py(vector: Sequence[float]) -> list[int]:
    """Driver-side encoding of the query vector (same convention)."""
    words = [0] * _n_words(len(vector))
    for i, x in enumerate(vector):
        if x > 0:
            words[i // BITS_PER_WORD] |= 1 << (i % BITS_PER_WORD)
    return words


def hamming_col(word_cols: Sequence[Column], query_words: Sequence[int]) -> Column:
    """Hamming distance between packed signatures: sum of
    bit_count(word XOR query_word)."""
    acc = F.lit(0)
    for c, qw in zip(word_cols, query_words):
        acc = acc + F.bit_count(c.bitwiseXOR(F.lit(qw).cast("long")))
    return acc


# session-persisted encoded tables (ingest-time artifact)
_bq_tables: dict[tuple, DataFrame] = {}


def invalidate_bq_index() -> None:
    for frame in _bq_tables.values():
        try:
            frame.unpersist()
        except Exception:
            pass
    _bq_tables.clear()


def with_bq_index(
    df: DataFrame, id_col: str, vector_col: str, dim: int, table_key: tuple
) -> DataFrame:
    """(id, vector, _bq0.._bqN) — encoded collection, built once per
    session (flat/index.go:60-78 compresses at ingest, not per query)."""
    key = (id(df.sparkSession), *table_key, dim)
    if key not in _bq_tables:
        enc = df.select(
            id_col,
            vector_col,
            *[c.alias(f"_bq{w}") for w, c in enumerate(bq_encode(F.col(vector_col), dim))],
        ).cache()
        enc.count()  # materialize now
        _bq_tables[key] = enc
    return _bq_tables[key]


def bq_topk(
    spark: SparkSession,
    sf_dir: str,
    collection: str,
    vector: Sequence[float],
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    k: int = 10,
    overfetch: int = 4,
    metric: str = "cosine",
    round_digits: int = 6,
    table_key: tuple | None = None,
) -> DataFrame:
    """BQ search: hamming overfetch of `overfetch * k` candidates over the
    packed words, exact-`metric` rescore of only those candidates
    (flat/index.go:96-131 searchTimeRescore). Returns (id, _distance)
    top-k, distance asc / id asc."""
    dim = len(vector)
    base = load_table(spark, sf_dir, collection)
    if table_key is not None:
        enc = with_bq_index(base, id_col, vector_col, dim, table_key)
    else:
        enc = base.select(
            id_col,
            vector_col,
            *[c.alias(f"_bq{w}") for w, c in enumerate(bq_encode(F.col(vector_col), dim))],
        )
    qwords = bq_encode_py(vector)
    word_cols = [F.col(f"_bq{w}") for w in range(_n_words(dim))]
    candidates = (
        # null vectors would encode to all-zero codes and float to the
        # top of the hamming order; the reference simply has no vector
        # to index for them, so drop them before candidate selection
        enc.where(F.col(vector_col).isNotNull())
        .withColumn("_hamming", hamming_col(word_cols, qwords))
        .orderBy(F.col("_hamming").asc(), F.col(id_col).asc())
        .limit(overfetch * k)
    )
    qv = F.array(*[F.lit(float(x)) for x in vector])
    rescored = candidates.withColumn(
        "_distance",
        F.round(distance(F.col(vector_col), qv, metric), round_digits),
    )
    return (
        rescored.select(id_col, "_distance")
        .orderBy(F.col("_distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# scalar quantization (int8 codes against fixed bounds)

def sq_encode(vector_col: Column, lo: float, hi: float) -> Column:
    """int8 codes: round((x - lo) / (hi - lo) * 255) clamped to [0, 255]
    (compression/scalar_quantizer — bounds trained at ingest; here they
    are caller-supplied constants)."""
    span = hi - lo
    # floor(x + 0.5), not F.round: keeps the rounding rule identical to
    # sq_encode_py (python round() is half-even, F.round half-up — codes
    # at exact .5 boundaries diverged between the two paths)
    return F.transform(
        vector_col, lambda x: F.least(
            F.greatest(F.floor((x - F.lit(lo)) / F.lit(span) * 255 + F.lit(0.5)),
                       F.lit(0).cast("long")),
            F.lit(255).cast("long"),
        ).cast("int")
    )


def sq_l2_code_distance(code_col: Column, query_codes: Sequence[int]) -> Column:
    """Squared L2 over the int8 codes (monotone proxy for candidate
    selection; exact rescore follows)."""
    q = F.array(*[F.lit(int(c)) for c in query_codes])
    return F.aggregate(
        F.zip_with(code_col, q, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )


def sq_encode_py(vector: Sequence[float], lo: float, hi: float) -> list[int]:
    import math

    span = hi - lo
    out = []
    for x in vector:
        c = math.floor((x - lo) / span * 255 + 0.5)  # half-up, same as sq_encode
        out.append(int(min(max(c, 0), 255)))
    return out
