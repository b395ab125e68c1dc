"""Deterministic cardinality sketches: HyperLogLog and K-Minimum-Values.

At 100 TB a ``count(distinct)`` over a high-cardinality key is a full
shuffle of every distinct value; these sketches answer the same question
from a bounded state (2^p registers / k hashes) with one map-side-
combinable aggregation. Unlike Spark's built-in ``approx_count_distinct``
(whose HLL++ register layout is opaque to other engines), both sketches
here are built from md5 arithmetic that any SQL engine can replay exactly
— so the ESTIMATES themselves are oracle-checkable, not just the exact
counts they approximate. (Flajolet et al., "HyperLogLog: the analysis of
a near-optimal cardinality estimation algorithm", AofA 2007; Bar-Yossef
et al.'s KMV / "Counting distinct elements in a data stream", RANDOM
2002.)

Determinism notes:
* The 60-bit hash is ``conv(substr(md5(v),1,15),16,10)`` — 15 hex chars
  so the value fits a signed 64-bit int in both Spark and DuckDB.
* The HLL harmonic sum Σ 2^-rho is computed as the INTEGER sum
  Σ 2^(S-rho) (S=49) in DECIMAL — exact, order-independent, so the
  final double estimate is bit-identical across engines and partition
  counts (a double Σ 2^-rho would drift in the last bits with the
  reduction order).
* Empty registers participate with rho=0, as the raw-estimate formula
  requires; the linear-counting small-range correction uses their count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 hex chars of md5 -> fits bigint in Spark AND DuckDB


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def hll_alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al. §4, figure 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """One row: (hll_estimate, n_registers) for ``count(distinct col)``.

    Register = top ``p`` hash bits; rho = leading-zero run of the
    remaining ``60-p`` bits + 1 (computed as bit-length arithmetic via
    ``bin()``, no floating log). Includes the standard small-range
    linear-counting correction. State is 2^p registers regardless of
    input size; the aggregation is a plain groupBy(register).max —
    map-side combined, one tiny shuffle.
    """
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4,16], got {p}")
    m = 1 << p
    tail_bits = _HASH_BITS - p
    s = tail_bits + 1  # rho <= tail_bits + 1 = s, so 2^(s - rho) >= 1

    # pure bit ops — a double division here would corrupt registers for
    # hashes above 2^53
    h = _hash60(F.col(col))
    reg = F.shiftright(h, tail_bits).alias("_reg")
    w = h.bitwiseAND(F.lit((1 << tail_bits) - 1)).alias("_w")
    rho = (
        F.when(F.col("_w") == 0, F.lit(tail_bits + 1))
        .otherwise(F.lit(tail_bits) - F.length(F.bin(F.col("_w"))) + 1)
    ).alias("_rho")

    regs = (
        df.where(F.col(col).isNotNull())
        .select(reg, w)
        .select("_reg", rho)
        .groupBy("_reg")
        .agg(F.max("_rho").alias("_rho"))
    )
    # exact integer harmonic sum: empty registers contribute 2^(s-0)
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), F.lit(s) - F.col("_rho")).cast("decimal(38,0)"))
        .alias("_occupied_sum"),
        F.count(F.lit(1)).alias("_n_occupied"),
    )
    alpha = hll_alpha(m)
    total = (
        F.col("_occupied_sum")
        + (F.lit(m) - F.col("_n_occupied")).cast("decimal(38,0)") * F.lit(1 << s)
    ).cast("double")
    raw = F.lit(alpha * m * m * float(1 << s)) / total
    zeros = (F.lit(m) - F.col("_n_occupied")).cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        F.round(est, 4).alias("hll_estimate"),
        F.lit(m).cast("bigint").alias("n_registers"),
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One row: (kmv_estimate, k) — (k-1)/v_k scaled to the 60-bit hash
    space. The k smallest DISTINCT hashes arrive via TakeOrdered (no
    global sort); with fewer than k distinct values the estimate falls
    back to the exact distinct count.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    hashes = (
        df.where(F.col(col).isNotNull())
        .select(_hash60(F.col(col)).alias("_h"))
        .distinct()
    )
    topk = hashes.orderBy("_h").limit(k)
    return topk.agg(
        F.when(
            F.count(F.lit(1)) < k,
            F.count(F.lit(1)).cast("double"),
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(1 << _HASH_BITS)) / F.max("_h")
        )
        .alias("kmv_estimate"),
        F.lit(k).cast("bigint").alias("k"),
    )


def kmv_set_overlap(
    df_a: DataFrame, df_b: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """Union / intersection / Jaccard estimates for two keyed sets from
    their merged KMV sketch (Beyer et al., SIGMOD'07 multi-set KMV):
    take the k smallest hashes of A ∪ B, count how many fall in both
    sides; jaccard = c/k, union = (k-1)/v_k, intersection = jaccard ×
    union. Each side is sketched independently (k smallest per side —
    the only state that would ship across a cluster), so the merge sees
    at most 2k rows.
    """
    if k < 2:
        raise ValueError("k must be >= 2")

    def sketch(d: DataFrame, tag: str) -> DataFrame:
        return (
            d.where(F.col(col).isNotNull())
            .select(_hash60(F.col(col)).alias("_h"))
            .distinct()
            .orderBy("_h")
            .limit(k)
            .withColumn("_src", F.lit(tag))
        )

    merged = (
        sketch(df_a, "a").unionByName(sketch(df_b, "b"))
        .groupBy("_h")
        .agg(
            F.max(F.when(F.col("_src") == "a", 1).otherwise(0)).alias("_in_a"),
            F.max(F.when(F.col("_src") == "b", 1).otherwise(0)).alias("_in_b"),
        )
        .orderBy("_h")
        .limit(k)
    )
    return merged.agg(
        (F.sum(F.col("_in_a") * F.col("_in_b")) / F.count(F.lit(1)).cast("double"))
        .alias("jaccard_est"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(1 << _HASH_BITS)) / F.max("_h")
        )
        .alias("union_est"),
    ).select(
        "jaccard_est",
        "union_est",
        (F.col("jaccard_est") * F.col("union_est")).alias("intersect_est"),
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    width: int = 512,
    depth: int = 4,
    k: int = 20,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) + heavy-hitters
    readout, deterministic end to end: ``depth`` independent md5 hash
    rows of ``width`` counters each; an item's estimate is the MIN of
    its ``depth`` counters (always >= true count — one-sided error).
    The readout re-hashes each DISTINCT item against the sketch and
    returns the top-``k`` by (estimate desc, item asc), with the true
    count alongside so tests (and the contract oracle) can pin the
    overestimate structurally.

    Why on a batch engine: the sketch table (depth x width counter
    rows) is the MERGEABLE per-micro-batch artifact a streaming
    trending-terms pipeline maintains — counters add across batches
    and across partitions, so the same groupBy builds it incrementally
    at any scale. Plan: one explode-free pass per stage — (row, bucket)
    groupBy sized depth*width regardless of corpus, a distinct-item
    frame, and a broadcast-sized sketch join."""
    from weaviate_spark.cache import register_checkpoint

    vals = df.select(F.col(col).cast("string").alias("_v")).where(
        F.col("_v").isNotNull()
    )

    def bucket(d: int) -> Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cms{d}:"), F.col("_v"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % width
        )

    # ONE corpus pass (guide §8: decide on small rows): the distinct-item
    # counts are the only corpus aggregate; the sketch's (row, bucket)
    # counters equal the SUM of item true-counts hashing there (counting
    # occurrences row-by-row — the previous depth-way self-union of the
    # corpus — groups the identical multiset), and the probes are the
    # same item x hash-row frame. Build that frame once (explode of a
    # depth-element struct array, not a depth-way union) and checkpoint
    # it; before, the plan re-scanned the corpus once per union branch
    # per side (8 scans at depth 4).
    items = vals.groupBy("_v").agg(F.count(F.lit(1)).alias("_true"))
    pf = register_checkpoint(
        items.select(
            "_v", "_true",
            F.explode_outer(F.array(*[
                F.struct(
                    F.lit(d).alias("_row"), bucket(d).alias("_bucket"))
                for d in range(depth)
            ])).alias("_h"),
        ).select("_v", "_true", "_h._row", "_h._bucket")
    )
    sketch = pf.groupBy("_row", "_bucket").agg(
        F.sum("_true").alias("_c")
    )
    est = (
        pf.join(F.broadcast(sketch), ["_row", "_bucket"])
        .groupBy("_v", "_true")
        .agg(F.min("_c").alias("_est"))
    )
    return (
        est.select(
            F.col("_v").alias("item"),
            F.col("_est").cast("long").alias("cms_estimate"),
            F.col("_true").cast("long").alias("true_count"),
        )
        .orderBy(F.col("cms_estimate").desc(), F.col("item").asc())
        .limit(k)
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    bins: int = 64,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One-pass approximate quantiles from an equi-width histogram:
    span = [min, max] from the data, ``bins`` buckets, and each
    requested quantile reads the first bucket whose cumulative count
    reaches q*N, answering with the bucket's LEFT EDGE — a
    deterministic, mergeable approximation with error bounded by one
    bucket width. The scale story next to the exact percentile
    aggregators: exact quantiles need a sort (or two-pass
    selection); the histogram is a single groupBy of width ``bins``
    whose counter rows add across partitions, micro-batches, and
    cluster sizes — the same mergeable-artifact shape as the CMS/HLL
    sketches here.

    Returns (quantile, estimate, bucket_idx, bucket_count, n). The
    max value clamps into the last bucket (the standard closed right
    edge)."""
    from weaviate_spark.cache import register_checkpoint

    # Two corpus passes are inherent (min/max before bucketing); they
    # must not MULTIPLY: the 1-row stats frame used to rebuild its scan
    # per broadcast reference (the bucketing pass + one per quantile
    # leg), and each quantile leg re-executed the histogram lineage —
    # 9 corpus scans at 3 quantiles in the executed plan. Checkpoint the
    # 1-row stats and the <= bins-row cumulative frame once; the legs
    # replay only those leaves.
    stats = register_checkpoint(df.select(
        F.min(F.col(col).cast("double")).alias("_lo"),
        F.max(F.col(col).cast("double")).alias("_hi"),
        F.count(F.col(col)).alias("_n"),
    ))
    vals = df.select(F.col(col).cast("double").alias("_x")).where(
        F.col("_x").isNotNull()
    )
    b = vals.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor(
                (F.col("_x") - F.col("_lo"))
                / ((F.col("_hi") - F.col("_lo")) / F.lit(float(bins)))
            ).cast("bigint"),
            F.lit(bins - 1),
        ).alias("_b")
    )
    hist = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    cum = register_checkpoint(hist.withColumn("_cum", F.sum("_c").over(w)))
    out = None
    for q in quantiles:
        pick = (
            cum.crossJoin(F.broadcast(stats))
            .where(F.col("_cum") >= F.lit(float(q)) * F.col("_n"))
            .orderBy("_b")
            .limit(1)
            .select(
                F.lit(float(q)).alias("quantile"),
                (
                    F.round(
                        F.col("_lo")
                        + F.col("_b")
                        * ((F.col("_hi") - F.col("_lo")) / F.lit(float(bins))),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("estimate"),
                F.col("_b").cast("long").alias("bucket_idx"),
                F.col("_c").cast("long").alias("bucket_count"),
                F.col("_n").cast("long").alias("n"),
            )
        )
        out = pick if out is None else out.unionByName(pick)
    return out


def bloom_membership(
    build: DataFrame,
    probe: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    m_bits: int = 8192,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter decontamination: build an ``m_bits``-bit filter
    (``k_hashes`` md5 hash functions) over the BUILD corpus's word
    n-gram shingles, probe every PROBE doc's shingles against it, and
    report per doc the bloom-positive count NEXT TO the exact-join
    count — so the one-sided error is visible in the result (bloom can
    only overcount: n_false_pos = bloom - exact >= 0, never misses).

    Why next to the exact semi-join (contamination_scores): the bloom
    bits table is <= m_bits rows no matter how big the holdout corpus
    is — it BROADCASTS at any scale, replacing the shuffle semi-join
    against a billion-shingle benchmark with a map-side filter (the
    classic bloom-pushdown shape). The filter is mergeable (bitwise OR
    = union of set-bit rows), so it maintains incrementally like the
    other sketch artifacts here."""
    from weaviate_spark.cache import register_checkpoint
    from weaviate_spark.operators.dedup import shingle_df

    def bit(j: int) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bloom{j}:"), F.col("_shingle"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % m_bits
        )

    # The shingle pipelines (regex tokenize + n-gram assembly + explode)
    # are the expensive full-text stages; each used to re-execute once
    # per hash-function union branch plus once per downstream aggregate
    # (9 corpus scans in the executed plan). Checkpoint each shingle
    # frame once, and emit the k bloom bits per shingle with ONE explode
    # of a k-element array instead of a k-way self-union — identical
    # (shingle, bit) multiset, one pass (guide §2.4).
    k_bits = F.array(*[bit(j) for j in range(k_hashes)])
    bsh = register_checkpoint(
        shingle_df(build, id_col, text_col, n).select("_shingle").distinct()
    )
    bits = (
        bsh.select(F.explode_outer(k_bits).alias("_bit")).distinct()
    )

    psh = register_checkpoint(shingle_df(probe, id_col, text_col, n))
    probe_bits = psh.select(
        "_doc", "_shingle", F.explode_outer(k_bits).alias("_bit")
    )
    hits = (
        probe_bits.join(F.broadcast(bits), "_bit", "left_semi")
        .groupBy("_doc", "_shingle")
        .agg(F.count(F.lit(1)).alias("_set"))
        .where(F.col("_set") == k_hashes)
        .groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("n_bloom_pos"))
    )
    exact = (
        psh.join(bsh, "_shingle", "left_semi")
        .groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    totals = psh.groupBy("_doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(hits, "_doc", "left")
        .join(exact, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce("n_bloom_pos", F.lit(0)).cast("long").alias("n_bloom_pos"),
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            (
                F.coalesce("n_bloom_pos", F.lit(0))
                - F.coalesce("n_exact", F.lit(0))
            ).cast("long").alias("n_false_pos"),
        )
    )


def hll_group_registers(
    df: DataFrame, col: str, group_expr: Column, group_name: str, p: int = 12
) -> DataFrame:
    """Occupied HLL registers per group: (group, _reg, _rho) with
    rho = max over the group's values — the MERGEABLE sketch state.
    At most 2^p rows per group regardless of group size; register
    tables for different partitions of the data merge by
    groupBy(_reg).max(_rho), which is what makes HLL the right
    distinct-count structure for 100 TB: sketch each day/segment once
    at ingest, answer any period by merging tiny register tables
    instead of rescanning events."""
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4,16], got {p}")
    tail_bits = _HASH_BITS - p
    h = _hash60(F.col(col))
    reg = F.shiftright(h, tail_bits).alias("_reg")
    w = h.bitwiseAND(F.lit((1 << tail_bits) - 1)).alias("_w")
    rho = (
        F.when(F.col("_w") == 0, F.lit(tail_bits + 1))
        .otherwise(F.lit(tail_bits) - F.length(F.bin(F.col("_w"))) + 1)
    ).alias("_rho")
    return (
        df.where(F.col(col).isNotNull())
        .select(group_expr.alias(group_name), reg, w)
        .select(group_name, "_reg", rho)
        .groupBy(group_name, "_reg")
        .agg(F.max("_rho").alias("_rho"))
    )


def hll_estimate_registers(
    regs: DataFrame, group_name: str, p: int = 12, out: str = "hll_estimate"
) -> DataFrame:
    """(group, estimate) from a register table produced by
    ``hll_group_registers`` (or any max-merge of such tables). Same
    arithmetic as ``hll_distinct``: exact DECIMAL harmonic sum +
    small-range linear counting."""
    m = 1 << p
    s = _HASH_BITS - p + 1
    agg = regs.groupBy(group_name).agg(
        F.sum(F.pow(F.lit(2.0), F.lit(s) - F.col("_rho")).cast("decimal(38,0)"))
        .alias("_osum"),
        F.count(F.lit(1)).alias("_nocc"),
    )
    alpha = hll_alpha(m)
    total = (
        F.col("_osum")
        + (F.lit(m) - F.col("_nocc")).cast("decimal(38,0)") * F.lit(1 << s)
    ).cast("double")
    raw = F.lit(alpha * m * m * float(1 << s)) / total
    zeros = (F.lit(m) - F.col("_nocc")).cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return agg.select(group_name, F.round(est, 4).alias(out))


# ---------------------------------------------------------------------------
# Streaming-maintained HLL register stores: the distinct-count analogue
# of the BM25/vector index upkeep — each ingest batch folds its O(batch)
# register sketch into a <= 2^p-row state, so "how many distinct X so
# far" never rescans the table. Registries are keyed by SparkContext id
# (cache.session_key) because foreachBatch hands sinks a cloned session
# wrapper.

import threading as _threading

_hll_lock = _threading.RLock()
_hll_stores: dict = {}


def invalidate_hll_sketches() -> None:
    with _hll_lock:
        _hll_stores.clear()


def append_to_hll_sketch(
    batch_df: DataFrame,
    col: str,
    key: tuple,
    group_col: str | None = None,
    p: int = 12,
) -> None:
    """Fold one batch into the session's HLL register store for ``key``
    (optionally per ``group_col``). O(batch) sketch + O(registers)
    max-merge, lineage checkpoint-truncated per fold."""
    from weaviate_spark.cache import session_key

    gname = group_col if group_col is not None else "_all"
    gexpr = F.col(group_col) if group_col is not None else F.lit(1)
    regs = hll_group_registers(batch_df, col, gexpr, gname, p=p)
    skey = (session_key(batch_df.sparkSession), *key, gname, p)
    with _hll_lock:
        old = _hll_stores.get(skey)
        if old is not None:
            regs = (
                old.unionByName(regs)
                .groupBy(gname, "_reg")
                .agg(F.max("_rho").alias("_rho"))
            )
        _hll_stores[skey] = regs.localCheckpoint(eager=True)


def hll_sketch_estimate(
    spark, key: tuple, group_col: str | None = None, p: int = 12
) -> DataFrame:
    """(group, hll_estimate) from the maintained register store — the
    read path touches only the register state, never the table."""
    from weaviate_spark.cache import session_key

    gname = group_col if group_col is not None else "_all"
    skey = (session_key(spark), *key, gname, p)
    with _hll_lock:
        regs = _hll_stores.get(skey)
    if regs is None:
        raise KeyError(f"no HLL sketch maintained under {key!r}")
    return hll_estimate_registers(regs, gname, p=p)


# ---------------------------------------------------------------------------
# Streaming count-min maintenance (the trending-counts analogue of the
# HLL register store above: mergeable counters advanced per micro-batch)

_cms_lock = _threading.RLock()
_cms_stores: dict = {}


def _cms_hash(v: Column, d: int, width: int) -> Column:
    """Row-``d`` bucket for value ``v`` — the SAME md5 construction
    cms_heavy_hitters uses, so maintained and batch-built sketches are
    bit-identical."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{d}:"), v)), 1, 8), 16, 10
        ).cast("bigint")
        % width
    )


def invalidate_cms_sketches() -> None:
    with _cms_lock:
        _cms_stores.clear()


def append_to_cms_sketch(
    batch_df: DataFrame,
    col: str,
    key: tuple,
    width: int = 512,
    depth: int = 4,
) -> None:
    """Fold one batch into the session's count-min store for ``key``:
    counters ADD across batches (the mergeable-sketch property), and a
    distinct-items candidate frame (vocabulary-sized) is maintained
    alongside so heavy-hitter readouts never rescan the table. O(batch)
    hash work + O(depth*width) counter merge per fold, lineage
    checkpoint-truncated."""
    from weaviate_spark.cache import session_key

    vals = batch_df.select(F.col(col).cast("string").alias("_v")).where(
        F.col("_v").isNotNull()
    )
    rows = None
    for d in range(depth):
        r = vals.select(
            F.lit(d).alias("_row"), _cms_hash(F.col("_v"), d, width).alias("_bucket")
        )
        rows = r if rows is None else rows.unionByName(r)
    counters = rows.groupBy("_row", "_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    items = vals.distinct()
    skey = (session_key(batch_df.sparkSession), *key, width, depth)
    with _cms_lock:
        old = _cms_stores.get(skey)
        if old is not None:
            oc, oi = old
            counters = (
                oc.unionByName(counters)
                .groupBy("_row", "_bucket")
                .agg(F.sum("_c").cast("long").alias("_c"))
            )
            items = oi.unionByName(items).distinct()
        _cms_stores[skey] = (
            counters.localCheckpoint(eager=True),
            items.localCheckpoint(eager=True),
        )


def cms_sketch_topk(
    spark,
    key: tuple,
    k: int = 20,
    width: int = 512,
    depth: int = 4,
) -> DataFrame:
    """Top-``k`` heavy hitters from the MAINTAINED sketch: probe every
    candidate item against the counter store (min over depth rows,
    one-sided overestimate) — reads only sketch state, never the table.
    Deterministic (estimate desc, item asc) output: (item,
    cms_estimate)."""
    from weaviate_spark.cache import session_key

    skey = (session_key(spark), *key, width, depth)
    with _cms_lock:
        entry = _cms_stores.get(skey)
    if entry is None:
        raise KeyError(f"no count-min sketch maintained under {key!r}")
    counters, items = entry
    probes = None
    for d in range(depth):
        p = items.select(
            "_v", F.lit(d).alias("_row"),
            _cms_hash(F.col("_v"), d, width).alias("_bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    est = (
        probes.join(F.broadcast(counters), ["_row", "_bucket"])
        .groupBy("_v")
        .agg(F.min("_c").cast("long").alias("cms_estimate"))
    )
    return (
        est.select(F.col("_v").alias("item"), "cms_estimate")
        .orderBy(F.col("cms_estimate").desc(), F.col("item").asc())
        .limit(k)
    )
