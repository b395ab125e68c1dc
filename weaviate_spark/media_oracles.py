"""Analytical DuckDB oracles for the media / MUVERA contract queries.

These three queries were rows-only in rounds 1-5 (their Spark side runs
python decoders / numpy kernels). They are hash-checkable after all,
because every pixel that reaches the feature extractor is analytically
derivable on the SQL side:

* the synthesized PPM corpora build their 4x4 pixel buffers from
  ``md5(text)`` digests — DuckDB recomputes the exact bytes from the
  same ``md5()`` and mirrors the mean/pool arithmetic in IEEE double;
* the JPEG corpus images are SOLID colors whose decoded RGB is pinned
  bit-level by tests/test_jpeg.py (decoded planes are exactly
  ``2*dc + 128``; ITU-T T.871 YCbCr->RGB then round+clip) — the oracle
  embeds those three decoded colors as literals;
* MUVERA's FDE parameters (SimHash gaussians and +-1 projections) are
  pure functions of the fixed public seed (muvera.go:46), so the oracle
  re-runs the WHOLE pipeline — cluster assignment, per-cluster mean,
  Hamming-nearest empty-cluster fill, projection, float32 storage
  rounding, FDE top-20 overfetch, exact maxsim rescore — in SQL with
  the parameter matrices inlined as literals.

Float-width mirroring: Spark stores features/encodings as
``array<float>`` and computes distances after promoting to double; the
SQL casts every stored value through FLOAT and does all arithmetic in
DOUBLE, in the same left-to-right order, so values agree to well inside
the driver's 6dp hash rounding.
"""

from __future__ import annotations

_HEX = "0123456789abcdef"


def _hexbyte(hash_col: str, offset: int) -> str:
    """SQL for byte `offset` (0-15) of a lowercase-hex md5 column."""
    lo, hi = 2 * offset + 1, 2 * offset + 2
    return (
        f"((strpos('{_HEX}', substr({hash_col}, {lo}, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({hash_col}, {hi}, 1)) - 1))"
    )


def _ppm_byte(i: int) -> str:
    """SQL for pixel-buffer byte i (0-47): md5(text)||md5(text||'2')||
    md5(text||'3'), matching the Catalyst column in the query."""
    if i < 16:
        return _hexbyte("h1", i)
    if i < 32:
        return _hexbyte("h2", i - 16)
    return _hexbyte("h3", i - 32)


def _ppm_chan_mean(chan: int) -> str:
    """mean of a channel over the 16 RGB pixels: (sum/16)/255 — the
    numpy order (integer sum is exact, then two divisions)."""
    s = " + ".join(_ppm_byte(3 * p + chan) for p in range(16))
    return f"((({s}) / 16.0) / 255.0)"


def _ppm_gray(pix: int) -> str:
    """pooled gray of pixel `pix`: each byte /255 first, then mean of 3
    (numpy: small/255 then mean(axis=2) -> ((a+b)+c)/3)."""
    b = [f"({_ppm_byte(3 * pix + c)} / 255.0)" for c in range(3)]
    return f"((({b[0]} + {b[1]}) + {b[2]}) / 3.0)"


def _f32(expr: str) -> str:
    """store-width rounding: double -> float32 -> double."""
    return f"CAST(CAST({expr} AS FLOAT) AS DOUBLE)"


# 2x2 nearest-neighbor resize of the 4x4 grid samples pixels
# (0,0),(0,2),(2,0),(2,2) -> flat indices 0, 2, 8, 10
_GRAY_PIX = (0, 2, 8, 10)


def image_features_oracle_sql() -> str:
    """multimodal_image_features: mean-R (feature[0]) of the md5-PPM
    per doc, mirrored through the float32 feature column."""
    return (
        "WITH dd AS (SELECT doc_id, md5(text) AS h1, md5(text || '2') AS h2, "
        "md5(text || '3') AS h3 FROM documents WHERE doc_id < 200) "
        f"SELECT doc_id AS media_id, ROUND({_f32(_ppm_chan_mean(0))}, 6) AS mean_r "
        "FROM dd ORDER BY media_id"
    )


# decoded solid colors of the three JPEG variants (bit-level-pinned by
# tests/test_jpeg.py: planes = 2*dc+128, T.871 YCbCr->RGB, round+clip):
#   solid_jpeg(20,-12,8)             -> RGB(190,165,125)
#   solid_jpeg_progressive(-6,16,-4) -> RGB(105,111,173)
#   solid_jpeg(3,2,26)               -> RGB(207, 95,141)
_JPEG_RGB = {0: (190, 165, 125), 7: (105, 111, 173), "else": (207, 95, 141)}


def _solid_feature(rgb) -> list[str]:
    """float32 feature literals of a solid-color image: channel means
    are byte/255; all four pooled grays equal ((r'+g')+b')/3."""
    r, g, b = rgb
    chans = [_f32(f"({v} / 255.0)") for v in (r, g, b)]
    gray = _f32(f"((({r} / 255.0) + ({g} / 255.0) + ({b} / 255.0)) / 3.0)")
    return chans + [gray] * 4 + ["CAST(0.0 AS DOUBLE)"]


def near_image_oracle_sql() -> str:
    """near_image_topk: cosine top-10 in the shared 8-dim feature space
    over the mixed PPM + solid-JPEG corpus (doc_id < 300)."""
    # query feature: PPM with pixel bytes 0..47 (python doubles, NOT
    # float32 — the query vector enters the plan as double literals)
    q = [22.5 / 255, 23.5 / 255, 24.5 / 255,
         (0 / 255 + 1 / 255 + 2 / 255) / 3, (6 / 255 + 7 / 255 + 8 / 255) / 3,
         (24 / 255 + 25 / 255 + 26 / 255) / 3, (30 / 255 + 31 / 255 + 32 / 255) / 3,
         0.0]
    ppm_feat = (
        [_f32(_ppm_chan_mean(c)) for c in range(3)]
        + [_f32(_ppm_gray(p)) for p in _GRAY_PIX]
        + ["CAST(0.0 AS DOUBLE)"]
    )
    j0, j7, je = (_solid_feature(_JPEG_RGB[k]) for k in (0, 7, "else"))
    feat_cols = ", ".join(
        f"CASE WHEN doc_id % 7 = 0 THEN "
        f"(CASE WHEN doc_id % 21 = 0 THEN {j0[i]} "
        f"WHEN doc_id % 21 = 7 THEN {j7[i]} ELSE {je[i]} END) "
        f"ELSE {ppm_feat[i]} END AS f{i}"
        for i in range(8)
    )
    dot_ab = " + ".join(f"f{i} * {q[i]!r}" for i in range(8))
    naa = " + ".join(f"f{i} * f{i}" for i in range(8))
    nbb = " + ".join(f"{q[i]!r} * {q[i]!r}" for i in range(8))
    return (
        "WITH dd AS (SELECT doc_id, md5(text) AS h1, md5(text || '2') AS h2, "
        "md5(text || '3') AS h3 FROM documents WHERE doc_id < 300), "
        f"f AS (SELECT doc_id, {feat_cols} FROM dd) "
        f"SELECT doc_id AS media_id, ROUND(1.0 - ({dot_ab}) / "
        f"(sqrt({naa}) * sqrt({nbb})), 6) AS _distance "
        "FROM f ORDER BY _distance ASC, media_id ASC LIMIT 10"
    )


def muvera_oracle_sql(qvec: list[float], slice_sql) -> str:
    """multivector_muvera_topk: full FDE + overfetch-20 + exact-maxsim
    rescore, re-derived in SQL. The SimHash gaussians / +-1 projection
    matrices are pure functions of the fixed seed (muvera.go:46,
    MuveraSpec defaults) and are inlined as literal rows; the doc-side
    encoding (per-rep 3-bit SimHash cluster, per-cluster token MEAN,
    Hamming-nearest fill of empty clusters, +-1 projection / sqrt(8),
    float32 storage) and both search stages run in DuckDB."""
    import numpy as np

    from weaviate_spark.operators.multivector import (
        MuveraSpec,
        _muvera_params,
        muvera_encode_query,
    )

    spec = MuveraSpec(dim=21)
    g, S = _muvera_params(spec)  # (4,3,21) gaussians, (4,8,21) +-1
    qfde = muvera_encode_query([qvec[:21], qvec[21:42]], spec)  # 256 f32

    grows = ", ".join(
        f"({r}, {k}, {p + 1}, {float(g[r][k][p])!r})"
        for r in range(spec.repetitions)
        for k in range(spec.ksim)
        for p in range(spec.dim)
    )
    srows = ", ".join(
        f"({r}, {d}, {p + 1}, {float(S[r][d][p])!r})"
        for r in range(spec.repetitions)
        for d in range(spec.dprojections)
        for p in range(spec.dim)
    )
    qrows = ", ".join(f"({i}, {float(x)!r})" for i, x in enumerate(qfde))
    t1, t2, t3 = slice_sql(1, 21), slice_sql(22, 42), slice_sql(43, 63)
    q_tok1 = "[" + ", ".join(repr(float(x)) for x in qvec[:21]) + "]::DOUBLE[]"
    q_tok2 = "[" + ", ".join(repr(float(x)) for x in qvec[21:42]) + "]::DOUBLE[]"
    return f"""
WITH grows(rep, k, pos, gval) AS (VALUES {grows}),
srows(rep, d, pos, sval) AS (VALUES {srows}),
qf(fi, qv) AS (VALUES {qrows}),
toks AS (
  SELECT vec_id, 1 AS ti, {t1}::DOUBLE[] AS t FROM embeddings
  UNION ALL SELECT vec_id, 2, {t2}::DOUBLE[] FROM embeddings
  UNION ALL SELECT vec_id, 3, {t3}::DOUBLE[] FROM embeddings),
tokel AS (
  SELECT vec_id, ti, p.pos, t[p.pos] AS val
  FROM toks, (SELECT unnest(range(1, 22)) AS pos) p),
dots AS (
  SELECT te.vec_id, te.ti, g.rep, g.k, SUM(te.val * g.gval) AS dp
  FROM tokel te JOIN grows g ON g.pos = te.pos
  GROUP BY te.vec_id, te.ti, g.rep, g.k),
assig AS (
  SELECT vec_id, ti, rep,
    CAST(SUM(CASE WHEN dp < 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS cl
  FROM dots GROUP BY vec_id, ti, rep),
cellagg AS (
  SELECT a.vec_id, a.rep, a.cl AS c, te.pos, AVG(te.val) AS aggv
  FROM assig a JOIN tokel te ON te.vec_id = a.vec_id AND te.ti = a.ti
  GROUP BY a.vec_id, a.rep, a.cl, te.pos),
emptycells AS (
  SELECT v.vec_id, r.rep, c.c
  FROM (SELECT DISTINCT vec_id FROM toks) v,
       (SELECT unnest(range(4)) AS rep) r,
       (SELECT unnest(range(8)) AS c) c
  WHERE NOT EXISTS (SELECT 1 FROM assig a
    WHERE a.vec_id = v.vec_id AND a.rep = r.rep AND a.cl = c.c)),
fillpick AS (
  SELECT vec_id, rep, c, ti FROM (
    SELECT e.vec_id, e.rep, e.c, a.ti,
      row_number() OVER (PARTITION BY e.vec_id, e.rep, e.c
        ORDER BY bit_count(xor(a.cl, e.c)), a.ti) AS rn
    FROM emptycells e JOIN assig a
      ON a.vec_id = e.vec_id AND a.rep = e.rep) WHERE rn = 1),
fillagg AS (
  SELECT f.vec_id, f.rep, f.c, te.pos, te.val AS aggv
  FROM fillpick f JOIN tokel te ON te.vec_id = f.vec_id AND te.ti = f.ti),
aggall AS (SELECT * FROM cellagg UNION ALL SELECT * FROM fillagg),
proj AS (
  SELECT ag.vec_id, ag.rep, ag.c, s.d,
    CAST(CAST(SUM(ag.aggv * s.sval) / sqrt(8.0) AS FLOAT) AS DOUBLE) AS f
  FROM aggall ag JOIN srows s ON s.rep = ag.rep AND s.pos = ag.pos
  GROUP BY ag.vec_id, ag.rep, ag.c, s.d),
fsim AS (
  SELECT p.vec_id, SUM(p.f * q.qv) AS fde_sim
  FROM proj p JOIN qf q ON q.fi = (p.rep * 8 + p.c) * 8 + p.d
  GROUP BY p.vec_id),
cand AS (SELECT vec_id FROM fsim ORDER BY fde_sim DESC, vec_id ASC LIMIT 20),
e AS (
  SELECT em.vec_id, {t1} AS t1, {t2} AS t2, {t3} AS t3
  FROM embeddings em JOIN cand USING (vec_id)),
qq AS (SELECT {q_tok1} AS q1, {q_tok2} AS q2)
SELECT vec_id, round(
  greatest(list_dot_product(t1, q1), list_dot_product(t2, q1), list_dot_product(t3, q1))
  + greatest(list_dot_product(t1, q2), list_dot_product(t2, q2), list_dot_product(t3, q2)),
  6) AS _score
FROM e CROSS JOIN qq ORDER BY _score DESC, vec_id ASC LIMIT 10
"""


def image_dhash_oracle_sql(max_doc: int = 2000, max_hamming: int = 2) -> str:
    """Oracle for `image_phash_neardup`: the 4x6 PPM corpus (two
    variants per doc: raw md5 pixels and a +8 brightness shift with
    255 clipping) rebuilt analytically — 72 pixel bytes per variant
    from md5(text)..md5(text||'5') hex, integer gray sums, the 20
    dHash comparison bits, then an ALL-PAIRS join with exact Hamming
    (the corpus is doc-capped, so the quadratic oracle stays small
    while the Spark side exercises the banded-LSH plan; banding is
    recall-exact for the budget, so the two must agree exactly)."""

    def byte(i: int, bright: int) -> str:
        b = _hexbyte(f"h{i // 16 + 1}", i % 16)
        if bright == 0:
            return b
        return f"least({b} + {bright}, 255)"

    def gray(r: int, c: int, bright: int) -> str:
        p = 3 * (r * 6 + c)
        return "(" + " + ".join(byte(p + ch, bright) for ch in range(3)) + ")"

    def hash_expr(bright: int) -> str:
        terms = []
        for r in range(4):
            for c in range(5):
                k = r * 5 + c
                terms.append(
                    f"(CASE WHEN {gray(r, c, bright)} < "
                    f"{gray(r, c + 1, bright)} THEN {1 << k} ELSE 0 END)"
                )
        return "CAST(" + " + ".join(terms) + " AS BIGINT)"

    return (
        "WITH d AS MATERIALIZED (SELECT doc_id, md5(text) AS h1, "
        "md5(text || '2') AS h2, md5(text || '3') AS h3, "
        "md5(text || '4') AS h4, md5(text || '5') AS h5 "
        f"FROM documents WHERE doc_id < {max_doc}), "
        "img AS MATERIALIZED ("
        f"SELECT CAST(doc_id * 2 AS BIGINT) AS id, {hash_expr(0)} AS h FROM d "
        "UNION ALL "
        f"SELECT CAST(doc_id * 2 + 1 AS BIGINT), {hash_expr(8)} FROM d) "
        "SELECT a.id AS media_a, b.id AS media_b, "
        "CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming "
        "FROM img a JOIN img b ON a.id < b.id "
        f"WHERE bit_count(xor(a.h, b.h)) <= {max_hamming}"
    )


def image_quality_oracle_sql(max_doc: int = 1000) -> str:
    """Oracle for `image_quality_stats` over the 6x4 PPM corpus (one
    raw-md5-pixel variant per doc, media_id = doc_id): all 24 integer
    gray sums rebuilt analytically from md5(text)..md5(text||'5'),
    then the same fixed-order moment/entropy arithmetic — integer
    binning (gs // 96 capped at 7), per-bin p*ln(p) rounded to 6dp and
    summed as exact DECIMAL, population std from integer moments."""

    def byte(i: int) -> str:
        return _hexbyte(f"h{i // 16 + 1}", i % 16)

    grays = []
    for p in range(24):
        grays.append(
            "(" + " + ".join(byte(3 * p + ch) for ch in range(3)) + ")"
        )
    gs_list = "[" + ", ".join(grays) + "]"
    return (
        "WITH d AS MATERIALIZED (SELECT doc_id, md5(text) AS h1, "
        "md5(text || '2') AS h2, md5(text || '3') AS h3, "
        "md5(text || '4') AS h4, md5(text || '5') AS h5 "
        f"FROM documents WHERE doc_id < {max_doc}), "
        f"img AS (SELECT CAST(doc_id AS BIGINT) AS id, {gs_list} AS gs "
        "FROM d), "
        "px AS (SELECT id, unnest(gs) AS g FROM img), "
        "m AS (SELECT id, count(*) AS n, sum(g) AS s1, sum(g * g) AS s2 "
        "FROM px GROUP BY 1), "
        "b AS (SELECT id, least(g // 96, 7) AS bin, count(*) AS c "
        "FROM px GROUP BY 1, 2), "
        "bn AS (SELECT b.id, b.c, m.n FROM b JOIN m ON b.id = m.id), "
        "ent AS (SELECT id, sum(CAST(round((CAST(c AS DOUBLE) "
        "/ CAST(n AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), "
        "6) AS DECIMAL(18,6))) AS esum FROM bn GROUP BY 1), "
        "dom AS (SELECT id, bin FROM (SELECT id, bin, row_number() OVER "
        "(PARTITION BY id ORDER BY c DESC, bin ASC) AS rk FROM b) "
        "WHERE rk = 1) "
        "SELECT m.id AS media_id, CAST(m.n AS INT) AS n_pixels, "
        "round(CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE) + 0.0, 6) "
        "AS mean_gray, "
        "round(sqrt(greatest((CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE) "
        "* CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE)) "
        "/ CAST(m.n AS DOUBLE), 0.0)) + 0.0, 6) AS std_gray, "
        "(-CAST(ent.esum AS DOUBLE)) + 0.0 AS entropy, "
        "CAST(dom.bin AS INT) AS dominant_bin, true AS decode_ok "
        "FROM m JOIN ent ON m.id = ent.id JOIN dom ON m.id = dom.id"
    )


def gif_frame_stats_oracle_sql() -> str:
    """Analytical mirror of image_gif_frame_stats: the GIF pixels are
    md5-derived palette indices (synth_gif_corpus), and the real
    LZW+interlace encode/decode is an exact round trip, so per-frame
    channel means are derivable from the same md5() in SQL — if either
    codec direction had a bit error, the hashes would diverge."""
    chan_vals = {"r": [255, 0, 0, 17], "g": [0, 255, 0, 34],
                 "b": [0, 0, 255, 51]}

    def mean(ch: str) -> str:
        pal = "[" + ", ".join(str(v) for v in chan_vals[ch]) + "]"
        terms = " + ".join(
            f"({pal})[(({_hexbyte('h', i)}) % 4) + 1]" for i in range(16)
        )
        return f"round((({terms}) / 16.0) / 255.0, 6) + 0.0 AS mean_{ch}"

    return (
        "WITH d AS (SELECT doc_id, md5(text || 'g1') AS h1, "
        "md5(text || 'g2') AS h2 FROM documents WHERE doc_id % 7 = 0), "
        "f AS (SELECT doc_id, 0 AS fi, h1 AS h FROM d "
        "UNION ALL SELECT doc_id, 1 AS fi, h2 AS h FROM d) "
        "SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx, "
        "CAST(100 AS BIGINT) AS delay_ms, "
        f"{mean('r')}, {mean('g')}, {mean('b')} "
        "FROM f ORDER BY media_id, frame_idx"
    )
