"""Property-based tests (hypothesis) — invariants the example-based
suites can't sweep. The reference has no property testing (SURVEY §5);
these cover the pure-function layer where random inputs are cheap."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from weaviate_spark.filters import like_to_regex
from weaviate_spark.functions.text import tokenize_py
from weaviate_spark.operators.search_post import autocut_index
from weaviate_spark.schema import determine_type


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20))
@settings(max_examples=200, deadline=None)
def test_like_regex_matches_python_semantics(pattern):
    """like_to_regex must implement: ? = one char, * = any run, anchored.
    Cross-check against a hand-rolled recursive matcher."""
    rx = re.compile(like_to_regex(pattern))

    def like_match(p: str, s: str) -> bool:
        if not p:
            return not s
        if p[0] == "*":
            return any(like_match(p[1:], s[i:]) for i in range(len(s) + 1))
        if p[0] == "?":
            return bool(s) and like_match(p[1:], s[1:])
        return bool(s) and s[0] == p[0] and like_match(p[1:], s[1:])

    probes = ["", "a", pattern.replace("*", "x").replace("?", "y"),
              pattern.replace("*", "").replace("?", "z")]
    for s in probes:
        assert bool(rx.fullmatch(s)) == like_match(pattern, s), (pattern, s)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False), max_size=30),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=200, deadline=None)
def test_autocut_bounds(scores, cut_off):
    """0 <= autocut index <= len(scores), always."""
    idx = autocut_index(scores, cut_off)
    assert 0 <= idx <= len(scores)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_word_tokens_are_normalized(text):
    """word tokens: nonempty, lowercase unicode letter/digit runs; idempotent."""
    import unicodedata

    toks = tokenize_py(text, "word")
    for t in toks:
        assert t and t == t.lower()
        assert all(
            ch.isalpha() or unicodedata.category(ch).startswith("N") for ch in t
        )
    assert tokenize_py(" ".join(toks), "word") == toks


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_trigram_token_lengths(text):
    """trigrams come from the concatenated word runs (tokenizer.go:395-410)."""
    import unicodedata

    toks = tokenize_py(text, "trigram")
    assert all(len(t) == 3 for t in toks)
    # independent cleaning: strip non-alnum chars, THEN lower the joined runs
    cleaned = "".join(
        ch for ch in text
        if ch.isalpha() or unicodedata.category(ch).startswith("N")
    ).lower()
    assert len(toks) == max(len(cleaned) - 2, 0)


@given(st.one_of(
    st.booleans(), st.integers(), st.floats(allow_nan=False),
    st.text(max_size=50), st.binary(max_size=20),
    st.lists(st.integers(), min_size=1, max_size=3),
))
@settings(max_examples=200, deadline=None)
def test_determine_type_total_and_stable(value):
    """determine_type never raises on JSON-ish values and is stable."""
    t1 = determine_type(value)
    t2 = determine_type(value)
    assert t1 == t2
    assert isinstance(t1, str) and t1
    # bool must win over int (python bool subclasses int)
    if isinstance(value, bool):
        assert t1 == "boolean"


@given(st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
       st.integers(min_value=1, max_value=400))
def test_greedy_pack_invariant(tokens, budget):
    """Pure-python mirror of pack_sequences_greedy's fill loop: pack
    sums never exceed the budget except single-oversized-doc packs, and
    pack ids are contiguous non-decreasing."""
    packs, cur_pack, cur_sum = [], 0, 0
    for t in tokens:
        t = min(t, budget)
        if cur_sum + t > budget and cur_sum > 0:
            cur_pack += 1
            cur_sum = 0
        cur_sum += t
        packs.append(cur_pack)
    assert packs == sorted(packs)
    from collections import defaultdict
    sums = defaultdict(list)
    for p, t in zip(packs, tokens):
        sums[p].append(min(t, budget))
    for members in sums.values():
        assert sum(members) <= budget or len(members) == 1


@given(st.text(max_size=300))
def test_pii_scrub_idempotent(text):
    """Scrubbing twice == scrubbing once: the typed placeholders never
    match any PII pattern themselves."""
    import re
    from weaviate_spark.operators.curation import PII_PATTERNS

    def scrub(s):
        for name, rx in PII_PATTERNS:
            s = re.sub(rx, f"[{name.upper()}]", s)
        return s

    once = scrub(text)
    assert scrub(once) == once


@given(st.text(min_size=1, max_size=80))
def test_km_hash_family_bounds(shingle):
    """Kirsch-Mitzenmacher family: h1 + i*h2 stays under 2^60 for
    i < 16 (plain BIGINT arithmetic, no overflow on either engine)."""
    import hashlib

    m = hashlib.md5(shingle.encode()).hexdigest()
    h1, h2 = int(m[:14], 16), int(m[14:28], 16)
    for i in range(16):
        assert 0 <= h1 + i * h2 < 1 << 60


@given(st.lists(st.floats(min_value=-1, max_value=1, allow_nan=False), min_size=4, max_size=4))
def test_muvera_query_encode_deterministic(vec):
    from weaviate_spark.operators.multivector import MuveraSpec, muvera_encode_query

    spec = MuveraSpec(dim=4, ksim=2, dprojections=3, repetitions=2)
    a = muvera_encode_query([vec], spec)
    b = muvera_encode_query([vec], spec)
    assert a == b and len(a) == spec.encoded_dim


_DC_OK = sorted({0, 2, 3, -2, -3, 8, 9, 15, -8, -15, 16, 31, -16, -31})


@given(st.sampled_from(_DC_OK), st.sampled_from(_DC_OK), st.sampled_from(_DC_OK))
@settings(max_examples=100, deadline=None)
def test_jpeg_solid_roundtrip_property(y, cb, cr):
    """Every valid DC triple round-trips through the hand-rolled writer +
    decoder to the exact closed-form pixel values."""
    import numpy as np

    from weaviate_spark.operators.multimodal import decode_image_array, solid_jpeg

    img = decode_image_array(solid_jpeg(y, cb, cr))
    assert img is not None and img.shape == (16, 16, 3)
    Y, Cb, Cr = 2 * y + 128.0, 2 * cb + 128.0, 2 * cr + 128.0
    r = int(np.clip(round(Y + 1.402 * (Cr - 128)), 0, 255))
    g = int(np.clip(round(Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128)), 0, 255))
    b = int(np.clip(round(Y + 1.772 * (Cb - 128)), 0, 255))
    assert (img == np.array([r, g, b], dtype=np.uint8)).all()


@given(st.integers(1, 6), st.integers(1, 6), st.data())
@settings(max_examples=100, deadline=None)
def test_png_roundtrip_property(w, h, data):
    """Arbitrary small RGB images written with stdlib zlib (filter 0)
    decode to the identical pixels."""
    import struct
    import zlib

    import numpy as np

    from weaviate_spark.operators.multimodal import decode_image_array

    px = data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3,
                            max_size=w * h * 3))

    def chunk(ctype, payload):
        return (len(payload).to_bytes(4, "big") + ctype + payload
                + zlib.crc32(ctype + payload).to_bytes(4, "big"))

    raw = b"".join(
        bytes([0]) + bytes(px[y * w * 3:(y + 1) * w * 3]) for y in range(h)
    )
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    img = decode_image_array(png)
    assert img is not None
    assert img.tolist() == np.array(px, dtype=np.uint8).reshape(h, w, 3).tolist()


@given(st.text(alphabet="今天气很好我们机器学习数据分析北京大学犬猫鳥东京勉強します", max_size=24))
@settings(max_examples=200, deadline=None)
def test_cjk_segmentation_properties(s):
    """gse_dict LATTICE segmentation (r11): tokens concatenate back to
    the input, every multi-codepoint token is a lexicon word, and the
    chosen path's total snlp cost equals the true minimum computed by
    an independent forward DP (the engine runs a suffix DP with an FMM
    tiebreak; the witness here shares no code with it)."""
    from weaviate_spark.functions.text import (
        UNKNOWN_CJK_COST, active_cjk_costs, active_cjk_max_word,
        segment_cjk_py,
    )

    costs = active_cjk_costs()  # embedded + shipped ICU default
    toks = segment_cjk_py(s)
    assert "".join(toks) == s
    maxw = active_cjk_max_word()

    def word_cost(w):
        c = costs.get(w)
        if c is None:
            assert len(w) == 1  # multi-codepoint tokens must be words
            c = UNKNOWN_CJK_COST
        return c

    total = sum(word_cost(t) for t in toks)
    # independent forward DP (prefix-based, no tiebreak bookkeeping)
    n = len(s)
    best = [float("inf")] * (n + 1)
    best[0] = 0.0
    for i in range(n):
        if best[i] == float("inf"):
            continue
        for ln in range(1, min(maxw, n - i) + 1):
            w = s[i:i + ln]
            c = costs.get(w)
            if c is None:
                if ln != 1:
                    continue
                c = UNKNOWN_CJK_COST
            if best[i] + c < best[i + ln]:
                best[i + ln] = best[i] + c
    assert total == best[n], (s, toks, total, best[n])
