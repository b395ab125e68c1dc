"""BPE training semantics vs an independent pure-Python reference."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from weaviate_spark.operators.tokenizer_train import apply_bpe, train_bpe


def _py_bpe(texts, num_merges):
    """Reference implementation (Sennrich ACL'16 pseudocode, overlapping
    pair counts, greedy left-to-right merge application)."""
    words = Counter()
    for t in texts:
        for w in re.findall(r"[^\W_]+", t.lower(), re.UNICODE):
            words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((rank, l, r, l + r, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide widest wider",
    "aaaa aaaa baaa",
]


def test_train_matches_python_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                                 "doc_id long, text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in train_bpe(docs, num_merges=8, min_pair_count=1)
        .orderBy("merge_rank").collect()
    ]
    assert got == _py_bpe(TEXTS, 8)


def test_greedy_overlap_semantics(spark):
    """'aaaa' counts 3 overlapping (a,a) pairs but merges to exactly
    [aa, aa]; 'baaa' to [b, aa, a]."""
    docs = spark.createDataFrame([(0, "aaaa baaa")], "doc_id long, text string")
    m = train_bpe(docs, num_merges=1, min_pair_count=1).collect()
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("a", "a", 5)
    out = apply_bpe(docs, [("a", "a")]).collect()[0]["bpe_tokens"]
    assert out == ["aa", "aa", "b", "aa", "a"]


def test_apply_chains_merges_in_rank_order(spark):
    docs = spark.createDataFrame([(0, "abab")], "doc_id long, text string")
    out = apply_bpe(docs, [("a", "b"), ("ab", "ab")]).collect()[0]["bpe_tokens"]
    assert out == ["abab"]


def test_min_pair_count_stops_early(spark):
    docs = spark.createDataFrame([(0, "xy")], "doc_id long, text string")
    m = train_bpe(docs, num_merges=5, min_pair_count=2).collect()
    assert m == []


def test_num_merges_validation(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(docs, num_merges=0)


def test_bpe_encode_docs_matches_apply_bpe(spark):
    """The vocabulary-join encode path must produce exactly the token
    stream of the direct per-occurrence fold (apply_bpe)."""
    from pyspark.sql import functions as F

    from weaviate_spark.operators.tokenizer_train import (
        apply_bpe,
        bpe_encode_docs,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest, the lowly low!"),
            (2, "newer newest new; the widow's widest view"),
            (3, ""),
            (4, "low low low"),
        ],
        "doc_id long, text string",
    )
    merges = [
        (r["left"], r["right"])
        for r in train_bpe(docs, num_merges=4).orderBy("merge_rank").collect()
    ]
    fast = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["bpe_text"])
        for r in bpe_encode_docs(docs, merges).collect()
    }
    slow = {
        r["doc_id"]: r["toks"]
        for r in apply_bpe(docs, merges, out_col="_bpe")
        .select("doc_id", F.array_join("_bpe", " ").alias("toks"))
        .collect()
    }
    assert 3 not in fast  # wordless docs drop
    for did in (1, 2, 4):
        assert fast[did][2] == slow[did]
        assert fast[did][1] == len(slow[did].split())


def test_wordpiece_greedy_longest_match(spark):
    from weaviate_spark.operators.tokenizer_train import wordpiece_encode_docs

    docs = spark.createDataFrame(
        [(1, "unwanted unhappy un"), (2, "wanted")],
        "doc_id int, text string",
    )
    # hand vocab: greedy must prefer 'unwa' over 'un' at word start,
    # and continuation matches use the 'c' form
    vocab = {
        ("i", "un"), ("i", "unwa"), ("c", "nte"), ("c", "ed"),
        ("c", "want"), ("c", "appy"),
    }
    out = {
        r["doc_id"]: (r["n_words"], r["n_wp_tokens"], r["wp_text"])
        for r in wordpiece_encode_docs(docs, vocab, max_len=4).collect()
    }
    # unwanted -> unwa ##nte ##d ; unhappy -> un ##h ##appy ; un -> un
    assert out[1] == (3, 7, "unwa ##nte ##d un ##h ##appy un")
    # wanted: no initial multi-char match -> w ##a ##nte ##d
    assert out[2] == (1, 4, "w ##a ##nte ##d")


def test_wordpiece_vocab_threshold(spark):
    from weaviate_spark.operators.tokenizer_train import wordpiece_vocab

    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab bbbb")], "doc_id int, text string",
    )
    got = {
        (r["form"], r["tok"])
        for r in wordpiece_vocab(docs, max_len=3, min_frac=0.5).collect()
    }
    # 'aaa' initial occurs in 3 of 4 word occurrences (weight 3 >= 2);
    # initial 'bbb' (weight 1, single 'bbbb' occurrence) stays out, but
    # continuation 'bb' appears at two positions of that word (weight 2)
    assert ("i", "aaa") in got and ("i", "aa") in got
    assert ("i", "bbb") not in got and ("i", "bb") not in got
    assert ("c", "bb") in got


def test_train_bpe_batched_matches_sequential_64(spark):
    """64 merges over a symbol-disjoint corpus (every word is its own
    2-letter alphabet, so no merge can create or consume another's
    pairs): batch_size=8 learns IDENTICAL merges to the sequential
    algorithm in ~8x fewer pair-count rounds (r06 verdict ask #3)."""
    from weaviate_spark.operators.tokenizer_train import train_bpe

    # 64 words over 128 distinct Han letters (\p{L}, lowercase-stable),
    # distinct counts force one deterministic argmax order
    words = [chr(0x4E00 + 2 * i) + chr(0x4E00 + 2 * i + 1)
             for i in range(64)]
    rows = [(i, " ".join([words[i]] * (200 - 3 * (i % 50) - i // 50)))
            for i in range(64)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    seq = [tuple(r) for r in train_bpe(
        docs, num_merges=64, min_pair_count=1, batch_size=1
    ).orderBy("merge_rank").collect()]
    bat = [tuple(r) for r in train_bpe(
        docs, num_merges=64, min_pair_count=1, batch_size=8
    ).orderBy("merge_rank").collect()]
    assert len(seq) == 64
    assert bat == seq


def test_train_bpe_batch_skips_overlapping_candidates(spark):
    """The first candidate sharing a symbol with an accepted merge ENDS
    the round (prefix-only batch): after the recount it may outrank
    everything below it, so accepting lower-ranked candidates would
    diverge from the sequential order — this corpus exercises exactly
    that case ((ab,c) deferred, (b,c) must NOT jump the queue)."""
    from weaviate_spark.operators.tokenizer_train import train_bpe

    # 'ab' dominates; 'bc' overlaps it (shares b) and must wait for the
    # recount, where only the post-merge adjacencies survive
    docs = spark.createDataFrame(
        [(1, "abab abab abc"), (2, "abc bc")],
        "doc_id long, text string",
    )
    seq = [tuple(r) for r in train_bpe(
        docs, num_merges=3, min_pair_count=1, batch_size=1
    ).orderBy("merge_rank").collect()]
    bat = [tuple(r) for r in train_bpe(
        docs, num_merges=3, min_pair_count=1, batch_size=3
    ).orderBy("merge_rank").collect()]
    assert bat == seq
