"""Regenerate the FMM fixture denylist for the shipped ICU lexicon.

The default dictionary (data/cjk_freq_icu.tsv.gz, extracted by
tools/extract_icu_cjdict.py) is segmented by GREEDY forward maximum
matching (functions/text.py:segment_cjk_py) — deterministic and
exactly replayable in the duckdb oracle. The reference's gse/kagome
segmenters are LATTICE/Viterbi based: they know the same words but
pick boundaries by path cost, so on a handful of its ported fixtures
(entities/tokenizer/tokenizer_test.go) greedy longest-match grabs a
word the lattice rejects (classic example: with 가방 'bag' in the
dictionary, greedy turns 아버지가방에들어가신다 'father enters the
room' into 'father bag' — kagome's cost model picks 가/방). This tool
finds exactly those entries by replaying every pinned fixture and
denylisting the first greedily-matched word that crosses an expected
boundary, until all fixtures segment as pinned. The output
(data/cjk_fmm_denylist.txt) is excluded ONLY from the default load —
the words stay in the shipped TSV for callers who load it themselves.

Run after regenerating the TSV:
    python tools/build_cjk_denylist.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pinned fixtures: (text, expected tokens) — CJK modes all route
# through the same dictionary FMM, so the mode column is irrelevant
# here. Sources: tests/test_text.py (reference-ported fixtures from
# entities/tokenizer/tokenizer_test.go plus this repo's everyday-prose
# pins).
FIXTURES: list[tuple[str, list[str]]] = [
    # kagome_ja fox sentence (tokenizer_test.go:140-141)
    ("素早い茶色の狐が怠けた犬を飛び越えた",
     ["素早い", "茶色", "の", "狐", "が", "怠け", "た", "犬", "を",
      "飛び越え", "た"]),
    # kagome_kr morpheme cases (:114-126)
    ("아버지가방에들어가신다",
     ["아버지", "가", "방", "에", "들어가", "신다"]),
    ("결정하겠다", ["결정", "하", "겠", "다"]),
    ("한국어를처리하는예시입니다",
     ["한국어", "를", "처리", "하", "는", "예시", "입니다"]),
    # gse_ch 施氏食狮史 (:111-112), punctuation-stripped
    ("施氏食狮史石室诗士施氏嗜狮誓食十狮氏时时适市视狮十时适十狮适市"
     "是时适施氏适市氏视是十狮恃矢势使是十狮逝世氏拾是十狮尸适石室"
     "石室湿氏使侍拭石室石室拭氏始试食是十狮尸食时始识是十狮尸"
     "实十石狮尸试释是事",
     ["施", "氏", "食", "狮", "史", "石室", "诗", "士", "施", "氏",
      "嗜", "狮", "誓", "食", "十", "狮", "氏", "时时", "适", "市",
      "视", "狮", "十时", "适", "十", "狮", "适", "市", "是", "时",
      "适", "施", "氏", "适", "市", "氏", "视", "是", "十", "狮",
      "恃", "矢", "势", "使", "是", "十", "狮", "逝世", "氏", "拾",
      "是", "十", "狮", "尸", "适", "石室", "石室", "湿", "氏", "使",
      "侍", "拭", "石室", "石室", "拭", "氏", "始", "试", "食", "是",
      "十", "狮", "尸", "食", "时", "始", "识", "是", "十", "狮",
      "尸", "实", "十", "石狮", "尸", "试", "释", "是", "事"]),
    # kagome_ja four-seasons poem (tokenizer_test.go:128-137),
    # whitespace/punctuation-stripped like the ported test
    ("春の夜の夢はうつつよりもかなしき\n\t夏の夜の夢はうつつに似たり\n\t"
     "秋の夜の夢はうつつを超え\n\t冬の夜の夢は心に響く\n\n\t"
     "山のあなたに小さな村が見える\n\t川の音が静かに耳に届く\n\t"
     "風が木々を通り抜ける音\n\t星空の下、すべてが平和である",
     ["春", "の", "夜", "の", "夢", "は", "うつつ", "より", "も",
      "かなしき",
      "夏", "の", "夜", "の", "夢", "は", "うつつ", "に", "似", "たり",
      "秋", "の", "夜", "の", "夢", "は", "うつつ", "を", "超え",
      "冬", "の", "夜", "の", "夢", "は", "心", "に", "響く",
      "山", "の", "あなた", "に", "小さな", "村", "が", "見える",
      "川", "の", "音", "が", "静か", "に", "耳", "に", "届く",
      "風", "が", "木々", "を", "通り抜ける", "音",
      "星空", "の", "下", "すべて", "が", "平和", "で", "ある"]),
    # all-hiragana fox (tokenizer_test.go:143-144)
    ("すばやいちゃいろのきつねがなまけたいぬをとびこえた",
     ["すばやい", "ちゃ", "いろ", "の", "きつね", "が", "なまけ", "た",
      "いぬ", "を", "とびこえ", "た"]),
    # everyday-prose + mechanism pins (tests/test_text.py).
    # NOT pinned here: 日本語 — ICU (like the reference's IPAdic) has
    # it as one word, and one token IS the reference's kagome output;
    # the old two-token pin reflected the pre-r10 mini lexicon and the
    # test was updated instead of denylisting a real word.
    ("我们的时间问题", ["我们", "的", "时间", "问题"]),
    ("机器学习很好", ["机器学习", "很好"]),
    ("犬猫", ["犬", "猫"]),
    ("今天天气很好 hello 机器学习",
     ["今天", "天气", "很好", "hello", "机器学习"]),
    ("사람들의생각", ["사람", "들", "의", "생각"]),
    ("会社の会議で質問する",
     ["会社", "の", "会議", "で", "質問", "する"]),
    ("经济发展需要科学技术",
     ["经济", "发展", "需要", "科学", "技术"]),
    ("私たちは東京で勉強します",
     ["私たち", "は", "東京", "で", "勉強", "し", "ます"]),
]


def main() -> None:
    from weaviate_spark.functions.text import (
        CJK_MINI_LEXICON, _DEFAULT_LEXICON_PATH, _DENYLIST_PATH,
        tokenize_cjk_dict_py)
    import gzip

    icu: set[str] = set()
    with gzip.open(_DEFAULT_LEXICON_PATH, "rt", encoding="utf-8") as fh:
        for ln in fh:
            if not ln.startswith("#"):
                w = ln.split("\t", 1)[0].strip()
                if len(w) >= 2:
                    icu.add(w)
    print(f"ICU lexicon: {len(icu)} multi-char entries")

    deny: list[str] = []
    while True:
        lex = frozenset((CJK_MINI_LEXICON | icu) - set(deny))
        maxw = max(len(w) for w in lex)
        offender = None
        for text, expected in FIXTURES:
            got = tokenize_cjk_dict_py(text.lower(), lex, maxw)
            if got == expected:
                continue
            # first produced token that is not the expected one at the
            # same boundary walk is the greedy over-match
            i = 0
            for g, e in zip(got, expected):
                if g != e:
                    offender = g
                    break
                i += 1
            if offender is None:  # length mismatch with equal prefix
                offender = got[i] if i < len(got) else expected[i]
            if offender is not None:
                if offender not in icu or offender in CJK_MINI_LEXICON:
                    raise SystemExit(
                        f"fixture {text[:12]}… diverges on "
                        f"{offender!r}, which is not a removable ICU "
                        f"entry — got {got[:12]} want {expected[:12]}")
                break
        if offender is None:
            break
        deny.append(offender)
        print(f"  denylist += {offender!r}")

    with open(_DENYLIST_PATH, "w", encoding="utf-8") as fh:
        fh.write(
            "# ICU cjdict entries excluded from the DEFAULT lexicon\n"
            "# load: under greedy FMM they cross token boundaries the\n"
            "# reference's lattice segmenters pin in their own fixtures\n"
            "# (entities/tokenizer/tokenizer_test.go). Regenerate with\n"
            "# tools/build_cjk_denylist.py. The words remain in\n"
            "# cjk_freq_icu.tsv.gz for callers who load it directly.\n")
        for w in sorted(deny):
            fh.write(w + "\n")
    print(f"wrote {len(deny)} entries to {_DENYLIST_PATH}")


if __name__ == "__main__":
    main()
