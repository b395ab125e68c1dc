"""Replay the ported CJK tokenizer fixtures against the live lattice.

Successor of the retired tools/build_cjk_denylist.py: the r10 greedy
FMM segmenter needed a denylist of dictionary entries whose greedy
longest-match crossed fixture boundaries; the r11 frequency-weighted
DAG shortest-path (functions/text.py:segment_cjk_py, the gse/ICU
Viterbi the shipped cjdict costs are scored for) resolves all of those
by path cost, so there is no list to regenerate — this tool only
VERIFIES that every pinned fixture still segments as expected, and
exits non-zero with a diff when one diverges.

Fixture sources: entities/tokenizer/tokenizer_test.go (reference
ports) and this repo's everyday-prose pins (tests/test_text.py holds
the same expectations as pytest assertions; keep the two in sync).

Documented divergences from the reference's kagome_ja (IPAdic +
connection costs — a morphological analyzer, not available offline):
* 春の — one token here; ICU cjdict carries 春の as a lexeme and the
  reference's own gse emits it too (tokenizer_test.go:88), while
  kagome's bigram connection costs split 春/の. Content difference of
  the dictionaries, not an algorithm gap.

Run: python tools/check_cjk_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (mode, text, expected tokens)
FIXTURES: list[tuple[str, str, list[str]]] = [
    # kagome_ja fox sentence (tokenizer_test.go:140-141)
    ("kagome_ja", "素早い茶色の狐が怠けた犬を飛び越えた",
     ["素早い", "茶色", "の", "狐", "が", "怠け", "た", "犬", "を",
      "飛び越え", "た"]),
    # kagome_kr morpheme cases (:114-126), spaced and unspaced — the
    # reference pins IDENTICAL output for both forms
    ("kagome_kr", "아버지가방에들어가신다",
     ["아버지", "가", "방", "에", "들어가", "신다"]),
    ("kagome_kr", "아버지가 방에 들어가신다",
     ["아버지", "가", "방", "에", "들어가", "신다"]),
    ("kagome_kr", "결정하겠다", ["결정", "하", "겠", "다"]),
    ("kagome_kr", "한국어를처리하는예시입니다",
     ["한국어", "를", "처리", "하", "는", "예시", "입니다"]),
    ("kagome_kr", "한국어를 처리하는 예시입니다",
     ["한국어", "를", "처리", "하", "는", "예시", "입니다"]),
    # gse_ch 施氏食狮史 (:111-112), punctuation-stripped
    ("gse_ch",
     "施氏食狮史石室诗士施氏嗜狮誓食十狮氏时时适市视狮十时适十狮适市"
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
    # whitespace/punctuation-stripped like the ported test; 春の is the
    # documented cjdict-lexeme divergence (see module docstring)
    ("kagome_ja",
     "春の夜の夢はうつつよりもかなしき\n\t夏の夜の夢はうつつに似たり\n\t"
     "秋の夜の夢はうつつを超え\n\t冬の夜の夢は心に響く\n\n\t"
     "山のあなたに小さな村が見える\n\t川の音が静かに耳に届く\n\t"
     "風が木々を通り抜ける音\n\t星空の下、すべてが平和である",
     ["春の", "夜", "の", "夢", "は", "うつつ", "より", "も",
      "かなしき",
      "夏", "の", "夜", "の", "夢", "は", "うつつ", "に", "似", "たり",
      "秋", "の", "夜", "の", "夢", "は", "うつつ", "を", "超え",
      "冬", "の", "夜", "の", "夢", "は", "心", "に", "響く",
      "山", "の", "あなた", "に", "小さな", "村", "が", "見える",
      "川", "の", "音", "が", "静か", "に", "耳", "に", "届く",
      "風", "が", "木々", "を", "通り抜ける", "音",
      "星空", "の", "下", "すべて", "が", "平和", "で", "ある"]),
    # all-hiragana fox (tokenizer_test.go:143-144) — the lattice must
    # reject けた/たい/しま-style crossings by cost, with no denylist
    ("kagome_ja", "すばやいちゃいろのきつねがなまけたいぬをとびこえた",
     ["すばやい", "ちゃ", "いろ", "の", "きつね", "が", "なまけ", "た",
      "いぬ", "を", "とびこえ", "た"]),
    # everyday-prose + mechanism pins (tests/test_text.py)
    ("gse_ch", "我们的时间问题", ["我们", "的", "时间", "问题"]),
    ("gse_dict", "机器学习很好", ["机器学习", "很好"]),
    ("gse_dict", "犬猫", ["犬", "猫"]),
    ("gse_dict", "今天天气很好 hello 机器学习",
     ["今天", "天气", "很好", "hello", "机器学习"]),
    ("kagome_kr", "사람들의생각", ["사람", "들", "의", "생각"]),
    ("kagome_ja", "会社の会議で質問する",
     ["会社", "の", "会議", "で", "質問", "する"]),
    ("gse_ch", "经济发展需要科学技术",
     ["经济", "发展", "需要", "科学", "技术"]),
    ("kagome_ja", "私たちは東京で勉強します",
     ["私たち", "は", "東京", "で", "勉強", "し", "ます"]),
]


def main() -> None:
    from weaviate_spark.functions.text import tokenize_py

    bad = 0
    for mode, text, expected in FIXTURES:
        got = tokenize_py(text.lower(), mode)
        if got != expected:
            bad += 1
            print(f"DIVERGED [{mode}] {text[:20]!r}")
            print(f"  got  {got}")
            print(f"  want {expected}")
    print(f"{len(FIXTURES)} fixtures, {bad} diverging")
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
