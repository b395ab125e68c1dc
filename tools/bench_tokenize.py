"""CJK tokenizer throughput: lattice (r11) vs greedy FMM (r10 shape).

The r11 lattice replaced greedy forward-maximum-matching in the
gse/kagome modes' hot path (an Arrow pandas UDF). This bench measures
the cost of that swap two ways:

* python-level: segment a fixed corpus of synthetic CJK sentences with
  the live lattice (segment_cjk_py) and with an inline greedy FMM
  reimplementation over the same dictionary — chars/sec each;
* engine-level: tokenize the same corpus as a DataFrame column through
  the real broadcast-shipped UDF (`gse_dict` and `gse_all` modes) —
  docs/sec end to end.

Usage: python tools/bench_tokenize.py [out.json] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(n: int) -> list[str]:
    """Deterministic synthetic CJK sentences (zh/ja/kr mix) built from
    real vocabulary so dictionary hit rates are realistic."""
    zh = ("我们 的 时间 问题 机器学习 数据分析 人工智能 搜索 引擎 向量 "
          "数据库 经济 发展 需要 科学 技术 北京 大学 学生 老师").split()
    ja = ("私たち は 東京 で 勉強 し ます 大学院 の 研究所 へ 新幹線 "
          "行く 会社 会議 質問 する 素早い 茶色 狐").split()
    kr = ("아버지 가 방 에 들어가 신다 한국어 를 처리 하 는 예시 "
          "입니다 도서관 숙제 준비 결정 생각 사람 들").split()
    pools = [zh, ja, kr]
    out = []
    for i in range(n):
        pool = pools[i % 3]
        # deterministic pseudo-random pick without random module
        words = [pool[(i * 7 + j * 13) % len(pool)] for j in range(12)]
        out.append("".join(words))
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from weaviate_spark.functions.text import (
        active_cjk_costs, active_cjk_max_word, segment_cjk_py,
        tokenize_py,
    )

    corpus = make_corpus(n)
    total_chars = sum(len(s) for s in corpus)
    costs = active_cjk_costs()
    maxw = active_cjk_max_word()

    # python-level: lattice
    t0 = time.time()
    n_tok_lat = sum(len(segment_cjk_py(s, costs, maxw)) for s in corpus)
    lat_sec = time.time() - t0

    # python-level: inline greedy FMM over the same dictionary (the r10
    # algorithm, reimplemented here so the comparison survives its
    # deletion from the engine)
    def fmm(run: str) -> list[str]:
        out, pos, ln_run = [], 0, len(run)
        while pos < ln_run:
            pick = run[pos]
            for ln in range(min(maxw, ln_run - pos), 1, -1):
                if run[pos:pos + ln] in costs:
                    pick = run[pos:pos + ln]
                    break
            out.append(pick)
            pos += len(pick)
        return out

    t0 = time.time()
    n_tok_fmm = sum(len(fmm(s)) for s in corpus)
    fmm_sec = time.time() - t0

    # engine-level: the real Arrow UDF path
    from weaviate_spark.session import get_spark
    from weaviate_spark.functions.text import tokenize
    from pyspark.sql import functions as F

    spark = get_spark("tokenize-bench", cpus=8)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "id long, t string")
    df = df.cache()
    df.count()
    engine = {}
    for mode in ("gse_dict", "gse_all", "word", "trigram"):
        fn = lambda: df.select(
            F.sum(F.size(tokenize(F.col("t"), mode)))).collect()[0][0]
        fn()  # warm (plan + broadcast)
        t0 = time.time()
        toks = fn()
        engine[mode] = {
            "sec": round(time.time() - t0, 3),
            "docs_per_sec": round(n / (time.time() - t0)),
            "tokens": int(toks),
        }
    result = {
        "metric": "CJK tokenizer throughput, lattice (r11) vs greedy FMM (r10)",
        "n_docs": n, "total_chars": total_chars,
        "python_level": {
            "lattice": {"sec": round(lat_sec, 3),
                        "chars_per_sec": round(total_chars / lat_sec),
                        "tokens": n_tok_lat},
            "greedy_fmm": {"sec": round(fmm_sec, 3),
                           "chars_per_sec": round(total_chars / fmm_sec),
                           "tokens": n_tok_fmm},
            "lattice_over_fmm": round(lat_sec / fmm_sec, 3),
        },
        "engine_level_arrow_udf": engine,
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
