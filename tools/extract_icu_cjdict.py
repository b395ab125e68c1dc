"""Extract ICU's CJK break-iterator dictionary (cjdict) into a
gse-style ``word<TAB>weight`` frequency list.

Provenance: ICU4J ships inside the PySpark distribution
(pyspark/jars/icu4j-*.jar). Its break-iterator data includes
``cjdict.dict`` — the Chinese/Japanese word dictionary ICU's
dictionary-based word BreakIterator segments CJK text with (~360k
entries, compiled by ICU from openly published word lists; ICU data
is distributed under the Unicode License, which permits redistribution
with notice). This tool parses the public ICU data format and
enumerates the trie:

* ICU data header: ``uint16 headerSize`` + magic ``0xda 0x27`` +
  UDataInfo (endianness flag at byte 8, dataFormat "Dict" at 12..16)
  — icu4c ``ucmndata.h``.
* DictionaryData header: 8 ``int32`` indexes — ``[0]`` trie offset,
  ``[3]`` total size, ``[4]`` trie type (1 = UCharsTrie) | has-values
  bit (8), ``[5]`` transform — icu4c ``common/dictionarydata.h``.
* The trie payload is a serialized UCharsTrie. Rather than
  re-implement the node format, we hand the char sequence to the JVM
  (ICU4J is already on Spark's classpath) and enumerate with the
  PUBLIC ``com.ibm.icu.util.CharsTrie.Iterator`` — each entry is
  (word, value) where the value is ICU's per-word snlp COST (scaled
  negative log probability, derived from corpus frequency; SMALLER =
  more frequent — の carries the minimum 27; icu4c ``dictbe.cpp``
  adds these values along the Viterbi path and keeps the minimum).

Output: ``weaviate_spark/functions/data/cjk_freq_icu.tsv.gz`` — the
data file ``load_frequency_lexicon`` / ``active_cjk_lexicon`` load by
default (functions/text.py), closing the out-of-box dictionary-breadth
gap vs the reference's gse/kagome startup dictionaries
(entities/tokenizer/tokenizer.go:414-485).

Run (one-time; the output is committed):
    python tools/extract_icu_cjdict.py [out.tsv.gz]
"""

from __future__ import annotations

import glob
import gzip
import os
import struct
import sys
import time
import zipfile

DICT_ENTRY = "com/ibm/icu/impl/data/icudata/brkitr/cjdict.dict"


def find_icu4j_jar() -> str:
    import pyspark

    jars = glob.glob(os.path.join(
        os.path.dirname(pyspark.__file__), "jars", "icu4j-*.jar"))
    if not jars:
        raise FileNotFoundError("icu4j jar not found in pyspark/jars")
    return sorted(jars)[-1]


def read_trie_payload(jar_path: str) -> tuple[bytes, str]:
    """Strip the ICU data header + DictionaryData indexes; return the
    raw UCharsTrie bytes and the byte order ('>' or '<')."""
    data = zipfile.ZipFile(jar_path).read(DICT_ENTRY)
    if data[2] != 0xDA or data[3] != 0x27:
        raise ValueError("not an ICU data file (bad magic)")
    big = data[8] == 1  # UDataInfo.isBigEndian
    order = ">" if big else "<"
    header_size = struct.unpack(order + "H", data[:2])[0]
    if data[12:16] != b"Dict":
        raise ValueError(f"unexpected dataFormat {data[12:16]!r}")
    ix = struct.unpack(order + "8i", data[header_size:header_size + 32])
    trie_type = ix[4] & 7
    has_values = bool(ix[4] & 8)
    if trie_type != 1 or not has_values:
        raise ValueError(
            f"expected UCharsTrie with values, got type={trie_type} "
            f"has_values={has_values}")
    if ix[5] != 0:
        raise ValueError(f"unexpected transform {ix[5]:#x}")
    return data[header_size + ix[0]: header_size + ix[3]], order


def extract(spark, out_path: str) -> int:
    from py4j.java_gateway import get_field

    payload, order = read_trie_payload(find_icu4j_jar())
    jvm = spark._jvm
    bb = jvm.java.nio.ByteBuffer.wrap(bytearray(payload))
    if order == "<":
        bb = bb.order(jvm.java.nio.ByteOrder.LITTLE_ENDIAN)
    trie = jvm.com.ibm.icu.util.CharsTrie(bb.asCharBuffer(), 0)
    it = trie.iterator()
    n = 0
    t0 = time.time()
    opener = gzip.open if out_path.endswith(".gz") else open
    with opener(out_path, "wt", encoding="utf-8") as fh:
        fh.write("# Extracted from ICU4J cjdict.dict "
                 "(Unicode License; see tools/extract_icu_cjdict.py)\n")
        fh.write("# word<TAB>cost — ICU per-word snlp cost, SMALLER = "
                 "more frequent (dictbe.cpp Viterbi weights)\n")
        while it.hasNext():
            e = it.next()
            word = get_field(e, "chars").toString()
            value = get_field(e, "value")
            fh.write(f"{word}\t{value}\n")
            n += 1
            if n % 50_000 == 0:
                print(f"  {n} entries ({n / (time.time() - t0):.0f}/s)",
                      file=sys.stderr)
    return n


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weaviate_spark", "functions", "data", "cjk_freq_icu.tsv.gz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[2]")
             .config("spark.ui.enabled", "false").getOrCreate())
    try:
        n = extract(spark, out)
    finally:
        spark.stop()
    print(f"wrote {n} entries to {out}")


if __name__ == "__main__":
    main()
