"""The within-doc repetition signals must match a trivial Python count
on edge cases: empty text, single word, all-same, ties, and interleaved
repeats (the array_sort + run-length fold must count the MODE, not the
longest original-order run)."""

from collections import Counter

from pyspark.sql import functions as F

import __spark_entry__ as entry


def test_repetition_fold_edge_cases(spark, tmp_path):
    rows = [
        (0, "", "en"),
        (1, "one", "en"),
        (2, "a a a a", "en"),
        (3, "x y x y x", "en"),
        (4, "b a b a b a a", "de"),  # interleaved: mode a=4, run max=2
        (5, "  spaced   out  spaced ", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["lang"]: r
        for r in entry.q_text_repetition(spark, str(tmp_path)).collect()
    }

    def expect(texts):
        nw = nd = mc = 0
        for t in texts:
            ws = [w for w in t.split() if w]
            nw += len(ws)
            nd += len(set(ws))
            mc += max(Counter(ws).values()) if ws else 0
        return nw, nd, mc

    en = expect([r[1] for r in rows if r[2] == "en"])
    de = expect([r[1] for r in rows if r[2] == "de"])
    assert (
        got["en"]["sum_words"],
        got["en"]["sum_distinct_words"],
        got["en"]["sum_mode_count"],
    ) == en
    assert got["en"]["n_docs"] == 4
    assert (
        got["de"]["sum_words"],
        got["de"]["sum_distinct_words"],
        got["de"]["sum_mode_count"],
    ) == de
    # pin the interleaved case specifically: mode(a)=4 even though the
    # longest consecutive run in original order is 1
    assert de[2] == 4 + 2  # doc 4 mode 'a'=4, doc 5 mode 'spaced'=2
