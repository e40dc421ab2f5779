"""Cross-engine agreement on NON-ASCII text — the seam the driver's
correctness gate never exercises (its testdata corpus is ASCII):
accented Latin, CJK, and an astral-plane emoji flow through the BPE
trainer and the CMS sketch on BOTH engines and must match bit-for-bit.
Hazard class under test: Spark's Java regex '(.)' operates on UTF-16
(a surrogate pair could split), DuckDB's RE2 on UTF-8 code points, and
md5 hashes raw bytes — any representation disagreement shows up as a
merge-sequence or counter-matrix diff here.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from extraction.oracles_sql import ORACLES
from extraction.textops import cms_sketch, words

ROWS = [
    (0, "héllo wörld héllo 日本語のテキスト résumé naïve"),
    (1, "héllo wörld emoji \U0001f642\U0001f642 mixed ascii"),
    (2, "日本語のテキスト 日本語 résumé résumé"),
]


@pytest.fixture(scope="module")
def uni_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("uni")
    spark.createDataFrame(ROWS, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def _duck(uni_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{uni_dir}/documents.parquet/*.parquet')"
    )
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_bpe_merge_sequence_matches_duckdb(spark, uni_dir):
    got = sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in entry.q_text_bpe_vocab(spark, uni_dir).collect()
    )
    want = sorted(tuple(r) for r in _duck(uni_dir, ORACLES["text_bpe_vocab"]))
    assert got == want
    # the corpus is non-trivial enough that multi-byte symbols merge
    assert any(len(t1.encode()) > len(t1) for _, t1, _, _ in got), (
        "no multi-byte symbol ever merged; corpus not exercising unicode"
    )


def test_cms_matrix_matches_duckdb(spark, uni_dir):
    docs = spark.read.parquet(f"{uni_dir}/documents.parquet")
    t = docs.select(F.explode(words(F.col("text"))).alias("w"))
    got = {
        (r["row"], r["bucket"]): r["cnt"] for r in cms_sketch(t, "w").collect()
    }
    want = {
        (r[0], r[1]): r[2] for r in _duck(uni_dir, ORACLES["text_cms_sketch"])
    }
    assert got == want
