"""Count-Min sketch contract (textops.cms_sketch):

1. MERGE LAW — matrices from two disjoint halves combined by
   elementwise ADDITION equal the whole-corpus matrix (shards/days
   sketch independently, fold without rescanning — the same contract
   as test_hll_merge.py and test_quantile_sketch.py).
2. Bounded state — at most d·w cells regardless of corpus size.
3. One-sided estimate — est(x) = min over rows of the cell at h_i(x)
   NEVER undercounts the true frequency (deterministic CMS guarantee,
   not probabilistic), and never exceeds the total item count.
4. Discrimination sanity — on a corpus where one term dominates, the
   estimate preserves the dominant term's lead over a rare term.
"""

import os

import pytest
from pyspark.sql import functions as F

from extraction.textops import cms_sketch, words

SF_DIR = "/root/testdata/sf0.001"
D, W = 4, 64

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver-generated testdata absent",
)


def _tokens(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(words(F.col("text"))).alias("w"),
        )
    )


def _matrix(df):
    return {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(df, "w", D, W).collect()
    }


def _estimate(matrix, spark, term):
    # h_i(term) computed with the same Spark expression as the sketch
    from extraction.textops import cms_cells

    cells = (
        spark.range(1)
        .select(F.explode(cms_cells(F.lit(term), D, W)).alias("c"))
        .select("c.row", "c.bucket")
        .collect()
    )
    return min(matrix.get((r["row"], r["bucket"]), 0) for r in cells)


def test_merge_law(spark):
    t = _tokens(spark)
    whole = _matrix(t)
    a = _matrix(t.filter(F.col("doc_id") % 2 == 0))
    b = _matrix(t.filter(F.col("doc_id") % 2 == 1))
    merged = dict(a)
    for k, c in b.items():
        merged[k] = merged.get(k, 0) + c
    assert merged == whole


def test_state_bounded_and_mass_conserved(spark):
    t = _tokens(spark)
    m = _matrix(t)
    assert len(m) <= D * W
    n = t.count()
    # every row of the matrix holds the full token mass
    for i in range(D):
        assert sum(c for (r, _), c in m.items() if r == i) == n


def test_estimate_never_undercounts(spark):
    t = _tokens(spark)
    m = _matrix(t)
    n = t.count()
    top = (
        t.groupBy("w").count().orderBy(F.desc("count"), "w").limit(5).collect()
    )
    assert top
    for r in top:
        est = _estimate(m, spark, r["w"])
        assert est >= r["count"], (r["w"], est, r["count"])
        assert est <= n


def test_dominant_term_keeps_its_lead(spark):
    rows = [(i, "hot " * 50 + "rare") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = df.select(F.explode(words(F.col("text"))).alias("w"))
    m = _matrix(t)
    assert _estimate(m, spark, "hot") >= 1000
    assert _estimate(m, spark, "rare") < _estimate(m, spark, "hot")


def test_heavy_hitters_query_one_sided_at_corpus_scale(spark):
    """The driver query's overcount column is the corpus-scale form of
    the one-sided guarantee: est_n >= exact_n for every probed heavy
    hitter, and the estimate never exceeds the total token mass."""
    import sys

    repo = __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    rows = entry.q_text_cms_heavy_hitters(spark, sf).collect()
    assert len(rows) == 20
    # total token mass N: every sketch row's counters sum to it exactly
    from extraction.textops import cms_sketch, words

    tok = spark.read.parquet(sf + "/documents.parquet").select(
        F.explode(words(F.col("text"))).alias("w")
    )
    n_tokens = (
        cms_sketch(tok, "w").groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    )
    assert len({r["s"] for r in n_tokens}) == 1  # row-mass conservation
    n = n_tokens[0]["s"]
    for r in rows:
        assert r["est_n"] >= r["exact_n"], (r["word"], r["est_n"], r["exact_n"])
        assert r["overcount"] == r["est_n"] - r["exact_n"]
        assert r["overcount"] >= 0
        # CMS guarantees nothing about ordering under collisions, but an
        # estimate can never exceed the total mass in its sketch row
        assert r["est_n"] <= n
