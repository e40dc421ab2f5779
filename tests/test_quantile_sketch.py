"""HDR-histogram quantile sketch contract (textops.sig_bucket_lo /
quantile_sketch_hist / quantile_sketch_estimate):

1. MERGE LAW — state built from two disjoint corpus halves and combined
   by per-(group, bucket) count ADDITION must equal state built over
   the whole corpus in one pass (shards/days sketch independently and
   fold without rescanning — the same contract test_hll_merge.py pins
   for HLL).
2. Bounded state — the bucket count per group never exceeds the
   64·2^(sig_bits−1) + 2^sig_bits construction bound regardless of how
   many rows feed it.
3. Pinned error bound — every estimate e vs the exact type-1 quantile
   x satisfies e <= x < e·(1 + 2^-(sig_bits-1)) (the exact value lies
   inside the estimate's bucket).
4. sig_bucket_lo unit semantics — lo <= v, lo keeps exactly sig_bits
   leading bits, and small values (< 2^sig_bits) are exact.
"""

import os

import pytest
from pyspark.sql import functions as F

from extraction.textops import (
    quantile_sketch_estimate,
    quantile_sketch_hist,
    sig_bucket_lo,
    token_count_ws,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver-generated testdata absent",
)

SIG_BITS = 4
PCTS = [25, 50, 75, 90]


def _vals(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(
            "lang",
            F.col("doc_id").cast("long").alias("doc_id"),
            token_count_ws(F.col("text")).alias("v"),
        )
    )


def _state(df):
    return {
        (r["grp"], r["lo"]): r["cnt"]
        for r in quantile_sketch_hist(df, "v", "lang", SIG_BITS).collect()
    }


def test_merge_law(spark):
    d = _vals(spark)
    whole = _state(d)
    a = _state(d.filter(F.col("doc_id") % 2 == 0))
    b = _state(d.filter(F.col("doc_id") % 2 == 1))
    merged = dict(a)
    for k, c in b.items():
        merged[k] = merged.get(k, 0) + c
    assert merged == whole


def test_state_is_bounded(spark):
    bound = 64 * (1 << (SIG_BITS - 1)) + (1 << SIG_BITS)
    per_grp = {}
    for (g, _), _c in _state(_vals(spark)).items():
        per_grp[g] = per_grp.get(g, 0) + 1
    assert per_grp and all(n <= bound for n in per_grp.values())


def test_error_bound_vs_exact(spark):
    d = _vals(spark)
    hist = quantile_sketch_hist(d, "v", "lang", SIG_BITS)
    est = {
        (r["grp"], r["pct"]): r["est"]
        for r in quantile_sketch_estimate(hist, PCTS).collect()
    }
    # exact type-1 quantiles, computed in-driver from the same values
    rows = d.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["v"], r["doc_id"]))
    assert est
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        for pct in PCTS:
            exact = vals[(pct * (n - 1)) // 100][0]
            e = est[(lang, pct)]
            assert e <= exact, (lang, pct, e, exact)
            # exact sits inside the estimate's bucket
            assert exact < max(e + 1, e * (1 + 2 ** -(SIG_BITS - 1))), (
                lang, pct, e, exact,
            )


def test_sig_bucket_lo_semantics(spark):
    vals = [0, 1, 15, 16, 17, 31, 32, 100, 1000, (1 << 40) + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["lo"]
        for r in df.select(
            "v", sig_bucket_lo(F.col("v"), SIG_BITS).alias("lo")
        ).collect()
    }
    for v in vals:
        lo = got[v]
        assert lo <= v
        if v < (1 << SIG_BITS):
            assert lo == v  # small values exact
        else:
            width = 1 << (v.bit_length() - SIG_BITS)
            assert lo == (v // width) * width
            assert v - lo < width
