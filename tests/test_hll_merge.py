"""HLL register sketch contract (textops.hll_register):

1. MERGE LAW — the whole point of a sketch at 100 TB: registers built
   from two disjoint corpus halves and combined by elementwise MAX must
   equal registers built over the whole corpus in one pass. This is
   what lets a production pipeline sketch each shard/day independently
   and fold without rescanning.
2. Rho sanity — rho is the 1-based position of the lowest set bit of
   the 54-bit hash suffix, so observed values live in [1, 55] and
   small values dominate (geometric distribution).
3. Estimate quality — the classic HLL estimator applied to the m=64
   integer registers (a driver-side float postprocess, deliberately
   outside the hash-gated driver contract) lands within the expected
   ~1.04/sqrt(m) relative-error band (3 sigma) of the true distinct
   count.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

from extraction.textops import hll_register, normalize_text

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver-generated testdata absent",
)


def _registers(df, m=64):
    bucket, rho = hll_register(normalize_text(F.col("text")), m=m)
    rows = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
        .collect()
    )
    regs = [0] * m
    for r in rows:
        regs[r["bucket"]] = r["max_rho"]
    return regs


def test_merge_law_halves_equal_whole(spark):
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    whole = _registers(d)
    a = _registers(d.filter(F.col("doc_id") % 2 == 0))
    b = _registers(d.filter(F.col("doc_id") % 2 == 1))
    merged = [max(x, y) for x, y in zip(a, b)]
    assert merged == whole


def test_rho_range(spark):
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    _, rho = hll_register(normalize_text(F.col("text")))
    stats = d.select(rho.alias("rho")).agg(
        F.min("rho").alias("lo"), F.max("rho").alias("hi")
    ).collect()[0]
    assert 1 <= stats["lo"] and stats["hi"] <= 55


def test_estimate_within_error_band(spark):
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    m = 64
    regs = _registers(d, m=m)
    # classic HLL estimator with small-range (linear counting) correction
    alpha = 0.709  # alpha_64
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
    truth = (
        d.select(F.md5(normalize_text(F.col("text"))).alias("fp"))
        .agg(F.countDistinct("fp"))
        .collect()[0][0]
    )
    rel = abs(est - truth) / truth
    assert rel < 3 * 1.04 / math.sqrt(m), (est, truth, rel)
