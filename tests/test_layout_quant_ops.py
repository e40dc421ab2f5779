"""Contracts for the write-layout and quantization operators.

- zorder_interleave: bijective on the 14-bit domain (a Python mirror
  de-interleaves back to the exact inputs), and aligned z-blocks are
  rectangles: shard = z >> 10 is a pure function of (a >> 5, b >> 5),
  so every shard covers exactly one 32x32 tile — the property the
  t11_zorder_layout witness columns summarize.
- sq8_codes / sq8_dot: codes stay in [-128, 127]; dequantized codes
  are within 2^-7 of the input on [-1, 1); the integer dot equals the
  Python-computed dot of the same codes exactly (associativity means
  order cannot matter); and quantization error of the normalized dot
  is bounded by the first-order bound ~2*eps*sqrt(dims) for unit-norm
  vectors (checked with slack on random unit vectors).

One Spark job per property over a seeded batch (vectorized, not
per-example) — the repo's pattern for expression-level contracts.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from extraction.similarity import sq8_codes, sq8_dot
from extraction.textops import zorder_interleave

RNG = np.random.default_rng(20260820)


def _py_interleave(a: int, b: int, bits: int = 7) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def _py_deinterleave(z: int, bits: int = 7) -> tuple[int, int]:
    a = b = 0
    for i in range(bits):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


def test_zorder_bijection_and_tiles(spark):
    pairs = [(int(a), int(b)) for a, b in RNG.integers(0, 128, size=(500, 2))]
    # force coverage of the corners
    pairs += [(0, 0), (127, 127), (0, 127), (127, 0)]
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a", "b", zorder_interleave(F.col("a"), F.col("b"), bits=7).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _py_interleave(r["a"], r["b"])
        assert _py_deinterleave(r["z"]) == (r["a"], r["b"])
        # aligned-block rectangles: shard is a function of the two
        # top-2-bit prefixes only
        shard = r["z"] >> 10
        a5, a6 = (r["a"] >> 5) & 1, (r["a"] >> 6) & 1
        b5, b6 = (r["b"] >> 5) & 1, (r["b"] >> 6) & 1
        assert shard == a5 + 2 * b5 + 4 * a6 + 8 * b6


def test_sq8_codes_bounds_and_error(spark):
    vecs = RNG.uniform(-1.0, 1.0, size=(200, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id long, v array<float>",
    )
    rows = df.select("id", sq8_codes(F.col("v"), shift=7).alias("c")).collect()
    for r in rows:
        v32 = np.asarray(vecs[r["id"]], dtype=np.float32)
        for x, c in zip(v32, r["c"]):
            assert -128 <= c <= 127
            # c = floor(x * 128) clamped; dequant error < 1/128 (exact
            # for the unclamped range, which uniform(-1, 1) floats hit)
            assert c == max(-128, min(127, math.floor(float(x) * 128.0)))
            if -1.0 <= float(x) < 1.0:
                assert abs(c / 128.0 - float(x)) < 1.0 / 128.0


def test_sq8_dot_matches_python_and_bounds_cosine(spark):
    # random UNIT vectors: integer-dot ranking == cosine ranking modulo
    # quantization error; check the dot itself is exact vs Python and
    # the normalized quantization error is within the first-order bound
    raw = RNG.normal(size=(40, 64))
    unit = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(unit)],
        "id long, v array<float>",
    )
    a = df.select(F.col("id").alias("ia"), sq8_codes(F.col("v")).alias("ca"))
    b = df.select(F.col("id").alias("ib"), sq8_codes(F.col("v")).alias("cb"))
    rows = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib", sq8_dot(F.col("ca"), F.col("cb")).alias("dot"))
        .collect()
    )
    # recompute codes in Python from the same float32 values
    codes = np.floor(unit.astype(np.float32).astype(np.float64) * 128.0)
    codes = np.clip(codes, -128, 127).astype(np.int64)
    for r in rows:
        py_dot = int(np.dot(codes[r["ia"]], codes[r["ib"]]))
        assert r["dot"] == py_dot
        true_cos = float(np.dot(unit[r["ia"]], unit[r["ib"]]))
        # |c/128 - x| <= 1/128 per dim => |q·q' - x·x'| <= 2*sum|err|
        # + O(err^2); generous envelope 3*sqrt(64)/128
        assert abs(py_dot / (128.0 * 128.0) - true_cos) < 3 * 8.0 / 128.0
