"""packing.pack_sequences: exact distributed prefix sum / token-budget
binning, pinned against a serial fold — partitioning, bucket count, and
key SPARSENESS must not change a single value."""

import random

import pytest

from extraction.packing import pack_sequences


def _mirror(rows, budget):
    want = {}
    acc = 0
    for i, n in sorted(rows):
        want[i] = (n, acc, acc // budget, max(0, acc % budget + n - budget))
        acc += n
    return want


@pytest.mark.parametrize("seed,n_buckets", [(2, 8), (17, 64), (17, 3)])
def test_matches_serial_fold(spark, seed, n_buckets):
    rng = random.Random(seed)
    # SPARSE ids (gaps + a far outlier): bucket ranges must compose the
    # exact global order regardless of key density
    ids = rng.sample(range(0, 5000), 120) + [99999]
    rows = [(i, rng.randrange(0, 900)) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(7)
    got = {
        r["id"]: (r["n_tokens"], r["cum_before"], r["bin"], r["spill"])
        for r in pack_sequences(
            df, "n_tokens", "doc_id", budget=512, n_buckets=n_buckets
        ).collect()
    }
    assert got == _mirror(rows, 512)


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences(df, "n_tokens", "doc_id", budget=512).count() == 0


def test_doc_spanning_bins_spills(spark):
    # 500 + 500: the second doc starts at 500 (bin 0) and spills 488
    # past the 512 boundary; the third starts at 1000 (bin 1)
    rows = [(0, 500), (1, 500), (2, 100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["id"]: (r["cum_before"], r["bin"], r["spill"])
        for r in pack_sequences(df, "n_tokens", "doc_id", budget=512).collect()
    }
    assert got == {0: (0, 0, 0), 1: (500, 0, 488), 2: (1000, 1, 76)}


def test_bounded_prefix_hist_exact_and_guard(spark):
    from extraction.packing import bounded_prefix_hist

    rows = [(i, i % 5) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, q long")
    prefix, n = bounded_prefix_hist(df, "q")
    assert n == 50
    # 10 docs per value; exclusive prefix = 10 * value
    assert prefix == {v: 10 * v for v in range(5)}

    # wide domain (every row distinct) must fail fast, not collect
    wide = spark.createDataFrame([(i, i) for i in range(2000)],
                                 "doc_id long, q long")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="distinct"):
        bounded_prefix_hist(wide, "q")
