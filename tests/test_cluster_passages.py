"""Passage-level exact dedup + quantized k-means: exact-semantics tests.

Both operators are bit-exact integer/md5 constructions, so each test
pins equality against an independent pure-Python mirror (the same
third-engine discipline as the DuckDB oracles)."""

import hashlib
import math
import random
import struct

import pytest


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_passage_dedup_first_occurrence_wins(spark):
    from extraction.dedup import passage_dedup_stats

    rows = [
        (0, "Alpha beta gamma delta epsilon zeta ETA theta iota"),
        # doc1's first passage duplicates doc0's (after normalization)
        (1, "alpha beta gamma delta epsilon zeta unique words here now"),
        (2, ""),  # degenerate: no words -> no passages
        (3, "alpha beta gamma delta epsilon zeta"),  # entirely a dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in passage_dedup_stats(df, "text", "doc_id").collect()}

    assert out[0]["n_passages"] == 2 and out[0]["n_kept"] == 2
    # kept_fp witnesses order-preserving reassembly of the survivors
    assert out[0]["kept_fp"] == _md5("alpha beta gamma delta epsilon zeta eta theta iota")
    assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["kept_fp"] == _md5("unique words here now")
    assert out[2]["n_passages"] == 0 and out[2]["n_kept"] == 0
    assert out[2]["kept_fp"] == _md5("")
    # doc3: its only passage lost to doc0 pos0 -> nothing survives
    assert out[3]["n_passages"] == 1 and out[3]["n_kept"] == 0


def test_passage_dedup_matches_python_mirror(spark):
    """Randomized corpus vs a serial pure-Python keep-first mirror —
    partitioning/visit order must not leak into the result."""
    from extraction.dedup import passage_dedup_stats

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> many passage dups
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    got = {r["id"]: r for r in passage_dedup_stats(df, "text", "doc_id", 4).collect()}

    seen: set[str] = set()
    for doc_id, text in rows:  # doc order == (doc_id, pos) order here
        ws = text.split()
        ps = [" ".join(ws[i : i + 4]) for i in range(0, len(ws), 4)]
        kept = []
        for p in ps:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        r = got[doc_id]
        assert r["n_passages"] == len(ps)
        assert r["n_kept"] == len(kept)
        assert r["kept_fp"] == _md5(" ".join(kept))


def _kmeans_mirror(vecs, k, iters):
    """Serial quantized-Lloyd reference (floor to the 2^14 grid; ties ->
    lowest cid; empty clusters keep their centroid)."""

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    pts = {i: [math.floor(f32(v) * 16384.0) for v in vec] for i, vec in vecs}
    cents = {i: pts[i][:] for i in range(k)}

    def assign(p):
        best = (1 << 62, -1)
        for cid in sorted(cents):
            d = sum((a - b) * (a - b) for a, b in zip(p, cents[cid]))
            if d < best[0]:
                best = (d, cid)
        return best

    for _ in range(iters):
        sums = {}
        for p in pts.values():
            _, c = assign(p)
            s, n = sums.get(c, ([0] * len(p), 0))
            sums[c] = ([a + b for a, b in zip(s, p)], n + 1)
        for c, (s, n) in sums.items():
            cents[c] = [v // n for v in s]
    stats = {}
    for p in pts.values():
        d, c = assign(p)
        n, w = stats.get(c, (0, 0))
        stats[c] = (n + 1, w + d)
    digests = {c: sum(m * (d + 1) for d, m in enumerate(mv)) for c, mv in cents.items()}
    return stats, digests


@pytest.mark.parametrize("seed,n", [(7, 40), (23, 90)])
def test_kmeans_quantized_bit_exact(spark, seed, n):
    from extraction.cluster import kmeans_quantized

    rng = random.Random(seed)
    vecs = [(i, [rng.uniform(-0.5, 0.5) for _ in range(64)]) for i in range(n)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").repartition(5)
    got = {r["cluster"]: r for r in kmeans_quantized(df, "embedding", "vec_id", k=4, iters=2).collect()}
    stats, digests = _kmeans_mirror(vecs, k=4, iters=2)

    assert set(got) == set(stats)
    for c, (n_pts, wcss) in stats.items():
        assert got[c]["n_points"] == n_pts
        assert got[c]["wcss"] == wcss
        assert got[c]["centroid_digest"] == digests[c]


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A seed point that attracts nothing after iteration 1 must keep
    its previous centroid (not crash or drop the cluster)."""
    from extraction.cluster import kmeans_quantized

    # seeds 1 and 2 are IDENTICAL: every point near them ties and the
    # lowest cid (1) wins, so cluster 2 receives zero points from the
    # first assignment on — the keep-previous-centroid branch runs in
    # every iteration and cluster 2 is absent from the final output
    vecs = [(i, [0.25] * 64) for i in [0] + list(range(4, 20))]
    vecs += [(1, [-0.4] * 64), (2, [-0.4] * 64), (3, [-0.3] * 64)]
    df = spark.createDataFrame(sorted(vecs), "vec_id long, embedding array<float>")
    got = {r["cluster"]: r for r in kmeans_quantized(df, "embedding", "vec_id", k=4, iters=2).collect()}
    stats, digests = _kmeans_mirror(sorted(vecs), k=4, iters=2)
    assert {c: (r["n_points"], r["wcss"], r["centroid_digest"]) for c, r in got.items()} == {
        c: (n, w, digests[c]) for c, (n, w) in stats.items()
    }
