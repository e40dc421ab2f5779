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


def _semantic_mirror(vecs, k, iters, num, den):
    """Serial SemDeDup mirror: final Lloyd assignment as the block key,
    then exact integer cosine-threshold pairs within each block."""

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
        return best[1]

    for _ in range(iters):
        sums = {}
        for p in pts.values():
            c = assign(p)
            s, n = sums.get(c, ([0] * len(p), 0))
            sums[c] = ([a + b for a, b in zip(s, p)], n + 1)
        for c, (s, n) in sums.items():
            cents[c] = [v // n for v in s]

    blocks: dict[int, list[int]] = {}
    for i, p in pts.items():
        blocks.setdefault(assign(p), []).append(i)
    pairs = set()
    for cl, ids in blocks.items():
        ids.sort()
        for xi in range(len(ids)):
            for yi in range(xi + 1, len(ids)):
                a, b = ids[xi], ids[yi]
                dot = sum(p * q for p, q in zip(pts[a], pts[b]))
                na2 = sum(v * v for v in pts[a])
                nb2 = sum(v * v for v in pts[b])
                if dot > 0 and dot * dot * den * den >= num * num * na2 * nb2:
                    pairs.add((a, b, cl))
    return pairs


@pytest.mark.parametrize("seed,n", [(3, 50), (19, 80)])
def test_semantic_near_pairs_matches_mirror(spark, seed, n):
    """Planted near-dup groups + background noise: the Spark pair set
    must equal the serial mirror exactly (including which pairs are
    LOST to cluster-boundary splits — the blocking recall caveat is
    part of the spec, not slack)."""
    from extraction.cluster import semantic_near_pairs

    rng = random.Random(seed)
    vecs = []
    for i in range(n):
        if i >= 8 and i % 5 == 0:  # plant a near-dup of an earlier point
            base = vecs[i - 4][1]
            vecs.append((i, [v + rng.uniform(-0.02, 0.02) for v in base]))
        else:
            vecs.append((i, [rng.uniform(-0.5, 0.5) for _ in range(64)]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").repartition(6)
    got = {
        (r["id_a"], r["id_b"], r["cluster"])
        for r in semantic_near_pairs(
            df, "embedding", "vec_id", k=4, iters=2, threshold_num=9, threshold_den=10
        ).collect()
    }
    want = _semantic_mirror(vecs, k=4, iters=2, num=9, den=10)
    assert len(want) > 0  # the planted dups must actually pair
    assert got == want


def _semantic_multi_mirror(vecs, k, iters, num, den):
    """Serial top-2-assignment SemDeDup mirror: every point belongs to
    its two nearest final centroids (ties -> lowest cid); pairs dedupe
    with the shared-block count as witness."""

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    pts = {i: [math.floor(f32(v) * 16384.0) for v in vec] for i, vec in vecs}
    cents = {i: pts[i][:] for i in range(k)}

    def top(p, nbest):
        ds = sorted(
            (sum((a - b) * (a - b) for a, b in zip(p, cents[c])), c)
            for c in sorted(cents)
        )
        return [c for _, c in ds[:nbest]]

    for _ in range(iters):
        sums = {}
        for p in pts.values():
            c = top(p, 1)[0]
            s, n = sums.get(c, ([0] * len(p), 0))
            sums[c] = ([a + b for a, b in zip(s, p)], n + 1)
        for c, (s, n) in sums.items():
            cents[c] = [v // n for v in s]

    blocks: dict[int, list[int]] = {}
    for i, p in pts.items():
        for c in top(p, 2):
            blocks.setdefault(c, []).append(i)
    norms = {i: sum(v * v for v in p) for i, p in pts.items()}
    pairs: dict[tuple[int, int], int] = {}
    for cl, ids in blocks.items():
        ids.sort()
        for xi in range(len(ids)):
            for yi in range(xi + 1, len(ids)):
                a, b = ids[xi], ids[yi]
                dot = sum(p * q for p, q in zip(pts[a], pts[b]))
                if dot > 0 and dot * dot * den * den >= num * num * norms[a] * norms[b]:
                    pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return pairs


@pytest.mark.parametrize("seed,n", [(3, 50), (41, 80)])
def test_semantic_multi_matches_mirror_and_recovers_boundary_pairs(spark, seed, n):
    from extraction.cluster import semantic_near_pairs, semantic_near_pairs_multi

    rng = random.Random(seed)
    vecs = []
    for i in range(n):
        if i >= 8 and i % 5 == 0:
            base = vecs[i - 4][1]
            vecs.append((i, [v + rng.uniform(-0.02, 0.02) for v in base]))
        else:
            vecs.append((i, [rng.uniform(-0.5, 0.5) for _ in range(64)]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").repartition(6)
    got = {
        (r["id_a"], r["id_b"]): r["n_shared_blocks"]
        for r in semantic_near_pairs_multi(
            df, "embedding", "vec_id", k=4, iters=2, threshold_num=9, threshold_den=10
        ).collect()
    }
    want = _semantic_multi_mirror(vecs, k=4, iters=2, num=9, den=10)
    assert got == want
    # top-2 must be a superset of single assignment (recall can only rise)
    single = {
        (r["id_a"], r["id_b"])
        for r in semantic_near_pairs(
            df, "embedding", "vec_id", k=4, iters=2, threshold_num=9, threshold_den=10
        ).collect()
    }
    assert single <= set(got)


def test_semantic_sample_fit_matches_mirror(spark):
    """fit_mod=3: the Lloyd loop runs on ids % 3 == 0 only (seeds = the
    k lowest sample ids), but the FULL corpus is assigned and paired —
    pinned against a mirror with the identical sample filter."""
    from extraction.cluster import semantic_near_pairs

    rng = random.Random(29)
    vecs = []
    for i in range(60):
        if i >= 8 and i % 5 == 0:
            base = vecs[i - 4][1]
            vecs.append((i, [v + rng.uniform(-0.02, 0.02) for v in base]))
        else:
            vecs.append((i, [rng.uniform(-0.5, 0.5) for _ in range(64)]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").repartition(4)
    got = {
        (r["id_a"], r["id_b"], r["cluster"])
        for r in semantic_near_pairs(
            df, "embedding", "vec_id", k=4, iters=2,
            threshold_num=9, threshold_den=10, fit_mod=3,
        ).collect()
    }

    # mirror: fit on the sample, assign everything
    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    pts = {i: [math.floor(f32(v) * 16384.0) for v in vec] for i, vec in vecs}
    fit_ids = sorted(i for i in pts if i % 3 == 0)
    cents = {i: pts[i][:] for i in fit_ids[:4]}

    def assign(p):
        best = (1 << 62, -1)
        for cid in sorted(cents):
            d = sum((a - b) * (a - b) for a, b in zip(p, cents[cid]))
            if d < best[0]:
                best = (d, cid)
        return best[1]

    for _ in range(2):
        sums = {}
        for i in fit_ids:
            c = assign(pts[i])
            s, n = sums.get(c, ([0] * 64, 0))
            sums[c] = ([a + b for a, b in zip(s, pts[i])], n + 1)
        for c, (s, n) in sums.items():
            cents[c] = [v // n for v in s]
    blocks: dict[int, list[int]] = {}
    for i, p in pts.items():
        blocks.setdefault(assign(p), []).append(i)
    norms = {i: sum(v * v for v in p) for i, p in pts.items()}
    want = set()
    for cl, ids in blocks.items():
        ids.sort()
        for xi in range(len(ids)):
            for yi in range(xi + 1, len(ids)):
                a, b = ids[xi], ids[yi]
                dot = sum(p * q for p, q in zip(pts[a], pts[b]))
                if dot > 0 and dot * dot * 100 >= 81 * norms[a] * norms[b]:
                    want.add((a, b, cl))
    assert len(want) > 0
    assert got == want
    # cluster labels are SEED ids: all from the fit sample
    assert {c for _, _, c in got} <= set(fit_ids[:4])


def test_semantic_near_pairs_zero_norm_never_pairs(spark):
    """Zero vectors fail dot > 0 and must not pair with anything (the
    NaN-cosine guard rule shared with similarity.cosine)."""
    from extraction.cluster import semantic_near_pairs

    vecs = [(i, [0.3] * 64) for i in range(4)]  # seeds, all identical
    vecs += [(4, [0.0] * 64), (5, [0.0] * 64), (6, [0.3] * 64)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = semantic_near_pairs(
        df, "embedding", "vec_id", k=4, iters=1, threshold_num=1, threshold_den=2
    ).collect()
    ids_in_pairs = {r["id_a"] for r in got} | {r["id_b"] for r in got}
    assert 4 not in ids_in_pairs and 5 not in ids_in_pairs
    assert len(got) > 0  # the identical non-zero vectors do pair


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


@pytest.mark.parametrize("seed,n,k", [(7, 80, 4), (23, 120, 9)])
def test_arrow_assignment_bit_equals_fold(spark, seed, n, k):
    """The Arrow matmul assignment kernel (cluster._arrow_assigner)
    must be bit-identical to the packed-fold expression on every
    surface it replaces: per-point (cl, dist), the final centroid
    model, single-assignment pairs, and top-2 pairs — including
    distance TIES (the planted duplicate vectors tie exactly; both
    paths must keep the lowest cid)."""
    from extraction.cluster import (
        kmeans_assign,
        semantic_near_pairs,
        semantic_near_pairs_multi,
    )

    rng = random.Random(seed)
    vecs = []
    for i in range(n):
        if i >= 10 and i % 7 == 0:
            vecs.append((i, list(vecs[i - 5][1])))  # exact duplicate -> ties
        elif i >= 8 and i % 5 == 0:
            base = vecs[i - 4][1]
            vecs.append((i, [v + rng.uniform(-0.02, 0.02) for v in base]))
        else:
            vecs.append((i, [rng.uniform(-0.5, 0.5) for _ in range(64)]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").repartition(5)

    af, cf = kmeans_assign(df, "embedding", "vec_id", k=k, iters=2, fit_mod=2, assign="fold")
    aa, ca = kmeans_assign(df, "embedding", "vec_id", k=k, iters=2, fit_mod=2, assign="arrow")
    assert cf == ca
    assert {(r["id"], r["cl"], r["dist"]) for r in af.collect()} == {
        (r["id"], r["cl"], r["dist"]) for r in aa.collect()
    }

    for fn, cols in (
        (semantic_near_pairs, ("id_a", "id_b", "cluster")),
        (semantic_near_pairs_multi, ("id_a", "id_b", "n_shared_blocks")),
    ):
        fold = {
            tuple(r[c] for c in cols)
            for r in fn(
                df, "embedding", "vec_id", k=k, iters=2,
                threshold_num=9, threshold_den=10,
            ).collect()
        }
        arrow = {
            tuple(r[c] for c in cols)
            for r in fn(
                df, "embedding", "vec_id", k=k, iters=2,
                threshold_num=9, threshold_den=10, assign="arrow",
            ).collect()
        }
        assert fold == arrow and len(fold) > 0


def test_boilerplate_ngram_stats_fixture(spark):
    """Hand-built corpus: a shared 'footer' phrase within a source is
    boilerplate; the same phrase in another source is NOT (df is per
    source); within-doc repetition alone never qualifies; coverage
    counts DISTINCT token positions (overlapping grams don't double-
    count)."""
    from extraction.dedup import boilerplate_ngram_stats

    rows = [
        # srcA: docs 0,1 share "visit our site" (+ punctuation/case noise)
        (0, "Visit our site! alpha beta gamma", "srcA"),
        (1, "delta VISIT our site epsilon", "srcA"),
        # doc2: repeats a gram twice WITHIN itself only -> not boilerplate
        (2, "zeta eta theta zeta eta theta", "srcA"),
        # srcB: has "visit our site" once — alone in its source -> content
        (3, "visit our site iota kappa", "srcB"),
        (4, "mu nu", "srcB"),  # < k words -> no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string").repartition(3)
    got = {
        r["id"]: (r["n_tokens"], r["n_boiler_grams"], r["n_boiler_tokens"])
        for r in boilerplate_ngram_stats(df, "text", "doc_id", "source", k=3, min_df=2).collect()
    }
    # doc0: tokens [visit,our,site,alpha,beta,gamma]; 1 boiler gram covers 3
    assert got[0] == (6, 1, 3)
    # doc1: [delta,visit,our,site,epsilon]; 1 gram at pos1 covers 3
    assert got[1] == (5, 1, 3)
    # doc2: within-doc repetition only -> ("zeta eta theta" df=1)
    assert got[2] == (6, 0, 0)
    # doc3: srcB's only occurrence -> content
    assert got[3] == (5, 0, 0)
    assert got[4] == (2, 0, 0)


def test_boilerplate_overlap_coverage_not_double_counted(spark):
    """Two docs sharing a 5-word run produce 3 overlapping boilerplate
    3-grams; coverage must be 5 positions (the union), not 9."""
    from extraction.dedup import boilerplate_ngram_stats

    rows = [
        (0, "one two three four five tail0 x", "s"),
        (1, "head1 one two three four five y", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["id"]: (r["n_tokens"], r["n_boiler_grams"], r["n_boiler_tokens"])
        for r in boilerplate_ngram_stats(df, "text", "doc_id", "source", k=3, min_df=2).collect()
    }
    assert got[0] == (7, 3, 5)
    assert got[1] == (7, 3, 5)
