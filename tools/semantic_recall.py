#!/usr/bin/env python
"""Measure SemDeDup blocking recall vs exact all-pairs ground truth.

Pure-Python mirror of cluster.semantic_near_pairs{,_multi} (quantized
Lloyd fit — optionally on the ``id % fit_mod == 0`` sample, the
production shape — top-1 / top-2 assignment, integer-exact cosine
threshold) over the sf0.01 embeddings — prints the table recorded in
BENCH/DEDUP_RECALL.md §semantic blocking.
"""

from __future__ import annotations

import math

import duckdb

SF = "/root/testdata/sf0.01/embeddings.parquet"
GRID = 16384
NUM, DEN = 2, 5
K, ITERS = 4, 2


def main() -> int:
    rows = duckdb.sql(
        f"select vec_id, embedding from read_parquet('{SF}') order by vec_id"
    ).fetchall()
    pts = {int(i): [math.floor(float(x) * GRID) for x in v] for i, v in rows}
    norms = {i: sum(x * x for x in q) for i, q in pts.items()}

    ids = sorted(pts)
    truth = set()
    for xi in range(len(ids)):
        for yi in range(xi + 1, len(ids)):
            a, b = ids[xi], ids[yi]
            dot = sum(p * q for p, q in zip(pts[a], pts[b]))
            if dot > 0 and dot * dot * DEN * DEN >= NUM * NUM * norms[a] * norms[b]:
                truth.add((a, b))
    print(f"exact all-pairs cos >= {NUM}/{DEN}: {len(truth)} true pairs")

    for fit_mod in (1, 5):
        # seeds: k lowest-id points of the fit sample (cluster.kmeans_assign)
        fit_ids = [i for i in ids if i % fit_mod == 0]
        cents = {i: list(pts[i]) for i in fit_ids[:K]}

        def top(q, nbest):
            ds = sorted(
                (sum((x - y) * (x - y) for x, y in zip(q, cents[c])), c)
                for c in sorted(cents)
            )
            return [c for _, c in ds[:nbest]]

        for _ in range(ITERS):
            sums: dict[int, list[int]] = {}
            cnt: dict[int, int] = {}
            for i in fit_ids:
                q = pts[i]
                c = top(q, 1)[0]
                cnt[c] = cnt.get(c, 0) + 1
                s = sums.setdefault(c, [0] * len(q))
                for d, v in enumerate(q):
                    s[d] += v
            for c, s in sums.items():
                cents[c] = [v // cnt[c] for v in s]

        for nb in (1, 2):
            blocks: dict[int, set[int]] = {}
            for i, q in pts.items():
                for c in top(q, nb):
                    blocks.setdefault(c, set()).add(i)
            found = {
                p
                for p in truth
                if any(p[0] in s and p[1] in s for s in blocks.values())
            }
            cand = sum(len(s) * (len(s) - 1) // 2 for s in blocks.values())
            print(
                f"k={K} fit_mod={fit_mod} assign-top{nb}: blocked recall"
                f" {len(found)}/{len(truth)} = {len(found) / len(truth):.3f};"
                f" within-block candidate pairs {cand}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
