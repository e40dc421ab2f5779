#!/usr/bin/env python
"""Measure the k-means assignment crossover: packed-fold expression vs
Arrow matmul kernel, as k grows (BENCH/KMEANS.md).

The fold form evaluates O(k·dims) interpreted-HOF ops per point — fine
at the oracle point (k=4) and the sf0.1 operating point (k=16), but
SemDeDup-scale blocking wants k ∝ corpus size (50k clusters on LAION).
The Arrow kernel does the identical int64 arithmetic as one numpy
matmul per ~2^22-cell chunk (cluster._arrow_assigner; bit-equality
pinned by tests/test_cluster_passages.py). This sweep measures the wall
of ONE full-corpus assignment pass (sum(dist) forces it) on a
deterministic synthetic vector table, median of N runs per cell
(BENCH/BASELINE.md measurement protocol: this box swings 2-4x
run-to-run, single observations are meaningless).

Usage: PYTHONPATH=src python tools/kmeans_sweep.py [--n 20000]
       [--ks 16,128,1024] [--repeats 3] [--skip-fold-above 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "src"))
os.environ["PYTHONPATH"] = (
    os.path.join(_REPO, "src") + os.pathsep + os.environ.get("PYTHONPATH", "")
)

from pyspark.sql import functions as F  # noqa: E402


def synth_vectors(spark, n: int, dims: int = 64):
    """Deterministic synthetic embeddings: vec[d] is a pure integer
    function of (id, d) mapped into [-2, 2) — no RNG, same table every
    run and on every engine."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda d: (
                ((F.col("id") * 2654435761 + d * 40503 + 12345) % 1000)
                / 250.0
                - 2.0
            ).cast("float"),
        ).alias("embedding"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--ks", default="16,128,1024")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument(
        "--skip-fold-above",
        type=int,
        default=2048,
        help="skip the fold form above this k (interpreted cost grows "
        "linearly in k; the point is made by then)",
    )
    args = ap.parse_args()

    from extraction.cluster import kmeans_assign
    from extraction.job import build_session

    spark = build_session(
        f"local[{args.cores}]", shuffle_partitions=args.cores * 2,
        app="kmeans-sweep",
    )
    spark.sparkContext.setLogLevel("ERROR")
    vecs = spark.range(0).sparkSession and synth_vectors(spark, args.n)
    vecs = vecs.localCheckpoint()  # eager: exclude synthesis from timing

    ks = [int(k) for k in args.ks.split(",")]
    cells = []
    for k in ks:
        # the fit sample must hold >= k seeds; ~4 sample points per
        # centroid past the 500-point floor
        fit_mod = max(1, args.n // max(500, 4 * k))
        for mode in ("fold", "arrow"):
            if mode == "fold" and k > args.skip_fold_above:
                cells.append({"k": k, "mode": mode, "walls": None})
                continue
            walls = []
            for _ in range(args.repeats):
                t0 = time.monotonic()
                asg, _ = kmeans_assign(
                    vecs, "embedding", "vec_id", k=k, iters=1,
                    fit_mod=fit_mod, assign=mode,
                )
                got = asg.agg(
                    F.sum("dist").alias("s"), F.count("*").alias("n")
                ).collect()[0]
                walls.append(round(time.monotonic() - t0, 3))
                assert got["n"] == args.n
            cells.append(
                {
                    "k": k,
                    "mode": mode,
                    "fit_mod": fit_mod,
                    "walls": walls,
                    "median": statistics.median(walls),
                    "sum_dist": int(got["s"]),
                }
            )
            print(json.dumps(cells[-1]), flush=True)
    # cross-mode witness: sum(dist) must be identical per k
    by_k = {}
    for c in cells:
        if c["walls"]:
            by_k.setdefault(c["k"], set()).add(c["sum_dist"])
    for k, sums in by_k.items():
        assert len(sums) == 1, f"fold/arrow sum(dist) diverged at k={k}: {sums}"

    out = {
        "n": args.n,
        "dims": 64,
        "cores": args.cores,
        "repeats": args.repeats,
        "cells": cells,
        "witness": "sum(dist) identical across modes at every k measured",
    }
    path = os.path.join(_REPO, "BENCH", "kmeans_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
