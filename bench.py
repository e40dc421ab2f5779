#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Beyond the per-query seconds it reports the north metric
(BASELINE.json): extraction docs/sec on the deterministic synthetic
corpus, measured at two parallelism levels (local[N/4] and local[N])
with ``efficiency = T(N) / (4 * T(N/4))`` — the sandbox stand-in for
the N→4N executor scaling criterion (BASELINE.md protocol).

Set SPARK_GRAFT_BENCH_SCALING=0 to skip the second (small) session and
only report single-level throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_REPO, "src")
sys.path.insert(0, _REPO)  # __spark_entry__
sys.path.insert(0, _SRC)  # extraction package
# python workers inherit the JVM's env captured at session launch — set
# PYTHONPATH before any SparkSession is built (prod ships --py-files)
os.environ["PYTHONPATH"] = _SRC + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
# extraction corpus size for the throughput measurement (docs)
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
HEAVY_SPANS = int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_SPANS", "2000"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def build_session(cores: int, app: str):
    from extraction.job import build_session as _bs

    return _bs(f"local[{cores}]", shuffle_partitions=cores, app=app)


def _force(df) -> int:
    """Fully execute a DataFrame without driver-side materialization."""
    return df.write.format("noop").mode("overwrite").save() or 0


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    # warmup: JVM/JIT + parquet footer caches, so query 1 isn't charged
    # session-startup cost
    for t in ("events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()

    times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.monotonic()
        _force(fn(spark, SF_DIR))
        times[name] = round(time.monotonic() - t0, 3)
    return times


def measure_extraction(spark, n_docs: int) -> dict:
    """North metric: docs/sec through the full extraction pipeline."""
    from extraction.corpus import corpus_df
    from extraction.pipeline import run_extraction

    cores = spark.sparkContext.defaultParallelism
    docs = corpus_df(spark, n_docs, heavy_spans=HEAVY_SPANS, slices=cores * 4)
    # exclude corpus synthesis from the measured window: materialize input
    docs = docs.persist()
    docs.count()
    t0 = time.monotonic()
    _force(run_extraction(docs, num_partitions=cores * 4))
    wall = time.monotonic() - t0
    docs.unpersist()
    return {
        "docs": n_docs,
        "cores": cores,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
    }


def main() -> int:
    t_all = time.monotonic()
    spark = build_session(CPUS, "bench")
    try:
        qtimes = run_queries(spark)
        ext_full = measure_extraction(spark, N_DOCS)
    finally:
        spark.stop()

    scaling = None
    if RUN_SCALING and CPUS >= 4:
        small = max(1, CPUS // 4)
        spark = build_session(small, "bench-scaling")
        try:
            ext_small = measure_extraction(spark, N_DOCS)
        finally:
            spark.stop()
        eff = ext_full["docs_per_sec"] / (4.0 * ext_small["docs_per_sec"])
        scaling = {
            "n_cores": small,
            "n4_cores": CPUS,
            "n_docs_per_sec": ext_small["docs_per_sec"],
            "n4_docs_per_sec": ext_full["docs_per_sec"],
            "efficiency": round(eff, 3),
        }

    total = round(sum(qtimes.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": _sf_of(SF_DIR),
        "extract": ext_full,
        "scaling": scaling,
        "bench_wall_sec": round(time.monotonic() - t_all, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
