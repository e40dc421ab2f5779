"""spark-submit entry point.

Usage (north_rule: ships via --py-files; bench/package.sh builds the zip):

    spark-submit --master local[32] --py-files dist/extraction.zip \
        src/extraction/job.py --input /path/docs_parquet \
        --output /path/extracted --lineage /path/lineage \
        --run-id run1 --buckets 64 --partitions 128

``--gen N`` generates the deterministic synthetic corpus (corpus.py)
instead of reading ``--input`` — used by the scaling bench.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_session(master: str | None, shuffle_partitions: int, app: str = "extraction"):
    from pyspark.sql import SparkSession

    import os as _os

    # Arrow buffer lifecycle tuning for the python workers (inherited via
    # the JVM env in local mode; spark.executorEnv.* covers clusters).
    # The default jemalloc pool munmaps every freed 64 MB batch buffer —
    # at 32 concurrent workers the resulting TLB-shootdown storm burns
    # 50-70 % of ALL cores in system time (measured with vmstat: sy=73).
    # glibc with a high trim threshold retains and reuses the arenas.
    _os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    _os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")

    b = (
        SparkSession.builder.appName(app)
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "268435456")
        # local mode runs everything in the driver JVM; the 1g default
        # heap thrashes GC with 32 concurrent tasks over fat Arrow
        # batches (only effective at first JVM launch in the process).
        # Measured on this box: G1 collapses under the Arrow JNI
        # critical sections (GCLocker retry storms) at high task
        # concurrency — throughput-oriented ParallelGC is ~3× faster for
        # this batch workload, and a moderate heap beats a huge one.
        .config("spark.driver.memory", _os.environ.get("EXTRACTION_DRIVER_MEM", "12g"))
        .config("spark.driver.maxResultSize", "4g")
        .config(
            "spark.driver.extraJavaOptions",
            _os.environ.get("EXTRACTION_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        # shuffle spill dir: this sandbox's disk sustains ~65 MB/s
        # buffered writes (writeback throttling blocks shuffle writers in
        # D-state and serializes the whole job); RAM-backed local dirs
        # remove that artifact. A real cluster provisions NVMe for
        # shuffle — this models that, it does not hide a plan problem.
        .config(
            "spark.local.dir",
            _os.environ.get("EXTRACTION_LOCAL_DIR", "/dev/shm/spark-local"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big batches amortize per-batch Arrow/python overhead for light
        # docs; fat media-heavy rows are bounded by the BYTE cap
        # (maxBytesPerBatch, 64m default), and the kernel additionally
        # self-limits by total span count (segment.SPAN_BUDGET)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    if master:
        b = b.master(master)
    return b.getOrCreate()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input")
    p.add_argument("--gen", type=int, help="generate N synthetic docs instead of reading --input")
    p.add_argument("--heavy-spans", type=int, default=2000)
    p.add_argument("--output", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--buckets-per-commit", type=int, default=16)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=64)
    p.add_argument("--master", default=None)
    p.add_argument("--fail-after", type=int, default=None, help="inject crash after k commits (resume test)")
    a = p.parse_args(argv)

    from extraction.corpus import corpus_df
    from extraction.lineage import run_with_lineage
    from extraction.schema import DOCS_SCHEMA

    spark = build_session(a.master, a.shuffle_partitions)
    try:
        if a.gen:
            docs = corpus_df(
                spark, a.gen, heavy_spans=a.heavy_spans,
                slices=max(32, (a.partitions or 32)),
            )
        else:
            docs = spark.read.schema(DOCS_SCHEMA).parquet(a.input)
        t0 = time.monotonic()
        run_with_lineage(
            spark,
            docs,
            a.output,
            a.lineage,
            a.run_id,
            num_buckets=a.buckets,
            buckets_per_commit=a.buckets_per_commit,
            num_partitions=a.partitions,
            fail_after_commits=a.fail_after,
        )
        wall = time.monotonic() - t0
        n = spark.read.parquet(a.output).count()
        print(f"EXTRACTION_DONE docs={n} wall_sec={wall:.2f} docs_per_sec={n / wall:.1f}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
