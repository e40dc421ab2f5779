"""spark-submit entry point.

Usage (north_rule: ships via --py-files; bench/package.sh builds the zip):

    spark-submit --master local[32] --driver-memory 12g \
        --py-files dist/extraction.zip \
        src/extraction/job.py --input /path/docs_parquet \
        --output /path/extracted --lineage /path/lineage \
        --run-id run1 --buckets 64 --partitions 128

(--driver-memory must be on the spark-submit command line — the JVM is
launched before this file's SparkSession config is read.)

``--gen N`` generates the deterministic synthetic corpus (corpus.py)
instead of reading ``--input`` — used by the scaling bench.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_session(
    master: str | None,
    shuffle_partitions: int,
    app: str = "extraction",
    max_partition_bytes: int | None = None,
):
    from pyspark.sql import SparkSession

    import os as _os

    # Allocator split, measured on this box (6-iteration A/B, exp12):
    # - JVM (driver env, set before launch): keep 64 MB Tungsten pages on
    #   the retained glibc heap instead of mmap/munmap per alloc — every
    #   munmap IPIs all task threads (TLB shootdown).
    # - Python workers (spark.executorEnv.*, overrides the inherited JVM
    #   env): jemalloc Arrow pool + stock glibc thresholds. The previous
    #   "system pool + retention" setting made worker RSS grow without
    #   bound (fragmented main arena under alternating 100 MB Arrow /
    #   NumPy allocations) and kernel time per worker exploded — runs
    #   degraded 25 s -> 135 s across iterations; jemalloc stays flat.
    _os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    _os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")

    b = (
        SparkSession.builder.appName(app)
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "jemalloc")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "131072")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "131072")
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
        # tmpfs local dirs don't support sendfile, so the shuffle-merge
        # transferTo path falls back to mmap+copy+munmap per segment —
        # thread dumps show 20+ task threads serialized in FileChannel
        # map0/unmap0 (TLB-shootdown storm, 50-70% system CPU at 32
        # threads). Plain buffered copies (transferTo=false) plus the
        # single-file sort writer (bypassMergeThreshold=0 — no per-reduce
        # file merge pass at all) take the warm 128->128 shuffle of the
        # bench corpus from 4-15 s to <1 s at local[32].
        .config("spark.file.transferTo", "false")
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
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
    if max_partition_bytes:
        # benches read a tiny (tens of MB) corpus: the 128 MB default
        # bin-packs the whole scan into a couple of tasks and the job
        # measures single-core parquet decode. Production keeps the
        # default (row groups are ~128 MB there).
        b = b.config("spark.sql.files.maxPartitionBytes", str(max_partition_bytes))
    if master:
        b = b.master(master)
    return b.getOrCreate()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input")
    p.add_argument(
        "--mode", choices=["extract", "recipe"], default="extract",
        help="extract: span extraction with bucket-commit lineage; "
             "recipe: run the corpus-prep recipe (recipe.py) over a "
             "documents table, ship the survivors to --output through "
             "the catalog seam and append per-(lang, stage) attribution "
             "to --lineage",
    )
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
    p.add_argument("--max-partition-bytes", type=int, default=None)
    p.add_argument("--fail-after", type=int, default=None, help="inject crash after k commits (resume test)")
    p.add_argument(
        "--warmup-docs", type=int, default=0,
        help="run the pipeline over N synthetic docs before the timed run "
             "(JIT + python-worker warmup; a production job amortizes this "
             "over hours — a 60 s bench run does not)",
    )
    a = p.parse_args(argv)

    from extraction.catalog import current_snapshot_id, read_back, read_docs
    from extraction.corpus import corpus_df
    from extraction.lineage import run_with_lineage
    from extraction.schema import DOCS_SCHEMA

    spark = build_session(
        a.master, a.shuffle_partitions, max_partition_bytes=a.max_partition_bytes
    )
    try:
        if a.mode == "recipe":
            from extraction.recipe import run_recipe_sink

            if not a.input:
                p.error(
                    "--mode recipe requires --input (a documents table "
                    "ref or parquet path; --gen only applies to extract "
                    "mode's span corpus)"
                )
            docs = read_docs(spark, a.input)
            stats = run_recipe_sink(
                spark,
                docs,
                a.output,
                a.lineage,
                a.run_id,
                snapshot_id=current_snapshot_id(spark, a.input),
            )
            print(
                f"RECIPE_DONE docs_in={stats['docs_in']} "
                f"docs_kept={stats['docs_kept']}"
            )
            return 0
        snapshot_id = 0
        if a.gen:
            docs = corpus_df(
                spark, a.gen, heavy_spans=a.heavy_spans,
                slices=max(32, (a.partitions or 32)),
            )
        else:
            # --input/--output/--lineage accept either a parquet path or
            # an Iceberg table ref (table:cat.db.name) — catalog.py
            # dispatches; a table input stamps its current snapshot id
            # into every lineage row
            docs = read_docs(spark, a.input, DOCS_SCHEMA)
            snapshot_id = current_snapshot_id(spark, a.input)
        if a.warmup_docs:
            from extraction.pipeline import run_extraction

            warm = corpus_df(
                spark, a.warmup_docs, heavy_spans=a.heavy_spans,
                slices=a.partitions or 32,
            )
            run_extraction(warm, num_partitions=a.partitions).write.format(
                "noop"
            ).mode("overwrite").save()
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
            snapshot_id=snapshot_id,
            fail_after_commits=a.fail_after,
        )
        wall = time.monotonic() - t0
        n = read_back(spark, a.output).count()
        print(f"EXTRACTION_DONE docs={n} wall_sec={wall:.2f} docs_per_sec={n / wall:.1f}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
