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

    b = (
        SparkSession.builder.appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # media-heavy rows are fat: cap Arrow batches (rows) — the kernel
        # additionally self-limits by total span count (segment.SPAN_BUDGET)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
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
