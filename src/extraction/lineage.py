"""Checkpoint/lineage protocol: per-partition commits + idempotent resume.

The reference's only resume mechanism is TF training checkpoints
(src/train_detector.py:185-189,241-242 — restore latest and continue);
extraction itself recomputes everything on rerun. Here every committed
*bucket group* (a deterministic range of pmod(xxhash64(doc_id), B)
buckets) writes its output plus one lineage row per bucket; a restarted
run anti-joins the lineage table and processes only uncommitted buckets
(SURVEY.md §4 "resume" row, FIXTURES.md §3 schema).

Sinks dispatch through ``catalog.py``: an output/lineage ref of the form
``table:cat.db.name`` commits via Iceberg ``writeTo`` (overwritePartitions
for bucket groups — one atomic snapshot per commit — and append for
lineage rows); any other ref is a hive-style parquet path (this sandbox
has no Iceberg jars, so that branch is what the tests drive). Both are
append-only and idempotent at bucket granularity: output is partitioned
by bucket, so a re-executed uncommitted bucket overwrites only its own
buckets (dynamic overwrite), never touching committed data.

At 10^12-doc scale the docs table is partitioned/bucketed by the same
hash, so each bucket-group filter prunes to its own files instead of
rescanning the corpus.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import append_rows, overwrite_buckets, read_back
from .pipeline import (
    HEAVY_SPAN_THRESHOLD,
    partition_index_salts,
    run_extraction,
    with_partition_id,
)
from .schema import LINEAGE_SCHEMA


def committed_buckets(spark: SparkSession, lineage_path: str, run_id: str) -> set[int]:
    try:
        rows = (
            read_back(spark, lineage_path, LINEAGE_SCHEMA)
            .filter(F.col("run_id") == run_id)
            .select("partition_id")
            .collect()
        )
    except Exception:  # first run: lineage table does not exist yet
        return set()
    return {r.partition_id for r in rows}


def run_with_lineage(
    spark: SparkSession,
    docs: DataFrame,
    output_path: str,
    lineage_path: str,
    run_id: str,
    num_buckets: int = 64,
    buckets_per_commit: int = 16,
    num_partitions: int | None = None,
    snapshot_id: int = 0,
    fail_after_commits: int | None = None,
) -> None:
    """Extract with per-bucket-group commits; resumes past committed work.

    ``fail_after_commits`` injects a crash after k commits (resume tests).
    """
    done = committed_buckets(spark, lineage_path, run_id)
    docs_b = with_partition_id(docs, num_buckets)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    commits = 0
    for lo in range(0, num_buckets, buckets_per_commit):
        hi = min(lo + buckets_per_commit, num_buckets)
        todo = [b for b in range(lo, hi) if b not in done]
        if not todo:
            continue
        t0 = time.monotonic()
        chunk = docs_b.filter(F.col("partition_id").isin(todo))
        # ONE input pass yields both the per-bucket lineage input stats
        # and the heavy-tier row count that gates the skew-aware
        # repartition — the skew measuring scan comes for free
        nspans = F.size("spans")
        in_stats = (
            chunk.groupBy("partition_id")
            .agg(
                F.min(F.xxhash64("doc_id")).alias("min_hash"),
                F.max(F.xxhash64("doc_id")).alias("max_hash"),
                F.count("*").alias("input_rows"),
                F.sum(nspans).alias("spans_in"),
                F.sum(
                    F.when(nspans > HEAVY_SPAN_THRESHOLD, 1).otherwise(0)
                ).alias("heavy_docs"),
            )
            .collect()
        )
        heavy_docs = sum(r.heavy_docs or 0 for r in in_stats)
        extracted = run_extraction(
            chunk.select("doc_id", "spans"),
            num_partitions=num_partitions,
            heavy_docs_hint=heavy_docs,
        )
        # cluster the output on the bucket key before the hive-partitioned
        # write: without this every kernel task writes a file into every
        # bucket directory (tasks × buckets small files) and the driver's
        # sequential commit renames dominate wall time — measured 40 s of
        # a 60 s job at 64 kernel partitions × 64 buckets. One extra
        # shuffle of the (smaller) extracted output buys one file per
        # bucket and O(buckets) commit work: the standard bucketed-table
        # write discipline at scale.
        # n_spans is materialized as a flat column so the post-commit
        # stats pass scans two int columns instead of re-decoding the
        # nested spans arrays (measured 14 s -> ~1 s on the bench corpus)
        # repartition(k, partition_id) with k distinct bucket values
        # hash-COLLIDES (some tasks write 2-3 buckets, others idle —
        # the same defect tools/skew_balance.py measured on the kernel
        # path), so each bucket is routed to its exact write task via
        # the murmur3-inverse salt table
        wsalts = partition_index_salts(spark, max(1, len(todo)))
        bucket_salt = F.create_map(
            *[
                x
                for i, b in enumerate(todo)
                for x in (F.lit(b), F.lit(int(wsalts[i])))
            ]
        )
        out = (
            with_partition_id(extracted, num_buckets)
            .withColumn("n_spans", F.size("spans"))
            .withColumn("__wsalt", bucket_salt[F.col("partition_id")])
            .repartition(max(1, len(todo)), F.col("__wsalt"))
            .drop("__wsalt")
        )
        # data first, lineage second: a crash between the two re-executes
        # the bucket (dynamic overwrite of the same subdirs — idempotent)
        overwrite_buckets(out, output_path)
        # stats read back from the COMMITTED files (partition-pruned,
        # column-pruned scan), never from the lazy plan — re-deriving
        # `out` would re-run extraction
        written = (
            read_back(spark, output_path)
            .select("partition_id", "n_spans")
            .filter(F.col("partition_id").isin(todo))
        )
        _commit_lineage(
            spark, in_stats, written, lineage_path, run_id, snapshot_id,
            wall_ms=int((time.monotonic() - t0) * 1000),
        )
        done.update(todo)
        commits += 1
        if fail_after_commits is not None and commits >= fail_after_commits:
            raise RuntimeError(f"injected failure after {commits} commits")


def _commit_lineage(
    spark: SparkSession,
    in_stats_rows: list,
    out: DataFrame,
    lineage_path: str,
    run_id: str,
    snapshot_id: int,
    wall_ms: int,
) -> None:
    in_stats = spark.createDataFrame(
        [
            (r.partition_id, r.min_hash, r.max_hash, r.input_rows, r.spans_in)
            for r in in_stats_rows
        ],
        "partition_id int, min_hash long, max_hash long, input_rows long, spans_in long",
    )
    out_stats = (
        out.groupBy("partition_id")
        .agg(
            F.count("*").alias("output_rows"),
            F.sum((F.col("n_spans") > 0).cast("long")).alias("docs_ok"),
            F.sum((F.col("n_spans") == 0).cast("long")).alias("docs_empty"),
            F.sum("n_spans").alias("spans_out"),
        )
    )
    lineage = (
        in_stats.join(out_stats, "partition_id", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(snapshot_id).cast("long").alias("snapshot_id"),
            F.col("partition_id"),
            "min_hash",
            "max_hash",
            "input_rows",
            F.coalesce("output_rows", F.lit(0)).alias("output_rows"),
            F.coalesce("docs_ok", F.lit(0)).alias("docs_ok"),
            F.coalesce("docs_empty", F.lit(0)).alias("docs_empty"),
            F.coalesce("spans_in", F.lit(0)).alias("spans_in"),
            F.coalesce("spans_out", F.lit(0)).alias("spans_out"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.current_timestamp().alias("committed_at"),
        )
    )
    append_rows(lineage, lineage_path)
