"""Streaming composition of the mergeable sketches: because the CMS
matrix and the HDR quantile histogram are algebraic (merge = per-key
addition), the streaming ingest path needs NO stateful operator — each
micro-batch computes its partial state and folds it into a running
table by addition. This test drives that exact shape through a real
foreachBatch stream over file micro-batches and asserts the folded
state equals the one-pass batch state bit-for-bit — the merge-law
pytests prove the algebra; this proves the streaming wiring.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from extraction.textops import cms_sketch, quantile_sketch_hist, words

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver-generated testdata absent",
)


def _stream_fold(spark, src, state_dir, partial_fn, key_cols):
    """availableNow stream: per batch, compute the partial sketch and
    fold it into state/ by per-key addition (idempotent per-batch
    overwrite, same discipline as streaming_staged's ledger)."""

    def process_batch(batch, batch_id):
        part = partial_fn(batch)
        part.write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}")

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", state_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    folded = (
        spark.read.option("basePath", state_dir)
        .parquet(state_dir)
        .groupBy(*key_cols)
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return folded


def _write_chunks(spark, tmp_path, n_chunks=4):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    src = str(tmp_path / "src")
    for i in range(n_chunks):
        docs.filter(F.pmod(F.col("doc_id"), F.lit(n_chunks)) == i).coalesce(
            1
        ).write.mode("append").parquet(src)
    return docs, src


def test_streaming_cms_fold_equals_batch(spark, tmp_path):
    docs, src = _write_chunks(spark, tmp_path)
    toks = docs.select(F.explode(words(F.col("text"))).alias("w"))

    folded = _stream_fold(
        spark,
        src,
        str(tmp_path / "cms_state"),
        lambda b: cms_sketch(
            b.select(F.explode(words(F.col("text"))).alias("w")), "w"
        ),
        ["row", "bucket"],
    )
    got = {(r["row"], r["bucket"]): r["cnt"] for r in folded.collect()}
    want = {
        (r["row"], r["bucket"]): r["cnt"] for r in cms_sketch(toks, "w").collect()
    }
    assert got == want


def test_streaming_quantile_hist_fold_equals_batch(spark, tmp_path):
    from extraction.textops import token_count_ws

    docs, src = _write_chunks(spark, tmp_path)

    # the streamed frame carries only (doc_id, text); group everything
    # under one key — the merge law is per-key addition either way
    folded = _stream_fold(
        spark,
        src,
        str(tmp_path / "q_state"),
        lambda b: quantile_sketch_hist(
            b.select(
                F.lit("all").alias("g"),
                token_count_ws(F.col("text")).alias("v"),
            ),
            "v",
            "g",
        ),
        ["grp", "lo"],
    )
    got = {(r["grp"], r["lo"]): r["cnt"] for r in folded.collect()}
    want = {
        (r["grp"], r["lo"]): r["cnt"]
        for r in quantile_sketch_hist(
            docs.select(
                F.lit("all").alias("g"), token_count_ws(F.col("text")).alias("v")
            ),
            "v",
            "g",
        ).collect()
    }
    assert got == want
