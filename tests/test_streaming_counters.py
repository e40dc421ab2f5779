"""Production variant A: counters-in-state + staging table + markers.

Same operator contract as the buffer-in-state assembler — the suite
reuses the SAME fixture (fragments scattered across micro-batch files,
duplicate deliveries, a held-back tail fragment completing across a
stop/restart) and asserts the SAME outcomes (exactly-once emission,
span-sequence equality with the batch kernel), plus the property that
motivates the variant: the staging table holds each fragment exactly
once, i.e. no micro-batch ever rewrites an accumulated payload.
"""

from __future__ import annotations

import glob
import time

from extraction.corpus import gen_doc
from extraction.oracle import extract_doc
from extraction.streaming import FRAGMENTS_SCHEMA, start_counter_assembly

from tests.test_streaming_assembly import N_DOCS, _fragments


def _collect_epochs(spark, out):
    dirs = glob.glob(out + "/epoch_*")
    rows = (
        spark.read.parquet(*dirs).select("doc_id", "spans").collect()
        if dirs
        else []
    )
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in r["spans"]
        ]
        for r in rows
    }
    assert len(rows) == len(got), "a doc emitted more than once"
    return got


def _run(spark, src, staging, out, ckpt):
    q = start_counter_assembly(
        spark.readStream.schema(FRAGMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        staging_dir=staging,
        output_dir=out,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)


def test_staged_assembly_matches_batch_kernel(spark, tmp_path):
    files = _fragments()
    src = str(tmp_path / "frags")
    staging = str(tmp_path / "staging")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # hold back the LAST fragment of doc 3 (a 4-fragment doc) until
    # phase 2: its counters must survive the restart and its staged
    # fragments must be picked up by a join epochs later
    held_doc, _ = gen_doc(3)
    held = [r for f in files for r in f if r[0] == held_doc and r[1] == 3]
    assert len(held) == 1
    files = [
        [r for r in f if not (r[0] == held_doc and r[1] == 3)] for f in files
    ]

    for chunk in files:
        spark.createDataFrame(chunk, FRAGMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    _run(spark, src, staging, out, ckpt)  # phase 1

    got1 = _collect_epochs(spark, out)
    assert held_doc not in got1, "incomplete doc must not emit"
    assert len(got1) == N_DOCS - 1

    # write-amplification property: despite duplicate deliveries in the
    # fixture, staging holds each (doc_id, frag_id) exactly once
    staged = spark.read.parquet(*glob.glob(staging + "/epoch_*"))
    n_staged = staged.count()
    n_distinct = staged.select("doc_id", "frag_id").distinct().count()
    assert n_staged == n_distinct, "duplicate delivery reached staging"
    want_frags = sum(1 + i % 4 for i in range(N_DOCS)) - 1  # minus held
    assert n_staged == want_frags

    # phase 2: the held fragment lands; counters recovered from checkpoint
    spark.createDataFrame(held, FRAGMENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, staging, out, ckpt)

    got = _collect_epochs(spark, out)
    assert len(got) == N_DOCS, "every doc emits exactly once when complete"

    for i in range(N_DOCS):
        doc_id, spans = gen_doc(i)
        want = [
            (s["kind"], s["text"], s["media_ref"], o)
            for o, s in enumerate(extract_doc(spans))
        ]
        got_sorted = sorted(got[doc_id], key=lambda t: t[3])
        assert got_sorted == want, f"span-sequence mismatch for {doc_id}"


def test_staged_timeout_evicts_straggler_counters(spark, tmp_path):
    """Eviction parity: a straggler's counters expire, the doc never
    emits, its staged fragments remain as the dead-letter population,
    and a post-eviction tail delivery cannot resurrect it."""
    src = str(tmp_path / "frags")
    staging = str(tmp_path / "staging")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    full_id, full_spans = gen_doc(1)
    open_id, open_spans = gen_doc(2)
    cut = len(full_spans) // 2
    phase1 = [
        (full_id, 0, 2, full_spans[:cut]),
        (full_id, 1, 2, full_spans[cut:]),
        (open_id, 0, 2, open_spans[: len(open_spans) // 2]),
    ]
    spark.createDataFrame(phase1, FRAGMENTS_SCHEMA).coalesce(1).write.parquet(src)

    def run(min_input_rows):
        # same ProcessingTimeTimeout/availableNow caveat as the buffer
        # variant's suite: wait for input consumption, let expired
        # timers fire in no-data batches, then stop
        q = start_counter_assembly(
            spark.readStream.schema(FRAGMENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            staging_dir=staging,
            output_dir=out,
            checkpoint_dir=ckpt,
            timeout_sec=1,
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if sum(p["numInputRows"] for p in q.recentProgress) >= min_input_rows:
                break
            time.sleep(1)
        else:
            q.stop()
            raise AssertionError("stream never consumed this phase's rows")
        time.sleep(4)
        q.stop()
        q.awaitTermination(60)

    run(3)
    assert set(_collect_epochs(spark, out)) == {full_id}

    # post-eviction tail: doc re-opens with seen={1} of n_frags=2 — the
    # head fragment is still in staging but the COUNTERS are gone, so
    # completion is (correctly) impossible: dead-lettered, not resurrected
    spark.createDataFrame(
        [(open_id, 1, 2, open_spans[len(open_spans) // 2 :])], FRAGMENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run(1)

    assert set(_collect_epochs(spark, out)) == {full_id}, (
        "evicted straggler must never emit"
    )
