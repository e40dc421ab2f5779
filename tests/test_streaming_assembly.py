"""Custom stateful operator: fragment assembly (streaming.assemble_extract).

Documents arrive as interleaved fragments scattered across micro-batch
files — including duplicate deliveries and one doc whose tail fragment
only lands after a stop/restart. The assembled + extracted stream must
be span-sequence identical to the batch kernel run on the intact corpus.
"""

from __future__ import annotations

from extraction.corpus import gen_doc
from extraction.oracle import extract_doc
from extraction.streaming import FRAGMENTS_SCHEMA, assemble_extract

N_DOCS = 60  # covers all corpus families (i % 100 < 60): text, media, mixed


def _fragments():
    """Deterministic fragmentation: doc i splits into 1 + i%4 contiguous
    chunks; fragment (i, f) is assigned to file (i + 2*f) % 5 so the
    fragments of every multi-fragment doc straddle micro-batches."""
    files = [[] for _ in range(5)]
    for i in range(N_DOCS):
        doc_id, spans = gen_doc(i)
        n_frags = 1 + i % 4
        cuts = [round(len(spans) * f / n_frags) for f in range(n_frags + 1)]
        for f in range(n_frags):
            row = (doc_id, f, n_frags, spans[cuts[f] : cuts[f + 1]])
            files[(i + 2 * f) % 5].append(row)
            if (i + f) % 7 == 0:  # at-least-once: duplicate delivery
                files[(i + 2 * f + 3) % 5].append(row)
    return files


def _run(spark, src, out, ckpt):
    q = (
        assemble_extract(
            spark.readStream.schema(FRAGMENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _collect(spark, out):
    rows = spark.read.parquet(out).select("doc_id", "spans").collect()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]
        ]
        for r in rows
    }
    assert len(rows) == len(got), "a doc emitted more than once"
    return got


def test_fragment_assembly_matches_batch_kernel(spark, tmp_path):
    files = _fragments()
    src = str(tmp_path / "frags")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # hold back the LAST fragment of doc 3 (a 4-fragment doc) until
    # phase 2: it must not emit in phase 1, and must complete across the
    # restart from recovered state
    held_doc, _ = gen_doc(3)
    held = [r for f in files for r in f if r[0] == held_doc and r[1] == 3]
    assert len(held) == 1, "fixture: doc 3 frag 3 exists once (not duplicated)"
    files = [
        [r for r in f if not (r[0] == held_doc and r[1] == 3)] for f in files
    ]

    for chunk in files:
        spark.createDataFrame(chunk, FRAGMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    _run(spark, src, out, ckpt)  # phase 1

    got1 = _collect(spark, out)
    assert held_doc not in got1, "incomplete doc must not emit"
    assert len(got1) == N_DOCS - 1

    # phase 2: the held fragment lands; state recovered from checkpoint
    spark.createDataFrame(held, FRAGMENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, out, ckpt)

    got = _collect(spark, out)
    assert len(got) == N_DOCS, "every doc emits exactly once when complete"

    for i in range(N_DOCS):
        doc_id, spans = gen_doc(i)
        want = [
            (s["kind"], s["text"], s["media_ref"], o)
            for o, s in enumerate(extract_doc(spans))
        ]
        got_sorted = sorted(got[doc_id], key=lambda t: t[3])
        assert got_sorted == want, f"span-sequence mismatch for {doc_id}"

def test_timeout_evicts_straggler_state(spark, tmp_path):
    """Dead-letter seam: an open doc whose tail fragment never lands is
    evicted after timeout_sec — it must NOT emit, and complete docs in
    the same stream are unaffected."""
    import time

    from extraction.streaming import assemble_fragments

    src = str(tmp_path / "frags")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    full_id, full_spans = gen_doc(1)  # complete: both fragments delivered
    open_id, open_spans = gen_doc(2)  # straggler: fragment 1 of 2 only
    cut = len(full_spans) // 2
    phase1 = [
        (full_id, 0, 2, full_spans[:cut]),
        (full_id, 1, 2, full_spans[cut:]),
        (open_id, 0, 2, open_spans[: len(open_spans) // 2]),
    ]
    spark.createDataFrame(phase1, FRAGMENTS_SCHEMA).coalesce(1).write.parquet(src)

    def run(min_input_rows):
        # ProcessingTimeTimeout makes shouldRunAnotherBatch permanently
        # true, so even availableNow never self-terminates — it keeps
        # scheduling no-data batches to fire timers (and
        # processAllAvailable() never returns either). Wait for this
        # phase's input rows to be consumed via query progress, give
        # expired timers a few no-data batches to fire, then stop.
        q = (
            assemble_fragments(
                spark.readStream.schema(FRAGMENTS_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                timeout_sec=1,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if sum(p["numInputRows"] for p in q.recentProgress) >= min_input_rows:
                break
            time.sleep(1)
        else:
            q.stop()
            raise AssertionError("stream never consumed this phase's rows")
        time.sleep(4)  # > timeout_sec: expired timers fire in no-data batches
        q.stop()
        q.awaitTermination(60)

    run(3)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {full_id}

    # timers persist in the checkpoint across restarts; the next run's
    # batches fire them once expired
    other_id, other_spans = gen_doc(4)
    spark.createDataFrame(
        [(other_id, 0, 1, other_spans)], FRAGMENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run(1)

    # deliver the straggler's tail AFTER eviction: the doc re-opens with
    # only the tail fragment, so it still cannot complete (n_frags=2,
    # seen=1) — eviction means the doc is dead-lettered, not resurrected
    spark.createDataFrame(
        [(open_id, 1, 2, open_spans[len(open_spans) // 2 :])], FRAGMENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run(1)

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {full_id, other_id}, "evicted straggler must never emit"
