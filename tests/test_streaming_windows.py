"""Watermarked event-time operators: session_window parity + late-data drop.

Three engines must agree on the gap sessionizer: the STREAMING
session_window form (out-of-order arrival across micro-batches, append
mode under a watermark), the BATCH form (the same function, the one the
driver hash-gates against the DuckDB cumsum oracle as
``g1_session_window``), and a pure-Python oracle in this file. The
fixture includes an exact-boundary pair (diff == gap) so the inclusive
merge semantics are pinned, not assumed.

The tumbling-window test proves the OTHER watermark contract: a
fragment arriving past the lateness horizon is dropped — the finalized
window's counts never include it and its own window never emits.

Watermark-order determinism: FileStreamSource does NOT guarantee
processing order across files added before one availableNow run (mtime
bumps are ignored — measured: a single-run version of the late-drop
test leaked the late row because its file processed before the
watermark-advancing one). Each ordering-sensitive stage therefore runs
as its OWN availableNow query against the shared checkpoint: the
watermark persists in the checkpoint between runs, so "these rows are
processed under a watermark at least W" is guaranteed by run boundaries
instead of by unknowable intra-run file order.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from extraction.streaming_windows import (
    EVENTED_FRAGMENTS_SCHEMA,
    sessionize_windows,
    windowed_kind_counts,
)

UTC = datetime.timezone.utc
GAP = 100  # test-size gap (the driver query runs the 21600 s production gap)


def _append(df, src):
    df.coalesce(1).write.mode("append").parquet(src)


def _run(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


# per-user integer timelines; u2 has diff == GAP (must MERGE: inclusive
# semantics, same as the batch break predicate t - lag(t) > gap)
EVENTS = {
    "u1": [0, 50, 150, 250, 351, 400],  # split at 250->351 (diff 101)
    "u2": [10, 110, 211, 311, 411],  # 100 merges, 101 splits
    "u3": [5],  # singleton session
    "u4": [0, 100, 200, 300, 401, 501, 601],  # split at 300->401
}


def _py_sessions():
    """Pure-Python oracle: sort, break on diff > GAP."""
    want = set()
    for u, ts in EVENTS.items():
        ts = sorted(ts)
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > GAP:
                want.add((u, start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        want.add((u, start, prev, n))
    return want


def test_session_window_three_engine_parity(spark, tmp_path):
    src = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def df_of(rows):
        return spark.createDataFrame(rows, "user_id string, t long").select(
            "user_id", F.timestamp_seconds("t").alias("ts")
        )

    def run():
        stream = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _run(
            sessionize_windows(stream, GAP, watermark="5000 seconds"),
            out,
            ckpt,
        )

    # stage 1: real events scattered across 3 chunk files, out of order
    # within the watermark horizon (delay 5000 s spans the fixture, so
    # intra-stage file order cannot make anything late)
    flat = [(u, t) for u, ts in EVENTS.items() for t in ts]
    for chunk in (flat[0::3], flat[1::3], flat[2::3]):
        _append(df_of(chunk), src)
    run()

    # stage 2: flush sentinels — the first pushes the checkpointed
    # watermark past every real session's end, the next batch emits the
    # closed sessions (either intra-stage order works: the emission
    # happens in whichever flush batch runs second)
    _append(df_of([("zz-flush", 10_000)]), src)
    _append(df_of([("zz-flush", 20_000)]), src)
    run()

    got_stream = {
        (r["user_id"], r["t_min"], r["t_max"], r["n_events"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] != "zz-flush"
    }
    got_batch = {
        (r["user_id"], r["t_min"], r["t_max"], r["n_events"])
        for r in sessionize_windows(df_of(flat), GAP).collect()
    }

    want = _py_sessions()
    assert got_batch == want, "batch session_window vs python oracle"
    assert got_stream == want, "streaming session_window vs python oracle"


def test_windowed_counts_drop_late_fragment(spark, tmp_path):
    src = str(tmp_path / "frags")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def frag(doc, t, spans):
        return (
            doc,
            0,
            1,
            [(k, txt, None, o) for o, (k, txt) in enumerate(spans)],
            datetime.datetime.fromtimestamp(t, UTC),
        )

    def run():
        stream = (
            spark.readStream.schema(EVENTED_FRAGMENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _run(
            windowed_kind_counts(stream, window_s=10, watermark="30 seconds"),
            out,
            ckpt,
        )

    # stage 1: on-time fragments -> windows [1000,1010) and [1010,1020);
    # checkpointed watermark after the stage: 1019 - 30 = 989
    _append(
        spark.createDataFrame(
            [
                frag("d1", 1000, [("text", "hello"), ("text", "world!")]),
                frag("d2", 1005, [("media", None)]),
                frag("d3", 1012, [("text", "abc")]),
                frag("d4", 1019, [("text", "wxyz")]),
            ],
            EVENTED_FRAGMENTS_SCHEMA,
        ),
        src,
    )
    run()

    # stage 2: a LATE fragment — its window [950,960) closed when the
    # watermark passed 960 in stage 1 — plus two flush fragments that
    # advance the watermark past the real windows and trigger their
    # append-mode emission. Any intra-stage order keeps the late row
    # late: the stage starts at watermark 989 > 960 and watermarks only
    # ever grow.
    _append(
        spark.createDataFrame(
            [
                frag("d-late", 950, [("text", "LATE-MUST-DROP")]),
                frag("zz-flush", 2000, [("text", "f")]),
                frag("zz-flush2", 2100, [("text", "f")]),
            ],
            EVENTED_FRAGMENTS_SCHEMA,
        ),
        src,
    )
    run()

    got = {
        (r["w_start"], r["kind"]): (r["n_spans"], r["text_chars"])
        for r in spark.read.parquet(out).collect()
        if r["w_start"] < 1970  # finalized real windows only
    }
    assert got == {
        (1000, "text"): (2, 11),
        (1000, "media"): (1, 0),
        (1010, "text"): (2, 7),
    }, f"late fragment leaked or counts wrong: {got}"


def test_dedup_stream_suppresses_within_horizon_reemits_beyond(
    spark, tmp_path
):
    """Both sides of the bounded-state dedup contract: a content
    duplicate landing within the watermark horizon of the first
    delivery is suppressed (across micro-batch runs); one landing after
    the horizon evicted the fingerprint state re-emits."""
    from extraction.streaming_windows import dedup_stream_exact

    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def df_of(rows):
        return spark.createDataFrame(
            rows, "doc_id string, text string, t long"
        ).select(
            "doc_id", "text", F.timestamp_seconds("t").alias("event_ts")
        )

    def run():
        stream = (
            spark.readStream.schema(
                "doc_id string, text string, event_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _run(dedup_stream_exact(stream, watermark="3600 seconds"), out, ckpt)

    def emitted():
        return {r["doc_id"] for r in spark.read.parquet(out).collect()}

    # stage 1: two distinct docs
    _append(df_of([("a1", "same text", 1000), ("b1", "other", 1001)]), src)
    run()
    assert emitted() == {"a1", "b1"}

    # stage 2 (separate run, same checkpoint): a content duplicate of a1
    # inside the horizon + one new doc — the dup must NOT re-emit even
    # though it arrives in a different micro-batch run
    _append(df_of([("a2-dup", "same text", 1005), ("c1", "third", 1010)]), src)
    run()
    assert emitted() == {"a1", "b1", "c1"}, "within-horizon dup leaked"

    # stage 3: flush advances the watermark far past 1000 + 3600 so the
    # fingerprint state evicts
    _append(df_of([("zz-flush", "flush", 100_000)]), src)
    run()

    # stage 4: the same content again, beyond the horizon -> re-emits
    # (the documented bounded-state trade; batch compaction owns global)
    _append(df_of([("a3-late-dup", "same text", 100_001)]), src)
    run()
    assert "a3-late-dup" in emitted(), (
        "state must evict at the horizon (bounded store) and the "
        "post-horizon duplicate re-emit"
    )
