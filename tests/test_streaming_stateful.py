"""Stateful Structured Streaming: sessionization + dedup over micro-batches.

The reference has no streaming (SURVEY.md §2.9); tests here extend the
engine the way a 100 TB ingest pipeline needs it:

- G1 sessionization as a STREAMING stateful operator (`session_window`),
  asserted bit-equal to the batch window-cumsum sessionizer on the same
  events — including across a stop/restart that recovers session state
  from the checkpoint (the cluster-failover story).
- Exact-dedup as a streaming stateful operator (`dropDuplicates` on the
  fingerprint), asserted against batch distinct.

Semantics note (gap alignment): the batch sessionizer breaks a session
when the gap is STRICTLY greater than SESSION_GAP_S over second-truncated
timestamps (`unix_timestamp`). `session_window(ts, g)` merges an event
into the open session when its start is <= the session end (inclusive
end bound, verified empirically: with g = gap+1 a delta of exactly gap+1
still merged), i.e. it breaks iff diff > g — the SAME predicate as the
batch form with g = gap. No +1 adjustment.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

GAP_S = 600  # small gap so the fixture makes many sessions
BASE = 1_700_000_000  # fixed epoch base, deterministic fixture


def _event_rows():
    """Deterministic per-user event streams with gaps straddling GAP_S.

    Pure function of (user, i): inter-event deltas cycle through values
    below, exactly at, and above the gap — including the == GAP_S edge
    that separates the two break semantics (must NOT break) and
    GAP_S + 1 (must break).
    """
    rows = []
    deltas = [30, 599, GAP_S, GAP_S + 1, 45, 2 * GAP_S, 1, GAP_S - 1, GAP_S + 7]
    for user in range(17):
        t = BASE + 37 * user
        for i in range(40):
            rows.append((user, t))
            t += deltas[(user + i) % len(deltas)] + (i % 3)
    return rows


def _batch_sessions(spark, events):
    """The exact batch G1 shape from __spark_entry__._sessions."""
    w = Window.partitionBy("user_id").orderBy("t")
    flagged = events.withColumn(
        "newblk",
        F.when(F.col("t") - F.lag("t", 1).over(w) > GAP_S, F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("session_id", F.sum("newblk").over(w))
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.min("t").alias("t_min"),
            F.max("t").alias("t_max"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "t_min", "t_max", "n_events")
    )


WATERMARK_S = 40 * (2 * GAP_S + 10) + GAP_S  # > the fixture's full time span:
# phase 2 replays events OLDER than everything phase 1 saw (the restart
# interleaves per-user halves), so the allowed lateness must cover the
# whole disorder window or the re-ordered half would be dropped as late.


def _stream_sessions(stream_df):
    """Streaming leg: the SHARED sessionizer operator — the same function
    the driver hash-gates in batch form as `g1_session_window`
    (extraction.streaming_windows.sessionize_windows; inclusive-end
    merge — see module docstring). This suite adds what the operator's
    own suite (tests/test_streaming_windows.py) does not: bit-equality
    to the batch cumsum form across a stop/restart that recovers session
    state from the checkpoint."""
    from extraction.streaming_windows import sessionize_windows

    return sessionize_windows(
        stream_df, GAP_S, watermark=f"{WATERMARK_S} seconds"
    )


def test_streaming_sessionize_matches_batch_across_restart(spark, tmp_path):
    rows = _event_rows()
    max_t = max(t for _, t in rows)
    events = spark.createDataFrame(rows, "user_id long, t long")

    src = str(tmp_path / "events_src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # phase 1 files: the real events, split mid-session so sessions SPAN
    # micro-batches (and span the restart) — per-user interleaved halves
    ev_ts = events.select("user_id", F.timestamp_seconds("t").alias("ts"))
    ev_ts.filter((F.col("user_id") + F.dayofmonth("ts")) % 2 == 0).coalesce(
        1
    ).write.parquet(src)
    part2 = ev_ts.filter((F.col("user_id") + F.dayofmonth("ts")) % 2 == 1)

    def run_stream():
        q = (
            _stream_sessions(
                spark.readStream.schema("user_id long, ts timestamp")
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

    run_stream()  # phase 1: half the events, nothing finalized yet

    # phase 2: remaining events + a far-future sentinel that pushes the
    # watermark past every real session's end+gap so ALL sessions emit.
    # State (open sessions from phase 1) is recovered from the checkpoint.
    # sentinel ts must clear max_t + WATERMARK_S + gap so the advanced
    # watermark (sentinel - WATERMARK_S) finalizes every real session
    sentinel = spark.createDataFrame(
        [(-1, max_t + WATERMARK_S + 10 * GAP_S)], "user_id long, t long"
    ).select("user_id", F.timestamp_seconds("t").alias("ts"))
    part2.unionByName(sentinel).coalesce(1).write.mode("append").parquet(src)
    run_stream()

    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .filter(F.col("user_id") >= 0)
        .select("user_id", "t_min", "t_max", "n_events")
        .collect()
    }
    want = {tuple(r) for r in _batch_sessions(spark, events).collect()}
    assert got == want
    assert len(want) > 17 * 10  # the fixture really does fragment


def test_streaming_dedup_matches_batch_distinct(spark, tmp_path):
    # docs with duplicate fingerprints scattered ACROSS micro-batch files
    rows = [(i, f"payload-{i % 37}") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs_src")
    docs.repartition(5).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(F.md5("text").alias("fp"))
        .dropDuplicates(["fp"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(r.fp for r in spark.sql("SELECT fp FROM dedup_stream").collect())
    want = sorted(
        r.fp for r in docs.select(F.md5("text").alias("fp")).distinct().collect()
    )
    assert got == want and len(got) == 37
