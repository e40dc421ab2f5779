#!/usr/bin/env python
"""Pinned scale-invariance bracket: small -> BIG -> small, one budget.

Question this answers: does per-doc extraction throughput hold when the
corpus grows Nx, on the SAME pinned CPU budget? (The north rule's cluster
criterion is N vs 4N *executors*; this is the orthogonal axis — fixed
executors, growing data — where a driver-side accumulation, a widening
shuffle, or a skew tail would show up as per-doc degradation.)

Why a bracket instead of comparing runs across sessions: this box's
deliverable capacity drifts ~2x on an hours scale without visible CPU
steal (BENCH/BASELINE.md measurement protocol note) — the SAME 4M-doc
binary measured 2747 dps in a moderate window and 6674 dps in a quiet
one. Only an in-order small/BIG/small sandwich, minutes apart on one
pinned budget, isolates the size effect: the scoring number is the BIG
leg's docs/sec relative to the surrounding small legs' mean, and the
small legs' own spread is the noise floor the ratio is judged against.

The 4M bracket (BENCH/scaling_4m_invariance.json) ran this protocol by
hand; this script is the reusable form, default-configured for the 16M
step (67x the 240k headline corpus, 4x the prior bracket's big leg).

Every leg's output gets the pure-Python-oracle spot check before its
directory is reclaimed, so a throughput number can never come from a
run that produced wrong spans.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SRC = os.path.join(REPO, "src")
sys.path.insert(0, HERE)
sys.path.insert(0, SRC)
os.environ["PYTHONPATH"] = SRC + os.pathsep + os.environ.get("PYTHONPATH", "")

from scaling import gen_corpus, run_submit  # noqa: E402


def membw_gbps() -> float:
    """Median-of-5 memcpy bandwidth (GB/s) on a 200 MB buffer — the
    cheap discriminator for the box's invisible-contention mode (quiet
    ~3+ GB/s; crushed 0.2-2 GB/s while steal reads 2-6%)."""
    import numpy as np

    buf = np.zeros(200_000_000, dtype=np.uint8)
    buf.fill(1)
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        c = buf.copy()
        walls.append(time.perf_counter() - t0)
        del c
    return round(0.2 / statistics.median(walls), 2)


def _corpus_fds_open(corpus: str) -> bool:
    """True if ANY process on the box holds a file under ``corpus`` open
    (scans /proc/*/fd symlinks — local mode, everything is on this host)."""
    import glob

    for fd in glob.glob("/proc/[0-9]*/fd/*"):
        try:
            if os.readlink(fd).startswith(corpus):
                return True
        except OSError:
            continue
    return False


def _input_reclaimer(corpus: str, outdir: str, stop_evt) -> None:
    """Delete the (regenerable, content-addressed) input corpus the
    moment the running leg provably no longer needs it.

    Why: on this box shuffle, input AND output all live in tmpfs RAM, and
    the 16M leg's peak working set does not fit alongside its 18 GB input
    (OOM post-mortem in BENCH/BASELINE.md). The pipeline has exactly one
    shuffle boundary (the skew-aware repartition), so once the WRITER
    stage has begun committing part files the scan stage is complete and
    no task will ever open the input again. Criterion, deliberately
    two-fold: a part file exists under the output tree (writer stage
    running — it cannot start before the scan stage finishes) AND no
    process holds a corpus file open for two consecutive 15 s polls
    (belt-and-braces against any recompute in flight). A real cluster
    never needs this: input lives on object storage, not executor RAM.
    """
    poll_sec = float(os.environ.get("EXTRACTION_RECLAIM_POLL_SEC", "15"))
    clear_polls = 0
    while not stop_evt.is_set():
        # the writer stages through a HIDDEN .spark-staging-<uuid> dir and
        # glob's ** skips dot-entries — walk instead (measured: the
        # glob-based check never fired on a real 16M leg; part files live
        # under .spark-staging-*/_temporary/... until job commit)
        part_committed = any(
            f.startswith("part-")
            for _, _, files in os.walk(outdir)
            for f in files
        )
        if part_committed and not _corpus_fds_open(corpus):
            clear_polls += 1
            if clear_polls >= 2:
                shutil.rmtree(corpus, ignore_errors=True)
                return
        else:
            clear_polls = 0
        stop_evt.wait(poll_sec)


def leg_verify(run: dict, sample: int) -> dict:
    """Oracle spot-check + lineage skew stats for ONE leg's output."""
    from extraction.corpus import gen_doc
    from extraction.job import build_session
    from extraction.oracle import extract_doc

    from pyspark.sql import functions as F

    spark = build_session("local[8]", shuffle_partitions=32, app="inv-verify")
    try:
        step = max(1, run["docs"] // sample)
        ids = [f"doc-{i:09d}" for i in range(0, run["docs"], step)]
        got = {
            r["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in r["spans"]
            ]
            for r in spark.read.parquet(run["output"])
            .filter(F.col("doc_id").isin(ids))
            .collect()
        }
        mismatches = 0
        for i in range(0, run["docs"], step):
            did, spans = gen_doc(i)
            want = [
                (s["kind"], s["text"], s["media_ref"], o)
                for o, s in enumerate(extract_doc(spans))
            ]
            if got.get(did, []) != want:
                mismatches += 1
        lin = spark.read.parquet(run["lineage"])
        skew = lin.agg(
            F.count("*").alias("buckets"),
            F.min("input_rows").alias("min_docs"),
            F.expr("percentile(input_rows, 0.5)").alias("med_docs"),
            F.max("input_rows").alias("max_docs"),
            F.min("spans_in").alias("min_spans"),
            F.expr("percentile(spans_in, 0.5)").alias("med_spans"),
            F.max("spans_in").alias("max_spans"),
        ).first()
        return {
            "oracle_sampled_docs": len(ids),
            "oracle_mismatches": mismatches,
            "skew": {k: float(skew[k]) for k in skew.asDict()},
        }
    finally:
        spark.stop()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--small", type=int, default=4_000_000)
    p.add_argument("--big", type=int, default=16_000_000)
    p.add_argument("--heavy-spans", type=int, default=2000)
    p.add_argument("--cores", type=int, default=4)
    p.add_argument("--cpuset-factor", type=int, default=2)
    p.add_argument("--sample", type=int, default=200)
    p.add_argument("--workdir", default="/dev/shm/extraction_scaling")
    p.add_argument("--out", default=os.path.join(
        REPO, "BENCH", "scaling_16m_invariance.json"))
    p.add_argument("--timeout", type=float, default=9000.0,
                   help="per-leg spark-submit timeout (sec)")
    p.add_argument("--shuffle-codec", default="",
                   help="override spark.io.compression.codec for ALL legs "
                        "(e.g. zstd — needed at 16M: the lz4 shuffle alone "
                        "is ~58 GB and everything lives in tmpfs RAM; see "
                        "the OOM post-mortem in BENCH/BASELINE.md)")
    p.add_argument("--reclaim-small", action="store_true",
                   help="delete the small corpus during the big leg and "
                        "regenerate it (content-addressed, deterministic) "
                        "before small-b — frees its tmpfs bytes for the "
                        "big leg's working set; gen time is untimed")
    p.add_argument("--reclaim-input-after-scan", action="store_true",
                   help="during the BIG leg, delete its input corpus once "
                        "the writer stage is committing and no process "
                        "holds a corpus file open (the scan is complete "
                        "by then — single shuffle boundary). Frees the "
                        "big input's tmpfs bytes for the shuffle+output "
                        "peak; the 16M bracket needs this on a 125 GB "
                        "box. See _input_reclaimer.")
    a = p.parse_args()

    if a.shuffle_codec:
        os.environ["EXTRACTION_EXTRA_SPARK_CONFS"] = (
            f"spark.io.compression.codec={a.shuffle_codec}"
        )

    subprocess.run(["sh", os.path.join(REPO, "bench", "package.sh")], check=True)
    os.makedirs(a.workdir, exist_ok=True)
    from extraction.fingerprint import source_fingerprint

    ver = source_fingerprint("corpus.py")

    def corpus_path(docs: int) -> str:
        return os.path.join(a.workdir, f"corpus_{docs}_{a.heavy_spans}_{ver}")

    gen_walls = {}
    for docs in (a.small, a.big):
        t0 = time.monotonic()
        gen_corpus(docs, a.heavy_spans, corpus_path(docs))
        gen_walls[docs] = round(time.monotonic() - t0, 1)

    legs = [("small-a", a.small), ("big", a.big), ("small-b", a.small)]
    results = []
    for tag, docs in legs:
        if a.reclaim_small:
            # small corpus is dead weight during the big leg; regenerate
            # it (bit-identical: pure function of index, content-addressed
            # path) before small-b. Gen wall is outside every timed leg.
            if tag == "big":
                shutil.rmtree(corpus_path(a.small), ignore_errors=True)
            elif tag == "small-b":
                gen_corpus(a.small, a.heavy_spans, corpus_path(a.small))
        reclaimer = stop_evt = None
        if a.reclaim_input_after_scan and tag == "big":
            import threading

            stop_evt = threading.Event()
            reclaimer = threading.Thread(
                target=_input_reclaimer,
                args=(
                    corpus_path(docs),
                    os.path.join(a.workdir, f"out_inv_{tag}_r0"),
                    stop_evt,
                ),
                daemon=True,
            )
            reclaimer.start()
        bw_before = membw_gbps()
        try:
            run = run_submit(
                a.cores, corpus_path(docs), a.workdir, f"inv_{tag}", 0,
                cpuset_factor=a.cpuset_factor, timeout_sec=a.timeout,
            )
        finally:
            if stop_evt is not None:
                stop_evt.set()
                reclaimer.join(timeout=30)
        bw_after = membw_gbps()
        ver_res = leg_verify(run, a.sample)
        rec = {
            "tag": tag,
            "docs": run["docs"],
            "wall_sec": run["wall_sec"],
            "docs_per_sec": run["docs_per_sec"],
            "membw_gbps_around": [bw_before, bw_after],
            **ver_res,
        }
        results.append(rec)
        print(json.dumps(rec))
        # reclaim tmpfs before the next leg (the 16M output is ~20 GB)
        shutil.rmtree(run["output"], ignore_errors=True)
        shutil.rmtree(run["lineage"], ignore_errors=True)

    small_dps = [r["docs_per_sec"] for r in results if r["tag"] != "big"]
    big_dps = next(r["docs_per_sec"] for r in results if r["tag"] == "big")
    ratio = round(big_dps / statistics.mean(small_dps), 3)
    spread = round(
        abs(small_dps[0] - small_dps[1]) / statistics.mean(small_dps), 3
    )
    artifact = {
        "mode": "pinned-invariance-bracket",
        "question": (
            f"is per-doc throughput flat at {a.big} docs "
            f"({a.big // a.small}x the prior bracket's big leg), same pinned "
            f"local[{a.cores}] budget ({a.cores * a.cpuset_factor} vCPUs)?"
        ),
        "big_vs_small_ratio": ratio,
        "small_legs_spread": spread,
        "bracket_legs_in_order": results,
        "corpus_gen_walls_sec": gen_walls,
        "cmdline": vars(a),
        "extra_spark_confs": os.environ.get(
            "EXTRACTION_EXTRA_SPARK_CONFS", ""
        ),
    }
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"ratio={ratio} spread={spread} -> {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
