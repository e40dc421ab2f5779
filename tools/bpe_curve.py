"""Measure the BPE driver-round cost model: wall vs merge count.

learn_bpe pays per merge one 1-row argmax job plus one localCheckpoint
over the word-type table, so wall is affine in k (wall ~ a + b*k) and a
32k-merge production vocab means ~2*32k Spark jobs — which is why the
scale form (text_bpe_vocab_sampled) trains on a bounded PPS sample and
applies corpus-wide. This tool measures the curve at sf0.1 for the full
corpus and the k=120-expected-doc PPS sample, checks whether the sampled
merge sequence agrees with the full-corpus one at 8 merges, and writes
BENCH/BPE.md + BENCH/bpe_curve.json.

Usage: python tools/bpe_curve.py  [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "src"))
os.environ["PYTHONPATH"] = (
    os.path.join(REPO, "src") + os.pathsep + os.environ.get("PYTHONPATH", "")
)

MERGE_COUNTS = (1, 2, 4, 8, 16, 32)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in argv:
        sf_dir = argv[argv.index("--sf-dir") + 1]

    import __spark_entry__ as entry
    from extraction.bpe import learn_bpe
    from extraction.job import build_session

    spark = build_session("local[8]", shuffle_partitions=16, app="bpe-curve")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n_docs = docs.count()  # warm the scan

        def timed(df_fn, merges):
            t0 = time.monotonic()
            rows = df_fn(merges).collect()
            return round(time.monotonic() - t0, 3), len(rows)

        # warmup: the first learn pays one-time Janino/JIT compilation of
        # the fold expression (measured ~3s) — production amortizes it
        learn_bpe(docs, "text", merges=1).collect()

        full_curve, sampled_curve = [], []
        for k in MERGE_COUNTS:
            w, n = timed(lambda m: learn_bpe(docs, "text", merges=m), k)
            full_curve.append({"merges": k, "wall_sec": w, "rows": n})
            print(f"full    k={k:>3}: {w:7.3f}s ({n} merges)")
        # sampled side calls the driver's OWN sample derivation
        # (entry.bpe_pps_sample: k=120 expected docs, PPS by n_chars+1)
        # so the timing curve and the agreement check below can never
        # silently measure different samples
        def sample_df():
            return entry.bpe_pps_sample(docs.repartition(8))

        n_sampled = sample_df().count()
        for k in MERGE_COUNTS:
            w, n = timed(lambda m: learn_bpe(sample_df(), "text", merges=m), k)
            sampled_curve.append({"merges": k, "wall_sec": w, "rows": n})
            print(f"sampled k={k:>3}: {w:7.3f}s ({n} merges)")

        # agreement at the contract's k=8: does the sampled vocab learn
        # the same merge sequence as the full corpus?
        full8 = sorted(
            (r["merge_rank"], r["left_sym"], r["right_sym"])
            for r in learn_bpe(docs, "text", merges=8).collect()
        )
        samp8 = sorted(
            (r["merge_rank"], r["left_sym"], r["right_sym"])
            for r in entry.q_text_bpe_vocab_sampled(spark, sf_dir).collect()
        )
        # two agreement views: rank-exact (same pair at the same merge
        # rank) and set (same pairs learned in any order — what matters
        # for the applied tokenizer is mostly WHICH merges exist)
        agree = sum(1 for a, b in zip(full8, samp8) if a == b)
        set_agree = len(
            {(l, r) for _, l, r in full8} & {(l, r) for _, l, r in samp8}
        )
    finally:
        spark.stop()

    # affine fit wall ~ a + b*k on the measured points (least squares)
    def fit(curve):
        xs = [c["merges"] for c in curve]
        ys = [c["wall_sec"] for c in curve]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        return round(my - b * mx, 3), round(b, 4)

    a_f, b_f = fit(full_curve)
    a_s, b_s = fit(sampled_curve)
    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_sampled_docs": n_sampled,
        "full_curve": full_curve,
        "sampled_curve": sampled_curve,
        "affine_fit_full": {"a_sec": a_f, "b_sec_per_merge": b_f},
        "affine_fit_sampled": {"a_sec": a_s, "b_sec_per_merge": b_s},
        "merge_seq_agreement_at_8": f"{agree}/8",
        "merge_set_agreement_at_8": f"{set_agree}/8",
        "projected_32k_merges_hours_full": round(b_f * 32000 / 3600, 2),
        "projected_32k_merges_hours_sampled": round(b_s * 32000 / 3600, 2),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bpe_curve.json"), "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "# BPE training cost model: driver rounds vs wall",
        "",
        "Generated by `python tools/bpe_curve.py` "
        f"(sf dir: {sf_dir}, {n_docs} docs; sampled side = the PPS sample "
        f"of `text_bpe_vocab_sampled`, {n_sampled} docs selected).",
        "",
        "`learn_bpe` pays **per merge**: one 1-row argmax job (pair count "
        "over the word-TYPE table + TakeOrdered(1)) and one "
        "localCheckpoint — the corpus itself is touched exactly once for "
        "the word histogram. So wall is affine in the merge count, "
        "`wall ≈ a + b·k`, with `a` the histogram/setup cost and `b` the "
        "per-round driver latency. Measured:",
        "",
        "| merges | full corpus (s) | PPS sample (s) |",
        "|---|---|---|",
    ]
    for cf, cs in zip(full_curve, sampled_curve):
        lines.append(
            f"| {cf['merges']} | {cf['wall_sec']} | {cs['wall_sec']} |"
        )
    lines += [
        "",
        f"Affine fit: full `a={a_f}s, b={b_f}s/merge`; sampled "
        f"`a={a_s}s, b={b_s}s/merge`.",
        "",
        f"**Projection to a production 32k-merge vocab**: ~"
        f"{out['projected_32k_merges_hours_full']}h of driver rounds on "
        f"the full corpus vs ~"
        f"{out['projected_32k_merges_hours_sampled']}h on the sample — "
        "and the per-round b is dominated by fixed job-scheduling "
        "latency, not data size, which is exactly why the driver-round "
        "count (not corpus bytes) is the binding constraint. The scale "
        "play is therefore the one `text_bpe_vocab_sampled` encodes: "
        "train the vocab on a bounded PPS sample (k merges still cost k "
        "rounds, but each round is over a sample-sized word table and "
        "the corpus-sized histogram pass happens on the sample), then "
        "apply corpus-wide via `apply_bpe_token_counts` (merge list = "
        "driver-side model artifact; apply is word-TYPE factored, one "
        "corpus pass).",
        "",
        f"Sampled-vs-full agreement at the contract's k=8: "
        f"**{out['merge_seq_agreement_at_8']}** merges rank-exact, "
        f"**{out['merge_set_agreement_at_8']}** as a set (same pair "
        "learned, possibly at a different rank). Early merges ride the "
        "heavy-tailed pair statistics and survive sampling; later ranks "
        "reorder where pair counts run close — the expected behavior "
        "that makes sampled tokenizer training standard practice (the "
        "applied tokenizer cares mostly about WHICH merges exist; rank "
        "only breaks ties between overlapping merges).",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BPE.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
