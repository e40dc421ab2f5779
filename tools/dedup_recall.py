"""Measure the tiered near-dup funnel's RECALL against exact ground truth.

Ground truth: all-pairs exact 3-shingle Jaccard >= 0.5 over the sf0.01
documents table, computed in pure Python (the same normalize/shingle
definition as extraction.textops.word_shingles — re-asserted here by
cross-checking shingle sets for a sample of docs against the Spark
expression). The funnel's verify stage is exact on its candidates, so
funnel recall == candidate-generation recall: what the blocking tiers
(simhash hamming-banding, MinHash-LSH) MISS is the number that matters
at 100 TB, where exact all-pairs is impossible and the tiers are the
only gate. Writes BENCH/DEDUP_RECALL.md.

Usage: python tools/dedup_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
from itertools import combinations

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "src"))


def _norm(t: str) -> str:
    t = re.sub(r"[^a-z0-9\s]", " ", t.lower())
    return re.sub(r"\s+", " ", t).strip()


def _shingles(t: str, k: int = 3) -> frozenset:
    ws = _norm(t).split(" ") if _norm(t) else []
    if len(ws) < k:
        return frozenset()
    return frozenset(" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    rows = duckdb.sql(
        f"SELECT CAST(doc_id AS BIGINT), text FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
    ).fetchall()
    sh = {i: _shingles(t) for i, t in rows}

    truth = set()
    for (a, sa), (b, sb) in combinations(sorted(sh.items()), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if 2 * inter >= len(sa) + len(sb) - inter:  # jaccard >= 0.5
            truth.add((a, b))

    from pyspark.sql import functions as F

    from extraction.dedup import (
        minhash_lsh_candidates,
        simhash_near_pairs,
        verify_candidates,
        word_shingles,
    )
    from extraction.job import build_session

    spark = build_session("local[8]", 16, app="dedup-recall")
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )

    # cross-check the Python shingle mirror against the Spark expression
    sample = d.filter(F.col("doc_id") < 25).select(
        "doc_id", word_shingles(F.col("text")).alias("sh")
    )
    for r in sample.collect():
        assert frozenset(r["sh"]) == sh[r["doc_id"]], f"shingle mismatch doc {r['doc_id']}"

    def pairs_of(df):
        return {(min(a, b), max(a, b)) for a, b in df.select("id_a", "id_b").collect()}

    tier_sim = pairs_of(
        simhash_near_pairs(
            d, "text", "doc_id", bits=60, bands=4, max_hamming=3, shingle_k=3
        )
    )
    tier_mh = pairs_of(minhash_lsh_candidates(d, "text", "doc_id", k=3, perms=16, bands=4))
    cand = tier_sim | tier_mh

    cand_df = spark.createDataFrame(sorted(cand), "id_a long, id_b long")
    scored = verify_candidates(d, cand_df, "text", "doc_id", k=3)
    verified = {
        (min(a, b), max(a, b))
        for a, b, inter, na, nb in scored.select(
            "id_a", "id_b", "inter", "nsh_a", "nsh_b"
        ).collect()
        if 2 * inter >= na + nb - inter
    }
    spark.stop()

    def stats(name, got):
        hit = len(got & truth)
        rec = hit / len(truth) if truth else 1.0
        return f"| {name} | {len(got)} | {hit} | {rec:.3f} |"

    missed = sorted(truth - cand)
    lines = [
        "# Tiered near-dup funnel: measured recall vs exact ground truth",
        "",
        f"Corpus: `{sf_dir}/documents.parquet` ({len(sh)} docs). Ground truth =",
        "exact all-pairs 3-shingle Jaccard >= 0.5 (pure-Python mirror of",
        "`word_shingles`, cross-asserted against the Spark expression for a",
        f"doc sample). **{len(truth)} true near-dup pairs.**",
        "",
        "| stage | pairs | true pairs hit | recall |",
        "|---|---|---|---|",
        stats("simhash tier (60-bit shingle-simhash, 4 bands, hamming<=3)", tier_sim),
        stats("minhash-LSH tier (16 perms, 4 bands)", tier_mh),
        stats("union (candidates)", cand),
        stats("verified (exact Jaccard on candidates)", verified),
        "",
        f"Candidate-stage precision: {len(cand & truth)}/{len(cand)} ="
        f" {(len(cand & truth) / len(cand)) if cand else 1.0:.3f}"
        " (the exact verify stage removes every false candidate; at 100 TB"
        " precision only prices the verify work, recall is the quality gate).",
        f"Pairs missed by BOTH tiers: {len(missed)}"
        + (f" — {missed[:10]}" if missed else ""),
        "",
        "The verify stage is exact on its candidate set, so funnel recall ==",
        "candidate recall, and `verified ⊆ truth` by construction (checked:",
        f"false-positives after verify = {len(verified - truth)}).",
        "",
        "Regenerate: `python tools/dedup_recall.py`",
    ]
    out = os.path.join(REPO, "BENCH", "DEDUP_RECALL.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[6:12]))
    print(f"-> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
